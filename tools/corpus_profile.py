#!/usr/bin/env python3
"""Corpus profile of the driver-generated testdata — the denominator
for cross-round bench comparisons (text-index / dedup costs scale with
postings and duplicate structure, which change when the driver
regenerates /root/testdata). Run per sf dir; paste the table into
SURVEY round notes."""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
docs = f"read_parquet('{sf}/documents.parquet')"
emb = f"read_parquet('{sf}/embeddings.parquet')"
row = con.sql(f"""
  WITH d AS (SELECT * FROM {docs}),
  tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\W+')) AS t FROM d),
  tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
  post AS (SELECT DISTINCT doc_id, t FROM tok2),
  dup AS (SELECT md5(text) AS h, count(*) AS c FROM d GROUP BY 1)
  SELECT
    (SELECT count(*) FROM d) AS docs,
    (SELECT sum(length(text)) FROM d) AS chars,
    (SELECT count(*) FROM tok2) AS tokens,
    (SELECT count(DISTINCT t) FROM tok2) AS vocab,
    (SELECT count(*) FROM post) AS postings,
    (SELECT count(*) FROM dup WHERE c > 1) AS dup_groups,
    (SELECT coalesce(sum(c - 1), 0) FROM dup WHERE c > 1) AS dup_extra_rows,
    (SELECT count(*) FROM {emb}) AS embeddings
""").fetchone()
names = ["docs", "chars", "tokens", "vocab", "postings",
         "dup_groups", "dup_extra_rows", "embeddings"]
print(f"# {sf}")
for n, v in zip(names, row):
    print(f"{n:>15}: {v}")
