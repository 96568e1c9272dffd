#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the testdata parquet tables and compare with the Spark results
dumped by graft.Verify. Columns sorted by name; rows sorted; exact
value compare (with a small report of the first diffs)."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    # skip BEFORE running the oracle: filtered Verify runs dump a few
    # queries but the full oracle map, and some oracles (q_corpus_e2e at
    # sf0.1) cost tens of minutes in DuckDB
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result")
        fails += 1
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails += 1
        continue
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ok = True
    for c in exp.columns:
        ev, gv = exp_s[c], got_s[c]
        if ev.dtype.kind == 'f' or gv.dtype.kind == 'f':
            bad = ~((ev == gv) | (ev.isna() & gv.isna()))
        else:
            bad = ~((ev.astype(str) == gv.astype(str)))
        if bad.any():
            i = bad.idxmax()
            print(f"FAIL {name}: col {c} row {i}: exp={ev[i]!r} got={gv[i]!r} ({int(bad.sum())} diffs)")
            ok = False
            fails += 1
            break
    if ok:
        print(f"PASS {name} ({len(exp)} rows)")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
