package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Text-analysis operators for LLM training-data pipelines
  * (SURVEY.md §2.2 [EXT]; none exist in the reference — documented absent
  * there). Tokenization, quality scoring, language-ID heuristic, document
  * fingerprinting — all pure built-in Column expressions (codegen'd, no
  * UDFs), each paired with a DuckDB SQL fragment generated from the SAME
  * constants so the oracle cannot drift from the Spark expression.
  *
  * Scale: every operator here is a narrow per-row projection — no shuffle,
  * fully pipelined inside whole-stage codegen; at 100 TB these run at scan
  * speed and never become the bottleneck (the downstream groupBy/join does).
  */
object TextAnalysis {

  // ---- tokenization -------------------------------------------------------
  // The corpus is space-separated lowercase ASCII (TESTDATA.md); token =
  // non-empty run between single spaces. Identical split semantics in
  // Spark's split() (Java regex, literal " ") and DuckDB string_split.

  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def duckTokens(text: String): String =
    s"list_filter(string_split($text, ' '), t -> t <> '')"

  /** BPE-ish regex tokenizer: words and single punctuation marks as
    * separate tokens (the shape a byte-pair pre-tokenizer produces). */
  val BpeRegex = "[a-z0-9]+|[^a-z0-9 ]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeRegex), lit(0))
  def duckBpeTokens(text: String): String =
    s"regexp_extract_all($text, '$BpeRegex', 0)"

  // ---- word shingles (n-gram units for MinHash / Jaccard) -----------------

  /** All 3-word shingles of token array `w` (requires size >= 3 — guard at
    * the query level on BOTH engines). NOTE: higher-order functions are
    * interpreted (no codegen) — for hot paths prefer [[shingleRows]]. */
  def shingles3(w: Column): Column =
    transform(sequence(lit(0), size(w) - 3),
      i => array_join(slice(w, i + 1, lit(3)), " "))

  /** The hot-path shingler: corpus(doc_id, text) → one row per 3-shingle
    * (doc_id, pos, s), via the custom WordShingles Generator
    * (graft.functions.ShingleGenerator). NARROW — no exchange, no sort:
    * shingles materialize in place, so downstream per-doc aggregations
    * (MinHash mins, collect_set) run their partial step map-side and only
    * one pre-aggregated row per doc crosses the shuffle. (Two rejected
    * alternatives, both measured slower: transform() HOF — interpreted
    * per-element closures; posexplode + window-lead — exchanges and sorts
    * every token row before shingles exist.) Docs with <3 non-empty
    * tokens produce no rows — same guard as the HOF form. */
  def shingleRows(corpus: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    corpus.select(col("doc_id"),
      graft.functions.WordShingles.wordShingles(split(col("text"), " "), 3)
        .as(Seq("pos", "s")))

  def duckShingles3(w: String): String =
    s"list_transform(range(len($w)-2), i -> array_to_string(($w)[i+1:i+3], ' '))"

  // ---- quality scoring ----------------------------------------------------

  /** Generic function-word list for the stopword-ratio quality signal. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  private def inList(t: Column, words: Seq[String]): Column =
    words.map(w => t === w).reduce(_ || _)
  private def duckInList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("t IN (", ", ", ")")

  /** Count of tokens (duplicates kept) that are in `words`. */
  def markerCount(w: Column, words: Seq[String]): Column =
    size(filter(w, t => inList(t, words))).cast("bigint")
  def duckMarkerCount(w: String, words: Seq[String]): String =
    s"CAST(len(list_filter($w, t -> ${duckInList(words)})) AS BIGINT)"

  /** Σ length(token) — via sequential int fold (identical in DuckDB). */
  def sumTokenLen(w: Column): Column =
    aggregate(transform(w, t => length(t).cast("bigint")), lit(0L), (acc, x) => acc + x)
  def duckSumTokenLen(w: String): String =
    s"list_reduce(list_transform($w, t -> CAST(length(t) AS BIGINT)), (acc, x) -> acc + x)"

  // ---- language ID (marker-word heuristic) --------------------------------
  // Score each language by its function-word hit count; argmax with a fixed
  // priority order (declaration order breaks ties), 'und' when all zero.

  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "dans"),
    "zh" -> Seq("的", "是", "了"))

  /** Char n-gram profiles for the n-gram language-ID variant: a few
    * signature character trigrams/bigrams per language. Occurrence
    * counting is (len(text) - len(replace(text, g, ''))) / len(g) —
    * pure integer arithmetic, identical in both engines. */
  val LangNgrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he ", "ing"),
    "de" -> Seq("sch", "ein", "der"),
    "es" -> Seq("ción", "los", " el "),
    "fr" -> Seq("eau", "les", " est "),
    "zh" -> Seq("的", "是", "了"))

  /** Occurrences of literal `g` in `text` via length difference (literal
    * `replace`, not regexp — lighter generated code and no regex engine
    * in the row loop). */
  def ngramCount(text: Column, g: String): Column = {
    val cleaned = call_function("replace", text, lit(g), lit(""))
    ((length(text) - length(cleaned)) / lit(g.length)).cast("bigint")
  }
  def duckNgramCount(text: String, g: String): String = {
    val esc = g.replace("'", "''")
    s"CAST((length($text) - length(replace($text, '$esc', ''))) // ${g.length} AS BIGINT)"
  }

  /** Per-language n-gram score: Σ occurrences of its signature n-grams. */
  def ngramScore(text: Column, grams: Seq[String]): Column =
    grams.map(g => ngramCount(text, g)).reduce(_ + _)
  def duckNgramScore(text: String, grams: Seq[String]): String =
    grams.map(g => duckNgramCount(text, g)).mkString("(", " + ", ")")

  /** Predicted language from score columns s_<lang> (argmax, ties by
    * declaration order, all-zero → 'und'). Single array_max over
    * (score, -idx) structs: each score expression is referenced ONCE —
    * the equivalent pairwise when-chain inlines every score ~O(langs)
    * times and multiplies codegen compile time (scores are non-negative,
    * so best.score = 0 ⟺ all zero). */
  def langPredict(score: String => Column): Column = {
    val langs = LangMarkers.map(_._1)
    val entries = langs.zipWithIndex.map { case (l, i) =>
      struct(score(l).as("sc"), lit(-i).as("negIdx"))
    }
    val best = array_max(array(entries: _*))
    when(best.getField("sc") === 0L, lit("und"))
      .otherwise(element_at(typedlit(langs), -best.getField("negIdx") + 1))
  }

  def duckLangPredict(score: String => String): String = {
    val langs = LangMarkers.map(_._1)
    val allZero = langs.map(l => s"${score(l)} = 0").mkString(" AND ")
    val arms = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"${score(l)} >= ${score(o)}").mkString(" AND ")
      s"WHEN NOT ($allZero) AND $geAll THEN '$l'"
    }.mkString(" ")
    s"(CASE $arms ELSE 'und' END)"
  }

  // ---- fingerprinting ------------------------------------------------------

  /** Whole-document fingerprint: md5 of the normalized (token-joined) text.
    * md5 hex is identical across engines. */
  def fingerprint(w: Column): Column = md5(array_join(w, " "))
  def duckFingerprint(w: String): String = s"md5(array_to_string($w, ' '))"

  /** Winnowing-style rolling fingerprint: the minimum shingle hash — the
    * k=1 MinHash, a locality-sensitive content fingerprint. */
  def winnow(sh: Column): Column = array_min(transform(sh, s => md5(s)))
  def duckWinnow(sh: String): String =
    s"list_aggregate(list_transform($sh, s -> md5(s)), 'min')"

  /** Full winnowing (Schleimer/Wilkerson/Aiken MOSS scheme): slide a
    * window of `w` consecutive shingle hashes along the doc, keep each
    * window's minimum, fingerprint = the distinct selected values. Any
    * two docs sharing a run of >= w+2 tokens share a fingerprint value —
    * the guarantee global min-hash cannot give. Shingle stream is narrow
    * (WordShingles generator); the per-doc window sort is the one
    * shuffle; complete windows only (trailing partial windows excluded). */
  val WinnowW = 4
  def winnowRows(corpus: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(0, WinnowW - 1)
    shingleRows(corpus)
      .withColumn("h", graft.pipeline.Dedup.baseHash32(col("s")))
      .withColumn("wm", min("h").over(frame))
      .withColumn("wn", count("h").over(frame))
      .filter(col("wn") === WinnowW)
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("wm"))).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("bigint").as("n_fp"),
        array_join(transform(col("fps"), f => f.cast("string")), "-").as("fp_str"))
  }

  def duckWinnowRows(corpusSelect: String): String =
    s"""SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
          array_to_string(fps, '-') AS fp_str
        FROM (
          SELECT doc_id, list(DISTINCT wm ORDER BY wm) AS fps
          FROM (
            SELECT doc_id,
              min(h) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wm,
              count(*) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wn
            FROM (
              SELECT doc_id, pos - 1 AS pos, ${Dedup.duckBaseHash32("s")} AS h
              FROM (SELECT doc_id, unnest(sh) AS s, generate_subscripts(sh, 1) AS pos
                    FROM ($corpusSelect))))
          WHERE wn = ${WinnowW}
          GROUP BY doc_id)"""

  // ---- edit-distance-1 blocking (SymSpell deletion neighborhood) ----------

  /** All strings obtained from `term` by deleting at most one character
    * (the term itself included). Two terms within Levenshtein distance 1
    * ALWAYS share a neighborhood key (substitution at i → both delete i;
    * insertion/deletion → the longer side's deletion hits the shorter
    * term verbatim), so an equi-join on these keys is a complete
    * candidate generator — but NOT a sound classifier (distinct deletes
    * can collide at distance 2, e.g. "xa"/"ay" share "a"), so candidates
    * must be re-verified with exact `levenshtein`. Neighborhood size is
    * |term|+1 — the linear-space SymSpell trade that turns the
    * vocab × probe cross product into a hash join. */
  def deletionKeys(term: Column): Column =
    array_union(
      array(term),
      transform(sequence(lit(1), length(term)),
        i => concat(term.substr(lit(1), i - 1),
          term.substr(i + 1, length(term)))))
}
