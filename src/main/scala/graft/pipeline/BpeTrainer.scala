package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] BPE (byte-pair-encoding) merge training — the first rounds of
  * tokenizer training over a corpus: repeatedly find the most frequent
  * adjacent symbol pair (weighted by word frequency) and fuse it into
  * one symbol. Absent from the reference; the tokenizer-training member
  * of the north-star pipeline surface.
  *
  * Representation: a word's symbol sequence is one string
  * `"(s1)(s2)…(sn)"` — each symbol parenthesis-wrapped, so a merge is a
  * literal `replace("(a)(b)" → "(ab)")` whose occurrences NEVER share
  * boundary characters (a space/pipe-delimited encoding would: in
  * `b a b`, the delimiter consumed by one match hides the next). Both
  * engines' `replace` scan left-to-right over non-overlapping
  * occurrences — exactly BPE's greedy application order — so the DuckDB
  * oracle replays training decision-for-decision. Ties break
  * deterministically (count DESC, then left/right symbol).
  *
  * Scale shape: the corpus is touched ONCE (the word-frequency agg,
  * map-combined); every training round then runs on the VOCAB — |V|
  * rows, millions at 100 TB, never the corpus — as one map-combined
  * pair-count agg plus a 1-row argmax collect; the merge itself is a
  * broadcast-literal map-side `replace`. Driver state is one (pair,
  * count) row per round. This is the standard distributed-BPE layout
  * (count on vocab, not corpus) that makes thousands of rounds feasible.
  */
object BpeTrainer {
  /** `"(c1)(c2)…(cn)"` initial character-symbol encoding of a word. */
  def encode(term: Column): Column =
    concat(lit("("),
      array_join(regexp_extract_all(term, lit("."), lit(0)), ")("),
      lit(")"))

  /** Adjacent-pair counts over an encoded vocab (`enc`, `freq`). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"),
        regexp_extract_all(col("enc"), lit("\\(([^)]*)\\)"), lit(1))
          .as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
           i -> struct(element_at(syms, i) AS a,
                       element_at(syms, i + 1) AS b))""")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
      .groupBy("a", "b")
      .agg(sum("freq").as("cnt"))

  /** Re-materialize the encoded vocab every this many rounds: without
    * it round r re-executes all r−1 prior replaces from the cached base
    * (O(rounds²) total work, ever-deeper plans) — at 3 demo rounds
    * irrelevant, at a real 50k-merge vocabulary fatal. */
  private val snapshotEvery = 16

  /** Run `rounds` merge rounds; returns (merge_rank, left_sym,
    * right_sym, pair_count) — the learned merge table. Stops early
    * (returning the merges learned so far) once no adjacent pair
    * remains — i.e. every word is a single symbol. */
  def train(vocab0: DataFrame, rounds: Int): DataFrame = {
    val spark = vocab0.sparkSession
    import spark.implicits._
    var pinned = vocab0.persist()
    try {
      var vocab: DataFrame = pinned
      var sincePin = 0
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        pairCounts(vocab)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect().headOption match {
          case None => exhausted = true
          case Some(top) =>
            val (a, b) = (top.getString(0), top.getString(1))
            merges += ((r, a, b, top.getLong(2)))
            vocab = vocab.withColumn("enc",
              replace(col("enc"), lit(s"($a)($b)"), lit(s"($a$b)")))
            sincePin += 1
            if (sincePin >= snapshotEvery) {
              val snap = vocab.persist()
              snap.count() // materialize before dropping the old pin
              pinned.unpersist()
              pinned = snap
              vocab = snap
              sincePin = 0
            }
        }
        r += 1
      }
      merges.result()
        .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
    } finally pinned.unpersist()
  }

  /** Lexicographic compare of two strings as UTF-8 bytes, unsigned —
    * exactly Spark's UTF8String binary collation. */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** PRODUCTION-SHAPE training: fit the merge table LOCALLY on the
    * weighted head of the vocabulary, apply distributed.
    *
    * The distributed `train` is exact but runs one argmax job per merge
    * round — honest for a demo's 3 rounds, hopeless for a real 50k-merge
    * vocabulary (50k sequential tiny jobs). The standard production
    * answer: ONE Spark job collects the top-`sampleSize` (word, freq)
    * rows — vocabularies are Zipfian, so a 100k-row head carries almost
    * all pair mass — then every merge round is a driver-local pair count
    * + argmax + in-place fuse over ≤ sampleSize symbol vectors: 50k
    * rounds of pure local work, ZERO further jobs. The merge table then
    * feeds [[applyMerges]], a codegen'd broadcast-literal scan — the
    * distributed side of tokenization was always the apply, not the fit.
    *
    * Decision parity: identical pair weighting, identical tiebreak
    * (count DESC, then left/right symbol), and the local fuse replicates
    * `replace`'s left-to-right non-overlapping scan — so with
    * `sampleSize` ≥ |vocab| the learned table is IDENTICAL to
    * [[train]]'s (spec-pinned). `pair_count` is the count WITHIN the
    * sample. Stops early when no adjacent pair remains. */
  def trainSampled(vocab0: DataFrame, rounds: Int,
                   sampleSize: Int = 100000): DataFrame = {
    val spark = vocab0.sparkSession
    import spark.implicits._
    val symRe = "\\(([^)]*)\\)".r
    // no-silent-caps: collect ONE extra row — its presence proves the
    // sample truncated the vocab, so the "identical to train()" guarantee
    // does NOT hold for this fit (Zipfian-head approximation only).
    // Callers relying on exact parity must see this surface, not debug a
    // confusing oracle hash mismatch at a larger sf.
    val probe = vocab0
      .select(col("enc").cast("string"), col("freq").cast("long"))
      .orderBy(col("freq").desc, col("enc"))
      .limit(sampleSize + 1)
      .collect()
    if (probe.length > sampleSize)
      System.err.println(
        s"[graft] BpeTrainer.trainSampled: vocab exceeds sampleSize=$sampleSize" +
          " — fit uses the weighted head only and is NOT bit-identical to train()")
    val sample: Array[(Array[String], Long)] = probe.take(sampleSize)
      .map(r => (symRe.findAllMatchIn(r.getString(0)).map(_.group(1)).toArray,
        r.getLong(1)))
    val words: Array[Array[String]] = sample.map(_._1)
    val freqs = sample.map(_._2)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val w = words(i); val f = freqs(i)
        var j = 0
        while (j < w.length - 1) {
          val p = (w(j), w(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        // tiebreak parity with train(): Spark compares strings as UTF-8
        // BYTES (UTF8String binary), which diverges from JVM String
        // (UTF-16 code unit) ordering for chars >= U+E000 and
        // supplementary code points — compare bytes, not Strings
        val ((a, b), cnt) = counts.min(Ordering.fromLessThan[((String, String), Long)] {
          case (((x1, y1), c1), ((x2, y2), c2)) =>
            if (c1 != c2) c1 > c2
            else {
              val cx = utf8Cmp(x1, x2)
              if (cx != 0) cx < 0 else utf8Cmp(y1, y2) < 0
            }
        })
        merges += ((r, a, b, cnt))
        i = 0
        while (i < words.length) {
          val w = words(i)
          // replace-parity: left-to-right, non-overlapping
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < w.length) {
            if (j < w.length - 1 && w(j) == a && w(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += w(j); j += 1 }
          }
          words(i) = out.toArray
          i += 1
        }
      }
      r += 1
    }
    merges.result().toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Apply a learned merge table (in rank order) to an encoded column —
    * the TOKENIZE side of BPE: each merge is a broadcast-literal
    * `replace`, identical to how training applied it. */
  def applyMerges(enc: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(enc) { case (e, (a, b)) =>
      replace(e, lit(s"($a)($b)"), lit(s"($a$b)"))
    }

  /** Symbol count of an encoded string = its '(' count. */
  def symbolCount(enc: Column): Column =
    size(regexp_extract_all(enc, lit("\\("), lit(0)))
}
