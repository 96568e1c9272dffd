package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT-SUBSTRING dedup (Lee et al. 2022's ExactSubstr re-expressed
  * relationally): constructed corpora pin the detection contract —
  * maximal spans, cross-doc AND within-doc duplication, island merge of
  * overlapping/adjacent windows — and the removal contract (cut exactly
  * the spans, pass zero-span docs through, empty out fully-duplicated
  * docs, token accounting closed). */
class DedupSubstringSpec extends SparkSuite {
  import spark.implicits._

  private val L = Dedup.SpanTokens // 8

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def spans(c: DataFrame) =
    Dedup.duplicatedSpans(c).orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq

  // 12 shared tokens -> windows 0..4 in both docs; doc 1 has a unique
  // 4-token subject prefix shifting its copy to positions 4..15
  private val shared = (0 until 12).map(i => s"dup$i").mkString(" ")

  test("cross-doc duplicated run becomes ONE maximal span in each doc") {
    val c = corpus(
      0L -> shared,
      1L -> (s"intro word about things " + shared),
      2L -> "a totally unique sentence with no repeats whatsoever at all")
    assert(spans(c) == Seq(
      (0L, 0L, 12L, 12L),  // whole doc duplicated
      (1L, 4L, 16L, 12L))) // shifted by the 4-token prefix; doc 2 clean
  }

  test("within-doc boilerplate loop is caught without a second document") {
    val line = (0 until L).map(i => s"b$i").mkString(" ")
    val c = corpus(0L -> s"$line $line") // the L-gram occurs at pos 0 and L
    val s = spans(c)
    assert(s == Seq((0L, 0L, 2L * L, 2L * L)))
  }

  test("two separated duplicated regions stay two islands") {
    val runA = (0 until L).map(i => s"a$i").mkString(" ")
    val runB = (0 until L).map(i => s"c$i").mkString(" ")
    val c = corpus(
      0L -> s"$runA unique middle filler words here again $runB",
      1L -> runA,
      2L -> runB)
    // doc 0: [0,8) and [14,22) — the 6 middle tokens break the island
    assert(spans(c).filter(_._1 == 0L) ==
      Seq((0L, 0L, 8L, 8L), (0L, 14L, 22L, 8L)))
  }

  test("removal cuts exactly the spans; accounting closes; zero-span passthrough") {
    val c = corpus(
      0L -> shared,
      1L -> (s"intro word about things " + shared),
      2L -> "a totally unique sentence with no repeats whatsoever at all")
    val out = Dedup.removeSpans(c, Dedup.duplicatedSpans(c))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val Seq(d0, d1, d2) = out
    assert(d0 == ((0L, "", 12L, 12L, 0L)))            // fully duplicated -> empty
    assert(d1 == ((1L, "intro word about things", 16L, 12L, 4L)))
    assert(d2._2 == "a totally unique sentence with no repeats whatsoever at all")
    assert(out.forall(r => r._3 == r._4 + r._5))      // n = dup + kept
  }

  test("docs shorter than the window produce no grams and survive removal intact") {
    val c = corpus(0L -> "short doc", 1L -> "short doc") // 2 tokens < L
    assert(spans(c).isEmpty)
    val out = Dedup.removeSpans(c, Dedup.duplicatedSpans(c))
      .orderBy("doc_id").as[(Long, String, Long, Long, Long)].collect()
    assert(out.forall(r => r._2 == "short doc" && r._4 == 0L))
  }
}
