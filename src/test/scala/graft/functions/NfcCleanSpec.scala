package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcCleanSpec extends SparkSuite {
  import spark.implicits._

  // code points spelled as escapes throughout — a literal combining mark
  // in source is invisible and editor-normalization-fragile
  private val ZWSP = "\u200B"; private val ZWNJ = "\u200C"
  private val ZWJ = "\u200D"; private val BOM = "\uFEFF"
  private val Acute = "\u0301" // combining acute
  private val EAcute = "\u00E9" // precomposed e-acute

  private def cleanOne(s: String): String =
    Seq(s).toDF("t")
      .select(NfcFunctions.nfcClean(col("t"))).as[String].head()

  test("composes decomposed sequences to NFC") {
    assert(cleanOne("cafe" + Acute) === "caf" + EAcute)
    assert(cleanOne("a\u0308b") === "\u00E4b") // a + diaeresis composes
  }

  test("strips all four zero-width code points") {
    assert(cleanOne(s"a${ZWSP}b${ZWNJ}c${ZWJ}d${BOM}e") === "abcde")
  }

  test("strip happens before composition (zero-width between base and mark)") {
    // e + ZWNJ + combining acute: with the ZWNJ present NFC cannot
    // compose; after the strip it must
    assert(cleanOne("e" + ZWNJ + Acute) === EAcute)
  }

  test("ASCII fast path returns the value unchanged") {
    val in = "plain ascii text 123"
    assert(cleanOne(in) === in)
    // direct entry-point check: identical instance, no copy
    val u = UTF8String.fromString(in)
    assert(NfcClean.clean(u) eq u)
  }

  test("already-NFC non-ASCII is returned as-is") {
    val u = UTF8String.fromString("caf" + EAcute)
    assert(NfcClean.clean(u) eq u)
  }

  test("null propagates; idempotent on its own output") {
    val got = Seq[String](null).toDF("t")
      .select(NfcFunctions.nfcClean(col("t"))).as[String].collect()
    assert(got.toList === List(null))
    val once = cleanOne(s"x$ZWSP cafe$Acute")
    assert(cleanOne(once) === once)
  }

  test("fuzz: clean() matches a straight-line reference on mixed code points") {
    // pool mixes ASCII, zero-width, combining marks, precomposed and
    // supplementary-plane points — the shapes that distinguish the
    // ASCII / already-NFC fast paths from the full rewrite
    val pool: IndexedSeq[String] = IndexedSeq(
      "a", "z", "0", " ", ".", ZWSP, ZWNJ, ZWJ, BOM, Acute,
      "\u0308", EAcute, "\u00E4", "\u4E2D", "\uD83D\uDE00", "\u0645")
    val rnd = new scala.util.Random(20260814)
    def reference(s: String): String = {
      val stripped = s.filterNot(c =>
        c == '\u200B' || c == '\u200C' || c == '\u200D' || c == '\uFEFF')
      java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC)
    }
    (1 to 300).foreach { i =>
      val s = Seq.fill(rnd.nextInt(12))(pool(rnd.nextInt(pool.size))).mkString
      val got = NfcClean.clean(UTF8String.fromString(s)).toString
      assert(got === reference(s), s"case $i input codepoints: " +
        s.map(c => f"U+${c.toInt}%04X").mkString(" "))
    }
  }

  test("interpreted eval matches the codegen path") {
    val ins = Seq("cafe" + Acute, s"a${ZWSP}b", "plain", "na\u00EFve",
      "e" + ZWNJ + Acute, s"mixed $ZWJ cafe$Acute$BOM")
    val viaSpark = ins.toDF("t")
      .select(NfcFunctions.nfcClean(col("t")).as("c")).as[String].collect()
    val direct = ins.map(s => NfcClean.clean(UTF8String.fromString(s)).toString)
    assert(viaSpark.toList === direct.toList)
  }
}
