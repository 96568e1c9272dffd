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

  test("interpreted eval matches the codegen path") {
    val ins = Seq("cafe" + Acute, s"a${ZWSP}b", "plain", "na\u00EFve",
      "e" + ZWNJ + Acute, s"mixed $ZWJ cafe$Acute$BOM")
    val viaSpark = ins.toDF("t")
      .select(NfcFunctions.nfcClean(col("t")).as("c")).as[String].collect()
    val direct = ins.map(s => NfcClean.clean(UTF8String.fromString(s)).toString)
    assert(viaSpark.toList === direct.toList)
  }
}
