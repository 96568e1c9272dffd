package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** [EXT] Unicode text canonicalization for web-scale corpus cleaning —
  * no analog in the reference (its keys are opaque bytes,
  * wd/AbstractRowKeyDistributor.java:32-37); this serves the
  * training-data pipeline, where the same visible text arriving as
  * precomposed ("é") vs decomposed ("e"+U+0301) — or padded with
  * zero-width characters — defeats exact dedup, shingle hashing and
  * token statistics unless every document is canonicalized first.
  *
  * Semantics (in this order, mirrored by the generated DuckDB twin so
  * the oracle cannot drift):
  *   1. strip zero-width characters: U+200B ZWSP, U+200C ZWNJ,
  *      U+200D ZWJ, U+FEFF BOM/ZWNBSP — the usual invisible-padding
  *      suspects in crawled text;
  *   2. Unicode NFC normalization (canonical composition).
  *
  * Scale shape: a unary scalar that stays inside whole-stage codegen
  * (single static call, the Janino-safe shape ZOrderKey settled on).
  * The hot path for real corpora is the ASCII fast path: ASCII bytes
  * are NFC-closed and contain no zero-width characters, so the input
  * UTF8String is returned as-is — no String materialization, no
  * Normalizer walk — and a 100 TB mostly-ASCII scan pays one byte
  * sweep per value. Non-ASCII values additionally short-circuit the
  * composer via Normalizer.isNormalized before paying for a rewrite.
  */
case class NfcClean(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_clean"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_clean expects string, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    NfcClean.clean(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcClean.clean($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcClean {
  /** The zero-width code points stripped before composition. */
  val ZeroWidth: Seq[Int] = Seq(0x200B, 0x200C, 0x200D, 0xFEFF)

  /** Single entry point for both the interpreted and generated paths. */
  def clean(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) return s // ASCII is NFC-closed and zero-width free
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var j = 0
    while (j < str.length) {
      val c = str.charAt(j)
      if (c != '\u200B' && c != '\u200C' && c != '\u200D' && c != '\uFEFF') sb.append(c)
      j += 1
    }
    val stripped = sb.toString
    val out =
      if (Normalizer.isNormalized(stripped, Normalizer.Form.NFC)) stripped
      else Normalizer.normalize(stripped, Normalizer.Form.NFC)
    if (out == str) s else UTF8String.fromString(out)
  }
}

object NfcFunctions {
  def nfcClean(text: Column): Column =
    ColumnBridge.column(NfcClean(ColumnBridge.expression(text)))

  /** The identical strip-then-compose pipeline as DuckDB SQL text,
    * generated from the same code points so the oracle cannot drift. */
  def duckNfcClean(expr: String): String = {
    val stripped = NfcClean.ZeroWidth.foldLeft(expr) {
      (e, cp) => s"replace($e, chr($cp), '')"
    }
    s"nfc_normalize($stripped)"
  }
}
