package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram (shingle) generator: one output row (pos, s) per n-token
  * window of the input `array<string>`, s = tokens joined by a single
  * space. Empty-string tokens are skipped (same semantics as tokenizing
  * with split + filter). Arrays with fewer than n non-empty tokens
  * produce no rows.
  *
  * Why a custom Generator: composed built-ins either go through
  * higher-order functions (`transform(sequence, slice, array_join)` —
  * interpreted, one closure call per element) or through
  * posexplode + window-lead — which forces a full exchange AND sort of
  * every token row before shingles even exist. This generator is narrow:
  * shingles materialize in place, so the downstream per-doc aggregations
  * (MinHash mins, shingle collect_set) run their PARTIAL step map-side
  * and only one row per doc crosses the wire. At 100 TB that's the
  * difference between shuffling ~50 shingle rows per document and
  * shuffling one pre-aggregated row per document.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("s", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got $other")
  }

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Iterator.empty
    val arr = data.asInstanceOf[ArrayData]
    val m = arr.numElements()
    // compact out empty tokens once; shingle windows index the compacted list
    val toks = new scala.collection.mutable.ArrayBuffer[UTF8String](m)
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      if (t != null && t.numBytes() > 0) toks += t
      i += 1
    }
    val k = toks.length
    if (k < n) return Iterator.empty
    (0 to k - n).iterator.map { p =>
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = toks(p + j)
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      InternalRow(p, UTF8String.concat(parts: _*))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Column front door: `df.select(col("id"), wordShingles(tokensCol, 3)
    * .as(Seq("pos", "s")))`. */
  def wordShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), n))
}
