package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Int8 scalar quantization for embedding vectors — the production
  * memory/IO lever for ANN at 100 TB: a 64-dim float32 vector is 256
  * bytes; quantized to one signed byte per coordinate it is 64. The
  * approximate scan then runs over 4× less data with integer arithmetic,
  * and only the surviving top candidates touch the full-precision
  * vectors for exact re-ranking (see q_knn_cosine_sq8).
  *
  * Quantization: q_i = clamp(round_half_away_from_zero(x_i · 127), -127,
  * 127) — embeddings are unit-spread, so the fixed symmetric scale keeps
  * the sign and magnitude structure. Half-away-from-zero is chosen (not
  * Java's Math.round half-up) because it matches DuckDB/SQL `round`, so
  * the oracle can replay quantization bit-for-bit with integer lists.
  *
  * Both expressions are codegen'd tight loops over packed bytes —
  * `BinaryType` is the columnar analog of an int8 tensor row.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 expects array<double>, got $other")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = a.getDouble(i) * 127.0
      val r = if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)
      out(i) = math.max(-127.0, math.min(127.0, r)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val r = ctx.freshName("r")
      s"""
      final int $n = $a.numElements();
      final byte[] $out = new byte[$n];
      for (int $i = 0; $i < $n; $i++) {
        final double $x = $a.getDouble($i) * 127.0;
        double $r = ($x >= 0) ? java.lang.Math.floor($x + 0.5)
                              : java.lang.Math.ceil($x - 0.5);
        $out[$i] = (byte) java.lang.Math.max(-127.0, java.lang.Math.min(127.0, $r));
      }
      ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product over two int8-packed binary vectors → BIGINT.
  * Exact (integer accumulation, |Σ| ≤ 127²·n — no overflow for any real
  * dimensionality), so it is order-insensitive and trivially
  * oracle-reproducible from the unpacked integer lists. */
case class DotProductInt8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_int8"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dot_int8 expects (binary, binary), got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    // mismatched dimensionality means corrupted or mixed embeddings — a
    // silently truncated partial dot would look plausible and skew the
    // ANN ranking; fail loudly (same contract as zorder_key's range check)
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"dot_int8: vector length mismatch (${x.length} vs ${y.length})")
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      s"""
      if ($a.length != $b.length) {
        throw new IllegalArgumentException(
          "dot_int8: vector length mismatch (" + $a.length + " vs " + $b.length + ")");
      }
      long $sum = 0L;
      for (int $i = 0; $i < $a.length; $i++) {
        $sum += (long) $a[$i] * (long) $b[$i];
      }
      ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API front door for the int8 quantization expressions. */
object Int8Functions {
  def quantizeInt8(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))
  def dotInt8(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductInt8(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
