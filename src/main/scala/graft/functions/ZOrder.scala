package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of two non-negative 32-bit dimensions into
  * one BIGINT key — multi-dimensional locality for the salted store: a
  * table sorted by `zorder_key(a, b)` keeps rows close in BOTH dimensions
  * close on disk, so a 2-D box predicate prunes parquet row groups by
  * min/max on the single z key (the technique behind lakehouse
  * OPTIMIZE ZORDER). One-dimensional sorting gives skipping on the lead
  * column only; the z key trades a little per-dimension locality for
  * skipping on every indexed dimension.
  *
  * Implementation: the classic 5-step mask spread of each 32-bit input to
  * even bit positions, OR-combined with the second input shifted to odd
  * positions — a handful of shifts/ANDs inside whole-stage codegen. The
  * identical mask arithmetic runs in DuckDB ([[ZOrderFunctions.duckZorder]]),
  * so results are oracle-reproducible bit-for-bit. Inputs are validated
  * non-negative and < 2^32 at runtime (null out of range would silently
  * break locality; failing loudly is the storage-layout contract).
  */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects (bigint, bigint), got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  // ONE single-line statement: the previous inline form (an if/throw block
  // plus a multi-line OR-of-spreads assignment) made Janino reject the
  // generated method ("expression is not a type"), silently dropping the
  // whole stage out of codegen — the scan then ran interpreted. A lone
  // static call is the same shape every other graft expression generates
  // and keeps the z-key inside whole-stage codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderKey.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Range-checked interleave — the single entry point both the
    * interpreted and generated paths call. */
  def interleave(x: Long, y: Long): Long = {
    if (x < 0 || x > 0xffffffffL || y < 0 || y > 0xffffffffL)
      throw new IllegalArgumentException(
        s"zorder_key inputs must be in [0, 2^32), got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }

  /** Spread the low 32 bits of x to the even bit positions of a long —
    * the standard mask sequence (each step doubles the gap). */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
}

object ZOrderFunctions {
  def zorderKey(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderKey(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The identical spread/interleave as DuckDB SQL (BIGINT shifts/ANDs;
    * DuckDB's & and << operate on signed 64-bit like Java's). Masks are
    * written in decimal — DuckDB hex literals are strings. */
  def duckSpread(x: String): String = {
    val m16 = 281470681808895L      // 0x0000ffff0000ffff
    val m8 = 71777214294589695L     // 0x00ff00ff00ff00ff
    val m4 = 1085102592571150095L   // 0x0f0f0f0f0f0f0f0f
    val m2 = 3689348814741910323L   // 0x3333333333333333
    val m1 = 6148914691236517205L   // 0x5555555555555555
    val s0 = s"(($x) & 4294967295)"
    val s1 = s"((($s0 | ($s0 << 16)) & $m16))"
    val s2 = s"((($s1 | ($s1 << 8)) & $m8))"
    val s3 = s"((($s2 | ($s2 << 4)) & $m4))"
    val s4 = s"((($s3 | ($s3 << 2)) & $m2))"
    s"((($s4 | ($s4 << 1)) & $m1))"
  }

  def duckZorder(a: String, b: String): String =
    s"(${duckSpread(a)} | (${duckSpread(b)} << 1))"
}
