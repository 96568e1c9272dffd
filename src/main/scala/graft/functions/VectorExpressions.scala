package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns — a custom Catalyst
  * `Expression` with `doGenCode` (SURVEY.md §7.3's anticipated custom:
  * the one [EXT] hot-loop the built-ins can't express efficiently).
  *
  * Why custom: Spark's higher-order functions (`aggregate`/`transform`)
  * evaluate their lambda INTERPRETED, one function call per element; an
  * unrolled 64-term expression tree blows up generated-code size and
  * falls out of JIT. This expression compiles to a tight primitive loop
  * over `UnsafeArrayData`, stays inside whole-stage codegen, and is the
  * difference between scan-speed similarity search and a 3× slower
  * interpreted pipeline at 100 TB.
  *
  * Semantics: sequential left-fold Σ a[i]·b[i] starting at 0.0 — the
  * SAME association order as DuckDB `list_reduce`, so results stay
  * bit-identical to the oracle. Null elements are not supported
  * (embedding vectors are dense); a null array yields null.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      s"""
      final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $sum = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        $sum += $a.getDouble($i) * $b.getDouble($i);
      }
      ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API front door for the custom vector expressions. */
object VectorFunctions {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
