package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: derive parquet-pushable raw-column bounds from range
  * predicates over integral division by a positive constant.
  *
  *   filter(ts div 1000 >= C)   -- not pushable (expression of ts)
  *   ==> filter(ts div 1000 >= C AND ts >= C*1000)   -- ts bound pushes
  *
  * Why: the engine's scan keys are often *derived* time units (the events
  * table stores nanos, queries filter micros = ts div 1000 — see
  * graft.queries.Tables). Without this rule the key predicate stops at a
  * post-scan Filter and the parquet reader scans every row group of every
  * bucket; with it, the derived raw bound reaches the scan, and on the
  * salted layout's per-bucket sorted files min/max row-group skipping
  * prunes exactly like an HBase start/stop-row seek (reference scan
  * pushdown: wd/AbstractRowKeyDistributor.java:76-78). At 100 TB this is
  * the difference between reading the whole table and reading the scan
  * window.
  *
  * Soundness: for k > 0, `x div k` (truncation toward zero) is monotone
  * non-decreasing in x, and the least x with `x div k >= c` is
  * lb(c) = c*k when c >= 1, and (c-1)*k + 1 when c <= 0. Hence
  *   x div k >= c  ⟺  x >= lb(c)        x div k <  c  ⟺  x < lb(c)
  *   x div k >  c  ⟺  x >= lb(c+1)      x div k <= c  ⟺  x < lb(c+1)
  *   x div k =  c  ⟹  lb(c) <= x < lb(c+1)
  * The original predicate is kept (the added conjunct is redundant, never
  * a replacement), so rewrites can only prune, never change results.
  * Bounds that would overflow Long are skipped.
  */
object DivRangePushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val derived = conjuncts.flatMap(derive)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .distinct
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduce(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** Least x with x div k >= c (k > 0); None on Long overflow. Takes the
    * threshold as BigInt so callers can form the successor c+1 without
    * wrapping at Long.MaxValue (c+1 in Long arithmetic would wrap to
    * Long.MinValue and yield an always-false `x < lb` conjunct that
    * silently drops every row). */
  private def lowerBound(c: BigInt, k: Long): Option[Long] = {
    val b = if (c >= 1) c * k else (c - 1) * k + 1
    if (b.isValidLong) Some(b.toLong) else None
  }

  private object DivByConst {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case IntegralDivide(a: Attribute, Literal(k: Long, LongType), _) if k > 0 =>
        Some((a, k))
      case _ => None
    }
  }

  private def derive(p: Expression): Seq[Expression] = p match {
    case GreaterThanOrEqual(DivByConst(a, k), Literal(c: Long, LongType)) =>
      lowerBound(BigInt(c), k).map(b => GreaterThanOrEqual(a, Literal(b, LongType))).toSeq
    case GreaterThan(DivByConst(a, k), Literal(c: Long, LongType)) =>
      lowerBound(BigInt(c) + 1, k).map(b => GreaterThanOrEqual(a, Literal(b, LongType))).toSeq
    case LessThan(DivByConst(a, k), Literal(c: Long, LongType)) =>
      lowerBound(BigInt(c), k).map(b => LessThan(a, Literal(b, LongType))).toSeq
    case LessThanOrEqual(DivByConst(a, k), Literal(c: Long, LongType)) =>
      lowerBound(BigInt(c) + 1, k).map(b => LessThan(a, Literal(b, LongType))).toSeq
    case EqualTo(DivByConst(a, k), Literal(c: Long, LongType)) =>
      (lowerBound(BigInt(c), k).map(b => GreaterThanOrEqual(a, Literal(b, LongType))) ++
        lowerBound(BigInt(c) + 1, k).map(b => LessThan(a, Literal(b, LongType)))).toSeq
    // literal-on-left mirrors
    case GreaterThanOrEqual(l @ Literal(_, LongType), d @ DivByConst(_, _)) =>
      derive(LessThanOrEqual(d, l))
    case GreaterThan(l @ Literal(_, LongType), d @ DivByConst(_, _)) =>
      derive(LessThan(d, l))
    case LessThan(l @ Literal(_, LongType), d @ DivByConst(_, _)) =>
      derive(GreaterThan(d, l))
    case LessThanOrEqual(l @ Literal(_, LongType), d @ DivByConst(_, _)) =>
      derive(GreaterThanOrEqual(d, l))
    case EqualTo(l @ Literal(_, LongType), d @ DivByConst(_, _)) =>
      derive(EqualTo(d, l))
    case _ => Seq.empty
  }
}
