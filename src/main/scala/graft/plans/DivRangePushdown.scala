package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: derive parquet-pushable raw-column bounds from range
  * predicates over a *derived micros view* of a raw column — integral
  * division by a positive constant, and `unix_micros` over a (possibly
  * NTZ-cast) timestamp column:
  *
  *   filter(ts div 1000 >= C)      -- not pushable (expression of ts)
  *   ==> ... AND ts >= C*1000      -- raw nanos bound pushes
  *   filter(unix_micros(cast(ts as timestamp)) >= C)
  *   ==> ... AND ts >= micros-literal(C + zone offset)  -- ts bound pushes
  *
  * Why: the engine's scan keys are often *derived* time units (the events
  * table has shipped as both TIMESTAMP(NANOS)-as-bigint and naive
  * TIMESTAMP(MICROS); queries filter the canonical epoch-micros key —
  * see graft.queries.Tables). Without this rule the key predicate stops
  * at a post-scan Filter and the parquet reader scans every row group of
  * every bucket; with it, the derived raw bound reaches the scan, and on
  * the salted layout's per-bucket sorted files min/max row-group skipping
  * prunes exactly like an HBase start/stop-row seek (reference scan
  * pushdown: wd/AbstractRowKeyDistributor.java:76-78). At 100 TB this is
  * the difference between reading the whole table and reading the scan
  * window.
  *
  * Soundness, div view: for k > 0, `x div k` (truncation toward zero) is
  * monotone non-decreasing in x, and the least x with `x div k >= c` is
  * lb(c) = c*k when c >= 1, and (c-1)*k + 1 when c <= 0. Hence
  *   x div k >= c  ⟺  x >= lb(c)        x div k <  c  ⟺  x < lb(c)
  *   x div k >  c  ⟺  x >= lb(c+1)      x div k <= c  ⟺  x < lb(c+1)
  *   x div k =  c  ⟹  lb(c) <= x < lb(c+1)
  * Soundness, micros view: `unix_micros(ts)` IS the TimestampType
  * internal value (an exact order-preserving bijection), so every
  * comparison maps 1:1 onto the raw column. For a TIMESTAMP_NTZ column
  * cast to TIMESTAMP the bijection additionally shifts by the zone
  * offset; that is only constant — and the rewrite only fires — when the
  * cast's zone has fixed-offset rules (UTC here; a DST zone's shift is
  * value-dependent and non-injective, so no bound is derived).
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

  /** A raw column seen through an order-preserving Long-valued view:
    * (raw attribute, raw literal type, offset). A micros bound `b` on the
    * view corresponds to the raw internal value `b + offset`. */
  private type View = (Attribute, DataType, Long)

  /** The zone's constant offset in micros, iff its rules are fixed-offset
    * (a DST zone has no constant — and no injective — shift). */
  private def fixedOffsetMicros(tz: Option[String]): Option[Long] =
    tz.flatMap { id =>
      val rules = org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(id).getRules
      if (rules.isFixedOffset)
        Some(rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds * 1000000L)
      else None
    }

  /** Long-valued micros views over a raw column, including the raw Long
    * column itself (offset 0). */
  private object LongView {
    def unapply(e: Expression): Option[View] = e match {
      case a: Attribute if a.dataType == LongType => Some((a, LongType, 0L))
      case UnixMicros(a: Attribute) if a.dataType == TimestampType =>
        Some((a, TimestampType, 0L))
      case UnixMicros(c @ Cast(a: Attribute, TimestampType, _, _))
          if a.dataType == TimestampNTZType =>
        fixedOffsetMicros(c.timeZoneId).map(off => (a, TimestampNTZType, off))
      case _ => None
    }
  }

  /** Only the non-trivial views (a bare attribute comparison is already
    * pushable — rewriting it would loop). */
  private object TsView {
    def unapply(e: Expression): Option[View] = e match {
      case _: Attribute => None
      case LongView(v)  => Some(v)
      case _            => None
    }
  }

  private object DivByConst {
    def unapply(e: Expression): Option[(View, Long)] = e match {
      case IntegralDivide(LongView(v), Literal(k: Long, LongType), _) if k > 0 =>
        Some((v, k))
      case _ => None
    }
  }

  /** raw >= (internal value of micros bound b through view v); None on
    * Long overflow of the shifted bound. */
  private def geRaw(v: View, b: BigInt): Option[Expression] = {
    val s = b + v._3
    if (s.isValidLong) Some(GreaterThanOrEqual(v._1, Literal(s.toLong, v._2))) else None
  }
  private def gtRaw(v: View, b: BigInt): Option[Expression] = {
    val s = b + v._3
    if (s.isValidLong) Some(GreaterThan(v._1, Literal(s.toLong, v._2))) else None
  }
  private def ltRaw(v: View, b: BigInt): Option[Expression] = {
    val s = b + v._3
    if (s.isValidLong) Some(LessThan(v._1, Literal(s.toLong, v._2))) else None
  }
  private def leRaw(v: View, b: BigInt): Option[Expression] = {
    val s = b + v._3
    if (s.isValidLong) Some(LessThanOrEqual(v._1, Literal(s.toLong, v._2))) else None
  }
  private def eqRaw(v: View, b: BigInt): Option[Expression] = {
    val s = b + v._3
    if (s.isValidLong) Some(EqualTo(v._1, Literal(s.toLong, v._2))) else None
  }

  private def derive(p: Expression): Seq[Expression] = p match {
    // division view: monotone but many-to-one — successor/floor math
    case GreaterThanOrEqual(DivByConst(v, k), Literal(c: Long, LongType)) =>
      lowerBound(BigInt(c), k).flatMap(b => geRaw(v, BigInt(b))).toSeq
    case GreaterThan(DivByConst(v, k), Literal(c: Long, LongType)) =>
      lowerBound(BigInt(c) + 1, k).flatMap(b => geRaw(v, BigInt(b))).toSeq
    case LessThan(DivByConst(v, k), Literal(c: Long, LongType)) =>
      lowerBound(BigInt(c), k).flatMap(b => ltRaw(v, BigInt(b))).toSeq
    case LessThanOrEqual(DivByConst(v, k), Literal(c: Long, LongType)) =>
      lowerBound(BigInt(c) + 1, k).flatMap(b => ltRaw(v, BigInt(b))).toSeq
    case EqualTo(DivByConst(v, k), Literal(c: Long, LongType)) =>
      (lowerBound(BigInt(c), k).flatMap(b => geRaw(v, BigInt(b))) ++
        lowerBound(BigInt(c) + 1, k).flatMap(b => ltRaw(v, BigInt(b)))).toSeq
    // micros view: an exact bijection — comparisons map 1:1
    case GreaterThanOrEqual(TsView(v), Literal(c: Long, LongType)) =>
      geRaw(v, BigInt(c)).toSeq
    case GreaterThan(TsView(v), Literal(c: Long, LongType)) =>
      gtRaw(v, BigInt(c)).toSeq
    case LessThan(TsView(v), Literal(c: Long, LongType)) =>
      ltRaw(v, BigInt(c)).toSeq
    case LessThanOrEqual(TsView(v), Literal(c: Long, LongType)) =>
      leRaw(v, BigInt(c)).toSeq
    case EqualTo(TsView(v), Literal(c: Long, LongType)) =>
      eqRaw(v, BigInt(c)).toSeq
    // literal-on-left mirrors
    case GreaterThanOrEqual(l @ Literal(_, LongType), d) if isView(d) =>
      derive(LessThanOrEqual(d, l))
    case GreaterThan(l @ Literal(_, LongType), d) if isView(d) =>
      derive(LessThan(d, l))
    case LessThan(l @ Literal(_, LongType), d) if isView(d) =>
      derive(GreaterThan(d, l))
    case LessThanOrEqual(l @ Literal(_, LongType), d) if isView(d) =>
      derive(GreaterThanOrEqual(d, l))
    case EqualTo(l @ Literal(_, LongType), d) if isView(d) =>
      derive(EqualTo(d, l))
    case _ => Seq.empty
  }

  private def isView(e: Expression): Boolean = e match {
    case DivByConst(_, _) => true
    case TsView(_)        => true
    case _                => false
  }
}
