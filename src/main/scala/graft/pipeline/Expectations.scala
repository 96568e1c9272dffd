package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Declarative data-quality expectations — the contract gate a
  * pipeline runs before promoting a batch: each rule yields one report
  * row (rule name, rows checked, violation count, pass flag). Absent
  * from the reference (no validation surface); the north-star lifecycle
  * extension.
  *
  * Scale shape, by rule class:
  *  - ROW-LOCAL rules (not-null, range, accepted-values, custom
  *    predicate) all fold into ONE aggregation over ONE scan of the
  *    table — `sum(violated_i)` per rule as parallel columns of a single
  *    map-side-combined agg, then an in-memory unpivot of the 1-row
  *    result. Adding a rule adds a codegen'd column, not a scan.
  *  - UNIQUENESS is `count(*) − count(DISTINCT key)` — one exchange on
  *    the key (the honest price of exactness; swap in HLL via the
  *    sketch surface when ±2% suffices at 100 TB).
  *  - REFERENTIAL integrity is a LEFT ANTI count against the dimension —
  *    broadcast when the dimension is small (the usual case), planned
  *    declaratively either way.
  * The report itself is O(#rules) rows — driver-safe by construction.
  */
object Expectations {
  sealed trait Rule { def name: String }
  /** `col` must be non-null. */
  case class NotNull(name: String, col: String) extends Rule
  /** Row-local boolean expectation: rows where `pred` is false or null
    * count as violations. */
  case class Expect(name: String, pred: Column) extends Rule
  /** `col` values must be unique (nulls ignored, as in SQL UNIQUE). */
  case class Unique(name: String, col: String) extends Rule
  /** Every non-null `col` must exist in `dimKey` of `dim`. */
  case class RefIntegrity(name: String, col: String,
                          dim: DataFrame, dimKey: String) extends Rule

  /** Run every rule against `df`; one report row per rule:
    * (rule, n_rows, n_violations, pass). Every aggregate here is 1 row,
    * so the report is assembled driver-side from O(#rules) scalars —
    * never row data. The table's total row count is computed at most
    * once, folded into whichever scan runs anyway (the row-local agg,
    * else the first uniqueness agg); a dedicated count scan happens
    * only when a ref rule is the SOLE rule class present. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).distinct.mkString(", ")}")
    val rowLocal: Seq[(String, Column)] = rules.collect {
      case NotNull(n, c) => n -> col(c).isNull
      case Expect(n, p) => n -> !coalesce(p, lit(false))
    }
    val uniques = rules.collect { case u: Unique => u }
    val refs = rules.collect { case r: RefIntegrity => r }
    var nRowsOpt: Option[Long] = None
    // one scan, one agg: n_rows + one violation counter per row-local rule
    val localReport: Seq[(String, Long, Long)] =
      if (rowLocal.isEmpty) Nil
      else {
        val row = df.agg(
          count(lit(1)).as("n_rows"),
          rowLocal.map { case (n, viol) =>
            sum(when(viol, 1L).otherwise(0L)).as(s"v_$n")
          }: _*).collect().head
        nRowsOpt = Some(row.getLong(0))
        rowLocal.zipWithIndex.map { case ((n, _), i) =>
          (n, row.getLong(0), row.getLong(i + 1))
        }
      }
    val uniqueReport = uniques.zipWithIndex.map { case (u, i) =>
      // piggyback the table count on the first unique agg if still needed
      val carryTotal = i == 0 && nRowsOpt.isEmpty && refs.nonEmpty
      val aggs = Seq(count(col(u.col)).as("checked"),
        countDistinct(col(u.col)).as("distinct")) ++
        (if (carryTotal) Seq(count(lit(1)).as("n_total")) else Nil)
      val row = df.agg(aggs.head, aggs.tail: _*).collect().head
      if (carryTotal) nRowsOpt = Some(row.getLong(2))
      (u.name, row.getLong(0), row.getLong(0) - row.getLong(1))
    }
    // ref rules stay LAZY DataFrames: the broadcast-anti plan is part of
    // the report's own plan (spec-pinned), not a driver-side side effect
    val refRows = refs.map { r =>
      val nRows = nRowsOpt.getOrElse {
        val c = df.agg(count(lit(1))).collect().head.getLong(0)
        nRowsOpt = Some(c); c
      }
      val dimKeys = r.dim.select(col(r.dimKey).as("__ref_k")).distinct()
      df.filter(col(r.col).isNotNull)
        .join(dimKeys, col(r.col) === col("__ref_k"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("rule"), lit(nRows).as("n_rows"),
          col("n_violations"))
    }
    val scalarRows = (localReport ++ uniqueReport)
      .toDF("rule", "n_rows", "n_violations")
    (scalarRows +: refRows).reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule")
  }
}
