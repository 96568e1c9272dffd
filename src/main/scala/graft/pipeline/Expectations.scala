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
    * (rule, n_rows, n_violations, pass). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal: Seq[(String, Column)] = rules.collect {
      case NotNull(n, c) => n -> col(c).isNull
      case Expect(n, p) => n -> !coalesce(p, lit(false))
    }
    // one scan, one agg: n_rows + one violation counter per row-local rule
    val localAgg = df.agg(
      count(lit(1)).as("n_rows"),
      rowLocal.map { case (n, viol) =>
        sum(when(viol, 1L).otherwise(0L)).as(s"v_$n")
      }: _*)
    val localRows = localAgg.select(
      col("n_rows") +: rowLocal.map { case (n, _) => col(s"v_$n") }: _*)
    val uniques = rules.collect { case u: Unique => u }
    val refs = rules.collect { case r: RefIntegrity => r }
    val uniqueRows = uniques.map { u =>
      df.agg(count(col(u.col)).as("checked"),
          countDistinct(col(u.col)).as("distinct"))
        .select(lit(u.name).as("rule"),
          col("checked").as("n_rows"),
          (col("checked") - col("distinct")).as("n_violations"))
    }
    val refRows = refs.map { r =>
      val dimKeys = r.dim.select(col(r.dimKey).as("__ref_k")).distinct()
      df.filter(col(r.col).isNotNull)
        .join(dimKeys, col(r.col) === col("__ref_k"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("rule"), lit(null).cast("bigint").as("n_rows"),
          col("n_violations"))
    }
    // unpivot the 1-row local agg driver-side (O(#rules), not row data)
    val localRow = localRows.collect().head
    val nRows = localRow.getLong(0)
    val localReport = rowLocal.zipWithIndex.map { case ((n, _), i) =>
      (n, nRows, localRow.getLong(i + 1))
    }.toDF("rule", "n_rows", "n_violations")
    val all = (localReport +: (uniqueRows ++ refRows))
      .reduce(_.unionByName(_))
    // ref rules have no own row count; report the table's
    all
      .withColumn("n_rows", coalesce(col("n_rows"), lit(nRows)))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule")
  }
}
