package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness table loaders (TESTDATA.md). */
object Tables {
  /** Parquet schema cache: `spark.read.parquet` with no schema runs a
    * footer-inference JOB per call (~40 ms of driver+task latency) —
    * per QUERY, since every builder reloads its tables. The schema of a
    * given path never changes within a run (and the driver's testdata
    * never changes at all), so infer once per path and hand the reader
    * an explicit schema thereafter — scans skip straight to planning.
    * Keyed by full path: different SFs of the same table coexist. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
  private def read(s: SparkSession, path: String): DataFrame = {
    val sch = schemaCache.computeIfAbsent(path, p => s.read.parquet(p).schema)
    s.read.schema(sch).parquet(path)
  }

  /** `events.parquet` has shipped with two physical encodings of `ts`
    * across driver testdata generations: TIMESTAMP(NANOS) — which Spark's
    * vectorized reader only accepts as a bigint of epoch nanos (legacy
    * nanosAsLong conf, set per-session here so queries are
    * self-contained on any caller's session) — and naive
    * TIMESTAMP(MICROS), which Spark 4 reads as TIMESTAMP_NTZ. Either way
    * we immediately derive the engine's canonical `ts_us` key (epoch
    * micros as BIGINT), which matches DuckDB's epoch_us(ts) exactly —
    * for the NTZ form that equivalence needs the session zone pinned
    * UTC, so it is pinned here alongside nanosAsLong. Range predicates
    * over the derived column reach the parquet scan via
    * [[graft.plans.DivRangePushdown]], which understands both
    * derivations (`ts div 1000` and `unix_micros(cast(ts))`). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = read(s, s"$dir/events.parquet")
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr("unix_micros(cast(ts as timestamp))")
      case _ => expr("unix_micros(ts)")
    }
    raw.withColumn("ts_us", tsUs).drop("ts")
  }

  def lineitem(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/part.parquet")
  def nation(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/nation.parquet")
  def region(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/region.parquet")
  def documents(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame =
    read(s, s"$dir/embeddings.parquet")

  /** Exact money arithmetic: cast to DECIMAL before aggregating (sum order
    * then can't perturb the result across engines), DOUBLE at the output
    * boundary (schema parity with DuckDB). */
  def dec(c: org.apache.spark.sql.Column, scale: Int = 2): org.apache.spark.sql.Column =
    c.cast(s"decimal(18,$scale)")
}
