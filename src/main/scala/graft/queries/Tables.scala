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

  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader only accepts as a bigint of epoch nanos (legacy nanosAsLong
    * conf — set per-session here so queries are self-contained on any
    * caller's session). We immediately derive `ts_us` (epoch micros,
    * integer division — the data is micro-precision) which matches
    * DuckDB's epoch_us(ts) exactly. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, s"$dir/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .drop("ts")
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
