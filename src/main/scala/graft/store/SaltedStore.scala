package graft.store

import graft.keys._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted bucketed table layout — the write path of SURVEY.md §3.1.
  *
  * The reference's write path salts each key and lets HBase route the put
  * to the region owning the salted key (reference README:40-47,
  * wd-test/RowKeyDistributorTestBase.java:144-147). The Spark-native
  * analog is a bucketed, sorted parquet layout:
  *
  *   df → withColumn(bucket, salt) → repartition(bucket)   (the one shuffle
  *        = the node boundary) → sortWithinPartitions(key) →
  *        write.partitionBy(bucket)
  *
  * Each `bucket=i/` directory is the analog of the region(s) owning
  * prefix i: writes to the N buckets proceed on N executors concurrently
  * (the entire point of the reference), and each bucket's files are
  * sorted by key so range scans get parquet min/max row-group skipping —
  * the analog of HBase start/stop-row seeks.
  *
  * At 100 TB: one narrow stage + one hash shuffle on a small int key;
  * no driver-side work; bucket count chosen to match write parallelism.
  * The key column is stored unsalted alongside the bucket column, so
  * unsalting (O4) is free at read and Catalyst can prune partitions on
  * `bucket = hash(k)` for point gets.
  */
object SaltedStore {
  /** Write `df` as a salted bucketed table at `path`. `keyCol` must be a
    * non-negative BIGINT column (timestamps: pass `unix_micros(ts)`).
    * `format`: any Spark batch sink — parquet (default; columnar +
    * min/max row-group skipping), orc (same properties), json/csv
    * (interchange; no statistics, so range scans lose row-group pruning
    * — the bucket partition pruning still applies). */
  def write(df: DataFrame, keyCol: Column, dist: Distributor, path: String,
            mode: String = "overwrite", format: String = "parquet"): Unit = {
    dist
      .withBucket(df, keyCol)
      .repartition(col("bucket"))
      .sortWithinPartitions(keyCol)
      .write
      .partitionBy("bucket")
      .mode(mode)
      .format(format)
      .save(path)
  }

  /** Read a salted bucketed table back. The `bucket` partition column
    * comes back as a partition-pruning-capable column. For schemaless
    * formats (csv) pass the schema via `schemaDDL` to avoid inference. */
  def read(spark: SparkSession, path: String, format: String = "parquet",
           schemaDDL: Option[String] = None): DataFrame = {
    val r = spark.read.format(format)
    schemaDDL.fold(r)(s => r.schema(s)).load(path)
  }
}
