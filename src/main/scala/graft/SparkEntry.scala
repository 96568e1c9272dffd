package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the salted ordered range scan (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.queries("q_range_scan_ordered")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ AnalyticQueries.queries ++ PipelineQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ AnalyticQueries.oracle ++ PipelineQueries.oracle
  /** Queries backed by a persisted index built once per process —
    * Bench warms these untimed (see PipelineQueries.indexBacked). */
  def indexBackedQueries: Seq[String] = PipelineQueries.indexBacked
}
