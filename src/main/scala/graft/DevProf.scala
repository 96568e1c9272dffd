package graft
import org.apache.spark.sql.SparkSession
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries("q_salt_roundrobin_dist")
    val df = fn(spark, "/root/testdata/sf0.1")
    df.count()
    val t0 = System.nanoTime()
    fn(spark, "/root/testdata/sf0.1").count()
    println(f"steady: ${(System.nanoTime()-t0)/1e6}%.0f ms")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
