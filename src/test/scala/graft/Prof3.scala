package graft
import org.apache.spark.sql.SparkSession
object Prof3 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"==== $q ====")
      SparkEntry.queries(q)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
