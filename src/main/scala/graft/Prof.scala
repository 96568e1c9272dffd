package graft
import org.apache.spark.sql.SparkSession
import graft.queries.PipelineQueries
object Prof {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-26s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    for (r <- 1 to 3) {
      t(s"dedup_embedding r$r")(PipelineQueries.queries("q_dedup_embedding")(s, dir).count())
      t(s"knn_brute r$r")(PipelineQueries.queries("q_knn_cosine_brute")(s, dir).count())
    }
    s.stop()
  }
}
