package graft
import org.apache.spark.sql.SparkSession
import graft.queries.PipelineQueries
object Prof {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val reps = sys.env.getOrElse("PROF_REPS", "3").toInt
    val qs = args.toSeq match {
      case Seq("ALL") => SparkEntry.queries.keys.toSeq.sorted
      case Nil => Seq("q_text_stats", "q_dedup_minhash_lsh", "q_dedup_ngram_jaccard")
      case xs  => xs
    }
    for (r <- 1 to reps; q <- qs)
      t(s"$q r$r")(SparkEntry.queries(q)(s, dir).count())
    s.stop()
  }
}
