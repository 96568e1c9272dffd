package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis._
object Prof2 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF2 $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    docs.count() // session + parquet init
    t("tokens_size")(docs.select(size(tokens(col("text")))).count())
    t("bpe_size")(docs.select(size(bpeTokens(col("text")))).count())
    t("sum_token_len")(docs.select(sumTokenLen(tokens(col("text")))).count())
    t("marker_count")(docs.select(markerCount(tokens(col("text")), Stopwords)).count())
    t("all_no_orderby")(docs.withColumn("w", tokens(col("text"))).select(
      col("doc_id"), length(col("text")).cast("bigint").as("n_chars"),
      size(col("w")).cast("bigint").as("n_tokens"),
      size(bpeTokens(col("text"))).cast("bigint").as("n_tokens_bpe"),
      (sumTokenLen(col("w")).cast("double") / size(col("w")).cast("double")).as("avg_token_len"),
      (markerCount(col("w"), Stopwords).cast("double") / size(col("w")).cast("double")).as("stopword_ratio")).count())
    t("full_query")(SparkEntry.queries("q_text_stats")(s, "/root/testdata/sf0.1").count())
    s.stop()
  }
}
