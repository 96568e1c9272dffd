package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only attribution probe for the q_videoseq_join residual (r18
  * verdict ask #3): the restructure to a single observable bucket
  * exchange cost 0.58→~1.0s median vs the r17 self-join shape, and the
  * judge wants the residual split across its three candidate causes —
  * Observation overhead, collect_list bucket build, pair expansion —
  * plus the alternative shapes that might recover it. Replicates the
  * videoSeqPairsFromCnt tail inline so each stage can be timed and
  * varied independently; the production query stays in
  * PipelineQueries. */
object ProfVideoseq {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def t(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROF $name%-34s $sec%8.3f s  rows=$n")
      sec
    }

    // the shared decode + count frame, warmed once (same shape as
    // videoCntCached, but locally persisted so arms below are pure tail)
    val fr = graft.pipeline.Multimodal.synthVideoSeqFrameHashes(
      s.read.parquet(s"$dir/documents.parquet")
        .filter(pmod(col("doc_id"), lit(3L)) === 2L))(s).toDF()
    val cnt = fr.groupBy("clip_id", "fh").agg(count(lit(1)).as("c"))
      .withColumn("n", sum("c").over(Window.partitionBy("clip_id")))
      .persist()
    t("cnt build (decode, cold)")(cnt.count())
    t("cnt warm scan")(cnt.count())

    def buckets = cnt.groupBy("fh")
      .agg(collect_list(struct(col("clip_id"), col("c"), col("n"))).as("ms"))

    def tail(b: DataFrame): DataFrame =
      b.filter(size(col("ms")) > 1)
        .select(explode(col("ms")).as("x"), col("ms"))
        .select(col("x"), explode(col("ms")).as("y"))
        .filter(col("x.clip_id") < col("y.clip_id"))
        .groupBy(col("x.clip_id").as("a"), col("y.clip_id").as("b"))
        .agg(sum(least(col("x.c"), col("y.c"))).as("matched"),
          max(col("x.n")).as("n_a"), max(col("y.n")).as("n_b"))
        .filter(col("matched") * 4L >= least(col("n_a"), col("n_b")) * 3L)
        .select("a", "b", "matched", "n_a", "n_b")

    // sorted-array halving: each bucket's members sorted by clip_id
    // (struct ordering = first-field ordering; clip_ids are unique per
    // bucket), pairs emitted only forward of each position — m(m-1)/2
    // generated rows instead of m², no post-filter discard
    def tailSliced(b: DataFrame): DataFrame =
      b.filter(size(col("ms")) > 1)
        .withColumn("ms", array_sort(col("ms")))
        .select(posexplode(col("ms")).as(Seq("i", "x")), col("ms"))
        .select(col("x"),
          explode(slice(col("ms"), col("i") + lit(2), size(col("ms")))).as("y"))
        .groupBy(col("x.clip_id").as("a"), col("y.clip_id").as("b"))
        .agg(sum(least(col("x.c"), col("y.c"))).as("matched"),
          max(col("x.n")).as("n_a"), max(col("y.n")).as("n_b"))
        .filter(col("matched") * 4L >= least(col("n_a"), col("n_b")) * 3L)
        .select("a", "b", "matched", "n_a", "n_b")

    for (r <- 1 to 3) {
      println(s"--- repeat $r ---")
      t("A buckets only (agg+filter)")(
        buckets.filter(size(col("ms")) > 1).count())
      t("B tail, no observe")(tail(buckets).count())
      val obs = org.apache.spark.sql.Observation()
      t("C tail + observe")(tail(buckets.observe(obs,
        coalesce(max(size(col("ms"))), lit(0)).as("max_bucket"),
        count(lit(1)).as("n_buckets"))).count())
      t("D tail sliced (m^2/2), no obs")(tailSliced(buckets).count())
      val obs2 = org.apache.spark.sql.Observation()
      t("E tail sliced + observe")(tailSliced(buckets.observe(obs2,
        coalesce(max(size(col("ms"))), lit(0)).as("max_bucket"),
        count(lit(1)).as("n_buckets"))).count())
    }
    // verify the sliced shape is result-identical
    val base = tail(buckets)
    val alt = tailSliced(buckets)
    val d1 = base.exceptAll(alt).count(); val d2 = alt.exceptAll(base).count()
    println(s"PROF sliced-vs-base diff: $d1 / $d2 (must be 0 / 0)")
    s.stop()
  }
}
