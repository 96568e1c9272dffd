package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Count-min sketch grid (graft.functions.CountMinSketch): the CMS
  * contract — never underestimates, exact when a key's buckets are
  * collision-free, partition-count invariant (partial/final merge is
  * elementwise add), zero grid for empty input. */
class CmsSketchSpec extends SparkSuite {
  import CmsFunctions._
  import spark.implicits._

  private def grid(xs: Seq[Long], parts: Int): Seq[Long] =
    xs.toDF("x").repartition(parts)
      .agg(cms(col("x")).as("g")).head().getSeq[Long](0)

  test("estimate >= exact for every key; exact sums preserved per row") {
    // 1000 keys, key i appearing (i % 7) + 1 times
    val xs = (0L until 1000L).flatMap(i => Seq.fill((i % 7).toInt + 1)(i))
    val g = grid(xs, 8)
    assert(g.length == Depth * Width)
    // every row of the grid holds ALL the stream's increments
    (0 until Depth).foreach { r =>
      assert(g.slice(r * Width, (r + 1) * Width).sum == xs.length.toLong)
    }
    val est = xs.distinct.toDF("x")
      .withColumn("e", cmsEstimate(typedLit(g), col("x")))
      .as[(Long, Long)].collect().toMap
    val exact = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    exact.foreach { case (k, c) => assert(est(k) >= c, s"key $k underestimated") }
  }

  test("merge is partition-count invariant (elementwise add)") {
    val xs = (0L until 5000L).map(i => i * 2654435761L % 4294967296L)
    assert(grid(xs, 1) == grid(xs, 16))
  }

  test("empty input evaluates to the all-zero grid, not null") {
    val g = Seq.empty[Long].toDF("x").agg(cms(col("x")).as("g"))
      .head().getSeq[Long](0)
    assert(g.length == Depth * Width && g.forall(_ == 0L))
  }

  test("few enough keys -> collision-free estimates are EXACT") {
    // 32 keys over 1024 buckets x 4 rows: collisions in all 4 rows for
    // some key are overwhelmingly unlikely with these fixed hashes;
    // assert exactness key by key (deterministic, so stable forever)
    val xs = (0L until 32L).flatMap(i => Seq.fill(5)(i))
    val g = grid(xs, 4)
    val est = (0L until 32L).toDF("x")
      .withColumn("e", cmsEstimate(typedLit(g), col("x")))
      .as[(Long, Long)].collect().toMap
    assert(est.values.forall(_ == 5L))
  }

  test("input outside [0, 2^32) is refused loudly, not mis-bucketed") {
    // the SQL surface type-checks only LongType; the 32-bit contract is
    // enforced at runtime: a negative hash would floor-mod into a
    // negative bucket (AIOOBE), |x| >= 2^44 would silently overflow x*A
    // in Spark while the DuckDB oracle twin errors — both refuse instead
    for (bad <- Seq(-1L, 1L << 32, Long.MinValue, 1L << 44)) {
      val e = intercept[org.apache.spark.SparkException] {
        Seq(bad).toDF("x").agg(cms(col("x"))).head()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("outside [0, 2^32)")), s"for input $bad")
    }
    // boundary values are accepted
    val g = Seq(0L, 0xFFFFFFFFL).toDF("x").agg(cms(col("x"))).head().getSeq[Long](0)
    assert(g.sum == 2L * Depth)
  }

  test("registered as a SQL aggregate via GraftExtensions") {
    Seq(1L, 1L, 2L).toDF("x").createOrReplaceTempView("cms_in")
    val g = spark.sql("SELECT count_min_sketch_grid(x) AS g FROM cms_in")
      .head().getSeq[Long](0)
    assert(g.length == Depth * Width && g.sum == 3L * Depth)
  }
}
