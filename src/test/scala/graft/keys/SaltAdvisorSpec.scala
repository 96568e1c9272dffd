package graft.keys

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SaltAdvisor against hand-built distributions: a uniform key space
  * must recommend the smallest candidate that spreads evenly; a planted
  * mega-hot key must drive the irreducible-cap report and push the
  * recommendation to the largest candidate when no n can meet the
  * bound; the per-bucket prediction must equal a direct Hash31
  * recount. */
class SaltAdvisorSpec extends SparkSuite {
  import spark.implicits._

  private def report(rows: Seq[Long], candidates: Seq[Int]) =
    SaltAdvisor.advise(rows.toDF("k"), col("k"), candidates)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("uniform keys: smallest within-tolerance candidate is recommended") {
    // 4096 distinct keys, one row each — Hash31 spreads them well at
    // small n; the advisor must pick the SMALLEST passing candidate
    val rows = (0L until 4096L)
    val rep = report(rows, Seq(4, 8, 16))
    val within = rep.collect { case (n, r) if r.getBoolean(7) => n }.toSeq.sorted
    assert(within.nonEmpty, s"no candidate within tolerance: $rep")
    val recommended = rep.collect { case (n, r) if r.getBoolean(8) => n }.toSeq
    assert(recommended === Seq(within.head))
    // report arithmetic: ideal share is exactly 1e6 when perfectly even
    rep.values.foreach { r =>
      assert(r.getLong(4) <= 1000000L && r.getLong(5) >= 1000000L,
        s"under/over must bracket ideal: $r")
    }
  }

  test("planted mega-hot key: irreducible cap reported, largest n when nothing passes") {
    // one key carries 50% of rows — no bucket count can split it, so
    // over_ppm >= n/2 * 1e6 for every n>=2 and nothing is within ±10%
    val hot = Seq.fill(1000)(7L)
    val cold = (100L until 1100L) // 1000 singleton keys
    val rep = report(hot ++ cold, Seq(4, 16, 64))
    rep.values.foreach { r =>
      assert(r.getLong(6) === 500000L, s"hot_key_share_ppm: $r") // 50%
      assert(!r.getBoolean(7), s"hot key cannot be within tolerance: $r")
      // hottest bucket carries at least the hot key: >= n/2 of ideal
      assert(r.getLong(5) >= r.getLong(0) * 500000L, s"over_ppm floor: $r")
    }
    val recommended = rep.collect { case (n, r) if r.getBoolean(8) => n }.toSeq
    assert(recommended === Seq(64L), "falls back to the largest candidate")
  }

  test("per-bucket prediction equals a direct Hash31 recount") {
    val rows = (0L until 500L) ++ Seq.fill(40)(123L)
    val df = rows.toDF("k")
    val n = 8
    val direct = df.withColumn("b", Hash31.bucket(col("k"), n))
      .groupBy("b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val predMax = (0 until n).map(b => direct.getOrElse(b.toLong, 0L)).max
    val predMin = (0 until n).map(b => direct.getOrElse(b.toLong, 0L)).min
    val r = report(rows, Seq(n))(n.toLong)
    assert(r.getLong(3) === predMax, "max_bucket_rows")
    assert(r.getLong(2) === predMin, "min_bucket_rows")
    assert(r.getLong(1) === direct.count(_._2 > 0).toLong, "used_buckets")
  }

  test("join salt plan: planted hot key gets the mean-leveling factor, uniform tail excluded") {
    // key 0: 1000 rows; keys 1..9: 100 each → total 1900, mean 190;
    // hot bound 2×mean = 380 → only key 0; factor ⌈1000/190⌉ = 6
    val rows = Seq.fill(1000)(0L) ++ (1 to 9).flatMap(k => Seq.fill(100)(k.toLong))
    val r = SaltAdvisor.joinSaltPlan(rows.toDF("k"), col("k")).collect()
    assert(r.length === 1, s"only the planted hot key is in the plan: ${r.toSeq}")
    assert(r.head.getLong(0) === 0L && r.head.getLong(1) === 1000L)
    assert(r.head.getLong(2) === 526315L) // 1000/1900 in ppm, floored
    assert(r.head.getLong(3) === 6L)
    // perfectly uniform: empty plan
    val u = SaltAdvisor.joinSaltPlan(
      (0 until 900).map(i => (i % 9).toLong).toDF("k"), col("k")).collect()
    assert(u.isEmpty)
  }

  test("CMS-screened salt plan: sketch-planned == exact-planned, screen runs map-side") {
    // q_join_salt_plan_cms's soundness argument, pinned: CMS never
    // underestimates, so every key whose true count passes the hot
    // predicate passes the SAME predicate on its (>= true) estimate —
    // the screen yields a SUPERSET of the hot keys, and the exact
    // post-filter trims collision-boosted impostors, so the sketch-
    // planned replication list is IDENTICAL to the exact planner's.
    import graft.functions.CmsFunctions._
    import graft.pipeline.Dedup.baseHash32
    val P = 32L
    // two planted hot keys over a 20k-singleton tail (the regime where
    // the exact planner's exchange carries 20k partials for nothing)
    val rows = Seq.fill(3000)(7L) ++ Seq.fill(2000)(13L) ++ (100000L until 120000L)
    // a parquet source, not a local Seq: predicate pushdown slides the
    // screen filter through any repartition onto a LocalRelation and
    // ConvertToLocalRelation then evaluates it driver-side — the plan
    // assertion needs the real distributed shape
    val tmp = java.nio.file.Files.createTempDirectory("cms_plan").toString
    rows.toDF("key").write.mode("overwrite").parquet(tmp)
    val keyed = spark.read.parquet(tmp)
      .withColumn("x", baseHash32(col("key").cast("string")))
    val g = keyed.agg(cms(col("x"))).head().getSeq[Long](0)
    val total = g.slice(0, Width).sum
    assert(total === rows.size.toLong) // grid row 0 counts every increment once
    def hot(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("key").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * P > total * 2L)
        .select("key", "cnt").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val screened = keyed.filter(cmsEstimate(typedLit(g), col("x")) * P > total * 2L)
    assert(hot(screened) === hot(keyed)) // == exact: Set((7,3000),(13,2000))
    assert(hot(keyed) === Set((7L, 3000L), (13L, 2000L)))
    // plan: the screen is evaluated BELOW the aggregation exchange —
    // rows are dropped map-side, before any shuffle
    val agg = screened.groupBy("key").agg(count(lit(1)).as("cnt"))
    val lines = agg.queryExecution.executedPlan.toString.linesIterator.toVector
    val exIdx = lines.indexWhere(_.contains("Exchange"))
    val fIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("least"))
    assert(exIdx >= 0 && fIdx > exIdx,
      s"screen filter must sit below the exchange:\n${lines.mkString("\n")}")
  }

  test("empty buckets count as maximal unevenness (under_ppm = 0)") {
    // 3 distinct keys into 64 buckets: >= 61 empty buckets
    val rep = report(Seq(1L, 2L, 3L), Seq(64))(64L)
    assert(rep.getLong(4) === 0L)
    assert(!rep.getBoolean(7))
  }
}
