package graft.queries

import graft.{SparkEntry, SparkSuite}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** q_phash_join semantics the DuckDB oracle cannot see: the band
  * pigeonhole's ZERO-FALSE-NEGATIVE contract against an in-test
  * brute-force bit_count join (banding is an execution strategy — the
  * pair SET must be identical), the planted-pair recall over the real
  * codec path, and the plan shape the 100 TB story rests on (band
  * equi-join, never a cross join of the hash corpus). */
class PhashJoinSpec extends SparkSuite {

  test("hammingBandRanges: k+1 disjoint bands covering all 64 bits, widths within 1") {
    (0 to 63).foreach { k =>
      val bands = Dedup.hammingBandRanges(k)
      assert(bands.size == k + 1, s"k=$k")
      assert(bands.map(_._2).sum == 64, s"k=$k widths ${bands.map(_._2)}")
      assert(bands.map(_._2).max - bands.map(_._2).min <= 1, s"k=$k")
      // contiguity: each band starts where the previous ended
      bands.sliding(2).foreach {
        case Seq((o1, w1), (o2, _)) => assert(o2 == o1 + w1, s"k=$k")
        case _ => ()
      }
      assert(bands.head._1 == 0 && bands.last._1 + bands.last._2 == 64)
    }
    intercept[IllegalArgumentException](Dedup.hammingBandRanges(-1))
    intercept[IllegalArgumentException](Dedup.hammingBandRanges(64))
  }

  test("exact pair set vs brute-force bit_count over seeded random hashes") {
    import spark.implicits._
    // clustered randoms: low-entropy high bits force band collisions AND
    // identical-hash groups, exercising collapse + expansion; seeded so
    // the test is deterministic
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      val base = rnd.nextLong() & 0x00000000FFFFFFFFL
      val noise = (0 until rnd.nextInt(4)).foldLeft(0L)((acc, _) =>
        acc | (1L << rnd.nextInt(64)))
      (i.toLong, base ^ noise)
    }
    val df = rows.toDF("id", "hsh")
    for (k <- Seq(0, 3, 6)) {
      val got = Dedup.hammingNearDupPairs(df, "id", "hsh", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = (for {
        (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb).toLong if d <= k
      } yield (ia, ib, d)).toSet
      assert(got == brute,
        s"k=$k: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    }
  }

  test("q_phash_join: every planted near-dup pair found, nothing past the radius") {
    val out = SparkEntry.queries("q_phash_join")(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val pairs = out.map(_._1).toSet
    val ids = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(pmod(col("doc_id"), lit(3L)) === 0L)
      .select("doc_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    ids.foreach { id =>
      assert(pairs.contains((id, id + 100000L)),
        s"planted near-dup pair ($id, ${id + 100000L}) missed")
    }
    assert(out.forall(_._2 <= 6L), "a pair past the radius survived the verify")
  }

  test("bucketStat surfaces a degenerate band as a number, not an OOM") {
    import spark.implicits._
    // plant the degenerate corpus the scaladoc warns about: 40 hashes
    // sharing the whole low half (band values collide) + 10 diverse
    val rows = (0 until 40).map(i => (i.toLong, (i.toLong << 56))) ++
      (0 until 10).map(i => (100L + i, 0x0123456789ABCDEFL ^ (255L << (i * 4))))
    val obs = org.apache.spark.sql.Observation()
    val out = Dedup.hammingNearDupPairs(rows.toDF("id", "hsh"), "id", "hsh",
      k = 3, bucketStat = Some(obs))
    out.count() // one action completes the observation
    val m = obs.get
    val maxBucket = m("max_bucket").asInstanceOf[Int]
    // the 40 planted hashes differ only in their top byte, so the three
    // LOW bands (k=3 → 4×16-bit bands) each hold all 40 as one bucket
    assert(maxBucket >= 40, s"max_bucket=$maxBucket — hot bucket invisible")
    assert(m("n_buckets").asInstanceOf[Long] > 0L)
  }

  test("q_phash_join plans band equi-joins — no cross join, no BNLJ") {
    val p = SparkEntry.queries("q_phash_join")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cross join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$p")
  }
}
