package graft.keys

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class KeysSpec extends SparkSuite {
  import spark.implicits._

  /** Plain-Scala reimplementation of the reference hash with Java int
    * semantics (wd/RowKeyDistributorByHashPrefix.java:102-108) over the
    * 8 big-endian bytes of a long — the independent oracle for the
    * closed-form column expression. */
  private def javaHash32(key: Long): Int = {
    var h = 0
    var i = 7
    while (i >= 0) {
      h = 31 * h + ((key >>> (i * 8)) & 0xff).toInt
      i -= 1
    }
    h
  }

  private val nonNegLong = Gen.chooseNum(0L, Long.MaxValue)

  test("Hash31 column expression == Java int semantics, 2000 random keys") {
    val keys = Gen.listOfN(2000, nonNegLong).sample.get
    val got = keys.toDF("k").select(Hash31.hash32($"k")).as[Long].collect()
    val exp = keys.map(k => javaHash32(k).toLong)
    assert(got.toSeq == exp)
  }

  test("bucket = pmod(hash, n) stays in range and is deterministic") {
    val keys = (0L until 5000L).toDF("k")
    for (n <- Seq(1, 2, 15, 16, 127, 256)) {
      val b = keys.select(Hash31.bucket($"k", n)).as[Long].collect()
      assert(b.forall(x => x >= 0 && x < n), s"n=$n out of range")
      val b2 = keys.select(Hash31.bucket($"k", n)).as[Long].collect()
      assert(b.toSeq == b2.toSeq)
    }
  }

  test("hash bucket distribution is even-ish (±10% intent of the reference evenness test)") {
    // mirrors wd-test/OneByteSimpleHashTest.java:83-100 with the INTENDED
    // tolerance (SURVEY.md §5.3) — sequential keys, 16 buckets
    val n = 16
    val rows = 16000
    val counts = (0L until rows.toLong).toDF("k")
      .groupBy(Hash31.bucket($"k", n).as("b")).count()
      .as[(Long, Long)].collect().toMap
    assert(counts.size == n, s"only ${counts.size} of $n buckets hit")
    val avg = rows.toDouble / n
    counts.foreach { case (b, c) =>
      assert(math.abs(c - avg) / avg < 0.10, s"bucket $b count $c vs avg $avg")
    }
  }

  test("salt → unsalt round-trip for prefix lengths 0, 1, 2") {
    val cases = Gen.listOfN(200, Gen.zip(nonNegLong, Gen.chooseNum(0, 255))).sample.get ++
      Seq((0L, 0), (Long.MaxValue, 255), (1L, 1))
    for (pl <- Seq(0, 1, 2)) {
      val got = cases.toDF("k", "b")
        .select($"k", Salt.originalKey(Salt.saltedKey($"b", $"k", pl), pl).as("r"))
        .as[(Long, Long)].collect()
      got.foreach { case (k, r) => assert(r == k, s"pl=$pl k=$k got=$r") }
    }
  }

  test("salted binary keys sort like numeric keys within a bucket (unsigned lexicographic)") {
    // HBase order = unsigned lexicographic byte[]; big-endian encoding of
    // non-negative longs must preserve numeric order (SURVEY.md §7.5)
    val keys = Gen.listOfN(500, nonNegLong).sample.get.distinct
    val hexes = keys.toDF("k")
      .select($"k", hex(KeyCodec.beBytes8($"k")).as("h"))
      .as[(Long, String)].collect()
    val byNumeric = hexes.sortBy(_._1).map(_._2).toSeq
    val byLex = hexes.map(_._2).sorted.toSeq // fixed-width hex = byte order
    assert(byNumeric == byLex)
  }

  test("fan-out enumerates exactly buckets 0..n-1 per key (O5)") {
    val n = 12
    val out = Seq(7L, 8L).toDF("k")
      .select($"k", Salt.allBuckets(n).as("b"))
      .as[(Long, Int)].collect()
    assert(out.length == 2 * n)
    assert(out.filter(_._1 == 7L).map(_._2).sorted.toSeq == (0 until n))
  }

  test("distributor config codec round-trips (O12, Parametrizable semantics)") {
    val all = Seq(HashPrefix(16), RoundRobin(12, "event_id"), Identity, MultiBytePrefix(3))
    all.foreach { d =>
      assert(DistributorCodec.decode(DistributorCodec.encode(d)) == d)
    }
    intercept[IllegalArgumentException](DistributorCodec.decode("Nope--1"))
    intercept[IllegalArgumentException](HashPrefix(257))
    intercept[IllegalArgumentException](RoundRobin(128, "x")) // ref max 127
  }

  test("round-robin assigns exact cyclic counts (O1 batch translation)") {
    val n = 12
    val df = (0L until 120L).toDF("event_id")
    val counts = RoundRobin(n, "event_id").withBucket(df, $"event_id")
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(counts.size == n && counts.values.forall(_ == 10L))
  }

  test("identity distributor: empty prefix, single bucket (degenerate salting)") {
    val df = (0L until 10L).toDF("k")
    val b = Identity.withBucket(df, $"k").select("bucket").as[Long].collect()
    assert(b.forall(_ == 0L))
    assert(Identity.prefixLength == 0)
    // prefixLength 0 → salted key IS the original key
    val k = Seq(42L).toDF("k")
      .select(Salt.originalKey(Salt.saltedKey(lit(0), $"k", 0), 0)).as[Long].head()
    assert(k == 42L)
  }
}
