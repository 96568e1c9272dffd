package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  private val rows = (1L to 1000L).map(i => (s"k${i % 3}", i % 7, i.toDouble))

  test("SaltedAgg equals the direct groupBy for all decomposable aggs") {
    val df = rows.toDF("key", "spread", "v")
    val salted = SaltedAgg.aggregate(df, Seq("key"), col("spread"),
      Seq("n" -> (col("v"), "count"), "s" -> (col("v"), "sum"),
        "lo" -> (col("v"), "min"), "hi" -> (col("v"), "max")), salts = 8)
      .orderBy("key").as[(String, Long, Double, Double, Double)].collect().toList
    val direct = df.groupBy("key")
      .agg(count("v").as("n"), sum("v").as("s"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("key").as[(String, Long, Double, Double, Double)].collect().toList
    assert(salted === direct)
  }

  test("SaltedAgg rejects non-decomposable aggregates") {
    val df = rows.toDF("key", "spread", "v")
    intercept[IllegalArgumentException] {
      SaltedAgg.aggregate(df, Seq("key"), col("spread"),
        Seq("a" -> (col("v"), "avg")), salts = 4)
    }
  }

  test("SaltedJoin equals the plain inner join, non-matching keys dropped") {
    val large = rows.toDF("key", "spread", "v")
    val small = Seq(("k0", 100L), ("k1", 200L), ("kX", 999L)).toDF("key", "dim")
    val salted = SaltedJoin.join(large, small, Seq("key"), col("spread"), salts = 5)
      .groupBy("key", "dim").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("key").as[(String, Long, Long, Double)].collect().toList
    val plain = large.join(small, Seq("key"))
      .groupBy("key", "dim").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("key").as[(String, Long, Long, Double)].collect().toList
    assert(salted === plain)
    assert(!salted.exists(_._1 == "kX") && !salted.exists(_._1 == "k2"))
  }
}
