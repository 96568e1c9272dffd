package graft.functions

import graft.SparkSuite
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class MinHashSketchSpec extends SparkSuite {

  test("sketch equals the K independent min-aggregates, slot for slot") {
    import spark.implicits._
    val xs = Seq((1L, 7L), (1L, 123456789L), (1L, 4294967290L),
      (2L, 42L), (3L, 0L), (3L, 999999999L)).toDF("doc_id", "x")
    val viaAggs = xs.groupBy("doc_id")
      .agg(Dedup.minhashAggs("x").head, Dedup.minhashAggs("x").tail: _*)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    val viaSketch = xs.groupBy("doc_id")
      .agg(MinHashFunctions.minhashSketch(col("x")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSketch === viaAggs)
  }

  test("all-null input yields a null signature") {
    import spark.implicits._
    val xs = Seq((1L, None: Option[Long]), (1L, None)).toDF("doc_id", "x")
    val got = xs.groupBy("doc_id")
      .agg(MinHashFunctions.minhashSketch(col("x")).as("sig")).collect()
    assert(got.length == 1 && got(0).isNullAt(1))
  }

  test("partial/final merge across many partitions matches single-pass") {
    import spark.implicits._
    val xs = (0L until 10000L).map(i => (i % 7, i * 2654435761L % 4294967296L))
      .toDF("g", "x").repartition(16)
    val sk = xs.groupBy("g").agg(MinHashFunctions.minhashSketch(col("x")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = xs.groupBy("g")
      .agg(Dedup.minhashAggs("x").head, Dedup.minhashAggs("x").tail: _*)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    assert(sk === agg)
  }

  test("registered as a SQL aggregate via GraftExtensions") {
    import spark.implicits._
    Seq((1L, 5L), (1L, 6L)).toDF("doc_id", "x").createOrReplaceTempView("mh_in")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sketch(x) AS sig FROM mh_in GROUP BY doc_id")
      .collect()
    assert(viaSql.length == 1 && viaSql(0).getSeq[Long](1).length == Dedup.K)
  }
}
