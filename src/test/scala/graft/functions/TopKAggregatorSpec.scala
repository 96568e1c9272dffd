package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSuite {
  import spark.implicits._

  test("topK keeps the k best by (score desc, id asc), stable under partitioning") {
    val rows = (1L to 1000L).map(i => ("g", (i % 100).toDouble, i))
    for (parts <- Seq(1, 7, 32)) {
      val got = rows.toDF("g", "score", "id").repartition(parts)
        .groupBy("g").agg(TopKByScore.topK(5)(col("score"), col("id")).as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e._1"), col("e._2")).as[(Double, Long)].collect().toList
      // score 99 occurs for ids 99, 199, ..., 999 → ties break by id asc
      assert(got === List((99.0, 99L), (99.0, 199L), (99.0, 299L), (99.0, 399L), (99.0, 499L)),
        s"parts=$parts")
    }
  }

  test("topK with fewer rows than k returns them all, ordered") {
    val got = Seq(("g", 1.0, 10L), ("g", 3.0, 30L), ("g", 2.0, 20L))
      .toDF("g", "score", "id")
      .groupBy("g").agg(TopKByScore.topK(10)(col("score"), col("id")).as("tk"))
      .select(explode(col("tk")).as("e")).select(col("e._1")).as[Double].collect().toList
    assert(got === List(3.0, 2.0, 1.0))
  }
}
