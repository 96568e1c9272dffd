package graft.functions

import graft.SparkSuite
import graft.functions.WordShingles.wordShingles
import org.apache.spark.sql.functions._

class ShingleSpec extends SparkSuite {
  import spark.implicits._

  test("WordShingles emits every n-token window, joined by single spaces") {
    val out = Seq((1L, "a b c d")).toDF("id", "text")
      .select(col("id"), wordShingles(split(col("text"), " "), 3).as(Seq("pos", "s")))
      .as[(Long, Int, String)].collect().toList
    assert(out === List((1L, 0, "a b c"), (1L, 1, "b c d")))
  }

  test("WordShingles skips empty tokens and short/null docs") {
    val out = Seq(
      (1L, "a  b   c"),     // double spaces → empty tokens skipped
      (2L, "a b"),          // < 3 tokens → no rows
      (3L, null: String))   // null → no rows
      .toDF("id", "text")
      .select(col("id"), wordShingles(split(col("text"), " "), 3).as(Seq("pos", "s")))
      .as[(Long, Int, String)].collect().toList
    assert(out === List((1L, 0, "a b c")))
  }

  test("WordShingles matches the HOF shingler on real docs") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val gen = graft.pipeline.TextAnalysis.shingleRows(docs)
      .select("doc_id", "pos", "s")
    val hof = docs
      .withColumn("w", graft.pipeline.TextAnalysis.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        posexplode(graft.pipeline.TextAnalysis.shingles3(col("w"))).as(Seq("pos", "s")))
    assert(gen.exceptAll(hof).count() === 0 && hof.exceptAll(gen).count() === 0)
  }
}
