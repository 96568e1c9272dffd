package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The generalized planted-id-band guard (lifted out of refreshE2e —
  * the r17 watch item): every planted corpus/batch builder refuses a
  * source corpus whose ids reach the +100000·k class offsets, because
  * the oracle splits the SAME bands arithmetically and a collision
  * would silently conflate classes on both sides at once. */
class IdBandGuardSpec extends SparkSuite {
  import spark.implicits._

  test("an oversized-id corpus is refused loudly; a conforming one passes untouched") {
    val bad = Seq((150000L, "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      PipelineQueries.requireIdHeadroom(bad, "specBuilder")
    }
    assert(e.getMessage.contains("150000") && e.getMessage.contains("collide"),
      s"refusal must name the offending id and the hazard: ${e.getMessage}")
    // refusal is NOT memoized: a second call refuses again
    intercept[IllegalArgumentException] {
      PipelineQueries.requireIdHeadroom(bad, "specBuilder")
    }
    val ok = Seq((99999L, "fine"), (3L, "also fine")).toDF("doc_id", "text")
    val out = PipelineQueries.requireIdHeadroom(ok, "specBuilder")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 99999L),
      "a conforming corpus must pass through unmodified")
    // an empty corpus sits under any band (no planted row can collide)
    val empty = spark.range(0).selectExpr("id AS doc_id", "'x' AS text")
    assert(PipelineQueries.requireIdHeadroom(empty, "specBuilder").isEmpty)
  }
}
