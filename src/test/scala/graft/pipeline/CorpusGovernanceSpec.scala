package graft.pipeline

import graft.SparkSuite
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Corpus-governance operators: leakage-safe splitting, the quality
  * threshold sweep, and the padding-waste report. The DuckDB oracle
  * pins the numbers; these pin the CONTRACTS — no cluster straddles a
  * split, survival is monotone in the threshold, sorting can only
  * reduce padding. */
class CorpusGovernanceSpec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = PipelineQueries.queries(name)(spark, sf())

  test("leakage-safe split: no near-dup cluster straddles two splits") {
    // recompute the assignment at doc grain (the query reports a census);
    // the fuzzy corpus = documents ∪ truncated copies (ids +100000, ≥5 tokens)
    val docs = graft.queries.Tables.documents(spark, sf())
    val corpus = docs.select("doc_id").union(
      docs.withColumn("n", size(TextAnalysis.tokens(col("text"))))
        .filter(col("n") >= 5)
        .select((col("doc_id") + 100000L).as("doc_id")))
    val labels = Dedup.connectedComponents(
      PipelineQueries.queries("q_dedup_minhash_lsh")(spark, sf())
        .select(col("a"), col("b")))
      .withColumnRenamed("node", "doc_id")
    val g = corpus.join(labels, Seq("doc_id"), "left")
      .withColumn("gkey", coalesce(col("label"), col("doc_id")))
    val gb = graft.keys.Hash31.bucket(col("gkey"), 100)
    val assigned = g.withColumn("split",
      when(gb < 80, "train").when(gb < 90, "validation").otherwise("test"))
    val straddlers = assigned.filter(col("label").isNotNull)
      .groupBy("label").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count()
    assert(straddlers == 0L)
    // and the naive per-doc split WOULD have leaked: the census reports
    // moved docs in at least one split (the planted near-dups guarantee
    // label != doc_id for half of each cluster)
    val census = q("q_split_leakage_safe").collect()
    assert(census.map(_.getLong(4)).sum > 0L, "expected n_moved > 0")
    // census totals cover the whole corpus exactly once
    assert(census.map(_.getLong(1)).sum == corpus.count())
  }

  test("quality sweep: survival is monotone non-increasing in the threshold") {
    val rows = q("q_quality_sweep").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (_, g) =>
      val byTau = g.sortBy(_._1)
      byTau.sliding(2).foreach {
        case Array((_, _, k1, t1), (_, _, k2, t2)) =>
          assert(k2 <= k1 && t2 <= t1, "raising tau must not keep more")
        case _ =>
      }
    }
    // all five thresholds present for every source
    assert(rows.groupBy(_._2).values.forall(_.length == 5))
  }

  test("padding waste: length-sorted batching never pads more than arrival") {
    val rows = q("q_batch_padding").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (nbA, totA, padA) = rows("arrival")
    val (nbS, totS, padS) = rows("length_sorted")
    assert(nbA == nbS && totA == totS) // same docs, same batch count
    assert(padS <= padA, "sorting by length must not increase padding")
  }

  test("cms top-k: overcount is non-negative for every reported key") {
    val rows = q("q_cms_topk").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 0L, s"CMS underestimated ${r.getString(0)}"))
  }
}
