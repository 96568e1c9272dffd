package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q_simjoin_containment / q_ngram_novelty semantics that the DuckDB
  * oracle cannot see: the planted-pair guarantee (every fuzzyCorpus
  * mutant's shingle set is a strict subset of its original's, so its
  * containment is exactly 1.0) and zero false negatives against an
  * in-test brute-force all-pairs join — the filters (prefix cut,
  * positional bound) must only ever DROP non-qualifying pairs. */
class ContainmentSpec extends SparkSuite {

  private lazy val out =
    SparkEntry.queries("q_simjoin_containment")(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("every planted mutant is contained in its original at exactly 1.0") {
    // mutants (ids +100000) drop the last 2 tokens: 2 fewer shingles,
    // all of them the original's → na < nb, containment 1.0
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(filter(col("w"), t => t =!= "")) >= 7)
      .select("doc_id").collect().map(_.getLong(0))
    assert(docs.nonEmpty)
    docs.foreach { id =>
      // orientation is (smaller set, larger set) with id ties — when the
      // dropped shingles were duplicates of earlier ones the two
      // DISTINCT sets are equal-sized and the pair flips to (id, id+100000)
      val c = out.get((id + 100000L, id)).orElse(out.get((id, id + 100000L)))
      assert(c.contains(1.0), s"mutant of $id: expected containment 1.0, got $c")
    }
  }

  test("no false negatives vs brute-force all-pairs at sf0.001") {
    val corpus = {
      val base = spark.read.parquet(s"${sf()}/documents.parquet")
        .select(col("doc_id"), col("text"))
      val mutated = base
        .withColumn("w", filter(split(col("text"), " "), t => t =!= ""))
        .filter(size(col("w")) >= 5)
        .select((col("doc_id") + 100000L).as("doc_id"),
          array_join(slice(col("w"), lit(1), size(col("w")) - 2), " ").as("text"))
      base.union(mutated)
    }
    val sets = graft.pipeline.TextAnalysis.shingleRows(corpus)
      .withColumn("x", graft.pipeline.Dedup.baseHash32(col("s")))
      .select("doc_id", "x").distinct()
      .groupBy("doc_id").agg(collect_list("x").as("sh"))
    val brute = sets.as("sa").join(sets.as("sb"),
        size(col("sa.sh")) < size(col("sb.sh")) ||
          (size(col("sa.sh")) === size(col("sb.sh")) &&
            col("sa.doc_id") < col("sb.doc_id")))
      .select(col("sa.doc_id").as("a"), col("sb.doc_id").as("b"),
        size(col("sa.sh")).cast("bigint").as("na"),
        size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("bigint").as("inter"))
      .filter(lit(4L) * col("inter") >= lit(3L) * col("na"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / col("na").cast("double")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(brute.nonEmpty)
    assert(out.keySet === brute.keySet,
      s"missed: ${(brute.keySet -- out.keySet).take(5)}; " +
        s"spurious: ${(out.keySet -- brute.keySet).take(5)}")
    brute.foreach { case (k, c) => assert(out(k) === c, s"pair $k") }
  }

  test("q_ngram_novelty: every mutant's shingles are 100% corpus-shared") {
    val rows = SparkEntry.queries("q_ngram_novelty")(spark, sf()).collect()
    val mutants = rows.filter(_.getLong(0) >= 100000L)
    assert(mutants.nonEmpty)
    mutants.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"mutant ${r.getLong(0)}: ${r.getLong(2)}/${r.getLong(1)} shared")
      assert(r.getDouble(3) === 1.0)
      assert(r.getBoolean(4))
    }
  }
}
