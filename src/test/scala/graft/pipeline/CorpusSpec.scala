package graft.pipeline

import graft.SparkSuite
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Corpus-construction operators: the two-pass global index primitive
  * and the round-5 pipeline queries built on it (sequence packing,
  * quality deciles, deterministic shuffle), plus paragraph dedup, PII
  * redaction, top-ngrams and domain-mix invariants. The DuckDB oracle
  * (tools/check.py) is the cross-engine value gate; these assert the
  * operator-level contracts. */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = PipelineQueries.queries(name)(spark, sf())

  test("withGlobalIndex matches a driver-side sort on skewed data") {
    // heavily skewed order values + many partitions: the failure mode of
    // a broken two-pass is offsets that disagree with range boundaries
    val df = (0 until 5000).map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "k").repartition(13)
    val got = Corpus.withGlobalIndex(df, Seq(col("k"), col("id")), "idx", "n")
      .select("id", "k", "idx", "n").collect()
    assert(got.forall(_.getLong(3) == 5000L), "total column must equal row count")
    val expected = got.map(r => (r.getLong(1), r.getLong(0))).sorted
      .zipWithIndex.map { case ((k, id), i) => (k, id) -> i.toLong }.toMap
    assert(got.forall(r => expected((r.getLong(1), r.getLong(0))) == r.getLong(2)))
  }

  test("pack_sequences: seq_id is the 500-token bin of the starting offset") {
    val rows = q("q_pack_sequences")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    // replay per language in doc order
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._2).foreach { case (_, _, n, seq) =>
        assert(seq == cum / 500, s"seq_id $seq != ${cum / 500} at cum $cum")
        cum += n
      }
    }
  }

  test("quality deciles: rank is a permutation, deciles are balanced bands") {
    val rows = q("q_quality_deciles").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(rows.map(_._2).sorted.toSeq == (1 to n).map(_.toLong))
    // rank order must follow (n_tokens desc, ...) and deciles follow rank
    val byRank = rows.sortBy(_._2)
    assert(byRank.sliding(2).forall { case Array(a, b) => a._1 >= b._1 })
    assert(byRank.forall { case (_, r, d) => d == (r - 1) * 10 / n + 1 })
    val sizes = rows.groupBy(_._3).values.map(_.length).toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced deciles: $sizes")
  }

  test("deterministic shuffle: pos is a permutation, shards balanced, stable") {
    val a = q("q_shuffle_deterministic").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val n = a.length
    assert(a.map(_._2).sorted.toSeq == (0L until n).toSeq)
    val shardSizes = a.groupBy(_._3).values.map(_.length)
    assert(shardSizes.max - shardSizes.min <= 1, "round-robin shards must balance")
    // same seed → same permutation on a second run
    val b = q("q_shuffle_deterministic").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(a.map(t => (t._1, t._2)).toSeq == b.toSeq)
  }

  test("paragraph dedup: every chunk of a copied doc is owned by the original") {
    val rows = q("q_dedup_paragraph").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val copies = rows.filter(_._1 >= 100000L)
    assert(copies.nonEmpty)
    assert(copies.values.forall { case (nc, nd, f) => nc == nd && f == 1.0 },
      "copied docs must be 100% duplicate chunks")
    // chunk counts agree between original and copy
    copies.foreach { case (id, (nc, _, _)) => assert(rows(id - 100000L)._1 == nc) }
  }

  test("pii redact: finds the two planted emails and one phone per doc") {
    val rows = q("q_pii_redact").collect()
    assert(rows.forall(_.getLong(1) == 2L), "two planted emails per doc")
    assert(rows.forall(_.getLong(2) == 1L), "one planted phone per doc")
  }

  test("top ngrams: 50 rows, counts non-increasing, rank dense") {
    val rows = q("q_top_ngrams").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 50)
    assert(rows.map(_._1).toSeq == (1L to 50L))
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 >= b._3 })
  }

  test("domain mix: shares sum to 1, weight inverts the share against uniform") {
    val rows = q("q_domain_mix").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    val k = rows.length.toDouble
    rows.foreach { case (_, share, w) =>
      assert(math.abs(w - (1.0 / k) / share) < 1e-12)
    }
  }

  test("token rarity: oov bounded by token count, frequencies positive") {
    val rows = q("q_token_rarity").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.forall { case (n, oov, f) => oov <= n && f >= 0.0 })
    // OOV tokens exist exactly when the corpus vocabulary exceeds the
    // top-1000 cut (at tiny SFs the whole vocab fits and 0 is correct)
    val vocabSize = graft.queries.Tables.documents(spark, sf())
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .select("t").distinct().count()
    if (vocabSize > 1000)
      assert(rows.map(_._2).sum > 0, "expected at least one OOV token corpus-wide")
  }

  test("dedup quality: recall near-perfect on the constructed corpus") {
    val rows = q("q_dedup_quality").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    assert(rows.keySet == Set("minhash_lsh", "ngram_jaccard", "simhash_ham3"))
    rows.foreach { case (m, (t, f, rec)) =>
      assert(f <= t, s"$m found more truth pairs than exist")
      assert(rec >= 0.95, s"$m recall $rec below the constructed-corpus floor")
    }
  }

  test("VectorIndex.ensure skips the rewrite when the codebook matches") {
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(8)(rnd.nextDouble())
    val cents = IndexedSeq.fill(4)(vec())
    val other = IndexedSeq.fill(4)(vec())
    val dir = java.nio.file.Files.createTempDirectory("vensure").toString
    val corpus = (0L until 100L).map(i => (i, vec())).toDF("vec_id", "v")
    assert(VectorIndex.ensure(corpus, col("v"), cents, dir), "first ensure writes")
    val stamp = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(!VectorIndex.ensure(corpus, col("v"), cents, dir), "matching codebook reuses")
    val after = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(stamp == after, "reuse must not touch the layout")
    assert(VectorIndex.ensure(corpus, col("v"), other, dir), "diverged codebook rewrites")
    assert(VectorIndex.storedCodebookHash(spark, dir)
      .contains(VectorIndex.codebookHash(other)))
  }
}
