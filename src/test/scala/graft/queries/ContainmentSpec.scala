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

  test("screen-orientation containmentPairs: prefix cut in the plan, zero false negatives") {
    import spark.implicits._
    // boilerplate-heavy batch: every doc shares a 10-token template, so
    // a bare shared-token pairing would generate every ordered pair —
    // the regime the prefix cut exists for. Docs 100–104 are the bare
    // template (contained in every extended doc AND identical to each
    // other, exercising the tie rule: the larger id drops).
    val tmpl = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = ((0L until 20L).map(i => (i, s"$tmpl kilo$i lima$i mike$i")) ++
      (0L until 5L).map(i => (100L + i, tmpl))).toDF("doc_id", "text")
    val sets = graft.pipeline.TextAnalysis.shingleRows(docs)
      .withColumn("x", graft.pipeline.Dedup.baseHash32(col("s")))
      .select("doc_id", "x").distinct().persist()
    try {
      val pairs = graft.pipeline.Dedup.containmentPairs(sets, 3, 4,
        (na, nb, a, b) => nb > na || (nb === na && b < a))
      val got = pairs.select("a", "b").as[(Long, Long)].collect().toSet
      val full = sets.groupBy("doc_id").agg(collect_list("x").as("sh"))
      val brute = full.as("fa").crossJoin(full.as("fb"))
        .select(col("fa.doc_id").as("a"), col("fb.doc_id").as("b"),
          size(col("fa.sh")).cast("bigint").as("na"),
          size(col("fb.sh")).cast("bigint").as("nb"),
          size(array_intersect(col("fa.sh"), col("fb.sh")))
            .cast("bigint").as("inter"))
        .filter(col("nb") > col("na") ||
          (col("nb") === col("na") && col("b") < col("a")))
        .filter(lit(4L) * col("inter") >= lit(3L) * col("na"))
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(brute.nonEmpty)
      assert(got === brute,
        s"missed: ${(brute -- got).take(5)}; spurious: ${(got -- brute).take(5)}")
      // the templates are contained in every extended doc...
      (100L until 105L).foreach(t =>
        (0L until 20L).foreach(i => assert(got.contains((t, i)))))
      // ...and of an identical pair only the larger id drops
      assert(got.contains((104L, 100L)) && !got.contains((100L, 104L)))
      // plan guard: the candidate join reads only PREFIX rows on the
      // probe side — the rank-bound filter must sit in the plan
      val filters = pairs.queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.sql
      }
      assert(filters.exists(s => s.contains("rn") && s.contains("<=")),
        s"no prefix-cut filter in the candidate plan: $filters")
    } finally sets.unpersist()
  }

  test("containmentPairs fuzz: exact vs brute for arbitrary num/den and orientations") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 5) {
      val den = 2 + rnd.nextInt(5) // 2..6
      val num = 1 + rnd.nextInt(den) // 1..den — τ anywhere in (0, 1]
      // 30 docs over a 25-token universe: heavy overlap, many ties
      val docs = (0L until 30L).map { d =>
        (d, Seq.fill(3 + rnd.nextInt(12))(rnd.nextInt(25).toLong).distinct)
      }
      val sets = docs.flatMap { case (d, xs) => xs.map(x => (d, x)) }
        .toDF("doc_id", "x")
      // keep EVERY ordered pair — correctness must not depend on the
      // size orientation the production callers happen to use
      val got = graft.pipeline.Dedup
        .containmentPairs(sets, num, den, (_, _, a, b) => a =!= b)
        .select(col("a"), col("b"), col("containment"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val want = (for {
        (a, xa) <- docs; (b, xb) <- docs if a != b
        inter = xa.toSet.intersect(xb.toSet).size
        if den.toLong * inter >= num.toLong * xa.size
      } yield ((a, b), inter.toDouble / xa.size)).toMap
      assert(got === want,
        s"trial $trial τ=$num/$den: missed ${(want.keySet -- got.keySet).take(5)}, " +
          s"spurious ${(got.keySet -- want.keySet).take(5)}")
      assert(want.nonEmpty, s"trial $trial degenerate: no qualifying pairs")
    }
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
