package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}

/** q_refresh_e2e composition guards. The DuckDB oracle proves the VALUES
  * (both generations' screens, the snapshot, the mix); these pin what it
  * cannot see:
  *  - the planted classes land on the verdicts their construction
  *    promises (incl. the containment-evasion property of the extension
  *    class and gen 2's append proofs);
  *  - the manifest is IDEMPOTENT under re-invocation in a process whose
  *    stores already carry the refresh (the redelivered-batch rule the
  *    live-target filters exist for);
  *  - the manifest TAIL re-reads almost nothing: every screen verdict is
  *    an increment-bounded localCheckpoint leaf (executed exactly once,
  *    eagerly — the probe-cost discipline is structural), so the only
  *    parquet in the final plan is the documents scan inside the two
  *    input caches and the CDC store inside the snapshot cache. */
class RefreshE2eSpec extends SparkSuite {

  private lazy val df = SparkEntry.queries("q_refresh_e2e")(spark, sf())
  // (gen, doc_id, verdict, match_id, source, src_tokens, n_rep)
  private lazy val rows = df.collect()

  test("gen-1 classes land on their verdicts") {
    val g1 = rows.filter(_.getLong(0) == 1L)
    val ex = g1.filter(r => r.getLong(1) >= 100000L && r.getLong(1) < 200000L)
    assert(ex.nonEmpty && ex.forall(r =>
      r.getString(2) == "dup_exact" && r.getLong(3) == r.getLong(1) - 100000L),
      "a verbatim re-crawl escaped the bloom+verify exact screen")
    val ct = g1.filter(r => r.getLong(1) >= 200000L && r.getLong(1) < 300000L)
    assert(ct.nonEmpty && ct.forall(_.getString(2) == "dup_contained"),
      "a truncation escaped the gram-index containment screen")
    // the extension class is built to sit BELOW the containment τ
    // (covers only m/(m+r) < 3/4 of its own shingles) but INSIDE the
    // band screen's catch zone (J = m/(m+r) ≈ 0.7) — misses are real
    // LSH recall misses and must insert, never containment-drop
    val fz = g1.filter(r => r.getLong(1) >= 300000L && r.getLong(1) < 400000L)
    assert(fz.nonEmpty && fz.forall(r =>
      r.getString(2) == "dup_fuzzy" || r.getString(2) == "inserted"))
    assert(fz.count(_.getString(2) == "dup_fuzzy") * 2 >= fz.length,
      s"band screen caught under half the planted extensions")
    val nv = g1.filter(r => r.getLong(1) >= 400000L && r.getLong(1) < 500000L)
    assert(nv.nonEmpty && nv.forall(_.getString(2) == "inserted"),
      "a token-reversed novel doc was screened out")
    val upd = g1.filter(r => r.getLong(1) < 100000L && r.getLong(1) % 5 == 3)
    assert(upd.nonEmpty && upd.forall(_.getString(2) == "update"))
    val del = g1.filter(r => r.getLong(1) < 100000L && r.getLong(1) % 10 == 9)
    assert(del.nonEmpty && del.forall(_.getString(2) == "delete"))
  }

  test("gen-2 probes prove the refresh landed in every store") {
    val g2 = rows.filter(_.getLong(0) == 2L)
    // verbatim copies of gen-1 INSERTS match their parent through the
    // CDC snapshot's hashes — the merge-on-read view carries the delta
    val ex2 = g2.filter(r => r.getLong(1) >= 1000000L && r.getLong(1) < 2000000L)
    assert(ex2.nonEmpty && ex2.forall(r =>
      r.getString(2) == "dup_exact" && r.getLong(3) == r.getLong(1) - 1000000L),
      "a copy of a gen-1 insert was not exact-matched against the snapshot")
    val ct2 = g2.filter(r => r.getLong(1) >= 2000000L && r.getLong(1) < 3000000L)
    assert(ct2.nonEmpty && ct2.forall(_.getString(2) == "dup_contained"))
    // novel-parent truncations can only match via postings an APPEND
    // wrote (reversed text exists nowhere in the base corpus) — match
    // is min-id elected, so a template-heavy corpus may elect a
    // SMALLER appended novel doc over the parent; every match must
    // still be an appended novel id, and the parent wins almost always
    val ct2Novel = ct2.filter(r => r.getLong(1) - 2000000L >= 400000L)
    assert(ct2Novel.nonEmpty && ct2Novel.forall(r =>
      r.getLong(3) >= 400000L && r.getLong(3) < 500000L),
      "a truncated novel insert matched outside the appended novel docs")
    assert(ct2Novel.count(r => r.getLong(3) == r.getLong(1) - 2000000L) * 10
      >= ct2Novel.length * 9,
      "under 90% of truncated novel inserts matched their own parent")
    val fz2 = g2.filter(r => r.getLong(1) >= 3000000L)
    assert(fz2.nonEmpty && fz2.forall(r =>
      r.getString(2) == "dup_fuzzy" || r.getString(2) == "inserted"))
    val caught = fz2.filter(_.getString(2) == "dup_fuzzy")
    assert(caught.length * 2 >= fz2.length)
    assert(caught.forall(_.getLong(3) >= 100000L),
      "a gen-2 extension fuzzy-matched a base doc instead of an appended one")
  }

  test("manifest is idempotent against a redelivered increment") {
    assert(rows.nonEmpty)
    // stores already carry the refresh (markers stand, indexes appended):
    // re-running the whole query must reproduce the manifest exactly —
    // the live-target candidate rule is what keeps the probes from
    // matching this refresh's own appended docs
    val again = SparkEntry.queries("q_refresh_e2e")(spark, sf()).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "re-running the refresh against its own applied state changed verdicts")
    assert(rows.forall(r => r.getLong(6) >= 1L && r.getLong(6) <= 3L))
    assert(rows.forall(_.getLong(5) > 0L))
  }

  private def flatten(sp: SparkPlan): Seq[SparkPlan] = {
    val inner = sp match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case _ => Nil
    }
    sp +: (sp.children ++ inner).flatMap(flatten)
  }

  test("the manifest tail re-reads only the two input caches and the snapshot") {
    rows // force the marker-gated side effects first
    val top = df.queryExecution.optimizedPlan
    // walk the cache DAG (CorpusE2eSpec pattern): collect every file
    // scan reachable through InMemoryRelations from the final plan
    var seen = Set.empty[Int]
    var queue: Seq[InMemoryRelation] =
      top.collect { case m: InMemoryRelation => m }
    var fileScans = Seq.empty[FileSourceScanExec]
    // bare (non-cached) scans in the tail itself
    val topPhysical = df.queryExecution.executedPlan
    fileScans = fileScans ++ flatten(topPhysical).collect {
      case f: FileSourceScanExec => f
    }
    while (queue.nonEmpty) {
      val m = queue.head
      queue = queue.tail
      val key = System.identityHashCode(m.cacheBuilder)
      if (!seen(key)) {
        seen = seen + key
        val nodes = flatten(m.cachedPlan)
        fileScans = fileScans ++ nodes.collect { case f: FileSourceScanExec => f }
        queue = queue ++ nodes.collect { case s: InMemoryTableScanExec => s.relation }
      }
    }
    def scansOf(frag: String) = fileScans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains(frag)))
    // documents parquet: once in the crawl-plant cache, once in the
    // histKeyed sidecar cache — never a third time
    assert(scansOf("documents").size <= 2,
      s"manifest re-reads documents ${scansOf("documents").size} times")
    // the persisted stores appear only through the CDC snapshot cache
    // (base + delta); every index probe lives behind a checkpoint leaf
    assert(scansOf("/gram/").isEmpty && scansOf("/band/").isEmpty,
      "an index probe leaked into the manifest tail past its checkpoint")
    assert(scansOf("/cdc/").size <= 2,
      s"snapshot read the CDC store ${scansOf("/cdc/").size} times")
  }
}
