package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** q_corpus_e2e composition guards — the DuckDB oracle proves the VALUES;
  * these pin what the oracle cannot see: the sharing discipline (the whole
  * chain re-reads the documents parquet exactly once, through the two
  * persisted frames — the r13 recacheByPath hazard class was a
  * composition-only lineage re-execution exactly like this) and the
  * stage-funnel invariants on the packed output. */
class CorpusE2eSpec extends SparkSuite {

  private lazy val df = SparkEntry.queries("q_corpus_e2e")(spark, sf())
  private lazy val rows = df.collect()

  /** Every plan node reachable from `sp`, descending through AQE wrappers
    * (whose inner plan is a constructor arg, not a child). */
  private def flatten(sp: SparkPlan): Seq[SparkPlan] = {
    val inner = sp match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case _ => Nil
    }
    sp +: (sp.children ++ inner).flatMap(flatten)
  }

  test("the composed plan reads the documents parquet exactly once, inside the caches") {
    // final stage: NO parquet relation outside a cache — everything the
    // pack/mix tail consumes comes off the persisted train frame
    val top = df.queryExecution.optimizedPlan
    val bareScans = top.collect { case r: LogicalRelation => r }
    assert(bareScans.isEmpty,
      s"e2e tail re-reads parquet outside the caches: $bareScans")
    val topCaches = top.collect { case m: InMemoryRelation => m }
    assert(topCaches.nonEmpty, "no cached frame in the e2e tail")
    // walk the cache DAG: cached plans reference deeper caches through
    // InMemoryTableScanExec; across ALL levels the documents parquet
    // must be scanned exactly once (the single planted-corpus scan
    // inside the exact-survivor cache)
    var seen = Set.empty[Int] // identity of visited caches, cycle-safe
    var queue: Seq[InMemoryRelation] = topCaches
    var fileScans = Seq.empty[FileSourceScanExec]
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
    val docScans = fileScans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("documents")))
    assert(docScans.size === 1,
      s"expected exactly ONE documents scan across the cache DAG, " +
        s"got ${docScans.size}")
  }

  test("stage-funnel invariants hold on the packed output") {
    assert(rows.nonEmpty)
    // exact dedup: every verbatim copy (+100000) lost to its min-id twin
    assert(!rows.exists(r => r.getLong(0) >= 100000L && r.getLong(0) < 200000L),
      "a planted exact copy survived the exact-dedup stage")
    // decontamination: the eval slice itself never reaches training
    assert(rows.forall(_.getLong(0) % 10 != 7),
      "an eval-slice doc reached the packed train corpus")
    // mix: repetition factors inside the clamp
    assert(rows.forall(r => r.getLong(4) >= 1L && r.getLong(4) <= 3L))
    // pack: seq ids replay the per-language running sum exactly
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        val eff = r.getLong(3) * r.getLong(4)
        assert(r.getLong(5) === cum / 500,
          s"lang $lang doc ${r.getLong(0)}: seq_id ${r.getLong(5)} != ${cum / 500}")
        cum += eff
      }
    }
    // the funnel actually bit: fewer packed docs than base docs
    val base = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(rows.length < base, "no stage filtered anything")
  }
}
