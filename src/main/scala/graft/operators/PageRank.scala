package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Distributed PageRank over an undirected pair list, in EXACT
  * integer arithmetic.
  *
  * Ranks are carried as integer parts-per-million (r₀ = 10⁶ per node;
  * r' = 0.15·10⁶ + (0.85·10⁶ · Σ (r_u div deg_u)) div 10⁶ — integer
  * division end-to-end), so the fixed point is bit-identical on any
  * engine and any partitioning: no floating-point fold order exists
  * anywhere. The input pairs are symmetrized, so every node has
  * out-degree ≥ 1 and no dangling-mass correction term is needed.
  *
  * Scale shape: [[edges]] builds the degree-annotated edge list once
  * (persist it — every iteration reads it); each [[iterate]] round is
  * the canonical distributed step — join ranks to edges on src,
  * partial+final sum by dst. The rank relation is |nodes| ≪ |edges|.
  * Like the connected-components loop (graft.pipeline.Dedup), the
  * iteration chain is a handful of FIXED-SHAPE tiny stages per round:
  * callers that execute it eagerly should disable AQE around the loop
  * (its per-stage re-planning barrier multiplies by round count) and
  * size loop shuffles to the edge count, not the session default —
  * see the q_pagerank query builder for the pattern.
  */
object PageRank {

  /** Symmetrized, degree-annotated edge list (src, dst, deg) from an
    * undirected pair list (a, b). Persist the result before iterating. */
  def edges(pairs: DataFrame): DataFrame = {
    val both = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
    val deg = both.groupBy("src").agg(count(lit(1)).as("deg"))
    both.join(deg, "src")
  }

  /** Initial ranks: 10⁶ ppm for every node of the edge list. */
  def initRanks(e: DataFrame): DataFrame =
    e.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1000000L))

  /** `iters` Jacobi rounds; returns (node, rank) lazily — no action is
    * triggered here.
    *
    * Overflow domain: the contribution SUM and the 850000× damping
    * product run in DECIMAL(38,0) — exact for any realistic graph, and
    * matching the DuckDB oracle's HUGEINT promotion of the same
    * recurrence. Only the final per-node rank must fit a BIGINT, which
    * holds while Σ(r_u div deg_u) into one node stays below ~1.08e13 —
    * a single hub fed by ~10¹³ full-rank neighbors — far past any graph
    * whose node ids themselves fit memory budgets; past it the decimal→
    * long cast fails loudly (ANSI) or nulls, never wraps silently. */
  def iterate(e: DataFrame, ranks: DataFrame, iters: Int): DataFrame = {
    var r = ranks
    for (_ <- 1 to iters) {
      r = e.join(r, col("src") === col("node"))
        .groupBy("dst")
        .agg(sum(expr("cast(rank div deg as decimal(38,0))")).as("m"))
        .select(col("dst").as("node"),
          expr("150000 + (cast(850000 as decimal(38,0)) * m) div 1000000").as("rank"))
    }
    r
  }
}
