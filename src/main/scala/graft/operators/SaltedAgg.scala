package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation — the engine's salting algebra applied
  * to the read side.
  *
  * The reference salts WRITES so one hot sequential key range cannot pin
  * a single region server (reference README:9-27). The same failure mode
  * exists for aggregation reads: one hot group key pins a single reducer.
  * The cure is the same trick in reverse — salt the group key into
  * `salts` sub-keys, aggregate partially per (key, salt), then combine
  * the sub-aggregates:
  *
  *   groupBy(key, salt) agg partial  → (shuffle 1: key×salts spread)
  *   groupBy(key) combine            → (shuffle 2: tiny, one row per
  *                                       key×salt already aggregated)
  *
  * Only DECOMPOSABLE aggregates (sum/count/min/max and algebra thereof)
  * are offered — avg must be derived as sum/count by the caller.
  *
  * At 100 TB: Spark's partial+final hash agg already collapses duplicate
  * rows map-side, but a hot key still funnels every map-side partial into
  * ONE final-agg task; AQE skew-join handles joins, not aggregations.
  * Salting bounds any key's final work to `salts` parallel tasks. The
  * salt column is `pmod(hash(all grouping cols ⧺ some high-card col), s)`
  * — deterministic, no RNG, so retries are stable (same reasoning as the
  * reference's deterministic hash mode, README:75-78).
  */
object SaltedAgg {

  /** sum/count/min/max over `df.groupBy(keys)` with `salts`-way key
    * spreading. `aggs` maps output column name → (valueCol, "sum" |
    * "count" | "min" | "max"). `spreadCol` drives the salt (pick a
    * high-cardinality column, NOT one of the keys). */
  def aggregate(df: DataFrame, keys: Seq[String], spreadCol: Column,
                aggs: Seq[(String, (Column, String))], salts: Int): DataFrame = {
    require(salts >= 1)
    val salted = df.withColumn("__salt", pmod(hash(spreadCol), lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(p1Aggs(aggs).head, p1Aggs(aggs).tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(p2Aggs(aggs).head, p2Aggs(aggs).tail: _*)
  }

  private def p1Aggs(aggs: Seq[(String, (Column, String))]): Seq[Column] =
    aggs.map { case (name, (c, kind)) =>
      (kind match {
        case "sum"   => sum(c)
        case "count" => count(c)
        case "min"   => min(c)
        case "max"   => max(c)
        case other   => throw new IllegalArgumentException(
          s"non-decomposable aggregate '$other' — derive it from sum/count/min/max")
      }).as(s"__p1_$name")
    }

  private def p2Aggs(aggs: Seq[(String, (Column, String))]): Seq[Column] =
    aggs.map { case (name, (_, kind)) =>
      (kind match {
        case "sum" | "count" => sum(col(s"__p1_$name"))
        case "min"           => min(col(s"__p1_$name"))
        case "max"           => max(col(s"__p1_$name"))
      }).as(name)
    }
}

/** Skew-safe equi-join by key salting — for when the LARGE side has hot
  * join keys and the other side is too big to broadcast outright. The
  * large side's rows get a deterministic salt in 0..salts-1; every small-
  * side row is replicated once per salt (explode of a literal sequence);
  * the join key becomes (keys ⧺ salt), so one hot key's rows spread over
  * `salts` reducers instead of funneling into one.
  *
  * This is the write-salting idea (reference README:9-27) applied to the
  * join shuffle; AQE's skew-join split handles sort-merge cases
  * adaptively, but an explicit salt is deterministic, works for any join
  * strategy, and — like the reference's hash mode (README:75-78) — is
  * reproducible across retries because the salt is a hash, not a random.
  * Cost: small side shuffles `salts`× its size; choose `salts` ≈ the
  * skew factor, not the cluster size.
  */
object SaltedJoin {
  /** Inner equi-join of `large` and `small` on `keys`, spreading each
    * large-side key over `salts` partitions. `spreadCol` (a high-
    * cardinality large-side column, NOT a key) drives the salt. */
  def join(large: DataFrame, small: DataFrame, keys: Seq[String],
           spreadCol: Column, salts: Int): DataFrame = {
    require(salts >= 1)
    val l = large.withColumn("__salt", pmod(hash(spreadCol), lit(salts)))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
