package graft.keys

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [REF-intent] Salt-sizing advisor — the operative decision the whole
  * reference library exists to inform: "how many buckets do I need so no
  * single region serves a hot share of the writes?" (reference README:9-27;
  * the ±10% evenness bound is the reference's own acceptance test,
  * wd-test/OneByteSimpleHashTest.java:83-100). `q_key_skew` measures the
  * skew; this turns the measurement into the answer.
  *
  * For each candidate bucket count n, PREDICT the per-bucket row
  * distribution under the engine's own hash ([[Hash31]], the same
  * arithmetic the `HashPrefix` distributor ships), then recommend the
  * smallest n whose hottest/coldest buckets stay within the tolerance of
  * the ideal total/n — or, when no candidate passes (e.g. one key alone
  * exceeds the bound), the largest candidate, with the irreducible cap
  * reported as `hot_key_share_ppm` (hash salting cannot split ONE key:
  * the hottest bucket always carries at least the hottest key).
  *
  * Scale shape: the table is touched ONCE (map-side-combined per-key
  * count agg); everything after runs on the KEY DISTRIBUTION — |keys|
  * rows fanned out ×|candidates| by a row-local explode (NO join against
  * the corpus), re-aggregated map-side to |candidates|·n rows, left-joined
  * against the generated full bucket range (tiny, broadcast) so EMPTY
  * buckets count as maximal unevenness. All shares are integer-exact ppm
  * in DECIMAL(38,0) — no float fold-order, and the identical arithmetic
  * runs in the DuckDB oracle. The whole-report constants (any candidate
  * within bound / best candidate) are whole-group constant windows over
  * the |candidates|-row report, riding the zero-exchange constant-agg
  * rescue rather than a scalar cross join.
  */
object SaltAdvisor {
  /** Default candidate ladder: the reference's one-byte prefix space is
    * 1..256 (RowKeyDistributorByHashPrefix.java:57-63); powers of two
    * up to that cap. */
  val DefaultCandidates: Seq[Int] = Seq(4, 8, 16, 32, 64, 128, 256)

  /** ±10% of ideal, in ppm — the reference evenness test's bound. */
  val DefaultTolerancePpm: Long = 100000L

  /** One report row per candidate n, ordered by n:
    * (n, used_buckets, min_bucket_rows, max_bucket_rows, under_ppm,
    *  over_ppm, hot_key_share_ppm, within_tol, recommended)
    * where under/over_ppm are the coldest/hottest bucket's rows as ppm
    * of the ideal total/n (1 000 000 = perfectly even). */
  def advise(df: DataFrame, key: Column,
             candidates: Seq[Int] = DefaultCandidates,
             tolerancePpm: Long = DefaultTolerancePpm): DataFrame = {
    require(candidates.nonEmpty && candidates.forall(n => n >= 1 && n <= 256),
      s"candidates must be in 1..256: $candidates")
    val ns = candidates.distinct.sorted.map(_.toLong)
    val whole = Window.partitionBy()
    // one corpus scan → per-key counts, plus the two whole-set constants
    // every later row needs (table total, hottest single key)
    val counts = df.groupBy(key.as("__k")).agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum("cnt").over(whole))
      .withColumn("hot_cnt", max("cnt").over(whole))
    // row-local candidate fan-out on the key distribution, then one
    // map-combined agg down to |candidates|·n bucket rows
    val bucketed = counts
      .select(col("__k"), col("cnt"), col("total"), col("hot_cnt"),
        explode(typedLit(ns)).as("n"))
      .withColumn("bucket", pmod(Hash31.hash32(col("__k")), col("n")))
      .groupBy("n", "bucket")
      .agg(sum("cnt").as("bucket_rows"),
        max("total").as("total"), max("hot_cnt").as("hot_cnt"))
    // full bucket range per candidate — empty buckets ARE unevenness
    val spark = df.sparkSession
    val full = spark.range(1)
      .select(explode(typedLit(ns)).as("n"))
      .select(col("n"), explode(sequence(lit(0L), col("n") - 1L)).as("bucket"))
    val perBucket = full.join(bucketed, Seq("n", "bucket"), "left")
      .select(col("n"), coalesce(col("bucket_rows"), lit(0L)).as("bucket_rows"),
        col("total"), col("hot_cnt"))
    perBucket
      .groupBy("n")
      .agg(
        sum(when(col("bucket_rows") > 0L, 1L).otherwise(0L)).as("used_buckets"),
        min("bucket_rows").as("min_bucket_rows"),
        max("bucket_rows").as("max_bucket_rows"),
        max("total").as("total"), max("hot_cnt").as("hot_cnt"))
      // ppm of the IDEAL (total/n): rows·n·1e6 / total, decimal-exact;
      // all operands non-negative so Spark div / DuckDB HUGEINT // agree
      .withColumn("under_ppm", expr(
        "cast(cast(min_bucket_rows AS decimal(38,0)) * n * 1000000 div total AS bigint)"))
      .withColumn("over_ppm", expr(
        "cast(cast(max_bucket_rows AS decimal(38,0)) * n * 1000000 div total AS bigint)"))
      .withColumn("hot_key_share_ppm", expr(
        "cast(cast(hot_cnt AS decimal(38,0)) * 1000000 div total AS bigint)"))
      .withColumn("within_tol",
        col("over_ppm") <= lit(1000000L + tolerancePpm) &&
          col("under_ppm") >= lit(1000000L - tolerancePpm))
      // the decision: smallest candidate within tolerance, else the
      // largest candidate (max spread achievable in the one-byte space)
      .withColumn("__best",
        min(when(col("within_tol"), col("n"))).over(whole))
      .withColumn("recommended",
        when(col("__best").isNotNull, col("n") === col("__best"))
          .otherwise(col("n") === lit(ns.max)))
      .select("n", "used_buckets", "min_bucket_rows", "max_bucket_rows",
        "under_ppm", "over_ppm", "hot_key_share_ppm", "within_tol",
        "recommended")
      .orderBy("n")
  }

  /** JOIN-SKEW salt plan — the other half of the salting decision: not
    * "how many buckets for the store" but "which join keys need
    * replication, and by how much". A salted join (the q_salted_join
    * pattern: explode the build side ×f, scatter the probe side mod f)
    * needs f PER HOT KEY; this derives it from the measured
    * distribution. A key is hot when its row count exceeds 2× the mean
    * rows-per-key (integer-exact: cnt·n_keys > 2·total); its factor is
    * its count in mean-sized slices, ⌈cnt·n_keys / total⌉ — the
    * replication that levels that key's partitions back to the mean.
    * One map-combined count agg + whole-set constant windows (zero
    * extra exchange); output is the hot tail only — driver-safe. */
  def joinSaltPlan(df: DataFrame, key: Column): DataFrame = {
    val whole = Window.partitionBy()
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum("cnt").over(whole))
      .withColumn("n_keys", count(lit(1)).over(whole))
      .filter(col("cnt") * col("n_keys") > col("total") * 2L)
      .withColumn("share_ppm", expr(
        "cast(cast(cnt AS decimal(38,0)) * 1000000 div total AS bigint)"))
      .withColumn("salt_factor", expr(
        "cast((cast(cnt AS decimal(38,0)) * n_keys + total - 1) div total AS bigint)"))
      .select("key", "cnt", "share_ppm", "salt_factor")
      .orderBy(col("cnt").desc, col("key"))
  }

  /** [[joinSaltPlan]] as DuckDB SQL — same arithmetic, same tiebreak. */
  def duckJoinSaltPlan(table: String, keyExpr: String): String =
    s"""WITH c AS (SELECT $keyExpr AS key, count(*) AS cnt
                   FROM $table GROUP BY 1),
          t AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM c)
       SELECT key, cnt,
         CAST(CAST(cnt AS HUGEINT) * 1000000 // total AS BIGINT) AS share_ppm,
         CAST((CAST(cnt AS HUGEINT) * n_keys + total - 1) // total AS BIGINT)
           AS salt_factor
       FROM c CROSS JOIN t
       WHERE cnt * n_keys > total * 2
       ORDER BY cnt DESC, key"""

  /** The same report as DuckDB SQL over table `table`, key `keyExpr` —
    * generated from the same constants so the oracle cannot drift. */
  def duckSql(table: String, keyExpr: String,
              candidates: Seq[Int] = DefaultCandidates,
              tolerancePpm: Long = DefaultTolerancePpm): String = {
    val ns = candidates.distinct.sorted
    val h = Hash31.duckHash32("__k")
    s"""WITH counts AS (
         SELECT $keyExpr AS __k, count(*) AS cnt FROM $table GROUP BY 1),
       tot AS (SELECT sum(cnt) AS total, max(cnt) AS hot_cnt FROM counts),
       cand AS (SELECT CAST(unnest([${ns.mkString(", ")}]) AS BIGINT) AS n),
       bucketed AS (
         SELECT n, ((($h) % n + n) % n) AS bucket, sum(cnt) AS bucket_rows
         FROM counts CROSS JOIN cand GROUP BY 1, 2),
       fullb AS (SELECT n, unnest(range(n)) AS bucket FROM cand),
       perb AS (
         SELECT f.n, coalesce(b.bucket_rows, 0) AS bucket_rows
         FROM fullb f LEFT JOIN bucketed b
           ON f.n = b.n AND f.bucket = b.bucket),
       pern AS (
         SELECT n,
           CAST(sum(CASE WHEN bucket_rows > 0 THEN 1 ELSE 0 END) AS BIGINT) AS used_buckets,
           CAST(min(bucket_rows) AS BIGINT) AS min_bucket_rows,
           CAST(max(bucket_rows) AS BIGINT) AS max_bucket_rows
         FROM perb GROUP BY 1),
       e AS (
         SELECT n, used_buckets, min_bucket_rows, max_bucket_rows,
           CAST(CAST(min_bucket_rows AS HUGEINT) * n * 1000000 // total AS BIGINT) AS under_ppm,
           CAST(CAST(max_bucket_rows AS HUGEINT) * n * 1000000 // total AS BIGINT) AS over_ppm,
           CAST(CAST(hot_cnt AS HUGEINT) * 1000000 // total AS BIGINT) AS hot_key_share_ppm
         FROM pern CROSS JOIN tot),
       r AS (
         SELECT *, (over_ppm <= ${1000000L + tolerancePpm}
                AND under_ppm >= ${1000000L - tolerancePpm}) AS within_tol
         FROM e)
       SELECT n, used_buckets, min_bucket_rows, max_bucket_rows,
         under_ppm, over_ppm, hot_key_share_ppm, within_tol,
         CASE WHEN min(CASE WHEN within_tol THEN n END) OVER () IS NOT NULL
              THEN n = min(CASE WHEN within_tol THEN n END) OVER ()
              ELSE n = ${ns.max} END AS recommended
       FROM r ORDER BY n"""
  }
}
