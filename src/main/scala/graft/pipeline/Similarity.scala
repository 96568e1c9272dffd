package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Similarity search over embedding columns (SURVEY.md §2.2 [EXT]):
  * brute-force cosine top-k as the correctness baseline, and a sign-LSH
  * (random-hyperplane family, axis-aligned instance) bucketed variant as
  * the scale path.
  *
  * Cross-engine parity: vectors are cast float→double (exact) and every
  * dot product is a SEQUENTIAL left fold — Spark `aggregate(…, 0.0, +)`
  * and DuckDB `list_reduce` round identically at every step, so cosines
  * are bit-identical and top-k ranking (ordered by cosine desc, id) can
  * never flip between engines.
  *
  * Scale (100 TB): brute-force is a broadcast-nested-loop of a SMALL query
  * set against the corpus — linear scans at full parallelism, no shuffle
  * of the corpus. The LSH variant replaces the cross product with a
  * hash-equi-join on the bucket id (probing only same-bucket candidates)
  * — the same trade the reference makes for writes (hash-prefix
  * bucketing, wd/RowKeyDistributorByHashPrefix.java:111-114) applied to
  * vector search. All expressions are built-ins → whole-stage codegen.
  */
object Similarity {

  /** Embedding dimensionality (TESTDATA.md embeddings.embedding). */
  val D = 64

  /** Number of sign bits for the LSH bucket (axis hyperplanes i*D/SignBits). */
  val SignBits = 8

  /** float[] → double[] (exact widening; both engines). */
  def vd(v: Column): Column = v.cast("array<double>")
  def duckVd(v: String): String = s"($v)::DOUBLE[]"

  /** Sequential-fold dot product — the custom codegen'd Catalyst
    * expression (graft.functions.DotProduct): a tight primitive loop
    * inside whole-stage codegen. Spark's `aggregate` HOF evaluates its
    * lambda interpreted per element, and an unrolled 64-term tree blows
    * codegen size — both measured slower. Association order matches
    * DuckDB list_reduce, so cosines stay bit-identical to the oracle. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(range($D), i -> ($a)[i+1] * ($b)[i+1]), (acc, x) -> acc + x)"

  /** ‖v‖² — same fold. */
  def norm2(v: Column): Column = dot(v, v)
  def duckNorm2(v: String): String = duckDot(v, v)

  /** cosine(a, b) given precomputed squared norms. */
  def cosine(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / (sqrt(n2a) * sqrt(n2b))
  def duckCosine(dotAb: String, n2a: String, n2b: String): String =
    s"($dotAb) / (sqrt($n2a) * sqrt($n2b))"

  /** Sign-LSH bucket: bit i = sign of coordinate i*(D/SignBits). For unit-
    * spread embeddings this is the random-hyperplane cosine LSH with
    * axis-aligned planes — deterministic and engine-independent. */
  def signBucket(v: Column): Column =
    (0 until SignBits).map { i =>
      when(element_at(v, i * (D / SignBits) + 1) > 0.0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _).cast("bigint")

  def duckSignBucket(v: String): String =
    (0 until SignBits).map { i =>
      s"CASE WHEN ($v)[${i * (D / SignBits) + 1}] > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString("CAST(", " + ", " AS BIGINT)")
}
