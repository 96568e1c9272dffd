package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Sub-dimension variants of the fold helpers (PQ subspaces). */
  def duckDotN(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(range($n), i -> ($a)[i+1] * ($b)[i+1]), (acc, x) -> acc + x)"
  def duckNorm2N(v: String, n: Int): String = duckDotN(v, v, n)

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

  // ---- banded sign-LSH for near-dup self-join ------------------------------
  // A SINGLE b-bit sign bucket self-join is quadratic at corpus scale:
  // even uniform hashing yields N²/2^b candidate pairs, and real embedding
  // distributions are anisotropic (some sign patterns are far hotter).
  // The scale-safe blocking is the MinHash `Bands` pattern (Dedup.Bands):
  // B independent sign bands over DISJOINT coordinate sets, pairs OR'd
  // across bands, each band bucket capped via Dedup.candidatePairs — so
  // any one bucket's expansion is bounded at maxBucket·(maxBucket−1)/2
  // regardless of how skewed the sign distribution is. A true near-dup
  // (cos → 1) has near-identical signs everywhere, so it collides in
  // EVERY band; OR-ing only ADDS recall over the single-bucket join.

  /** Band count and bits per band (disjoint coordinates; B·bits ≤ D). */
  val EmbBands = 4
  val EmbBandBits = 8

  /** Coordinate for bit `i` of band `b` — interleaved so each band sees a
    * spread of the embedding dimensions, never a contiguous run. */
  def embBandCoord(b: Int, i: Int): Int = i * EmbBands + b

  /** Packed 8-bit sign signature of band `b` (same sign test as
    * [[signBucket]], band-disjoint coordinates). */
  def embBandSig(v: Column, b: Int): Column =
    (0 until EmbBandBits).map { i =>
      when(element_at(v, embBandCoord(b, i) + 1) > 0.0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _).cast("bigint")

  def duckEmbBandSig(v: String, b: Int): String =
    (0 until EmbBandBits).map { i =>
      s"CASE WHEN ($v)[${embBandCoord(b, i) + 1}] > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** id × band → (id, band, sig) rows, shaped for [[Dedup.candidatePairs]]
    * (which supplies the groupBy-bucket shuffle, the deterministic
    * hot-bucket cap, and the in-bucket a<b pair expansion). */
  def embBandRows(df: DataFrame, idCol: String, vecCol: Column): DataFrame =
    df.select(
      col(idCol),
      explode(array((0 until EmbBands).map(b =>
        struct(lit(b).as("band"), embBandSig(vecCol, b).as("sig"))): _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))

  /** DuckDB twin of [[embBandRows]]: UNION ALL of the B per-band selects
    * over a relation exposing (idExpr, vExpr). Emits doc_id/band/bsig —
    * the column names [[Dedup.duckCandidatePairs]] expects. */
  def duckEmbBandRows(from: String, idExpr: String, vExpr: String): String =
    (0 until EmbBands).map(b =>
      s"SELECT $idExpr AS doc_id, $b AS band, ${duckEmbBandSig(vExpr, b)} AS bsig FROM $from")
      .mkString(" UNION ALL ")

  // ---- IVF (inverted-file) index ------------------------------------------
  // Coarse-quantize the corpus into C cells (nearest centroid by cosine),
  // probe the NProbe closest cells per query, exact-re-rank inside them.
  // Centroids are collected to the driver and carried as PLAIN DATA on one
  // native codegen expression (graft.functions.NearestCentroid), so cell
  // assignment is one narrow codegen'd projection over the corpus — the
  // broadcast-the-quantizer pattern that holds at 100 TB (the corpus is
  // never shuffled to build the index; only the probe equi-join moves
  // candidate rows). Centroid choice here is deterministic (a fixed id
  // range) for oracle reproducibility; at scale you'd fit them with
  // k-means|| — the index build and query path are identical either way.

  /** Cell count and probe width. */
  val IvfC = 16
  val IvfProbe = 4

  /** Widened probe width — the IVF multi-probe recall lever. Unlike
    * sign-LSH (whose bucket function has no ranking, forcing bit-flip
    * probe heuristics), IVF's query-to-centroid cosine ranking IS the
    * canonical multi-probe order: probing the next-ranked cells raises
    * recall with the SAME persisted index, no rewrite — only the probe
    * list (and the partitions the scan prunes to) widens. */
  val IvfProbeWide = 8

  /** Deep probe width — the recall≥0.9 tier of the same ladder.
    * Measured on the harness embeddings (sf0.01, recall@10 vs brute):
    * nProbe 8 → 0.70, 10 → 0.84, 12 → 0.94. The probe-cost delta is
    * exactly the partition fraction scanned — 12/16 vs 8/16 of the
    * index (+50% candidate rows over Wide) — because IVF probe cost IS
    * the probed-cell volume; nothing else changes (same persisted
    * layout, same re-rank). The synthetic embeddings cluster weakly, so
    * this codebook needs wide probes for high recall; a corpus with
    * real cluster structure reaches the same recall at far smaller
    * nProbe/C — the ladder, not the constant, is the design. */
  val IvfProbeDeep = 12

  /** Driver-side sequential-fold ‖c‖² — same association order as
    * DotProduct/duckNorm2, so literal norms are bit-identical. */
  def norm2Scala(c: Seq[Double]): Double = c.foldLeft(0.0)((a, x) => a + x * x)

  /** Nearest-centroid cell id: argmax cosine, ties to the SMALLEST cid
    * (identical to row_number ordered by (cos DESC, cid ASC) rank 1 on
    * the oracle side). One fused native loop over the whole codebook —
    * see graft.functions.NearestCentroid for why per-centroid expression
    * trees were replaced. */
  def ivfCell(v: Column, n2: Column, cents: IndexedSeq[Seq[Double]]): Column =
    graft.functions.CentroidFunctions.nearestCentroidCosine(v, n2, cents).as("cell")

  /** Per-centroid cosines as array<double> (index = cid) — probe-ranking
    * input; consume with posexplode to get (cid, ccos) rows. */
  def ivfCellCosines(v: Column, n2: Column, cents: IndexedSeq[Seq[Double]]): Column =
    graft.functions.CentroidFunctions.centroidCosines(v, n2, cents)

  // ---- int8 scalar quantization (graft.functions.Int8Expressions) --------

  /** DuckDB twin of QuantizeInt8 as an integer list (the oracle has no
    * packed-byte type; the integers are what the bytes mean). */
  def duckQuantInt8(v: String): String =
    s"list_transform(range($D), i -> CAST(least(greatest(round(($v)[i+1] * 127), -127), 127) AS BIGINT))"

  /** DuckDB twin of DotProductInt8 (integer fold — exact, so association
    * order is irrelevant; written sequentially for symmetry). */
  def duckDotInt8(a: String, b: String): String =
    s"list_reduce(list_transform(range($D), i -> ($a)[i+1] * ($b)[i+1]), (acc, x) -> acc + x)"

  // ---- learned coarse quantizer (Lloyd iterations) ------------------------

  /** Fixed-point scale for centroid accumulation. Floating-point means are
    * partition-order-dependent, so a distributed average could differ from
    * the oracle's in the last bits and flip a cell assignment. Instead
    * each coordinate is quantized to round(x·10⁶) as BIGINT — integer sums
    * are exact and order-insensitive in any engine — and divided back out
    * once, driver-side. 1e-6 is far below embedding noise; the quantizer
    * this trains is unaffected. */
  val QuantScale: Double = 1e6

  // ---- product quantization (PQ-ADC) --------------------------------------

  /** PQ geometry: M subspaces of SubD dims (M·SubD = D), PqK centroids
    * per sub-codebook → a D-dim float vector encodes to M small codes. */
  val PqM = 8
  val PqSubD: Int = D / PqM
  val PqK = 8

  /** Sub-codebook cell id via the L2 identity argmin_c ‖x−c‖² =
    * argmax_c (x·c − ‖c‖²/2); ties to the smallest cid — same fused
    * native argmax as [[ivfCell]], same oracle tiebreak. */
  def pqCell(xm: Column, cents: IndexedSeq[Seq[Double]]): Column =
    graft.functions.CentroidFunctions.nearestCentroidPq(xm, cents)

  /** PQ query-side ADC lookup table for one subspace: array<double> of
    * x_m · c for every centroid of that sub-codebook. */
  def pqLut(xm: Column, cents: IndexedSeq[Seq[Double]]): Column =
    graft.functions.CentroidFunctions.centroidDots(xm, cents)

  /** All M sub-codebooks trained TOGETHER, one Spark job per Lloyd
    * iteration: the M per-subspace assignments are independent columns of
    * the same corpus row, so they stack into one explode → posexplode →
    * (m, cell, i) aggregation whose output is M·K·SubD tiny rows. Same
    * fixed-point (quantized integer sum) centroid update as [[lloyd]];
    * cells that lose all members keep their previous centroid. A
    * per-subspace loop would run M separate jobs per iteration for no
    * extra information. `corpus` carries the FULL vectors in column `v`. */
  def pqTrain(corpus: org.apache.spark.sql.DataFrame,
              seeds: IndexedSeq[IndexedSeq[Seq[Double]]],
              iters: Int): IndexedSeq[IndexedSeq[Seq[Double]]] = {
    var books = seeds
    for (_ <- 0 until iters) {
      val stacked = corpus
        .select(explode(array((0 until PqM).map { m =>
          val sv = slice(col("v"), m * PqSubD + 1, PqSubD)
          struct(lit(m).as("m"), pqCell(sv, books(m)).as("cell"), sv.as("sv"))
        }: _*)).as("s"))
        .select(col("s.m"), col("s.cell"), posexplode(col("s.sv")).as(Seq("i", "x")))
        .withColumn("xq", round(col("x") * lit(QuantScale)).cast("bigint"))
        .groupBy("m", "cell", "i")
        .agg(sum("xq").as("sx"), count(lit(1)).as("n"))
        .collect()
      val byM = stacked.groupBy(_.getInt(0))
      books = books.indices.map { m =>
        byM.get(m).fold(books(m))(rows => rebuildCentroids(books(m),
          rows.map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))))
      }
    }
    books
  }

  private def rebuildCentroids(prev: IndexedSeq[Seq[Double]],
                               sums: Iterable[(Long, Int, Long, Long)]): IndexedSeq[Seq[Double]] = {
    val byCell = sums.groupBy(_._1)
    prev.indices.map { c =>
      byCell.get(c.toLong).fold(prev(c)) { rows =>
        val arr = new Array[Double](prev(c).size)
        rows.foreach { case (_, i, sx, n) =>
          arr(i) = sx.toDouble / (QuantScale * n)
        }
        arr.toIndexedSeq
      }
    }
  }

  /** Distributed Lloyd iterations for the IVF coarse quantizer, seeded
    * deterministically (production k-means|| sampling is not reproducible
    * across engines, which this library's oracle contract requires; the
    * index build and query path are identical either way).
    *
    * Per iteration: assign each corpus row to its nearest centroid (the
    * codegen'd literal argmax — a narrow projection, corpus never
    * shuffled), then per-(cell, coordinate) quantized sums via
    * posexplode + partial/final hash agg (ONE shuffle of C·D·parallelism
    * combiner rows, independent of corpus size), collect the C·D sums to
    * the driver, and rebuild the literal centroids. Cells that lose all
    * members keep their previous centroid. */
  def lloyd(corpus: org.apache.spark.sql.DataFrame, seed: IndexedSeq[Seq[Double]],
            iters: Int): IndexedSeq[Seq[Double]] = {
    var cents = seed
    for (_ <- 0 until iters) {
      val sums = corpus
        .withColumn("cell", ivfCell(col("v"), col("n2"), cents))
        .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
        .withColumn("xq", round(col("x") * lit(QuantScale)).cast("bigint"))
        .groupBy("cell", "i")
        .agg(sum("xq").as("sx"), count(lit(1)).as("n"))
        .collect()
      cents = rebuildCentroids(cents,
        sums.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))))
    }
    cents
  }

  /** SECOND-LEVEL CELL REFINEMENT for hot cells — the 100 TB path for
    * the cell-local self-join family (q_ann_join, q_semdedup), where
    * pair work is Σ|cell|² and ONE hot cell (a dominant direction:
    * boilerplate embeddings, near-constant vectors — guaranteed in a
    * crawl-scale corpus) turns quadratic. Cells over `maxCell` rows are
    * re-quantized against a second-level codebook of up to `subK`
    * deterministic sub-centroids — the cell's smallest-id members
    * (arbitrary but reproducible across runs and engines) — by the SAME
    * argmax-cosine quantizer ([[ivfCell]]: one definition at both
    * levels). Cold cells keep `subcell = -1`; the refined blocking key
    * is (cell, subcell), cutting a DIVERSE hot cell's pair work up to
    * subK× per level (recurse on (cell, subcell) for deeper skew). A
    * hot cell of EXACT or power-of-two-scaled duplicates is irreducible
    * by construction — identical vectors keep every sub-centroid cosine
    * bit-identical and always share a subcell — but such a cell is true
    * duplicate mass, which IS the pipeline's output, not blocking waste.
    *
    * Scale shape: the hot-cell member selection is one map-combined
    * bounded-buffer agg (TopKByScore: subK entries per partition
    * regardless of cell size — no per-cell window or sort, so a
    * billion-row hot cell cannot single-task it); sub-centroid vectors
    * come back via one broadcast semi-join and a |hot|·subK-row driver
    * collect (the same codebook-at-driver contract as the first-level
    * cents); assignment is a per-hot-cell codegen'd projection unioned
    * with the untouched cold rest. `idCol` must fit a double exactly
    * (|id| < 2^53) — it rides TopKByScore's score slot negated. */
  def subdivideCells(asg: DataFrame, idCol: String, vCol: String,
                     n2Col: String, cellCol: String,
                     maxCell: Long, subK: Int): DataFrame = {
    val hot: Seq[Int] = asg.groupBy(col(cellCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxCell)
      .select(cellCol).collect().map(_.getAs[Number](0).intValue).toSeq
    if (hot.isEmpty) return asg.withColumn("subcell", lit(-1))
    val top = graft.functions.TopKByScore.topK(subK)
    val subIds = asg.filter(col(cellCol).isin(hot: _*))
      .groupBy(col(cellCol).as("__hc"))
      .agg(top(negate(col(idCol).cast("double")), col(idCol)).as("__tk"))
      .select(col("__hc"), explode(col("__tk._2")).as("__sid"))
    val centRows = broadcast(subIds)
      .join(asg, col("__sid") === col(idCol))
      .select(col("__hc"), col("__sid"), col(vCol))
      .collect()
    val subCents: Map[Int, IndexedSeq[Seq[Double]]] = centRows
      .groupBy(_.getAs[Number](0).intValue)
      .view.mapValues(rows => rows.sortBy(_.getAs[Number](1).longValue)
        .map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq).toMap
    val cold = asg.filter(!col(cellCol).isin(hot: _*))
      .withColumn("subcell", lit(-1))
    hot.sorted.map { c =>
      asg.filter(col(cellCol) === c)
        .withColumn("subcell",
          graft.functions.CentroidFunctions.nearestCentroidCosine(
            col(vCol), col(n2Col), subCents(c)))
    }.foldLeft(cold)(_ unionByName _)
  }
}
