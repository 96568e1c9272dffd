package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared scoring kernel for the codebook expressions: the codebook is
  * carried as PLAIN SCALA DATA on the expression (shipped to executors as
  * one codegen reference object), not as per-centroid literal expression
  * trees. A C-centroid codebook therefore adds O(1) nodes to the plan and
  * one tight primitive loop to the generated code — the index-scan shape
  * of the reference's hash-prefix recompute (recompute the bucket from
  * the key, never enumerate buckets as plan nodes;
  * wd/RowKeyDistributorByHashPrefix.java:111-114). The previous
  * formulation inlined C dot-product subtrees per call and paid a
  * multi-thousand-node Janino compile per stage.
  *
  * Score modes (all dots are the same sequential left fold as
  * [[DotProduct]], so every score is bit-identical to the composed
  * expression form and to the DuckDB oracle's `list_reduce`):
  *  - `cosine`: dot(v, c) / (sqrt(‖v‖²) · sqrt(‖c‖²)) — IVF cell metric
  *  - `pq`:     dot(v, c) − ‖c‖²/2 — the L2 argmin identity used by PQ
  *  - `dot`:    dot(v, c) — PQ query-side LUT entries
  */
private[functions] trait CentroidKernel { self: BinaryExpression =>

  def cents: Seq[Seq[Double]]
  def mode: String

  protected def numCents: Int = cents.size
  protected def dim: Int = cents.head.size

  /** Row-major flattened codebook. */
  @transient protected lazy val flat: Array[Double] = {
    val out = new Array[Double](numCents * dim)
    var c = 0
    while (c < numCents) {
      val cent = cents(c)
      var i = 0
      while (i < dim) { out(c * dim + i) = cent(i); i += 1 }
      c += 1
    }
    out
  }

  /** Per-centroid factor: sqrt(‖c‖²) for cosine, ‖c‖²/2 for pq, unused
    * for dot. ‖c‖² is the driver-side sequential fold (same association
    * as Similarity.norm2Scala, so cosines match the literal-norm form). */
  @transient protected lazy val factor: Array[Double] =
    cents.map { cent =>
      val n2 = cent.foldLeft(0.0)((a, x) => a + x * x)
      mode match {
        case "cosine" => math.sqrt(n2)
        case "pq"     => n2 / 2.0
        case _        => 0.0
      }
    }.toArray

  protected def checkKernelInputs(): TypeCheckResult =
    if (cents.isEmpty || cents.exists(_.size != dim))
      TypeCheckResult.TypeCheckFailure("codebook must be non-empty and rectangular")
    else if (!Seq("cosine", "pq", "dot").contains(mode))
      TypeCheckResult.TypeCheckFailure(s"unknown centroid score mode '$mode'")
    else (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected (array<double>, double), got $other")
    }

  /** Scores for one row into `out` (length C). `n2` is ‖v‖² (cosine only).
    * A vector whose length differs from the codebook dimension FAILS
    * rather than silently truncating — a truncated dot product would
    * mis-score (and mis-route) the row with no symptom. */
  protected def scoreRow(v: ArrayData, n2: Double, out: Array[Double]): Unit = {
    val n = v.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"centroid kernel: vector length $n != codebook dim $dim")
    val sq = math.sqrt(n2)
    var c = 0
    while (c < numCents) {
      var dot = 0.0
      val base = c * dim
      var i = 0
      while (i < n) { dot += v.getDouble(i) * flat(base + i); i += 1 }
      out(c) = mode match {
        case "cosine" => dot / (sq * factor(c))
        case "pq"     => dot - factor(c)
        case _        => dot
      }
      c += 1
    }
  }

  /** Generated-java score expression over local vars `dot`/`sq` + factor
    * array ref — resolved at codegen time (mode is compile-time data). */
  protected def scoreJava(dot: String, sq: String, facRef: String, c: String): String =
    mode match {
      case "cosine" => s"$dot / ($sq * $facRef[$c])"
      case "pq"     => s"$dot - $facRef[$c]"
      case _        => dot
    }

  /** Shared generated scoring loop: declares `double[] <scores>` of the
    * C per-centroid scores for input array `v` and norm `n2`. */
  protected def scoresCode(ctx: CodegenContext, v: String, n2: String,
                           scores: String): String = {
    val flatRef = ctx.addReferenceObj("centsFlat", flat, "double[]")
    val facRef = ctx.addReferenceObj("centFactor", factor, "double[]")
    val n = ctx.freshName("n")
    val sq = ctx.freshName("sq")
    val c = ctx.freshName("c")
    val base = ctx.freshName("base")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    s"""
    final int $n = $v.numElements();
    if ($n != $dim) {
      throw new IllegalArgumentException(
        "centroid kernel: vector length " + $n + " != codebook dim " + $dim);
    }
    final double $sq = java.lang.Math.sqrt($n2);
    final double[] $scores = new double[$numCents];
    for (int $c = 0; $c < $numCents; $c++) {
      double $dot = 0.0;
      final int $base = $c * $dim;
      for (int $i = 0; $i < $n; $i++) {
        $dot += $v.getDouble($i) * $flatRef[$base + $i];
      }
      $scores[$c] = ${scoreJava(dot, sq, facRef, c)};
    }
    """
  }
}

/** Fused argmax over the codebook scores → cell id (BIGINT). Tie-break:
  * the SMALLEST centroid id wins, and score comparison follows Spark's
  * nan-safe double ordering (NaN greatest, ±0.0 equal) — exactly the
  * `array_max` over `struct(score, -cid)` formulation this replaces, and
  * the oracle's `row_number() ORDER BY score DESC, cid` rank 1. */
case class NearestCentroid(vector: Expression, vectorNorm2: Expression,
                           cents: Seq[Seq[Double]], mode: String)
    extends BinaryExpression with CentroidKernel {

  override def left: Expression = vector
  override def right: Expression = vectorNorm2
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = checkKernelInputs()

  override protected def nullSafeEval(v: Any, n2: Any): Any = {
    val scores = new Array[Double](numCents)
    scoreRow(v.asInstanceOf[ArrayData], n2.asInstanceOf[Double], scores)
    var bestI = 0
    var best = Double.NegativeInfinity
    var c = 0
    while (c < numCents) {
      val s = scores(c)
      // nan-safe strict greater-than: NaN beats non-NaN, first NaN kept
      val better =
        if (java.lang.Double.isNaN(s)) !java.lang.Double.isNaN(best)
        else if (java.lang.Double.isNaN(best)) false
        else s > best
      if (better) { best = s; bestI = c }
      c += 1
    }
    bestI.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n2) => {
      val scores = ctx.freshName("scores")
      val best = ctx.freshName("best")
      val bestI = ctx.freshName("bestI")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val better = ctx.freshName("better")
      s"""
      ${scoresCode(ctx, v, n2, scores)}
      long $bestI = 0L;
      double $best = Double.NEGATIVE_INFINITY;
      for (int $c = 0; $c < $numCents; $c++) {
        final double $s = $scores[$c];
        final boolean $better =
          java.lang.Double.isNaN($s) ? !java.lang.Double.isNaN($best)
            : (java.lang.Double.isNaN($best) ? false : $s > $best);
        if ($better) { $best = $s; $bestI = (long) $c; }
      }
      ${ev.value} = $bestI;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vector = newLeft, vectorNorm2 = newRight)
}

/** All C codebook scores for a row as `array<double>` (index = centroid
  * id) — the query-side building block for IVF probe ranking and the PQ
  * ADC lookup tables. */
case class CentroidScores(vector: Expression, vectorNorm2: Expression,
                          cents: Seq[Seq[Double]], mode: String)
    extends BinaryExpression with CentroidKernel {

  override def left: Expression = vector
  override def right: Expression = vectorNorm2
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_scores"

  override def checkInputDataTypes(): TypeCheckResult = checkKernelInputs()

  override protected def nullSafeEval(v: Any, n2: Any): Any = {
    val scores = new Array[Double](numCents)
    scoreRow(v.asInstanceOf[ArrayData], n2.asInstanceOf[Double], scores)
    new GenericArrayData(scores)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n2) => {
      val scores = ctx.freshName("scores")
      s"""
      ${scoresCode(ctx, v, n2, scores)}
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($scores);
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vector = newLeft, vectorNorm2 = newRight)
}

/** Column-API front door for the codebook expressions. */
object CentroidFunctions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)

  /** IVF cell id: argmax cosine(v, centᵢ), ties to smallest i. */
  def nearestCentroidCosine(v: Column, n2: Column, cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(e(v), e(n2), cents, "cosine"))

  /** PQ sub-cell id: argmin ‖x−c‖² via the dot − ‖c‖²/2 identity. */
  def nearestCentroidPq(xm: Column, cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(e(xm), Literal(0.0), cents, "pq"))

  /** Per-centroid cosines (probe ranking input). */
  def centroidCosines(v: Column, n2: Column, cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CentroidScores(e(v), e(n2), cents, "cosine"))

  /** Per-centroid raw dots (PQ ADC lookup table for one subspace). */
  def centroidDots(xm: Column, cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CentroidScores(e(xm), Literal(0.0), cents, "dot"))
}
