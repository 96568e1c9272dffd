package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import java.nio.ByteBuffer

/** Count-min sketch as ONE mergeable aggregate — the bounded-memory
  * heavy-hitters primitive (Cormode & Muthukrishnan 2005).
  *
  * Why it matters at 100 TB: an exact `groupBy(key).count()` shuffles one
  * row PER DISTINCT KEY; when the key domain is huge (URLs, user ids,
  * n-grams) that exchange dominates the job even though only the few
  * heavy keys are wanted. The sketch replaces it with a fixed
  * `Depth × Width` counter grid — each partition folds its rows into a
  * 32 KiB buffer map-side, partials merge by elementwise ADD (counters
  * are linear), and the exchange carries one buffer per partition
  * regardless of key cardinality. Point estimate for key x is
  * `min over d of grid[d][hash_d(x)]` — an overestimate with
  * ε ≈ e/Width at confidence 1 − (1/e)^Depth, never an underestimate.
  *
  * Same engine-parity discipline as [[MinHashSketch]]: the row hashes are
  * affine maps of the 32-bit base hash with coefficients < 2^20, so every
  * product stays < 2^52 — exact in Spark longs, DuckDB BIGINTs, and the
  * oracle replays the identical grid from SQL `GROUP BY` arithmetic.
  *
  * Reference analog: HBaseWD has no aggregation layer (client-side
  * salting only); this is [EXT] pipeline surface. Estimation is exposed
  * as a Column formula ([[CmsFunctions.cmsEstimate]]) over the returned
  * grid, so probes are plain codegen'd expressions against a broadcast
  * one-row sketch — no UDF in the probe path.
  */
case class CountMinSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CmsFunctions.{Depth, Width, RowA, RowB, P}

  override def prettyName: String = "count_min_sketch_grid"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min_sketch_grid expects a BIGINT base hash, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // SQL-surface contract enforcement: the affine row hashes are exact
      // only for nonnegative 32-bit inputs. A negative x would make the
      // Scala `%` keep its sign (ArrayIndexOutOfBounds on the grid); an
      // |x| ≥ 2^44 would silently overflow x·A past Long while the DuckDB
      // twin errors — so both are refused loudly with the documented fix.
      if (x < 0L || x > 0xFFFFFFFFL)
        throw new IllegalArgumentException(
          s"count_min_sketch_grid: input $x outside [0, 2^32) — pass a " +
            "nonnegative 32-bit base hash (e.g. graft's baseHash32)")
      var r = 0
      while (r < Depth) {
        buf(r * Width + (((x * RowA(r) + RowB(r)) % P) % Width).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  // an empty group is the all-zero grid (every estimate 0), not null —
  // counters are linear, and zero is the identity the merge relies on
  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Depth * Width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
    copy(child = newChild)
}

object CmsFunctions {
  /** Grid geometry — fixed so sketches from different jobs/rounds merge.
    * Width 1024 → ε ≈ e/1024 ≈ 0.27% of the stream length; Depth 4 →
    * the estimate exceeds true+εN with probability < 2%. */
  val Depth = 4
  val Width = 1024

  /** Row-hash coefficients < 2^20: with 32-bit base hashes every
    * `x·A + B` stays < 2^52 — exact in doubles-free BIGINT arithmetic on
    * both engines. P = 2^31 − 1 (Mersenne), the same modulus the MinHash
    * permutations use. */
  val RowA: Array[Long] = Array(1000003L, 999983L, 824633L, 786433L)
  val RowB: Array[Long] = Array(12289L, 40503L, 69061L, 99991L)
  val P: Long = 2147483647L

  /** Column API: `cms(baseHash32Col)` → `array<bigint>` of Depth·Width
    * counters (row r, bucket b at 1-based index r·Width + b + 1). */
  def cms(x: Column): Column =
    ColumnBridge.column(CountMinSketch(ColumnBridge.expression(x)).toAggregateExpression())

  /** Point estimate for base hash `x` against sketch grid `grid`:
    * min over rows of the row's bucket counter. Pure built-in Column
    * arithmetic (codegen'd), intended against a broadcast sketch. */
  def cmsEstimate(grid: Column, x: Column): Column = {
    import org.apache.spark.sql.functions._
    val perRow = (0 until Depth).map { r =>
      element_at(grid,
        (lit(r * Width) + ((x * RowA(r) + RowB(r)) % P) % Width + 1).cast("int"))
    }
    least(perRow: _*)
  }

  /** DuckDB twin of [[cmsEstimate]] composed with the grid build: the
    * estimate for each probe row's `x` computed from first principles —
    * per-(row, bucket) counts over the stream CTE — with the identical
    * affine arithmetic. `stream` must expose column `x`. */
  def duckEstimate(streamCte: String, xExpr: String): String = {
    val rows = (0 until Depth).map { r =>
      s"""(SELECT count(*) FROM $streamCte s
           WHERE ((s.x * ${RowA(r)} + ${RowB(r)}) % $P) % $Width =
                 (($xExpr * ${RowA(r)} + ${RowB(r)}) % $P) % $Width)"""
    }
    s"least(${rows.mkString(", ")})"
  }
}
