package graft.functions

import graft.pipeline.Dedup
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

/** Whole-signature MinHash as ONE aggregate — a custom
  * `TypedImperativeAggregate` (the extension type SURVEY.md §7.3
  * anticipated for [EXT] MinHash sketches).
  *
  * The column-expression formulation runs K independent `min(...)`
  * aggregates; each carries its own buffer slot, update projection and
  * merge expression through the aggregation. This operator keeps the
  * entire K-slot signature in one primitive `Array[Long]` buffer and
  * applies all K affine permutations to a row's base hash in a single
  * tight loop — one aggregate function regardless of K, with a flat
  * 8·K-byte serialized form for partial/final exchange.
  *
  * Same arithmetic as [[Dedup.minhashAggs]] ((x·A_p + B_p) mod P over the
  * 32-bit base hash; products stay < 2^52, no overflow in any engine), so
  * results are interchangeable and the same DuckDB oracle applies.
  *
  * Empty groups evaluate to null (no shingles → no signature), matching
  * what K separate `min` aggregates would produce.
  */
case class MinHashSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val K = Dedup.K

  override def prettyName: String = "minhash_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch expects a BIGINT base hash, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(K)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var p = 0
      while (p < K) {
        val h = (x * Dedup.PermA(p) + Dedup.PermB(p)) % Dedup.P
        if (h < buf(p)) buf(p) = h
        p += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var p = 0
    while (p < K) { if (other(p) < buf(p)) buf(p) = other(p); p += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    // all-MaxValue means update never ran: an empty (all-null) group
    if (buf.forall(_ == Long.MaxValue)) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * K)
    var p = 0
    while (p < K) { bb.putLong(buf(p)); p += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](K)
    var p = 0
    while (p < K) { buf(p) = bb.getLong(); p += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

object MinHashFunctions {
  /** Column API: `minhashSketch(baseHash32Col)` → `array<bigint>` of the
    * K signature slots (index p = permutation p, 1-based element_at). */
  def minhashSketch(x: Column): Column =
    ColumnBridge.column(MinHashSketch(ColumnBridge.expression(x)).toAggregateExpression())
}
