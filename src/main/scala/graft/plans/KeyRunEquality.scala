package graft.plans

import org.apache.spark.sql.catalyst.expressions.{RowOrdering, UnsafeRow}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Tie-run (peer) equality over projected sort keys.
  *
  * Byte-wise UnsafeRow equality is exact for float-free schemas
  * (UnsafeWriter canonicalizes NaN bit patterns on write), but for
  * FLOAT/DOUBLE keys it diverges from SQL ordering in one case: `-0.0`
  * and `0.0` compare EQUAL under the engine's nan-safe comparators
  * (SQLOrderingUtil — the same ordering WindowExec's range-bound peer
  * checks and the range partitioner use), yet their bit patterns
  * differ. Splitting that tie run would hand peers different frame
  * values where the built-in gives them one. So: byte equality when no
  * float/double key is present (fast path), the SQL ordering otherwise.
  *
  * Equality only — direction and null ordering don't matter (asc vs
  * desc merely flips the comparison's sign), so the natural ascending
  * ordering serves every SortOrder shape. Construct INSIDE the task
  * closure (it may hold generated code).
  */
private[plans] object KeyRunEquality {
  def create(types: Seq[DataType]): (UnsafeRow, UnsafeRow) => Boolean =
    if (types.exists(t => t == FloatType || t == DoubleType)) {
      val ord = RowOrdering.createNaturalAscendingOrdering(types)
      (a, b) => ord.compare(a, b) == 0
    } else (a, b) => a.equals(b)
}
