package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by (score desc, id asc) as a typed Aggregator — the
  * UDAF extension surface (SURVEY.md §2.2 UDF/UDAF row; §7.3's
  * anticipated custom aggregate).
  *
  * Why: top-k per group via `row_number().over(Window)` SORTS every
  * group's full candidate list (and a global top-k sorts everything).
  * An algebraic bounded-buffer aggregate keeps only k entries per
  * partial buffer, combines map-side, and ships k rows per partition to
  * the final — at 100 TB the difference between a full shuffle+sort of
  * the candidate set and a k-row-per-partition merge.
  *
  * Determinism: the comparator is total — score desc, then id asc — so
  * results are stable across partitionings and identical to the
  * `row_number` formulation (exact double comparison, same tiebreak).
  */
class TopKByScore(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && better(buf.last, x)) buf
    else ((buf :+ x).sortWith(better)).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, x)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    implicitly(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]())
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    implicitly(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]())
}

object TopKByScore {
  /** DataFrame-facing UDAF: `df.groupBy(g).agg(topK(10)(col(score), col(id)))`
    * → array<struct<_1: double, _2: bigint>> sorted by (score desc, id). */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByScore(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
}
