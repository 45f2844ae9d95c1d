package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF exemplar (SURVEY.md §2.14 "many-rows -> aggregate" shape:
  * `Aggregator[IN, BUF, OUT]` registered via `udaf()`).
  *
  * Elementwise-min union of MinHash signatures: the merged signature of a
  * GROUP of documents is the signature of the union of their shingle sets
  * (min commutes with set union), so group-level signatures compose from
  * row-level ones without touching shingles again. Classic use: one
  * signature per source/domain to estimate cross-corpus Jaccard at the
  * group level. Algebraic (merge = elementwise min), so Spark runs it
  * map-side partial + reduce — the exchange carries k longs per group. */
class MinhashUnionAgg(k: Int) extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
  def zero: Seq[Long] = Vector.fill(k)(Long.MaxValue)
  def reduce(b: Seq[Long], a: Seq[Long]): Seq[Long] =
    if (a == null || a.isEmpty) b
    else Vector.tabulate(k)(i => math.min(b(i), if (i < a.length) a(i) else Long.MaxValue))
  def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    Vector.tabulate(k)(i => math.min(x(i), y(i)))
  def finish(b: Seq[Long]): Seq[Long] = b
  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
