package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed top-k-per-group aggregate: keeps at most k (score, id) pairs per
  * group in a bounded buffer — a single aggregation pass with map-side
  * partial combine. At scale this replaces the window-function top-n
  * pattern (`row_number().over(partitionBy(...).orderBy(...)) <= k`),
  * which must SORT every group's full row set; the aggregator's state is
  * O(k) per group regardless of group size.
  *
  * Ordering: score descending, id ascending (deterministic ties).
  */
object TopKAggregator {

  final case class Scored(score: Double, id: Long)

  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)
    private val ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.score, s.id))

    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.size < k) (b :+ a).sorted(ord)
      else if (ord.lt(a, b.last)) (b.init :+ a).sorted(ord)
      else b
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Column form: `top_k(scoreCol, idCol)` → array<struct<score,id>>,
    * highest score first. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopK(k), ExpressionEncoder[Scored]()).apply(score, id)
}
