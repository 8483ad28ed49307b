package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent items as a MERGEABLE typed aggregate — the
  * bounded-memory heavy-hitters summary with a THEOREM-EXACT merge
  * (Agarwal et al. 2012, "Mergeable Summaries"): state is ≤ k counters;
  * reduce decrements all counters when a new item finds the buffer full
  * (the classic MG step); merge sums counters pointwise (absent → 0),
  * keeps the k largest, and subtracts the (k+1)-th largest from the
  * kept — preserving the invariant
  *
  *     ĉ(x) ≤ true(x) ≤ ĉ(x) + D,   D = (N − Σ ĉ) / (k + 1)
  *
  * under ANY merge tree (D never exceeds N/(k+1)), so every item with
  * true(x) > D is guaranteed present. Both bounds are computable from
  * the summary itself plus the stream length — per-report certificates
  * the CMS sketch (t20) cannot give. Deterministic: eviction/top-k
  * ties break by item string, so re-runs and re-layouts agree on the
  * reported SET (counts for sub-threshold stragglers can differ by
  * merge order; the t52 gate verdict checks the INVARIANTS, which hold
  * under every layout — plus the exact recovery of all planted heavy
  * items). O(k) state per group, map-side combinable.
  */
object FrequentItems {

  final case class Entry(item: String, cnt: Long)

  type Buf = Map[String, Long]

  final class MisraGries(k: Int) extends Aggregator[String, Buf, Seq[Entry]] {
    require(k > 0)

    override def zero: Buf = Map.empty

    override def reduce(b: Buf, item: String): Buf =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < k => b.updated(item, 1L)
        case None =>
          // decrement every counter (the new item's implicit counter
          // hits 0 immediately and is not stored); drop exhausted ones
          b.iterator.collect { case (i, c) if c > 1 => i -> (c - 1) }.toMap
      }

    override def merge(b1: Buf, b2: Buf): Buf = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      val summed = (b1.keySet ++ b2.keySet).iterator
        .map(i => i -> (b1.getOrElse(i, 0L) + b2.getOrElse(i, 0L))).toSeq
        .sortBy { case (i, c) => (-c, i) }
      val sub = if (summed.size > k) summed(k)._2 else 0L
      summed.take(k).collect { case (i, c) if c > sub => i -> (c - sub) }.toMap
    }

    override def finish(b: Buf): Seq[Entry] =
      b.toSeq.map { case (i, c) => Entry(i, c) }.sortBy(e => (-e.cnt, e.item))

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  /** Column form: `mg_topk(item)` → array<struct<item,cnt>>, largest
    * counter first. */
  def topFreq(k: Int)(item: Column): Column =
    udaf(new MisraGries(k), ExpressionEncoder[String]()).apply(item)
}
