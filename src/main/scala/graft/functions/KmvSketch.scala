package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values, "bottom-k") distinct sketch: the k smallest
  * DISTINCT hash values of a column. From the k-th smallest hash h_(k)
  * of values uniform on [0, M), the distinct count is estimated as
  * (k-1)·M / h_(k) (the classic KMV estimator, RSE ≈ 1/√(k−2)); and
  * because a bottom-k set is closed under union (bottom-k of A ∪ B =
  * bottom-k of bottom-k(A) ∪ bottom-k(B)) the sketches are exactly
  * mergeable AND support set intersection — the estimator HLL lacks:
  * |A ∩ B| ≈ |common ∩ bottom-k(A∪B)| / k_u · D(A∪B). That makes KMV
  * the sketch for cross-corpus overlap questions ("how much of B is
  * already in A?") at 100 TB, where the exact join (d13) is a full
  * shuffle of both sides.
  *
  * Unlike HLL (whose register updates are order-sensitive only in
  * implementation, but whose estimate is opaque to a SQL twin), a KMV
  * sketch is a pure FUNCTION of the input value set: any engine can
  * restate it as `ORDER BY hash LIMIT k` over the distinct portable
  * hashes. Every derived number here is integer arithmetic on that set,
  * so gates get exact oracles, not pinned-error verdicts.
  *
  * The aggregation is a typed [[Aggregator]] with an O(k) sorted buffer:
  * map-side partial combine means only ≤k longs per partition cross the
  * wire — never a distinct-shuffle of the data. */
object KmvSketch {

  /** Hash-space size: the top 13 hex digits of md5 = 52 uniform bits.
    * md5 (not the polyHash fold) because the KMV estimator needs a
    * UNIFORM hash — measured: polyHash mod 2³¹−1 skews the bottom of
    * the hash space and put the k-th order statistic ~40% off, while
    * md5's 52-bit prefix lands within the 1/√(k−2) RSE. 52 bits (not
    * 60) so (k−1)·M stays inside a signed 64-bit long for k ≤ 1024 —
    * DuckDB BIGINT overflow is an error, not a wrap, so the twin must
    * never overflow either. Both engines spell the hash identically:
    * Spark `conv(substring(md5(s), 1, 13), 16, 10)`, SQL
    * `('0x' || substr(md5(s), 1, 13))::BIGINT`. */
  val M: Long = 1L << 52

  final class BottomKDistinct(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2, s"kmv needs k >= 2: $k")

    override def zero: Seq[Long] = Nil

    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.length >= k && h >= b.last) b
      else {
        val i = b.search(h)(Ordering.Long)
        i match {
          case scala.collection.Searching.Found(_) => b
          case scala.collection.Searching.InsertionPoint(p) =>
            val grown = (b.take(p) :+ h) ++ b.drop(p)
            if (grown.length > k) grown.take(k) else grown
        }
      }

    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      (b1 ++ b2).distinct.sorted.take(k)

    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Column form: ascending array of the ≤k smallest distinct hashes. */
  def bottomK(k: Int)(hash: Column): Column =
    udaf(new BottomKDistinct(k), ExpressionEncoder[Long]()).apply(hash)
}
