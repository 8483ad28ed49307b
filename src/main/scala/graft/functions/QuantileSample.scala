package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k COORDINATED quantile sample: the k (hash, value) pairs with
  * the smallest portable md5 hashes of a caller-supplied unique row key,
  * ordered lexicographically by (hash, value). The hash coordinates the
  * sample: it is a uniform without-replacement sample of the rows whose
  * membership is a pure function of the key set — so two sketches built
  * over disjoint row sets merge EXACTLY (bottom-k of A ∪ B = bottom-k of
  * bottom-k(A) ∪ bottom-k(B), the same union-closure [[KmvSketch]]
  * exploits), and any engine can restate the state verbatim as
  * `SELECT DISTINCT h, v ... ORDER BY h, v LIMIT k`.
  *
  * Why this structure and not KLL/t-digest for the lake-rollup quantile
  * sketch: KLL's compactor state and t-digest's centroids are functions
  * of ARRIVAL ORDER — two runs of the same data partitioned differently
  * produce different (both valid) states, so neither admits an
  * exact-state cross-engine oracle nor the layout-independence sweep
  * every other gate passes. The coordinated sample is order- and
  * layout-independent by construction and pays for it with a DKW-class
  * rank-error bound: for a uniform m-sample, P(sup_x |F̂(x) − F(x)| > ε)
  * ≤ 2·exp(−2mε²) (Dvoretzky–Kiefer–Wolfowitz with Massart's constant;
  * sampling without replacement is at least as concentrated — Hoeffding
  * 1963, §6). At k = 256 that is ±4.3% rank error at 99% confidence —
  * per group, per day; tighter scopes come free since the error depends
  * on k alone, not n. The spec asserts the measured p50/p90 rank error
  * on real data sits inside this bound.
  *
  * The aggregation is a typed [[Aggregator]] with an O(k) sorted buffer:
  * map-side partial combine means ≤k pairs per partition cross the wire
  * — never a sort or shuffle of the data itself.
  *
  * Caller contract: `key` must uniquely identify a row (duplicate keys
  * collapse to one sample slot, biasing the sample toward the survivors),
  * and NO NULLS may reach the aggregator — the (Long, Double) input
  * encoder is primitive/non-nullable, so a NULL hash or value fails the
  * aggregation at runtime. [[graft.ops.Sketches.quantileSketchPerGroup]]
  * filters both out (and excludes them from `n`) before aggregating.
  */
object QuantileSample {

  final class BottomKPairs(k: Int)
      extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    require(k >= 2, s"quantile sample needs k >= 2: $k")

    private val ord = Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

    override def zero: Seq[(Long, Double)] = Nil

    override def reduce(b: Seq[(Long, Double)], p: (Long, Double)): Seq[(Long, Double)] =
      if (b.length >= k && ord.gteq(p, b.last)) b
      else {
        val i = b.search(p)(ord)
        i match {
          case scala.collection.Searching.Found(_) => b
          case scala.collection.Searching.InsertionPoint(pos) =>
            val grown = (b.take(pos) :+ p) ++ b.drop(pos)
            if (grown.length > k) grown.take(k) else grown
        }
      }

    override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
      (b1 ++ b2).distinct.sorted(ord).take(k)

    override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
  }

  /** Column form: ascending array<struct<_1: hash, _2: value>> of the ≤k
    * lexicographically-smallest distinct (hash, value) pairs. */
  def bottomK(k: Int)(hash: Column, value: Column): Column =
    udaf(new BottomKPairs(k), ExpressionEncoder[(Long, Double)]()).apply(hash, value)
}
