package graft.tools

import graft.functions.BloomSet
import org.apache.spark.util.sketch.BloomFilter

/** Measures the REAL false-positive rate of two Bloom constructions at
  * identical sizing — the evidence behind [[graft.functions.BloomSet]]'s
  * existence (COVERAGE.md Bench notes):
  *
  *  - spark-sketch's `BloomFilter` derives both double-hashing terms
  *    from 32-bit Murmur3 halves; measured here it delivers ~7.8e-5 when
  *    asked for 1e-8 and plateaus near 3e-6 even given 64× the bits;
  *  - `BloomSet` (full-width splitmix64 double hashing) tracks the
  *    analytic (1−e^(−kn/m))^k curve.
  *
  * Usage: runMain graft.tools.BloomProbe [nItems] [probes]
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val probes = args.drop(1).headOption.map(_.toLong).getOrElse(20000000L)
    val rnd = new java.util.Random(7)
    val inserted = Array.fill(n)(rnd.nextLong())
    for (fpp <- Seq(1e-4, 1e-6, 1e-8)) {
      // spark-sketch at its own optimal sizing
      val skBits = BloomFilter.optimalNumOfBits(n, fpp)
      val sk = BloomFilter.create(n, skBits)
      inserted.foreach(sk.putLong)
      // BloomSet at the same sizing
      val m = BloomSet.optimalNumBits(n, fpp)
      val k = BloomSet.optimalNumProbes(n, m)
      val bits = BloomSet.build(inserted, m, k)
      var skFp = 0L; var bsFp = 0L; var i = 0L
      val r2 = new java.util.Random(13)
      while (i < probes) {
        val x = r2.nextLong()
        if (sk.mightContainLong(x)) skFp += 1
        // driver-side probe mirrors the expression's eval exactly
        var hit = true; var j = 0
        while (hit && j < k) {
          val g = BloomSet.position(x, j, m)
          if ((bits((g >>> 3).toInt) & (1 << (g & 7L).toInt)) == 0) hit = false
          j += 1
        }
        if (hit) bsFp += 1
        i += 1
      }
      println(f"fpp=$fpp%.0e  spark-sketch=${skFp.toDouble / probes}%.2e  " +
        f"bloomset=${bsFp.toDouble / probes}%.2e  (m=$m k=$k, $probes probes)")
    }
  }
}
