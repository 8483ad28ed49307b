package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert-curve index of a 2-D integer key — the locality-preserving
  * sibling of [[graft.ops.Layout.zValue]] (Morton). The Hilbert curve
  * visits every cell of the 2^bits x 2^bits grid such that CONSECUTIVE
  * index values are always grid-adjacent (Manhattan distance 1 — the
  * property Z-order lacks at its quadrant seams), so a contiguous index
  * range covers a compact blob of key space with strictly better
  * worst-case locality than a z-range. This is the clustering key
  * Databricks liquid clustering and Iceberg's hilbert sort-order use
  * where Delta's OPTIMIZE uses Z-order; at 100 TB the difference is the
  * fraction of parquet files whose footer stats exclude a 2-D range
  * predicate — Hilbert ranges never jump across the grid, z-ranges do
  * at every power-of-two boundary.
  *
  * Index computation is the standard bitwise quadrant walk (Butz;
  * Hamilton's compact form): per output bit pair, take the top bits
  * (rx, ry), emit the gray-coded quadrant number, then rotate/reflect
  * the remaining low bits into the sub-quadrant's frame. O(bits) with
  * ~6 long ops per step, codegen'd into the scan stage — no UDF, no
  * tree explosion (the naive Column-composition form triples the
  * expression tree per step because each rotation references both
  * coordinates).
  */
object Hilbert {

  /** Reference implementation: Hilbert index of (x, y) on the
    * 2^bits x 2^bits grid. Inputs are masked to `bits` (callers
    * normalize or bucket first — curve locality cares about relative
    * position, not exact magnitudes; same contract as zValueN). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `graft_hilbert(x, y, bits)` — codegen'd [[Hilbert.xy2d]]. `bits` must
  * be a foldable int in [1, 31] (2·bits index bits must fit a long with
  * headroom; 31 matches zValueN's per-key cap). */
case class HilbertIndex(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != LongType || second.dataType != LongType ||
        third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert expects (bigint, bigint, int), got " +
          s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
    else if (!third.foldable)
      TypeCheckResult.TypeCheckFailure("graft_hilbert bits must be a literal")
    else {
      val b = third.eval().asInstanceOf[Int]
      if (b >= 1 && b <= 31) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"graft_hilbert bits out of [1,31]: $b")
    }

  override def nullSafeEval(xAny: Any, yAny: Any, bAny: Any): Any =
    Hilbert.xy2d(bAny.asInstanceOf[Int], xAny.asInstanceOf[Long],
      yAny.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xIn, yIn, b) => {
      val n = ctx.freshName("n"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      s"""
         |long $n = 1L << $b;
         |long $x = $xIn & ($n - 1);
         |long $y = $yIn & ($n - 1);
         |long $d = 0L;
         |for (long $s = $n >> 1; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) != 0) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) {
         |      $x = $n - 1 - $x;
         |      $y = $n - 1 - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
