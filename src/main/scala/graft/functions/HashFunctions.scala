package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial string hash
  * h = fold(codes, 7, (a, c) => (a·base + c) mod m) used by the portable
  * token hash (SimHash gate) and the rolling-hash fingerprint.
  *
  * Exactly reproduces the higher-order-function formulation
  * `aggregate(transform(split(s, ''), ch -> ascii(ch)), 7, ...)` — per
  * char, Spark's `ascii` yields the full Unicode code point (probed:
  * é→233, €→8364), and `split('', '')` yields a single empty string
  * whose `ascii` is 0, so the empty input folds one 0 code — but as ONE
  * codegen'd loop over the UTF8String's bytes: no per-char UTF8String
  * array, no interpreted lambda per element. The HOF form evaluated
  * interpreted per element and dominated the SimHash stage's cost; this
  * loop stays inside whole-stage codegen, so the 100 TB corpus pass is
  * scan-bound.
  *
  * Intermediates stay < 2^41 for base ≤ 257, mod ≤ 2^31, code points
  * ≤ 0x10FFFF: 64-bit arithmetic never overflows (same argument as the
  * HOF version).
  */
case class PolyHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == LongType &&
        third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects (string, bigint, bigint), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")

  override def nullSafeEval(s: Any, baseAny: Any, modAny: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String]
    val base = baseAny.asInstanceOf[Long]
    val mod = modAny.asInstanceOf[Long]
    val n = bytes.numBytes()
    var h = 7L
    if (n == 0) h = (h * base) % mod
    var i = 0
    while (i < n) {
      val b0 = bytes.getByte(i) & 0xFF
      var cp = 0; var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) { cp = ((b0 & 0x1F) << 6) | (bytes.getByte(i + 1) & 0x3F); len = 2 }
      else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((bytes.getByte(i + 1) & 0x3F) << 6) | (bytes.getByte(i + 2) & 0x3F); len = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes.getByte(i + 1) & 0x3F) << 12) |
          ((bytes.getByte(i + 2) & 0x3F) << 6) | (bytes.getByte(i + 3) & 0x3F); len = 4
      }
      h = (h * base + cp) % mod
      i += len
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, base, mod) => {
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val b0 = ctx.freshName("b0")
      val cp = ctx.freshName("cp"); val len = ctx.freshName("len")
      s"""
         |int $n = $s.numBytes();
         |long $h = 7L;
         |if ($n == 0) $h = ($h * $base) % $mod;
         |int $i = 0;
         |while ($i < $n) {
         |  int $b0 = $s.getByte($i) & 0xFF;
         |  int $cp; int $len = 1;
         |  if ($b0 < 0x80) { $cp = $b0; }
         |  else if (($b0 & 0xE0) == 0xC0) { $cp = (($b0 & 0x1F) << 6) | ($s.getByte($i + 1) & 0x3F); $len = 2; }
         |  else if (($b0 & 0xF0) == 0xE0) { $cp = (($b0 & 0x0F) << 12) | (($s.getByte($i + 1) & 0x3F) << 6) | ($s.getByte($i + 2) & 0x3F); $len = 3; }
         |  else { $cp = (($b0 & 0x07) << 18) | (($s.getByte($i + 1) & 0x3F) << 12) | (($s.getByte($i + 2) & 0x3F) << 6) | ($s.getByte($i + 3) & 0x3F); $len = 4; }
         |  $h = ($h * $base + $cp) % $mod;
         |  $i += $len;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HashFunctions {

  /** Idempotent per-session registration (piggybacks on the graft.ops
    * entry points that already register the vector functions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_polyhash", exprs => PolyHash(exprs.head, exprs(1), exprs(2)), "built-in")

  /** Polynomial hash column; registers against the active session so
    * Column-only call sites (no DataFrame in scope) keep working. */
  def polyHash(s: Column, base: Long, mod: Long): Column = {
    register(SparkSession.active)
    call_function("graft_polyhash", s, lit(base), lit(mod))
  }
}
