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
      // sequence length from the lead byte FIRST; a truncated multi-byte
      // tail (or a stray continuation byte classified as a 4-byte lead)
      // must not read past numBytes — UTF8String.getByte is an unchecked
      // unsafe read. Malformed input degrades to one code unit per byte,
      // deterministically.
      var len =
        if (b0 < 0x80) 1
        else if ((b0 & 0xE0) == 0xC0) 2
        else if ((b0 & 0xF0) == 0xE0) 3
        else 4
      var cp = 0
      if (i + len > n) { cp = b0; len = 1 }
      else if (len == 1) { cp = b0 }
      else if (len == 2) { cp = ((b0 & 0x1F) << 6) | (bytes.getByte(i + 1) & 0x3F) }
      else if (len == 3) {
        cp = ((b0 & 0x0F) << 12) | ((bytes.getByte(i + 1) & 0x3F) << 6) | (bytes.getByte(i + 2) & 0x3F)
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes.getByte(i + 1) & 0x3F) << 12) |
          ((bytes.getByte(i + 2) & 0x3F) << 6) | (bytes.getByte(i + 3) & 0x3F)
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
         |  // length first + bounds clamp: truncated/malformed sequences
         |  // degrade to one code unit per byte, never read past numBytes
         |  int $len = $b0 < 0x80 ? 1 : (($b0 & 0xE0) == 0xC0 ? 2 : (($b0 & 0xF0) == 0xE0 ? 3 : 4));
         |  int $cp;
         |  if ($i + $len > $n) { $cp = $b0; $len = 1; }
         |  else if ($len == 1) { $cp = $b0; }
         |  else if ($len == 2) { $cp = (($b0 & 0x1F) << 6) | ($s.getByte($i + 1) & 0x3F); }
         |  else if ($len == 3) { $cp = (($b0 & 0x0F) << 12) | (($s.getByte($i + 1) & 0x3F) << 6) | ($s.getByte($i + 2) & 0x3F); }
         |  else { $cp = (($b0 & 0x07) << 18) | (($s.getByte($i + 1) & 0x3F) << 12) | (($s.getByte($i + 2) & 0x3F) << 6) | ($s.getByte($i + 3) & 0x3F); }
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

  /** Idempotent per-session registration — invoked by
    * [[VectorFunctions.register]], which every graft.ops entry point
    * already calls (the one documented registration contract). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_polyhash", exprs => PolyHash(exprs.head, exprs(1), exprs(2)), "built-in")

  /** Polynomial hash column. Callers must hold a session with
    * [[VectorFunctions.register]] invoked (all graft.ops entry points
    * do); the active-session registration here is best-effort convenience
    * only — Column construction must not throw when no session is active,
    * and in multi-session drivers the analyzing session's own register
    * call is authoritative. */
  def polyHash(s: Column, base: Long, mod: Long): Column = {
    scala.util.Try(register(SparkSession.active))
    call_function("graft_polyhash", s, lit(base), lit(mod))
  }
}
