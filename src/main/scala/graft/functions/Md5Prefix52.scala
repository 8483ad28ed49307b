package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Top 52 bits of md5(input) as a long — bit-identical to the portable
  * SQL spelling `('0x' || substr(md5(s), 1, 13))::BIGINT` (13 hex
  * digits = 52 bits), WITHOUT rendering the 32-char hex string,
  * substringing it, and re-parsing it through `conv` (the profiled
  * overhead of the generic spelling: at 300M evaluations the
  * hex-and-parse path measurably dominates the digest itself).
  * The digest reads the UTF8String's bytes directly — same bytes the
  * SQL md5 hashes.
  *
  * This is the shared uniform-hash primitive of the KMV sketches and
  * the Poisson bootstrap; any engine restates it with its own md5. */
case class Md5Prefix52(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix52"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_prefix52 expects a string, got ${child.dataType}")

  /** Thread-confined digest instance (MessageDigest is stateful). */
  @transient private lazy val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def hash52(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // top 13 hex digits = bytes 0..5 (48 bits) + high nibble of byte 6
    ((d(0) & 0xFFL) << 44) | ((d(1) & 0xFFL) << 36) |
      ((d(2) & 0xFFL) << 28) | ((d(3) & 0xFFL) << 20) |
      ((d(4) & 0xFFL) << 12) | ((d(5) & 0xFFL) << 4) |
      ((d(6) & 0xF0L) >>> 4)
  }

  override def nullSafeEval(input: Any): Any =
    hash52(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftMd5P52", this,
      classOf[Md5Prefix52].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.hash52($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
