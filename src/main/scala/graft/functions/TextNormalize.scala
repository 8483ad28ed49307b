package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared by [[NfcNormalize]].nullSafeEval and its generated code — one
  * implementation, two call sites, no eval/codegen drift. */
object NfcNormalizeImpl {
  /** Unicode NFC composition with an ASCII fast path: a UTF8String whose
    * bytes are all < 0x80 is NFC by construction and is returned
    * UNCHANGED (no String round-trip, no allocation) — on a
    * predominantly-ASCII web corpus the normalizer pass stays
    * scan-bound and only the non-ASCII minority pays the
    * java.text.Normalizer cost. */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { ascii = (s.getByte(i) & 0x80) == 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Unicode NFC normalization as a native codegen'd expression — Spark
  * has no built-in normalizer, and a corpus mixing composed and
  * decomposed encodings of the same glyphs defeats exact dedup
  * (fingerprints differ on byte-identical-looking text). */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeImpl.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.NfcNormalizeImpl$$.MODULE$$.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
