package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side deflate worker for [[DeflateSize]]: one zlib Deflater
  * per thread, reset between rows — task threads are long-lived, so the
  * native deflater state is allocated once per (executor-thread, job)
  * rather than once per row, keeping the corpus pass scan-bound. Counts
  * output bytes into a fixed scratch buffer without materializing the
  * compressed blob. */
object DeflateWorker {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      // nowrap (raw deflate, no zlib header/checksum): the 6-byte wrapper
      // would distort ratios on short documents
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Deflated byte count of the UTF-8 bytes of `s`. */
  def deflatedSize(s: UTF8String): Int = {
    val d = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = scratch.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** Deflated-size expression `graft_deflate_size(text)` — the byte count
  * of the raw-deflate compression of the text's UTF-8 bytes. The ratio
  * deflated/original is the classic corpus-quality compressibility
  * signal (boilerplate and templated spam compress far below prose;
  * random noise compresses above it). Codegen emits one static call into
  * [[DeflateWorker]] (thread-local native deflater, no per-row
  * allocation), so the expression stays inside whole-stage codegen and a
  * corpus-wide quality pass remains scan-bound. zlib output is
  * deterministic for a fixed level within a JVM; cross-engine oracles
  * should assert ratio PROPERTIES (bounds, self-similarity) rather than
  * exact byte counts. */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_size"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_size expects string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    DeflateWorker.deflatedSize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateWorker.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
