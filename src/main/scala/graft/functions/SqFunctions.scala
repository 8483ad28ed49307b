package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Int8 scalar quantization (the "SQ8" storage mode every production
  * vector store ships alongside PQ): the vector is L2-normalized, then
  * each component — now in [−1, 1] — is rounded to a signed byte at
  * scale 127. One byte per dimension: 8× smaller than array<double>
  * storage, 4× smaller than float32, with NO per-vector scale factor to
  * carry because normalization bounds the range globally.
  *
  * At 100 TB the brute-force scan is memory-bandwidth-bound, so byte
  * codes make the exact-ish scan 8× faster before any index structure
  * enters the picture; the asymmetric scorer keeps the query at full
  * precision (quantizing only the corpus side halves the quantization
  * error vs symmetric int8×int8). Result: BinaryType — parquet stores it
  * as one compact BYTE_ARRAY, and codegen reads it as a raw byte[]. */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sq8_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_encode expects array<double>, got $t")
  }

  override def nullSafeEval(vecAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    Sq8Encode.encode(vec)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, vec =>
      s"graft.functions.Sq8Encode.encode($vec)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8Encode {
  /** Shared by interpreted eval and codegen (one static call per row —
    * the loop itself stays JIT-compiled Java either way). */
  def encode(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); ss += x * x; i += 1 }
    val inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val v = vec.getDouble(i) * inv * 127.0
      val r = math.rint(v)
      val c = if (r > 127.0) 127L else if (r < -127.0) -127L else r.toLong
      out(i) = c.toByte
      i += 1
    }
    out
  }
}

/** Asymmetric int8 dot product: Σ query(i) · codes(i)/127 — the query
  * rides the plan as a full-precision literal array, the corpus side is
  * the [[Sq8Encode]] byte codes. Because the codes are an L2-normalized
  * quantization, the result approximates the cosine similarity of the
  * original vectors. NULL on length mismatch (ragged-input contract).
  * One codegen'd byte loop per row; no allocation. */
case class Sq8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_dot"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sq8_dot expects (binary, array<double>), got ($l, $r)")
    }

  override def nullSafeEval(codesAny: Any, queryAny: Any): Any = {
    val codes = codesAny.asInstanceOf[Array[Byte]]
    val query = queryAny.asInstanceOf[ArrayData]
    if (codes.length != query.numElements()) null
    else {
      var acc = 0.0; var i = 0
      while (i < codes.length) { acc += query.getDouble(i) * codes(i); i += 1 }
      acc / 127.0
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, query) => {
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
         |if ($codes.length != $query.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $codes.length; $i++) {
         |    $acc += $query.getDouble($i) * $codes[$i];
         |  }
         |  ${ev.value} = $acc / 127.0;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
