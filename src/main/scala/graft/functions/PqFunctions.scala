package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encode (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): the vector is split into
  * `m = |codebooks| / (k·dsub)` subvectors of `dsub` dims; each subvector
  * is replaced by the id of its nearest (squared-L2) centroid in that
  * subspace's codebook. Arguments: (vec array<double>, codebooksFlat
  * array<double> — subspace-major then centroid-major, each centroid
  * `dsub` doubles, a plan literal; dsub int, k int); result: array<int>
  * of `m` codes. A vector whose length differs from `m·dsub` yields NULL
  * (same ragged-input contract as [[PlaneSignatures]]).
  *
  * This is the memory lever for 100 TB embedding search: a 768-dim
  * float32 vector is 3 KB; its PQ codes are `m` small ints (bytes once
  * stored), a 30–100× compression, so the ANN scan reads codes-only
  * parquet and the full-precision vectors are touched just for the final
  * re-rank candidates. One codegen'd nested loop per row; ties go to the
  * lower centroid id. */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) &&
        third.dataType == IntegerType && fourth.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects (array<double>, array<double>, int, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
  }

  override def nullSafeEval(vecAny: Any, cbAny: Any, dsubAny: Any, kAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val dsub = dsubAny.asInstanceOf[Int]
    val k = kAny.asInstanceOf[Int]
    if (dsub <= 0 || k <= 0) return null
    val m = cb.numElements() / (k * dsub)
    if (v.numElements() != m * dsub) return null
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val base = (s * k + j) * dsub
        var d = 0.0; var i = 0
        while (i < dsub) {
          val diff = v.getDouble(s * dsub + i) - cb.getDouble(base + i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best; s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, dsub, k) => {
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val j = ctx.freshName("j")
      val base = ctx.freshName("base"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val diff = ctx.freshName("diff")
      s"""
         |if ($dsub <= 0 || $k <= 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $m = $cb.numElements() / ($k * $dsub);
         |  if ($v.numElements() != $m * $dsub) {
         |    ${ev.isNull} = true;
         |  } else {
         |    int[] $out = new int[$m];
         |    for (int $s = 0; $s < $m; $s++) {
         |      int $best = 0; double $bestD = Double.MAX_VALUE;
         |      for (int $j = 0; $j < $k; $j++) {
         |        int $base = ($s * $k + $j) * $dsub;
         |        double $d = 0.0;
         |        for (int $i = 0; $i < $dsub; $i++) {
         |          double $diff = $v.getDouble($s * $dsub + $i) - $cb.getDouble($base + $i);
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bestD) { $bestD = $d; $best = $j; }
         |      }
         |      $out[$s] = $best;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Asymmetric-distance scoring over PQ codes: approximate inner product
  * of the (normalized) query against an encoded vector as
  * `Σ_s lut[s·k + codes[s]]`, where `lut` is the query-specific
  * m×k table `dot(q_s, codebook_s[j])` computed ONCE driver-side per
  * query and shipped as a plan literal. Per corpus row the scan does `m`
  * array lookups and adds — no distance computation, no vector reads:
  * the 100 TB ANN pass is a codes-only columnar scan. Result NULL when
  * the code count disagrees with the table shape (ragged/foreign codes).
  * Codes outside [0, k) also yield NULL (corrupt input must not read a
  * neighboring subspace's table entries). */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), IntegerType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects (array<int>, array<double>, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override def nullSafeEval(codesAny: Any, lutAny: Any, kAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    if (k <= 0) return null
    val m = lut.numElements() / k
    if (codes.numElements() != m) return null
    var acc = 0.0; var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= k) return null
      acc += lut.getDouble(s * k + c); s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut, k) => {
      val m = ctx.freshName("m"); val acc = ctx.freshName("acc")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val bad = ctx.freshName("bad")
      s"""
         |if ($k <= 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $m = $lut.numElements() / $k;
         |  if ($codes.numElements() != $m) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $acc = 0.0; boolean $bad = false;
         |    for (int $s = 0; $s < $m; $s++) {
         |      int $c = $codes.getInt($s);
         |      if ($c < 0 || $c >= $k) { $bad = true; break; }
         |      $acc += $lut.getDouble($s * $k + $c);
         |    }
         |    if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
