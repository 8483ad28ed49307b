package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression for cosine similarity over two equal-length
  * numeric arrays. A codegen'd tight loop (no per-element lambda closures
  * like `zip_with`/`aggregate` compose to), so brute-force similarity scans
  * stay inside whole-stage codegen — this is the hot inner loop of the
  * embedding dedup/ANN operators at 100 TB scale.
  * Float arrays are implicitly cast to double (ImplicitCastInputTypes).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $x.getDouble($i);
         |  double yv = $y.getDouble($i);
         |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression computing banded random-hyperplane LSH
  * signatures in one pass: for each band b of `rowsPerBand` planes, bit p
  * of signature b is the sign of dot(vec, plane_{b·rowsPerBand+p}).
  * `planes` is the flattened plane matrix (band-major, each plane `dim`
  * doubles) — a literal, so codegen reads it from a reference without
  * per-row construction.
  *
  * `dim` (fourth argument) is the dimensionality the planes were built
  * for. A row whose vector length differs — ragged embeddings — yields
  * NULL rather than silently re-deriving a different band count and
  * reading plane slices at wrong offsets (the plane literal's length is
  * a multiple of dim·rowsPerBand, so all reads stay in bounds by
  * construction once dim is pinned). NULL signatures drop out of the
  * downstream posexplode: mismatched rows simply produce no candidates.
  *
  * Replaces the `zip_with` + `aggregate` HOF composition, which
  * materialized a per-plane product array and evaluated its lambdas
  * interpreted per element — numPlanes × dim interpreted ops per row was
  * the dominant cost of the embedding-LSH candidate stage. Sum order per
  * plane is ascending-index, matching the HOF `aggregate` fold, so signs
  * (and therefore signatures) are bit-identical. */
case class PlaneSignatures(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_plane_sigs"
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
      s"graft_plane_sigs expects (array<double>, array<double>, int, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
  }

  override def nullSafeEval(vecAny: Any, planesAny: Any, rpbAny: Any, dimAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData]
    val pl = planesAny.asInstanceOf[ArrayData]
    val rpb = rpbAny.asInstanceOf[Int]
    val dim = dimAny.asInstanceOf[Int]
    if (v.numElements() != dim || dim == 0) return null
    val nBands = pl.numElements() / dim / rpb
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var sig = 0L; var p = 0
      while (p < rpb) {
        val base = (b * rpb + p) * dim
        var s = 0.0; var i = 0
        while (i < dim) { s += v.getDouble(i) * pl.getDouble(base + i); i += 1 }
        if (s >= 0) sig |= 1L << p
        p += 1
      }
      out(b) = sig; b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, pl, rpb, dim) => {
      val nBands = ctx.freshName("nBands")
      val out = ctx.freshName("out"); val b = ctx.freshName("b")
      val sig = ctx.freshName("sig"); val p = ctx.freshName("p")
      val base = ctx.freshName("base"); val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |if ($v.numElements() != $dim || $dim == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $nBands = $pl.numElements() / $dim / $rpb;
         |  long[] $out = new long[$nBands];
         |  for (int $b = 0; $b < $nBands; $b++) {
         |    long $sig = 0L;
         |    for (int $p = 0; $p < $rpb; $p++) {
         |      int $base = ($b * $rpb + $p) * $dim;
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) $s += $v.getDouble($i) * $pl.getDouble($base + $i);
         |      if ($s >= 0) $sig |= 1L << $p;
         |    }
         |    $out[$b] = $sig;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object VectorFunctions {

  /** Idempotent per-session registration of ALL native graft functions
    * (vector + hash) — the single registration contract every graft.ops
    * entry point invokes. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_plane_sigs",
      exprs => PlaneSignatures(exprs.head, exprs(1), exprs(2), exprs(3)), "built-in")
    HashFunctions.register(spark)
  }

  /** Cosine similarity column; caller must have invoked [[register]] for
    * the session (all graft.ops entry points do). Float arrays are cast
    * here (a no-copy reinterpret inside codegen). */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a.cast("array<double>"), b.cast("array<double>"))

  /** Banded hyperplane signatures column: array of `planes.length /
    * rowsPerBand` packed sign-bit signatures (band-major plane order).
    * Rows whose vector length differs from the planes' dimensionality
    * yield NULL (and so drop out of candidate generation) instead of
    * reading plane slices at wrong offsets. */
  def planeSignatures(vec: Column, planes: Seq[Seq[Double]], rowsPerBand: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedLit}
    call_function("graft_plane_sigs", vec.cast("array<double>"),
      typedLit(planes.flatten), lit(rowsPerBand), lit(planes.head.length))
  }
}
