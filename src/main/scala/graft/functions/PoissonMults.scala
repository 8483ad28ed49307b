package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All B deterministic Poisson(1) multiplicities of one row in ONE call:
  * element `rep` is the inverse-CDF multiplicity of the 52-bit md5
  * uniform of `salt:rep:id` — bit-identical to evaluating
  * `graft_md5_prefix52(concat(salt, ':', rep, ':', id))` per rep and
  * thresholding against [[PoissonMults.Cdf]], but WITHOUT the per-rep
  * row machinery that dominated the exploded spelling: no per-rep
  * UTF8String concat (a fresh buffer per (rep, row)), no int→string
  * cast per row, no 9-deep codegen CASE chain, and one reused digest +
  * output buffer per thread. The `salt:rep:` prefixes are rendered once
  * per expression instance (B tiny byte arrays), so the per-rep inner
  * loop is: reset digest, update(prefix), update(idBytes), digest into
  * a scratch buffer, assemble the 52-bit prefix, linear-scan 9 doubles.
  *
  * The Poisson-bootstrap ops posexplode this array — pos IS the rep id
  * — and aggregate; the row volume downstream is unchanged, only the
  * per-row multiplicity derivation got cheap. Any engine restates each
  * element as the md5 spelling above (the oracle does, per rep). */
case class PoissonMults(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_poisson_mults"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_poisson_mults expects a string id column, got ${first.dataType}")
    else if (second.dataType != IntegerType || !second.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_poisson_mults expects a literal int rep count")
    else if (third.dataType != StringType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_poisson_mults expects a literal string salt")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val b: Int = {
    val n = second.eval().asInstanceOf[Int]
    require(n >= 1 && n <= 100000, s"rep count out of [1,100000]: $n")
    n
  }

  @transient private lazy val sampler = new PoissonMults.Sampler(
    third.eval().asInstanceOf[UTF8String].toString, b)

  /** Thread-confined b-int scratch, reused across rows; the returned
    * UnsafeArrayData copies out of it. */
  @transient private lazy val scratch = new ThreadLocal[Array[Int]] {
    override def initialValue() = new Array[Int](b)
  }

  def mults(id: UTF8String): ArrayData = {
    val ms = scratch.get()
    sampler.fill(id.getBytes, ms)
    UnsafeArrayData.fromPrimitiveArray(ms)
  }

  override def nullSafeEval(idAny: Any, bAny: Any, saltAny: Any): Any =
    mults(idAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPoissonMults", this,
      classOf[PoissonMults].getName)
    nullSafeCodeGen(ctx, ev, (idv, _, _) => s"${ev.value} = $ref.mults($idv);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PoissonMults {
  /** Cumulative Poisson(1) CDF thresholds — the SAME literal doubles the
    * oracle SQL hardcodes (see [[graft.ops.Profile.PoissonCdf]], which
    * stays the single documented source; kept in sync by the spec that
    * diffs the two). */
  private[graft] val Cdf: Array[Double] = Array(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.981011843123846, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988805746001)

  /** The multiplicity derivation as a reusable, serializable sampler —
    * shared by the [[PoissonMults]] expression and the bootstrap
    * aggregators, so both sides hash the SAME `salt:rep:` prefixes
    * against the SAME thresholds. Thread-confined digest + 16-byte out
    * buffer; `fill` writes all B multiplicities of one id into the
    * caller's scratch array. */
  private[graft] final class Sampler(salt: String, val b: Int)
      extends Serializable {
    require(b >= 1 && b <= 100000, s"rep count out of [1,100000]: $b")
    @transient private lazy val prefixes: Array[Array[Byte]] =
      Array.tabulate(b)(rep =>
        (salt + ":" + rep + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    @transient private lazy val state =
      new ThreadLocal[(java.security.MessageDigest, Array[Byte])] {
        override def initialValue() =
          (java.security.MessageDigest.getInstance("MD5"), new Array[Byte](16))
      }
    def fill(idBytes: Array[Byte], ms: Array[Int]): Unit = {
      val (md, out) = state.get()
      var rep = 0
      while (rep < b) {
        md.reset()
        md.update(prefixes(rep))
        md.update(idBytes)
        md.digest(out, 0, 16)
        val h = ((out(0) & 0xFFL) << 44) | ((out(1) & 0xFFL) << 36) |
          ((out(2) & 0xFFL) << 28) | ((out(3) & 0xFFL) << 20) |
          ((out(4) & 0xFFL) << 12) | ((out(5) & 0xFFL) << 4) |
          ((out(6) & 0xF0L) >>> 4)
        // u = h / 2^52 is exact (h has <= 52 bits); first threshold with
        // u < Cdf(i) wins — the oracle's CASE chain verbatim
        val u = h.toDouble / 4503599627370496.0
        var m = 0
        while (m < 9 && u >= Cdf(m)) m += 1
        ms(rep) = m
        rep += 1
      }
    }
  }
}
