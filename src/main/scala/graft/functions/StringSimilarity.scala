package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side Jaro-Winkler worker for [[JaroWinklerSim]].
  *
  * Standard definition, pinned to DuckDB's `jaro_winkler_similarity`
  * semantics (probed value-for-value before the gate was wired):
  *   - either side empty → 0.0 (INCLUDING both empty — DuckDB returns 0
  *     there, not the textbook 1);
  *   - match window floor(max(|a|,|b|)/2) − 1;
  *   - transpositions = half the mismatched matched-char sequence;
  *   - Winkler boost only when jaro > 0.7: jw = j + ℓ·0.1·(1−j),
  *     ℓ = common prefix capped at 4.
  * Operates on UTF-16 chars (== code points on the BMP); parity with
  * byte-oriented engines holds for ASCII/Latin keys, which is what
  * record-linkage keys are after [[graft.ops.Dedup.normText]]-style
  * normalization. */
object StringSimilarityWorker {

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(l1, l2))
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** `graft_jaro_winkler(a, b)` — Jaro-Winkler similarity in [0,1], the
  * record-linkage scorer (names, addresses, titles) that rewards shared
  * prefixes where plain edit distance treats every position alike.
  * Codegen emits one static call into [[StringSimilarityWorker]], so a
  * blocked candidate-pair scoring pass stays inside whole-stage codegen
  * — the 100 TB-scale discipline is in the BLOCKING (score only
  * within-block pairs, never the cross product); the scorer itself is
  * O(|a|·window) per pair with two small scratch arrays. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarityWorker.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimilarityWorker.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
