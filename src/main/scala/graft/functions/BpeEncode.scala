package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding of ONE word against a learned merge table — the native
  * replacement for `Bpe.applyMerge`'s chain of `aggregate` folds: the
  * fold chain evaluates interpreted per character per merge and
  * rebuilds the accumulator array per element (~9 s/pass at sf0.1 for
  * SIX merges; this expression runs the identical loop as JIT-compiled
  * Scala inside whole-stage codegen).
  *
  * Semantics are EXACTLY the fold's (spec-pinned eval parity): merges
  * apply in rank order, each as ONE greedy left-to-right
  * non-overlapping pass with a one-symbol lookbehind — "aaa" under
  * (a,a) → ["aa","a"], "aaaa" → ["aa","aa"]. Symbols start as UTF-16
  * code units (the documented `split("")` contract — astral chars
  * split into surrogate halves).
  *
  * The merge table arrives as a foldable array<string> literal
  * flattened [l₁,r₁,l₂,r₂,…] (rank order); it is decoded once per
  * executor off the plan literal, never per row. Cost: O(merges × len)
  * per word. */
case class BpeEncode(first: Expression, second: Expression)
    extends BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects a string word column, got ${first.dataType}")
    else if (!second.dataType.isInstanceOf[ArrayType] ||
        second.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects array<string> merges, got ${second.dataType}")
    else if (!second.foldable)
      TypeCheckResult.TypeCheckFailure("graft_bpe_encode merges must be a literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val merges: Array[(String, String)] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    require(arr.numElements() % 2 == 0,
      s"flattened merge list must have even length: ${arr.numElements()}")
    (0 until arr.numElements() by 2).map(i =>
      (arr.getUTF8String(i).toString, arr.getUTF8String(i + 1).toString)).toArray
  }

  /** Rank-ordered merge application to one word (codegen entry point). */
  def encodeWord(word: UTF8String): ArrayData = {
    val w = word.toString
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var mi = 0
    while (mi < merges.length) {
      val (l, r) = merges(mi)
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      var p: String = null
      var j = 0
      while (j < syms.length) {
        val x = syms(j)
        if (p == null) p = x
        else if (p == l && x == r) { out += (l + r); p = null }
        else { out += p; p = x }
        j += 1
      }
      if (p != null) out += p
      syms = out.toArray
      mi += 1
    }
    new GenericArrayData(syms.map(UTF8String.fromString(_): Any))
  }

  override def nullSafeEval(wordAny: Any, mergesAny: Any): Any =
    encodeWord(wordAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeEncode", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, (word, _) =>
      s"${ev.value} = $ref.encodeWord($word);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(first = newLeft, second = newRight)
}
