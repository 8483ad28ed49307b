package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-keyword tagger: ONE pass over the text against a prebuilt
  * Aho-Corasick automaton instead of k independent `contains` scans —
  * the blocklist/taxonomy-tagging primitive of a curation pipeline,
  * where dictionaries run to thousands of entries and the corpus to
  * 100 TB (k × contains is k passes; AC is one, independent of k).
  *
  * Semantics: case-insensitive SUBSTRING containment (blocklist
  * semantics — "key" tags "keys"); output is the sorted distinct list
  * of matched dictionary entries, so any engine restates it as
  * `sort(filter(dict, k -> contains(lower(text), k)))`.
  *
  * The dictionary must be a foldable array<string> literal: the
  * automaton is built once per executor (lazy, off the plan literal),
  * never per row. Codegen calls into the prebuilt automaton via a
  * reference object — the matcher loop is JIT-compiled Scala; only the
  * null plumbing is generated.
  */
case class KeywordTags(first: Expression, second: Expression)
    extends BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_keyword_tags"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_keyword_tags expects a string text column, got ${first.dataType}")
    else if (!second.dataType.isInstanceOf[ArrayType] ||
        second.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_keyword_tags expects array<string> keywords, got ${second.dataType}")
    else if (!second.foldable)
      TypeCheckResult.TypeCheckFailure("graft_keyword_tags keywords must be a literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val keywords: Array[String] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i =>
      arr.getUTF8String(i).toString.toLowerCase).toArray
  }

  // Aho-Corasick goto/fail/output tables, built once per executor.
  @transient private lazy val automaton: KeywordTags.Automaton =
    KeywordTags.build(keywords)

  /** Sorted distinct matched keywords of `text` (the codegen entry
    * point — prebuilt automaton, JIT'd loop). */
  def matchTags(text: UTF8String): ArrayData = {
    val s = text.toString.toLowerCase
    val hit = new java.util.BitSet(keywords.length)
    var state = 0
    var i = 0
    while (i < s.length) {
      state = automaton.step(state, s.charAt(i))
      var o = automaton.out(state)
      while (o ne Nil) { hit.set(o.head); o = o.tail }
      i += 1
    }
    val matched = scala.collection.mutable.ArrayBuffer.empty[String]
    var id = hit.nextSetBit(0)
    while (id >= 0) {
      matched += keywords(id)
      id = hit.nextSetBit(id + 1)
    }
    new GenericArrayData(matched.sorted.map(UTF8String.fromString).toArray[Any])
  }

  override def nullSafeEval(textAny: Any, kwAny: Any): Any =
    matchTags(textAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftKeywordTags", this,
      classOf[KeywordTags].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $ref.matchTags($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(first = newLeft, second = newRight)
}

object KeywordTags {

  /** Flat-table Aho-Corasick automaton: per-node char→next maps for
    * goto, BFS-derived fail links, and per-node matched-keyword id
    * lists (pattern ends plus everything reachable via fail). */
  final class Automaton(goto: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int], val out: Array[List[Int]]) {
    def step(state0: Int, c: Char): Int = {
      var state = state0
      var next = goto(state).get(c)
      while (next == null && state != 0) {
        state = fail(state)
        next = goto(state).get(c)
      }
      if (next == null) 0 else next.intValue()
    }
  }

  def build(keywords: Array[String]): Automaton = {
    require(keywords.nonEmpty && keywords.forall(_.nonEmpty),
      "keyword dictionary must be non-empty strings")
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for ((kw, id) <- keywords.zipWithIndex) {
      var node = 0
      for (c <- kw) {
        val nxt = goto(node).get(c)
        if (nxt == null) {
          goto += new java.util.HashMap[Character, Integer]()
          ends += Nil
          goto(node).put(c, goto.length - 1)
          node = goto.length - 1
        } else node = nxt.intValue()
      }
      ends(node) = id :: ends(node)
    }
    val n = goto.length
    val fail = new Array[Int](n)
    val out = ends.toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    goto(0).forEach((_, v) => queue += v.intValue())
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      goto(u).forEach { (c, v) =>
        queue += v.intValue()
        var f = fail(u)
        while (f != 0 && goto(f).get(c) == null) f = fail(f)
        val fn = goto(f).get(c)
        fail(v) = if (fn != null && fn.intValue() != v.intValue()) fn.intValue() else 0
        out(v) = out(v) ++ out(fail(v))
      }
    }
    new Automaton(goto.toArray, fail, out)
  }
}
