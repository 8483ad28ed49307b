package graft

import graft.sparql.SparqlParser
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trip: render a random query model as SPARQL text
  * (with random whitespace/newlines) and parse it back — the parsed stars,
  * filters and modifiers must match the model. Drives ScalaCheck
  * generators directly (seeded, deterministic). */
class ParserPropertySpec extends AnyFunSuite {

  private val ident: Gen[String] =
    for {
      h <- Gen.alphaLowerChar
      t <- Gen.listOfN(5, Gen.alphaNumChar)
    } yield (h :: t).mkString

  private case class Model(
      stars: Map[String, Seq[(String, String)]], // subj -> (predLocal, objVar)
      filters: Seq[(String, String, String)],
      inFilters: Seq[(String, Seq[String], Boolean)], // var, values, negated
      ask: Boolean,
      distinct: Boolean,
      limit: Option[Int])

  private val genModel: Gen[Model] = for {
    nStars <- Gen.choose(1, 3)
    subjects <- Gen.listOfN(nStars, ident).map(_.distinct)
    stars <- Gen.sequence[Seq[(String, Seq[(String, String)])], (String, Seq[(String, String)])](
      subjects.map { s =>
        for {
          nPreds <- Gen.choose(1, 4)
          preds <- Gen.listOfN(nPreds, ident).map(_.distinct)
          objs <- Gen.listOfN(preds.size, ident)
        } yield s -> preds.zip(objs.map(o => s + o)) // obj vars unique per star
      })
    allVars = stars.flatMap(_._2.map(_._2))
    nFilters <- Gen.choose(0, 2)
    fvars <- Gen.listOfN(nFilters, Gen.oneOf(allVars))
    ops <- Gen.listOfN(nFilters, Gen.oneOf("=", "!=", "<", "<=", ">", ">="))
    vals <- Gen.listOfN(nFilters, Gen.choose(-1000, 1000))
    nIn <- Gen.choose(0, 1)
    inVars <- Gen.listOfN(nIn, Gen.oneOf(allVars))
    inVals <- Gen.listOfN(nIn, Gen.nonEmptyListOf(Gen.choose(0, 99)).map(_.take(3)))
    inNeg <- Gen.listOfN(nIn, Gen.oneOf(true, false))
    ask <- Gen.frequency(4 -> false, 1 -> true)
    distinct <- Gen.oneOf(true, false)
    limit <- Gen.option(Gen.choose(1, 99))
  } yield Model(stars.toMap, fvars.lazyZip(ops).lazyZip(vals.map(_.toString)).toSeq,
    inVars.lazyZip(inVals.map(_.map(_.toString))).lazyZip(inNeg).toSeq,
    ask, distinct, limit)

  private val ws: Gen[String] = Gen.oneOf(" ", "  ", "\n", "\n  ", "\t")

  private def render(m: Model, w: String): String = {
    val sb = new StringBuilder
    sb ++= s"PREFIX ex: <http://ex.org/>$w"
    if (m.ask) sb ++= s"ASK$w"
    else {
      sb ++= "SELECT "
      if (m.distinct) sb ++= "DISTINCT "
      val vars = m.stars.values.flatten.map(_._2).toSeq
      sb ++= vars.map("?" + _).mkString(" ")
      sb ++= w
    }
    sb ++= s"WHERE {$w"
    for ((s, pos) <- m.stars; (p, o) <- pos)
      sb ++= s"?$s ex:$p ?$o .$w"
    for ((v, op, value) <- m.filters)
      sb ++= s"FILTER(?$v $op $value)$w"
    for ((v, vals, neg) <- m.inFilters)
      sb ++= s"FILTER(?$v ${if (neg) "NOT IN" else "IN"} (${vals.mkString(", ")}))$w"
    sb ++= "}"
    m.limit.foreach(n => sb ++= s"${w}LIMIT $n")
    sb.toString
  }

  test("random query models round-trip through render + parse (200 seeded cases)") {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var checked = 0
    while (checked < 200) {
      val m = genModel.apply(params, seed).getOrElse(sys.error("gen failed"))
      seed = seed.next
      val w = ws.apply(params, seed).getOrElse(" ")
      seed = seed.next
      val text = render(m, w)
      val q = try SparqlParser.parse(text)
      catch { case e: Exception => fail(s"parse failed for:\n$text", e) }
      assert(q.ask == m.ask, text)
      assert(q.distinct == (!m.ask && m.distinct), text)
      assert(q.limit == m.limit, text)
      assert(q.stars.keySet == m.stars.keySet, text)
      for ((s, pos) <- m.stars)
        assert(q.stars(s).map(tp => tp.predicate.stripPrefix("http://ex.org/")) ==
          pos.map(_._1), text)
      val (cmp, ins) = q.filters.partition(_.values.isEmpty)
      assert(cmp.map(f => (f.varName, f.op, f.value)) == m.filters, text)
      assert(ins.map(f => (f.varName, f.values, f.op == "not in")) == m.inFilters, text)
      checked += 1
    }
  }
}
