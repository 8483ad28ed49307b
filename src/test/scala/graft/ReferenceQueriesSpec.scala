package graft

import graft.sparql.SparqlParser
import org.scalatest.funsuite.AnyFunSuite

/** Parses the reference's nine BSBM evaluation queries verbatim
  * (/root/reference/evaluation/input_files/queries/Q{1-8,10}.sparql) —
  * direct front-end parity with the reference's supported fragment. */
class ReferenceQueriesSpec extends AnyFunSuite {

  private val dir = new java.io.File("/root/reference/evaluation/input_files/queries")

  // (expected star count, expected filter count) per query, from reading
  // the query texts
  private val expected = Map(
    "Q1" -> (3, 1), "Q2" -> (2, 0), "Q3" -> (2, 2), "Q4" -> (4, 1),
    "Q5" -> (3, 3), "Q6" -> (3, 1), "Q7" -> (4, 2), "Q8" -> (4, 1),
    "Q10" -> (3, 3))

  for ((name, (stars, filters)) <- expected.toSeq.sortBy(_._1)) {
    test(s"reference $name parses with $stars stars, $filters filters") {
      val f = new java.io.File(dir, s"$name.sparql")
      assume(f.exists(), s"reference query $name not present")
      val src = scala.io.Source.fromFile(f)
      val text = try src.mkString finally src.close()
      val q = SparqlParser.parse(text)
      assert(q.stars.size == stars, s"$name stars: ${q.stars.keySet}")
      assert(q.filters.size == filters, s"$name filters: ${q.filters}")
      assert(q.selectVarNames.nonEmpty || q.selectAll)
    }
  }
}
