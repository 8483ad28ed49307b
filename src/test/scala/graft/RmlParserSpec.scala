package graft

import graft.mappings.RmlParser
import graft.model.TransformFn
import org.scalatest.funsuite.AnyFunSuite

class RmlParserSpec extends AnyFunSuite {

  private val ttl =
    """@prefix exp: <http://example.com/ns/>
      |@prefix rr: <http://www.w3.org/ns/r2rml#>
      |@prefix rml: <http://semweb.mmlab.be/ns/rml#>
      |@prefix nosql: <http://purl.org/db/nosql#>
      |@prefix bsbm: <http://bsbm.org/v/> # trailing comment
      |@prefix fnml: <http://semweb.mmlab.be/ns/fnml#>
      |@prefix fno: <http://w3id.org/function/ontology#>
      |@prefix grel: <http://users.ugent.be/~bjdmeest/function/grel.ttl#>
      |
      |<#ProducerMapping>
      |	rml:logicalSource [
      |		rml:source "//Producer";
      |		nosql:store nosql:jdbc
      |	];
      |	rr:subjectMap [
      |		rr:template "http://example.com/{nr}";
      |		rr:class bsbm:Producer
      |	];
      |	rr:predicateObjectMap [
      |		rr:predicate exp:country;
      |		rr:objectMap [rml:reference "country"]
      |	];
      |	rr:predicateObjectMap [
      |		rr:predicate exp:label;
      |		rr:objectMap [rml:reference "label"]
      |	].
      |
      |<#FunctionMap>
      | fnml:functionValue [
      |   rml:logicalSource "/data/review.parquet" ;
      |   rr:predicateObjectMap [
      |     rr:predicate fno:executes ;
      |     rr:objectMap [rr:constant grel:toInt] ] ;
      |   rr:predicateObjectMap [
      |     rr:predicate grel:valueParam1 ;
      |     rr:objectMap [rr:reference "person"]
      |   ] ;
      | ] .
      |
      |<#ReviewMapping>
      |	rml:logicalSource [
      |		rml:source "/data/review.parquet";
      |		nosql:store nosql:parquet
      |	];
      |	rr:subjectMap [ rr:template "http://example.com/{nr}" ];
      |	rr:predicateObjectMap [
      |		rr:predicate exp:person;
      |		rr:objectMap <#FunctionMap>
      |	].
      |""".stripMargin

  test("entity mappings: source, store, template id, class, predicate attrs") {
    val doc = RmlParser.parse(ttl)
    assert(doc.entities.map(_.name) == Seq("ProducerMapping", "ReviewMapping"))
    val p = doc.entities.head
    assert(p.source == "//Producer")
    assert(p.storeType == "jdbc")
    assert(p.idAttr == "nr")
    assert(p.classIri.contains("http://bsbm.org/v/Producer"))
    assert(p.predicateToAttr == Map(
      "http://example.com/ns/country" -> "country",
      "http://example.com/ns/label" -> "label"))
  }

  test("FnO FunctionMap resolves to attribute + transform chain") {
    val doc = RmlParser.parse(ttl)
    val r = doc.entities(1)
    assert(r.predicateToAttr("http://example.com/ns/person") == "person")
    assert(r.attrTransforms("person") == Seq(TransformFn("toInt", Nil)))
  }

  test("relevant-source selection requires all predicates (+ class if given)") {
    val doc = RmlParser.parse(ttl)
    assert(doc.relevantFor(Seq("http://example.com/ns/country"), None).map(_.name) ==
      Seq("ProducerMapping"))
    assert(doc.relevantFor(
      Seq("http://example.com/ns/country", "http://example.com/ns/person"), None).isEmpty)
    assert(doc.relevantFor(Seq("http://example.com/ns/label"),
      Some("http://bsbm.org/v/Producer")).map(_.name) == Seq("ProducerMapping"))
    assert(doc.relevantFor(Seq("http://example.com/ns/label"),
      Some("http://bsbm.org/v/Other")).isEmpty)
  }
}
