package graft.mappings

import graft.model._

/** Parser for the Turtle subset the reference's mappings actually use
  * (/root/reference/evaluation/input_files/mappings.ttl:16-54): `@prefix`
  * declarations, then subject blocks `<#Name> pred obj ; ... .` where
  * objects are IRIs, qnames, literals, or `[ nested predicate-object list ]`.
  * FnO FunctionMaps (mappings_trans.ttl:133-151) are interpreted into
  * [[TransformFn]] chains via the same grel URI table as the reference
  * (Helpers.scala:163-176).
  *
  * Replaces the reference's Jena-model-plus-SPARQL lookups
  * (Mapper.scala:102-301) with a single in-memory pass — the reference
  * spends 13-31s per query on these lookups (SURVEY §6); this is O(doc).
  */
object RmlParser {

  private val RR = "http://www.w3.org/ns/r2rml#"
  private val RML = "http://semweb.mmlab.be/ns/rml#"
  private val NOSQL = "http://purl.org/db/nosql#"
  private val FNML = "http://semweb.mmlab.be/ns/fnml#"
  private val FNO = "http://w3id.org/function/ontology#"
  private val GREL = "http://users.ugent.be/~bjdmeest/function/grel.ttl#"

  /** grel function URI -> engine transform code (reference Helpers.scala:163-176). */
  private val grelToFn = Map(
    GREL + "scale" -> "scl",
    GREL + "substitute" -> "substit",
    GREL + "skip" -> "skp",
    GREL + "replace" -> "replc",
    GREL + "prefix" -> "prefix",
    GREL + "postfix" -> "postfix",
    GREL + "toInt" -> "toInt")

  // ------------------------------------------------------------ turtle AST

  sealed trait TValue
  final case class TIri(iri: String) extends TValue
  final case class TLit(s: String) extends TValue
  final case class TNode(entries: Seq[(String, TValue)]) extends TValue {
    def all(pred: String): Seq[TValue] = entries.collect { case (`pred`, v) => v }
    def one(pred: String): Option[TValue] = all(pred).headOption
    def lit(pred: String): Option[String] = one(pred).collect { case TLit(s) => s }
    def iri(pred: String): Option[String] = one(pred).collect { case TIri(s) => s }
    def node(pred: String): Option[TNode] = one(pred).collect { case n: TNode => n }
  }

  def parse(text: String): MappingsDoc = {
    val (prefixes, blocks) = parseTurtle(text)
    val entities = blocks.collect {
      case (name, node) if node.one(RML + "logicalSource").isDefined && node.one(FNML + "functionValue").isEmpty =>
        buildEntity(name, node, blocks.toMap)
    }
    MappingsDoc(prefixes, entities)
  }

  private def buildEntity(name: String, node: TNode, allBlocks: Map[String, TNode]): EntityMapping = {
    val ls = node.node(RML + "logicalSource")
      .getOrElse(sys.error(s"$name: rml:logicalSource must be a [ ... ] block"))
    val source = ls.lit(RML + "source").getOrElse(sys.error(s"$name: missing rml:source"))
    val storeIri = ls.iri(NOSQL + "store").getOrElse(NOSQL + "parquet")
    val storeType = storeIri.stripPrefix(NOSQL)

    val sm = node.node(RR + "subjectMap").getOrElse(sys.error(s"$name: missing rr:subjectMap"))
    val template = sm.lit(RR + "template").getOrElse(sys.error(s"$name: missing rr:template"))
    val classIri = sm.iri(RR + "class")

    var predToAttr = Map.empty[String, String]
    var attrTransforms = Map.empty[String, Seq[TransformFn]]

    node.all(RR + "predicateObjectMap").foreach {
      case pom: TNode =>
        val pred = pom.iri(RR + "predicate").getOrElse(sys.error(s"$name: pom without rr:predicate"))
        pom.one(RR + "objectMap") match {
          case Some(om: TNode) =>
            om.lit(RML + "reference") match {
              case Some(attr) => predToAttr += pred -> attr
              case None => sys.error(s"$name/$pred: objectMap needs rml:reference " +
                "(rr:parentTriplesMap is unsupported, as in the reference)")
            }
          case Some(TIri(fmRef)) => // FunctionMap indirection
            val fm = allBlocks.getOrElse(fmRef.dropWhile(_ == '#'),
              allBlocks.getOrElse(fmRef, sys.error(s"$name/$pred: unresolved FunctionMap <$fmRef>")))
            val (attr, fns) = interpretFunctionMap(fm)
            predToAttr += pred -> attr
            attrTransforms += attr -> fns
          case other => sys.error(s"$name/$pred: unsupported objectMap $other")
        }
      case other => sys.error(s"$name: predicateObjectMap must be a block, got $other")
    }

    // subject-side FunctionMap: rr:subjectMap [ ... rr:objectMap <#Fn> ]
    sm.one(RR + "objectMap").foreach {
      case TIri(fmRef) =>
        val fm = allBlocks.getOrElse(fmRef.dropWhile(_ == '#'),
          allBlocks.getOrElse(fmRef, sys.error(s"$name: unresolved subject FunctionMap <$fmRef>")))
        val (_, fns) = interpretFunctionMap(fm)
        attrTransforms += "" -> fns // "" = ID attribute
      case _ => ()
    }

    EntityMapping(name, source, storeType, template, classIri, predToAttr, attrTransforms)
  }

  /** FnO FunctionMap: fno:executes -> grel fn; first rr:reference param is
    * the attribute, remaining params are the function's arguments
    * (reference Mapper.scala:186-221 — "1st ref is the attribute, rest are
    * fnt params"). */
  private def interpretFunctionMap(fm: TNode): (String, Seq[TransformFn]) = {
    val fv = fm.node(FNML + "functionValue")
      .getOrElse(sys.error("FunctionMap without fnml:functionValue"))
    var fnUri = ""
    val refs = Seq.newBuilder[String]
    fv.all(RR + "predicateObjectMap").foreach {
      case pom: TNode =>
        val pred = pom.iri(RR + "predicate").getOrElse("")
        pom.one(RR + "objectMap").foreach {
          case om: TNode =>
            if (pred == FNO + "executes") fnUri = om.iri(RR + "constant").getOrElse("")
            else om.lit(RR + "reference").orElse(om.lit(RR + "constant")).foreach(refs += _)
          case _ => ()
        }
      case _ => ()
    }
    val fn = grelToFn.getOrElse(fnUri, sys.error(s"unknown FnO function <$fnUri>"))
    val allRefs = refs.result()
    require(allRefs.nonEmpty, s"FunctionMap for $fn has no attribute reference")
    (allRefs.head, Seq(TransformFn(fn, allRefs.tail)))
  }

  // ------------------------------------------------------- turtle parsing

  /** Returns (prefixes, ordered blocks of (localName, node)). */
  private def parseTurtle(text: String): (Map[String, String], Seq[(String, TNode)]) = {
    val toks = tokenize(text)
    var pos = 0
    def peek: String = if (pos < toks.length) toks(pos) else ""
    def next(): String = { val t = toks(pos); pos += 1; t }

    var prefixes = Map.empty[String, String]
    val blocks = Seq.newBuilder[(String, TNode)]

    def expand(t: String): String =
      if (t.startsWith("<") && t.endsWith(">")) t.substring(1, t.length - 1)
      else {
        val i = t.indexOf(':')
        require(i >= 0, s"expected IRI or qname, got $t")
        val pfx = t.substring(0, i)
        prefixes.get(pfx) match {
          case Some(ns) => ns + t.substring(i + 1)
          case None => sys.error(s"undeclared prefix '$pfx:' in $t")
        }
      }

    def parseValue(): TValue = {
      val t = peek
      if (t == "[") { next(); parseNode("]") }
      else {
        val tok = next()
        if (tok.startsWith("\"")) TLit(tok.substring(1, tok.length - 1))
        else TIri(expand(tok))
      }
    }

    def parseNode(closer: String): TNode = {
      val entries = Seq.newBuilder[(String, TValue)]
      var done = false
      while (!done) {
        if (peek == closer || peek.isEmpty) { if (peek == closer) next(); done = true }
        else if (peek == ";") next() // empty statement / separator
        else {
          val pred = expand(next())
          entries += pred -> parseValue()
          if (peek == ";") next()
        }
      }
      TNode(entries.result())
    }

    while (pos < toks.length) {
      peek match {
        case "@prefix" =>
          next()
          val pfx = next().stripSuffix(":")
          val iri = next()
          prefixes += pfx -> iri.substring(1, iri.length - 1)
          if (peek == ".") next()
        case "" => pos += 1
        case _ =>
          val subjTok = next()
          val subj =
            if (subjTok.startsWith("<") && subjTok.endsWith(">"))
              subjTok.substring(1, subjTok.length - 1).dropWhile(_ == '#')
            else subjTok
          // predicate-object list terminated by top-level '.'
          val entries = Seq.newBuilder[(String, TValue)]
          var done = false
          while (!done) {
            if (peek == "." ) { next(); done = true }
            else if (peek.isEmpty) done = true
            else if (peek == ";") next()
            else {
              val pred = expand(next())
              entries += pred -> parseValue()
              if (peek == ";") next()
            }
          }
          blocks += subj -> TNode(entries.result())
      }
    }
    (prefixes, blocks.result())
  }

  /** Tokens: `@prefix`, `<...>` IRIs, `"..."` literals (kept with quotes),
    * `[ ] ; .` punctuation, qnames. `#` comments stripped to EOL (but not
    * inside IRIs/strings). */
  private def tokenize(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val s = text
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < s.length && s.charAt(i) != '\n') i += 1 }
      else if (c == '<') {
        val j = s.indexOf('>', i); require(j > 0, "unterminated IRI")
        out += s.substring(i, j + 1); i = j + 1
      } else if (c == '"') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != '"') j += 1
        out += s.substring(i, j + 1); i = j + 1
      } else if (c == '[' || c == ']' || c == ';' || c == '.') {
        out += c.toString; i += 1
      } else {
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace &&
          "[];".indexOf(s.charAt(j)) < 0) j += 1
        var w = s.substring(i, j)
        // a trailing '.' ends the statement unless part of a path-ish token
        while (w.endsWith(".") && !w.endsWith("..")) { w = w.dropRight(1); j -= 1 }
        if (w.nonEmpty) { out += w; i = j } else { out += "."; i = j + 1 }
      }
    }
    out.result()
  }
}
