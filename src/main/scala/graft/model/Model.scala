package graft.model

/** Core model for the graft engine.
  *
  * The query model mirrors the SPARQL fragment supported by the reference
  * (see /root/reference/evaluation/input_files/README.md:15-29): star-shaped
  * BGPs, comparison/regex FILTERs, GROUP BY + {sum,min,max,avg,count},
  * ORDER BY, DISTINCT, LIMIT, plus the TRANSFORM pseudo-clause
  * (reference Run.scala:33-37).
  */

/** One triple pattern `?s <pred> obj`. Predicate is the fully-expanded IRI,
  * or the sentinel [[TriplePattern.RdfType]] for `rdf:type` / `a`. */
final case class TriplePattern(subject: String, predicate: String, obj: ObjectTerm)

object TriplePattern {
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
}

sealed trait ObjectTerm
final case class ObjVar(name: String) extends ObjectTerm
final case class ObjIri(iri: String) extends ObjectTerm
final case class ObjLit(lexical: String) extends ObjectTerm

/** FILTER condition. `op` is one of = != < <= > >= regex. Value keeps its
  * lexical form; typing is decided at compile time against the column. */
final case class FilterCond(varName: String, op: String, value: String,
    values: Seq[String] = Nil)

final case class OrderKey(varName: String, ascending: Boolean)

/** Aggregate in the SELECT list: fn in {sum,min,max,avg,count};
  * alias is the output column name (user-supplied via AS, or `fn(var)`
  * to match the reference's default naming, Run.scala:273).
  * `distinct` supports COUNT(DISTINCT ?v) / SUM(DISTINCT ?v) — absent
  * from the reference (SURVEY §2.4). */
final case class AggSpec(fn: String, varName: String, alias: String,
    distinct: Boolean = false,
    /** GROUP_CONCAT separator (`; SEPARATOR="..."`), default single
      * space per SPARQL 1.1. */
    separator: String = " ")

sealed trait SelectItem
final case class SelectVar(name: String) extends SelectItem
final case class SelectAgg(agg: AggSpec) extends SelectItem

/** BIND(expr AS ?out) expression AST (net-new vs the reference):
  * variables, numeric/string literals, binary arithmetic with standard
  * precedence and parentheses, and function calls (CONCAT/STR/ABS). */
sealed trait BindExpr {
  /** Variables referenced anywhere in the expression (for pruning). */
  def vars: Set[String] = this match {
    case BVar(v) => Set(v)
    case BOp(_, l, r) => l.vars ++ r.vars
    case BFun(_, args) => args.flatMap(_.vars).toSet
    case _ => Set.empty
  }
}
final case class BVar(name: String) extends BindExpr
final case class BNum(value: String) extends BindExpr
final case class BStr(value: String) extends BindExpr
final case class BOp(op: String, left: BindExpr, right: BindExpr) extends BindExpr
final case class BFun(name: String, args: Seq[BindExpr]) extends BindExpr

final case class BindSpec(outVar: String, expr: BindExpr)

/** Length modifier of a property path (SPARQL 1.1 §9.1): `+` one or
  * more, `*` zero or more, `?` zero or one. */
sealed trait PathMod
object PathMod {
  case object OneOrMore extends PathMod
  case object ZeroOrMore extends PathMod
  case object ZeroOrOne extends PathMod
}

/** One `?s p+ ?o` / `?s p* ?o` / `?s p? ?o` variable-length path. The
  * engine replaces the star's one-hop (subject, object) binding with the
  * pairs the modifier denotes: `transitive` closes the relation
  * (`+`/`*`) vs keeps the single hop (`?`); `reflexive` adds the
  * zero-hop (x, x) pair for every subject of the star (`*`/`?`).
  *
  * `morePredicates` non-empty means a parenthesized SEQUENCE group
  * `?s (p1/p2/…)+ ?o`: the closed relation's single "edge" is the
  * composite hop p1∘p2∘… (one join chain), and the modifier applies to
  * that composite — `(mgr/mgr)+` walks even-length management chains. */
final case class PathClosure(subjVar: String, predicate: String,
    objVar: String, mod: PathMod, morePredicates: Seq[String] = Nil) {
  def reflexive: Boolean = mod != PathMod.OneOrMore
  def transitive: Boolean = mod != PathMod.ZeroOrOne
  /** All hop predicates of the (possibly composite) edge, in order. */
  def predicates: Seq[String] = predicate +: morePredicates
}

/** One `?s !p ?o` / `?s !(p1|p2) ?o` negated property set (SPARQL 1.1
  * §9.1): ?o ranges over the values of every MAPPED predicate of the
  * star's sources except the excluded ones (rdf:type is carried by the
  * mapping's class, not expanded). Values are string-cast — the
  * expansion mixes columns of different source types. */
final case class NegatedPath(subjVar: String, excluded: Seq[String],
    objVar: String)

/** One step of a join-side transformation (reference §2.8):
  * toInt | scl(_+n|_-n|_*n) | skp(v) | substit(a,b) | replc(a,b)
  * | prefix(s) | postfix(s). Args are kept raw. */
final case class TransformFn(name: String, args: Seq[String])

/** Transformation attached to one side of a join pair
  * (`TRANSFORM(?l?r.side.fn1.fn2)`): side 'l' transforms the joining
  * (FK) column of star `leftVar`; side 'r' transforms the ID column of
  * star `rightVar`. Reference QueryAnalyser.scala:166-185. */
final case class JoinTransform(leftVar: String, rightVar: String, side: Char, fns: Seq[TransformFn])

final case class ParsedQuery(
    prefixes: Map[String, String],
    distinct: Boolean,
    selectItems: Seq[SelectItem],
    selectAll: Boolean,
    patterns: Seq[TriplePattern],
    filters: Seq[FilterCond],
    groupBy: Seq[String],
    orderBy: Seq[OrderKey],
    limit: Option[Int],
    offset: Option[Int] = None,
    transforms: Seq[JoinTransform] = Nil,
    /** Stars whose patterns all come from OPTIONAL { } groups — they join
      * with left-outer semantics (net-new vs the reference, which has no
      * OPTIONAL: QueryAnalyser.scala:163 TODO). Their patterns/filters are
      * merged into `patterns`/`filters`. */
    optionalStars: Set[String] = Set.empty,
    /** `{ A } UNION { B }` branches (patterns, filters). When non-empty,
      * `patterns` is empty and the result is the bag-union of the branches
      * (net-new vs the reference: BSBM Q11 dropped as unsupported). */
    unionBranches: Seq[(Seq[TriplePattern], Seq[FilterCond])] = Nil,
    /** HAVING conditions: (aggregate, op, literal) applied after GROUP BY
      * (net-new vs the reference). The aggregate must also appear in the
      * SELECT list (matched by fn+var). */
    having: Seq[(AggSpec, String, String)] = Nil,
    /** Stars bound only inside MINUS { } groups — attached with
      * left-anti semantics (solutions matching the group are removed).
      * Must be leaves of the join graph. Net-new vs the reference. */
    minusStars: Set[String] = Set.empty,
    /** VALUES ?v { lit... } inline data, single-variable form — compiled
      * to an isin filter pushed below the joins. Net-new vs reference. */
    values: Seq[(String, Seq[String])] = Nil,
    /** BIND(expr AS ?v) computed variables: operand op operand where an
      * operand is a var or numeric literal, op ∈ + - * /; or a plain
      * rename BIND(?x AS ?y). Net-new vs the reference. */
    binds: Seq[BindSpec] = Nil,
    /** ASK query form: the result is one boolean row (`ask`) — true iff
      * the WHERE body has at least one solution. Net-new vs reference. */
    ask: Boolean = false,
    /** Stars bound only inside FILTER EXISTS { } groups — attached with
      * left-semi semantics (solutions kept iff the group matches; no
      * columns contributed). FILTER NOT EXISTS groups reuse the MINUS
      * (left-anti) machinery: on this star fragment — where the group
      * must share a join variable with the outer query — the two
      * constructs coincide. Net-new vs the reference. */
    existsStars: Set[String] = Set.empty,
    /** CONSTRUCT template triples: the result is the deduplicated triple
      * set (s, p, o — all strings) produced by instantiating the
      * template per solution. Net-new vs the reference. */
    construct: Seq[TriplePattern] = Nil,
    /** Arbitrary-length property paths (`?s p+ ?o` / `?s p* ?o`,
      * SPARQL 1.1 §9.1): the one-hop triple stays in `patterns` (so star
      * detection and join planning see it), and the engine replaces the
      * star's (subject, object) pairs with their transitive closure —
      * reflexive for `*`. Net-new vs the reference. */
    closures: Seq[PathClosure] = Nil,
    /** DESCRIBE ?v query form: the result is the deduplicated (s, p, o)
      * triple set describing every resource the WHERE body binds to ?v —
      * all mapped predicates (plus rdf:type) of the star's relevant
      * sources. ?v must be a star subject. Net-new vs the reference. */
    describe: Option[String] = None,
    /** SPARQL 1.1 §12 subqueries: `{ SELECT ... WHERE { ... } ... }`
      * groups inside the WHERE body. Each is evaluated independently and
      * natural-joined with the outer solutions on the variables they
      * share (cross join when none). Net-new vs the reference. */
    subqueries: Seq[ParsedQuery] = Nil,
    /** Negated property sets (`!p` / `!(p1|p2)`); not part of `patterns`
      * — the subject star needs at least one other pattern (typically
      * `a g:Class`) so source selection has something to work with. */
    negations: Seq[NegatedPath] = Nil) {

  /** Star-shaped decomposition: subject var -> its triple patterns,
    * in query order (reference QueryAnalyser.getStars, but structural). */
  lazy val stars: Map[String, Seq[TriplePattern]] =
    patterns.groupBy(_.subject)

  /** object var -> (star subject var, predicate IRI). The fragment
    * guarantees at most one (star,pred) per object var in practice;
    * first wins (reference Run.scala:73 TODO notes the same invariant). */
  lazy val varToStarPred: Map[String, (String, String)] =
    patterns.collect { case TriplePattern(s, p, ObjVar(o)) => o -> (s, p) }
      .reverse.toMap

  def selectVarNames: Seq[String] =
    selectItems.collect { case SelectVar(v) => v }

  def aggregates: Seq[AggSpec] =
    selectItems.collect { case SelectAgg(a) => a }
}

/** One RML triples-map: which source holds an entity and how each
  * predicate maps to a source attribute (reference mappings.ttl:16-54). */
final case class EntityMapping(
    name: String,
    source: String,
    storeType: String,
    subjectTemplate: String,
    classIri: Option[String],
    predicateToAttr: Map[String, String],
    /** attribute -> FnO transform chain (reference Mapper.scala:183-301);
      * key "" means the subject/ID attribute. */
    attrTransforms: Map[String, Seq[TransformFn]]) {

  /** ID attribute = the name inside the rr:template braces
    * (reference Helpers.scala:146-149). */
  val idAttr: String = {
    val i = subjectTemplate.indexOf('{')
    val j = subjectTemplate.indexOf('}')
    if (i >= 0 && j > i) subjectTemplate.substring(i + 1, j)
    else sys.error(s"subject template without {id}: $subjectTemplate")
  }
}

final case class SourceConfig(
    entity: String,
    storeType: String,
    source: String,
    options: Map[String, String])

final case class LakeConfig(sources: Seq[SourceConfig], weights: Map[String, Int]) {
  def optionsFor(source: String): Map[String, String] =
    sources.find(_.source == source).map(_.options).getOrElse(Map.empty)
}

/** A mappings document: prefix table + entity mappings. */
final case class MappingsDoc(prefixes: Map[String, String], entities: Seq[EntityMapping]) {

  /** Relevant sources for a star: every non-type predicate of the star must
    * be mapped, and an rdf:type constraint must match rr:class
    * (reference Mapper.scala:102-129 — all-predicates-must-match). */
  def relevantFor(preds: Seq[String], classIri: Option[String]): Seq[EntityMapping] =
    entities.filter { m =>
      preds.forall(m.predicateToAttr.contains) &&
        classIri.forall(c => m.classIri.contains(c))
    }
}
