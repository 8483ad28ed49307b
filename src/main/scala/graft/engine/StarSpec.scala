package graft.engine

import graft.model._

/** Engine-neutral description of one star's lowering: which sources feed
  * it, which (source attribute → output column) projections each source
  * contributes (with FnO transform chains), which skp(v) row filters
  * apply, and which of the query's FILTER/VALUES constraints land on this
  * star's columns.
  *
  * Both engines consume THIS single description — the DataFrame compiler
  * ([[StarCompiler]]) renders it as `select`/`filter` Columns, the SQL
  * generator ([[SqlGenExecutor]]) as a nested subquery — so a transform
  * or filter-targeting rule is defined once, not twice (the skp-target
  * resolution had already drifted in shape between the two engines once).
  */
object StarSpec {

  /** One projected column: resolved source attribute, FnO transform
    * chain (may be empty), output column name in the star's
    * `{star}__{var}` contract. */
  final case class ColSpec(attr: String, fns: Seq[TransformFn], outCol: String)

  /** One source feeding the star. `skips` are skp(v) row filters:
    * (target column spec, skipped value) — the target is resolved with
    * the same rule in both engines (the transformed attribute's column;
    * the ID column when the transform is on the subject attribute). */
  final case class SourceSpec(mapping: EntityMapping, cols: Seq[ColSpec],
      skips: Seq[(ColSpec, String)])

  final case class Spec(star: String, sources: Seq[SourceSpec],
      /** (output column, condition) from the query's FILTERs that target
        * this star's bound vars or its subject. */
      filters: Seq[(String, FilterCond)],
      /** (output column, literal list) from VALUES clauses on this star. */
      values: Seq[(String, Seq[String])])

  /** Resolve the star's description against the mappings. `needed` prunes
    * object columns to the semantically required set
    * ([[GraftEngine.neededVars]]). */
  def build(q: ParsedQuery, star: String, mappings: MappingsDoc,
      needed: Set[String]): Spec = {
    val patterns = q.stars(star)
    val preds = patterns.collect {
      case TriplePattern(_, p, ObjVar(_)) if p != TriplePattern.RdfType => p
    }.distinct
    val classIri = patterns.collectFirst {
      case TriplePattern(_, TriplePattern.RdfType, ObjIri(c)) => c
    }
    val predToVar: Map[String, String] = patterns.collect {
      case TriplePattern(_, p, ObjVar(v)) if p != TriplePattern.RdfType => p -> v
    }.toMap

    val relevant = mappings.relevantFor(preds, classIri)
    require(relevant.nonEmpty,
      s"no relevant source for star ?$star (predicates: ${preds.mkString(", ")})")

    val sources = relevant.map { m =>
      val idSpec = ColSpec(m.idAttr, m.attrTransforms.getOrElse("", Nil),
        StarCompiler.idCol(star))
      val objSpecs = predToVar.toSeq
        .filter { case (_, v) => needed.contains(v) }
        .sortBy(_._2) // deterministic column order for unionByName
        .map { case (p, v) =>
          val attr = m.predicateToAttr(p)
          ColSpec(attr, m.attrTransforms.getOrElse(attr, Nil),
            StarCompiler.varCol(star, v))
        }
      // skp(v) row filter target: the transformed attribute's own column;
      // subject-attribute transforms (attr "") target the ID column, as
      // does a transform on an attribute no pattern binds
      val skips = m.attrTransforms.toSeq.flatMap { case (attr, fns) =>
        Transforms.skipValues(fns).map { v =>
          val target =
            if (attr.isEmpty) idSpec
            else predToVar.collectFirst {
              case (p, ov) if m.predicateToAttr(p) == attr =>
                ColSpec(attr, fns, StarCompiler.varCol(star, ov))
            }.getOrElse(idSpec)
          (target, v)
        }
      }
      SourceSpec(m, idSpec +: objSpecs, skips)
    }

    // FILTER/VALUES targeting: an object var of this star → its var
    // column; the star's own subject var → the ID column
    val objVars = predToVar.values.toSet
    def target(v: String): Option[String] =
      if (objVars.contains(v)) Some(StarCompiler.varCol(star, v))
      else if (v == star) Some(StarCompiler.idCol(star))
      else None
    val filters = q.filters.flatMap(f => target(f.varName).map(_ -> f))
    val values = q.values.flatMap { case (v, vals) => target(v).map(_ -> vals) }
    Spec(star, sources, filters, values)
  }
}
