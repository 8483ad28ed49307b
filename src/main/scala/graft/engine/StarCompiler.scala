package graft.engine

import graft.model._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compiles one star-shaped BGP into a DataFrame.
  *
  * Column contract (internal): subject/ID column `{star}__id`, one column
  * `{star}__{objVar}` per needed predicate. This replaces the reference's
  * `{star}_{predicate}_{prefix}` string-built SQL projection
  * (Helpers.scala:97-112 + SparkExecutor.scala:108-111) with direct
  * `df.select(col as alias)` — no temp views, no SQL strings, and Catalyst
  * sees a fully declarative plan (scan → project → filter) so column
  * pruning and predicate pushdown reach the parquet reader.
  */
object StarCompiler {

  def idCol(star: String): String = s"${star}__id"
  def varCol(star: String, v: String): String = s"${star}__$v"

  /** Build the DataFrame for `star`.
    *
    * @param needed   object vars worth materializing (semantic column
    *                 pruning, reference Planner.scala:24-60)
    * @param filters  the query's filters; those on this star's vars are
    *                 applied here, before any join (reference
    *                 SparkExecutor.scala:146-185)
    */
  def compile(
      spark: SparkSession,
      query: ParsedQuery,
      star: String,
      mappings: MappingsDoc,
      config: LakeConfig,
      needed: Set[String],
      filters: Seq[FilterCond]): DataFrame = {

    val patterns = query.stars(star)
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

    // one DF per relevant source, then union (reference
    // SparkExecutor.scala:113-117 — but by name, not position; SURVEY §7.4.4)
    val perSource = relevant.map(m => compileOne(spark, m, star, predToVar, needed, config))
    val unioned = perSource.reduce(_.unionByName(_))

    applyStarFilters(unioned, star, query, filters, predToVar)
  }

  private def compileOne(
      spark: SparkSession,
      m: EntityMapping,
      star: String,
      predToVar: Map[String, String],
      needed: Set[String],
      config: LakeConfig): DataFrame = {

    val sourceCfg = config.sources.find(_.source == m.source)
      .getOrElse(SourceConfig(m.name, m.storeType, m.source, Map.empty))
    val raw = SourceRegistry.load(spark, sourceCfg.copy(storeType = m.storeType))

    def withFnTransforms(attr: String, c: Column): Column =
      m.attrTransforms.get(attr) match {
        case Some(fns) => Transforms(c, fns)
        case None => c
      }

    val idColumn = withFnTransforms("", col(m.idAttr)).as(idCol(star))
    val objColumns = predToVar.toSeq
      .filter { case (_, v) => needed.contains(v) }
      .sortBy(_._2) // deterministic column order for unionByName
      .map { case (p, v) =>
        val attr = m.predicateToAttr(p)
        withFnTransforms(attr, col(attr)).as(varCol(star, v))
      }

    var df = raw.select(idColumn +: objColumns: _*)

    // FnO skp(v) = row filter on the transformed column's source attr
    for ((attr, fns) <- m.attrTransforms; v <- Transforms.skipValues(fns)) {
      val target = if (attr.isEmpty) idCol(star)
        else predToVar.collectFirst { case (p, ov) if m.predicateToAttr(p) == attr => varCol(star, ov) }
          .getOrElse(idCol(star))
      df = df.filter(col(target) =!= lit(v))
    }
    df
  }

  /** Apply inline TRANSFORM(...) join-side rewrites belonging to this star:
    * side 'l' rewrites this star's FK column toward rightVar; side 'r'
    * rewrites this star's ID column (reference Run.scala:159-180 +
    * SparkExecutor.scala:127-141). */
  def applyInlineTransforms(df: DataFrame, star: String, query: ParsedQuery): DataFrame =
    query.transforms.foldLeft(df) { (d, t) =>
      if (t.side == 'l' && t.leftVar == star) {
        val c = varCol(star, t.rightVar)
        val skips = Transforms.skipValues(t.fns)
        val d2 = d.withColumn(c, Transforms(col(c), t.fns))
        skips.foldLeft(d2)((dd, v) => dd.filter(col(c) =!= lit(v)))
      } else if (t.side == 'r' && t.rightVar == star) {
        val c = idCol(star)
        val skips = Transforms.skipValues(t.fns)
        val d2 = d.withColumn(c, Transforms(col(c), t.fns))
        skips.foldLeft(d2)((dd, v) => dd.filter(col(c) =!= lit(v)))
      } else d
    }

  private def applyStarFilters(
      df: DataFrame,
      star: String,
      query: ParsedQuery,
      filters: Seq[FilterCond],
      predToVar: Map[String, String]): DataFrame = {

    val objVars = predToVar.values.toSet
    def target(v: String): Option[String] =
      if (objVars.contains(v)) Some(varCol(star, v))
      else if (v == star) Some(idCol(star))
      else None
    val filtered = filters.foldLeft(df) { (d, f) =>
      target(f.varName).fold(d)(c => d.filter(predicate(col(c), f)))
    }
    // VALUES ?v { ... } → isin filter on this star's binding (pushed to
    // the scan like any other per-star predicate). Literals are typed
    // per-column from the BOUND COLUMN's schema, not from the literal
    // list: a mixed numeric/string value list against a long column keeps
    // its numeric members and drops the unparseable ones (which could
    // never match a numeric binding) instead of comparing post-cast
    // strings all-or-nothing.
    query.values.foldLeft(filtered) { case (d, (v, vals)) =>
      target(v).fold(d) { c =>
        import org.apache.spark.sql.types._
        val typed: Seq[Any] = d.schema(c).dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            vals.flatMap(_.toLongOption)
          case FloatType | DoubleType | _: DecimalType =>
            vals.flatMap(_.toDoubleOption)
          case _ => vals
        }
        if (typed.isEmpty) d.filter(lit(false))
        else d.filter(col(c).isin(typed: _*))
      }
    }
  }

  /** Literal typing: numeric if it parses, else string. The reference passes
    * raw SQL strings (SparkExecutor.scala:160-175); typed lits let Catalyst
    * push comparisons into the scan. */
  private[engine] def predicate(c: Column, f: FilterCond): Column = {
    def typed(s: String): Any =
      s.toLongOption.getOrElse(s.toDoubleOption.getOrElse(s))
    val v: Any = typed(f.value)
    f.op match {
      case "=" => c === lit(v)
      case "!=" => c =!= lit(v)
      case "<" => c < lit(v)
      case "<=" => c <= lit(v)
      case ">" => c > lit(v)
      case ">=" => c >= lit(v)
      // SQL LIKE wildcards, matching the reference (SparkExecutor.scala:180-182)
      case "regex" => c.like(f.value)
      // IN-lists type each member like a single literal; Catalyst folds
      // the isin into an In predicate that pushes to the scan
      case "in" => c.isin(f.values.map(typed): _*)
      case "not in" => !c.isin(f.values.map(typed): _*)
      case other => sys.error(s"unsupported filter operator '$other'")
    }
  }
}
