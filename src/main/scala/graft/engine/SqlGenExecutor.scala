package graft.engine

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Second execution engine: lowers the same star IR the DataFrame engine
  * compiles into ONE nested ANSI SQL string — the counterpart of the
  * reference's Presto executor (PrestoExecutor.scala:404-518, which
  * string-builds a nested per-star SQL query via
  * model/DataQueryFrame.scala:5-86 and ships it to Presto). The reference
  * offers its users a SQL-engine path beside the Spark path; this is that
  * capability re-expressed for the offline lake: the generated string is
  * plain ANSI (no dialect functions), so any SQL engine with the tables
  * registered can run it.
  *
  * The sg* gates exploit that portability: they execute the string via
  * `spark.sql` over temp views AND hand the IDENTICAL string to the
  * driver's DuckDB oracle — the lowering is validated by two independent
  * SQL engines agreeing on it.
  *
  * Query shape (mirrors DataQueryFrame's nesting):
  * {{{
  *   SELECT [DISTINCT] vars/aggs FROM (
  *     SELECT star cols AS bare vars FROM
  *       (per-star SELECT+rename+filter [UNION ALL ...]) g_star
  *       [LEFT] JOIN (...) g_other ON fk = id ...
  *     [WHERE cycle-edge conds]
  *   ) g_q [GROUP BY][HAVING][ORDER BY][LIMIT]
  * }}}
  *
  * SQL-expressible subset: parquet sources (single or unioned per star),
  * comparison/LIKE filters, VALUES, inner + OPTIONAL (left) join chains,
  * GROUP BY/aggregates/HAVING, ORDER BY, DISTINCT, LIMIT, and the FnO
  * attribute transforms. Not lowered (the Column engine remains the
  * full-coverage path, exactly as the reference keeps Spark beside
  * Presto): BIND, MINUS, UNION branches, OFFSET, inline join TRANSFORMs,
  * non-parquet stores, streaming.
  */
object SqlGenExecutor {

  /** Generated SQL + the (view name, parquet path) tables it reads. */
  final case class Lowered(sql: String, tables: Seq[(String, String)])

  /** Run the lowered SQL on Spark's own SQL engine over temp views. */
  def execute(spark: SparkSession, q: ParsedQuery,
      mappings: MappingsDoc, config: LakeConfig): DataFrame = {
    val l = lower(q, mappings, config)
    for ((name, path) <- l.tables)
      spark.read.parquet(path).createOrReplaceTempView(name)
    spark.sql(l.sql)
  }

  def lower(q: ParsedQuery, mappings: MappingsDoc, config: LakeConfig): Lowered = {
    require(q.unionBranches.isEmpty, "UNION branches are not SQL-lowered")
    require(q.minusStars.isEmpty, "MINUS is not SQL-lowered")
    // without this guard an EXISTS star would lower as a plain inner
    // join — duplicated solutions, silently wrong (refuse, don't mis-lower)
    require(q.existsStars.isEmpty, "FILTER EXISTS is not SQL-lowered")
    require(!q.ask, "ASK is not SQL-lowered")
    require(q.construct.isEmpty, "CONSTRUCT is not SQL-lowered")
    require(q.transforms.isEmpty, "inline join TRANSFORMs are not SQL-lowered")
    require(q.offset.isEmpty, "OFFSET is not SQL-lowered")

    val starNames = q.stars.keys.toSeq.sorted
    val needed = GraftEngine.neededVars(q)
    val tables = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def idc(s: String) = StarCompiler.idCol(s)
    def vc(s: String, v: String) = StarCompiler.varCol(s, v)

    def litSql(v: String): String =
      if (v.toLongOption.isDefined || v.toDoubleOption.isDefined) v
      else "'" + v.replace("'", "''") + "'"

    /** FnO transform chain → ANSI expression (same semantics as
      * [[Transforms]], including the reference-bug fixes). */
    def fnSql(expr: String, fns: Seq[TransformFn]): String =
      fns.filterNot(_.name == "skp").foldLeft(expr) { (e, fn) =>
        fn.name match {
          case "toInt" => s"TRY_CAST($e AS INTEGER)"
          case "scl" =>
            val a = fn.args.head.stripPrefix("_").trim
            a.head match {
              case '+' => s"($e + ${a.tail.trim})"
              case '-' => s"($e - ${a.tail.trim})"
              case '*' => s"($e * ${a.tail.trim})"
              case d if d.isDigit => s"($e + $a)"
              case other => sys.error(s"scl: unsupported operator '$other'")
            }
          case "substit" =>
            val Seq(from, to) = fn.args.take(2)
            s"CASE WHEN $e = ${litSql(from)} THEN ${litSql(to)} ELSE $e END"
          case "replc" =>
            val Seq(from, to) = fn.args.take(2)
            s"REPLACE($e, ${litSql(from)}, ${litSql(to)})"
          case "prefix" => s"(${litSql(fn.args.head)} || $e)"
          case "postfix" => s"($e || ${litSql(fn.args.head)})"
          case other => sys.error(s"transform '$other' is not SQL-lowered")
        }
      }

    def condSql(col: String, f: FilterCond): String = f.op match {
      case "=" => s"$col = ${litSql(f.value)}"
      case "!=" => s"$col <> ${litSql(f.value)}"
      case "<" | "<=" | ">" | ">=" => s"$col ${f.op} ${litSql(f.value)}"
      case "regex" => s"$col LIKE ${litSql(f.value)}"
      case "in" => s"$col IN (${f.values.map(litSql).mkString(", ")})"
      case "not in" => s"$col NOT IN (${f.values.map(litSql).mkString(", ")})"
      case other => sys.error(s"unsupported filter operator '$other'")
    }

    /** One star → aliased subquery: per-source SELECT+rename (+UNION ALL),
      * wrapped with this star's filters/VALUES on the renamed columns —
      * the SQL image of StarCompiler.compile. */
    def starSubquery(s: String): String = {
      val patterns = q.stars(s)
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
        s"no relevant source for star ?$s (predicates: ${preds.mkString(", ")})")

      val selects = relevant.map { m =>
        require(m.storeType == "parquet",
          s"store type '${m.storeType}' is not SQL-lowered (star ?$s)")
        val tbl = m.source.split('/').last.stripSuffix(".parquet")
        tables(tbl) = m.source
        def tx(attr: String, e: String) =
          m.attrTransforms.get(attr).map(fnSql(e, _)).getOrElse(e)
        val cols =
          s"${tx("", m.idAttr)} AS ${idc(s)}" +: predToVar.toSeq
            .filter { case (_, v) => needed.contains(v) }
            .sortBy(_._2)
            .map { case (p, v) =>
              val attr = m.predicateToAttr(p)
              s"${tx(attr, attr)} AS ${vc(s, v)}"
            }
        // skp(v) row filters on the transformed expression (the engine
        // filters the selected column)
        val skps = m.attrTransforms.toSeq.flatMap { case (attr, fns) =>
          Transforms.skipValues(fns).map { v =>
            val target = if (attr.isEmpty) tx("", m.idAttr)
              else predToVar.collectFirst {
                case (p, _) if m.predicateToAttr(p) == attr => tx(attr, attr)
              }.getOrElse(tx("", m.idAttr))
            s"$target <> ${litSql(v)}"
          }
        }
        val where = if (skps.isEmpty) "" else skps.mkString(" WHERE ", " AND ", "")
        s"SELECT ${cols.mkString(", ")} FROM $tbl$where"
      }
      val unioned = selects.mkString(" UNION ALL ")

      // this star's filters + VALUES, on the renamed columns (the SQL
      // image of applyStarFilters; both engines push these through the
      // wrapper into the scan)
      val objVars = predToVar.values.toSet
      def target(v: String): Option[String] =
        if (objVars.contains(v)) Some(vc(s, v))
        else if (v == s) Some(idc(s))
        else None
      val filterConds = q.filters.flatMap(f => target(f.varName).map(condSql(_, f)))
      val valueConds = q.values.flatMap { case (v, vals) =>
        target(v).map(c => s"$c IN (${vals.map(litSql).mkString(", ")})")
      }
      val conds = filterConds ++ valueConds
      if (conds.isEmpty) s"($unioned)"
      else s"(SELECT * FROM ($unioned) g_${s}_src WHERE ${conds.mkString(" AND ")})"
    }

    // ---- join chain (textual image of GraftEngine.joinChain) ----------
    val edges = (for {
      s <- starNames
      TriplePattern(_, p, ObjVar(o)) <- q.stars(s)
      if p != TriplePattern.RdfType && q.stars.contains(o) && o != s
    } yield GraftEngine.JoinEdge(s, o)).distinct

    def opt(s: String) = q.optionalStars.contains(s)
    val cycleConds = Seq.newBuilder[String]
    val fromSql = new StringBuilder
    if (starNames.size == 1) {
      fromSql ++= s"${starSubquery(starNames.head)} g_${starNames.head}"
    } else {
      require(edges.nonEmpty,
        s"${starNames.size} stars but no join conditions (cartesian query)")
      val seed = if (!opt(edges.head.fromStar)) edges.head.fromStar else edges.head.toStar
      var joined = Set(seed)
      fromSql ++= s"${starSubquery(seed)} g_$seed"
      var pending = edges.toList
      def attach(newStar: String, e: GraftEngine.JoinEdge): Unit = {
        val jt = if (opt(newStar)) "LEFT JOIN" else "JOIN"
        fromSql ++= s" $jt ${starSubquery(newStar)} g_$newStar ON ${e.leftCol} = ${e.rightCol}"
        joined += newStar
      }
      while (pending.nonEmpty) {
        val idx = pending.indexWhere(e =>
          joined.contains(e.fromStar) || joined.contains(e.toStar))
        require(idx >= 0, "disconnected join graph is not SQL-lowered")
        val e = pending(idx)
        pending = pending.patch(idx, Nil, 1)
        (joined.contains(e.fromStar), joined.contains(e.toStar)) match {
          case (true, true) => cycleConds += s"${e.leftCol} = ${e.rightCol}"
          case (true, false) => attach(e.toStar, e)
          case (false, true) => attach(e.fromStar, e)
          case (false, false) => ()
        }
      }
    }

    // ---- bare-variable resolution (image of GraftEngine.resolveVars) --
    val resolution = needed.toSeq.sorted.flatMap { v =>
      if (q.stars.contains(v)) Some(v -> idc(v))
      else q.varToStarPred.get(v).map { case (s, _) => v -> vc(s, v) }
    }
    require(resolution.nonEmpty, "query resolves no variables")
    val cycleWhere = {
      val cs = cycleConds.result()
      if (cs.isEmpty) "" else cs.mkString(" WHERE ", " AND ", "")
    }
    val innerSql =
      s"SELECT ${resolution.map { case (v, c) => s"$c AS $v" }.mkString(", ")}" +
        s" FROM ${fromSql.result()}$cycleWhere"

    // ---- BIND computed variables (image of GraftEngine.bindColumn's
    // arithmetic/concat core; SPARQL 1.1 builtins stay Column-engine
    // only). One wrapper per BIND so later binds can reference earlier
    // outputs; `/` is double division and CONCAT casts every operand to
    // string in BOTH target engines, matching the Column semantics. ----
    def bindSql(e: BindExpr): String = e match {
      case BVar(v) => v
      case BNum(n) => n
      case BStr(s) => "'" + s.replace("'", "''") + "'"
      case BOp(op @ ("+" | "-" | "*" | "/"), l, r) =>
        s"(${bindSql(l)} $op ${bindSql(r)})"
      case BOp(op, _, _) => sys.error(s"BIND operator '$op' is not SQL-lowered")
      case BFun("concat", args) if args.nonEmpty =>
        args.map(a => s"CAST(${bindSql(a)} AS STRING)").mkString("(", " || ", ")")
      case BFun("str", Seq(a)) => s"CAST(${bindSql(a)} AS STRING)"
      case BFun("abs", Seq(a)) => s"ABS(${bindSql(a)})"
      case BFun(f, _) => sys.error(s"BIND function '$f' is not SQL-lowered")
    }
    val bodySql = q.binds.zipWithIndex.foldLeft(innerSql) {
      case (prev, (b, i)) =>
        s"SELECT g_b$i.*, ${bindSql(b.expr)} AS ${b.outVar} FROM ($prev) g_b$i"
    }

    // ---- modifiers ----------------------------------------------------
    def aggExpr(a: AggSpec): String = {
      val in = if (a.varName == "*") "*" else a.varName
      val d = if (a.distinct) "DISTINCT " else ""
      a.fn.toUpperCase match {
        case f @ ("SUM" | "MIN" | "MAX" | "AVG" | "COUNT") => s"$f($d$in)"
        case other => sys.error(s"unsupported aggregate '$other'")
      }
    }
    require(!q.selectAll, "SELECT * is not SQL-lowered (name the variables)")
    val items = q.selectItems.map {
      case SelectVar(v) => v
      case SelectAgg(a) => s"${aggExpr(a)} AS ${a.alias}"
    }
    val distinct = if (q.distinct) "DISTINCT " else ""
    val groupBy =
      if (q.groupBy.nonEmpty) s" GROUP BY ${q.groupBy.mkString(", ")}"
      else if (q.aggregates.nonEmpty && q.selectItems.exists(_.isInstanceOf[SelectVar]))
        sys.error("aggregates beside bare vars require GROUP BY")
      else ""
    val having =
      if (q.having.isEmpty) ""
      else q.having.map { case (agg, op, value) =>
        condSql(aggExpr(agg), FilterCond("", op, value))
      }.mkString(" HAVING ", " AND ", "")
    val orderBy =
      if (q.orderBy.isEmpty) ""
      else s" ORDER BY ${q.orderBy.map(k =>
        s"${k.varName}${if (k.ascending) "" else " DESC"}").mkString(", ")}"
    val limit = q.limit.fold("")(n => s" LIMIT $n")

    val sql = s"SELECT $distinct${items.mkString(", ")} FROM ($bodySql) g_q" +
      groupBy + having + orderBy + limit
    Lowered(sql, tables.toSeq)
  }
}
