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
  * SQL-expressible subset: parquet and csv sources (single or unioned
  * per star, reader options from the lake config),
  * comparison/LIKE/IN filters, VALUES, inner + OPTIONAL (left) join
  * chains, MINUS and FILTER (NOT) EXISTS (correlated [NOT] EXISTS
  * subqueries), UNION branches (positional NULL-padded UNION ALL),
  * SPARQL 1.1 §12 subqueries (recursively lowered derived tables joined
  * USING the shared projected vars), negated property sets (UNION ALL
  * over the non-excluded mapped predicates), BIND arithmetic and the
  * SPARQL 1.1 builtin family (CONCAT/STR/ABS/STRLEN/UCASE/LCASE/
  * CONTAINS/STRSTARTS/STRENDS/SUBSTR/REPLACE/CEIL/FLOOR/ROUND/COALESCE/
  * IF), GROUP BY/aggregates/HAVING, ORDER BY, DISTINCT, LIMIT/OFFSET,
  * ASK (non-correlated EXISTS probe), CONSTRUCT (CTE-shared body, UNION
  * of template instantiations), DESCRIBE (predicate expansion semi-
  * joined with the bound-id set), SELECT * (where column order provably
  * coincides), `p+`/`p*` closures (SQL:2016 recursive CTEs — Spark 4's
  * WITH RECURSIVE and DuckDB evaluate the identical string; DAG inputs,
  * see [[closureWrap]]), the FnO attribute transforms, and inline join
  * TRANSFORMs (FK/ID column rewrites with skp filters on the
  * transformed value). Not lowered (the Column engine remains the
  * full-coverage path, exactly as the reference keeps Spark beside
  * Presto): jdbc/rdf/connector stores, streaming.
  */
object SqlGenExecutor {

  /** A base table the generated SQL reads: view name, source path, store
    * type (parquet or csv) and the lake config's reader options. */
  final case class TableRef(name: String, path: String, storeType: String,
      options: Map[String, String])

  /** Generated SQL + the tables it reads. */
  final case class Lowered(sql: String, tables: Seq[TableRef])

  /** Words that cannot appear as a bare table identifier in the lowered
    * SQL's two target engines (Spark SQL ANSI mode + DuckDB). The ANSI
    * SQL:2016 reserved list intersected pragmatically — anything here
    * gets the t_ prefix. A miss is not silent: the generated statement
    * fails to parse at execute/oracle time, it never reads wrong data. */
  private[graft] val SqlReservedWords: Set[String] = Set(
    "all", "and", "any", "as", "asc", "between", "by", "case", "cast",
    "check", "collate", "column", "constraint", "create", "cross",
    "current", "default", "delete", "desc", "describe", "distinct",
    "drop", "else", "end", "except", "exists", "false", "fetch", "filter",
    "for", "foreign", "from", "full", "group", "grouping", "having", "in",
    "inner", "insert", "intersect", "interval", "into", "is", "join",
    "lateral", "left", "like", "limit", "natural", "not", "null", "offset",
    "on", "or", "order", "outer", "over", "partition", "primary",
    "qualify", "references", "right", "rows", "select", "semi", "set",
    "some", "table", "then", "to", "true", "union", "unique", "update",
    "user", "using", "values", "when", "where", "window", "with")

  /** Run the lowered SQL on Spark's own SQL engine over temp views
    * (loaded through the same [[SourceRegistry]] the Column engine
    * uses, so reader options cannot drift between engines). */
  def execute(spark: SparkSession, q: ParsedQuery,
      mappings: MappingsDoc, config: LakeConfig): DataFrame = {
    val l = lower(q, mappings, config)
    for (t <- l.tables)
      SourceRegistry.load(spark,
        SourceConfig(t.name, t.storeType, t.path, t.options))
        .createOrReplaceTempView(t.name)
    spark.sql(l.sql)
  }

  /** Finite plain numeric literals only: "Infinity"/"NaN"/"+5"/"1e3" all
    * parse via toDoubleOption but are not portable unquoted SQL tokens —
    * anything outside this pattern is emitted as a quoted string. */
  private val NumericLit = "^-?\\d+(\\.\\d+)?$".r

  def lower(q: ParsedQuery, mappings: MappingsDoc, config: LakeConfig): Lowered = {
    // ASK → a non-correlated EXISTS probe over the body (both target
    // engines short-circuit it): rewrite as SELECT of the first pattern's
    // subject var, LIMIT 1, and wrap — one boolean column `ask`, the
    // same shape the Column engine returns (GraftEngine line ~128)
    if (q.ask) {
      val probeVar = q.patterns.headOption.map(_.subject).getOrElse(
        sys.error("ASK without patterns is not SQL-lowered"))
      val inner = lower(q.copy(ask = false, selectAll = false,
        selectItems = Seq(SelectVar(probeVar)), limit = Some(1)),
        mappings, config)
      return Lowered(
        s"SELECT EXISTS (SELECT 1 FROM (${inner.sql}) g_ask) AS ask",
        inner.tables)
    }
    val tables = scala.collection.mutable.LinkedHashMap.empty[String, TableRef]

    /** Register a mapping's source as a named base view. parquet, csv
      * and json lower (DuckDB reads all three; reader options ride along
      * so Spark's view matches the Column engine's scan); other stores
      * refuse. */
    def registerTable(mp: EntityMapping, ctx: String): String = {
      require(Set("parquet", "csv", "json").contains(mp.storeType),
        s"store type '${mp.storeType}' is not SQL-lowered ($ctx)")
      // strip any known extension and sanitize to a valid SQL identifier
      // (a csv/json basename would otherwise emit `FROM nation.csv`);
      // reserved words get the same t_ prefix as leading digits — a
      // source named order.parquet must not emit `FROM order`, which
      // both DuckDB and ANSI-mode Spark SQL reject unquoted (quoting
      // styles differ across the two target engines, so prefixing is
      // the portable spelling)
      val base = Seq(".parquet", ".csv", ".json")
        .foldLeft(mp.source.split('/').last)(_.stripSuffix(_))
      val cleaned = base.replaceAll("[^A-Za-z0-9_]", "_")
      val tbl =
        if (cleaned.headOption.exists(_.isDigit) ||
          SqlReservedWords(cleaned.toLowerCase)) s"t_$cleaned"
        else cleaned
      // two sources sharing a basename would silently collide in the view
      // map (last path wins → SQL reads the wrong data) — fail loud
      require(!tables.contains(tbl) || tables(tbl).path == mp.source,
        s"view name '$tbl' collides: ${tables(tbl).path} vs ${mp.source} ($ctx)")
      tables(tbl) = TableRef(tbl, mp.source, mp.storeType,
        config.optionsFor(mp.source))
      tbl
    }

    def idc(s: String) = StarCompiler.idCol(s)
    def vc(s: String, v: String) = StarCompiler.varCol(s, v)

    def litSql(v: String): String =
      if (NumericLit.matches(v)) v
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

    // ---- CONSTRUCT: instantiate each template triple over the solution
    // body (recursively lowered with its modifiers intact, shared via a
    // CTE so neither engine rescans per branch); UNION deduplicates —
    // a graph is a triple SET. Mirrors GraftEngine's construct branch.
    if (q.construct.nonEmpty) {
      val vars = (q.construct.map(_.subject) ++
        q.construct.collect { case TriplePattern(_, _, ObjVar(v)) => v }).distinct
      val inner = lower(q.copy(construct = Nil, selectAll = false,
        selectItems = vars.map(SelectVar(_))), mappings, config)
      inner.tables.foreach(t => tables(t.name) = t)
      val branches = q.construct.map { t =>
        val o = t.obj match {
          case ObjVar(v) => s"CAST($v AS STRING)"
          case ObjIri(iri) => litSql(iri)
          case ObjLit(l) => litSql(l)
        }
        s"SELECT CAST(${t.subject} AS STRING) AS s, " +
          s"${litSql(t.predicate)} AS p, $o AS o FROM g_cons"
      }
      // dedup must be UNCONDITIONAL: with a single template there is no
      // UNION to dedup through, yet a graph is a triple SET and the
      // Column engine always applies .distinct() — wrap the branches in
      // an explicit SELECT DISTINCT so one- and n-template CONSTRUCTs
      // agree across engines
      return Lowered(
        s"WITH g_cons AS (${inner.sql}) SELECT DISTINCT * FROM " +
          s"(${branches.mkString(" UNION ALL ")}) g_consu",
        tables.values.toSeq)
    }

    // ---- DESCRIBE ?v: every mapped predicate (plus rdf:type) of the
    // star's relevant sources, semi-joined (IN subquery) with the
    // described-id set the body binds — the SQL image of GraftEngine's
    // describe branch.
    for (v <- q.describe) {
      require(q.stars.contains(v),
        s"DESCRIBE ?$v requires ?$v to be a star subject in the WHERE body")
      val inner = lower(q.copy(describe = None, selectAll = false,
        selectItems = Seq(SelectVar(v))), mappings, config)
      inner.tables.foreach(t => tables(t.name) = t)
      val patterns = q.stars(v)
      val preds = patterns.collect {
        case TriplePattern(_, p, ObjVar(_)) if p != TriplePattern.RdfType => p
      }.distinct
      val classIri = patterns.collectFirst {
        case TriplePattern(_, TriplePattern.RdfType, ObjIri(c)) => c
      }
      val relevant = mappings.relevantFor(preds, classIri)
      require(relevant.nonEmpty, s"no relevant source for DESCRIBE ?$v")
      val branches = relevant.flatMap { mp =>
        val tbl = registerTable(mp, s"DESCRIBE ?$v")
        val idExpr = fnSql(mp.idAttr, mp.attrTransforms.getOrElse("", Nil))
        val typeBranch = mp.classIri.map(c =>
          s"SELECT $idExpr AS sid, ${litSql(TriplePattern.RdfType)} AS p, " +
            s"${litSql(c)} AS o FROM $tbl")
        val predBranches = mp.predicateToAttr.toSeq.sortBy(_._1).map {
          case (p0, attr) =>
            val e = fnSql(attr, mp.attrTransforms.getOrElse(attr, Nil))
            s"SELECT $idExpr AS sid, ${litSql(p0)} AS p, " +
              s"CAST($e AS STRING) AS o FROM $tbl"
        }
        typeBranch.toSeq ++ predBranches
      }
      return Lowered(
        s"WITH g_ids AS (SELECT DISTINCT $v AS sid FROM (${inner.sql}) g_d) " +
          s"SELECT DISTINCT CAST(sid AS STRING) AS s, p, o FROM " +
          s"(${branches.mkString(" UNION ALL ")}) g_db " +
          s"WHERE sid IN (SELECT sid FROM g_ids)",
        tables.values.toSeq)
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

    /** One WHERE body (stars → join chain → bare-var resolution) → its
      * resolution SELECT plus the resolved (var, column) list. Called once
      * for a plain query, once per branch for UNION bodies. */
    def resolvedSql(qb0: ParsedQuery): (String, Seq[(String, String)]) = {
    // FILTER/VALUES on a closure's object var constrain the REACHABLE
    // endpoint, not the one-hop edge: strip them from the per-star
    // pushdown and re-apply inside the closure wrapper (the SQL image of
    // GraftEngine.compileBody's qStar deferral)
    val closureVars = qb0.closures.map(_.objVar).toSet
    val deferredFilters = qb0.filters.filter(f => closureVars(f.varName))
    val deferredValues = qb0.values.filter(v => closureVars(v._1))
    val qb = if (closureVars.isEmpty) qb0 else qb0.copy(
      filters = qb0.filters.filterNot(f => closureVars(f.varName)),
      values = qb0.values.filterNot(v => closureVars(v._1)))
    val starNames = qb.stars.keys.toSeq.sorted
    val dropStars = qb.minusStars ++ qb.existsStars
    val keptNames = starNames.filterNot(dropStars.contains)
    val needed = GraftEngine.neededVars(qb)

    /** One star → aliased subquery: per-source SELECT+rename (+UNION ALL),
      * wrapped with this star's filters/VALUES on the renamed columns —
      * the SQL rendering of the SAME [[StarSpec]] description
      * StarCompiler renders as Columns. */
    def starSubquery(s: String): String = {
      val spec = StarSpec.build(qb, s, mappings, needed)
      def tx(cs: StarSpec.ColSpec): String = fnSql(cs.attr, cs.fns)
      val selects = spec.sources.map { src =>
        val m = src.mapping
        val tbl = registerTable(m, s"star ?$s")
        val cols = src.cols.map(cs => s"${tx(cs)} AS ${cs.outCol}")
        // skp(v) row filters on the transformed expression (the engine
        // filters the selected column — same value)
        val skps = src.skips.map { case (t, v) => s"${tx(t)} <> ${litSql(v)}" }
        val where = if (skps.isEmpty) "" else skps.mkString(" WHERE ", " AND ", "")
        s"SELECT ${cols.mkString(", ")} FROM $tbl$where"
      }
      val unioned = selects.mkString(" UNION ALL ")
      // this star's filters + VALUES, on the renamed columns (both
      // engines push these through the wrapper into the scan)
      val conds = spec.filters.map { case (c, f) => condSql(c, f) } ++
        spec.values.map { case (c, vals) =>
          s"$c IN (${vals.map(litSql).mkString(", ")})"
        }
      if (conds.isEmpty) s"($unioned)"
      else s"(SELECT * FROM ($unioned) g_${s}_src WHERE ${conds.mkString(" AND ")})"
    }

    /** Negated property set `?s !(p…) ?v` → UNION ALL over the values of
      * every non-excluded mapped predicate of the star's relevant
      * sources, string-cast (the SQL image of the Column engine's
      * expansion, GraftEngine.compileBody withNegations). */
    def negationSubquery(ng: NegatedPath): String = {
      require(qb.stars.contains(ng.subjVar),
        s"negated path subject ?${ng.subjVar} needs at least one other pattern " +
          "(typically `a <Class>`) to select its sources")
      val pats = qb.stars(ng.subjVar)
      val preds = pats.collect {
        case TriplePattern(_, p, ObjVar(_)) if p != TriplePattern.RdfType => p
      }.distinct
      val classIri = pats.collectFirst {
        case TriplePattern(_, TriplePattern.RdfType, ObjIri(c)) => c
      }
      val sCol = idc(ng.subjVar)
      val oCol = vc(ng.subjVar, ng.objVar)
      val branches = mappings.relevantFor(preds, classIri).flatMap { mp =>
        val tbl = registerTable(mp, s"negated set on ?${ng.subjVar}")
        val idExpr = fnSql(mp.idAttr, mp.attrTransforms.getOrElse("", Nil))
        mp.predicateToAttr.toSeq.sortBy(_._1)
          .filterNot { case (p, _) => ng.excluded.contains(p) }
          .map { case (_, attr) =>
            val e = fnSql(attr, mp.attrTransforms.getOrElse(attr, Nil))
            s"SELECT $idExpr AS $sCol, CAST($e AS STRING) AS $oCol FROM $tbl"
          }
      }
      require(branches.nonEmpty,
        s"negated property set on ?${ng.subjVar} excludes every mapped predicate")
      branches.mkString(" UNION ALL ")
    }

    /** `p+`/`p*` star: replace the one-hop binding column with the
      * transitive closure, computed as a SQL:2016 recursive CTE over the
      * UNCONSTRAINED edge scan of the path predicate (SPARQL 1.1 §9.1
      * constrains a path's endpoints, never its hops — the star's own
      * filters stay inside `base` and restrict only the start set).
      * Spark 4 and DuckDB both evaluate the identical string. Spark
      * allows only UNION ALL in the recursive step, so cycle termination
      * relies on the graph being a DAG (duplicate PAIRS from diamonds
      * are removed by the DISTINCT over the CTE before the join); on a
      * cyclic graph Spark fail-louds at its recursion level limit. The
      * Column engine ([[graft.ops.Closure]]: anti-join frontier, cycle-
      * safe, seeded-BFS optimized) remains the robust path — this is the
      * portable SQL rendering of the same semantics. */
    def closureWrap(base: String, s: String, cl: PathClosure, i: Int,
        priorCols: Seq[String]): String = {
      val sCol = idc(s)
      val oCol = vc(s, cl.objVar)
      val baseCols = priorCols.filterNot(_ == oCol)
      val pats = qb.stars(s)
      val preds = pats.collect {
        case TriplePattern(_, p, ObjVar(_)) if p != TriplePattern.RdfType => p
      }.distinct
      val classIri = pats.collectFirst {
        case TriplePattern(_, TriplePattern.RdfType, ObjIri(c)) => c
      }
      def predBranches(p: String,
          candidates: Seq[graft.model.EntityMapping]): Seq[String] = {
        val bs = candidates.filter(_.predicateToAttr.contains(p)).map { mp =>
          val tbl = registerTable(mp, s"path closure on ?$s")
          val idExpr = fnSql(mp.idAttr, mp.attrTransforms.getOrElse("", Nil))
          val attr = mp.predicateToAttr(p)
          val aExpr = fnSql(attr, mp.attrTransforms.getOrElse(attr, Nil))
          s"SELECT $idExpr AS src, $aExpr AS dst FROM $tbl"
        }
        require(bs.nonEmpty, s"no relevant source maps the path predicate <$p>")
        bs
      }
      val edgeBranches = predBranches(cl.predicate,
        mappings.relevantFor(preds, classIri))
      val tag = s"${s}_$i"
      // composite group (p1/p2/…): the edge CTE is the hop join chain —
      // h0 ⋈ h1 ⋈ … on dst = src, each hop drawn from every source
      // mapping its predicate (same derivation as the Column engine)
      val edgeSelect =
        if (cl.morePredicates.isEmpty)
          s"SELECT src, dst FROM (${edgeBranches.mkString(" UNION ALL ")}) g_eb_$tag"
        else {
          val hops = edgeBranches +: cl.morePredicates.map(p =>
            predBranches(p, mappings.relevantFor(Seq(p), None)))
          val froms = hops.zipWithIndex.map { case (bs, j) =>
            s"(${bs.mkString(" UNION ALL ")}) h${j}_$tag"
          }
          val joins = (1 until hops.size).map(j =>
            s" JOIN ${froms(j)} ON h${j - 1}_$tag.dst = h${j}_$tag.src").mkString
          s"SELECT h0_$tag.src AS src, h${hops.size - 1}_$tag.dst AS dst " +
            s"FROM ${froms.head}$joins"
        }
      val qualBase = baseCols.map(c => s"g_cb_$tag.$c").mkString(", ")
      // `*`: zero hops — (x, x) for every subject of the star
      val zeroHop =
        if (cl.reflexive) s" UNION SELECT $sCol AS src, $sCol AS dst FROM g_cb_$tag"
        else ""
      val conds = deferredFilters.filter(_.varName == cl.objVar)
        .map(f => condSql("p.dst", f)) ++
        deferredValues.filter(_._1 == cl.objVar).map { case (_, vals) =>
          s"p.dst IN (${vals.map(litSql).mkString(", ")})"
        }
      val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
      // `p?` (ZeroOrOne) needs no recursion: pairs = one-hop edges (+ the
      // zero-hop branch). `p+`/`p*` walk the recursive CTE.
      val clCte =
        if (!cl.transitive) ""
        else s", g_cl_$tag AS (SELECT src, dst FROM g_ed_$tag UNION ALL " +
          s"SELECT c.src, e.dst FROM g_cl_$tag c JOIN g_ed_$tag e ON c.dst = e.src)"
      val pairSrc = if (cl.transitive) s"g_cl_$tag" else s"g_ed_$tag"
      s"(WITH RECURSIVE g_cb_$tag AS " +
        s"(SELECT DISTINCT ${baseCols.mkString(", ")} FROM $base g_cbs_$tag), " +
        s"g_ed_$tag AS (SELECT src, dst FROM ($edgeSelect) g_ee_$tag " +
        "WHERE src IS NOT NULL AND dst IS NOT NULL)" +
        clCte +
        s" SELECT $qualBase, p.dst AS $oCol FROM g_cb_$tag " +
        s"JOIN (SELECT DISTINCT src, dst FROM $pairSrc$zeroHop) p " +
        s"ON g_cb_$tag.$sCol = p.src$where)"
    }

    /** Star subquery with any negated-set expansions joined on the star's
      * id column (USING coalesces the key — same inner equi-join as the
      * engine's `.join(expansion, Seq(sCol))`) and any `p+`/`p*` closures
      * wrapped as recursive CTEs. */
    def starSql(s: String): String = {
      var cols = StarSpec.build(qb, s, mappings, needed)
        .sources.head.cols.map(_.outCol)
      var sql = starSubquery(s)
      // inline TRANSFORM(?l?r.side.fns): rewrite this star's FK column
      // (side 'l') or ID column (side 'r') through the FnO chain, skp
      // values filtered on the TRANSFORMED value in an outer wrapper
      // (SQL cannot reference a select alias in its own WHERE) — the
      // image of StarCompiler.applyInlineTransforms
      for ((t, i) <- qb.transforms.zipWithIndex
          if (t.side == 'l' && t.leftVar == s) || (t.side == 'r' && t.rightVar == s)) {
        val target = if (t.side == 'l') vc(s, t.rightVar) else idc(s)
        require(cols.contains(target),
          s"inline TRANSFORM target $target is not projected by star ?$s")
        val sel = cols.map(c =>
          if (c == target) s"${fnSql(c, t.fns)} AS $c" else c).mkString(", ")
        sql = s"(SELECT $sel FROM $sql g_tx_$s$i)"
        val skips = Transforms.skipValues(t.fns)
        if (skips.nonEmpty)
          sql = s"(SELECT * FROM $sql g_txs_$s$i WHERE " +
            skips.map(v => s"$target <> ${litSql(v)}").mkString(" AND ") + ")"
      }
      for ((ng, i) <- qb.negations.filter(_.subjVar == s).zipWithIndex) {
        sql = s"(SELECT * FROM $sql g_nb_$s$i JOIN (${negationSubquery(ng)}) " +
          s"g_nx_$s$i USING (${idc(s)}))"
        cols = cols :+ vc(s, ng.objVar)
      }
      for ((cl, i) <- qb.closures.filter(_.subjVar == s).zipWithIndex) {
        sql = closureWrap(sql, s, cl, i, cols)
        cols = cols.filterNot(_ == vc(s, cl.objVar)) :+ vc(s, cl.objVar)
      }
      sql
    }

    // ---- join chain (textual image of GraftEngine.joinChain) ----------
    val edges = (for {
      s <- starNames
      TriplePattern(_, p, ObjVar(o)) <- qb.stars(s)
      if p != TriplePattern.RdfType && qb.stars.contains(o) && o != s
    } yield GraftEngine.JoinEdge(s, o)).distinct

    // MINUS / FILTER (NOT) EXISTS stars leave the join chain and become
    // correlated [NOT] EXISTS subqueries — the SQL image of the engine's
    // anti/semi attachment. Same leaf requirement as joinChain: exactly
    // one edge to the rest of the query, and that edge's other endpoint
    // must be a kept star.
    val (dropEdges, keptEdges) = edges.partition(e =>
      dropStars.contains(e.fromStar) || dropStars.contains(e.toStar))
    for (m <- dropStars) {
      val touching = dropEdges.filter(e => e.fromStar == m || e.toStar == m)
      require(touching.size == 1,
        s"MINUS/EXISTS star ?$m must connect to the rest of the query by exactly one join")
      require(touching.forall(e =>
        !(dropStars.contains(e.fromStar) && dropStars.contains(e.toStar))),
        s"MINUS/EXISTS star ?$m may not join another MINUS/EXISTS star")
    }
    val existsConds = dropEdges.map { e =>
      val m = if (dropStars.contains(e.fromStar)) e.fromStar else e.toStar
      // correlate on the join edge: the subquery side qualified by its
      // alias; the outer side's column name is unique (star-prefixed), so
      // it resolves against the enclosing FROM
      val corr =
        if (m == e.toStar) s"g_x_$m.${e.rightCol} = ${e.leftCol}"
        else s"g_x_$m.${e.leftCol} = ${e.rightCol}"
      val kw = if (qb.minusStars.contains(m)) "NOT EXISTS" else "EXISTS"
      s"$kw (SELECT 1 FROM ${starSql(m)} g_x_$m WHERE $corr)"
    }

    def opt(s: String) = qb.optionalStars.contains(s)
    val cycleConds = Seq.newBuilder[String]
    val fromSql = new StringBuilder
    if (keptNames.size == 1) {
      fromSql ++= s"${starSql(keptNames.head)} g_${keptNames.head}"
    } else {
      require(keptEdges.nonEmpty,
        s"${keptNames.size} stars but no join conditions (cartesian query)")
      val seed = if (!opt(keptEdges.head.fromStar)) keptEdges.head.fromStar
        else keptEdges.head.toStar
      var joined = Set(seed)
      fromSql ++= s"${starSql(seed)} g_$seed"
      var pending = keptEdges.toList
      def attach(newStar: String, e: GraftEngine.JoinEdge): Unit = {
        val jt = if (opt(newStar)) "LEFT JOIN" else "JOIN"
        fromSql ++= s" $jt ${starSql(newStar)} g_$newStar ON ${e.leftCol} = ${e.rightCol}"
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

    // ---- bare-variable resolution — the SAME shared rule the DataFrame
    // engine uses (GraftEngine.resolveKept), so anti/semi-joined-away
    // bindings and kept-star fallbacks cannot drift between engines.
    // Negated-path vars (bound by the expansion, not a pattern) resolve
    // to their star's expansion column, first binding wins — mirrors
    // GraftEngine.compileBody's negRes.
    val negRes = qb.negations.filter(n => needed(n.objVar))
      .map(n => n.objVar -> vc(n.subjVar, n.objVar))
    val resolution = (GraftEngine.resolveKept(qb, needed) ++ negRes)
      .foldLeft(Vector.empty[(String, String)]) { (acc, vcol) =>
        if (acc.exists(_._1 == vcol._1)) acc else acc :+ vcol
      }
    require(resolution.nonEmpty, "query resolves no variables")
    val innerConds = cycleConds.result() ++ existsConds
    val innerWhere =
      if (innerConds.isEmpty) "" else innerConds.mkString(" WHERE ", " AND ", "")
    val innerSql =
      s"SELECT ${resolution.map { case (v, c) => s"$c AS $v" }.mkString(", ")}" +
        s" FROM ${fromSql.result()}$innerWhere"
    (innerSql, resolution)
    }

    // ---- body: one resolved block, or the positional NULL-padded
    // UNION ALL of the branch bodies (the SQL image of the engine's
    // unionByName(allowMissingColumns = true); SQL UNION is positional,
    // so every branch projects the union of all branches' variables in
    // one fixed sorted order, NULL where a branch leaves a var unbound)
    val (bodyBase, bodyBaseVars): (String, Seq[String]) =
      if (q.patterns.isEmpty && q.unionBranches.isEmpty && q.subqueries.nonEmpty)
        (null, Nil) // subquery-only body: the first subquery IS the body
      else if (q.unionBranches.isEmpty) {
        val (sql, res) = resolvedSql(q)
        (sql, res.map(_._1))
      } else {
        val parts = q.unionBranches.map { case (ps, fs) =>
          resolvedSql(q.copy(patterns = ps, filters = fs,
            unionBranches = Nil, optionalStars = Set.empty))
        }
        val allVars = parts.flatMap(_._2.map(_._1)).distinct.sorted
        (parts.map { case (sql, res) =>
          val have = res.map(_._1).toSet
          val sel = allVars.map(v => if (have(v)) v else s"NULL AS $v")
          s"SELECT ${sel.mkString(", ")} FROM ($sql) g_ub"
        }.mkString(" UNION ALL "), allVars)
      }

    // ---- SPARQL 1.1 §12 subqueries (image of GraftEngine's subquery
    // natural join, executed BEFORE binds exactly like the engine): each
    // subquery lowers recursively — its own modifiers ride inside the
    // derived table — and joins the outer body USING the shared projected
    // vars (both target engines coalesce USING keys), CROSS JOIN when
    // none are shared (rare, legal)
    val (bodyInner, bodyVars) = q.subqueries.zipWithIndex
      .foldLeft((bodyBase, bodyBaseVars)) { case ((prev, vars), (sub, i)) =>
        val subL = lower(sub.copy(transforms = Nil), mappings, config)
        subL.tables.foreach(t => tables(t.name) = t)
        val subVars = sub.selectItems.map {
          case SelectVar(v) => v
          case SelectAgg(a) => a.alias
        }
        if (prev == null) (s"SELECT * FROM (${subL.sql}) g_sub$i", subVars)
        else {
          val shared = vars.intersect(subVars)
          val joinSql =
            if (shared.nonEmpty)
              s"JOIN (${subL.sql}) g_sub$i USING (${shared.mkString(", ")})"
            else s"CROSS JOIN (${subL.sql}) g_sub$i"
          (s"SELECT * FROM ($prev) g_sq$i $joinSql", (vars ++ subVars).distinct)
        }
      }

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
      // SPARQL 1.1 builtins (17.4.2/17.4.3), each in a form BOTH target
      // engines give identical semantics: INSTR>0 for CONTAINS,
      // LEFT/RIGHT prefix/suffix equality for STRSTARTS/STRENDS (LIKE
      // would need pattern escaping), CASE for IF. SUBSTR/STRLEN are
      // 1-based character ops in SPARQL and in both SQL dialects.
      case BFun("strlen", Seq(a)) => s"LENGTH(${bindSql(a)})"
      case BFun("ucase", Seq(a)) => s"UPPER(${bindSql(a)})"
      case BFun("lcase", Seq(a)) => s"LOWER(${bindSql(a)})"
      case BFun("contains", Seq(a, b)) =>
        s"(INSTR(${bindSql(a)}, ${bindSql(b)}) > 0)"
      case BFun("strstarts", Seq(a, b)) =>
        s"(LEFT(${bindSql(a)}, LENGTH(${bindSql(b)})) = ${bindSql(b)})"
      case BFun("strends", Seq(a, b)) =>
        s"(RIGHT(${bindSql(a)}, LENGTH(${bindSql(b)})) = ${bindSql(b)})"
      case BFun("substr", Seq(a, p)) =>
        s"SUBSTRING(${bindSql(a)}, ${bindSql(p)})"
      case BFun("substr", Seq(a, p, l)) =>
        s"SUBSTRING(${bindSql(a)}, ${bindSql(p)}, ${bindSql(l)})"
      case BFun("replace", Seq(a, f0, t)) =>
        s"REPLACE(${bindSql(a)}, ${bindSql(f0)}, ${bindSql(t)})"
      case BFun("ceil", Seq(a)) => s"CEIL(${bindSql(a)})"
      case BFun("floor", Seq(a)) => s"FLOOR(${bindSql(a)})"
      case BFun("round", Seq(a)) => s"ROUND(${bindSql(a)})"
      case BFun("coalesce", args) if args.nonEmpty =>
        args.map(bindSql).mkString("COALESCE(", ", ", ")")
      case BFun("if", Seq(c0, t, f0)) =>
        s"CASE WHEN ${bindSql(c0)} THEN ${bindSql(t)} ELSE ${bindSql(f0)} END"
      case BFun(f, _) => sys.error(s"BIND function '$f' is not SQL-lowered")
    }
    val bodyBound = q.binds.zipWithIndex.foldLeft(bodyInner) {
      case (prev, (b, i)) =>
        s"SELECT g_b$i.*, ${bindSql(b.expr)} AS ${b.outVar} FROM ($prev) g_b$i"
    }

    // ---- residual FILTERs: conditions on vars no star binds (subquery
    // outputs, BIND outputs) were invisible to the per-star pushdown —
    // the SQL image of GraftEngine's residual-filter pass, applied after
    // binds so bind outputs are filterable
    val starTargeted: Set[String] = {
      val pats = if (q.unionBranches.nonEmpty) q.unionBranches.flatMap(_._1)
        else q.patterns
      pats.collect { case TriplePattern(_, _, ObjVar(v)) => v }.toSet ++
        pats.map(_.subject)
    }
    val residual = q.filters.filterNot(f => starTargeted(f.varName))
    val bodySql =
      if (residual.isEmpty) bodyBound
      else s"SELECT * FROM ($bodyBound) g_rf WHERE " +
        residual.map(f => condSql(f.varName, f)).mkString(" AND ")

    // ---- modifiers ----------------------------------------------------
    def aggExpr(a: AggSpec): String = {
      val in = if (a.varName == "*") "*" else a.varName
      val d = if (a.distinct) "DISTINCT " else ""
      a.fn.toUpperCase match {
        case f @ ("SUM" | "MIN" | "MAX" | "AVG" | "COUNT") => s"$f($d$in)"
        case other => sys.error(s"unsupported aggregate '$other'")
      }
    }
    // SELECT *: project the body's variables in the Column engine's
    // order (sorted resolution, then BIND outputs) so both engines emit
    // identical column sequences; refused where the engines' column
    // orders would diverge (subquery USING joins put keys first in SQL,
    // union branches sort vars here but keep first-branch order there)
    val items =
      if (q.selectAll) {
        require(q.subqueries.isEmpty && q.unionBranches.isEmpty &&
          q.aggregates.isEmpty,
          "SELECT * with subqueries/UNION/aggregates is not SQL-lowered " +
            "(column order diverges) — name the variables")
        bodyVars ++ q.binds.map(_.outVar)
      } else q.selectItems.map {
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
    // LIMIT before OFFSET is the order both Spark SQL and DuckDB accept;
    // semantically OFFSET skips first, LIMIT then caps — identical to the
    // engine's df.offset(n).limit(k)
    val offset = q.offset.fold("")(n => s" OFFSET $n")

    val sql = s"SELECT $distinct${items.mkString(", ")} FROM ($bodySql) g_q" +
      groupBy + having + orderBy + limit + offset
    Lowered(sql, tables.values.toSeq)
  }
}
