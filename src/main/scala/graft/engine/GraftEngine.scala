package graft.engine

import graft.mappings.{ConfigParser, RmlParser}
import graft.model._
import graft.sparql.SparqlParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine: SPARQL fragment + RML mappings + lake config → DataFrame.
  *
  * Pipeline (reference Run.scala:17-318, re-expressed declaratively):
  * parse → star decomposition → join planning → per-star compile (scan,
  * semantic column pruning, filters below joins) → inner equi-join chain →
  * GROUP BY/aggregates → ORDER BY → projection (+DISTINCT) → LIMIT.
  *
  * Everything stays a lazy logical plan; Catalyst applies predicate
  * pushdown / column pruning / join selection, and AQE (enabled by callers)
  * re-plans broadcast and skew at runtime. No temp views, no SQL strings,
  * no driver-side data movement.
  */
object GraftEngine {

  final case class JoinEdge(fromStar: String, toStar: String) {
    def leftCol: String = StarCompiler.varCol(fromStar, toStar)
    def rightCol: String = StarCompiler.idCol(toStar)
  }

  def execute(spark: SparkSession, queryText: String, mappingsText: String,
      configText: String, reorderJoins: Boolean = false): DataFrame =
    executeParsed(spark, SparqlParser.parse(queryText),
      RmlParser.parse(mappingsText), ConfigParser.parse(configText), reorderJoins)

  def executeParsed(spark: SparkSession, q: ParsedQuery,
      mappings: MappingsDoc, config: LakeConfig,
      reorderJoins: Boolean = false): DataFrame = {

    // { A } UNION { B }: compile each branch body independently, bag-union
    // by name (a var unbound in one branch surfaces as null there)
    var df =
      if (q.unionBranches.nonEmpty)
        q.unionBranches.map { case (ps, fs) =>
          compileBody(spark,
            q.copy(patterns = ps, filters = fs, unionBranches = Nil, optionalStars = Set.empty),
            mappings, config, reorderJoins)
        }.reduce(_.unionByName(_, allowMissingColumns = true))
      else if (q.patterns.isEmpty && q.subqueries.nonEmpty) null
      else compileBody(spark, q, mappings, config, reorderJoins)

    // --- SPARQL 1.1 §12 subqueries: each evaluates independently (its
    // own modifiers included) and natural-joins the outer solutions on
    // the variables they share — cross join when none (rare, legal)
    for (sub <- q.subqueries) {
      val subDF = executeParsed(spark,
        sub.copy(transforms = Nil), mappings, config, reorderJoins)
      df =
        if (df == null) subDF
        else {
          val shared = df.columns.intersect(subDF.columns).toSeq
          if (shared.nonEmpty) df.join(subDF, shared) else df.crossJoin(subDF)
        }
    }

    // --- BIND computed variables (before modifiers so bound vars are
    // usable in SELECT / aggregates / ORDER BY)
    // sequential withColumn: later BINDs may reference earlier outputs
    for (b <- q.binds) df = df.withColumn(b.outVar, bindColumn(b.expr))

    // --- residual FILTERs: conditions on vars no star binds (BIND
    // outputs, subquery outputs) were invisible to the per-star compile —
    // apply them here, where those columns exist. An unknown var now
    // fails analysis instead of silently dropping the condition.
    val starTargeted: Set[String] = {
      val pats = if (q.unionBranches.nonEmpty) q.unionBranches.flatMap(_._1) else q.patterns
      pats.collect { case TriplePattern(_, _, ObjVar(v)) => v }.toSet ++ pats.map(_.subject)
    }
    for (f <- q.filters if !starTargeted(f.varName))
      df = df.filter(StarCompiler.predicate(col(f.varName), f))

    // --- modifiers (reference Run.scala:266-306 order:
    // groupBy → orderBy → project(+distinct) → limit)
    if (q.aggregates.nonEmpty || q.groupBy.nonEmpty) {
      val aggCols = q.aggregates.map(aggColumn)
      require(aggCols.nonEmpty, "GROUP BY without aggregates is not supported")
      df =
        if (q.groupBy.nonEmpty)
          df.groupBy(q.groupBy.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
        else df.agg(aggCols.head, aggCols.tail: _*)
      // HAVING: post-aggregation filter on a SELECTed aggregate (net-new)
      for ((agg, op, value) <- q.having) {
        val alias = q.aggregates.find(a => a.fn == agg.fn && a.varName == agg.varName)
          .map(_.alias).getOrElse(sys.error(
            s"HAVING ${agg.fn}(?${agg.varName}) must also appear in SELECT"))
        df = df.filter(StarCompiler.predicate(col(alias), FilterCond(alias, op, value)))
      }
    }

    if (q.orderBy.nonEmpty) {
      // single multi-key sort — deliberate fix of the reference's
      // last-key-wins loop (Run.scala:294-299; SURVEY §7.4.2)
      df = df.orderBy(q.orderBy.map(k =>
        if (k.ascending) col(k.varName).asc else col(k.varName).desc): _*)
    }

    val projected =
      if (q.selectAll) df
      else df.select(q.selectItems.map {
        case SelectVar(v) => col(v)
        case SelectAgg(a) => col(a.alias)
      }: _*)

    val distincted = if (!q.distinct) projected else {
      val d = projected.distinct()
      // Spark's distinct is an aggregate and does not preserve the
      // preceding sort — re-sort after dedup so OFFSET/LIMIT slice
      // deterministically (SPARQL algebra: Slice ∘ Distinct ∘ Project ∘
      // OrderBy). Requires the keys to survive projection.
      if (q.orderBy.nonEmpty && (q.limit.isDefined || q.offset.isDefined)) {
        val projCols = projected.columns.toSet
        require(q.orderBy.forall(k => projCols(k.varName)),
          "ORDER BY keys must be selected when combined with DISTINCT and LIMIT/OFFSET")
        d.orderBy(q.orderBy.map(k =>
          if (k.ascending) col(k.varName).asc else col(k.varName).desc): _*)
      } else d
    }
    // OFFSET before LIMIT (SPARQL slice semantics; net-new vs reference)
    val skipped = q.offset.fold(distincted)(distincted.offset)
    val sliced = q.limit.fold(skipped)(skipped.limit)
    if (q.ask) {
      // ASK: one boolean row — isEmpty is a limit-1 job, not a full scan
      import spark.implicits._
      Seq(!sliced.isEmpty).toDF("ask")
    } else if (q.construct.nonEmpty) {
      // CONSTRUCT: instantiate each template triple per solution and
      // union (a graph is a triple SET → distinct). Everything stays one
      // declarative plan — Catalyst shares the solution subplan across
      // the template branches.
      q.construct.map { t =>
        val oCol = t.obj match {
          case ObjVar(v) => col(v).cast("string")
          case ObjIri(iri) => lit(iri)
          case ObjLit(l) => lit(l)
        }
        sliced.select(col(t.subject).cast("string").as("s"),
          lit(t.predicate).as("p"), oCol.as("o"))
      }.reduce(_.union(_)).distinct()
    } else if (q.describe.isDefined) {
      // DESCRIBE ?v: expand every mapped predicate (plus rdf:type) of the
      // star's relevant sources for the resources the body binds to ?v.
      // One scan branch per predicate, all semi-joined with the (usually
      // small, AQE-broadcastable) described-id set; a triple set →
      // distinct. Net-new vs the reference (its eval drops DESCRIBE).
      val v = q.describe.get
      require(q.stars.contains(v),
        s"DESCRIBE ?$v requires ?$v to be a star subject in the WHERE body")
      val patterns = q.stars(v)
      val preds = patterns.collect {
        case TriplePattern(_, p, ObjVar(_)) if p != TriplePattern.RdfType => p
      }.distinct
      val classIri = patterns.collectFirst {
        case TriplePattern(_, TriplePattern.RdfType, ObjIri(c)) => c
      }
      val relevant = mappings.relevantFor(preds, classIri)
      require(relevant.nonEmpty, s"no relevant source for DESCRIBE ?$v")
      val ids = sliced.select(col(v).as("sid")).distinct()
      val branches = relevant.flatMap { m =>
        val raw = StarCompiler.loadSource(spark, m, config)
        def rendered(attr: String): Column = {
          val fns = m.attrTransforms.getOrElse(attr, Nil)
          if (fns.isEmpty) col(attr) else Transforms(col(attr), fns)
        }
        val idC = {
          val fns = m.attrTransforms.getOrElse("", Nil)
          if (fns.isEmpty) col(m.idAttr) else Transforms(col(m.idAttr), fns)
        }
        val typeBranch = m.classIri.map(c => raw.select(idC.as("sid"),
          lit(TriplePattern.RdfType).as("p"), lit(c).as("o")))
        val predBranches = m.predicateToAttr.toSeq.sortBy(_._1).map {
          case (p0, attr) => raw.select(idC.as("sid"), lit(p0).as("p"),
            rendered(attr).cast("string").as("o"))
        }
        typeBranch.toSeq ++ predBranches
      }
      branches.reduce(_.unionByName(_))
        .join(ids, Seq("sid"), "left_semi")
        .select(col("sid").cast("string").as("s"), col("p"), col("o"))
        .distinct()
    } else sliced
  }

  /** Compile the WHERE body (stars → join chain → bare-variable columns),
    * without solution modifiers. */
  private def compileBody(spark: SparkSession, q: ParsedQuery,
      mappings: MappingsDoc, config: LakeConfig,
      reorderJoins: Boolean): DataFrame = {

    val starNames = q.stars.keys.toSeq.sorted
    val needed = neededVars(q)

    // --- arbitrary-length paths: FILTER/VALUES on a closure's object var
    // apply to the REACHABLE endpoint, not the one-hop edge — keep them
    // out of the per-star compile (which would push them into the scan,
    // i.e. onto every intermediate hop) and apply them after the closure.
    // Subject-side constraints MAY stay in the scan: they restrict the
    // start set of `base`, and the edge relation is rebuilt unconstrained
    // below (closureEdges).
    val closureVars = q.closures.map(_.objVar).toSet
    val qStar =
      if (closureVars.isEmpty) q
      else q.copy(filters = q.filters.filterNot(f => closureVars(f.varName)),
        values = q.values.filterNot(v => closureVars(v._1)))

    // --- per-star ParSets (reference SparkExecutor.query, stage 6 of §3.1)
    val baseDFs: Map[String, DataFrame] = starNames.map { s =>
      val df = StarCompiler.compile(spark, qStar, s, mappings, config, needed)
      s -> StarCompiler.applyInlineTransforms(df, s, q)
    }.toMap

    // --- negated property sets: ?s !(p…) ?v fans each subject out over
    // the values of every mapped predicate of its relevant sources except
    // the excluded ones (string-cast — the expansion mixes column types)
    val withNegations: Map[String, DataFrame] = q.negations.foldLeft(baseDFs) { (m, ng) =>
      require(q.stars.contains(ng.subjVar),
        s"negated path subject ?${ng.subjVar} needs at least one other pattern " +
          "(typically `a <Class>`) to select its sources")
      val pats = q.stars(ng.subjVar)
      val preds = pats.collect {
        case TriplePattern(_, p, ObjVar(_)) if p != TriplePattern.RdfType => p
      }.distinct
      val classIri = pats.collectFirst {
        case TriplePattern(_, TriplePattern.RdfType, ObjIri(c)) => c
      }
      val sCol = StarCompiler.idCol(ng.subjVar)
      val oCol = StarCompiler.varCol(ng.subjVar, ng.objVar)
      val branches = mappings.relevantFor(preds, classIri).flatMap { mp =>
        val raw = StarCompiler.loadSource(spark, mp, config)
        def rendered(attr: String): Column = {
          val fns = mp.attrTransforms.getOrElse(attr, Nil)
          if (fns.isEmpty) col(attr) else Transforms(col(attr), fns)
        }
        val idC = {
          val fns = mp.attrTransforms.getOrElse("", Nil)
          if (fns.isEmpty) col(mp.idAttr) else Transforms(col(mp.idAttr), fns)
        }
        mp.predicateToAttr.toSeq.sortBy(_._1)
          .filterNot { case (p, _) => ng.excluded.contains(p) }
          .map { case (_, attr) =>
            raw.select(idC.as(sCol), rendered(attr).cast("string").as(oCol))
          }
      }
      require(branches.nonEmpty,
        s"negated property set on ?${ng.subjVar} excludes every mapped predicate")
      m.updated(ng.subjVar, m(ng.subjVar).join(branches.reduce(_.unionByName(_)), Seq(sCol)))
    }

    // --- close each p+/p* star: replace the one-hop (subject, object)
    // pairs with their transitive closure, reflexive for `*`. The edge
    // relation comes from an UNCONSTRAINED scan of the path predicate —
    // SPARQL 1.1 §9.1 constrains a path's ENDPOINTS, never its
    // intermediate hops, so the star's own FILTER/VALUES (subject or
    // sibling vars, already applied inside `base`) must not thin the
    // edge set the closure walks. When those constraints make the start
    // set selective, a frontier BFS from it (O(reachable)) replaces the
    // full O(n·depth) closure — at 100× data that is the difference
    // between touching the whole graph and touching one subtree.
    val starDFs: Map[String, DataFrame] = q.closures.foldLeft(withNegations) { (m, cl) =>
      val sCol = StarCompiler.idCol(cl.subjVar)
      val oCol = StarCompiler.varCol(cl.subjVar, cl.objVar)
      // the one-hop binding column is replaced by the closed pairs; dedup
      // the remaining columns so a multi-valued path predicate cannot
      // multiply solutions (SPARQL path solutions are duplicate-free)
      val base0 = m(cl.subjVar)
      val base = (if (base0.columns.contains(oCol)) base0.drop(oCol) else base0).distinct()
      val edges = closureEdges(spark, q, cl, mappings, config)
      val closed =
        if (!cl.transitive) // `p?`: zero-or-one hop — the one-hop edge
          // set exactly (zero-hop pairs join below via `reflexive`); no
          // closure walk, and the rejoin on sCol restricts to the star's
          // subjects. Null endpoints (subjects with no edge) are dropped
          // here the same way Closure.transitive drops them — a null dst
          // is "no hop", not a pair.
          edges.filter(col("src").isNotNull && col("dst").isNotNull)
        else if (closureSeeded(q, cl))
          graft.ops.Closure.fromSeeds(edges, base.select(col(sCol).as("src")))
        else objectSeedLits(q, cl) match {
          // the REACHABLE endpoint is pinned to literals (= / VALUES):
          // reverse BFS from those seeds over the flipped edge relation
          // is O(reverse-reachable), vs materializing the full closure
          // to keep the pairs ending in a handful of nodes — the mirror
          // image of the subject-seeded case. Seeds come from the query
          // literals (cast to the edge type); ALL deferred endpoint
          // constraints still apply below, so seeding from one
          // constraint's set stays correct when several are ANDed.
          case Some(lits) =>
            import spark.implicits._
            // cast to the ORIGINAL dst type: after flipping, the seeds
            // join against the old dst column — casting to src's type
            // would rely on implicit join coercion when the two differ
            val seeds = lits.toDF("src")
              .select(col("src").cast(edges.schema("dst").dataType).as("src"))
            graft.ops.Closure
              .fromSeeds(edges.select(col("dst").as("src"), col("src").as("dst")), seeds)
              .select(col("dst").as("src"), col("src").as("dst"))
          case None => graft.ops.Closure.transitive(edges)
        }
      val pairs =
        if (!cl.reflexive) closed
        // `*`: zero hops — (x, x) for every subject of the star
        else closed.union(base.select(col(sCol).as("src"), col(sCol).as("dst"))).distinct()
      val rejoined = base.join(
        pairs.select(col("src").as(sCol), col("dst").as(oCol)), Seq(sCol))
      // deferred endpoint constraints on the REACHABLE var
      val filtered = q.filters.filter(_.varName == cl.objVar)
        .foldLeft(rejoined)((d, f) => d.filter(StarCompiler.predicate(col(oCol), f)))
      val valued = q.values.filter(_._1 == cl.objVar)
        .foldLeft(filtered) { case (d, (_, vals)) =>
          d.filter(StarCompiler.valuesCondition(d, oCol, vals))
        }
      m.updated(cl.subjVar, valued)
    }

    // --- join plan: star A joins star B iff A has an object var that is
    // B's subject var (reference Planner.scala:62-88)
    val edges: Seq[JoinEdge] = for {
      s <- starNames
      TriplePattern(_, p, ObjVar(o)) <- q.stars(s)
      if p != TriplePattern.RdfType && q.stars.contains(o) && o != s
    } yield JoinEdge(s, o)

    // optional weight-heuristic join ordering (reference
    // Planner.scala:90-170: per-store weight from config + filter bonus;
    // the reference computes but never applies it — Run.scala:236/240).
    // AQE re-plans physically at runtime either way; this only seeds the
    // left-deep chain with the heaviest edge first.
    val ordered =
      if (!reorderJoins) edges.distinct
      else {
        val weight: Map[String, Int] = starNames.map { s =>
          val preds = q.stars(s).collect {
            case TriplePattern(_, p, ObjVar(_)) if p != TriplePattern.RdfType => p
          }
          val classIri = q.stars(s).collectFirst {
            case TriplePattern(_, TriplePattern.RdfType, ObjIri(c)) => c
          }
          val storeW = mappings.relevantFor(preds, classIri).headOption
            .flatMap(m => config.weights.get(m.storeType)).getOrElse(1)
          val vars = q.stars(s).collect { case TriplePattern(_, _, ObjVar(v)) => v }.toSet
          val filterBonus = if (q.filters.exists(f => vars(f.varName) || f.varName == s)) 1 else 0
          s -> (storeW + filterBonus)
        }.toMap
        edges.distinct.sortBy(e => -(weight(e.fromStar) + weight(e.toStar)))
      }

    val joined = joinChain(starDFs, ordered, q.optionalStars, q.minusStars,
      q.existsStars)

    // --- rename to bare variable names; star prefixes disappear here.
    // MINUS/EXISTS-star bindings are not part of the solution (anti/semi
    // joins keep only the preserved side's columns). Negated-path vars
    // (bound by the expansion, not by a pattern) resolve to their star's
    // expansion column.
    val negRes = q.negations.filter(n => needed(n.objVar))
      .map(n => n.objVar -> StarCompiler.varCol(n.subjVar, n.objVar))
    val resolution = (resolveKept(q, needed) ++ negRes)
      .foldLeft(Vector.empty[(String, String)]) { (acc, vc) =>
        if (acc.exists(_._1 == vc._1)) acc else acc :+ vc
      }
    joined.select(resolution.map { case (v, c) => col(c).as(v) }: _*)
  }

  /** Unconstrained one-hop edge relation of a closure's path predicate:
    * a fresh (id, attr) scan of every relevant source that maps the
    * predicate, transforms applied, dst cast to src's type — the same
    * source-expansion shape as the negated-set handling. Deliberately
    * NOT derived from the star DataFrame: that one carries the star's
    * FILTER/VALUES, which would remove intermediate hops (judged wrong
    * in round 5 — a subject-seeded `p+` returned only one hop). */
  private def closureEdges(spark: SparkSession, q: ParsedQuery, cl: PathClosure,
      mappings: MappingsDoc, config: LakeConfig): DataFrame = {
    val pats = q.stars(cl.subjVar)
    val preds = pats.collect {
      case TriplePattern(_, p, ObjVar(_)) if p != TriplePattern.RdfType => p
    }.distinct
    val classIri = pats.collectFirst {
      case TriplePattern(_, TriplePattern.RdfType, ObjIri(c)) => c
    }
    val head = predEdges(spark, cl.predicate,
      mappings.relevantFor(preds, classIri), config)
    // composite group (p1/p2/…): the closed "edge" is the hop chain —
    // one inner join per extra predicate, each hop drawn from EVERY
    // source mapping it (intermediate hops may live in entities the
    // star's own sources don't cover)
    cl.morePredicates.foldLeft(head) { (acc, p) =>
      // rename the probe side before joining: the hops usually scan the
      // SAME source, and fresh projection attrs sidestep self-join
      // column ambiguity
      val nxt = predEdges(spark, p, mappings.relevantFor(Seq(p), None), config)
        .select(col("src").as("__hs"), col("dst").as("__hd"))
      acc.join(nxt, col("dst") === col("__hs"))
        .select(col("src"), col("__hd").as("dst"))
    }
  }

  /** One predicate's (src, dst) edge scan over the given candidate
    * mappings, transforms applied, dst cast to src's type. */
  private def predEdges(spark: SparkSession, predicate: String,
      candidates: Seq[graft.model.EntityMapping], config: LakeConfig): DataFrame = {
    val branches = candidates
      .filter(_.predicateToAttr.contains(predicate))
      .map { mp =>
        val raw = StarCompiler.loadSource(spark, mp, config)
        def rendered(attr: String, fns: Seq[TransformFn]): Column =
          if (fns.isEmpty) col(attr) else Transforms(col(attr), fns)
        val attr = mp.predicateToAttr(predicate)
        val sel = raw.select(
          rendered(mp.idAttr, mp.attrTransforms.getOrElse("", Nil)).as("src"),
          rendered(attr, mp.attrTransforms.getOrElse(attr, Nil)).as("dst"))
        sel.select(col("src"), col("dst").cast(sel.schema("src").dataType).as("dst"))
      }
    require(branches.nonEmpty,
      s"no relevant source maps the path predicate <$predicate>")
    branches.reduce(_.unionByName(_))
  }

  /** A closure star carrying any FILTER/VALUES on its subject or sibling
    * vars has a restricted start set — frontier BFS from it beats the
    * full closure. Constraints on the closure's own object var don't
    * count: they are deferred past the closure (they bound the REACHABLE
    * end, not the start). */
  /** Finite literal seed set for a closure's OBJECT endpoint: an `=`
    * filter or a VALUES list on the reachable var. One constraint's set
    * suffices as the seed (constraints are ANDed and all re-apply after
    * the closure); inequality/regex forms are not enumerable and fall
    * back to the full closure. */
  private def objectSeedLits(q: ParsedQuery, cl: PathClosure): Option[Seq[String]] = {
    val eq = q.filters.collectFirst {
      case f if f.varName == cl.objVar && f.op == "=" => Seq(f.value)
    }
    eq.orElse(q.values.collectFirst { case (v, vals) if v == cl.objVar => vals })
  }

  private def closureSeeded(q: ParsedQuery, cl: PathClosure): Boolean = {
    val deferred = q.closures.filter(_.subjVar == cl.subjVar).map(_.objVar).toSet
    val starVars = q.stars(cl.subjVar).collect {
      case TriplePattern(_, p, ObjVar(v)) if p != TriplePattern.RdfType => v
    }.toSet
    val vars = (starVars -- deferred) + cl.subjVar
    q.filters.exists(f => vars(f.varName)) || q.values.exists(v => vars(v._1))
  }

  /** BIND expression → Column: arithmetic stays numeric (integer literals
    * as longs, decimals as doubles — the same typing DuckDB gives the
    * twin expression); CONCAT casts every operand to string (SPARQL
    * string-function semantics). Everything is a plain Catalyst
    * expression — codegen'd, pushdown-transparent, no UDFs. */
  private def bindColumn(e: BindExpr): Column = e match {
    case BVar(v) => col(v)
    case BNum(n) => n.toLongOption.map(lit(_)).getOrElse(lit(n.toDouble))
    case BStr(s) => lit(s)
    case BOp("+", l, r) => bindColumn(l) + bindColumn(r)
    case BOp("-", l, r) => bindColumn(l) - bindColumn(r)
    case BOp("*", l, r) => bindColumn(l) * bindColumn(r)
    case BOp("/", l, r) => bindColumn(l) / bindColumn(r)
    case BOp(op, _, _) => sys.error(s"unsupported BIND operator $op")
    case BFun("concat", args) if args.nonEmpty =>
      concat(args.map(a => bindColumn(a).cast("string")): _*)
    case BFun("str", Seq(a)) => bindColumn(a).cast("string")
    case BFun("abs", Seq(a)) => abs(bindColumn(a))
    // SPARQL 1.1 builtins (17.4.2/17.4.3), each a codegen'd Spark builtin.
    // SUBSTR/STRLEN count characters 1-based like SPARQL; CONTAINS/
    // STRSTARTS/STRENDS yield booleans usable directly in IF.
    case BFun("strlen", Seq(a)) => length(bindColumn(a))
    case BFun("ucase", Seq(a)) => upper(bindColumn(a))
    case BFun("lcase", Seq(a)) => lower(bindColumn(a))
    case BFun("contains", Seq(a, b)) => bindColumn(a).contains(bindColumn(b))
    case BFun("strstarts", Seq(a, b)) => bindColumn(a).startsWith(bindColumn(b))
    case BFun("strends", Seq(a, b)) => bindColumn(a).endsWith(bindColumn(b))
    case BFun("substr", Seq(a, p)) =>
      bindColumn(a).substr(bindColumn(p), lit(Int.MaxValue))
    case BFun("substr", Seq(a, p, l)) =>
      bindColumn(a).substr(bindColumn(p), bindColumn(l))
    case BFun("replace", Seq(a, f0, t)) =>
      replace(bindColumn(a), bindColumn(f0), bindColumn(t))
    case BFun("ceil", Seq(a)) => ceil(bindColumn(a))
    case BFun("floor", Seq(a)) => floor(bindColumn(a))
    case BFun("round", Seq(a)) => round(bindColumn(a))
    case BFun("coalesce", args) if args.nonEmpty =>
      coalesce(args.map(bindColumn): _*)
    case BFun("if", Seq(c0, t, f0)) =>
      when(bindColumn(c0), bindColumn(t)).otherwise(bindColumn(f0))
    case BFun(f, args) => sys.error(s"unsupported BIND function $f/${args.size}")
  }

  private def aggColumn(a: AggSpec): Column = {
    val in = if (a.varName == "*") lit(1) else col(a.varName)
    val c = (a.fn, a.distinct) match {
      case ("sum", false) => sum(in)
      case ("sum", true) => sum_distinct(in)
      case ("min", _) => min(in)
      case ("max", _) => max(in)
      case ("avg", false) => avg(in)
      case ("count", false) => count(in)
      case ("count", true) => countDistinct(in)
      // SPARQL 1.1 §18.5.1: GROUP_CONCAT leaves element order undefined —
      // we sort elements so the result is deterministic (and therefore
      // oracle-checkable); SAMPLE may return any group member — we pick
      // the minimum, same rationale
      case ("group_concat", false) =>
        array_join(array_sort(collect_list(in.cast("string"))), a.separator)
      case ("group_concat", true) =>
        array_join(array_sort(collect_set(in.cast("string"))), a.separator)
      case ("sample", _) => min(in)
      case (other, d) => sys.error(s"unsupported aggregate '$other'${if (d) " DISTINCT" else ""}")
    }
    c.as(a.alias)
  }

  /** Semantic column pruning (reference Planner.getNeededPredicates,
    * Planner.scala:24-60): a var's column is materialized iff it is
    * SELECTed, filtered, grouped, ordered, aggregated, a join key, a
    * transform operand, or a repeated object var. */
  private[engine] def neededVars(q: ParsedQuery): Set[String] = {
    if (q.selectAll)
      return q.patterns.collect { case TriplePattern(_, _, ObjVar(v)) => v }.toSet ++
        q.stars.keySet
    val objVars = q.patterns.collect { case TriplePattern(_, _, ObjVar(v)) => v }
    val repeated = objVars.groupBy(identity).collect { case (v, occ) if occ.size > 1 => v }
    val joinVars = objVars.filter(q.stars.contains)
    val bindOperands = q.binds.flatMap(_.expr.vars)
    val bindOutputs = q.binds.map(_.outVar).toSet
    // a var shared with a subquery is a join key — materialize it even
    // when the outer query neither selects nor filters it
    val subVars = q.subqueries.flatMap(s =>
      s.selectVarNames ++ s.aggregates.map(_.alias)) ++
      q.negations.map(_.objVar)
    (q.selectVarNames ++ q.aggregates.map(_.varName).filter(_ != "*") ++
      q.filters.map(_.varName) ++ q.values.map(_._1) ++ q.groupBy ++
      q.orderBy.map(_.varName) ++ q.transforms.map(_.rightVar) ++
      joinVars ++ repeated ++ bindOperands ++ subVars).toSet -- bindOutputs
  }

  /** var -> concrete post-join column, restricted to columns a KEPT
    * (non-MINUS/EXISTS) star contributes — anti/semi joins keep only the
    * preserved side's columns. Shared by both engines (the DataFrame
    * engine and [[SqlGenExecutor]]) so the resolution semantics cannot
    * drift.
    *
    * A var survives iff a kept star binds it:
    *  - subject of a kept star → that star's ID column;
    *  - otherwise, the FIRST kept star binding it as an object var → that
    *    star's var column (one-binding invariant, reference Run.scala:73).
    * Note the order: a var that names a DROPPED star's subject but is
    * also the object of a kept star (SELECT ?v WHERE { ?x :p ?v .
    * FILTER EXISTS { ?v :q ?w } }) resolves to the kept star's column —
    * it is part of the solution, not anti/semi-joined away. */
  private[engine] def resolveKept(q: ParsedQuery, needed: Set[String]): Seq[(String, String)] = {
    val dropStars = q.minusStars ++ q.existsStars
    val keptSubjects = q.stars.keySet -- dropStars
    val keptBinding: Map[String, String] =
      q.patterns.collect {
        case TriplePattern(s, p, ObjVar(o))
            if p != TriplePattern.RdfType && keptSubjects.contains(s) => o -> s
      }.reverse.toMap // reverse + toMap = first binding wins
    needed.toSeq.sorted.flatMap { v =>
      if (keptSubjects.contains(v)) Some(v -> StarCompiler.idCol(v))
      else keptBinding.get(v).map(s => v -> StarCompiler.varCol(s, v))
    }
  }

  /** Left-deep join chain with the reference's pending-queue semantics
    * (SparkExecutor.scala:247-359), extended with left-outer attachment of
    * OPTIONAL stars: required-required edges join inner (processed first);
    * attaching an optional star preserves the already-joined side. A
    * genuinely disconnected component becomes a cross join (the reference
    * would never drain it). */
  private[engine] def joinChain(starDFs: Map[String, DataFrame], edges: Seq[JoinEdge],
      optionalStars: Set[String] = Set.empty,
      minusStars: Set[String] = Set.empty,
      existsStars: Set[String] = Set.empty): DataFrame = {
    if (edges.isEmpty) {
      require(starDFs.size == 1,
        s"${starDFs.size} stars but no join conditions (cartesian query)")
      return starDFs.head._2
    }
    def opt(s: String) = optionalStars.contains(s) || minusStars.contains(s) ||
      existsStars.contains(s)
    // a MINUS/EXISTS star leaves no columns behind (anti/semi join) — it
    // must be a leaf of the join graph
    for (m <- minusStars ++ existsStars) {
      val touching = edges.count(e => e.fromStar == m || e.toStar == m)
      require(touching == 1,
        s"MINUS/EXISTS star ?$m must connect to the rest of the query by exactly one join")
    }
    // inner edges first so every required star is joined before any
    // left-outer/anti attachment can touch it
    val (innerEdges, outerEdges) = edges.partition(e => !opt(e.fromStar) && !opt(e.toStar))
    var joinedStars = Set.empty[String]
    var df: DataFrame = null
    var pending = (innerEdges ++ outerEdges).toList
    while (pending.nonEmpty) {
      val idx =
        if (df == null) 0
        else pending.indexWhere(e =>
          joinedStars.contains(e.fromStar) || joinedStars.contains(e.toStar))
      if (idx >= 0) {
        val e = pending(idx)
        pending = pending.patch(idx, Nil, 1)
        val cond = col(e.leftCol) === col(e.rightCol)
        def attach(newStar: String): Unit = {
          if (minusStars.contains(newStar))
            df = df.join(starDFs(newStar), cond, "left_anti")
          else if (existsStars.contains(newStar))
            df = df.join(starDFs(newStar), cond, "left_semi")
          else if (opt(newStar))
            df = df.join(starDFs(newStar), cond, "left_outer")
          else if (opt(e.fromStar) || opt(e.toStar))
            sys.error(s"required star ?$newStar is reachable only through an " +
              "OPTIONAL edge — rewrite the query so it joins a required star")
          else df = df.join(starDFs(newStar), cond, "inner")
          joinedStars += newStar
        }
        if (df == null) {
          // seed: start from a required endpoint so outer joins preserve it
          val (seed, other) =
            if (!opt(e.fromStar)) (e.fromStar, e.toStar) else (e.toStar, e.fromStar)
          df = starDFs(seed)
          joinedStars += seed
          attach(other)
        } else (joinedStars.contains(e.fromStar), joinedStars.contains(e.toStar)) match {
          case (true, true) => df = df.filter(cond) // cycle edge: extra condition
          case (true, false) => attach(e.toStar)
          case (false, true) => attach(e.fromStar)
          case (false, false) => () // unreachable: idx guarantees a touch
        }
      } else {
        // disconnected component: join it internally, then cross join on
        val e = pending.head
        pending = pending.tail
        val jt = if (opt(e.fromStar) || opt(e.toStar)) "left_outer" else "inner"
        val sub = starDFs(e.fromStar)
          .join(starDFs(e.toStar), col(e.leftCol) === col(e.rightCol), jt)
        df = df.crossJoin(sub)
        joinedStars ++= Set(e.fromStar, e.toStar)
      }
    }
    // stars with no edges at all (disconnected singletons)
    for ((s, sdf) <- starDFs if !joinedStars.contains(s)) df = df.crossJoin(sdf)
    df
  }
}
