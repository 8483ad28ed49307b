package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no native operator for, built from shuffle
  * shapes that survive 100 TB (net-new vs the reference, which has no
  * temporal operators at all).
  *
  * - [[asofJoinBackward]]: for each left row, the latest right row at or
  *   before its timestamp (per key) — ONE keyed shuffle + sort via the
  *   union-and-fill formulation, never a per-row lookup or a range
  *   cross-join. This is the classic "enrich events with the dimension
  *   state that was current at event time" operator.
  * - [[intervalJoin]]: point-in-interval join via slot bucketing — each
  *   interval replicates to the ⌈len/slot⌉+1 slots it overlaps, each
  *   point lands in exactly ONE slot, so the equi-join on slot produces
  *   every candidate pair exactly once (no dedup pass) and the exact
  *   containment filter runs scan-side. Beats Spark's default plan for
  *   inequality joins (BroadcastNestedLoopJoin, O(n·m)).
  */
object TemporalJoin {

  /** Block width of [[rangeAggregate]]'s two-level prefix sum: each
    * window partition holds ≤ this many grid rows, and the exclusive
    * block-offset table holds ≤ maxSlots/PrefixBlock rows. */
  private val PrefixBlock = 65536L

  /** Backward (inclusive) as-of join. Left keeps all its rows/columns;
    * each gains `rightVals` from the latest right row with
    * `right.ts <= left.ts` for the same `key` (null when none exists —
    * left-outer semantics).
    *
    * Formulation: tag both inputs, union by name, one window per key
    * ordered by (ts, side) with right rows sorting before left rows on
    * ties (ties are inclusive: a right row AT the left timestamp
    * matches), then `last(value, ignoreNulls)` over an unbounded-
    * preceding frame fills each left row with the most recent right
    * value. Cost: one hash shuffle on `key` + one sort — the same bill
    * as any keyed window, independent of time-range density.
    *
    * SKEW EXPOSURE: the window partitions by `key`, so ONE task sorts a
    * hot key's full history. Spark's window sort is external
    * (disk-backed) — a hot key costs O(n_hot·log n_hot) time and spill,
    * never an OOM — but a key holding a large fraction of all rows
    * serializes that fraction of the work into one task. When one key
    * dominates (rule of thumb: a key exceeding ~1/numPartitions of all
    * rows, i.e. whatever makes its single task the stage's tail), route
    * through [[asofJoinBackwardSliced]]: same semantics, hot keys split
    * across time slices (spec-verified equal on a 50%-hot-key fixture).
    *
    * Note: a NULL in a right value column is indistinguishable from
    * "no newer state" (ignoreNulls skips it) — encode deletions
    * explicitly if they matter. */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "asofJoinBackward needs at least one right value column")
    val leftCols = left.columns.toSeq
    val lAligned = rightVals.foldLeft(left.withColumn("__side", lit(1))) {
      (d, c) => d.withColumn(s"__rv_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rAligned = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(right.select(
        col(key) +: col(ts) +: rightVals.map(c => col(c).as(s"__rv_$c")): _*)
        .withColumn("__side", lit(0))) {
        (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(lAligned.unionByName(rAligned)) {
      (d, c) => d.withColumn(s"__rv_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"__rv_$c").as(c)): _*)
  }

  /** NEAREST as-of join with a tolerance — pandas `merge_asof
    * (direction='nearest', tolerance=...)`: each left row gains
    * `rightVals` from the right row minimizing |right.ts − left.ts|
    * within `toleranceMicros`, ties at equal distance resolved BACKWARD
    * (the past is the safer default for feature joins — no leakage).
    * NULLs when no right row is in tolerance.
    *
    * Formulation: the [[asofJoinBackward]] union-window plan run in
    * BOTH directions over one union — a backward `last(…)` fill
    * (unbounded-preceding, right rows before left on ts ties) and a
    * forward `first(…)` fill (current-row-to-unbounded-following) —
    * then a per-row arbitration on exact integer microsecond distances
    * (unix_micros; never truncated seconds, which would flip nearest
    * decisions near the midpoint). The fills move ONE struct packing
    * __rts plus every right value column, so right rows travel
    * ATOMICALLY: a NULL in one right value column can never stitch
    * values from different right rows, and the arbitration distance
    * always describes the exact row the values came from (unlike the
    * documented per-column ignoreNulls caveat of [[asofJoinBackward]]).
    * Same cost bill as backward: one hash shuffle on `key`, one sort,
    * two window passes over it (vs 2·|rightVals| for per-column fills);
    * same hot-key exposure — route through [[asofJoinNearestSliced]]
    * when a key dominates.
    * Output: left columns + rightVals (null outside tolerance). */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String], toleranceMicros: Long): DataFrame = {
    require(rightVals.nonEmpty, "asofJoinNearest needs at least one right value column")
    require(toleranceMicros > 0, s"tolerance must be positive: $toleranceMicros")
    val leftCols = left.columns.toSeq
    val rBase = right.select(col(key), col(ts),
      struct(unix_micros(col(ts)).as("__rts") +: rightVals.map(col): _*).as("__rv"))
    val rvType = rBase.schema("__rv").dataType
    val lAligned = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val rAligned = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(rBase.withColumn("__side", lit(0))) {
        (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val u = lAligned.unionByName(rAligned)
    val wB = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward fill is spelled as a REVERSED-order RUNNING frame, not
    // first(...) over (currentRow, unboundedFollowing): Spark evaluates a
    // shrinking unbounded-following frame by recomputing the aggregate
    // from scratch at every row (UnboundedFollowingWindowFunctionFrame) —
    // O(rows²) per window partition, measured 26–42 s on an 800k-row
    // union at sf2 — while a running frame accumulates incrementally.
    // last(non-null) walking (ts desc, side desc) selects exactly the
    // row first(non-null) would walking (ts asc, side asc) from the
    // current row: the earliest right row strictly after (ts, __side) in
    // the original order (right rows AT a left ts still land backward —
    // they sort before side=1 ascending, i.e. after it descending).
    // Cost: a second sort of the partition (same single exchange), never
    // a per-row rescan.
    val wF = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__rv"), ignoreNulls = true).over(wF))
    val lm = unix_micros(col(ts))
    val db = lm - col("__b").getField("__rts")   // >= 0 (incl. ties at 0)
    val df = col("__f").getField("__rts") - lm   // > 0 (equal-ts rights land backward)
    val useB = col("__b").isNotNull && db <= toleranceMicros &&
      (col("__f").isNull || df > toleranceMicros || db <= df)
    val useF = !useB && col("__f").isNotNull && df <= toleranceMicros
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c =>
        when(useB, col("__b").getField(c)).when(useF, col("__f").getField(c)).as(c)): _*)
  }

  /** [[asofJoinNearest]] with the hot-key story — the sliced escape
    * hatch the nearest join's doc routes to when one key dominates
    * (previously only the backward join had one). Identical semantics:
    * nearest right row within `toleranceMicros`, equal-distance ties
    * backward; but every window partitions by (key, time-slice), so a
    * key holding half the corpus spreads over its slices' tasks instead
    * of serializing into one sort.
    *
    * The carry-in must flow BOTH directions (unlike backward's one):
    *  - in-slice pass: the base union-and-fill windows per (key, slice)
    *    — each left row gets its slice's latest-at-or-before (__b) and
    *    earliest-after (__f) packed right struct;
    *  - carry pass over the per-(key, slice) table (rows = #slices per
    *    key — the hot key's millions of rows never cross a per-key
    *    exchange): each slice inherits the latest right row of
    *    strictly-earlier slices (backward carry = `max(__rv)` of the
    *    latest populated earlier slice; struct max orders by __rts
    *    first) and the earliest right row of strictly-later slices
    *    (forward carry = `min(__rv)` of the earliest populated later
    *    slice). A later slice's timestamps are strictly greater than
    *    any in this slice (sliceOf is monotone in ts), so in-slice
    *    candidates always beat carries — plain coalesce order — and
    *    the db ≥ 0 / df > 0 invariants of the base arbitration hold.
    *
    * Ties: a right row AT a left row's ts shares its slice, so
    * inclusivity (ties land backward) is decided in-slice exactly as
    * the base window. Duplicate right (key, ts) rows resolve
    * arbitrarily in BOTH formulations (base: window order; sliced:
    * struct max/min) — keep them unique (e.g. pre-aggregate) when
    * cross-formulation determinism matters. */
  def asofJoinNearestSliced(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String], toleranceMicros: Long,
      sliceOf: Column => Column): DataFrame = {
    require(rightVals.nonEmpty, "asofJoinNearestSliced needs at least one right value column")
    require(toleranceMicros > 0, s"tolerance must be positive: $toleranceMicros")
    val leftCols = left.columns.toSeq
    val rBase = right.select(col(key), col(ts),
      struct(unix_micros(col(ts)).as("__rts") +: rightVals.map(col): _*).as("__rv"))
    val rvType = rBase.schema("__rv").dataType
    val lAligned = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val rAligned = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(rBase.withColumn("__side", lit(0))) {
        (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    // pinned: the union feeds BOTH the in-slice window pass and the
    // slice-extremes aggregate below — without the checkpoint each
    // consumer re-evaluates the full upstream (two scans + the right
    // side's pre-aggregation), measured ~1.5× the whole op at sf1
    val u = lAligned.unionByName(rAligned)
      .withColumn("__slice", sliceOf(col(ts)))
      .localCheckpoint()
    val wB = Window.partitionBy(col(key), col("__slice"))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // reversed-order running frame, NOT first(...) over (currentRow,
    // unboundedFollowing) — the shrinking frame recomputes its aggregate
    // per row (O(rows² per (key, slice) partition); the hot key's slices
    // made that the whole gate: ts23 measured 40 s at sf2, fitted smoke
    // alpha 1.38). Identical row selection — see asofJoinNearest.
    val wF = Window.partitionBy(col(key), col("__slice"))
      .orderBy(col(ts).desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filledIn = u
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__rv"), ignoreNulls = true).over(wF))
    // per-(key, slice) extremes of the right rows, then the two carries
    // over the tiny per-key slice table. ONE aggregate produces both
    // the extremes AND the full slice set (a row per (key, slice) of u;
    // conditional max/min skip the left rows exactly like the previous
    // filter+agg⟕distinct pair did) — one pass over the checkpoint
    // instead of two plus their re-join
    val sliceExt = u.groupBy(col(key), col("__slice"))
      .agg(max(when(col("__side") === 0, col("__rv"))).as("__mx"),
        min(when(col("__side") === 0, col("__rv"))).as("__mn"))
    val wPrev = Window.partitionBy(col(key)).orderBy(col("__slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // (1, unboundedFollowing) is also a shrinking frame (per-row rescan);
    // over the slice table it is O(slices²) per key — harmless at day
    // granularity, quadratic again at fine slices. Same reversal: rows
    // strictly after the current slice ascending = rows strictly before
    // it descending, and (key, __slice) is unique so the order is total.
    val wNext = Window.partitionBy(col(key)).orderBy(col("__slice").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = sliceExt
      .select(col(key), col("__slice"),
        last(col("__mx"), ignoreNulls = true).over(wPrev).as("__cb"),
        last(col("__mn"), ignoreNulls = true).over(wNext).as("__cf"))
    val joined = filledIn.filter(col("__side") === 1)
      .join(carry, Seq(key, "__slice"), "left")
      .withColumn("__bc", coalesce(col("__b"), col("__cb")))
      .withColumn("__fc", coalesce(col("__f"), col("__cf")))
    val lm = unix_micros(col(ts))
    val db = lm - col("__bc").getField("__rts")
    val df = col("__fc").getField("__rts") - lm
    val useB = col("__bc").isNotNull && db <= toleranceMicros &&
      (col("__fc").isNull || df > toleranceMicros || db <= df)
    val useF = !useB && col("__fc").isNotNull && df <= toleranceMicros
    joined.select(leftCols.map(col) ++ rightVals.map(c =>
      when(useB, col("__bc").getField(c)).when(useF, col("__fc").getField(c)).as(c)): _*)
  }

  /** [[asofJoinBackward]] with the hot-key story: identical semantics,
    * but the heavy window partitions by (key, time-slice) instead of key
    * alone, so a key holding half the corpus spreads over all its slices'
    * tasks instead of serializing into one. `sliceOf` buckets a ts value
    * into a slice id (monotone in ts — e.g. `c => floor(c / hourNanos)`
    * for numeric-nanos columns); pick a span yielding 10s–1000s of
    * slices over the hot key's time range.
    *
    * Two passes replace the single per-key window:
    *  1. in-slice fill — the base union-and-fill window, partitioned by
    *     (key, slice): each left row gets the latest right value within
    *     its OWN slice;
    *  2. carry-in — per (key, slice), the last non-null right value of
    *     the slice (an aggregate, map-side combinable), then a per-key
    *     window over the SLICE table (rows = #slices per key, thousands
    *     at most — the hot key's millions of rows never pass through a
    *     per-key exchange) computes what each slice inherits from
    *     strictly-earlier slices; left rows unfilled after pass 1
    *     coalesce to their slice's carry-in.
    *
    * Ties at a slice boundary are safe: a right row AT a left row's ts
    * shares its slice (sliceOf is a function of ts), so inclusivity is
    * decided inside pass 1 exactly as in the base window. */
  def asofJoinBackwardSliced(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String], sliceOf: Column => Column): DataFrame = {
    require(rightVals.nonEmpty, "asofJoinBackwardSliced needs at least one right value column")
    val leftCols = left.columns.toSeq
    val lAligned = rightVals.foldLeft(left.withColumn("__side", lit(1))) {
      (d, c) => d.withColumn(s"__rv_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rAligned = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(right.select(
        col(key) +: col(ts) +: rightVals.map(c => col(c).as(s"__rv_$c")): _*)
        .withColumn("__side", lit(0))) {
        (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    // pinned: the union feeds the in-slice window pass AND the per-slice
    // aggregate — without it each consumer re-evaluates the upstream
    // scans (the asofJoinNearestSliced measurement)
    val u = lAligned.unionByName(rAligned)
      .withColumn("__slice", sliceOf(col(ts)))
      .localCheckpoint()
    // pass 1: the base fill, but partitioned by (key, slice) — the hot
    // key's rows hash across its slices
    val wIn = Window.partitionBy(col(key), col("__slice"))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filledIn = rightVals.foldLeft(u) {
      (d, c) => d.withColumn(s"__rv_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(wIn))
    }
    // pass 2: per (key, slice) the last non-null right value — max_by
    // keyed on ts-where-(right AND value-non-null), so left rows and
    // trailing null values are skipped exactly like the previous
    // side-filter + agg over only right rows (ties at equal ts fall to
    // either row, the same unspecified-order contract the base window
    // has) — then the carry from strictly-earlier slices over the tiny
    // per-key slice table. ONE aggregate emits a row per (key, slice)
    // of u (left-only slices carry nulls), replacing the previous
    // side-0 agg + distinct-slices + re-join trio
    val slAggs = rightVals.map(c =>
      max_by(col(s"__rv_$c"),
        when(col("__side") === 0 && col(s"__rv_$c").isNotNull, col(ts)))
        .as(s"__sl_$c"))
    val sliceLast = u.groupBy(col(key), col("__slice"))
      .agg(slAggs.head, slAggs.tail: _*)
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = sliceLast
      .select(Seq(col(key), col("__slice")) ++ rightVals.map(c =>
        last(col(s"__sl_$c"), ignoreNulls = true).over(wCarry).as(s"__ci_$c")): _*)
    filledIn.filter(col("__side") === 1)
      .join(carry, Seq(key, "__slice"), "left")
      .select(leftCols.map(col) ++ rightVals.map(c =>
        coalesce(col(s"__rv_$c"), col(s"__ci_$c")).as(c)): _*)
  }

  /** Inner join of points to the intervals containing them
    * (`start <= pt <= end`, both ends inclusive). `ptTs`/`startTs`/`endTs`
    * are timestamp (or numeric-seconds) columns; `slotSeconds` is the
    * bucketing granularity — pick it near the median interval length:
    * replication factor per interval is ⌈len/slot⌉+1, while a too-coarse
    * slot packs many candidates into one bucket before the exact filter.
    * Output has the columns of both inputs (caller renames collisions). */
  /** Median interval length in seconds — the slot granularity
    * [[intervalJoin]] derives when the caller passes no knob. One cheap
    * aggregate pass over (start, end) only (column-pruned scan; at
    * 100 TB this is metadata-scale next to the join it sizes).
    * approx_percentile's default accuracy pins the estimate within
    * 1/10000 of rank — any slot within ~2× of the true median keeps the
    * replication factor ⌈len/slot⌉+1 ≈ 2; exactness is not needed.
    * Fails loud on an empty/all-null intervals input: there is no
    * defensible slot to invent, and a default would silently mis-size
    * every later run that hits the same path with real data. */
  def autoSlotSeconds(intervals: DataFrame, startTs: String, endTs: String): Long = {
    val med = intervals
      .select((col(endTs).cast("timestamp").cast("long") -
        col(startTs).cast("timestamp").cast("long")).as("len"))
      .agg(approx_percentile(col("len"), lit(0.5), lit(10000)).as("m"))
      .head().get(0)
    require(med != null,
      "autoSlotSeconds: intervals input has no non-null (start, end) rows")
    math.max(1L, med.asInstanceOf[Long])
  }

  /** [[intervalJoin]] with the slot auto-derived as the median interval
    * length ([[autoSlotSeconds]]) — the spelling to use unless a
    * workload-specific slot has been measured. Cost of the default:
    * on the ts02 gate at sf1 the auto slot (median order-window length)
    * measured ~1.6× a hand-tuned 7-day slot (33 s vs 21 s, COVERAGE.md
    * Bench notes) — acceptable as a default, but pass an explicit
    * `slotSeconds` when the workload's interval-length distribution has
    * been profiled. */
  def intervalJoin(points: DataFrame, ptTs: String, intervals: DataFrame,
      startTs: String, endTs: String): DataFrame =
    intervalJoin(points, ptTs, intervals, startTs, endTs,
      autoSlotSeconds(intervals, startTs, endTs))

  def intervalJoin(points: DataFrame, ptTs: String, intervals: DataFrame,
      startTs: String, endTs: String, slotSeconds: Long): DataFrame = {
    require(slotSeconds > 0, "slotSeconds must be positive")
    // via timestamp: TIMESTAMP_NTZ refuses a direct long cast, and a
    // numeric-seconds column round-trips unchanged (session tz is only a
    // consistent offset — slotting needs consistency, not an epoch)
    def slotOf(c: Column) = floor(c.cast("timestamp").cast("long") / slotSeconds)
    val p = points.withColumn("__slot", slotOf(col(ptTs)))
    val i = intervals.withColumn("__slot",
      explode(sequence(slotOf(col(startTs)), slotOf(col(endTs)))))
    p.join(i, Seq("__slot"))
      .filter(col(ptTs) >= col(startTs) && col(ptTs) <= col(endTs))
      .drop("__slot")
  }

  /** Count (and optionally SUM) of points per containing interval — the
    * near-LINEAR fast path for range AGGREGATION, replacing
    * [[intervalJoin]]+groupBy when the query wants only per-interval
    * counts/sums and no per-pair attributes. intervalJoin materializes
    * Θ(points × containing-intervals) candidate pairs, which grows
    * ~quadratically when both densities grow with the corpus (the ts02
    * measurement: sf5 = 262.7 s, fitted alpha 1.695); this path never
    * materializes a pair:
    *
    *  1. per-slot partial aggregates of the points — ONE scan,
    *     map-side-combined down to ≤ #slots rows (the slot grid is
    *     calendar-bounded, NOT corpus-bounded: ~2.5k slots for a
    *     TPC-H-range day grid at ANY scale factor);
    *  2. a TWO-LEVEL prefix sum over the dense slot grid: per-block
    *     cumulative sums (blocks of [[PrefixBlock]] slots, windowed per
    *     block so no task ever sorts more than one block) + a
    *     broadcast-joined exclusive block-offset table (≤
    *     maxSlots/PrefixBlock rows — that tiny table is the only
    *     partition-less window). No single task ever sees the whole
    *     grid, which is what lets `maxSlots` sit at 16M instead of the
    *     single-task-bounded 2M;
    *  3. per interval, cnt = C(slot(end)) − C(slot(start)−1) via TWO
    *     equi-joins of the intervals against the cumulative grid —
    *     broadcast hash joins while the grid is ≤ `broadcastSlots`
    *     (map-only, no shuffle of either input — the ts02 shape), a
    *     plain shuffled equi-join on the slot beyond that (the
    *     intervals shuffle once per endpoint; the points are still
    *     never joined, only aggregated).
    *
    * Semantics: counts points p with slot(start) ≤ slot(p) ≤ slot(end)
    * (slot = floor(epoch-seconds / slotSeconds)). This EQUALS exact
    * closed-interval containment (start ≤ p ≤ end) whenever the point
    * and start columns are slot-aligned (e.g. DATE columns on a day
    * grid: slotSeconds = 86400) — end may sit anywhere inside its slot.
    * Misaligned inputs get slot-granularity semantics; route those
    * through [[intervalJoin]] instead.
    *
    * Output: every interval row (left-style — intervals containing no
    * points emit cnt = 0 and sums = 0, unlike the inner-join shape of
    * intervalJoin+groupBy; filter cnt > 0 for that) plus `cnt` and one
    * `sum_<name>` per entry of `sums` (expressions over the points
    * table, each `sum_<name>` typed as sum(<expr>) regardless of input
    * content — the empty-points short-circuit casts its zeros to the
    * same types). An interval with a NULL endpoint, or a reversed one
    * (start > end), contains no points under intervalJoin's predicate
    * and likewise emits cnt = 0 / sums = 0 here (guarded explicitly —
    * C(end) − C(start−1) would otherwise mis-count through the clamps).
    * Null point timestamps never match any interval in intervalJoin and
    * are likewise excluded here by the slot grouping emitting a null
    * slot no lookup clamps to. */
  def rangeAggregate(points: DataFrame, ptTs: String,
      sums: Seq[(String, Column)],
      intervals: DataFrame, startTs: String, endTs: String,
      slotSeconds: Long, maxSlots: Long = 16000000L,
      broadcastSlots: Long = 4000000L): DataFrame = {
    require(slotSeconds > 0, "slotSeconds must be positive")
    def slotOf(c: Column) = floor(c.cast("timestamp").cast("long") / slotSeconds)
      .cast("long")
    val per = points
      .select(slotOf(col(ptTs)).as("__slot") +:
        sums.map { case (n, e) => e.as(s"__in_$n") }: _*)
      .groupBy(col("__slot"))
      .agg(count(lit(1)).as("__c"),
        sums.map { case (n, _) => sum(col(s"__in_$n")).as(s"__s_$n") }: _*)
      // pinned: the grid-sized partial table feeds the bounds probe AND
      // the dense-grid join; without it the points scan runs twice
      .localCheckpoint()
    // the aggregated sum types (decimal widening, …) read off the
    // partial table's SCHEMA — both output branches cast their zeros
    // and differences to these, so the result schema never depends on
    // whether the points table happened to be empty
    val sumType = sums.map { case (n, _) =>
      n -> per.schema(s"__s_$n").dataType }.toMap
    def zero(n: String) = lit(0L).cast(sumType(n))
    val bounds = per.agg(min(col("__slot")), max(col("__slot"))).head()
    if (bounds.isNullAt(0)) {
      // no points at all: every interval aggregates to zero
      return sums.foldLeft(intervals.withColumn("cnt", lit(0L))) {
        case (d, (n, _)) => d.withColumn(s"sum_$n", zero(n))
      }
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    require(hi - lo + 1 <= maxSlots,
      s"rangeAggregate grid ${hi - lo + 1} slots exceeds maxSlots=$maxSlots — " +
        "coarsen slotSeconds (the grid must stay bounded)")
    val gridSlots = hi - lo + 1
    // dense cumulative grid via a TWO-LEVEL prefix sum: per-block
    // running sums (each window partition is ≤ PrefixBlock rows — no
    // task ever sorts the whole grid) + a broadcast exclusive
    // block-offset table (≤ maxSlots/PrefixBlock rows; that tiny table
    // carries the only partition-less window)
    val grid = points.sparkSession.range(lo, hi + 1).toDF("__slot")
      .join(per, Seq("__slot"), "left")
      .withColumn("__blk",
        floor((col("__slot") - lit(lo)) / lit(PrefixBlock)).cast("long"))
    val wBlk = Window.partitionBy(col("__blk")).orderBy(col("__slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBlk = grid.select(col("__slot") +: col("__blk") +:
      sum(coalesce(col("__c"), lit(0L))).over(wBlk).as("__cc0") +:
      sums.map { case (n, _) =>
        sum(coalesce(col(s"__s_$n"), zero(n))).over(wBlk).as(s"__cs0_$n") }: _*)
    val wOff = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = grid.groupBy(col("__blk"))
      .agg(sum(coalesce(col("__c"), lit(0L))).as("__bc"),
        sums.map { case (n, _) =>
          sum(coalesce(col(s"__s_$n"), zero(n))).as(s"__bs_$n") }: _*)
      .select(col("__blk") +:
        coalesce(sum(col("__bc")).over(wOff), lit(0L)).as("__oc") +:
        sums.map { case (n, _) =>
          coalesce(sum(col(s"__bs_$n")).over(wOff), zero(n)).as(s"__os_$n") }: _*)
    val cum = inBlk.join(broadcast(offs), Seq("__blk"))
      .select(col("__slot") +:
        (col("__cc0") + col("__oc")).as("__cc") +:
        sums.map { case (n, _) =>
          // cast back to the plain sum type: window sums widen decimals
          // per level, and the cumulative total is semantically the
          // same domain as a single sum aggregate
          (col(s"__cs0_$n") + col(s"__os_$n")).cast(sumType(n))
            .as(s"__cs_$n") }: _*)
    def lookup(slotExpr: Column, suffix: String) = {
      val renamed = cum.select(col("__slot").as(s"__slot$suffix") +:
        (col("__cc").as(s"__cc$suffix") +:
          sums.map { case (n, _) => col(s"__cs_$n").as(s"__cs_$n$suffix") }): _*)
      // clamp above hi (C = grand total); a slot below lo finds no grid
      // row and the left join's null coalesces to 0; NULL endpoints are
      // handled by the explicit empty-interval guard below, not here.
      // Past broadcastSlots the lookup is a plain shuffled equi-join on
      // the slot — the intervals shuffle once per endpoint, the points
      // side still never joins at all
      (least(slotExpr, lit(hi)).as(s"__q$suffix"),
        if (gridSlots <= broadcastSlots) broadcast(renamed) else renamed)
    }
    val (qe, cumE) = lookup(col("__pe"), "_e")
    val (qs, cumS) = lookup(col("__ps") - 1, "_s")
    val joined = intervals
      .withColumn("__ps", slotOf(col(startTs)))
      .withColumn("__pe", slotOf(col(endTs)))
      .withColumn("__q_e", qe).withColumn("__q_s", qs)
      .join(cumE, col("__q_e") === col("__slot_e"), "left")
      .join(cumS, col("__q_s") === col("__slot_s"), "left")
    // an interval with a NULL endpoint, or a reversed one (start > end),
    // contains no points under intervalJoin's predicate — emit explicit
    // zeros instead of trusting the clamped lookups' difference (least()
    // skips NULLs, so a null endpoint would silently clamp to hi)
    val emptyIval = col("__ps").isNull || col("__pe").isNull ||
      col("__ps") > col("__pe")
    val out = joined.withColumn("cnt",
      when(emptyIval, lit(0L)).otherwise(
        coalesce(col("__cc_e"), lit(0L)) - coalesce(col("__cc_s"), lit(0L))))
    sums.foldLeft(out) { case (d, (n, _)) =>
      d.withColumn(s"sum_$n",
        when(emptyIval, zero(n)).otherwise(
          coalesce(col(s"__cs_${n}_e"), zero(n)) -
            coalesce(col(s"__cs_${n}_s"), zero(n))).cast(sumType(n)))
    }.drop(Seq("__ps", "__pe", "__q_e", "__q_s", "__slot_e", "__slot_s",
      "__cc_e", "__cc_s") ++
      sums.flatMap { case (n, _) => Seq(s"__cs_${n}_e", s"__cs_${n}_s") }: _*)
  }

  /** Interval × interval OVERLAP join (closed intervals: pairs with
    * `lStart ≤ rEnd AND rStart ≤ lEnd`) — the two-sided sibling of
    * [[intervalJoin]], and the operator behind "which sessions overlap
    * which outages / campaigns / maintenance windows" questions.
    *
    * Same slotting trick on BOTH sides: each interval replicates to its
    * ⌈len/slot⌉+1 covering slots, the join is a plain equi-join on the
    * slot (hash-partitioned, AQE-skew-splittable — never a nested-loop
    * range join), and the exact predicate filters inside the joined
    * slot. A pair sharing several slots would emit once per shared
    * slot, so the match is kept only in the FIRST slot both intervals
    * cover — `max(slot(lStart), slot(rStart))` — which dedupes exactly
    * WITHOUT a distinct (no second shuffle over the output).
    * Candidate volume ≈ true output × (1 + both sides' len/slot
    * near-miss factor); slot ≈ the larger median length keeps it ≤ ~3×.
    * Columns must be disjointly named across the two inputs. */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      slotSeconds: Long): DataFrame = {
    require(slotSeconds > 0, "slotSeconds must be positive")
    def slotOf(c: Column) = floor(c.cast("timestamp").cast("long") / slotSeconds)
    def slotted(df: DataFrame, s: String, e: String) = df.withColumn("__slot",
      explode(sequence(slotOf(col(s)), slotOf(col(e)))))
    slotted(left, lStart, lEnd).join(slotted(right, rStart, rEnd), Seq("__slot"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__slot") === greatest(slotOf(col(lStart)), slotOf(col(rStart))))
      .drop("__slot")
  }

  /** [[intervalOverlapJoin]] with the slot auto-derived as the larger of
    * the two sides' median interval lengths — bounding the replication
    * factor of BOTH sides at ≈ 2–3 without a knob. */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String): DataFrame =
    intervalOverlapJoin(left, lStart, lEnd, right, rStart, rEnd,
      math.max(autoSlotSeconds(left, lStart, lEnd),
        autoSlotSeconds(right, rStart, rEnd)))

  /** Per-left-interval COUNT of overlapping right intervals — the
    * near-linear fast path replacing [[intervalOverlapJoin]]+groupBy
    * when the query wants only counts (the ts04 shape) and no per-pair
    * attributes; the overlap sibling of [[rangeAggregate]]. Pair-free
    * by the stabbing decomposition
    *
    *   #overlap(l) = #{r : slot(rStart) ≤ slot(lEnd)}
    *               − #{r : slot(rEnd)   <  slot(lStart)}
    *
    * (valid because every well-formed r with rEnd < lStart also has
    * rStart ≤ lEnd), which needs only TWO cumulative counts over one
    * slot grid — right STARTS and right ENDS — built in a single
    * aggregation pass over the right table and answered per left row
    * by two grid lookups. Same machinery as rangeAggregate: two-level
    * prefix sum (no single task ever holds the grid), broadcast
    * lookups while the grid is ≤ `broadcastSlots`, a shuffled
    * equi-join of the left side beyond; the right side is never
    * joined, only aggregated, and no pair is ever materialized.
    *
    * Contracts (mirroring rangeAggregate): slot-granularity semantics,
    * exact for slot-aligned endpoints (DATE columns on a day grid).
    * Right rows with a NULL endpoint or rStart > rEnd are EXCLUDED
    * (the decomposition cannot count malformed intervals); left rows
    * with a NULL endpoint or lStart > lEnd emit cnt = 0. Output: every
    * left row + `cnt` (left-style; filter cnt > 0 for the inner-join
    * shape of intervalOverlapJoin+groupBy). */
  def overlapCount(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      slotSeconds: Long, maxSlots: Long = 16000000L,
      broadcastSlots: Long = 4000000L): DataFrame = {
    require(slotSeconds > 0, "slotSeconds must be positive")
    def slotOf(c: Column) = floor(c.cast("timestamp").cast("long") / slotSeconds)
      .cast("long")
    // ONE pass over the right table: per-slot counts of starts and ends
    // (each well-formed right row contributes one start and one end)
    val per = right
      .select(slotOf(col(rStart)).as("__ss"), slotOf(col(rEnd)).as("__es"))
      .filter(col("__ss").isNotNull && col("__es").isNotNull &&
        col("__ss") <= col("__es"))
      .select(explode(array(
        struct(col("__ss").as("__slot"), lit(1L).as("__is_s")),
        struct(col("__es").as("__slot"), lit(0L).as("__is_s")))).as("x"))
      .select(col("x.__slot").as("__slot"), col("x.__is_s").as("__is_s"))
      .groupBy(col("__slot"))
      .agg(sum(col("__is_s")).as("__cs0"),
        sum(lit(1L) - col("__is_s")).as("__ce0"))
      // pinned: feeds the bounds probe and the dense-grid join
      .localCheckpoint()
    val bounds = per.agg(min(col("__slot")), max(col("__slot"))).head()
    if (bounds.isNullAt(0)) return left.withColumn("cnt", lit(0L))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    require(hi - lo + 1 <= maxSlots,
      s"overlapCount grid ${hi - lo + 1} slots exceeds maxSlots=$maxSlots — " +
        "coarsen slotSeconds (the grid must stay bounded)")
    val gridSlots = hi - lo + 1
    // two-level prefix sum over the dense grid, two running counts at
    // once (see rangeAggregate for the block/offset design)
    val grid = right.sparkSession.range(lo, hi + 1).toDF("__slot")
      .join(per, Seq("__slot"), "left")
      .withColumn("__blk",
        floor((col("__slot") - lit(lo)) / lit(PrefixBlock)).cast("long"))
    val wBlk = Window.partitionBy(col("__blk")).orderBy(col("__slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBlk = grid.select(col("__slot"), col("__blk"),
      sum(coalesce(col("__cs0"), lit(0L))).over(wBlk).as("__ics"),
      sum(coalesce(col("__ce0"), lit(0L))).over(wBlk).as("__ice"))
    val wOff = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = grid.groupBy(col("__blk"))
      .agg(sum(coalesce(col("__cs0"), lit(0L))).as("__bs"),
        sum(coalesce(col("__ce0"), lit(0L))).as("__be"))
      .select(col("__blk"),
        coalesce(sum(col("__bs")).over(wOff), lit(0L)).as("__os"),
        coalesce(sum(col("__be")).over(wOff), lit(0L)).as("__oe"))
    val cum = inBlk.join(broadcast(offs), Seq("__blk"))
      .select(col("__slot"), (col("__ics") + col("__os")).as("__ccs"),
        (col("__ice") + col("__oe")).as("__cce"))
    def lookup(suffix: String) = {
      val renamed = cum.select(col("__slot").as(s"__slot$suffix"),
        col("__ccs").as(s"__ccs$suffix"), col("__cce").as(s"__cce$suffix"))
      if (gridSlots <= broadcastSlots) broadcast(renamed) else renamed
    }
    val joined = left
      .withColumn("__ps", slotOf(col(lStart)))
      .withColumn("__pe", slotOf(col(lEnd)))
      .withColumn("__q_e", least(col("__pe"), lit(hi)))
      .withColumn("__q_s", least(col("__ps") - 1, lit(hi)))
      .join(lookup("_e"), col("__q_e") === col("__slot_e"), "left")
      .join(lookup("_s"), col("__q_s") === col("__slot_s"), "left")
    val emptyIval = col("__ps").isNull || col("__pe").isNull ||
      col("__ps") > col("__pe")
    joined.withColumn("cnt",
        when(emptyIval, lit(0L)).otherwise(
          // starts ≤ slot(lEnd), minus ends strictly before slot(lStart)
          coalesce(col("__ccs_e"), lit(0L)) - coalesce(col("__cce_s"), lit(0L))))
      .drop("__ps", "__pe", "__q_e", "__q_s", "__slot_e", "__slot_s",
        "__ccs_e", "__cce_e", "__ccs_s", "__cce_s")
  }
}
