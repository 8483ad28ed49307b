package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event analytics: ordered funnels and cohort retention. Both are
  * one-Exchange plans — every per-user computation rides a single
  * hash-partition by the user key, so at 100 TB the cost is one shuffle
  * of the event log (plus the scan), never a per-step self-join. */
object EventAnalytics {

  /** Strict ordered funnel: for each user, step i counts only if an event
    * of `steps(i)` occurred strictly AFTER the user's qualifying time for
    * step i-1 (first match, earliest-first). All steps are window minima
    * over ONE partitioning of the log by user — step i's qualifying time
    * is a per-user constant column the next window min conditions on, so
    * Catalyst stacks the Window operators over a single Exchange.
    *
    * Output: one row per step — (step index 1-based, step name, number of
    * users whose funnel reached it). */
  def funnel(events: DataFrame, userId: Column, eventType: Column,
      ts: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("__uid"))
    val base = events.select(userId.as("__uid"), eventType.as("__et"), ts.as("__ts"))
    val withTimes = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond = if (i == 0) col("__et") === step
        else col("__et") === step && col("__ts") > col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(cond, col("__ts"))).over(w))
    }
    val perUser = withTimes.groupBy(col("__uid"))
      .agg(steps.indices.map(i => max(col(s"__t$i")).as(s"t$i")).head,
        steps.indices.map(i => max(col(s"__t$i")).as(s"t$i")).tail: _*)
    val counts = perUser.agg(
      count(col("t0")).as("c0"),
      steps.indices.tail.map(i => count(col(s"t$i")).as(s"c$i")): _*)
    counts.select(steps.indices.map(i =>
        struct(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
          col(s"c$i").as("n_users")).as(s"s$i")): _*)
      .select(explode(array(steps.indices.map(i => col(s"s$i")): _*)).as("s"))
      .select(col("s.step"), col("s.step_name"), col("s.n_users"))
  }

  /** Day-grain cohort retention: users cohort by their first-activity
    * day; for each cohort day, how many distinct users were active again
    * exactly `offsetDays` later. ONE shuffle of the log: the per-user
    * stage aggregates a `collect_set` of active days — bounded by the
    * calendar span, not the event count, and deduplicated map-side by
    * the partial aggregate — then cohort = the set's min and retention
    * is a set-membership test; the final cohort-day aggregate handles
    * rows numbering one per user.
    *
    * Output: (cohort_day DATE, n_users, n_retained). */
  def retention(events: DataFrame, userId: Column, ts: Column,
      offsetDays: Int): DataFrame = {
    val perUser = events.select(userId.as("__uid"), to_date(ts).as("__day"))
      .groupBy(col("__uid")).agg(collect_set(col("__day")).as("__days"))
      .select(array_min(col("__days")).as("cohort_day"),
        array_contains(col("__days"),
          date_add(array_min(col("__days")), offsetDays)).as("retained"))
    perUser.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        count(when(col("retained"), 1)).as("n_retained"))
  }

  /** RFM segmentation: recency / frequency / monetary quartile scores
    * per customer — the classic behavioral segmentation (and, in a
    * data-curation setting, the shape of any "score entities by how
    * recently/often/heavily they appear" roll-up).
    *
    * Determinism: every `ntile` ordering carries the entity id as the
    * final tie-break (ntile ties are otherwise engine-placement-
    * dependent), and monetary sums in DECIMAL(18,2) so the total is
    * addition-order-independent (the ntile ordering keys on the exact
    * decimal; only the OUTPUT column is cast to double, the portable
    * cross-engine representation). Scale shape: one map-side-combined
    * per-entity aggregate, then three entity-sized window passes; at
    * true scale swap ntile for percentile_approx thresholds
    * (mergeable, no global sort) — the quartile boundaries are the only
    * global state.
    *
    * Output: (cust, rec_days, freq, monetary, r, f, m). Higher score =
    * better (more recent / more orders / more spend). */
  def rfm(orders: DataFrame, custId: Column, orderTs: Column,
      amount: Column, asOf: String, buckets: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = orders.select(custId.as("cust"), orderTs.as("__ts"),
        amount.cast("decimal(18,2)").as("__amt"))
      .groupBy(col("cust"))
      .agg(datediff(lit(asOf).cast("date"), max(to_date(col("__ts"))))
          .as("rec_days"),
        count(lit(1)).as("freq"), sum(col("__amt")).as("monetary"))
    per.select(col("cust"), col("rec_days"), col("freq"),
      col("monetary").cast("double").as("monetary"),
      ntile(buckets).over(Window.orderBy(col("rec_days").desc, col("cust").asc))
        .as("r"),
      ntile(buckets).over(Window.orderBy(col("freq").asc, col("cust").asc))
        .as("f"),
      ntile(buckets).over(Window.orderBy(col("monetary").asc, col("cust").asc))
        .as("m"))
  }

  /** Per-user inter-event gap statistics: lag-based deltas over each
    * user's event sequence (ts, then event id as the deterministic
    * tie-break for simultaneous events), aggregated to
    * (n_gaps, avg_gap_s 4 dp, max_gap_s) per user. The engagement-decay
    * / session-design diagnostic; one shuffle on the user partitioning,
    * gap math inside the window stage. */
  def eventGaps(events: DataFrame, userId: Column, ts: Column,
      eventId: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__u")).orderBy(col("__t").asc, col("__e").asc)
    events.select(userId.as("__u"), ts.as("__t"), eventId.as("__e"))
      .select(col("__u"),
        (unix_timestamp(col("__t")) - unix_timestamp(lag(col("__t"), 1).over(w)))
          .as("gap"))
      .filter(col("gap").isNotNull)
      .groupBy(col("__u").as("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        (floor(sum(col("gap")) / count(lit(1)) * 10000 + 0.5) / 10000)
          .as("avg_gap_s"),
        max(col("gap")).as("max_gap_s"))
  }

  /** Per-type daily-volume trend line by exact-integer OLS: slope and
    * intercept computed from Σx, Σy, Σxy, Σx² where x = day index and
    * y = the day's event count — ALL integer sums, so the moments are
    * exact in any summation order (the a08 exact-moment discipline with
    * no decimals needed at all); the only float ops are two final
    * divisions on identical inputs, 6-dp floor-rounded. One count
    * aggregate + one per-type reduce; output is one row per type. */
  def dailyTrend(events: DataFrame, ts: Column, eventType: Column,
      epoch: String = "2024-01-01"): DataFrame = {
    val daily = events
      .select(eventType.as("etype"), to_date(ts).as("__day"))
      .groupBy(col("etype"), col("__day")).agg(count(lit(1)).as("y"))
      .select(col("etype"),
        datediff(col("__day"), lit(epoch).cast("date")).cast("long").as("x"),
        col("y"))
    def r6(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000
    daily.groupBy(col("etype"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("etype"), col("n"),
        r6((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"),
        r6((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("intercept"))
  }

  /** Truncated EWMA smoothing of per-type daily volumes: the smoothed
    * series every capacity forecast / anomaly baseline starts from.
    * ewma(d) = Σ_{i=0..horizon−1} α(1−α)^i · y(d−i), the
    * exponentially-weighted moving average truncated at `horizon`
    * observed days (missing history contributes 0).
    *
    * Determinism: the α(1−α)^i coefficients are computed ONCE driver-
    * side and planted as literals (also into the oracle text — pow's
    * last ulp is not portable), and the sum is an explicit fixed-order
    * chain of `horizon` lag terms, so both engines execute the
    * identical IEEE expression. Lags ride one per-type window
    * partitioning; 6-dp floor-rounded output. */
  def ewmaDaily(events: DataFrame, ts: Column, eventType: Column,
      alpha: Double, horizon: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    require(horizon >= 1 && horizon <= 64, s"horizon out of [1,64]: $horizon")
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(eventType.as("etype"), to_date(ts).as("day"))
      .groupBy(col("etype"), col("day")).agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("etype")).orderBy(col("day").asc)
    val terms = ewmaCoefs(alpha, horizon).zipWithIndex.map { case (c, i) =>
      lit(c) * coalesce(lag(col("y"), i).over(w), lit(0L)).cast("double")
    }
    daily.select(col("etype"), col("day"),
      (floor(terms.reduceLeft(_ + _) * 1000000 + 0.5) / 1000000).as("ewma"))
  }

  /** The literal EWMA coefficients — shared with the oracle text so
    * both engines multiply bit-identical constants. */
  def ewmaCoefs(alpha: Double, horizon: Int): Seq[Double] =
    (0 until horizon).map(i => alpha * math.pow(1 - alpha, i))

  /** CUSUM mean-shift detection on per-type daily volumes, in EXACT
    * integer arithmetic: the recurrence S_i = max(0, S_{i−1} + x_i − μ − k)
    * has the closed form S_i = P_i − min_{j≤i} P_j (P = prefix sums of
    * the deviations, P_0 = 0), and scaling every term by n_days clears
    * the rational mean μ = total/n — so `s_scaled` = n·S_i is a pure
    * integer window computation (prefix sum + running min), restatable
    * bit-exactly by any engine with no float anywhere. Alarm when the
    * cumulative excess S_i exceeds `h` counts (s_scaled > h·n).
    *
    * Days are densified over the GLOBAL [min,max] span (a silent day is
    * an observation of 0 — precisely what a volume-drop alarm must see).
    * One shuffle to daily counts, windows ride one per-type
    * partitioning; the dense grid is span-bounded (3650 rows per type
    * per decade), never event-bounded. `k` is the integer per-day
    * allowance (0 = plain CUSUM against the mean). */
  def cusumShift(events: DataFrame, ts: Column, eventType: Column,
      k: Long = 0L, h: Long = 10L): DataFrame = {
    require(k >= 0, s"negative allowance k=$k")
    require(h >= 1, s"alarm threshold h must be >= 1, got $h")
    import org.apache.spark.sql.expressions.Window
    val byDay = events.select(eventType.as("etype"), to_date(ts).as("day"))
      .groupBy(col("etype"), col("day")).agg(count(lit(1)).as("x"))
    val span = byDay.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = byDay.select(col("etype")).distinct()
      .crossJoin(broadcast(span))
      .select(col("etype"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val dense = grid.join(byDay, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"), coalesce(col("x"), lit(0L)).as("x"))
    val tot = dense.groupBy(col("etype"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("tx"))
    val w = Window.partitionBy(col("etype")).orderBy(col("day").asc)
    val wi = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = dense.join(broadcast(tot), "etype")
      .withColumn("pp",
        col("n") * sum(col("x")).over(wi)
          - row_number().over(w).cast("long") * (col("tx") + lit(k) * col("n")))
    p.select(col("etype"), col("day"), col("x"),
      (col("pp") - least(lit(0L), min(col("pp")).over(wi))).as("s_scaled"),
      ((col("pp") - least(lit(0L), min(col("pp")).over(wi))) > lit(h) * col("n"))
        .as("alarm"))
  }

  /** MAD (median absolute deviation) outlier days per event type — the
    * robust twin of a z-score flag: one spike day inflates a stddev and
    * hides its neighbors; the MAD is as spike-proof as the median
    * (50% breakdown point). Over the densified daily grid (gap days are
    * hard zeros): med = median volume, absdev = |v − med|,
    * mad = median absdev, score = absdev/mad, outlier when score
    * exceeds `cutoff` (3.5 ≈ the classic modified-z threshold 0.6745·x).
    *
    * Exactness by construction, no rounding recipe needed: volumes are
    * integers, both medians are two-middle averages BY SORTED POSITION
    * (ties interchangeable by value), so med is an exact multiple of
    * 0.5, absdev of 0.5, mad of 0.25 — all exact binary doubles; the
    * one inexact op is the final score division, identical IEEE in both
    * engines before the 6-dp floor. Degenerate mad = 0 (constant
    * series): score is NULL and any non-zero deviation is an outlier.
    *
    * Scale shape: everything after the daily collapse is span-bounded
    * metadata; the two rank passes are windows over the tiny daily
    * table, partitioned by event type. */
  def madOutliers(events: DataFrame, ts: Column, eventType: Column,
      cutoff: Double = 3.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events.select(eventType.as("etype"), to_date(ts).as("day"))
      .groupBy(col("etype"), col("day")).agg(count(lit(1)).as("v"))
    val span = byDay.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dense = byDay.select(col("etype")).distinct()
      .crossJoin(broadcast(span))
      .select(col("etype"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(byDay, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"), coalesce(col("v"), lit(0L)).as("v"))
    val wE = Window.partitionBy(col("etype"))
    def medianOf(df: DataFrame, value: Column, out: String): DataFrame = {
      val lo = floor((col("__n") + 1) / 2).cast("long")
      val hi = floor((col("__n") + 2) / 2).cast("long")
      df.withColumn("__rn", row_number().over(wE.orderBy(value)))
        .withColumn("__n", count(lit(1)).over(wE))
        .filter(col("__rn") === lo || col("__rn") === hi)
        .groupBy(col("etype")).agg(avg(value).as(out))
    }
    val med = medianOf(dense, col("v"), "med")
    val withDev = dense.join(broadcast(med), "etype")
      .withColumn("absdev", abs(col("v") - col("med")))
    val mad = medianOf(withDev, col("absdev"), "mad")
    withDev.join(broadcast(mad), "etype")
      .select(col("etype"), col("day"), col("v"), col("med"), col("absdev"),
        when(col("mad") > 0.0,
          floor(col("absdev") / col("mad") * 1000000 + 0.5) / 1000000)
          .as("score6"),
        when(col("mad") > 0.0, col("absdev") / col("mad") > cutoff)
          .otherwise(col("absdev") > 0.0).as("outlier"))
  }

  /** Last-touch attribution: each conversion event joined to the most
    * recent PRIOR touch event of the same user (strictly before —
    * `rowsBetween(…, -1)` — so a simultaneous touch/conversion pair
    * never self-attributes). One shuffle on the user partitioning; the
    * window max over a CASE is the whole mechanism, no self-join.
    * Output: (user_id, conv_event_id, conv_ts, touch_ts, gap_s) with
    * NULL touch for unattributed conversions. */
  def lastTouchAttribution(events: DataFrame, userId: Column, eventType: Column,
      ts: Column, eventId: Column, convType: String, touchType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__e").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events.select(userId.as("__u"), eventType.as("__ty"), ts.as("__t"),
        eventId.as("__e"))
      .withColumn("touch_ts",
        max(when(col("__ty") === touchType, col("__t"))).over(w))
      .filter(col("__ty") === convType)
      .select(col("__u").as("user_id"), col("__e").as("conv_event_id"),
        col("__t").as("conv_ts"), col("touch_ts"),
        (unix_timestamp(col("__t")) - unix_timestamp(col("touch_ts")))
          .as("gap_s"))
  }

  /** Multi-touch attribution: every conversion's credit is split over
    * the touch events of its journey (the touches since the user's
    * previous conversion) under two standard schemes at once —
    * `linear` (1/k each) and `u-shaped` (40% first, 40% last, 20%
    * spread over the middle; 100%/50-50 for 1-/2-touch journeys).
    *
    * Journey assembly is windows only, no self-join: journey id = the
    * running count of PRIOR conversions in the user's (ts, event-id)
    * order, so a conversion closes exactly the journey its preceding
    * touches accumulated into, and trailing touches (after the last
    * conversion) drop out via the inner join against closed journeys.
    * Two exchanges total (user partitioning, then the channel
    * aggregate). Per-touch credits are 6-dp-floored and summed as
    * exact DECIMAL(20,6) — partition-layout-independent and exactly
    * restatable.
    *
    * Output: (channel, n_touches, linear6, u6). */
  def multiTouchAttribution(events: DataFrame, userId: Column, ts: Column,
      eventId: Column, eventType: Column, convType: String,
      touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      s"touch types must be non-empty and exclude the conversion type")
    val wu = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__e").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events.select(userId.as("__u"), ts.as("__t"),
        eventId.as("__e"), eventType.as("__ty"))
      .withColumn("jid", coalesce(
        sum(when(col("__ty") === convType, 1L).otherwise(0L)).over(wu),
        lit(0L)))
    val touches = base.filter(col("__ty").isin(touchTypes: _*))
    val convs = base.filter(col("__ty") === convType)
      .select(col("__u"), col("jid")).distinct()
    val wj = Window.partitionBy(col("__u"), col("jid"))
    val wr = wj.orderBy(col("__t").asc, col("__e").asc)
    val scored = touches.join(convs, Seq("__u", "jid"))
      .withColumn("r", row_number().over(wr))
      .withColumn("k", count(lit(1)).over(wj))
    def q6(c: Column) =
      (floor(c * 1e6 + 0.5) / 1e6).cast("decimal(20,6)")
    val linear = q6(lit(1.0) / col("k").cast("double"))
    val u = q6(when(col("k") === 1, 1.0)
      .when(col("k") === 2, 0.5)
      .otherwise(when(col("r") === 1 || col("r") === col("k"), 0.4)
        .otherwise(lit(0.2) / (col("k") - 2).cast("double"))))
    scored.select(col("__ty").as("channel"), linear.as("lc"), u.as("uc"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("lc")).cast("double").as("linear6"),
        sum(col("uc")).cast("double").as("u6"))
  }

  /** Hourly event-volume anomaly scores per type: each hour's count is
    * z-scored against the TRAILING `window` hours — the
    * data-quality/incident monitor over an ingest log (a collapsed
    * source or a crawler loop shows up as |z| spikes). Hour buckets are
    * DENSIFIED per type over the type's own [min, max] span (a zero
    * hour is a real observation — skipping it biases μ and hides
    * outages), and μ/σ come from exact integer Σc and Σc² window sums —
    * the [[graft.ops.Pipeline.zscoreByGroup]] determinism contract on a
    * rolling frame.
    *
    * Plan: one count aggregate, a grid explode off per-type min/max,
    * and two windows sharing the type partitioning. Grid rows are
    * span/hour per type, independent of event volume.
    *
    * Output: (etype, bucket, n_events, z) — z null until a full
    * trailing window exists or when the window has zero variance. */
  def hourlyAnomalies(events: DataFrame, ts: Column, eventType: Column,
      window: Int = 24): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val b = events.select(eventType.as("etype"),
      floor(unix_micros(ts) / 3600000000L).as("bucket"))
    val counts = b.groupBy(col("etype"), col("bucket"))
      .agg(count(lit(1)).as("c0"))
    val grid = counts.groupBy(col("etype"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("etype"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val dense = grid.join(counts, Seq("etype", "bucket"), "left")
      .select(col("etype"), col("bucket"), coalesce(col("c0"), lit(0L)).as("c"))
    val w = Window.partitionBy(col("etype")).orderBy(col("bucket"))
      .rowsBetween(-window, -1)
    val n = count(lit(1)).over(w).cast("double")
    val s = sum(col("c")).over(w).cast("double")
    val ss = sum(col("c") * col("c")).over(w).cast("double")
    val variance = (ss - s * s / n) / (n - 1)
    dense.select(col("etype"), col("bucket"), col("c").as("n_events"),
      when(n === window && variance > 0,
        floor((col("c") - s / n) / sqrt(variance) * 10000 + 0.5) / 10000).as("z"))
  }

  /** Resample an irregular per-key event stream onto a regular time grid
    * with forward fill — the feature-store alignment step (join "latest
    * sensor/price/score as of each hour" without a per-grid-point as-of
    * join). Each key's grid spans its own [min, max] observation window
    * at `step` seconds starting from the epoch-aligned truncation of the
    * first event.
    *
    * Plan: ONE shuffle of the log by key. Per (key, bucket) the last
    * observation is picked by a row_number window (ordered by ts then
    * `tieBreak` — deterministic under equal timestamps); the grid is a
    * `sequence` explode off the per-key min/max aggregate (grid rows,
    * not event rows); the forward fill is a `last(ignoreNulls)` running
    * window over the grid — all three stages share the key partitioning,
    * so Catalyst plans a single Exchange. Grid size is bounded by
    * span/step per key, independent of event volume.
    *
    * Output: (key, grid_ts, value, observed) — `value` null only before
    * a key's first observation (impossible here since grids start at an
    * observation), `observed` true on buckets with a real event. */
  def resampleFfill(events: DataFrame, key: Column, ts: Column, value: Column,
      tieBreak: Column, stepSeconds: Long = 3600L): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val step = lit(stepSeconds)
    // epoch-aligned bucket index of each event
    // the ONE corpus shuffle: everything downstream — the per-bucket pick
    // window (clustered on (k, bucket) ⊇ k), the per-key grid aggregate,
    // the grid⋈pick join, and the fill window — is satisfied by this
    // k-partitioning, so Catalyst inserts no further Exchange (spec-
    // guarded; AQE dedups the two consumers into a ReusedExchange)
    val base = events.select(key.as("k"), ts.as("ts"), value.as("v"),
        tieBreak.as("tb"))
      .withColumn("bucket", floor(unix_micros(col("ts")) / (step * 1000000L)))
      .repartition(col("k"))
    val wPick = Window.partitionBy(col("k"), col("bucket"))
      .orderBy(col("ts").desc, col("tb").desc)
    val perBucket = base
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("k"), col("bucket"), col("v"))
    val grid = base.groupBy(col("k"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("k"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val wFill = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"), col("v"))
      .withColumn("value", last(col("v"), ignoreNulls = true).over(wFill))
      .select(col("k").as("key"),
        timestamp_micros(col("bucket") * step * 1000000L).as("grid_ts"),
        col("value"), col("v").isNotNull.as("observed"))
  }

  /** Per-key UNION length of (possibly overlapping) intervals — "how
    * much wall-clock was this user actually active", where naively
    * summing durations double-counts overlaps. Classic gaps-and-islands:
    * an interval starts a new island when its start exceeds the running
    * max end of everything before it (per key, start-ordered); island
    * length = max(end) − min(start); the answer is the per-key island
    * sum. Two windows and one aggregate, all partitioned by the key —
    * ONE shuffle, integer (micros) arithmetic end to end. Intervals are
    * half-open [start, end); a touching pair (end == next start) merges,
    * matching the half-open reading that they tile without a gap. */
  def intervalUnionLength(df: DataFrame, key: Column, start: Column,
      end: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    val base = df.select(key.as("k"), start.cast("long").as("s"), end.cast("long").as("e"))
    base
      .withColumn("prevMaxE", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("newIsland",
        when(col("prevMaxE").isNull || col("s") > col("prevMaxE"), 1).otherwise(0))
      .withColumn("island", sum(col("newIsland")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k"), col("island"))
      .agg((max(col("e")) - min(col("s"))).as("len"))
      .groupBy(col("k").as("key"))
      .agg(count(lit(1)).as("n_islands"), sum(col("len")).as("covered"))
  }

  /** First-order Markov transition matrix over each user's event-type
    * sequence: count of each (from_type, to_type) adjacency plus the
    * row-normalized transition probability — the behavioral model behind
    * next-action prediction and anomalous-flow detection.
    *
    * Shape at scale: adjacent pairs come from ONE `lead` window over the
    * log's per-user partitioning (fully tie-broken: ts, then event id),
    * then the pair aggregate map-side-combines down to |types|² cells —
    * metadata-sized however large the log — so the normalizing window
    * over `from_type` runs on the cell table, not the log. p6 is the
    * floor-6dp double of n/row_total: exact integers in, one identical
    * double expression out on every engine. */
  def transitionMatrix(events: DataFrame, userId: Column, eventType: Column,
      ts: Column, eventId: Column): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__t").asc, col("__e").asc)
    val pairs = events
      .select(userId.as("__u"), eventType.as("from_type"),
        ts.as("__t"), eventId.as("__e"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val cells = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = Window.partitionBy(col("from_type"))
    cells.select(col("from_type"), col("to_type"), col("n"),
      (floor(col("n").cast("double") / sum(col("n")).over(rowTot).cast("double")
        * 1000000 + 0.5) / 1000000).as("p6"))
  }

  /** Autocorrelation of the daily event volume at lags 1..`maxLag` —
    * the seasonality detector (a weekly cycle shows as a peak at lag 7).
    * The series is the COMPLETE day grid over the observed span with
    * absent days as hard zeros (an absent day is a real 0-volume
    * observation; skipping it would splice non-adjacent days together).
    *
    * Scale shape: the log collapses to day-level counts first (map-side
    * combine; the series is span-sized, i.e. metadata next to the log),
    * so the lag self-join and everything after it runs on ≤ a few
    * thousand rows regardless of input volume. Each lag's Pearson r
    * comes from EXACT integer moments (decimal-summed Σx Σy Σxy Σx² Σy²
    * — the a08 recipe), so the result is addition-order-independent;
    * the only float math is one identical final expression per lag.
    * Output: (lag, n_pairs, corr6). */
  def dailyVolumeAcf(events: DataFrame, ts: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val daily = events.select(to_date(ts).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("v"))
    val grid = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val series = grid.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("v"), lit(0L)).as("v"))
    val lags = events.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    val dec = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0))
    val m = series.select(col("day").as("dx"), col("v").as("x"))
      .crossJoin(broadcast(lags))
      .join(series.select(col("day").as("dy"), col("v").as("y")),
        date_add(col("dx"), col("lag")) === col("dy"))
      .groupBy(col("lag")).agg(
        count(lit(1)).as("n_pairs"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x") * col("y"))).as("sxy"),
        sum(dec(col("x") * col("x"))).as("sxx"),
        sum(dec(col("y") * col("y"))).as("syy"))
    val nD = col("n_pairs").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col("lag"), col("n_pairs"),
      (floor(cov / sqrt(vx * vy) * 1000000 + 0.5) / 1000000).as("corr6"))
  }

  /** Theil-Sen robust daily trend: the MEDIAN of all pairwise slopes
    * (v_j − v_i)/(day_j − day_i) over the complete daily-volume grid —
    * the outlier-robust complement to the ts10 OLS trend (one traffic
    * spike shifts an OLS slope arbitrarily; it moves the pairwise-slope
    * median not at all until spikes are half the data, the 29.3%
    * breakdown point).
    *
    * Scale shape: the log collapses to day counts first, so the O(n²)
    * pair table is span-bounded (a YEAR is ~66k pairs — metadata), and
    * the median runs on that tiny table. Exactness: every slope is one
    * double division of exact integers, so both engines materialize the
    * identical slope multiset; the median picks by sorted position
    * (positions inside an equal-value tie class are interchangeable BY
    * VALUE), averaging the two middles on even counts, 6-dp floored.
    * Output: one row (n_days, n_pairs, slope6). */
  /** Holt's double exponential smoothing (level + trend) over the
    * densified daily-volume grid — the forecasting/trend-extraction
    * companion to [[ewmaDaily]] that also tracks SLOPE, so a steadily
    * growing ingest doesn't read as a permanent "above forecast"
    * anomaly. l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}; init l_0 = y_0, b_0 = y_1−y_0.
    *
    * Scale shape: the log collapses to the day grid FIRST (one keyed
    * aggregate, map-side combined); the inherently-sequential recursion
    * folds over the span-bounded grid on the driver (the ts13–ts18
    * contract: days, not rows). Cross-engine exactness: states are
    * 8-dp-floored per step, multipliers spelled as (1−α)/(1−β)
    * SUBTRACTIONS in both engines (the literal 0.7 and computed 1−0.3
    * doubles differ in the last ulp), so a recursive-CTE twin restates
    * every step. Output: (day, v, level8, trend8) per grid day. */
  def holtLinearDaily(events: DataFrame, ts: Column, alpha: Double = 0.3,
      beta: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"alpha/beta out of (0,1): $alpha $beta")
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events.select(to_date(ts).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("v"))
    val grid = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("v"), lit(0L)).as("v"))
      .orderBy(col("day"))
      .as[(java.sql.Date, Long)].collect()
    require(grid.length >= 2, s"need >= 2 grid days: ${grid.length}")
    def q8(x: Double) = math.floor(x * 1e8 + 0.5) / 1e8
    var l = grid(0)._2.toDouble
    var b = q8((grid(1)._2 - grid(0)._2).toDouble)
    val out = Vector.newBuilder[(java.sql.Date, Long, Double, Double)]
    out += ((grid(0)._1, grid(0)._2, l, b))
    for ((day, v) <- grid.drop(1)) {
      val lNew = q8(alpha * v.toDouble + (1.0 - alpha) * (l + b))
      b = q8(beta * (lNew - l) + (1.0 - beta) * b)
      l = lNew
      out += ((day, v, l, b))
    }
    out.result().toDF("day", "v", "level8", "trend8")
  }

  /** Holt-Winters ADDITIVE seasonal smoothing of the daily volume
    * (weekly season, m = 7) — [[holtLinearDaily]] plus the seasonal
    * recurrence real traffic needs (a weekend dip reads as trend change
    * to plain Holt):
    *   l_t = α(y_t − s_{t−7}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(y_t − l_t) + (1−γ)s_{t−7}
    * Textbook init from the first two weeks: l = mean(week 1),
    * b = (mean(week 2) − mean(week 1))/7, s_i = y_i − l for the first
    * seven days (needs ≥ 14 grid days — enforced loudly).
    *
    * Same determinism/scale contract as [[holtLinearDaily]]: the day
    * collapse is the one distributed aggregate; the sequential
    * recursion folds over the span-bounded grid driver-side with every
    * state 8-dp floored per step, so the oracle replays it exactly
    * (recursive CTE carrying the rolling 7-slot seasonal list).
    * Output (days 8+): (day, v, level8, trend8, seasonal8, forecast8)
    * where forecast8 is the one-step-ahead prediction made BEFORE
    * seeing v — the residual v − forecast8 is the anomaly signal. */
  def holtWintersDaily(events: DataFrame, ts: Column, alpha: Double = 0.3,
      beta: Double = 0.1, gamma: Double = 0.2): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1 &&
      gamma > 0 && gamma < 1, s"alpha/beta/gamma out of (0,1): $alpha $beta $gamma")
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events.select(to_date(ts).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("v"))
    val grid = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("v"), lit(0L)).as("v"))
      .orderBy(col("day"))
      .as[(java.sql.Date, Long)].collect()
    require(grid.length >= 14,
      s"Holt-Winters weekly init needs >= 14 grid days: ${grid.length}")
    def q8(x: Double) = math.floor(x * 1e8 + 0.5) / 1e8
    val w1 = grid.slice(0, 7).map(_._2).sum / 7.0
    val w2 = grid.slice(7, 14).map(_._2).sum / 7.0
    var l = q8(w1)
    var b = q8((w2 - w1) / 7.0)
    val seas = scala.collection.mutable.Queue(
      grid.slice(0, 7).map(g => q8(g._2 - l)): _*)
    val out = Vector.newBuilder[(java.sql.Date, Long, Double, Double, Double, Double)]
    for ((day, v) <- grid.drop(7)) {
      val sOld = seas.dequeue()
      val f = q8(l + b + sOld)
      val lNew = q8(alpha * (v - sOld) + (1.0 - alpha) * (l + b))
      val bNew = q8(beta * (lNew - l) + (1.0 - beta) * b)
      val sNew = q8(gamma * (v - lNew) + (1.0 - gamma) * sOld)
      l = lNew; b = bNew; seas.enqueue(sNew)
      out += ((day, v, l, b, sNew, f))
    }
    out.result().toDF("day", "v", "level8", "trend8", "seasonal8", "forecast8")
  }

  def theilSenDailyTrend(events: DataFrame, ts: Column): DataFrame = {
    val daily = events.select(to_date(ts).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("v"))
    val series = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("v"), lit(0L)).as("v"))
      .withColumn("i", datediff(col("day"),
        min(col("day")).over(Window.partitionBy())))
    val a = series.select(col("i").as("ia"), col("v").as("va"))
    val b = series.select(col("i").as("ib"), col("v").as("vb"))
    val slopes = a.join(b, col("ia") < col("ib"))
      .select(((col("vb") - col("va")).cast("double")
        / (col("ib") - col("ia")).cast("double")).as("slope"))
    val ranked = slopes.withColumn("rn",
      row_number().over(Window.orderBy(col("slope"))))
    val stats = series.agg(count(lit(1)).as("n_days")).crossJoin(
      slopes.agg(count(lit(1)).as("n_pairs")))
    // integer middle ranks: Spark's `/` on longs is DOUBLE division, so
    // (n+1)/2 on an even count would be x.5 and match no rank — floor
    // both to pick lower and upper middle (equal when n_pairs is odd)
    val lo = floor((col("n_pairs") + 1) / 2).cast("long")
    val hi = floor((col("n_pairs") + 2) / 2).cast("long")
    ranked.crossJoin(broadcast(stats))
      .filter(col("rn") === lo || col("rn") === hi)
      .groupBy(col("n_days"), col("n_pairs"))
      .agg((floor(avg(col("slope")) * 1000000 + 0.5) / 1000000).as("slope6"))
  }

  /** Mann-Kendall trend test over the densified daily-volume grid — the
    * nonparametric significance companion to [[theilSenDailyTrend]]
    * (Theil-Sen answers "how steep", Mann-Kendall answers "is there a
    * monotone trend at all"): S = Σ_{i<j} sign(v_j − v_i) over day
    * order, tie-corrected variance
    * varS = (n(n−1)(2n+5) − Σ_k t_k(t_k−1)(2t_k+5)) / 18 over the value
    * tie classes, z = (S − sign(S)) / √varS (continuity-corrected;
    * z = 0 when S = 0, NULL when varS = 0 — an all-constant series has
    * no rankable trend).
    *
    * Exactness: S and the variance NUMERATOR are exact integers (both
    * emitted), so the only float ops are the final /18, √, and one
    * division — the identical IEEE chain in both engines before the
    * 6-dp floor. Scale shape: the log collapses to day counts first, so
    * the O(n²) sign-pair table is span-bounded metadata (a year is ~66k
    * pairs); tie classes come off the same tiny series.
    * Output: one row (n_days, s_stat, var_num, z6). */
  def mannKendallDailyTrend(events: DataFrame, ts: Column): DataFrame = {
    val daily = events.select(to_date(ts).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("v"))
    val series = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("v"), lit(0L)).as("v"))
      .withColumn("i", datediff(col("day"),
        min(col("day")).over(Window.partitionBy())))
    val a = series.select(col("i").as("ia"), col("v").as("va"))
    val b = series.select(col("i").as("ib"), col("v").as("vb"))
    val sStat = a.join(b, col("ia") < col("ib"))
      .agg(coalesce(sum(signum(col("vb") - col("va")).cast("long")), lit(0L))
        .as("s_stat"))
    val ties = series.groupBy(col("v")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L)).as("tie_sum"))
    val n = series.agg(count(lit(1)).as("n_days"))
    n.crossJoin(sStat).crossJoin(ties)
      .withColumn("var_num",
        col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
          - col("tie_sum"))
      .select(col("n_days"), col("s_stat"), col("var_num"),
        when(col("var_num") > 0, floor(
          (col("s_stat") - signum(col("s_stat"))).cast("double")
            / sqrt(col("var_num").cast("double") / 18.0) * 1000000 + 0.5)
          / 1000000).as("z6"))
  }

  /** Day-of-week volume profile: the weekly seasonal component of the
    * event stream (Monday=0..Sunday=6), over the COMPLETE day grid with
    * absent days as hard zeros — same grid discipline as
    * [[dailyVolumeAcf]], because a skipped zero-volume Sunday would bias
    * exactly the day it should count against. avg4 is an exact-integer
    * ratio (total/n_days) floored at 4 dp.
    *
    * Scale shape: the log collapses to day counts first (map-side
    * combine), so everything after runs on the span-sized series; the
    * profile is ≤ 7 rows. Output: (dow, n_days, total_v, avg4). */
  def dowProfile(events: DataFrame, ts: Column): DataFrame = {
    val daily = events.select(to_date(ts).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("v"))
    val grid = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    grid.join(daily, Seq("day"), "left")
      .select(weekday(col("day")).as("dow"),
        coalesce(col("v"), lit(0L)).as("v"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("v")).as("total_v"))
      .withColumn("avg4", floor(col("total_v").cast("double")
        / col("n_days").cast("double") * 10000 + 0.5) / 10000)
  }

  /** Cohort retention MATRIX — [[retention]] generalized from one offset
    * to the full (cohort day × offset) grid the retention heatmap plots.
    * Same one-shuffle shape: the per-user `collect_set` of active days
    * (calendar-span-bounded, deduped map-side) is computed ONCE and
    * every offset is a set-membership probe on it — offsets multiply
    * only the per-user row fan-out (|offsets| tiny rows), never the
    * event-log shuffle. Output: (cohort_day, offset_days, n_users,
    * n_retained); n_users repeats per offset by design (heatmap rows
    * normalize by it). */
  def retentionMatrix(events: DataFrame, userId: Column, ts: Column,
      offsets: Seq[Int]): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ > 0),
      s"offsets must be positive: $offsets")
    val perUser = events.select(userId.as("__u"), to_date(ts).as("__day"))
      .groupBy(col("__u")).agg(collect_set(col("__day")).as("__days"))
      .select(array_min(col("__days")).as("cohort_day"), col("__days"))
    val probes = offsets.map(o => struct(lit(o).as("offset_days"),
      array_contains(col("__days"), date_add(col("cohort_day"), o)).as("ret")))
    perUser.select(col("cohort_day"), explode(array(probes: _*)).as("r"))
      .groupBy(col("cohort_day"), col("r.offset_days").as("offset_days"))
      .agg(count(lit(1)).as("n_users"),
        count(when(col("r.ret"), 1)).as("n_retained"))
  }

  /** User growth curve: per first-activity day, how many users appeared
    * for the first time and the running total — the adoption/coverage
    * curve every event-log dashboard opens with, and the exact-integer
    * cousin of a "cumulative count distinct" window (which engines
    * either refuse or approximate): cum distinct users ≡ cumulative sum
    * of first-occurrence counts.
    *
    * Scale shape: one map-side-combined per-user min (the only
    * user-cardinality stage), then day-sized aggregation and one window
    * over the span-bounded day table. All integers — no rounding
    * recipe at all. Output: (day, new_users, cum_users) for days with
    * ≥1 first-seen user. */
  def userGrowthCurve(events: DataFrame, userId: Column, ts: Column): DataFrame = {
    val firstSeen = events.select(userId.as("__u"), to_date(ts).as("__day"))
      .groupBy(col("__u")).agg(min(col("__day")).as("day"))
    firstSeen.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Kaplan-Meier survival curve (product-limit estimator) over
    * (duration, observed) subject rows — the churn/retention-curve
    * estimator that handles CENSORING correctly (a user still active at
    * observation end is not a churn at their last-seen duration; naive
    * retention curves get exactly this wrong). Standard conventions:
    * subjects censored at t remain in the risk set AT t; survival steps
    * only at observed-event times.
    *
    * S(t) = Π_{t_i ≤ t} (1 − d_i / n_i). Cross-engine determinism: each
    * ln(1 − d/n) term has an exact-rational argument (identical double
    * both engines), is 6-dp floored and cumulatively summed as
    * DECIMAL(28,6) in duration order (exact, order-free), and only the
    * final exp + 6-dp floor is float — the t18 recipe stretched over a
    * cumulative product. d = n (risk set wiped at t) pins S to exactly
    * 0.0 from t on, bypassing ln(0).
    *
    * Scale shape: one map-side-combined collapse to per-duration counts;
    * every window after that runs on the distinct-duration table
    * (span-bounded metadata, the theilSen discipline).
    * Output: (t, n_risk, n_events, n_censored, haz6, surv6) ordered by t. */
  def kaplanMeier(df: DataFrame, duration: Column, observed: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val byT = df.select(duration.cast("long").as("t"),
        observed.cast("boolean").as("__obs"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("__n_at"),
        sum(when(col("__obs"), 1L).otherwise(0L)).as("n_events"))
      .withColumn("n_censored", col("__n_at") - col("n_events"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn("n_risk",
        sum(col("__n_at")).over(Window.partitionBy())
          - coalesce(sum(col("__n_at")).over(wPrev), lit(0L)))
      .withColumn("haz6",
        floor(col("n_events").cast("double") / col("n_risk") * 1000000 + 0.5)
          / 1000000)
      .withColumn("__term",
        when(col("n_events") < col("n_risk"),
          (floor(log(lit(1.0) - col("n_events").cast("double") / col("n_risk"))
            * 1000000 + 0.5) / 1000000).cast(DecimalType(28, 6)))
          .otherwise(lit(null).cast(DecimalType(28, 6))))
      .withColumn("__wiped",
        max(when(col("n_events") === col("n_risk"), 1).otherwise(0)).over(wCum))
      .withColumn("surv6",
        when(col("__wiped") === 1, lit(0.0))
          .otherwise(floor(
            exp(coalesce(sum(col("__term")).over(wCum), lit(0))
              .cast("double")) * 1000000 + 0.5) / 1000000))
      .select(col("t"), col("n_risk"), col("n_events"), col("n_censored"),
        col("haz6"), col("surv6"))
  }

  /** Sample-ratio-mismatch check — the experiment-health gate run
    * BEFORE believing any effect estimate: a chi-square
    * goodness-of-fit of observed arm sizes against the design ratio.
    * SRM (a biased assignment/logging path) silently invalidates an
    * A/B test, and the cure is detection, not adjustment. Counts are
    * exact integers; the statistic is one IEEE expression, 6-dp
    * floored; `srm_suspected` applies the conventional df=1 α=0.05
    * critical value 3.841459 (a pinned literal — no CDF evaluated).
    * Output: (n_treat, n_ctrl, chi2_6, srm_suspected). */
  def srmCheck(df: DataFrame, treated: Column,
      treatShare: Double = 0.5): DataFrame = {
    require(treatShare > 0 && treatShare < 1, "treatShare must be in (0,1)")
    val g = df.agg(
      sum(when(treated.cast("boolean"), 1L).otherwise(0L)).as("n_treat"),
      sum(when(treated.cast("boolean"), 0L).otherwise(1L)).as("n_ctrl"))
    val n = (col("n_treat") + col("n_ctrl")).cast("double")
    val et = n * treatShare
    val ec = n * (1 - treatShare)
    val chi2 = (col("n_treat").cast("double") - et) *
      (col("n_treat").cast("double") - et) / et +
      (col("n_ctrl").cast("double") - ec) *
        (col("n_ctrl").cast("double") - ec) / ec
    g.select(col("n_treat"), col("n_ctrl"),
      when(n > 0, floor(chi2 * 1000000 + 0.5) / 1000000).as("chi2_6"),
      when(n > 0, chi2 > 3.841459).as("srm_suspected"))
  }

  /** CUPED variance-reduced treatment-effect estimate — the standard
    * experimentation-pipeline adjustment: with a pre-period covariate x
    * and experiment metric y per unit, θ = cov(x,y)/var(x) (pooled) and
    * the adjusted effect is Δȳ − θ·Δx̄, removing ρ² of the metric
    * variance. `x`/`y` must arrive INTEGER-QUANTIZED per unit (floor
    * raw values to a fixed scale upstream — the a08 contract that makes
    * every moment an exact DECIMAL(38,0) sum); all divisions happen in
    * one identical IEEE expression per output, 6-dp floored.
    *
    * Scale: one groupBy(treated) aggregate (2 rows) + broadcast
    * nested-loop combines of 1-row frames — the corpus crosses the wire
    * once as map-side-combined partials. Degenerate var(x)=0 → NULL θ
    * and cuped effect; an empty arm → NULL effects.
    * Output: (n_treat, n_ctrl, theta6, effect_raw6, effect_cuped6,
    * rho2_6). */
  def cuped(df: DataFrame, x: Column, y: Column,
      treated: Column): DataFrame = {
    import org.apache.spark.sql.types.DataTypes
    val dec = (c: Column) => c.cast(DataTypes.createDecimalType(38, 0))
    val arms = df.select(treated.cast("boolean").as("t"),
        x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy(col("t")).agg(
        count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x") * col("y"))).as("sxy"),
        sum(dec(col("x") * col("x"))).as("sxx"),
        sum(dec(col("y") * col("y"))).as("syy"))
    val pooled = arms.agg(sum(col("n")).as("n"),
      sum(col("sx")).as("sx"), sum(col("sy")).as("sy"),
      sum(col("sxy")).as("sxy"), sum(col("sxx")).as("sxx"),
      sum(col("syy")).as("syy"))
    def armCols(p: String) = Seq(col("n").as(s"${p}n"),
      col("sx").as(s"${p}sx"), col("sy").as(s"${p}sy"))
    val ta = arms.where(col("t")).select(armCols("t"): _*)
    val ca = arms.where(!col("t")).select(armCols("c"): _*)
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val theta = cov / vx
    val dy = col("tsy").cast("double") / col("tn").cast("double") -
      col("csy").cast("double") / col("cn").cast("double")
    val dx = col("tsx").cast("double") / col("tn").cast("double") -
      col("csx").cast("double") / col("cn").cast("double")
    def f6(c: Column) = floor(c * 1000000 + 0.5) / 1000000
    pooled.crossJoin(broadcast(ta)).crossJoin(broadcast(ca))
      .select(col("tn").as("n_treat"), col("cn").as("n_ctrl"),
        when(vx > 0, f6(theta)).as("theta6"),
        f6(dy).as("effect_raw6"),
        when(vx > 0, f6(dy - theta * dx)).as("effect_cuped6"),
        when(vx > 0 && vy > 0, f6(cov * cov / (vx * vy))).as("rho2_6"))
  }

  /** A/B-test sample-size calculator for a two-proportion z-test — the
    * "how long must this experiment run" planning primitive next to the
    * f10/f11 analysis ops: per-arm n = (z_{α/2} + z_β)² ·
    * (p₁(1−p₁) + p₂(1−p₂)) / (p₁−p₂)², with the baseline rate p₁
    * measured from the data (converted users / all users) and the
    * target rate p₂ = p₁ + mdeAbs.
    *
    * z-quantiles arrive as caller literals (defaults: two-sided α=0.05
    * → 1.959964, power 0.8 → 0.841621) — planted constants, never a
    * libm inverse-normal whose last bits differ across engines. p₁ is
    * 6-dp floored BEFORE entering the formula, so n_per_arm is a
    * deterministic function of the published rate (hand-auditable).
    *
    * Plan at 100 TB: two distinct-counts over the user key — one
    * map-side-combined aggregate pass. Output: one row (n_users,
    * n_converted, p1_6, p2_6, n_per_arm). */
  def powerTwoProportions(df: DataFrame, user: Column, converted: Column,
      mdeAbs: Double, zAlphaHalf: Double = 1.959964,
      zBeta: Double = 0.841621): DataFrame = {
    require(mdeAbs != 0, "mdeAbs must be nonzero")
    val agg = df.select(user.as("u"), converted.cast("boolean").as("c"))
      .agg(countDistinct(col("u")).as("n_users"),
        countDistinct(when(col("c"), col("u"))).as("n_converted"))
    val p1 = floor(col("n_converted").cast("double")
      / col("n_users").cast("double") * 1e6 + 0.5) / 1e6
    agg.select(col("n_users"), col("n_converted"), p1.as("p1_6"))
      .withColumn("p2_6", col("p1_6") + mdeAbs)
      .withColumn("n_per_arm",
        ceil(lit((zAlphaHalf + zBeta) * (zAlphaHalf + zBeta))
          * (col("p1_6") * (lit(1.0) - col("p1_6"))
            + col("p2_6") * (lit(1.0) - col("p2_6")))
          / (lit(mdeAbs) * lit(mdeAbs))).cast("bigint"))
  }

  /** Additive seasonal-trend decomposition of a daily count series —
    * the classical-decomposition core of STL: trend = centered 7-day
    * moving average (full windows only, edges NULL), seasonal =
    * day-of-week mean of the detrended series, residual = y − trend −
    * seasonal. The "is this spike weekly rhythm or a real anomaly"
    * separation that ts07/ts16's outlier scores assume away.
    *
    * Determinism: trend and seasonal are 6-dp floored where they are
    * DIVISIONS of exact integers; the residual recombines the FLOORED
    * components, so every output column is hand-auditable from the
    * others. DoW means average detrended values as 6-dp DECIMAL sums
    * (order-free).
    *
    * Plan at 100 TB: the log collapses to the day grid FIRST (one
    * map-side-combined aggregate); every window after that runs on the
    * date-bounded grid — ~365 rows/year, metadata-sized, never the raw
    * log. Output: (day, y, trend6, seasonal6, resid6). */
  def seasonalDecompose(df: DataFrame, ts: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val daily = df.select(to_date(ts).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("y"))
    val wMa = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val t = daily
      .withColumn("__n7", count(lit(1)).over(wMa))
      .withColumn("trend6",
        when(col("__n7") === 7,
          floor(sum(col("y")).over(wMa).cast("double") / 7.0 * 1e6 + 0.5) / 1e6))
    val dow = t.withColumn("__dow", dayofweek(col("day")))
    val seas = dow.filter(col("trend6").isNotNull)
      .groupBy(col("__dow"))
      .agg((sum((floor((col("y") - col("trend6")) * 1e6 + 0.5) / 1e6)
          .cast(DecimalType(28, 6))).cast("double")
        / count(lit(1)).cast("double")).as("__s"))
      .select(col("__dow"), (floor(col("__s") * 1e6 + 0.5) / 1e6).as("seasonal6"))
    dow.join(seas, Seq("__dow"), "left")
      .select(col("day"), col("y"),
        col("trend6"),
        col("seasonal6"),
        when(col("trend6").isNotNull && col("seasonal6").isNotNull,
          floor((col("y") - col("trend6") - col("seasonal6")) * 1e6 + 0.5) / 1e6)
          .as("resid6"))
  }

  /** Difference-in-differences effect estimate — the quasi-experimental
    * complement to [[cupedEffect]]: when treatment wasn't randomized but
    * a pre-period exists, DiD = (ȳ_treat,post − ȳ_treat,pre) −
    * (ȳ_ctrl,post − ȳ_ctrl,pre) removes both the fixed group gap and
    * the common time trend (parallel-trends assumption is the caller's
    * to defend).
    *
    * Exactness: y is 6-dp floored to DECIMAL and summed exactly per
    * cell; each cell mean is one double division 8-dp floored, and the
    * DiD combines the FLOORED means (so the estimate is a deterministic
    * function of the four published cell means — auditable by hand from
    * the output row). A fully empty cell → empty result (no row): DiD
    * is undefined without all four cells.
    *
    * Plan at 100 TB: one scan, one 4-row map-side-combined aggregate;
    * no shuffle beyond the 4-group exchange.
    * Output: one row (n_tpre, n_tpost, n_cpre, n_cpost, m_tpre8,
    * m_tpost8, m_cpre8, m_cpost8, did8). */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
      y: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val y6 = (floor(y.cast("double") * 1e6 + 0.5) / 1e6).cast(DecimalType(38, 6))
    val cells = df.select(treated.cast("boolean").as("t"),
        post.cast("boolean").as("p"), y6.as("__y"))
      .groupBy(col("t"), col("p"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("s"))
    def cell(t: Boolean, p: Boolean, nm: String) =
      cells.filter(col("t") === t && col("p") === p)
        .select(col("n").as(s"n_$nm"),
          (floor(col("s").cast("double") / col("n").cast("double") * 1e8 + 0.5)
            / 1e8).as(s"m_${nm}8"))
    val row = cell(true, false, "tpre")
      .crossJoin(broadcast(cell(true, true, "tpost")))
      .crossJoin(broadcast(cell(false, false, "cpre")))
      .crossJoin(broadcast(cell(false, true, "cpost")))
    row.select(col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
      col("m_tpre8"), col("m_tpost8"), col("m_cpre8"), col("m_cpost8"),
      ((col("m_tpost8") - col("m_tpre8")) - (col("m_cpost8") - col("m_cpre8")))
        .as("did8"))
  }
}
