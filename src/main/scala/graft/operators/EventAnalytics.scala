package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Ordered-funnel and cohort-retention analysis over an event stream —
  * the two classic event-OLAP operators (product analytics' bread and
  * butter) on the engine's integer-time discipline: timestamps stay
  * nanos-since-epoch longs end to end, so every derived statistic is
  * exact integer arithmetic a SQL oracle reproduces bit-for-bit.
  *
  * **Funnel** ([[funnel]]): for an ordered stage list (A → B → C), a
  * user reaches stage i at the EARLIEST event of stage i's type that
  * is strictly after their stage-(i−1) reach time and within `windowNs`
  * of their stage-1 time. Implemented as one combinable min-aggregate
  * per stage — stage i's pass filters events to the stage type, joins
  * the (shrinking) reached-set of stage i−1 on the user key, and takes
  * `min(ts)` per user:
  *   - each pass is map-side combinable (min), keyed by user — no
  *     per-user event sorting, no window funnel;
  *   - the reached-set is one row per surviving user (bounded by users,
  *     not events) and only SHRINKS down the funnel, so at corpus scale
  *     later passes join against an ever-smaller build side (AQE
  *     broadcasts it as soon as it fits);
  *   - k stages cost k filtered passes over the (cached) event scan —
  *     the alternative single-pass form needs per-user sorted event
  *     arrays (a corpus-wide sort + collect_list); k passes of
  *     combinable min beat that for small k, and funnels are small-k
  *     by nature.
  *
  * **Retention** ([[retentionCohorts]]): users cohorted by first-ever
  * activity (epoch-day), activity bucketed into `bucketDays`-day
  * offsets from the cohort day; output counts DISTINCT active users per
  * (cohort bucket, offset bucket). Two combinable aggregates and one
  * user-keyed join; every derived value is integer floor-division of
  * epoch-day ints, deliberately independent of session time zone.
  */
object EventAnalytics {

  /** @param events   event table
    * @param userCol  user/entity key column
    * @param tsCol    event time, nanos-since-epoch LONG
    * @param stageCol event-type column matched against `stages`
    * @param stages   ordered funnel stage values (≥ 1)
    * @param windowNs max `ts − t1` for stages past the first; 0 or
    *                 negative disables the window
    * @return one row per (user, reached stage):
    *         (user, stage_idx LONG 1-based, stage STRING,
    *          ts LONG reach time, t1 LONG stage-1 reach time)
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             stageCol: String, stages: Seq[String],
             windowNs: Long = 0L): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col(userCol).as("__u"),
      col(tsCol).cast(LongType).as("__ts"), col(stageCol).as("__st"))
      .filter(col("__u").isNotNull && col("__ts").isNotNull)

    var reached = ev.filter(col("__st") === stages.head)
      .groupBy("__u").agg(min(col("__ts")).as("__t"))
      .select(col("__u"), col("__t"), col("__t").as("__t1"))
    val out = Seq.newBuilder[DataFrame]
    out += reached.select(col("__u").as(userCol), lit(1L).as("stage_idx"),
      lit(stages.head).as("stage"), col("__t").as("ts"), col("__t1").as("t1"))

    for (i <- 2 to stages.size) {
      val inWindow =
        if (windowNs > 0L) col("__ts") <= col("__t1") + lit(windowNs)
        else lit(true)
      reached = ev.filter(col("__st") === stages(i - 1))
        .join(reached.select(col("__u"), col("__t").as("__tp"), col("__t1")), "__u")
        .filter(col("__ts") > col("__tp") && inWindow)
        .groupBy(col("__u"), col("__t1")).agg(min(col("__ts")).as("__t"))
        .select(col("__u"), col("__t"), col("__t1"))
      out += reached.select(col("__u").as(userCol), lit(i.toLong).as("stage_idx"),
        lit(stages(i - 1)).as("stage"), col("__t").as("ts"), col("__t1").as("t1"))
    }
    out.result().reduce(_ unionAll _)
  }

  /** @param events     event table
    * @param userCol    user/entity key column
    * @param tsCol      event time, nanos-since-epoch LONG
    * @param bucketDays cohort/offset bucket width in days (e.g. 7)
    * @return (cohort LONG = epoch-day of first activity DIV bucketDays,
    *          offset LONG = (epoch-day − cohort epoch-day) DIV bucketDays,
    *          users LONG = distinct active users) — offset 0 row counts
    *         the cohort's size
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       bucketDays: Int): DataFrame = {
    require(bucketDays >= 1)
    val dayNs = 86400000000000L
    // FLOOR day/cohort buckets (graft.functions.floorDivLit), not bare
    // DIV: truncation would merge pre-epoch day -0.x with +0.x into
    // bucket 0 and diverge from the oracle's floored `//`.
    val ev = events.select(col(userCol).as("__u"),
      graft.functions.floorDivLit(col(tsCol), dayNs).as("__day"))
      .filter(col("__u").isNotNull && col("__day").isNotNull)
    val first = ev.groupBy("__u").agg(min(col("__day")).as("__d0"))
    ev.join(first, "__u")
      .select(col("__u"),
        graft.functions.floorDivLit(col("__d0"), bucketDays.toLong)
          .as("cohort"),
        expr(s"(__day - __d0) DIV $bucketDays").as("offset"))
      .distinct()
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("users"))
  }

  /** Interval-union coverage per key — merge overlapping/touching
    * [start, end) intervals and report how much of the timeline each key
    * actually covers: the classic sweep for session dwell time, license/
    * validity windows, and sensor uptime, where naively summing
    * durations double-counts overlaps.
    *
    * Sweep shape (one pass, no self-join): intervals sort per key by
    * (start, end); an interval starts a NEW merged segment iff its start
    * exceeds the running max end of all EARLIER intervals (strictly —
    * touching intervals [1,5),[5,9) merge); the running count of those
    * flags is the segment id, and per-(key, segment) min/max close the
    * merge. Window state is one value (running max / running sum), so a
    * key's cost is its own interval count — the O(n log n) sweep, never
    * the O(n²) overlap self-join. Integer (epoch-unit LONG) bounds in,
    * exact integer coverage out — hash-exact cross-engine.
    *
    * Rows with NULL bounds or end ≤ start are dropped (no extent).
    *
    * @return (keyCol, n_intervals, n_segments, covered, span) — `covered`
    *         = Σ merged lengths, `span` = max end − min start
    */
  def intervalCoverage(df: DataFrame, keyCol: String,
                       start: Column, end: Column): DataFrame = {
    val base = df.select(col(keyCol).as("__k"), start.as("__s"), end.as("__e"))
      .filter(col("__s").isNotNull && col("__e").isNotNull &&
        col("__e") > col("__s"))
    val order = Seq(col("__s"), col("__e"))
    val wPrev = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = base
      .withColumn("__pmax", max(col("__e")).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__s") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__seg", sum(col("__new")).over(wRun))
    seg.groupBy(col("__k"), col("__seg"))
      .agg(count(lit(1)).as("__n"), min(col("__s")).as("__ss"),
        max(col("__e")).as("__se"))
      .groupBy(col("__k").as(keyCol))
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_segments"),
        sum(col("__se") - col("__ss")).as("covered"),
        (max(col("__se")) - min(col("__ss"))).as("span"))
  }

  /** One-sided CUSUM changepoint detector over a per-bucket count series
    * — the corpus-monitoring alarm for "did ingest volume shift upward"
    * (Page 1954). The textbook recursion S_t = max(0, S_{t−1} + (x_t − μ))
    * looks inherently sequential; the identity S_t = P_t − min(0,
    * min_{j≤t} P_j) with P_t = Σ_{i≤t}(x_i − μ) turns it into a prefix
    * sum plus a running min — two ROWS-frame windows over the BUCKET
    * series, never the raw events.
    *
    * Everything is exact BIGINT: with n buckets and total T, the
    * mean-centered increment x_t − T/n is scaled by n to n·x_t − T, so
    * `cusum_scaled` = n·S_t exactly, and the alarm S_t > h·μ compares
    * cusum_scaled > h·T without ever dividing. Order-free aggregates +
    * integer windows ⇒ hash-identical on any engine or partitioning.
    *
    * Scale shape: the per-bucket histogram's map-side combine absorbs
    * the event stream; the two unpartitioned windows run over |buckets|
    * rows (a 10-year daily series is 3,653 rows — driver-bounded by
    * design, the documented `WindowExec: No Partition Defined` class).
    * Overflow: n·x_t ≤ n·T must stay below 2^63 — 3,653 days of 2⁴⁰
    * daily events still fits.
    *
    * @param bucket integer time bucket (e.g. epoch day); NULL buckets drop
    * @param alarmH alarm when CUSUM exceeds `alarmH` × the global mean
    * @return (bucket, x, cusum_scaled, alarm) — one row per non-empty
    *         bucket; `cusum_scaled` = n_buckets × CUSUM_t
    */
  def cusumCounts(df: DataFrame, bucket: Column, alarmH: Int): DataFrame = {
    require(alarmH > 0)
    val hist = df.select(bucket.cast(LongType).as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("x"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__t", sum(col("x")).over(wAll))
      .withColumn("__p", sum(col("x") * col("__n") - col("__t")).over(wCum))
      .withColumn("cusum_scaled",
        col("__p") - least(lit(0L), min(col("__p")).over(wCum)))
      .select(col("bucket"), col("x"), col("cusum_scaled"),
        (col("cusum_scaled") > col("__t") * alarmH).as("alarm"))
  }

  /** [[cusumCounts]] per GROUP — one independent CUSUM monitor per key
    * (per source, per event type), sharing the same prefix-sum minus
    * running-min identity with every window partitioned by the group:
    * each group's detector is centered on ITS OWN mean (n_g·x − T_g
    * increments), so a big stream never drowns a small one's shift.
    * Windows run over (group × bucket) histogram rows; alarm when a
    * group's CUSUM exceeds `alarmH` × its own bucket mean.
    *
    * @return (group, bucket, x, cusum_scaled, alarm); `cusum_scaled` =
    *         n_buckets(group) × CUSUM_t
    */
  def cusumCountsByGroup(df: DataFrame, group: Column, bucket: Column,
                         alarmH: Int): DataFrame = {
    require(alarmH > 0)
    val hist = df.select(group.as("group"), bucket.cast(LongType).as("bucket"))
      .filter(col("bucket").isNotNull && col("group").isNotNull)
      .groupBy("group", "bucket").agg(count(lit(1)).as("x"))
    val wAll = Window.partitionBy("group")
    val wCum = Window.partitionBy("group").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__t", sum(col("x")).over(wAll))
      .withColumn("__p", sum(col("x") * col("__n") - col("__t")).over(wCum))
      .withColumn("cusum_scaled",
        col("__p") - least(lit(0L), min(col("__p")).over(wCum)))
      .select(col("group"), col("bucket"), col("x"), col("cusum_scaled"),
        (col("cusum_scaled") > col("__t") * alarmH).as("alarm"))
  }

  /** Rolling median/MAD anomaly detector over a per-bucket count series
    * — [[cusumCounts]]'s robust sibling: flags buckets whose count
    * deviates from the TRAILING w-bucket median by more than k× the
    * trailing MAD (median absolute deviation, 50% breakdown — one
    * outlier day cannot drag the baseline the way a trailing mean
    * would). The trailing window EXCLUDES the current bucket, so a spike
    * never masks itself.
    *
    * Exactness: counts are integers; with odd w both medians are single
    * ELEMENTS of a sorted length-w array (no averaging, no floats), and
    * the alarm |x − med| > k·mad is integer arithmetic — hash-identical
    * cross-engine. The first w buckets have no full trailing window:
    * med/mad/alarm are NULL there (warm-up, not "no anomaly").
    *
    * Scale shape: the histogram's map-side combine absorbs the event
    * stream; the one unpartitioned window runs over |buckets| rows with
    * w-element array state (the bounded `WindowExec: No Partition
    * Defined` class, as [[cusumCounts]]) — sorting w≈7..31 elements per
    * bucket row is noise. MAD = 0 (≥half the window identical) makes ANY
    * deviation alarm — the documented knife-edge of integer MAD on
    * quiet series; prefer larger w there.
    *
    * @param w trailing window in buckets, odd, ≥ 3
    * @param k alarm multiplier (integer, ≥ 1)
    * @return (bucket, x, med, mad, alarm) per non-empty bucket
    */
  def rollingMadAnomaly(df: DataFrame, bucket: Column, w: Int,
                        k: Int): DataFrame = {
    require(w >= 3 && w % 2 == 1, "window must be odd and >= 3")
    require(k >= 1)
    val hist = df.select(bucket.cast(LongType).as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("x"))
    val win = Window.orderBy("bucket").rowsBetween(-w, -1)
    val mid = (w + 1) / 2
    hist
      .withColumn("__t", collect_list(col("x")).over(win))
      .withColumn("med", when(size(col("__t")) === w,
        element_at(array_sort(col("__t")), mid)))
      .withColumn("mad", when(col("med").isNotNull,
        element_at(array_sort(
          transform(col("__t"), v => abs(v - col("med")))), mid)))
      .select(col("bucket"), col("x"), col("med"), col("mad"),
        when(col("med").isNotNull,
          abs(col("x") - col("med")) > col("mad") * k).as("alarm"))
  }

  /** Top JOURNEY PREFIXES: the most common ordered event-type sequences
    * over each key's first `depth` events — the path-analysis read
    * ("what do users actually do first") next to [[funnel]]'s
    * one-hypothesis check and [[transitionMatrix]]'s one-step view.
    *
    * Scale shape: the per-key window ranks rows (state = one counter);
    * rows past `depth` drop BEFORE the collect, so the per-key
    * aggregation buffer holds ≤ `depth` structs; path strings histogram
    * with map-side combine (≤ |types|^depth distinct paths). Keys with
    * fewer than `depth` events contribute their full (shorter) path —
    * real journeys, not padded ones. `orderCols` must totally order
    * events per key (unique tie-break).
    *
    * @return (path, depth, n_keys) ordered by (n_keys DESC, path),
    *         top `topK`
    */
  def topPaths(df: DataFrame, keyCol: String, orderCols: Seq[Column],
               stateCol: String, depth: Int, topK: Int): DataFrame = {
    require(depth >= 1 && topK >= 1)
    require(orderCols.nonEmpty, "need at least one order column")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
      .groupBy(col(keyCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__rn"), col(stateCol).as("s")))),
          x => x.getField("s")), ">").as("path"),
        count(lit(1)).as("__d"))
      .groupBy(col("path"))
      .agg(min(col("__d")).as("depth"), count(lit(1)).as("n_keys"))
      .orderBy(desc("n_keys"), col("path"))
      .limit(topK)
  }

  /** [[rollingMadAnomaly]] per GROUP — the robust sibling of
    * [[cusumCountsByGroup]]: every key gets its own trailing median/MAD
    * baseline over its own bucket series, windows partitioned by the
    * group over (group × bucket) histogram rows.
    *
    * @return (group, bucket, x, med, mad, alarm)
    */
  def rollingMadAnomalyByGroup(df: DataFrame, group: Column, bucket: Column,
                               w: Int, k: Int): DataFrame = {
    require(w >= 3 && w % 2 == 1, "window must be odd and >= 3")
    require(k >= 1)
    val hist = df.select(group.as("group"), bucket.cast(LongType).as("bucket"))
      .filter(col("bucket").isNotNull && col("group").isNotNull)
      .groupBy("group", "bucket").agg(count(lit(1)).as("x"))
    val win = Window.partitionBy("group").orderBy("bucket")
      .rowsBetween(-w, -1)
    val mid = (w + 1) / 2
    hist
      .withColumn("__t", collect_list(col("x")).over(win))
      .withColumn("med", when(size(col("__t")) === w,
        element_at(array_sort(col("__t")), mid)))
      .withColumn("mad", when(col("med").isNotNull,
        element_at(array_sort(
          transform(col("__t"), v => abs(v - col("med")))), mid)))
      .select(col("group"), col("bucket"), col("x"), col("med"), col("mad"),
        when(col("med").isNotNull,
          abs(col("x") - col("med")) > col("mad") * k).as("alarm"))
  }

  /** First-order Markov TRANSITION matrix over per-key event sequences:
    * for every consecutive (state → next state) step within a key's
    * time-ordered stream, the exact count, the from-state row total, and
    * the empirical transition probability — the behavioral fingerprint
    * (what follows a `view`?) and the input to sequence anomaly scoring.
    *
    * Determinism: `orderCols` must totally order each key's events
    * (include a unique id tie-break next to the timestamp — equal-time
    * events would otherwise make `lead` nondeterministic). Counts are
    * exact; the probability is one division.
    *
    * Scale shape: the only window over raw events is partitioned BY KEY
    * (state = one row lookahead; cost = each key's own event count —
    * cap or sessionize hyperactive keys upstream), and the transition
    * histogram map-side-combines to ≤ |states|² rows; the row-total
    * window runs over those histogram rows only.
    *
    * @return (from_state, to_state, cnt, row_total, p)
    */
  /** OFFLINE changepoint by binary segmentation (one split): the day t
    * whose two-segment fit minimizes total SSE — the retrospective
    * "when did the level actually shift" answer, where [[cusumCounts]]
    * is the online alarm. One split is the first step of full binary
    * segmentation; callers recurse on the segments if more breaks are
    * suspected.
    *
    * Exactness: prefix (n, Σx, Σx²) over the day histogram are BIGINT;
    * each candidate split's SSE = (Q_L − S_L²/n_L) + (Q_R − S_R²/n_R)
    * is fixed-shape double arithmetic on those exact integers —
    * identical in any IEEE engine — and the argmin orders by
    * (sse, t), so ties break on the earlier day. Windows run over day
    * rows only (the monitor discipline). The last day cannot split
    * (right segment would be empty).
    *
    * @return one row: (split_t, n_left, n_right, mean_left, mean_right,
    *         sse_split, sse_total, reduction) — NULL-free when ≥ 2
    *         days exist; empty otherwise
    */
  def binaryChangepoint(df: DataFrame, bucket: Column): DataFrame = {
    val daily = df.select(bucket.cast("long").as("t"))
      .filter(col("t").isNotNull)
      .groupBy("t").agg(count(lit(1)).as("__x"))
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy() // day rows only
    def sse(q: Column, s: Column, n: Column): Column =
      q.cast("double") -
        s.cast("double") * s.cast("double") / n.cast("double")
    val pre = daily
      .withColumn("__nl", sum(lit(1L)).over(wCum))
      .withColumn("__sl", sum(col("__x")).over(wCum))
      .withColumn("__ql", sum(col("__x") * col("__x")).over(wCum))
      .withColumn("__n", sum(lit(1L)).over(wAll))
      .withColumn("__s", sum(col("__x")).over(wAll))
      .withColumn("__q", sum(col("__x") * col("__x")).over(wAll))
      .filter(col("__nl") < col("__n")) // right segment non-empty
      .withColumn("__nr", col("__n") - col("__nl"))
      .withColumn("__sr", col("__s") - col("__sl"))
      .withColumn("__qr", col("__q") - col("__ql"))
      .withColumn("__sse",
        sse(col("__ql"), col("__sl"), col("__nl")) +
          sse(col("__qr"), col("__sr"), col("__nr")))
    pre
      .orderBy(col("__sse").asc, col("t").asc)
      .limit(1)
      .select(col("t").as("split_t"), col("__nl").as("n_left"),
        col("__nr").as("n_right"),
        (col("__sl").cast("double") / col("__nl").cast("double"))
          .as("mean_left"),
        (col("__sr").cast("double") / col("__nr").cast("double"))
          .as("mean_right"),
        col("__sse").as("sse_split"),
        sse(col("__q"), col("__s"), col("__n")).as("sse_total"))
      .withColumn("reduction",
        when(col("sse_total") > 0.0,
          lit(1.0) - col("sse_split") / col("sse_total")))
  }

  /** WEEKDAY seasonal decomposition of a daily count series: each day's
    * volume split into its weekday's mean component and the residual —
    * the "is Monday always like this" baseline that must come OFF a
    * series before an anomaly monitor reads it ([[cusumCounts]] on raw
    * counts alarms every weekend; on residuals it alarms on news). The
    * seasonal-naive model: deterministic, exact, and the right first
    * model for calendar-driven series.
    *
    * Weekday = epoch-day mod 7 (a fixed day-of-week labeling, time-zone
    * free). Exactness: per-weekday (n, Σ) are BIGINT; the mean and the
    * residual are one division + one subtraction per row in fixed
    * shapes. Absent days are absent (densify upstream if silence
    * counts). Seasonality STRENGTH is [[Profiling.anovaByGroup]] over
    * the weekday grouping — η² there = variance explained by weekday.
    *
    * @return one row per observed day: (bucket, weekday, x, wd_n,
    *         wd_sum, wd_mean, residual), ordered by caller
    */
  def weekdayDecomposition(df: DataFrame, bucket: Column): DataFrame = {
    val daily = df.select(bucket.cast("long").as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("x"))
      .withColumn("weekday", pmod(col("bucket"), lit(7L)))
    val wd = daily.groupBy("weekday")
      .agg(count(lit(1)).as("wd_n"), sum(col("x")).as("wd_sum"))
    daily.join(broadcast(wd), Seq("weekday"))
      .withColumn("wd_mean",
        col("wd_sum").cast("double") / col("wd_n").cast("double"))
      .withColumn("residual", col("x").cast("double") - col("wd_mean"))
      .select("bucket", "weekday", "x", "wd_n", "wd_sum", "wd_mean",
        "residual")
  }

  /** KAPLAN–MEIER survival curve over user lifetimes with right
    * censoring — "what fraction of users are still active after t
    * days", computed the way survival analysis demands: a user whose
    * last activity is within `censorGapDays` of the study horizon has
    * NOT churned, merely run out of observation window, and counting
    * them as deaths (the naive retention read) biases every tail
    * estimate down. S(t) = Π_{u≤t} (1 − d_u/n_u) over event times.
    *
    * Determinism: the (duration, churns, at-risk) table is exact BIGINT
    * (suffix-cumulative at-risk over the duration histogram); the
    * product folds LEFT-TO-RIGHT in duration order on the DRIVER over
    * that bounded table (the PAVA/codebook license — rows ≤ distinct
    * durations), each step one IEEE multiply, so the curve is
    * bit-reproducible and the oracle replays the same fold as an
    * ordered list_reduce.
    *
    * @param day integral day expression (e.g. epoch-day of the event)
    * @return one row per distinct duration: (t, n_risk, d_churn,
    *         factor, survival) — survival non-increasing in t
    */
  def kaplanMeier(df: DataFrame, keyCol: String, day: Column,
                  censorGapDays: Long): DataFrame = {
    require(censorGapDays >= 0, "negative censor gap")
    val spark = df.sparkSession
    import spark.implicits._
    val spans = df.select(col(keyCol).as("__k"), day.cast("long").as("__d"))
      .filter(col("__d").isNotNull)
      .groupBy("__k").agg(min(col("__d")).as("__f"), max(col("__d")).as("__l"))
    val horizonRow = spans.agg(max(col("__l"))).head
    if (horizonRow.isNullAt(0)) return Seq
      .empty[(Long, Long, Long, Double, Double)]
      .toDF("t", "n_risk", "d_churn", "factor", "survival")
    val horizon = horizonRow.getLong(0)
    val obs = spans.select((col("__l") - col("__f")).as("t"),
      (col("__l") < lit(horizon - censorGapDays)).cast("long").as("__evt"))
    val wSuffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dayRows = obs.groupBy("t")
      .agg(count(lit(1)).as("__c"), sum(col("__evt")).as("d"))
      .withColumn("n_risk", sum(col("__c")).over(wSuffix))
      .select("t", "n_risk", "d").orderBy("t")
      .collect() // bounded by distinct durations (a time span, not rows)
    var s = 1.0
    val out = dayRows.toSeq.map { r =>
      val t = r.getAs[Long]("t")
      val n = r.getAs[Long]("n_risk")
      val d = r.getAs[Long]("d")
      val factor = 1.0 - d.toDouble / n.toDouble
      s = s * factor
      (t, n, d, factor, s)
    }
    out.toDF("t", "n_risk", "d_churn", "factor", "survival")
  }

  /** Multi-touch ATTRIBUTION: for every conversion event, credit the
    * touch events (views/clicks) that preceded it within a lookback
    * window — last-touch counts AND linear (equal-split) shares per
    * touch type, plus the direct-conversion remainder. The
    * marketing-analytics staple, and the same "which upstream event
    * explains this outcome" shape as data-lineage blame.
    *
    * Exactness: linear shares are fixed-point — each touch of an
    * n-touch conversion earns ⌊2²⁰/n⌋ (integer DIV; the ≤ n·2⁻²⁰
    * truncation remainder per conversion is the price of an order-free
    * BIGINT sum). Last-touch ties (same timestamp) break by the event
    * id then type — engine-stable. Conversions with NO touch in the
    * window report as the `(direct)` row.
    *
    * Scale shape: one user-keyed equi-join between conversions and
    * touches with the window as a join-local range filter (the as-of
    * family's shape — never a cross join), one conversion-keyed
    * aggregate (state = count + one max-struct), one |types|-row final
    * aggregate.
    *
    * @return per touch type (+ `(direct)`): (touch_type, n_last_touch,
    *         n_touches, linear_fp) — linear_fp/2²⁰ ≈ attributed
    *         conversions
    */
  def attribution(df: DataFrame, userCol: String, tsCol: Column,
                  idCol: String, typeCol: String, convType: String,
                  touchTypes: Seq[String], windowNs: Long): DataFrame = {
    require(touchTypes.nonEmpty && windowNs > 0, "degenerate config")
    val base = df.select(col(userCol).as("__u"), tsCol.as("__ts"),
      col(idCol).as("__eid"), col(typeCol).as("__ty"))
    val convs = base.filter(col("__ty") === convType)
      .select(col("__u"), col("__ts").as("__cts"), col("__eid").as("__cid"))
    val touches = base.filter(col("__ty").isin(touchTypes: _*))
      .select(col("__u"), col("__ts").as("__tts"),
        col("__eid").as("__tid"), col("__ty"))
    val windowed = convs.join(touches, Seq("__u"))
      .filter(col("__tts") < col("__cts") &&
        col("__tts") >= col("__cts") - windowNs)
    val perConv = windowed.groupBy("__cid")
      .agg(count(lit(1)).as("__n"),
        max(struct(col("__tts"), col("__tid"), col("__ty"))).as("__last"))
    val attributed = windowed
      .join(perConv.select(col("__cid"), col("__n"),
        col("__last").getField("__tid").as("__lastTid")), "__cid")
      .groupBy(col("__ty").as("touch_type"))
      .agg(count(when(col("__tid") === col("__lastTid"), 1L))
          .as("n_last_touch"),
        count(lit(1)).as("n_touches"),
        sum(expr("1048576 DIV __n")).as("linear_fp"))
    val direct = convs
      .join(perConv, convs("__cid") === perConv("__cid"), "left_anti")
      .agg(count(lit(1)).as("n_last_touch"))
      .select(lit("(direct)").as("touch_type"), col("n_last_touch"),
        lit(0L).as("n_touches"), lit(0L).as("linear_fp"))
    attributed.unionByName(direct)
  }

  /** Index-of-DISPERSION monitor: per group, variance/mean of the
    * per-bucket event counts — the overdispersion read that decides
    * whether a Poisson assumption (and every alarm threshold derived
    * from it — [[cusumCounts]]' included) is even valid for this
    * stream. D ≈ 1 is Poisson-like; D ≫ 1 means bursty arrivals whose
    * "anomalies" are just burst tails.
    *
    * Exact verdict: with population variance, D = (nΣx² − (Σx)²)/(n·Σx)
    * — BIGINT numerator and denominator, so `overdispersed` (D > 1) is
    * an exact integer comparison and only the reported ratio divides.
    * One histogram pass + one |groups|-row aggregate. Empty-bucket
    * caveat: silent buckets are absent, not zero — densify upstream if
    * silence should count (the [[Timeseries.saxMotifs]] note).
    *
    * @return per group: (group, n_buckets, total, disp_num, disp_den,
    *         dispersion, overdispersed)
    */
  def dispersionByGroup(df: DataFrame, group: Column,
                        bucket: Column): DataFrame =
    df.select(group.as("group"), bucket.cast("long").as("__b"))
      .filter(col("__b").isNotNull)
      .groupBy("group", "__b").agg(count(lit(1)).as("__x"))
      .groupBy("group")
      .agg(count(lit(1)).as("n_buckets"), sum(col("__x")).as("total"),
        sum(col("__x") * col("__x")).as("__q"))
      .select(col("group"), col("n_buckets"), col("total"),
        (col("n_buckets") * col("__q") - col("total") * col("total"))
          .as("disp_num"),
        (col("n_buckets") * col("total")).as("disp_den"))
      .withColumn("dispersion",
        when(col("disp_den") > 0L,
          col("disp_num").cast("double") / col("disp_den").cast("double")))
      .withColumn("overdispersed", col("disp_num") > col("disp_den"))

  def transitionMatrix(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                       stateCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("row_total",
        sum(col("cnt")).over(Window.partitionBy(col("from_state"))))
      .withColumn("p",
        col("cnt").cast("double") / col("row_total").cast("double"))
  }
}
