package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events-table shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference pipeline is batch-only full-refresh (SURVEY.md §2.10) —
  * this module is the forward-looking streaming surface of the engine:
  * the same transforms compose on a batch DataFrame or a readStream
  * DataFrame (Structured Streaming's unified model), so a user can run the
  * batch pipeline today and switch the source to a stream without
  * rewriting queries.
  *
  * Scale notes: every operator here is keyed (event_type / user_id), so
  * state is hash-partitioned across executors by the shuffle; watermarks
  * bound state size (late data beyond the watermark is dropped, windows
  * close and evict), which is what keeps indefinite streams at bounded
  * memory on a 1000-executor cluster.
  */
object EventStreams {

  /** Tumbling event-time window counts + value sums per event type, with a
    * watermark bounding state: readStream → withWatermark → window agg.
    */
  def windowedTypeCounts(events: DataFrame,
                         watermark: String = "10 minutes",
                         windowLength: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Windowed distribution moments — the streaming twin of
    * [[graft.operators.Profiling.momentsByGroup]]: per (tumbling
    * window, event type), mean/variance/skewness/kurtosis from exact
    * BIGINT power sums. The state per open group is FIVE longs (n,
    * s1..s4) — plain sums, so micro-batch partials merge into the state
    * store exactly like a count, and the emitted moments are
    * bit-identical to the batch operator on the same rows (parity
    * locked in StreamingSpec). The metric is integerized the
    * [[windowedDistinctUsers]] way: streams carry value scales
    * (cents, ms) rather than floats, keeping the sums order-free.
    *
    * @param yCol integer-valued LONG expression over the event row
    * @return streaming (window_start, event_type, n, mean, variance,
    *         skewness, kurtosis)
    */
  def windowedMoments(events: DataFrame, yCol: Column,
                      watermark: String = "10 minutes",
                      windowLength: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"), yCol.as("__y"))
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(graft.operators.Profiling.momentSumAggs.head,
        graft.operators.Profiling.momentSumAggs.tail: _*)
      .select(Seq(col("window.start").as("window_start"), col("event_type")) ++
        graft.operators.Profiling.momentFinishCols: _*)

  /** Windowed data-quality RULE audit — the streaming twin of
    * [[graft.operators.Constraints.rowRules]]: per tumbling event-time
    * window, every row-local rule's violation count from the SAME shared
    * one-pass aggregate the batch audit runs ([[graft.operators
    * .Constraints.ruleAggs]]), unpivoted to `(window_start, rule,
    * n_checked, violations, passed)`. State per open window is
    * 1 + |rules| longs (plain conditional counts — micro-batch partials
    * merge like sums), so a 50-rule audit over a live ingest costs the
    * same state as a windowed count. The continuous-monitoring half of
    * the publish gate: batch audits the snapshot, this audits the feed.
    */
  def windowedRuleAudit(events: DataFrame,
                        rules: Seq[(String, org.apache.spark.sql.Column)],
                        watermark: String = "10 minutes",
                        windowLength: String = "5 minutes"): DataFrame = {
    val aggs = graft.operators.Constraints.ruleAggs(rules)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength))
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("window.start AS window_start", "__n",
        graft.operators.Constraints.ruleStackExpr(rules))
      .select(col("window_start"), col("rule"), col("__n").as("n_checked"),
        col("violations"), (col("violations") === 0L).as("passed"))
  }

  /** Windowed DISTINCT-USER estimates via the KMV sketch — bounded
    * streaming state where exact `approx/count distinct` per window
    * would hold one entry per distinct user: the
    * [[graft.operators.Sketch.bottomKHashes]] aggregate keeps k longs
    * per (window, type) group no matter how many users stream through,
    * and its buffer is mergeable, so micro-batch partials fold into the
    * state store exactly like a sum. The user-id hash is the same
    * portable Knuth mix as [[graft.operators.Sampling.hashBucket]]'s
    * constant (raw ids are NOT uniform — monotone ids would make the
    * bottom-k the FIRST users, not a sample), with the KMV estimate
    * read off the sketch at emit.
    *
    * @return streaming (window_start, event_type, sk_size, est)
    */
  def windowedDistinctUsers(events: DataFrame,
                            watermark: String = "10 minutes",
                            windowLength: String = "5 minutes",
                            k: Int = 64): DataFrame = {
    val hashMod = 4294967296L
    val h = pmod(pmod(col("user_id"), lit(2147483648L)) * 2654435761L,
      lit(hashMod))
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"), h.as("__h"))
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(graft.operators.Sketch.bottomKHashes(col("__h"), k).as("__sk"))
      .select(col("window.start").as("window_start"), col("event_type"),
        size(col("__sk")).cast("long").as("sk_size"),
        graft.operators.Sketch.kmvDistinctEstimate(col("__sk"), k, hashMod)
          .as("est"))
  }

  /** Windowed distribution-drift monitor — the streaming twin of
    * [[graft.operators.Profiling.distributionDrift]], against a FIXED
    * reference mix: per tumbling window, the event-type distribution's
    * total-variation distance from literal reference weights. The alert
    * that fires while a bad deploy is still skewing traffic, not in
    * tomorrow's batch audit.
    *
    * Shape constraint that matters: streaming allows ONE stateful
    * aggregation, so the usual histogram→totals two-pass TVD is
    * restructured as a single groupBy(window) whose per-bin counts are
    * conditional aggregates over the ENUMERATED reference bins (the
    * reference mix is a literal — enumerable by definition), plus an
    * `other` bucket for types outside it (reference weight 0). The TVD
    * is then a row-local fixed-order integer fold over those columns —
    * numerator Σ_b |c_b·W − w_b·n| in exact longs, ONE double division
    * at emit — so state per open window is |bins|+2 longs and the value
    * is bit-identical to the same expression over the same rows in
    * batch (parity locked in StreamingSpec).
    *
    * @param refWeights (bin, integer weight) reference mix, e.g.
    *                   ("click",60),("view",30),("buy",10)
    * @return streaming (window_start, n, n_<bin>..., n_other, tvd)
    */
  def windowedDriftVsReference(events: DataFrame,
                               refWeights: Seq[(String, Long)],
                               watermark: String = "10 minutes",
                               windowLength: String = "5 minutes"): DataFrame = {
    require(refWeights.nonEmpty && refWeights.forall(_._2 >= 0))
    require(refWeights.map(_._1).distinct.length == refWeights.length)
    val wTot = refWeights.map(_._2).sum
    require(wTot > 0, "reference weights must not all be zero")
    val bins = refWeights.map(_._1)
    val cnts = refWeights.map { case (b, _) =>
      count(when(col("event_type") === b, 1L)).as(s"n_$b")
    }
    val other = count(when(!col("event_type").isInCollection(bins) ||
      col("event_type").isNull, 1L)).as("n_other")
    val agg = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength))
      .agg(cnts.head, (cnts.tail :+ other :+ count(lit(1)).as("n")): _*)
    val num = refWeights.map { case (b, w) =>
      abs(col(s"n_$b") * wTot - lit(w) * col("n"))
    }.reduce(_ + _) + abs(col("n_other") * wTot)
    agg.select(Seq(col("window.start").as("window_start"), col("n")) ++
      bins.map(b => col(s"n_$b")) ++ Seq(col("n_other"),
        when(col("n") > 0,
          num.cast("double") /
            (lit(2.0) * col("n").cast("double") * lit(wTot.toDouble)))
          .as("tvd")): _*)
  }

  /** Windowed SAMPLE-RATIO-MISMATCH monitor — the streaming twin of
    * `Profiling.ratioMismatchAudit` (q248): per tumbling window,
    * observed label counts vs the shares an assignment promised, χ²
    * from fixed-point terms, one row per window. The experiment
    * health-check as a LIVE alarm: a broken splitter shows up in the
    * first window, not at analysis time.
    *
    * State discipline: one aggregation per window holding |labels|+1
    * longs (the conditional counts + total) — the [[windowedRuleAudit]]
    * restructuring; the χ² tail is a row-local projection over the
    * closed window's row, so batch parity is exact (StreamingSpec
    * locks it). Labels outside `expected` are counted (`n_other`) but
    * excluded from the χ² — they were never promised a share.
    */
  def windowedRatioMismatch(events: DataFrame,
                            expected: Seq[(String, Double)],
                            watermark: String = "10 minutes",
                            windowLength: String = "5 minutes",
                            labelCol: String = "event_type"): DataFrame = {
    require(expected.nonEmpty, "need at least one expected share")
    require(expected.map(_._1).distinct.length == expected.length,
      "duplicate expected labels")
    require(expected.forall(_._2 > 0.0), "shares must be positive")
    val labels = expected.map(_._1)
    val cnts = expected.map { case (l, _) =>
      count(when(col(labelCol) === l, 1L)).as(s"n_$l")
    }
    val other = count(when(!col(labelCol).isInCollection(labels) ||
      col(labelCol).isNull, 1L)).as("n_other")
    val agg = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength))
      .agg(cnts.head, cnts.tail :+ other: _*)
    val nExp = labels.map(l => col(s"n_$l")).reduce(_ + _)
    def term(l: String, p: Double) =
      floor(((col(s"n_$l").cast("double") -
        lit(p) * col("__n").cast("double")) *
        (col(s"n_$l").cast("double") -
          lit(p) * col("__n").cast("double")) /
        (lit(p) * col("__n").cast("double"))) *
        lit(1073741824.0)).cast("long")
    val chi2Fp = expected.map { case (l, p) => term(l, p) }.reduce(_ + _)
    agg
      .withColumn("__n", nExp)
      .select(Seq(col("window.start").as("window_start"),
        col("__n").as("n")) ++
        labels.map(l => col(s"n_$l")) ++ Seq(col("n_other"),
          when(col("__n") > 0L, chi2Fp).as("chi2_fp"),
          when(col("__n") > 0L,
            chi2Fp.cast("double") / lit(1073741824.0)).as("chi2")): _*)
  }

  /** Session windows per user: built-in session_window with an inactivity
    * gap — sessions close (and emit) once the watermark passes the gap.
    */
  def userSessions(events: DataFrame,
                   watermark: String = "10 minutes",
                   gap: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup with BOUNDED state: duplicates of a key are
    * dropped as long as they arrive within the event-time watermark; the
    * key's dedup state is evicted once the watermark passes it. This is
    * the streaming twin of the batch exact-dedup family — the operator an
    * ingest stream runs so re-delivered events (at-least-once sources,
    * crawler retries) never reach the corpus twice.
    *
    * Unlike a plain `dropDuplicates` on a stream (whose state grows with
    * every key ever seen — unbounded on an indefinite stream),
    * `dropDuplicatesWithinWatermark` holds only the keys newer than the
    * watermark: state is O(keys per watermark window) per executor,
    * hash-partitioned by key.
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** One event as consumed by the stateful operators. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Per-user running state carried between micro-batches. */
  case class UserState(n_events: Long, total_value: Double, n_errors: Long)

  /** Emitted update after each micro-batch touch of a user. */
  case class UserUpdate(user_id: Long, n_events: Long, total_value: Double,
                        n_errors: Long, error_rate: Double)

  /** Custom keyed state via mapGroupsWithState: a per-user running
    * profile (event count, value total, error rate) updated every
    * micro-batch — the KeyValueGroupedDataset escape hatch for semantics
    * the built-in windowed aggregations can't express.
    *
    * `idleTimeout = Some(duration)` evicts idle users via a
    * processing-time timeout, bounding state on indefinite streams.
    * CAUTION: processing-time timeouts make the engine schedule continuous
    * no-data micro-batches to fire them, so a timeout-enabled query never
    * quiesces (StreamingQuery.processAllAvailable will not settle) — turn
    * it on for long-running production streams, leave it off for
    * drain-and-check usage.
    */
  def runningUserProfile(events: Dataset[Event],
                         idleTimeout: Option[String] = None): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserUpdate](timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          if (idleTimeout.isDefined && state.hasTimedOut) {
            val s = state.get
            state.remove()
            UserUpdate(userId, s.n_events, s.total_value, s.n_errors,
              if (s.n_events > 0) s.n_errors.toDouble / s.n_events else 0.0)
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0, 0L))
            val evs = batch.toSeq
            val next = UserState(
              prev.n_events + evs.size,
              prev.total_value + evs.map(_.value).sum,
              prev.n_errors + evs.count(_.event_type == "error"))
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            UserUpdate(userId, next.n_events, next.total_value, next.n_errors,
              if (next.n_events > 0) next.n_errors.toDouble / next.n_events else 0.0)
          }
      }
  }

  case class LastSeen(ts: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, from_state: String, to_state: String)

  /** Streaming twin of [[graft.operators.EventAnalytics
    * .transitionMatrix]]'s pair stream: per user, every consecutive
    * (state → next state) step as it happens, with the LAST event held
    * in keyed state (one small struct per user — the minimal possible
    * state for sequence analytics). Downstream aggregation of the
    * emitted pairs reproduces the batch matrix counts on an in-ORDER
    * source (the contract: within a batch, events sort by (ts,
    * event_id); an event arriving after a later-stamped one already
    * advanced its user's state would order differently than the batch
    * operator — watermark-hold upstream if the source reorders).
    */
  def runningTransitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[LastSeen]) =>
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          evs.foreach { e =>
            last.foreach(p =>
              out += Transition(userId, p.event_type, e.event_type))
            last = Some(LastSeen(e.ts.getTime, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Stream-stream INTERVAL join — the attribution shape: each `right`
    * event (a click) joins the `left` events (impressions) of the same
    * key whose timestamp precedes it by at most `within`. Works
    * identically on batch DataFrames (unified model), which is what the
    * parity test locks.
    *
    * Scale/state mechanics, the part that matters on an indefinite
    * stream: BOTH sides are watermarked and the join condition contains
    * an explicit event-time range, so Structured Streaming derives a
    * state-eviction bound for each side — a buffered left row is dropped
    * once the right watermark passes `l_ts + within`; without the range
    * condition stream-stream inner join state grows forever. State is
    * hash-partitioned by the join key, so skew follows the key
    * distribution (salt upstream for a pathological hot key).
    *
    * @return (key, l_id, l_ts, l_type, r_id, r_ts, r_type)
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyCol: String = "user_id",
                   watermark: String = "10 minutes",
                   within: String = "5 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(keyCol).as("key"), col("event_id").as("l_id"),
        col("ts").as("l_ts"), col("event_type").as("l_type"))
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("r_key"), col("event_id").as("r_id"),
        col("ts").as("r_ts"), col("event_type").as("r_type"))
    l.join(r,
      col("key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select("key", "l_id", "l_ts", "l_type", "r_id", "r_ts", "r_type")
  }

  /** Wire a streaming DataFrame of events to a sink: transforms →
    * writeStream with checkpointing. Returns the started query.
    *
    * `format`/`options` select the production sink ("parquet"/"kafka"/
    * "delta" with their paths etc.); the "memory" default is the
    * demo/test harness — a memory sink accumulates results on the driver
    * and is NOT a production target.
    */
  def startWindowedCounts(events: DataFrame, checkpointDir: String,
                          queryName: String = "windowed_type_counts",
                          format: String = "memory",
                          options: Map[String, String] = Map.empty) =
    windowedTypeCounts(events)
      .writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .format(format)
      .options(options)
      .option("checkpointLocation", checkpointDir)
      .start()
}
