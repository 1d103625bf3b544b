package graft

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def fun(ev: Seq[(Long, Long, String)], stages: Seq[String],
                  window: Long = 0L): Map[(Long, Long), (String, Long, Long)] =
    EventAnalytics.funnel(
      ev.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", stages, window)
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  private val stages = Seq("view", "click", "buy")

  test("stages must be reached strictly in order, earliest-valid-event wins") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      (2L, 5L, "click"), (2L, 10L, "view"), // click precedes view: depth 1
      (3L, 10L, "view"), (3L, 12L, "buy"), (3L, 15L, "click"), // buy too early
      (1L, 8L, "view"), (1L, 9L, "click")) // user 1 re-anchors to view@8
    val got = fun(ev, stages)
    assert(got((1L, 1L)) === (("view", 8L, 8L)))
    assert(got((1L, 2L)) === (("click", 9L, 8L)))
    assert(got((1L, 3L)) === (("buy", 30L, 8L)))
    assert(got((2L, 1L)) === (("view", 10L, 10L)))
    assert(!got.contains((2L, 2L)))
    assert(got((3L, 2L)) === (("click", 15L, 10L)))
    assert(!got.contains((3L, 3L)), "buy before click must not count")
  }

  test("window is measured from stage 1, inclusive at the boundary") {
    val ev = Seq(
      (1L, 0L, "view"), (1L, 100L, "click"),   // exactly at t1+window
      (2L, 0L, "view"), (2L, 101L, "click"))   // one past
    val got = fun(ev, Seq("view", "click"), window = 100L)
    assert(got.contains((1L, 2L)) && !got.contains((2L, 2L)))
  }

  test("same-timestamp events do not chain (strictly-after contract)") {
    val got = fun(Seq((1L, 10L, "view"), (1L, 10L, "click")), Seq("view", "click"))
    assert(got.contains((1L, 1L)) && !got.contains((1L, 2L)))
  }

  test("retention cohorts bucket by first-activity day, distinct per offset") {
    val day = 86400000000000L
    val ev = Seq(
      (1L, 0L * day), (1L, 0L * day + 5), (1L, 8L * day),  // cohort 0: offsets 0,1
      (2L, 7L * day), (2L, 13L * day),                     // cohort 1: offsets 0,0
      (3L, 1L * day), (3L, 20L * day))                     // cohort 0: offsets 0,2
    val got = EventAnalytics.retentionCohorts(
      ev.toDF("user_id", "ts"), "user_id", "ts", bucketDays = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("trendByGroup: exact OLS, degenerate groups NULL, matches regr_slope") {
    import org.apache.spark.sql.functions._
    val df = (Seq(("up", 0L, 1L), ("up", 1L, 3L), ("up", 2L, 5L)) ++ // slope 2, r2 1
      Seq(("flatx", 4L, 1L), ("flatx", 4L, 9L)) ++                   // constant x
      Seq(("flaty", 1L, 6L), ("flaty", 2L, 6L), ("flaty", 9L, 6L)))  // constant y
      .toDF("g", "x", "y")
    val out = graft.operators.Regression
      .trendByGroup(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(out(0) === (("flatx", 2L, None, None, None)))
    assert(out(1) === (("flaty", 3L, Some(0.0), Some(6.0), None)))
    assert(out(2) === (("up", 3L, Some(2.0), Some(1.0), Some(1.0))))
    // non-degenerate slope agrees with Spark's own float-moment regr_slope
    val builtin = df.filter(col("g") === "up")
      .agg(expr("regr_slope(y, x)")).head().getDouble(0)
    assert(math.abs(builtin - 2.0) < 1e-12)
  }

  test("scd2: consecutive restatements collapse, intervals abut, last version open") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, 10L, 100L, "bronze"), (1L, 20L, 101L, "bronze"), // restatement
      (1L, 30L, 102L, "gold"), (1L, 40L, 103L, "bronze"),   // back again
      (2L, 10L, 104L, "gold"),
      (3L, 10L, 105L, "a"), (3L, 10L, 106L, "b")            // same-ts tiebreak
    ).toDF("user_id", "ts", "event_id", "tier")
    val out = graft.operators.Cdc.scd2(ev, "user_id", "tier", "ts", "event_id")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, "bronze", 10L, Some(30L), 0L),
      (1L, 2L, "gold", 30L, Some(40L), 0L),
      (1L, 3L, "bronze", 40L, None, 1L),
      (2L, 1L, "gold", 10L, None, 1L),
      (3L, 1L, "a", 10L, Some(10L), 0L), // event_id orders the same-ts pair
      (3L, 2L, "b", 10L, None, 1L)))
  }

  test("intervalCoverage merges overlaps and touching intervals, splits on gaps") {
    import org.apache.spark.sql.functions.col
    val iv = Seq(
      // key a: [1,5) [3,7) overlap → [1,7); [7,9) touches → merges;
      //        [20,25) gap → new segment. covered 8+5=13, span 24
      ("a", 1L, 5L), ("a", 3L, 7L), ("a", 7L, 9L), ("a", 20L, 25L),
      // key b: nested [0,100) ⊃ [10,20) → one segment of 100
      ("b", 0L, 100L), ("b", 10L, 20L),
      // key c: degenerate rows dropped
      ("c", 5L, 5L), ("c", 9L, 4L), ("c", 1L, 2L)
    ).toDF("k", "s", "e")
    val out = graft.operators.EventAnalytics
      .intervalCoverage(iv, "k", col("s"), col("e"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      ("a", 4L, 2L, 13L, 24L),
      ("b", 2L, 1L, 100L, 100L),
      ("c", 1L, 1L, 1L, 1L)))
  }

  test("intervalCoverage: an interval inside the running union never splits a segment") {
    import org.apache.spark.sql.functions.col
    // [0,10) then [2,3) (ends before running max): still one segment
    val iv = Seq(("k", 0L, 10L), ("k", 2L, 3L), ("k", 4L, 12L))
      .toDF("k", "s", "e")
    val out = graft.operators.EventAnalytics
      .intervalCoverage(iv, "k", col("s"), col("e")).head
    assert(out.getLong(2) === 1L && out.getLong(3) === 12L)
  }

  test("binaryChangepoint: finds the level shift; earlier day wins SSE ties") {
    import org.apache.spark.sql.functions.col
    // days 0..4 at volume 2, days 5..9 at volume 8 -> split at t=4
    val ev = (0L until 10L).flatMap(d =>
      Seq.fill(if (d < 5) 2 else 8)(d)).toDF("d")
    val r = graft.operators.EventAnalytics
      .binaryChangepoint(ev, col("d")).collect()(0)
    assert(r.getAs[Long]("split_t") === 4L)
    assert(r.getAs[Double]("mean_left") === 2.0)
    assert(r.getAs[Double]("mean_right") === 8.0)
    assert(r.getAs[Double]("sse_split") === 0.0)
    assert(math.abs(r.getAs[Double]("reduction") - 1.0) < 1e-12)
    // flat series: all splits tie at SSE ~ total -> earliest day wins
    val flat = (0L until 6L).flatMap(d => Seq.fill(3)(d)).toDF("d")
    val f = graft.operators.EventAnalytics
      .binaryChangepoint(flat, col("d")).collect()(0)
    assert(f.getAs[Long]("split_t") === 0L)
    assert(f.getAs[Double]("sse_total") === 0.0)
  }

  test("weekdayDecomposition: residuals vanish on a perfectly weekly series") {
    import org.apache.spark.sql.functions.col
    // two full weeks, volume = weekday index + 1 each week
    val ev = (0L until 14L).flatMap(d => Seq.fill((d % 7 + 1).toInt)(d))
      .toDF("d")
    val r = graft.operators.EventAnalytics
      .weekdayDecomposition(ev, col("d")).orderBy("bucket").collect()
    assert(r.length === 14)
    assert(r.forall(_.getAs[Double]("residual") === 0.0))
    assert(r.forall(_.getAs[Long]("wd_n") === 2L))
    // a spike on one Monday shows as +/- residual split across Mondays
    val ev2 = ((0L until 14L).flatMap(d => Seq.fill((d % 7 + 1).toInt)(d))
      ++ Seq.fill(4)(7L)).toDF("d")
    val r2 = graft.operators.EventAnalytics
      .weekdayDecomposition(ev2, col("d")).orderBy("bucket").collect()
    val mon = r2.filter(_.getAs[Long]("weekday") === 0L)
    assert(mon.map(_.getAs[Double]("residual")).sorted.toSeq ===
      Seq(-2.0, 2.0))
  }

  test("kaplanMeier: censored users leave the risk set without counting as deaths") {
    import org.apache.spark.sql.functions.col
    // horizon = day 20, gap 5: users with last activity >= 15 censored.
    // u1: days 0..2   -> t=2,  churn (l=2  < 15)
    // u2: days 0..2   -> t=2,  churn
    // u3: days 0..10  -> t=10, churn
    // u4: days 0..16  -> t=16, censored
    // u5: days 10..20 -> t=10, censored
    val ev = Seq(
      (1L, 0L), (1L, 2L), (2L, 0L), (2L, 2L), (3L, 0L), (3L, 10L),
      (4L, 0L), (4L, 16L), (5L, 10L), (5L, 20L)
    ).toDF("u", "d")
    val r = graft.operators.EventAnalytics
      .kaplanMeier(ev, "u", col("d"), censorGapDays = 5L)
      .orderBy("t").collect()
    // durations: t=2 (n=5, d=2), t=10 (n=3, d=1 — u5 censored), t=16 (n=1, d=0)
    assert(r.map(x => (x.getAs[Long]("t"), x.getAs[Long]("n_risk"),
      x.getAs[Long]("d_churn"))).toSeq ===
      Seq((2L, 5L, 2L), (10L, 3L, 1L), (16L, 1L, 0L)))
    // S(2) = 3/5; S(10) = 3/5 · 2/3 = 0.4; S(16) = 0.4 · 1 = 0.4
    assert(math.abs(r(0).getAs[Double]("survival") - 0.6) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("survival") - 0.4) < 1e-12)
    assert(r(2).getAs[Double]("survival") === r(1).getAs[Double]("survival"))
    // monotone non-increasing by construction
    val s = r.map(_.getAs[Double]("survival"))
    assert(s.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("kaplanMeier: empty input yields an empty curve, no crash") {
    import org.apache.spark.sql.functions.col
    val ev = Seq.empty[(Long, Long)].toDF("u", "d")
    assert(graft.operators.EventAnalytics
      .kaplanMeier(ev, "u", col("d"), 5L).count() === 0L)
  }

  test("attribution: last-touch, linear shares, window bounds, and direct remainder") {
    import org.apache.spark.sql.functions.col
    // user 1: view@1, click@5, purchase@10 (window 10): both touches,
    //   last = click. user 2: view@100, purchase@200 (outside window 10)
    //   -> direct. user 3: purchase@7, no touches -> direct.
    val ev = Seq(
      (1L, 1L, 101L, "view"), (1L, 5L, 102L, "click"),
      (1L, 10L, 103L, "purchase"),
      (2L, 100L, 201L, "view"), (2L, 200L, 202L, "purchase"),
      (3L, 7L, 301L, "purchase")
    ).toDF("u", "ts", "eid", "ty")
    val r = EventAnalytics.attribution(ev, "u", col("ts"), "eid", "ty",
      convType = "purchase", touchTypes = Seq("view", "click"),
      windowNs = 10L).orderBy("touch_type").collect()
    val byType = r.map(x => x.getAs[String]("touch_type") -> x).toMap
    assert(byType("(direct)").getAs[Long]("n_last_touch") === 2L)
    assert(byType("click").getAs[Long]("n_last_touch") === 1L)
    assert(byType("view").getAs[Long]("n_last_touch") === 0L)
    // linear: user 1's conversion splits 2^20 DIV 2 to each touch
    assert(byType("view").getAs[Long]("linear_fp") === 524288L)
    assert(byType("click").getAs[Long]("linear_fp") === 524288L)
  }

  test("attribution: same-timestamp touches tie-break by event id") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, 5L, 11L, "view"), (1L, 5L, 12L, "click"),
      (1L, 6L, 13L, "purchase")
    ).toDF("u", "ts", "eid", "ty")
    val r = EventAnalytics.attribution(ev, "u", col("ts"), "eid", "ty",
      "purchase", Seq("view", "click"), windowNs = 10L)
      .orderBy("touch_type").collect()
    val byType = r.map(x => x.getAs[String]("touch_type") -> x).toMap
    // click has the larger event id at the tied timestamp
    assert(byType("click").getAs[Long]("n_last_touch") === 1L)
    assert(byType("view").getAs[Long]("n_last_touch") === 0L)
  }
}
