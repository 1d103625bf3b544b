package graft

import graft.operators.Timeseries
import org.apache.spark.sql.functions._
import java.sql.Date

/** Calendar densification + LOCF fill. */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("densifyLocf fills gaps, ages them, and spans min..max per key") {
    val obs = Seq(
      ("a", d("2024-01-01"), Some(10.0)),
      ("a", d("2024-01-04"), Some(40.0)),
      ("b", d("2024-02-01"), Some(7.0))
    ).toDF("k", "day", "v")
    val out = Timeseries.densifyLocf(obs, "k", "day", "v")
      .orderBy("k", "day").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getDate(1).toString).toSeq ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(a.map(r => Option(r.get(2))).toSeq ===
      Seq(Some(10.0), None, None, Some(40.0)))
    assert(a.map(_.getAs[Double]("v_filled")).toSeq ===
      Seq(10.0, 10.0, 10.0, 40.0))
    assert(a.map(_.getAs[Long]("days_since_obs")).toSeq === Seq(0L, 1L, 2L, 0L))
    assert(out.count(_.getString(0) == "b") === 1)
  }

  test("observed NULL values carry the previous observation forward") {
    val obs = Seq(
      ("a", d("2024-01-01"), Some(1.0)),
      ("a", d("2024-01-02"), None: Option[Double]),
      ("a", d("2024-01-03"), Some(3.0))
    ).toDF("k", "day", "v")
    val out = Timeseries.densifyLocf(obs, "k", "day", "v")
      .orderBy("day").collect()
    assert(out.map(_.getAs[Double]("v_filled")).toSeq === Seq(1.0, 1.0, 3.0))
    assert(out.map(_.getAs[Long]("days_since_obs")).toSeq === Seq(0L, 1L, 0L))
  }

  test("rows before a key's first non-null observation stay NULL with NULL age") {
    val obs = Seq(
      ("a", d("2024-01-01"), None: Option[Double]),
      ("a", d("2024-01-03"), Some(5.0))
    ).toDF("k", "day", "v")
    val out = Timeseries.densifyLocf(obs, "k", "day", "v")
      .orderBy("day").collect()
    assert(Option(out(0).get(out(0).fieldIndex("v_filled"))) === None)
    assert(Option(out(0).get(out(0).fieldIndex("days_since_obs"))) === None)
    assert(out(2).getAs[Double]("v_filled") === 5.0)
  }

  test("saxMotifs: a repeating low-low-high shape is the dominant word") {
    import org.apache.spark.sql.functions.{col, expr}
    // events per day: pattern 1,1,8 repeated 4 times over days 0..11
    // paaW=1, so frames = days; quartile symbols separate 1 from 8
    val days = (0 until 12).flatMap { day =>
      val n = if (day % 3 == 2) 8 else 1
      Seq.fill(n)(day.toLong)
    }
    val df = days.toDF("day")
    val r = Timeseries.saxMotifs(df, col("day"), paaW = 1, k = 4,
      wordLen = 3).orderBy(org.apache.spark.sql.functions.desc("n_frames"))
      .collect()
    // 10 windows total; the three rotations of (1,1,8)'s symbols repeat
    val total = r.map(_.getAs[Long]("n_frames")).sum
    assert(total === 10L)
    assert(r.head.getAs[Long]("n_frames") >= 3L)
    assert(math.abs(r.map(_.getAs[Double]("support")).sum - 1.0) < 1e-12)
  }

  test("saxMotifs: negative (pre-epoch) buckets use FLOOR frames, not " +
    "truncation — buckets -1 and +1 land in different frames") {
    import org.apache.spark.sql.functions.col
    // Only days -1 and +1 carry events, paaW=2, wordLen=2. Floor
    // frames: -1 -> frame -1, +1 -> frame 0 — two CONTIGUOUS frames,
    // exactly one complete 2-frame word. Truncating DIV would put both
    // days in frame 0 (single frame), yielding ZERO complete words.
    val df = (Seq.fill(3)(-1L) ++ Seq.fill(5)(1L)).toDF("day")
    val r = Timeseries.saxMotifs(df, col("day"), paaW = 2, k = 2,
      wordLen = 2).collect()
    assert(r.map(_.getAs[Long]("n_frames")).sum === 1L)
  }

  test("saxMotifs: words never bridge a gap in the frame sequence") {
    import org.apache.spark.sql.functions.col
    // days 0,1,2 then 10,11,12: two separate runs, no cross-gap word
    val df = (Seq(0L, 1L, 2L) ++ Seq(10L, 11L, 12L))
      .flatMap(d => Seq.fill((d % 4 + 1).toInt)(d)).toDF("day")
    val r = Timeseries.saxMotifs(df, col("day"), paaW = 1, k = 2,
      wordLen = 3).collect()
    // each run of 3 frames yields exactly one complete window
    assert(r.map(_.getAs[Long]("n_frames")).sum === 2L)
  }

  test("simpsonAudit: within-group negative trends reverse a positive pooled trend") {
    import graft.operators.Regression
    import org.apache.spark.sql.functions.col
    // classic construction: each group slopes DOWN, but group B sits
    // up-and-right of group A, so pooled slopes UP
    val d = Seq(
      ("a", 0L, 10L), ("a", 1L, 9L), ("a", 2L, 8L),
      ("b", 10L, 30L), ("b", 11L, 29L), ("b", 12L, 28L)
    ).toDF("g", "x", "y")
    val r = Regression.simpsonAudit(d, "g", col("x"), col("y"))
      .orderBy("g").collect()
    assert(r.forall(_.getAs[Long]("group_sign") === -1L))
    assert(r.forall(_.getAs[Long]("pooled_sign") === 1L))
    assert(r.forall(_.getAs[Boolean]("reversed")))
  }

  test("simpsonAudit: aligned trends and constant groups do not flag") {
    import graft.operators.Regression
    import org.apache.spark.sql.functions.col
    val d = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 5L, 5L), ("b", 6L, 6L),
      ("c", 7L, 7L), ("c", 7L, 7L)).toDF("g", "x", "y")
    val r = Regression.simpsonAudit(d, "g", col("x"), col("y"))
      .orderBy("g").collect()
    assert(r.count(_.getAs[Long]("group_sign") === 1L) === 2)
    assert(r.count(_.getAs[Long]("group_sign") === 0L) === 1) // constant c
    assert(r.forall(!_.getAs[Boolean]("reversed")))
  }
}
