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
}
