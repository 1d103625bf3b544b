package graft

import graft.etl.{Bronze, Gold, Silver}
import org.apache.spark.sql.functions._

class GoldSpec extends SparkSpec {
  import GhcnFixtures._

  /** Station with a DATE GAP (day 3 missing): locks the row-frame (not
    * calendar-frame) semantics of lag/rolling.
    */
  private lazy val silverFixture = {
    val bronze = Bronze.parseDly(linesDf(Seq(
      dlyLine("USC00090001", 2020, 1, "TMAX",
        Seq(Some(100), Some(200), None, Some(400), Some(500))),
      dlyLine("USC00090001", 2020, 1, "TMIN",
        Seq(Some(50), Some(60), None, Some(80), Some(90))),
      dlyLine("USC00090001", 2020, 1, "PRCP",
        Seq(Some(10), Some(0), None, Some(30), Some(0))),
      dlyLine("USC00090002", 2020, 1, "TMAX", Seq(Some(300))))))
    Silver.silver(bronze, linesDf(Seq(
      stationLine("USC00090001", 33.0, -84.0, 100.0, "GA", "ONE"),
      stationLine("USC00090002", 34.0, -85.0, 200.0, "GA", "TWO"))))
      .cache()
  }

  test("monthly aggregates: avg of row-wise mean, conditional day counts") {
    val monthly = Gold.monthlyClimate(silverFixture)
      .filter(col("ID") === "USC00090001").collect()(0)
    // TMAX: 10,20,40,50 → avg 30; TMIN: 5,6,8,9 → avg 7
    assert(math.abs(monthly.getAs[Double]("avg_tmax") - 30.0) < 1e-9)
    assert(math.abs(monthly.getAs[Double]("avg_tmin") - 7.0) < 1e-9)
    // avg((TMAX+TMIN)/2) over rows = (7.5+13+24+29.5)/4 = 18.5
    assert(math.abs(monthly.getAs[Double]("avg_temp") - 18.5) < 1e-9)
    assert(monthly.getAs[Long]("record_count") === 4)
    // PRCP: 1.0, 0.0, 3.0, 0.0 → 2 days with precip
    assert(monthly.getAs[Long]("days_with_precip") === 2)
    assert(math.abs(monthly.getAs[Double]("precip_days_pct") - 50.0) < 1e-9)
    assert(math.abs(monthly.getAs[Double]("temperature_range") - (50.0 - 5.0)) < 1e-9)
  }

  test("yearly extreme-day counts and derived metrics") {
    val yearly = Gold.yearlyClimate(silverFixture)
      .filter(col("ID") === "USC00090001").collect()(0)
    // hot_days: TMAX > 32 → days 4 (40) and 5 (50)
    assert(yearly.getAs[Long]("hot_days") === 2)
    assert(yearly.getAs[Long]("freezing_days") === 0)
    assert(yearly.getAs[Long]("growing_season_length") === 365)
    // annual_precip = 4.0 → moisture_index 0.004
    assert(math.abs(yearly.getAs[Double]("moisture_index") - 0.004) < 1e-12)
  }

  test("climate summaries: sample stddev, countDistinct years, NULL→Cold/Dry buckets") {
    val summaries = Gold.climateSummaries(silverFixture)
    val one = summaries.filter(col("ID") === "USC00090001").collect()(0)
    assert(one.getAs[Long]("years_of_data") === 1)
    assert(one.getAs[Long]("total_observations") === 4)
    // normal_temp = 18.5 (>10, ≤20) → Temperate; normal_precip = 1.0 → Dry
    assert(one.getAs[String]("climate_zone") === "Temperate")
    assert(one.getAs[String]("precipitation_regime") === "Dry")
    // sample stddev of TMAX {10,20,40,50}: mean 30, var (400+100+100+400)/3
    val expected = math.sqrt(1000.0 / 3.0)
    assert(math.abs(one.getAs[Double]("tmax_stddev") - expected) < 1e-9)
    // Station TWO has TMAX but no TMIN, so normal_temp = avg((TMAX+TMIN)/2)
    // is NULL → otherwise-bucket "Cold" (gold_processor.py:167-172); no PRCP
    // → normal_precip NULL → "Dry". The NULL routing is the load-bearing quirk.
    val two = summaries.filter(col("ID") === "USC00090002").collect()(0)
    assert(two.getAs[String]("climate_zone") === "Cold")
    assert(two.getAs[String]("precipitation_regime") === "Dry")
  }

  test("ml features: lag/rolling are row-frames across the date gap") {
    val ml = Gold.mlFeatures(silverFixture)
      .filter(col("ID") === "USC00090001").orderBy("DATE").collect()
    // Days present: 1,2,4,5. Row semantics → lag1 of day 4 is day 2 (gap!).
    val day4 = ml(2)
    assert(day4.getAs[Int]("day") === 4)
    assert(day4.getAs[Double]("tmax_lag1") === 20.0)
    // Rolling 7-row avg at day 4 = avg(10,20,40) over the 3 rows seen so far.
    assert(math.abs(day4.getAs[Double]("tmax_7day_avg") - (10.0 + 20.0 + 40.0) / 3) < 1e-9)
    // First row has NULL lag.
    assert(ml(0).isNullAt(ml(0).fieldIndex("tmax_lag1")))
  }

  test("ml features: literal 3.14159 seasonality (not π) and anomalies vs monthly normals") {
    val ml = Gold.mlFeatures(silverFixture)
      .filter(col("ID") === "USC00090001" && col("day") === 1).collect()(0)
    val expectedSin = math.sin(1 * 2 * 3.14159 / 12)
    assert(ml.getAs[Double]("month_sin") === expectedSin)
    assert(ml.getAs[Double]("month_sin") !== math.sin(1 * 2 * math.Pi / 12))
    // tmax_anomaly day1 = 10 - avg(10,20,40,50) = -20
    assert(math.abs(ml.getAs[Double]("tmax_anomaly") - (10.0 - 30.0)) < 1e-9)
  }

  test("ml features: 28 columns in the reference order") {
    val ml = Gold.mlFeatures(silverFixture)
    assert(ml.columns.length === 28)
    assert(ml.columns.take(6).toSeq === Seq("ID", "DATE", "year", "month", "day", "day_of_year"))
    assert(ml.columns.last === "data_quality_score")
  }

  test("gold partition-column selection is dynamic") {
    import graft.io.TableIO
    assert(TableIO.goldPartitionColumns(Gold.monthlyClimate(silverFixture)) === Seq("year", "month"))
    assert(TableIO.goldPartitionColumns(Gold.yearlyClimate(silverFixture)) === Seq("year"))
    assert(TableIO.goldPartitionColumns(Gold.climateSummaries(silverFixture)) === Seq.empty)
  }
}
