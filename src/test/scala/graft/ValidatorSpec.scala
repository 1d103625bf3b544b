package graft

import graft.etl.Validator
import graft.io.Batcher
import java.sql.Date
import org.apache.spark.sql.functions._

class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val silverish = Seq(
    // ID, DATE, TMAX, TMIN, PRCP, score
    ("S1", Date.valueOf("2020-01-01"), Some(50.0), Some(10.0), Some(120.0), 1.0),
    ("S1", Date.valueOf("2020-01-02"), Some(5.0), Some(8.0), Some(-1.0), 1.0), // TMAX<TMIN, neg PRCP
    ("S2", Date.valueOf("2020-02-01"), None, None, Some(10.0), 0.2)
  ).toDF("ID", "DATE", "TMAX", "TMIN", "PRCP", "data_quality_score")

  test("A9 frequencyTable sorts by descending count") {
    val freq = Validator.frequencyTable(silverish, "ID").collect()
    assert(freq.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("S1", 2L), ("S2", 1L)))
  }

  test("A6/A7 globalStats: min/max/avg in one pass") {
    val stats = Validator.globalStats(silverish, Seq("DATE"),
      avgCols = Seq("data_quality_score"))
    assert(stats("min_DATE") === Date.valueOf("2020-01-01"))
    assert(stats("max_DATE") === Date.valueOf("2020-02-01"))
    assert(math.abs(stats("avg_data_quality_score").asInstanceOf[Double] - 2.2 / 3) < 1e-12)
  }

  test("A10 lineageCardinality counts distinct (ID, DATE) pairs") {
    val dup = silverish.union(silverish.limit(1))
    assert(Validator.lineageCardinality(dup) === 3L)
  }

  test("A11 describeStats returns the 5 describe rows") {
    val d = Validator.describeStats(silverish, "TMAX").collect()
    assert(d.map(_.getString(0)).toSet ===
      Set("count", "mean", "stddev", "min", "max"))
  }

  test("notebook-05 anomaly counts in one aggregate pass") {
    val counts = Validator.anomalyCounts(silverish)
    assert(counts("temperature_anomalies") === 1L) // TMAX=50 > 45
    assert(counts("temperature_inconsistent") === 1L) // 5 < 8
    assert(counts("extreme_precipitation") === 1L) // 120 > 100
    assert(counts("negative_precipitation") === 1L)
    assert(counts("low_quality_records") === 1L) // 0.2 < 0.3
  }

  test("U2 stationDrift is an engine-side set difference") {
    val up = Seq("S1", "S2", "S3").toDF("ID")
    val down = silverish
    val drift = Validator.stationDrift(up, down).as[String].collect()
    assert(drift.toSeq === Seq("S3"))
  }

  test("M4 partitionFootprint reports input files for a persisted table") {
    val dir = java.nio.file.Files.createTempDirectory("footprint").toString
    silverish.write.mode("overwrite").parquet(dir)
    val fp = Validator.partitionFootprint(spark.read.parquet(dir))
    assert(fp("n_files").asInstanceOf[Long] >= 1L)
  }

  test("recommendations: rule triggers and all-clear") {
    val bad = Validator.recommendations(200, 1, Map("TMAX" -> 50.0), 300)
    assert(bad.size === 4)
    val ok = Validator.recommendations(0, 0, Map("TMAX" -> 95.0), 100)
    assert(ok === Seq("All validation checks passed - data quality is good"))
  }

  test("O4 Batcher processes in limit/offset batches and unions results") {
    val df = spark.range(0, 10).toDF("id")
    val out = Batcher.batchProcess(df, batchSize = 3)(b => b.withColumn("x", col("id") * 2))
    assert(out.count() === 10)
    assert(out.agg(sum("x")).collect()(0).getLong(0) === 90L)
  }
}
