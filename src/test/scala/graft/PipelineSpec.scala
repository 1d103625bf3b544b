package graft

import graft.core.{GhcnConfig, StoragePaths}
import java.nio.file.{Files, Paths}

/** End-to-end medallion pipeline: fixture .dly + stations → bronze →
  * silver → gold → notebook-05 validation report. Locks the facade and
  * the cross-layer invariants the reference's validation notebook checks.
  */
class PipelineSpec extends SparkSpec {
  import GhcnFixtures._

  private lazy val (pipe, report) = {
    val base = Files.createTempDirectory("pipe").toString
    val dlyPath = s"$base/USC00090001.dly"
    Files.write(Paths.get(dlyPath), Seq(
      dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(100), Some(200), None, Some(400))),
      dlyLine("USC00090001", 2020, 1, "TMIN", Seq(Some(50), Some(60), None, Some(80))),
      dlyLine("USC00090001", 2020, 1, "PRCP", Seq(Some(10), Some(0), None, Some(1200))),
      dlyLine("USC00090002", 2020, 2, "TMAX", Seq(Some(300))),
      // out of configured year range → must be filtered at scan time
      dlyLine("USC00090001", 1990, 1, "TMAX", Seq(Some(999))))
      .mkString("\n").getBytes("UTF-8"))
    val stPath = s"$base/stations.txt"
    Files.write(Paths.get(stPath), Seq(
      stationLine("USC00090001", 33.0, -84.0, 100.0, "GA", "ONE"),
      stationLine("USC00090002", 34.0, -85.0, 200.0, "GA", "TWO"))
      .mkString("\n").getBytes("UTF-8"))
    val cfg = GhcnConfig(storage = StoragePaths(
      bronzePath = s"$base/bronze", silverPath = s"$base/silver",
      goldPath = s"$base/gold"))
    val p = new GhcnPipeline(spark, cfg)
    p.runBronze(Seq(dlyPath))
    p.runSilver(stPath)
    p.runGold()
    (p, p.validationReport())
  }

  private def section(name: String): Map[String, Any] =
    report(name).asInstanceOf[Map[String, Any]]

  test("bronze/silver layers persist with valid schemas and year filter applied") {
    val dq = section("data_quality")
    assert(dq("bronze_records") === 10L) // 1990 line filtered pre-explode
    assert(dq("bronze_stations") === 2L)
    assert(dq("silver_records") === 4L) // distinct (ID, DATE)
    assert(section("schema_validation") ===
      Map("bronze_schema" -> true, "silver_schema" -> true))
  }

  test("cross-layer lineage holds: expected silver rows = distinct (ID, DATE)") {
    val lineage = section("lineage")
    assert(lineage("expected_silver_records") === 4L)
    assert(lineage("stations_lost_bronze_to_silver") === 0L)
  }

  test("anomaly counters see the planted extreme precipitation") {
    val dq = section("data_quality")
    assert(dq("extreme_precipitation") === 1L) // 120.0 mm > 100
    assert(dq("negative_precipitation") === 0L)
    assert(dq("temperature_inconsistent") === 0L)
  }

  test("element frequency and coverage reflect the fixture") {
    assert(report("element_distribution") ===
      Map("TMAX" -> 4L, "TMIN" -> 3L, "PRCP" -> 3L))
    val cov = section("coverage")
    assert(cov("months_covered") === 2L)
    assert(cov("years_covered") === 1L)
    assert(cov("monthly_agg_issues") === 0L)
  }

  test("partition footprint is non-empty for every layer") {
    val perf = section("performance")
    Seq("bronze_partitions", "silver_partitions", "monthly_partitions").foreach { k =>
      assert(perf(k).asInstanceOf[Long] >= 1L, s"$k must see files")
    }
  }
}
