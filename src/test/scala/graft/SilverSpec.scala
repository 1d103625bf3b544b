package graft

import graft.core.GhcnConfig
import graft.etl.{Bronze, Silver, Validator}
import org.apache.spark.sql.functions._

class SilverSpec extends SparkSpec {
  import GhcnFixtures._

  private def bronzeOf(lines: String*) = Bronze.parseDly(linesDf(lines))

  test("unit conversion divides required elements by 10") {
    val bronze = bronzeOf(
      dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(215))),
      dlyLine("USC00090001", 2020, 1, "PRCP", Seq(Some(130))))
    val cleaned = Silver.cleanAndConvertUnits(Silver.filterRequired(bronze, GhcnConfig().requiredElements))
    val byElem = cleaned.collect().map(r => r.getAs[String]("ELEMENT") -> r.getAs[Double]("VALUE")).toMap
    assert(byElem("TMAX") === 21.5)
    assert(byElem("PRCP") === 13.0)
  }

  test("extreme null-out: temps outside ±50.0, PRCP outside [0,200] — boundaries inclusive-kept") {
    val bronze = bronzeOf(
      dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(500), Some(501), Some(-500), Some(-501))),
      dlyLine("USC00090001", 2020, 1, "PRCP", Seq(Some(0), Some(2000), Some(2001))))
    val cleaned = Silver.cleanAndConvertUnits(bronze)
    val tmax = cleaned.filter(col("ELEMENT") === "TMAX").orderBy("day")
      .collect().map(r => Option(r.getAs[java.lang.Double]("VALUE")))
    assert(tmax.toSeq === Seq(Some(50.0), None, Some(-50.0), None))
    val prcp = cleaned.filter(col("ELEMENT") === "PRCP").orderBy("day")
      .collect().map(r => Option(r.getAs[java.lang.Double]("VALUE")))
    assert(prcp.toSeq === Seq(Some(0.0), Some(200.0), None))
  }

  test("SNOW/SNWD are never nulled by range checks") {
    val bronze = bronzeOf(dlyLine("USC00090001", 2020, 1, "SNOW", Seq(Some(99990))))
    val cleaned = Silver.cleanAndConvertUnits(bronze)
    assert(cleaned.collect()(0).getAs[Double]("VALUE") === 9999.0)
  }

  test("pivot produces one row per (ID,DATE) with element columns") {
    val bronze = bronzeOf(
      dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(250), Some(260))),
      dlyLine("USC00090001", 2020, 1, "TMIN", Seq(Some(100))),
      dlyLine("USC00090001", 2020, 1, "PRCP", Seq(None, Some(40))))
    val cfg = GhcnConfig()
    val cleaned = Silver.cleanAndConvertUnits(Silver.filterRequired(bronze, cfg.requiredElements))
    val pivoted = Silver.pivotElements(cleaned, cfg.requiredElements)
    assert(pivoted.count() === 2)
    val d1 = pivoted.filter(col("day") === 1).collect()(0)
    assert(d1.getAs[Double]("TMAX") === 25.0)
    assert(d1.getAs[Double]("TMIN") === 10.0)
    assert(d1.isNullAt(d1.fieldIndex("PRCP")))
    assert(d1.isNullAt(d1.fieldIndex("SNOW")))
    val d2 = pivoted.filter(col("day") === 2).collect()(0)
    assert(d2.getAs[Double]("PRCP") === 4.0)
  }

  test("stations fixed-width parse incl. the empty-COUNTRY quirk") {
    val st = Silver.parseStations(linesDf(Seq(
      stationLine("USC00090001", 33.1234, -84.5678, 215.5, "GA", "ATLANTA STATION"))))
    val r = st.collect()(0)
    assert(r.getAs[String]("ID") === "USC00090001")
    assert(math.abs(r.getAs[Double]("LATITUDE") - 33.1234) < 1e-9)
    assert(math.abs(r.getAs[Double]("LONGITUDE") - -84.5678) < 1e-9)
    assert(math.abs(r.getAs[Double]("ELEVATION") - 215.5) < 1e-9)
    assert(r.getAs[String]("STATE") === "GA")
    assert(r.getAs[String]("NAME") === "ATLANTA STATION")
    // positions 82-83 sit inside the real layout's WMO field → empty here.
    assert(r.getAs[String]("COUNTRY") === "")
  }

  test("left join keeps observations for stations missing from metadata") {
    val bronze = bronzeOf(dlyLine("USC00099999", 2020, 1, "TMAX", Seq(Some(100))))
    val cfg = GhcnConfig()
    val pivoted = Silver.pivotElements(
      Silver.cleanAndConvertUnits(Silver.filterRequired(bronze, cfg.requiredElements)),
      cfg.requiredElements)
    val stations = Silver.parseStations(linesDf(Seq(
      stationLine("USC00090001", 33.0, -84.0, 100.0, "GA", "OTHER"))))
    val joined = Silver.joinStations(pivoted, stations)
    val r = joined.collect()(0)
    assert(r.isNullAt(r.fieldIndex("LATITUDE")))
    assert(r.getAs[String]("ID") === "USC00099999")
  }

  test("completeness score: /5 with 0.8 penalty when TMAX<TMIN") {
    val bronze = bronzeOf(
      dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(50))),   // 5.0
      dlyLine("USC00090001", 2020, 1, "TMIN", Seq(Some(100))))  // 10.0 > TMAX
    val cfg = GhcnConfig()
    val joined = Silver.joinStations(
      Silver.pivotElements(
        Silver.cleanAndConvertUnits(Silver.filterRequired(bronze, cfg.requiredElements)),
        cfg.requiredElements),
      Silver.parseStations(linesDf(Seq(stationLine("USC00090001", 33.0, -84.0, 1.0, "GA", "X")))))
    val scored = Silver.addQualityMetrics(joined)
    // 2 of 5 elements present = 0.4, inconsistent temps → ×0.8 = 0.32
    assert(math.abs(scored.collect()(0).getAs[Double]("data_quality_score") - 0.32) < 1e-9)
  }

  test("validator re-score overwrites to constant 1.0 (tenths-threshold quirk)") {
    val bronze = bronzeOf(
      dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(50))),
      dlyLine("USC00090001", 2020, 1, "TMIN", Seq(Some(100))))
    val silver = Silver.silver(bronze,
      linesDf(Seq(stationLine("USC00090001", 33.0, -84.0, 1.0, "GA", "X"))))
    // thresholds (±500, 2000) are in tenths but applied to ÷10 values →
    // every row passes → persisted score is 1.0 even for the penalized row.
    assert(silver.collect().forall(_.getAs[Double]("data_quality_score") === 1.0))
  }

  test("silver schema matches declared SILVER_SCHEMA (nullability ignored)") {
    val bronze = bronzeOf(dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(100))))
    val silver = Silver.silver(bronze,
      linesDf(Seq(stationLine("USC00090001", 33.0, -84.0, 1.0, "GA", "X"))))
    assert(Validator.validateSchema(silver, graft.core.GhcnSchemas.SilverSchema))
  }
}
