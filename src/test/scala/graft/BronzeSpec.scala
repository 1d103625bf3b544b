package graft

import graft.etl.Bronze
import org.apache.spark.sql.functions._

class BronzeSpec extends SparkSpec {
  import GhcnFixtures._

  test("parses header fields and day slots at computed offsets") {
    val line = dlyLine("USC00090001", 2020, 1, "TMAX",
      (1 to 31).map(d => Some(d * 10)))
    val out = Bronze.parseDly(linesDf(Seq(line)))
    assert(out.count() === 31)
    val r = out.filter(col("day") === 17).collect()(0)
    assert(r.getAs[String]("ID") === "USC00090001")
    assert(r.getAs[Int]("year") === 2020)
    assert(r.getAs[Int]("month") === 1)
    assert(r.getAs[String]("ELEMENT") === "TMAX")
    assert(r.getAs[Int]("VALUE") === 170)
    assert(r.getAs[java.sql.Date]("DATE").toString === "2020-01-17")
  }

  test("drops -9999 slots and invalid calendar days (Feb 30/31)") {
    // Feb 2021 (non-leap): 28 real values, slots 29-31 hold real-looking
    // values that must be culled by the to_date NULL filter.
    val feb = dlyLine("USC00090001", 2021, 2, "PRCP",
      (1 to 28).map(d => if (d % 5 == 0) None else Some(d)) ++
        Seq(Some(999), Some(999), Some(999)))
    val out = Bronze.parseDly(linesDf(Seq(feb)))
    // 28 days minus the 5 -9999 slots (days 5,10,15,20,25); Feb 29/30/31 gone.
    assert(out.count() === 23)
    assert(out.filter(col("day") > 28).count() === 0)
    assert(out.filter(col("VALUE") === -9999).count() === 0)
  }

  test("leap-year Feb 29 survives") {
    val feb = dlyLine("USC00090001", 2020, 2, "TMAX", (1 to 29).map(Some(_)))
    val out = Bronze.parseDly(linesDf(Seq(feb)))
    assert(out.filter(col("day") === 29).count() === 1)
  }

  test("flags are single chars at value+5/6/7; blanks preserved untrimmed") {
    val line = dlyLine("USC00090001", 2020, 3, "SNOW",
      Seq(Some(5)), flags = ('M', 'Q', 'S'))
    val r = Bronze.parseDly(linesDf(Seq(line))).filter(col("day") === 1).collect()(0)
    assert(r.getAs[String]("MFLAG") === "M")
    assert(r.getAs[String]("QFLAG") === "Q")
    assert(r.getAs[String]("SFLAG") === "S")
    val blank = Bronze.parseDly(linesDf(Seq(
      dlyLine("USC00090001", 2020, 3, "SNOW", Seq(Some(5))))))
      .filter(col("day") === 1).collect()(0)
    assert(blank.getAs[String]("MFLAG") === " ")
  }

  test("bronze column order and types match the reference layout") {
    val out = Bronze.parseDly(linesDf(Seq(
      dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(1))))))
    assert(out.columns.toSeq === Seq("ID", "year", "month", "day", "ELEMENT",
      "VALUE", "MFLAG", "QFLAG", "SFLAG", "DATE"))
    val schemaOk = graft.etl.Validator.validateSchema(out, graft.core.GhcnSchemas.BronzeSchema)
    assert(schemaOk)
  }

  test("malformed lines yield NULL casts, not exceptions (ANSI-safe)") {
    val out = Bronze.parseDly(linesDf(Seq("garbage-short-line")))
    // year/month fail try_cast → DATE null → filtered out entirely.
    assert(out.count() === 0)
  }

  test("multi-line input needs no union: one scan, 913-file semantics") {
    val lines = (1 to 10).map(m =>
      dlyLine(f"USC000900$m%02d", 2020, (m % 12) + 1, "TMAX", (1 to 28).map(Some(_))))
    val out = Bronze.parseDly(linesDf(lines))
    assert(out.select("ID").distinct().count() === 10)
  }
}
