package graft

import graft.etl.Bronze
import org.apache.spark.sql.functions._

/** Property-style tests for the .dly parse (SURVEY.md §5): every generated
  * (day, value) slot lands in exactly one bronze row; -9999 and invalid
  * calendar slots never survive. Inputs come from a seeded generator so
  * failures reproduce exactly (the scalatest↔scalacheck bridge artifact is
  * not in the offline cache, so generation is hand-rolled).
  */
class BronzePropertySpec extends SparkSpec {
  import GhcnFixtures.dlyLine

  private def daysIn(year: Int, month: Int): Int =
    java.time.YearMonth.of(year, month).lengthOfMonth()

  private case class Case(id: String, year: Int, month: Int, element: String,
                          values: Seq[Option[Int]])

  private def genCases(n: Int, seed: Long): Seq[Case] = {
    val rnd = new scala.util.Random(seed)
    val ids = Seq("USC00090001", "USW00013874", "US1GAAP0001")
    val elements = Seq("TMAX", "TMIN", "PRCP", "SNOW", "SNWD")
    (0 until n).map { _ =>
      Case(
        ids(rnd.nextInt(ids.length)),
        1990 + rnd.nextInt(36),
        1 + rnd.nextInt(12),
        elements(rnd.nextInt(elements.length)),
        Seq.fill(31)(if (rnd.nextBoolean()) Some(rnd.nextInt(5501) - 500) else None))
    }
  }

  test("parse round-trip: every valid slot appears exactly once with its value") {
    // one multi-line frame = one parse job for all 40 generated cases
    val cases = genCases(40, seed = 20260812L).zipWithIndex.map {
      case (c, i) => c.copy(id = f"USC00${i}%06d") // unique id per case
    }
    val lines = cases.map(c => dlyLine(c.id, c.year, c.month, c.element, c.values))
    val rows = Bronze.parseDly(linesDf(lines))
      .select("ID", "year", "month", "day", "VALUE", "ELEMENT")
      .collect()
      .groupBy(_.getAs[String]("ID"))

    cases.foreach { c =>
      val expected = c.values.zipWithIndex.collect {
        case (Some(v), idx) if v != -9999 && idx + 1 <= daysIn(c.year, c.month) =>
          (idx + 1) -> v
      }.toMap
      val got = rows.getOrElse(c.id, Array.empty)
      val actual = got.map(r => r.getAs[Int]("day") -> r.getAs[Int]("VALUE")).toMap
      assert(got.length === actual.size, s"${c.id}: duplicate day rows")
      assert(actual === expected, s"${c.id}: slot mismatch (case $c)")
      got.foreach { r =>
        assert(r.getAs[Int]("year") === c.year)
        assert(r.getAs[Int]("month") === c.month)
        assert(r.getAs[String]("ELEMENT") === c.element)
      }
    }
  }

  test("no -9999 and no invalid calendar day ever survives") {
    val cases = genCases(12, seed = 424242L)
    val lines = cases.map { c =>
      val values = Some(-9999) +: (2 to 31).map(d => Some(d * 10))
      dlyLine(c.id, c.year, c.month, "TMAX", values)
    }
    val out = Bronze.parseDly(linesDf(lines)).cache()
    try {
      assert(out.filter(col("VALUE") === -9999).count() === 0)
      assert(out.filter(col("DATE").isNull).count() === 0)
      // no row's day exceeds its month's length
      val bad = out.filter(
        col("day") > dayofmonth(last_day(col("DATE")))).count()
      assert(bad === 0)
    } finally out.unpersist()
  }
}
