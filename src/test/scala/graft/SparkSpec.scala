package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for the whole test JVM (ANSI left at the Spark 4
  * default ON — the library must behave reference-like regardless).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def linesDf(lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.toDF("value")
  }
}

/** Builders for GHCN fixed-width fixtures (FIXTURES.md §A1/§A2). */
object GhcnFixtures {

  /** 269-char .dly line: ID[11] year[4] month[2] element[4] + 31×(value[5]
    * right-justified + mflag qflag sflag). None → -9999.
    */
  def dlyLine(id: String, year: Int, month: Int, element: String,
              values: Seq[Option[Int]],
              flags: (Char, Char, Char) = (' ', ' ', ' ')): String = {
    require(values.length <= 31)
    val padded = values.padTo(31, None)
    val header = f"$id%-11s$year%04d$month%02d$element%-4s"
    val slots = padded.map { v =>
      val value = v.getOrElse(-9999)
      f"$value%5d${flags._1}${flags._2}${flags._3}"
    }.mkString
    header + slots
  }

  /** ghcnd-stations.txt line (silver parse positions; 90 chars wide). */
  def stationLine(id: String, lat: Double, lon: Double, elev: Double,
                  state: String, name: String): String = {
    val sb = new StringBuilder(" " * 90)
    def put(pos0: Int, s: String): Unit =
      for ((ch, i) <- s.zipWithIndex if pos0 + i < sb.length) sb.setCharAt(pos0 + i, ch)
    put(0, id)
    put(12, f"$lat%8.4f")
    put(21, f"$lon%9.4f")
    put(31, f"$elev%6.1f")
    put(38, state)
    put(41, name)
    sb.toString
  }
}
