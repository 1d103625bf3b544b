package graft.etl

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Bronze layer: raw GHCN-Daily `.dly` fixed-width text → long-format
  * observation rows.
  *
  * Semantics mirror the reference bit-for-bit
  * (src/transform/bronze_processor.py:44-124):
  *   - header fields by 1-based substring: ID[1,11], year[12,4], month[16,2],
  *     ELEMENT[18,4]
  *   - explode the 31 day slots; slot d starts at 21 + (d-1)*8 + 1 and holds
  *     VALUE(5) MFLAG(1) QFLAG(1) SFLAG(1)
  *   - drop VALUE == -9999 (this also drops NULL VALUE via 3-valued logic —
  *     the reason bronze reports zero missing values,
  *     notebooks/logs/02.output:93)
  *   - DATE = to_date(year || lpad(month) || lpad(day), 'yyyyMMdd'); invalid
  *     calendar slots (Feb 30, Apr 31) become NULL and are filtered
  *
  * Scale design: the reference scans each of its 913 files separately and
  * folds a 913-way union (bronze_processor.py:23-38) — its main perf sin,
  * ~1h25m wall-clock. We pass every path to ONE text scan; Spark's
  * FileSourceScan handles multi-file parallelism natively, so at 100 TB the
  * scan splits by file/block across executors with no plan blow-up. All
  * downstream transforms are narrow (project/generate/filter) and stay in a
  * single whole-stage-codegen span until the write exchange.
  */
object Bronze {

  /** One multi-path text scan → parsed bronze rows. Fold the ingest-time
    * year-range filter (file_extractor.py:76-106) into the scan so pruning
    * happens before the 31-way explode multiplies rows.
    */
  def readDly(spark: SparkSession, paths: Seq[String],
              startYear: Option[Int] = None, endYear: Option[Int] = None): DataFrame = {
    val raw = spark.read.text(paths: _*)
    val lineYear = tryCastInt(substring(col("value"), 12, 4))
    val ranged = Seq(
      startYear.map(s => lineYear >= s),
      endYear.map(e => lineYear <= e)
    ).flatten.reduceOption(_ && _).map(raw.filter).getOrElse(raw)
    parseDly(ranged)
  }

  /** Pure transform: one `value: string` line per row → bronze layout.
    * Column order matches the reference output:
    * ID, year, month, day, ELEMENT, VALUE, MFLAG, QFLAG, SFLAG, DATE.
    */
  def parseDly(lines: DataFrame): DataFrame = {
    // Header projection (bronze_processor.py:50-61).
    val header = lines.select(
      substring(col("value"), 1, 11).as("ID"),
      tryCastInt(substring(col("value"), 12, 4)).as("year"),
      tryCastInt(substring(col("value"), 16, 2)).as("month"),
      substring(col("value"), 18, 4).as("ELEMENT"),
      col("value").as("raw_line")
    )

    // Day explode + computed-offset slices (bronze_processor.py:83-119).
    // substring with a Column position = Column.substr(Column, Column).
    val exploded = header
      .select(col("ID"), col("year"), col("month"), col("ELEMENT"), col("raw_line"),
        explode(sequence(lit(1), lit(31))).as("day"))
      .withColumn("start_pos", lit(21) + (col("day") - 1) * 8 + 1)

    val sliced = exploded.select(
      col("ID"), col("year"), col("month"), col("day"), col("ELEMENT"),
      tryCast(col("raw_line").substr(col("start_pos"), lit(5)), IntegerType).as("VALUE"),
      col("raw_line").substr(col("start_pos") + 5, lit(1)).as("MFLAG"),
      col("raw_line").substr(col("start_pos") + 6, lit(1)).as("QFLAG"),
      col("raw_line").substr(col("start_pos") + 7, lit(1)).as("SFLAG")
    )

    // -9999 drop BEFORE date assembly, like the reference
    // (bronze_processor.py:122); `=!=` also drops NULL VALUE (3VL).
    val nonMissing = sliced.filter(col("VALUE") =!= -9999)

    // Date assembly + invalid-day cull (bronze_processor.py:67-75).
    nonMissing
      .filter(col("day").between(1, 31))
      .withColumn("DATE",
        try_to_date(
          concat(col("year").cast("string"),
            lpad(col("month").cast("string"), 2, "0"),
            lpad(col("day").cast("string"), 2, "0")),
          "yyyyMMdd"))
      .filter(col("DATE").isNotNull)
  }
}
