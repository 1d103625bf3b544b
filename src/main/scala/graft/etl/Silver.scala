package graft.etl

import graft.core.GhcnConfig
import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver layer: bronze long-format observations → cleaned, pivoted,
  * station-enriched wide daily table.
  *
  * Reference: src/transform/silver_processor.py. The persisted
  * data_quality_score is NOT the completeness score computed here — notebook
  * 03 overwrites it with DataValidator's validity-based score afterwards
  * (notebooks/03_silver_processing.py:52-54); see [[Validator.rescore]] and
  * [[silver]] which wires the notebook order.
  *
  * Scale design: the pivot with an explicit value list is a single
  * partial+final HashAggregate (one shuffle on the group keys, no extra
  * distinct-scan job). The station dimension (~1.4k rows after state filter,
  * ~129k worldwide) is broadcast — at 1000 executors the fact side never
  * shuffles for this join.
  */
object Silver {

  /** ELEMENT membership filter (silver_processor.py:28) — pushed to the
    * bronze parquet scan by Catalyst.
    */
  def filterRequired(bronze: DataFrame, elements: Seq[String]): DataFrame =
    bronze.filter(col("ELEMENT").isin(elements: _*))

  /** Unit conversion (tenths → physical units) and extreme-value null-out
    * (silver_processor.py:50-77). Bounds are deliberately the reference's:
    * temps outside [-50.0, 50.0] °C → NULL; PRCP outside [0, 200.0] mm →
    * NULL (SNOW/SNWD are never nulled). DATE is recomputed identically to
    * bronze (a no-op on real data, preserved for parity).
    */
  def cleanAndConvertUnits(df: DataFrame): DataFrame = {
    val converted = df.withColumn(
      "VALUE",
      when(col("ELEMENT").isin("TMAX", "TMIN"), col("VALUE") / 10.0)
        .when(col("ELEMENT").isin("PRCP", "SNOW", "SNWD"), col("VALUE") / 10.0)
        .otherwise(col("VALUE")))

    val nulledOut = converted.withColumn(
      "VALUE",
      when(col("ELEMENT").isin("TMAX", "TMIN") &&
        (col("VALUE") < -50.0 || col("VALUE") > 50.0), lit(null))
        .when(col("ELEMENT") === "PRCP" &&
          (col("VALUE") < 0.0 || col("VALUE") > 200.0), lit(null))
        .otherwise(col("VALUE")))

    nulledOut.withColumn(
      "DATE",
      try_to_date(
        concat(col("year").cast("string"),
          lpad(col("month").cast("string"), 2, "0"),
          lpad(col("day").cast("string"), 2, "0")),
        "yyyyMMdd"))
  }

  /** Long → wide pivot on ELEMENT with an explicit value list
    * (silver_processor.py:79-84). `first(VALUE)` matches the reference; it
    * is order-sensitive under duplicate (ID,DATE,ELEMENT) keys, which do not
    * occur in GHCN data.
    */
  def pivotElements(df: DataFrame, elements: Seq[String]): DataFrame =
    df.groupBy("ID", "DATE", "year", "month", "day")
      .pivot("ELEMENT", elements)
      .agg(first(col("VALUE")))

  /** Fixed-width parse of ghcnd-stations.txt lines
    * (silver_processor.py:100-108). The "COUNTRY" slice at [82,2] lands
    * inside the WMO-ID field of the real GHCN layout and parses as empty
    * string — the reference's (mis)behavior, preserved bit-for-bit.
    */
  def parseStations(lines: DataFrame): DataFrame =
    lines.select(
      trim(substring(col("value"), 1, 11)).as("ID"),
      tryCastDouble(substring(col("value"), 13, 8)).as("LATITUDE"),
      tryCastDouble(substring(col("value"), 22, 9)).as("LONGITUDE"),
      tryCastDouble(substring(col("value"), 32, 6)).as("ELEVATION"),
      trim(substring(col("value"), 39, 2)).as("STATE"),
      trim(substring(col("value"), 42, 30)).as("NAME"),
      trim(substring(col("value"), 82, 2)).as("COUNTRY")
    )

  /** Station enrichment: LEFT join on ID (silver_processor.py:116-119).
    * Explicit broadcast of the dimension — semantically identical, and at
    * cluster scale it pins the plan to BroadcastHashJoin regardless of
    * autoBroadcastJoinThreshold.
    */
  def joinStations(fact: DataFrame, stations: DataFrame): DataFrame =
    fact.join(broadcast(stations), Seq("ID"), "left")

  /** Transient completeness-based quality score + temp-consistency penalty
    * (silver_processor.py:121-142). NOTE: overwritten by the validator score
    * before persisting (notebook 03 order) — both passes exist for parity.
    */
  def addQualityMetrics(df: DataFrame): DataFrame = {
    val scored = df.withColumn(
      "data_quality_score",
      (col("TMAX").isNotNull.cast("int") +
        col("TMIN").isNotNull.cast("int") +
        col("PRCP").isNotNull.cast("int") +
        col("SNOW").isNotNull.cast("int") +
        col("SNWD").isNotNull.cast("int")) / 5.0)

    val flagged = scored.withColumn(
      "temp_consistent",
      when(col("TMAX").isNull || col("TMIN").isNull, true)
        .when(col("TMAX") >= col("TMIN"), true)
        .otherwise(false))

    flagged
      .withColumn(
        "data_quality_score",
        when(col("temp_consistent") === false, col("data_quality_score") * 0.8)
          .otherwise(col("data_quality_score")))
      .drop("temp_consistent")
  }

  /** Full bronze→silver path in notebook-03 order: filter → clean → pivot →
    * station join → completeness score → validator re-score (the persisted
    * score).
    */
  def silver(bronze: DataFrame, stationLines: DataFrame, cfg: GhcnConfig = GhcnConfig()): DataFrame = {
    val cleaned = cleanAndConvertUnits(filterRequired(bronze, cfg.requiredElements))
    val pivoted = pivotElements(cleaned, cfg.requiredElements)
    val enriched = joinStations(pivoted, parseStations(stationLines))
    Validator.rescore(addQualityMetrics(enriched), cfg)
  }
}
