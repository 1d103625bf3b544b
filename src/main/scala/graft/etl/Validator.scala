package graft.etl

import graft.core.GhcnConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data-quality validation. Reference: src/utils/data_validator.py.
  *
  * The range thresholds come from config in TENTHS (−500..500, 2000) but are
  * applied to already-÷10 silver values, so the checks can't fail on real
  * data and the persisted score is constant 1.0 (logs/03.output:161-170).
  * That quirk is intentional and preserved — [[rescore]] is what notebook 03
  * persists, not [[Silver.addQualityMetrics]].
  */
object Validator {

  /** data_validator.py:14-33 — NULL is valid; in-range is valid. */
  def validateTemperatureRange(df: DataFrame, cfg: GhcnConfig = GhcnConfig()): DataFrame = {
    def valid(c: String) =
      when(col(c).isNull, true)
        .when(col(c) >= cfg.quality.temperatureMin &&
          col(c) <= cfg.quality.temperatureMax, true)
        .otherwise(false)
    df.withColumn("valid_tmax", valid("TMAX"))
      .withColumn("valid_tmin", valid("TMIN"))
  }

  /** data_validator.py:35-45. */
  def validatePrecipitation(df: DataFrame, cfg: GhcnConfig = GhcnConfig()): DataFrame =
    df.withColumn(
      "valid_prcp",
      when(col("PRCP").isNull, true)
        .when(col("PRCP") >= 0 && col("PRCP") <= cfg.quality.precipitationMax, true)
        .otherwise(false))

  /** data_validator.py:47-59 — score = mean of the 3 validity booleans;
    * flags dropped afterwards.
    */
  def calculateQualityScore(df: DataFrame): DataFrame =
    df.withColumn(
        "data_quality_score",
        (col("valid_tmax").cast("int") +
          col("valid_tmin").cast("int") +
          col("valid_prcp").cast("int")) / 3.0)
      .drop("valid_tmax", "valid_tmin", "valid_prcp")

  /** Notebook-03 composite (notebooks/03_silver_processing.py:52-54): the
    * score that actually gets persisted to silver.
    */
  def rescore(df: DataFrame, cfg: GhcnConfig = GhcnConfig()): DataFrame =
    calculateQualityScore(validatePrecipitation(validateTemperatureRange(df, cfg), cfg))

  /** Schema conformance: name→dataType map compare; extra columns ignored;
    * nullability ignored (data_validator.py:61-84).
    */
  def validateSchema(df: DataFrame, expected: StructType): Boolean = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val exp = expected.fields.map(f => f.name -> f.dataType).toMap
    val missing = exp.keySet -- actual.keySet
    missing.isEmpty && exp.forall { case (n, t) => actual(n) == t }
  }

  /** Completeness % per key column (data_validator.py:86-97). One-pass
    * variant: count(col) skips NULLs, so a single aggregate job replaces the
    * reference's 1+5 count actions.
    */
  def completeness(df: DataFrame, columns: Seq[String] = Seq("TMAX", "TMIN", "PRCP", "SNOW", "SNWD")): Map[String, Double] = {
    val present = columns.filter(df.columns.contains)
    if (present.isEmpty) return Map.empty
    val aggs = count(lit(1)).as("__total") +:
      present.map(c => count(col(c)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getAs[Long]("__total")
    present.map { c =>
      c -> (if (total > 0) row.getAs[Long](c).toDouble / total * 100 else 0.0)
    }.toMap
  }

  /** A9 — frequency table: groupBy-count sorted by descending count
    * (notebooks/05_data_validation.py:43, 02:65, 03:36).
    */
  def frequencyTable(df: DataFrame, column: String): DataFrame =
    df.groupBy(column).count().orderBy(desc("count"), col(column))

  /** A6/A7 — global min/max/avg over the named columns in ONE aggregate
    * pass (the reference runs one agg action per block:
    * bronze_processor.py:152-155, silver_processor.py:166-170).
    * Returns (min_col, max_col, avg_col) keyed maps.
    */
  def globalStats(df: DataFrame, minMaxCols: Seq[String],
                  avgCols: Seq[String] = Seq.empty): Map[String, Any] = {
    val aggs =
      minMaxCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
        avgCols.map(c => avg(col(c)).as(s"avg_$c"))
    if (aggs.isEmpty) return Map.empty
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    row.schema.fieldNames.map(n => n -> row.getAs[Any](n)).toMap
  }

  /** A10 — lineage cardinality: distinct (ID, DATE) pair count = the row
    * count silver is expected to have (notebooks/05:179-180).
    */
  def lineageCardinality(bronze: DataFrame,
                         keys: Seq[String] = Seq("ID", "DATE")): Long =
    bronze.groupBy(keys.map(col): _*).count().count()

  /** A11 — describe() summary stats (notebooks/05:64,98). */
  def describeStats(df: DataFrame, columns: String*): DataFrame =
    df.describe(columns: _*)

  /** U2 — cross-layer station drift as a Spark set difference instead of
    * the reference's driver-side collected-set subtraction
    * (notebooks/05:183-187): IDs present upstream but missing downstream.
    */
  def stationDrift(upstream: DataFrame, downstream: DataFrame,
                   keyCol: String = "ID"): DataFrame =
    upstream.select(keyCol).distinct()
      .except(downstream.select(keyCol).distinct())

  /** M4 — partition/file footprint introspection (notebooks/05:193-209). */
  def partitionFootprint(df: DataFrame): Map[String, Any] = {
    val files = df.inputFiles
    Map("n_files" -> files.length.toLong,
      "example_files" -> files.take(3).toSeq)
  }

  /** Notebook-05 anomaly counts (temperature anomalies/inconsistencies,
    * extreme/negative precipitation, low-quality rows — notebooks/05:80-107)
    * in ONE aggregate pass instead of five count() actions.
    */
  def anomalyCounts(silver: DataFrame,
                    lowQualityThreshold: Double = 0.3): Map[String, Long] = {
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val row = silver.agg(
      cnt(col("TMAX") < -30 || col("TMAX") > 45 ||
        col("TMIN") < -35 || col("TMIN") > 30).as("temperature_anomalies"),
      cnt(col("TMAX").isNotNull && col("TMIN").isNotNull &&
        col("TMAX") < col("TMIN")).as("temperature_inconsistent"),
      cnt(col("PRCP") > 100).as("extreme_precipitation"),
      cnt(col("PRCP") < 0).as("negative_precipitation"),
      cnt(col("data_quality_score") < lowQualityThreshold).as("low_quality_records")
    ).collect()(0)
    row.schema.fieldNames.map(n => n -> row.getAs[Long](n)).toMap
  }

  /** Rule-based recommendations over the report metrics
    * (notebooks/05:243-265).
    */
  def recommendations(tempAnomalies: Long, tempInconsistent: Long,
                      completeness: Map[String, Double],
                      bronzePartitions: Long): Seq[String] = {
    val recs = Seq(
      (tempAnomalies > 100) ->
        "High number of temperature anomalies detected - review data sources",
      (tempInconsistent > 0) ->
        "Temperature inconsistencies found - implement stricter validation",
      completeness.values.exists(_ < 80) ->
        "Low data completeness for some elements - consider data imputation",
      (bronzePartitions > 200) ->
        "Too many partitions may cause small file problem - consider repartitioning"
    ).collect { case (true, msg) => msg }
    if (recs.isEmpty) Seq("All validation checks passed - data quality is good")
    else recs
  }

  /** IQR outlier flag via approxQuantile (Greenwald–Khanna, the same
    * algorithm the reference calls; data_validator.py:99-115).
    */
  def detectOutliers(df: DataFrame, column: String): DataFrame = {
    val quantiles = df.select(column).na.drop()
      .stat.approxQuantile(column, Array(0.25, 0.75), 0.05)
    if (quantiles.length == 2) {
      val Array(q1, q3) = quantiles
      val iqr = q3 - q1
      val lower = q1 - 1.5 * iqr
      val upper = q3 + 1.5 * iqr
      df.withColumn(
        s"${column}_outlier",
        when(col(column).isNull, false)
          .when(col(column) < lower || col(column) > upper, true)
          .otherwise(false))
    } else df
  }
}
