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
