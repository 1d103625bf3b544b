package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold layer: four serving tables off the silver daily table.
  * Reference: src/transform/gold_processor.py.
  *
  * Scale design: each table is a single hash aggregate (partial+final, one
  * shuffle on its group keys). ml_features needs exactly one sort-shuffle
  * (the ID/DATE window) plus a broadcast join against the self-aggregated
  * normals (10k rows). Callers producing all four tables should `.cache()`
  * the silver input first — the reference re-scans silver per table
  * (gold_processor.py:25); with columnar parquet either is fine, but at
  * 100 TB caching the projected columns avoids 4 full scans.
  */
object Gold {

  /** Monthly climate aggregates (gold_processor.py:49-91): 17 agg
    * expressions + 3 derived metrics. `avg((TMAX+TMIN)/2)` is the average of
    * the row-wise mean — NOT (avg+avg)/2 under nulls; preserved.
    */
  def monthlyClimate(silver: DataFrame): DataFrame =
    silver.groupBy("ID", "year", "month", "LATITUDE", "LONGITUDE",
        "ELEVATION", "STATE", "NAME")
      .agg(
        avg("TMAX").as("avg_tmax"),
        avg("TMIN").as("avg_tmin"),
        avg((col("TMAX") + col("TMIN")) / 2).as("avg_temp"),
        min("TMIN").as("min_temp"),
        max("TMAX").as("max_temp"),
        sum("PRCP").as("total_precip"),
        avg("PRCP").as("avg_precip"),
        max("PRCP").as("max_precip"),
        sum("SNOW").as("total_snow"),
        avg("SNOW").as("avg_snow"),
        max("SNOW").as("max_snow"),
        max("SNWD").as("max_snow_depth"),
        count(lit(1)).as("record_count"),
        sum(when(col("PRCP") > 0, 1).otherwise(0)).as("days_with_precip"),
        sum(when(col("SNOW") > 0, 1).otherwise(0)).as("days_with_snow"),
        sum(when(col("SNWD") > 0, 1).otherwise(0)).as("days_with_snow_cover"),
        avg("data_quality_score").as("avg_quality_score"))
      .withColumn("temperature_range", col("max_temp") - col("min_temp"))
      .withColumn("precip_days_pct", col("days_with_precip") / col("record_count") * 100)
      .withColumn("snow_days_pct", col("days_with_snow") / col("record_count") * 100)

  /** Yearly climate aggregates (gold_processor.py:93-135) with extreme-day
    * counts (TMAX>32 °C, TMIN<0 °C, PRCP>25 mm) and derived growing-season /
    * moisture metrics.
    */
  def yearlyClimate(silver: DataFrame): DataFrame =
    silver.groupBy("ID", "year", "LATITUDE", "LONGITUDE",
        "ELEVATION", "STATE", "NAME")
      .agg(
        avg("TMAX").as("avg_tmax"),
        avg("TMIN").as("avg_tmin"),
        avg((col("TMAX") + col("TMIN")) / 2).as("avg_temp"),
        min("TMIN").as("min_temp"),
        max("TMAX").as("max_temp"),
        sum("PRCP").as("annual_precip"),
        avg("PRCP").as("avg_daily_precip"),
        max("PRCP").as("max_daily_precip"),
        sum("SNOW").as("annual_snow"),
        max("SNOW").as("max_daily_snow"),
        max("SNWD").as("max_snow_depth"),
        sum(when(col("TMAX") > 32, 1).otherwise(0)).as("hot_days"),
        sum(when(col("TMIN") < 0, 1).otherwise(0)).as("freezing_days"),
        sum(when(col("PRCP") > 25, 1).otherwise(0)).as("heavy_precip_days"),
        count(lit(1)).as("record_count"),
        avg("data_quality_score").as("avg_quality_score"))
      .withColumn("growing_season_length", lit(365) - col("freezing_days"))
      .withColumn("heat_stress_days", col("hot_days"))
      .withColumn("moisture_index", col("annual_precip") / 1000)

  /** Climate normals across all years (gold_processor.py:137-180).
    * `stddev` is SAMPLE stddev (stddev_samp) in both Spark and the
    * reference. The climate_zone / precipitation_regime CASE buckets send
    * NULL normals to the `otherwise` branch ("Cold"/"Dry") — load-bearing:
    * 8,493 of 10,206 reference rows are "Cold" (logs/04.output:250-258).
    */
  def climateSummaries(silver: DataFrame): DataFrame =
    silver.groupBy("ID", "month", "LATITUDE", "LONGITUDE",
        "ELEVATION", "STATE", "NAME")
      .agg(
        avg("TMAX").as("normal_tmax"),
        avg("TMIN").as("normal_tmin"),
        avg((col("TMAX") + col("TMIN")) / 2).as("normal_temp"),
        avg("PRCP").as("normal_precip"),
        stddev("TMAX").as("tmax_stddev"),
        stddev("TMIN").as("tmin_stddev"),
        stddev("PRCP").as("precip_stddev"),
        min("TMIN").as("record_low"),
        max("TMAX").as("record_high"),
        max("PRCP").as("record_precip"),
        count(lit(1)).as("total_observations"),
        countDistinct("year").as("years_of_data"))
      .withColumn(
        "climate_zone",
        when(col("normal_temp") > 20, "Hot")
          .when(col("normal_temp") > 10, "Temperate")
          .when(col("normal_temp") > 0, "Cool")
          .otherwise("Cold"))
      .withColumn(
        "precipitation_regime",
        when(col("normal_precip") > 5, "Wet")
          .when(col("normal_precip") > 2, "Moderate")
          .otherwise("Dry"))

  /** ML feature table (gold_processor.py:183-238): row-frame lags and
    * rolling windows per station (previous OBSERVED day, not previous
    * calendar day — gaps in the series are preserved), seasonality encodings
    * with the reference's literal 3.14159 (observable in output:
    * month_sin(3) = 0.9999999999991198, not 1.0), and anomalies vs the
    * per-(ID,month) normals self-aggregate joined back via broadcast.
    */
  def mlFeatures(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy("ID").orderBy("DATE")
    val w7 = w.rowsBetween(-6, 0)

    val windowed = silver
      .withColumn("tmax_lag1", lag("TMAX", 1).over(w))
      .withColumn("tmin_lag1", lag("TMIN", 1).over(w))
      .withColumn("prcp_lag1", lag("PRCP", 1).over(w))
      .withColumn("tmax_7day_avg", avg("TMAX").over(w7))
      .withColumn("tmin_7day_avg", avg("TMIN").over(w7))
      .withColumn("prcp_7day_sum", sum("PRCP").over(w7))
      .withColumn("temp_range", col("TMAX") - col("TMIN"))
      .withColumn("day_of_year", dayofyear(col("DATE")))
      .withColumn("month_sin", sin(col("month") * 2 * 3.14159 / 12))
      .withColumn("month_cos", cos(col("month") * 2 * 3.14159 / 12))

    val normals = silver.groupBy("ID", "month").agg(
      avg("TMAX").as("monthly_normal_tmax"),
      avg("TMIN").as("monthly_normal_tmin"),
      avg("PRCP").as("monthly_normal_prcp"))

    windowed
      .join(broadcast(normals), Seq("ID", "month"), "left")
      .withColumn("tmax_anomaly", col("TMAX") - col("monthly_normal_tmax"))
      .withColumn("tmin_anomaly", col("TMIN") - col("monthly_normal_tmin"))
      .withColumn("prcp_anomaly", col("PRCP") - col("monthly_normal_prcp"))
      .select(
        "ID", "DATE", "year", "month", "day", "day_of_year",
        "LATITUDE", "LONGITUDE", "ELEVATION", "STATE",
        "TMAX", "TMIN", "PRCP", "SNOW", "SNWD",
        "tmax_lag1", "tmin_lag1", "prcp_lag1",
        "tmax_7day_avg", "tmin_7day_avg", "prcp_7day_sum",
        "temp_range", "tmax_anomaly", "tmin_anomaly", "prcp_anomaly",
        "month_sin", "month_cos", "data_quality_score")
  }
}
