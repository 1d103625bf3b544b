package graft

import graft.core.GhcnConfig
import graft.etl.{Bronze, Gold, Silver, Validator}
import graft.io.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end medallion pipeline facade — the user-facing equivalent of the
  * reference's 5 notebooks (ingest → bronze → silver → gold → validation)
  * as one library call per stage.
  *
  * Every stage between source and sink is a pure DataFrame => DataFrame
  * function (see graft.etl._), so each operator is unit-testable without
  * I/O and the whole pipeline composes lazily into Catalyst plans.
  */
final class GhcnPipeline(spark: SparkSession, cfg: GhcnConfig = GhcnConfig()) {

  /** Raw staged .dly files → bronze table on disk. One multi-file scan. */
  def runBronze(dlyPaths: Seq[String]): DataFrame = {
    val bronze = Bronze.readDly(spark, dlyPaths,
      Some(cfg.startYear), Some(cfg.endYear))
    TableIO.write(bronze, cfg.storage.bronzePath,
      partitionBy = cfg.partitionColumns, format = cfg.sinkFormat)
    TableIO.read(spark, cfg.storage.bronzePath, cfg.sinkFormat)
  }

  /** Bronze table → silver table (clean/pivot/enrich/score). */
  def runSilver(stationsFile: String): DataFrame = {
    val bronze = TableIO.read(spark, cfg.storage.bronzePath, cfg.sinkFormat)
    val stationLines = spark.read.text(stationsFile)
    val silver = Silver.silver(bronze, stationLines, cfg)
    TableIO.write(silver, cfg.storage.silverPath,
      partitionBy = cfg.partitionColumns, format = cfg.sinkFormat)
    TableIO.read(spark, cfg.storage.silverPath, cfg.sinkFormat)
  }

  /** Silver table → the 4 gold serving tables. Silver is cached for the
    * 4-way fan-out + the normals self-aggregate (the reference re-scans
    * instead — gold_processor.py:25).
    */
  def runGold(): Map[String, DataFrame] = {
    val silver = TableIO.read(spark, cfg.storage.silverPath, cfg.sinkFormat).cache()
    try {
      val tables = Map(
        "monthly_climate" -> Gold.monthlyClimate(silver),
        "yearly_climate" -> Gold.yearlyClimate(silver),
        "climate_summaries" -> Gold.climateSummaries(silver),
        "ml_features" -> Gold.mlFeatures(silver))
      tables.foreach { case (name, df) =>
        TableIO.write(df, s"${cfg.storage.goldPath}/$name",
          partitionBy = TableIO.goldPartitionColumns(df), format = cfg.sinkFormat)
      }
      tables.map { case (name, _) =>
        name -> TableIO.read(spark, s"${cfg.storage.goldPath}/$name", cfg.sinkFormat)
      }
    } finally silver.unpersist()
  }

  /** Read-only validation pass over the persisted layers — the full
    * notebook-05 report (notebooks/05_data_validation.py:20-265): schema
    * conformance, per-layer counts and distinct stations, element frequency,
    * completeness, anomaly counts, month/year coverage, cross-layer lineage
    * (expected silver rows + station drift), partition footprint, and
    * rule-based recommendations. Counts that the reference derives with
    * separate actions are folded into single aggregate passes per layer.
    */
  def validationReport(): Map[String, Any] = {
    import org.apache.spark.sql.functions._
    // Footprints BEFORE caching: once a path is cached, every read of it —
    // even a fresh one — resolves to an InMemoryRelation through cache
    // substitution, and Dataset.inputFiles finds no file relation in the
    // optimized plan (returns empty).
    val bronzeFootprint =
      Validator.partitionFootprint(TableIO.read(spark, cfg.storage.bronzePath, cfg.sinkFormat))
    val silverFootprint =
      Validator.partitionFootprint(TableIO.read(spark, cfg.storage.silverPath, cfg.sinkFormat))
    val bronze = TableIO.read(spark, cfg.storage.bronzePath, cfg.sinkFormat).cache()
    val silver = TableIO.read(spark, cfg.storage.silverPath, cfg.sinkFormat).cache()
    try {
      val monthly = TableIO.read(spark,
        s"${cfg.storage.goldPath}/monthly_climate", cfg.sinkFormat)

      // One aggregate pass per layer for the scalar stats (the reference
      // runs one action per metric — notebooks/05:37-46). Station counts
      // use countDistinct (NULL-ignoring) consistently on BOTH layers; a
      // NULL ID cannot arise from the fixed-width parse, and if one ever
      // did, both layers would skip it identically.
      val bronzeRow = bronze.agg(
        count(lit(1)).as("records"),
        countDistinct(col("ID")).as("stations"),
        min("year").as("min_year"), max("year").as("max_year"),
        sum(when(col("VALUE").isNull, 1L).otherwise(0L)).as("missing")).collect()(0)
      val silverRow = silver.agg(
        count(lit(1)).as("records"),
        countDistinct(col("ID")).as("stations"),
        min("DATE").as("min_date"), max("DATE").as("max_date"),
        avg("data_quality_score").as("avg_q")).collect()(0)
      val completeness = Validator.completeness(silver)
      val anomalies = Validator.anomalyCounts(silver)
      val bronzePartitions = bronzeFootprint("n_files").asInstanceOf[Long]

      Map(
        "schema_validation" -> Map(
          "bronze_schema" -> Validator.validateSchema(bronze, graft.core.GhcnSchemas.BronzeSchema),
          "silver_schema" -> Validator.validateSchema(silver, graft.core.GhcnSchemas.SilverSchema)),
        "data_quality" -> (Map(
          "bronze_records" -> bronzeRow.getAs[Long]("records"),
          "bronze_stations" -> bronzeRow.getAs[Long]("stations"),
          "bronze_year_range" ->
            (bronzeRow.getAs[Int]("min_year"), bronzeRow.getAs[Int]("max_year")),
          "bronze_missing_values" -> bronzeRow.getAs[Long]("missing"),
          "silver_records" -> silverRow.getAs[Long]("records"),
          "silver_stations" -> silverRow.getAs[Long]("stations"),
          "silver_date_range" ->
            (silverRow.getAs[java.sql.Date]("min_date"), silverRow.getAs[java.sql.Date]("max_date")),
          "avg_quality_score" -> silverRow.getAs[Double]("avg_q"),
          "monthly_records" -> monthly.count()) ++ anomalies),
        "element_distribution" ->
          Validator.frequencyTable(bronze, "ELEMENT").collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap,
        "completeness" -> completeness,
        "coverage" -> Map(
          "months_covered" -> monthly.select("month").distinct().count(),
          "years_covered" -> monthly.select("year").distinct().count(),
          "monthly_agg_issues" ->
            monthly.filter(col("min_temp") > col("max_temp")).count()),
        "lineage" -> Map(
          "expected_silver_records" -> Validator.lineageCardinality(bronze),
          "stations_lost_bronze_to_silver" ->
            Validator.stationDrift(bronze, silver).count()),
        "performance" -> Map(
          "bronze_partitions" -> bronzePartitions,
          "silver_partitions" -> silverFootprint("n_files"),
          "monthly_partitions" -> Validator.partitionFootprint(monthly)("n_files")),
        "recommendations" -> Validator.recommendations(
          anomalies("temperature_anomalies"),
          anomalies("temperature_inconsistent"),
          completeness, bronzePartitions))
    } finally {
      silver.unpersist()
      bronze.unpersist()
    }
  }
}
