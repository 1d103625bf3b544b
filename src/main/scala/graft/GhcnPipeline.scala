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

  /** Read-only validation pass over the persisted layers — the reference's
    * notebook 05 invariants as a report map.
    */
  def validationReport(): Map[String, Any] = {
    val silver = TableIO.read(spark, cfg.storage.silverPath, cfg.sinkFormat)
    val completeness = Validator.completeness(silver)
    val schemaOk = Validator.validateSchema(silver, graft.core.GhcnSchemas.SilverSchema)
    Map(
      "silver_rows" -> silver.count(),
      "schema_valid" -> schemaOk,
      "completeness" -> completeness)
  }
}
