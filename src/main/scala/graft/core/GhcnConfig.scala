package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pipeline configuration. Defaults mirror the reference's
  * config/pipeline_config.yaml. Temperature/precip bounds are expressed in
  * tenths (the raw .dly unit) exactly like the reference — note that the
  * validator applies them to already-divided values, which makes the check
  * vacuously pass; that quirk is load-bearing for output parity (see
  * notebooks/03_silver_processing.py:52-54 + config/pipeline_config.yaml:21-25).
  */
final case class QualityChecks(
    temperatureMin: Double = -500.0,
    temperatureMax: Double = 500.0,
    precipitationMax: Double = 2000.0
)

final case class StoragePaths(
    basePath: String = "data",
    rawPath: String = "data/raw/ghcnd_all",
    stationsPath: String = "data/raw",
    bronzePath: String = "data/bronze",
    silverPath: String = "data/silver",
    goldPath: String = "data/gold"
)

final case class GhcnConfig(
    targetState: String = "GA",
    startYear: Int = 2015,
    endYear: Int = 2025,
    requiredElements: Seq[String] = Seq("TMAX", "TMIN", "PRCP", "SNOW", "SNWD"),
    batchSize: Int = 1000,
    quality: QualityChecks = QualityChecks(),
    storage: StoragePaths = StoragePaths(),
    partitionColumns: Seq[String] = Seq("year", "month"),
    sinkFormat: String = "parquet"
)

object GhcnConfig {

  /** Load from a YAML file with the reference's layout
    * (config/pipeline_config.yaml; dotted-path getter semantics as in
    * src/utils/config_loader.py:23-36). Unknown keys are ignored; missing
    * keys fall back to the defaults above.
    */
  def fromYaml(path: String): GhcnConfig = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml
      .load[java.util.Map[String, AnyRef]](Files.newInputStream(Paths.get(path)))
      .asScala

    def section(name: String): Map[String, AnyRef] =
      root.get(name) match {
        case Some(m: java.util.Map[_, _]) =>
          m.asInstanceOf[java.util.Map[String, AnyRef]].asScala.toMap
        case _ => Map.empty
      }
    def str(m: Map[String, AnyRef], k: String, d: String): String =
      m.get(k).map(_.toString).getOrElse(d)
    def int(m: Map[String, AnyRef], k: String, d: Int): Int =
      m.get(k).map(_.toString.toInt).getOrElse(d)
    def dbl(m: Map[String, AnyRef], k: String, d: Double): Double =
      m.get(k).map(_.toString.toDouble).getOrElse(d)

    val proc = section("processing")
    val storage = section("storage")
    val qc = section("quality_checks")
    val perf = section("performance")
    val tempRange = qc.get("temperature_range") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asInstanceOf[java.util.Map[String, AnyRef]].asScala.toMap
      case _ => Map.empty[String, AnyRef]
    }
    val d = GhcnConfig()
    GhcnConfig(
      targetState = str(proc, "target_state", d.targetState),
      startYear = int(proc, "start_year", d.startYear),
      endYear = int(proc, "end_year", d.endYear),
      requiredElements = proc.get("required_elements") match {
        case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
        case _                          => d.requiredElements
      },
      batchSize = int(proc, "batch_size", d.batchSize),
      quality = QualityChecks(
        temperatureMin = dbl(tempRange, "min", d.quality.temperatureMin),
        temperatureMax = dbl(tempRange, "max", d.quality.temperatureMax),
        precipitationMax = dbl(qc, "precipitation_max", d.quality.precipitationMax)
      ),
      storage = StoragePaths(
        basePath = str(storage, "base_path", d.storage.basePath),
        rawPath = str(storage, "raw_path", d.storage.rawPath),
        stationsPath = str(storage, "stations_path", d.storage.stationsPath),
        bronzePath = str(storage, "bronze_path", d.storage.bronzePath),
        silverPath = str(storage, "silver_path", d.storage.silverPath),
        goldPath = str(storage, "gold_path", d.storage.goldPath)
      ),
      partitionColumns = perf.get("partition_columns") match {
        case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
        case _                          => d.partitionColumns
      }
    )
  }
}
