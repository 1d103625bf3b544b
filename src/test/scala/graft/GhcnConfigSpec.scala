package graft

import graft.core.GhcnConfig
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class GhcnConfigSpec extends AnyFunSuite {

  test("fromYaml reads the reference layout; missing keys fall back to defaults") {
    val yaml =
      """processing:
        |  target_state: "NC"
        |  start_year: 2018
        |  end_year: 2022
        |  required_elements: ["TMAX", "TMIN"]
        |storage:
        |  bronze_path: "/tmp/b"
        |quality_checks:
        |  temperature_range:
        |    min: -400
        |    max: 400
        |""".stripMargin
    val f = Files.createTempFile("cfg", ".yaml")
    Files.writeString(f, yaml)
    val cfg = GhcnConfig.fromYaml(f.toString)
    assert(cfg.targetState === "NC")
    assert(cfg.startYear === 2018)
    assert(cfg.endYear === 2022)
    assert(cfg.requiredElements === Seq("TMAX", "TMIN"))
    assert(cfg.storage.bronzePath === "/tmp/b")
    assert(cfg.quality.temperatureMin === -400.0)
    assert(cfg.quality.temperatureMax === 400.0)
    // unspecified keys keep defaults
    assert(cfg.storage.silverPath === "data/silver")
    assert(cfg.quality.precipitationMax === 2000.0)
    assert(cfg.partitionColumns === Seq("year", "month"))
  }

  test("defaults mirror the reference pipeline_config.yaml") {
    val cfg = GhcnConfig()
    assert(cfg.targetState === "GA")
    assert(cfg.startYear === 2015 && cfg.endYear === 2025)
    assert(cfg.requiredElements === Seq("TMAX", "TMIN", "PRCP", "SNOW", "SNWD"))
    assert(cfg.quality.temperatureMin === -500.0)
  }
}
