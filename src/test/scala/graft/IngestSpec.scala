package graft

import graft.ingest.GhcnIngest
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}

/** Ingest operators S1-S6 (SURVEY.md §2.1) against local fixtures — the
  * tar extraction path uses a real .tar.gz built with commons-compress.
  */
class IngestSpec extends SparkSpec {
  import GhcnFixtures.dlyLine

  private def makeTarGz(path: String, members: Map[String, String]): Unit = {
    val tar = new TarArchiveOutputStream(new GZIPOutputStream(
      new BufferedOutputStream(new FileOutputStream(path))))
    try members.foreach { case (name, content) =>
      val bytes = content.getBytes("UTF-8")
      val entry = new TarArchiveEntry(name)
      entry.setSize(bytes.length)
      tar.putArchiveEntry(entry)
      tar.write(bytes)
      tar.closeArchiveEntry()
    } finally tar.close()
  }

  test("S2: file integrity — txt, tar.gz, empty, missing") {
    val dir = Files.createTempDirectory("ingest").toString
    val txt = s"$dir/ok.txt"
    Files.writeString(Paths.get(txt), "hello\n")
    assert(GhcnIngest.verifyFileIntegrity(txt))
    val empty = s"$dir/empty.txt"
    Files.writeString(Paths.get(empty), "")
    assert(!GhcnIngest.verifyFileIntegrity(empty))
    val blank = s"$dir/blank.txt"
    Files.writeString(Paths.get(blank), "   \n")
    assert(!GhcnIngest.verifyFileIntegrity(blank))
    val tgz = s"$dir/ok.tar.gz"
    makeTarGz(tgz, Map("a.dly" -> "line"))
    assert(GhcnIngest.verifyFileIntegrity(tgz))
    val badTgz = s"$dir/bad.tar.gz"
    Files.writeString(Paths.get(badTgz), "not a tarball")
    assert(!GhcnIngest.verifyFileIntegrity(badTgz))
    assert(!GhcnIngest.verifyFileIntegrity(s"$dir/missing.txt"))
  }

  test("S3: Spark-side stations state-ID set") {
    val dir = Files.createTempDirectory("ingest").toString
    val stations = s"$dir/ghcnd-stations.txt"
    Files.write(Paths.get(stations), Seq(
      GhcnFixtures.stationLine("USC00090001", 33.0, -84.0, 100.0, "GA", "ATLANTA"),
      GhcnFixtures.stationLine("USC00090002", 34.0, -85.0, 200.0, "GA", "ROME"),
      GhcnFixtures.stationLine("USC00310003", 35.0, -80.0, 150.0, "NC", "CHARLOTTE"))
      .mkString("\n").getBytes("UTF-8"))
    val ids = GhcnIngest.stationIdsForState(spark, stations, "GA")
    assert(ids === Set("USC00090001", "USC00090002"))
  }

  test("S4+S5: tar member-filtered extraction with year-range line filter") {
    val dir = Files.createTempDirectory("ingest").toString
    val tgz = s"$dir/ghcnd_all.tar.gz"
    makeTarGz(tgz, Map(
      "ghcnd_all/USC00090001.dly" -> Seq(
        dlyLine("USC00090001", 2014, 1, "TMAX", Seq(Some(100))),
        dlyLine("USC00090001", 2020, 1, "TMAX", Seq(Some(200)))).mkString("\n"),
      "ghcnd_all/USC00090002.dly" -> // all lines out of range → dropped file
        dlyLine("USC00090002", 1999, 1, "TMAX", Seq(Some(300))),
      "ghcnd_all/USC00310003.dly" -> // not in the station set
        dlyLine("USC00310003", 2020, 1, "TMAX", Seq(Some(400))),
      "ghcnd_all/README.txt" -> "not a dly"))
    val out = s"$dir/extracted"
    val files = GhcnIngest.extractStationFiles(tgz, out,
      Set("USC00090001", "USC00090002"), startYear = 2015, endYear = 2025)
    assert(files.map(f => Paths.get(f).getFileName.toString) === Seq("USC00090001.dly"))
    val lines = Files.readAllLines(Paths.get(files.head))
    assert(lines.size === 1 && lines.get(0).contains("2020"))
  }

  test("S6: .dly file statistics") {
    val dir = Files.createTempDirectory("ingest").toString
    val f = s"$dir/x.dly"
    Files.write(Paths.get(f), Seq(
      dlyLine("USC00090001", 2018, 3, "TMAX", Seq(Some(1))),
      dlyLine("USC00090001", 2021, 11, "TMAX", Seq(Some(2))))
      .mkString("\n").getBytes("UTF-8"))
    val stats = GhcnIngest.fileStatistics(f)
    assert(stats("record_count") === "2")
    assert(stats("start") === "2018-03")
    assert(stats("end") === "2021-11")
  }
}
