package graft

import graft.io.TableIO
import org.apache.spark.sql.functions._

class TableIOSpec extends SparkSpec {
  import spark.implicits._

  test("write splits a skewed hive partition across multiple files (100 TB guard)") {
    val dir = java.nio.file.Files.createTempDirectory("tableio").toString
    // 1 hot month dominating the table + 2 cold months.
    val skewed = spark.range(0, 200000).select(
      when($"id" < 190000, 1).otherwise(when($"id" < 195000, 2).otherwise(3)).as("month"),
      lit(2024).as("year"),
      $"id".as("v"))
    val prev = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    try TableIO.write(skewed, dir, partitionBy = Seq("year", "month"))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
      case None => spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
    def files(month: Int) =
      new java.io.File(s"$dir/year=2024/month=$month")
        .listFiles().count(_.getName.endsWith(".parquet"))
    // Pre-fix behavior (bare repartition(year, month)) wrote EXACTLY one
    // file per partition value; the rebalance hint must split the hot one.
    assert(files(1) > 1, "hot partition must fan out across tasks")
    assert(spark.read.parquet(dir).count() === 200000)
  }

  test("goldPartitionColumns stays dynamic") {
    val df = Seq((2020, 1, 1.0)).toDF("year", "month", "x")
    assert(TableIO.goldPartitionColumns(df) === Seq("year", "month"))
    assert(TableIO.goldPartitionColumns(df.drop("month")) === Seq("year"))
    assert(TableIO.goldPartitionColumns(df.select("x")) === Seq.empty)
  }

  test("orc round-trip: partitioned write/read is value-identical to parquet") {
    import graft.operators.Profiling
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    TableIO.write(df, s"$dir/orc", partitionBy = Seq("lang"), format = "orc")
    TableIO.write(df, s"$dir/pq", partitionBy = Seq("lang"), format = "parquet")
    def ck(path: String, fmt: String) =
      Profiling.tableChecksum(TableIO.read(spark, path, fmt),
        col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .head.getDecimal(1)
    assert(ck(s"$dir/orc", "orc") === ck(s"$dir/pq", "parquet"))
  }

  test("csv round-trip with explicit schema survives newlines and quotes") {
    import graft.operators.Profiling
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val df = Seq(
      (1L, "plain text"),
      (2L, "embedded \"quotes\" and, commas"),
      (3L, "multi\nline\ntext"),
      (4L, "")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    TableIO.write(df, s"$dir/csv", format = "csv",
      options = Map("header" -> "true", "quoteAll" -> "true", "escape" -> "\""))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val back = TableIO.read(spark, s"$dir/csv", "csv", Some(schema),
      Map("header" -> "true", "multiLine" -> "true", "escape" -> "\""))
    // CSV cannot distinguish empty string from NULL on read — normalize
    // both sides the way a real ingest contract would (coalesce to '')
    def ck(d: org.apache.spark.sql.DataFrame) =
      Profiling.tableChecksum(
        d.select(col("id"), org.apache.spark.sql.functions.coalesce(col("text"),
          org.apache.spark.sql.functions.lit("")).as("text")),
        col("id"), col("text")).head.getDecimal(1)
    assert(ck(back) === ck(df))
  }

  test("publishSnapshot: commit markers make publishes atomic; failed writes stay invisible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pub").toString
    val v1 = TableIO.publishSnapshot(Seq((1L, "a")).toDF("id", "x"), dir)
    assert(v1 === 1L)
    val v2 = TableIO.publishSnapshot(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), dir)
    assert(v2 === 2L)
    assert(TableIO.currentVersion(spark, dir) === Some(2L))
    assert(TableIO.readPublished(spark, dir).count() === 2L)
    // a writer that died after the data write but BEFORE the marker:
    // its directory exists, readers never see it
    Seq((9L, "junk")).toDF("id", "x").write.parquet(s"$dir/v=3")
    assert(TableIO.currentVersion(spark, dir) === Some(2L))
    assert(TableIO.readPublished(spark, dir).count() === 2L)
    // time travel: explicit versions stay readable
    assert(TableIO.readPublished(spark, dir, version = Some(1L)).count() === 1L)
    // the next successful publish claims v3's slot... no: it must skip
    // to an UNUSED committed id — max(marker)+1 = 3, which overwrites
    // the orphan dir (mode overwrite) and then commits it
    val v3 = TableIO.publishSnapshot(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "x"), dir)
    assert(v3 === 3L)
    assert(TableIO.readPublished(spark, dir).count() === 3L)
  }

  test("readPublished on an unpublished dir fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pub_empty").toString
    intercept[IllegalStateException] {
      TableIO.readPublished(spark, dir)
    }
  }

  test("vacuumSnapshots: keeps newest versions, removes orphans, marker first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac").toString
    (1 to 4).foreach(i =>
      TableIO.publishSnapshot(Seq((i.toLong, "r")).toDF("id", "x"), dir))
    // orphan below current (failed publish), plus an in-flight dir above
    Seq((99L, "junk")).toDF("id", "x").write.parquet(s"$dir/v=0")
    Seq((98L, "next")).toDF("id", "x").write.parquet(s"$dir/v=5")
    val removed = TableIO.vacuumSnapshots(spark, dir, keep = 2)
    assert(removed === Seq(0L, 1L, 2L))
    // survivors: v3, v4 committed; v5 in-flight untouched
    assert(TableIO.currentVersion(spark, dir) === Some(4L))
    assert(TableIO.readPublished(spark, dir, version = Some(3L)).count() === 1L)
    intercept[Exception] {
      TableIO.readPublished(spark, dir, version = Some(1L)).count()
    }
    assert(new java.io.File(s"$dir/v=5").exists())
    // idempotent: a second sweep finds nothing
    assert(TableIO.vacuumSnapshots(spark, dir, keep = 2) === Seq.empty)
  }

  test("snapshotSchemaDiff: added/removed/retyped columns, footer-only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sd").toString
    TableIO.publishSnapshot(Seq((1L, "a", 1)).toDF("id", "x", "n"), dir)
    TableIO.publishSnapshot(
      Seq((1L, 2.0, true)).toDF("id", "n", "flag"), dir)
    val d = TableIO.snapshotSchemaDiff(spark, dir, 1L, 2L)
      .orderBy("change", "column").collect()
    assert(d.map(r => (r.getAs[String]("column"), r.getAs[String]("change")))
      .toSeq === Seq(("flag", "added"), ("x", "removed"), ("n", "retyped")))
    val retyped = d.find(_.getAs[String]("column") == "n").get
    assert(retyped.getAs[String]("from_type") === "int")
    assert(retyped.getAs[String]("to_type") === "double")
  }
}
