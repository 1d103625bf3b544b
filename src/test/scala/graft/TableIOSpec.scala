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
}
