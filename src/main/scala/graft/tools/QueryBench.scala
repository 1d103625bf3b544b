package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: run a subset of SparkEntry.queries with per-query
  * wall time (after the same warmup as Bench). Usage:
  *   sbt "runMain graft.tools.QueryBench q23_dedup_ngram q27_lang_id"
  * Optional env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  * GRAFT_EXPLAIN=1 to print the formatted physical plan.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime()
      val n = graft.operators.CacheScope.scoped { fn(spark, sfDir).count() }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[qbench] $name%-24s $dt%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
