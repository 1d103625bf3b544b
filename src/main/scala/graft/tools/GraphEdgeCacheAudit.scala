package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B audit for the round-13 verdict's task 6: the graph tier's top
  * wall-times (q105/q207/q251/q269/q281) each rebuild one of two
  * shared derived edge tables from scratch inside one bench process —
  * the revenue-top-3 purchase graph (q105/q207) and the capped
  * co-engagement pair graph (q251/q269/q281). This tool measures the
  * tier twice:
  *
  *  - **A (status quo)**: every query inside its own
  *    `CacheScope.scoped` — the exact Bench/Verify regime;
  *  - **B (shared cache)**: the two base edge tables persisted ONCE up
  *    front (Spark's CacheManager substitutes the cached relation into
  *    every query whose canonicalized plan contains the subtree — the
  *    queries themselves are UNCHANGED), queries run unscoped so the
  *    shared entries survive the tier, `clearCache()` at the end.
  *
  * Output: per-query walls, tier totals, the B build cost, and a
  * per-query RESULT HASH that must be identical across regimes (the
  * adoption gate — a speedup that changes any gated output is a bug,
  * not a win). Paste the table into SCALE.md; adopt only on ≥25%
  * tier-wall reduction with hashes green.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt -batch "runMain graft.tools.GraphEdgeCacheAudit" 2>/dev/null | grep '^|'
  */
object GraphEdgeCacheAudit {

  val Tier = Seq("q105_pagerank", "q207_modularity", "q251_bfs_hops",
    "q269_hub_removal", "q281_graph_datasheet")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm-up

    def hashOf(name: String): (Double, Int) = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, rows.map(_.toString).sorted.mkString("\n").hashCode)
    }

    // ---- A: the Bench/Verify regime (per-query scope) --------------
    val a = Tier.map { name =>
      name -> graft.operators.CacheScope.scoped(hashOf(name))
    }

    // ---- B: shared base edge tables, queries unchanged -------------
    val tB0 = System.nanoTime()
    val co = graft.operators.Cooccur.coEngagementPairs(
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "l_orderkey", "l_partkey", maxDegree = 6).persist()
    co.count()
    val pg = graft.queries.RelationalQueries.purchaseGraphFor(spark, sfDir)
      .persist()
    pg.count()
    val buildWall = (System.nanoTime() - tB0) / 1e9
    val b = Tier.map(name => name -> hashOf(name))
    spark.sharedState.cacheManager.clearCache()

    println("| query | A wall s | B wall s | hash match |")
    println("|---|---|---|---|")
    a.zip(b).foreach { case ((n, (wa, ha)), (_, (wb, hb))) =>
      println(f"| $n | $wa%.1f | $wb%.1f | ${ha == hb} |")
    }
    val ta = a.map(_._2._1).sum
    val tb = b.map(_._2._1).sum + buildWall
    println(f"| TIER TOTAL | $ta%.1f | $tb%.1f (incl. $buildWall%.1f build) " +
      f"| reduction ${100 * (1 - tb / ta)}%.0f%% |")
    spark.stop()
  }
}
