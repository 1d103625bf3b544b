package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for the optimization round (deleted or
  * kept out of library paths; not referenced by queries). Reproduces
  * q348's composition with a force+clock around each phase.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def clock[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def force(df: DataFrame): Long = df.count()

    val reps = args.headOption.map(_.toInt).getOrElse(2)
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep")
      graft.operators.CacheScope.scoped {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val edges = clock("edges build+cache") {
          val e = graft.operators.CacheScope.track(
            graft.operators.Cooccur.coEngagementPairs(li,
              "l_orderkey", "l_partkey", maxDegree = 6)
              .select(col("item_a"), col("item_b")))
          force(e); e
        }
        val cc1 = clock("CC(edges) fixpoint") {
          val c = graft.operators.Components
            .connectedComponents(edges, "item_a", "item_b")
          force(c.groupBy("component").agg(count(lit(1))).agg(max("count(1)")))
          c
        }
        val (hubs, filtered) = clock("hubs + filtered") {
          val sym = edges.union(edges.select(col("item_b"), col("item_a")))
          val deg = sym.groupBy(col("item_a").as("node"))
            .agg(count_distinct(col("item_b")).as("deg"))
          val h = deg.orderBy(desc("deg"), col("node")).limit(5)
            .select(col("node").as("__hub"))
          val f = edges
            .join(broadcast(h), col("item_a") === col("__hub"), "left_anti")
            .join(broadcast(h), col("item_b") === col("__hub"), "left_anti")
          force(f)
          (h, f)
        }
        val cc2 = clock("CC(filtered) fixpoint") {
          val c = graft.operators.Components
            .connectedComponents(filtered, "item_a", "item_b")
          force(c.groupBy("component").agg(count(lit(1))).agg(max("count(1)")))
          c
        }
        clock("assortativity") {
          force(graft.operators.Triangles.assortativity(edges, "item_a", "item_b"))
        }
        clock("boundedHops(4)") {
          val items = li.select(col("l_partkey").as("item")).distinct()
          val seeds = items.filter(col("item") % 97 === 0)
          val hops = graft.operators.Components.boundedHops(edges, "item_a",
            "item_b", seeds, "item", maxHops = 4)
          force(hops)
        }
        clock("edge build UNCACHED (cmp)") {
          force(graft.operators.Cooccur.coEngagementPairs(li,
            "l_orderkey", "l_partkey", maxDegree = 6))
        }
      }
    }
    spark.stop()
  }
}
