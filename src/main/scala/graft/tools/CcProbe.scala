package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = mutable.Map.empty[Int, (Long, String)]
    @volatile var on = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("-"))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.remove(je.jobId).foreach { case (t0, d) =>
          if (on) println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
        }
      }
    })
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = graft.operators.CacheScope.track(
      graft.operators.Cooccur.coEngagementPairs(li,
        "l_orderkey", "l_partkey", maxDegree = 6)
        .select(col("item_a"), col("item_b")))
    edges.count(); // warm cache
    val t0 = System.nanoTime()
    val c0 = graft.operators.Components.connectedComponents(edges, "item_a", "item_b")
    c0.count()
    println(f"warm cc ${(System.nanoTime()-t0)/1e9}%.2f s")
    on = true
    val t1 = System.nanoTime()
    val c = graft.operators.Components.connectedComponents(edges, "item_a", "item_b")
    println("rows=" + c.count() + f" total ${(System.nanoTime()-t1)/1e9}%.2f s")
    graft.operators.CacheScope.scoped(())
    spark.stop()
  }
}
