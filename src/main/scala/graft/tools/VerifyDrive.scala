package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[drive] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.operators.CacheScope.scoped {
      val pairs = graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 2)
        .persist()
      time("pairs") { println("[drive] n_pairs=" + pairs.count()) }
      time("cc-operator") {
        println("[drive] n_nodes=" +
          graft.operators.Components.connectedComponents(pairs, "i", "j").count())
      }
      pairs.unpersist()
    }
    (1 to 2).foreach { i =>
      time(s"q47 full run$i") {
        graft.operators.CacheScope.scoped(
          graft.queries.LlmQueries.queries("q47_dedup_clusters")(spark, dir).count())
      }
    }
    spark.stop()
  }
}
