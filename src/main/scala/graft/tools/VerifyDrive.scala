package graft.tools
import org.apache.spark.sql.SparkSession
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q23_dedup_ngram")(spark, "/root/testdata/sf0.1")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println(s"[drive] q23 final: bhj=${"BroadcastHashJoin".r.findAllIn(plan).length} smj=${"SortMergeJoin".r.findAllIn(plan).length} shj=${"ShuffledHashJoin".r.findAllIn(plan).length} aqe=${plan.contains("AdaptiveSparkPlan isFinalPlan=true")}")
    plan.split("\n").filter(l => l.contains("Join")).take(8).foreach(l => println("[drive] " + l.trim.take(150)))
    spark.stop()
  }
}
