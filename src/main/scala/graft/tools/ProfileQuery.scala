package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): runs the named
  * queries with the Bench measurement action, a per-stage metrics
  * listener, and job descriptions, printing a per-query breakdown of
  * wall seconds, job count, stage count, task count, shuffle
  * read/write bytes, and spill. Optionally writes
  * `.explain("formatted")` per query to plans/<tag>/<name>_<suffix>.txt.
  *
  * Usage: runMain graft.tools.ProfileQuery q348_graph_pipeline,q371_bucketed_graph [suffix]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), GRAFT_PROFILE_PLANS=dir to dump plans.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val suffix = if (args.length > 1) args(1) else "before"
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

    // stage metrics accumulated per query label
    case class Acc(var jobs: Int = 0, var stages: Int = 0, var tasks: Int = 0,
                   var shufRead: Long = 0L, var shufWrite: Long = 0L,
                   var spillMem: Long = 0L, var spillDisk: Long = 0L,
                   var input: Long = 0L, var cpuNs: Long = 0L,
                   var runMs: Long = 0L)
    val accs = mutable.LinkedHashMap.empty[String, Acc]
    @volatile var current = "warmup"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        accs.getOrElseUpdate(current, Acc()).jobs += 1
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val a = accs.getOrElseUpdate(current, Acc())
        val m = sc.stageInfo.taskMetrics
        a.stages += 1
        a.tasks += sc.stageInfo.numTasks
        a.shufRead += m.shuffleReadMetrics.totalBytesRead
        a.shufWrite += m.shuffleWriteMetrics.bytesWritten
        a.spillMem += m.memoryBytesSpilled
        a.spillDisk += m.diskBytesSpilled
        a.input += m.inputMetrics.bytesRead
        a.cpuNs += m.executorCpuTime
        a.runMs += m.executorRunTime
      }
    })

    val all = graft.SparkEntry.queries
    val sel = if (names.isEmpty) all.toSeq.sortBy(_._1)
      else names.map(n => n -> all(n))
    val plansDir = sys.env.get("GRAFT_PROFILE_PLANS")
    val walls = mutable.LinkedHashMap.empty[String, Double]
    sel.foreach { case (name, fn) =>
      // one warm pass then the measured pass, mirroring Bench's min-of-N
      // steady state without its full 3-pass cost
      (1 to 2).foreach { p =>
        val label = if (p == 1) s"$name#warm" else name
        current = label
        spark.sparkContext.setJobDescription(label)
        val t0 = System.nanoTime()
        try graft.operators.CacheScope.scoped(
          graft.Bench.measure(name, fn(spark, sfDir)))
        catch { case e: Throwable => println(s"FAILED $name: $e") }
        val w = (System.nanoTime() - t0) / 1e9
        if (p == 2) walls(name) = w
      }
      plansDir.foreach { d =>
        val dir = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(dir)
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
        graft.operators.CacheScope.scoped(())
      }
    }
    println("query".padTo(36, ' ') +
      Seq("wall_s", "jobs", "stg", "tasks", "shR_MB", "shW_MB", "spill_MB",
        "in_MB", "cpu_s", "run_s").map(s => ("%9s" format s)).mkString)
    walls.foreach { case (name, w) =>
      val a = accs.getOrElse(name, Acc())
      println(f"$name%-36s $w%8.3f ${a.jobs}%5d ${a.stages}%5d ${a.tasks}%6d ${a.shufRead / 1e6}%8.2f ${a.shufWrite / 1e6}%8.2f ${(a.spillMem + a.spillDisk) / 1e6}%9.2f ${a.input / 1e6}%8.2f ${a.cpuNs / 1e9}%7.2f ${a.runMs / 1e3}%7.2f [PROF]")
    }
    spark.stop()
  }
}
