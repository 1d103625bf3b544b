package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle/spill audit over every `SparkEntry.queries` entry — the
  * "measure, don't guess" companion to SCALE.md: per query, the bytes
  * that actually crossed a shuffle boundary, spill to memory/disk, and
  * the LARGEST single-task shuffle read (the hot-partition tell: a
  * query whose max-task read is a large multiple of the fair share has
  * a key funneling one reducer — exactly what kills a 100 TB run long
  * before total bytes do).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.tools.ShuffleAudit" 2>/dev/null | grep '^|'
  * Output: one markdown table row per query (paste into SHUFFLE_AUDIT.md).
  * Set SPARK_GRAFT_ONLY=q105_pagerank,q106_triangles to audit a subset
  * (A/B plan experiments without the full ~6 min sweep).
  */
object ShuffleAudit {

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

    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val spillMem = new AtomicLong
    val spillDisk = new AtomicLong
    val input = new AtomicLong
    val maxTaskRead = new AtomicLong
    val taskCount = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          val r = m.shuffleReadMetrics.totalBytesRead
          shufRead.addAndGet(r)
          maxTaskRead.getAndUpdate(cur => math.max(cur, r))
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          input.addAndGet(m.inputMetrics.bytesRead)
          taskCount.incrementAndGet()
        }
        ()
      }
    })

    def settle(): Unit = {
      var prev = -1L
      var cur = taskCount.get
      while (cur != prev) { Thread.sleep(300); prev = cur; cur = taskCount.get }
    }
    def mb(b: Long): String = f"${b / 1048576.0}%.1f"

    // warm up (codegen, parquet footers) so the audit measures the plans
    spark.range(1000000).selectExpr("sum(id)").collect()

    println("| query | input MB | shuffle write MB | shuffle read MB | max task read MB | spill MB | rows |")
    println("|---|---|---|---|---|---|---|")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      settle()
      Seq(shufWrite, shufRead, spillMem, spillDisk, input, maxTaskRead)
        .foreach(_.set(0L))
      // Bench.measure, not bare count(): for the checksum-action set a
      // count() lets Catalyst eliminate unique-key joins / prune pure
      // projections, and the audit would measure the EMPTIED plan, not
      // the advertised one (rows for those queries report the checksum
      // cardinality, 1).
      val rows =
        try graft.operators.CacheScope.scoped {
          val df = fn(spark, sfDir)
          if (graft.Bench.checksumQueries(name)) {
            graft.Bench.measure(name, df); 1L
          } else df.count()
        }
        catch { case e: Throwable => println(s"| $name | FAILED: ${e.getClass.getSimpleName} |"); -1L }
      if (rows >= 0) {
        settle()
        println(s"| $name | ${mb(input.get)} | ${mb(shufWrite.get)} | " +
          s"${mb(shufRead.get)} | ${mb(maxTaskRead.get)} | " +
          s"${mb(spillMem.get + spillDisk.get)} | $rows |")
      }
    }
    spark.stop()
  }
}
