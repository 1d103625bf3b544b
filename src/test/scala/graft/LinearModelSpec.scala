package graft

import graft.operators.LinearModel
import org.apache.spark.sql.functions._

class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  // Linearly separable 2-feature data with margin: label = [x0 + x1 > 1].
  // Deterministic grid (no RNG — reproducible like everything else here).
  private lazy val separable = {
    val rows = for {
      i <- 0 until 20; j <- 0 until 20
      x0 = i / 20.0; x1 = j / 20.0
      if math.abs(x0 + x1 - 1.0) > 0.08 // margin band excluded
    } yield (x0, x1, if (x0 + x1 > 1.0) 1 else 0)
    rows.toDF("x0", "x1", "y")
  }

  test("train reaches high accuracy on separable data and loss decreases") {
    val cols = Seq("x0", "x1")
    val m0 = LinearModel.Model(Array(0.0, 0.0), 0.0)
    val loss0 = LinearModel.logLoss(separable, cols, "y", m0)
    val m = LinearModel.train(separable, cols, "y",
      iterations = 80, learningRate = 1.0)
    val loss1 = LinearModel.logLoss(separable, cols, "y", m)
    assert(loss1 < loss0, s"loss did not decrease: $loss0 -> $loss1")
    val scored = LinearModel.applyModel(separable, cols, m)
    val acc = scored.select(
      avg(when($"predicted" === $"y", 1.0).otherwise(0.0))).head().getDouble(0)
    assert(acc >= 0.97, s"accuracy $acc below 0.97")
    // The learned boundary must slope the right way: both features push
    // positive, threshold near x0+x1=1.
    assert(m.weights.forall(_ > 0), m.weights.mkString(","))
    assert(m.bias < 0)
  }

  test("raw-space fold-in matches standardized-space scoring to 1e-9 rel") {
    val cols = Seq("x0", "x1")
    val m = LinearModel.train(separable, cols, "y",
      iterations = 30, learningRate = 1.0)
    // Recompute the standardized-space score by hand in Scala for a few
    // rows and compare against the folded raw-space score column.
    val stats = separable.select(
      avg($"x0"), stddev_pop($"x0"), avg($"x1"), stddev_pop($"x1")).head()
    val (mu0, sd0, mu1, sd1) =
      (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2), stats.getDouble(3))
    // Invert the fold-in to standardized weights, then score both ways.
    val ws = Array(m.weights(0) * sd0, m.weights(1) * sd1)
    val bs = m.bias + m.weights(0) * mu0 + m.weights(1) * mu1
    val rows = LinearModel.applyModel(separable, cols, m)
      .select("x0", "x1", "z").limit(50).collect()
    rows.foreach { r =>
      val (x0, x1, z) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val zStd = ws(0) * (x0 - mu0) / sd0 + ws(1) * (x1 - mu1) / sd1 + bs
      assert(math.abs(z - zStd) <= 1e-9 * math.max(1.0, math.abs(z)),
        s"fold-in mismatch at ($x0,$x1): $z vs $zStd")
    }
  }

  test("constant features drop out with weight 0 (no divide-by-zero)") {
    val df = separable.withColumn("k", lit(7.5))
    val m = LinearModel.train(df, Seq("x0", "k", "x1"), "y",
      iterations = 20, learningRate = 1.0)
    assert(m.weights(1) === 0.0)
    // Still learns from the informative features around the constant.
    assert(m.weights(0) > 0 && m.weights(2) > 0)
  }

  test("score fold order is left-to-right from 0.0 with bias last") {
    // Assert on the column's expression string — the oracle mirrors this
    // parenthesization, so a refactor that re-associates must fail here.
    val c = LinearModel.score(Seq(col("a"), col("b")), Seq(2.0, 3.0), 0.5)
    // Assert on the ANALYZED plan (pre-optimizer) — the oracle mirrors
    // this parenthesization, so a refactor that re-associates must fail.
    val s = Seq((1.0, 2.0)).toDF("a", "b").select(c.as("z"))
      .queryExecution.analyzed.expressions.map(_.sql).mkString
    assert(s.replaceAll("\\s+", " ")
      .contains("(((0.0D + (CAST(a AS DOUBLE) * 2.0D)) + (CAST(b AS DOUBLE) * 3.0D)) + 0.5D)"),
      s"unexpected fold shape: $s")
  }

  test("applyModel thresholds at z > 0 and handles NULL features as 0 label") {
    val df = Seq((1L, Some(3.0)), (2L, Some(-3.0)), (3L, None))
      .toDF("id", "f")
    val out = LinearModel.applyModel(df, Seq("f"),
      LinearModel.Model(Array(1.0), 0.0)).orderBy("id")
      .select("predicted").as[Int].collect()
    assert(out.toSeq === Seq(1, 0, 0))
  }

  test("training plan: one aggregate job per iteration over the cached projection") {
    val counter = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(counter)
    def settle(): Int = {
      // Listener delivery is async — settle like ComponentsSpec does.
      var prev = -1; var cur = counter.jobs.get
      while (cur != prev) { Thread.sleep(200); prev = cur; cur = counter.jobs.get }
      cur
    }
    try {
      // AQE schedules ~2 jobs per aggregate action, so an absolute count
      // is brittle; assert the PER-ITERATION increment instead — a
      // per-iteration join or source recompute would add jobs per round.
      LinearModel.train(separable, Seq("x0", "x1"), "y",
        iterations = 2, learningRate = 1.0)
      val j2 = settle()
      LinearModel.train(separable, Seq("x0", "x1"), "y",
        iterations = 7, learningRate = 1.0)
      val j7 = settle() - j2 // second train's own jobs
      // Both trains share the stats+cache setup, so j7 - j2 isolates the
      // 5 extra iterations.
      assert(j7 - j2 <= 5 * 2,
        s"5 extra iterations cost ${j7 - j2} jobs (>2/iter): j2=$j2 j7=$j7")
    } finally spark.sparkContext.removeSparkListener(counter)
  }
}
