package graft

import graft.operators.Evaluation
import org.apache.spark.sql.functions._

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  // scores with a tie straddling the classes: positives {3, 5},
  // negatives {1, 3}. Pairs: (3,1)=1, (3,3)=0.5, (5,1)=1, (5,3)=1
  // → U = 3.5, AUC = 3.5/4 = 0.875.
  private lazy val tied = Seq(
    (1L, false), (3L, false), (3L, true), (5L, true)
  ).toDF("s", "y")

  test("aucExact: midrank tie handling matches the hand-computed U") {
    val r = Evaluation.aucExact(tied, "s", "y").collect()(0)
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("n_neg") === 2L)
    // auc_num / auc_den = 7/8 = 0.875 exactly
    assert(r.getAs[Long]("auc_num") * 8 === r.getAs[Long]("auc_den") * 7)
    assert(r.getAs[Double]("auc") === 0.875)
  }

  test("aucExact: perfect separation gives 1.0, reversed gives 0.0") {
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    assert(Evaluation.aucExact(perfect, "s", "y")
      .collect()(0).getAs[Double]("auc") === 1.0)
    val reversed = perfect.withColumn("y", !col("y"))
    assert(Evaluation.aucExact(reversed, "s", "y")
      .collect()(0).getAs[Double]("auc") === 0.0)
  }

  test("aucExact: single-class input reports counts with NULL auc") {
    val onlyPos = Seq((1L, true), (2L, true)).toDF("s", "y")
    val r = Evaluation.aucExact(onlyPos, "s", "y").collect()(0)
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 0L)
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("aucExact equals the all-pairs definition on a random-ish mix") {
    val rows = (0 until 60).map(i =>
      ((i * 37 % 11).toLong, (i * 53 % 7) < 3))
    val df = rows.toDF("s", "y")
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum // doubled U
    val r = Evaluation.aucExact(df, "s", "y").collect()(0)
    assert(r.getAs[Long]("auc_num") === u2)
    assert(r.getAs[Long]("auc_den") === 2L * pos.size * neg.size)
  }

  test("prCurve: thresholds sweep descending with exact confusion counts") {
    val rows = Evaluation.prCurve(tied, "s", "y")
      .orderBy(desc("threshold")).collect()
    assert(rows.map(_.getAs[Long]("threshold")).toSeq === Seq(5L, 3L, 1L))
    // t=5: tp=1 fp=0 fn=1; t=3: tp=2 fp=1 fn=0; t=1: tp=2 fp=2 fn=0
    assert(rows.map(r => (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"))).toSeq === Seq((1L, 0L, 1L), (2L, 1L, 0L), (2L, 2L, 0L)))
    assert(rows(1).getAs[Double]("precision") === 2.0 / 3.0)
    assert(rows(1).getAs[Double]("recall") === 1.0)
  }

  test("prCurve and aucExact drop NULL scores") {
    val withNull = tied.union(Seq((null.asInstanceOf[java.lang.Long], true))
      .toDF("s", "y").select(col("s").cast("long"), col("y")))
    assert(Evaluation.aucExact(withNull, "s", "y")
      .collect()(0).getAs[Long]("n_pos") === 2L)
    assert(Evaluation.prCurve(withNull, "s", "y").count() === 3L)
  }

  test("aucExactByGroup matches per-group aucExact") {
    val d = Seq(
      ("g1", 1L, false), ("g1", 2L, true), ("g1", 3L, true),
      ("g2", 1L, true), ("g2", 2L, false)
    ).toDF("g", "s", "y")
    val grouped = Evaluation.aucExactByGroup(d, "g", "s", "y")
      .orderBy("g").collect()
    assert(grouped(0).getAs[Double]("auc") === 1.0) // g1 separable
    assert(grouped(1).getAs[Double]("auc") === 0.0) // g2 reversed
    val solo = Evaluation.aucExact(d.filter(col("g") === "g1"), "s", "y")
      .collect()(0)
    assert(solo.getAs[Long]("auc_num") === grouped(0).getAs[Long]("auc_num"))
  }

  test("averagePrecision: perfect ranking gives ap 1, counts exact") {
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    val r = Evaluation.averagePrecision(perfect, "s", "y").collect()(0)
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Double]("ap") === 1.0)
    // ranking with one inversion: thresholds desc 4(y),3(n),2(y),1(n)
    // AP = (1/1 + 2/3)/2 = 5/6 (up to 2^-30 quantization)
    val mixed = Seq((4L, true), (3L, false), (2L, true), (1L, false))
      .toDF("s", "y")
    val m = Evaluation.averagePrecision(mixed, "s", "y").collect()(0)
    assert(math.abs(m.getAs[Double]("ap") - 5.0 / 6.0) < 1e-8)
  }

  test("ksStatistic: disjoint supports give KS 1, identical give 0") {
    import graft.operators.Profiling
    val disjoint = (Seq((1L, true), (2L, true)) ++ Seq((10L, false), (11L, false)))
      .toDF("v", "r")
    val d = Profiling.ksStatistic(disjoint, col("v"), col("r")).collect()(0)
    assert(d.getAs[Double]("ks") === 1.0)
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "r")
    val s0 = Profiling.ksStatistic(same, col("v"), col("r")).collect()(0)
    assert(s0.getAs[Double]("ks") === 0.0)
    // hand case: ref {1,2}, cur {2,3}: at v=1 |1*2-0*2|=2; v=2 |2*2-1*2|=2;
    // v=3 |2*2-2*2|=0 -> ks = 2/4 = 0.5
    val mix = Seq((1L, true), (2L, true), (2L, false), (3L, false))
      .toDF("v", "r")
    val m = Profiling.ksStatistic(mix, col("v"), col("r")).collect()(0)
    assert(m.getAs[Long]("ks_num") === 2L && m.getAs[Long]("ks_den") === 4L)
    assert(m.getAs[Double]("ks") === 0.5)
  }
}
