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

  test("majorityVoteAccuracy: modal answer, tie to smallest, gold join") {
    val samples = Seq((1L, 3L), (1L, 2L), (1L, 3L), (1L, 2L), (1L, 5L),
      (2L, 7L), (3L, 1L)).toDF("task", "ans")
    val gold = Seq((1L, 3L), (2L, 7L)).toDF("task", "g")
    val got = Evaluation.majorityVoteAccuracy(
      samples, "task", "ans", gold, "g").collect()
      .map(r => r.getAs[Long]("task") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("n_distinct_answers"),
          r.getAs[Long]("modal_answer"), r.getAs[Long]("modal_count"),
          if (r.isNullAt(r.fieldIndex("is_correct"))) None
          else Some(r.getAs[Boolean]("is_correct"))))).toMap
    // task 1: 2 and 3 tie at 2 votes -> modal 2 (smallest), gold 3: wrong
    assert(got(1L) === ((5L, 3L, 2L, 2L, Some(false))))
    assert(got(2L) === ((1L, 1L, 7L, 1L, Some(true))))
    // task 3 has no gold row: consensus reported, correctness NULL
    assert(got(3L) === ((1L, 1L, 1L, 1L, None)))
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

  test("adStatistic: identical distributions give 0; tail weighting beats KS") {
    import graft.operators.Profiling
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "r")
    val s0 = Profiling.adStatistic(same, col("v"), col("r")).collect()(0)
    assert(s0.getAs[Long]("a2_fp") === 0L)
    assert(s0.getAs[Double]("a2") === 0.0)
    // two pairs of splits with the SAME max CDF gap (same KS) but the
    // gap in the TAIL vs the middle: AD weights the tail case higher
    val mid = ((1L to 8L).map((_, true)) ++
      Seq(1L, 2L, 3L, 3L, 6L, 6L, 7L, 8L).map((_, false))).toDF("v", "r")
    val tail = ((1L to 8L).map((_, true)) ++
      Seq(1L, 1L, 3L, 4L, 5L, 6L, 7L, 8L).map((_, false))).toDF("v", "r")
    val aMid = Profiling.adStatistic(mid, col("v"), col("r"))
      .collect()(0).getAs[Double]("a2")
    val aTail = Profiling.adStatistic(tail, col("v"), col("r"))
      .collect()(0).getAs[Double]("a2")
    val ksMid = Profiling.ksStatistic(mid, col("v"), col("r"))
      .collect()(0).getAs[Double]("ks")
    val ksTail = Profiling.ksStatistic(tail, col("v"), col("r"))
      .collect()(0).getAs[Double]("ks")
    assert(ksMid === ksTail) // KS cannot tell them apart
    assert(aTail > aMid)     // AD can: the gap sits where H(1-H) is small
  }

  // 20 rows, scores = key, positives = top half exactly: every decile
  // is 2 rows; deciles 0-4 all positive, 5-9 all negative.
  private lazy val separable = (0L until 20L).map(k =>
    (k, k, k >= 10L)).toDF("k", "s", "y")

  test("decileLift: separable scores give lift 2 at the top, exact counts") {
    val rows = Evaluation.decileLift(separable, "k", "s", "y")
      .orderBy("decile").collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("n")).forall(_ === 2L))
    assert(rows(0).getAs[Long]("n_pos") === 2L)
    assert(rows(0).getAs[Double]("lift") === 2.0) // 2/2 vs 10/20
    assert(rows(4).getAs[Long]("cum_pos") === 10L)
    assert(rows(4).getAs[Double]("cum_gain") === 1.0)
    assert(rows(9).getAs[Long]("cum_n") === 20L)
    assert(rows(9).getAs[Double]("lift") === 1.0) // full depth = random
  }

  test("decileLift: uneven N splits buckets by (ord*k) DIV N, sizes differ by <= 1") {
    val d = (0L until 13L).map(k => (k, k % 5, k % 3 == 0L))
      .toDF("k", "s", "y")
    val rows = Evaluation.decileLift(d, "k", "s", "y", buckets = 4)
      .orderBy("decile").collect()
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(4L, 3L, 3L, 3L))
    assert(rows.map(_.getAs[Long]("n_pos")).sum === 5L)
    assert(rows.last.getAs[Long]("cum_n") === 13L)
  }

  test("decileLift: tie straddling a boundary resolves by key, deterministically") {
    // 4 rows all score 7: buckets of 2/2, split by key order
    val d = Seq((1L, 7L, true), (2L, 7L, false), (3L, 7L, true),
      (4L, 7L, false)).toDF("k", "s", "y")
    val rows = Evaluation.decileLift(d, "k", "s", "y", buckets = 2)
      .orderBy("decile").collect()
    // keys 1,2 (pos,neg) in bucket 0; keys 3,4 in bucket 1
    assert(rows(0).getAs[Long]("n_pos") === 1L)
    assert(rows(1).getAs[Long]("n_pos") === 1L)
  }

  test("conformalGate: threshold is the k-th smallest calibration positive") {
    // Keys chosen so hashBucket(k,100) < 50 splits; verify against a
    // direct recomputation rather than hand-picked buckets.
    val d = (0L until 200L).map(k => (k, k, k % 4 != 0L)).toDF("k", "s", "y")
    val r = Evaluation.conformalGate(d, "k", "s", "y", calPct = 50,
      alphaNum = 1, alphaDen = 10).collect()(0)
    import graft.operators.Sampling
    val calMask = d.select(col("k"),
      (Sampling.hashBucket(col("k"), 100) < 50).as("c"))
      .collect().map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    val calPos = (0L until 200L).filter(k => calMask(k) && k % 4 != 0L)
    val nCal = calPos.size
    assert(r.getAs[Long]("n_cal") === nCal.toLong)
    val k = (nCal + 1) / 10
    assert(r.getAs[Long]("k") === k.toLong)
    val thr = calPos.sorted.apply(k - 1) // k-th smallest, 1-based
    assert(r.getAs[Long]("threshold") === thr)
    val testPos = (0L until 200L).filter(x => !calMask(x) && x % 4 != 0L)
    val cov = testPos.count(_ >= thr)
    assert(r.getAs[Long]("n_test_cov") === cov.toLong)
    // finite-sample guarantee: miss at most k-1 of n_cal+1 exchangeables
    assert(r.getAs[Double]("coverage") >= 0.85)
  }

  test("conformalGate: alpha too tight for the sample yields accept-all") {
    val d = (0L until 12L).map(k => (k, k, true)).toDF("k", "s", "y")
    // alpha = 1/1000 -> k = 0 regardless of split
    val r = Evaluation.conformalGate(d, "k", "s", "y", calPct = 50,
      alphaNum = 1, alphaDen = 1000).collect()(0)
    assert(r.getAs[Long]("k") === 0L)
    assert(r.isNullAt(r.fieldIndex("threshold")))
    assert(r.getAs[Double]("coverage") === 1.0)
  }

  test("isotonicCalibration: violator bins pool; output is monotone") {
    // 4 bins of 5 rows: rates 0.2, 0.8, 0.4, 1.0 -> bins 1,2 violate
    // and pool to (0.8*5 + 0.4*5)/10 = 0.6
    val rows = (0 until 20).map { i =>
      val bin = i / 5
      val pos = bin match {
        case 0 => i % 5 < 1
        case 1 => i % 5 < 4
        case 2 => i % 5 < 2
        case _ => true
      }
      (i.toLong, i.toLong, pos)
    }
    val d = rows.toDF("k", "s", "y")
    val out = Evaluation.isotonicCalibration(d, "k", "s", "y", bins = 4)
      .orderBy("bin").collect()
    val cal = out.map(_.getAs[Double]("calibrated")).toSeq
    assert(cal === Seq(0.2, 0.6, 0.6, 1.0))
    assert(cal.sliding(2).forall(p => p(0) <= p(1))) // monotone
    assert(out(1).getAs[Long]("pool") === 1L)
    assert(out(2).getAs[Long]("pool") === 1L) // merged into bin 1's pool
    assert(out(1).getAs[Long]("cal_num") === 6L)
    assert(out(1).getAs[Long]("cal_den") === 10L)
  }

  test("isotonicCalibration: cascading merges pool through earlier bins") {
    // rates 0.9, 0.5, 0.1 over equal bins: full collapse to 0.5
    val rows = (0 until 30).map { i =>
      val bin = i / 10
      val pos = bin match {
        case 0 => i % 10 < 9
        case 1 => i % 10 < 5
        case _ => i % 10 < 1
      }
      (i.toLong, i.toLong, pos)
    }
    val out = Evaluation.isotonicCalibration(rows.toDF("k", "s", "y"),
      "k", "s", "y", bins = 3).orderBy("bin").collect()
    assert(out.map(_.getAs[Double]("calibrated")).distinct.toSeq === Seq(0.5))
    assert(out.forall(_.getAs[Long]("pool") === 0L))
    // pooling preserves totals exactly
    assert(out.head.getAs[Long]("cal_num") === 15L)
    assert(out.head.getAs[Long]("cal_den") === 30L)
  }

  test("isotonicCalibration: already-monotone rates pass through untouched") {
    val rows = (0 until 20).map { i =>
      (i.toLong, i.toLong, i / 5 match {
        case 0 => i % 5 < 1; case 1 => i % 5 < 2
        case 2 => i % 5 < 3; case _ => i % 5 < 5
      })
    }
    val out = Evaluation.isotonicCalibration(rows.toDF("k", "s", "y"),
      "k", "s", "y", bins = 4).orderBy("bin").collect()
    assert(out.map(_.getAs[Double]("calibrated")).toSeq ===
      Seq(0.2, 0.4, 0.6, 1.0))
    assert(out.map(_.getAs[Long]("pool")).toSeq === Seq(0L, 1L, 2L, 3L))
  }
  test("passAtK matches the hand-computed unbiased estimator") {
    // task A: n=4, c=2, k=2 -> 1 - C(2,2)/C(4,2) = 1 - (2*1)/(4*3)
    //        = 1 - 1/6 = 5/6; q30 = floor((12-2)*2^30/12)
    // task B: n=3, c=0 -> pass@2 = 0
    // task C: n=2, c=2 -> n-c < k -> exactly 1
    // task D: n=1 -> n < k -> NULL estimate
    val df = Seq(
      ("A", true), ("A", true), ("A", false), ("A", false),
      ("B", false), ("B", false), ("B", false),
      ("C", true), ("C", true),
      ("D", true)).toDF("task", "ok")
    val got = Evaluation.passAtK(df, "task", col("ok"), k = 2)
      .orderBy("task").collect()
    val a = got(0)
    assert((a.getLong(1), a.getLong(2)) === ((4L, 2L)))
    assert(a.getString(3) === "2" && a.getString(4) === "12")
    assert(a.getLong(5) === (10L * 1073741824L) / 12L)
    assert(math.abs(a.getDouble(6) - 5.0 / 6.0) < 1e-8)
    assert(got(1).getLong(5) === 0L && got(1).getDouble(6) === 0.0)
    assert(got(2).getLong(5) === 1073741824L && got(2).getDouble(6) === 1.0)
    assert(got(3).isNullAt(5) && got(3).isNullAt(6))
  }

  test("passAtK agrees with exhaustive subset enumeration on fuzz tasks") {
    val rng = new scala.util.Random(303L)
    val rows = (1 to 12).flatMap { t =>
      val n = 1 + rng.nextInt(7)
      (1 to n).map(_ => (s"t$t", rng.nextBoolean()))
    }
    val k = 3
    val got = Evaluation.passAtK(rows.toDF("task", "ok"), "task",
      col("ok"), k).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val n = rs.size
      val passes = rs.map(_._2)
      if (n < k) assert(got(t).isEmpty)
      else {
        val subsets = passes.indices.combinations(k).toSeq
        val hit = subsets.count(_.exists(passes(_)))
        val expect = hit.toDouble / subsets.size
        // the operator emits an exact 2^-30 floor of the rational value
        assert(math.abs(got(t).get - expect) < 1e-8, s"task $t")
      }
    }
  }

}
