package graft

import graft.operators.Preference
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("pairwiseWins aggregates per-subject scores then judges head-to-heads") {
    // u1: A=5 > B=3; u2: B=4 > A=2; u3: A=1 = B=1 (tie); u4: only A
    val df = Seq(
      (1L, "A", 5L), (1L, "B", 3L),
      (2L, "A", 2L), (2L, "B", 4L),
      (3L, "A", 1L), (3L, "B", 1L),
      (4L, "A", 9L)).toDF("u", "item", "sc")
    val got = Preference.pairwiseWins(df, "u", "item", col("sc"))
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getString(0), r.getString(1)) === (("A", "B")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((1L, 1L, 1L)))
  }

  test("bradleyTerryStrengths converges to the exact 3:1 fixpoint") {
    // A beats B 3-1: MM fixpoint (with r0 sum 2.0) is A=1.5, B=0.5 —
    // reached exactly after one round in 2^20 fixed point and stable.
    val wins = Seq(("A", "B", 3L, 1L))
      .toDF("item_a", "item_b", "wins_a", "wins_b")
    val got = Preference.bradleyTerryStrengths(
      wins, "item_a", "item_b", "wins_a", "wins_b", iters = 8)
      .orderBy("item").collect()
    val a = got(0); val b = got(1)
    assert(a.getString(0) === "A" && a.getLong(1) === 3L &&
      a.getLong(2) === 4L)
    assert(a.getLong(3) === 1572864L && a.getDouble(4) === 1.5)
    assert(b.getLong(3) === 524288L && b.getDouble(4) === 0.5)
  }

  test("bradleyTerryStrengths: all-tie pairs carry no information") {
    val wins = Seq(("A", "B", 0L, 0L))
      .toDF("item_a", "item_b", "wins_a", "wins_b")
    val got = Preference.bradleyTerryStrengths(
      wins, "item_a", "item_b", "wins_a", "wins_b")
      .orderBy("item").collect()
    assert(got.forall(_.getLong(2) === 0L))
    assert(got.forall(_.getLong(3) === 1048576L)) // rating untouched
  }

  test("winMatrixFromComparisons normalizes explicit rows to the unordered key") {
    // B beats A twice, A beats B once; C beats A once; a self-comparison
    // and a NULL row are dropped
    val cmp = Seq(("B", "A"), ("B", "A"), ("A", "B"), ("C", "A"),
      ("A", "A"), (null, "B")).toDF("winner", "loser")
    val got = Preference.winMatrixFromComparisons(cmp, "winner", "loser")
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(("A", "B", 1L, 2L), ("A", "C", 0L, 1L)))
  }

  test("explicit-comparison rows reach the same 3:1 BT fixpoint as a win matrix") {
    // 3 'A beats B' rows + 1 'B beats A' row == wins matrix (3, 1)
    val cmp = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerryStrengths(
      Preference.winMatrixFromComparisons(cmp, "winner", "loser"),
      "item_a", "item_b", "wins_a", "wins_b", iters = 8)
      .orderBy("item").collect()
    assert(got(0).getDouble(4) === 1.5 && got(1).getDouble(4) === 0.5)
    assert(got(0).getLong(2) === 4L && got(1).getLong(2) === 4L)
  }

  test("bradleyTerryStrengths fails loud above the 2^22 fixed-point bound") {
    val wins = Seq(("A", "B", (1L << 22), 1L))
      .toDF("item_a", "item_b", "wins_a", "wins_b")
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerryStrengths(
        wins, "item_a", "item_b", "wins_a", "wins_b")
    }
    assert(e.getMessage.contains("invariant to count rescaling"))
    // rescaled by the common factor, the same data fits
    val ok = Preference.bradleyTerryStrengths(
      Seq(("A", "B", (1L << 21), 1L))
        .toDF("item_a", "item_b", "wins_a", "wins_b"),
      "item_a", "item_b", "wins_a", "wins_b")
    assert(ok.count() === 2L)
  }

  test("bradleyTerryStrengths ranks a 3-item tournament sensibly") {
    // A dominates both, C loses to both, B in between
    val wins = Seq(
      ("A", "B", 8L, 2L), ("A", "C", 9L, 1L), ("B", "C", 7L, 3L))
      .toDF("item_a", "item_b", "wins_a", "wins_b")
    val got = Preference.bradleyTerryStrengths(
      wins, "item_a", "item_b", "wins_a", "wins_b")
      .orderBy("item").collect()
    val s = got.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(s("A") > s("B") && s("B") > s("C"))
    assert(got.map(_.getLong(1)).sum === 30L)
  }

  test("groupNormalizedAdvantages: hand-computed, zero-variance NULL") {
    val df = Seq(
      ("p1", 1L, 1L), ("p1", 2L, 2L), ("p1", 3L, 3L), // n=3 s=6 ss=14 D=6
      ("p2", 4L, 5L), ("p2", 5L, 5L),                 // constant group
      ("p3", 6L, 7L))                                 // singleton
      .toDF("prompt", "sid", "rw")
    val got = Preference.groupNormalizedAdvantages(
      df, "prompt", "sid", col("rw"))
      .collect().map(r => r.getAs[Long]("sid") -> r).toMap
    def expQ(num: Long, d: Long): Long =
      math.floor(num.toDouble / math.sqrt(d.toDouble) * 1048576.0).toLong
    assert(got(1L).getAs[Long]("adv_q20") === expQ(-3L, 6L))
    assert(got(2L).getAs[Long]("adv_q20") === 0L)
    assert(got(3L).getAs[Long]("adv_q20") === expQ(3L, 6L))
    assert(got(3L).getAs[Long]("n_group") === 3L)
    Seq(4L, 5L, 6L).foreach { sid =>
      assert(got(sid).isNullAt(got(sid).fieldIndex("adv_q20")))
    }
    // advantages of a non-constant group sum to ~0 (centering property)
    val sumAdv = Seq(1L, 2L, 3L).map(got(_).getAs[Double]("adv")).sum
    assert(math.abs(sumAdv) < 3.0 / 1048576.0)
  }

  test("bestOfNCurve: hand-computed order statistics, N>n NULL, min-shift") {
    val Q = 1048576L
    val df = Seq(
      ("p", 0L), ("p", 10L), ("p", 10L), ("p", 20L), // n=4
      ("q", -7L),                                    // singleton
      ("r", -5L), ("r", 5L))                         // negative shift
      .toDF("prompt", "rw")
    val got = Preference.bestOfNCurve(df, "prompt", col("rw"), maxN = 4)
      .collect()
      .map(r => (r.getAs[String]("prompt"), r.getAs[Long]("n_draws")) -> r)
      .toMap
    def q20(k: (String, Long)): Long = got(k).getAs[Long]("e_max_q20")
    // p: CDF F(0)=1 F(10)=3 F(20)=4
    assert(q20(("p", 1L)) === 10L * Q)                  // mean of max-of-1
    assert(q20(("p", 2L)) === 15L * Q)                  // (10*6+20*6)/12
    assert(q20(("p", 3L)) === 17L * Q + Q / 2L)         // 17.5
    assert(q20(("p", 4L)) === 20L * Q)                  // the max itself
    assert(got(("p", 1L)).getAs[Long]("n_samples") === 4L)
    // q: E[max of 1] = -7; N = 2..4 undefined
    assert(q20(("q", 1L)) === -7L * Q)
    (2L to 4L).foreach { n =>
      val r = got(("q", n))
      assert(r.isNullAt(r.fieldIndex("e_max_q20")))
    }
    // r: E[max of 2 without replacement] = max = 5 exactly
    assert(q20(("r", 1L)) === 0L)                       // mean(-5, 5)
    assert(q20(("r", 2L)) === 5L * Q)
  }

  test("dpoPairs: deterministic picks, margin gate, constant-group drop") {
    val df = Seq(
      // p1: clear winner/loser; ties on the max (ids 2,3 both score 9)
      // break to the smaller id
      ("p1", 1L, 2L), ("p1", 2L, 9L), ("p1", 3L, 9L),
      // p2: margin 1 < minMargin 5 -> dropped
      ("p2", 4L, 10L), ("p2", 5L, 11L),
      // p3: constant -> margin 0 -> dropped
      ("p3", 6L, 4L), ("p3", 7L, 4L))
      .toDF("prompt", "sid", "rw")
    val got = Preference.dpoPairs(df, "prompt", "sid", col("rw"),
      minMargin = 5L).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getAs[String]("prompt") === "p1")
    assert(r.getAs[Long]("chosen_id") === 2L)
    assert(r.getAs[Long]("rejected_id") === 1L)
    assert(r.getAs[Long]("margin") === 7L)
    assert(r.getAs[Long]("n_samples") === 3L)
    // minMargin 0 keeps the constant group but never as a self-pair?
    // no: margin 0 passes, chosen/rejected differ by the id tie-break
    val loose = Preference.dpoPairs(df, "prompt", "sid", col("rw"),
      minMargin = 0L).collect()
      .map(r => r.getAs[String]("prompt") -> r).toMap
    assert(loose("p3").getAs[Long]("chosen_id") === 6L)
    assert(loose("p3").getAs[Long]("rejected_id") === 6L) // self-pair:
    // both orders tie-break to the smaller id — why minMargin >= 1 is
    // the documented default
  }

  test("advantagesWithMoments: frozen baseline, unknown group NULL") {
    val ref = Seq(("p1", 1L), ("p1", 2L), ("p1", 3L)) // n=3 s=6 ss=14 D=6
      .toDF("prompt", "rw")
    val m = Preference.groupMoments(ref, "prompt", col("rw"))
    val batch = Seq(("p1", 10L, 4L), ("p1", 11L, 2L), ("pX", 12L, 9L))
      .toDF("prompt", "sid", "rw")
    val got = Preference.advantagesWithMoments(
      batch, "prompt", "sid", col("rw"), m)
      .collect().map(r => r.getAs[Long]("sid") -> r).toMap
    // reward 4 vs frozen (n=3, s=6, D=6): (3*4-6)/sqrt(6)
    val exp = math.floor(6.0 / math.sqrt(6.0) * 1048576.0).toLong
    assert(got(10L).getAs[Long]("adv_q20") === exp)
    assert(got(11L).getAs[Long]("adv_q20") === 0L) // reward == mean
    assert(got(10L).getAs[Long]("n_ref") === 3L)
    val unk = got(12L)
    assert(unk.isNullAt(unk.fieldIndex("n_ref")))
    assert(unk.isNullAt(unk.fieldIndex("adv_q20")))
  }
}
