package graft

import graft.operators.Supervision

class SupervisionSpec extends SparkSpec {
  import spark.implicits._

  // votes: (a, b, c) with NULL = abstain
  private def df = Seq(
    (1L, Some(1), Some(1), Some(0)),  // 2-1 → label 1, not unanimous
    (2L, Some(0), None, Some(0)),     // 0-2 → label 0, unanimous
    (3L, Some(1), Some(0), None),     // 1-1 tie → NULL
    (4L, None, None, None),           // all abstain → NULL, not unanimous
    (5L, Some(1), None, None)         // 1-0 → label 1, unanimous
  ).toDF("id", "a", "b", "c")

  test("majorityVote: tallies, ties and all-abstain stay NULL, unanimity") {
    val got = Supervision.majorityVote(df, Seq("a", "b", "c"))
      .orderBy("id").collect()
    val rows = got.map(r => (r.getLong(4), r.getLong(5),
      if (r.isNullAt(6)) None else Some(r.getInt(6)), r.getBoolean(7))).toSeq
    assert(rows == Seq(
      (2L, 1L, Some(1), false),
      (0L, 2L, Some(0), true),
      (1L, 1L, None, false),
      (0L, 0L, None, false),
      (1L, 0L, Some(1), true)))
  }

  test("lfStats: coverage, agreement, conflict, no-consensus per LF") {
    val voted = Supervision.majorityVote(df, Seq("a", "b", "c"))
    val st = Supervision.lfStats(voted, Seq("a", "b", "c"))
      .orderBy("lf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // a: votes on 1,2,3,5 (cov 4); labels: 1→1 (agree), 2→0 (agree),
    //    3→NULL (no consensus), 5→1 (agree)
    // b: votes on 1,3 (cov 2); 1→1 agree 1; 3 no consensus
    // c: votes on 1,2,3... c votes 0,0,NULL,NULL,NULL → cov 2;
    //    1: vote 0 vs label 1 = conflict; 2: agree
    assert(st == Seq(
      ("a", 5L, 4L, 3L, 0L, 1L),
      ("b", 5L, 2L, 1L, 0L, 1L),
      ("c", 5L, 2L, 1L, 1L, 0L)))
  }

  test("cohenKappa matches the textbook worked example") {
    import org.apache.spark.sql.functions.col
    // classic 2×2 example: a=yes,b=yes 20; yes,no 5; no,yes 10; no,no 15
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val df = rows.toDF("r1", "r2")
    val out = Supervision.cohenKappa(df, col("r1"), col("r2")).head
    assert(out.getAs[Long]("n") === 50L)
    assert(out.getAs[Long]("agree") === 35L)
    // E = row_y·col_y + row_n·col_n = 25·30 + 25·20 = 1250
    assert(out.getAs[Long]("expected_num") === 1250L)
    assert(out.getAs[Double]("po") === 0.7)
    // κ = (50·35 − 1250)/(2500 − 1250) = 500/1250 = 0.4
    assert(out.getAs[Double]("kappa") === 0.4)
  }

  test("cohenKappa: NULL ratings are excluded; constant raters yield NULL kappa") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Some("a"), Some("a")), (Some("a"), None), (None, Some("a")),
      (Some("a"), Some("a"))
    ).toDF("r1", "r2")
    val out = Supervision.cohenKappa(df, col("r1"), col("r2")).head
    assert(out.getAs[Long]("n") === 2L) // only fully-rated rows
    assert(out.getAs[Double]("po") === 1.0)
    assert(out.isNullAt(out.fieldIndex("kappa"))) // N² == E: chance-perfect
  }

  test("cohenKappa is multi-class (3 labels) and rational-exact") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("z", "z"), ("z", "x"))
    val out = Supervision.cohenKappa(rows.toDF("r1", "r2"),
      col("r1"), col("r2")).head
    // rows: x2,y1,z2; cols: x2,y2,z1 → E = 4+2+2 = 8; A = 3, N = 5
    assert(out.getAs[Long]("expected_num") === 8L)
    assert(out.getAs[Double]("kappa") === (5.0 * 3 - 8) / (25.0 - 8))
  }

  private def cjCells(rows: Seq[(Int, Seq[Long])], k: Int) =
    Supervision.confidentJoint(
      rows.toDF("y", "p"), "y", "p", k).collect()
      .map(r => (r.getAs[Int]("noisy_label"), r.getAs[Int]("est_label")) ->
        r.getAs[Long]("n_rows")).toMap

  test("confidentJoint: hand-computed 2-class joint catches the " +
    "mislabeled row and excludes the unconfident one") {
    // label-0 rows self-confs {900k, 800k, 100k} -> t0 = 600k (sum 1.8M);
    // label-1 rows {800k, 700k} -> t1 = 750k (sum 1.5M)
    val cells = cjCells(Seq(
      (0, Seq(900000L, 100000L)), (0, Seq(800000L, 200000L)),
      (0, Seq(100000L, 900000L)), // mislabeled: clears only class 1
      (1, Seq(200000L, 800000L)),
      (1, Seq(300000L, 700000L))), 2) // clears neither: excluded
    assert(cells === Map((0, 0) -> 2L, (0, 1) -> 1L, (1, 1) -> 1L))
  }

  test("confidentJoint: argmax ties break to the smallest class index") {
    // both rows per class so thresholds = 500k each; the probe row
    // clears both classes at equal confidence -> est 0
    val cells = cjCells(Seq(
      (0, Seq(500000L, 500000L)), (1, Seq(400000L, 600000L)),
      (1, Seq(500000L, 400000L))), 2)
    // probe: row1 label 0: t0=500k (1 row); t1 = (600k+400k)/2 = 500k
    // p = (500k, 500k) clears both, tie -> class 0
    assert(cells((0, 0)) === 1L)
  }

  test("confidentJoint: a class with no labeled rows is never a " +
    "candidate and the op does not crash") {
    val cells = cjCells(Seq(
      (0, Seq(900000L, 100000L, 999999L)),
      (1, Seq(100000L, 900000L, 999999L))), 3)
    assert(cells === Map((0, 0) -> 1L, (1, 1) -> 1L))
    assert(!cells.keySet.exists(_._2 == 2))
  }
}
