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
}
