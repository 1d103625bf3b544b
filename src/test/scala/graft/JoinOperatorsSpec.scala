package graft

import graft.operators.{AsofJoin, RangeJoin}
import org.apache.spark.sql.functions._

class JoinOperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward: latest preceding right row, inclusive at equal time") {
    val left = Seq(
      (1L, 100L, 5L),  // before any right row → NULL
      (1L, 110L, 10L), // exactly at right t=110 → inclusive match
      (1L, 115L, 20L), // between 110 and 120 → 110
      (1L, 130L, 30L), // after 120 → 120
      (2L, 500L, 40L)  // other key, no right rows at all
    ).toDF("k", "t", "payload")
    val right = Seq((1L, 110L, "a"), (1L, 120L, "b"))
      .toDF("k", "t", "state")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", Seq("state"))
      .orderBy("k", "t").collect()
    assert(out.map(r => Option(r.getAs[String]("state"))).toSeq ===
      Seq(None, Some("a"), Some("a"), Some("b"), None))
    // left payload preserved
    assert(out.map(_.getAs[Long]("payload")).toSeq === Seq(5L, 10L, 20L, 30L, 40L))
  }

  test("asofBackward: multiple left rows at one timestamp all match") {
    val left = Seq((1L, 10L, "x"), (1L, 10L, "y")).toDF("k", "t", "payload")
    val right = Seq((1L, 10L, 7L)).toDF("k", "t", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", Seq("v"))
      .select("v").as[Long].collect()
    assert(out.toSeq === Seq(7L, 7L))
  }

  test("asofBackward: NULL value fields carry as NULL from ONE right row") {
    // right t=20 has v1=NULL: per-column last(ignoreNulls) would skip it
    // and stitch v1 from t=10 with v2 from t=20 — the struct carry must
    // keep both fields from the t=20 row.
    val left = Seq((1L, 25L, 0L)).toDF("k", "t", "payload")
    val right = Seq(
      (1L, 10L, Option("old1"), Option("old2")),
      (1L, 20L, None: Option[String], Option("new2"))
    ).toDF("k", "t", "v1", "v2")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", Seq("v1", "v2"))
      .select("v1", "v2").collect()
    assert(out.length === 1)
    assert(Option(out(0).getAs[String]("v1")) === None)
    assert(out(0).getAs[String]("v2") === "new2")
  }

  test("asofBackward: NULL-time rows are dropped from both sides") {
    val left = Seq((1L, Option(15L), "a"), (1L, None: Option[Long], "b"))
      .toDF("k", "t", "payload")
    val right = Seq((1L, Option(10L), 1L), (1L, None: Option[Long], 99L))
      .toDF("k", "t", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", Seq("v"))
      .collect()
    // NULL-time left row vanishes; NULL-time right row never matches
    assert(out.length === 1)
    assert(out(0).getAs[String]("payload") === "a")
    assert(out(0).getAs[Long]("v") === 1L)
  }

  test("pointInInterval: inclusive bounds, cross-bucket spans, no dups") {
    val intervals = Seq(
      (1L, 0L, 9L),    // spans buckets 0-1 at width 5
      (2L, 5L, 5L),    // degenerate single point
      (3L, 100L, 110L) // no points inside
    ).toDF("iv_id", "lo", "hi")
    val points = Seq(0L, 5L, 9L, 10L, 50L).toDF("p")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 5L)
      .select("iv_id", "p").as[(Long, Long)].collect().sorted
    // p=0,5,9 in iv 1; p=5 in iv 2; nothing else — and each pair ONCE
    assert(out.toSeq === Seq((1L, 0L), (1L, 5L), (1L, 9L), (2L, 5L)))
  }

  test("pointInInterval: inverted and NULL-bound intervals are rejected up front") {
    val intervals = Seq(
      (1L, Option(9L), Option(0L)),  // hi < lo: would explode descending buckets
      (2L, None: Option[Long], Option(5L)),
      (3L, Option(0L), Option(9L))
    ).toDF("iv_id", "lo", "hi")
    val points = Seq(0L, 5L, 9L).toDF("p")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 5L)
      .select("iv_id", "p").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((3L, 0L), (3L, 5L), (3L, 9L)))
  }

  test("pointInInterval: negative and >2^53 coordinates bucket exactly") {
    // floor semantics at negatives + all-integer bucket math at magnitudes
    // where double arithmetic would round (nanosecond epochs).
    val big = 4611686018427387905L // 2^62 + 1: not representable as double
    val intervals = Seq((1L, -10L, -2L), (2L, big - 1, big + 1))
      .toDF("iv_id", "lo", "hi")
    val points = Seq(-10L, -2L, -1L, big, big + 2).toDF("p")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 7L)
      .select("iv_id", "p").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((1L, -10L), (1L, -2L), (2L, big)))
  }
}
