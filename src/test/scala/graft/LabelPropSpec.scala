package graft

import graft.operators.LabelProp

/** Synchronous LPA vs a direct reference simulation. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  /** Reference synchronous LPA: neighbor-label mode, min-label ties. */
  private def ref(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds)
      lab = adj.map { case (n, nbrs) =>
        val cnts = nbrs.groupBy(lab).map { case (l, xs) => l -> xs.size }
        n -> cnts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    lab
  }

  // two 4-cliques bridged by one edge, plus a duplicate/reversed/self
  // edge to exercise input normalization
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
    (4L, 10L),
    (2L, 1L), (3L, 3L), (1L, 2L))

  test("labelPropagation matches the reference simulation round-for-round") {
    for (r <- Seq(1, 2, 4)) {
      val got = LabelProp.labelPropagation(
        edges.toDF("s", "d"), "s", "d", rounds = r)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got === ref(edges, r), s"rounds=$r")
    }
  }

  test("cliques converge to their minimum id; the bridge does not merge them") {
    val got = LabelProp.labelPropagation(
      edges.toDF("s", "d"), "s", "d", rounds = 4)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(got).toSet === Set(1L))
    assert(Seq(10L, 11L, 12L, 13L).map(got).toSet === Set(10L))
  }

  test("result is partitioning-independent") {
    val df = edges.toDF("s", "d")
    val a = LabelProp.labelPropagation(df, "s", "d", rounds = 3)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toSet
    val b = LabelProp.labelPropagation(df.repartition(7), "s", "d", rounds = 3)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toSet
    assert(a === b)
  }
}
