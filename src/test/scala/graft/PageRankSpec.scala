package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference implementation of the EXACT fixed-point
    * semantics (same integer formula, sequential maps) — the spec's
    * ground truth for the distributed operator.
    */
  private def refPr(edges: Seq[(Long, Long)], iters: Int,
                    scale: Long = 1000000000000L,
                    dampNum: Long = 17L, dampDen: Long = 20L): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val odeg = es.groupBy(_._1).map { case (u, g) => u -> g.size.toLong }
    val n = nodes.size.toLong
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var pr = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filter(u => !odeg.contains(u)).map(pr).sum
      val dShare = dangling / n
      val contrib = es.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => pr(u) / odeg(u) }.sum
      }
      pr = nodes.map { v =>
        v -> (base + (dampNum * (contrib.getOrElse(v, 0L) + dShare)) / dampDen)
      }.toMap
    }
    pr
  }

  private def runPr(edges: Seq[(Long, Long)], iters: Int,
                    parts: Int = 4): Map[Long, Long] =
    PageRank.pageRank(
      spark.sparkContext.parallelize(edges, parts).toDF("u", "v"),
      "u", "v", iterations = iters)
      .select($"node", $"pr_fixed").as[(Long, Long)].collect().toMap

  // Cycle + sink + self-loop + parallel edge: 1→2, 2→3, 3→1 (cycle),
  // 1→4 (4 is a SINK: dangling mass path), 5→5 (self-loop), 5→1,
  // plus a duplicate 1→2 that edge-SET semantics must collapse.
  private val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 5L),
    (5L, 1L), (1L, 2L))

  test("matches the sequential reference bit-for-bit (cycle+sink+self-loop)") {
    for (iters <- Seq(0, 1, 3, 8)) {
      assert(runPr(g, iters) === refPr(g, iters), s"at $iters iterations")
    }
  }

  test("sink receives and donates: dangling mass recirculates") {
    val got = runPr(g, 8)
    // the sink's rank comes from 1's split mass and returns via the
    // uniform dangling share — it must be strictly between base-only
    // and the cycle hub's rank
    assert(got(4L) > 0L && got(4L) < got(1L))
  }

  test("mass is conserved within the documented floor-loss bound") {
    val iters = 8
    val got = runPr(g, iters)
    val scale = 1000000000000L
    val e = g.distinct.size.toLong
    val n = got.size.toLong
    val lost = scale - got.values.sum
    assert(lost >= 0L, "mass must never be created")
    assert(lost <= iters * (e + 2 * n) + n, s"lost $lost exceeds bound")
  }

  test("result is partitioning-invariant (the fixed-point point)") {
    val a = runPr(g, 5, parts = 1)
    val b = runPr(g, 5, parts = 13)
    assert(a === b)
  }

  test("empty graph yields an empty result with the contract schema") {
    import org.apache.spark.sql.functions.lit
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
      .unionAll(Seq((1L, 2L)).toDF("u", "v").filter(lit(false)))
    val got = PageRank.pageRank(empty, "u", "v", iterations = 3)
    assert(got.columns.toSeq === Seq("node", "pr_fixed", "pr"))
    assert(got.count() === 0L)
  }

  test("uniform rank on a symmetric cycle; NULL endpoints dropped") {
    val ring = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val withNull = spark.sparkContext.parallelize(ring, 2).toDF("u", "v")
      .unionAll(Seq((Option.empty[Long], Option(99L))).toDF("u", "v"))
    val got = PageRank.pageRank(withNull, "u", "v", iterations = 6)
      .select($"node", $"pr_fixed").as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(10L, 11L, 12L), "null edge must not mint a node")
    assert(got.values.toSet.size === 1, "symmetric ring ranks equal")
  }
}
