package graft

import graft.operators.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, (Long, Long, Long, Option[Double])] =
    Triangles.triangleCounts(
      spark.sparkContext.parallelize(edges, parts).toDF("x", "y"), "x", "y")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap

  test("K4: every node in 3 of the 4 triangles, clustering 1.0") {
    val k4 = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (i, j)
    val got = run(k4)
    assert(got.size === 4)
    got.values.foreach { case (deg, tri, wed, cc) =>
      assert(deg === 3L && tri === 3L && wed === 3L && cc === Some(1.0))
    }
  }

  test("path graph has zero triangles; endpoints get NULL clustering") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got.values.forall(_._2 === 0L))
    assert(got(1L)._4 === None && got(4L)._4 === None, "deg-1 nodes: NULL cc")
    assert(got(2L)._4 === Some(0.0))
  }

  test("hub-and-spoke vs clique: wedges without triangles score 0") {
    // star center 0 with 5 spokes: 10 wedges, 0 triangles — the template-
    // page shape the coefficient exists to flag
    val star = (1L to 5L).map(i => (0L, i))
    val got = run(star)
    assert(got(0L) === ((5L, 0L, 10L, Some(0.0))))
  }

  test("direction, duplicates, and self-loops are normalized away") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val messy = tri ++ tri.map(_.swap) ++ Seq((1L, 1L), (2L, 2L), (1L, 2L))
    assert(run(messy) === run(tri))
    run(tri).values.foreach { case (deg, t, w, cc) =>
      assert(deg === 2L && t === 1L && w === 1L && cc === Some(1.0))
    }
  }

  test("two triangles sharing an edge: shared nodes count both") {
    // {1,2,3} and {2,3,4}: nodes 2,3 are in 2 triangles with deg 3
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L))
    val got = run(g)
    assert(got(1L)._2 === 1L && got(4L)._2 === 1L)
    assert(got(2L)._2 === 2L && got(3L)._2 === 2L)
    assert(got(2L)._4 === Some(2.0 / 3.0))
  }

  test("result is partitioning-invariant") {
    val g = (0L until 30L).flatMap(i => Seq((i, (i + 1) % 30), (i, (i + 7) % 30)))
    assert(run(g, parts = 1) === run(g, parts = 11))
  }

  test("assortativity: a star is maximally disassortative; a clique is NULL") {
    import graft.operators.Triangles
    // star: hub 0 to leaves 1..5 — deg pairs are (5,1)/(1,5): corr = -1
    val star = (1L to 5L).map(l => (0L, l)).toDF("u", "v")
    val s = Triangles.assortativity(star, "u", "v").collect()(0)
    assert(s.getAs[Long]("n_edges") === 5L)
    assert(math.abs(s.getAs[Double]("corr") - (-1.0)) < 1e-12)
    // clique: all degrees equal -> zero variance -> NULL
    val clique = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("u", "v")
    val c = Triangles.assortativity(clique, "u", "v").collect()(0)
    assert(c.getAs[Long]("n_edges") === 6L)
    assert(c.isNullAt(c.fieldIndex("corr")))
  }

  test("assortativity: duplicate pairs and self-loops are dropped first") {
    import graft.operators.Triangles
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L)).toDF("u", "v")
    val r = Triangles.assortativity(messy, "u", "v").collect()(0)
    assert(r.getAs[Long]("n_edges") === 2L) // 1-2 (deduped), 2-3
  }
}
