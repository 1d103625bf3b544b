package graft

import graft.operators.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int = 32,
                  parts: Int = 4): Map[Long, Long] =
    KCore.kCore(
      spark.sparkContext.parallelize(edges, parts).toDF("x", "y"), "x", "y",
      k = k, rounds = rounds)
      .as[(Long, Long)].collect().toMap

  // triangle {1,2,3} with a pendant chain 3-4-5 hanging off it
  private val lollipop = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))

  test("2-core of a lollipop is exactly the triangle (chain peels in cascade)") {
    assert(run(lollipop, k = 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("3-core of the lollipop is empty; path has no 2-core") {
    assert(run(lollipop, k = 3) === Map.empty)
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), k = 2) === Map.empty)
  }

  test("K4 with a pendant: 3-core is the K4 at full internal degree") {
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val got = run(k4 :+ ((3L, 9L)), k = 3)
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      "pendant must peel without dragging the clique")
  }

  test("cascading depth: a long tendril peels one node per round") {
    // triangle + 12-node tendril: needs 12 rounds — inside the default
    // ceiling, and the result matches any larger round count
    val tendril = (10L until 22L).map(i => (i, i + 1)) :+ (22L, 23L)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 10L)) ++ tendril
    val want = Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    assert(run(g, k = 2) === want)
    assert(run(g, k = 2, rounds = 100) === want, "idempotent past fixpoint")
  }

  test("duplicates/direction/self-loops normalize; result partitioning-invariant") {
    val messy = lollipop ++ lollipop.map(_.swap) ++ Seq((1L, 1L), (1L, 2L))
    assert(run(messy, k = 2) === run(lollipop, k = 2))
    assert(run(lollipop, k = 2, parts = 1) === run(lollipop, k = 2, parts = 9))
  }
}
