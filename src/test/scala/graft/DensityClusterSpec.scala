package graft

import graft.operators.DensityCluster
import org.apache.spark.sql.functions._

class DensityClusterSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(pts: Seq[(Long, Float, Float)]) =
    pts.map { case (id, x, y) => (id, Array(x, y)) }.toDF("id", "v")

  test("gridClusters: two dense blobs cluster separately; sparse point is noise") {
    // blob A: 4 points in cell (0,0); blob B: 4 points in cell (5,5)
    // (cells at Chebyshev distance > 1 — never merged); loner elsewhere
    val d = vecs(Seq(
      (1L, 0.1f, 0.1f), (2L, 0.2f, 0.2f), (3L, 0.3f, 0.3f), (4L, 0.4f, 0.4f),
      (5L, 5.1f, 5.1f), (6L, 5.2f, 5.2f), (7L, 5.3f, 5.3f), (8L, 5.4f, 5.4f),
      (9L, -3.5f, 2.5f)))
    val r = DensityCluster.gridClusters(d, "id", "v", mult = 1.0, minPts = 4L)
      .orderBy("id").collect()
    val a = r.take(4).map(_.getAs[Long]("cluster")).toSet
    val b = r.slice(4, 8).map(_.getAs[Long]("cluster")).toSet
    assert(a.size === 1 && b.size === 1 && a != b)
    assert(r(8).isNullAt(r(8).fieldIndex("cluster")))
    assert(r(8).getAs[Boolean]("noise"))
  }

  test("gridClusters: adjacent core cells merge through the 8-neighborhood") {
    // three core cells in a diagonal chain (0,0)-(1,1)-(2,2): Chebyshev
    // neighbors pairwise-adjacent along the chain -> ONE cluster
    val d = vecs((1L to 4L).map(i => (i, 0.5f, 0.5f)) ++
      (5L to 8L).map(i => (i, 1.5f, 1.5f)) ++
      (9L to 12L).map(i => (i, 2.5f, 2.5f)))
    val r = DensityCluster.gridClusters(d, "id", "v", mult = 1.0, minPts = 4L)
      .collect()
    assert(r.map(_.getAs[Long]("cluster")).toSet.size === 1)
    assert(r.forall(!_.getAs[Boolean]("noise")))
  }

  test("gridClusters: isolated core cell keeps its own singleton cluster") {
    val d = vecs((1L to 5L).map(i => (i, 0.5f, 0.5f)))
    val r = DensityCluster.gridClusters(d, "id", "v", mult = 1.0, minPts = 4L)
      .collect()
    assert(r.forall(!_.getAs[Boolean]("noise")))
    assert(r.map(_.getAs[Long]("cluster")).toSet.size === 1)
  }

  test("gridClusters: outlier magnitudes clamp into boundary cells, no overflow") {
    val d = vecs(Seq((1L, 3.4e38f, -3.4e38f), (2L, 3.4e38f, -3.4e38f),
      (3L, 3.4e38f, -3.4e38f), (4L, 3.4e38f, -3.4e38f)))
    val r = DensityCluster.gridClusters(d, "id", "v", mult = 16.0, minPts = 4L)
      .collect()
    assert(r.forall(_.getAs[Long]("cx") === 1048576L))
    assert(r.forall(_.getAs[Long]("cy") === -1048576L))
    assert(r.forall(!_.getAs[Boolean]("noise")))
  }

  test("anisotropy: identical vectors give 1; centered pair gives 0") {
    import graft.operators.EmbeddingStats
    val same = Seq((1L, Array(0.5f, 0.5f)), (2L, Array(0.5f, 0.5f)))
      .toDF("id", "v")
    val r1 = EmbeddingStats.anisotropy(same, "v").collect()(0)
    assert(math.abs(r1.getAs[Double]("anisotropy") - 1.0) < 1e-5)
    val centered = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)))
      .toDF("id", "v")
    val r0 = EmbeddingStats.anisotropy(centered, "v").collect()(0)
    assert(math.abs(r0.getAs[Double]("anisotropy")) < 1e-5)
    assert(r0.getAs[Double]("avg_norm_sq") === 1.0)
  }

  test("anisotropy: all-zero corpus reports NULL ratio with counts intact") {
    import graft.operators.EmbeddingStats
    val z = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "v")
    val r = EmbeddingStats.anisotropy(z, "v").collect()(0)
    assert(r.getAs[Long]("dims") === 2L && r.getAs[Long]("n") === 1L)
    assert(r.isNullAt(r.fieldIndex("anisotropy")))
  }
}
