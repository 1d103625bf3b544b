package graft

import graft.operators.{Lookup, Profiling, Similarity}
import org.apache.spark.sql.functions._

class LookupManifestSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- mostSpecificLookup

  private lazy val rules = Seq(
    (Option("a"), Option(1L), "specific"),
    (Option("a"), Option.empty[Long], "type_a"),
    (Option.empty[String], Option.empty[Long], "default"))
    .toDF("t", "b", "rule")

  test("mostSpecificLookup: most specific wins, level = popcount") {
    val facts = Seq(("a", 1L), ("a", 2L), ("z", 9L)).toDF("t", "b")
    val r = Lookup.mostSpecificLookup(facts, rules, Seq("t", "b"), "rule")
      .orderBy("t", "b").collect()
    assert(r.map(x => (x.getAs[String]("matched"),
      x.getAs[Int]("match_level"))).toSeq ===
      Seq(("specific", 2), ("type_a", 1), ("default", 0)))
  }

  test("mostSpecificLookup: no default rule -> NULL match, level -1") {
    val noDefault = rules.filter(col("t").isNotNull)
    val r = Lookup.mostSpecificLookup(Seq(("z", 9L)).toDF("t", "b"),
      noDefault, Seq("t", "b"), "rule").collect()(0)
    assert(r.isNullAt(r.fieldIndex("matched")))
    assert(r.getAs[Int]("match_level") === -1)
  }

  test("mostSpecificLookup rejects duplicate rule keys (silent fanout)") {
    val dup = rules.union(Seq((Option("a"), Option(1L), "other"))
      .toDF("t", "b", "rule"))
    intercept[IllegalArgumentException] {
      Lookup.mostSpecificLookup(Seq(("a", 1L)).toDF("t", "b"),
        dup, Seq("t", "b"), "rule")
    }
  }

  // ---------------------------------------------------- silhouetteByCell

  test("silhouetteByCell: points on their centroid score 1, midpoints 0") {
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("cid", "cvec")
    val pts = Seq(
      (10L, Array(2f, 0f)), // exactly centroid 0's direction -> s = 1
      (11L, Array(0f, 3f)), // exactly centroid 1's direction -> s = 1
      (12L, Array(1f, 1f)) // equidistant -> c1 = c2 -> s = 0
    ).toDF("vec_id", "embedding")
    val r = Similarity.silhouetteByCell(pts, "vec_id", "embedding", cents)
      .orderBy("cell").collect()
    val byCell = r.map(x => x.getAs[Long]("cell") ->
      (x.getAs[Long]("n"), x.getAs[Double]("mean_sil"))).toMap
    assert(byCell(0L)._1 === 2L) // point 10 + tie point 12 (cid-asc tie)
    assert(byCell(1L) === ((1L, 1.0)))
    // cell 0 mean: (1.0 + 0.0) / 2 = 0.5
    assert(byCell(0L)._2 === 0.5)
  }

  // ---------------------------------------------------- merkleManifest

  private lazy val tbl = Seq(
    (0L, "x"), (1L, "y"), (2L, "z"), (5L, "w"))
    .toDF("id", "s")

  test("merkleManifest: full range of nodes, subtree row counts, one root") {
    val m = Profiling.merkleManifest(tbl, pmod(col("id"), lit(4)), 4,
      col("id"), col("s")).orderBy("level", "idx").collect()
    assert(m.length === 7) // 4 + 2 + 1
    val root = m.last
    assert(root.getAs[Int]("level") === 2 && root.getAs[Long]("n_rows") === 4L)
    // shard 3 is empty but still a leaf
    val leaf3 = m.find(x => x.getAs[Int]("level") === 0 &&
      x.getAs[Long]("idx") === 3L).get
    assert(leaf3.getAs[Long]("n_rows") === 0L)
  }

  test("merkleManifest: a one-row change flips the root digest") {
    def root(df: org.apache.spark.sql.DataFrame): Long =
      Profiling.merkleManifest(df, pmod(col("id"), lit(4)), 4,
        col("id"), col("s"))
        .orderBy(desc("level")).limit(1).collect()(0).getAs[Long]("digest")
    val changed = Seq((0L, "x"), (1L, "y"), (2L, "Q"), (5L, "w"))
      .toDF("id", "s")
    assert(root(tbl) !== root(changed))
    assert(root(tbl) === root(tbl.orderBy(desc("id")))) // order-free
  }

  // -------------------------------------------------- spectral probe

  test("gramFixedPoint is symmetric with exact quantized diagonals") {
    val vs = Seq((0L, Array(0.5f, 1.0f)), (1L, Array(1.0f, 0.0f)))
      .toDF("id", "v")
    val g = graft.operators.Projection.gramFixedPoint(vs, "v", dim = 2)
      .orderBy("a").collect()
    val m = g.map(_.getSeq[Long](1).toArray)
    // q(0.5)=524288, q(1.0)=1048576, q(0.0)=0
    val (h, f) = (524288L, 1048576L)
    assert(m(0)(0) === h * h + f * f)
    assert(m(1)(1) === f * f)
    assert(m(0)(1) === m(1)(0) && m(0)(1) === h * f)
  }

  test("topComponentFixedPoint finds the dominant axis, unit norm") {
    // mass concentrated on dim 0
    val vs = (0 until 50).map(i => (i.toLong, Array(1.0f, 0.01f)))
      .toDF("id", "v")
    val r = graft.operators.Projection
      .topComponentFixedPoint(vs, "v", dim = 2, iterations = 30)
      .orderBy("dim").collect()
    val v = r.map(_.getAs[Double]("loading"))
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(math.abs(v(0)) > 0.99 && math.abs(v(1)) < 0.1)
    // lambda is the Rayleigh quotient of the Gram matrix: ~50 * q(1)^2
    val lambda = r(0).getAs[Double]("lambda")
    assert(lambda > 0.99 * 50.0 * 1048576.0 * 1048576.0)
  }

  test("removeTopComponentEnergy strips the dominant axis") {
    val vs = (0 until 40).map(i => (i.toLong, Array(1.0f, 0.005f)))
      .toDF("id", "v")
    val r = graft.operators.Projection
      .removeTopComponentEnergy(vs, "v", dim = 2, iterations = 30)
      .orderBy("dim").collect()
    // dim 0 carried nearly all energy; removal should erase almost all
    assert(r(0).getAs[Double]("removed_frac") > 0.99)
    assert(r(0).getAs[Long]("energy_after") <
      r(0).getAs[Long]("energy_before") / 100)
  }

  test("spectralGapFixedPoint: two planted directions give a large gap ratio") {
    // energy split ~4:1 between dims 0 and 1 -> lambda2/lambda1 ~ 1/4
    val vs = ((0 until 40).map(i => (i.toLong, Array(2.0f, 0.0f))) ++
      (40 until 80).map(i => (i.toLong, Array(0.0f, 1.0f))))
      .toDF("id", "v")
    val r = graft.operators.Projection
      .spectralGapFixedPoint(vs, "v", dim = 2, iterations = 40)
      .collect()(0)
    val ratio = r.getAs[Double]("gap_ratio")
    assert(math.abs(ratio - 0.25) < 1e-6)
    assert(r.getAs[Double]("lambda1") > r.getAs[Double]("lambda2"))
  }
}
