package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

/** Product quantization: kernel↔HOF parity, tie/NULL semantics, ADC
  * distance correctness, and the per-block Lloyd refinement step.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def cbDf(cb: Seq[(Int, Long, Seq[Float])]) =
    cb.toDF("block", "code", "cvec")

  // 2 blocks × 2 codes over dim 4
  private val cb22 = cbDf(Seq(
    (0, 0L, Seq(0.0f, 0.0f)), (0, 1L, Seq(1.0f, 1.0f)),
    (1, 0L, Seq(0.0f, 1.0f)), (1, 1L, Seq(1.0f, 0.0f))))

  test("encode picks the argmin-L2 code per block") {
    val vs = Seq(
      (1L, Seq(0.1f, 0.2f, 0.9f, 0.1f)), // block0 → 0, block1 → 1
      (2L, Seq(0.8f, 0.9f, 0.1f, 0.8f))  // block0 → 1, block1 → 0
    ).toDF("id", "v")
    val out = Pq.encode(vs, "id", "v", cb22)
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(out === Seq((1L, Seq(0L, 1L)), (2L, Seq(1L, 0L))))
  }

  test("encode is bit-identical to the HOF executable spec on seeded vectors") {
    val rnd = new scala.util.Random(20260812)
    val dim = 8
    val vs = (0L until 64L).map(i =>
      (i, Seq.fill(dim)((rnd.nextFloat() - 0.5f) * 10f))).toDF("id", "v")
    val cb = cbDf((for (b <- 0 until 4; c <- 0L until 4L) yield
      (b, c, Seq.fill(2)((rnd.nextFloat() - 0.5f) * 10f))))
    val kern = Pq.encode(vs, "id", "v", cb).orderBy("id")
      .as[(Long, Seq[Long])].collect()
    val hof = Pq.encodeHof(vs, "id", "v", cb).orderBy("id")
      .as[(Long, Seq[Long])].collect()
    assert(kern === hof)
  }

  test("ties resolve to the smallest code; malformed vectors yield NULL codes") {
    val dup = cbDf(Seq(
      (0, 0L, Seq(1.0f, 1.0f)), (0, 1L, Seq(1.0f, 1.0f)))) // identical centroids
    val vs = Seq((1L, Seq(3.0f, 4.0f))).toDF("id", "v")
    assert(Pq.encode(vs, "id", "v", dup).head.getSeq[Long](1) === Seq(0L))
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "v") // dim 3 ≠ 2
    assert(Pq.encode(bad, "id", "v", dup).head.isNullAt(1))
  }

  test("adcTopK distances are the exact query-to-reconstruction L2^2") {
    val vs = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f, 1.0f)), // codes (0,0): recon (0,0,0,1)
      (2L, Seq(1.0f, 1.0f, 1.0f, 0.0f))  // codes (1,1): recon (1,1,1,0)
    ).toDF("id", "v")
    val q = Array(0.0f, 0.0f, 0.0f, 1.0f)
    val out = Pq.adcTopK(vs, "id", "v", q, cb22, topK = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // d(q, recon1) = 0; d(q, recon2) = 1+1+1+1 = 4
    assert(out === Seq((1L, 0.0), (2L, 4.0)))
  }

  test("adcTopK breaks distance ties by id ascending and honors topK") {
    val vs = Seq(
      (5L, Seq(0.0f, 0.0f, 0.0f, 1.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 1.0f)), // same codes as 5 → same adist
      (9L, Seq(1.0f, 1.0f, 1.0f, 0.0f))
    ).toDF("id", "v")
    val q = Array(0.0f, 0.0f, 0.0f, 1.0f)
    val out = Pq.adcTopK(vs, "id", "v", q, cb22, topK = 2).collect()
      .map(_.getLong(0)).toSeq
    assert(out === Seq(3L, 5L))
  }

  test("adcTopK with precomputedCodes equals the encode-inline path") {
    val vs = Seq(
      (1L, Seq(0.2f, 0.1f, 0.9f, 0.8f)),
      (2L, Seq(0.7f, 0.6f, 0.1f, 0.2f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 1.0f))).toDF("id", "v")
    val q = Array(0.1f, 0.1f, 0.9f, 0.9f)
    val inline = Pq.adcTopK(vs, "id", "v", q, cb22, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val codes = Pq.encode(vs, "id", "v", cb22) // the persisted codes table
    val reused = Pq.adcTopK(vs, "id", "v", q, cb22, topK = 3,
      precomputedCodes = Some(codes))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline === reused)
  }

  test("adcTopKMulti equals per-query adcTopK over the batch") {
    val rnd = new scala.util.Random(11)
    val vs = (0L until 20L).map(i =>
      (i, Seq.fill(4)((rnd.nextFloat() - 0.5f) * 4f))).toDF("id", "v")
    val queries = Seq(
      3L -> Array(0.5f, 0.5f, -0.5f, -0.5f),
      7L -> Array(-1.0f, 0.2f, 0.3f, 0.9f))
    val multi = Pq.adcTopKMulti(vs, "id", "v", queries, cb22, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val single = queries.flatMap { case (qid, qv) =>
      Pq.adcTopK(vs.filter(col("id") =!= qid), "id", "v", qv, cb22, topK = 4)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1)) }
    }.sortBy(t => (t._1, t._2))
    assert(multi === single)
  }

  test("adcRerankTopK: exact rerank fixes ADC rank inversions within the shortlist") {
    val rnd = new scala.util.Random(31)
    val vs = (0L until 40L).map(i =>
      (i, Seq.fill(4)((rnd.nextFloat() - 0.5f) * 4f))).toDF("id", "v")
    val q = Array(0.3f, -0.2f, 0.8f, -0.6f)
    // shortlist = whole corpus → stage 2 IS the exact ranking
    val reranked = Pq.adcRerankTopK(vs, "id", "v", q, cb22,
      shortlist = 40, topK = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    def exactD(v: Seq[Float]): Double = {
      var s = 0.0
      v.indices.foreach { i =>
        val d = q(i).toDouble - v(i).toDouble; s += d * d }
      s
    }
    val expected = vs.collect().map(r => (r.getLong(0), exactD(r.getSeq[Float](1))))
      .sortBy { case (id, dd) => (dd, id) }.take(5).toSeq
    assert(reranked.toSeq === expected)
    // exact order must differ from raw ADC order somewhere in the top-5
    // (otherwise this test wouldn't witness the rerank doing anything)
    val adcOrder = Pq.adcTopK(vs, "id", "v", q, cb22, topK = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(adcOrder !== expected.map(_._1),
      "seed produced identical ADC/exact top-5; pick another seed")
  }

  test("adcTopKMulti broadcast fallback equals the literal path at nq >= 1000") {
    val rnd = new scala.util.Random(23)
    val vs = (0L until 30L).map(i =>
      (i, Seq.fill(4)((rnd.nextFloat() - 0.5f) * 4f))).toDF("id", "v")
    // qids start at 1000 so excludeSelf never bites (corpus ids < 30)
    val queries = (0 until 1000).map(i =>
      (1000L + i) -> Array.fill(4)((rnd.nextFloat() - 0.5f) * 4f))
    def run(limit: Int) =
      Pq.adcTopKMulti(vs, "id", "v", queries, cb22, k = 3,
        literalLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val viaBroadcast = run(limit = 1) // forces the fallback
    val viaLiteral = run(limit = Int.MaxValue) // nq*m*k = 4000 fits
    assert(viaBroadcast === viaLiteral)
    assert(viaBroadcast.map(_._1).distinct.length === 1000)
  }

  test("adcTopKMulti rejects duplicate qids and index-space overflow") {
    val vs = Seq((0L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val q = Array(0.0f, 0.0f, 0.0f, 0.0f)
    intercept[IllegalArgumentException] {
      Pq.adcTopKMulti(vs, "id", "v", Seq(1L -> q, 1L -> q), cb22, k = 1)
    }
  }

  test("lloydSums trains with no join in the plan (encode carries the vector)") {
    val cb = cbDf(Seq((0, 0L, Seq(0.0f, 0.0f)), (0, 1L, Seq(10.0f, 10.0f))))
    val vs = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(11.0f, 9.0f))).toDF("id", "v")
    val plan = Pq.lloydSums(vs, "id", "v", cb, sub = 2)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty,
      s"Lloyd sufficient-statistics pass must not join the corpus to itself:\n$plan")
  }

  test("refineCodebooks moves centroids to assigned sub-vector means; empty cells persist") {
    // one block, two codes; three vectors cluster near (0,0) and (10,10)
    val cb = cbDf(Seq((0, 0L, Seq(0.0f, 0.0f)), (0, 1L, Seq(10.0f, 10.0f))))
    val vs = Seq(
      (1L, Seq(1.0f, 1.0f)), (2L, Seq(3.0f, 1.0f)), (3L, Seq(11.0f, 9.0f))
    ).toDF("id", "v")
    val refined = Pq.refineCodebooks(vs, "id", "v", cb, iterations = 1)
      .orderBy("code").as[(Int, Long, Seq[Float])].collect()
    assert(refined(0)._3 === Seq(2.0f, 1.0f))   // mean of (1,1),(3,1)
    assert(refined(1)._3 === Seq(11.0f, 9.0f))  // mean of the single member
    // empty cell: push both centroids far away except one
    val cbE = cbDf(Seq((0, 0L, Seq(0.0f, 0.0f)), (0, 1L, Seq(99.0f, 99.0f))))
    val one = Seq((1L, Seq(1.0f, 1.0f))).toDF("id", "v")
    val refE = Pq.refineCodebooks(one, "id", "v", cbE, iterations = 1)
      .orderBy("code").as[(Int, Long, Seq[Float])].collect()
    assert(refE(0)._3 === Seq(1.0f, 1.0f))
    assert(refE(1)._3 === Seq(99.0f, 99.0f)) // untouched — no members
  }

  test("ivfAdcTopK prunes to probed cells before ADC ranking") {
    // centroids on the x/y axes; vectors 1,2 near x, 3 near y
    val cents = Seq(
      (0L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 1.0f))).toDF("cid", "cvec")
    val vs = Seq(
      (1L, Seq(2.0f, 0.1f, 2.0f, 0.1f)),
      (2L, Seq(3.0f, 0.0f, 3.0f, 0.0f)),
      (3L, Seq(0.1f, 2.0f, 0.1f, 2.0f))).toDF("id", "v")
    val q = Array(1.0f, 0.0f, 1.0f, 0.0f)
    val out = Pq.ivfAdcTopK(vs, "id", "v", q, cents, cb22,
      nProbe = 1, topK = 10)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // nProbe=1 probes the x cell (cid 0) only: vector 3 is pruned out
    assert(got.map(_._1).sorted === Seq(1L, 2L))
    assert(got.forall(_._2 == 0L))
    // excludeId drops the query's own row
    val excl = Pq.ivfAdcTopK(vs, "id", "v", q, cents, cb22,
      nProbe = 1, topK = 10, excludeId = Some(1L))
    assert(excl.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("Lloyd training reduces total quantization error on clustered data") {
    // 4 tight clusters in 4-D; first-k init picks 4 near-identical
    // vectors from cluster 0, so training must spread the codebook out.
    val rnd = new scala.util.Random(31337)
    val centers = Seq(
      Array(5f, 5f, 0f, 0f), Array(-5f, 5f, 0f, 0f),
      Array(0f, 0f, 5f, -5f), Array(0f, 0f, -5f, -5f))
    val vs = (0L until 80L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    }.toDF("id", "v")
    // degenerate init: all 4 codes sit on cluster 0 (tiny offsets keep
    // them distinct) — training must migrate three of them out
    val init = cbDf((0 until 4).map(c =>
      (0, c.toLong, centers(0).map(x => x + 0.01f * c).toSeq)))
    def totalErr(cb: org.apache.spark.sql.DataFrame): Double = {
      // reconstruction error: per-vector min squared distance to any code
      val cents = cb.orderBy("code").collect()
        .map(_.getSeq[Float](2).toArray)
      vs.collect().map { r =>
        val v = r.getSeq[Float](1).toArray
        cents.map { cent =>
          v.zip(cent).map { case (x, c) =>
            val d = x.toDouble - c.toDouble; d * d
          }.sum
        }.min
      }.sum
    }
    val trained = Pq.refineCodebooks(vs, "id", "v", init, iterations = 4)
    val (e0, e1) = (totalErr(init), totalErr(trained))
    // Lloyd guarantees monotone improvement, not a global optimum: from
    // this degenerate init it lands in the classic local minimum where
    // one migrated code serves several far clusters (k-means++-style
    // reseeding would be needed to split further). 2x is the robust
    // floor; measured ~3x.
    assert(e1 < e0 / 2,
      s"training did not reduce quantization error: err $e0 -> $e1")
    // and it must never get WORSE round over round
    val once = Pq.refineCodebooks(vs, "id", "v", init, iterations = 1)
    assert(totalErr(once) >= e1 - 1e-9 && totalErr(once) <= e0)
  }

  test("firstKCodebooks slices the first k vectors per block, code = id") {
    val vs = Seq(
      (0L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Seq(5.0f, 6.0f, 7.0f, 8.0f)),
      (7L, Seq(9.0f, 9.0f, 9.0f, 9.0f))).toDF("id", "v")
    val cb = Pq.firstKCodebooks(vs, "id", "v", m = 2, k = 2, dim = 4)
      .orderBy("block", "code").as[(Int, Long, Seq[Float])].collect()
    assert(cb === Seq(
      (0, 0L, Seq(1.0f, 2.0f)), (0, 1L, Seq(5.0f, 6.0f)),
      (1, 0L, Seq(3.0f, 4.0f)), (1, 1L, Seq(7.0f, 8.0f))))
  }

  test("trained codebooks persist through parquet and serve identically (train once, serve later)") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 40L).map(i =>
      (i, Seq.fill(4)(rnd.nextFloat()))).toDF("id", "v")
    val trained = Pq.refineCodebooks(corpus, "id", "v",
      Pq.firstKCodebooks(corpus, "id", "v", m = 2, k = 4, dim = 4),
      iterations = 2)
    val dir = java.nio.file.Files.createTempDirectory("pqcb").toString
    graft.io.TableIO.write(trained, s"$dir/codebooks")
    val reloaded = graft.io.TableIO.read(spark, s"$dir/codebooks")
    val q = Array(0.3f, 0.7f, 0.2f, 0.9f)
    val a = Pq.adcTopK(corpus, "id", "v", q, trained, topK = 5)
      .collect().map(_.toSeq).toSeq
    val b = Pq.adcTopK(corpus, "id", "v", q, reloaded, topK = 5)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
    // the float centroids themselves survive bit-exactly
    val rt = reloaded.orderBy("block", "code").as[(Int, Long, Seq[Float])].collect()
    val or = trained.orderBy("block", "code").as[(Int, Long, Seq[Float])].collect()
    assert(rt === or)
  }
}
