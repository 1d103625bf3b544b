package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("bottomKHashes keeps the k smallest DISTINCT values, ascending") {
    // duplicates collapse; values stream in shuffled order across 8
    // partitions so partial buffers must merge (serialize path included)
    val vals = (1L to 100L).flatMap(v => Seq(v, v)) // every value twice
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(vals), 8)
      .toDF("v").withColumn("g", lit("all"))
    val sk = df.groupBy("g").agg(Sketch.bottomKHashes($"v", 10).as("sk"))
      .select("sk").as[Seq[Long]].collect()(0)
    assert(sk === (1L to 10L))
  }

  test("bottomKHashes with fewer than k distinct values returns them all") {
    val df = Seq(5L, 3L, 5L, 3L, 9L).toDF("v").withColumn("g", lit(1))
    val sk = df.groupBy("g").agg(Sketch.bottomKHashes($"v", 10).as("sk"))
      .select("sk").as[Seq[Long]].collect()(0)
    assert(sk === Seq(3L, 5L, 9L))
  }

  test("bottomKHashes skips nulls and is order/partitioning-invariant") {
    val df = Seq(Some(4L), None, Some(2L), Some(8L), None).toDF("v")
      .withColumn("g", lit(1))
    val a = df.repartition(1).groupBy("g")
      .agg(Sketch.bottomKHashes($"v", 2).as("sk")).select("sk").as[Seq[Long]].collect()(0)
    val b = df.repartition(5).groupBy("g")
      .agg(Sketch.bottomKHashes($"v", 2).as("sk")).select("sk").as[Seq[Long]].collect()(0)
    assert(a === Seq(2L, 4L) && b === Seq(2L, 4L))
  }

  test("bottomKHashes rejects a non-long child at analysis time") {
    // ExpectsInputTypes turns misuse into an AnalysisException instead of
    // a mid-job ClassCastException in update()'s asInstanceOf[Long].
    val df = Seq("a", "b").toDF("s").withColumn("g", lit(1))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(Sketch.bottomKHashes($"s", 4).as("sk")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint") ||
      e.getMessage.toLowerCase.contains("long"))
  }

  test("kmvDistinctEstimate: exact below k, (k-1)M/h_k at k") {
    val k = 4
    val m = 1000L
    // sketch full: h_k = 40 → est = 3*1000/40 = 75.0
    val full = Seq((1, Seq(10L, 20L, 30L, 40L))).toDF("g", "sk")
    val estF = full.select(Sketch.kmvDistinctEstimate($"sk", k, m)).as[Double].collect()(0)
    assert(estF === 75.0)
    // sketch short: exact size
    val short = Seq((1, Seq(10L, 20L))).toDF("g", "sk")
    val estS = short.select(Sketch.kmvDistinctEstimate($"sk", k, m)).as[Double].collect()(0)
    assert(estS === 2.0)
  }

  test("sampledQuantiles: sample == population when k covers the group; exact ranks") {
    // group a: 10 values, k=16 ≥ 10 → the "sample" is the whole group and
    // the lower-quantile ranks are exact: p50 = rank ceil(10/2)=5, p90 =
    // rank ceil(9)=9
    val df = ((1L to 10L).map(v => ("a", v, v + 100)) ++
      Seq(("b", 7L, 201L), ("b", 7L, 202L))).toDF("g", "v", "key")
    val out = Sketch.sampledQuantiles(df, "g", "v", "key", k = 16,
      Seq(("p50", 1, 2), ("p90", 9, 10)))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) === (("a", 10L, 10L, 5L, 9L)))
    assert(out(1) === (("b", 2L, 2L, 7L, 7L)))
  }

  test("sampledQuantiles is partitioning-invariant and bounded at k") {
    val rows = (1L to 500L).map(v => ("g", v * 3 % 997, v))
    val a = Sketch.sampledQuantiles(
      rows.toDF("g", "v", "key").repartition(1), "g", "v", "key", k = 32,
      Seq(("p50", 1, 2))).collect()(0)
    val b = Sketch.sampledQuantiles(
      rows.toDF("g", "v", "key").repartition(16), "g", "v", "key", k = 32,
      Seq(("p50", 1, 2))).collect()(0)
    assert(a.getLong(1) === 500L)
    assert(a.getLong(2) === 32L) // sample bounded at k
    assert(a.toSeq === b.toSeq) // merge order cannot change the sketch
    // a uniform 32-sample median of 1..996-ish values lands mid-range
    assert(a.getLong(3) > 100L && a.getLong(3) < 900L)
  }

  test("BottomKLongPairs collapses duplicate (hash, value) pairs") {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val df = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L))
      .toDF("h", "v").withColumn("g", lit(1))
    val sk = df.groupBy("g").agg(
      toColumn(graft.expressions.BottomKLongPairs(
        toExpression($"h"), toExpression($"v"), 10).toAggregateExpression())
        .as("sk"))
      .select("sk").as[Seq[(Long, Long)]].collect()(0)
    assert(sk === Seq((1L, 10L), (1L, 20L), (2L, 10L)))
  }

  test("count-min: overestimates only, exact when buckets are collision-free") {
    val items = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = items.toDF("tok")
    val sketch = Sketch.countMinTable(df, "tok", d = 3, w = 256)
    // table shape: d rows' buckets, total count preserved per row
    val perRow = sketch.groupBy("row").agg(sum("cnt").as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow === Map(0 -> 9L, 1 -> 9L, 2 -> 9L))
    val probes = Seq(("alpha", 5L), ("beta", 3L), ("gamma", 1L), ("absent", 0L))
      .toDF("tok", "truth")
    val est = Sketch.cmsEstimate(sketch, probes, "tok", d = 3, w = 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    est.foreach { case (tok, (truth, e)) =>
      assert(e >= truth, s"$tok: CMS must never underestimate")
    }
    // 3 distinct tokens in 256 buckets: whp collision-free per row → exact
    assert(est("alpha") === ((5L, 5L)))
    assert(est("absent")._2 >= 0L)
  }

  test("cmsEstimate probes via a broadcast join (sketch never shuffles probes)") {
    val sketch = Sketch.countMinTable(Seq("x", "y").toDF("tok"), "tok", d = 2, w = 64)
    val probes = Seq(("x", 1L)).toDF("tok", "truth")
    // stringified: AQE's AdaptiveSparkPlanExec root hides children from
    // a typed collect over the physical tree
    val plan = Sketch.cmsEstimate(sketch, probes, "tok", d = 2, w = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the d*w-row sketch must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"probe rows must never shuffle for the lookup:\n$plan")
  }

  test("count-min tables merge by addition") {
    val a = Seq("x", "x", "y").toDF("tok")
    val b = Seq("x", "z").toDF("tok")
    val merged = Sketch.countMinTable(a, "tok", d = 2, w = 64)
      .unionByName(Sketch.countMinTable(b, "tok", d = 2, w = 64))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val direct = Sketch.countMinTable(a.unionByName(b), "tok", d = 2, w = 64)
    val canon = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
    assert(canon(merged) === canon(direct))
  }

  test("KMV estimate lands near the true distinct count on uniform hashes") {
    // 5000 distinct keys through the portable mixer; k=64 → relative
    // error ~1/sqrt(k-1) ≈ 13%; assert a loose 3-sigma-ish band
    val df = spark.range(0, 5000).toDF("id").withColumn("g", lit(1))
      .withColumn("h", graft.operators.Sampling.hashBucket($"id", 1000000))
    val k = 64
    val est = df.groupBy("g")
      .agg(Sketch.bottomKHashes($"h", k).as("sk"))
      .select(Sketch.kmvDistinctEstimate($"sk", k, 1000000L)).as[Double].collect()(0)
    assert(est > 2500 && est < 10000, s"estimate $est too far from 5000")
  }

  // --- HLL --------------------------------------------------------------

  private def hllOf(items: Seq[String], parts: Int = 4): Seq[Long] =
    Sketch.hllRegisterTable(
      spark.sparkContext.parallelize(items, parts).toDF("item")
        .withColumn("g", lit("all")),
      "g", "item", b = 6)
      .select("regs").as[Seq[Long]].collect()(0)

  test("thetaSetOps: exact set algebra when neither sketch is full") {
    val M = graft.operators.TextAnalysis.HashMod
    val df = (Seq(10L, 20L, 30L).map(("a", _)) ++
      Seq(20L, 30L, 40L, 50L).map(("b", _))).toDF("g", "h")
    val sk = df.groupBy("g").agg(Sketch.bottomKHashes($"h", 32).as("sk"))
    val r = Sketch.thetaSetOps(sk, "g", "sk", k = 32, hashMod = M).collect()
    assert(r.length === 1)
    val row = r(0)
    assert((row.getAs[String]("i"), row.getAs[String]("j")) === ("a", "b"))
    assert(row.getAs[Long]("theta") === M) // not full → exact
    assert(row.getAs[Long]("n_union") === 5L)
    assert(row.getAs[Long]("n_inter") === 2L)
    assert(row.getAs[Double]("union_est") === 5.0)
    assert(row.getAs[Double]("inter_est") === 2.0)
    assert(row.getAs[Double]("jaccard_est") === 0.4)
  }

  test("thetaSetOps: full sketches estimate overlap within KMV error") {
    val M = graft.operators.TextAnalysis.HashMod
    def hv(i: Long) = (i * 2654435761L) % M
    // |A|=5000, |B|=5000, |A∩B|=2500, |A∪B|=7500
    val df = ((1L to 5000L).map(i => ("a", hv(i))) ++
      (2501L to 7500L).map(i => ("b", hv(i)))).toDF("g", "h")
    val sk = df.groupBy("g").agg(Sketch.bottomKHashes($"h", 256).as("sk"))
    val row = Sketch.thetaSetOps(sk, "g", "sk", k = 256, hashMod = M)
      .collect()(0)
    assert(math.abs(row.getAs[Double]("union_est") - 7500.0) < 1500,
      s"union_est=${row.getAs[Double]("union_est")}")
    assert(math.abs(row.getAs[Double]("inter_est") - 2500.0) < 750,
      s"inter_est=${row.getAs[Double]("inter_est")}")
    assert(math.abs(row.getAs[Double]("jaccard_est") - 1.0 / 3) < 0.1)
  }

  test("hllRegisterTable matches a sequential reference, dense 64 registers") {
    val items = (1 to 500).map(i => s"tok$i")
    val mod = 1000000007L
    def ph(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c) % mod)
    def mix(h0: Long): Long = {
      val a = h0 ^ (h0 >> 15)
      val b = (a * 1540483477L) % 2147483648L
      val d = b ^ (b >> 13)
      val e = (d * 1103515245L) % 2147483648L
      e ^ (e >> 16)
    }
    val ref = Array.fill(64)(0L)
    items.distinct.foreach { s =>
      val h = mix(ph(s))
      val v = h / 64; val bk = (h % 64).toInt
      val rnk = if (v == 0) 26L else 26L - java.lang.Long.toBinaryString(v).length
      if (rnk > ref(bk)) ref(bk) = rnk
    }
    val got = hllOf(items ++ items) // duplicates must not change registers
    assert(got.length === 64 && got === ref.toSeq)
  }

  test("hllMerge(regs(A), regs(B)) equals regs(A union B); partitioning-invariant") {
    val a = (1 to 300).map(i => s"a$i")
    val b = (200 to 600).map(i => s"a$i") // overlapping
    val ra = hllOf(a); val rb = hllOf(b, parts = 7)
    val merged = spark.sql("select 1").select(
      Sketch.hllMerge(typedlit(ra), typedlit(rb)).as("m"))
      .as[Seq[Long]].collect()(0)
    assert(merged === hllOf(a ++ b))
    assert(hllOf(a, parts = 1) === hllOf(a, parts = 13))
  }

  test("hllEstimate lands near the true distinct count") {
    val items = (1 to 5000).map(i => s"w$i-x")
    val est = Sketch.hllRegisterTable(
      items.toDF("item").withColumn("g", lit(1)), "g", "item", b = 6)
      .select(Sketch.hllEstimate("regs", b = 6)).as[Double].collect()(0)
    // m=64 → ~13% theoretical σ, widened for the weak portable hash
    assert(est > 2500 && est < 10000, s"estimate $est too far from 5000")
  }

  test("mgSummary: every item above n/(k+1) present; weights undercount by <= n/(k+1)") {
    // 3 heavy items among a long tail, shuffled across 8 partitions so
    // partial summaries must merge (serialize path included)
    val heavy = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++ Seq.fill(120)("gamma")
    val tail = (1 to 380).map(i => s"t$i")
    val items = new scala.util.Random(7).shuffle(heavy ++ tail) // n = 1000
    val k = 9 // guarantee floor n/(k+1) = 100
    val df = spark.sparkContext.parallelize(items, 8).toDF("item")
    val mg = df.agg(graft.operators.HeavyHitters.mgSummary(col("item"), k).as("mg"))
      .selectExpr("inline(mg)").as[(String, Long)].collect().toMap
    assert(mg.size <= k)
    for ((it, true_) <- Seq("alpha" -> 300L, "beta" -> 200L, "gamma" -> 120L)) {
      assert(mg.contains(it), s"$it above the n/(k+1) floor must survive")
      assert(mg(it) <= true_ && mg(it) >= true_ - 1000L / (k + 1))
    }
  }

  test("exactTopShare: exact counts, exact threshold, guarantee enforced") {
    val items = Seq.fill(50)("hot") ++ Seq.fill(10)("warm") ++ (1 to 40).map(i => s"c$i")
    val df = spark.sparkContext.parallelize(
      new scala.util.Random(3).shuffle(items), 4).toDF("tok")
    // n = 100; share 10% -> {hot, warm}; k=31 satisfies 1/10 > 1/32
    val out = graft.operators.HeavyHitters
      .exactTopShare(df, "tok", k = 31, num = 1L, denom = 10L)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("hot", 50L, 100L), ("warm", 10L, 100L)))
    // threshold at the guarantee boundary is rejected, not silently wrong
    intercept[IllegalArgumentException] {
      graft.operators.HeavyHitters.exactTopShare(df, "tok", k = 9, num = 1L, denom = 10L)
    }
  }

  test("exactTopShare: empty/all-NULL input yields an empty typed result") {
    val df = Seq[Option[String]](None, None).toDF("tok")
    val out = graft.operators.HeavyHitters.exactTopShare(df, "tok", 31, 1L, 10L)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("item", "cnt", "n"))
  }
}
