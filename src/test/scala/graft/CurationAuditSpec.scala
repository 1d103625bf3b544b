package graft

import graft.operators.{Profiling, TextAnalysis}
import org.apache.spark.sql.functions._

class CurationAuditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a b c d", "s0"), // trigrams: "a b c", "b c d"
    (1L, "a b c e", "s0"), // shares "a b c" with doc 0
    (2L, "x y z w", "s1"), // all novel
    (3L, "a b", "s1") // too short for trigrams
  ).toDF("doc_id", "text", "src")

  test("ngramNovelty: df=1 fraction per doc, short docs absent") {
    val r = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 1L, 2L))
    assert(r.map(x => (x.getAs[Long]("n_shingles"), x.getAs[Long]("n_novel")))
      .toSeq === Seq((2L, 1L), (2L, 1L), (2L, 2L)))
    assert(r(2).getAs[Double]("novelty") === 1.0)
  }

  test("ngramNovelty: all-duplicate docs report novelty 0, not absent") {
    val twins = Seq((0L, "p q r"), (1L, "p q r")).toDF("doc_id", "text")
    val r = TextAnalysis.ngramNovelty(twins, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(r.length === 2)
    assert(r.forall(_.getAs[Long]("n_novel") === 0L))
    assert(r.forall(_.getAs[Double]("novelty") === 0.0))
  }

  test("blocklistHits: counts, distinct terms, sorted categories") {
    val d = Seq((0L, "slow merge slow ok"), (1L, "clean text only"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.blocklistHits(d, "doc_id", "text",
      Seq("slow" -> "perf", "merge" -> "infra")).collect()
    assert(r.length === 1) // doc 1 has no hits -> absent
    assert(r(0).getAs[Long]("n_hits") === 3L)
    assert(r(0).getAs[Long]("n_terms") === 2L)
    assert(r(0).getAs[Seq[String]]("categories") === Seq("infra", "perf"))
  }

  test("chiSquaredCells: zero cells appear and contribs sum to chi2") {
    // 2x2 with an empty cell: s0 -> {a:2, b:2}, s1 -> {a:2}
    val d = Seq(("s0", "a"), ("s0", "a"), ("s0", "b"), ("s0", "b"),
      ("s1", "a"), ("s1", "a")).toDF("g", "v")
    val r = Profiling.chiSquaredCells(d, "g", "v").orderBy("g", "v").collect()
    assert(r.length === 4) // includes the (s1, b) zero cell
    val zero = r.find(x => x.getAs[String]("g") == "s1" &&
      x.getAs[String]("v") == "b").get
    assert(zero.getAs[Long]("o") === 0L)
    // hand-computed: N=6, rt(s0)=4, rt(s1)=2, ct(a)=4, ct(b)=2
    // chi2 = sum over cells of (o*N - rt*ct)^2 / (N*rt*ct) = 1.5
    val chi2 = r.map(_.getAs[Double]("contrib")).sum
    assert(math.abs(chi2 - 1.5) < 1e-12)
  }

  // ---------------------------------------------------------- planning ops

  test("skewReport: extremes, deterministic hot key, ceiling salt factor") {
    // key a: 6 rows, b: 1, c: 1 -> n=8, keys=3, max=6
    val d = (Seq.fill(6)("a") ++ Seq("b", "c")).toDF("k")
    val r = graft.operators.Skew.skewReport(d, "k", partitions = 4)
      .collect()(0)
    assert(r.getAs[Long]("n_rows") === 8L && r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("max_cnt") === 6L && r.getAs[String]("max_key") === "a")
    // ceil(6*4/8) = 3
    assert(r.getAs[Long]("salt_factor") === 3L)
    assert(r.getAs[Double]("skew_ratio") === 6.0 * 3 / 8)
  }

  test("joinSizeEstimate: rate 1 reproduces the exact join size") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 4L).toDF("k")
    // exact join size: key1 2*1 + key2 1*2 = 4
    val r = graft.operators.Sketch.joinSizeEstimate(a, b, "k", rate = 1)
      .collect()(0)
    assert(r.getAs[Long]("est_join_rows") === 4L)
    assert(r.getAs[Long]("n_sampled_keys") === 2L)
  }

  test("joinSizeEstimate: empty sample reports zeros, not NULLs") {
    val a = Seq(1L).toDF("k")
    val b = Seq(2L).toDF("k")
    val r = graft.operators.Sketch.joinSizeEstimate(a, b, "k", rate = 1)
      .collect()(0)
    assert(r.getAs[Long]("n_sampled_keys") === 0L)
    assert(r.getAs[Long]("sampled_pairs") === 0L)
    assert(r.getAs[Long]("est_join_rows") === 0L)
  }

  test("bootstrapReplicates: exact weighted sums, plausible Poisson spread") {
    val d = (0 until 400).map(i => (i.toLong, if (i % 4 == 0) 1L else 0L))
      .toDF("id", "m")
    val r = graft.operators.Sampling.bootstrapReplicates(d, "id", col("m"), 16)
      .orderBy("b").collect()
    assert(r.length === 16)
    // Poisson(1) weights: each replicate's effective n should be near 400
    val wsums = r.map(_.getAs[Long]("w_sum"))
    assert(wsums.forall(w => w > 300 && w < 500))
    // rates scatter around the true 0.25 but are not all identical
    val rates = r.map(_.getAs[Double]("rate"))
    assert(rates.forall(x => x > 0.1 && x < 0.4))
    assert(rates.distinct.length > 1)
    // deterministic: second run bit-identical
    val r2 = graft.operators.Sampling.bootstrapReplicates(d, "id", col("m"), 16)
      .orderBy("b").collect()
    assert(r.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
  }

  test("trimmedMeanByGroup: row-exact tail trims, boundary value splits") {
    // group g: values 1,2,2,3,100 (n=5, k=floor(5/10)=0 at 10% -> no trim)
    // at 20% (1/5): k=1 -> drop one 1 and one 100 -> mean of (2,2,3) = 7/3
    val d = Seq(1L, 2L, 2L, 3L, 100L).map(("g", _)).toDF("g", "v")
    val r = graft.operators.ExactQuantiles
      .trimmedMeanByGroup(d, "g", "v", num = 1, den = 5).collect()(0)
    assert(r.getAs[Long]("n") === 5L && r.getAs[Long]("k_trimmed") === 1L)
    assert(r.getAs[Long]("trimmed_sum") === 7L)
    assert(r.getAs[Double]("trimmed_mean") === 7.0 / 3.0)
  }

  test("trimmedMeanByGroup: over-trimmed group reports NULL mean") {
    val d = Seq(("g", 5L), ("g", 6L)).toDF("g", "v")
    val r = graft.operators.ExactQuantiles
      .trimmedMeanByGroup(d, "g", "v", num = 2, den = 5).collect()(0)
    // k = floor(2*2/5) = 0 -> no trim; use a 2/5 trim on n=5 instead
    assert(r.getAs[Long]("k_trimmed") === 0L)
    val d5 = Seq(1L, 2L, 3L, 4L, 5L).map(("g", _)).toDF("g", "v")
    val r5 = graft.operators.ExactQuantiles
      .trimmedMeanByGroup(d5, "g", "v", num = 2, den = 5).collect()(0)
    // k = 2 -> keeps only the middle value 3
    assert(r5.getAs[Long]("trimmed_sum") === 3L)
    assert(r5.getAs[Double]("trimmed_mean") === 3.0)
  }

  test("lorenzGiniByGroup: equal masses give 0; one-holder approaches 1") {
    import org.apache.spark.sql.functions.col
    val d = Seq(("eq", 5L), ("eq", 5L), ("eq", 5L), ("eq", 5L),
      ("one", 0L), ("one", 0L), ("one", 0L), ("one", 100L))
      .toDF("g", "v")
    val r = graft.operators.Profiling.lorenzGiniByGroup(d, "g", col("v"))
      .orderBy("g").collect()
    assert(r(0).getAs[Double]("gini") === 0.0)
    // one holder of n=4: G = (n-1)/n = 0.75
    assert(r(1).getAs[Double]("gini") === 0.75)
  }

  test("lorenzGiniByGroup: tie runs match the sorted-rank definition") {
    import org.apache.spark.sql.functions.col
    val vals = Seq(1L, 2L, 2L, 5L, 10L)
    val d = vals.map(("g", _)).toDF("g", "v")
    val r = graft.operators.Profiling.lorenzGiniByGroup(d, "g", col("v"))
      .collect()(0)
    val sorted = vals.sorted
    val rankSum = sorted.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    assert(r.getAs[Long]("rank_sum") === rankSum)
    val n = vals.size
    val tot = vals.sum
    val expected = (2.0 * rankSum - (n + 1) * tot).toDouble / (n.toLong * tot)
    assert(r.getAs[Double]("gini") === expected)
    // negative and NULL mass is excluded
    val withBad = (d.union(Seq(("g", -3L)).toDF("g", "v")))
    assert(graft.operators.Profiling.lorenzGiniByGroup(withBad, "g", col("v"))
      .collect()(0).getAs[Long]("n") === n.toLong)
  }

  test("benfordAudit: digits come from decimal strings, absent digits report 0") {
    import org.apache.spark.sql.functions.col
    // values with leading digits 1,1,2,9; zero and negative excluded
    val d = Seq(12L, 190L, 25L, 9L, 0L, -7L).toDF("v")
    val rows = graft.operators.Profiling.benfordAudit(d, col("v"))
      .orderBy("digit").collect()
    assert(rows.length === 9)
    assert(rows.map(_.getAs[Long]("observed")).toSeq ===
      Seq(2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(rows.forall(_.getAs[Long]("n") === 4L))
    // chi2 total is identical on every row and equals the term sum / 2^30
    val terms = rows.map(_.getAs[Long]("term_fp")).sum
    assert(rows.forall(_.getAs[Long]("chi2_fp") === terms))
    assert(rows(0).getAs[Double]("chi2") === terms.toDouble / (1L << 30))
  }

  test("anovaByGroup: separated groups explain all variance; one group yields NULL f") {
    import org.apache.spark.sql.functions.col
    // within-group constant -> ssw 0, eta2 1
    val sep = Seq(("a", 10L), ("a", 10L), ("b", 20L), ("b", 20L))
      .toDF("g", "v")
    val r = graft.operators.Profiling.anovaByGroup(sep, "g", col("v"))
      .collect()(0)
    assert(r.getAs[Long]("k") === 2L && r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("ssw")) < 1e-2) // 2^-10 quantization
    assert(math.abs(r.getAs[Double]("eta2") - 1.0) < 1e-4)
    assert(r.isNullAt(r.fieldIndex("f"))) // ssw degenerate
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val r1 = graft.operators.Profiling.anovaByGroup(one, "g", col("v"))
      .collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("f"))) // k = 1
  }

  test("ratioMismatchAudit: exact counts vs promised shares, absent label reports 0") {
    import org.apache.spark.sql.functions.col
    val d = (Seq.fill(8)("train") ++ Seq.fill(2)("val")).toDF("split")
    val rows = graft.operators.Profiling.ratioMismatchAudit(d, "split",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .orderBy("label").collect()
    assert(rows.length === 3)
    val byLabel = rows.map(r => r.getAs[String]("label") -> r).toMap
    assert(byLabel("test").getAs[Long]("observed") === 0L)
    assert(byLabel("train").getAs[Long]("observed") === 8L)
    assert(byLabel("train").getAs[Double]("obs_p") === 0.8)
    // train matches expectation exactly -> zero chi2 term
    assert(byLabel("train").getAs[Long]("term_fp") === 0L)
    // test: (0 - 1)^2 / 1 = 1 -> term 2^30
    assert(byLabel("test").getAs[Long]("term_fp") === (1L << 30))
    assert(rows.map(_.getAs[Long]("chi2_fp")).distinct.length === 1)
  }

  test("anovaByGroup: eta2 + F match the textbook decomposition") {
    import org.apache.spark.sql.functions.col
    val d = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 6L))
      .toDF("g", "v")
    val r = graft.operators.Profiling.anovaByGroup(d, "g", col("v"))
      .collect()(0)
    // means: a=2, b=5, grand=16/5; SSB=3*(2-3.2)^2+2*(5-3.2)^2=10.8
    // SSW=(1+0+1)+(1+1)=4; F=(10.8/1)/(4/3)=8.1
    assert(math.abs(r.getAs[Double]("ssb") - 10.8) < 1e-2)
    assert(math.abs(r.getAs[Double]("ssw") - 4.0) < 1e-2)
    assert(math.abs(r.getAs[Double]("eta2") - 10.8 / 14.8) < 1e-3)
    assert(math.abs(r.getAs[Double]("f") - 8.1) < 2e-2)
  }
}
