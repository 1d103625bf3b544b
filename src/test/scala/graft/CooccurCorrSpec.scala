package graft

import graft.operators.{Cooccur, Regression}
import org.apache.spark.sql.functions._

/** Skip-gram co-occurrence pairs and exact Pearson/Spearman correlation. */
class CooccurCorrSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- Cooccur

  test("skipgramPairs window=1: adjacent pairs, both directions") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Cooccur.skipgramPairs(docs, "doc_id", "text",
      window = 1, minCount = 1L, topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("a", "b", 1L), ("b", "a", 1L),
      ("b", "c", 1L), ("c", "b", 1L)))
  }

  test("skipgramPairs window=2 reaches across one token; long docs stay 2w-bounded") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Cooccur.skipgramPairs(docs, "doc_id", "text",
      window = 2, minCount = 1L, topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("a", "c")) && out.contains(("c", "a")))
    assert(out.size === 6)
  }

  test("skipgramPairs counts repeats, applies minCount and deterministic topK") {
    val docs = Seq((1L, "x y x y x")).toDF("doc_id", "text")
    // adjacent: (x,y)×2 fwd + (y,x)×2 fwd → directional x→y 4, y→x 4
    val all = Cooccur.skipgramPairs(docs, "doc_id", "text",
      window = 1, minCount = 1L, topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(all === Set(("x", "y", 4L), ("y", "x", 4L)))
    val top1 = Cooccur.skipgramPairs(docs, "doc_id", "text",
      window = 1, minCount = 1L, topK = 1).collect()
    assert(top1.length === 1 && top1.head.getString(0) === "x") // tie → center asc
  }

  test("skipgramPairs plan joins on exact (doc, pos) — no cartesian, no doc-only key") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Cooccur.skipgramPairs(docs, "doc_id", "text",
      window = 2, minCount = 1L, topK = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join leaked:\n$plan")
  }

  test("skipgramPairs never crosses document boundaries") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = Cooccur.skipgramPairs(docs, "doc_id", "text",
      window = 5, minCount = 1L, topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!out.contains(("b", "c")) && !out.contains(("a", "d")))
  }

  // ------------------------------------------------- Pearson / Spearman

  test("corrByGroup: exact ±1 on linear data, NULL on constant variables") {
    val df = Seq(
      ("up", 1L, 2L), ("up", 2L, 4L), ("up", 3L, 6L),
      ("dn", 1L, 9L), ("dn", 2L, 6L), ("dn", 3L, 3L),
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L)
    ).toDF("g", "x", "y")
    val out = Regression.corrByGroup(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(out("up") === Some(1.0))
    assert(out("dn") === Some(-1.0))
    assert(out("flat") === None)
  }

  test("spearmanByGroup: 1.0 on any monotonic map; matches hand-ranked ties") {
    // monotonic nonlinear: spearman 1, pearson < 1
    val mono = Seq.tabulate(6)(i => ("m", i.toLong, i.toLong * i * i))
      .toDF("g", "x", "y")
    val sp = Regression.spearmanByGroup(mono, Seq("g"), col("x"), col("y"))
      .head.getDouble(2)
    assert(sp === 1.0)
    val pe = Regression.corrByGroup(mono, Seq("g"), col("x"), col("y"))
      .head.getDouble(2)
    assert(pe < 1.0)
    // ties: x = (1,2,2,3), y = (10,20,20,40): avg ranks
    // x: 1, 2.5, 2.5, 4 ; y: 1, 2.5, 2.5, 4 → perfectly rank-aligned
    val tied = Seq(("t", 1L, 10L), ("t", 2L, 20L), ("t", 2L, 20L), ("t", 3L, 40L))
      .toDF("g", "x", "y")
    assert(Regression.spearmanByGroup(tied, Seq("g"), col("x"), col("y"))
      .head.getDouble(2) === 1.0)
    // hand example with a swap: x=(1,2,3,4), y=(1,2,4,3)
    val swap = Seq(("s", 1L, 1L), ("s", 2L, 2L), ("s", 3L, 4L), ("s", 4L, 3L))
      .toDF("g", "x", "y")
    // no ties → classic 1 − 6Σd²/(n(n²−1)) = 1 − 6·2/60 = 0.8
    assert(Regression.spearmanByGroup(swap, Seq("g"), col("x"), col("y"))
      .head.getDouble(2) === 0.8)
  }

  test("spearmanByGroup drops rows with a NULL on either side") {
    val df = Seq(
      ("g", Some(1L), Some(1L)), ("g", Some(2L), Some(2L)),
      ("g", None, Some(9L)), ("g", Some(9L), None), ("g", Some(3L), Some(3L))
    ).toDF("g", "x", "y")
    val r = Regression.spearmanByGroup(df, Seq("g"), col("x"), col("y")).head
    assert(r.getLong(1) === 3L && r.getDouble(2) === 1.0)
  }

  test("coEngagementPairs: degree cap drops hubs before the pair join") {
    val d = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), // actor 1: degree 3 -> dropped at cap 2
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "b") // duplicate engagement collapses
    ).toDF("actor", "item")
    val r = graft.operators.Cooccur.coEngagementPairs(d, "actor", "item", 2)
      .collect()
    assert(r.length === 1)
    assert((r(0).getAs[String]("item_a"), r(0).getAs[String]("item_b"),
      r(0).getAs[Long]("n_actors")) === (("a", "b", 2L)))
  }

  test("budgetAllocate: greedy fill respects order, caps, and budget") {
    val stats = Seq(("s1", 3.0, 100L), ("s2", 2.0, 100L), ("s3", 1.0, 100L))
      .toDF("src", "q", "avail")
    val r = graft.operators.Mixing
      .budgetAllocate(stats, "src", "q", "avail", budget = 150L)
      .orderBy("src").collect()
    assert(r.map(_.getAs[Long]("alloc_tokens")).toSeq === Seq(100L, 50L, 0L))
    assert(r.map(_.getAs[Long]("cum_before")).toSeq === Seq(0L, 100L, 200L))
  }

  test("kendallTau: perfect concordance 1, reversal -1, exact pair counts") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("x", "y")
    val u = Regression.kendallTau(up, col("x"), col("y")).collect()(0)
    assert(u.getAs[Long]("concordant") === 6L)
    assert(u.getAs[Long]("discordant") === 0L)
    assert(u.getAs[Double]("tau_b") === 1.0)
    val down = up.withColumn("y", -col("y"))
    assert(Regression.kendallTau(down, col("x"), col("y"))
      .collect()(0).getAs[Double]("tau_b") === -1.0)
  }

  test("kendallTau: tie correction matches the hand-computed tau_b") {
    // x: 1,1,2,3  y: 1,2,2,1  (one x-tie pair, one y-tie pair)
    // pairs (of 6): (1,2)x-tie; (1,3):C where y 1<2 c; (1,4): y equal tie-y
    // enumerate: rows a=(1,1) b=(1,2): x tie; a,(2,2): x<,y< C; a,(3,1): x<,y= tie-y
    // (1,2)vs(2,2): x<, y= tie-y? y 2=2 tie; (1,2)vs(3,1): x<, y 2>1 D; (2,2)vs(3,1): x<, y> D
    // C=1, D=2, n0=6, n1=1 (x-ties), n2 = pairs tied in y: y=1: rows 1,4 ->1; y=2: rows 2,3 ->1 => 2
    val d = Seq((1L, 1L), (1L, 2L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val r = Regression.kendallTau(d, col("x"), col("y")).collect()(0)
    assert(r.getAs[Long]("n0") === 6L)
    assert(r.getAs[Long]("n1") === 1L)
    assert(r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Long]("concordant") === 1L)
    assert(r.getAs[Long]("discordant") === 2L)
    assert(math.abs(r.getAs[Double]("tau_b") -
      (1.0 - 2.0) / math.sqrt(5.0 * 4.0)) < 1e-15)
  }

  test("kendallTau: constant variable yields NULL tau with counts intact") {
    val d = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val r = Regression.kendallTau(d, col("x"), col("y")).collect()(0)
    assert(r.getAs[Long]("n") === 3L)
    assert(r.isNullAt(r.fieldIndex("tau_b")))
  }

  test("assocRules: set co-occurrence with exact support/confidence/lift") {
    // docs: {a,b} x3, {a} x1, {b,c} x1, {c} x1 -> n=6
    // df: a=4, b=4, c=2; pair (a,b)=3
    val docs = Seq((1L, "a b"), (2L, "b a"), (3L, "a b"), (4L, "a"),
      (5L, "b c"), (6L, "c")).toDF("doc_id", "text")
    val r = graft.operators.Cooccur.assocRules(docs, "doc_id", "text",
      minDf = 2L, minPair = 2L, topK = 10).collect()
    val ab = r.find(x => x.getAs[String]("a") == "a" &&
      x.getAs[String]("b") == "b").get
    assert(ab.getAs[Long]("c_ab") === 3L)
    assert(ab.getAs[Double]("support") === 0.5)
    assert(ab.getAs[Double]("conf_a_b") === 0.75)
    assert(ab.getAs[Double]("conf_b_a") === 0.75)
    assert(ab.getAs[Double]("lift") === 3.0 * 6.0 / (4.0 * 4.0))
    // (b,c) pair count 1 < minPair -> absent
    assert(!r.exists(x => x.getAs[String]("a") == "b" &&
      x.getAs[String]("b") == "c"))
  }

  test("assocRules: duplicate tokens in a doc count the basket once") {
    val docs = Seq((1L, "a a b b"), (2L, "a b")).toDF("doc_id", "text")
    val r = graft.operators.Cooccur.assocRules(docs, "doc_id", "text",
      minDf = 1L, minPair = 1L, topK = 10).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("c_ab") === 2L)
    assert(r(0).getAs[Long]("c_a") === 2L)
  }

  test("linkPredictionScores: RA favors pairs sharing LOW-degree actors") {
    // actor 1 (deg 2) connects items a,b; actor 2 (deg 3) connects a,c,d
    val d = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c"), (2L, "d"))
      .toDF("actor", "item")
    val r = graft.operators.Cooccur.linkPredictionScores(d, "actor",
      "item", maxDegree = 5, topK = 10).collect()
    val byPair = r.map(x => (x.getAs[String]("item_a"),
      x.getAs[String]("item_b")) -> x).toMap
    // (a,b) via deg-2 actor: ra = 10^9/2; (a,c) via deg-3: 10^9/3
    assert(byPair(("a", "b")).getAs[Long]("ra_fp") === 500000000L)
    assert(byPair(("a", "c")).getAs[Long]("ra_fp") === 333333333L)
    assert(byPair(("a", "b")).getAs[Long]("cn") === 1L)
    // degrees are TRUE item degrees: deg(a)=2, deg(b)=1
    assert(byPair(("a", "b")).getAs[Long]("deg_a") === 2L)
    assert(byPair(("a", "b")).getAs[Long]("pa") === 2L)
    // jaccard(a,b) = 1/(2+1-1) = 0.5
    assert(byPair(("a", "b")).getAs[Double]("jaccard") === 0.5)
    // ordering: (a,b) outranks the deg-3 pairs
    assert(r.head.getAs[String]("item_a") === "a" &&
      r.head.getAs[String]("item_b") === "b")
  }

  test("linkPredictionScores: hub actors beyond maxDegree generate no pairs") {
    val hub = (0 until 10).map(i => (9L, s"i$i"))
    val d = (hub :+ ((1L, "i0")) :+ ((1L, "i1"))).toDF("actor", "item")
    val r = graft.operators.Cooccur.linkPredictionScores(d, "actor",
      "item", maxDegree = 5, topK = 100).collect()
    assert(r.length === 1) // only actor 1's pair
    // but the hub still counts toward TRUE item degrees
    assert(r(0).getAs[Long]("deg_a") === 2L)
  }
}
