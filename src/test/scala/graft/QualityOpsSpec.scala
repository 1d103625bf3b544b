package graft

import graft.operators.{Constraints, Dedup, EventAnalytics, Profiling, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Data-quality + monitoring operators added late round 9: per-column
  * profile, Deequ-style constraint audit, CUSUM changepoint, LSH
  * parameter curve, stratified k-fold, diversity, vocab overlap.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: nulls, exact NDV, mode frequency, uniqueness") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("a")),
      (Some(3L), None), (None, Some("b")))
      .toDF("id", "tag")
    val got = Profiling.columnProfile(df, Seq("id", "tag"))
      .as[(String, Long, Long, Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // id: 4 rows, 1 null, 3 distinct, each once => unique
    assert(got("id") === (("id", 4L, 1L, 3L, 1L, 0.75, true)))
    // tag: "a" twice => not unique, mode freq 2
    assert(got("tag") === (("tag", 4L, 1L, 2L, 2L, 0.75, false)))
  }

  test("columnProfile: all-NULL column is not unique and 0-complete") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "x")
    val r = Profiling.columnProfile(df, Seq("x"))
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect().head
    assert(r === (("x", 2L, 2L, 0L, 0L, 0.0, false)))
  }

  test("constraint audit: row rules share one pass; NULL predicate = violation") {
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None))
      .toDF("k", "v")
    val rows = Constraints.rowRules(df, Seq(
      ("nonneg:v", col("v") < 0), // NULL v counts as violation
      ("complete:v", col("v").isNull)))
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(rows("nonneg:v") === (("nonneg:v", 3L, 2L, false)))
    assert(rows("complete:v") === (("complete:v", 3L, 1L, false)))
  }

  test("constraint audit: uniqueness counts every duplicated row; FK counts orphans") {
    val child = Seq((1L, 1), (1L, 1), (2L, 1), (9L, 1)).toDF("fk", "ln")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val uq = Constraints.uniqueRule(child, "u", Seq("fk", "ln"))
      .as[(String, Long, Long, Boolean)].collect().head
    assert(uq === (("u", 4L, 2L, false)), "both copies of (1,1) are violations")
    val fk = Constraints.fkRule(child, "f", "fk", parent, "pk")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(fk === (("f", 4L, 1L, false)), "9 is an orphan")
    val report = Constraints.audit(Seq(
      Constraints.rowRules(child, Seq(("ok", lit(false)))),
      Constraints.uniqueRule(child, "u", Seq("fk", "ln"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(report.map(_._1).toSeq === Seq("ok", "u"), "audit sorts by rule")
    assert(report.head._4, "zero violations passes")
  }

  test("cusumCounts matches the sequential max(0, S + x - mean) recursion") {
    // 6 buckets, mean 4: quiet then a level shift upward.
    val xs = Seq(2L, 3L, 2L, 6L, 6L, 5L)
    val ev = xs.zipWithIndex.flatMap { case (x, day) =>
      Seq.fill(x.toInt)(day.toLong)
    }.toDF("day")
    val got = EventAnalytics.cusumCounts(ev, col("day"), alarmH = 1)
      .orderBy("bucket").as[(Long, Long, Long, Boolean)].collect()
    // sequential reference, scaled by n=6 (mean = 24/6 = 4)
    val n = 6L; val t = xs.sum
    var s = 0L
    val want = xs.map { x => s = math.max(0L, s + (x * n - t)); s }
    assert(got.map(_._3).toSeq === want)
    assert(got.map(_._2).toSeq === xs)
    // alarm iff n*S > h*T  (h=1)
    assert(got.map(_._4).toSeq === want.map(_ > t))
  }

  test("cusum resets after a dip: running-min identity handles the clamp") {
    // big early deficit then recovery — naive prefix sum (no clamp)
    // would stay negative; CUSUM must restart at 0.
    val xs = Seq(0L, 0L, 8L, 8L)
    val ev = xs.zipWithIndex.flatMap { case (x, d) =>
      Seq.fill(x.toInt)(d.toLong) }.toDF("day")
    val got = EventAnalytics.cusumCounts(ev, col("day"), alarmH = 1)
      .orderBy("bucket").as[(Long, Long, Long, Boolean)].collect()
    // NOTE empty buckets are absent (histogram), so only days 2,3 appear
    val present = Seq(8L, 8L); val n = 2L; val t = 16L
    var s = 0L
    val want = present.map { x => s = math.max(0L, s + (x * n - t)); s }
    assert(got.map(_._3).toSeq === want)
  }

  test("lshParameterCurve matches direct math and is monotone in s") {
    val got = Dedup.lshParameterCurve(spark, Seq((8, 6)), Seq(10, 50, 90))
      .as[(Int, Int, Int, Double)].collect().toSeq
    def p(s: Double, r: Int, b: Int) = 1.0 - math.pow(1.0 - math.pow(s, r), b)
    got.foreach { case (b, r, sp, pc) =>
      assert(math.abs(pc - p(sp / 100.0, r, b)) < 1e-12,
        s"curve value off at s=$sp")
    }
    assert(got.map(_._4) === got.map(_._4).sorted, "S-curve is monotone")
  }

  test("stratifiedKFold: per-stratum fold sizes differ by at most 1") {
    val df = (1L to 103L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "s")
    val sizes = Sampling.stratifiedKFold(df, "s", "id", k = 4)
      .groupBy("s", "fold").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    sizes.foreach { case (stratum, counts) =>
      assert(counts.max - counts.min <= 1, s"unbalanced folds in $stratum")
      assert(counts.length === 4, s"missing folds in $stratum")
    }
    // deterministic across recomputation
    val a = Sampling.stratifiedKFold(df, "s", "id", 4)
      .orderBy("id").as[(Long, String, Long)].collect()
    val b = Sampling.stratifiedKFold(df.repartition(7), "s", "id", 4)
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(a.toSeq === b.toSeq, "assignment independent of partitioning")
  }

  test("diversityByGroup: exact Simpson arithmetic, NULL label is a level") {
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"),
      ("s2", null)).toDF("src", "lang")
    val got = Profiling.diversityByGroup(df, "src", "lang")
      .as[(String, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("s1") === (("s1", 3L, 2L, 5L, 1.0 - 5.0 / 9.0, 9.0 / 5.0)))
    assert(got("s2") === (("s2", 1L, 1L, 1L, 0.0, 1.0)))
  }

  test("vocabOverlap: inclusion-exclusion Jaccard over distinct token sets") {
    val docs = Seq(
      ("a", "x y z"), ("a", "x"), // vocab(a) = {x,y,z}
      ("b", "y z w"),             // vocab(b) = {y,z,w}
      ("c", "q")).toDF("g", "text")
    val got = TextAnalysis.vocabOverlap(docs, "g", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.length === 1, "empty intersections are absent")
    assert(got.head === (("a", "b", 3L, 3L, 2L, 0.5)))
  }

  test("budgetCapPerGroup: exact prefix cap, crossing row rejected") {
    // group g1, order by ord: weights 4,3,5 with budget 8 →
    // cum 4,7,12: third rejected. g2: single row heavier than budget.
    val df = Seq(
      ("g1", 1L, 4L), ("g1", 2L, 3L), ("g1", 3L, 5L),
      ("g2", 1L, 9L)).toDF("g", "ord", "w")
    val got = graft.operators.Mixing.budgetCapPerGroup(df, col("g"),
      bucket = col("ord"), order = Seq(col("ord")), weight = col("w"),
      budget = 8L)
      .orderBy("g", "ord").as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.map(r => (r._4, r._5)).toSeq ===
      Seq((4L, true), (7L, true), (12L, false), (9L, false)))
  }

  test("budgetCapPerGroup: histogram offsets compose across buckets") {
    // 10 rows weight 2, bucket = ord DIV 4 (3 cells), budget 7 → keep
    // first 3 rows (cum 2,4,6), reject from cum 8 on.
    val df = (1L to 10L).map(i => ("g", i, 2L)).toDF("g", "ord", "w")
    val kept = graft.operators.Mixing.budgetCapPerGroup(df, col("g"),
      expr("ord DIV 4"), Seq(col("ord")), col("w"), budget = 7L)
      .filter(col("kept")).orderBy("ord").as[(String, Long, Long, Long, Boolean)]
      .collect()
    assert(kept.map(_._2).toSeq === Seq(1L, 2L, 3L))
  }

  test("modularity: hand-computed two-triangle barbell") {
    // Two triangles {1,2,3} and {4,5,6} joined by edge 3-4: m = 7.
    // Perfect split: e_c = 3, d_c = 7 each ⇒ q_num = 4·7·3 − 49 = 35,
    // Q = 70/196 ≈ 0.357.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "label")
    val got = graft.operators.LabelProp.modularity(edges, "src", "dst", labels)
      .orderBy("label").as[(Long, Long, Long, Long, Long, Long, Double)]
      .collect()
    assert(got.toSeq === Seq(
      (1L, 3L, 7L, 3L, 7L, 35L, 35.0 / 196.0),
      (4L, 3L, 7L, 3L, 7L, 35L, 35.0 / 196.0)))
    // everything-in-one-community ⇒ Q = 0 exactly (e=m, d=2m)
    val one = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (5L, 9L),
      (6L, 9L)).toDF("node", "label")
    val q0 = graft.operators.LabelProp.modularity(edges, "src", "dst", one)
      .select("q_num").as[Long].collect()
    assert(q0.toSeq === Seq(0L))
  }

  test("f1OperatingPoint: argmax F1, ties toward the smaller threshold") {
    // scores: 3 → (pos), 2 → (pos, neg), 1 → (neg)
    // t=3: tp=1 fp=0 fn=1 → F1=2/3; t=2: tp=2 fp=1 fn=0 → F1=4/5;
    // t=1: tp=2 fp=2 → F1=2/3.
    val df = Seq((3L, true), (2L, true), (2L, false), (1L, false))
      .toDF("s", "y")
    val r = graft.operators.Evaluation.f1OperatingPoint(df, "s", "y")
      .select("threshold", "tp", "fp", "fn", "f1")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(r.length === 1)
    assert(r.head === ((2L, 2L, 1L, 0L, 0.8)))
    // exact F1 tie (all thresholds equal F1) → smallest threshold wins
    val tie = Seq((2L, true), (1L, true)).toDF("s", "y")
    val rt = graft.operators.Evaluation.f1OperatingPoint(tie, "s", "y")
      .select("threshold").as[Long].collect()
    assert(rt.head === 1L, "equal F1 resolves to the smaller threshold")
  }

  test("phraseSearch: aligned-start intersection, overlaps and repeats") {
    val docs = Seq(
      (1L, "a b c a b c"),   // "a b c" at 0 and 3
      (2L, "a b x a b"),     // never completes
      (3L, "x a b c"),       // at 1
      (4L, "c b a")).toDF("doc_id", "text")
    val got = graft.operators.InvertedIndex.phraseSearch(docs, "doc_id",
      "text", Seq("a", "b", "c"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L, 0L), (3L, 1L, 1L)))
    // repeated-word phrase: "a a" matches only true runs
    val rep = Seq((1L, "a a b a a a"), (2L, "a b a")).toDF("doc_id", "text")
    val gr = graft.operators.InvertedIndex.phraseSearch(rep, "doc_id",
      "text", Seq("a", "a"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(gr.toSeq === Seq((1L, 3L, 0L)), "runs at 0, 3, 4 — not doc 2")
  }

  test("bigramLift: exact rational collocation score, ordered adjacency") {
    // "x y" occurs 3×, x and y occur only in those bigrams + once solo;
    // "a b" occurs once (below minCount after discount guard).
    val docs = Seq(
      (1L, "x y x y x y"), (2L, "y x a b")).toDF("doc_id", "text")
    val got = graft.operators.Cooccur.bigramLift(docs, "doc_id", "text",
      discount = 1L, minCount = 2L, topK = 10)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Double)]
      .collect()
    // n=10 tokens; c(x)=4, c(y)=4; "x y" count 3 (positions 0-1,2-3,4-5)
    val xy = got.find(r => r._1 == "x" && r._2 == "y").get
    assert(xy === (("x", "y", 3L, 4L, 4L, 10L, 20L, 16L, 1.25)))
    assert(!got.exists(r => r._1 == "a"), "minCount floor prunes")
    // ordered: "y x" (positions 1-2, 3-4 in doc1? no - doc1 is x y x y x y
    // so y->x at 1-2 and 3-4, plus doc2 y->x at 0-1) = 3 occurrences
    val yx = got.find(r => r._1 == "y" && r._2 == "x").get
    assert(yx._3 === 3L, "direction matters: y x counted separately")
  }

  test("aucBootstrap: weighted midrank equals per-copy expansion") {
    // Small scored set; replicate 0's Poisson weights expand each key
    // into w copies — AUC of the expanded set must equal the weighted
    // formula exactly.
    val df = Seq((1L, 10L, true), (2L, 9L, false), (3L, 8L, true),
      (4L, 8L, false), (5L, 7L, false)).toDF("k", "s", "y")
    val got = graft.operators.Evaluation.aucBootstrap(df, "k", "s", "y",
      replicates = 3).orderBy("b")
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect()
    assert(got.length === 3)
    got.foreach { case (b, nPos, nNeg, num, den, auc) =>
      // recompute by brute force from the same deterministic weights
      val rows = Seq((1L, 10L, true), (2L, 9L, false), (3L, 8L, true),
        (4L, 8L, false), (5L, 7L, false)).flatMap { case (k, s, y) =>
        val h = (((k * 3 + b) % 2147483648L) * 2654435761L) % 4294967296L
        val u = h.toDouble / 4294967296.0
        val w = graft.operators.Sampling.PoissonCdf.count(u >= _)
        Seq.fill(w)((s, y))
      }
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      assert(nPos === pos.length && nNeg === neg.length)
      if (pos.nonEmpty && neg.nonEmpty) {
        val wins = (for (p <- pos; n <- neg) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum
        assert(num === wins, s"replicate $b midrank mismatch")
        assert(den === 2L * pos.length * neg.length)
        assert(auc.get === wins.toDouble / den.toDouble)
      } else assert(auc.isEmpty)
    }
  }

  test("transitionMatrix: per-key lead, exact counts and row totals") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 5L, "c")).toDF("u", "t", "s") // key 3: single event, no step
    val got = graft.operators.EventAnalytics.transitionMatrix(
      ev, "u", Seq(col("t")), "s")
      .orderBy("from_state", "to_state")
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.toSeq === Seq(
      ("a", "b", 2L, 2L, 1.0),
      ("b", "a", 1L, 1L, 1.0)))
  }

  test("tClosenessAudit: hand-computed ordered EMD, absent cells contribute") {
    // global ladder {1, 2}, N=6: A = {1,1}, B = {2,2}, C = {1,2}
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L),
      ("C", 1L), ("C", 2L)).toDF("g", "v")
    val got = graft.operators.Privacy.tClosenessAudit(df, Seq("g"),
      col("v"), tMax = 0.4)
      .orderBy("g").as[(String, Long, Long, Option[Double], Option[Boolean])]
      .collect()
    // cumQ = [3, 6]; A: cumP=[2,2] → |2·6−3·2|+|2·6−6·2| = 6; t = 6/(2·6·1)
    assert(got(0) === (("A", 2L, 6L, Some(0.5), Some(false))))
    // B: cumP=[0,2] → |0−6|+|12−12| = 6 → 0.5 (symmetric)
    assert(got(1) === (("B", 2L, 6L, Some(0.5), Some(false))))
    // C matches the global mix exactly → t = 0
    assert(got(2) === (("C", 2L, 0L, Some(0.0), Some(true))))
    // degenerate single-value table → NULL t
    val one = Seq(("A", 7L), ("B", 7L)).toDF("g", "v")
    val t1 = graft.operators.Privacy.tClosenessAudit(one, Seq("g"),
      col("v"), 0.4).select("t").as[Option[Double]].collect()
    assert(t1.forall(_.isEmpty))
  }

  test("fdRule: ambiguous determinants contribute all their rows") {
    val df = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"),
      (3L, null)).toDF("det", "dep")
    val r = graft.operators.Constraints.fdRule(df, "fd", Seq("det"), "dep")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(r === (("fd", 5L, 2L, false)),
      "det=2 maps to {x,y}: both its rows violate; NULL dep is a value")
    val clean = graft.operators.Constraints.fdRule(
      df.filter(col("det") =!= 2), "fd", Seq("det"), "dep")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(clean === (("fd", 3L, 0L, true)))
  }

  test("contentDefinedChunks: boundaries partition tokens; digests match slices") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x"), (3L, "  "))
      .toDF("doc_id", "text")
    val got = graft.operators.Chunking.contentDefinedChunks(
      docs, "doc_id", "text", n = 2, maskBits = 1)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, Long)].collect()
    // whatever the cuts, chunks must tile [0, 7] for doc 1
    val d1 = got.filter(_._1 == 1L)
    assert(d1.head._3 === 0L, "first chunk starts at 0")
    assert(d1.map(_._4).sum === 8L, "chunks cover all 8 tokens")
    d1.sliding(2).foreach {
      case Array(a, b) => assert(b._3 === a._3 + a._4, "contiguous")
      case _ =>
    }
    // short doc: single whole-doc chunk; blank doc: no chunks
    assert(got.filter(_._1 == 2L).toSeq.map(r => (r._3, r._4)) === Seq((0L, 1L)))
    assert(!got.exists(_._1 == 3L))
    // digest = polyHash of the chunk's space-joined tokens (spot-check
    // via a one-chunk doc)
    val solo = got.filter(_._1 == 2L).head._5
    val want = Seq(("x")).toDF("t")
      .select(graft.operators.TextAnalysis.polyHash(col("t"))).as[Long]
      .collect().head
    assert(solo === want)
  }

  test("contentDefinedChunks: a one-word edit leaves distant chunks stable") {
    val base = (1 to 200).map(i => s"w${i % 37}x$i").mkString(" ")
    val edited = base.replace("w3x100", "EDITED")
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = graft.operators.Chunking.contentDefinedChunks(
      docs, "doc_id", "text", n = 3, maskBits = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    val d1 = ch.filter(_._1 == 1L).map(r => r._5).toSet
    val d2 = ch.filter(_._1 == 2L).map(r => r._5).toSet
    val shared = d1.intersect(d2).size
    assert(shared > 0 && d1.size > 4,
      s"CDC must re-sync after an edit: ${d1.size} chunks, $shared shared")
    // fixed-size chunking by contrast shares nothing after the edit
    // point; CDC shares the majority of chunks
    assert(shared.toDouble / d1.size > 0.5,
      s"expected most chunks stable, got $shared/${d1.size}")
  }

  test("plan shape: budgetCapPerGroup broadcasts its offset table and never windows ungrouped") {
    val df = (1L to 50L).map(i => ("g" + (i % 3), i, 2L)).toDF("g", "ord", "w")
    val plan = graft.operators.Mixing.budgetCapPerGroup(df, col("g"),
      expr("ord DIV 8"), Seq(col("ord")), col("w"), budget = 20L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"histogram offsets must broadcast:\n$plan")
    // the only window partitions by (group, bucket) — no global funnel
    assert(!plan.contains("Window [") ||
      !plan.split('\n').exists(l =>
        l.contains("windowspecdefinition()") && l.contains("Window")),
      s"ungrouped window leaked:\n$plan")
  }

  test("plan shape: phraseSearch pushes the word filters below the joins") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = graft.operators.InvertedIndex.phraseSearch(docs, "doc_id",
      "text", Seq("a", "b")).queryExecution.optimizedPlan.toString
    assert(plan.contains("__t = a") || plan.contains("(__t#"),
      s"per-word filter must survive pushdown:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"),
      s"cartesian leaked:\n$plan")
  }

  test("plan shape: columnProfile is two hash aggregates, no Expand") {
    val df = Seq((1L, "a")).toDF("id", "tag")
    val plan = graft.operators.Profiling.columnProfile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"stack-based profile must avoid count-distinct Expand:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected the two-level histogram aggregate:\n$plan")
  }

  test("rollingMadAnomaly: trailing median excludes current; warm-up NULL") {
    // days 0..6 flat at 2 (by construction of counts), day 7 spikes to 9.
    val xs = Seq(2L, 2L, 2L, 2L, 2L, 2L, 2L, 9L)
    val ev = xs.zipWithIndex.flatMap { case (x, d) =>
      Seq.fill(x.toInt)(d.toLong) }.toDF("day")
    val got = graft.operators.EventAnalytics.rollingMadAnomaly(
      ev, col("day"), w = 7, k = 3)
      .orderBy("bucket")
      .as[(Long, Long, Option[Long], Option[Long], Option[Boolean])].collect()
    assert(got.take(7).forall(r => r._3.isEmpty && r._5.isEmpty),
      "first 7 days are warm-up")
    val d7 = got(7)
    assert(d7._3 === Some(2L) && d7._4 === Some(0L),
      "trailing median/MAD exclude the spike itself")
    assert(d7._5 === Some(true), "MAD 0 makes any deviation alarm")
  }
}
