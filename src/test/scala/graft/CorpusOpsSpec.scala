package graft

import graft.operators.{ExactQuantiles, InvertedIndex, LineDedup, Packing, Sampling, TfIdf, TopK}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedQuantilesByGroup: weight-mass quantiles, weight 1 degenerates to unweighted") {
    // group g: values 10/20/30 at weights 2/3/5 — cumulative mass
    // 2, 5, 10 of 10, so p25 reads 20 (2·4 < 10·1) where the
    // unweighted p25 reads 10, and p50 stays 20 (5·4 ≥ 10·2 exactly).
    val df = Seq(("g", 10L, Some(2L)), ("g", 20L, Some(3L)), ("g", 30L, Some(5L)),
      ("h", 5L, Some(2L)), ("h", 7L, None: Option[Long]))
      .toDF("grp", "v", "w")
    val qs = Seq(("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4))
    val wq = ExactQuantiles.weightedQuantilesByGroup(df, "grp", "v", "w", qs)
      .orderBy("grp").collect()
    assert(wq(0).getLong(1) === 10L) // n = total weight of g
    assert((wq(0).getLong(2), wq(0).getLong(3), wq(0).getLong(4)) === ((20L, 20L, 30L)))
    // NULL-weight row carries no mass: group h is all-10 at weight 2
    assert(wq(1).getLong(1) === 2L)
    assert(wq(1).getLong(2) === 5L)
    val ones = ExactQuantiles.weightedQuantilesByGroup(
      df.withColumn("w1", lit(1L)), "grp", "v", "w1", qs)
      .orderBy("grp").collect()
    val plain = ExactQuantiles.quantilesByGroup(df, "grp", "v", qs)
      .orderBy("grp").collect()
    assert(ones.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
  }

  test("piiRedact rewrites every match in pass order and scans to zero residuals") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "mail a.b%c@ex-ample.co.uk and x@y.io; ip 10.0.0.1, id 123456789012"),
      (2L, "dots 1.2.3.4.5 short@x.a run 12345678 then 999999999"),
      (3L, "no pii here at all")).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.piiRedact($"text").as("r"))
      .orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(out(0) === "mail <EMAIL> and <EMAIL>; ip <IP>, id <DIGITS>")
    // leftmost quad of the 5-dotted run; sub-threshold @/digit stay put
    assert(out(1) === "dots <IP>.5 short@x.a run 12345678 then <DIGITS>")
    assert(out(2) === "no pii here at all")
    val residual = df.select(TextAnalysis.piiRedact($"text").as("r"))
      .select((graft.operators.TextAnalysis.emailCount($"r")
        + graft.operators.TextAnalysis.ipv4Count($"r")
        + graft.operators.TextAnalysis.longDigitCount($"r")).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(residual === 0L)
  }

  test("dedupLines keeps first (doc, pos) occurrence and reassembles in order") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha"), // in-doc dup: second alpha dies
      (2L, "beta\ngamma"),        // beta seen in doc 1 → only gamma survives
      (3L, "alpha\nbeta")         // nothing survives
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out === Array(
      (1L, 3L, 2L, "alpha\nbeta"),
      (2L, 2L, 1L, "gamma"),
      (3L, 2L, 0L, "")))
  }

  test("dedupLines: heavy duplicate skew collapses map-side, empty lines dedup too") {
    // one hot line ("x") in every doc; winner is the smallest doc id
    val docs = (0L until 200L).map(i => (i, s"x\nuniq$i\n")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text")
    // doc 0 keeps x, uniq0 and the trailing empty line; all others lose x + ""
    val kept = out.select("doc_id", "n_kept").as[(Long, Long)].collect().toMap
    assert(kept(0L) === 3L)
    assert((1L until 200L).forall(kept(_) === 1L))
  }

  test("UrlOps: canonicalization steps and PSL-lite registrable domain") {
    val cases = Seq(
      // fragment + uppercase host + case-preserved path
      ("https://News.Example.COM/Articles/X#frag",
        "https://news.example.com/Articles/X", "example.com"),
      // default https port + trailing utm param
      ("https://blog.example.co.uk:443/post?id=1&utm_source=f",
        "https://blog.example.co.uk/post?id=1", "example.co.uk"),
      // default http port kept path; non-default port preserved below
      ("http://shop.example.com:80/item/2", "http://shop.example.com/item/2", "example.com"),
      ("http://shop.example.com:8080/item/2", "http://shop.example.com:8080/item/2", "example.com"),
      // utm leading the query, another param follows
      ("https://example.org/?utm_campaign=x&page=3", "https://example.org/?page=3", "example.org"),
      // utm as the sole query: the '?' disappears with it
      ("https://example.org/a?utm_campaign=x", "https://example.org/a", "example.org"),
      // multi-part suffix + trailing slash
      ("http://www.data.example.com.au/set/4/", "http://www.data.example.com.au/set/4", "example.com.au"),
      // bare two-label host passes through
      ("https://localhost.dev/x", "https://localhost.dev/x", "localhost.dev"))
    val df = cases.map(_._1).toDF("url")
      .select(col("url"),
        graft.operators.UrlOps.normalizeUrl(col("url")).as("norm"))
      .withColumn("host", graft.operators.UrlOps.host(col("norm")))
      .withColumn("dom", graft.operators.UrlOps.registrableDomain(col("host")))
    val out = df.select("url", "norm", "dom").as[(String, String, String)]
      .collect().toSeq
    assert(out === cases.map(c => (c._1, c._2, c._3)))
  }

  test("removeBoilerplate drops every occurrence above the doc-freq threshold") {
    val docs = Seq(
      (1L, "footer\nalpha\nfooter"), // footer in 3/4 docs → all copies die
      (2L, "footer\nbeta"),
      (3L, "footer\ngamma\nbeta"),   // beta in 2/4 = 50% → dies at 50% too
      (4L, "delta")
    ).toDF("doc_id", "text")
    val out = LineDedup.removeBoilerplate(docs, "doc_id", "text", 1L, 2L)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out === Array(
      (1L, 3L, 1L, "alpha"),
      (2L, 2L, 0L, ""),      // pure boilerplate document
      (3L, 3L, 1L, "gamma"),
      (4L, 1L, 1L, "delta")))
    // threshold above every doc-freq removes nothing (in-doc dups kept too)
    val loose = LineDedup.removeBoilerplate(docs, "doc_id", "text", 9L, 10L)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(loose.map(_._4).toSeq ===
      Seq("footer\nalpha\nfooter", "footer\nbeta", "footer\ngamma\nbeta", "delta"))
  }

  test("mixtureSample: exact ceil(f*n) per stratum, default fraction, zero drops") {
    val df = (1L to 300L).map(i =>
      (i, if (i <= 100) "a" else if (i <= 200) "b" else "c")).toDF("k", "s")
    val out = Sampling.mixtureSample(df, "s", "k",
      Map("a" -> 0.3, "b" -> 0.0), defaultFraction = 0.07)
    val counts = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.get("a") === Some(30L))  // ceil(0.3*100)
    assert(counts.get("b") === None)       // fraction 0 → dropped
    // ceil is over DOUBLE arithmetic: 100*0.07 = 7.000000000000001 → 8,
    // identically in DuckDB — the portable semantics the oracle checks
    assert(counts.get("c") === Some(8L))
    // identical to the rank-window formulation
    val w = Window.partitionBy("s")
      .orderBy(Sampling.hashBucket(col("k"), 1000000), col("k"))
    val frac = when(col("s") === "a", 0.3).when(col("s") === "b", 0.0).otherwise(0.07)
    val naive = df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .select("k", "s")
    assert(out.select("k", "s").except(naive).isEmpty &&
      naive.except(out.select("k", "s")).isEmpty)
  }

  test("tokenShards: per-stream running offsets and shard boundaries") {
    val docs = (1L to 50L).map(i => (i, i % 7 + 1)).toDF("doc_id", "n")
    val out = Packing.tokenShards(docs, "doc_id", "n", contextLen = 10, streams = 3)
      .orderBy("stream", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // recompute per stream sequentially
    var offsets = Map.empty[Long, Long]
    out.foreach { case (_, n, stream, offset, shard) =>
      val expected = offsets.getOrElse(stream, 0L)
      assert(offset === expected)
      assert(shard === offset / 10)
      offsets += stream -> (expected + n)
    }
    // stream assignment is the portable hash
    out.foreach { case (id, _, stream, _, _) =>
      assert(stream === ((id % 2147483648L) * 2654435761L % 4294967296L) % 3)
    }
  }

  test("truncationCurve: empty corpus yields zero rows (cross-engine " +
    "GROUP BY shape); fragmentationAudit handles quoting-hostile names") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n")
    assert(Packing.truncationCurve(empty, "n", Seq(8L, 16L)).count() === 0L)
    // non-empty keeps one row per candidate L
    val docs = Seq((1L, 5L), (2L, 20L)).toDF("doc_id", "n")
    val curve = Packing.truncationCurve(docs, "n", Seq(8L))
      .collect()(0)
    assert(curve.getAs[Long]("n_truncated") === 1L)
    assert(curve.getAs[Long]("tokens_lost") === 12L)
    // a size column whose name would break raw-SQL splicing (hyphen)
    val odd = Seq((1L, 7L), (2L, 13L)).toDF("doc_id", "tok-count")
    val audit = Packing.fragmentationAudit(odd, "doc_id", "tok-count",
      contextLen = 10L, streams = 1).collect()(0)
    assert(audit.getAs[Long]("n_tokens") === 20L)
    assert(audit.getAs[Long]("n_shards") === 2L)
  }

  test("topKPerGroup equals the single-window formulation, ties broken by id") {
    val df = (1L to 500L).map(i => (i, s"g${i % 4}", i % 9)).toDF("id", "g", "score")
    val out = TopK.topKPerGroup(df, "g", "score", "id", k = 7, salts = 5)
      .select("g", "rank", "id", "score")
    val w = Window.partitionBy("g").orderBy(desc("score"), col("id"))
    val naive = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .select("g", "rank", "id", "score")
    assert(out.except(naive).isEmpty && naive.except(out).isEmpty)
    assert(out.count() === 28)
  }

  test("termWeights: tf/df counts and rational-idf ranking") {
    val docs = Seq(
      (1L, "a a b"),   // tf(a)=2, tf(b)=1
      (2L, "b c"),
      (3L, "c c c")
    ).toDF("doc_id", "text")
    val out = TfIdf.termWeights(docs, "doc_id", "text")
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Double, Long)].collect()
    // N=3; df: a=1, b=2, c=2 → idf: a=2.0, b=4/3, c=4/3
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._3, r._4, r._5)).toSeq ===
      Seq(("a", 2L, 1L, 4.0), ("b", 1L, 2L, 4.0 / 3)))
    // doc 3: c with tf 3 → 3*4/3 = 4.0
    assert(out.filter(_._1 == 3L).map(r => (r._2, r._5, r._6)).toSeq ===
      Seq(("c", 4.0, 1L)))
    // doc 1 tie (both 4.0... no: a=4.0, b=1.333) → a ranks 1
    assert(out.filter(_._1 == 1L).map(_._6).toSeq === Seq(1L, 2L))
  }

  test("bm25: saturated scores match the IEEE-exact reference computation") {
    val docs = Seq(
      (1L, "a a b"),   // dl 3
      (2L, "b c"),     // dl 2
      (3L, "c c c")    // dl 3
    ).toDF("doc_id", "text")
    val out = TfIdf.bm25(docs, "doc_id", "text")
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Long, Double, Long)].collect()
    // reference computation with the same double ops in the same order
    val (k1, b) = (1.2, 0.75)
    val n = 3L
    val avgdl = 8L.toDouble / n
    def ref(tf: Long, df: Long, dl: Long): Double =
      ((n + 1).toDouble / (df + 1)) * (tf.toDouble * (k1 + 1)) /
        (tf.toDouble + k1 * ((1 - b) + (b * dl) / avgdl))
    assert(out.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq === Seq(
      (1L, "a", 2L, 1L, 3L), (1L, "b", 1L, 2L, 3L),
      (2L, "b", 1L, 2L, 2L), (2L, "c", 1L, 2L, 2L),
      (3L, "c", 3L, 2L, 3L)))
    out.foreach { r =>
      assert(r._6 === ref(r._3, r._4, r._5),
        s"bm25 drifted from the exact reference at doc ${r._1} term ${r._2}")
    }
    // saturation: tf's contribution is bounded — doc 3's tf=3 scores
    // LESS than 3x doc 2's tf=1 for the same term/df (shorter doc too)
    val c3 = out.find(r => r._1 == 3L && r._2 == "c").get._6
    val c2 = out.find(r => r._1 == 2L && r._2 == "c").get._6
    assert(c3 < 3 * c2, "tf saturation lost: keyword stuffing pays linearly")
    // within doc 2, equal bm25 ties (same tf/df/dl) break by term asc
    assert(out.filter(_._1 == 2L).map(_._2).toSeq === Seq("b", "c"))
  }

  test("qualityGate sets exactly the violated reason bits") {
    val good = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 " * 10).trim
    val docs = Seq(
      (1L, good),                              // clean → keep
      (2L, "tiny doc"),                        // bit 1 short (+2: low quality)
      (3L, good + "\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL\nL"), // bit 4 dup lines
      (4L, ("spam spam " * 40).trim + " " + good),  // bit 8 repetition
      (5L, good + " a@b.co c@d.co e@f.co g@h.co 123456789123")  // bit 16 pii
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .qualityGate(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out(0) === ((1L, 0L, true)))
    assert((out(1)._2 & 1L) === 1L && !out(1)._3)
    assert((out(2)._2 & 4L) === 4L)
    assert((out(3)._2 & 8L) === 8L)
    assert((out(4)._2 & 16L) === 16L)
  }

  test("hardNegatives ranks only different-label neighbors") {
    val vs = Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.99f, 0.1f), 1),  // same label — never a negative
      (2L, Seq(0.9f, 0.2f), 2),
      (3L, Seq(0.0f, 1.0f), 2),
      (4L, Seq(-1.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.hardNegatives(
      vs.filter(col("vec_id") === 0), vs, "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(3), r.getInt(4)))
    // closest different-label first: 2 (cos≈0.976), then 3 (0), then 4 (-1)
    assert(out.toSeq === Seq((2L, 2), (3L, 2), (4L, 3)))
  }

  test("termWeights broadcastVocab: identical values, broadcast join-back plan") {
    val docs = Seq(
      (1L, "a a b"), (2L, "b c"), (3L, "c c c"), (4L, "a b c d e")
    ).toDF("doc_id", "text")
    val shuffled = TfIdf.termWeights(docs, "doc_id", "text")
    val bcast = TfIdf.termWeights(docs, "doc_id", "text", broadcastVocab = true)
    // bit-identical output: the fast path may change the plan, never a value
    assert(bcast.except(shuffled).isEmpty && shuffled.except(bcast).isEmpty)
    // and it really is the broadcast plan (the df side under the hint is
    // post-aggregate, so the hint must survive analysis onto the join)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"broadcastVocab did not produce a broadcast join-back:\n$plan")
  }

  test("postingLists: bounded ascending postings, unbounded stats") {
    val docs = (1L to 30L).map(i => (i, if (i % 2 == 0) "x x" else "x y"))
      .toDF("doc_id", "text")
    val out = InvertedIndex.postingLists(docs, "doc_id", "text", maxPostings = 5)
      .orderBy("term")
      .as[(String, Long, Long, String)].collect()
    // x: in all 30 docs (tf 2 in evens, 1 in odds → total 45); postings = 5 smallest
    assert(out(0) === (("x", 30L, 45L, "1,2,3,4,5")))
    // y: 15 odd docs, tf 1 → postings 1,3,5,7,9
    assert(out(1) === (("y", 15L, 15L, "1,3,5,7,9")))
  }

  test("medianByGroup: lower median from the histogram, no per-group sort") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),   // even: lower median = 2
      ("b", 10L), ("b", 20L), ("b", 20L),           // odd: median = 20
      ("c", 7L)
    ).toDF("g", "v")
    val out = ExactQuantiles.medianByGroup(df, "g", "v")
      .orderBy("g").as[(String, Long, Long)].collect()
    assert(out === Array(("a", 4L, 2L), ("b", 3L, 20L), ("c", 1L, 7L)))
  }

  test("pipeline composition invariants hold on a seeded random corpus") {
    // the q84 chain on generated docs: gate -> wide dedup -> survivors ->
    // ordinals. Invariants, not golden values: survivor set ⊆ kept set,
    // survivors are exactly the cluster minima of the kept pair graph,
    // gids are a permutation of 0..N-1 contiguous, shards consecutive.
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc() = Seq.fill(12 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")
    val base = (0L until 60L).map(i => (i, doc()))
    // inject near-dup pairs: doc 100+i = doc i with one token changed
    val dups = (0L until 10L).map { i =>
      val toks = base(i.toInt)._2.split(" ")
      toks(toks.length / 2) = "changed"
      (100L + i, toks.mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val gate = graft.operators.TextAnalysis.qualityGate(docs, "doc_id", "text")
    val keptIds = gate.filter(col("keep")).select("doc_id")
      .as[Long].collect().toSet
    val kept = docs.join(gate.filter(col("keep")).select("doc_id"), "doc_id")
    val pairs = graft.operators.Dedup.simhashMatchesWide(kept, "doc_id", "text", maxHamming = 2)
      .select("i", "j").as[(Long, Long)].collect()
    val surv = graft.operators.Components.keepCanonical(kept, "doc_id",
      graft.operators.Dedup.simhashMatchesWide(kept, "doc_id", "text", maxHamming = 2))
    val out = graft.operators.GlobalIds.contiguousIds(
      surv.select("doc_id", "n_chars"),
      expr("n_chars DIV 50"), Seq(col("n_chars"), col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val survIds = out.map(_._1).toSet
    assert(survIds.subsetOf(keptIds), "survivors must pass the gate")
    // reference survivors: union-find over the pair graph, keep minima
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (i, j) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val expectSurv = keptIds.filter(id => find(id) == id)
    assert(survIds === expectSurv)
    // ordinals: contiguous 0..N-1
    assert(out.map(_._2).sorted.toSeq === (0L until out.length.toLong))
  }

  test("dictionaryEncode: frequency-ranked ids, positional order, OOV as -1") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "unique the")).toDF("doc_id", "text")
    // df: the=3, sat=2; cat/on/mat/dog/unique df=1 -> OOV at minDf=2
    val r = TextAnalysis.dictionaryEncode(docs, "doc_id", "text", minDf = 2L)
      .orderBy("doc_id").collect()
    // vocab by count desc: the(4 occurrences)=0, sat(2)=1
    assert(r(0).getAs[Seq[Long]]("ids") === Seq(0L, -1L, 1L, -1L, 0L, -1L))
    assert(r(0).getAs[Long]("n_oov") === 3L)
    assert(r(1).getAs[Seq[Long]]("ids") === Seq(0L, -1L, 1L))
    assert(r(2).getAs[Seq[Long]]("ids") === Seq(-1L, 0L))
  }

  test("dictionaryEncode: empty and whitespace docs keep empty arrays") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, ""), (2L, "   \t "), (3L, "a a")).toDF("doc_id", "text")
    val r = TextAnalysis.dictionaryEncode(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Seq[Long]]("ids") === Seq.empty)
    assert(r(0).getAs[Long]("n_tokens") === 0L)
    assert(r(1).getAs[Seq[Long]]("ids") === Seq.empty)
    assert(r(2).getAs[Seq[Long]]("ids") === Seq(0L, 0L))
  }

  test("dictionaryEncode: count ties rank by token string") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "b a"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.dictionaryEncode(docs, "doc_id", "text", minDf = 1L)
      .orderBy("doc_id").collect()
    // both count 2: 'a' < 'b' -> a=0, b=1
    assert(r(0).getAs[Seq[Long]]("ids") === Seq(1L, 0L))
    assert(r(1).getAs[Seq[Long]]("ids") === Seq(0L, 1L))
  }

  test("blockingQuality: RR, PC, and harmonic quality from exact pair counts") {
    import graft.operators.Dedup
    val records = (1L to 5L).map(Tuple1(_)).toDF("id") // 10 possible pairs
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("i", "j")
    val cand = Seq((1L, 2L), (2L, 3L)).toDF("i", "j") // finds 1 of 2
    val r = Dedup.blockingQuality(cand, truth, records).collect()(0)
    assert(r.getAs[Long]("n_all_pairs") === 10L)
    assert(r.getAs[Double]("reduction_ratio") === 0.8)
    assert(r.getAs[Double]("pair_completeness") === 0.5)
    val q = 2.0 * 0.8 * 0.5 / (0.8 + 0.5)
    assert(math.abs(r.getAs[Double]("quality") - q) < 1e-15)
  }

  test("weightedJaccardVerify: bag similarity sees repetition set Jaccard misses") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "a b c"),           // bag {a,b,c}
      (2L, "a a a a a a a b c"), // same SET, 7 extra a's
      (3L, "a b c"),           // exact bag duplicate of 1
      (4L, "")                 // empty bag
    ).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("i", "j")
    val r = Dedup.weightedJaccardVerify(cands, docs, "doc_id", "text")
      .orderBy("i", "j").collect()
    // (1,2): min-sum = 3 (a,b,c once each), max-sum = 3+9-3 = 9
    assert(r(0).getAs[Long]("min_sum") === 3L)
    assert(r(0).getAs[Double]("wjaccard") === 3.0 / 9.0)
    // (1,3): identical bags -> 1.0
    assert(r(1).getAs[Double]("wjaccard") === 1.0)
    // (1,4): empty side -> 3/(3+0-3)... denominator 3, wj = 0
    assert(r(2).getAs[Long]("min_sum") === 0L)
    assert(r(2).getAs[Double]("wjaccard") === 0.0)
  }

  test("weightedJaccardVerify: two empty bags yield NULL, not 0/0") {
    import graft.operators.Dedup
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val cands = Seq((1L, 2L)).toDF("i", "j")
    val r = graft.operators.Dedup
      .weightedJaccardVerify(cands, docs, "doc_id", "text").collect()(0)
    assert(r.isNullAt(r.fieldIndex("wjaccard")))
  }

  test("skyline2DByGroup: independent frontiers per group") {
    import graft.operators.TopK
    // group a: (1,5) dominates (1,4); group b: (1,4) is ITS frontier
    val d = Seq((1L, "a", 1L, 5L), (2L, "a", 1L, 4L), (3L, "b", 1L, 4L))
      .toDF("id", "g", "x", "y")
    val got = TopK.skyline2DByGroup(d, "g", col("x"), col("y"))
      .orderBy("id").collect().map(_.getAs[Long]("id")).toSeq
    assert(got === Seq(1L, 3L))
  }

  test("wilsonIntervalByGroup: interval stays in [0,1] and narrows with n") {
    import graft.operators.Profiling
    // 3-of-4 vs 750-of-1000: same p_hat, very different intervals
    val d = ((1 to 4).map(i => ("small", i <= 3)) ++
      (1 to 1000).map(i => ("big", i <= 750))).toDF("g", "s")
    val r = Profiling.wilsonIntervalByGroup(d, "g", col("s"))
      .collect().map(x => x.getAs[String]("group") -> x).toMap
    val sm = r("small"); val bg = r("big")
    assert(sm.getAs[Double]("p_hat") === 0.75 &&
      bg.getAs[Double]("p_hat") === 0.75)
    val smWidth = sm.getAs[Double]("wilson_hi") - sm.getAs[Double]("wilson_lo")
    val bgWidth = bg.getAs[Double]("wilson_hi") - bg.getAs[Double]("wilson_lo")
    assert(smWidth > 5 * bgWidth) // small n -> much wider interval
    assert(sm.getAs[Double]("wilson_lo") >= 0.0 &&
      sm.getAs[Double]("wilson_hi") <= 1.0)
    // extreme p_hat = 1: naive interval would be degenerate [1,1]
    val all = (1 to 5).map(i => ("u", true)).toDF("g", "s")
    val u = Profiling.wilsonIntervalByGroup(all, "g", col("s")).collect()(0)
    assert(u.getAs[Double]("wilson_lo") < 1.0 &&
      u.getAs[Double]("wilson_hi") <= 1.0)
  }

  test("pearsonByGroup: exact ±1 on square radicands, zero-variance NULL") {
    import graft.operators.Profiling
    val Q = 1048576L
    // (0,0)/(3,6): Dx=9, Dy=36 — both perfect squares, sqrts exact
    val d = Seq(("up", 0L, 0L), ("up", 3L, 6L),
      ("down", 0L, 6L), ("down", 3L, 0L),
      ("flat", 1L, 5L), ("flat", 2L, 5L)) // y constant -> NULL
      .toDF("g", "x", "y")
    val got = Profiling.pearsonByGroup(d, "g", col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got("up").getAs[Long]("r_q20") === Q)
    assert(got("down").getAs[Long]("r_q20") === -Q)
    assert(got("flat").isNullAt(got("flat").fieldIndex("r_q20")))
    assert(got("up").getAs[Long]("n") === 2L)
  }

  test("spearmanByGroup: tie midranks, monotone-nonlinear rho") {
    import graft.operators.Profiling
    val Q = 1048576L
    // ties on x: doubled midranks (3,3,6) vs y (2,4,6)
    val d = Seq(("t", 1L, 10L), ("t", 1L, 20L), ("t", 2L, 30L),
      // monotone but nonlinear: rank-perfect -> rho ~ 1
      ("m", 1L, 1L), ("m", 2L, 4L), ("m", 3L, 9L))
      .toDF("g", "x", "y")
    val got = Profiling.spearmanByGroup(d, "g", col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // mirror the engine's double chain exactly
    def exp(num: Long, dx: Long, dy: Long): Long =
      math.floor(num.toDouble /
        (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)) * Q).toLong
    assert(got("t").getAs[Long]("rho_q20") === exp(18L, 18L, 24L))
    assert(got("m").getAs[Long]("rho_q20") === exp(24L, 24L, 24L))
  }

  test("skyline2D: frontier keeps undominated points, duplicates survive") {
    import graft.operators.TopK
    // points: (1,5) (2,4) (3,3) dominate nothing mutually (frontier);
    // (1,4) dominated by (1,5); (2,2) dominated by (3,3); (3,3) dup
    val d = Seq((1L, 1L, 5L), (2L, 2L, 4L), (3L, 3L, 3L), (4L, 1L, 4L),
      (5L, 2L, 2L), (6L, 3L, 3L)).toDF("id", "x", "y")
    val got = TopK.skyline2D(d, col("x"), col("y"))
      .orderBy("id").collect().map(_.getAs[Long]("id")).toSeq
    assert(got === Seq(1L, 2L, 3L, 6L))
  }

  test("skyline2D: a single maximal point dominates everything else") {
    import graft.operators.TopK
    val d = Seq((1L, 10L, 10L), (2L, 9L, 9L), (3L, 10L, 9L), (4L, 1L, 1L))
      .toDF("id", "x", "y")
    val got = TopK.skyline2D(d, col("x"), col("y")).collect()
    assert(got.map(_.getAs[Long]("id")).toSeq === Seq(1L))
  }

  test("heapsCurve: vocabulary and mass grow exactly with the doc prefix") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "d"), (4L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsCurve(docs, "doc_id", "text", Seq(1L, 2L, 4L))
      .orderBy("k").collect()
    assert(r.map(x => (x.getAs[Long]("k"), x.getAs[Long]("n_docs"),
      x.getAs[Long]("total_tokens"), x.getAs[Long]("vocab"))).toSeq ===
      Seq((1L, 1L, 2L, 2L), (2L, 2L, 4L, 3L), (4L, 4L, 5L, 4L)))
  }

  test("plan shape: skyline2D semi-joins a BROADCAST frontier, no sort-merge") {
    import graft.operators.TopK
    val d = (1L to 50L).map(i => (i, i % 7, i % 5)).toDF("id", "x", "y")
    val plan = TopK.skyline2D(d, col("x"), col("y"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier must come back as a broadcast semi-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"skyline must not sort-merge the corpus against its frontier:\n$plan")
  }

  test("plan shape: dictionaryEncode broadcasts the vocabulary join") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val plan = TextAnalysis.dictionaryEncode(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the vocab join must broadcast, never shuffle the token stream:\n$plan")
  }

  test("plan shape: decileLift has no corpus-wide sort (histogram-offset ordinals)") {
    import graft.operators.Evaluation
    val d = (1L to 100L).map(i => (i, i % 13, i % 2 == 0L)).toDF("k", "s", "y")
    val plan = Evaluation.decileLift(d, "k", "s", "y")
      .queryExecution.executedPlan.toString
    // the only window partitions by the score bucket; a partition-less
    // global Sort over data rows would show as Sort + Exchange SinglePartition
    // feeding a Window over the raw rows
    assert(!plan.contains("SortMergeJoin"),
      s"rank join must broadcast the offsets:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back:\n$plan")
  }

  test("blockingQuality: empty truth reports NULL completeness, counts intact") {
    import graft.operators.Dedup
    val records = (1L to 3L).map(Tuple1(_)).toDF("id")
    val truth = Seq.empty[(Long, Long)].toDF("i", "j")
    val cand = Seq((1L, 2L)).toDF("i", "j")
    val r = Dedup.blockingQuality(cand, truth, records).collect()(0)
    assert(r.getAs[Long]("n_truth") === 0L)
    assert(r.isNullAt(r.fieldIndex("pair_completeness")))
  }
}
