package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different words entirely here now"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "short text")
  ).toDF("doc_id", "text")

  // ------------------------------------------------------------- text ops

  test("polyHash matches the reference fold and is order-sensitive") {
    val r = docs.limit(1)
      .select(TextAnalysis.polyHash(lit("hello")).as("h"),
        TextAnalysis.polyHash(lit("olleh")).as("h2"))
      .collect()(0)
    // fold (acc*31 + codepoint) % 1000000007 over h,e,l,l,o
    assert(r.getAs[Long]("h") === 99162322L)
    assert(r.getAs[Long]("h") !== r.getAs[Long]("h2"))
  }

  test("token / subword / punct counts and quality score") {
    val r = docs.filter($"doc_id" === 0)
      .select(
        TextAnalysis.tokenCount($"text").as("tc"),
        TextAnalysis.subwordCount($"text").as("sc"),
        TextAnalysis.punctCount($"text").as("pc"),
        TextAnalysis.stopwordRatio($"text").as("sr"),
        TextAnalysis.qualityScore($"text").as("q"))
      .collect()(0)
    assert(r.getAs[Long]("tc") === 9)
    assert(r.getAs[Long]("sc") === 9) // all-letter words, no punct
    assert(r.getAs[Long]("pc") === 0)
    assert(math.abs(r.getAs[Double]("sr") - 2.0 / 9) < 1e-15) // 2× "the"
    val q = r.getAs[Double]("q")
    assert(q > 0 && q <= 1.0)
  }

  test("langId picks the marker-dominant language, und when none") {
    val r = Seq(
      (1L, "the fox is going to the market and back"),
      (2L, "der hund und die katze das ist gut"),
      (3L, "xyzzy plugh")
    ).toDF("id", "text")
      .select($"id", TextAnalysis.langId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(1L) === "en")
    assert(r(2L) === "de")
    assert(r(3L) === "und")
  }

  test("native langId (MarkerCounts kernel) equals the HOF executable spec") {
    val corpus = docs.union(Seq(
      (10L, "der hund und die katze das ist nicht gut"),
      (11L, "el que la los una por cosas"),
      (12L, "le chat est dans les des une maison"),
      (13L, "the der el le"), // 1 hit everywhere → tie, priority order
      (14L, ""), (15L, "   \t\n  "), (16L, "the and of") // odd whitespace
    ).toDF("doc_id", "text"))
    val both = corpus.select(
      TextAnalysis.langId($"text").as("native"),
      TextAnalysis.langIdHof($"text").as("hof"),
      TextAnalysis.markerCounts($"text").as("counts"),
      TextAnalysis.langScore($"text", TextAnalysis.LangMarkers.head._2).as("s_en"))
      .collect()
    both.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getSeq[Long](2).length === 4)
      assert(r.getSeq[Long](2).head === r.getLong(3)) // slot 0 == langScore(en)
    }
  }

  test("native simHash equals the HOF executable specification") {
    val both = docs.select(
      TextAnalysis.simHash($"text").as("native"),
      TextAnalysis.simHashHof($"text").as("hof")).collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("kernels tokenize with regex-\\s semantics, incl. Unicode whitespace edge") {
    // U+2028 is Character.isWhitespace but NOT regex \s — the kernels must
    // treat it as a NON-separator exactly like tokens()/the SQL oracles.
    val tricky = Seq((1L, "a b c\td"), (2L, "xy z")).toDF("doc_id", "text")
    val sims = tricky.select(
      TextAnalysis.simHash($"text").as("native"),
      TextAnalysis.simHashHof($"text").as("hof")).collect()
    sims.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // n-gram pairs go through NgramHashSet — identical texts must still be
    // identical sets regardless of the odd character
    val pairs = Dedup.ngramJaccardPairs(
      tricky.union(tricky.withColumn("doc_id", $"doc_id" + 10)),
      "doc_id", "text", n = 2, threshold = 0.9).collect()
    assert(pairs.exists(r => r.getAs[Long]("i") == 1 && r.getAs[Long]("j") == 11 &&
      r.getAs[Double]("jaccard") == 1.0))
  }

  test("native simHash matches HOF spec on astral (non-BMP) text") {
    // surrogate-pair code points: the kernel must fold the CODE POINT,
    // not the two UTF-16 units, to agree with split+ascii (and the
    // DuckDB oracle) on emoji / astral CJK input.
    val astral = Seq(
      (1L, "hello 😀 world"), // 😀 U+1F600
      (2L, "😀😁 mixed ascii"), // two emoji in one token
      (3L, "𤭢𤭢"), // 𤭢 U+24B62 twice, single token
      (4L, "plain ascii only")
    ).toDF("doc_id", "text")
    val rows = astral.select(
      TextAnalysis.simHash($"text").as("native"),
      TextAnalysis.simHashHof($"text").as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("simHash: near-identical texts land within small hamming distance") {
    val sigs = docs.select($"doc_id", TextAnalysis.simHash($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) === sigs(3L)) // exact dup → identical signature
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(0L), sigs(1L)) < hamming(sigs(0L), sigs(2L)))
    sigs.values.foreach(s =>
      assert(s >= 0 && s < (1L << TextAnalysis.SimHashBits)))
  }

  // ---------------------------------------------------------------- dedup

  test("sortedNeighborhoodPairs: prefix-sorted near-dups within the window") {
    // 32-char prefix order, ties by id: 2, 4, 0, 1, 3 (docs 0/1/3 share
    // the first 32 chars). w=3 ⇒ rank distance ≤ 2 covers all three
    // near-dup pairs; only they survive Jaccard ≥ 0.5.
    val pairs = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
      w = 3, n = 2, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(pairs === Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("sortedNeighborhoodPairs: sub-n-token docs pair without throwing") {
    // two empty and one 1-token doc sort adjacent; their shingle sets
    // are empty, |A∪B| = 0 — the pair must DROP (Jaccard undefined),
    // not divide by zero under ANSI.
    val weird = Seq((1L, ""), (2L, ""), (3L, "x"),
      (4L, "the quick brown fox"), (5L, "the quick brown fox"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhoodPairs(weird, "doc_id", "text",
      w = 5, n = 2, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(pairs === Set((4L, 5L)))
  }

  test("sortedNeighborhoodPairs: window bounds the candidate budget") {
    // w=2 ⇒ only ADJACENT ranks pair: (0,3) sits at rank distance 2 and
    // must be missed — the documented O(N·w) blocking trade-off.
    val pairs = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
      w = 2, n = 2, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(pairs === Set((0L, 1L), (1L, 3L)))
  }

  test("winnowPairs: shared long runs are found through the winnow index") {
    // docs 0/1/3 share the 8-token run "the quick ... lazy"; with
    // w+n-1 = 4+3-1 = 6 ≤ 8 the coverage guarantee forces a shared
    // fingerprint for each pair, and verification keeps all three.
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text",
      n = 3, w = 4, threshold = 0.5)
      .collect().map(r => ((r.getAs[Long]("i"), r.getAs[Long]("j")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs.keySet === Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(pairs((0L, 3L)) === 1.0) // exact dup
  }

  test("exactStats and exactDedup") {
    val stats = Dedup.exactStats(docs, $"text").collect()(0)
    assert(stats.getAs[Long]("n_docs") === 5)
    assert(stats.getAs[Long]("n_distinct") === 4)
    assert(stats.getAs[Long]("n_dup_docs") === 1)
    val kept = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(0L, 1L, 2L, 4L)) // 3 dropped (dup of 0, higher id)
  }

  test("exactDedupByDigest equals exactDedup (payload off the dedup shuffle)") {
    val byDigest = Dedup.exactDedupByDigest(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val direct = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(byDigest === direct)
    // the dedup window runs over (doc_id, digest) only — the text payload
    // must not appear below the row_number window in the plan
    val qe = Dedup.exactDedupByDigest(docs, "text", "doc_id").queryExecution
    val windows = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(!w.child.output.exists(_.name == "text"),
        s"payload column must be projected out before the dedup window:\n$w")
    }
  }

  test("CacheScope.scoped unpersists operator caches after the action") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    graft.operators.CacheScope.scoped {
      val n = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 2, threshold = 0.5).count()
      assert(n > 0)
      // inside the scope the signature caches are live
      assert(sc.getPersistentRDDs.keySet.diff(before).nonEmpty)
    }
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
      "signature caches must be unpersisted when the scope closes")
  }

  test("ngramJaccardPairs finds the near-dup pair exactly, no self/reverse pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)
      .collect()
    val keys = pairs.map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    // 0-1 share 7 of 8+8 bigrams (J=7/9), 0-3 identical (J=1), 1-3 same as 0-1.
    assert(keys === Set((0L, 1L), (0L, 3L), (1L, 3L)))
    pairs.foreach { r =>
      assert(r.getAs[Long]("i") < r.getAs[Long]("j"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
    val exact = pairs.find(r => r.getAs[Long]("i") == 0 && r.getAs[Long]("j") == 3).get
    assert(exact.getAs[Double]("jaccard") === 1.0)
  }

  test("containmentPairs is directional: quote found, container not flagged") {
    val quoteDocs = Seq(
      (10L, "alpha beta gamma delta"), // 3 bigrams, all inside 11
      (11L, "intro words alpha beta gamma delta outro tail end"), // 8 bigrams
      (12L, "completely unrelated content sits here"),
      (13L, "alpha beta gamma delta") // exact dup of 10
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(quoteDocs, "doc_id", "text",
      n = 2, threshold = 0.8).collect()
    val keys = pairs.map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
      r.getAs[Double]("containment"))).toSet
    // 10 in 11 (3/3), mutual exact 10<->13; 11 in 10 is 3/8 — absent.
    assert(keys === Set((10L, 11L, 1.0), (13L, 11L, 1.0),
      (10L, 13L, 1.0), (13L, 10L, 1.0)))
    // brute-force cross-check on the ngram sets the operator builds
    val exact = Dedup.ngramJaccardPairs(quoteDocs, "doc_id", "text",
      n = 2, threshold = 0.99).select("i", "j").as[(Long, Long)].collect().toSet
    assert(exact === Set((10L, 13L))) // Jaccard sees only the exact dup
  }

  test("randomProject: hand-checked fold, deterministic signs, dup vectors collide") {
    import graft.operators.Projection
    val signs = Projection.signMatrix(7L, 16, 64)
    assert(signs.flatten.forall(v => v == 1.0f || v == -1.0f))
    assert(signs.map(_.toSeq).toSeq === Projection.signMatrix(7L, 16, 64).map(_.toSeq).toSeq)
    val v = Array.tabulate(64)(i => (i % 5 - 2).toFloat * 0.25f)
    val vecs = Seq((1L, v), (2L, v), (3L, Array.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
    val out = Projection.randomProject(vecs, "embedding", 16, 7L, 64)
      .orderBy("vec_id").select("proj").as[Seq[Double]].collect()
    // manual left fold per coordinate, same order and widening
    val expect = signs.map { row =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += v(i).toDouble * row(i).toDouble; i += 1 }
      acc / math.sqrt(16.0)
    }.toSeq
    assert(out(0) === expect)
    assert(out(0) === out(1)) // identical inputs -> identical projections
    assert(out(0).length === 16)
  }

  test("projectedTopK: exact-dup vector is the projected rank-1 neighbor") {
    import graft.operators.Projection
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val far = Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)
    val corpus = Seq((0L, base), (1L, base), (2L, far),
      (3L, Array.tabulate(64)(i => far(i) * 0.9f + 0.1f)))
      .toDF("vec_id", "embedding")
    val top = Projection.projectedTopK(
      corpus.filter($"vec_id" === 0), corpus, "vec_id", "embedding",
      dOut = 16, seed = 7L, dIn = 64, k = 2).collect()
    val r1 = top.find(_.getAs[Long]("rank") == 1L).get
    assert(r1.getAs[Long]("nid") === 1L) // identical vector: pcos = 1
    assert(math.abs(r1.getAs[Double]("pcos") - 1.0) < 1e-12)
  }

  test("minhashLshPairs agrees with exact ngram pairs on planted dups") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
  }

  test("simhashPairs: exact dups at hamming 0; plan has no cartesian product") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    val collected = pairs.collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"), r.getAs[Long]("hamming")))
    assert(collected.contains((0L, 3L, 0L)))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"simhash dedup must join on nibble bands, not cross-join:\n$plan")
  }

  test("simhashPairsWide equals brute-force Hamming over the wide signature") {
    // Total recall for hamming <= 3 means band-join output == all-pairs
    // ground truth — assert that equality directly on the fixture corpus.
    val wide = Dedup.simhashPairsWide(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("hamming"))).toSet
    val sigs = docs.select($"doc_id",
      graft.operators.TextAnalysis.simHashWide($"text").as("sig"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (i, si) <- sigs; (j, sj) <- sigs if i < j
      h = java.lang.Long.bitCount(si ^ sj) if h <= 3
    } yield (i, j, h.toLong)).toSet
    assert(wide === brute)
    // exact dup pair from the fixture still lands at hamming 0
    assert(wide.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 0L))
    // the wide signature really uses the upper half: some fixture sig
    // must exceed 28 bits (else the second multiplier added nothing)
    assert(sigs.map(_._2).exists(_ >= (1L << 28)))
    val plan = Dedup.simhashPairsWide(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("editVerifiedPairs: edit gate separates near-copies from token anagrams") {
    // doc 10/11: true near-copy (last word substituted — hamming 1 on
    // the wide signature, verified against the portable-hash reference,
    // and few edits). doc 12: the SAME TOKEN MULTISET as 10, reordered —
    // simhash is order-blind so the signature pair survives at hamming
    // 0, and only the edit gate can reject it.
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
      + "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi").split(" ")
    val d = Seq(
      (10L, (base :+ "omega").mkString(" ")),
      (11L, (base :+ "word").mkString(" ")),
      (12L, (base :+ "omega").reverse.mkString(" "))
    ).toDF("doc_id", "text")
    val all = Dedup.editVerifiedPairs(d, "doc_id", "text",
      maxHamming = 3, maxEdits = 100, window = 160)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("edits"))).toSet
    assert(all.exists(p => p._1 == 10L && p._2 == 11L && p._3 <= 6L))
    val anagram = all.find(p => p._1 == 10L && p._2 == 12L)
    assert(anagram.nonEmpty && anagram.get._3 > 20L,
      s"anagram pair should need many edits: $anagram")
    val tight = Dedup.editVerifiedPairs(d, "doc_id", "text",
      maxHamming = 3, maxEdits = 6, window = 160)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(tight === Set((10L, 11L)), s"tight gate kept: $tight")
  }

  test("editVerifiedPairs: window bounds the comparison; non-ASCII folds to one '?'") {
    // Identical 200-char prefixes, divergent tails: inside a 160-window
    // the pair is 0 edits regardless of the tails.
    val prefix = Seq.fill(20)("same prefix words").mkString(" ").take(200)
    val d = Seq(
      (20L, prefix + " tail one ends here"),
      (21L, prefix + " a completely different ending altogether")
    ).toDF("doc_id", "text")
    val p = Dedup.editVerifiedPairs(d, "doc_id", "text",
      maxHamming = 3, maxEdits = 10, window = 160).collect()
    assert(p.length === 1 && p.head.getAs[Long]("edits") === 0L)
    // Astral and accented codepoints each fold to ONE '?': the folded
    // pair differs by exactly the one substituted token's characters.
    val win = d.sparkSession.range(1).select(
      TextAnalysis.asciiWindow(lit("café 😀 ok"), 160).as("w"))
      .as[String].head()
    assert(win === "caf? ? ok")
  }

  test("simhashPairsWideIncremental: cross+within ground truth, corpus never re-paired") {
    // Split the fixture: odd ids are the existing corpus (known only by
    // signature table), even ids arrive as the new batch.
    val existingDocs = docs.filter($"doc_id" % 2 === 1)
    val newDocs = docs.filter($"doc_id" % 2 === 0)
    val sigTable = Dedup.wideSignatures(existingDocs, "doc_id", "text")
    val got = Dedup.simhashPairsWideIncremental(newDocs, "doc_id", "text",
      sigTable, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("hamming"))).toSet
    // brute-force ground truth over the same signatures
    val sigs = docs.select($"doc_id",
      graft.operators.TextAnalysis.simHashWide($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    val newIds = newDocs.select("doc_id").as[Long].collect().toSet
    val oldIds = sigs.keySet -- newIds
    val cross = for {
      i <- oldIds; j <- newIds
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j)) if h <= 3
    } yield (i, j, h.toLong)
    val within = for {
      i <- newIds; j <- newIds if i < j
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j)) if h <= 3
    } yield (i, j, h.toLong)
    assert(got === (cross ++ within))
    // no existing-vs-existing pair may appear (the corpus was already
    // resolved in earlier increments — re-pairing it is the cost this
    // operator exists to avoid)
    assert(!got.exists(p => oldIds.contains(p._1) && oldIds.contains(p._2)))
    // an exact id re-delivery emits nothing for itself
    val redelivered = Dedup.simhashPairsWideIncremental(
      existingDocs.limit(1), "doc_id", "text", sigTable, maxHamming = 3)
      .filter($"i" === $"j").count()
    assert(redelivered === 0L)
  }

  test("signatureMatches64Incremental: cross+within truth off the persisted table; corpus bytes never read") {
    import org.apache.spark.sql.types._
    // corpus known ONLY by its persisted (id, sig) table — the operator
    // takes signatures, not pixels, so corpus re-decode is impossible
    // by construction; the inputFiles assertion below additionally
    // locks that the matcher's scan side is just the table's parquet
    val corpusRows = Seq((10L, 0x00FF00FF00FF00FFL),
      (11L, 0x1234567812345678L), (12L, -1L))
    val batchRows = Seq[(Long, java.lang.Long)](
      (100L, 0x00FF00FF00FF00FDL), // Hamming 1 from corpus 10
      (101L, 0x1234567812345678L), // exact re-ship of corpus 11
      (102L, 0x0F0F0F0F0F0F0F0FL), // unique vs corpus
      (103L, 0x0F0F0F0F0F0F0F0DL), // Hamming 1 from 102: batch-internal
      (104L, null)) // undecodable image — no perceptual identity
    val dir = java.nio.file.Files.createTempDirectory("graft_sig_").toString
    corpusRows.toDF("img_id", "dhash").write.mode("overwrite")
      .parquet(s"$dir/sigs.parquet")
    val corpusSigs = spark.read.parquet(s"$dir/sigs.parquet")
    val batchSigs = spark.createDataFrame(
      spark.sparkContext.parallelize(batchRows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2))),
      StructType(Seq(StructField("img_id", LongType, nullable = false),
        StructField("dhash", LongType, nullable = true))))
    val matches = graft.operators.Dedup.signatureMatches64Incremental(
      batchSigs, "img_id", "dhash", corpusSigs, "img_id", "dhash",
      maxHamming = 2)
    assert(matches.inputFiles.forall(_.contains("sigs.parquet")))
    val got = matches.collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("hamming"))).toSet
    // brute-force ground truth over the same signatures
    val bm = batchRows.collect { case (id, s) if s != null => id -> s.longValue }.toMap
    val cross = for {
      (ci, cs) <- corpusRows; (bi, bs) <- bm
      h = java.lang.Long.bitCount(cs ^ bs) if h <= 2
    } yield (ci, bi, h.toLong)
    val within = for {
      (a, as) <- bm.toSeq; (b, bs) <- bm if a < b
      h = java.lang.Long.bitCount(as ^ bs) if h <= 2
    } yield (a, b, h.toLong)
    assert(got === (cross ++ within).toSet)
    assert(got === Set((10L, 100L, 1L), (11L, 101L, 0L), (102L, 103L, 1L)))
    // the documented composition: keepCanonical over the BATCH only —
    // corpus-matched and within-dominated batch images drop; the
    // unique and the undecodable survive; survivors union-append
    val kept = graft.operators.Components.keepCanonical(
      batchSigs, "img_id", matches)
    assert(kept.select("img_id").as[Long].collect().toSet === Set(102L, 104L))
    assert(corpusSigs.unionByName(kept).count() === 5L)
    // id re-delivery emits nothing for itself
    val redeliver = Dedup.signatureMatches64Incremental(
      corpusSigs.limit(1), "img_id", "dhash", corpusSigs, "img_id",
      "dhash", maxHamming = 2).filter($"i" === $"j").count()
    assert(redeliver === 0L)
  }

  test("signaturePairs64Guarded: flood stays linear-star, saturation loud, unsaturated recall intact") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // 50 identical signatures (the solid-fill flood — all dHash 0),
    // one near pair sharing three unsaturated bands, one near pair
    // whose ONLY shared bands sit inside the saturated nib-0 buckets,
    // and a singleton
    val a = 0x0123456789ABCDEFL
    val rows: Seq[(Long, Long)] =
      (0L until 50L).map(i => i -> 0L) ++
        Seq(100L -> a, 101L -> (a ^ 1L), // near pair, bands 1-3 clear
          200L -> 1L, 201L -> 2L, // near pair hiding in the flood's buckets
          300L -> 0x7777000011110000L)
    val sigs = rows.toDF("id", "sig")
    val guarded = Dedup.signaturePairs64Guarded(sigs, "id", "sig",
      maxHamming = 2, maxOccupancy = 8)
    val got = guarded.collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("hamming"))).toSet
    // the flood matches as a STAR — 49 edges to the min id, never
    // C(50,2) = 1225 pairs
    val star = (1L until 50L).map(j => (0L, j, 0L)).toSet
    // (100, 101) is found through its unsaturated shared bands;
    // (200, 201) shares ONLY nib-0 bands with the 52-member flood
    // buckets (occupancy > 8), so the guard drops it — degraded
    // near-recall inside saturated regions, the documented trade
    assert(got === star + ((100L, 101L, 1L)))
    assert(ham(1L, 2L) === 2) // the dropped pair IS within radius
    // ...and the saturation report says exactly where the hazard is
    val sat = Dedup.bandSaturation(sigs, "id", "sig", maxOccupancy = 8)
      .orderBy("band").collect()
      .map(r => (r.getAs[Long]("n_saturated_buckets"),
        r.getAs[Long]("n_sigs_in_saturated")))
    // every band has exactly its nib-0 bucket saturated (flood 50 +
    // the 1L/2L stowaways that share zero nibs in upper bands)
    assert(sat.forall(_._1 === 1L))
    assert(sat.map(_._2).forall(n => n >= 50L))
    // with no saturation (cap above the flood), guarded components
    // EQUAL the unguarded signaturePairs64 components — star edges
    // re-bracket the exact groups, never re-shape them
    val loose = Dedup.signaturePairs64Guarded(sigs, "id", "sig",
      maxHamming = 2, maxOccupancy = 64)
    def comps(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.operators.Components.connectedComponents(pairs, "i", "j")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component"))
        .toMap
    assert(comps(loose) ===
      comps(Dedup.signaturePairs64(sigs, "id", "sig", maxHamming = 2)))
  }

  test("signatureMatches64IncrementalGuarded: representative edges, combined occupancy, survivor identity") {
    // corpus holds half a solid-fill flood (sig 0), batch ships the
    // other half plus a near pair and a fresh image
    val corpus = ((0L until 20L by 2L).map(_ -> 0L) ++
      Seq(50L -> 0x1111222233334444L)).toDF("id", "sig")
    val batch = ((1L until 20L by 2L).map(_ -> 0L) ++
      Seq(61L -> (0x1111222233334444L ^ 2L), // near the corpus sig
        63L -> 0x7777000011110000L)).toDF("id", "sig")
    val got = Dedup.signatureMatches64IncrementalGuarded(
      batch, "id", "sig", corpus, "id", "sig",
      maxHamming = 2, maxOccupancy = 6).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("hamming"))).toSet
    // flood: each batch copy gets ONE representative cross edge to the
    // min corpus holder (id 0) plus a within-batch star to id 1 —
    // 10 + 9 rows, never 10×10 cross pairs; the near pair rides its
    // unsaturated bands; the fresh image matches nothing
    val cross = (1L until 20L by 2L).map(j => (0L, j, 0L)).toSet
    val star = (3L until 20L by 2L).map(j => (1L, j, 0L)).toSet
    assert(got === cross ++ star + ((50L, 61L, 1L)))
    // combined-occupancy rule: corpus 10 + batch 10 rows share the
    // nib-0 buckets, so occupancy 20 > 6 saturates them even though
    // NEITHER side alone is capped at 10 > 6... lower the corpus to 4
    // rows and the batch to 4: combined 8 still > 6 → near recall
    // through those buckets stays off (the one rule across both sides)
    val c4 = ((0L until 8L by 2L).map(_ -> 1L)).toDF("id", "sig")
    val b4 = ((1L until 8L by 2L).map(_ -> 2L)).toDF("id", "sig")
    val comb = Dedup.signatureMatches64IncrementalGuarded(
      b4, "id", "sig", c4, "id", "sig", maxHamming = 2, maxOccupancy = 6)
      .collect()
    // sigs 1 and 2 are Hamming-2 apart and share bands 1-3 (nib 0),
    // each with combined occupancy 8 > 6 → no near-cross edges; the
    // within-batch sig-2 group still stars (exact recall unconditional)
    assert(comb.forall(_.getAs[Long]("hamming") == 0L))
    assert(comb.length === 3) // star of the 4 batch copies
    // survivor identity with the unguarded matcher when nothing is
    // saturated
    val cs = Seq(10L -> 0x00FF00FF00FF00FFL, 11L -> 0x1234567812345678L)
      .toDF("id", "sig")
    val bs = Seq(100L -> 0x00FF00FF00FF00FDL, 101L -> 0x1234567812345678L,
      102L -> 0x0F0F0F0F0F0F0F0FL, 103L -> 0x0F0F0F0F0F0F0F0DL)
      .toDF("id", "sig")
    def surv(pairs: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.operators.Components.keepCanonical(bs, "id", pairs)
        .select("id").as[Long].collect().toSet
    assert(surv(Dedup.signatureMatches64IncrementalGuarded(
        bs, "id", "sig", cs, "id", "sig", 2, 64)) ===
      surv(Dedup.signatureMatches64Incremental(
        bs, "id", "sig", cs, "id", "sig", 2)))
  }

  test("simhashPairsWideGuarded: boilerplate flood stars linearly, parity off-flood, saturation loud") {
    // 40 copies of the same cookie-banner boilerplate (one wide
    // simhash) + 10 genuinely distinct docs
    val boiler = "this website uses cookies to improve your experience " +
      "please accept our cookie policy to continue browsing"
    val docs = ((0L until 40L).map(i => (i, boiler)) ++
      (100L until 110L).map(i => (i, s"distinct document number $i with " +
        s"unique words alpha$i beta$i gamma$i delta$i epsilon$i")))
      .toDF("doc_id", "text")
    val guarded = Dedup.simhashPairsWideGuarded(docs, "doc_id", "text",
      maxHamming = 2, maxOccupancy = 8)
    val got = guarded.collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("hamming"))).toSet
    // the flood matches as a STAR — 39 edges to doc 0, never
    // C(40,2) = 780 pairs; other exact groups (the fixture's 103/104
    // happen to sign-fold to the same wide sig) star independently,
    // and near pairs ride their unsaturated buckets
    val star = (1L until 40L).map(j => (0L, j, 0L)).toSet
    assert(got.filter(e => e._3 == 0L && e._1 == 0L) === star)
    assert(got.size < 60) // linear, not quadratic
    // saturation report: the flood's 4 buckets are over the cap
    val sat = Dedup.bandSaturationWide(docs, "doc_id", "text",
      maxOccupancy = 8).orderBy("band").collect()
      .map(r => (r.getAs[Long]("n_saturated_buckets"),
        r.getAs[Long]("n_sigs_in_saturated")))
    assert(sat.length === 4)
    assert(sat.forall(_._1 >= 1L))
    assert(sat.forall(_._2 >= 40L))
    // with no saturation, guarded components EQUAL the unguarded
    // simhashPairsWide components
    def comps(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.operators.Components.connectedComponents(pairs, "i", "j")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component"))
        .toMap
    val loose = Dedup.simhashPairsWideGuarded(docs, "doc_id", "text",
      maxHamming = 2, maxOccupancy = 1000)
    assert(comps(loose) ===
      comps(Dedup.simhashPairsWide(docs, "doc_id", "text", maxHamming = 2)))
  }

  test("simhashMatchesWideIncrementalGuarded: representative edges, survivor identity off-flood") {
    val boiler = "copyright notice all rights reserved redistribution " +
      "prohibited without prior written permission of the publisher"
    // corpus holds half the boilerplate flood (even ids), batch ships
    // the other half (odd ids) plus two distinct docs
    val corpusDocs = ((0L until 20L by 2L).map(i => (i, boiler)) :+
      ((50L, "a singular corpus document about medieval falconry " +
        "techniques and the training of raptors"))).toDF("doc_id", "text")
    val batchDocs = ((1L until 20L by 2L).map(i => (i, boiler)) ++
      Seq((61L, "an entirely different batch document concerning deep " +
        "sea hydrothermal vent ecosystems and chemosynthesis"),
        (63L, "final fresh document on the history of mechanical " +
          "clockmaking in early modern europe")))
      .toDF("doc_id", "text")
    val corpusSigs = Dedup.wideSignatures(corpusDocs, "doc_id", "text")
    val got = Dedup.simhashMatchesWideIncrementalGuarded(
      batchDocs, "doc_id", "text", corpusSigs,
      maxHamming = 2, maxOccupancy = 6).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("hamming"))).toSet
    // flood: ONE representative cross edge per batch copy (to corpus
    // min id 0) plus a within-batch star to id 1 — 10 + 9 exact rows,
    // never 10×10 cross pairs
    val cross = (1L until 20L by 2L).map(j => (0L, j, 0L)).toSet
    val star = (3L until 20L by 2L).map(j => (1L, j, 0L)).toSet
    assert(got.filter(_._3 == 0L) === cross ++ star)
    assert(got.size < 30)
    // survivor identity with the unguarded matcher when nothing
    // saturates
    def surv(pairs: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.operators.Components.keepCanonical(batchDocs, "doc_id", pairs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv(Dedup.simhashMatchesWideIncrementalGuarded(
        batchDocs, "doc_id", "text", corpusSigs, 2, 1000)) ===
      surv(Dedup.simhashMatchesWideIncremental(
        batchDocs, "doc_id", "text", corpusSigs, 2)))
  }

  test("signatureMatches64IncrementalBandedGuarded: row-identical to the session-built guard") {
    // the published-artifact guard must emit EXACTLY the rows of
    // signatureMatches64IncrementalGuarded when fed bandRows64(corpus)
    // — representative cross edges, stars, combined-occupancy near
    // pruning — across flood, near-pair, and fresh-image cases
    val corpus = ((0L until 20L by 2L).map(_ -> 0L) ++
      Seq(50L -> 0x1111222233334444L)).toDF("id", "sig")
    val batch = ((1L until 20L by 2L).map(_ -> 0L) ++
      Seq(61L -> (0x1111222233334444L ^ 2L),
        63L -> 0x7777000011110000L)).toDF("id", "sig")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("hamming"))).toSet
    for (cap <- Seq(6, 64)) {
      val banded = Dedup.signatureMatches64IncrementalBandedGuarded(
        batch, "id", "sig", Dedup.bandRows64(corpus, "id", "sig"),
        "id", "sig", maxHamming = 2, maxOccupancy = cap)
      val ref = Dedup.signatureMatches64IncrementalGuarded(
        batch, "id", "sig", corpus, "id", "sig",
        maxHamming = 2, maxOccupancy = cap)
      assert(rows(banded) === rows(ref), s"cap=$cap")
    }
    // flood shape sanity at cap=6: one representative cross edge per
    // batch copy, stars within, the near pair through clear bands
    val got = rows(Dedup.signatureMatches64IncrementalBandedGuarded(
      batch, "id", "sig", Dedup.bandRows64(corpus, "id", "sig"),
      "id", "sig", maxHamming = 2, maxOccupancy = 6))
    val cross = (1L until 20L by 2L).map(j => (0L, j, 0L)).toSet
    val star = (3L until 20L by 2L).map(j => (1L, j, 0L)).toSet
    assert(got === cross ++ star + ((50L, 61L, 1L)))
  }

  test("incremental dedup end-to-end contract on a seeded random corpus") {
    // The documented composition (keepCanonical over the BATCH, old
    // survivors immutable by construction), locked on a generated
    // corpus: after processing increment 2 against increment 1's
    // survivors,
    //   (a) every new doc whose pair-component touches a kept old doc
    //       is dropped — including transitive bridges with no direct
    //       old edge,
    //   (b) among kept new docs, no direct near-dup pair survives,
    //   (c) a new doc with no near-dup among survivors or batch peers
    //       is kept (dedup must not over-drop).
    import graft.operators.Components
    val rnd = new scala.util.Random(424242L)
    val vocab = Vector("data", "spark", "shuffle", "broadcast", "join",
      "parquet", "column", "row", "batch", "stream", "token", "corpus")
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    while (texts.length < 40) {
      val base = (0 until (7 + rnd.nextInt(5)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      texts += base
      if (rnd.nextBoolean() && texts.length < 40) {
        val toks = base.split(" ")
        toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length))
        texts += toks.mkString(" ")
      }
    }
    val all = texts.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val inc1 = all.filter($"doc_id" < 20)
    val inc2 = all.filter($"doc_id" >= 20)
    // increment 1: full dedup among itself
    val kept1 = Components.keepCanonical(inc1, "doc_id",
      Dedup.simhashMatchesWide(inc1, "doc_id", "text", maxHamming = 3))
    val kept1Ids = kept1.select("doc_id").as[Long].collect().toSet
    // increment 2: match against increment 1's SURVIVOR signature
    // table, then keepCanonical over the BATCH only
    val pairs2 = Dedup.simhashMatchesWideIncremental(inc2, "doc_id", "text",
      Dedup.wideSignatures(kept1, "doc_id", "text"), maxHamming = 3)
    val keptNew = Components.keepCanonical(inc2, "doc_id", pairs2)
      .select("doc_id").as[Long].collect().toSet
    // ground truth: components over the SAME pair set, via signatures
    val sigs = all.select($"doc_id",
      TextAnalysis.simHashWide($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    def near(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    val newIds = (20L until texts.length.toLong).toSet
    // brute-force union-find over cross+within edges
    val nodes = (kept1Ids ++ newIds).toSeq.sorted
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for (o <- kept1Ids; n <- newIds if near(o, n)) union(o, n)
    for (a <- newIds; b <- newIds if a < b && near(a, b)) union(a, b)
    val expectedKeptNew = newIds.filter(n => find(n) == n)
    assert(keptNew === expectedKeptNew,
      s"extra=${keptNew -- expectedKeptNew} missing=${expectedKeptNew -- keptNew}")
    // (a) no kept new doc shares a component with a kept old doc
    assert(keptNew.forall(n => !kept1Ids.contains(find(n))))
    // (b) no direct near-dup pair among kept new docs
    for (a <- keptNew; b <- keptNew if a < b)
      assert(!near(a, b), s"kept new docs $a and $b are direct near-dups")
    // (c) sanity against over-dropping: isolated new docs survive
    val isolated = newIds.filter(n =>
      !kept1Ids.exists(o => near(o, n)) && !newIds.exists(m => m != n && near(m, n)))
    assert(isolated.subsetOf(keptNew))
    assert(isolated.nonEmpty, "seeded corpus produced no isolated docs — regenerate")
  }

  // ----------------------------------------------------------- similarity

  private lazy val vecs: DataFrame = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)), // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (25L, Array(0.5f, 0.5f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(top.length === 2)
    assert(top(0).getAs[Long]("nid") === 1L) // cos ≈ 0.994
    assert(top(1).getAs[Long]("nid") === 25L) // cos ≈ 0.707
    assert(top(0).getAs[Double]("cos") > top(1).getAs[Double]("cos"))
  }

  test("kMeansCentroids converges toward cluster means and improves IVF cells") {
    // two tight clusters around x-axis and y-axis
    val clustered = Seq(
      (0L, Array(1.0f, 0.05f, 0f)), (1L, Array(0.95f, -0.05f, 0f)),
      (2L, Array(1.05f, 0.0f, 0f)), (25L, Array(0.05f, 1.0f, 0f)),
      (26L, Array(-0.05f, 0.95f, 0f)), (27L, Array(0.0f, 1.05f, 0f))
    ).toDF("vec_id", "embedding")
    val init = Similarity.strideCentroids(clustered, "vec_id", "embedding", 25)
    val trained = Similarity.kMeansCentroids(clustered, "vec_id", "embedding", init, 3)
    assert(trained.count() === 2)
    val cells = Similarity.ivfAssign(clustered, "vec_id", "embedding", trained)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cell")).toMap
    // both clusters intact: members share a cell, clusters differ
    assert(cells(0L) === cells(1L) && cells(1L) === cells(2L))
    assert(cells(25L) === cells(26L) && cells(26L) === cells(27L))
    assert(cells(0L) !== cells(25L))
    // trained centroid ≈ cluster mean
    val c = trained.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val xCell = cells(0L)
    assert(math.abs(c(xCell)(0) - 1.0f) < 0.05f)
    assert(math.abs(c(xCell)(1)) < 0.05f)
  }

  test("ivfTopK with full probe coverage equals brute force") {
    val centroids = Similarity.strideCentroids(vecs, "vec_id", "embedding", 25)
    // 2 centroids (ids 0, 25); probing both cells = exact search.
    val ivf = Similarity.ivfTopK(vecs.filter($"vec_id" === 2), vecs, centroids,
      "vec_id", "embedding", k = 3, nProbe = 2)
      .select("rank", "nid").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 2), vecs,
      "vec_id", "embedding", k = 3)
      .select("rank", "nid").as[(Long, Long)].collect().toSet
    assert(ivf === bf)
  }

  // ----------------------------------------------------------- multimodal

  test("multimodal: binary payload metadata + partition-batched features") {
    val media = Multimodal.attachBinary(docs, "doc_id", "text")
    val m0 = media.filter($"doc_id" === 0).collect()(0)
    assert(m0.getAs[String]("kind") === "text/plain")
    val meta = m0.getStruct(m0.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") === 43L)
    assert(meta.getAs[String]("checksum").length === 32)

    val feats = Multimodal.docFeatures(docs, "doc_id", "text")
    val f0 = feats.filter($"doc_id" === 0).collect()(0)
    assert(f0.getAs[Long]("n_bytes") === 43L)
    assert(f0.getAs[String]("checksum") === meta.getAs[String]("checksum"))
    val hist = f0.getSeq[Double](f0.fieldIndex("features"))
    assert(hist.length === 8)
    assert(math.abs(hist.sum - 1.0) < 1e-9) // normalized histogram
    // deterministic: same payload → same features
    val f3 = feats.filter($"doc_id" === 3).collect()(0)
    assert(f3.getSeq[Double](f3.fieldIndex("features")) === hist)
  }

  test("multimodal: REAL resize box-averages decoded pixels; REAL frame sampling decodes every k-th AVI frame") {
    // resize: a 2×2 downscale of a constructed grayscale PNG must equal
    // the hand-computed floor-average of each pixel quadrant
    val s = 6L // width(6)=15, height(6)=14 (PixelFixtures arithmetic)
    val png = graft.queries.PixelFixtures.pngGray(s)
    val w = graft.queries.PixelFixtures.width(s)
    val h = graft.queries.PixelFixtures.height(s)
    val grid = Multimodal.resizeImage(png, 2, 2).get
    assert(grid.length === 4)
    def lum(x: Int, y: Int): Long =
      1000L * (((x + s % 31) * (y + s % 37) * 3 + s) % 256)
    for (cy <- 0 until 2; cx <- 0 until 2) {
      val pts = for {
        y <- 0 until h if 2 * y / h == cy
        x <- 0 until w if 2 * x / w == cx
      } yield lum(x, y)
      assert(grid(cy * 2 + cx) === pts.sum / pts.length)
    }
    // upscale / non-image → None, never invented samples
    assert(Multimodal.resizeImage(png, w + 1, 2).isEmpty)
    assert(Multimodal.resizeImage("not an image".getBytes, 2, 2).isEmpty)

    // frame sampling: a 5-frame DIB AVI at stride 2 yields frames 0/2/4
    // whose stats equal the still-image kernel's on identical pixels
    val avi = graft.queries.VideoFixtures.avi(5L)
    val media = Seq(Multimodal.MediaRecord(5L, "video/avi", avi))
      .toDS()
    val frames = Multimodal.sampleFrames(media, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq ===
      (0 until graft.queries.VideoFixtures.aviFrames(5L) by 2)
        .map(_.toLong))
    // cross-check frame 0 against the SHARED stats definition via a
    // same-pixels BMP (frame f=0 pixel formula with s=5)
    val fs0 = frames.head
    assert(fs0.dhash.isDefined) // 17×11 ≥ the 9×8 grid
    assert(fs0.lum_sum > 0L && fs0.lum_sq_sum >= fs0.lum_sum)
    // non-video payloads produce NO frame rows
    val none = Multimodal.sampleFrames(
      Seq(Multimodal.MediaRecord(1L, "text/plain",
        "plain bytes".getBytes)).toDS(), stride = 2).collect()
    assert(none.isEmpty)
  }

  test("repetition metrics: duplicate lines and most-repeated bigram") {
    val df = Seq(
      (1L, "a b\na b\nc d"),          // dup line; bigrams: "a b","b a","a b","b c","c d"
      (2L, "x y x y x y"),            // "x y"×3, "y x"×2
      (3L, "solo"),                   // no bigrams
      (4L, "")                        // empty
    ).toDF("doc_id", "text")
    val r = df.select($"doc_id",
      TextAnalysis.dupLineCount($"text").as("dl"),
      TextAnalysis.maxNgramRepeat($"text", 2).as("top"))
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 1 && r(0).getLong(2) === 2)
    assert(r(1).getLong(1) === 0 && r(1).getLong(2) === 3)
    assert(r(2).getLong(2) === 0)
    assert(r(3).getLong(1) === 0 && r(3).getLong(2) === 0)
  }

  test("PII counts: emails, IPv4, long digit runs") {
    val df = Seq(
      (1L, "mail a.b%c@ex-ample.co.uk and x@y.io; ip 10.0.0.1, id 123456789012"),
      (2L, "no pii here"),
      (3L, "dots 1.2.3.4.5 short@x.a 12345678")  // 1 ipv4 (greedy leftmost), no email (1-char TLD), digits<9
    ).toDF("doc_id", "text")
    val r = df.select($"doc_id",
      TextAnalysis.emailCount($"text").as("e"),
      TextAnalysis.ipv4Count($"text").as("i"),
      TextAnalysis.longDigitCount($"text").as("d"))
      .orderBy("doc_id").collect()
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) === ((2L, 1L, 1L)))
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) === ((0L, 0L, 0L)))
    assert((r(2).getLong(1), r(2).getLong(2), r(2).getLong(3)) === ((0L, 1L, 0L)))
  }
}
