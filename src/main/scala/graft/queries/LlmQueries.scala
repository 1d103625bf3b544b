package graft.queries

import graft.operators.{Dedup, ExactQuantiles, InvertedIndex, LineDedup, Multimodal, Packing, Quantization, Sampling, Similarity, TextAnalysis, TfIdf, TopK}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline queries: dedup (exact / n-gram Jaccard / MinHash-LSH /
  * SimHash / embedding), similarity search (brute-force + IVF), text
  * analysis, and multimodal metadata — each driver-verified against a
  * DuckDB oracle.
  *
  * Oracle strategy per algorithm class:
  *   - exact operators (exact dedup, n-gram Jaccard, brute-force top-k,
  *     text stats): the oracle recomputes the same exact answer in SQL;
  *   - MinHash-LSH: the oracle is the EXACT all-pairs Jaccard answer — the
  *     engine's banded-LSH candidates + exact verification must therefore
  *     achieve total recall on the qualifying pairs (8 bands × 6 rows at
  *     the planted J≈0.99 pairs: miss probability ≈ 6e-10);
  *   - SimHash / IVF: deterministic approximations whose oracle reproduces
  *     the SAME algorithm via portable arithmetic (polynomial hashes, list
  *     folds), so approximate results are still hash-checkable.
  */
object LlmQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The doc-id spine for payload-EXPANSION queries (fixture
    * construct → kernel decode), spread across the session's default
    * parallelism BEFORE the expensive stage. Scan splits are
    * input-byte-proportional, and an id projection of the documents
    * table is sub-MB — one split — so without this the whole
    * construct+decode tier runs in ONE task on a 32-core machine
    * (measured: q360 wall ≈ its single-task CPU time). The exchange
    * moves 8-byte ids — the cheapest possible shuffle (guide §8:
    * distribute by the WORK, not the input layout). The partition
    * count is pinned to defaultParallelism (cores locally, cluster
    * width on a deployment — scale-adaptive, not a constant) because
    * AQE's size-based coalescing prices the 8-byte input rows, not
    * the ~100 KB/row expansion, and would re-serialize the stage.
    */
  private def spreadIds(docs: DataFrame): DataFrame =
    docs.select(col("doc_id")).repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  /** Adaptive scan-parallelism floor for CPU-heavy text stages
    * (tokenization, hashing, BPE pre-splits): when the source scan
    * yields fewer partitions than the session's parallelism (a sub-MB
    * single-row-group parquet file is ONE split, so the per-row work
    * of every downstream expression runs serially), rebalance by id
    * across defaultParallelism; when the source already provides
    * enough splits (any real deployment), this is a NO-OP — no
    * exchange is added at 100-TB layouts, where shuffling text bytes
    * pre-tokenization would be exactly the wrong trade (guide §2.3).
    */
  private def spreadDocs(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p, col(idCol))
  }

  private def queriesSubset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").filter(col("vec_id") < 20)

  /** q39 sign-LSH shape: 16 planes, 4-bit bands (seed 42 — lshTopK's
    * default). Small on purpose: the plane matrix rides in the oracle SQL
    * as literals.
    */
  private val LshPlanes = 16
  private val LshBandBits = 4

  private def strideCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.strideCentroids(t(s, dir, "embeddings"), "vec_id", "embedding", 25)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup stats per source (hash-groupBy dedup shape).
    "q22_dedup_exact" -> ((s, dir) => {
      Dedup.exactStats(t(s, dir, "documents"), col("text"), col("source"))
        .orderBy("source")
    }),

    // Exact bigram-Jaccard near-dup pairs via inverted-index join.
    "q23_dedup_ngram" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 2, threshold = 0.6).orderBy("i", "j")
    }),

    // Asymmetric n-gram CONTAINMENT pairs (quote/excerpt detection):
    // |S_i∩S_j|/|S_i| >= 0.8 — the directional near-subset relation a
    // symmetric Jaccard threshold cannot see. Probe prefixes against a
    // full inverted index; exact verification on the cached sets.
    "q126_containment" -> ((s, dir) => {
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 2, threshold = 0.8).orderBy("i", "j")
    }),

    // MinHash-LSH candidates + exact-Jaccard verification (trigrams).
    // 8 bands × 6 rows: near-dup pairs (J≈0.99 here) collide w.p.
    // 1-(1-0.99^6)^8 ≈ 1-6e-10 while background pairs (J<0.1 on this
    // corpus) almost never do — band selectivity keeps the candidate set
    // linear-ish, and 48 hash exprs keep the signature aggregate's
    // generated code compact (codegen compile time grows with agg width).
    // With a corpus whose pair similarities crowd the threshold, widen
    // recall with more/shorter bands at the cost of more candidates.
    "q24_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5, numHashes = 48, bandRows = 6).orderBy("i", "j")
    }),

    // SimHash banding (portable simhash, 4 equal bit-bands).
    "q25_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(spreadDocs(t(s, dir, "documents")), "doc_id", "text",
        maxHamming = 2).orderBy("i", "j")
    }),

    // Wide (56-bit) SimHash banding — the scale configuration: 14-bit
    // bands (16,384 values each) where the 28-bit signature's 7-bit
    // bands (128 values) go quadratic per bucket at corpus scale. Total
    // recall for hamming <= 3 holds identically, so the oracle is again
    // brute-force all-pairs Hamming over the (two-multiplier) signature.
    "q69_dedup_simhash_wide" -> ((s, dir) => {
      Dedup.simhashPairsWide(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 2).orderBy("i", "j")
    }),

    // Text quality metrics (token counts, subword counts, ratios, score).
    "q26_text_quality" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subtokens"),
        TextAnalysis.punctCount(col("text")).as("punct_cnt"),
        TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // Language-ID heuristic vs the labeled lang: confusion counts.
    "q27_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "predicted")
    }),

    // Document fingerprints: portable rolling hash + simhash.
    "q28_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.simHash(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),

    // Brute-force cosine top-5 for the 20-vector query set.
    "q29_embed_topk" -> ((s, dir) => {
      Similarity.bruteForceTopK(queriesSubset(s, dir), t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 5).orderBy("qid", "rank")
    }),

    // IVF top-5 (20 stride centroids, nProbe=5) — the ANN scale path.
    "q30_embed_ann_ivf" -> ((s, dir) => {
      Similarity.ivfTopK(queriesSubset(s, dir), t(s, dir, "embeddings"),
        strideCentroids(s, dir), "vec_id", "embedding", k = 5, nProbe = 5)
        .orderBy("qid", "rank")
    }),

    // Sign-LSH (hyperplane) top-5 — the LSH-bucketed ANN alternative.
    // 16 seeded ±1 hyperplanes in 4 bands × 4 bits; the oracle re-derives
    // the SAME banded candidates from the same plane literals (±1 dot
    // products are exact in both engines), then the same exact rerank.
    "q39_embed_ann_lsh" -> ((s, dir) => {
      Similarity.lshTopK(queriesSubset(s, dir), t(s, dir, "embeddings"),
        "vec_id", "embedding", dim = 64, k = 5,
        numPlanes = LshPlanes, bandBits = LshBandBits)
        .orderBy("qid", "rank")
    }),

    // Embedding near-dup pairs within IVF cells.
    "q31_embed_dup" -> ((s, dir) => {
      Dedup.embeddingDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        strideCentroids(s, dir), threshold = 0.3).orderBy("i", "j")
    }),

    // Corpus token frequencies: explode tokens → count → top-k.
    "q33_token_freq" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("token")).limit(50)
    }),

    // Multimodal payload META table over a MIXED corpus (round-14
    // oracle-depth upgrade; binary-attach plumbing stays unit-covered
    // in OperatorsSpec): even docs carry their TEXT as the payload
    // (kind text/plain, content-addressed md5 the oracle recomputes),
    // odd docs carry a constructed IMAGE (kind rewritten from the REAL
    // pixel decode, plus pixel-derived n_pixels and dHash the oracle
    // re-derives arithmetically). Truncated image payloads (%10==7 —
    // all odd) keep their opaque kind with NULL everywhere but size.
    "q32_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          if (id % 2 == 0) Multimodal.MediaRecord(id, "text/plain",
            Option(text).getOrElse("").getBytes("UTF-8"))
          else Multimodal.MediaRecord(id, "application/octet-stream",
            PixelFixtures.payload(id))
        }).toDF()
      media.withColumn("__s", graft.functions.pixelStats(col("content")))
        .select(col("doc_id"),
          coalesce(concat(lit("image/"), col("__s.format")), col("kind"))
            .as("kind"),
          length(col("content")).cast("long").as("n_bytes"),
          when(col("kind") === "text/plain", md5(col("content")))
            .as("checksum"),
          col("__s.n_pixels").as("n_pixels"),
          col("__s.dhash").as("dhash"))
        .orderBy("doc_id")
    }),

    // int8 embedding quantization: per-vector scale, codes, exact MSE.
    // max_abs and the code array are materialized ONCE as columns; every
    // consumer (elements, mse) references the attribute instead of
    // re-running the array folds per use.
    "q34_embed_quantize" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .withColumn("max_abs", Quantization.maxAbs(col("embedding")))
        .withColumn("__q", Quantization.quantizeScaled(col("embedding"), col("max_abs")))
        .select(
          col("vec_id"),
          col("max_abs"),
          element_at(col("__q"), 1).as("q1"),
          element_at(col("__q"), 2).as("q2"),
          element_at(col("__q"), 3).as("q3"),
          Quantization.quantizationMseScaled(col("embedding"), col("max_abs"),
            col("__q")).as("mse"))
        .orderBy("vec_id")
    }),

    // One Lloyd's k-means iteration over the embeddings (train centroids,
    // reassign, count cells) — the oracle replicates the full iteration in
    // SQL including the float rounding of the updated centroids.
    "q37_kmeans_cells" -> ((s, dir) => {
      val corpus = t(s, dir, "embeddings")
      val trained = Similarity.kMeansCentroids(corpus, "vec_id", "embedding",
        strideCentroids(s, dir), iterations = 1)
      Similarity.ivfAssign(corpus, "vec_id", "embedding", trained)
        .groupBy("cell").agg(count(lit(1)).as("cnt"))
        .orderBy("cell")
    }),

    // Deterministic stratified sample: exact per-language fractions,
    // reproducible (hash-ordered, no rand()).
    "q35_stratified_sample" -> ((s, dir) => {
      Sampling.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id", 0.2)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    }),

    // Exact dedup for LARGE payloads: only (id, digest) rides the dedup
    // shuffle, payloads join back by id — the 100 TB exact-dedup path.
    "q40_dedup_digest" -> ((s, dir) => {
      Dedup.exactDedupByDigest(t(s, dir, "documents"), "text", "doc_id")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Multimodal mapPartitions feature extraction — REAL pixel decode
    // as of round 14 (the q290/q333 oracle-depth direction): the
    // partition-batched pass decodes each constructed PNG/BMP payload
    // through the native kernel and emits PIXEL-derived columns — pixel
    // count and the 8-bucket LUMINANCE histogram — that the oracle
    // re-derives from the fixture's pixel arithmetic without touching a
    // byte. Truncated payloads (%10==7) keep their original kind with
    // NULL pixel fields (quarantine).
    "q41_multimodal_features" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => Multimodal.MediaRecord(
          id, "application/octet-stream", PixelFixtures.payload(id))))
      val cols = Seq(col("doc_id"), col("kind"), col("n_bytes"),
        col("n_pixels")) ++
        (0 until 8).map(i => element_at(col("lum_hist"), i + 1).as(s"h$i"))
      Multimodal.pixelFeatures(media).toDF()
        .select(cols: _*).orderBy("doc_id")
    }),

    // Repetition metrics (Gopher-style quality rule): duplicate lines +
    // most-repeated-bigram ratio, all per-row narrow projections.
    "q42_repetition" -> ((s, dir) => {
      // Every metric is computed ONCE as a materialized column and
      // referenced by attribute. In particular n_bigrams is token-count
      // ARITHMETIC (greatest(|tokens|-1, 0) — qualityGate's __nb
      // pattern and the oracle's own formula), never size(shingles):
      // building the string-bigram array through the interpreted HOF
      // chain just to take its length was ~6s of this query's 7s at
      // sf0.1 under the materializing bench action (three size(bi)
      // references, each an interpreted shingle pass per row).
      t(s, dir, "documents")
        .withColumn("top_bigram_cnt", TextAnalysis.maxNgramRepeat(col("text"), 2))
        .withColumn("__lines", TextAnalysis.docLines(col("text")))
        .withColumn("n_bigrams",
          greatest(size(TextAnalysis.tokens(col("text"))) - 1, lit(0))
            .cast("long"))
        .select(
          col("doc_id"),
          size(col("__lines")).cast("long").as("n_lines"),
          (size(col("__lines")) - size(array_distinct(col("__lines"))))
            .cast("long").as("n_dup_lines"),
          col("n_bigrams"),
          col("top_bigram_cnt"),
          when(col("n_bigrams") > 0,
            col("top_bigram_cnt").cast("double") / col("n_bigrams"))
            .as("rep_ratio"))
        .orderBy("doc_id")
    }),

    // PII-ish pattern counts (emails / IPv4 / long digit runs) — the
    // pre-training scrub pass, regexes held to the Java∩RE2 subset.
    "q43_pii_scan" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.emailCount(col("text")).as("n_emails"),
        TextAnalysis.ipv4Count(col("text")).as("n_ipv4"),
        TextAnalysis.longDigitCount(col("text")).as("n_long_digits"))
        .orderBy("doc_id")
    }),

    // KMV bottom-k distinct sketch per source (bounded-state custom
    // aggregate over the portable hash) vs the exact distinct count —
    // estimate AND sketch content are oracle-checked.
    "q46_kmv_sketch" -> ((s, dir) => {
      val k = 32
      t(s, dir, "documents")
        .select(col("source"), TextAnalysis.fingerprint(col("text")).as("__h"))
        .groupBy("source")
        .agg(graft.operators.Sketch.bottomKHashes(col("__h"), k).as("__sk"),
          countDistinct(col("__h")).as("n_distinct_hash"))
        .select(col("source"), col("n_distinct_hash"),
          size(col("__sk")).cast("long").as("sk_size"),
          when(size(col("__sk")) >= k, element_at(col("__sk"), k)).as("h_k"),
          graft.operators.Sketch.kmvDistinctEstimate(col("__sk"), k,
            TextAnalysis.HashMod).as("est"))
        .orderBy("source")
    }),

    // Near-dup PAIRS → dedup CLUSTERS: connected components (min-label
    // propagation + pointer jumping) over the SimHash pair graph; every
    // doc labeled with its cluster id, cluster size, and whether it is
    // the canonical (min-id) survivor a dedup pass keeps.
    "q47_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // simhashMatches, not simhashPairs: CC's min-aggregate absorbs the
      // per-band duplicate edges, so the pair-distinct shuffle is skipped.
      val pairs = Dedup.simhashMatches(docs, "doc_id", "text", maxHamming = 2)
      graft.operators.Components.dedupClusters(docs, "doc_id", pairs)
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: trigram-shingle overlap of every corpus
    // doc against a (broadcast) benchmark slice — corpus never shuffles.
    "q48_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 50 === 0)
      graft.operators.Decontaminate.benchmarkOverlap(
        docs, "doc_id", "text", bench, "doc_id", "text",
        n = 3, threshold = 0.5)
        .orderBy("doc_id")
    }),

    // Corpus-wide duplicate-line removal (CCNet-style), keep-first,
    // reassembled per doc. The synthetic docs are single-line, so tokens
    // are re-delimited to lines — which makes every repeated WORD a hot
    // dedup key and stresses exactly the map-side-combine skew path.
    "q49_line_dedup" -> ((s, dir) => {
      val lined = t(s, dir, "documents")
        .select(col("doc_id"), translate(col("text"), " ", "\n").as("text"))
      LineDedup.dedupLines(lined, "doc_id", "text").orderBy("doc_id")
    }),

    // Training-mixture sampling: per-language fractions, deterministic
    // and exact per stratum (scale-safe histogram plan, like q35).
    "q50_mixture_sample" -> ((s, dir) => {
      Sampling.mixtureSample(t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.1), defaultFraction = 0.05)
        .select("doc_id", "lang").orderBy("lang", "doc_id")
    }),

    // Sequence packing: token offsets + context-window shard ids over 8
    // independent concatenated streams.
    "q51_token_shards" -> ((s, dir) => {
      val sized = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Packing.tokenShards(sized, "doc_id", "n_tokens",
        contextLen = 2048, streams = 8).orderBy("doc_id")
    }),

    // Per-group top-k curation (two-phase salted rank — no whole-group
    // single-task sort), longest 5 docs per language.
    "q52_topk_per_group" -> ((s, dir) => {
      val scored = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      TopK.topKPerGroup(scored, "lang", "n_tokens", "doc_id", k = 5, salts = 8)
        .orderBy("lang", "rank")
    }),

    // TF-IDF keyword extraction: top-3 terms per doc by the rational-idf
    // weight (log-free so scores are bit-portable across engines).
    "q53_tfidf" -> ((s, dir) => {
      // broadcastVocab: the distinct vocabulary is orders of magnitude
      // smaller than the (doc, term) rows (Heaps' law), so the df stats
      // broadcast and the dominant side never shuffles for the join-back
      TfIdf.termWeights(t(s, dir, "documents"), "doc_id", "text",
        broadcastVocab = true)
        .filter(col("rank") <= 3).orderBy("doc_id", "rank")
    }),

    // BM25 (rational-idf variant — log-free so scores hash-match across
    // engines; see TfIdf.bm25). Length-saturated term weighting is the
    // production retrieval scorer; top-3 terms per doc like q53.
    "q72_bm25" -> ((s, dir) => {
      TfIdf.bm25(spreadDocs(t(s, dir, "documents")), "doc_id", "text",
        broadcastVocab = true)
        .filter(col("rank") <= 3).orderBy("doc_id", "rank")
    }),

    // Inverted index: per-term df / total tf / bounded posting list
    // (TopK-composed prefix — no unbounded collect per term).
    "q54_posting_lists" -> ((s, dir) => {
      InvertedIndex.postingLists(t(s, dir, "documents"), "doc_id", "text",
        maxPostings = 10).orderBy("term")
    }),

    // Exact per-language median doc length via the histogram-cumulate
    // plan — no per-group row sort.
    "q55_group_median" -> ((s, dir) => {
      ExactQuantiles.medianByGroup(t(s, dir, "documents"), "lang", "n_chars")
        .orderBy("lang")
    }),

    // Fixed-width length histogram (250-char buckets, clamped overflow
    // bucket): the profiling pass before choosing length filters.
    "q59_histogram" -> ((s, dir) => {
      graft.operators.Profiling.histogram(t(s, dir, "documents"),
        col("n_chars"), width = 250, maxBucket = 15).orderBy("bucket")
    }),

    // Seeded ±1 random projection (Johnson–Lindenstrauss) 64→16 dims:
    // map-only, sign matrix as plan literals, bit-exact double fold.
    "q127_random_projection" -> ((s, dir) => {
      // Exploded to (vec_id, dim, proj) scalar rows — the driver's
      // pandas checker cannot sort an ARRAY<DOUBLE> column (round-9
      // burn); the per-coordinate rows carry the identical values.
      graft.operators.Projection.randomProject(t(s, dir, "embeddings"),
        "embedding", dOut = 16, seed = 7L, dIn = 64)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "proj")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"), col("proj"))
        .orderBy("vec_id", "dim")
    }),

    // Recall@5 of brute-force top-k IN PROJECTED SPACE (q127's 16-dim
    // signs) vs the exact 64-dim baseline — measures what the 4× scoring
    // speedup costs, the q60/q85 harness pattern. On this near-isotropic
    // synthetic corpus the measured recall is LOW (~0.15 mean): JL
    // preserves distances, not the razor-thin cosine margins of uniform
    // random vectors — exactly the corpus property the harness exists to
    // expose before anyone ships a projection dim.
    "q128_projection_recall" -> ((s, dir) => {
      val exact = Similarity.bruteForceTopK(queriesSubset(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 5)
      val approx = graft.operators.Projection.projectedTopK(
        queriesSubset(s, dir), t(s, dir, "embeddings"), "vec_id",
        "embedding", dOut = 16, seed = 7L, dIn = 64, k = 5)
      Similarity.recallAtK(exact, approx, "qid", "nid", k = 5).orderBy("qid")
    }),

    // Winnowing (MOSS) fingerprints: per-doc windowed min-hash selection
    // over the positional 3-gram hash sequence, rightmost tie-break —
    // the ~w/2×-smaller near-dup index with the coverage guarantee.
    "q129_winnow_fingerprints" -> ((s, dir) => {
      graft.operators.Winnow.fingerprints(
        t(s, dir, "documents"), "doc_id", "text", n = 3, w = 8)
        .orderBy("doc_id", "pos")
    }),

    // Winnow-indexed near-dup pairs: candidates share a selected
    // fingerprint (the ~w/2×-smaller index of q129), stop-fingerprints
    // df-capped, exact-Jaccard verified — the long-quote detector.
    "q135_winnow_pairs" -> ((s, dir) => {
      graft.operators.Dedup.winnowPairs(
        t(s, dir, "documents"), "doc_id", "text",
        n = 3, w = 8, threshold = 0.5, maxDf = 100)
        .orderBy("i", "j")
    }),

    // Sorted-neighborhood blocking (merge/purge): rank by 32-char text
    // prefix via the histogram-offset global ordinal, pair within 8
    // ranks through the adjacent-block join, exact-Jaccard verify.
    "q130_sorted_neighborhood" -> ((s, dir) => {
      graft.operators.Dedup.sortedNeighborhoodPairs(
        t(s, dir, "documents"), "doc_id", "text",
        w = 8, n = 2, threshold = 0.6)
        .orderBy("i", "j")
    }),

    // ANN evaluation: recall@5 of the IVF path (q30) against the exact
    // brute-force baseline (q29), per query.
    "q60_ann_recall" -> ((s, dir) => {
      val exact = Similarity.bruteForceTopK(queriesSubset(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 5)
      val approx = Similarity.ivfTopK(queriesSubset(s, dir),
        t(s, dir, "embeddings"), strideCentroids(s, dir),
        "vec_id", "embedding", k = 5, nProbe = 5)
      Similarity.recallAtK(exact, approx, "qid", "nid", k = 5).orderBy("qid")
    }),

    // Context-window chunking: 500-char chunks with 100-char overlap;
    // rows carry offsets + md5 so chunk identity shuffles, not payload.
    "q62_chunking" -> ((s, dir) => {
      graft.operators.Chunking.fixedChunks(t(s, dir, "documents"),
        "doc_id", "text", size = 500, overlap = 100)
        .orderBy("doc_id", "chunk_idx")
    }),

    // End-to-end corpus dedup: SimHash pairs → connected components →
    // keep the canonical (min-id) doc per cluster, one anti-join.
    "q63_dedup_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhashMatches(docs, "doc_id", "text", maxHamming = 2)
      graft.operators.Components.keepCanonical(docs, "doc_id", pairs)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // q63 on the SCALE configuration: wide (56-bit) simhash pairs →
    // connected components → canonical survivors. Same pipeline a
    // 100 TB run would execute — the wide bands keep candidate buckets
    // sub-quadratic (SHUFFLE_AUDIT.md: 24× less candidate traffic than
    // the 28-bit demo on the same corpus).
    "q70_dedup_corpus_wide" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhashMatchesWide(docs, "doc_id", "text", maxHamming = 2)
      graft.operators.Components.keepCanonical(docs, "doc_id", pairs)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Incremental dedup — the production increment shape: an arriving
    // batch (doc_id % 7 = 0 here) matched against the EXISTING corpus
    // via its persisted signature table plus within itself, without
    // re-pairing the corpus. Cross pairs orient (existing, new) so the
    // min-id canonical stays the already-kept corpus doc.
    "q71_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val existing = Dedup.wideSignatures(
        docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text")
      Dedup.simhashPairsWideIncremental(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text",
        existing, maxHamming = 2)
        .orderBy("i", "j")
    }),

    // Exact per-language winsorization of doc lengths at [10%, 90%] —
    // integer-exact rational quantiles via the histogram-cumulate plan.
    "q64_winsorize" -> ((s, dir) => {
      graft.operators.ExactQuantiles.winsorizeByGroup(
        t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "lang", "n_chars", loNum = 1, hiNum = 9, den = 10)
        .select("doc_id", "lang", "n_chars", "n_chars_clipped")
        .orderBy("doc_id")
    }),

    // Corpus-repeated span coverage (the linear-time exact-substring-dedup
    // proxy): fraction of each doc's tokens covered by trigram windows
    // that occur in >= 2 distinct documents.
    "q65_span_coverage" -> ((s, dir) => {
      graft.operators.Spans.repeatedSpanCoverage(
        t(s, dir, "documents"), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // Order-insensitive table fingerprint (migration verification): the
    // full checksum is an exact Decimal(38,0); the gate projects it
    // modulo 10^15 so both engines emit a plain BIGINT.
    "q67_table_checksum" -> ((s, dir) => {
      graft.operators.Profiling.tableChecksum(t(s, dir, "documents"),
        col("doc_id"), col("lang"), col("source"), col("text"))
        .select(col("n_rows"),
          (col("checksum") % lit(1000000000000000L)).cast("long")
            .as("checksum_mod"))
    }),

    // Corpus profiling rollup over (lang, source) — grouping sets WITHOUT
    // the Expand multiplier: the raw scan is aggregated once at the
    // finest grain, coarser levels re-aggregate that small table
    // (GroupingSets scaladoc). gid carries Spark's grouping_id bit
    // pattern so a rollup NULL is distinguishable from a data NULL.
    "q73_rollup_stats" -> ((s, dir) => {
      graft.operators.GroupingSets.rollup(
        t(s, dir, "documents"), Seq("lang", "source"), "n_chars")
        .orderBy(col("gid"), col("lang").asc_nulls_first,
          col("source").asc_nulls_first)
    }),

    // Per-language length quartiles in ONE histogram pass — exact
    // lower-quantile semantics (no interpolation), one conditional-min
    // per quantile.
    "q74_group_quantiles" -> ((s, dir) => {
      graft.operators.ExactQuantiles.quantilesByGroup(
        t(s, dir, "documents"), "lang", "n_chars",
        Seq(("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4)))
        .orderBy("lang")
    }),

    // Per-language length DECILE assignment for every doc — the
    // curriculum/length-bucketing primitive; tie-stable (equal lengths
    // share a bucket), no per-group row sort, no nondeterministic
    // ntile() row-order splits.
    "q75_length_buckets" -> ((s, dir) => {
      graft.operators.ExactQuantiles.valueNtile(
        t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "lang", "n_chars", k = 10)
        .select("doc_id", "lang", "n_chars", "n_chars_bucket")
        .orderBy("doc_id")
    }),

    // Product-quantization codes (8 blocks × 16 codes over dim 64): the
    // compressed vector-store representation — encode is one fused
    // map-only kernel pass, codebook from the deterministic first-k init
    // so the SQL oracle re-derives every code.
    "q76_pq_codes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = graft.operators.Pq.firstKCodebooks(
        emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
      graft.operators.Pq.encode(emb, "vec_id", "embedding", cb)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("block", "code")))
        .select(col("vec_id"), col("block").cast("long").as("block"), col("code"))
        .orderBy("vec_id", "block")
    }),

    // ADC top-k over the PQ codes: the query's m×k distance table is a
    // plan literal; candidates are scanned as CODES (m longs), never as
    // float vectors. Distances = exact L2² to each vector's
    // reconstruction, bit-identical in the oracle by mirrored fold order.
    "q77_pq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = graft.operators.Pq.firstKCodebooks(
        emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      graft.operators.Pq.adcTopK(emb, "vec_id", "embedding", q, cb, topK = 100)
    }),

    // BPE merge training on the corpus: 8 most-frequent-pair rounds over
    // the distinct-word table — the tokenizer-training step; merge list
    // is cross-engine exact (tie-break + greedy rewrite mirrored).
    "q92_bpe_merges" -> ((s, dir) => {
      graft.operators.Bpe.trainMerges(t(s, dir, "documents"), "text",
        numMerges = 8).orderBy("step")
    }),

    // The learned subword vocabulary after those 8 merges — train +
    // apply, the table a tokenizer ships with.
    "q93_bpe_vocab" -> ((s, dir) => {
      graft.operators.Bpe.subwordVocab(t(s, dir, "documents"), "text",
        numMerges = 8).orderBy(desc("freq"), col("subword"))
    }),

    // Per-doc token counts under that learned tokenizer — the packing
    // budget metric (train once, tokenize by word-key join).
    "q94_bpe_doc_tokens" -> ((s, dir) => {
      graft.operators.Bpe.bpeTokenCount(t(s, dir, "documents"), "doc_id",
        "text", numMerges = 8).orderBy("doc_id")
    }),

    // Deterministic EPOCH SHUFFLE: ordinals + shards in Knuth-hash
    // order — the seed-stable corpus shuffle a training run replays
    // (same manifest on any engine, any partitioning, any retry; no
    // rand()). Same histogram-offset plan as q80: the hash is the sort
    // key, its top bits the histogram bucket, so no global-window
    // funnel — the shuffle of a 100 TB corpus costs a bucket histogram
    // plus per-bucket local sorts.
    "q104_epoch_shuffle" -> ((s, dir) => {
      val h = pmod(pmod(col("doc_id").cast("long"), lit(2147483648L))
        * 2654435761L, lit(4294967296L))
      graft.operators.GlobalIds.shardByOrder(
        t(s, dir, "documents").select("doc_id").withColumn("h", h),
        bucket = expr("h DIV 4194304"), // 1024 buckets over the 2^32 hash space
        order = Seq(col("h"), col("doc_id")),
        shardSize = 64)
        .select("doc_id", "gid", "shard").orderBy("doc_id")
    }),

    // Edit-distance VERIFICATION tier on the wide-SimHash candidates:
    // signature Hamming admits topically-similar docs (same vocabulary,
    // different prose); bounded Levenshtein over the ASCII-folded
    // 160-codepoint window keeps only true near-copies. The window fold
    // is what makes the distance portable (DuckDB's levenshtein counts
    // BYTES, Spark's counts codepoints; they agree on pure ASCII).
    "q112_dedup_edit_verify" -> ((s, dir) => {
      Dedup.editVerifiedPairs(spreadDocs(t(s, dir, "documents")), "doc_id", "text",
        maxHamming = 2, maxEdits = 40, window = 160).orderBy("i", "j")
    }),

    // Deterministic weighted INTERLEAVE (data mixing): one global order
    // where every prefix holds en:de:es:fr at 5:2:2:1 (zh excluded —
    // mixture configs whitelist their sources). Virtual-deadline keys,
    // exact integers, no global or per-source data window (histogram
    // ordinals both times) — consecutive slices of `position` ARE the
    // mixed training batches.
    "q113_weighted_mix" -> ((s, dir) => {
      graft.operators.Mixing.weightedInterleave(
        t(s, dir, "documents"), "lang",
        orderBucket = expr("doc_id DIV 500"), order = Seq(col("doc_id")),
        weights = Map("en" -> 5L, "de" -> 2L, "es" -> 2L, "fr" -> 1L))
        .select(col("position"), col("doc_id"), col("lang"), col("mix_key"))
        .orderBy("position")
    }),

    // HyperLogLog pre-dedup distinct-TEXT cardinality per language
    // (operators/Sketch.scala hllRegisterTable): the third distinct-count
    // path next to exact (q19) and KMV (q46) — 2^b small-int registers
    // per group, mergeable by elementwise max. b=4 keeps this corpus's
    // per-group cardinality above the 2.5·m small-range threshold, so
    // the RAW estimate (the libm-free, oracle-exact one) is the operative
    // regime; registers, zero-count and the exact count ship together,
    // so the gate pins the sketch content bit-for-bit and accuracy is
    // measured, not asserted.
    "q111_hll_distinct" -> ((s, dir) => {
      val items = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("lang"), col("text").as("t"))
      val regs = graft.operators.Sketch.hllRegisterTable(items, "lang", "t", b = 4)
      val exact = items.groupBy("lang").agg(countDistinct(col("t")).as("n_exact"))
      regs.join(exact, "lang")
        // regs ships as a canonical CSV string, not ARRAY<LONG>: the
        // driver's pandas checker cannot sort list columns (round-9
        // burn) — the join still pins the sketch content bit-for-bit.
        .select(col("lang"),
          array_join(col("regs").cast("array<string>"), ",").as("regs_str"),
          expr("CAST(size(filter(regs, r -> r = 0)) AS BIGINT)").as("v_zero"),
          graft.operators.Sketch.hllEstimate("regs", b = 4).as("est"),
          col("n_exact"))
        .orderBy("lang")
    }),

    // Near-dup GRAPH triage: triangle structure of the wide-tier SimHash
    // pair graph (q69's edges) separates cohesive duplicate communities
    // (clique-like — triangles close) from hub/template artifacts (a
    // boilerplate page pairing with everything — wedges without
    // triangles). The role labels use INTEGER comparisons only
    // (2·tri vs wedges), so the gate never rides a float threshold.
    "q107_dup_graph_triage" -> ((s, dir) => {
      val pairs = Dedup.simhashPairsWide(t(s, dir, "documents"),
        "doc_id", "text", maxHamming = 2)
      graft.operators.Triangles.triangleCounts(pairs, "i", "j")
        .withColumn("role",
          when(col("degree") === 1, "leaf")
            .when(col("triangles") === 0, "acyclic")
            .when(col("triangles") * 2 >= col("wedges"), "cohesive")
            .otherwise("mixed"))
        .orderBy("node")
    }),

    // TOKEN-weighted length quantiles per language (q74's weighted
    // sibling): p50 is the length where half the group's TOKEN MASS
    // sits — the statistic a packing/budget plan allocates by, where
    // q74's unweighted p50 answers "half the docs".
    "q103_weighted_quantiles" -> ((s, dir) => {
      graft.operators.ExactQuantiles.weightedQuantilesByGroup(
        t(s, dir, "documents").select(col("lang"), col("n_chars"),
          TextAnalysis.tokenCount(col("text")).as("w")),
        "lang", "n_chars", "w",
        Seq(("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4)))
        .orderBy("lang")
    }),

    // The gate DISTILLED into the linear model (production's fastText
    // recipe: heuristic rules label, a cheap classifier generalizes):
    // weights below were learned by graft.tools.TrainDistill (300
    // iters, lr 1.0, L2 1e-4) against q81's gate labels on the sf0.01
    // documents — deterministic GD, reproducible by re-running it.
    // The gated output is the gate↔classifier confusion matrix: the
    // agreement a curation team actually reviews (98.4% here). One
    // pass: keepInputCols fuses gate metrics and features into the
    // same scan (no self-join), the q84 discipline.
    "q102_gate_distill" -> ((s, dir) => {
      val gated = TextAnalysis.qualityGate(t(s, dir, "documents"),
        "doc_id", "text", keepInputCols = true)
      val feats = gated.select(
        col("doc_id"), col("keep"),
        TextAnalysis.tokenCount(col("text")).cast("double").as("f_tokens"),
        TextAnalysis.punctCount(col("text")).cast("double").as("f_punct"),
        coalesce(TextAnalysis.stopwordRatio(col("text")), lit(0.0)).as("f_stop"),
        TextAnalysis.qualityScore(col("text")).as("f_quality"))
      graft.operators.LinearModel.applyModel(feats,
        Seq("f_tokens", "f_punct", "f_stop", "f_quality"),
        graft.operators.LinearModel.Model(
          Array(0.10338513290120002, 0.0, 2.561121689531541,
            15.712607333411997), -10.389739811106871))
        .groupBy(col("keep").cast("int").as("gate_keep"), col("predicted"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("gate_keep", "predicted")
    }),

    // PII redaction (q43's enforcement half): rewritten text plus the
    // residual scan counts, zero by construction. The driver fixture
    // carries no PII (the gate there checks the identity path byte-for-
    // byte); the fuzz corpus (tools/make_fuzz_documents.py) carries the
    // adversarial emails/IPs/digit-runs that exercise the rewrites.
    "q101_pii_redact" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("redacted", TextAnalysis.piiRedact(col("text")))
        .select(col("doc_id"), col("redacted"),
          TextAnalysis.emailCount(col("redacted")).as("n_emails_after"),
          TextAnalysis.ipv4Count(col("redacted")).as("n_ipv4_after"),
          TextAnalysis.longDigitCount(col("redacted")).as("n_long_digits_after"))
        .orderBy("doc_id")
    }),

    // SemDeDup (Abbas et al.): semantic dedup in EMBEDDING space —
    // cluster-scoped cosine near-dup pairs (q31's candidate shape: the
    // cell equi-join keeps candidates sub-quadratic, no all-pairs) →
    // connected components → keep each cluster's min-id representative.
    // The embedding-side sibling of the q63/q70 text-tier corpus dedup.
    "q100_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = Dedup.embeddingDupPairs(emb, "vec_id", "embedding",
        strideCentroids(s, dir), threshold = 0.3)
      graft.operators.Components.keepCanonical(emb, "vec_id", pairs)
        .select("vec_id").orderBy("vec_id")
    }),

    // Deterministic 80/10/10 train/val/test assignment keyed on doc_id —
    // stable under re-runs and corpus growth (membership is a function
    // of the key alone, never of partitioning or RNG state).
    "q99_hash_split" -> ((s, dir) => {
      Sampling.hashSplit(t(s, dir, "documents").select("doc_id"),
        "doc_id", trainPct = 80, valPct = 10)
        .select("doc_id", "split").orderBy("doc_id")
    }),

    // Model-based quality filtering: a linear classifier over the q26
    // feature set, served via LinearModel.applyModel — the gated output
    // is the LINEAR score z (sigmoid is monotone; exp() is libm-
    // dependent and must not cross a hash gate). Weights are literals
    // here so the serving path is oracle-exact; training is unit-gated
    // (LinearModelSpec) because GD's exp/log can't hash-match.
    "q98_quality_classifier" -> ((s, dir) => {
      val feats = t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("double").as("f_tokens"),
        TextAnalysis.punctCount(col("text")).cast("double").as("f_punct"),
        coalesce(TextAnalysis.stopwordRatio(col("text")), lit(0.0)).as("f_stop"),
        TextAnalysis.qualityScore(col("text")).as("f_quality"))
      graft.operators.LinearModel.applyModel(feats,
        Seq("f_tokens", "f_punct", "f_stop", "f_quality"),
        graft.operators.LinearModel.Model(
          Array(0.02, -0.15, -5.0, 3.0), -3.2))
        .select("doc_id", "z", "predicted").orderBy("doc_id")
    }),

    // Dedup-tier quality MEASURED, not asserted (q85's discipline for
    // the dedup family): wide-simhash recall against the exact J≥0.6
    // bigram-Jaccard ground truth, plus the candidate-volume price.
    "q97_dedup_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exact = graft.operators.CacheScope.track(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.6)
          .select("i", "j"))
      val approx = graft.operators.CacheScope.track(
        Dedup.simhashPairsWide(docs, "doc_id", "text", maxHamming = 3)
          .select("i", "j"))
      val hit = exact.join(approx, Seq("i", "j"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(approx.agg(count(lit(1)).as("n_approx")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_exact"), col("n_approx"), col("n_hit"),
          when(col("n_exact") > 0,
            col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }),

    // Robust (median/MAD) per-language length z-scores — the
    // outlier-immune normalization (q61's mean/stddev sibling drags
    // under the very outliers a quality pass wants to flag).
    "q96_robust_zscore" -> ((s, dir) => {
      graft.operators.Normalize.robustZscoreByGroup(
        t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "lang", "n_chars")
        .select("doc_id", "lang", "n_chars", "median", "mad", "rz")
        .orderBy("doc_id")
    }),

    // The SAMPLING-side composed pipeline (q84's dedup-side sibling):
    // temperature-quota sample → per-doc BPE token counts under the
    // corpus-trained tokenizer → context-window packing of the sampled
    // docs, as one lazy plan — what a mixture-construction run executes.
    "q95_sample_pack_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sampled = Sampling.temperatureQuota(docs, "source", "doc_id",
        totalTarget = 600)
      val counts = graft.operators.Bpe.bpeTokenCount(docs, "doc_id", "text",
        numMerges = 8)
      val sized = sampled.select("doc_id")
        .join(counts.select(col("doc_id"), col("n_bpe_tokens")), "doc_id")
      Packing.tokenShards(sized, "doc_id", "n_bpe_tokens",
        contextLen = 2048, streams = 8).orderBy("doc_id")
    }),

    // Two-stage serving: ADC top-100 shortlist from the codes scan, then
    // exact-L2 rerank of just those 100 vectors → top-10 (the FAISS
    // refine shape; adist kept so the reranking delta is visible).
    "q91_pq_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = graft.operators.Pq.firstKCodebooks(
        emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      graft.operators.Pq.adcRerankTopK(emb, "vec_id", "embedding", q, cb,
        shortlist = 100, topK = 10)
    }),

    // IVF-PQ composed: cosine cell pruning (5 of 20 cells probed) + ADC
    // ranking of only the candidates in probed cells — the production
    // index shape; candidate scan cost ≈ nProbe/|cells| of the corpus.
    "q78_pq_ivf_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = graft.operators.Pq.firstKCodebooks(
        emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      graft.operators.Pq.ivfAdcTopK(emb, "vec_id", "embedding", q,
        strideCentroids(s, dir), cb, nProbe = 5, topK = 50,
        excludeId = Some(0L))
    }),

    // Repeated-span EXCISION (the second half of exact-substring dedup):
    // remove every token position covered by a corpus-repeated trigram,
    // reconstruct cleaned text from the kept tokens.
    "q79_span_removal" -> ((s, dir) => {
      graft.operators.Spans.removeRepeatedSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // Contiguous global ordinals + equal shards in (n_chars, doc_id)
    // order — histogram-offset plan, no global-window funnel; bucket =
    // 250-char ranges of the leading order column (order-aligned by
    // construction).
    "q80_global_ids" -> ((s, dir) => {
      graft.operators.GlobalIds.shardByOrder(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        bucket = expr("n_chars DIV 250"),
        order = Seq(col("n_chars"), col("doc_id")),
        shardSize = 64)
        .select("doc_id", "n_chars", "gid", "shard")
        .orderBy("doc_id")
    }),

    // Composite C4/Gopher-style quality gate: one scan-speed pass emits a
    // per-reason bitmask (0 = keep) so filtering and per-reason drop-rate
    // reporting share the scan.
    "q81_quality_gate" -> ((s, dir) => {
      TextAnalysis.qualityGate(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Distinct-text estimates through the rollup cascade: KMV bottom-k
    // is exactly mergeable where exact distinct is not decomposable, so
    // the grouping-sets profile keeps its one-raw-pass shape even for
    // distinct counts.
    "q83_rollup_distinct" -> ((s, dir) => {
      graft.operators.GroupingSets.rollupDistinctKmv(
        t(s, dir, "documents")
          .select(col("lang"), col("source"),
            TextAnalysis.fingerprint(col("text")).as("__h")),
        Seq("lang", "source"), "__h", k = 32, hashMod = TextAnalysis.HashMod)
        .orderBy(col("gid"), col("lang").asc_nulls_first,
          col("source").asc_nulls_first)
    }),

    // PQ quality measured, not asserted: ADC recall@5 against the exact
    // cosine baseline (q60's harness) — multi-query ADC scans the codes
    // table ONCE for the whole 20-query batch.
    // CUBE profile without Expand: all four (lang, source) grouping sets
    // re-aggregated from the one cached finest-grain table — completes
    // the grouping-sets family's oracle gates (rollup = q73, KMV cascade
    // = q83).
    "q86_cube_stats" -> ((s, dir) => {
      graft.operators.GroupingSets.cube(
        t(s, dir, "documents"), Seq("lang", "source"), "n_chars")
        .orderBy(col("gid"), col("lang").asc_nulls_first,
          col("source").asc_nulls_first)
    }),

    // Corpus n-gram familiarity (perplexity proxy, rational form): mean
    // corpus bigram frequency + OOV-complement per doc — integer
    // sufficient statistics, two final divisions, cross-engine exact.
    "q87_ngram_familiarity" -> ((s, dir) => {
      graft.operators.NgramLm.familiarity(
        t(s, dir, "documents"), "doc_id", "text", n = 2)
        .orderBy("doc_id")
    }),

    // Temperature-weighted (α=1/2) EXACT quota sampling across sources —
    // corpus-derived mixture counts, not caller-supplied rates (q50's
    // mixtureSample is the rate-based sibling).
    "q88_temperature_sample" -> ((s, dir) => {
      Sampling.temperatureQuota(
        t(s, dir, "documents"), "source", "doc_id", totalTarget = 600)
        .select("doc_id", "source").orderBy("source", "doc_id")
    }),

    // Rendezvous (HRW) sharding at two shard counts: the resize
    // demonstration — every doc whose shard8 ≠ shard9 moved to the NEW
    // shard 8, ~1/9 of the corpus, nothing else relocated.
    "q134_rendezvous_shards" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        graft.operators.Layout.rendezvousShard(
          col("doc_id").cast("string"), 8).as("shard8"),
        graft.operators.Layout.rendezvousShard(
          col("doc_id").cast("string"), 9).as("shard9"))
        .orderBy("doc_id")
    }),

    // Theta-sketch set algebra: per-source token-vocabulary KMV
    // sketches (k=32, full at this corpus), then pairwise union /
    // intersection / Jaccard ESTIMATES from the sketches alone — the
    // cross-slice overlap sizing that never joins the corpora.
    "q133_theta_setops" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"),
          explode(graft.functions.tokens(col("text"))).as("tok"))
        .select(col("source"), TextAnalysis.polyHash(col("tok")).as("__h"))
      val sk = toks.groupBy("source")
        .agg(graft.operators.Sketch.bottomKHashes(col("__h"), 32).as("__sk"))
      graft.operators.Sketch.thetaSetOps(sk, "source", "__sk",
        k = 32, hashMod = TextAnalysis.HashMod)
        .orderBy("i", "j")
    }),

    // Distribution-matching resample onto a prescribed language mix
    // (en 40% / four others 15% each): the largest subsample whose
    // proportions follow the target — the tightest stratum binds.
    "q131_match_distribution" -> ((s, dir) => {
      Sampling.matchDistribution(
        t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
            "fr" -> 0.15, "zh" -> 0.15))
        .select("doc_id", "lang").orderBy("lang", "doc_id")
    }),

    // Approximate per-language length quantiles from the bounded
    // deterministic bottom-k-by-hash sample — the unbounded-cardinality
    // quantile path (q74's exact histogram is the bounded-cardinality
    // one); sample and estimates reproduced exactly by the oracle.
    "q89_sampled_quantiles" -> ((s, dir) => {
      graft.operators.Sketch.sampledQuantiles(
        t(s, dir, "documents"), "lang", "n_chars", "doc_id", k = 64,
        Seq(("p50", 1, 2), ("p90", 9, 10)))
        .orderBy("lang")
    }),

    // Count-min frequency estimation: the d×w bounded-state companion to
    // q33's exact |vocab|-sized frequency table — sketch built in one
    // aggregate pass, exact top-20 probed against it (est ≥ exact, both
    // integer-exact and oracle-reproduced).
    "q90_cms_token_freq" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val sketch = graft.operators.Sketch.countMinTable(toks, "token", d = 3, w = 256)
      val top = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(desc("exact_cnt"), col("token")).limit(20)
      graft.operators.Sketch.cmsEstimate(sketch, top, "token", d = 3, w = 256)
        .orderBy(desc("exact_cnt"), col("token"))
    }),

    "q85_pq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = graft.operators.Pq.firstKCodebooks(
        emb, "vec_id", "embedding", m = 8, k = 16, dim = 64)
      val exact = Similarity.bruteForceTopK(queriesSubset(s, dir), emb,
        "vec_id", "embedding", k = 5)
      val qs = queriesSubset(s, dir).select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
      val approx = graft.operators.Pq.adcTopKMulti(
        emb, "vec_id", "embedding", qs, cb, k = 5)
      Similarity.recallAtK(exact, approx, "qid", "nid", k = 5).orderBy("qid")
    }),

    // The whole corpus pipeline as ONE lazy plan: quality gate → wide
    // near-dup dedup over kept docs → canonical survivors → contiguous
    // ordinals + shards. Each stage is an already-gated operator; the
    // composition is what a production run executes.
    "q84_corpus_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // gate and filter in ONE pass (keepInputCols — a verdict join-back
      // would re-run the metric set through a self-join), and cache:
      // `kept` feeds the signature stage, the survivor anti-join, and
      // CC's iterative actions.
      val kept = graft.operators.CacheScope.track(
        TextAnalysis.qualityGate(docs, "doc_id", "text", keepInputCols = true)
          .filter(col("keep")).drop("reasons", "keep"))
      val pairs = Dedup.simhashMatchesWide(kept, "doc_id", "text", maxHamming = 2)
      val surv = graft.operators.Components.keepCanonical(kept, "doc_id", pairs)
      graft.operators.GlobalIds.shardByOrder(
        surv.select("doc_id", "lang", "source", "n_chars"),
        bucket = expr("n_chars DIV 250"),
        order = Seq(col("n_chars"), col("doc_id")),
        shardSize = 64)
        .select("doc_id", "lang", "source", "n_chars", "gid", "shard")
        .orderBy("doc_id")
    }),

    // Hard-negative mining: top-5 most-similar DIFFERENT-label neighbors
    // per query vector — the contrastive-training pair generator.
    "q82_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", "label", k = 5)
        .orderBy("qid", "rank")
    }),

    // Semantic decontamination: the embedding-space sibling of q48 for
    // the leakage n-gram scrubbing misses (paraphrase/translation).
    // Label-9 vectors stand in as the benchmark (broadcast); every other
    // vector gets its max benchmark cosine and a >= 0.35 flag, argmax as
    // a combinable struct-max (no window).
    "q123_semantic_decontaminate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Decontaminate.semanticOverlap(
        emb.filter(col("label") =!= 9), "vec_id", "embedding",
        emb.filter(col("label") === 9), "vec_id", "embedding",
        threshold = 0.35)
        .orderBy("vec_id")
    }),

    // Margin-based bitext mining (CCMatrix/LASER): best-margin label-1
    // partner per label-0 vector, margin = cos over the mean of both
    // sides' top-4 neighborhoods — the hubness-corrected parallel-pair
    // miner. One cached scored pass feeds pairs and both neighborhood
    // aggregates; top-k means fold rank-sorted arrays so the double sums
    // associate identically cross-engine.
    "q122_bitext_margin" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.marginMining(
        emb.filter(col("label") === 0), emb.filter(col("label") === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0)
        .orderBy("sid")
    }),

    // URL canonicalization + registrable domain (web-corpus curation).
    // The corpus has no URL column, so URLs are SYNTHESIZED
    // deterministically from doc_id in BOTH engines (the fixture
    // discipline: fake input, real operator) — six shapes covering
    // fragments, default ports, utm params, uppercase hosts, multi-part
    // public suffixes, and trailing slashes. Domain counts come back via
    // a broadcast join of the tiny domain aggregate, not a window.
    "q117_url_canon" -> ((s, dir) => {
      val synth = t(s, dir, "documents").select(col("doc_id"), expr(
        """CASE doc_id % 6
          |  WHEN 0 THEN concat('https://News.Example.COM/articles/', doc_id)
          |  WHEN 1 THEN concat('https://blog.example.co.uk:443/post?id=', doc_id, '&utm_source=feed')
          |  WHEN 2 THEN concat('http://shop.example.com:80/item/', doc_id, '#reviews')
          |  WHEN 3 THEN concat('https://example.org/?utm_campaign=x&page=', doc_id)
          |  WHEN 4 THEN concat('http://www.data.example.com.au/set/', doc_id, '/')
          |  ELSE concat('https://CDN.example.net/asset/', doc_id, '?v=1#top')
          |END""".stripMargin).as("url"))
      val canon = synth.select(col("doc_id"),
        graft.operators.UrlOps.normalizeUrl(col("url")).as("url_norm"))
        .withColumn("host", graft.operators.UrlOps.host(col("url_norm")))
        .withColumn("domain",
          graft.operators.UrlOps.registrableDomain(col("host")))
      val perDomain = canon.groupBy("domain").agg(count(lit(1)).as("n_domain"))
      canon.join(broadcast(perDomain), "domain")
        .select("doc_id", "url_norm", "host", "domain", "n_domain")
        .orderBy("doc_id")
    }),

    // Boilerplate removal by document frequency (CCNet/C4 pass): lines
    // present in >=40% of documents are removed EVERYWHERE (q49's
    // keep-first sibling keeps first occurrences). Same word->line
    // re-delimiting as q49, so hot stopword lines stress the
    // broadcast-anti-join skew path.
    "q116_boilerplate" -> ((s, dir) => {
      val lined = t(s, dir, "documents")
        .select(col("doc_id"), translate(col("text"), " ", "\n").as("text"))
      LineDedup.removeBoilerplate(lined, "doc_id", "text", num = 2L, denom = 5L)
        .orderBy("doc_id")
    }),

    // Exact heavy hitters with bounded state: Misra-Gries candidates
    // (k=255 counters, superset-guaranteed above 1/256 share) + exact
    // recount of the <=255 candidates — tokens holding >=0.5% of the
    // corpus, never materializing the full token frequency table. The
    // sketch itself is deliberately NOT oracle-gated (its weights are
    // partitioning-dependent); the composition is exact.
    "q115_heavy_hitters" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      graft.operators.HeavyHitters.exactTopShare(
        toks, "token", k = 255, num = 1L, denom = 200L)
    }),

    // Explicit GROUPING SETS — the general form q73/q86 are sugar for:
    // the two marginals WITHOUT the grand total or the finest grain,
    // still one raw-data pass (the cascade re-aggregates the cached
    // finest table; no Expand, no second scan).
    "q114_grouping_sets" -> ((s, dir) => {
      graft.operators.GroupingSets.groupingSets(
        t(s, dir, "documents"), Seq("lang", "source"), "n_chars",
        sets = Seq(Seq("lang"), Seq("source")))
        .orderBy(col("gid"), col("lang").asc_nulls_first,
          col("source").asc_nulls_first)
    }),

    // Hybrid-retrieval RRF fusion: the dense arm (q29's exact cosine,
    // top-10) and a lexical arm (distinct-token overlap, top-10) fused
    // by reciprocal-rank score 1/(60+rank) — the calibration-free hybrid
    // combiner. doc_id and vec_id share the 0..N id space by testdata
    // construction, so the two arms rank the same corpus.
    "q136_rrf_fusion" -> ((s, dir) => {
      val dense = Similarity.bruteForceTopK(
        queriesSubset(s, dir), t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 10)
      val lex = graft.operators.Fusion.tokenOverlapTopK(
        t(s, dir, "documents").filter(col("doc_id") < 20),
        t(s, dir, "documents"), "doc_id", "text", k = 10)
      graft.operators.Fusion.rrf(
        Seq("dense" -> dense, "lex" -> lex), c = 60, topK = 5)
        .orderBy("qid", "rank")
    }),

    // Privacy release gate: k-anonymity / l-diversity audit of the
    // corpus metadata sidecar — QI = (lang, 200-char length bucket),
    // sensitive attribute = source. Groups an attacker could narrow
    // below 5 candidates, or whose source takes < 3 distinct values,
    // fail their flag.
    "q137_k_anonymity" -> ((s, dir) => {
      graft.operators.Privacy.kAnonymityAudit(
        t(s, dir, "documents")
          .withColumn("len_bucket", expr("n_chars DIV 200")),
        Seq("lang", "len_bucket"), "source", k = 5, l = 3)
        .orderBy("lang", "len_bucket")
    }),

    // Priority sampling: 40 docs weighted by n_chars, without
    // replacement, with the unbiased max(w, tau) total estimator — the
    // weighted subset-sum sketch (sample inclusion ∝ size, any slice's
    // character mass estimable from the sample alone).
    "q138_priority_sample" -> ((s, dir) => {
      Sampling.prioritySample(t(s, dir, "documents"), "doc_id", "n_chars",
        k = 40).orderBy("rank")
    }),

    // Compaction planning: pack each source's documents (doc_id order
    // preserved — locality survives the rewrite) into ~4000-char output
    // bins via the one-window running-sum rule; per-bin totals audited
    // by re-aggregation in the same plan.
    "q139_compaction_plan" -> ((s, dir) => {
      val plan = graft.operators.Layout.compactionPlan(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", "doc_id", "n_chars", target = 4000L)
      val binTotals = plan.groupBy("source", "bin")
        .agg(sum("n_chars").as("bin_chars"),
          count(lit(1)).as("bin_docs"))
      plan.join(binTotals, Seq("source", "bin"))
        .select("source", "bin", "bin_pos", "doc_id", "n_chars",
          "bin_chars", "bin_docs")
        .orderBy("source", "bin", "bin_pos")
    }),

    // Distribution drift audit: language-mix total-variation distance
    // between the first corpus half (the blessed reference) and the
    // second (the incoming batch) — ½·Σ|p−q| with an exact DECIMAL
    // numerator. GATE SURFACE IS EXACT-INTEGER ONLY (round-10 fix):
    // r9's hash burned on the double/decimal128 columns despite local
    // value+type exactness, so the gate now emits shares as 2^30
    // fixed point computed with integer division (exact in both
    // engines; counts < 2^33 at gate scale) and the DECIMAL numerator
    // / denominator as strings — tvd itself is num_total/den, float-
    // free here, still a double in the operator's own output.
    "q140_drift_audit" -> ((s, dir) => {
      val d = graft.operators.Profiling.distributionDrift(
        t(s, dir, "documents"), "lang", col("doc_id") < 250)
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val tot = d.agg(sum("n_ref").cast("long").as("__n"),
        sum("n_batch").cast("long").as("__m"),
        sum("tvd_num").cast(d38).as("__numtot"))
      d.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_ref"), col("n_batch"),
          when(col("__n") > 0,
            expr("(n_ref * 1073741824L) DIV __n")).as("share_ref_q30"),
          when(col("__m") > 0,
            expr("(n_batch * 1073741824L) DIV __m")).as("share_batch_q30"),
          col("tvd_num").cast("string").as("tvd_num_str"),
          col("__numtot").cast("string").as("tvd_num_total_str"),
          (lit(2).cast(d38) * col("__n").cast(d38) * col("__m").cast(d38))
            .cast(d38).cast("string").as("tvd_den_str"))
        .orderBy("lang")
    }),

    // Canonical text normalization (NFC + whitespace collapse + control/
    // format strip + trim) — exercised on a synthetically-dirtied prefix
    // (combining acute that NFC must compose, zero-width space and ZWJ
    // that the format-strip must remove, tab/multi-space/VT runs the
    // collapse must fold) so the gate tests the rewrite, not the ASCII
    // no-op.
    "q141_canonical_text" -> ((s, dir) => {
      // "Cafe"+combining-acute (NFC must compose), zero-width space
      // and ZWJ (format-strip must remove), tab/VT/multi-space runs
      // (collapse must fold) -- explicit escapes, mirrored in the
      // oracle literal.
      val dirty = concat(
        lit("Cafe\u0301\u200b  du\tmonde \u000b zw\u200dj: "),
        col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), dirty.as("raw"))
        .select(col("doc_id"),
          TextAnalysis.canonicalize(col("raw")).as("canon"),
          (col("raw") =!= TextAnalysis.canonicalize(col("raw"))).as("changed"))
        .orderBy("doc_id")
    }),

    // Weak supervision: three rule labeling functions (length band,
    // 'the' presence, lexical diversity) -> per-doc majority-vote
    // consensus label with tallies; ties and all-abstain stay NULL
    // (unlabeled).
    "q142_weak_labels" -> ((s, dir) => {
      graft.operators.Supervision.majorityVote(
        weakLfs(t(s, dir, "documents")),
        Seq("lf_len", "lf_the", "lf_div"))
        .orderBy("doc_id")
    }),

    // The LF audit table over the same vote: coverage / agreement /
    // conflict per labeling function vs the q142 consensus — which
    // heuristic to fix first.
    "q143_lf_stats" -> ((s, dir) => {
      val voted = graft.operators.Supervision.majorityVote(
        weakLfs(t(s, dir, "documents")),
        Seq("lf_len", "lf_the", "lf_div"))
      graft.operators.Supervision.lfStats(
        voted, Seq("lf_len", "lf_the", "lf_div"))
        .orderBy("lf")
    }),

    // Golden-record survivorship: entity-resolution blocks (first-2-token
    // prefix fingerprint — multi-member on this corpus, so the policies
    // actually arbitrate) collapse to one consolidated row each —
    // deterministic MODE (count desc, value asc) for lang/source, max
    // for n_chars, min doc_id as the stable representative.
    "q144_golden_record" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val clustered = t(s, dir, "documents")
        .withColumn("ckey",
          TextAnalysis.polyHash(concat_ws(" ", slice(toks, 1, 2))))
      graft.operators.Merge.goldenRecord(
        clustered, "ckey", "doc_id",
        modeCols = Seq("lang", "source"), maxCols = Seq("n_chars"))
        .orderBy("rep_id")
    }),

    // Retrieve-then-rerank, composed end-to-end as ONE lazy plan: the
    // q136 arms (dense cosine + lexical overlap, top-10 each) fuse by
    // RRF to 8 candidates, which the exact cosine reranks to a final
    // top-5 — approximate arms propose, the precise scorer disposes.
    "q145_retrieve_rerank" -> ((s, dir) => {
      val dense = Similarity.bruteForceTopK(
        queriesSubset(s, dir), t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 10)
      val lex = graft.operators.Fusion.tokenOverlapTopK(
        t(s, dir, "documents").filter(col("doc_id") < 20),
        t(s, dir, "documents"), "doc_id", "text", k = 10)
      val fused = graft.operators.Fusion.rrf(
        Seq("dense" -> dense, "lex" -> lex), c = 60, topK = 8)
      graft.operators.Fusion.exactRerank(
        fused, t(s, dir, "embeddings"), "vec_id", "embedding", k = 5)
        .orderBy("qid", "rank")
    }),

    // One-row corpus datasheet (the dataset-card headline numbers):
    // volume, diversity, hygiene (dups / short docs / PII) in a single
    // aggregate pass — the release artifact every corpus ships with.
    "q146_datasheet" -> ((s, dir) => {
      graft.operators.Profiling.datasheet(
        t(s, dir, "documents"), "text", "lang", "source",
        lenChars = col("n_chars"))
    }),

    // Source-ablation report (leave-one-out data valuation): per source,
    // the corpus quality-gate pass rate with and without it — the
    // closed-form ranking that decides which source a mixture re-weight
    // cuts first. Metric = the q81 composite gate's keep bit.
    "q147_source_ablation" -> ((s, dir) => {
      val gated = TextAnalysis.qualityGate(
        t(s, dir, "documents"), "doc_id", "text", keepInputCols = true)
      graft.operators.Profiling.leaveOneOutMeans(
        gated, "source", col("keep").cast("long"))
        .orderBy("source")
    }),

    // LM-familiarity curriculum, composed as ONE plan: q87's corpus
    // familiarity → centi-integerized (bounded-cardinality histogram
    // key) → q75's tie-stable quartile buckets → q35's deterministic
    // 25% per-doc hash sample. The curriculum manifest a staged
    // training run reads.
    "q148_curriculum_sample" -> ((s, dir) => {
      val fam = graft.operators.NgramLm.familiarity(
        t(s, dir, "documents"), "doc_id", "text", n = 2)
        .filter(col("familiarity").isNotNull)
        .select(col("doc_id"), col("familiarity"),
          floor(col("familiarity") * 100).cast("long").as("fam_centi"))
        .withColumn("__all", lit(1))
      val bucketed = graft.operators.ExactQuantiles.valueNtile(
        fam, "__all", "fam_centi", k = 4)
      Sampling.deterministicSample(bucketed, "doc_id", pct = 25)
        .select(col("doc_id"), col("familiarity"), col("fam_centi"),
          col("fam_centi_bucket").as("bucket"))
        .orderBy("doc_id")
    }),

    // Flesch-Kincaid readability screen: grade level from exact
    // sentence/word/vowel-run counts — the length-and-density quality
    // signal beside q26's ratios.
    "q149_readability" -> ((s, dir) => {
      TextAnalysis.readability(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Contrastive triplets: q31's embedding near-dup pairs as positives,
    // negatives by bucketed deterministic sampling (pure function of the
    // anchor id) — the (anchor, positive, negative) training rows an
    // embedding model consumes.
    "q150_triplets" -> ((s, dir) => {
      val pairs = Dedup.embeddingDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        strideCentroids(s, dir), threshold = 0.3)
      Similarity.contrastiveTriplets(
        pairs, t(s, dir, "embeddings"), "vec_id", buckets = 64)
        .orderBy("anchor", "positive")
    }),

    // Closed-form KNN-Shapley data valuation (Jia et al. VLDB'19): every
    // training vector's exact Shapley value for a 5-NN classifier over a
    // 10-point labeled probe set — the per-EXAMPLE refinement of q147's
    // per-source leave-one-out. Fixed-point reciprocals (10⁹ div rank)
    // keep the suffix sums integer-exact cross-engine.
    "q151_knn_shapley" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Valuation.knnShapley(
        emb.filter(col("vec_id") < 10), emb.filter(col("vec_id") >= 10),
        "vec_id", "embedding", "label", k = 5)
        .orderBy("vec_id")
    }),

    // Calendar densification + LOCF gap-fill of per-user daily series —
    // the reference domain's "fill the missing station-days" shape on the
    // events table: one row per (user, day) across each user's span, the
    // last observation carried with its staleness age.
    "q152_gapfill_locf" -> ((s, dir) => {
      // layout-independent events read (TIMESTAMP(NANOS) parquet cannot
      // be read as a timestamp — the TableIO.eventsNanos caveat), with
      // the UTC epoch-day date derivation every events query here uses.
      val daily = RelationalQueries.events(s, dir)
        .filter(col("user_id") < 20)
        .groupBy(col("user_id"),
          date_from_unix_date(graft.functions.floorDivLit(col("ts"), 86400000000000L).cast("int"))
            .as("day"))
        .agg(max(col("value")).as("v"))
      graft.operators.Timeseries.densifyLocf(daily, "user_id", "day", "v")
        .orderBy("user_id", "day")
    }),

    // Chi-squared vocabulary selection against the language label — the
    // dimension-pruning pass before training a bag-of-words classifier
    // (q98's family). Rational statistic: exact BIGINT cells, one final
    // division; ties at the top-k boundary break textually.
    "q153_chi2_tokens" -> ((s, dir) => {
      graft.operators.FeatureSelect.chiSquaredTokens(
        t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", minDf = 5L, topK = 25)
    }),

    // Zone-map manifest: per-shard min/max/null/NDV stats of the order
    // date under a month-clustered layout — the file-skipping metadata a
    // lakehouse table keeps, built in one |shards|-row aggregate.
    "q154_shard_stats" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      graft.operators.Profiling.shardStats(o,
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long"),
        to_date(col("o_orderdate")))
        .orderBy("shard")
    }),

    // Pruning simulation over the q154 manifest: how much of the table a
    // one-month date predicate never reads. The I/O-bound answer file
    // skipping gives at 100 TB — scan cost ∝ shards whose [min,max]
    // intersects the predicate, not table size.
    "q155_prune_sim" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val stats = graft.operators.Profiling.shardStats(o,
        year(col("o_orderdate")) * 12 + month(col("o_orderdate")),
        to_date(col("o_orderdate")))
      graft.operators.Profiling.pruneSimulation(stats,
        lit("1995-03-01").cast("date"), lit("1995-03-31").cast("date"))
    }),

    // Incremental aggregate maintenance: a signed changelog (deletes of
    // every 5th base order, inserts of the held-out keys) applied to a
    // materialized per-priority (count, cents-sum) aggregate. The oracle
    // recomputes from scratch over the post-delta state — gating that
    // delta maintenance ≡ recompute while touching only |delta| rows.
    "q156_incr_agg" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      def cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val base = orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
      val oldAgg = base.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents).as("sv"))
      val delta = base.filter(pmod(col("o_orderkey"), lit(5)) === 0)
        .withColumn("sign", lit(-1L))
        .unionByName(orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("sign", lit(1L)))
      graft.operators.Merge.applyAggDelta(oldAgg, delta,
        Seq("o_orderpriority"), col("sign"), Seq("sv" -> cents))
        .orderBy("o_orderpriority")
    }),

    // Retrieval-eval MRR over q29's exact top-10 with same-label
    // relevance — fixed-point reciprocal ranks (10⁹ div r), so the mean
    // is an exact integer sum with one final division.
    "q157_mrr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ranked = Similarity.bruteForceTopK(queriesSubset(s, dir), emb,
        "vec_id", "embedding", k = 10)
        .join(emb.select(col("vec_id").as("qid"), col("label").as("__ql")), "qid")
        .join(emb.select(col("vec_id").as("nid"), col("label").as("__nl")), "nid")
      Similarity.mrrFixedPoint(ranked, "qid", "rank",
        col("__ql") === col("__nl"))
    }),

    // Per-dimension embedding distribution stats — the embedding-QA /
    // whitening-prep table (dead dims, scale drift, mean/std pairs).
    // Power-of-2 fixed-point sums (floor(v·2²⁰) — float·2²⁰ is EXACT in
    // double) make the aggregate order-free BIGINT arithmetic.
    "q158_embed_dim_stats" -> ((s, dir) => {
      graft.operators.EmbeddingStats.dimensionStats(
        t(s, dir, "embeddings"), "embedding")
    }),

    // Cohen's kappa between the q27 language-ID heuristic and the
    // labeled lang — chance-corrected annotator agreement in rational
    // form (exact BIGINT contingency terms, one division).
    "q159_kappa" -> ((s, dir) => {
      graft.operators.Supervision.cohenKappa(t(s, dir, "documents"),
        TextAnalysis.langId(col("text")), col("lang"))
    }),

    // Skip-gram co-occurrence tensor (±2 window): the word2vec/GloVe
    // training-pair counts. Probe-offset equi-join — fan-out hard-capped
    // at 2·window per token, never the L² of a doc-keyed self-join.
    "q160_skipgram" -> ((s, dir) => {
      graft.operators.Cooccur.skipgramPairs(t(s, dir, "documents"),
        "doc_id", "text", window = 2, minCount = 5L, topK = 50)
    }),

    // Exact per-group Pearson correlation (quantity vs price-in-k$) from
    // BIGINT sufficient statistics — corr()'s float-moment accumulation
    // is partition-order-dependent and can't face a hash gate.
    "q161_corr" -> ((s, dir) => {
      graft.operators.Regression.corrByGroup(t(s, dir, "lineitem"),
        Seq("l_returnflag"),
        floor(col("l_quantity") + 0.5).cast("long"),
        floor(col("l_extendedprice") / 1000 + 0.5).cast("long"))
        .orderBy("l_returnflag")
    }),

    // Spearman rank correlation (quantity vs discount-cents, heavy
    // ties) over a 5% deterministic order-key sample — rank2 ≤ 2n keeps
    // the BIGINT sums exact per the operator's documented n-bound, and
    // rank correlation stabilizes at sample sizes far below it.
    "q162_spearman" -> ((s, dir) => {
      val sampled = Sampling.deterministicSample(
        t(s, dir, "lineitem"), "l_orderkey", pct = 5)
      graft.operators.Regression.spearmanByGroup(sampled,
        Seq("l_returnflag"),
        floor(col("l_quantity") + 0.5).cast("long"),
        floor(col("l_discount") * 100 + 0.5).cast("long"))
        .orderBy("l_returnflag")
    }),

    // Cross-source quantile normalization of document length onto the
    // src0 reference distribution — the batch-effect corrector that
    // makes one threshold mean the same thing corpus-wide. Mapping rule
    // is cross-multiplied BIGINTs (no division, no float).
    "q163_quantile_norm" -> ((s, dir) => {
      graft.operators.QuantileNormalize.toReference(
        t(s, dir, "documents"), "source", col("n_chars"), "src0")
        .orderBy("source", "v")
    }),

    // Luhn checksum audit over a 16-digit account-identifier column
    // (zero-padded order keys): the mod-10 validity gate card-number
    // PII detection applies before treating a digit run as sensitive
    // (~10% of arbitrary identifiers pass). Row-local integer fold.
    "q164_luhn_audit" -> ((s, dir) => {
      val acct = lpad(col("o_orderkey").cast("string"), 16, "0")
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          graft.operators.Privacy.luhnValid(acct).as("__v"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          count(when(col("__v"), 1L)).as("n_luhn_valid"))
        .orderBy("o_orderpriority")
    }),

    // Interval-union coverage: per-user merged activity windows (event
    // second → event second + 60 + ⌊|value|⌋), the dwell-time sweep that
    // naive duration sums double-count. One window pass per key, no
    // overlap self-join; integer seconds end to end.
    "q165_interval_union" -> ((s, dir) => {
      val secs = graft.functions.floorDivLit(col("ts"), 1000000000L)
      graft.operators.EventAnalytics.intervalCoverage(
        RelationalQueries.events(s, dir), "user_id",
        secs, secs + lit(60L) + floor(abs(col("value"))).cast("long"))
        .orderBy("user_id")
    }),

    // Release-audit pipeline, composed as ONE plan: q81's quality gate →
    // q140's TVD drift of the SURVIVING corpus's source mix against the
    // full corpus → a one-row release verdict (counts, keep rate, mix
    // drift, boolean gate). The "should this snapshot ship" check a
    // release pipeline runs after filtering — a gate that silently
    // guts one source shows up as TVD before it ships.
    "q166_release_audit" -> ((s, dir) => {
      val gated = graft.operators.CacheScope.track(
        TextAnalysis.qualityGate(t(s, dir, "documents"), "doc_id", "text",
          keepInputCols = true))
      val tagged = gated.select(col("source"), lit(true).as("__ref"))
        .unionAll(gated.filter(col("keep"))
          .select(col("source"), lit(false).as("__ref")))
      val tvd = graft.operators.Profiling
        .distributionDrift(tagged, "source", col("__ref"))
        .agg(min(col("tvd")).as("tvd")) // constant across rows
      val counts = gated.agg(count(lit(1)).as("n_docs"),
        count(when(col("keep"), 1L)).as("n_kept"))
      counts.crossJoin(tvd).select(
        col("n_docs"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_docs").cast("double"))
          .as("keep_rate"),
        col("tvd"),
        (col("tvd") <= 0.05 &&
          col("n_kept").cast("double") / col("n_docs").cast("double") >= 0.25)
          .as("release_ok"))
    }),

    // Per-query nDCG@10 over q157's exact top-10 with same-label
    // relevance — position-weighted eval with plan-literal fixed-point
    // discounts (log2 runs once on the driver, never in an engine).
    "q167_ndcg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ranked = Similarity.bruteForceTopK(queriesSubset(s, dir), emb,
        "vec_id", "embedding", k = 10)
        .join(emb.select(col("vec_id").as("qid"), col("label").as("__ql")), "qid")
        .join(emb.select(col("vec_id").as("nid"), col("label").as("__nl")), "nid")
      Similarity.ndcgFixedPoint(ranked, "qid", "rank",
        col("__ql") === col("__nl"), k = 10)
        .orderBy("qid")
    }),

    // Leakage-safe train/val/test split: near-dup CLUSTERS (q70's wide
    // tier → CC) are the split unit, so a doc and its near-duplicate can
    // never straddle train/test — the contamination q99's per-doc hash
    // split cannot rule out. One-row audit: the naive (doc-keyed) split's
    // crossing-pair count vs the cluster-keyed split's (0 by
    // construction — split is a function of the component id).
    "q168_leakage_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.CacheScope.track(
        Dedup.simhashPairsWide(docs, "doc_id", "text", maxHamming = 2))
      // labels only — dedupClusters' size/canonical columns are unused
      // here, so skip its sizes aggregate + join
      val comps = graft.operators.Components
        .connectedComponents(pairs, "i", "j")
      val labeled = docs.select(col("doc_id"))
        .join(comps, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
      val sp = Sampling.hashSplit(
        Sampling.hashSplit(labeled, "doc_id", 80, 10, "naive_split"),
        "component", 80, 10, "safe_split")
        .select(col("doc_id"), col("naive_split"), col("safe_split"))
      val sizes = sp.agg(count(lit(1)).as("n_docs"),
        count(when(col("safe_split") === "train", 1L)).as("safe_train"),
        count(when(col("safe_split") === "val", 1L)).as("safe_val"),
        count(when(col("safe_split") === "test", 1L)).as("safe_test"))
      val crossing = pairs
        .join(sp.select(col("doc_id").as("i"), col("naive_split").as("ni"),
          col("safe_split").as("si")), "i")
        .join(sp.select(col("doc_id").as("j"), col("naive_split").as("nj"),
          col("safe_split").as("sj")), "j")
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("ni") =!= col("nj"), 1L)).as("naive_cross"),
          count(when(col("si") =!= col("sj"), 1L)).as("safe_cross"))
      sizes.crossJoin(crossing)
    }),

    // Exact ROC-AUC of the gate-distilled classifier (q102's model)
    // against the gate's own labels — the ranking-quality number a
    // curation team reads next to q102's confusion matrix. Integer-exact
    // Mann-Whitney with midrank ties over the fixed-point score
    // histogram; one division at the end.
    "q169_auc" -> ((s, dir) =>
      graft.operators.Evaluation.aucExact(distillScored(s, dir), "zq", "keep")),

    // Precision/recall operating-point sweep for the same distilled
    // scores: one row per distinct quantized threshold, exact BIGINT
    // confusion counts — how a release picks its precision floor without
    // re-scoring the corpus per candidate threshold.
    "q170_pr_curve" -> ((s, dir) =>
      graft.operators.Evaluation.prCurve(distillScored(s, dir), "zq", "keep")
        .orderBy(desc("threshold"))),

    // Trigram novelty per doc: fraction of its distinct shingles with
    // corpus df = 1 — the memorization/boilerplate audit. Singleton
    // shingles carry their only doc id out of the df aggregate, so no
    // df-table join back onto the corpus-sized shingle stream.
    "q171_ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(t(s, dir, "documents"), "doc_id", "text",
        n = 3).orderBy("doc_id")),

    // Blocklist scan: per-doc hit counts + sorted categories against a
    // driver-literal (term -> category) policy list; broadcast join, so
    // only matching tokens reach the shuffle.
    "q172_blocklist" -> ((s, dir) =>
      // categories flattened to a sorted CSV string — the driver's
      // pandas checker cannot sort ARRAY<STRING> columns (round-9 burn).
      TextAnalysis.blocklistHits(t(s, dir, "documents"), "doc_id", "text",
        Seq("slow" -> "perf", "merge" -> "infra", "stream" -> "infra",
          "vector" -> "ml", "customer" -> "pii"))
        .withColumn("categories", array_join(col("categories"), ","))
        .orderBy("doc_id")),

    // Pearson chi-squared homogeneity cells for lang-mix-per-source —
    // exact BIGINT margins and d = o*N - rt*ct per cell (zero cells
    // included), one division per row; the statistic is the sum of the
    // returned contribs.
    "q173_chi2_homogeneity" -> ((s, dir) =>
      graft.operators.Profiling.chiSquaredCells(t(s, dir, "documents"),
        "source", "lang").orderBy("source", "lang")),

    // Simplified (centroid-based) silhouette per IVF cell: per-point
    // s = (c1 - c2)/(1 - c2) from the top-2 centroid cosines, quantized
    // to fixed point so the per-cell mean is an exact integer sum. The
    // clustering-quality gate for the q30/q37/q78 cell structure.
    "q174_silhouette" -> ((s, dir) =>
      Similarity.silhouetteByCell(t(s, dir, "embeddings"), "vec_id",
        "embedding", strideCentroids(s, dir)).orderBy("cell")),

    // Most-specific-match policy lookup over events: per-(type, bucket)
    // overrides > per-type rules > global default, as a chain of
    // broadcast hash joins + coalesce (no BroadcastNestedLoop, no
    // per-fact argmax). Output: events per winning rule and level.
    "q175_rule_lookup" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .withColumn("ub", Sampling.hashBucket(col("user_id"), 4))
      val rules = Seq(
        (Option("click"), Option(0L), "r_click_b0"),
        (Option("purchase"), Option(1L), "r_purch_b1"),
        (Option("click"), Option.empty[Long], "r_click"),
        (Option("purchase"), Option.empty[Long], "r_purchase"),
        (Option("view"), Option.empty[Long], "r_view"),
        (Option.empty[String], Option.empty[Long], "r_default"))
        .toDF("event_type", "ub", "rule")
      graft.operators.Lookup.mostSpecificLookup(ev, rules,
        Seq("event_type", "ub"), "rule")
        .groupBy("matched", "match_level").agg(count(lit(1)).as("cnt"))
        .orderBy("matched")
    }),

    // Merkle manifest over 16 hash shards of the documents table: q67's
    // checksum per shard as leaves, hashed pairwise to a root — the
    // publish artifact that lets a consumer verify any shard against the
    // root in log(shards) digest compares.
    // level_xor (round 13, the q290/q291 derived-oracle direction): a
    // second content-derived reduction per level — bit_xor of the
    // level's digests — that the oracle re-computes from ITS digest
    // chain, so a single wrong node digest breaks two columns, not one.
    "q176_merkle_manifest" -> ((s, dir) =>
      graft.operators.Profiling.merkleManifest(t(s, dir, "documents"),
        Sampling.hashBucket(col("doc_id"), 16), 16,
        col("doc_id"), col("lang"), col("source"), col("text"))
        .withColumn("level_xor", expr("bit_xor(digest)").over(
          org.apache.spark.sql.expressions.Window.partitionBy("level")))
        .orderBy("level", "idx")),

    // Skew advisor over the events key: histogram extremes + the salt
    // factor that would level the hottest key across 32 reducers -
    // the number read before choosing plain join vs AQE vs saltedJoin.
    "q177_skew_report" -> ((s, dir) =>
      graft.operators.Skew.skewReport(t(s, dir, "events"), "event_type",
        partitions = 32)),

    // Coordinated-sample join-size estimate for the lineitem self-join
    // on l_partkey (the "how big does this blow up" planner probe),
    // next to the exact histogram answer and their ratio. The estimate
    // itself is deterministic integers, so it hash-gates.
    "q178_join_size" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val est = graft.operators.Sketch.joinSizeEstimate(li, li,
        "l_partkey", rate = 8)
      val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * col("__c")).as("exact_join_rows"))
      est.crossJoin(exact).withColumn("ratio",
        col("est_join_rows").cast("double") /
          col("exact_join_rows").cast("double"))
    }),

    // Top principal direction of the embeddings (anisotropy probe /
    // all-but-the-top input): exact fixed-point Gram matrix from one
    // distributed pass, then 20 driver-side power iterations in a fixed
    // fold order the oracle replays verbatim - even the eigensolver is
    // hash-gated.
    "q179_top_component" -> ((s, dir) =>
      graft.operators.Projection.topComponentFixedPoint(
        t(s, dir, "embeddings"), "embedding", dim = 64).orderBy("dim")),

    // Reliability table for the distilled classifier: tie-stable score
    // deciles (q75's value-ntile) vs the gate's actual keep rate per
    // decile - the calibration read that complements q169's AUC (is a
    // higher score actually a higher keep probability, bucket by
    // bucket?).
    // All-but-the-top, measured: remove the q179 direction (v rides as
    // a plan literal; map-only residual pass) and report per-dimension
    // fixed-point energy before/after - the anisotropy fix verified by
    // exact arithmetic.
    "q181_top_removal" -> ((s, dir) =>
      graft.operators.Projection.removeTopComponentEnergy(
        t(s, dir, "embeddings"), "embedding", dim = 64).orderBy("dim")),

    // Cross-source duplication matrix: near-dup pairs bucketed by their
    // (unordered) source pair - the mirror-site / content-farm detector
    // that tells which sources copy from which.
    "q196_cross_source_dups" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhashPairsWide(docs, "doc_id", "text",
        maxHamming = 2)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("i"), col("source").as("__sa")), "i")
        .join(src.select(col("doc_id").as("j"), col("source").as("__sb")), "j")
        .select(least(col("__sa"), col("__sb")).as("source_a"),
          greatest(col("__sa"), col("__sb")).as("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    }),

    // Dedup radius sensitivity: pair counts per Hamming distance and
    // cumulative pairs at radius <= h, h = 0..3, from ONE banded pass -
    // the sweep read before locking a near-dup threshold.
    "q197_radius_sweep" -> ((s, dir) => {
      val p3 = Dedup.simhashPairsWide(t(s, dir, "documents"), "doc_id",
        "text", maxHamming = 3)
        .groupBy("hamming").agg(count(lit(1)).as("n_at"))
      val w = Window.orderBy("hamming")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p3.withColumn("n_pairs_le", sum("n_at").over(w)).orderBy("hamming")
    }),

    // Tier agreement: MinHash-LSH (total-recall exact-Jaccard >= 0.5)
    // vs the wide simhash tier - full outer join of the two pair SETS,
    // one-row overlap report incl. pair-set Jaccard. The calibration
    // read for "do the cheap and exact tiers see the same duplicates?"
    "q198_tier_agreement" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, numHashes = 48, bandRows = 6)
        .select(col("i"), col("j"), lit(true).as("__a"))
      val b = Dedup.simhashPairsWide(docs, "doc_id", "text", maxHamming = 2)
        .select(col("i"), col("j"), lit(true).as("__b"))
      a.join(b, Seq("i", "j"), "full_outer")
        .agg(count(when(col("__a"), 1L)).as("n_minhash"),
          count(when(col("__b"), 1L)).as("n_simhash"),
          count(when(col("__a") && col("__b"), 1L)).as("n_both"))
        .withColumn("pair_jaccard",
          col("n_both").cast("double") /
            (col("n_minhash") + col("n_simhash") - col("n_both"))
              .cast("double"))
    }),

    // Vocabulary coverage curve: how many distinct tokens (ranked by
    // frequency desc, token asc) cover 50/90/99% of corpus token mass -
    // the vocab-size design input for a tokenizer. Windows run over
    // VOCAB rows only.
    "q194_vocab_coverage" -> ((s, dir) => {
      val tf = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
      val ord = Window.orderBy(desc("c"), col("t"))
      val wCum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      tf.withColumn("cum", sum("c").over(wCum))
        .withColumn("r", row_number().over(ord).cast("long"))
        .withColumn("n", sum("c").over(wAll))
        .agg(min("n").as("n_tokens"),
          count(lit(1)).as("vocab_size"),
          min(when(col("cum") * 100 >= col("n") * 50, col("r"))).as("v50"),
          min(when(col("cum") * 100 >= col("n") * 90, col("r"))).as("v90"),
          min(when(col("cum") * 100 >= col("n") * 99, col("r"))).as("v99"))
    }),

    // Merkle snapshot DIFF: two manifests (full corpus vs one deleted
    // doc) joined on (level, idx); exactly the changed leaf and its
    // log2(shards) ancestors differ - fault localization without
    // re-checksumming the table.
    "q195_merkle_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def manifest(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Profiling.merkleManifest(df,
          Sampling.hashBucket(col("doc_id"), 16), 16,
          col("doc_id"), col("lang"), col("source"), col("text"))
      val a = manifest(docs)
        .select(col("level"), col("idx"), col("n_rows").as("n_rows_a"),
          col("digest").as("__da"))
      val b = manifest(docs.filter(col("doc_id") =!= 42))
        .select(col("level"), col("idx"), col("n_rows").as("n_rows_b"),
          col("digest").as("__db"))
      a.join(b, Seq("level", "idx"))
        .filter(col("__da") =!= col("__db"))
        // digest_b (round 13): the replacement digest each differing
        // node should now carry — content-derived, oracle-recomputed
        // (the repair payload, not just the fault location)
        .select(col("level"), col("idx"), col("n_rows_a"),
          col("n_rows_b"), col("__db").as("digest_b"))
        .orderBy("level", "idx")
    }),

    // Tokenizer fertility per language over the learned BPE vocab:
    // chars/token and tokens/word from exact sums - the audit that
    // shows which languages a vocabulary under-serves.
    "q191_bpe_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Bpe.bpeTokenCount(docs, "doc_id", "text", numMerges = 8)
        .join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars"),
          sum("n_words").as("words"),
          sum("n_bpe_tokens").as("bpe_tokens"))
        .withColumn("chars_per_token",
          col("chars").cast("double") / col("bpe_tokens").cast("double"))
        .withColumn("tokens_per_word",
          col("bpe_tokens").cast("double") / col("words").cast("double"))
        .orderBy("lang")
    }),

    // Duplicate-cluster size histogram: how much mass each cluster size
    // carries after wide near-dup clustering - the dedup release
    // metric ("mostly pairs, or a few mega-clusters?").
    "q192_cluster_size_hist" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhashPairsWide(docs, "doc_id", "text",
        maxHamming = 2)
      graft.operators.Components.dedupClusters(docs, "doc_id", pairs)
        .filter(col("is_canonical") === 1)
        .groupBy("n_members").agg(count(lit(1)).as("n_clusters"))
        .orderBy("n_members")
    }),

    // Continual-training contamination probe: does an INCREMENT contain
    // near-dups of already-split corpus docs - and of the TEST split in
    // particular? Cross pairs from the incremental dedup (i = corpus,
    // j = batch) joined to the corpus split; one-row verdict.
    "q193_incremental_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val oldDocs = docs.filter(col("doc_id") % 7 =!= 0)
      val newDocs = docs.filter(col("doc_id") % 7 === 0)
      val pairs = Dedup.simhashPairsWideIncremental(newDocs, "doc_id",
        "text", Dedup.wideSignatures(oldDocs, "doc_id", "text"),
        maxHamming = 2)
      val crossPairs = pairs.filter(col("i") % 7 =!= 0)
      val oldSplit = Sampling.hashSplit(
        oldDocs.select(col("doc_id").as("i")), "i", 80, 10)
      val agg = crossPairs.join(oldSplit, "i").agg(
        count(lit(1)).as("n_cross_pairs"),
        count(when(col("split") === "train", 1L)).as("pairs_train"),
        count(when(col("split") === "val", 1L)).as("pairs_val"),
        count(when(col("split") === "test", 1L)).as("pairs_test"),
        count_distinct(when(col("split") === "test", col("j")))
          .as("new_docs_hitting_test"))
      newDocs.agg(count(lit(1)).as("n_new")).crossJoin(agg)
    }),

    // Per-language AUC of the distilled classifier - the fairness/slice
    // audit next to q169's global number (a slice-local blind spot
    // vanishes in the pooled AUC).
    "q188_auc_by_slice" -> ((s, dir) =>
      graft.operators.Evaluation.aucExactByGroup(distillScored(s, dir),
        "lang", "zq", "keep").orderBy("lang")),

    // Exact-arithmetic average precision (step-rule PR area): per-
    // threshold precisions quantized to 2^30 fixed point so the sum is
    // BIGINT - the PR-curve headline in one number, order-free.
    "q189_avg_precision" -> ((s, dir) =>
      graft.operators.Evaluation.averagePrecision(distillScored(s, dir),
        "zq", "keep")),

    // Two-sample KS statistic of doc length, gate-kept vs dropped: does
    // the quality gate bias the length distribution? Cross-multiplied
    // exact integers; one histogram, windows over distinct values.
    "q190_ks_gate_length" -> ((s, dir) => {
      val gated = TextAnalysis.qualityGate(t(s, dir, "documents"),
        "doc_id", "text", keepInputCols = true)
      graft.operators.Profiling.ksStatistic(gated, col("n_chars"),
        col("keep"))
    }),

    // Co-engagement (market-basket) pairs over the (order, part)
    // bipartite table with degree capping - hub actors dropped BEFORE
    // the per-actor self-join, so fan-out is bounded at maxDegree^2 per
    // actor; only pairs seen in >= 2 baskets ship.
    "q186_coengagement" -> ((s, dir) =>
      graft.operators.Cooccur.coEngagementPairs(t(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", maxDegree = 6)
        .filter(col("n_actors") >= 2)
        .orderBy("item_a", "item_b")),

    // Greedy token-budget allocation across sources by mean quality
    // (fixed-point sums, one division for the order key): fractional-
    // knapsack optimum, rejected mass visible as alloc < avail.
    "q187_budget_alloc" -> ((s, dir) => {
      val stats = t(s, dir, "documents").groupBy("source").agg(
        sum(floor(TextAnalysis.qualityScore(col("text")) * lit(1048576L))
          .cast("long")).as("qsum"),
        count(lit(1)).as("n"),
        sum(TextAnalysis.tokenCount(col("text"))).as("avail"))
        .select(col("source"),
          (col("qsum").cast("double") / col("n").cast("double"))
            .as("quality"),
          col("avail"))
      graft.operators.Mixing.budgetAllocate(stats, "source", "quality",
        "avail", budget = 15000L).orderBy("source")
    }),

    // Spectral gap: second eigenvalue via one Hotelling deflation +
    // second power iteration (all driver doubles in the same fixed fold
    // order) - "does removing ONE component fix the anisotropy?"
    "q185_spectral_gap" -> ((s, dir) =>
      graft.operators.Projection.spectralGapFixedPoint(
        t(s, dir, "embeddings"), "embedding", dim = 64)),

    // The model-eval suite as ONE composed release verdict: AUC +
    // operating point (smallest threshold with precision >= 0.95, i.e.
    // max recall at that floor) + bootstrap keep-rate interval, and a
    // boolean ship/no-ship gate over all three - the q166 discipline
    // applied to the classifier itself.
    "q184_eval_verdict" -> ((s, dir) => {
      val scored = graft.operators.CacheScope.track(distillScored(s, dir))
      val auc = graft.operators.Evaluation.aucExact(scored, "zq", "keep")
        .select(col("n_pos"), col("n_neg"), col("auc"))
      val sel = graft.operators.Evaluation.prCurve(scored, "zq", "keep")
        .filter(col("precision") >= 0.95)
        .orderBy("threshold").limit(1)
        .select(col("threshold").as("thr_sel"),
          col("precision").as("precision_sel"),
          col("recall").as("recall_sel"))
      val ci = Sampling.bootstrapReplicates(scored, "doc_id",
        col("keep").cast("long"), replicates = 32)
        .agg(min("rate").as("keep_lo"), max("rate").as("keep_hi"))
      auc.crossJoin(sel).crossJoin(ci)
        .withColumn("eval_ok",
          col("auc") >= 0.99 && col("recall_sel") >= 0.9 &&
            col("keep_lo") >= 0.5)
    }),

    // Exact 10%-trimmed mean of doc length per lang: drop exactly
    // floor(n/10) rows from each tail off the cumulated histogram (a
    // boundary value's count splits row-exactly) - the robust location
    // estimate between mean and median, strictly histogram-bounded.
    "q183_trimmed_mean" -> ((s, dir) =>
      graft.operators.ExactQuantiles.trimmedMeanByGroup(
        t(s, dir, "documents"), "lang", "n_chars", num = 1, den = 10)
        .orderBy("lang")),

    // Error bars on the gate's keep rate: 32 deterministic Poisson-
    // bootstrap replicates in ONE pass (hash-derived weights, driver-
    // literal CDF, exact integer sums) - the spread across rows is the
    // keep rate's sampling distribution, and even that is hash-gated.
    "q182_bootstrap_keep" -> ((s, dir) => {
      val gated = TextAnalysis.qualityGate(t(s, dir, "documents"),
        "doc_id", "text", keepInputCols = true)
      Sampling.bootstrapReplicates(gated, "doc_id",
        col("keep").cast("long"), replicates = 32).orderBy("b")
    }),

    "q180_reliability" -> ((s, dir) => {
      val scored = distillScored(s, dir).withColumn("__g", lit(1))
      graft.operators.ExactQuantiles.valueNtile(scored, "__g", "zq", k = 10)
        .groupBy(col("zq_bucket").as("bucket"))
        .agg(count(lit(1)).as("n"),
          count(when(col("keep"), 1L)).as("n_keep"),
          min("zq").as("zq_min"), max("zq").as("zq_max"))
        .withColumn("keep_rate",
          col("n_keep").cast("double") / col("n").cast("double"))
        .orderBy("bucket")
    }),

    // Deequ/TFDV-style per-COLUMN profile of lineitem: one stack pass →
    // (column, value) histogram → per-column nulls / exact NDV / mode
    // frequency / completeness / uniqueness — the snapshot-drift
    // artifact two releases diff in |cols| rows.
    "q199_column_profile" -> ((s, dir) =>
      graft.operators.Profiling.columnProfile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
          "l_linestatus", "l_shipdate"))
        .orderBy("column")),

    // Deequ-style constraint audit: ALL row-local rules share one
    // aggregate pass; uniqueness rides a key histogram; the FK rule
    // left-joins distinct parent keys. One row per rule, the table a
    // publish gate reads. range:l_quantity[1,49] is a deliberately
    // failing rule (TPC-H quantity reaches 50) — the audit reports, the
    // caller gates.
    "q200_constraint_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val row = graft.operators.Constraints.rowRules(li, Seq(
        ("complete:l_shipdate", col("l_shipdate").isNull),
        ("nonneg:l_extendedprice", col("l_extendedprice") < 0),
        ("range:l_quantity[1,49]", !col("l_quantity").between(1, 49)),
        ("set:l_returnflag{A,N,R}",
          !col("l_returnflag").isin("A", "N", "R"))))
      val uq = graft.operators.Constraints.uniqueRule(li,
        "unique:(l_orderkey,l_linenumber)",
        Seq("l_orderkey", "l_linenumber"))
      val fk = graft.operators.Constraints.fkRule(li,
        "fk:l_orderkey->orders", "l_orderkey",
        t(s, dir, "orders"), "o_orderkey")
      graft.operators.Constraints.audit(Seq(row, uq, fk))
    }),

    // CUSUM changepoint over daily event volume: the sequential
    // max(0, S+x−μ) recursion as prefix-sum minus running-min — two
    // windows over DAY rows, exact scaled integers, alarm when
    // CUSUM > 1× the daily mean.
    "q201_cusum" -> ((s, dir) =>
      graft.operators.EventAnalytics.cusumCounts(
        graft.io.TableIO.eventsNanos(s, dir),
        graft.functions.floorDivLit(col("ts"), 86400000000000L), alarmH = 1)
        .orderBy("bucket")),

    // MinHash-LSH S-curve planner: p(s) = 1−(1−s^r)^b over a similarity
    // grid for three candidate configs (q24 runs 8×6) — fixed-order
    // multiplication chains, so even the planner is hash-gated.
    "q202_lsh_curve" -> ((s, dir) =>
      Dedup.lshParameterCurve(s,
        configs = Seq((8, 6), (16, 4), (32, 3)),
        sPcts = (1 to 19).map(_ * 5))),

    // Stratified k-fold: per-lang fold sizes differ by ≤1 by
    // construction (q99's hash split cannot promise that) — the
    // histogram-offset rank plan, no per-stratum window funnel.
    "q203_stratified_kfold" -> ((s, dir) =>
      Sampling.stratifiedKFold(t(s, dir, "documents"), "lang", "doc_id",
        k = 5)
        .groupBy("lang", "fold").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "fold")),

    // Per-source language diversity: Gini impurity + inverse-Simpson
    // effective class count from the exact (source, lang) histogram —
    // the datasheet's mix metric without entropy's libm log.
    "q204_source_diversity" -> ((s, dir) =>
      graft.operators.Profiling.diversityByGroup(t(s, dir, "documents"),
        "source", "lang").orderBy("source")),

    // Pairwise source VOCABULARY overlap: distinct-token sets compared
    // via inclusion-exclusion on the token-keyed vocab self-join —
    // register/domain similarity before any document pair is compared.
    "q205_vocab_overlap" -> ((s, dir) =>
      TextAnalysis.vocabOverlap(t(s, dir, "documents"), "source", "text")
        .orderBy("group_a", "group_b")),

    // Per-SOURCE token-budget cap at doc granularity: keep docs in
    // (quality desc, doc_id) order while the running token sum stays
    // ≤ 1500 — q187 allocates ACROSS sources; this ENFORCES a cap
    // within each one via the histogram-offset prefix-sum plan (no
    // per-source window funnel). Summary per source.
    "q206_domain_cap" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(
        col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("ntok"),
        floor(TextAnalysis.qualityScore(col("text")) * lit(1048576L))
          .cast("long").as("qi"))
      graft.operators.Mixing.budgetCapPerGroup(base, col("source"),
        bucket = -(expr("qi DIV 4096")), // 256 coarse quality buckets
        order = Seq(col("qi").desc, col("doc_id")),
        weight = col("ntok"), budget = 1500L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("kept"), 1L)).as("n_kept"),
          coalesce(sum(when(col("kept"), col("ntok"))), lit(0L))
            .as("kept_tokens"),
          sum(col("ntok")).as("total_tokens"))
        .orderBy("source")
    }),

    // Rolling median/MAD anomaly flags on daily event volume — q201's
    // robust sibling: trailing-7-day integer median baseline, alarm at
    // |x − med| > 3·MAD, warm-up days NULL.
    "q208_rolling_mad" -> ((s, dir) =>
      graft.operators.EventAnalytics.rollingMadAnomaly(
        graft.io.TableIO.eventsNanos(s, dir),
        graft.functions.floorDivLit(col("ts"), 86400000000000L), w = 7, k = 3)
        .orderBy("bucket")),

    // Argmax-F1 operating point of the distilled classifier — one row
    // off the PR curve, ties toward the smaller threshold (more recall
    // at equal F1); the balanced complement to q184's precision floor.
    "q209_f1_point" -> ((s, dir) =>
      graft.operators.Evaluation.f1OperatingPoint(distillScored(s, dir),
        "zq", "keep")),

    // Shard-balance audit: q104's hash-ordered equal shards, then each
    // shard's SOURCE mix diversity (q204's arithmetic per shard) — a
    // hash-ordered manifest should make every shard a fair mix; this
    // measures it.
    "q210_shard_balance" -> ((s, dir) => {
      val h = pmod(pmod(col("doc_id").cast("long"), lit(2147483648L))
        * 2654435761L, lit(4294967296L))
      val sharded = graft.operators.GlobalIds.shardByOrder(
        t(s, dir, "documents").select(col("doc_id"), col("source"))
          .withColumn("h", h),
        bucket = expr("h DIV 4194304"),
        order = Seq(col("h"), col("doc_id")),
        shardSize = 64)
      graft.operators.Profiling.diversityByGroup(sharded, "shard", "source")
        .orderBy("shard")
    }),

    // Exact phrase search over positional postings: each phrase word's
    // (doc, pos − i) rows equi-join on the aligned start — the
    // intersection never scans text, and selective words prune the
    // stream before the shuffle.
    "q211_phrase_search" -> ((s, dir) =>
      graft.operators.InvertedIndex.phraseSearch(t(s, dir, "documents"),
        "doc_id", "text", Seq("fast", "table", "value"))
        .orderBy("doc_id")),

    // Cross-validation variance read: the distilled classifier's exact
    // AUC per q203 FOLD — five stratified folds, five honest AUCs; the
    // spread is the metric's sampling noise (q188 slices by lang; this
    // slices by fold).
    "q212_cv_auc" -> ((s, dir) => {
      val folds = Sampling.stratifiedKFold(
        t(s, dir, "documents").select("doc_id", "lang"), "lang", "doc_id",
        k = 5).select("doc_id", "fold")
      graft.operators.Evaluation.aucExactByGroup(
        distillScored(s, dir).join(folds, "doc_id"), "fold", "zq", "keep")
        .orderBy("fold")
    }),

    // Collocation mining: adjacent-bigram LIFT (the word2vec phrase
    // score, exact rational — no log, no float accumulation); lift > 1
    // means the pair beats independence. Top-20 with a count floor.
    "q213_bigram_lift" -> ((s, dir) =>
      graft.operators.Cooccur.bigramLift(t(s, dir, "documents"),
        "doc_id", "text", discount = 2L, minCount = 10L, topK = 20)),

    // Error bars on the AUC itself: 32 deterministic Poisson replicates
    // reweight the score histogram (shared draw with q182), midrank
    // formula on weighted counts — the confidence read under q169's
    // point estimate.
    "q214_auc_bootstrap" -> ((s, dir) =>
      graft.operators.Evaluation.aucBootstrap(distillScored(s, dir),
        "doc_id", "zq", "keep", replicates = 32).orderBy("b")),

    // First-order Markov transition matrix over per-user event streams:
    // what follows a view/click/purchase, with exact counts and one
    // division per row — the behavioral fingerprint.
    "q215_markov" -> ((s, dir) =>
      graft.operators.EventAnalytics.transitionMatrix(
        graft.io.TableIO.eventsNanos(s, dir), "user_id",
        Seq(col("ts"), col("event_id")), "event_type")
        .orderBy("from_state", "to_state")),

    // t-closeness per lang over the length distribution (ordered EMD
    // via cross-multiplied cumulative shares, one division per group) —
    // a group can pass k and l yet leak through its sensitive
    // DISTRIBUTION; this is that third audit.
    "q216_t_closeness" -> ((s, dir) =>
      graft.operators.Privacy.tClosenessAudit(t(s, dir, "documents"),
        Seq("lang"), expr("n_chars DIV 100"), tMax = 0.2)
        .orderBy("lang")),

    // Estimator accuracy of q138's priority sample: per-lang character
    // mass estimated from the 40-doc sample (Σ max(w, τ) over sample
    // members) vs the exact Σ n_chars — the subset-sum property the
    // sketch exists for, measured not asserted.
    "q217_priority_estimate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val samp = Sampling.prioritySample(docs, "doc_id", "n_chars", k = 40)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          sum("est_weight").as("est_chars"))
      docs.groupBy("lang")
        .agg(sum("n_chars").as("exact_chars"))
        .join(samp, Seq("lang"), "left")
        .select(col("lang"), coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          col("est_chars"), col("exact_chars"),
          (col("est_chars") / col("exact_chars").cast("double")).as("ratio"))
        .orderBy("lang")
    }),

    // Functional-dependency audit: does l_orderkey determine o_custkey
    // (it must — FD holds through the FK) and does l_partkey determine
    // l_suppkey (it must NOT — parts ship from many suppliers)?
    // Violation mass = all rows of ambiguous determinants.
    "q218_fd_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.Constraints.audit(Seq(
        graft.operators.Constraints.fdRule(
          li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey")),
          "fd:l_orderkey->o_custkey", Seq("l_orderkey"), "o_custkey"),
        graft.operators.Constraints.fdRule(li,
          "fd:l_partkey->l_suppkey", Seq("l_partkey"), "l_suppkey")))
    }),

    // Padding-waste audit: batches of 32 in arrival order vs
    // length-sorted order — padded slots per batch = Σ(count·max − sum)
    // over token counts, the "why length-bucket your batches" number
    // (and the baseline context packing beats). Histogram-offset
    // ordinals; everything after is batch-bounded.
    "q219_padding_waste" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("ntok"))
      def waste(strategy: String, bucket: org.apache.spark.sql.Column,
                order: Seq[org.apache.spark.sql.Column]) =
        graft.operators.GlobalIds.contiguousIds(docs, bucket, order, "ord")
          .withColumn("batch", expr("ord DIV 32"))
          .groupBy("batch")
          .agg(count(lit(1)).as("c"), max("ntok").as("mx"),
            sum("ntok").as("tok"))
          .agg(count(lit(1)).as("n_batches"),
            sum("tok").as("total_tokens"),
            sum(col("c") * col("mx") - col("tok")).as("padding_waste"))
          .select(lit(strategy).as("strategy"), col("n_batches"),
            col("total_tokens"), col("padding_waste"),
            (col("padding_waste").cast("double") /
              (col("padding_waste") + col("total_tokens")).cast("double"))
              .as("waste_ratio"))
      waste("arrival", expr("doc_id DIV 64"), Seq(col("doc_id")))
        .unionByName(waste("length_sorted", col("ntok"),
          Seq(col("ntok"), col("doc_id"))))
        .orderBy("strategy")
    }),

    // Content-defined chunking + chunk-level dedup accounting: the
    // rsync/LBFS boundary rule over the token stream (cut when the
    // rolling 4-gram hash ≡ 0 mod 16), then how much token mass lives
    // in REPEATED chunks — the storage-dedup / delta-sync read, and a
    // sub-document complement to doc-level dedup.
    "q220_cdc_chunks" -> ((s, dir) => {
      val ch = graft.operators.Chunking.contentDefinedChunks(
        t(s, dir, "documents"), "doc_id", "text", n = 4, maskBits = 4)
      ch.groupBy("digest", "n_tokens").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_chunks"),
          count(lit(1)).as("n_distinct_chunks"),
          sum(col("c") * col("n_tokens")).as("total_tokens"),
          sum((col("c") - 1) * col("n_tokens")).as("dup_tokens"))
        .withColumn("dup_ratio",
          col("dup_tokens").cast("double") /
            col("total_tokens").cast("double"))
    }),

    // Delta-sync estimate between two snapshots (one doc edited): CDC
    // chunk content v2 anti-joined on v1 — ship only chunks whose
    // digest is new. The one-word edit moves ~one chunk of ~27k tokens;
    // THIS is why the boundaries are content-defined.
    "q221_delta_sync" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val v2docs = docs.withColumn("text",
        when(col("doc_id") === 7, concat(col("text"), lit(" EDITED")))
          .otherwise(col("text")))
      def chunks(d: DataFrame) = graft.operators.Chunking
        .contentDefinedChunks(d, "doc_id", "text", n = 4, maskBits = 4)
      val v1 = chunks(docs).select("digest").distinct()
      val v2d = chunks(v2docs).groupBy("digest")
        .agg(min("n_tokens").as("n_tokens"), count(lit(1)).as("c"))
      val tot = v2d.agg(sum("c").as("n_chunks_v2"),
        sum(col("c") * col("n_tokens")).as("tokens_v2"))
      val fresh = v2d.join(v1, Seq("digest"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_new_chunks"),
          coalesce(sum("n_tokens"), lit(0L)).as("new_tokens"))
      tot.crossJoin(fresh)
        .withColumn("transfer_ratio",
          col("new_tokens").cast("double") / col("tokens_v2").cast("double"))
        .select("n_chunks_v2", "tokens_v2", "n_new_chunks", "new_tokens",
          "transfer_ratio")
    }),

    // Snapshot drift diff over the q199 profile: two per-column profile
    // tables joined on column name — NDV/row/completeness deltas and an
    // exact-arithmetic drift flag, the |cols|-row release comparison the
    // profiler exists for (v2 simulates a partial snapshot).
    "q222_profile_drift" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_quantity", "l_returnflag",
        "l_shipdate")
      val v1 = t(s, dir, "lineitem")
      val v2 = v1.filter(col("l_quantity") <= 45)
      def prof(d: DataFrame, sfx: String) =
        graft.operators.Profiling.columnProfile(d, cols)
          .select(col("column"), col("n_rows").as(s"n_rows_$sfx"),
            col("n_distinct").as(s"ndv_$sfx"),
            col("completeness").as(s"comp_$sfx"))
      prof(v1, "v1").join(prof(v2, "v2"), "column")
        .withColumn("row_delta", col("n_rows_v2") - col("n_rows_v1"))
        .withColumn("ndv_delta", col("ndv_v2") - col("ndv_v1"))
        .withColumn("comp_delta", col("comp_v2") - col("comp_v1"))
        .withColumn("drifted",
          abs(col("ndv_delta")) * 10 > col("ndv_v1") ||
            col("comp_delta") =!= 0.0)
        .orderBy("column")
    }),

    // Per-TYPE CUSUM monitors: each event type's detector centered on
    // its own mean, so a big stream never drowns a small one's shift —
    // q201 partitioned by group.
    "q223_cusum_by_type" -> ((s, dir) =>
      graft.operators.EventAnalytics.cusumCountsByGroup(
        graft.io.TableIO.eventsNanos(s, dir), col("event_type"),
        graft.functions.floorDivLit(col("ts"), 86400000000000L), alarmH = 1)
        .orderBy("group", "bucket")),

    // Top journey prefixes: the most common first-3 event-type
    // sequences per user — path analysis next to q109's one-hypothesis
    // funnel and q215's one-step transitions.
    "q224_top_paths" -> ((s, dir) =>
      graft.operators.EventAnalytics.topPaths(
        graft.io.TableIO.eventsNanos(s, dir), "user_id",
        Seq(col("ts"), col("event_id")), "event_type",
        depth = 3, topK = 25)),

    // Right-to-be-forgotten propagation audit: after deleting a doc
    // set from the primary, derived artifacts (CDC chunks, dedup
    // signatures, fold assignments) built from the PRE-delete corpus
    // still reference the deleted ids — one residue row per artifact,
    // the governance check that flags stale derived tables.
    "q225_delete_audit" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val dels = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("__del"))
      def row(name: String, d: DataFrame, idc: String) =
        d.join(broadcast(dels), col(idc) === col("__del"), "left")
          .agg(count(lit(1)).as("n_rows"),
            count(when(col("__del").isNotNull, 1L)).as("n_residue"))
          .select(lit(name).as("artifact"), col("n_rows"),
            col("n_residue"), (col("n_residue") === 0L).as("clean"))
      row("cdc_chunks",
        graft.operators.Chunking.contentDefinedChunks(docs, "doc_id",
          "text", n = 4, maskBits = 4), "doc_id")
        .unionByName(row("signatures",
          Dedup.wideSignatures(docs, "doc_id", "text"), "id"))
        .unionByName(row("kfold",
          Sampling.stratifiedKFold(docs.select("doc_id", "lang"), "lang",
            "doc_id", 5), "doc_id"))
        .orderBy("artifact")
    }),

    // Per-TYPE rolling-MAD monitors — q208 partitioned by group, the
    // robust sibling of q223's per-type CUSUM.
    "q227_mad_by_type" -> ((s, dir) =>
      graft.operators.EventAnalytics.rollingMadAnomalyByGroup(
        graft.io.TableIO.eventsNanos(s, dir), col("event_type"),
        graft.functions.floorDivLit(col("ts"), 86400000000000L), w = 7, k = 3)
        .orderBy("group", "bucket")),

    // Cramér's V over (source, lang): q173's cells reduced to the one
    // normalized association number — fixed-point cell sum (exact
    // BIGINT), one sqrt.
    "q228_cramers_v" -> ((s, dir) =>
      graft.operators.Profiling.cramersV(t(s, dir, "documents"),
        "source", "lang")),

    // The data-quality families composed into ONE release verdict row
    // (the q166/q184 discipline over this round's audits): integrity
    // (doc_id unique + text complete), privacy (every lang t-close),
    // balance (every source's effective language count), duplication
    // (wide-tier pair mass) — booleans + the numbers behind them, one
    // plan.
    "q230_quality_verdict" -> ((s, dir) => {
      val docs = graft.operators.CacheScope.track(t(s, dir, "documents"))
      val cons = graft.operators.Constraints.audit(Seq(
        graft.operators.Constraints.rowRules(docs, Seq(
          ("complete:text", col("text").isNull))),
        graft.operators.Constraints.uniqueRule(docs, "unique:doc_id",
          Seq("doc_id"))))
        .agg(count(lit(1)).as("n_rules"),
          count(when(!col("passed"), 1L)).as("rules_failed"))
      val tc = graft.operators.Privacy.tClosenessAudit(docs, Seq("lang"),
        expr("n_chars DIV 100"), tMax = 0.2)
        .agg(count(when(!col("t_close"), 1L)).as("langs_leaking"),
          max("t").as("max_t"))
      val div = graft.operators.Profiling.diversityByGroup(docs, "source",
        "lang")
        .agg(min("inv_simpson").as("min_inv_simpson"))
      val dups = Dedup.simhashPairsWide(docs, "doc_id", "text",
        maxHamming = 2)
        .agg(count(lit(1)).as("dup_pairs"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      n.crossJoin(cons).crossJoin(tc).crossJoin(div).crossJoin(dups)
        .withColumn("ship",
          col("rules_failed") === 0 && col("langs_leaking") === 0 &&
            col("min_inv_simpson") >= 1.5 &&
            col("dup_pairs") * 20 < col("n_docs"))
    }),

    // Embedding distribution drift: per-dimension fixed-point stats of
    // the corpus vs a partial snapshot (every 11th vector dropped),
    // joined per dim — the embedding-space monitor next to q140's
    // categorical TVD and q190's KS.
    "q229_embed_drift" -> ((s, dir) => {
      val v1 = t(s, dir, "embeddings")
      val v2 = v1.filter(col("vec_id") % 11 =!= 0)
      def d(df: DataFrame, sfx: String) =
        graft.operators.EmbeddingStats.dimensionStats(df, "embedding")
          .select(col("dim"), col("n").as(s"n_$sfx"),
            col("sum_fixed").as(s"sum_$sfx"),
            col("mean").as(s"mean_$sfx"), col("std").as(s"std_$sfx"))
      d(v1, "v1").join(d(v2, "v2"), "dim")
        .withColumn("mean_shift", col("mean_v2") - col("mean_v1"))
        .orderBy("dim")
    }),

    // Cumulative gain/lift table of the distilled classifier: what the
    // top decile of scores captures vs random — the triage read that
    // turns q169's AUC into an operating decision. Exact ordinals
    // (histogram-offset, tie-broken by doc_id), BIGINT counts, one
    // division per ratio.
    "q231_decile_lift" -> ((s, dir) =>
      graft.operators.Evaluation.decileLift(distillScored(s, dir),
        "doc_id", "zq", "keep").orderBy("decile")),

    // Split-conformal acceptance gate on the same scores: threshold =
    // k-th smallest calibration-positive score, k = ⌊α(n+1)⌋ at α=1/10
    // — a distribution-free ≥90% keep-coverage guarantee, then the
    // measured coverage and the bad-doc pass rate it costs on the held
    // split.
    "q232_conformal_gate" -> ((s, dir) =>
      graft.operators.Evaluation.conformalGate(distillScored(s, dir),
        "doc_id", "zq", "keep", calPct = 50, alphaNum = 1, alphaDen = 10)
        .orderBy("threshold")),

    // Lorenz-Gini concentration of character mass per source: is a
    // source's corpus spread across its documents or held by a few
    // giants — the inequality read a mixing/budget stage wants next to
    // q204's diversity. Histogram-exact rank sums, BIGINT + one
    // division.
    "q233_gini_chars" -> ((s, dir) =>
      graft.operators.Profiling.lorenzGiniByGroup(
        t(s, dir, "documents"), "source", col("n_chars"))
        .orderBy("source")),

    // Benford first-digit audit over order prices (whole-currency
    // magnitudes): per-digit observed vs log10(1+1/d), χ² from
    // fixed-point terms — the numeric-forensics sibling of q140's
    // categorical drift. No float log anywhere: digits come from BIGINT
    // decimal strings, expectations are literals.
    "q234_benford" -> ((s, dir) =>
      graft.operators.Profiling.benfordAudit(
        t(s, dir, "orders"), floor(col("o_totalprice")))
        .orderBy("digit")),

    // One-way ANOVA of document length across sources: η² (variance
    // explained by source) and F — "does source matter for length, or
    // is the between-source spread noise?"; the categorical-regressor
    // sibling of q161's Pearson.
    "q235_anova_chars" -> ((s, dir) =>
      graft.operators.Profiling.anovaByGroup(
        t(s, dir, "documents"), "source", col("n_chars"))),

    // Kendall τ-b between binned document length and token count —
    // the tie-corrected concordance measure completing the q161/q162
    // association trio. Cell-histogram pairs (V² on BINNED values, not
    // row pairs), exact BIGINT concordant/discordant mass, one sqrt.
    "q236_kendall" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        expr("n_chars DIV 50").as("xb"),
        (TextAnalysis.tokenCount(col("text")).cast("long")).as("__tc"))
        .withColumn("yb", expr("__tc DIV 10"))
      graft.operators.Regression.kendallTau(d, col("xb"), col("yb"))
    }),

    // Grid-density (DBSCAN-style) clustering over the first two
    // embedding dims: dense cells merge through the 8-neighborhood into
    // arbitrarily-shaped clusters, sparse cells are NOISE — the
    // density complement to q37's k-means cells; CC runs on the cell
    // graph, never on points.
    "q237_density_clusters" -> ((s, dir) =>
      graft.operators.DensityCluster.gridClusters(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        mult = 16.0, minPts = 4L).orderBy("vec_id")),

    // Embedding anisotropy: ||mean vector||^2 / E||v||^2 — the
    // "cone collapse" health read under every cosine-based tier (ANN,
    // semantic dedup); fixed-point per-dim terms, one division.
    "q238_anisotropy" -> ((s, dir) =>
      graft.operators.EmbeddingStats.anisotropy(
        t(s, dir, "embeddings"), "embedding")),

    // SAX motif mining over the daily event-volume series: PAA frame
    // sums → exact value-quartile symbols → repeated 3-symbol words —
    // recurring SHAPES with names, next to q201's threshold alarms.
    "q239_sax_motifs" -> ((s, dir) =>
      graft.operators.Timeseries.saxMotifs(
        graft.io.TableIO.eventsNanos(s, dir),
        graft.functions.floorDivLit(col("ts"), 86400000000000L), paaW = 2, k = 4, wordLen = 3)
        .orderBy("word")),

    // Simpson's-paradox audit: per-lang length-punctuation association
    // sign vs the pooled sign — exact integer covariance numerators,
    // flags any stratum whose direction opposes the aggregate.
    "q240_simpson_audit" -> ((s, dir) =>
      graft.operators.Regression.simpsonAudit(
        t(s, dir, "documents"), "lang",
        col("n_chars"), TextAnalysis.punctCount(col("text")))
        .orderBy("lang")),

    // Dictionary-encode the corpus: frequency-ranked vocab ids (ties by
    // token string), docs rewritten as id sequences with OOV = −1 —
    // the text→integer-arrays step a training job memory-maps.
    "q241_dict_encode" -> ((s, dir) =>
      // ids flattened to a CSV string (empty docs -> "") — the driver's
      // pandas checker cannot sort ARRAY<LONG> columns (round-9 burn);
      // the joined string pins the full id sequence exactly.
      TextAnalysis.dictionaryEncode(t(s, dir, "documents"), "doc_id",
        "text", minDf = 2L)
        .withColumn("ids", array_join(col("ids").cast("array<string>"), ","))
        .orderBy("doc_id")),

    // Association rules over token BASKETS (Apriori level 2): frequent
    // token pairs with support, both directed confidences, and lift —
    // set co-occurrence, where q213's bigram lift is adjacency.
    "q242_assoc_rules" -> ((s, dir) =>
      graft.operators.Cooccur.assocRules(t(s, dir, "documents"),
        "doc_id", "text", minDf = 50L, minPair = 25L, topK = 30)),

    // Blocking-quality audit of the wide-simhash candidate generator vs
    // exact bigram-Jaccard truth: reduction ratio AND pair completeness
    // (q97 measured recall only) + their harmonic mean — the standard
    // entity-resolution blocking scorecard.
    "q243_blocking_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val truth = graft.operators.CacheScope.track(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2,
          threshold = 0.6).select("i", "j"))
      val cand = graft.operators.CacheScope.track(
        Dedup.simhashPairsWide(docs, "doc_id", "text", maxHamming = 3)
          .select("i", "j"))
      Dedup.blockingQuality(cand, truth, docs)
    }),

    // Neyman allocation of a 100-doc sample budget across sources:
    // n_h·σ_h collapses to sqrt(n·Σv² − (Σv)²) — one sqrt of an exact
    // BIGINT per stratum, fixed-point weights, floor-allocated counts
    // with the remainder reported.
    "q244_neyman_alloc" -> ((s, dir) =>
      Sampling.neymanAllocation(t(s, dir, "documents"), "source",
        col("n_chars"), budget = 100L).orderBy("source")),

    // Wald–Wolfowitz runs test: is lang='en' actually MIXED along the
    // doc_id manifest order, or clumped? Adjacency via per-block windows
    // + a |blocks|-row shifted self-join — no corpus-wide window; exact
    // run/class counts, fixed-shape z.
    "q245_runs_test" -> ((s, dir) =>
      graft.operators.Layout.runsTest(t(s, dir, "documents"),
        expr("doc_id DIV 256"), Seq(col("doc_id")),
        col("lang") === "en")),

    // Incremental JOIN maintenance: signed lineitem/orders changelogs
    // drive dA⋈(B⊎dB) ∪ A⋈dB — the materialized join's delta without
    // recomputing the corpus join; net per-priority row/quantity changes
    // gate against a full old-vs-new recompute diff.
    "q246_incr_join" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").select(
        col("l_orderkey").as("k"),
        col("l_quantity").cast("long").as("qty"))
      val b = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("prio"))
      val dA = a.filter(col("k") % 37 === 0)
        .withColumn("sign", lit(-1L))
        .unionByName(a.filter(col("k") % 41 === 0)
          .withColumn("qty", col("qty") + 100L)
          .withColumn("sign", lit(1L)))
      val dB = b.filter(col("k") % 53 === 0)
        .withColumn("sign", lit(-1L))
        .unionByName(b.filter(col("k") % 53 === 0)
          .withColumn("prio", lit("9-CHANGED"))
          .withColumn("sign", lit(1L)))
      graft.operators.Merge.joinDelta(a, dA, b, dB, Seq("k"), "sign",
        aCols = Seq("qty"), bCols = Seq("prio"))
        .groupBy("prio")
        .agg(sum(col("sign")).as("net_rows"),
          sum(col("sign") * col("qty")).as("net_qty"))
        .filter(col("net_rows") =!= 0L || col("net_qty") =!= 0L)
        .orderBy("prio")
    }),

    // Link prediction over the order–part bipartite graph: common
    // neighbours, fixed-point resource-allocation index (10⁹ DIV deg
    // reciprocals — exact BIGINT sums), neighbour Jaccard, preferential
    // attachment; q186's candidate generation, scored.
    "q247_link_prediction" -> ((s, dir) =>
      graft.operators.Cooccur.linkPredictionScores(t(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", maxDegree = 6, topK = 40)),

    // Sample-ratio-mismatch audit of q99's 80/10/10 hash split: the
    // first check of any experiment analysis — observed split counts vs
    // promised shares, χ² from fixed-point terms.
    "q248_srm" -> ((s, dir) =>
      graft.operators.Profiling.ratioMismatchAudit(
        Sampling.hashSplit(t(s, dir, "documents"), "doc_id", 80, 10)
          .select("split"),
        "split", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .orderBy("label")),

    // Heaps'-law vocabulary-growth curve: vocabulary and token mass
    // after the first k docs — does more data still buy new vocabulary?
    // First-occurrence ids off the token histogram, checkpoint explode.
    "q249_heaps_curve" -> ((s, dir) =>
      TextAnalysis.heapsCurve(t(s, dir, "documents"), "doc_id", "text",
        Seq(50L, 100L, 200L, 400L, 500L)).orderBy("k")),

    // 2-D skyline: documents on the (length, quality) Pareto frontier —
    // the preference shortlist no single weighted score expresses;
    // per-x max-y histogram + one exclusive window over histogram rows.
    "q250_skyline" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
        floor(TextAnalysis.qualityScore(col("text")) * lit(1048576L))
          .cast("long").as("qfp"))
      graft.operators.TopK.skyline2D(d, col("n_chars"), col("qfp"))
        .orderBy("doc_id")
    }),

    // Bounded-hop BFS from a seeded item set over the co-engagement
    // graph: exact minimum hop distances ≤ 4, histogrammed, plus the
    // unreached mass as d = −1 — the contamination-spread /
    // effective-diameter read.
    "q251_bfs_hops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val edges = graft.operators.Cooccur.coEngagementPairs(li,
        "l_orderkey", "l_partkey", maxDegree = 6)
      val items = li.select(col("l_partkey").as("item")).distinct()
      val seeds = items.filter(col("item") % 97 === 0)
      val hops = graft.operators.Components.boundedHops(edges, "item_a",
        "item_b", seeds, "item", maxHops = 4)
      val hist = hops.groupBy(col("d")).agg(count(lit(1)).as("n_nodes"))
      val unreached = items
        .join(hops, col("item") === col("node"), "left_anti")
        .agg(count(lit(1)).as("n_nodes"))
        .select(lit(-1L).as("d"), col("n_nodes"))
      hist.unionByName(unreached).filter(col("n_nodes") > 0L).orderBy("d")
    }),

    // Poisson-bootstrap error bars for the corpus length MEDIAN: 32
    // deterministic replicates, weighted median off each replicate's
    // value histogram — order-statistic error bars, no division at all.
    "q252_median_bootstrap" -> ((s, dir) =>
      Sampling.bootstrapMedian(t(s, dir, "documents"), "doc_id",
        col("n_chars"), replicates = 32).orderBy("b")),

    // Index of dispersion per event type: variance/mean of daily counts
    // with an exact-integer overdispersion verdict — is the Poisson
    // assumption under the alarm thresholds even valid?
    "q253_dispersion" -> ((s, dir) =>
      graft.operators.EventAnalytics.dispersionByGroup(
        graft.io.TableIO.eventsNanos(s, dir), col("event_type"),
        graft.functions.floorDivLit(col("ts"), 86400000000000L)).orderBy("group")),

    // Jain's fairness index of the source mix: (Σx)²/(n·Σx²) — the
    // one-number balance read, no ordering needed.
    "q254_jain_fairness" -> ((s, dir) =>
      graft.operators.Profiling.jainFairness(t(s, dir, "documents"),
        "source")),

    // Weighted (bag) Jaccard verification of the wide-simhash
    // candidates: Σmin/Σmax over token COUNT vectors — sees repetition
    // where set Jaccard saturates; Σmax from the totals identity, one
    // pair-token join.
    "q255_weighted_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cands = Dedup.simhashPairsWide(docs, "doc_id", "text",
        maxHamming = 3).select("i", "j")
      Dedup.weightedJaccardVerify(cands, docs, "doc_id", "text")
        .orderBy("i", "j")
    }),

    // Rank-biased overlap between the TF-IDF and BM25 top-20 for the
    // same query terms: the top-weighted ranker-similarity coefficient,
    // p-power weights as driver literals, exact (W·X) DIV d terms.
    "q256_rbo" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val qterms = Seq("fast", "table", "value")
      val w20 = org.apache.spark.sql.expressions.Window
        .orderBy(desc("s"), col("doc_id"))
      def top20(scores: DataFrame) =
        scores.orderBy(desc("s"), col("doc_id")).limit(20)
          .withColumn("rank", row_number().over(w20).cast("long"))
      val aTf = TfIdf.termWeights(docs, "doc_id", "text",
        broadcastVocab = true)
        .filter(col("term").isin(qterms: _*))
        .groupBy("doc_id")
        .agg(sum(floor(col("tfidf") * lit(1048576L)).cast("long")).as("s"))
      val bBm = TfIdf.bm25(docs, "doc_id", "text", broadcastVocab = true)
        .filter(col("term").isin(qterms: _*))
        .groupBy("doc_id")
        .agg(sum(floor(col("bm25") * lit(1048576L)).cast("long")).as("s"))
      graft.operators.Fusion.rankBiasedOverlap(top20(aTf), top20(bBm),
        "doc_id", "rank", k = 20, p = 0.9)
    }),

    // Multi-touch attribution: last-touch counts and fixed-point linear
    // shares of view/click events within 3 days before each purchase,
    // plus the direct-conversion remainder — user-keyed window join,
    // never a cross join.
    "q257_attribution" -> ((s, dir) =>
      graft.operators.EventAnalytics.attribution(
        graft.io.TableIO.eventsNanos(s, dir), "user_id", col("ts"),
        "event_id", "event_type", convType = "purchase",
        touchTypes = Seq("view", "click"),
        windowNs = 3L * 86400000000000L)
        .orderBy("touch_type")),

    // Tail-weighted EDF statistic (discrete Anderson–Darling form) on
    // q190's gate length split: squared CDF gaps weighted 1/(H(1−H))
    // blow up in the tails KS is blind to — two distributions can pass
    // KS and fail here on tail mass alone.
    "q258_ad_statistic" -> ((s, dir) => {
      val gated = TextAnalysis.qualityGate(t(s, dir, "documents"),
        "doc_id", "text", keepInputCols = true)
      graft.operators.Profiling.adStatistic(gated, col("n_chars"),
        col("keep"))
    }),

    // Funnel time-to-convert QUANTILES: per converted stage, exact
    // p25/p50/p75 of lag from the funnel anchor — q109 reports the
    // mean; a skewed conversion lag makes the mean a lie, and this is
    // the read that shows it. Histogram quantiles over whole-second
    // lags.
    "q260_funnel_latency" -> ((s, dir) => {
      val f = graft.operators.EventAnalytics.funnel(
        graft.io.TableIO.eventsNanos(s, dir), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"),
        windowNs = 86400000000000L)
      val lags = f.filter(col("stage_idx") > 1L)
        .withColumn("lag_s", expr("(ts - t1) DIV 1000000000"))
      graft.operators.ExactQuantiles.quantilesByGroup(lags, "stage",
        "lag_s", Seq(("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4)))
        .orderBy("stage")
    }),

    // Matryoshka prefix-dimension recall: exact top-5 by full 64-dim
    // cosine vs top-5 by the FIRST-16-dim prefix — how much ranking the
    // truncated representation keeps (the MRL serving question), per
    // query.
    "q261_matryoshka_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = queriesSubset(s, dir)
      def prefix(df: DataFrame) =
        df.withColumn("embedding", slice(col("embedding"), 1, 16))
      val exact = Similarity.bruteForceTopK(qs, emb, "vec_id",
        "embedding", k = 5)
      val approx = Similarity.bruteForceTopK(prefix(qs), prefix(emb),
        "vec_id", "embedding", k = 5)
      Similarity.recallAtK(exact, approx, "qid", "nid", k = 5)
        .orderBy("qid")
    }),

    // Single-linkage coherence audit: within each wide-simhash CC
    // cluster, the fraction of member PAIRS whose exact bigram Jaccard
    // clears the tier threshold — transitive closure chains A~B~C into
    // one cluster even when A and C share nothing; this measures how
    // much of that happened.
    "q262_cluster_coherence" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.CacheScope.track(
        Dedup.simhashPairsWide(docs, "doc_id", "text", maxHamming = 3)
          .select("i", "j"))
      val comp = graft.operators.Components
        .connectedComponents(pairs, "i", "j")
      val members = comp.select(col("component"), col("id"))
      val intra = members.alias("a")
        .join(members.alias("b"),
          col("a.component") === col("b.component") &&
            col("a.id") < col("b.id"))
        .select(col("a.component").as("component"), col("a.id").as("i"),
          col("b.id").as("j"))
      val good = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2,
        threshold = 0.6).select("i", "j").withColumn("__g", lit(1L))
      intra.join(good, Seq("i", "j"), "left")
        .groupBy("component")
        .agg(count(lit(1)).as("n_pairs"), count(col("__g")).as("n_coherent"))
        .join(members.groupBy("component").agg(count(lit(1)).as("size")),
          "component")
        .withColumn("coherence",
          col("n_coherent").cast("double") / col("n_pairs").cast("double"))
        .select("component", "size", "n_pairs", "n_coherent", "coherence")
        .orderBy("component")
    }),

    // Kaplan–Meier survival of user lifetimes with right censoring
    // (quiet within 7 days of the horizon = censored, not churned) —
    // the naive retention read counts the censored as deaths and biases
    // every tail estimate down; this is the correction.
    "q263_kaplan_meier" -> ((s, dir) =>
      graft.operators.EventAnalytics.kaplanMeier(
        graft.io.TableIO.eventsNanos(s, dir), "user_id",
        graft.functions.floorDivLit(col("ts"), 86400000000000L), censorGapDays = 7L)
        .orderBy("t")),

    // Weekday seasonal decomposition of daily event volume: per-weekday
    // mean component + residual — the calendar baseline to subtract
    // before any anomaly monitor reads the series; η² of the weekday
    // grouping (q235's ANOVA) is the strength of what this removes.
    "q264_seasonality" -> ((s, dir) =>
      graft.operators.EventAnalytics.weekdayDecomposition(
        graft.io.TableIO.eventsNanos(s, dir),
        graft.functions.floorDivLit(col("ts"), 86400000000000L)).orderBy("bucket")),

    // Column ENCODING advisor along the (orderkey, linenumber) physical
    // order: rows/NDV/runs per column and the RLE-vs-dict-vs-plain
    // verdict — the Parquet writer's implicit stats surfaced so layout
    // choices can be justified by measured run structure.
    "q265_encoding_advisor" -> ((s, dir) =>
      graft.operators.Layout.encodingAdvisor(t(s, dir, "lineitem"),
        expr("l_orderkey DIV 64"),
        Seq(col("l_orderkey"), col("l_linenumber")),
        Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
          "l_orderkey"))
        .orderBy("column")),

    // ROBUST capacity trend: q278's OLS forecast re-fit on p10/p90
    // WINSORIZED daily volume — one spike day bends a least-squares
    // line, and the clipped re-fit shows by how much (slope delta =
    // the spike's leverage); both lines in one row per horizon day.
    "q289_robust_trend" -> ((s, dir) => {
      val daily = graft.io.TableIO.eventsNanos(s, dir)
        .groupBy(graft.functions.floorDivLit(col("ts"), 86400000000000L).as("d"))
        .agg(count(lit(1)).as("y"))
        .withColumn("__g", lit(1))
      val clipped = graft.operators.ExactQuantiles.winsorizeByGroup(
        daily, "__g", "y", loNum = 1, hiNum = 9, den = 10)
      val bounds = daily.agg(min(col("d")).as("__d0"),
        max(col("d")).as("__dmax"))
      def fit(df: DataFrame, yCol: String, sfx: String) =
        graft.operators.Regression.trendByGroup(
          df.crossJoin(broadcast(bounds))
            .select((col("d") - col("__d0")).as("x"),
              col(yCol).as("y"), col("__g")),
          Seq("__g"), col("x"), col("y"))
          .select(col("slope").as(s"slope_$sfx"),
            col("intercept").as(s"intercept_$sfx"))
      fit(daily, "y", "raw")
        .crossJoin(fit(clipped, "y_clipped", "robust"))
        .crossJoin(broadcast(bounds))
        .select(explode(sequence(lit(1), lit(7))).as("__i"),
          col("slope_raw"), col("intercept_raw"), col("slope_robust"),
          col("intercept_robust"), col("__dmax"), col("__d0"))
        .withColumn("t_day", col("__dmax") + col("__i"))
        .select(col("t_day"), col("slope_raw"), col("slope_robust"),
          (col("intercept_raw") + col("slope_raw") *
            (col("t_day") - col("__d0")).cast("double"))
            .as("forecast_raw"),
          (col("intercept_robust") + col("slope_robust") *
            (col("t_day") - col("__d0")).cast("double"))
            .as("forecast_robust"))
        .withColumn("slope_delta", col("slope_raw") - col("slope_robust"))
        .orderBy("t_day")
    }),

    // Intra-document CODE-SWITCH ranking: the 20 docs with the most
    // minority-language marker mass — a doc-level lang label (q27)
    // hides mixed documents; these need per-segment handling before a
    // monolingual filter eats them. Deterministic (minority, n_langs,
    // id) ordering.
    "q288_code_switch" -> ((s, dir) => {
      val langs = TextAnalysis.LangMarkers.map(_._1)
      val scores = TextAnalysis.LangMarkers.map { case (l, ms) =>
        TextAnalysis.langScore(col("text"), ms).as(s"s_$l")
      }
      val d = t(s, dir, "documents")
        .select(Seq(col("doc_id"), col("lang")) ++ scores: _*)
      val nLangs = langs.map(l => when(col(s"s_$l") > 0L, 1L)
        .otherwise(0L)).reduce(_ + _)
      val total = langs.map(l => col(s"s_$l")).reduce(_ + _)
      val maxS = greatest(langs.map(l => col(s"s_$l")): _*)
      d.withColumn("n_langs", nLangs)
        .withColumn("marker_total", total)
        .withColumn("minority_markers", total - maxS)
        .filter(col("marker_total") > 0L)
        .select(col("doc_id"), col("lang"), col("n_langs"),
          col("marker_total"), col("minority_markers"),
          (col("minority_markers").cast("double") /
            col("marker_total").cast("double")).as("mix_ratio"))
        .orderBy(desc("minority_markers"), desc("n_langs"), col("doc_id"))
        .limit(20)
    }),

    // Threshold-TRANSFER regret: each lang's own argmax-F1 operating
    // point vs its F1 at the single GLOBAL threshold — the measured
    // price of shipping one cutoff for every language (q188 showed
    // per-slice AUC; this shows the per-slice cost of the decision).
    "q287_threshold_transfer" -> ((s, dir) => {
      val scored = distillScored(s, dir)
      val hist = graft.operators.CacheScope.track(
        scored.groupBy(col("lang"), col("zq").as("t"))
          .agg(count(lit(1)).as("__c"),
            count(when(col("keep"), 1L)).as("__p")))
      val wDesc = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(desc("t"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val wLang = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
      def f1(tp: org.apache.spark.sql.Column, fp: org.apache.spark.sql.Column,
             fn: org.apache.spark.sql.Column) =
        when(lit(2L) * tp + fp + fn > 0L,
          (lit(2L) * tp).cast("double") /
            (lit(2L) * tp + fp + fn).cast("double"))
      val perLang = hist
        .withColumn("tp", sum(col("__p")).over(wDesc))
        .withColumn("fp", sum(col("__c") - col("__p")).over(wDesc))
        .withColumn("fn", sum(col("__p")).over(wLang) - col("tp"))
        .withColumn("f1", f1(col("tp"), col("fp"), col("fn")))
      val wBest = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(desc("f1"), col("t").asc)
      val best = perLang.filter(col("f1").isNotNull)
        .withColumn("__r", row_number().over(wBest))
        .filter(col("__r") === 1)
        .select(col("lang"), col("t").as("best_t"), col("f1").as("best_f1"))
      val globalT = graft.operators.Evaluation
        .f1OperatingPoint(scored, "zq", "keep")
        .select(col("threshold").as("global_t"))
      val atGlobal = hist.crossJoin(broadcast(globalT))
        .filter(col("t") >= col("global_t"))
        .groupBy("lang", "global_t")
        .agg(sum(col("__p")).as("tp"), sum(col("__c") - col("__p")).as("fp"))
        .join(hist.groupBy("lang").agg(sum(col("__p")).as("__P")), "lang")
        .withColumn("fn", col("__P") - col("tp"))
        .select(col("lang"), col("global_t"),
          f1(col("tp"), col("fp"), col("fn")).as("f1_at_global"))
      best.join(atGlobal, "lang")
        .withColumn("regret", col("best_f1") - col("f1_at_global"))
        .orderBy("lang")
    }),

    // Inter-arrival quantiles per event type: exact p50/p90 of
    // per-user consecutive gaps (whole seconds) — the burstiness read
    // under the dispersion verdict (q253); per-user lag windows, then
    // histogram quantiles over gap values.
    "q285_interarrival" -> ((s, dir) => {
      val ev = graft.io.TableIO.eventsNanos(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val gaps = ev
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(col("event_type"),
          expr("(ts - __prev) DIV 1000000000").as("gap_s"))
      graft.operators.ExactQuantiles.quantilesByGroup(gaps, "event_type",
        "gap_s", Seq(("p50", 1, 2), ("p90", 9, 10)))
        .orderBy("event_type")
    }),

    // Top-k vocabulary STABILITY: for each source, the overlap between
    // the global top-10 tokens and the top-10 with that source REMOVED
    // — does any single source dictate the vocabulary head? The
    // leave-one-out influence read on q33's token ranking.
    "q286_topk_stability" -> ((s, dir) => {
      val tok = t(s, dir, "documents").select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      val g = graft.operators.CacheScope.track(
        tok.groupBy("t").agg(count(lit(1)).as("gc")))
      val sc = tok.groupBy("source", "t").agg(count(lit(1)).as("sc"))
      val wG = org.apache.spark.sql.expressions.Window
        .orderBy(desc("gc"), col("t")) // vocab rows
      val topG = g.withColumn("__r", row_number().over(wG))
        .filter(col("__r") <= 10).select(col("t"))
      val sources = t(s, dir, "documents").select("source").distinct()
      val wo = sources.crossJoin(g)
        .join(sc, Seq("source", "t"), "left")
        .withColumn("wc", col("gc") - coalesce(col("sc"), lit(0L)))
        .filter(col("wc") > 0L)
      val wS = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("wc"), col("t"))
      val topWo = wo.withColumn("__r", row_number().over(wS))
        .filter(col("__r") <= 10).select(col("source"), col("t"))
      topWo.join(topG, Seq("t"), "left_semi")
        .groupBy("source").agg(count(lit(1)).as("overlap_at_10"))
        .join(sources, Seq("source"), "right")
        .select(col("source"),
          coalesce(col("overlap_at_10"), lit(0L)).as("overlap_at_10"))
        .orderBy("source")
    }),

    // Margin audit of q150's contrastive triplets: cos(a,p) − cos(a,n)
    // per triplet — a triplet set whose margins skew negative teaches a
    // model the WRONG metric; this is the QA read before training on
    // it. Fixed-point mean, exact counts, min/max extremes.
    "q284_triplet_margin" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = Dedup.embeddingDupPairs(emb, "vec_id", "embedding",
        strideCentroids(s, dir), threshold = 0.3)
      val tri = Similarity.contrastiveTriplets(pairs, emb, "vec_id",
        buckets = 64)
      def vec(as: String) = emb.select(col("vec_id").as(as),
        col("embedding").as(s"__v_$as"),
        graft.functions.l2NormF(col("embedding")).as(s"__n_$as"))
      def cos(x: String, y: String) =
        when(col(s"__n_$x") * col(s"__n_$y") =!= 0.0,
          graft.functions.dotProductF(col(s"__v_$x"), col(s"__v_$y")) /
            (col(s"__n_$x") * col(s"__n_$y")))
      tri.join(vec("anchor"), "anchor")
        .join(vec("positive"), "positive")
        .join(vec("negative"), "negative")
        .withColumn("__m",
          cos("anchor", "positive") - cos("anchor", "negative"))
        .agg(count(lit(1)).as("n_triplets"),
          count(col("__m")).as("n_defined"),
          count(when(col("__m") > 0.0, 1L)).as("n_positive_margin"),
          min(col("__m")).as("min_margin"),
          max(col("__m")).as("max_margin"),
          sum(floor(col("__m") * lit(1048576.0)).cast("long")).as("__mfp"))
        .withColumn("mean_margin",
          when(col("n_defined") > 0L,
            col("__mfp").cast("double") /
              (col("n_defined") * lit(1048576L)).cast("double")))
        .drop("__mfp")
    }),

    // Scorecard for the engine's OWN lang-id heuristic against the
    // labeled lang column: per-class recall/precision + overall
    // accuracy — q27 is the raw confusion table; this is the verdict
    // a consumer reads before trusting the heuristic as a filter.
    "q282_langid_scorecard" -> ((s, dir) => {
      val pred = t(s, dir, "documents").select(col("lang"),
        TextAnalysis.langId(col("text")).as("predicted"))
      val perLang = pred.groupBy("lang")
        .agg(count(lit(1)).as("n"),
          count(when(col("predicted") === col("lang"), 1L)).as("correct"))
      val perPred = pred.groupBy(col("predicted").as("lang"))
        .agg(count(lit(1)).as("predicted_n"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      perLang.join(perPred, Seq("lang"), "left")
        .withColumn("predicted_n", coalesce(col("predicted_n"), lit(0L)))
        .withColumn("recall",
          col("correct").cast("double") / col("n").cast("double"))
        .withColumn("precision",
          when(col("predicted_n") > 0L,
            col("correct").cast("double") /
              col("predicted_n").cast("double")))
        .withColumn("accuracy",
          sum(col("correct")).over(wAll).cast("double") /
            sum(col("n")).over(wAll).cast("double"))
        .orderBy("lang")
    }),

    // Zipf mass profile of the token distribution: top-1 / top-10 /
    // tail shares of total token mass (rank windows over VOCAB rows
    // only) — the log-free concentration read behind vocabulary and
    // stopword decisions.
    "q283_zipf_profile" -> ((s, dir) => {
      val tf = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("c"), col("t")) // vocab rows only
      tf.withColumn("r", row_number().over(w))
        .agg(count(lit(1)).as("vocab"), sum(col("c")).as("total_tokens"),
          coalesce(sum(when(col("r") === 1, col("c"))), lit(0L))
            .as("top1_c"),
          coalesce(sum(when(col("r") <= 10, col("c"))), lit(0L))
            .as("top10_c"),
          min(when(col("r") === 1, col("t"))).as("top1_token"))
        .select(col("vocab"), col("total_tokens"), col("top1_token"),
          col("top1_c"), col("top10_c"),
          when(col("total_tokens") > 0L,
            col("top1_c").cast("double") /
              col("total_tokens").cast("double")).as("top1_share"),
          when(col("total_tokens") > 0L,
            col("top10_c").cast("double") /
              col("total_tokens").cast("double")).as("top10_share"),
          when(col("total_tokens") > 0L,
            (col("total_tokens") - col("top10_c")).cast("double") /
              col("total_tokens").cast("double")).as("tail_share"))
    }),

    // The round's audit families composed into ONE release verdict row
    // (the q230 discipline over THIS batch): split integrity (SRM χ²),
    // source balance (Jain), tail drift (AD statistic), calibration
    // (conformal coverage), concentration (max Lorenz-Gini) — booleans
    // + the numbers behind them; it honestly fails the test corpus on
    // gate length bias (a2 ≈ 120).
    "q280_audit_verdict" -> ((s, dir) => {
      val docs = graft.operators.CacheScope.track(t(s, dir, "documents"))
      val srm = graft.operators.Profiling.ratioMismatchAudit(
        Sampling.hashSplit(docs, "doc_id", 80, 10).select("split"),
        "split", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .agg(max(col("chi2")).as("srm_chi2"))
      val jain = graft.operators.Profiling.jainFairness(docs, "source")
        .select(col("jain"))
      val gated = TextAnalysis.qualityGate(docs, "doc_id", "text",
        keepInputCols = true)
      val ad = graft.operators.Profiling.adStatistic(gated,
        col("n_chars"), col("keep")).select(col("a2"))
      val conf = graft.operators.Evaluation.conformalGate(
        distillScored(s, dir), "doc_id", "zq", "keep")
        .select(col("coverage"))
      val gini = graft.operators.Profiling.lorenzGiniByGroup(docs,
        "source", col("n_chars"))
        .agg(max(col("gini")).as("max_gini"))
      srm.crossJoin(jain).crossJoin(ad).crossJoin(conf).crossJoin(gini)
        .withColumn("split_ok", col("srm_chi2") < 16.27)
        .withColumn("balance_ok", col("jain") >= 0.8)
        .withColumn("tail_ok", col("a2") <= 10.0)
        .withColumn("calibration_ok", col("coverage") >= 0.85)
        .withColumn("concentration_ok", col("max_gini") <= 0.9)
        .withColumn("ship",
          col("split_ok") && col("balance_ok") && col("tail_ok") &&
            col("calibration_ok") && col("concentration_ok"))
        .orderBy("ship")
    }),

    // One-row GRAPH DATASHEET of the co-engagement graph: nodes, edges,
    // density, degree assortativity, giant-component share — the
    // structure card a graph-backed tier publishes beside the corpus
    // datasheet (q146).
    "q281_graph_datasheet" -> ((s, dir) => {
      val edges = graft.operators.CacheScope.track(
        graft.operators.Cooccur.coEngagementPairs(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxDegree = 6)
          .select(col("item_a"), col("item_b")))
      val nodes = edges.select(col("item_a").as("n"))
        .unionByName(edges.select(col("item_b").as("n"))).distinct()
      val counts = nodes.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      val assort = graft.operators.Triangles.assortativity(edges,
        "item_a", "item_b").select(col("corr").as("assortativity"))
      val giant = graft.operators.Components
        .connectedComponents(edges, "item_a", "item_b")
        .groupBy("component").agg(count(lit(1)).as("__sz"))
        .agg(coalesce(max(col("__sz")), lit(0L)).as("giant_size"))
      counts.crossJoin(assort).crossJoin(giant)
        .withColumn("density",
          when(col("n_nodes") > 1L,
            (lit(2L) * col("n_edges")).cast("double") /
              (col("n_nodes") * (col("n_nodes") - 1L)).cast("double")))
        .withColumn("giant_share",
          when(col("n_nodes") > 0L,
            col("giant_size").cast("double") /
              col("n_nodes").cast("double")))
        .select("n_nodes", "n_edges", "density", "assortativity",
          "giant_size", "giant_share")
        .orderBy("n_nodes")
    }),

    // Wilson score intervals on per-lang gate keep-rates: the binomial
    // CI that behaves at small n and extreme p̂ — a 3-of-4 group and a
    // 750-of-1000 group both read 75%; only the interval says which to
    // trust.
    "q277_wilson_interval" -> ((s, dir) => {
      val gated = TextAnalysis.qualityGate(t(s, dir, "documents"),
        "doc_id", "text", keepInputCols = true)
      graft.operators.Profiling.wilsonIntervalByGroup(gated, "lang",
        col("keep")).orderBy("group")
    }),

    // Capacity forecast: OLS trend on centered daily event volume,
    // extrapolated 7 days past the horizon — the "will next week fit"
    // ops read, exact sufficient statistics under a fixed-shape line.
    "q278_capacity_forecast" -> ((s, dir) => {
      val daily = graft.io.TableIO.eventsNanos(s, dir)
        .groupBy(graft.functions.floorDivLit(col("ts"), 86400000000000L).as("d"))
        .agg(count(lit(1)).as("y"))
      val bounds = daily.agg(min(col("d")).as("__d0"),
        max(col("d")).as("__dmax"))
      val base = daily.crossJoin(broadcast(bounds))
        .select((col("d") - col("__d0")).as("x"), col("y"),
          lit(1).as("__g"))
      val tr = graft.operators.Regression.trendByGroup(base, Seq("__g"),
        col("x"), col("y"))
      tr.crossJoin(broadcast(bounds))
        .select(explode(sequence(lit(1), lit(7))).as("__i"), col("slope"),
          col("intercept"), col("__dmax"), col("__d0"))
        .withColumn("t_day", col("__dmax") + col("__i"))
        .select(col("t_day"), col("slope"), col("intercept"),
          (col("intercept") + col("slope") *
            (col("t_day") - col("__d0")).cast("double")).as("forecast"))
        .orderBy("t_day")
    }),

    // Per-language Pareto frontiers: q250's skyline with the exclusive
    // running-max window partitioned by lang — one frontier per
    // stratum, no single-partition funnel at any group count.
    "q279_skyline_by_lang" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("lang"), col("doc_id"),
        col("n_chars"),
        floor(TextAnalysis.qualityScore(col("text")) * lit(1048576L))
          .cast("long").as("qfp"))
      graft.operators.TopK.skyline2DByGroup(d, "lang", col("n_chars"),
        col("qfp")).orderBy("lang", "doc_id")
    }),

    // Cohort LTV: weekly cohorts × offset weeks with exact-cents
    // revenue, cumulative per cohort, normalized per user — the value
    // read on top of q110's retention counts.
    "q274_cohort_ltv" -> ((s, dir) => {
      val ev = graft.io.TableIO.eventsNanos(s, dir)
        .select(col("user_id"), graft.functions.floorDivLit(col("ts"), 86400000000000L).as("__d"),
          floor(col("value") * lit(100.0)).cast("long").as("__c"))
      val first = ev.groupBy("user_id").agg(min(col("__d")).as("__f"))
      // FLOOR, not DIV: __f (a user's first epoch-day) can be negative
      // for pre-epoch events, and the oracle's `//` floors.
      val sized = first.withColumn("cohort",
        graft.functions.floorDivLit(col("__f"), 7L))
      val cohortUsers = sized.groupBy("cohort")
        .agg(count(lit(1)).as("cohort_users"))
      val cells = ev.join(sized, "user_id")
        .withColumn("offset", expr("(__d - __f) DIV 7"))
        .groupBy("cohort", "offset")
        .agg(sum(col("__c")).as("revenue_cents"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("cohort").orderBy("offset")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      cells
        .withColumn("cum_cents", sum(col("revenue_cents")).over(wCum))
        .join(cohortUsers, "cohort")
        .withColumn("ltv_per_user_cents",
          col("cum_cents").cast("double") /
            col("cohort_users").cast("double"))
        .select("cohort", "offset", "revenue_cents", "cum_cents",
          "cohort_users", "ltv_per_user_cents")
        .orderBy("cohort", "offset")
    }),

    // Dedup-aware sampling: one canonical doc per wide-tier cluster,
    // priority-sampled with weight = CLUSTER SIZE — the sample that
    // preserves pre-dedup mass (a 50-copy template counts as 50, not
    // 1) while never emitting a duplicate.
    "q275_dedup_aware_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhashPairsWide(docs, "doc_id", "text",
        maxHamming = 3).select("i", "j")
      val clusters = graft.operators.Components.dedupClusters(docs,
        "doc_id", pairs)
      val canon = clusters.filter(col("is_canonical") === 1L)
        .select(col("doc_id"), col("n_members"))
      Sampling.prioritySample(canon, "doc_id", "n_members", k = 30)
        .orderBy("rank")
    }),

    // Audience overlap between event types: shared distinct users per
    // type pair with Jaccard and both conditional shares — "do viewers
    // purchase", the cross-surface read.
    "q276_audience_overlap" -> ((s, dir) => {
      val au = graft.io.TableIO.eventsNanos(s, dir)
        .select(col("event_type").as("__t"), col("user_id").as("__u"))
        .distinct()
      val sz = au.groupBy("__t").agg(count(lit(1)).as("__n"))
      val a = au.select(col("__t").as("type_a"), col("__u"))
      val b = au.select(col("__t").as("type_b"), col("__u"))
      a.join(b, "__u").filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("overlap"))
        .join(sz.select(col("__t").as("type_a"), col("__n").as("users_a")),
          "type_a")
        .join(sz.select(col("__t").as("type_b"), col("__n").as("users_b")),
          "type_b")
        .select(col("type_a"), col("type_b"), col("users_a"),
          col("users_b"), col("overlap"),
          (col("overlap").cast("double") /
            (col("users_a") + col("users_b") - col("overlap"))
              .cast("double")).as("jaccard"),
          (col("overlap").cast("double") / col("users_a").cast("double"))
            .as("share_of_a"),
          (col("overlap").cast("double") / col("users_b").cast("double"))
            .as("share_of_b"))
        .orderBy("type_a", "type_b")
    }),

    // Bitemporal AS-OF snapshots off the SCD2 history: every user's
    // state at min_ts + 10 days and + 25 days — reproducible time
    // travel over row histories, two snapshots from one version table.
    "q270_bitemporal_asof" -> ((s, dir) => {
      val ev = graft.io.TableIO.eventsNanos(s, dir)
      val hist = graft.operators.Cdc.scd2(ev, "user_id", "event_type",
        "ts", "event_id")
      val t0 = ev.agg(min(col("ts")).as("__t0"))
      def snap(offsetDays: Long) = {
        val at = col("__t0") + lit(offsetDays * 86400000000000L)
        hist.crossJoin(broadcast(t0))
          .filter(col("valid_from") <= at &&
            (col("valid_to").isNull || at < col("valid_to")))
          .select(lit(offsetDays).as("as_of_day"), col("user_id"),
            col("version"), col("event_type").as("state"))
      }
      snap(10L).unionByName(snap(25L)).orderBy("as_of_day", "user_id")
    }),

    // Class-separation matrix: cosine between label CENTROIDS in
    // embedding space — high inter-centroid cosine predicts confusion
    // for any nearest-centroid consumer and flags label noise before
    // training does. Centroid-sized arithmetic only.
    "q271_class_separation" -> ((s, dir) =>
      graft.operators.EmbeddingStats.classSeparation(
        t(s, dir, "embeddings"), "embedding", "label")
        .orderBy("label_a", "label_b")),

    // Near-dup EVIDENCE: for each wide-tier pair, the shared-shingle
    // count and the rarest shared shingle (the most distinctive
    // witness) — the "why are these duplicates" diagnostic a human
    // reviewer reads before trusting a dedup tier.
    "q272_dup_evidence" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhashPairsWide(docs, "doc_id", "text",
        maxHamming = 2).select("i", "j")
      val sh = graft.operators.CacheScope.track(docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.shingles(
          graft.functions.tokens(col("text")), 2))).as("s")))
      val df = sh.groupBy("s").agg(count(lit(1)).as("__df"))
      val shared = pairs
        .join(sh.select(col("doc_id").as("i"), col("s")), "i")
        .join(sh.select(col("doc_id").as("j"), col("s")), Seq("j", "s"))
        .join(df, "s")
      shared.groupBy("i", "j")
        .agg(count(lit(1)).as("n_shared"),
          min(struct(col("__df"), col("s"))).getField("__df")
            .as("witness_df"),
          min(struct(col("__df"), col("s"))).getField("s").as("witness"))
        .join(pairs, Seq("i", "j"), "right")
        .select(col("i"), col("j"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          col("witness_df"), col("witness"))
        .orderBy("i", "j")
    }),

    // Incremental connected components: the dup-graph labeling
    // maintained under a NEW edge batch via star edges — work ∝ batch,
    // never the historical pair set; gate = the full-recompute labels.
    "q273_incr_cc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val all = graft.operators.CacheScope.track(
        Dedup.simhashPairsWide(docs, "doc_id", "text", maxHamming = 3)
          .select("i", "j"))
      val oldPairs = all.filter(col("j") < 400)
      val newPairs = all.filter(col("j") >= 400)
      val oldLabels = graft.operators.Components
        .connectedComponents(oldPairs, "i", "j")
      graft.operators.Components
        .incrementalComponents(oldLabels, newPairs, "i", "j")
        .orderBy("id")
    }),

    // Offline changepoint by binary segmentation: the day whose
    // two-segment fit minimizes total SSE — "when did the level
    // actually shift", where q201's CUSUM is the online alarm.
    "q266_changepoint" -> ((s, dir) =>
      graft.operators.EventAnalytics.binaryChangepoint(
        graft.io.TableIO.eventsNanos(s, dir),
        graft.functions.floorDivLit(col("ts"), 86400000000000L))),

    // RFM segmentation: per-user recency/frequency/monetary quartile
    // codes (tie-stable value-ntiles) histogrammed into segments — the
    // classic engagement read, exact cents for monetary.
    "q267_rfm" -> ((s, dir) => {
      val ev = graft.io.TableIO.eventsNanos(s, dir)
      val perUser = ev.groupBy(col("user_id"))
        .agg(max(graft.functions.floorDivLit(col("ts"), 86400000000000L)).as("__last"),
          count(lit(1)).as("frequency"),
          sum(floor(col("value") * lit(100.0)).cast("long")).as("monetary"))
      val hz = perUser.agg(max(col("__last")).as("__h"))
      val rfm = perUser.crossJoin(broadcast(hz))
        .withColumn("recency", col("__h") - col("__last"))
        .withColumn("__g", lit(1))
      val coded = Seq("recency", "frequency", "monetary")
        .foldLeft(rfm)((d, c) =>
          graft.operators.ExactQuantiles.valueNtile(d, "__g", c, 4))
      coded.groupBy(col("recency_bucket").as("r"),
        col("frequency_bucket").as("f"), col("monetary_bucket").as("m"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("r", "f", "m")
    }),

    // Degree assortativity of the co-engagement graph: do hubs attach
    // to hubs (positive) or to leaves (negative)? Both orientations per
    // edge, exact sufficient statistics, one sqrt.
    "q268_assortativity" -> ((s, dir) =>
      graft.operators.Triangles.assortativity(
        graft.operators.Cooccur.coEngagementPairs(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxDegree = 6),
        "item_a", "item_b").orderBy("n_edges")),

    // Graph robustness: giant-component size before vs after removing
    // the top-5 degree hubs — how much connectivity the hubs carry; the
    // percolation read behind "is this dup graph one blob or many".
    "q269_hub_removal" -> ((s, dir) => {
      val edges = graft.operators.CacheScope.track(
        graft.operators.Cooccur.coEngagementPairs(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxDegree = 6)
          .select(col("item_a"), col("item_b")))
      val sym = edges.union(edges.select(col("item_b"), col("item_a")))
      // count ≡ count_distinct here: unique a<b pairs symmetrized (see
      // the graphHealthCheck note) — saves the second dedup shuffle
      val deg = sym.groupBy(col("item_a").as("node"))
        .agg(count(col("item_b")).as("deg"))
      val hubs = deg.orderBy(desc("deg"), col("node")).limit(5)
        .select(col("node").as("__hub"))
      def giant(e: DataFrame) = graft.operators.Components
        .connectedComponents(e, "item_a", "item_b")
        .groupBy("component").agg(count(lit(1)).as("__sz"))
        .agg(coalesce(max(col("__sz")), lit(0L)).as("g"),
          coalesce(sum(col("__sz")), lit(0L)).as("n"))
      val filtered = edges
        .join(broadcast(hubs), col("item_a") === col("__hub"), "left_anti")
        .join(broadcast(hubs), col("item_b") === col("__hub"), "left_anti")
      giant(edges)
        .select(col("n").as("n_nodes"), col("g").as("giant_before"))
        .crossJoin(giant(filtered)
          .select(col("g").as("giant_after")))
        .withColumn("retained",
          when(col("giant_before") > 0L,
            col("giant_after").cast("double") /
              col("giant_before").cast("double")))
    }),

    // Join-strategy ADVISOR: skew report + coordinated-sample join-size
    // estimate + build-side cardinality composed into one verdict row —
    // broadcast when the build side fits, salt when the probe side's
    // hot key breaks the reducer budget, shuffle otherwise; the
    // planning read an engine does from stats, surfaced as data.
    "q259_join_advisor" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ords = t(s, dir, "orders")
      val sk = graft.operators.Skew.skewReport(li, "l_orderkey",
        partitions = 32)
      val est = graft.operators.Sketch.joinSizeEstimate(li,
        ords.select(col("o_orderkey").as("l_orderkey")), "l_orderkey",
        rate = 8)
      val rb = ords.agg(count(lit(1)).as("rows_b"))
      sk.select(col("n_rows").as("rows_a"), col("n_keys"), col("max_cnt"),
        col("max_key"), col("skew_ratio"), col("salt_factor"))
        .crossJoin(broadcast(rb))
        .crossJoin(broadcast(est.select("est_join_rows")))
        .withColumn("strategy",
          when(col("rows_b") <= 100000L, "broadcast_b")
            .when(col("skew_ratio") > 8.0, "salted_shuffle")
            .otherwise("shuffle"))
        .withColumn("recommended_salt",
          when(col("strategy") === "salted_shuffle", col("salt_factor"))
            .otherwise(lit(1L)))
        .orderBy("rows_a")
    }),

    // SNAPSHOT RETENTION, end-to-end on a staged fixture (round-10
    // task: the vacuum sweep was unit-only): publish four versions of
    // a documents projection, simulate a vacuum that crashed between
    // marker-delete and dir-delete (v1's marker gone, dir left — the
    // orphan class TableIO.vacuumSnapshots defines), sweep with
    // keep=2, then report per-version verdicts DERIVED from the actual
    // post-sweep filesystem state — a protocol bug (wrong version
    // swept, orphan left, current clobbered) surfaces as an
    // UNEXPECTED status or a wrong retained count, and the retained
    // counts cross-check content against DuckDB on the source table.
    // Fixture-local: stages to a fresh temp dir per call; the protocol
    // itself is O(versions) driver-side metadata ops regardless of SF.
    "q290_snapshot_retention" -> ((s, dir) => {
      import s.implicits._
      val td = java.nio.file.Files
        .createTempDirectory("graft_snapfix_").toString + "/docs"
      val docs = t(s, dir, "documents")
      graft.io.TableIO.publishSnapshot(
        docs.filter(col("doc_id") < 100).select("doc_id", "lang"), td)
      graft.io.TableIO.publishSnapshot(
        docs.filter(col("doc_id") < 200).select("doc_id", "lang"), td)
      graft.io.TableIO.publishSnapshot(
        docs.filter(col("doc_id") < 300)
          .select("doc_id", "lang", "n_chars"), td)
      graft.io.TableIO.publishSnapshot(
        docs.select("doc_id", "lang", "n_chars", "source"), td)
      val fs = new org.apache.hadoop.fs.Path(td)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      // crashed earlier vacuum: marker deleted first, dir left behind
      fs.delete(new org.apache.hadoop.fs.Path(s"$td/_commits/1"), false)
      val removed = graft.io.TableIO.vacuumSnapshots(s, td, keep = 2)
      def statusOf(v: Long): String = {
        val dataGone = !fs.exists(new org.apache.hadoop.fs.Path(s"$td/v=$v"))
        val committed =
          fs.exists(new org.apache.hadoop.fs.Path(s"$td/_commits/$v"))
        val cur = graft.io.TableIO.currentVersion(s, td).contains(v)
        if (removed.contains(v) && dataGone && !committed)
          if (v == 1L) "swept_orphan" else "swept_expired"
        else if (committed && cur) "retained_current"
        else if (committed) "retained"
        else "UNEXPECTED"
      }
      // materialize every verdict/count BEFORE deleting the fixture: the
      // result is 4 rows of scalars, so collecting here lets the temp
      // tree's lifetime end inside this builder (ADVICE r10: repeated
      // bench/verify runs accumulated leaked fixture dirs under /tmp).
      // n_langs is the round-11 derived-content column: distinct langs
      // read back from the SURVIVING snapshot's parquet, which DuckDB
      // re-derives from the source table — a vacuum that corrupts
      // retained content now breaks two columns, not one.
      val content: Map[Long, (Long, Long)] = Seq(3L, 4L).map { v =>
        val df = graft.io.TableIO.readPublished(s, td, version = Some(v))
        v -> (df.count(), df.select("lang").distinct().count())
      }.toMap
      val rows = Seq(1L, 2L, 3L, 4L).map { v =>
        (v, statusOf(v), content.get(v).map(_._1), content.get(v).map(_._2))
      }
      fs.delete(new org.apache.hadoop.fs.Path(td).getParent, true)
      rows.toDF("version", "status", "n_rows", "n_langs")
        .orderBy("version")
    }),

    // FOOTER SCHEMA-DIFF between committed snapshots, gated (round-10
    // task: snapshotSchemaDiff was unit-only): v1 and v2 are staged
    // with a removed column, an added column, and a retype, and the
    // diff — computed from the published parquet FOOTERS, no data read
    // — must report exactly those three rows; the to-version row count
    // ties the fixture's content back to the source table cross-engine.
    "q291_schema_evolution" -> ((s, dir) => {
      val td = java.nio.file.Files
        .createTempDirectory("graft_snapfix_").toString + "/docs"
      val docs = t(s, dir, "documents")
      graft.io.TableIO.publishSnapshot(
        docs.select("doc_id", "lang", "n_chars"), td)
      graft.io.TableIO.publishSnapshot(
        docs.select(col("doc_id"), col("source"),
          col("n_chars").cast("double").as("n_chars")), td)
      // collect the diff + content checks, then delete the fixture tree
      // (ADVICE r10 leak fix, same discipline as q290). n_to_sources is
      // the round-11 derived-content column: distinct values of the
      // ADDED column read back from the published v2 parquet, which
      // DuckDB re-derives from the source table.
      val toDf = graft.io.TableIO.readPublished(s, td, version = Some(2L))
      // round-12 derived-content depth: the ADDED column's null count
      // and the RETYPED column's exact sum (integer-valued doubles,
      // total << 2^53, so the double sum is order-independent and
      // cross-engine exact), both read back from the published v2
      // parquet and re-derived by DuckDB from the source table — a
      // publish that drops values, nulls a column, or mangles the
      // retype now breaks four content columns, not two.
      val contentRow = toDf.agg(
        count(lit(1)).as("n"),
        countDistinct(col("source")).as("ns"),
        count(when(col("source").isNull, 1)).as("nnull"),
        sum(col("n_chars")).cast("long").as("csum")).head()
      val (nTo, nToSources, nToNullSource, toCharsSum) =
        (contentRow.getLong(0), contentRow.getLong(1),
          contentRow.getLong(2), contentRow.getLong(3))
      val diffRows = graft.io.TableIO.snapshotSchemaDiff(s, td, 1L, 2L)
        .select("column", "from_type", "to_type", "change").collect()
        .map(r => (r.getString(0), Option(r.getString(1)),
          Option(r.getString(2)), r.getString(3), nTo, nToSources,
          nToNullSource, toCharsSum)).toSeq
      val fs = new org.apache.hadoop.fs.Path(td)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(td).getParent, true)
      import s.implicits._
      diffRows.toDF("column", "from_type", "to_type", "change",
        "n_to_rows", "n_to_sources", "n_to_null_source", "to_chars_sum")
        .orderBy("column")
    }),

    // Greedy longest-match (WordPiece-inference) tokenization under a
    // FROZEN vocab — the APPLY side of the tokenizer family (q92–q94
    // train; this is what serving pays per doc). The vocab deliberately
    // overlaps ("ta"/"tab"/"table"-style prefixes) so the gate tests
    // the longest-wins decision, not just membership; per-doc token/
    // UNK counts are exact integers, fertility one division.
    "q292_maxmatch_tokens" -> ((s, dir) =>
      graft.operators.Bpe.maxMatchTokenCount(t(s, dir, "documents"),
        "doc_id", "text", maxMatchVocab)
        .withColumn("fertility", when(col("n_words") > 0,
          col("n_tokens").cast("double") / col("n_words").cast("double")))
        .orderBy("doc_id")),

    // HLL MERGEABILITY, gated: elementwise-max of per-SOURCE register
    // sketches must equal the global sketch built in one pass — THE
    // property that lets 1000 executors sketch shards independently
    // and combine at the driver (and lets yesterday's sketch absorb
    // today's without rescanning). The gate pins both register vectors
    // bit-for-bit, their equality, and the merged estimate against the
    // exact global distinct count.
    "q293_sketch_merge" -> ((s, dir) => {
      val items = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("source"), col("text").as("t"))
      val perSrc = graft.operators.Sketch.hllRegisterTable(
        items, "source", "t", b = 4)
      val merged = perSrc
        .select(posexplode(col("regs")).as(Seq("b", "r")))
        .groupBy("b").agg(max(col("r")).as("r"))
        .agg(transform(
          array_sort(collect_list(struct(col("b"), col("r")))),
          x => x.getField("r")).as("mregs"))
      val globalR = graft.operators.Sketch.hllRegisterTable(
          items.withColumn("__g", lit(1)), "__g", "t", b = 4)
        .select(col("regs").as("gregs"))
      val exact = items.agg(countDistinct(col("t")).as("n_exact"))
      merged.crossJoin(globalR).crossJoin(exact)
        .select(
          array_join(col("mregs").cast("array<string>"), ",")
            .as("merged_regs"),
          array_join(col("gregs").cast("array<string>"), ",")
            .as("global_regs"),
          (col("mregs") === col("gregs")).as("mergeable"),
          graft.operators.Sketch.hllEstimate("mregs", b = 4).as("est"),
          col("n_exact"))
        .orderBy("merged_regs")
    }),

    // DSIR importance-resampling weights (Xie et al. 2023, rational
    // form): hashed-bigram bucket likelihood ratios against the
    // lang='en' TARGET slice, quantized to 2^20 fixed point — the
    // distributional quality filter that runs next to q26's per-doc
    // heuristic gate. One corpus pass, a bounded 256-row broadcast
    // weight table, exact-integer per-doc sums, one final division.
    "q294_dsir_weights" -> ((s, dir) =>
      graft.operators.Selection.dsirWeights(
        t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", n = 2, buckets = 256)
        .orderBy("doc_id")),

    // Exact Wasserstein-1 length drift, each source vs the rest: the
    // metric-aware complement to q140's TVD (a 1-char and a 1000-char
    // length shift have equal TVD but 1000x different W1). Integer
    // cross-multiplied CDFs over the merged support — DECIMAL(38,0)
    // numerators, one integral division quantized to 2^30, no float
    // ever aggregated.
    "q295_wasserstein_drift" -> ((s, dir) =>
      graft.operators.Profiling.wasserstein1PerGroup(
        t(s, dir, "documents"), "source", col("n_chars"))
        .orderBy("source")),

    // Implicit pairwise preferences: per-user event-type spend decides
    // each head-to-head (the win-matrix derivation an RLHF/eval stack
    // runs when only scores exist, no explicit A/B labels). Exact:
    // integer cents, subject-local self-join bounded by the type
    // domain, ties reported but never counted as decided.
    "q296_pairwise_wins" -> ((s, dir) =>
      graft.operators.Preference.pairwiseWins(
        graft.io.TableIO.eventsNanos(s, dir), "user_id", "event_type",
        floor(col("value") * lit(100.0)).cast("long"))
        .orderBy("item_a", "item_b")),

    // Bradley-Terry strengths over q296's win matrix: 8 Hunter-MM
    // Jacobi rounds in 2^20 fixed point with 2^40-scaled integral
    // divisions — the Elo-leaderboard fit, bit-reproducible where a
    // float MM loop is summation-order-dependent. The corpus-sized
    // work is the win matrix; the fit runs on the bounded |types|^2
    // table (k-means-centroid collect discipline).
    "q297_bradley_terry" -> ((s, dir) =>
      graft.operators.Preference.bradleyTerryStrengths(
        graft.operators.Preference.pairwiseWins(
          graft.io.TableIO.eventsNanos(s, dir), "user_id", "event_type",
          floor(col("value") * lit(100.0)).cast("long")),
        "item_a", "item_b", "wins_a", "wins_b", iters = 8)
        .orderBy("item")),

    // q292's production-size successor (the round-10 verdict's top
    // task): the SAME greedy longest-match semantics under a
    // fuzz-generated 5k+-unit vocab, tokenized via the broadcast
    // prefix-table JOIN (maxMatchTokenCountJoined) — the vocab rides
    // the plan as a staged relation, not a literal array, so the
    // per-word cost is flat in |vocab|. The oracle replays the walk as
    // a recursive CTE against its own copy of the vocab; n_vocab pins
    // the staged relation's cardinality cross-engine.
    "q298_maxmatch_joined" -> ((s, dir) => {
      import s.implicits._
      val vocabDf = maxMatchVocab5k.toDF("unit")
      val nv = broadcast(vocabDf.agg(count(lit(1)).as("n_vocab")))
      graft.operators.Bpe.maxMatchTokenCountJoined(t(s, dir, "documents"),
        "doc_id", "text", vocabDf, "unit")
        .withColumn("fertility", when(col("n_words") > 0,
          col("n_tokens").cast("double") / col("n_words").cast("double")))
        .crossJoin(nv)
        .orderBy("doc_id")
    }),

    // DSIR TRAIN/APPLY SPLIT, gated cross-engine (round-10 task: the
    // frozen-weight path was streaming-unit-only): train the dense
    // 256-bucket weight vector on the EVEN-doc_id slice, export it as
    // the bounded artifact (256 longs — the deployment shape: ship the
    // vector, never the corpus), then score the DISJOINT odd-doc_id
    // batch with dsirScoreWith's frozen-literal lookup. The oracle
    // re-derives the same weights from the same slice and replays the
    // scoring, so a train/apply drift (smoothing applied differently at
    // export vs training, a bucket off-by-one in the dense fill) breaks
    // the hash. Disjointness matters: odd docs hit buckets the training
    // slice never saw, exercising the smoothed-prior rows of the dense
    // vector that q294's self-scoring never touches.
    "q299_dsir_frozen_apply" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val weights = graft.operators.Selection.dsirBucketWeights(
          docs.filter(col("doc_id") % 2 === 0), "text",
          col("lang") === "en", n = 2, buckets = 256)
        .orderBy("bucket").select("w_fp").collect().map(_.getLong(0))
      graft.operators.Selection.dsirScoreWith(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          weights, n = 2)
        .orderBy("doc_id")
    }),

    // Bradley-Terry from EXPLICIT comparisons (round-10 task: q296/q297
    // derive implicit wins from scores, but real RLHF data arrives as
    // (winner, loser) rows): stage one decided-comparison row per
    // subject head-to-head (ties produce NO row, matching annotator
    // behavior), aggregate with winMatrixFromComparisons' unordered-key
    // normalize, fit the same 8 Hunter-MM rounds. Strengths and
    // per-item comparison counts must land bit-identical to the
    // implicit path's on this data — the oracle re-derives through the
    // explicit shape, so a normalize bug (least/greatest swap, a
    // dropped tie) breaks the hash.
    // Prompt PREFIX-SHARING stats at five probe depths — the corpus
    // measurement behind inference-time prefix caching (how much KV
    // recompute a one-resident-copy cache saves is a property of the
    // prompt corpus, and sizing the cache starts here). One scan
    // computes every depth's first-d-token hash; one (depth, hash)
    // hash-aggregate; |depths| output rows.
    "q302_prefix_sharing" -> ((s, dir) =>
      graft.operators.PrefixCache.prefixSharingStats(
        t(s, dir, "documents"), "doc_id", "text", Seq(1, 2, 4, 8, 16))
        .orderBy("depth")),

    // Unbiased pass@k (Chen et al. 2021) per task from per-sample
    // pass/fail rows — the code-eval headline metric: tasks = users,
    // a sample passes when its value clears 50.0, k = 5. Exact
    // falling-factorial products in DECIMAL(38,0), one 2^30 integral
    // quantization; the oracle replays the identical products in
    // HUGEINT.
    "q303_pass_at_k" -> ((s, dir) =>
      graft.operators.Evaluation.passAtK(
        graft.io.TableIO.eventsNanos(s, dir).withColumn(
          "__task", col("user_id")),
        "__task", col("value") >= 50.0, k = 5)
        .withColumnRenamed("__task", "task")
        .orderBy("task")),

    // FULL TOKENIZER LIFECYCLE in one gate: train BPE on the corpus
    // (q92/q93's 8 merge rounds), freeze the learned subword vocabulary
    // as the artifact, and APPLY it with the broadcast prefix-table
    // MaxMatch — train → freeze → serve, the loop a real pipeline ships
    // (q298 proves the joined matcher under a synthetic vocab; this
    // proves it under a LEARNED, corpus-derived one, maxTokenLen and
    // all). WordPiece-style greedy inference over BPE units is the
    // standard serving approximation — counts are NOT q94's exact BPE
    // segmentation, and that's the point: this is what serving pays.
    "q301_tokenizer_lifecycle" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = graft.operators.Bpe.subwordVocab(docs, "text",
        numMerges = 8).select(col("subword").as("unit"))
      graft.operators.Bpe.maxMatchTokenCountJoined(docs, "doc_id",
        "text", vocab, "unit")
        .orderBy("doc_id")
    }),

    "q300_bt_explicit" -> ((s, dir) => {
      val per = graft.io.TableIO.eventsNanos(s, dir)
        .groupBy(col("user_id").as("s"), col("event_type").as("i"))
        .agg(sum(floor(col("value") * lit(100.0)).cast("long")).as("m"))
      val cmp = per.select(col("s"), col("i").as("w"), col("m").as("mw"))
        .join(per.select(col("s"), col("i").as("l"), col("m").as("ml")),
          "s")
        .filter(col("w") =!= col("l") && col("mw") > col("ml"))
        .select(col("w").as("winner"), col("l").as("loser"))
      graft.operators.Preference.bradleyTerryStrengths(
        graft.operators.Preference.winMatrixFromComparisons(
          cmp, "winner", "loser"),
        "item_a", "item_b", "wins_a", "wins_b", iters = 8)
        .orderBy("item")
    }),

    // ROUGE-N generation eval (Lin 2004) with CLIPPED counts — the
    // summarization/generation quality gate a model-eval harness runs
    // over (candidate, reference) pairs. Pairing here is deterministic
    // from the corpus (odd doc = candidate, its even predecessor =
    // reference); both ROUGE-1 and ROUGE-2 ride one result with an `n`
    // column. Gram identity is the literal token string (q87's
    // discipline — no hash caveat), metrics are one 2^20 closing
    // integral division each.
    "q304_rouge_n" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("pair_id"), col("text").as("cand"))
        .join(docs.select((col("doc_id") + 1).as("pair_id"),
          col("text").as("ref")), Seq("pair_id"))
      Seq(1, 2).map(n =>
        graft.operators.GenerationEval.rougeN(
          pairs, "pair_id", "cand", "ref", n)
          .withColumn("n", lit(n.toLong)))
        .reduce(_ unionByName _)
        .orderBy("n", "pair_id")
    }),

    // Speculative-decoding DRAFT ACCEPTANCE: train the greedy bigram
    // draft table (mode next token per context, ties to min lex —
    // deterministic) and measure per-doc in-sample acceptance — the
    // sizing read for n-gram draft models (expected accepted drafts =
    // acceptance × positions decides whether the draft pays). Counts
    // exact BIGINTs, the rate one 2^20 integral division.
    "q305_draft_acceptance" -> ((s, dir) =>
      graft.operators.NgramLm.draftAcceptance(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // CONFIDENT-LEARNING label-noise estimate (Northcutt 2021): the
    // (noisy, latent-true) joint over a deterministic 3-class fixture
    // with REAL label noise — a Knuth-hash true class c* carries a
    // +2^19 confidence bonus over 2^18 hash noise (confidences track
    // the latent truth), and ~10% of docs ship with the label FLIPPED
    // to (c*+1) mod 3. Flipped rows have low self-confidence under
    // their noisy label but clear c*'s threshold, so they land in
    // off-diagonal cells — the label-error estimate the operator
    // exists to produce. Thresholds compare by BIGINT
    // cross-multiplication; no division anywhere.
    "q306_confident_joint" -> ((s, dir) => {
      val h = (x: Column) => pmod(
        pmod(x, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))
      val cstar = (h(col("doc_id")) % 3).cast("int")
      val scored = t(s, dir, "documents").select(col("doc_id"),
        when(pmod(h(col("doc_id") * 7), lit(10L)) === 0L,
          (cstar + 1) % 3).otherwise(cstar).as("y"),
        transform(sequence(lit(0), lit(2)), j =>
          pmod(h(col("doc_id") * 3 + j), lit(262144L)) +
            when(j === cstar, lit(524288L)).otherwise(lit(0L))).as("p"))
      graft.operators.Supervision.confidentJoint(scored, "y", "p", 3)
        .orderBy("noisy_label", "est_label")
    }),

    // VITERBI (unigram-LM) segmentation under the frozen 5k scored
    // vocab — the SentencePiece-inference twin of q298's greedy
    // MaxMatch: same candidate machinery, but each word takes its
    // GLOBALLY best-scoring segmentation (max score, then fewest
    // tokens, then fewest unks — all-integer DP, oracle-replayed
    // step-for-step by a recursive CTE carrying the best[] list).
    "q307_viterbi_tokens" -> ((s, dir) => {
      import s.implicits._
      val vdf = viterbiScoredVocab.toDF("unit", "score_q")
      graft.operators.Bpe.viterbiTokenCount(
        t(s, dir, "documents"), "doc_id", "text",
        vdf, "unit", "score_q", viterbiUnkScoreQ)
        .orderBy("doc_id")
    }),

    // ROUGE-L over the q304 pair set: LCS-based order-sensitive
    // generation eval through the native codegen'd LcsTokenLength
    // kernel — the whole query is ONE pure projection over the pair
    // join (no explode, no aggregate); both sides truncated to 128
    // tokens (the stated quadratic-kernel bound).
    "q308_rouge_l" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("pair_id"), col("text").as("cand"))
        .join(docs.select((col("doc_id") + 1).as("pair_id"),
          col("text").as("ref")), Seq("pair_id"))
      graft.operators.GenerationEval.rougeL(
        pairs, "pair_id", "cand", "ref", maxTokens = 128)
        .orderBy("pair_id")
    }),

    // SELF-CONSISTENCY majority vote (Wang 2022): tasks = users, each
    // task's EARLIEST event (total (ts, event_id) order) is the gold
    // answer, the rest are samples; answers are exact-cent buckets
    // mod 7 (pmod — floor-mod on both engines). The modal answer with
    // min-value tie-break is the consensus; is_correct the headline.
    "q309_self_consistency" -> ((s, dir) => {
      val ev = graft.io.TableIO.eventsNanos(s, dir)
        .withColumn("__ans",
          pmod(floor(col("value") * 100.0).cast("long"), lit(7L)))
      val w0 = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val ranked = ev.withColumn("__rn", row_number().over(w0))
      graft.operators.Evaluation.majorityVoteAccuracy(
        ranked.filter(col("__rn") > 1).select(col("user_id"), col("__ans")),
        "user_id", "__ans",
        ranked.filter(col("__rn") === 1)
          .select(col("user_id"), col("__ans").as("gold_ans")),
        "gold_ans")
        .orderBy("user_id")
    }),

    // BLEU with multi-reference clipping (Papineni 2002): candidates =
    // every 7th doc (every 14th truncated to its first 3 tokens — the
    // NULL-gm short-candidate path), references = the two following
    // docs. Exact per-order num/den BIGINTs; geometric mean via the
    // sqrt-only 2^10-quantized form (IEEE sqrt is correctly rounded on
    // both engines); brevity components (c, r, bp_applies) exact.
    "q310_bleu" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tk = graft.operators.TextAnalysis.tokens(
        coalesce(col("text"), lit("")))
      val cands = docs.filter(col("doc_id") % 7 === 1)
        .select(col("doc_id").as("pair_id"),
          when(col("doc_id") % 14 === 1, concat_ws(" ", slice(tk, 1, 3)))
            .otherwise(col("text")).as("cand"))
      val refs = Seq(1, 2).map(o =>
          docs.select((col("doc_id") - o).as("pair_id"),
            lit(o.toLong).as("ref_id"), col("text").as("ref")))
        .reduce(_ unionByName _)
        .join(cands.select("pair_id"), Seq("pair_id"))
      graft.operators.GenerationEval.bleu(
        cands, "pair_id", "cand", refs, "ref_id", "ref")
        .orderBy("pair_id")
    }),

    // Corpus-level BLEU off the same per-candidate rows: per-order
    // numerators/denominators and brevity lengths pool over the corpus
    // before dividing (the form Papineni 2002 defines — short segments
    // cannot zero the geometric mean).
    "q311_bleu_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tk = graft.operators.TextAnalysis.tokens(
        coalesce(col("text"), lit("")))
      val cands = docs.filter(col("doc_id") % 7 === 1)
        .select(col("doc_id").as("pair_id"),
          when(col("doc_id") % 14 === 1, concat_ws(" ", slice(tk, 1, 3)))
            .otherwise(col("text")).as("cand"))
      val refs = Seq(1, 2).map(o =>
          docs.select((col("doc_id") - o).as("pair_id"),
            lit(o.toLong).as("ref_id"), col("text").as("ref")))
        .reduce(_ unionByName _)
        .join(cands.select("pair_id"), Seq("pair_id"))
      graft.operators.GenerationEval.bleuCorpus(
        graft.operators.GenerationEval.bleu(
          cands, "pair_id", "cand", refs, "ref_id", "ref"))
        .orderBy("n_pairs")
    }),

    // chrF per-order components (Popović 2015): tokenization-free
    // character n-gram overlap, orders 1..6 over whitespace-stripped
    // text, same doc pairing as q304. β=2 F collapses to ONE exact
    // rational (5·o/(4r+c)) per order — BIGINTs into one 2^20
    // integral division, no transcendentals at all.
    "q312_chrf_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("pair_id"), col("text").as("cand"))
        .join(docs.select((col("doc_id") + 1).as("pair_id"),
          col("text").as("refx")), Seq("pair_id"))
      graft.operators.GenerationEval.chrFComponents(
        pairs, "pair_id", "cand", "refx")
        .orderBy("k", "pair_id")
    }),

    // Headline per-pair chrF2: quantize-then-average over EFFECTIVE
    // orders (both-sides-empty orders don't count — the sacrebleu
    // convention), one further exact integral division.
    "q313_chrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("pair_id"), col("text").as("cand"))
        .join(docs.select((col("doc_id") + 1).as("pair_id"),
          col("text").as("refx")), Seq("pair_id"))
      graft.operators.GenerationEval.chrF(
        pairs, "pair_id", "cand", "refx")
        .orderBy("pair_id")
    }),

    // GRPO group-normalized advantages (Shao 2024): each user's events
    // are one prompt group, rewards the exact integer cents; the
    // advantage is (n·x − Σx)/√(n·Σx² − (Σx)²) — integer numerator and
    // radicand, one correctly-rounded sqrt + division, exact 2²⁰
    // exponent shift, floor. Constant groups surface NULL, not an
    // ε-fudged number.
    "q314_grpo_advantages" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      graft.operators.Preference.groupNormalizedAdvantages(
        ev, "user_id", "event_id", floor(col("value") * 100.0))
        .orderBy("user_id", "event_id")
    }),

    // MBR consensus selection (Kumar & Byrne 2004 / Bertsch 2023):
    // 16-doc blocks stand in for one task's sampled generations; the
    // chosen sample maximizes summed unigram-multiset F1 to its
    // siblings (score DESC, sample ASC — deterministic). Pairwise
    // scores are exact 2²⁰ integral divisions, the MBR score their
    // exact integer sum.
    "q315_mbr_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("task_id", graft.functions.floorDivLit(
          col("doc_id"), 16L))
      graft.operators.GenerationEval.mbrSelect(
        docs, "task_id", "doc_id", "text")
        .orderBy("task_id")
    }),

    // Best-of-N scaling curve (Nakano 2021 App. B): per user the
    // unbiased E[max reward over N fresh samples] for N = 1..4 —
    // binomials cancel to falling factorials (the q303 pass@k
    // discipline), rewards min-shifted so the one closing division is
    // over nonnegatives, DECIMAL(38,0)/HUGEINT exact throughout.
    "q316_bon_curve" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      graft.operators.Preference.bestOfNCurve(
        ev, "user_id", floor(col("value") * 100.0), maxN = 4)
        .orderBy("user_id", "n_draws")
    }),

    // DPO pair construction (Rafailov 2023): per user the
    // (chosen, rejected) = (best, worst)-reward pair under total
    // (reward, id) tie-breaks, exact integer margin, near-ties
    // (margin < 10 cents) dropped as training-signal-free.
    "q317_dpo_pairs" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      graft.operators.Preference.dpoPairs(
        ev, "user_id", "event_id", floor(col("value") * 100.0),
        minMargin = 10L)
        .orderBy("user_id")
    }),

    // GRPO train/apply split (the q299 frozen-artifact discipline):
    // moments from each user's EVEN event_ids, advantages for the
    // DISJOINT odd slice against that frozen baseline — the oracle
    // re-derives both stages, so an export/apply drift (moment column
    // swap, an inner-join silently dropping baseline-less groups)
    // breaks the hash.
    "q318_grpo_frozen_apply" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      val cents = floor(col("value") * 100.0)
      val m = graft.operators.Preference.groupMoments(
        ev.filter(col("event_id") % 2 === 0), "user_id", cents)
      graft.operators.Preference.advantagesWithMoments(
        ev.filter(col("event_id") % 2 === 1), "user_id", "event_id",
        cents, m)
        .orderBy("user_id", "event_id")
    }),

    // Exact-integer Pearson per event type between reward cents and
    // epoch day (shifted by a constant — r is exactly shift-invariant,
    // the integer moments stay comfortably under the 2⁶³ contract):
    // the monotone-drift direction audit complementing CUSUM's level
    // shifts and TVD/W1's distribution distances.
    "q319_reward_time_pearson" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      graft.operators.Profiling.pearsonByGroup(
        ev, "event_type",
        graft.functions.floorDivLit(col("ts"), 86400000000000L) - 19000L,
        floor(col("value") * 100.0))
        .orderBy("event_type")
    }),

    // Spearman rank version of q319 — tie-corrected via exact DOUBLED
    // midranks (2·rank + tiecount − 1), Pearson's affine invariance
    // doing the /2 for free; sees any monotone trend, not just linear.
    "q320_reward_time_spearman" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      graft.operators.Profiling.spearmanByGroup(
        ev, "event_type",
        graft.functions.floorDivLit(col("ts"), 86400000000000L) - 19000L,
        floor(col("value") * 100.0))
        .orderBy("event_type")
    }),

    // SFT chat-template rendering: each user's events fold in total
    // (ts, event_id) order into ONE training string with role markers,
    // plus the role-alternation integrity flag — byte-identical string
    // assembly on both engines (collect_list's arrival order laundered
    // through a full-struct sort_array).
    "q321_sft_render" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      graft.operators.SftFormat.renderConversations(
        ev, "user_id", Seq("ts", "event_id"),
        col("event_type"),
        concat(col("event_type"), lit(":"),
          floor(col("value") * 100.0).cast("string")),
        header = "<|system|>graft-sft-v1")
        .orderBy("user_id")
    }),

    // Epoch waterfilling (Muennighoff 2023's question): per-lang char
    // mass with data-derived repeat caps, one 250k budget — the level
    // t = p/q is an exact rational found by cross-multiplied bracket
    // scan; at this sf the budget lands mid-bracket, on the fuzz
    // corpus it exceeds capacity and exercises the saturate-all path.
    "q322_epoch_waterfill" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val st = docs.withColumn("src", coalesce(col("lang"), lit("zz")))
        .groupBy("src")
        .agg(sum(length(coalesce(col("text"), lit(""))))
          .cast("long").as("avail"))
        .withColumn("cap", lit(1L) + (ascii(col("src")) % 3).cast("long"))
      graft.operators.Mixing.epochWaterfill(
        st, "src", "avail", "cap", 250000L)
        .orderBy("src")
    }),

    // Stream-packing fragmentation audit: 8 independent token streams,
    // 128-token windows — per stream the boundary-crossing doc count
    // and the last-shard padding, the two numbers a contextLen choice
    // trades against each other. Same per-stream prefix-sum window as
    // the layout (q104 discipline: no global funnel), one stream-keyed
    // aggregate, 8 output rows, exact BIGINTs throughout.
    "q323_pack_fragmentation" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(coalesce(col("text"), lit("")))
          .cast("long").as("n_toks"))
      graft.operators.Packing.fragmentationAudit(
        docs, "doc_id", "n_toks", contextLen = 128L, streams = 8)
        .orderBy("stream")
    }),

    // Truncation-loss curve: if docs are clipped to L tokens instead of
    // packed, how many lose tokens and how much mass is cut, for L in
    // {16..256} — ONE corpus pass computing every candidate's
    // conditional sums in a single aggregate, then a 5-way explode of
    // the one-row result. The SFT-side complement to q323.
    "q324_truncation_curve" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        TextAnalysis.tokenCount(coalesce(col("text"), lit("")))
          .cast("long").as("n_toks"))
      graft.operators.Packing.truncationCurve(
        docs, "n_toks", Seq(16L, 32L, 64L, 128L, 256L))
        .orderBy("context_len")
    }),

    // N-gram novelty (McCoy 2021 RAVEN measurement): odd docs play the
    // generations, even docs the training corpus — per generation the
    // fraction of 3-gram occurrences not present anywhere in the
    // corpus. Corpus side reduces to its distinct-gram table, the
    // membership probe is one gram-keyed equi-join, never all-pairs.
    "q325_ngram_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.GenerationEval.ngramNovelty(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        docs.filter(col("doc_id") % 2 === 0), "text", n = 3)
        .orderBy("doc_id")
    }),

    // Square-root temperature mixture (the multilingual α=1/2 sampling
    // schedule): per-language char mass → exact integer 2²⁰-scaled
    // √mass (isqrt: double-seeded, integer-corrected — no float ever
    // aggregated) → one closing integral division per weight.
    "q326_sqrt_temperature_mix" -> ((s, dir) => {
      val st = t(s, dir, "documents")
        .withColumn("src", coalesce(col("lang"), lit("zz")))
        .groupBy("src")
        .agg(sum(length(coalesce(col("text"), lit(""))))
          .cast("long").as("mass"))
      graft.operators.Mixing.sqrtTemperatureWeights(st, "src", "mass")
        .orderBy("src")
    }),

    // SFT loss-mask audit on the q321 conversation fixture: each
    // user's events are turns, "click" plays the assistant role — the
    // trainable payload fraction per conversation, over props chars.
    // One conversation-keyed hash aggregate, no window, no join.
    "q327_sft_loss_mask" -> ((s, dir) => {
      val ev = RelationalQueries.events(s, dir)
      graft.operators.SftFormat.lossMaskAudit(
        ev, "user_id", col("event_type"), col("props"),
        trainRole = "click")
        .orderBy("user_id")
    }),

    // Fill-in-the-middle rewrite (Bavarian 2022, PSM order) at token
    // boundaries with the deterministic thirds split — one codegen'd
    // map-only projection; docs under 3 tokens stay autoregressive.
    // Conservation (n_pre+n_mid+n_suf = n_tokens) rides in the output.
    "q328_fim_render" -> ((s, dir) =>
      graft.operators.Fim.fimRender(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // TRUE BPE inference (Sennrich 2016 apply side; the HF `tokenizers`
    // merge-rank loop): merges trained on the doc_id%3=0 slice, FROZEN,
    // then applied in RANK order to every distinct word of the FULL
    // corpus — train→freeze→apply with the semantics a real pipeline
    // ships (q301's apply is longest-match, which segments differently
    // on the same units — BpeSpec pins a disagreeing case). The gated
    // output is the SEGMENTATION STRING itself, not just counts; the
    // oracle replays the merges one rank at a time with the training
    // oracle's own list_reduce rewrite (equivalent to the kernel's
    // min-rank loop on the well-formed trained list).
    "q329_bpe_rank_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.trainMerges(
        docs.filter(col("doc_id") % 3 === 0), "text", numMerges = 8)
      graft.operators.Bpe.bpeRankSegment(
        docs, "text", merges, "step", "lhs", "rhs")
        .orderBy("w")
    }),

    // The RLHF data pipeline COMPOSED as one plan (the q84/q280
    // composed-gate discipline): reward-hygiene gate (outlier rewards
    // dropped) → GRPO group-normalized advantages (q314's chain) →
    // DPO (chosen, rejected) pairs (q317's) → SFT chat-template render
    // of exactly the pair-producing conversations (q321's) → ONE
    // verdict row. The tier's stages are individually green; this
    // proves they FUSE — no materialization boundary, every branch
    // reads the one gated event scan and closes in a one-row
    // aggregate. ship = advantages exist, pairs exist, and the SFT set
    // is exactly the pair set.
    "q330_rlhf_pipeline" -> ((s, dir) => {
      val evAll = RelationalQueries.events(s, dir)
      val ev = graft.operators.CacheScope.track(
        evAll.filter(col("value") <= 250.0))
      val cents = floor(col("value") * 100.0)
      val gateAgg = evAll.agg(count(lit(1)).as("n_events"))
        .crossJoin(ev.agg(count(lit(1)).as("n_gated"),
          countDistinct(col("user_id")).as("n_groups")))
      val advAgg = graft.operators.Preference.groupNormalizedAdvantages(
          ev, "user_id", "event_id", cents)
        .agg(count(col("adv_q20")).as("n_adv"),
          coalesce(sum(col("adv_q20")), lit(0L)).as("adv_sum_q20"))
      val pairs = graft.operators.Preference.dpoPairs(
        ev, "user_id", "event_id", cents, minMargin = 10L)
      val pairAgg = pairs.agg(count(lit(1)).as("n_dpo_pairs"),
        coalesce(sum(col("margin")), lit(0L)).as("margin_total"))
      val sftAgg = graft.operators.SftFormat.renderConversations(
          ev.join(pairs.select("user_id"), Seq("user_id")),
          "user_id", Seq("ts", "event_id"), col("event_type"),
          concat(col("event_type"), lit(":"), cents.cast("string")),
          header = "<|system|>graft-sft-v1")
        .agg(count(lit(1)).as("n_convs"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sft_chars"),
          count(when(col("roles_alternate"), 1)).as("n_alternating"))
      gateAgg.crossJoin(advAgg).crossJoin(pairAgg).crossJoin(sftAgg)
        .withColumn("ship", col("n_adv") > 0L && col("n_dpo_pairs") > 0L &&
          col("n_convs") === col("n_dpo_pairs"))
        .orderBy("n_events")
    }),

    // CCNet-style FROZEN-LM perplexity filter (Wenzek 2020): the bigram
    // frequency model trains on the EVEN-doc_id reference slice, is
    // frozen, and the DISJOINT odd slice scores against it — q87's
    // familiarity under the train/freeze/apply deployment shape (the
    // q299/q318 frozen-artifact discipline). Grams the reference never
    // saw contribute 0 to sum_freq and miss n_known, so low familiarity
    // IS the out-of-distribution signal the filter drops on. Exact
    // integer sufficient statistics; two closing rational divisions.
    "q331_lm_filter_frozen" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.NgramLm.familiarityWith(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        docs.filter(col("doc_id") % 2 === 0), "text", n = 2)
        .orderBy("doc_id")
    }),

    // CCNet's head/middle/tail TERTILES over the frozen-LM scores — the
    // published pipeline's final step (Wenzek 2020 §3.3 splits the
    // crawl into three perplexity buckets and ships them as separate
    // corpora): q331's scoring composed with the tie-stable exact
    // value-ntile (q75's discipline — equal scores never straddle a
    // bucket) on the 2^20 fixed-point familiarity, closed to one
    // 3-row bucket card. Docs with no grams carry no defined bucket
    // and are dropped, matching CCNet's empty-doc behavior.
    "q332_ccnet_tertiles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = graft.operators.NgramLm.familiarityWith(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 0), "text", n = 2)
        .filter(col("n_grams") > 0)
        .withColumn("fam_q20", graft.functions.posIntDiv(
          col("sum_freq") * 1048576L, col("n_grams")))
        .withColumn("corpus", lit("all"))
      graft.operators.ExactQuantiles.valueNtile(scored, "corpus",
          "fam_q20", 3)
        .groupBy(col("fam_q20_bucket").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_grams")).as("n_grams_total"),
          sum(col("sum_freq")).as("sum_freq_total"),
          min(col("fam_q20")).as("fam_q20_min"),
          max(col("fam_q20")).as("fam_q20_max"))
        .orderBy("bucket")
    }),

    // Codec-free MEDIA HEADER decode (round-12 brief task 1): real
    // PNG/GIF/JPEG header payloads are CONSTRUCTED per doc from doc_id
    // arithmetic — spec-true magic/IHDR/LSD/SOF0 byte layouts built with
    // hex-string arithmetic (unhex/lpad/hex; LE via explicit byte-pair
    // swap) — then parsed back by the native MediaHeader kernel, which
    // reads the bytes big/little-endian as each spec demands. The two
    // paths share no code (string-hex construction vs byte arithmetic),
    // so an endianness or offset bug in either side breaks the gate;
    // the DuckDB oracle re-derives every output column (sizes included)
    // from the same doc_id arithmetic without touching bytes at all.
    // doc_id%4==3 plants corrupt payloads — a 12-byte truncation and a
    // bad-magic first byte — whose header columns must come back NULL
    // (quarantine, never a wrong dimension). Map-only projection; the
    // payload bytes never shuffle.
    "q333_media_headers" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"), mediaPayload(col("doc_id")).as("__p"))
        .select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.operators.Multimodal.headerMeta(col("__p")).as("__h"))
        .select(col("doc_id"), col("n_bytes"),
          col("__h.format").as("format"), col("__h.width").as("width"),
          col("__h.height").as("height"),
          col("__h.bit_depth").as("bit_depth"))
        .orderBy("doc_id")
    }),

    // BYTE-LEVEL BPE lifecycle (round-12 brief task 3 — the GPT-2
    // ByteLevel step q329's char-level merges do not cover): regex
    // pretokenization (leading space attaches to the word — the " low"
    // vs "low" distinction every shipped GPT-style vocab carries),
    // the 256-entry byte→unicode table, then the SAME frozen-merge
    // min-rank kernel over byte symbols. Train on the doc_id%3=0
    // slice, freeze, apply to every pretoken of the full corpus; the
    // gated output is the byte-level SEGMENTATION STRING itself. The
    // oracle replays the pretokenizer regex (RE2-safe form by
    // construction), re-derives byte symbols via hex-pair arithmetic
    // through the same table literal, and unrolls the 8 merge ranks
    // with the q329 list_reduce stages.
    "q334_bytelevel_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.trainMergesByteLevel(
        docs.filter(col("doc_id") % 3 === 0), "text", numMerges = 8)
      graft.operators.Bpe.bpeRankSegmentByteLevel(
        docs, "text", merges, "step", "lhs", "rhs")
        .orderBy("w")
    }),

    // ExactSubstr VARIABLE-LENGTH repeated-run dedup (Lee et al. 2022
    // — round-12 brief task 5): a 200-token block is PLANTED into
    // every doc_id%10=0 document (both engines construct it from the
    // same literal), and duplicatedRuns must read it back as one
    // ~200-token run per planted doc — the length ≫ minLen signal
    // fixed-k span coverage (q65) saturates on — plus whatever natural
    // repeats the corpus carries (occurrence-count semantics: within-
    // doc repeats count, as a corpus suffix array would see them).
    // Exact integers; the oracle replays gram counting + the
    // gaps-and-islands interval merge with window functions.
    "q335_exact_substr_runs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(coalesce(col("text"), lit("")),
            lit(" " + exactSubstrBlock)))
          .otherwise(coalesce(col("text"), lit(""))).as("text"))
      graft.operators.Spans.duplicatedRuns(planted, "doc_id", "text",
        minLen = 10)
        .orderBy("doc_id")
    }),

    // The multimodal RESOLUTION/FORMAT GATE composed over the header
    // kernel (q333's payloads) — the filter a pipeline actually ships:
    // keep = parseable ∧ format ∈ {png, jpeg} ∧ both dims ≥ 64 ∧
    // aspect within 4:1 (integer cross-multiplications, no division).
    // Scorecard per format (unparseable bucketed under its own key):
    // independent reason counts so the monitoring read shows WHY mass
    // drops, not just that it did. Oracle: pure doc_id arithmetic —
    // the kernel's parsed dimensions must drive the same verdicts the
    // construction arithmetic predicts.
    "q336_media_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val hdr = docs.select(col("doc_id"),
          graft.operators.Multimodal.headerMeta(
            mediaPayload(col("doc_id"))).as("__h"))
        .select(col("doc_id"), col("__h.format").as("__f"),
          col("__h.width").as("__w"), col("__h.height").as("__hh"))
      // gate columns SHARED with the streaming twin
      // (CorpusStreams.windowedMediaGate) — batch and stream can never
      // gate differently
      val cs = graft.operators.Multimodal.gateCounts(
        col("__f"), col("__w"), col("__hh"))
      hdr.groupBy(coalesce(col("__f"), lit("unparseable")).as("format"))
        .agg(cs.head, cs.tail: _*)
        .orderBy("format")
    }),

    // WebP + BMP header decode (round 13, the q333 discipline over the
    // #2 web image format): all three WebP chunk kinds — VP8L lossless
    // (the LE uint32 bitfield: width−1 in bits 0..13, height−1 in
    // 14..27), VP8 lossy (start code 9D 01 2A, low-14-bit LE dims),
    // VP8X extended (LE uint24 canvas−1 fields) — plus BMP
    // BITMAPINFOHEADER (signed LE int32 dims). Payloads constructed
    // from doc_id arithmetic by hex-string byte-swaps; the kernel
    // re-reads them with byte arithmetic; the oracle predicts every
    // column (sizes included) without touching bytes.
    "q337_webp_bmp_headers" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          webpBmpPayload(col("doc_id")).as("__p"))
        .select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.operators.Multimodal.headerMeta(col("__p")).as("__h"))
        .select(col("doc_id"), col("n_bytes"),
          col("__h.format").as("format"), col("__h.width").as("width"),
          col("__h.height").as("height"),
          col("__h.bit_depth").as("bit_depth"))
        .orderBy("doc_id")
    }),

    // Per-document BYTE-LEVEL token budget under the frozen merges —
    // the q94/q329-count analogue for the GPT-2 lifecycle: the number
    // context-window packing actually pays when the tokenizer is
    // byte-level (space-prefixed pretokens and multibyte expansion
    // included). Same train slice as q334; the oracle reuses its
    // unrolled chain and joins each doc's pretokens to the applied
    // segmentation's symbol counts.
    "q338_bytelevel_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.trainMergesByteLevel(
        docs.filter(col("doc_id") % 3 === 0), "text", numMerges = 8)
      graft.operators.Bpe.bpeRankTokenCountByteLevel(
        docs, "doc_id", "text", merges, "step", "lhs", "rhs")
        .orderBy("doc_id")
    }),

    // ExactSubstr EXCISION (the q335 detection set cut out of the
    // text — Lee et al. 2022's actual cleanup): same planted corpus,
    // cleaned text rebuilt from the kept tokens, n_removed == q335's
    // n_dup_tokens by shared construction. The oracle re-derives the
    // covered-position set and replays the filter-by-index rebuild.
    "q339_exact_substr_excise" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(coalesce(col("text"), lit("")),
            lit(" " + exactSubstrBlock)))
          .otherwise(coalesce(col("text"), lit(""))).as("text"))
      graft.operators.Spans.removeDuplicatedRuns(planted, "doc_id",
        "text", minLen = 10)
        .orderBy("doc_id")
    }),

    // The multimodal ingest pipeline COMPOSED as one plan (the
    // q84/q330 composed-gate discipline): header parse → resolution/
    // format gate → exact payload dedup by content digest → one
    // verdict row. Payloads are built from doc_id % 200, so exact
    // duplicates EXIST (every 200 ids share bytes) and the digest
    // dedup branch carries real mass; the oracle counts distinct
    // payload IDENTITIES arithmetically (pid → payload is injective)
    // where the engine dedups by md5 of the actual bytes.
    "q340_media_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val hdr = docs.select(col("doc_id"),
          mediaPayload(col("doc_id") % 200).as("__p"))
        .select(col("doc_id"), col("__p"),
          graft.operators.Multimodal.headerMeta(col("__p")).as("__h"))
        .select(col("doc_id"), col("__p"),
          col("__h.format").as("__f"), col("__h.width").as("__w"),
          col("__h.height").as("__hh"))
      val keepCond = col("__f").isNotNull &&
        col("__f").isin("png", "jpeg") &&
        col("__w") >= 64L && col("__hh") >= 64L &&
        col("__w") <= col("__hh") * 4L && col("__hh") <= col("__w") * 4L
      val kept = graft.operators.CacheScope.track(hdr.filter(keepCond))
      val gateAgg = hdr.agg(count(lit(1)).as("n_docs"),
        count(col("__f")).as("n_parseable"))
        .crossJoin(kept.agg(count(lit(1)).as("n_keep")))
      val dedupAgg = kept.select(md5(col("__p")).as("__d")).distinct()
        .agg(count(lit(1)).as("n_unique_payloads"))
      gateAgg.crossJoin(dedupAgg)
        .withColumn("dup_mass", col("n_keep") - col("n_unique_payloads"))
        .withColumn("ship",
          col("n_keep") > 0L && col("n_unique_payloads") > 0L)
        .orderBy("n_docs")
    }),

    // AUDIO header decode (the q333 discipline for the audio half of a
    // multimodal corpus): spec-true WAV (RIFF→fmt chunk LE fields) and
    // FLAC (STREAMINFO 20/3/5-bit big-endian packing — the bit
    // construction here and the kernel's bit UNpacking share no code)
    // built from doc_id arithmetic; doc_id%10==9 plants truncation.
    // Oracle: arithmetic only.
    "q341_audio_headers" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val rate = (col("doc_id") % 50) * 1000L + 8000L
      val ch = col("doc_id") % 8 + 1L
      val bits = element_at(typedlit(Seq(8L, 16L, 24L, 32L)),
        (col("doc_id") % 4).cast("int") + 1)
      def hxp(c: Column, digits: Int) = lpad(hex(c), digits, "0")
      def le16(c: Column) = {
        val x = hxp(c, 4)
        unhex(concat(substring(x, 3, 2), substring(x, 1, 2)))
      }
      def le32(c: Column) = {
        val x = hxp(c, 8)
        unhex(concat(substring(x, 7, 2), substring(x, 5, 2),
          substring(x, 3, 2), substring(x, 1, 2)))
      }
      // RIFF WAVE fmt(16): PCM, ch, rate, byterate, align, bits = 36 B
      val wav = concat(unhex(lit("52494646")), le32(lit(28L)),
        unhex(lit("57415645" + "666D7420" + "10000000" + "0100")),
        le16(ch), le32(rate), le32(rate * ch * 2L), le16(ch * 2L),
        le16(bits))
      // fLaC + STREAMINFO(34): block sizes/frames zeroed, then the
      // packed bytes — b10 = rate>>12, b11 = (rate>>4)&FF,
      // b12 = (rate&F)<<4 | (ch-1)<<1 | (bits-1)>>4,
      // b13 = ((bits-1)&F)<<4 — then 20 zero bytes = 42 B total
      val flac = concat(
        unhex(lit("664C6143" + "00" + "000022" +
          "1000" + "1000" + "000000" + "000000")),
        unhex(hxp(shiftright(rate, 12), 2)),
        unhex(hxp(shiftright(rate, 4) % 256L, 2)),
        unhex(hxp((rate % 16L) * 16L + (ch - 1L) * 2L +
          shiftright(bits - 1L, 4), 2)),
        unhex(hxp(((bits - 1L) % 16L) * 16L, 2)),
        unhex(lit("00" * 20)))
      val payload = when(col("doc_id") % 10 === 9, substring(wav, 1, 10))
        .when(col("doc_id") % 2 === 0, wav).otherwise(flac)
      docs.select(col("doc_id"), payload.as("__p"))
        .select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.operators.Multimodal.audioMeta(col("__p")).as("__h"))
        .select(col("doc_id"), col("n_bytes"),
          col("__h.format").as("format"),
          col("__h.sample_rate").as("sample_rate"),
          col("__h.channels").as("channels"),
          col("__h.bits").as("bits"))
        .orderBy("doc_id")
    }),

    // Codec-free PIXEL decode (round-14 brief task 1 — kills the image
    // half of the last stub): WHOLE PNG files (stored-mode zlib IDAT,
    // scanlines forward-filtered with all five spec filter types
    // y % 5) and 24bpp bottom-up BMPs are constructed from doc_id
    // arithmetic (PixelFixtures — forward filters + a hand-rolled
    // Adler-32), then decoded back by the native PixelStats kernel
    // (JDK Inflater + filter RECONSTRUCTION — inverse direction, no
    // shared code). The oracle re-derives every output column —
    // payload sizes, integer luminance sums, the 9×8-grid dHash — from
    // pixel ARITHMETIC alone, never touching a byte. doc_id%10==7
    // plants a 40-byte truncation → NULL stats (quarantine). Map-only
    // plan; payload bytes never shuffle.
    "q342_pixel_stats" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.payload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.functions.pixelStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("n_bytes"),
          col("__s.format").as("format"), col("__s.width").as("width"),
          col("__s.height").as("height"),
          col("__s.channels").as("channels"),
          col("__s.n_pixels").as("n_pixels"),
          col("__s.lum_sum").as("lum_sum"),
          col("__s.lum_sq_sum").as("lum_sq_sum"),
          col("__s.dhash").as("dhash"))
        .orderBy("doc_id")
    }),

    // PERCEPTUAL-HASH image near-dup (round-14 brief task 2): byte-
    // unequal re-encodes of the same picture cluster by dHash Hamming
    // distance. Every odd doc re-renders its even predecessor's image
    // with ONE pixel edited (+128 mod 256 at the origin) — different
    // bytes, dHash within 1 bit — and the banded 4×16-bit machinery
    // (Dedup.signaturePairs64, the SimHash-tier discipline: never
    // all-pairs, Hamming-verified before anything else shuffles) must
    // find exactly the pairs within Hamming ≤ 2. Pigeonhole makes the
    // band recall EXACT at this radius, so the oracle is the full
    // all-pairs Hamming answer over arithmetically re-derived dHashes.
    "q343_dhash_neardup" -> ((s, dir) => {
      import s.implicits._
      val sigs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.nearDupPayload(id))))
        .toDF("doc_id", "__p")
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p"))
            .getField("dhash").as("dhash"))
      graft.operators.Dedup.signaturePairs64(sigs, "doc_id", "dhash",
        maxHamming = 2)
        .orderBy("i", "j")
    }),

    // TIFF + EXIF header decode (round-14 brief task 3 — the #3
    // camera container and the ROTATION gate): spec-true TIFF IFD0
    // walks in BOTH endiannesses — II with inline LONG/SHORT values,
    // MM with BitsPerSample count=3 read through the VALUE-OFFSET path
    // — plus a JPEG whose orientation rides in an embedded APP1 Exif
    // TIFF block (the walk must skip into it and back out to SOF0).
    // The gate applies the EXIF rotation BEFORE the aspect check
    // (orientation ≥ 5 = 90°-family → display dims swap). Corruption
    // slice %4==3: a mid-IFD truncation (%8==3) and an out-of-domain
    // orientation 9 on a standalone TIFF (%8==7) — both NULL.
    "q344_tiff_exif" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val hdr = docs.select(col("doc_id"),
          tiffExifPayload(col("doc_id")).as("__p"))
        .select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.operators.Multimodal.headerMeta(col("__p")).as("__h"))
      val o = col("__h.orientation")
      val dispW = when(o >= 5L, col("__h.height"))
        .otherwise(col("__h.width"))
      val dispH = when(o >= 5L, col("__h.width"))
        .otherwise(col("__h.height"))
      hdr.select(col("doc_id"), col("n_bytes"),
          col("__h.format").as("format"), col("__h.width").as("width"),
          col("__h.height").as("height"),
          col("__h.bit_depth").as("bit_depth"), o.as("orientation"),
          dispW.as("disp_width"), dispH.as("disp_height"),
          (dispW <= dispH * 4L && dispH <= dispW * 4L).as("aspect_ok"))
        .orderBy("doc_id")
    }),

    // WAV PCM SAMPLE statistics (round-14 brief task 4 — the audio
    // twin of q342): whole PCM WAV files are constructed from doc_id
    // arithmetic — ramps (wrap-around sawtooth), square waves (with
    // PLANTED full-scale clipping on the %5==0 slice), and
    // silence-padded tones — rendered to 16-bit two's-complement LE
    // bytes by hex Column arithmetic, then decoded back by the native
    // PcmStats kernel. The oracle re-derives energy, clipping counts,
    // and the leading/trailing silence runs from the sample formulas
    // alone. %10==9 plants a mid-data truncation (declared data size
    // not fully present) → NULL.
    "q345_pcm_stats" -> ((s, dir) => {
      val docs = spreadIds(t(s, dir, "documents"))
      docs.select(col("doc_id"), pcmPayload(col("doc_id")).as("__p"))
        .select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.functions.pcmStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("n_bytes"),
          col("__s.codec").as("codec"),
          col("__s.sample_rate").as("sample_rate"),
          col("__s.channels").as("channels"), col("__s.bits").as("bits"),
          col("__s.n_samples").as("n_samples"),
          col("__s.duration_ms").as("duration_ms"),
          col("__s.sum_q").as("sum_q"), col("__s.sq_sum").as("sq_sum"),
          col("__s.n_clipped").as("n_clipped"),
          col("__s.lead_silence").as("lead_silence"),
          col("__s.trail_silence").as("trail_silence"))
        .orderBy("doc_id")
    }),

    // The audio ingest pipeline COMPOSED as one plan (the q340/q336
    // discipline, and the q336-beside-it audio gate the round-13
    // verdict called for): PCM decode → sample-rate gate → quality
    // gates (clipping ≤ 1%, edge silence ≤ 20%) → ONE aggregate
    // verdict row with independent reason counts (single groupBy —
    // no crossJoin chain; the q340 scorecard's one cosmetic blemish,
    // not repeated). Oracle: pure sample arithmetic.
    "q346_audio_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val st = docs.select(col("doc_id"),
        graft.functions.pcmStats(pcmPayload(col("doc_id"))).as("__s"))
      // gate columns SHARED with the streaming twin
      // (CorpusStreams.windowedAudioGate) — batch and stream can never
      // gate differently
      val cs = graft.operators.Multimodal.audioGateCounts(col("__s"))
      st.agg(cs.head, cs.tail: _*)
        .withColumn("ship", col("n_keep") > 0L)
        .orderBy("n_docs")
    }),

    // SentencePiece BYTE FALLBACK for the unigram Viterbi tokenizer
    // (round-14 brief task 8 — the `byte_fallback` flag production
    // unigram models ship with): where q307's DP emits UNK, this DP
    // emits the character's UTF-8 BYTE pieces (nb tokens at
    // byteScoreQ each) — the vocabulary is CLOSED, nothing is ever
    // UNK. A multibyte OOV word is PLANTED on the %7==0 slice (ü/ç/ß
    // have no vocab unit, so they MUST segment to byte pieces and
    // n_byte_tokens > 0 there). The oracle replays the same DP with
    // the fallback transition costed by strlen of the code point.
    "q347_viterbi_bytefallback" -> ((s, dir) => {
      import s.implicits._
      val vdf = viterbiScoredVocab.toDF("unit", "score_q")
      val planted = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(coalesce(col("text"), lit("")),
            lit(" " + byteFallbackWord)))
          .otherwise(coalesce(col("text"), lit(""))).as("text"))
      graft.operators.Bpe.viterbiTokenCountByteFallback(
        planted, "doc_id", "text", vdf, "unit", "score_q",
        viterbiByteScoreQ)
        .orderBy("doc_id")
    }),

    // The graph HEALTH-CHECK composed as ONE plan (round-14 task 6's
    // adoption: the A/B audit — tools/GraphEdgeCacheAudit, SCALE.md —
    // measured a 33% tier-wall cut from sharing the derived edge table
    // across the datasheet / hub-removal / BFS reads, hashes green; the
    // per-query gates stay isolated for measurement honesty, and THIS
    // query is the shape a production health-check actually runs): the
    // capped co-engagement edge table is built and cached ONCE
    // (CacheScope.track), then the q281 datasheet stats, the q269
    // hub-removal resilience read, and the q251 4-hop seed reach all
    // consume it — one verdict row.
    "q348_graph_pipeline" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val edges = graft.operators.CacheScope.track(
        graft.operators.Cooccur.coEngagementPairs(li,
          "l_orderkey", "l_partkey", maxDegree = 6)
          .select(col("item_a"), col("item_b")))
      graphHealthCheck(li, edges)
    }),

    // q371: the MATERIALIZED bucketed edge table — the 100-TB
    // expression of the q348 shared-edge win (SCALE.md round-13/14
    // adoption notes): a derived co-engagement edge table is a
    // write-once ARTIFACT bucketed by node, not a session cache. The
    // SAME edge build is written via TableIO.writeBucketed (bucketBy
    // item_a — downstream equi-joins/aggs on the node key read
    // co-located buckets with no exchange; SkewBucketSpec proves the
    // plan shape), re-read from the catalog, and run through the SAME
    // composed health-check. The oracle is the same SQL string as
    // q348's, so the driver enforces hash IDENTITY between the cached
    // and bucketed paths.
    "q371_bucketed_graph" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val built = graft.operators.Cooccur.coEngagementPairs(li,
        "l_orderkey", "l_partkey", maxDegree = 6)
        .select(col("item_a"), col("item_b"))
      graft.io.TableIO.writeBucketed(built, "graft_edges_by_node",
        Seq("item_a"), numBuckets = 8)
      graphHealthCheck(li, s.table("graft_edges_by_node"))
    }),

    // G.711 COMPANDED audio decode (μ-law tag 7 / A-law tag 6 — the
    // telephony-corpus format; expansion is the PUBLIC CCITT/Sun
    // reference arithmetic, no codec): companded code bytes are
    // constructed from doc_id arithmetic (one byte per sample — the
    // code stream cycles all 256 values, so full-scale rails and
    // silent codes both occur), the kernel expands them to linear and
    // reports the same integer statistics as q345; the oracle replays
    // the expansion formulas in SQL CASE arithmetic over range(n).
    "q350_g711_stats" -> ((s, dir) => {
      // not spread: 30–120 companded code bytes per doc — construction
      // is lighter than the exchange (measured regression when spread)
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"), g711Payload(col("doc_id")).as("__p"))
        .select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.functions.pcmStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("n_bytes"),
          col("__s.codec").as("codec"),
          col("__s.sample_rate").as("sample_rate"),
          col("__s.n_samples").as("n_samples"),
          col("__s.duration_ms").as("duration_ms"),
          col("__s.sum_q").as("sum_q"), col("__s.sq_sum").as("sq_sum"),
          col("__s.n_clipped").as("n_clipped"),
          col("__s.lead_silence").as("lead_silence"),
          col("__s.trail_silence").as("trail_silence"))
        .orderBy("doc_id")
    }),

    // GIF PIXEL decode (round 14 — LZW from the public GIF89a spec
    // appendix, pure table arithmetic, no codec jars: the THIRD
    // codec-free pixel format after PNG/BMP): whole GIF files with a
    // 256-entry palette and LZW-coded index streams are constructed by
    // the fixture ENCODER (literal codes + periodic CLEARs + LSB-first
    // bit packing — no code shared with the kernel's table decode),
    // decoded back by PixelStats, and every statistic re-derived by
    // the oracle from the index arithmetic alone (palette entry i =
    // (i, 3i%256, 5i%256) — the shared RGB-luminance formula).
    // %10==7 truncates inside the color table → NULL.
    "q351_gif_pixels" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.gifPayload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          graft.functions.pixelStats(col("__p")).as("__s"))
        .select(col("doc_id"),
          col("__s.format").as("format"), col("__s.width").as("width"),
          col("__s.height").as("height"),
          col("__s.channels").as("channels"),
          col("__s.n_pixels").as("n_pixels"),
          col("__s.lum_sum").as("lum_sum"),
          col("__s.lum_sq_sum").as("lum_sq_sum"),
          col("__s.dhash").as("dhash"))
        .orderBy("doc_id")
    }),

    // The IMAGE near-dup pipeline COMPOSED as one plan (the perceptual
    // capstone over q342/q343: what an image-corpus curation job
    // actually ships): decode pixels → dHash → banded Hamming pairs →
    // connected components → one verdict row (images, decoded, pair,
    // cluster, and excess-duplicate counts — n_dup_excess is the mass
    // a canonical-survivor pass would drop). The dHash table is built
    // ONCE (CacheScope via signaturePairs64's banded frame); the
    // oracle re-derives dHashes arithmetically and replays the CC as
    // a recursive min-label flood over the qualifying pairs.
    "q349_image_dedup_pipeline" -> ((s, dir) => {
      import s.implicits._
      // not spread: BMP payloads decode in microseconds and the wall is
      // the banding+CC tail — inflating every downstream stage of the
      // 32-partition signature cache measured slower than the serial scan
      val sigs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.nearDupPayload(id))))
        .toDF("doc_id", "__p")
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p"))
            .getField("dhash").as("dhash"))
        .transform(graft.operators.CacheScope.track)
      val pairs = graft.operators.Dedup.signaturePairs64(sigs, "doc_id",
        "dhash", maxHamming = 2)
        .transform(graft.operators.CacheScope.track)
      val clusters = graft.operators.Components
        .connectedComponents(pairs, "i", "j")
      val cagg = clusters.agg(count(lit(1)).as("n_members"),
        count_distinct(col("component")).as("n_clusters"))
      sigs.agg(count(lit(1)).as("n_images"),
          count(col("dhash")).as("n_decoded"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .crossJoin(cagg)
        .withColumn("n_dup_excess", col("n_members") - col("n_clusters"))
        .withColumn("ship",
          col("n_decoded") > 0L && col("n_dup_excess") >= 0L)
        .orderBy("n_images")
    }),

    // VIDEO container header decode (late round 14 — the third
    // modality's q333/q341 twin): MP4/ISO-BMFF box walks (mvhd v0 AND
    // v1 time widths, 16.16 fixed-point tkhd dims, the stsd codec
    // fourcc, the stsz frame count, and a 0×0 audio trak the walk must
    // skip past) plus the AVI RIFF layout (avih dims/frame-timing,
    // the vids strh handler). Corruption slice %5==4: a 30-byte AVI
    // truncation (odd) and an MP4 declaring timescale 0 (even) — both
    // NULL, never a wrong dimension or a division by zero. One
    // map-only projection; payload bytes never shuffle.
    "q352_video_headers" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, VideoFixtures.headerPayload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.functions.videoHeader(col("__p")).as("__h"))
        .select(col("doc_id"), col("n_bytes"),
          col("__h.format").as("format"), col("__h.width").as("width"),
          col("__h.height").as("height"),
          col("__h.duration_ms").as("duration_ms"),
          col("__h.n_frames").as("n_frames"),
          col("__h.codec").as("codec"))
        .orderBy("doc_id")
    }),

    // VIDEO frame sampling with REAL per-frame pixel statistics (the
    // kernel that killed the frame-sample stub): every SECOND
    // uncompressed-DIB AVI frame decoded to the SAME lum_sum /
    // lum_sq_sum / dHash definitions as still images — the oracle
    // replays every sampled frame's pixels from the fixture formula
    // p(x,y,f,s) and re-derives the dHash cell grid arithmetically.
    // %10==7 plants a mid-frame truncation → NULL array → no rows
    // (loud: the doc vanishes from the frame table, never partial
    // stats). Scale shape: unsampled frames are SKIPPED by chunk size
    // (never decoded); only fixed-width stats rows leave the scan.
    "q353_video_frames" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, VideoFixtures.framePayload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          explode(graft.functions.videoFrameStats(col("__p"), 2))
            .as("__f"))
        .select(col("doc_id"), col("__f.frame_idx").as("frame_idx"),
          col("__f.lum_sum").as("lum_sum"),
          col("__f.lum_sq_sum").as("lum_sq_sum"),
          col("__f.dhash").as("dhash"))
        .orderBy("doc_id", "frame_idx")
    }),

    // IMAGE RESIZE as a gated kernel (the operator that killed the
    // resize stub): box-filter downscale of the q342 PNG/BMP corpus to
    // a 4×4 milli-luminance grid — the same integer cell partition as
    // the dHash grid (⌊4x/W⌋, ⌊4y/H⌋, floor-average), so the oracle
    // re-derives every output cell from the pixel formula with plain
    // division. Cells are posexploded to rows (cell = cy·4 + cx);
    // corrupt payloads (%10==7) yield NULL grids → no rows.
    "q354_pixel_resize" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.payload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          posexplode(graft.functions.pixelResize(col("__p"), 4, 4)))
        .select(col("doc_id"), col("pos").as("cell"),
          col("col").as("cell_lum"))
        .orderBy("doc_id", "cell")
    }),

    // MP3 frame-walk headers (the web-corpus audio container beside
    // q341's WAV/FLAC): CBR MPEG-1 Layer III streams constructed from
    // doc_id arithmetic by hex Column construction (the pcmPayload
    // discipline) — bitrate/sample-rate table indices, a PADDING bit
    // alternating per frame (frame sizes differ by 1 byte), and an
    // ID3v2 preamble with a synchsafe size on the %4==1 slice that the
    // walk must skip. The oracle re-derives frame sizes, total bytes,
    // and duration_ms = ⌊frames·1152·1000 / rate⌋ from the public
    // Layer III tables as SQL literals. %10==6 truncates the last
    // frame → NULL.
    "q355_mp3_headers" -> ((s, dir) => {
      val docs = spreadIds(t(s, dir, "documents"))
      docs.select(col("doc_id"), mp3Payload(col("doc_id")).as("__p"))
        .select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.functions.mp3Header(col("__p")).as("__h"))
        .select(col("doc_id"), col("n_bytes"),
          col("__h.sample_rate").as("sample_rate"),
          col("__h.channels").as("channels"),
          col("__h.n_frames").as("n_frames"),
          col("__h.duration_ms").as("duration_ms"),
          col("__h.bitrate_kbps").as("bitrate_kbps"))
        .orderBy("doc_id")
    }),

    // The VIDEO ingest pipeline COMPOSED as one plan (the q340/q346
    // discipline for the third modality): container parse → resolution
    // (w ≥ 16, h ≥ 10) + duration (≥ 100 ms) gate → frame-sample the
    // keepers at stride 2 → per-frame dHash → SCENE CHANGES (Hamming
    // between consecutive sampled frames > 16 — the shot-boundary
    // heuristic a video curation pass dedups shots with) → ONE verdict
    // row. Frame stats are projected BEFORE the per-doc window, so
    // payload bytes never shuffle — only fixed-width stats rows cross
    // the doc_id exchange.
    "q356_video_pipeline" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, VideoFixtures.framePayload(id))))
        .toDF("doc_id", "__p")
      val hdr = media.select(col("doc_id"), col("__p"),
        graft.operators.Multimodal.videoMeta(col("__p")).as("__h"))
      // gate columns + keep predicate SHARED with the streaming twin
      // (CorpusStreams.windowedVideoGate) — batch and stream can never
      // gate differently
      val keepCond = graft.operators.Multimodal.videoKeep(col("__h"))
      val cs = graft.operators.Multimodal.videoGateCounts(col("__h"))
      val gates = hdr.agg(cs.head, cs.tail: _*)
      val frames = hdr.filter(keepCond)
        .select(col("doc_id"),
          explode(graft.functions.videoFrameStats(col("__p"), 2))
            .as("__f"))
        .select(col("doc_id"), col("__f.frame_idx").as("fi"),
          col("__f.dhash").as("dh"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("fi")
      val scenes = frames
        .withColumn("prev", lag(col("dh"), 1).over(w))
        .agg(count(lit(1)).as("n_frames_sampled"),
          count(when(bit_count(col("dh").bitwiseXOR(col("prev"))) > 16, 1))
            .as("n_scene_changes"))
      gates.crossJoin(scenes)
        .withColumn("ship", col("n_keep") > 0L)
        .orderBy("n_docs")
    }),

    // CROSS-MODAL perceptual match — "find these still images inside
    // that video corpus", the capability the shared statsOf definition
    // was built for (an AVI frame and a BMP still of the same pixels
    // hash IDENTICALLY, locked cross-kernel in VideoKernelSpec): odd
    // docs are BMP stills rendering frame f* of their predecessor
    // video; the banded probe-vs-corpus matcher
    // (Dedup.signatureMatches64 — band equi-join, never |P|·|C|,
    // Hamming-verified before anything else moves) must find each
    // still at exactly its (video, frame) with Hamming 0 — except
    // where the video is truncated (%10==4: the still matches nothing
    // planted; its pixels exist, the container doesn't decode).
    // Pigeonhole makes band recall EXACT at radius 1, so the oracle is
    // the full probe×corpus Hamming join over arithmetically
    // re-derived dHashes.
    "q357_crossmodal_match" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id =>
          (id, VideoFixtures.crossModalPayload(id))))
        .toDF("doc_id", "__p")
      val img = media.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("img_doc"),
          graft.functions.pixelStats(col("__p"))
            .getField("dhash").as("dhash"))
      val frm = media.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("vid_doc"),
          explode(graft.functions.videoFrameStats(col("__p"), 1))
            .as("__f"))
        // frame_idx < 16 always (F ≤ 9), so vid·16+f is collision-free
        .select((col("vid_doc") * 16L + col("__f.frame_idx")).as("fid"),
          col("__f.dhash").as("dhash"))
      graft.operators.Dedup.signatureMatches64(img, "img_doc",
          frm, "fid", "dhash", maxHamming = 1)
        .select(col("i").as("img_doc"),
          floor(col("j") / 16L).cast("long").as("vid_doc"),
          pmod(col("j"), lit(16L)).as("frame_idx"), col("hamming"))
        .orderBy("img_doc", "vid_doc", "frame_idx")
    }),

    // Matroska / WebM headers (the q352 walk's third container — EBML,
    // RFC 8794): DocType out of the EBML header (webm vs matroska —
    // BOTH doctypes planted), TimestampScale + an IEEE-FLOAT Duration
    // (32-bit AND 64-bit widths planted; the fixture durations are
    // integers < 2^24, exact in both, so duration_ms = d·(id%4+1) is
    // plain oracle arithmetic), and the first VIDEO TrackEntry's
    // dims + CodecID string — with an A_OPUS audio entry planted FIRST
    // on the %3==0 slice that the walk must skip. Matroska declares no
    // frame count → n_frames 0 (undeclared, documented — never
    // invented). %7==5 truncates mid-Segment-header → NULL.
    "q358_mkv_headers" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, VideoFixtures.mkvPayload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          graft.functions.videoHeader(col("__p")).as("__h"))
        .select(col("doc_id"), col("n_bytes"),
          col("__h.format").as("format"), col("__h.width").as("width"),
          col("__h.height").as("height"),
          col("__h.duration_ms").as("duration_ms"),
          col("__h.n_frames").as("n_frames"),
          col("__h.codec").as("codec"))
        .orderBy("doc_id")
    }),

    // TAR member enumeration (the WebDataset shard layout — how
    // large-scale multimodal training data actually ships): spec-true
    // POSIX-ustar archives of paired {sample}.bmp / {sample}.txt
    // members, enumerated by the native TarMembers kernel (512-block
    // walk, octal sizes, zero-block EOF). The oracle re-derives every
    // member's OFFSET as the cumulative 512-padded block sum and every
    // SIZE from the q342 BMP size arithmetic — the whole archive
    // layout is doc_id arithmetic. %9==8 truncates mid-first-member →
    // NULL → the doc vanishes (loud).
    "q359_tar_members" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, TarFixtures.payload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          length(col("__p")).cast("long").as("n_bytes"),
          explode(graft.functions.tarMembers(col("__p"))).as("__m"))
        .select(col("doc_id"), col("n_bytes"),
          col("__m.name").as("name"), col("__m.offset").as("offset"),
          col("__m.size").as("size"))
        .orderBy("doc_id", "offset")
    }),

    // The WebDataset ingest pipeline COMPOSED end-to-end: enumerate
    // tar members → SLICE payloads with the built-in substring
    // (offset+1, size — bytes never leave the executor) → decode the
    // image member through the REAL pixel kernel and the text member
    // through the shared tokenizer → join the pair back into SAMPLES
    // on (doc, sample key) → per-sample gate. Wrong offsets cannot
    // pass: a misaligned slice fails the BMP magic and NULLs the
    // stats, and the oracle re-derives lum_sum/dHash from pixel
    // arithmetic (if the slice were shifted even one byte, every
    // pixel statistic would diverge).
    "q360_webdataset_pipeline" -> ((s, dir) => {
      import s.implicits._
      // cached: the image and caption branches below both scan `m`,
      // which would otherwise re-run the shard constructor per branch
      val media = graft.operators.CacheScope.track(
        spreadIds(t(s, dir, "documents")).as[Long]
          .mapPartitions(_.map(id => (id, TarFixtures.payload(id))))
          .toDF("doc_id", "__p"))
      val m = media.select(col("doc_id"), col("__p"),
          explode(graft.functions.tarMembers(col("__p"))).as("__m"))
        .select(col("doc_id"), col("__p"), col("__m.name").as("name"),
          col("__m.offset").as("offset"), col("__m.size").as("size"))
        .withColumn("sample",
          regexp_extract(col("name"), "_(\\d+)\\.", 1).cast("long"))
      val imgs = m.filter(col("name").endsWith(".bmp"))
        .select(col("doc_id"), col("sample"),
          graft.functions.pixelStats(
            col("__p").substr(col("offset") + 1L, col("size")))
            .as("__s"))
        .select(col("doc_id"), col("sample"),
          col("__s.width").as("width"), col("__s.height").as("height"),
          col("__s.lum_sum").as("lum_sum"), col("__s.dhash").as("dhash"))
      val txts = m.filter(col("name").endsWith(".txt"))
        .select(col("doc_id"), col("sample"),
          size(graft.functions.tokens(
            col("__p").substr(col("offset") + 1L, col("size"))
              .cast("string"))).cast("long").as("n_tokens"))
      imgs.join(txts, Seq("doc_id", "sample"))
        .withColumn("keep", col("width") >= 12L && col("n_tokens") >= 3L)
        .orderBy("doc_id", "sample")
    }),

    // GZIP member decode (RFC 1952 — the decompression hop in front of
    // .warc.gz / .jsonl.gz / .tar.gz ingest): hand-rolled stored-block
    // gzip fixtures (bit-looped CRC-32, no Deflater — the construction
    // shares no code with the Inflater-side kernel) across three
    // framings — plain, FNAME-bearing (%4==2), and TWO CONCATENATED
    // MEMBERS (%6==5, the spec's required concatenation semantics) —
    // with a FLIPPED CRC byte on %10==3 that the kernel's integrity
    // check must quarantine (a decompressor's output feeds parsers, so
    // a silent bitflip is the failure mode that matters).
    "q361_gzip_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, TarFixtures.gzPayload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          length(col("__p")).cast("long").as("gz_bytes"),
          graft.functions.gzipDecode(col("__p")).as("__d"))
        .select(col("doc_id"), col("gz_bytes"),
          length(col("__d")).cast("long").as("n_bytes"),
          size(graft.functions.tokens(col("__d").cast("string")))
            .cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // The .tar.gz WebDataset shard read — THREE kernels chained in one
    // codegen'd projection: gzip_decode → tar_members → explode. NULL
    // propagates loudly through the chain: a gzip-level truncation
    // (%11==7) kills the decompression hop, and the %9==8 tar
    // truncation now hides INSIDE a valid gzip member (correct CRC
    // over corrupt content) and must be caught by the tar walk.
    "q362_webdataset_gz" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, TarFixtures.gzTarPayload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          length(col("__p")).cast("long").as("gz_bytes"),
          explode(graft.functions.tarMembers(
            graft.functions.gzipDecode(col("__p")))).as("__m"))
        .select(col("doc_id"), col("gz_bytes"),
          col("__m.name").as("name"), col("__m.offset").as("offset"),
          col("__m.size").as("size"))
        .orderBy("doc_id", "offset")
    }),

    // Image METADATA STRIP — the multimodal PRIVACY pass (the q137
    // PII-redaction discipline taken to pixels): camera EXIF carries
    // GPS/serial/timestamps, PNG text chunks carry arbitrary payloads;
    // both must go while the PIXELS survive bit-identical. Gated with
    // DECODE INVARIANCE: the PNG slice re-decodes the stripped bytes
    // and its lum_sum + dHash must equal the original's (the tEXt
    // chunk is ancillary by spec — removal provably cannot change
    // pixels); the JPEG slice re-parses headers (dims preserved,
    // orientation resets to 1 — the Exif is GONE, not blanked). The
    // bad-magic slice NULLs: a privacy pass must never silently pass
    // unstripped bytes.
    "q363_metadata_strip" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.stripPayload(id))))
        .toDF("doc_id", "__p")
      val st = media.select(col("doc_id"),
        length(col("__p")).cast("long").as("n_bytes"), col("__p"),
        graft.functions.mediaStrip(col("__p")).as("__s"))
      st.select(col("doc_id"), col("n_bytes"),
          length(col("__s")).cast("long").as("stripped_bytes"),
          graft.operators.Multimodal.headerMeta(col("__s"))
            .getField("format").as("format"),
          graft.operators.Multimodal.headerMeta(col("__p"))
            .getField("orientation").as("orientation_before"),
          graft.operators.Multimodal.headerMeta(col("__s"))
            .getField("orientation").as("orientation_after"),
          (col("n_bytes") - length(col("__s"))).cast("long")
            .as("meta_removed"),
          when(col("doc_id") % 3 === 0,
            graft.functions.pixelStats(col("__p")).getField("lum_sum") ===
              graft.functions.pixelStats(col("__s")).getField("lum_sum") &&
              graft.functions.pixelStats(col("__p")).getField("dhash") ===
                graft.functions.pixelStats(col("__s")).getField("dhash"))
            .when(col("doc_id") % 3 === 1,
              graft.operators.Multimodal.headerMeta(col("__s"))
                .getField("width") ===
                graft.operators.Multimodal.headerMeta(col("__p"))
                  .getField("width") &&
                graft.operators.Multimodal.headerMeta(col("__s"))
                  .getField("height") ===
                  graft.operators.Multimodal.headerMeta(col("__p"))
                    .getField("height"))
            .as("pixels_invariant"))
        .orderBy("doc_id")
    }),

    // ZIP member enumeration + BOTH decompression paths (the other
    // archive data ships in, completing tar/gzip/zip): the central
    // directory is walked from the EOCD BACKWARD, every member's data
    // offset resolved through its LOCAL header, and content is proven
    // per member by `content_check` — STORED .bmp members slice
    // straight into the pixel kernel (lum_sum), DEFLATED .txt members
    // inflate (inflate_raw to exactly usize) and tokenize. The oracle
    // re-derives the whole layout (no 512 padding here — zip packs
    // tight) AND the content columns from the shared arithmetic.
    // %8==6 truncates the EOCD → NULL.
    "q364_zip_members" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, TarFixtures.zipPayload(id))))
        .toDF("doc_id", "__p")
      val m = media.select(col("doc_id"), col("__p"),
          length(col("__p")).cast("long").as("n_bytes"),
          explode(graft.functions.zipMembers(col("__p"))).as("__m"))
        .select(col("doc_id"), col("__p"), col("n_bytes"),
          col("__m.name").as("name"), col("__m.method").as("method"),
          col("__m.offset").as("offset"), col("__m.csize").as("csize"),
          col("__m.usize").as("usize"))
      val slice = col("__p").substr(col("offset") + 1L, col("csize"))
      m.withColumn("content_check",
          when(col("name").endsWith(".txt"),
            size(graft.functions.tokens(
              graft.functions.inflateRaw(slice, col("usize"))
                .cast("string"))).cast("long"))
            .otherwise(graft.functions.pixelStats(slice)
              .getField("lum_sum")))
        .drop("__p")
        .orderBy("doc_id", "offset")
    }),

    // The SHARD-DEDUP capstone — the full chain a multimodal shard
    // curation job actually runs, composed as ONE plan: enumerate tar
    // members → slice → decode every image member's pixels → dHash →
    // banded perceptual pairs ACROSS SHARDS (exact-match radius) →
    // connected components → one verdict row. The fixture PLANTS
    // cross-shard duplicates (shard pairs re-ship one identical
    // picture under different member names — byte-equal pixels inside
    // byte-unequal archives), so the duplicate mass is real and the
    // oracle re-derives every dHash from pixel arithmetic and replays
    // the CC as a recursive min-label flood. Truncated shards (%10==9)
    // contribute no images and orphan their partner's planted dup.
    "q365_shard_dedup_pipeline" -> ((s, dir) => {
      import s.implicits._
      // cached: two consumers (shard parse-audit + image explode) would
      // otherwise each re-run the shard constructor for every doc
      val media = graft.operators.CacheScope.track(
        spreadIds(t(s, dir, "documents")).as[Long]
          .mapPartitions(_.map(id => (id, TarFixtures.dedupPayload(id))))
          .toDF("doc_id", "__p"))
      val shards = media.select(col("doc_id"),
        graft.functions.tarMembers(col("__p")).isNotNull.as("parsed"))
      val imgs = media.select(col("doc_id"), col("__p"),
          explode(graft.functions.tarMembers(col("__p"))).as("__m"))
        .filter(col("__m.name").endsWith(".bmp"))
        // img_id = doc·8 + k (k ≤ 4 < 8): collision-free across shards
        .select((col("doc_id") * 8L +
            regexp_extract(col("__m.name"), "_(\\d+)\\.", 1)
              .cast("long")).as("img_id"),
          graft.functions.pixelStats(
            col("__p").substr(col("__m.offset") + 1L, col("__m.size")))
            .getField("dhash").as("dhash"))
        .transform(graft.operators.CacheScope.track)
      val pairs = graft.operators.Dedup.signaturePairs64(imgs, "img_id",
          "dhash", maxHamming = 0)
        .transform(graft.operators.CacheScope.track)
      val clusters = graft.operators.Components
        .connectedComponents(pairs, "i", "j")
      shards.agg(count(lit(1)).as("n_shards"),
          count(when(col("parsed"), 1)).as("n_parseable"))
        .crossJoin(imgs.agg(count(lit(1)).as("n_images"),
          count(col("dhash")).as("n_hashed")))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .crossJoin(clusters.agg(count(lit(1)).as("n_members"),
          count_distinct(col("component")).as("n_clusters")))
        .withColumn("n_dup_excess", col("n_members") - col("n_clusters"))
        .withColumn("ship",
          col("n_parseable") > 0L && col("n_dup_excess") >= 0L)
        .orderBy("n_shards")
    }),

    // q366: INCREMENTAL cross-batch image dedup — the production
    // pattern q365 stops short of: dedup TODAY's arriving shard batch
    // (odd docs) against YESTERDAY's corpus (even docs) without
    // re-decoding or re-pairing the corpus. The corpus participates
    // only through its persisted (img_id, dhash) signature table —
    // 16 bytes/image; here built once and cache-tracked, in production
    // a parquet table bucketed by (band, nib). Cross matches ride
    // Dedup.signatureMatches64Incremental (banded, pigeonhole-exact),
    // batch survivors come from keepCanonical over the BATCH only, and
    // the refreshed table is the corpus ∪ survivor-signature append.
    // Fixture plants BOTH dup shapes (TarFixtures.incrementalPayload):
    // cross (shard pairs (2m, 2m+1) share sample 0) and batch-internal
    // (odd pairs (4m+1, 4m+3) share sample 1) — and nothing else.
    "q366_incremental_image_dedup" -> ((s, dir) => {
      import s.implicits._
      // parity filter BEFORE the mapPartitions barrier: a filter cannot
      // push through the opaque constructor, so filtering `media` would
      // build every payload twice (once per side)
      def media(par: Int): DataFrame =
        spreadIds(t(s, dir, "documents").filter(col("doc_id") % 2 === par))
          .as[Long]
          .mapPartitions(_.map(id => (id, TarFixtures.incrementalPayload(id))))
          .toDF("doc_id", "__p")
      def sigs(shards: DataFrame): DataFrame = shards
        .select(col("doc_id"), col("__p"),
          explode(graft.functions.tarMembers(col("__p"))).as("__m"))
        .filter(col("__m.name").endsWith(".bmp"))
        .select((col("doc_id") * 8L +
            regexp_extract(col("__m.name"), "_(\\d+)\\.", 1)
              .cast("long")).as("img_id"),
          graft.functions.pixelStats(
            col("__p").substr(col("__m.offset") + 1L, col("__m.size")))
            .getField("dhash").as("dhash"))
      val corpusSigs = sigs(media(0))
        .transform(graft.operators.CacheScope.track)
      val batchSigs = sigs(media(1))
        .transform(graft.operators.CacheScope.track)
      val matches = graft.operators.Dedup.signatureMatches64Incremental(
        batchSigs, "img_id", "dhash", corpusSigs, "img_id", "dhash",
        maxHamming = 0)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        batchSigs, "img_id", matches)
        .transform(graft.operators.CacheScope.track)
      val refreshed = corpusSigs.unionByName(survivors)
      // img_id = doc·8 + k with k ≤ 3: bit 3 of img_id is the doc's
      // parity bit, so a pair row's origin reads off i's bit 3
      // (cross rows carry i = corpus id = even doc)
      corpusSigs.agg(count(lit(1)).as("n_corpus_sigs"))
        .crossJoin(batchSigs.agg(count(lit(1)).as("n_batch_images"),
          count(col("dhash")).as("n_batch_hashed")))
        .crossJoin(matches.agg(
          count(when(col("i").bitwiseAND(lit(8L)) === 0L, 1))
            .as("n_cross_pairs"),
          count(when(col("i").bitwiseAND(lit(8L)) =!= 0L, 1))
            .as("n_within_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_batch_survivors")))
        .crossJoin(refreshed.agg(count(lit(1)).as("n_total_sigs")))
        .orderBy("n_corpus_sigs")
    }),

    // q367: perceptual AUDIO dedup — the image dedup story's audio
    // twin. A 64-bit energy-envelope sign hash over the decoded linear
    // samples (graft_audio_hash: 65 integer windows, bit t =
    // e(t+1) > e(t) — dHash on the time axis) rides the SAME
    // signaturePairs64 banding images use. The fixture plants G.711
    // μ-law streams next to their PCM-16 transcodes (byte-unequal
    // payloads, different codecs, identical linear samples → identical
    // hashes) in doc trios; the third member is unique ramp audio.
    // Truncated docs hash NULL and drop from banding.
    "q367_audio_dedup" -> ((s, dir) => {
      val sigs = spreadIds(t(s, dir, "documents"))
        .select(col("doc_id"),
          graft.functions.audioHash(audioDedupPayload(col("doc_id")))
            .as("ahash"))
        .transform(graft.operators.CacheScope.track)
      val pairs = graft.operators.Dedup.signaturePairs64(
        sigs, "doc_id", "ahash", maxHamming = 2)
        .transform(graft.operators.CacheScope.track)
      val clusters = graft.operators.Components
        .connectedComponents(pairs, "i", "j")
      sigs.agg(count(lit(1)).as("n_docs"),
          count(col("ahash")).as("n_hashed"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .crossJoin(clusters.agg(count(lit(1)).as("n_members"),
          count_distinct(col("component")).as("n_clusters")))
        .withColumn("n_dup_excess", col("n_members") - col("n_clusters"))
        .orderBy("n_docs")
    }),

    // q368: PNG palette + alpha decode — the color types a web corpus
    // actually ships beyond gray/RGB (palette PNGs are ubiquitous).
    // v = doc%4: 256-entry palette / gray+alpha / RGBA / a CORRUPT
    // 64-entry palette whose index stream overruns it (the kernel's
    // up-front index validation must NULL, never read past the PLTE).
    // Alpha bytes are present in the payloads and IGNORED by the
    // luminance contract; the oracle re-derives every stat from the
    // shared pixel + palette arithmetic.
    "q368_png_palette_alpha" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id =>
          (id, PixelFixtures.paletteAlphaPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.format").as("format"), col("__s.width").as("width"),
          col("__s.height").as("height"),
          col("__s.channels").as("channels"),
          col("__s.n_pixels").as("n_pixels"),
          col("__s.lum_sum").as("lum_sum"),
          col("__s.lum_sq_sum").as("lum_sq_sum"))
        .orderBy("doc_id")
    }),

    // q377: PNG 16-bit depth + Adam7 interlace (round 16 — completes
    // the PNG layout matrix). v = doc%4: 16-bit gray / 16-bit RGB /
    // Adam7-interlaced gray / the 16-bit+Adam7 COMBINATION. 16-bit
    // samples reduce to their high byte (low bytes carry a DIFFERENT
    // arithmetic the reduction must ignore); Adam7's seven passes are
    // reconstructed per pass and scattered through the §8.2
    // permutation — the oracle replays the LOGICAL pixels, proving the
    // wire-layout reassembly changed nothing.
    "q377_png_deep_interlace" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id =>
          (id, PixelFixtures.pngDeepPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.format").as("format"), col("__s.width").as("width"),
          col("__s.height").as("height"),
          col("__s.channels").as("channels"),
          col("__s.n_pixels").as("n_pixels"),
          col("__s.lum_sum").as("lum_sum"),
          col("__s.lum_sq_sum").as("lum_sq_sum"),
          col("__s.dhash").as("dhash"))
        .orderBy("doc_id")
    }),

    // q379: SUB-BYTE PNG depths (round 16 — closes the PNG layout
    // matrix completely). v = doc%4: 1-bit gray / 2-bit gray
    // Adam7-INTERLACED (bit packing composed with the pass scatter) /
    // 4-bit gray / 4-bit 16-entry palette. Gray samples display per
    // the spec's v·255/(2^d−1) mapping; the oracle replays the scaled
    // values arithmetically.
    "q379_png_subbyte" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          (id, PixelFixtures.pngSubBytePayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.format").as("format"), col("__s.width").as("width"),
          col("__s.height").as("height"),
          col("__s.channels").as("channels"),
          col("__s.n_pixels").as("n_pixels"),
          col("__s.lum_sum").as("lum_sum"),
          col("__s.lum_sq_sum").as("lum_sq_sum"),
          col("__s.dhash").as("dhash"))
        .orderBy("doc_id")
    }),

    // q369: the ZSTD hop — the q361 contract for the OTHER compressor
    // real corpora ship (.jsonl.zst). Multi-frame concatenation
    // (%6==5), a planted payload bitflip the XXH64 checksum must
    // quarantine (%10==3), and a frame truncation (%11==7). The
    // compressed size is encoder-dependent (entropy coding) so, unlike
    // gzip's stored blocks, it is NOT an oracle column — the oracle
    // grades the DECODED side only.
    "q369_zstd_decode" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, TarFixtures.zstPayload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          graft.functions.zstdDecode(col("__p")).as("__d"))
        .select(col("doc_id"), col("__d").isNotNull.as("parsed"),
          length(col("__d")).cast("long").as("n_bytes"),
          size(graft.functions.tokens(col("__d").cast("string")))
            .cast("long").as("n_tokens"))
        .withColumn("n_tokens",
          when(col("parsed"), col("n_tokens"))) // size() is -1 on NULL
        .orderBy("doc_id")
    }),

    // q370: the .tar.zst WebDataset chain — zstd_decode → tar_members
    // → explode in one projection (the q362 shape with the zstd hop).
    // The %9==8 tar truncation hides INSIDE a checksum-valid frame and
    // must be caught by the tar walk; %11==7 kills the frame itself.
    "q370_webdataset_zst" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id => (id, TarFixtures.zstTarPayload(id))))
        .toDF("doc_id", "__p")
      media.select(col("doc_id"),
          explode(graft.functions.tarMembers(
            graft.functions.zstdDecode(col("__p")))).as("__m"))
        .select(col("doc_id"),
          col("__m.name").as("name"), col("__m.offset").as("offset"),
          col("__m.size").as("size"))
        .orderBy("doc_id", "offset")
    }),

    // q372: ORACLE-GRADE JPEG pixels — the round-15 flagship: baseline
    // sequential JPEG decodes through the native JpegKernel (markers,
    // canonical Huffman, entropy layer with byte stuffing and restart
    // lanes, dequant, and the PINNED fixed-point IDCT — T.81 does not
    // pin an IDCT, so this kernel fixes one integer implementation as
    // its contract and the oracle replays it). Fixture blocks are
    // DC-only, collapsing the IDCT to a closed form
    // (clamp(⌊(dc·8·1448²+2^23)/2^24⌋)+128) the oracle computes per
    // block; variants cover grayscale, neutral-chroma 4:4:4 AND
    // 4:2:0 color (the integer JFIF matrix yields R=G=B=Y; 4:2:0
    // exercises the four-Y-blocks-per-MCU interleave where a wrong
    // walk scrambles every block assignment), and restart-marker
    // lanes. JPEG rows now assert full pixel statistics INCLUDING the
    // dHash — not just NULL-ness.
    "q372_jpeg_pixels" -> ((s, dir) => {
      import s.implicits._
      // not spread: 8×8 single-block JPEGs — the construct+decode stage
      // is lighter than the exchange it would take to parallelize it
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.jpegPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.format").as("format"), col("__s.width").as("width"),
          col("__s.height").as("height"),
          col("__s.channels").as("channels"),
          col("__s.n_pixels").as("n_pixels"),
          col("__s.lum_sum").as("lum_sum"),
          col("__s.lum_sq_sum").as("lum_sq_sum"),
          col("__s.dhash").as("dhash"))
        .orderBy("doc_id")
    }),

    // q376: PROGRESSIVE JPEG pixels (round 16) — SOF2 through the
    // native kernel: multi-scan marker walk, DC first + refinement
    // scans (successive approximation, Al=1→0), AC spectral-selection
    // band scans with EOBRUN and ZRL, AC refinement with correction
    // bits (T.81 §G), restart lanes resetting predictors AND EOBRUN,
    // and the 4:2:0 grid mismatch (interleaved DC walk vs per-component
    // AC rasters). Fixture blocks carry DC plus TWO AC coefficients
    // (zigzag 1 and 20), so the oracle replays the pinned IDCT's
    // three-term closed form per pixel — same contract as q372, now
    // with AC base functions in play.
    "q376_progressive_jpeg" -> ((s, dir) => {
      import s.implicits._
      val media = spreadIds(t(s, dir, "documents")).as[Long]
        .mapPartitions(_.map(id =>
          (id, PixelFixtures.progressiveJpegPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.format").as("format"), col("__s.width").as("width"),
          col("__s.height").as("height"),
          col("__s.channels").as("channels"),
          col("__s.n_pixels").as("n_pixels"),
          col("__s.lum_sum").as("lum_sum"),
          col("__s.lum_sq_sum").as("lum_sq_sum"),
          col("__s.dhash").as("dhash"))
        .orderBy("doc_id")
    }),

    // q381: IMA/DVI ADPCM sample statistics (round 16 — the fourth
    // WAV codec, the telephony/game-corpus block format): per-block
    // int16 predictor + step-index headers, the public 89-entry
    // step/index tables, low-nibble-first packing, a partial final
    // block, and two corruption plants (step index past the table;
    // mid-data truncation). The oracle replays the ADPCM recursion —
    // per-nibble predictor/step-index state — in a recursive CTE over
    // the same doc_id arithmetic.
    "q381_ima_adpcm" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, AudioFixtures.imaPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pcmStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.codec").as("codec"),
          col("__s.sample_rate").as("sample_rate"),
          col("__s.bits").as("bits"),
          col("__s.n_samples").as("n_samples"),
          col("__s.duration_ms").as("duration_ms"),
          col("__s.sum_q").as("sum_q"),
          col("__s.sq_sum").as("sq_sum"),
          col("__s.n_clipped").as("n_clipped"),
          col("__s.lead_silence").as("lead_silence"),
          col("__s.trail_silence").as("trail_silence"))
        .orderBy("doc_id")
    }),

    // q386: MS-ADPCM sample statistics (round 17 — the fifth WAV
    // codec, the other ubiquitous legacy block format): 7·ch-byte
    // block headers (bPredictor/iDelta/iSamp1/iSamp2 per channel),
    // HIGH-nibble-first packing with channels alternating per nibble
    // in stereo, the public adaptation + coefficient tables, partial
    // final blocks, and two corruption plants (bPredictor past the
    // 7-entry tables; mid-data truncation). The oracle replays the
    // per-nibble predictor/delta recursion — per-channel state in one
    // recursive CTE — over the same doc_id arithmetic.
    "q386_ms_adpcm" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, AudioFixtures.msPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pcmStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.codec").as("codec"),
          col("__s.sample_rate").as("sample_rate"),
          col("__s.channels").as("channels"),
          col("__s.n_samples").as("n_samples"),
          col("__s.duration_ms").as("duration_ms"),
          col("__s.sum_q").as("sum_q"),
          col("__s.sq_sum").as("sq_sum"),
          col("__s.n_clipped").as("n_clipped"),
          col("__s.lead_silence").as("lead_silence"),
          col("__s.trail_silence").as("trail_silence"))
        .orderBy("doc_id")
    }),

    // q387: STEREO IMA ADPCM (round 17 — the interleave layout mono
    // q381 stops short of): per-block 4-byte headers for EACH channel,
    // then alternating 4-byte per-channel chunks, output
    // frame-interleaved. Corruption plants: right-channel step index
    // past the table; a truncation that breaks the chunk-pair rule.
    // The oracle runs q381's recursion once per LANE with the chunk
    // byte mapping k = (t//4)·8 + lane·4 + t%4 and interleaves by
    // position arithmetic.
    "q387_stereo_ima_adpcm" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          (id, AudioFixtures.imaStereoPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pcmStats(col("__p")).as("__s"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.codec").as("codec"),
          col("__s.sample_rate").as("sample_rate"),
          col("__s.channels").as("channels"),
          col("__s.n_samples").as("n_samples"),
          col("__s.duration_ms").as("duration_ms"),
          col("__s.sum_q").as("sum_q"),
          col("__s.sq_sum").as("sq_sum"),
          col("__s.n_clipped").as("n_clipped"),
          col("__s.lead_silence").as("lead_silence"),
          col("__s.trail_silence").as("trail_silence"))
        .orderBy("doc_id")
    }),

    // q388: FLAC sample decode, fixed-predictor subset (round 17 —
    // the sixth codec, the archival lossless format: without sample
    // reconstruction the envelope hash cannot see through FLAC
    // compression). Two sequential frames per payload covering all
    // four subset subframe kinds (constant / verbatim / fixed order
    // 1 / fixed order 2) with Rice-coded partitioned residuals; the
    // oracle replays the fixed predictors as ITERATED PREFIX SUMS
    // (order 1 = one windowed sum of the residuals, order 2 = two) —
    // no recursion needed. Corruption plants: an LPC subframe (out of
    // the stated subset → NULL, loud) and mid-frame truncation.
    "q388_flac_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, AudioFixtures.flacPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pcmStats(col("__p")).as("__s"),
          graft.functions.audioHash(col("__p")).as("ahash"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.codec").as("codec"),
          col("__s.sample_rate").as("sample_rate"),
          col("__s.channels").as("channels"),
          col("__s.n_samples").as("n_samples"),
          col("__s.duration_ms").as("duration_ms"),
          col("__s.sum_q").as("sum_q"),
          col("__s.sq_sum").as("sq_sum"),
          col("__s.n_clipped").as("n_clipped"),
          col("__s.lead_silence").as("lead_silence"),
          col("__s.trail_silence").as("trail_silence"),
          col("ahash"))
        .orderBy("doc_id")
    }),

    // q389: FLAC STEREO DECORRELATION (round 17, closing q388's named
    // exclusion): left/side, right/side, and mid/side channel
    // assignments — the side channel carries one extra bit per sample
    // and every reconstruction is integer-exact, so the decoded
    // output is the ORIGINAL L/R and the oracle replays the target
    // formulas with NO decorrelation model (losslessness IS the
    // contract being graded). Corruption plants: the reserved channel
    // code 11; mid-frame truncation.
    "q389_flac_stereo" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          (id, AudioFixtures.flacStereoPayload(id))))
        .toDF("doc_id", "__p")
      media
        .select(col("doc_id"),
          graft.functions.pcmStats(col("__p")).as("__s"),
          graft.functions.audioHash(col("__p")).as("ahash"))
        .select(col("doc_id"), col("__s").isNotNull.as("parsed"),
          col("__s.codec").as("codec"),
          col("__s.sample_rate").as("sample_rate"),
          col("__s.channels").as("channels"),
          col("__s.n_samples").as("n_samples"),
          col("__s.duration_ms").as("duration_ms"),
          col("__s.sum_q").as("sum_q"),
          col("__s.sq_sum").as("sq_sum"),
          col("__s.n_clipped").as("n_clipped"),
          col("__s.lead_silence").as("lead_silence"),
          col("__s.trail_silence").as("trail_silence"),
          col("ahash"))
        .orderBy("doc_id")
    }),

    // q378: the band-bucket OCCUPANCY GUARD under a constant-image
    // flood (round 16 — the q374 fixture incident as a production
    // hazard): 60% of the corpus is the SAME solid fill (any flat
    // image dHashes to 0), piling one exact group into all four of its
    // (band, nib) buckets. signaturePairs64Guarded degrades LOUDLY,
    // never quadratically: exact duplicates match via linear STAR
    // edges (same components as all-pairs), near pairs only through
    // unsaturated buckets, and bandSaturation reports the flood. The
    // near-dup slice (q343's edited pairs) still matches through its
    // unsaturated buckets.
    "q378_occupancy_guard" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.floodPayload(id))))
        .toDF("doc_id", "__p")
      val sigs = media
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p"))
            .getField("dhash").as("dhash"))
        .transform(graft.operators.CacheScope.track)
      val sat = graft.operators.Dedup.bandSaturation(
        sigs, "doc_id", "dhash", maxOccupancy = 32)
      val pairs = graft.operators.Dedup.signaturePairs64Guarded(
        sigs, "doc_id", "dhash", maxHamming = 2, maxOccupancy = 32)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        sigs.filter(col("dhash").isNotNull), "doc_id", pairs)
      sigs.agg(count(lit(1)).as("n_images"),
          count(col("dhash")).as("n_hashed"),
          count(when(col("dhash") === 0L, 1)).as("n_flat"))
        .crossJoin(sat.agg(
          sum(col("n_saturated_buckets")).as("n_saturated_buckets"),
          sum(col("n_sigs_in_saturated")).as("n_rows_saturated")))
        .crossJoin(pairs.agg(
          count(when(col("hamming") === 0L, 1)).as("n_exact_edges"),
          count(when(col("hamming") >= 1L, 1)).as("n_near_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
        .orderBy("n_images")
    }),

    // q380: the occupancy guard at the INCREMENTAL (production) shape
    // — yesterday's corpus already holds half the solid-fill flood and
    // today's batch ships the other half, the case where the unguarded
    // batch-vs-corpus band join would emit |corpus dups|×|batch dups|
    // rows. Guarded: one representative cross edge per matched batch
    // id, star edges within the batch, near matches only through
    // buckets under the COMBINED occupancy cap; survivors identical to
    // the unguarded matcher outside saturated near-recall regions.
    "q380_incremental_guard" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.floodPayload(id))))
        .toDF("doc_id", "__p")
      val sigs = media
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p"))
            .getField("dhash").as("dhash"))
        .transform(graft.operators.CacheScope.track)
      val corpusSigs = sigs.filter(col("doc_id") % 2 === 0)
      val batchSigs = sigs.filter(col("doc_id") % 2 === 1)
      val sat = graft.operators.Dedup.bandSaturation(
        sigs, "doc_id", "dhash", maxOccupancy = 32)
      val matches = graft.operators.Dedup.signatureMatches64IncrementalGuarded(
        batchSigs, "doc_id", "dhash", corpusSigs, "doc_id", "dhash",
        maxHamming = 2, maxOccupancy = 32)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        batchSigs.filter(col("dhash").isNotNull), "doc_id", matches)
      corpusSigs.agg(count(col("dhash")).as("n_corpus_sigs"))
        .crossJoin(batchSigs.agg(count(col("dhash")).as("n_batch_sigs")))
        .crossJoin(sat.agg(
          sum(col("n_saturated_buckets")).as("n_saturated_buckets"),
          sum(col("n_sigs_in_saturated")).as("n_rows_saturated")))
        .crossJoin(matches.agg(
          count(when(col("hamming") === 0L && col("i") % 2 === 0, 1))
            .as("n_exact_cross"),
          count(when(col("hamming") === 0L && col("i") % 2 =!= 0, 1))
            .as("n_exact_star"),
          count(when(col("hamming") >= 1L && col("i") % 2 === 0, 1))
            .as("n_near_cross"),
          count(when(col("hamming") >= 1L && col("i") % 2 =!= 0, 1))
            .as("n_near_within")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
        .orderBy("n_corpus_sigs")
    }),

    // q373: the incremental image dedup (q366) against a PUBLISHED
    // signature artifact — the 100-TB shape the q366 scale notes
    // called for: the corpus signature table is persisted PRE-BANDED
    // (Dedup.bandRows64: 4 rows × 24 bytes per image) and BUCKETED by
    // the join key (band, nib), so the daily batch-vs-corpus cross
    // join reads co-located buckets with NO corpus-side exchange —
    // the banding shuffle is paid once at table publish, not per
    // arriving batch. Grades against q366's exact oracle SQL, so the
    // driver's hash compare proves session-built ≡ published-artifact
    // (the q348/q371 pattern).
    "q373_bucketed_image_dedup" -> ((s, dir) => {
      import s.implicits._
      // parity filter BEFORE the mapPartitions barrier (see q366)
      def media(par: Int): DataFrame =
        spreadIds(t(s, dir, "documents").filter(col("doc_id") % 2 === par))
          .as[Long]
          .mapPartitions(_.map(id =>
            (id, TarFixtures.incrementalPayload(id))))
          .toDF("doc_id", "__p")
      def sigs(shards: DataFrame): DataFrame = shards
        .select(col("doc_id"), col("__p"),
          explode(graft.functions.tarMembers(col("__p"))).as("__m"))
        .filter(col("__m.name").endsWith(".bmp"))
        .select((col("doc_id") * 8L +
            regexp_extract(col("__m.name"), "_(\\d+)\\.", 1)
              .cast("long")).as("img_id"),
          graft.functions.pixelStats(
            col("__p").substr(col("__m.offset") + 1L, col("__m.size")))
            .getField("dhash").as("dhash"))
      val corpusSigs = sigs(media(0))
        .transform(graft.operators.CacheScope.track)
      // PUBLISH: yesterday's job wrote this once; today reads it
      graft.io.TableIO.writeBucketed(
        graft.operators.Dedup.bandRows64(corpusSigs, "img_id", "dhash"),
        "graft_image_sigs_banded", Seq("band", "nib"), numBuckets = 8)
      val batchSigs = sigs(media(1))
        .transform(graft.operators.CacheScope.track)
      val matches =
        graft.operators.Dedup.signatureMatches64IncrementalBanded(
          batchSigs, "img_id", "dhash",
          s.table("graft_image_sigs_banded"), "img_id", "dhash",
          maxHamming = 0)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        batchSigs, "img_id", matches)
        .transform(graft.operators.CacheScope.track)
      val refreshed = corpusSigs.unionByName(survivors)
      corpusSigs.agg(count(lit(1)).as("n_corpus_sigs"))
        .crossJoin(batchSigs.agg(count(lit(1)).as("n_batch_images"),
          count(col("dhash")).as("n_batch_hashed")))
        .crossJoin(matches.agg(
          count(when(col("i").bitwiseAND(lit(8L)) === 0L, 1))
            .as("n_cross_pairs"),
          count(when(col("i").bitwiseAND(lit(8L)) =!= 0L, 1))
            .as("n_within_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_batch_survivors")))
        .crossJoin(refreshed.agg(count(lit(1)).as("n_total_sigs")))
        .orderBy("n_corpus_sigs")
    }),

    // q382: the occupancy guard at the PUBLISHED-artifact shape (round
    // 17 — closes round 16's #1 weak mark): q380's flood split, but
    // the corpus side is the PERSISTED pre-banded bucketed signature
    // table (bandRows64 + writeBucketed), consumed AS STORED by
    // signatureMatches64IncrementalBandedGuarded — the per-(band, nib,
    // sig) corpus reduction aggregates in place with no corpus-side
    // exchange (SkewBucketSpec pins the plan), so a logo flood stored
    // IN the published table collapses to one row per bucket before
    // any join sees it. Grades against q380's exact oracle SQL: the
    // driver's hash compare proves published-artifact ≡ session-built
    // guard.
    "q382_published_banded_guard" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, PixelFixtures.floodPayload(id))))
        .toDF("doc_id", "__p")
      val sigs = media
        .select(col("doc_id"),
          graft.functions.pixelStats(col("__p"))
            .getField("dhash").as("dhash"))
        .transform(graft.operators.CacheScope.track)
      val corpusSigs = sigs.filter(col("doc_id") % 2 === 0)
      val batchSigs = sigs.filter(col("doc_id") % 2 === 1)
      // PUBLISH: yesterday's job banded + bucketed the corpus once
      graft.io.TableIO.writeBucketed(
        graft.operators.Dedup.bandRows64(corpusSigs, "doc_id", "dhash"),
        "graft_image_sigs_banded_guard", Seq("band", "nib"),
        numBuckets = 8)
      val sat = graft.operators.Dedup.bandSaturation(
        sigs, "doc_id", "dhash", maxOccupancy = 32)
      val matches =
        graft.operators.Dedup.signatureMatches64IncrementalBandedGuarded(
          batchSigs, "doc_id", "dhash",
          s.table("graft_image_sigs_banded_guard"), "doc_id", "dhash",
          maxHamming = 2, maxOccupancy = 32)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        batchSigs.filter(col("dhash").isNotNull), "doc_id", matches)
      corpusSigs.agg(count(col("dhash")).as("n_corpus_sigs"))
        .crossJoin(batchSigs.agg(count(col("dhash")).as("n_batch_sigs")))
        .crossJoin(sat.agg(
          sum(col("n_saturated_buckets")).as("n_saturated_buckets"),
          sum(col("n_sigs_in_saturated")).as("n_rows_saturated")))
        .crossJoin(matches.agg(
          count(when(col("hamming") === 0L && col("i") % 2 === 0, 1))
            .as("n_exact_cross"),
          count(when(col("hamming") === 0L && col("i") % 2 =!= 0, 1))
            .as("n_exact_star"),
          count(when(col("hamming") >= 1L && col("i") % 2 === 0, 1))
            .as("n_near_cross"),
          count(when(col("hamming") >= 1L && col("i") % 2 =!= 0, 1))
            .as("n_near_within")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
        .orderBy("n_corpus_sigs")
    }),

    // q383: the occupancy guard at the TEXT tier (round 17 —
    // boilerplate is the text twin of the logo flood: cookie banners,
    // license headers, near-empty documents all fold to ONE wide
    // simhash). 60% of the corpus is the same cookie-banner string;
    // simhashPairsWideGuarded stars the exact group linearly (never
    // C(300,2) pairs), near pairs ride unsaturated buckets only, and
    // bandSaturationWide reports the flood per band. Oracle replays
    // the wide simhash over the flooded text, the 14-bit banding, the
    // occupancy rule, star/near edge sets, and the CC survivors.
    "q383_simhash_flood_guard" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 5 <= 2, lit(BoilerplateText))
            .otherwise(col("text")).as("text"))
        .transform(graft.operators.CacheScope.track)
      val sat = graft.operators.Dedup.bandSaturationWide(
        docs, "doc_id", "text", maxOccupancy = 32)
      val pairs = graft.operators.Dedup.simhashPairsWideGuarded(
        docs, "doc_id", "text", maxHamming = 2, maxOccupancy = 32)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        docs, "doc_id", pairs)
      docs.agg(count(lit(1)).as("n_docs"),
          count(when(col("doc_id") % 5 <= 2, 1)).as("n_flood"))
        .crossJoin(sat.agg(
          sum(col("n_saturated_buckets")).as("n_saturated_buckets"),
          sum(col("n_sigs_in_saturated")).as("n_rows_saturated")))
        .crossJoin(pairs.agg(
          count(when(col("hamming") === 0L, 1)).as("n_exact_edges"),
          count(when(col("hamming") >= 1L, 1)).as("n_near_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
        .orderBy("n_docs")
    }),

    // q384: the text guard at the INCREMENTAL (production) shape —
    // yesterday's corpus already holds half the boilerplate pile
    // (even ids, known only by its wideSignatures table) and today's
    // batch ships the other half (odd ids): representative cross
    // edges, batch stars, near matches through COMBINED-occupancy
    // buckets, survivors via keepCanonical over the batch.
    "q384_incremental_text_guard" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 5 <= 2, lit(BoilerplateText))
            .otherwise(col("text")).as("text"))
        .transform(graft.operators.CacheScope.track)
      val corpusDocs = docs.filter(col("doc_id") % 2 === 0)
      val batchDocs = docs.filter(col("doc_id") % 2 === 1)
        .transform(graft.operators.CacheScope.track)
      val corpusSigs = graft.operators.Dedup.wideSignatures(
        corpusDocs, "doc_id", "text")
      val sat = graft.operators.Dedup.bandSaturationWide(
        docs, "doc_id", "text", maxOccupancy = 32)
      val matches =
        graft.operators.Dedup.simhashMatchesWideIncrementalGuarded(
          batchDocs, "doc_id", "text", corpusSigs,
          maxHamming = 2, maxOccupancy = 32)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        batchDocs, "doc_id", matches)
      corpusDocs.agg(count(lit(1)).as("n_corpus_sigs"))
        .crossJoin(batchDocs.agg(count(lit(1)).as("n_batch_sigs")))
        .crossJoin(sat.agg(
          sum(col("n_saturated_buckets")).as("n_saturated_buckets"),
          sum(col("n_sigs_in_saturated")).as("n_rows_saturated")))
        .crossJoin(matches.agg(
          count(when(col("hamming") === 0L && col("i") % 2 === 0, 1))
            .as("n_exact_cross"),
          count(when(col("hamming") === 0L && col("i") % 2 =!= 0, 1))
            .as("n_exact_star"),
          count(when(col("hamming") >= 1L && col("i") % 2 === 0, 1))
            .as("n_near_cross"),
          count(when(col("hamming") >= 1L && col("i") % 2 =!= 0, 1))
            .as("n_near_within")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
        .orderBy("n_corpus_sigs")
    }),

    // q385: VIDEO perceptual dedup — the FOURTH modality (round 17):
    // AVI MJPEG frames are baseline JPEGs, so VideoFrameKernel hands
    // each sampled frame chunk to the native JpegKernel and the frame
    // dHash rides the guarded batch-vs-corpus matcher UNCHANGED. The
    // fixture plants byte-unequal RE-MUXED duplicates — the pair
    // (2m, 2m+1) shares its first frame's JPEG bytes but odd docs mux
    // behind a JUNK chunk with 00db ids — the duplicate class only
    // frame-PIXEL hashing catches (byte/digest dedup sees two distinct
    // files). Oracle replays the closed-form DC-only JPEG block
    // values, the area-weighted dHash cells, the 4×16-bit banding +
    // occupancy rule, and the CC survivors arithmetically.
    "q385_mjpeg_video_dedup" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, VideoFixtures.mjpegAvi(id))))
        .toDF("doc_id", "__p")
      val sigs = media
        .select(col("doc_id"),
          element_at(graft.functions.videoFrameStats(col("__p"), 1000), 1)
            .getField("dhash").as("dhash"))
        .transform(graft.operators.CacheScope.track)
      val corpusSigs = sigs.filter(col("doc_id") % 2 === 0)
      val batchSigs = sigs.filter(col("doc_id") % 2 === 1)
      val matches =
        graft.operators.Dedup.signatureMatches64IncrementalGuarded(
          batchSigs, "doc_id", "dhash", corpusSigs, "doc_id", "dhash",
          maxHamming = 2, maxOccupancy = 32)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        batchSigs.filter(col("dhash").isNotNull), "doc_id", matches)
      corpusSigs.agg(count(lit(1)).as("n_corpus_rows"),
          count(col("dhash")).as("n_corpus_sigs"))
        .crossJoin(batchSigs.agg(count(lit(1)).as("n_batch_rows"),
          count(col("dhash")).as("n_batch_sigs")))
        .crossJoin(matches.agg(
          count(when(col("hamming") === 0L && col("i") % 2 === 0, 1))
            .as("n_exact_cross"),
          count(when(col("hamming") === 0L && col("i") % 2 =!= 0, 1))
            .as("n_exact_star"),
          count(when(col("hamming") >= 1L && col("i") % 2 === 0, 1))
            .as("n_near_cross"),
          count(when(col("hamming") >= 1L && col("i") % 2 =!= 0, 1))
            .as("n_near_within")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
        .orderBy("n_corpus_rows")
    }),

    // q374: the round-15 CAPSTONE — a compressed-shard curation
    // increment as ONE plan, composing every piece the round built:
    // .tar.zst shards (zstd_decode → tar_members, corruption planted
    // at BOTH layers) carrying JPEG samples (the native JpegKernel's
    // pinned-IDCT pixels → dHash), deduplicated INCREMENTALLY against
    // yesterday's corpus (signatureMatches64Incremental: even docs =
    // corpus known only by its signature table, odd docs = today's
    // batch), keepCanonical over the batch, union-append refresh. The
    // oracle replays the whole chain arithmetically: tar layout →
    // closed-form JPEG block values → per-image dHash flood → pair
    // sets → CC → survivors.
    "q374_compressed_shard_dedup" -> ((s, dir) => {
      import s.implicits._
      // parity filter BEFORE the mapPartitions barrier (see q366)
      def media(par: Int): DataFrame =
        spreadIds(t(s, dir, "documents").filter(col("doc_id") % 2 === par))
          .as[Long]
          .mapPartitions(_.map(id =>
            (id, TarFixtures.jpegShardPayload(id))))
          .toDF("doc_id", "__p")
      def sigs(shards: DataFrame): DataFrame = shards
        .select(col("doc_id"),
          graft.functions.zstdDecode(col("__p")).as("__t"))
        .select(col("doc_id"), col("__t"),
          explode(graft.functions.tarMembers(col("__t"))).as("__m"))
        .filter(col("__m.name").endsWith(".jpg"))
        .select((col("doc_id") * 8L +
            regexp_extract(col("__m.name"), "_(\\d+)\\.", 1)
              .cast("long")).as("img_id"),
          graft.functions.pixelStats(
            col("__t").substr(col("__m.offset") + 1L, col("__m.size")))
            .getField("dhash").as("dhash"))
      val corpusSigs = sigs(media(0))
        .transform(graft.operators.CacheScope.track)
      val batchSigs = sigs(media(1))
        .transform(graft.operators.CacheScope.track)
      val matches = graft.operators.Dedup.signatureMatches64Incremental(
        batchSigs, "img_id", "dhash", corpusSigs, "img_id", "dhash",
        maxHamming = 0)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        batchSigs, "img_id", matches)
        .transform(graft.operators.CacheScope.track)
      val refreshed = corpusSigs.unionByName(survivors)
      corpusSigs.agg(count(lit(1)).as("n_corpus_sigs"))
        .crossJoin(batchSigs.agg(count(lit(1)).as("n_batch_images"),
          count(col("dhash")).as("n_batch_hashed")))
        .crossJoin(matches.agg(
          count(when(col("i").bitwiseAND(lit(8L)) === 0L, 1))
            .as("n_cross_pairs"),
          count(when(col("i").bitwiseAND(lit(8L)) =!= 0L, 1))
            .as("n_within_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_batch_survivors")))
        .crossJoin(refreshed.agg(count(lit(1)).as("n_total_sigs")))
        .orderBy("n_corpus_sigs")
    }),

    // q375: INCREMENTAL audio dedup — the same batch-vs-corpus
    // machinery as images (signatureMatches64Incremental is 64-bit-
    // signature-generic), driven by the envelope hash: even docs are
    // yesterday's corpus (known only by its (doc_id, ahash) table),
    // odd docs today's batch. The q367 fixture's planted transcode
    // pairs (3f, 3f+1) are consecutive ids — ALWAYS opposite parity —
    // so every planted duplicate is a CROSS corpus↔batch pair, the
    // shape an ingest increment actually deduplicates.
    "q375_incremental_audio_dedup" -> ((s, dir) => {
      val sigs = spreadIds(t(s, dir, "documents"))
        .select(col("doc_id"),
          graft.functions.audioHash(audioDedupPayload(col("doc_id")))
            .as("ahash"))
      val corpusSigs = sigs.filter(col("doc_id") % 2 === 0)
        .transform(graft.operators.CacheScope.track)
      val batchSigs = sigs.filter(col("doc_id") % 2 === 1)
        .transform(graft.operators.CacheScope.track)
      val matches = graft.operators.Dedup.signatureMatches64Incremental(
        batchSigs, "doc_id", "ahash", corpusSigs, "doc_id", "ahash",
        maxHamming = 2)
        .transform(graft.operators.CacheScope.track)
      val survivors = graft.operators.Components.keepCanonical(
        batchSigs.filter(col("ahash").isNotNull), "doc_id", matches)
      corpusSigs.agg(count(lit(1)).as("n_corpus_rows"),
          count(col("ahash")).as("n_corpus_sigs"))
        .crossJoin(batchSigs.agg(count(lit(1)).as("n_batch_rows"),
          count(col("ahash")).as("n_batch_sigs")))
        .crossJoin(matches.agg(
          count(when(pmod(col("i"), lit(2L)) === 0L, 1))
            .as("n_cross_pairs"),
          count(when(pmod(col("i"), lit(2L)) =!= 0L, 1))
            .as("n_within_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_batch_survivors")))
        .orderBy("n_corpus_rows")
    })
  )

  /** The q348/q371 SHARED composed graph health-check: datasheet
    * counts + assortativity + hub-removal resilience + 4-hop seed
    * reach off ONE edge table — the caller decides whether `edges` is
    * a CacheScope-tracked session build (q348) or the materialized
    * bucketed artifact (q371); everything downstream is identical, so
    * the two gates hash identically (they grade against one oracle
    * SQL string, oGraphPipelineSql).
    */
  private def graphHealthCheck(li: DataFrame, edges: DataFrame): DataFrame = {
      val nodes = edges.select(col("item_a").as("n"))
        .unionByName(edges.select(col("item_b").as("n"))).distinct()
      val counts = nodes.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      val assort = graft.operators.Triangles.assortativity(edges,
        "item_a", "item_b").select(col("corr").as("assortativity"))
      def giant(e: DataFrame) = graft.operators.Components
        .connectedComponents(e, "item_a", "item_b")
        .groupBy("component").agg(count(lit(1)).as("__sz"))
        .agg(coalesce(max(col("__sz")), lit(0L)).as("g"))
      val before = giant(edges).select(col("g").as("giant_size"))
      val sym = edges.union(edges.select(col("item_b"), col("item_a")))
      // count, not count_distinct: `edges` is the coEngagementPairs
      // output (unique pairs, item_a < item_b), so the symmetrized
      // (node, nbr) rows are distinct by construction — the two-level
      // distinct aggregate would re-shuffle the 2|E| rows a second
      // time to deduplicate a set that has no duplicates
      val deg = sym.groupBy(col("item_a").as("node"))
        .agg(count(col("item_b")).as("deg"))
      val hubs = deg.orderBy(desc("deg"), col("node")).limit(5)
        .select(col("node").as("__hub"))
      val filtered = edges
        .join(broadcast(hubs), col("item_a") === col("__hub"), "left_anti")
        .join(broadcast(hubs), col("item_b") === col("__hub"), "left_anti")
      val after = giant(filtered).select(col("g").as("giant_after"))
      val items = li.select(col("l_partkey").as("item")).distinct()
      val seeds = items.filter(col("item") % 97 === 0)
      val hops = graft.operators.Components.boundedHops(edges, "item_a",
        "item_b", seeds, "item", maxHops = 4)
      val reach = hops.agg(count(lit(1)).as("n_reached"))
        .crossJoin(items.join(hops, col("item") === col("node"),
          "left_anti").agg(count(lit(1)).as("n_unreached")))
      counts.crossJoin(assort).crossJoin(before).crossJoin(after)
        .crossJoin(reach)
        .withColumn("density",
          when(col("n_nodes") > 1L,
            (lit(2L) * col("n_edges")).cast("double") /
              (col("n_nodes") * (col("n_nodes") - 1L)).cast("double")))
        .withColumn("giant_share",
          when(col("n_nodes") > 0L,
            col("giant_size").cast("double") /
              col("n_nodes").cast("double")))
        .withColumn("retained",
          when(col("giant_size") > 0L,
            col("giant_after").cast("double") /
              col("giant_size").cast("double")))
        .select("n_nodes", "n_edges", "density", "assortativity",
          "giant_size", "giant_share", "giant_after", "retained",
          "n_reached", "n_unreached")
        .orderBy("n_nodes")
  }

  /** q347's planted OOV word (shared engine/oracle literal — the q298
    * discipline): ü, ç, ß are 2-byte code points no vocab unit covers,
    * so byte fallback MUST fire on them.
    */
  private val byteFallbackWord: String = "münçhen42ß"

  /** q347's per-byte fallback score — more punitive than q307's UNK
    * (a real model scores byte pieces far below learned units).
    */
  private val viterbiByteScoreQ: Long = -6144L

  /** q345/q346's constructed PCM WAV payload: 44-byte canonical header
    * (PCM tag 1, mono, 16-bit) + n = doc_id%120+40 samples rendered as
    * two's-complement LE hex. Sample formulas (the oracle's contract):
    *   m = doc_id % 3;  rate = (doc_id % 50)·1000 + 8000
    *   m=0 ramp:    s(i) = (i·523 + doc_id·31) % 65536 − 32768
    *   m=1 square:  A = 32767 if doc_id%5==0 (planted clipping) else
    *                doc_id % 30000 + 1000;  s(i) = ±A by (i>>3) % 2
    *   m=2 padded:  z1 = doc_id%10 leading and z2 = (doc_id·3)%10
    *                trailing zeros around a 5000 tone
    * doc_id%10==9 truncates mid-data (44+n of 44+2n bytes) → NULL.
    */
  private def pcmPayload(docId: Column): Column = {
    val m = docId % 3
    val n = docId % 120 + 40
    val rate = (docId % 50) * 1000L + 8000L
    def hxp(c: Column, digits: Int) = lpad(hex(c), digits, "0")
    def le16(c: Column) = {
      val x = hxp(c, 4)
      concat(substring(x, 3, 2), substring(x, 1, 2))
    }
    def le32(c: Column) = {
      val x = hxp(c, 8)
      concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2))
    }
    val amp = when(docId % 5 === 0, lit(32767L))
      .otherwise(docId % 30000L + 1000L)
    val z1 = docId % 10
    val z2 = (docId * 3) % 10
    def sample(i: Column): Column = {
      val ramp = pmod(i * 523L + docId * 31L, lit(65536L)) - 32768L
      val square = when(pmod(shiftright(i, 3), lit(2L)) === 0, amp)
        .otherwise(-amp)
      val sil = when(i < z1 || i >= n - z2, lit(0L)).otherwise(lit(5000L))
      when(m === 0, ramp).when(m === 1, square).otherwise(sil)
    }
    val dataHex = array_join(
      transform(sequence(lit(0L), n - 1),
        i => le16(pmod(sample(i), lit(65536L)))), "")
    val wav = unhex(concat(
      lit("52494646"), le32(n * 2L + 36L),
      lit("57415645" + "666D7420" + "10000000" + "0100" + "0100"),
      le32(rate), le32(rate * 2L), lit("0200" + "1000" + "64617461"),
      le32(n * 2L), dataHex))
    when(docId % 10 === 9, wav.substr(lit(1), lit(44L) + n))
      .otherwise(wav)
  }

  /** q367's constructed WAV trio per doc family f = ⌊doc/3⌋ (mono,
    * 8 kHz, n = f%90+80 samples — always ≥ 65 so the envelope hash is
    * defined):
    *   v=0 (doc ≡ 0 mod 3): G.711 μ-law, code bytes
    *       c(i) = (i²·(f%13+3) + i·37 + (f//13)·(i%11) + f·11 + 1)
    *       % 256 — the QUADRATIC term and the two independent f mixes
    *       matter (q342 dHash-diversity lesson, relearned on audio: a
    *       pure i·37+phase stream is one fixed cycle rotated, giving
    *       ≤ 256·90 distinct streams whose envelope hashes cluster
    *       within small Hamming balls — measured 3636 pairs at sf0.1
    *       against ~1350 planted before this form);
    *   v=1: the PCM-16 TRANSCODE of v=0 — samples are exactly
    *       ulaw2linear(c(i)) (the decode-then-store round trip a
    *       format-normalizing pipeline produces): byte-unequal
    *       payloads, different codecs, IDENTICAL linear samples,
    *       identical envelope hash — the planted re-encode duplicate;
    *   v=2: PCM-16 s(i) = (i²·1997 + i·523 + (doc%251)·(i%17)·64 +
    *       doc·31) % 65536 − 32768 — unique audio. Both non-linear
    *       terms matter: a LINEAR ramp's |s| is piecewise monotone
    *       (envelope = a few long sign runs), and without the
    *       (doc%251)·(i%17) mix two docs differ by a CONSTANT offset
    *       before the wrap — a value-space rotation that preserves
    *       most window comparisons (measured: 511 chance v2–v2 pairs
    *       at sf0.1 with the offset-only form, 0 with this one).
    * The μ-law expansion here is the public CCITT formula re-spelled
    * in Column arithmetic — construction shares no code with
    * [[graft.expressions.PcmKernel]]'s decode side. doc%10==9
    * truncates mid-data → NULL (the hash drops from banding).
    */
  private def audioDedupPayload(docId: Column): Column = {
    val f = ((docId - pmod(docId, lit(3L))) / lit(3L)).cast("long")
    val v = pmod(docId, lit(3L))
    val n = pmod(f, lit(90L)) + 80L
    def hxp(c: Column, digits: Int) = lpad(hex(c), digits, "0")
    def le16(c: Column) = {
      val x = hxp(c, 4)
      concat(substring(x, 3, 2), substring(x, 1, 2))
    }
    def le32(c: Column) = {
      val x = hxp(c, 8)
      concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2))
    }
    def code(i: Column): Column = pmod(
      i * i * (pmod(f, lit(13L)) + 3L) + i * 37L +
        ((f - pmod(f, lit(13L))) / lit(13L)).cast("long") * pmod(i, lit(11L)) +
        f * 11L + 1L, lit(256L))
    def ulawLin(c: Column): Column = {
      val u = lit(255L) - c
      val seg = pmod(shiftright(u, 4), lit(8L))
      val pow2 = when(seg === 0, 1L).when(seg === 1, 2L)
        .when(seg === 2, 4L).when(seg === 3, 8L).when(seg === 4, 16L)
        .when(seg === 5, 32L).when(seg === 6, 64L).otherwise(128L)
      val t = (pmod(u, lit(16L)) * 8L + 132L) * pow2
      when(u >= 128L, lit(132L) - t).otherwise(t - 132L)
    }
    def ramp(i: Column): Column =
      pmod(i * i * 1997L + i * 523L +
        pmod(docId, lit(251L)) * pmod(i, lit(17L)) * 64L +
        docId * 31L, lit(65536L)) - 32768L
    def pcmHex(s: Column => Column): Column = array_join(
      transform(sequence(lit(0L), n - 1),
        i => le16(pmod(s(i), lit(65536L)))), "")
    val dataHex = when(v === 0, array_join(
        transform(sequence(lit(0L), n - 1), i => hxp(code(i), 2)), ""))
      .when(v === 1, pcmHex(i => ulawLin(code(i))))
      .otherwise(pcmHex(ramp))
    val dataLen = when(v === 0, n).otherwise(n * 2L)
    val wav = unhex(concat(
      lit("52494646"), le32(dataLen + 36L),
      lit("57415645" + "666D7420" + "10000000"),
      when(v === 0, lit("0700")).otherwise(lit("0100")), lit("0100"),
      le32(lit(8000L)),
      le32(when(v === 0, lit(8000L)).otherwise(lit(16000L))),
      when(v === 0, lit("0100")).otherwise(lit("0200")),
      when(v === 0, lit("0800")).otherwise(lit("1000")),
      lit("64617461"), le32(dataLen), dataHex))
    when(pmod(docId, lit(10L)) === 9,
      wav.substr(lit(1), lit(44L) + n - when(v === 0, 10L).otherwise(0L)))
      .otherwise(wav)
  }

  /** q350's constructed G.711 WAV: canonical 44-byte header (format
    * tag 7 μ-law on even docs / 6 A-law on odd; mono, 8 bits, 8 kHz —
    * the telephony layout) + n = doc_id%90+30 companded code bytes
    * c(i) = (i·37 + doc_id·11) % 256 — 37 is coprime to 256, so the
    * code stream cycles every residue and full-scale rails and silent
    * codes both occur.
    */
  private def g711Payload(docId: Column): Column = {
    val n = docId % 90 + 30
    val tag = when(docId % 2 === 0, lit(7L)).otherwise(lit(6L))
    def hxp(c: Column, digits: Int) = lpad(hex(c), digits, "0")
    def le16(c: Column) = {
      val x = hxp(c, 4)
      concat(substring(x, 3, 2), substring(x, 1, 2))
    }
    def le32(c: Column) = {
      val x = hxp(c, 8)
      concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2))
    }
    val dataHex = array_join(
      transform(sequence(lit(0L), n - 1),
        i => hxp(pmod(i * 37L + docId * 11L, lit(256L)), 2)), "")
    unhex(concat(
      lit("52494646"), le32(n + 36L),
      lit("57415645" + "666D7420" + "10000000"), le16(tag), lit("0100"),
      le32(lit(8000L)), le32(lit(8000L)),
      lit("0100" + "0800" + "64617461"), le32(n), dataHex))
  }

  /** q355's constructed CBR MP3: n = doc_id%9+3 back-to-back MPEG-1
    * Layer III frames built by hex Column arithmetic (the [[pcmPayload]]
    * discipline). Shared arithmetic (the oracle's contract):
    *   brIdx = doc_id%14 + 1 → kbps via the public Layer III table
    *   srIdx = doc_id%3     → rate ∈ {44100, 48000, 32000}
    *   pad(f) = (doc_id+f) % 2  (frame sizes differ by the pad byte)
    *   frame f size = ⌊144·kbps·1000 / rate⌋ + pad(f)
    *   mono on even docs (mode bits 11), stereo on odd (00)
    * %4==1 prepends an ID3v2 tag (synchsafe size sz = doc_id%50, body
    * zeros) the walk must skip; %10==6 truncates the last 3 bytes →
    * NULL.
    */
  private def mp3Payload(docId: Column): Column = {
    val n = docId % 9 + 3
    val brIdx = docId % 14 + 1
    val srIdx = docId % 3
    val kbps = element_at(typedlit(Seq(32L, 40L, 48L, 56L, 64L, 80L,
      96L, 112L, 128L, 160L, 192L, 224L, 256L, 320L)),
      (brIdx - 1).cast("int") + 1)
    val rate = element_at(typedlit(Seq(44100L, 48000L, 32000L)),
      srIdx.cast("int") + 1)
    // ⌊144·kbps·1000 / rate⌋ — Column `/` is DOUBLE division; floor
    // recovers the exact integer quotient (products ≪ 2^53)
    val fsBase = floor(kbps * 144000L / rate).cast("long")
    def hxp(c: Column, digits: Int) = lpad(hex(c), digits, "0")
    val modeHex = when(docId % 2 === 0, lit("C0")).otherwise(lit("00"))
    def frame(f: Column): Column = {
      val pad = pmod(docId + f, lit(2L))
      val b2 = hxp(brIdx * 16L + srIdx * 4L + pad * 2L, 2)
      val body = array_join(
        transform(sequence(lit(1L), fsBase + pad - 4L), _ => lit("00")),
        "")
      concat(lit("FFFB"), b2, modeHex, body)
    }
    val framesHex = array_join(
      transform(sequence(lit(0L), n - 1), f => frame(f)), "")
    val sz = docId % 50
    val id3Hex = when(docId % 4 === 1,
      concat(lit("494433" + "0400" + "00" + "000000"), hxp(sz, 2),
        array_join(transform(sequence(lit(1L), sz), _ => lit("00")), "")))
      .otherwise(lit(""))
    val full = unhex(concat(id3Hex, framesHex))
    when(docId % 10 === 6, full.substr(lit(1), length(full) - 3))
      .otherwise(full)
  }

  /** q344's constructed TIFF/EXIF payloads (the [[webpBmpPayload]]
    * discipline): doc_id%4 selects II-TIFF / MM-TIFF (BitsPerSample
    * through the value-offset path) / JPEG-with-APP1-Exif / corrupt.
    * Dims reuse q333's arithmetic; orientation = (doc_id>>2)%8+1 so
    * all eight EXIF values appear in EVERY format slice.
    */
  private def tiffExifPayload(docId: Column): Column = {
    val m = docId % 4
    val w = (docId % 991) + 1
    val h = ((docId * 7) % 737) + 1
    val bits = element_at(typedlit(Seq(1L, 2L, 4L, 8L, 16L)),
      (docId % 5).cast("int") + 1)
    val o = shiftright(docId, 2) % 8 + 1
    def hxp(c: Column, digits: Int) = lpad(hex(c), digits, "0")
    def be16(c: Column) = unhex(hxp(c, 4))
    def be32(c: Column) = unhex(hxp(c, 8))
    def le16(c: Column) = {
      val x = hxp(c, 4)
      unhex(concat(substring(x, 3, 2), substring(x, 1, 2)))
    }
    def le32(c: Column) = {
      val x = hxp(c, 8)
      unhex(concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2)))
    }
    // II ("Intel"): magic + IFD@8 + count 4 + entries (tags ascending:
    // 256 LONG w, 257 LONG h, 258 SHORT bits inline, 274 SHORT orient)
    // + next-IFD 0 = 62 bytes
    def ii(orient: Column) = concat(
      unhex(lit("49492A00" + "08000000" + "0400")),
      le16(lit(256L)), unhex(lit("0400")), le32(lit(1L)), le32(w),
      le16(lit(257L)), unhex(lit("0400")), le32(lit(1L)), le32(h),
      le16(lit(258L)), unhex(lit("0300")), le32(lit(1L)), le16(bits),
      unhex(lit("0000")),
      le16(lit(274L)), unhex(lit("0300")), le32(lit(1L)), le16(orient),
      unhex(lit("0000")),
      unhex(lit("00000000")))
    // MM ("Motorola"): BitsPerSample count=3 → the 4-byte field holds
    // an OFFSET (62) to three SHORTs appended after the IFD = 68 bytes
    val mm = concat(
      unhex(lit("4D4D002A" + "00000008" + "0004")),
      be16(lit(256L)), unhex(lit("0004")), be32(lit(1L)), be32(w),
      be16(lit(257L)), unhex(lit("0004")), be32(lit(1L)), be32(h),
      be16(lit(258L)), unhex(lit("0003")), be32(lit(3L)), be32(lit(62L)),
      be16(lit(274L)), unhex(lit("0003")), be32(lit(1L)), be16(o),
      unhex(lit("0000")),
      unhex(lit("00000000")),
      be16(bits), be16(bits), be16(bits))
    // JPEG: SOI + APP1(len 0x22: "Exif\0\0" + a 26-byte MM TIFF whose
    // IFD0 carries ONLY orientation) + SOF0 + EOI = 59 bytes
    val exifBlock = concat(
      unhex(lit("4D4D002A" + "00000008" + "0001")),
      be16(lit(274L)), unhex(lit("0003")), be32(lit(1L)), be16(o),
      unhex(lit("0000")),
      unhex(lit("00000000")))
    val jpeg = concat(
      unhex(lit("FFD8" + "FFE1" + "0022" + "457869660000")), exifBlock,
      unhex(lit("FFC00011" + "08")), be16(h), be16(w),
      unhex(lit("03011100021101031101" + "FFD9")))
    val corrupt = when(docId % 8 === 3, substring(ii(o), 1, 12))
      .otherwise(ii(lit(9L)))
    when(m === 0, ii(o)).when(m === 1, mm).when(m === 2, jpeg)
      .otherwise(corrupt)
  }

  /** q337's constructed WebP/BMP payloads (the [[mediaPayload]]
    * discipline): doc_id%4 selects VP8L / VP8 / VP8X / BMP, dims reuse
    * q333's width/height arithmetic.
    */
  private def webpBmpPayload(docId: Column): Column = {
    val m = docId % 4
    val w = (docId % 991) + 1
    val h = ((docId * 7) % 737) + 1
    val bmpBpp = element_at(typedlit(Seq(1L, 4L, 8L, 16L, 24L, 32L)),
      (docId % 6).cast("int") + 1)
    def hxp(c: Column, digits: Int) = lpad(hex(c), digits, "0")
    def le16(c: Column) = {
      val x = hxp(c, 4)
      unhex(concat(substring(x, 3, 2), substring(x, 1, 2)))
    }
    def le24(c: Column) = {
      val x = hxp(c, 6)
      unhex(concat(substring(x, 5, 2), substring(x, 3, 2),
        substring(x, 1, 2)))
    }
    def le32(c: Column) = {
      val x = hxp(c, 8)
      unhex(concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2)))
    }
    // VP8L: RIFF(17) WEBP "VP8L"(5) 2F + bitfield LE32 = 25 bytes
    val vp8lBits = (w - 1) + (h - 1) * 16384L
    val vp8l = concat(unhex(lit("52494646")), le32(lit(17L)),
      unhex(lit("57454250" + "5650384C" + "05000000" + "2F")),
      le32(vp8lBits))
    // VP8 lossy: RIFF(22) WEBP "VP8 "(10) tag(3) 9D012A wLE16 hLE16
    // = 30 bytes (scale bits zero)
    val vp8 = concat(unhex(lit("52494646")), le32(lit(22L)),
      unhex(lit("57454250" + "56503820" + "0A000000" +
        "000000" + "9D012A")),
      le16(w), le16(h))
    // VP8X: RIFF(22) WEBP "VP8X"(10) flags(1) rsv(3) w-1/h-1 LE24
    // = 30 bytes
    val vp8x = concat(unhex(lit("52494646")), le32(lit(22L)),
      unhex(lit("57454250" + "56503858" + "0A000000" + "00" + "000000")),
      le24(w - 1), le24(h - 1))
    // BMP BITMAPINFOHEADER: 14-byte file header + 40-byte DIB = 54
    val bmp = concat(unhex(lit("424D")), le32(lit(54L)),
      unhex(lit("00000000" + "36000000" + "28000000")),
      le32(w), le32(h), unhex(lit("0100")), le16(bmpBpp),
      unhex(lit("00" * 24)))
    when(m === 0, vp8l).when(m === 1, vp8).when(m === 2, vp8x)
      .otherwise(bmp)
  }

  /** q335's planted repeat: 200 tokens outside the corpus vocabulary,
    * shared verbatim by the engine (plan literal) and the oracle
    * (SQL literal) — the q298 shared-artifact discipline.
    */
  private val exactSubstrBlock: String =
    (0 until 200).map(i => s"zq${i}z").mkString(" ")

  /** q333/q336's constructed media payload for one doc id — spec-true
    * PNG/JPEG/GIF headers from doc_id arithmetic via hex-string
    * construction (BE via lpad(hex); LE via explicit byte-pair swap),
    * with planted corruption on the %4==3 slice (a 12-byte truncation
    * and a bad-magic first byte). Shares NO code with the parsing
    * kernel's byte arithmetic.
    */
  private def mediaPayload(docId: Column): Column = {
    val m = docId % 4
    val w = (docId % 991) + 1
    // height varies independently of width even at small ids (sf0.01
    // doc_ids < 737 would otherwise make w == h and never exercise the
    // aspect gate): the *7 spreads the residues
    val h = ((docId * 7) % 737) + 1
    val pdep = element_at(typedlit(Seq(1L, 2L, 4L, 8L, 16L)),
      (docId % 5).cast("int") + 1)
    val gifPacked = docId % 8 // depth = (packed & 7) + 1
    def hx(c: Column, digits: Int) = lpad(hex(c), digits, "0")
    def be32(c: Column) = unhex(hx(c, 8))
    def be16(c: Column) = unhex(hx(c, 4))
    def le16(c: Column) = {
      val x = hx(c, 4)
      unhex(concat(substring(x, 3, 2), substring(x, 1, 2)))
    }
    // signature + IHDR(len=13) + w + h + depth + color/comp/filter/
    // interlace + junk CRC = 33 bytes
    val png = concat(
      unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be32(w), be32(h), unhex(hx(pdep, 2)),
      unhex(lit("06000000DEADBEEF")))
    // SOI + full APP0/JFIF + SOF0(len 17: precision, h, w, 3 comps)
    // + EOI = 41 bytes — the walk must SKIP APP0 by its length
    val jpeg = concat(
      unhex(lit("FFD8FFE000104A46494600010100000100010000FFC0001108")),
      be16(h), be16(w), unhex(lit("03011100021101031101FFD9")))
    // magic + LSD (w LE, h LE, packed, bg, aspect) = 13 bytes
    val gif = concat(unhex(lit("474946383961")), le16(w), le16(h),
      unhex(hx(gifPacked, 2)), unhex(lit("0000")))
    val corrupt = when(docId % 8 === 3, substring(png, 1, 12))
      .otherwise(concat(unhex(lit("00")), substring(png, 2, 28)))
    when(m === 0, png).when(m === 1, jpeg)
      .when(m === 2, gif).otherwise(corrupt)
  }

  /** q292's frozen subword vocab: full single-char coverage (a–z) so
    * alpha text never UNKs, plus multi-char units chosen to overlap on
    * this corpus's vocabulary ("t|ta|tab" prefixes, "scan" vs "s·can")
    * — the longest-match decision is exercised on nearly every word.
    */
  private val maxMatchVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++ Seq(
      "th", "he", "ta", "le", "an", "ar", "rt", "ow", "the", "tab",
      "ble", "val", "lue", "row", "scan", "part", "hash", "sort",
      "win", "dow")

  /** q298's production-size vocab: 5k+ distinct fuzz units of length
    * 2–6 (seeded LCG — java.util.Random's algorithm is spec-fixed, so
    * the sequence is identical on every JVM) plus [[maxMatchVocab]]'s
    * overlapping multi-char units (so longest-wins decisions fire on
    * corpus words) plus DELIBERATELY PARTIAL single-char coverage
    * (vowels + high-frequency consonants only — corpus chars outside it
    * UNK wherever no multi-char unit spans them, exercising the UNK
    * walk at scale). Shared verbatim by the engine (staged as a
    * DataFrame) and the oracle (embedded as a list literal).
    */
  private val maxMatchVocab5k: Seq[String] = {
    val rng = new scala.util.Random(298L)
    val fuzz = Seq.fill(6200) {
      val len = 2 + rng.nextInt(5)
      (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    }
    val singles = "aeilnorst".map(_.toString)
    val v = (fuzz ++ singles ++ maxMatchVocab.filter(_.length > 1))
      .distinct.sorted
    require(v.size >= 5000, s"fuzz vocab only ${v.size} units")
    v
  }

  /** q307's frozen unigram score table: [[maxMatchVocab5k]] with a
    * deterministic integer score per unit — length-favoring
    * (4096·len − 2048) plus bounded hash noise (String.hashCode is
    * spec-fixed, so the table is identical on every JVM). The scores
    * are driver literals shared VERBATIM by the engine (staged as a
    * DataFrame) and the oracle (embedded as a struct-list literal) —
    * a real unigram LM would ship fixed-point log-probs here; the DP
    * only requires integers.
    */
  private val viterbiScoredVocab: Seq[(String, Long)] =
    maxMatchVocab5k.map(u =>
      (u, 4096L * u.length - 2048L + ((u.hashCode % 64) + 64) % 64))

  private val viterbiUnkScoreQ: Long = -4096L

  /** q169/q170's shared eval set: q102's distilled linear model served
    * over the gate's features, score quantized to fixed point
    * (floor(z·2^20) — exact integer image of the double, keeps histogram
    * group keys integer), label = the gate's keep verdict.
    */
  private def distillScored(s: SparkSession, dir: String): DataFrame = {
    val gated = TextAnalysis.qualityGate(t(s, dir, "documents"),
      "doc_id", "text", keepInputCols = true)
    val feats = gated.select(
      col("doc_id"), col("lang"), col("keep"),
      TextAnalysis.tokenCount(col("text")).cast("double").as("f_tokens"),
      TextAnalysis.punctCount(col("text")).cast("double").as("f_punct"),
      coalesce(TextAnalysis.stopwordRatio(col("text")), lit(0.0)).as("f_stop"),
      TextAnalysis.qualityScore(col("text")).as("f_quality"))
    graft.operators.LinearModel.applyModel(feats,
      Seq("f_tokens", "f_punct", "f_stop", "f_quality"),
      graft.operators.LinearModel.Model(
        Array(0.10338513290120002, 0.0, 2.561121689531541,
          15.712607333411997), -10.389739811106871))
      .select(col("doc_id"), col("lang"), col("keep"),
        floor(col("z") * lit(1048576L)).cast("long").as("zq"))
  }

  /** q142/q143's labeling functions: 1/0/NULL(abstain) rule votes from
    * integer-exact text signals.
    */
  private def weakLfs(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs.select(col("doc_id"),
      when(col("n_chars") >= 300, 1).when(col("n_chars") < 120, 0)
        .as("lf_len"),
      when(array_contains(toks, "the"), 1).otherwise(0).as("lf_the"),
      when(size(toks) > 0,
        when(size(array_distinct(toks)) * 2 >= size(toks), 1).otherwise(0))
        .as("lf_div"))
  }

  // ------------------------------------------------------------ oracles

  /** Portable polynomial hash of a string expression (matches
    * TextAnalysis.polyHash).
    */
  private def oPolyHash(x: String): String = oPolyHashM(x, 31)

  /** [[oPolyHash]] with an explicit multiplier and fold seed (31/0 =
    * the standard hash; 37/1 = the wide simhash's second family —
    * TextAnalysis.WideMult/WideSeed: the nonzero seed decorrelates the
    * families on single-character tokens).
    */
  private def oPolyHashM(x: String, mult: Int, seed: Int = 0): String =
    s"""list_reduce(list_prepend(CAST($seed AS BIGINT),
       |  list_transform(string_split($x, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, c) -> (a * $mult + c) % 1000000007)""".stripMargin

  /** Whitespace tokens (matches graft.functions.tokens). */
  private val oToks =
    """list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)"""

  /** q220/q221's shared CDC chunk chain (suffix-parameterized): token
    * rows with positions, 4-gram hashes at their END token, mod-16 cut
    * flags, chunk ids via the shifted cumulative cut count, and per-chunk
    * digests — the long-form spelling of
    * [[graft.operators.Chunking.contentDefinedChunks]]'s array-side plan.
    * Produces CTEs `toks$sfx … ch$sfx`; read `ch$sfx(doc_id, chunk_idx,
    * n_tokens, digest)`.
    */
  private def oCdcChunkCtes(sfx: String, srcSql: String): String =
    s"""toks$sfx AS (SELECT doc_id, $oToks AS tk FROM ($srcSql)),
       |tr$sfx AS (
       |  SELECT doc_id, u.p AS p, u.tok AS tok FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(tk)),
       |      i -> {'p': i, 'tok': tk[i + 1]})) AS u
       |    FROM toks$sfx)),
       |g$sfx AS (
       |  SELECT doc_id, u.pend AS pend, ${oPolyHash("u.gram")} AS h FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 2),
       |      i -> {'pend': i + 2,
       |            'gram': list_aggregate(tk[i:i+3], 'string_agg', ' ')}))
       |      AS u
       |    FROM toks$sfx)),
       |cuts$sfx AS (SELECT doc_id, pend AS p FROM g$sfx WHERE h % 16 = 0),
       |f$sfx AS (
       |  SELECT t.doc_id, t.p, t.tok,
       |         CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END AS cut
       |  FROM tr$sfx t LEFT JOIN cuts$sfx c
       |    ON c.doc_id = t.doc_id AND c.p = t.p),
       |cid$sfx AS (
       |  SELECT doc_id, p, tok,
       |         coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY p
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS chunk_idx
       |  FROM f$sfx),
       |ch$sfx AS (
       |  SELECT doc_id, chunk_idx,
       |         CAST(count(*) AS BIGINT) AS n_tokens,
       |         ${oPolyHash("string_agg(tok, ' ' ORDER BY p)")} AS digest
       |  FROM cid$sfx GROUP BY 1, 2)""".stripMargin

  /** Oracle spelling of Dedup.powFixed's left-to-right square-and-multiply
    * x^e chain — the same association order, so every intermediate double
    * is the same correctly-rounded value and the result matches
    * bit-for-bit (libm `pow` would not).
    */
  private def oPowFixed(x: String, e: Int): String =
    Integer.toBinaryString(e).drop(1).foldLeft(x)((acc, bit) =>
      if (bit == '1') s"(($acc * $acc) * $x)" else s"($acc * $acc)")

  /** q136/q145's shared fusion CTEs: dense cosine arm (top-10), lexical
    * distinct-token-overlap arm (top-10), full-outer RRF `fused` table
    * with the engine's fixed-fold score.
    */
  private def oRrfCtes: String =
    s"""$oNorms,
       |dsc AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid, ${oCos("q", "c")} AS cos
       |  FROM norms q JOIN norms c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |dr AS (
       |  SELECT * FROM (
       |    SELECT qid, nid,
       |           CAST(row_number() OVER (PARTITION BY qid
       |             ORDER BY cos DESC, nid) AS BIGINT) AS rank
       |    FROM dsc) WHERE rank <= 10),
       |qt AS (SELECT DISTINCT doc_id AS qid, unnest($oToks) AS t
       |       FROM documents WHERE doc_id < 20),
       |dt AS (SELECT DISTINCT doc_id AS nid, unnest($oToks) AS t
       |       FROM documents),
       |ov AS (
       |  SELECT qt.qid, dt.nid, CAST(count(*) AS BIGINT) AS overlap
       |  FROM qt JOIN dt ON qt.t = dt.t AND qt.qid <> dt.nid
       |  GROUP BY 1, 2),
       |lr AS (
       |  SELECT * FROM (
       |    SELECT qid, nid,
       |           CAST(row_number() OVER (PARTITION BY qid
       |             ORDER BY overlap DESC, nid) AS BIGINT) AS rank
       |    FROM ov) WHERE rank <= 10),
       |fused AS (
       |  SELECT coalesce(d.qid, l.qid) AS qid, coalesce(d.nid, l.nid) AS nid,
       |         d.rank AS r_dense, l.rank AS r_lex,
       |         0.0 + (CASE WHEN d.rank IS NOT NULL
       |                     THEN 1.0 / (60.0 + d.rank) ELSE 0.0 END)
       |             + (CASE WHEN l.rank IS NOT NULL
       |                     THEN 1.0 / (60.0 + l.rank) ELSE 0.0 END) AS score
       |  FROM dr d FULL OUTER JOIN lr l ON d.qid = l.qid AND d.nid = l.nid)""".stripMargin

  /** q142/q143's labeling functions (mirrors [[weakLfs]]). */
  private val oWeakLfs =
    s"""lf AS (
       |  SELECT doc_id,
       |         CASE WHEN n_chars >= 300 THEN 1
       |              WHEN n_chars < 120 THEN 0 END AS lf_len,
       |         CASE WHEN list_contains($oToks, 'the') THEN 1 ELSE 0 END AS lf_the,
       |         CASE WHEN len($oToks) > 0 THEN
       |           CASE WHEN len(list_distinct($oToks)) * 2 >= len($oToks)
       |                THEN 1 ELSE 0 END END AS lf_div
       |  FROM documents)""".stripMargin

  /** Unrolled BPE training oracle (one CTE trio per merge step) —
    * mirrors [[graft.operators.Bpe.trainMerges]]: pair counts from each
    * word's own symbol list, argmax by (freq DESC, l, r), greedy
    * left-to-right replace-last merge fold. The fold wraps symbols as
    * single-item lists so DuckDB's init-free list_reduce carries a LIST
    * accumulator; its first-element init equals the engine's
    * empty-accumulator start (the first symbol can never merge).
    */
  private def oBpe(numMerges: Int): String =
    oBpeCtes(numMerges) + "\n" + (1 to numMerges)
      .map(s => s"SELECT CAST($s AS INT) AS step, l AS lhs, r AS rhs, freq FROM b$s")
      .mkString("", "\nUNION ALL\n", "\nORDER BY step")

  /** q93: the subword vocabulary read off the final segmentation. */
  private def oBpeVocab(numMerges: Int): String =
    oBpeCtes(numMerges) +
      s"""
         |SELECT subword, CAST(sum(cnt) AS BIGINT) AS freq
         |FROM (SELECT cnt, unnest(syms) AS subword FROM s$numMerges)
         |GROUP BY 1 ORDER BY freq DESC, subword""".stripMargin

  /** q94: per-doc BPE token counts off the same final segmentation. */
  private def oBpeDocTokens(numMerges: Int): String =
    oBpeCtes(numMerges) +
      s"""
         |, wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS nt FROM s$numMerges),
         |dw AS (
         |  SELECT doc_id, unnest($oToks) AS w FROM documents),
         |st AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |         CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
         |  FROM dw JOIN wl USING (w) GROUP BY 1)
         |SELECT d.doc_id,
         |       coalesce(st.n_words, CAST(0 AS BIGINT)) AS n_words,
         |       coalesce(st.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
         |FROM documents d LEFT JOIN st USING (doc_id)
         |ORDER BY doc_id""".stripMargin

  /** q95: quota sample (q88's CTEs, q-prefixed to avoid name capture) →
    * per-doc BPE token counts (q94's CTEs) → q51's packing shape over
    * the sampled docs only.
    */
  private def oSamplePack(numMerges: Int): String =
    oBpeCtes(numMerges) +
      s"""
         |, wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS nt FROM s$numMerges),
         |dw AS (
         |  SELECT doc_id, unnest($oToks) AS w FROM documents),
         |st AS (
         |  SELECT doc_id, CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
         |  FROM dw JOIN wl USING (w) GROUP BY 1),
         |qcnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
         |qw AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS wt FROM qcnt),
         |qd AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |         list(wt ORDER BY source NULLS FIRST)), (a, b) -> a + b) AS denom
         |       FROM qw),
         |qq AS (SELECT source, n,
         |         CAST(floor(CAST(600 AS DOUBLE) * wt / denom) AS BIGINT) AS quota
         |       FROM qw CROSS JOIN qd),
         |qranked AS (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY (((doc_id % 2147483648) * 2654435761) % 4294967296) % 1000000, doc_id) AS rn
         |  FROM documents),
         |samp AS (
         |  SELECT r.doc_id FROM qranked r JOIN qq USING (source)
         |  WHERE r.rn <= least(qq.quota, qq.n)),
         |sized AS (
         |  SELECT d.doc_id, coalesce(st.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
         |  FROM documents d LEFT JOIN st USING (doc_id)
         |  WHERE d.doc_id IN (SELECT doc_id FROM samp)),
         |ss AS (
         |  SELECT doc_id, n_bpe_tokens,
         |         (((doc_id % 2147483648) * 2654435761) % 4294967296) % 8 AS stream
         |  FROM sized),
         |cpk AS (
         |  SELECT doc_id, n_bpe_tokens, stream,
         |         CAST(sum(n_bpe_tokens) OVER (PARTITION BY stream ORDER BY doc_id)
         |              - n_bpe_tokens AS BIGINT) AS "offset"
         |  FROM ss)
         |SELECT doc_id, n_bpe_tokens, stream, "offset", "offset" // 2048 AS shard
         |FROM cpk ORDER BY doc_id""".stripMargin

  private def oBpeCtes(numMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH s0 AS (
              |  SELECT w, CAST(count(*) AS BIGINT) AS cnt, string_split(w, '') AS syms
              |  FROM (SELECT unnest($oToks) AS w FROM documents)
              |  GROUP BY w),
              |""".stripMargin
    for (s <- 1 to numMerges) {
      sb ++= s"""p$s AS (
                |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS freq
                |  FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
                |          i -> [syms[i], syms[i+1]])) AS pr
                |        FROM s${s - 1})
                |  GROUP BY 1, 2),
                |b$s AS (SELECT l, r, freq FROM p$s ORDER BY freq DESC, l, r LIMIT 1),
                |s$s AS (
                |  SELECT w, cnt, list_reduce(list_transform(syms, x -> [x]),
                |    (acc, e) -> CASE WHEN acc[-1] = b.l AND e[1] = b.r
                |                     THEN list_append(acc[1:len(acc)-1], b.l || b.r)
                |                     ELSE list_append(acc, e[1]) END) AS syms
                |  FROM s${s - 1} CROSS JOIN b$s b),
                |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop the last CTE's trailing ",\n"
    sb.result()
  }

  /** The q81 quality-gate verdict as a reusable CTE chain ending in
    * `verdict(doc_id, reasons)` — q84 re-runs the same gate in front of its
    * dedup stage.
    */
  private val oGateCtes =
    s"""m AS (
       |  SELECT doc_id, text, $oToks AS tk FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
       |    i -> tk[i] || ' ' || tk[i+1])) AS b
       |  FROM m),
       |top AS (
       |  SELECT doc_id, max(c) AS top FROM (
       |    SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
       |  GROUP BY doc_id),
       |f AS (
       |  SELECT m.doc_id,
       |         CAST(len(tk) AS BIGINT) AS nt,
       |         (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
       |          + least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
       |          + (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS DOUBLE)
       |                   / greatest(CAST(length(text) AS DOUBLE), 1.0))) / 3.0 AS q,
       |         CAST(len(string_split(text, chr(10))) AS BIGINT) AS nl,
       |         CAST(len(string_split(text, chr(10)))
       |              - len(list_distinct(string_split(text, chr(10)))) AS BIGINT) AS dl,
       |         CAST(greatest(len(tk) - 1, 0) AS BIGINT) AS nb,
       |         CAST(coalesce(top.top, 0) AS BIGINT) AS tb,
       |         CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
       |              + len(regexp_extract_all(text, '[0-9]{9,}')) AS BIGINT) AS pii
       |  FROM m LEFT JOIN top ON top.doc_id = m.doc_id),
       |verdict AS (
       |  SELECT doc_id,
       |         CAST((CASE WHEN nt < 10 THEN 1 ELSE 0 END)
       |            + (CASE WHEN q < 0.5 THEN 2 ELSE 0 END)
       |            + (CASE WHEN dl * 5 > nl * 1 THEN 4 ELSE 0 END)
       |            + (CASE WHEN tb * 5 > nb * 1 THEN 8 ELSE 0 END)
       |            + (CASE WHEN pii > 3 THEN 16 ELSE 0 END) AS BIGINT) AS reasons
       |  FROM f)""".stripMargin

  /** q169/q170's eval-set CTEs: [[oGateCtes]] + q102's feature/score
    * text verbatim, ending in `scored(zq, keep)` — zq is the engine's
    * floor(z·2^20) fixed-point image, keep the gate verdict.
    */
  private val oDistillScoredCtes =
    s"""$oGateCtes,
       |fxm AS (
       |  SELECT doc_id,
       |         CAST(len(tk) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(tk,
       |           t -> list_contains(['the','a','an','of','to','and','in','is','on','for'], t))) AS BIGINT) AS n_stop,
       |         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS BIGINT) AS punct_cnt,
       |         text
       |  FROM m),
       |fx AS (
       |  SELECT doc_id,
       |         CAST(n_tokens AS DOUBLE) AS f_tokens,
       |         CAST(punct_cnt AS DOUBLE) AS f_punct,
       |         COALESCE(CASE WHEN n_tokens > 0
       |                       THEN CAST(n_stop AS DOUBLE) / n_tokens END,
       |                  CAST(0.0 AS DOUBLE)) AS f_stop,
       |         (least(CAST(length(text) AS DOUBLE) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
       |          + least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
       |          + (CAST(1.0 AS DOUBLE) - CAST(punct_cnt AS DOUBLE)
       |                 / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE)))) / CAST(3.0 AS DOUBLE) AS f_quality
       |  FROM fxm),
       |sx AS (
       |  SELECT doc_id,
       |         ((((CAST(0.0 AS DOUBLE)
       |             + (f_tokens * CAST(0.10338513290120002 AS DOUBLE)))
       |             + (f_punct * CAST(0.0 AS DOUBLE)))
       |             + (f_stop * CAST(2.561121689531541 AS DOUBLE)))
       |             + (f_quality * CAST(15.712607333411997 AS DOUBLE)))
       |           + CAST(-10.389739811106871 AS DOUBLE) AS z
       |  FROM fx),
       |scored AS (
       |  SELECT sx.doc_id,
       |         CAST(floor(z * CAST(1048576 AS DOUBLE)) AS BIGINT) AS zq,
       |         (v.reasons = 0) AS keep
       |  FROM sx JOIN verdict v USING (doc_id))""".stripMargin

  /** q179/q181's power-iteration matvec: w[a] = left-fold over b of
    * M[a][b]·v[b] — references `m` (from mm) and `v` (the iteration
    * state / fin).
    */
  private val oPowerW =
    """list_transform(range(64), a -> list_reduce(
      |  list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(range(64), b -> m[a+1][b+1] * v[b+1])),
      |  (x, y) -> x + y))""".stripMargin

  /** Shared spectral CTEs (q179/q181/q185): fixed-point Gram `mm`, the
    * 20-round power iteration `it`, and `fin(v)` — the engine's exact
    * driver-side fold order as a recursive CTE.
    *
    * ORACLE BUDGET (round 16): `mm` is MATERIALIZED because DuckDB 1.0
    * inlines multi-referenced CTEs — each of the 20 recursive `it`
    * steps (and q185's second, deflated iteration) otherwise re-builds
    * the whole Gram matrix, which is what made q185 a 53 s oracle. The
    * Gram sum itself is a zipped-unnest self-join (N×64 rows) instead
    * of per-row list extracts over a row × 64 × 64 cross product —
    * identical BIGINT sums, an order of magnitude cheaper.
    */
  private val oTopComponentCtes =
    s"""qv AS (
       |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> greatest(CAST(-67108864 AS BIGINT), least(CAST(67108864 AS BIGINT),
       |      CAST(floor(x * CAST(1048576 AS DOUBLE)) AS BIGINT)))) AS q
       |  FROM embeddings),
       |qx AS MATERIALIZED (
       |  SELECT rid, unnest(range(64)) AS i, unnest(q) AS qval
       |  FROM (SELECT row_number() OVER () AS rid, q FROM qv)),
       |mr AS (
       |  SELECT x.i AS a, y.i AS b,
       |    CAST(sum(x.qval * y.qval) AS BIGINT) AS mval
       |  FROM qx x JOIN qx y USING (rid)
       |  GROUP BY 1, 2),
       |mm AS MATERIALIZED (
       |  SELECT list(mrow ORDER BY a) AS m FROM (
       |    SELECT a, list(mval ORDER BY b) AS mrow FROM mr GROUP BY a)),
       |it(t, v) AS (
       |  SELECT 0, list_transform(range(64), x -> CAST(1.0 AS DOUBLE))
       |  UNION ALL
       |  SELECT t + 1,
       |         list_transform($oPowerW, wa -> wa / sqrt(list_reduce(
       |           list_prepend(CAST(0.0 AS DOUBLE),
       |             list_transform($oPowerW, wx -> wx * wx)),
       |           (x, y) -> x + y)))
       |  FROM it, mm WHERE t < 20),
       |fin AS (SELECT v FROM it WHERE t = 20)""".stripMargin

  /** Exact n-gram Jaccard pairs ≥ threshold (ground truth for q23/q24). */
  /** Exact all-pairs n-gram-Jaccard CTE chain ending in
    * `jac(i, j, common, jaccard)` — shared by the q23 gate and the q97
    * recall harness.
    */
  private def oJaccardCtes(n: Int): String =
    s"""toks AS (
       |  SELECT doc_id, $oToks AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(tk) - ${n - 2}),
       |      i -> list_aggregate(tk[i:i+${n - 1}], 'string_agg', ' ')))) AS s
       |  FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT i, j, CAST(c AS BIGINT) AS common,
       |         CAST(c AS DOUBLE) / CAST(si.n + sj.n - c AS DOUBLE) AS jaccard
       |  FROM inter
       |  JOIN sizes si ON si.doc_id = i
       |  JOIN sizes sj ON sj.doc_id = j)""".stripMargin

  private def oJaccardPairs(n: Int, theta: Double): String =
    s"""WITH ${oJaccardCtes(n)}
       |SELECT i, j, common, jaccard FROM jac
       |WHERE jaccard >= $theta ORDER BY i, j""".stripMargin

  /** Exact all-pairs n-gram containment |S_i∩S_j|/|S_i| ≥ theta —
    * DIRECTIONAL (both orientations join, i != j), denominator is the
    * contained side's set size only. Ground truth for q126: the prefix
    * filter is exact-complete, so the brute-force join equals it.
    */
  private def oContainmentPairs(n: Int, theta: Double): String =
    s"""WITH toks AS (
       |  SELECT doc_id, $oToks AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(tk) - ${n - 2}),
       |      i -> list_aggregate(tk[i:i+${n - 1}], 'string_agg', ' ')))) AS s
       |  FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id != b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i, j, CAST(c AS BIGINT) AS common,
       |       CAST(c AS DOUBLE) / CAST(si.n AS DOUBLE) AS containment
       |FROM inter JOIN sizes si ON si.doc_id = i
       |WHERE CAST(c AS DOUBLE) / CAST(si.n AS DOUBLE) >= $theta
       |ORDER BY i, j""".stripMargin

  /** Per-doc simhash, width = TextAnalysis.SimHashBits (matches
    * TextAnalysis.simHash).
    */
  private val oSimhash = oSimhashCte("simhash", 31)

  /** Named simhash CTE with an explicit token-hash multiplier and fold
    * seed (matches TextAnalysis.simHashWith; 31/0 + 37/1 compose the
    * wide signature).
    */
  private def oSimhashCte(name: String, mult: Int, seed: Int = 0,
                          src: String = "documents"): String = {
    val bits = TextAnalysis.SimHashBits
    val mod = 1L << bits
    val zeros = ("CAST(0 AS BIGINT)" +: Seq.fill(bits - 1)("0")).mkString("[", ",", "]")
    s"""$name AS (
       |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range($bits), j -> CASE WHEN v[j+1] > 0
       |        THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)),
       |      (a, b) -> a + b) AS sig
       |  FROM (
       |    SELECT doc_id, list_reduce(
       |      list_prepend($zeros,
       |        list_transform(hs, hv -> list_transform(range($bits),
       |          j -> CAST(floor(hv / pow(2, j)) AS BIGINT) % 2))),
       |      (acc, b) -> list_transform(range($bits), j -> acc[j+1] + 2*b[j+1] - 1)) AS v
       |    FROM (
       |      SELECT doc_id, list_transform($oToks,
       |        t -> ${oPolyHashM("t", mult, seed)} % $mod) AS hs
       |      FROM $src)))""".stripMargin
  }

  /** DOUBLE[] embeddings with norms (matches graft.functions fold order). */
  private val oNorms =
    """norms AS (
      |  SELECT vec_id, v,
      |         sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x*x)),
      |              (a, b) -> a + b)) AS nrm
      |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings))""".stripMargin

  private def oCos(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(64),
       |  i -> $a.v[i+1] * $b.v[i+1])), (x, y) -> x + y) / ($a.nrm * $b.nrm)""".stripMargin

  /** IVF cell assignment: nearest of the 20 stride centroids. */
  private val oCells =
    s"""centroids AS (
       |  SELECT vec_id // 25 AS cid, v, nrm FROM norms WHERE vec_id % 25 = 0),
       |cells AS (
       |  SELECT vec_id AS id, cid AS cell FROM (
       |    SELECT e.vec_id, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${oCos("e", "c")} DESC, c.cid) AS rn
       |    FROM norms e CROSS JOIN centroids c)
       |  WHERE rn = 1)""".stripMargin

  /** q127/q128 sign matrix as VALUES rows — the SAME driver-generated
    * ±1 rows the engine's plan literals carry
    * ([[graft.operators.Projection.signMatrix]](7, 16, 64)), so both
    * engines fold identical products in identical order.
    */
  private def oSignRows(seed: Long, dOut: Int, dIn: Int): String =
    graft.operators.Projection.signMatrix(seed, dOut, dIn).zipWithIndex
      .map { case (r, j) =>
        val arr = r.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ",", "]")
        s"($j, $arr)"
      }.mkString(",\n  ")

  /** Projection CTEs shared by q127/q128: per-(vec, j) coordinate
    * `pj` = fold(v · signs_j) / sqrt(dOut), then the ordered 16-dim
    * list per vec. Mirrors [[graft.operators.Projection.randomProject]]
    * token-for-token (double widen, array-order fold, one division).
    */
  private def oProjCtes: String =
    s"""signs(j, s) AS (VALUES
       |  ${oSignRows(7L, 16, 64)}),
       |pcoord AS (
       |  SELECT e.vec_id, sg.j,
       |         list_reduce(list_prepend(0.0, list_transform(range(64),
       |           i -> e.v[i+1] * sg.s[i+1])), (x, y) -> x + y)
       |           / sqrt(16.0) AS pj
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |        FROM embeddings) e CROSS JOIN signs sg),
       |pvec AS (
       |  SELECT vec_id, list(pj ORDER BY j) AS pv
       |  FROM pcoord GROUP BY vec_id)""".stripMargin

  /** q39 oracle: re-derives the sign-LSH band keys from the SAME ±1
    * hyperplanes the engine uses ([[Similarity.hyperplanes]](16, 64, 42) —
    * embedded here as VALUES literals), then the same banded candidate
    * join + exact cosine rerank. ±1·x products and the left-fold double
    * sums are bit-identical across engines, so even the sign decisions at
    * dot≈0 agree exactly.
    */
  private def oLsh: String = {
    val planes = Similarity.hyperplanes(LshPlanes, 64, 42L)
    val planeRows = planes.zipWithIndex.map { case (h, j) =>
      val arr = h.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"($j, ${1L << (j % LshBandBits)}, $arr)"
    }.mkString(",\n  ")
    s"""WITH $oNorms,
       |planes(j, bitval, h) AS (VALUES
       |  $planeRows),
       |bits AS (
       |  SELECT n.vec_id, p.j,
       |         CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(64),
       |                i -> n.v[i+1] * p.h[i+1])), (x, y) -> x + y) >= 0
       |              THEN p.bitval ELSE 0 END AS bit
       |  FROM norms n CROSS JOIN planes p),
       |bands AS (
       |  SELECT vec_id, j // $LshBandBits AS band, CAST(sum(bit) AS BIGINT) AS bandKey
       |  FROM bits GROUP BY vec_id, j // $LshBandBits),
       |cands AS (
       |  SELECT DISTINCT qb.vec_id AS qid, cb.vec_id AS nid
       |  FROM bands qb JOIN bands cb
       |    ON qb.band = cb.band AND qb.bandKey = cb.bandKey
       |  WHERE qb.vec_id < 20 AND qb.vec_id <> cb.vec_id),
       |ranked AS (
       |  SELECT cd.qid, cd.nid, ${oCos("q", "c")} AS cos,
       |         row_number() OVER (PARTITION BY cd.qid
       |           ORDER BY ${oCos("q", "c")} DESC, cd.nid) AS rank
       |  FROM cands cd
       |  JOIN norms q ON q.vec_id = cd.qid
       |  JOIN norms c ON c.vec_id = cd.nid)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos
       |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** q41 oracle: rebuilds byteHistogram's 8-bucket byte fallback histogram in SQL by
    * expanding each code point to its UTF-8 bytes (1-4 per char — astral
    * included), then count/len per bucket as exact double division.
    */
  /** q41 (round-14 pixel upgrade): every output column re-derives from
    * the PixelFixtures pixel arithmetic — kind from the format slice,
    * sizes from the container layout, pixel count and the 8-bucket
    * luminance histogram from the per-pixel formula. No bytes touched.
    */
  private val oMultimodalFeatures: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 3 AS m, doc_id % 24 + 9 AS w,
      |    (doc_id * 5) % 24 + 8 AS h, doc_id % 10 = 7 AS corrupt
      |  FROM documents),
      |lum AS (
      |  SELECT doc_id, CASE WHEN m = 0 THEN u.p * 1000
      |    ELSE 299 * u.p + 587 * ((u.p * 3) % 256)
      |      + 114 * ((u.p * 5) % 256) END AS lum
      |  FROM (
      |    SELECT doc_id, m,
      |      unnest(flatten(list_transform(range(h), y ->
      |        list_transform(range(w), x ->
      |          {'p': ((x + doc_id % 31) * (y + doc_id % 37) * 3
      |                 + doc_id) % 256})))) AS u
      |    FROM d WHERE NOT corrupt)),
      |hist AS (
      |  SELECT doc_id,
      |    CAST(count(CASE WHEN (lum // 1000) // 32 = 0 THEN 1 END) AS BIGINT) AS h0,
      |    CAST(count(CASE WHEN (lum // 1000) // 32 = 1 THEN 1 END) AS BIGINT) AS h1,
      |    CAST(count(CASE WHEN (lum // 1000) // 32 = 2 THEN 1 END) AS BIGINT) AS h2,
      |    CAST(count(CASE WHEN (lum // 1000) // 32 = 3 THEN 1 END) AS BIGINT) AS h3,
      |    CAST(count(CASE WHEN (lum // 1000) // 32 = 4 THEN 1 END) AS BIGINT) AS h4,
      |    CAST(count(CASE WHEN (lum // 1000) // 32 = 5 THEN 1 END) AS BIGINT) AS h5,
      |    CAST(count(CASE WHEN (lum // 1000) // 32 = 6 THEN 1 END) AS BIGINT) AS h6,
      |    CAST(count(CASE WHEN (lum // 1000) // 32 = 7 THEN 1 END) AS BIGINT) AS h7
      |  FROM lum GROUP BY 1)
      |SELECT d.doc_id,
      |  CASE WHEN d.corrupt THEN 'application/octet-stream'
      |    WHEN d.m = 2 THEN 'image/bmp' ELSE 'image/png' END AS kind,
      |  CAST(CASE WHEN d.corrupt THEN 40
      |    WHEN d.m = 0 THEN 68 + d.h * (1 + d.w)
      |    WHEN d.m = 1 THEN 68 + d.h * (1 + 3 * d.w)
      |    ELSE 54 + d.h * (((3 * d.w + 3) // 4) * 4) END AS BIGINT)
      |    AS n_bytes,
      |  CASE WHEN NOT d.corrupt THEN CAST(d.w * d.h AS BIGINT) END
      |    AS n_pixels,
      |  hist.h0, hist.h1, hist.h2, hist.h3,
      |  hist.h4, hist.h5, hist.h6, hist.h7
      |FROM d LEFT JOIN hist USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** The q348/q371 SHARED composed graph health-check oracle — the
    * bucketed-table query must hash IDENTICALLY to the cached-edge
    * one, so they grade against one SQL string.
    */
  /** Non-recursive connected-components CTE chain for the graph
    * oracles (round-16 oracle-budget work): the recursive
    * `r(node, comp) AS (… UNION SELECT e.v, r.comp …)` form
    * enumerates every (node, reachable-label) pair — O(|component|²)
    * rows with global dedup, 30–70 s per CC on the sf0.01
    * co-engagement graph, exactly the shape that can blow the
    * driver's per-oracle budget. This emits `rounds` unrolled
    * hook + pointer-jump min-label steps instead (each an edge-size
    * join + group-by, ~0.2 s per CC):
    *
    *   hook:  h_k(v) = min(p_{k-1}(v), min over edges (u,v) of
    *          p_{k-1}(u)) — one-hop label pull;
    *   jump:  p_k(v) = min(h_k(v), h_k(h_k(v))) — labels are node
    *          ids, so a label's own label is a valid (and provably
    *          smaller-or-equal) label; reach roughly doubles per
    *          round.
    *
    * Exactness is not asymptotic hand-waving: labels are stable under
    * one hook round iff every edge has equal labels on both ends
    * (edges are symmetric), i.e. labels are constant per component;
    * a node's label is always a node id of its own component and
    * min(component) only ever maps to itself — so stability implies
    * the exact min-label CC. The emitted `<prefix>chg` CTE runs one
    * EXTRA hook round and counts changed labels × 1,000,000; callers
    * add that poison to an output count, so a non-converged unroll
    * (cannot happen at ≤ 2^rounds-hop diameters, but the guard is
    * structural, not probabilistic) turns the row loudly red instead
    * of silently wrong. All emitted CTEs are MATERIALIZED — DuckDB
    * 1.0 inlines multi-referenced CTEs, and the chained rounds would
    * otherwise re-expand exponentially.
    *
    * Emits: `<prefix>p0 … <prefix>p<rounds>`, `<prefix>h*`,
    * `<prefix>lab(node, component)`, `<prefix>chg(poison)`.
    */
  private def oUnrolledCcCtes(prefix: String, nodesCte: String,
                              edgesCte: String, rounds: Int = 16): String = {
    val sb = new StringBuilder
    sb ++= s"${prefix}p0 AS MATERIALIZED (SELECT node, node AS lbl FROM $nodesCte)"
    def hook(name: String, prev: String): String =
      s""",
         |$name AS MATERIALIZED (
         |  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
         |  FROM $prev n LEFT JOIN (
         |    SELECT e.u AS node, min(p.lbl) AS mn
         |    FROM $edgesCte e JOIN $prev p ON p.node = e.v
         |    GROUP BY 1) m ON m.node = n.node)""".stripMargin
    (1 to rounds).foreach { k =>
      sb ++= hook(s"${prefix}h$k", s"${prefix}p${k - 1}")
      sb ++=
        s""",
           |${prefix}p$k AS MATERIALIZED (
           |  SELECT a.node, least(a.lbl, b.lbl) AS lbl
           |  FROM ${prefix}h$k a JOIN ${prefix}h$k b ON b.node = a.lbl)""".stripMargin
    }
    val last = s"${prefix}p$rounds"
    sb ++= hook(s"${prefix}hx", last)
    sb ++=
      s""",
         |${prefix}lab AS MATERIALIZED (SELECT node, lbl AS component FROM $last),
         |${prefix}chg AS (
         |  SELECT CAST(1000000 * count(*) AS BIGINT) AS poison
         |  FROM $last a JOIN ${prefix}hx b ON b.node = a.node
         |  WHERE b.lbl <> a.lbl)""".stripMargin
    sb.toString
  }

  private val oGraphPipelineSql: String =
      s"""WITH RECURSIVE ai AS (
        |  SELECT DISTINCT l_orderkey AS actor, l_partkey AS item
        |  FROM lineitem),
        |deg0 AS (SELECT actor, count(*) AS dg FROM ai GROUP BY 1),
        |cap AS (SELECT ai.actor, ai.item
        |        FROM ai JOIN deg0 USING (actor) WHERE dg <= 6),
        |pairs AS (
        |  SELECT DISTINCT x.item AS i, y.item AS j
        |  FROM cap x JOIN cap y ON x.actor = y.actor AND x.item < y.item),
        |sym AS MATERIALIZED (SELECT i AS u, j AS v FROM pairs
        |        UNION ALL SELECT j, i FROM pairs),
        |nodes AS (SELECT DISTINCT u AS node FROM sym),
        |cnts AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
        |         (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges),
        |dg AS (SELECT u, CAST(count(DISTINCT v) AS BIGINT) AS deg
        |       FROM sym GROUP BY 1),
        |arows AS (
        |  SELECT du.deg AS x, dv.deg AS y
        |  FROM sym JOIN dg du ON du.u = sym.u
        |  JOIN dg dv ON dv.u = sym.v),
        |ast AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM arows),
        |assort AS (
        |  SELECT CASE WHEN n * sxx - sx * sx <> 0 AND
        |                   n * syy - sy * sy <> 0
        |              THEN CAST(n * sxy - sx * sy AS DOUBLE) /
        |                   sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |                        CAST(n * syy - sy * sy AS DOUBLE))
        |         END AS assortativity
        |  FROM ast),
        |${oUnrolledCcCtes("a", "nodes", "sym")},
        |g1 AS (
        |  SELECT CAST(COALESCE(max(sz), 0) + (SELECT poison FROM achg)
        |           AS BIGINT) AS giant_size
        |  FROM (SELECT component, count(*) AS sz FROM alab GROUP BY 1)),
        |hubs AS (SELECT u AS node FROM dg ORDER BY deg DESC, u LIMIT 5),
        |e2 AS MATERIALIZED (
        |  SELECT u, v FROM sym
        |  WHERE u NOT IN (SELECT node FROM hubs)
        |    AND v NOT IN (SELECT node FROM hubs)),
        |n2 AS (SELECT DISTINCT u AS node FROM e2),
        |${oUnrolledCcCtes("b", "n2", "e2")},
        |g2 AS (SELECT CAST(COALESCE(max(sz), 0) + (SELECT poison FROM bchg)
        |         AS BIGINT) AS giant_after
        |       FROM (SELECT component, count(*) AS sz FROM blab GROUP BY 1)),
        |items AS (SELECT DISTINCT l_partkey AS item FROM lineitem),
        |rb(node, d) AS (
        |  SELECT item, CAST(0 AS BIGINT) FROM items WHERE item % 97 = 0
        |  UNION
        |  SELECT e.v, r.d + 1 FROM rb r JOIN sym e ON e.u = r.node
        |  WHERE r.d < 4),
        |md AS (SELECT node, CAST(min(d) AS BIGINT) AS d
        |       FROM rb GROUP BY 1),
        |bfs AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM md) AS n_reached,
        |         (SELECT CAST(count(*) AS BIGINT) FROM items
        |          WHERE item NOT IN (SELECT node FROM md)) AS n_unreached)
        |SELECT cnts.n_nodes, cnts.n_edges,
        |       CASE WHEN cnts.n_nodes > 1
        |            THEN CAST(2 * cnts.n_edges AS DOUBLE) /
        |                 CAST(cnts.n_nodes * (cnts.n_nodes - 1) AS DOUBLE)
        |       END AS density,
        |       assort.assortativity, g1.giant_size,
        |       CASE WHEN cnts.n_nodes > 0
        |            THEN CAST(g1.giant_size AS DOUBLE) /
        |                 CAST(cnts.n_nodes AS DOUBLE) END AS giant_share,
        |       g2.giant_after,
        |       CASE WHEN g1.giant_size > 0
        |            THEN CAST(g2.giant_after AS DOUBLE) /
        |                 CAST(g1.giant_size AS DOUBLE) END AS retained,
        |       bfs.n_reached, bfs.n_unreached
        |FROM cnts, assort, g1, g2, bfs""".stripMargin

  /** The q383/q384 boilerplate flood text — one constant string 60% of
    * the corpus is rewritten to, so the whole flood folds to a single
    * wide simhash (lowercase letters + spaces only: tokenizes
    * identically in both engines).
    */
  private val BoilerplateText: String =
    "this website uses cookies to improve your experience please " +
      "accept our cookie policy to continue browsing"

  /** Shared q383/q384 oracle CTE chain: flooded documents → the two
    * 28-bit simhash halves → wide 56-bit signature → 14-bit band rows
    * → per-bucket occupancy and the ≤ 32 rule. Ends with `bandok`
    * (band rows through unsaturated buckets only).
    */
  private def oWideFloodCtes: String =
    s"""fd AS (
       |  SELECT doc_id, CASE WHEN doc_id % 5 <= 2
       |    THEN '$BoilerplateText'
       |    ELSE text END AS text
       |  FROM documents),
       |${oSimhashCte("sh31", 31, src = "fd")},
       |${oSimhashCte("sh37", 37, seed = 1, src = "fd")},
       |wide AS MATERIALIZED (
       |  SELECT a.doc_id,
       |    a.sig + b.sig * ${1L << graft.operators.TextAnalysis.SimHashBits}
       |      AS sig
       |  FROM sh31 a JOIN sh37 b USING (doc_id)),
       |bands AS MATERIALIZED (
       |  SELECT doc_id, sig, b.band AS band,
       |    (sig // [1, 16384, 268435456, 4398046511104]
       |      [CAST(b.band AS INT) + 1]) % 16384 AS nib
       |  FROM wide, (SELECT unnest(range(4)) AS band) b),
       |occ AS (
       |  SELECT band, nib, count(*) AS occ
       |  FROM bands GROUP BY 1, 2),
       |okb AS (SELECT band, nib FROM occ WHERE occ <= 32),
       |bandok AS MATERIALIZED (
       |  SELECT b.doc_id, b.band, b.nib, b.sig
       |  FROM bands b JOIN okb USING (band, nib))""".stripMargin

  /** The q366/q373 SHARED incremental-image-dedup oracle — the
    * bucketed-signature-table query must hash IDENTICALLY to the
    * session-built one, so they grade against one SQL string.
    */
  private val oIncrementalImageDedupSql: String =
    """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id % 3 + 2 AS s
        |  FROM documents WHERE doc_id % 10 <> 9),
        |pq AS (
        |  SELECT doc_id, k, sp, sp % 24 + 9 AS w, (sp * 5) % 24 + 8 AS h
        |  FROM (
        |    SELECT doc_id, k,
        |      CASE WHEN k = 0 THEN 4 * (doc_id - doc_id % 2)
        |        WHEN k = 1 AND doc_id % 4 = 3 THEN 4 * (doc_id - 2) + 1
        |        ELSE 4 * doc_id + k END AS sp
        |    FROM (SELECT doc_id, unnest(range(s)) AS k FROM d))),
        |lum AS (
        |  SELECT doc_id, k, w, h, u.x AS x, u.y AS y,
        |    299 * u.p + 587 * ((u.p * 3) % 256)
        |      + 114 * ((u.p * 5) % 256) AS lum
        |  FROM (
        |    SELECT doc_id, k, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + sp % 31) * (y + sp % 37) * 3 + sp)
        |                % 256})))) AS u
        |    FROM pq)),
        |cells AS (
        |  SELECT doc_id, k, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT a.doc_id, a.k, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.k = b.k AND b.cy = a.cy
        |      AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT pq.doc_id, pq.doc_id * 8 + pq.k AS img_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM pq LEFT JOIN (
        |    SELECT doc_id, k, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1, 2) x
        |    ON x.doc_id = pq.doc_id AND x.k = pq.k),
        |cor AS (SELECT img_id, dhash FROM sig WHERE doc_id % 2 = 0),
        |bat AS (SELECT img_id, dhash FROM sig WHERE doc_id % 2 = 1),
        |cp AS (
        |  SELECT c.img_id AS i, b.img_id AS j
        |  FROM cor c JOIN bat b ON c.dhash = b.dhash
        |  WHERE c.dhash IS NOT NULL),
        |wp AS (
        |  SELECT a.img_id AS i, b.img_id AS j
        |  FROM bat a JOIN bat b
        |    ON a.img_id < b.img_id AND a.dhash = b.dhash
        |  WHERE a.dhash IS NOT NULL),
        |p AS (SELECT i, j FROM cp UNION SELECT i, j FROM wp),
        |symp AS (SELECT i AS u, j AS v FROM p UNION SELECT j, i FROM p),
        |pn AS (SELECT DISTINCT u AS node FROM symp),
        |r(node, comp) AS (
        |  SELECT node, node FROM pn
        |  UNION
        |  SELECT e.v, r.comp FROM r JOIN symp e ON e.u = r.node),
        |l AS (SELECT node, min(comp) AS component FROM r GROUP BY 1),
        |surv AS (
        |  SELECT b.img_id FROM bat b LEFT JOIN l ON l.node = b.img_id
        |  WHERE l.node IS NULL OR l.component = b.img_id)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM cor) AS n_corpus_sigs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM bat) AS n_batch_images,
        |  (SELECT CAST(count(dhash) AS BIGINT) FROM bat)
        |    AS n_batch_hashed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cp) AS n_cross_pairs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM wp) AS n_within_pairs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM surv)
        |    AS n_batch_survivors,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cor)
        |    + (SELECT CAST(count(*) AS BIGINT) FROM surv)
        |    AS n_total_sigs
        |ORDER BY n_corpus_sigs""".stripMargin

  private val oraclesBase: Map[String, String] = Map(
    "q39_embed_ann_lsh" -> oLsh,

    "q40_dedup_digest" ->
      """SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d
        |JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) k
        |  USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q41_multimodal_features" -> oMultimodalFeatures,

    "q46_kmv_sketch" ->
      s"""WITH h AS (
         |  SELECT source, ${oPolyHash("text")} AS hv FROM documents),
         |agg AS (
         |  SELECT source,
         |         CAST(count(DISTINCT hv) AS BIGINT) AS n_distinct_hash,
         |         list_sort(list(DISTINCT hv))[1:32] AS sk
         |  FROM h GROUP BY source)
         |SELECT source, n_distinct_hash,
         |       CAST(len(sk) AS BIGINT) AS sk_size,
         |       sk[32] AS h_k,
         |       CASE WHEN len(sk) < 32 THEN CAST(len(sk) AS DOUBLE)
         |            ELSE 31.0 * 1000000007 / sk[32] END AS est
         |FROM agg ORDER BY source""".stripMargin,

    // Sequential ground truth for the parallel CC fixpoint: a recursive
    // CTE floods every doc id across the (symmetrized) SimHash pair graph;
    // min over the reached set IS the component-min label.
    "q47_dedup_clusters" ->
      s"""WITH RECURSIVE toksrc AS (SELECT doc_id, text FROM documents),
         |$oSimhash,
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM simhash a JOIN simhash b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |reach(node, comp) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS doc_id, min(comp) AS component
         |        FROM reach GROUP BY node),
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS n_members
         |       FROM lab GROUP BY component)
         |SELECT l.doc_id, l.component, s.n_members,
         |       CAST(l.doc_id = l.component AS BIGINT) AS is_canonical
         |FROM lab l JOIN sz s USING (component)
         |ORDER BY l.doc_id""".stripMargin,

    "q48_decontaminate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $oToks AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(tk) - 1),
         |      i -> list_aggregate(tk[i:i+2], 'string_agg', ' ')))) AS s
         |  FROM toks),
         |bench AS (SELECT doc_id AS bid, s FROM sh WHERE doc_id % 50 = 0),
         |bsz AS (SELECT bid, count(*) AS bn FROM bench GROUP BY bid),
         |hits AS (
         |  SELECT a.doc_id, b.bid, count(*) AS c
         |  FROM sh a JOIN bench b ON a.s = b.s GROUP BY 1, 2),
         |scored AS (
         |  SELECT h.doc_id, h.bid, h.c,
         |         CAST(h.c AS DOUBLE) / bsz.bn AS frac,
         |         row_number() OVER (PARTITION BY h.doc_id
         |           ORDER BY CAST(h.c AS DOUBLE) / bsz.bn DESC, h.bid) AS rn
         |  FROM hits h JOIN bsz USING (bid))
         |SELECT d.doc_id, s.bid AS bench_id,
         |       CAST(coalesce(s.c, 0) AS BIGINT) AS common,
         |       coalesce(s.frac, 0.0) AS frac,
         |       CAST(coalesce(s.frac, 0.0) >= 0.5 AS BIGINT) AS contaminated
         |FROM documents d
         |LEFT JOIN (SELECT * FROM scored WHERE rn = 1) s ON s.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q42_repetition" ->
      s"""WITH toks AS (
         |  SELECT doc_id, text, $oToks AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS b
         |  FROM toks),
         |top AS (
         |  SELECT doc_id, max(c) AS top FROM (
         |    SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
         |  GROUP BY doc_id)
         |SELECT t.doc_id,
         |       CAST(len(string_split(t.text, chr(10))) AS BIGINT) AS n_lines,
         |       CAST(len(string_split(t.text, chr(10)))
         |            - len(list_distinct(string_split(t.text, chr(10)))) AS BIGINT) AS n_dup_lines,
         |       CAST(greatest(len(tk) - 1, 0) AS BIGINT) AS n_bigrams,
         |       CAST(coalesce(top.top, 0) AS BIGINT) AS top_bigram_cnt,
         |       CASE WHEN len(tk) > 1
         |            THEN CAST(top.top AS DOUBLE) / (len(tk) - 1) END AS rep_ratio
         |FROM toks t LEFT JOIN top ON top.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    "q43_pii_scan" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
        |       CAST(len(regexp_extract_all(text, '[0-9]{9,}')) AS BIGINT) AS n_long_digits
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_dedup_exact" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
        |       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q23_dedup_ngram" -> oJaccardPairs(2, 0.6),

    "q126_containment" -> oContainmentPairs(2, 0.8),

    "q24_dedup_minhash" -> oJaccardPairs(3, 0.5),

    "q25_dedup_simhash" ->
      s"""WITH toksrc AS (SELECT doc_id, text FROM documents),
         |$oSimhash
         |SELECT a.doc_id AS i, b.doc_id AS j,
         |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM simhash a JOIN simhash b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 2
         |ORDER BY i, j""".stripMargin,

    // Wide signature = sig31 + sig37 * 2^28 (both halves < 2^28, so the
    // BIGINT concatenation is exact; the 37-family folds from seed 1 —
    // TextAnalysis.WideSeed); banding guarantees total recall for
    // hamming <= 3, so all-pairs Hamming is again the ground truth.
    "q69_dedup_simhash_wide" ->
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id))
         |SELECT a.doc_id AS i, b.doc_id AS j,
         |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 2
         |ORDER BY i, j""".stripMargin,

    "q26_text_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id, text,
         |         CAST(len($oToks) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter($oToks,
         |           t -> list_contains(['the','a','an','of','to','and','in','is','on','for'], t))) AS BIGINT) AS n_stop,
         |         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS BIGINT) AS n_subtokens,
         |         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS BIGINT) AS punct_cnt
         |  FROM documents)
         |SELECT doc_id, n_tokens, n_subtokens, punct_cnt,
         |       CASE WHEN n_tokens > 0
         |            THEN CAST(n_stop AS DOUBLE) / n_tokens END AS stop_ratio,
         |       (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
         |        + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         |        + (1.0 - CAST(punct_cnt AS DOUBLE)
         |                 / greatest(CAST(length(text) AS DOUBLE), 1.0))) / 3.0 AS quality
         |FROM m ORDER BY doc_id""".stripMargin,

    "q27_lang_id" ->
      s"""WITH scores AS (
         |  SELECT lang,
         |         CAST(len(list_filter($oToks, t -> list_contains(['the','and','of','to','in','is'], t))) AS BIGINT) AS s_en,
         |         CAST(len(list_filter($oToks, t -> list_contains(['der','die','und','das','ist','nicht'], t))) AS BIGINT) AS s_de,
         |         CAST(len(list_filter($oToks, t -> list_contains(['el','la','los','que','una','por'], t))) AS BIGINT) AS s_es,
         |         CAST(len(list_filter($oToks, t -> list_contains(['le','les','des','est','une','dans'], t))) AS BIGINT) AS s_fr
         |  FROM documents),
         |pred AS (
         |  SELECT lang,
         |         CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |              WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |              WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |              WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
         |              ELSE 'und' END AS predicted
         |  FROM scores)
         |SELECT lang, predicted, CAST(count(*) AS BIGINT) AS cnt
         |FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

    "q28_fingerprint" ->
      s"""WITH $oSimhash
         |SELECT d.doc_id, ${oPolyHash("d.text")} AS fp, s.sig AS simhash
         |FROM documents d JOIN simhash s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q29_embed_topk" ->
      s"""WITH $oNorms,
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid, ${oCos("q", "c")} AS cos
         |  FROM norms q JOIN norms c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, nid, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q30_embed_ann_ivf" ->
      s"""WITH $oNorms,
         |$oCells,
         |probed AS (
         |  SELECT qid, cell FROM (
         |    SELECT q.vec_id AS qid, c.cid AS cell,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${oCos("q", "c")} DESC, c.cid) AS pr
         |    FROM norms q CROSS JOIN centroids c
         |    WHERE q.vec_id < 20)
         |  WHERE pr <= 5),
         |ranked AS (
         |  SELECT p.qid, n.vec_id AS nid, ${oCos("q", "n")} AS cos,
         |         row_number() OVER (PARTITION BY p.qid
         |           ORDER BY ${oCos("q", "n")} DESC, n.vec_id) AS rank
         |  FROM probed p
         |  JOIN cells ON cells.cell = p.cell
         |  JOIN norms n ON n.vec_id = cells.id
         |  JOIN norms q ON q.vec_id = p.qid
         |  WHERE n.vec_id <> p.qid)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q31_embed_dup" ->
      s"""WITH $oNorms,
         |$oCells
         |SELECT a.id AS i, b.id AS j, ${oCos("na", "nb")} AS cos
         |FROM cells a JOIN cells b ON a.cell = b.cell AND a.id < b.id
         |JOIN norms na ON na.vec_id = a.id
         |JOIN norms nb ON nb.vec_id = b.id
         |WHERE ${oCos("na", "nb")} >= 0.3
         |ORDER BY i, j""".stripMargin,

    "q33_token_freq" ->
      s"""SELECT token, CAST(count(*) AS BIGINT) AS cnt
         |FROM (SELECT unnest($oToks) AS token FROM documents)
         |GROUP BY token ORDER BY cnt DESC, token LIMIT 50""".stripMargin,

    "q34_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (
        |  SELECT vec_id, v,
        |         list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
        |                     (a, b) -> greatest(a, b)) AS mx
        |  FROM e),
        |q AS (
        |  SELECT vec_id, v, mx,
        |         CASE WHEN mx = 0
        |              THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |              ELSE list_transform(v, x -> greatest(-127, least(127,
        |                CAST(floor(x * (127.0 / mx) + 0.5) AS BIGINT)))) END AS qv
        |  FROM m)
        |SELECT vec_id, mx AS max_abs, qv[1] AS q1, qv[2] AS q2, qv[3] AS q3,
        |       CASE WHEN mx = 0 THEN NULL
        |            ELSE list_reduce(list_prepend(0.0, list_transform(range(len(v)),
        |              i -> (v[i+1] - qv[i+1] / (127.0 / mx)) * (v[i+1] - qv[i+1] / (127.0 / mx)))),
        |              (a, b) -> a + b) / len(v) END AS mse
        |FROM q ORDER BY vec_id""".stripMargin,

    "q37_kmeans_cells" ->
      s"""WITH $oNorms,
         |$oCells,
         |grouped AS (
         |  SELECT cells.cell, count(*) AS n, list(norms.v) AS vs
         |  FROM cells JOIN norms ON norms.vec_id = cells.id
         |  GROUP BY cells.cell),
         |trained AS (
         |  SELECT c0.cid,
         |         CASE WHEN g.cell IS NULL THEN CAST(c0.v AS REAL[])
         |              ELSE list_transform(range(64), j ->
         |                CAST(list_reduce(list_prepend(0.0,
         |                       list_transform(g.vs, x -> x[j+1])), (a, b) -> a + b)
         |                     / g.n AS REAL)) END AS cvec
         |  FROM centroids c0 LEFT JOIN grouped g ON g.cell = c0.cid),
         |tn AS (
         |  SELECT cid, CAST(cvec AS DOUBLE[]) AS v,
         |         sqrt(list_reduce(list_prepend(0.0,
         |           list_transform(CAST(cvec AS DOUBLE[]), x -> x*x)), (a, b) -> a + b)) AS nrm
         |  FROM trained),
         |assign1 AS (
         |  SELECT vec_id AS id, cid AS cell FROM (
         |    SELECT e.vec_id, c.cid,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${oCos("e", "c")} DESC, c.cid) AS rn
         |    FROM norms e CROSS JOIN tn c)
         |  WHERE rn = 1)
         |SELECT cell, CAST(count(*) AS BIGINT) AS cnt
         |FROM assign1 GROUP BY cell ORDER BY cell""".stripMargin,

    "q35_stratified_sample" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY (((doc_id % 2147483648) * 2654435761) % 4294967296) % 1000000, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang FROM ranked
        |WHERE rn <= ceil(n * 0.2)
        |ORDER BY lang, doc_id""".stripMargin,

    // Mixed-corpus media META (round-14 pixel upgrade): text payloads
    // checksum via DuckDB's own md5; image payloads' kind / size /
    // n_pixels / dHash re-derive from the PixelFixtures arithmetic.
    "q32_multimodal_meta" ->
      """WITH d AS (
        |  SELECT doc_id, text, doc_id % 2 = 1 AS img, doc_id % 3 AS m,
        |    doc_id % 24 + 9 AS w, (doc_id * 5) % 24 + 8 AS h,
        |    doc_id % 10 = 7 AS corrupt
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y,
        |    CASE WHEN m = 0 THEN u.p * 1000
        |      ELSE 299 * u.p + 587 * ((u.p * 3) % 256)
        |        + 114 * ((u.p * 5) % 256) END AS lum
        |  FROM (
        |    SELECT doc_id, m, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + doc_id % 31) * (y + doc_id % 37) * 3
        |                 + doc_id) % 256})))) AS u
        |    FROM d WHERE img AND NOT corrupt)),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |dh AS (
        |  SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(k AS INT)) AS hraw
        |  FROM bits GROUP BY 1)
        |SELECT d.doc_id,
        |  CASE WHEN NOT d.img THEN 'text/plain'
        |    WHEN d.corrupt THEN 'application/octet-stream'
        |    WHEN d.m = 2 THEN 'image/bmp' ELSE 'image/png' END AS kind,
        |  CAST(CASE WHEN NOT d.img
        |      THEN octet_length(encode(coalesce(d.text, '')))
        |    WHEN d.corrupt THEN 40
        |    WHEN d.m = 0 THEN 68 + d.h * (1 + d.w)
        |    WHEN d.m = 1 THEN 68 + d.h * (1 + 3 * d.w)
        |    ELSE 54 + d.h * (((3 * d.w + 3) // 4) * 4) END AS BIGINT)
        |    AS n_bytes,
        |  CASE WHEN NOT d.img THEN md5(coalesce(d.text, '')) END
        |    AS checksum,
        |  CASE WHEN d.img AND NOT d.corrupt
        |    THEN CAST(d.w * d.h AS BIGINT) END AS n_pixels,
        |  CASE WHEN d.img AND NOT d.corrupt THEN CAST(coalesce(dh.hraw, 0)
        |    - CASE WHEN coalesce(dh.hraw, 0) >= 9223372036854775808
        |        THEN 18446744073709551616 ELSE 0 END AS BIGINT) END
        |    AS dhash
        |FROM d LEFT JOIN dh USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // first corpus-wide occurrence = min packed (doc_id, pos); winner rows
    // reconstructed from the packed min, reassembled in position order.
    "q49_line_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, replace(text, ' ', chr(10)) AS text FROM documents),
        |lines AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, chr(10))) AS line,
        |         unnest(range(len(string_split(text, chr(10))))) AS pos
        |  FROM docs),
        |w AS (
        |  SELECT line, min(doc_id * 1000000 + pos) AS ord FROM lines GROUP BY line),
        |winners AS (
        |  SELECT ord // 1000000 AS doc_id, ord % 1000000 AS pos, line FROM w),
        |rebuilt AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         string_agg(line, chr(10) ORDER BY pos) AS text_dedup
        |  FROM winners GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
        |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        |       coalesce(r.text_dedup, '') AS text_dedup
        |FROM docs d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q50_mixture_sample" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY (((doc_id % 2147483648) * 2654435761) % 4294967296) % 1000000, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang FROM ranked
        |WHERE rn <= ceil(n * (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |                      WHEN 'fr' THEN 0.1 ELSE 0.05 END))
        |ORDER BY lang, doc_id""".stripMargin,

    "q51_token_shards" ->
      s"""WITH sized AS (
         |  SELECT doc_id, CAST(len($oToks) AS BIGINT) AS n_tokens FROM documents),
         |s AS (
         |  SELECT doc_id, n_tokens,
         |         (((doc_id % 2147483648) * 2654435761) % 4294967296) % 8 AS stream
         |  FROM sized),
         |c AS (
         |  SELECT doc_id, n_tokens, stream,
         |         CAST(sum(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id)
         |              - n_tokens AS BIGINT) AS "offset"
         |  FROM s)
         |SELECT doc_id, n_tokens, stream, "offset", "offset" // 2048 AS shard
         |FROM c ORDER BY doc_id""".stripMargin,

    "q52_topk_per_group" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, CAST(len($oToks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, n_tokens,
         |         CAST(row_number() OVER (PARTITION BY lang
         |           ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT doc_id, lang, n_tokens, rank FROM r
         |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    "q53_tfidf" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest($oToks) AS term FROM documents)
         |  GROUP BY 1, 2),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM documents),
         |sc AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
         |         CAST(tf.tf AS DOUBLE) * (nn.n + 1) / (dfx.df + 1) AS tfidf
         |  FROM tf JOIN dfx USING (term) CROSS JOIN nn),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term) AS BIGINT) AS rank FROM sc)
         |SELECT doc_id, term, tf, df, tfidf, rank FROM r
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // BM25, parenthesization mirrored op-for-op against TfIdf.bm25 so
    // every IEEE rounding step coincides. Constants are CAST to DOUBLE:
    // DuckDB parses bare decimal literals as DECIMAL, whose arithmetic
    // rounds differently.
    "q72_bm25" -> {
      val k1p1 = "CAST(2.2 AS DOUBLE)" // k1 + 1
      val k1 = "CAST(1.2 AS DOUBLE)"
      val oneMinusB = "CAST(0.25 AS DOUBLE)" // 1 - b
      val bC = "CAST(0.75 AS DOUBLE)"
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest($oToks) AS term FROM documents)
         |  GROUP BY 1, 2),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |dls AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM documents),
         |ad AS (SELECT CAST((SELECT coalesce(sum(tf), 0) FROM tf) AS DOUBLE)
         |              / (SELECT n FROM nn) AS avgdl),
         |sc AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, dfx.df, dls.dl,
         |         (CAST(nn.n + 1 AS DOUBLE) / (dfx.df + 1)) *
         |           (CAST(tf.tf AS DOUBLE) * $k1p1) /
         |           (CAST(tf.tf AS DOUBLE) +
         |            $k1 * ($oneMinusB + ($bC * dls.dl) / ad.avgdl)) AS bm25
         |  FROM tf JOIN dfx USING (term) JOIN dls USING (doc_id)
         |  CROSS JOIN nn CROSS JOIN ad),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY bm25 DESC, term) AS BIGINT) AS rank FROM sc)
         |SELECT doc_id, term, tf, df, dl, bm25, rank FROM r
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
    },

    "q54_posting_lists" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest($oToks) AS term FROM documents)
         |  GROUP BY 1, 2),
         |stats AS (
         |  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
         |  FROM tf GROUP BY 1),
         |top AS (
         |  SELECT term, doc_id,
         |         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
         |  FROM tf),
         |p AS (
         |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
         |  FROM top WHERE rn <= 10 GROUP BY term)
         |SELECT term, df, total_tf, postings
         |FROM stats JOIN p USING (term) ORDER BY term""".stripMargin,

    // q80's ordinal arithmetic with the q35 Knuth hash as the total
    // order.
    "q104_epoch_shuffle" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         (((doc_id % 2147483648) * 2654435761) % 4294967296) AS h
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(row_number() OVER (ORDER BY h, doc_id) - 1
        |            AS BIGINT) AS gid,
        |       CAST((row_number() OVER (ORDER BY h, doc_id) - 1) // 64
        |            AS BIGINT) AS shard
        |FROM b ORDER BY doc_id""".stripMargin,

    "q112_dedup_edit_verify" ->
      // q69's brute-force wide-signature pair set (banding is
      // total-recall at hamming <= 3, so all-pairs IS the candidate
      // set), then the same ASCII-folded 160-codepoint window and the
      // same threshold — plain levenshtein here (DuckDB has no
      // thresholded form); the WHERE reproduces the -1 gate. The fold's
      // 'g' flag matters: DuckDB regexp_replace is first-match-only
      // without it, Spark's replaces all matches always.
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j,
         |         CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |w AS (
         |  SELECT doc_id,
         |         regexp_replace(substring(text, 1, 160),
         |                        '[^\\x20-\\x7E]', '?', 'g') AS w
         |  FROM documents)
         |SELECT p.i, p.j, p.hamming,
         |       CAST(levenshtein(wi.w, wj.w) AS BIGINT) AS edits
         |FROM pairs p
         |JOIN w wi ON p.i = wi.doc_id
         |JOIN w wj ON p.j = wj.doc_id
         |WHERE levenshtein(wi.w, wj.w) <= 40
         |ORDER BY i, j""".stripMargin,

    "q113_weighted_mix" ->
      // Same virtual-deadline arithmetic: L = lcm(5,2,2,1) = 10,
      // stride = L // w, key = rank * stride, order (key, lang). The
      // inner join on the weight VALUES is the whitelist (zh drops).
      // All integers — `//`, never `/` (DuckDB int `/` yields DOUBLE).
      """WITH wts(lang, wt) AS (
        |  VALUES ('en', 5), ('de', 2), ('es', 2), ('fr', 1)),
        |r AS (
        |  SELECT d.doc_id, d.lang,
        |         row_number() OVER (PARTITION BY d.lang ORDER BY d.doc_id) AS rn,
        |         10 // wt AS stride
        |  FROM documents d JOIN wts ON d.lang = wts.lang)
        |SELECT CAST(row_number() OVER (ORDER BY rn * stride, lang) - 1
        |            AS BIGINT) AS position,
        |       doc_id, lang, CAST(rn * stride AS BIGINT) AS mix_key
        |FROM r ORDER BY position""".stripMargin,

    "q111_hll_distinct" ->
      // Mirrors hllRegisterTable / hllEstimate step-for-step: the
      // Murmur2-style 31-bit finalizer as portable xor/shift/multiply
      // lines, rank via length(bin()) (no log2), the harmonic sum as
      // exact powers of two (shift, not pow), and the alpha*m^2 numerator
      // as an exact exponent scaling of CAST(0.709 AS DOUBLE).
      s"""WITH tok AS (
         |  SELECT lang, text AS t FROM documents WHERE text IS NOT NULL),
         |h0 AS (SELECT lang, ${oPolyHash("t")} AS h FROM tok),
         |hm AS (
         |  SELECT lang, xor(e, e >> 16) AS hv FROM (
         |    SELECT lang, (xor(b, b >> 13) * 1103515245) % 2147483648 AS e
         |    FROM (
         |      SELECT lang, (xor(h, h >> 15) * 1540483477) % 2147483648 AS b
         |      FROM h0))),
         |br AS (
         |  SELECT lang, hv % 16 AS bucket,
         |         CASE WHEN hv // 16 = 0 THEN 28
         |              ELSE 28 - length(bin(hv // 16)) END AS rnk
         |  FROM hm),
         |mx AS (SELECT lang, bucket, CAST(max(rnk) AS BIGINT) AS reg
         |       FROM br GROUP BY 1, 2),
         |dense AS (
         |  SELECT l.lang, gs.b AS bucket, coalesce(mx.reg, CAST(0 AS BIGINT)) AS reg
         |  FROM (SELECT DISTINCT lang FROM tok) l
         |  CROSS JOIN (SELECT unnest(range(16)) AS b) gs
         |  LEFT JOIN mx ON mx.lang = l.lang AND mx.bucket = gs.b),
         |regs AS (SELECT lang, list(reg ORDER BY bucket) AS regs
         |         FROM dense GROUP BY 1),
         |ex AS (SELECT lang, CAST(count(DISTINCT t) AS BIGINT) AS n_exact
         |       FROM tok GROUP BY 1)
         |SELECT r.lang,
         |       array_to_string(r.regs, ',') AS regs_str,
         |       CAST(len(list_filter(r.regs, x -> x = 0)) AS BIGINT) AS v_zero,
         |       (CAST(0.673 AS DOUBLE) * 256)
         |         / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |             list_transform(r.regs, x -> CAST(1.0 AS DOUBLE)
         |               / CAST((CAST(1 AS BIGINT) << x) AS DOUBLE))),
         |             (a, x) -> a + x) AS est,
         |       ex.n_exact
         |FROM regs r JOIN ex ON r.lang = ex.lang
         |ORDER BY r.lang""".stripMargin,

    "q107_dup_graph_triage" ->
      // q69's brute-force wide-SimHash pair oracle feeding the shared
      // triangle CTE chain (RelationalQueries.oTriangleCtes); the role
      // gate compares integers only.
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pg AS MATERIALIZED (
         |  SELECT a.doc_id AS src, b.doc_id AS dst
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |${RelationalQueries.oTriangleCtes("pg")}
         |SELECT node, degree, triangles, wedges, clustering,
         |       CASE WHEN degree = 1 THEN 'leaf'
         |            WHEN triangles = 0 THEN 'acyclic'
         |            WHEN triangles * 2 >= wedges THEN 'cohesive'
         |            ELSE 'mixed' END AS role
         |FROM tstats ORDER BY node""".stripMargin,

    // q74's histogram-cumulate shape with c = sum(token count) instead
    // of count(*).
    "q103_weighted_quantiles" ->
      s"""WITH h AS (
         |  SELECT lang, n_chars AS v,
         |         CAST(sum(CAST(len($oToks) AS BIGINT)) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2),
         |cum AS (
         |  SELECT lang, v,
         |         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         |         sum(c) OVER (PARTITION BY lang) AS n
         |  FROM h)
         |SELECT lang, CAST(min(n) AS BIGINT) AS n,
         |       min(CASE WHEN cum * 4 >= n * 1 THEN v END) AS p25,
         |       min(CASE WHEN cum * 4 >= n * 2 THEN v END) AS p50,
         |       min(CASE WHEN cum * 4 >= n * 3 THEN v END) AS p75
         |FROM cum GROUP BY lang ORDER BY lang""".stripMargin,

    // q81's gate CTEs (verdict) + q98's feature/score shape under the
    // distilled literals, joined into confusion counts.
    "q102_gate_distill" ->
      s"""WITH $oGateCtes,
         |feat AS (
         |  SELECT doc_id,
         |         CAST(len(tk) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter(tk,
         |           t -> list_contains(['the','a','an','of','to','and','in','is','on','for'], t))) AS BIGINT) AS n_stop,
         |         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS BIGINT) AS punct_cnt,
         |         text
         |  FROM m),
         |fx AS (
         |  SELECT doc_id,
         |         CAST(n_tokens AS DOUBLE) AS f_tokens,
         |         CAST(punct_cnt AS DOUBLE) AS f_punct,
         |         COALESCE(CASE WHEN n_tokens > 0
         |                       THEN CAST(n_stop AS DOUBLE) / n_tokens END,
         |                  CAST(0.0 AS DOUBLE)) AS f_stop,
         |         (least(CAST(length(text) AS DOUBLE) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |          + least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |          + (CAST(1.0 AS DOUBLE) - CAST(punct_cnt AS DOUBLE)
         |                 / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE)))) / CAST(3.0 AS DOUBLE) AS f_quality
         |  FROM feat),
         |sx AS (
         |  SELECT doc_id,
         |         ((((CAST(0.0 AS DOUBLE)
         |             + (f_tokens * CAST(0.10338513290120002 AS DOUBLE)))
         |             + (f_punct * CAST(0.0 AS DOUBLE)))
         |             + (f_stop * CAST(2.561121689531541 AS DOUBLE)))
         |             + (f_quality * CAST(15.712607333411997 AS DOUBLE)))
         |           + CAST(-10.389739811106871 AS DOUBLE) AS z
         |  FROM fx)
         |SELECT CAST(CASE WHEN v.reasons = 0 THEN 1 ELSE 0 END AS INT) AS gate_keep,
         |       CASE WHEN sx.z > CAST(0.0 AS DOUBLE) THEN 1 ELSE 0 END AS predicted,
         |       CAST(count(*) AS BIGINT) AS cnt
         |FROM sx JOIN verdict v USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same patterns and email→ip→digits pass order as piiRedact; the
    // 'g' flag makes DuckDB replace every match like Spark does.
    "q101_pii_redact" ->
      """WITH r AS (
        |  SELECT doc_id,
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(text,
        |               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |             '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |           '[0-9]{9,}', '<DIGITS>', 'g') AS redacted
        |  FROM documents)
        |SELECT doc_id, redacted,
        |       CAST(len(regexp_extract_all(redacted, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails_after,
        |       CAST(len(regexp_extract_all(redacted, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ipv4_after,
        |       CAST(len(regexp_extract_all(redacted, '[0-9]{9,}')) AS BIGINT) AS n_long_digits_after
        |FROM r ORDER BY doc_id""".stripMargin,

    // q31's pair CTEs + q47's recursive-CC labeling, survivors = nodes
    // that are their own component label.
    "q100_semantic_dedup" ->
      s"""WITH RECURSIVE $oNorms,
         |$oCells,
         |pairs AS (
         |  SELECT a.id AS i, b.id AS j
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.id < b.id
         |  JOIN norms na ON na.vec_id = a.id
         |  JOIN norms nb ON nb.vec_id = b.id
         |  WHERE ${oCos("na", "nb")} >= 0.3),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |reach(node, comp) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS vec_id, min(comp) AS component
         |        FROM reach GROUP BY node)
         |SELECT vec_id FROM lab WHERE vec_id = component
         |ORDER BY vec_id""".stripMargin,

    // The Knuth-bucket arithmetic verbatim (q35's hash), banded by
    // cumulative percentage.
    "q99_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS bkt
        |  FROM documents)
        |SELECT doc_id,
        |       CASE WHEN bkt < 80 THEN 'train'
        |            WHEN bkt < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // Mirrors LinearModel.score's contract exactly: left-to-right fold
    // seeded at 0.0, bias last, every decimal literal CAST AS DOUBLE
    // (DuckDB parses bare decimals as DECIMAL — SCALE.md IEEE parity).
    // Features are the q26 expressions verbatim.
    "q98_quality_classifier" ->
      s"""WITH m AS (
         |  SELECT doc_id, text,
         |         CAST(len($oToks) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter($oToks,
         |           t -> list_contains(['the','a','an','of','to','and','in','is','on','for'], t))) AS BIGINT) AS n_stop,
         |         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS BIGINT) AS punct_cnt
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |         CAST(n_tokens AS DOUBLE) AS f_tokens,
         |         CAST(punct_cnt AS DOUBLE) AS f_punct,
         |         COALESCE(CASE WHEN n_tokens > 0
         |                       THEN CAST(n_stop AS DOUBLE) / n_tokens END,
         |                  CAST(0.0 AS DOUBLE)) AS f_stop,
         |         (least(CAST(length(text) AS DOUBLE) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |          + least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |          + (CAST(1.0 AS DOUBLE) - CAST(punct_cnt AS DOUBLE)
         |                 / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE)))) / CAST(3.0 AS DOUBLE) AS f_quality
         |  FROM m),
         |s AS (
         |  SELECT doc_id,
         |         ((((CAST(0.0 AS DOUBLE)
         |             + (f_tokens * CAST(0.02 AS DOUBLE)))
         |             + (f_punct * CAST(-0.15 AS DOUBLE)))
         |             + (f_stop * CAST(-5.0 AS DOUBLE)))
         |             + (f_quality * CAST(3.0 AS DOUBLE)))
         |           + CAST(-3.2 AS DOUBLE) AS z
         |  FROM f)
         |SELECT doc_id, z,
         |       CASE WHEN z > CAST(0.0 AS DOUBLE) THEN 1 ELSE 0 END AS predicted
         |FROM s ORDER BY doc_id""".stripMargin,

    // Exact side = q23's CTEs; approx side = q69's wide-simhash pairs at
    // hamming ≤ 3 (all-pairs form — the banded operator has total recall
    // there by pigeonhole, the equivalence q69 itself gates).
    "q97_dedup_recall" ->
      s"""WITH ${oJaccardCtes(2)},
         |exact AS (SELECT i, j FROM jac WHERE jaccard >= 0.6),
         |${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |approx AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |hit AS (SELECT i, j FROM exact INTERSECT SELECT i, j FROM approx)
         |SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
         |       CAST((SELECT count(*) FROM approx) AS BIGINT) AS n_approx,
         |       CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
         |       CASE WHEN (SELECT count(*) FROM exact) > 0
         |            THEN CAST((SELECT count(*) FROM hit) AS DOUBLE)
         |                 / (SELECT count(*) FROM exact) END AS recall""".stripMargin,

    // Both medians are q55's histogram-cumulate CTE shape; rz is one
    // rational division of exact longs.
    "q96_robust_zscore" ->
      """WITH h AS (
        |  SELECT lang, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, v,
        |         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h),
        |med AS (
        |  SELECT lang, min(v) AS median FROM cum WHERE cum * 2 >= n GROUP BY lang),
        |h2 AS (
        |  SELECT d.lang, abs(d.n_chars - m.median) AS v, count(*) AS c
        |  FROM documents d JOIN med m USING (lang) GROUP BY 1, 2),
        |cum2 AS (
        |  SELECT lang, v,
        |         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h2),
        |mad AS (
        |  SELECT lang, min(v) AS mad FROM cum2 WHERE cum * 2 >= n GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars, med.median, mad.mad,
        |       CASE WHEN mad.mad > 0
        |            THEN CAST(d.n_chars - med.median AS DOUBLE) / mad.mad END AS rz
        |FROM documents d JOIN med USING (lang) JOIN mad USING (lang)
        |ORDER BY d.doc_id""".stripMargin,

    "q55_group_median" ->
      """WITH h AS (
        |  SELECT lang, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, v,
        |         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h)
        |SELECT lang, CAST(min(n) AS BIGINT) AS n, min(v) AS median
        |FROM cum WHERE cum * 2 >= n GROUP BY lang ORDER BY lang""".stripMargin,

    "q59_histogram" ->
      """SELECT CAST(least(15, n_chars // 250) AS BIGINT) AS bucket,
        |       CAST(least(15, n_chars // 250) * 250 AS BIGINT) AS lo,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(n_chars) AS min_v, max(n_chars) AS max_v
        |FROM documents GROUP BY 1, 2 ORDER BY bucket""".stripMargin,

    "q127_random_projection" ->
      // Exploded scalar rows (vec_id, dim, proj) straight from pcoord —
      // no list assembly, matching the engine's posexplode output.
      s"""WITH $oProjCtes
         |SELECT vec_id, CAST(j AS BIGINT) AS dim, pj AS proj
         |FROM pcoord ORDER BY vec_id, dim""".stripMargin,

    // Recall@5 of projected-space top-k against the exact 64-dim brute
    // force — projection CTEs + the q60 recall-join shape.
    "q128_projection_recall" ->
      s"""WITH $oNorms,
         |$oProjCtes,
         |bscored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid, ${oCos("q", "c")} AS cos
         |  FROM norms q JOIN norms c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |branked AS (
         |  SELECT qid, nid,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM bscored),
         |brute AS (SELECT qid, nid FROM branked WHERE rank <= 5),
         |pnorm AS (
         |  SELECT vec_id, pv,
         |         sqrt(list_reduce(list_prepend(0.0,
         |           list_transform(pv, x -> x*x)), (a, b) -> a + b)) AS pn
         |  FROM pvec),
         |pscored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |         CASE WHEN q.pn * c.pn != 0 THEN
         |           list_reduce(list_prepend(0.0, list_transform(range(16),
         |             i -> q.pv[i+1] * c.pv[i+1])), (x, y) -> x + y)
         |             / (q.pn * c.pn)
         |         END AS pcos
         |  FROM pnorm q JOIN pnorm c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |pranked AS (
         |  SELECT qid, nid,
         |         row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, nid) AS rank
         |  FROM pscored),
         |papprox AS (SELECT qid, nid FROM pranked WHERE rank <= 5)
         |SELECT b.qid, CAST(count(p.nid) AS BIGINT) AS hits,
         |       CAST(count(p.nid) AS DOUBLE) / 5 AS recall_at_5
         |FROM brute b LEFT JOIN papprox p ON p.qid = b.qid AND p.nid = b.nid
         |GROUP BY b.qid ORDER BY b.qid""".stripMargin,

    // Winnowing: q65's positional-gram CTE, polyHash per gram, packed
    // (mod−h)·2^32+pos key so the windowed max IS (min hash, rightmost
    // pos), full windows only, distinct decode.
    "q129_winnow_fingerprints" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |grams AS (
         |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
         |      i -> {'pos': i - 1,
         |            'gram': list_aggregate(tk[i:i+2], 'string_agg', ' ')})) AS u
         |    FROM toks)),
         |keys AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |         (1000000007 - ${oPolyHash("gram")}) * 4294967296 + pos AS k
         |  FROM grams),
         |wins AS (
         |  SELECT doc_id, pos,
         |         max(k) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS wk
         |  FROM keys)
         |SELECT DISTINCT doc_id, wk % 4294967296 AS pos,
         |       1000000007 - wk // 4294967296 AS fp
         |FROM wins WHERE pos >= 7 ORDER BY doc_id, pos""".stripMargin,

    // Winnow pairs: q129's selection CTEs (toks shared with the
    // verification CTEs), df-capped fingerprint self-join, q23's exact
    // Jaccard.
    "q135_winnow_pairs" ->
      s"""WITH ${oJaccardCtes(3)},
         |grams AS (
         |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
         |      i -> {'pos': i - 1,
         |            'gram': list_aggregate(tk[i:i+2], 'string_agg', ' ')})) AS u
         |    FROM toks)),
         |keys AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |         (1000000007 - ${oPolyHash("gram")}) * 4294967296 + pos AS k
         |  FROM grams),
         |wins AS (
         |  SELECT doc_id, pos,
         |         max(k) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS wk
         |  FROM keys),
         |sel AS (
         |  SELECT DISTINCT doc_id, 1000000007 - wk // 4294967296 AS fp
         |  FROM wins WHERE pos >= 7),
         |keep AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 100),
         |cd AS (
         |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |  FROM sel a JOIN keep USING (fp)
         |  JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id)
         |SELECT c.i, c.j, jac.common, jac.jaccard
         |FROM cd c JOIN jac ON jac.i = c.i AND jac.j = c.j
         |WHERE jac.jaccard >= 0.5 ORDER BY c.i, c.j""".stripMargin,

    // Sorted neighborhood: rank by (prefix, id), pairs within 7 ranks,
    // then the shared exact-Jaccard CTEs. NULLS FIRST pins DuckDB's
    // default-last NULL order to Spark's default-first.
    "q130_sorted_neighborhood" ->
      s"""WITH ${oJaccardCtes(2)},
         |ranked AS (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY substr(text, 1, 32) NULLS FIRST, doc_id) - 1 AS r
         |  FROM documents),
         |cand AS (
         |  SELECT least(a.doc_id, b.doc_id) AS i,
         |         greatest(a.doc_id, b.doc_id) AS j
         |  FROM ranked a JOIN ranked b ON b.r - a.r BETWEEN 1 AND 7)
         |SELECT c.i, c.j, jac.common, jac.jaccard
         |FROM cand c JOIN jac ON jac.i = c.i AND jac.j = c.j
         |WHERE jac.jaccard >= 0.6 ORDER BY c.i, c.j""".stripMargin,

    // Recall@5 of the q30 IVF CTEs against the q29 brute-force CTEs —
    // both re-derived here verbatim so the metric is self-contained.
    "q60_ann_recall" ->
      s"""WITH $oNorms,
         |$oCells,
         |bscored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid, ${oCos("q", "c")} AS cos
         |  FROM norms q JOIN norms c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |branked AS (
         |  SELECT qid, nid,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM bscored),
         |brute AS (SELECT qid, nid FROM branked WHERE rank <= 5),
         |probed AS (
         |  SELECT qid, cell FROM (
         |    SELECT q.vec_id AS qid, c.cid AS cell,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${oCos("q", "c")} DESC, c.cid) AS pr
         |    FROM norms q CROSS JOIN centroids c
         |    WHERE q.vec_id < 20)
         |  WHERE pr <= 5),
         |iranked AS (
         |  SELECT p.qid, n.vec_id AS nid,
         |         row_number() OVER (PARTITION BY p.qid
         |           ORDER BY ${oCos("q", "n")} DESC, n.vec_id) AS rank
         |  FROM probed p
         |  JOIN cells ON cells.cell = p.cell
         |  JOIN norms n ON n.vec_id = cells.id
         |  JOIN norms q ON q.vec_id = p.qid
         |  WHERE n.vec_id <> p.qid),
         |ivf AS (SELECT qid, nid FROM iranked WHERE rank <= 5)
         |SELECT b.qid, CAST(count(i.nid) AS BIGINT) AS hits,
         |       CAST(count(i.nid) AS DOUBLE) / 5 AS recall_at_5
         |FROM brute b LEFT JOIN ivf i ON i.qid = b.qid AND i.nid = b.nid
         |GROUP BY b.qid ORDER BY b.qid""".stripMargin,

    // q47's recursive-CTE labeling, reduced to the canonical survivors.
    "q63_dedup_corpus" ->
      s"""WITH RECURSIVE toksrc AS (SELECT doc_id, text FROM documents),
         |$oSimhash,
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM simhash a JOIN simhash b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |reach(node, comp) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS doc_id, min(comp) AS component
         |        FROM reach GROUP BY node)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d JOIN lab ON lab.doc_id = d.doc_id
         |WHERE lab.doc_id = lab.component
         |ORDER BY d.doc_id""".stripMargin,

    // Incremental matches: cross pairs (existing -> new) keep the
    // (i = existing, j = new) orientation; within-batch pairs are the
    // usual i < j. The two sets are disjoint by membership, so UNION ALL.
    "q71_dedup_incremental" ->
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |newb AS (SELECT * FROM wide WHERE doc_id % 7 = 0),
         |oldb AS (SELECT * FROM wide WHERE doc_id % 7 <> 0)
         |SELECT i, j, hamming FROM (
         |  SELECT o.doc_id AS i, n.doc_id AS j,
         |         CAST(bit_count(xor(o.sig, n.sig)) AS BIGINT) AS hamming
         |  FROM oldb o JOIN newb n ON bit_count(xor(o.sig, n.sig)) <= 2
         |  UNION ALL
         |  SELECT a.doc_id AS i, b.doc_id AS j,
         |         CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |  FROM newb a JOIN newb b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2)
         |ORDER BY i, j""".stripMargin,

    // q63's recursive-CTE labeling over the WIDE pair graph.
    "q70_dedup_corpus_wide" ->
      s"""WITH RECURSIVE ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |reach(node, comp) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS doc_id, min(comp) AS component
         |        FROM reach GROUP BY node)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d JOIN lab ON lab.doc_id = d.doc_id
         |WHERE lab.doc_id = lab.component
         |ORDER BY d.doc_id""".stripMargin,

    "q64_winsorize" ->
      """WITH h AS (
        |  SELECT lang, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, v,
        |         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h),
        |qs AS (
        |  SELECT lang,
        |         min(CASE WHEN cum * 10 >= n * 1 THEN v END) AS qlo,
        |         min(CASE WHEN cum * 10 >= n * 9 THEN v END) AS qhi
        |  FROM cum GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars,
        |       least(greatest(n_chars, qlo), qhi) AS n_chars_clipped
        |FROM documents d JOIN qs ON d.lang = qs.lang
        |ORDER BY doc_id""".stripMargin,

    "q62_chunking" ->
      """WITH starts AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, greatest(len(text), 1), 400)) AS start
        |  FROM documents)
        |SELECT doc_id, CAST((start - 1) // 400 AS BIGINT) AS chunk_idx,
        |       CAST(start AS BIGINT) AS start,
        |       CAST(len(substr(text, start, 500)) AS BIGINT) AS chunk_len,
        |       md5(substr(text, start, 500)) AS checksum
        |FROM starts WHERE start <= len(text)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // Trigram spans repeated across >= 2 docs; covered = union of the
    // 3-token windows (distinct positions), mirroring Spans'
    // posexplode-position arithmetic with 1-based list slices.
    "q65_span_coverage" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |grams AS (
         |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
         |      i -> {'pos': i - 1,
         |            'gram': list_aggregate(tk[i:i+2], 'string_agg', ' ')})) AS u
         |    FROM toks)),
         |rep AS (
         |  SELECT gram FROM grams GROUP BY gram
         |  HAVING count(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT doc_id, count(DISTINCT cp) AS covered FROM (
         |    SELECT g.doc_id, unnest(range(g.pos, g.pos + 3)) AS cp
         |    FROM grams g JOIN rep USING (gram))
         |  GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
         |       CASE WHEN len(t.tk) > 0
         |            THEN CAST(coalesce(c.covered, 0) AS DOUBLE) / len(t.tk)
         |            ELSE 0.0 END AS coverage
         |FROM toks t LEFT JOIN cov c USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    "q67_table_checksum" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(${oPolyHash(
               "md5(concat_ws(chr(1), doc_id, lang, source, text))")})
         |         % 1000000000000000 AS BIGINT) AS checksum_mod
         |FROM documents""".stripMargin,

    // ROLLUP via DuckDB's native grouping sets; GROUPING(lang, source)
    // emits the same bit pattern as Spark's grouping_id (leftmost dim =
    // highest bit). NULLS FIRST mirrors Spark's asc_nulls_first.
    "q73_rollup_stats" ->
      """SELECT lang, source,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_v,
        |       min(n_chars) AS min_v, max(n_chars) AS max_v,
        |       CAST(GROUPING(lang, source) AS BIGINT) AS gid
        |FROM documents GROUP BY ROLLUP (lang, source)
        |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    // Bigram extraction mirrors q42's oracle pattern; the stats join
    // preserves occurrence multiplicity exactly as the engine's
    // gram-keyed join does. Ratios are single divisions of exact BIGINTs.
    "q87_ngram_familiarity" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $oToks AS tk FROM documents),
         |dg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS gram
         |  FROM toks),
         |cc AS (SELECT gram, count(*) AS cnt FROM dg GROUP BY 1),
         |st AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |         CAST(sum(cnt) AS BIGINT) AS sum_freq,
         |         CAST(count(CASE WHEN cnt >= 2 THEN 1 END) AS BIGINT) AS n_known
         |  FROM dg JOIN cc USING (gram) GROUP BY 1)
         |SELECT d.doc_id,
         |       coalesce(st.n_grams, CAST(0 AS BIGINT)) AS n_grams,
         |       coalesce(st.sum_freq, CAST(0 AS BIGINT)) AS sum_freq,
         |       coalesce(st.n_known, CAST(0 AS BIGINT)) AS n_known,
         |       CASE WHEN st.n_grams > 0
         |            THEN CAST(st.sum_freq AS DOUBLE) / st.n_grams END AS familiarity,
         |       CASE WHEN st.n_grams > 0
         |            THEN CAST(st.n_known AS DOUBLE) / st.n_grams END AS known_ratio
         |FROM documents d LEFT JOIN st USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Quota derivation mirrors the operator bit-for-bit: sqrt weights,
    // denominator folded from a 0.0 seed in stratum-sorted order
    // (NULLS FIRST — sources here are non-null, but the order contract
    // is part of the operator's doc), floor of the IEEE product/quotient;
    // row selection is q35's (Knuth hash bucket, key) total order.
    "q88_temperature_sample" ->
      """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM cnt),
        |d AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list(w ORDER BY source NULLS FIRST)), (a, b) -> a + b) AS denom
        |      FROM w),
        |q AS (SELECT source, n,
        |        CAST(floor(CAST(600 AS DOUBLE) * w / denom) AS BIGINT) AS quota
        |      FROM w CROSS JOIN d),
        |ranked AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY (((doc_id % 2147483648) * 2654435761) % 4294967296) % 1000000, doc_id) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.source FROM ranked r JOIN q USING (source)
        |WHERE r.rn <= least(q.quota, q.n)
        |ORDER BY r.source, r.doc_id""".stripMargin,

    // HRW: per-shard affine scores over the shared key hash, argmax by
    // (score DESC, shard ASC); coefficient literals come from the SAME
    // Scala stream that parameterized the plan (Layout.hrwCoeffs).
    "q134_rendezvous_shards" -> {
      def shardCtes(n: Int, t: String): String = {
        val vals = graft.operators.Layout.hrwCoeffs(n).zipWithIndex
          .map { case ((a, b), s) => s"($s, $a, $b)" }.mkString(", ")
        s"""c$t(s, a, b) AS (VALUES $vals),
           |r$t AS (
           |  SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
           |    ORDER BY (hk * a + b) % 1000000007 DESC, s) AS rk
           |  FROM hsh CROSS JOIN c$t),
           |s$t AS (SELECT doc_id, CAST(s AS INT) AS shard$t FROM r$t
           |        WHERE rk = 1)""".stripMargin
      }
      s"""WITH hsh AS (
         |  SELECT doc_id, ${oPolyHash("CAST(doc_id AS VARCHAR)")} AS hk
         |  FROM documents),
         |${shardCtes(8, "8")},
         |${shardCtes(9, "9")}
         |SELECT h.doc_id, s8.shard8, s9.shard9
         |FROM hsh h JOIN s8 USING (doc_id) JOIN s9 USING (doc_id)
         |ORDER BY h.doc_id""".stripMargin
    },

    // Theta set ops: per-source bottom-32 distinct token hashes, pair
    // θ = min of the two retention thresholds (k-th min when full, M
    // otherwise), counts over entries < θ, estimates n·M/θ.
    "q133_theta_setops" ->
      s"""WITH h AS (
         |  SELECT source, ${oPolyHash("t")} AS hv FROM (
         |    SELECT source, unnest($oToks) AS t FROM documents)),
         |d AS (SELECT DISTINCT source, hv FROM h),
         |rk AS (SELECT source, hv, row_number() OVER (PARTITION BY source
         |         ORDER BY hv) AS rn FROM d),
         |sk AS MATERIALIZED (SELECT source, hv FROM rk WHERE rn <= 32),
         |th AS (SELECT source, CASE WHEN count(*) >= 32 THEN max(hv)
         |                           ELSE 1000000007 END AS theta
         |       FROM sk GROUP BY 1),
         |p AS (SELECT a.source AS i, b.source AS j,
         |             least(a.theta, b.theta) AS theta
         |      FROM th a JOIN th b ON a.source < b.source),
         |un AS (SELECT i, j, count(*) AS nu FROM (
         |         SELECT p.i, p.j, s.hv FROM p
         |         JOIN sk s ON s.source = p.i AND s.hv < p.theta
         |         UNION
         |         SELECT p.i, p.j, s.hv FROM p
         |         JOIN sk s ON s.source = p.j AND s.hv < p.theta)
         |       GROUP BY 1, 2),
         |inr AS (SELECT p.i, p.j, count(*) AS ni FROM p
         |        JOIN sk a ON a.source = p.i AND a.hv < p.theta
         |        JOIN sk b ON b.source = p.j AND b.hv = a.hv
         |        GROUP BY 1, 2)
         |SELECT p.i, p.j, p.theta,
         |       CAST(coalesce(un.nu, 0) AS BIGINT) AS n_union,
         |       CAST(coalesce(inr.ni, 0) AS BIGINT) AS n_inter,
         |       coalesce(un.nu, 0) * CAST(1000000007 AS DOUBLE) / p.theta AS union_est,
         |       coalesce(inr.ni, 0) * CAST(1000000007 AS DOUBLE) / p.theta AS inter_est,
         |       CASE WHEN coalesce(un.nu, 0) > 0
         |            THEN CAST(coalesce(inr.ni, 0) AS DOUBLE) / un.nu
         |            ELSE 0.0 END AS jaccard_est
         |FROM p LEFT JOIN un ON un.i = p.i AND un.j = p.j
         |       LEFT JOIN inr ON inr.i = p.i AND inr.j = p.j
         |ORDER BY p.i, p.j""".stripMargin,

    // Distribution matching: C = min(n_s/t_s) over the weighted strata
    // (LEFT JOIN keeps corpus-absent targets at n=0 so an unreachable
    // mix empties the result), quotas ⌊C·t_s⌋, q88's hash-order pick.
    "q131_match_distribution" ->
      """WITH tgt(s, t) AS (VALUES ('en', 0.4), ('de', 0.15), ('es', 0.15),
        |                          ('fr', 0.15), ('zh', 0.15)),
        |cnt AS (SELECT lang AS s, CAST(count(*) AS BIGINT) AS n
        |        FROM documents GROUP BY 1),
        |c AS (SELECT min(CAST(coalesce(cnt.n, 0) AS DOUBLE) / t) AS c
        |      FROM tgt LEFT JOIN cnt USING (s) WHERE t > 0),
        |q AS (SELECT s, CAST(floor(c.c * t) AS BIGINT) AS quota
        |      FROM tgt CROSS JOIN c WHERE t > 0),
        |ranked AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY (((doc_id % 2147483648) * 2654435761) % 4294967296) % 1000000, doc_id) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.lang
        |FROM ranked r JOIN q ON q.s = r.lang JOIN cnt ON cnt.s = r.lang
        |WHERE r.rn <= least(q.quota, cnt.n)
        |ORDER BY r.lang, r.doc_id""".stripMargin,

    // The sample IS the k smallest DISTINCT (hash, value) pairs per
    // group — the sketch aggregate's set semantics — and quantiles are
    // q74's integer-exact lower-rank convention on the sampled values.
    "q89_sampled_quantiles" ->
      s"""WITH h AS (
         |  SELECT lang, n_chars,
         |         (((${oPolyHash("CAST(doc_id AS VARCHAR)")}
         |           % 2147483648) * 2654435761) % 4294967296) AS hv
         |  FROM documents),
         |ds AS (SELECT DISTINCT lang, hv, n_chars FROM h),
         |rk AS (
         |  SELECT lang, hv, n_chars,
         |         row_number() OVER (PARTITION BY lang ORDER BY hv, n_chars) AS rn
         |  FROM ds),
         |sk AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS sample_size,
         |         list(n_chars ORDER BY n_chars) AS vals
         |  FROM rk WHERE rn <= 64 GROUP BY 1),
         |nn AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1)
         |SELECT nn.lang, nn.n, sk.sample_size,
         |       CASE WHEN sample_size > 0
         |            THEN vals[CAST((sample_size * 1 - 1) // 2 + 1 AS INT)] END AS p50,
         |       CASE WHEN sample_size > 0
         |            THEN vals[CAST((sample_size * 9 - 1) // 10 + 1 AS INT)] END AS p90
         |FROM nn JOIN sk USING (lang)
         |ORDER BY nn.lang""".stripMargin,

    // CMS table from the exact counts (sum of cnt into buckets ≡ the
    // engine's count over occurrences); same Carter–Wegman row constants;
    // min over rows with missing-bucket→0 on both sides.
    "q90_cms_token_freq" ->
      s"""WITH tok AS (SELECT unnest($oToks) AS token FROM documents),
         |cnts AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
         |h AS (SELECT token, cnt, ${oPolyHash("token")} AS h0 FROM cnts),
         |rows(j, a, b) AS (VALUES (0, 48271, 11), (1, 69621, 13), (2, 40692, 17)),
         |cms AS (
         |  SELECT r.j AS rj, ((r.a * h.h0 + r.b) % 1000000007) % 256 AS bucket,
         |         CAST(sum(h.cnt) AS BIGINT) AS bcnt
         |  FROM h CROSS JOIN rows r GROUP BY 1, 2),
         |top AS (SELECT token, cnt, h0 FROM h ORDER BY cnt DESC, token LIMIT 20)
         |SELECT t.token, t.cnt AS exact_cnt,
         |       CAST(min(coalesce(c.bcnt, 0)) AS BIGINT) AS est
         |FROM top t CROSS JOIN rows r
         |LEFT JOIN cms c ON c.rj = r.j
         |  AND c.bucket = ((r.a * t.h0 + r.b) % 1000000007) % 256
         |GROUP BY 1, 2
         |ORDER BY exact_cnt DESC, token""".stripMargin,

    // Same gid convention as q73 (GROUPING bit: leftmost dim = MSB, set
    // when the dim is aggregated away) over all 2^2 subsets.
    "q86_cube_stats" ->
      """SELECT lang, source,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_v,
        |       min(n_chars) AS min_v, max(n_chars) AS max_v,
        |       CAST(GROUPING(lang, source) AS BIGINT) AS gid
        |FROM documents GROUP BY CUBE (lang, source)
        |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    "q74_group_quantiles" ->
      """WITH h AS (
        |  SELECT lang, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, v,
        |         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h)
        |SELECT lang, CAST(min(n) AS BIGINT) AS n,
        |       min(CASE WHEN cum * 4 >= n * 1 THEN v END) AS p25,
        |       min(CASE WHEN cum * 4 >= n * 2 THEN v END) AS p50,
        |       min(CASE WHEN cum * 4 >= n * 3 THEN v END) AS p75
        |FROM cum GROUP BY lang ORDER BY lang""".stripMargin,

    // bucket = ceil(cum*k/n) = (cum*k - 1) // n + 1 — integer-exact in
    // both engines.
    "q75_length_buckets" ->
      """WITH h AS (
        |  SELECT lang, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
        |b AS (
        |  SELECT lang, v,
        |         CAST((sum(c) OVER (PARTITION BY lang ORDER BY v) * 10 - 1)
        |              // (sum(c) OVER (PARTITION BY lang)) + 1 AS BIGINT)
        |           AS n_chars_bucket
        |  FROM h)
        |SELECT doc_id, d.lang, n_chars, n_chars_bucket
        |FROM documents d JOIN b ON d.lang = b.lang AND d.n_chars = b.v
        |ORDER BY doc_id""".stripMargin,

    // PQ codes: per (vector, block) argmin-L2 against the first-16
    // codebook, squared distance as an init-free left fold (list_reduce's
    // first-element init equals the kernel's 0.0 + d² start bit-for-bit);
    // ties to the smallest code via (dist, code) ordering.
    "q76_pq_codes" ->
      s"""WITH cb AS (
         |  SELECT b.b AS block, e.vec_id AS code,
         |         e.embedding[b.b*8+1 : b.b*8+8] AS cvec
         |  FROM embeddings e, (SELECT unnest(generate_series(0, 7)) AS b) b
         |  WHERE e.vec_id < 16),
         |d AS (
         |  SELECT v.vec_id, cb.block, cb.code,
         |         list_reduce(list_transform(generate_series(1, 8), i ->
         |           (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))
         |           * (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))),
         |           (a, x) -> a + x) AS dist
         |  FROM embeddings v CROSS JOIN cb),
         |r AS (
         |  SELECT vec_id, block, code,
         |         row_number() OVER (PARTITION BY vec_id, block
         |                            ORDER BY dist, code) AS rn
         |  FROM d)
         |SELECT vec_id, CAST(block AS BIGINT) AS block, code
         |FROM r WHERE rn = 1 ORDER BY vec_id, block""".stripMargin,

    // ADC: per-block distance table for the vec_id=0 query, summed over
    // each vector's codes in block order (list(ORDER BY block) +
    // init-free fold = the Spark aggregate's 0.0-seeded left fold).
    "q77_pq_adc" ->
      s"""WITH cb AS (
         |  SELECT b.b AS block, e.vec_id AS code,
         |         e.embedding[b.b*8+1 : b.b*8+8] AS cvec
         |  FROM embeddings e, (SELECT unnest(generate_series(0, 7)) AS b) b
         |  WHERE e.vec_id < 16),
         |d AS (
         |  SELECT v.vec_id, cb.block, cb.code,
         |         list_reduce(list_transform(generate_series(1, 8), i ->
         |           (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))
         |           * (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))),
         |           (a, x) -> a + x) AS dist
         |  FROM embeddings v CROSS JOIN cb),
         |codes AS (
         |  SELECT vec_id, block, code FROM (
         |    SELECT vec_id, block, code,
         |           row_number() OVER (PARTITION BY vec_id, block
         |                              ORDER BY dist, code) AS rn
         |    FROM d) WHERE rn = 1),
         |dt AS (
         |  SELECT dd.block, dd.code, dd.dist FROM d dd WHERE dd.vec_id = 0),
         |s AS (
         |  SELECT c.vec_id,
         |         list_reduce(list(dt.dist ORDER BY c.block), (a, x) -> a + x)
         |           AS adist
         |  FROM codes c JOIN dt ON dt.block = c.block AND dt.code = c.code
         |  GROUP BY c.vec_id)
         |SELECT vec_id, adist FROM s ORDER BY adist, vec_id LIMIT 100""".stripMargin,

    "q92_bpe_merges" -> oBpe(8),
    "q93_bpe_vocab" -> oBpeVocab(8),
    "q94_bpe_doc_tokens" -> oBpeDocTokens(8),
    "q95_sample_pack_pipeline" -> oSamplePack(8),

    // q77's ADC pipeline verbatim through the shortlist, then the exact
    // (q_i − v_i)² fold (0.0-seeded ≡ list_prepend) over the 100
    // shortlisted vectors only.
    "q91_pq_rerank" ->
      s"""WITH cb AS (
         |  SELECT b.b AS block, e.vec_id AS code,
         |         e.embedding[b.b*8+1 : b.b*8+8] AS cvec
         |  FROM embeddings e, (SELECT unnest(generate_series(0, 7)) AS b) b
         |  WHERE e.vec_id < 16),
         |d AS (
         |  SELECT v.vec_id, cb.block, cb.code,
         |         list_reduce(list_transform(generate_series(1, 8), i ->
         |           (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))
         |           * (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))),
         |           (a, x) -> a + x) AS dist
         |  FROM embeddings v CROSS JOIN cb),
         |codes AS (
         |  SELECT vec_id, block, code FROM (
         |    SELECT vec_id, block, code,
         |           row_number() OVER (PARTITION BY vec_id, block
         |                              ORDER BY dist, code) AS rn
         |    FROM d) WHERE rn = 1),
         |dt AS (
         |  SELECT dd.block, dd.code, dd.dist FROM d dd WHERE dd.vec_id = 0),
         |s AS (
         |  SELECT c.vec_id,
         |         list_reduce(list(dt.dist ORDER BY c.block), (a, x) -> a + x)
         |           AS adist
         |  FROM codes c JOIN dt ON dt.block = c.block AND dt.code = c.code
         |  GROUP BY c.vec_id),
         |short AS (SELECT vec_id, adist FROM s ORDER BY adist, vec_id LIMIT 100),
         |rr AS (
         |  SELECT sh.vec_id, sh.adist,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(generate_series(1, 64), i ->
         |             (CAST(q.embedding[i] AS DOUBLE) - CAST(v.embedding[i] AS DOUBLE))
         |             * (CAST(q.embedding[i] AS DOUBLE) - CAST(v.embedding[i] AS DOUBLE)))),
         |           (a, x) -> a + x) AS dist
         |  FROM short sh
         |  JOIN embeddings v ON v.vec_id = sh.vec_id
         |  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q)
         |SELECT vec_id, adist, dist FROM rr ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    // IVF-PQ: probe = top-5 cells by cosine to the vec_id=0 query (the
    // driver-side selection replicates this arithmetic bit-for-bit),
    // candidates = corpus rows in probed cells, ranked by the same ADC
    // fold as q77.
    "q78_pq_ivf_adc" ->
      s"""WITH $oNorms,
         |$oCells,
         |probe AS (
         |  SELECT cell FROM (
         |    SELECT c.cid AS cell,
         |           row_number() OVER (ORDER BY ${oCos("q", "c")} DESC, c.cid) AS pr
         |    FROM norms q CROSS JOIN centroids c
         |    WHERE q.vec_id = 0)
         |  WHERE pr <= 5),
         |cand AS (
         |  SELECT id, cell FROM cells
         |  WHERE cell IN (SELECT cell FROM probe) AND id <> 0),
         |cb AS (
         |  SELECT b.b AS block, e.vec_id AS code,
         |         e.embedding[b.b*8+1 : b.b*8+8] AS cvec
         |  FROM embeddings e, (SELECT unnest(generate_series(0, 7)) AS b) b
         |  WHERE e.vec_id < 16),
         |d AS (
         |  SELECT v.vec_id, cb.block, cb.code,
         |         list_reduce(list_transform(generate_series(1, 8), i ->
         |           (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))
         |           * (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))),
         |           (a, x) -> a + x) AS dist
         |  FROM embeddings v CROSS JOIN cb
         |  WHERE v.vec_id = 0 OR v.vec_id IN (SELECT id FROM cand)),
         |codes AS (
         |  SELECT vec_id, block, code FROM (
         |    SELECT vec_id, block, code,
         |           row_number() OVER (PARTITION BY vec_id, block
         |                              ORDER BY dist, code) AS rn
         |    FROM d) WHERE rn = 1),
         |dt AS (
         |  SELECT dd.block, dd.code, dd.dist FROM d dd WHERE dd.vec_id = 0),
         |s AS (
         |  SELECT c.vec_id,
         |         list_reduce(list(dt.dist ORDER BY c.block), (a, x) -> a + x)
         |           AS adist
         |  FROM codes c JOIN dt ON dt.block = c.block AND dt.code = c.code
         |  WHERE c.vec_id IN (SELECT id FROM cand)
         |  GROUP BY c.vec_id)
         |SELECT s.vec_id, cand.cell, s.adist
         |FROM s JOIN cand ON cand.id = s.vec_id
         |ORDER BY s.adist, s.vec_id LIMIT 50""".stripMargin,

    // Span excision: q65's repeated-gram/covered-position derivation
    // (string grams stand in for the engine's 64-bit gram hashes —
    // identical repetition structure absent collisions), then excision as
    // a filter-by-index over the token list (DuckDB lambda indexes are
    // 1-based; covered positions 0-based).
    "q79_span_removal" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |grams AS (
         |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
         |      i -> {'pos': i - 1,
         |            'gram': list_aggregate(tk[i:i+2], 'string_agg', ' ')})) AS u
         |    FROM toks)),
         |rep AS (
         |  SELECT gram FROM grams GROUP BY gram
         |  HAVING count(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT doc_id, list(DISTINCT cp) AS cps, count(DISTINCT cp) AS ncov
         |  FROM (
         |    SELECT g.doc_id, unnest(range(g.pos, g.pos + 3)) AS cp
         |    FROM grams g JOIN rep USING (gram))
         |  GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(c.ncov, 0) AS BIGINT) AS n_removed,
         |       coalesce(list_aggregate(
         |         list_filter(t.tk, (x, i) -> NOT list_contains(
         |           coalesce(c.cps, CAST([] AS BIGINT[])), i - 1)),
         |         'string_agg', ' '), '') AS cleaned
         |FROM toks t LEFT JOIN cov c USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    // The contiguous-ordinal contract IS the plain global row_number —
    // the operator exists to compute it without the single-task window.
    "q80_global_ids" ->
      """SELECT doc_id, n_chars,
        |       CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
        |            AS BIGINT) AS gid,
        |       CAST((row_number() OVER (ORDER BY n_chars, doc_id) - 1) // 64
        |            AS BIGINT) AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Quality gate: the q26 quality formula + q42 repetition counts +
    // q43 PII counts, folded into the same rational-threshold bitmask.
    "q81_quality_gate" ->
      s"""WITH $oGateCtes
         |SELECT doc_id, reasons, reasons = 0 AS keep
         |FROM verdict ORDER BY doc_id""".stripMargin,

    // End-to-end corpus pipeline: the q81 gate in front of the q70 wide
    // dedup (signatures computed over KEPT docs only), survivors
    // ordinal-ed and sharded per q80. One recursive-CTE chain — every
    // stage is the already-verified derivation scoped to the previous
    // stage's output.
    "q84_corpus_pipeline" ->
      s"""WITH RECURSIVE $oGateCtes,
         |kept AS (
         |  SELECT d.doc_id, d.lang, d.source, d.n_chars, d.text
         |  FROM documents d JOIN verdict USING (doc_id)
         |  WHERE verdict.reasons = 0),
         |${oSimhashCte("sh31", 31, src = "kept")},
         |${oSimhashCte("sh37", 37, seed = 1, src = "kept")},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |reach(node, comp) AS (
         |  SELECT doc_id, doc_id FROM kept
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS doc_id, min(comp) AS component
         |        FROM reach GROUP BY node),
         |surv AS (
         |  SELECT k.doc_id, k.lang, k.source, k.n_chars
         |  FROM kept k JOIN lab ON lab.doc_id = k.doc_id
         |  WHERE lab.doc_id = lab.component)
         |SELECT doc_id, lang, source, n_chars,
         |       CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
         |            AS BIGINT) AS gid,
         |       CAST((row_number() OVER (ORDER BY n_chars, doc_id) - 1) // 64
         |            AS BIGINT) AS shard
         |FROM surv ORDER BY doc_id""".stripMargin,

    // Hard negatives: q29's scoring with the label-inequality filter
    // before ranking.
    "q82_hard_negatives" ->
      s"""WITH $oNorms,
         |lab AS (
         |  SELECT n.vec_id, n.v, n.nrm, e.label
         |  FROM norms n JOIN embeddings e USING (vec_id)),
         |scored AS (
         |  SELECT q.vec_id AS qid, q.label AS q_label,
         |         c.vec_id AS nid, c.label AS n_label, ${oCos("q", "c")} AS cos
         |  FROM lab q JOIN lab c
         |    ON q.vec_id < 20 AND q.vec_id <> c.vec_id AND q.label <> c.label),
         |ranked AS (
         |  SELECT qid, q_label, nid, n_label, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, q_label, CAST(rank AS BIGINT) AS rank, nid, n_label, cos
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // PQ recall vs the exact baseline: brute CTE from q60, ADC ranks
    // from the q76/q77 derivation with the distance table extended per
    // query (d rows where vec_id < 20 ARE the per-query tables).
    "q85_pq_recall" ->
      s"""WITH $oNorms,
         |bscored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid, ${oCos("q", "c")} AS cos
         |  FROM norms q JOIN norms c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |brute AS (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |    FROM bscored) WHERE rank <= 5),
         |cb AS (
         |  SELECT b.b AS block, e.vec_id AS code,
         |         e.embedding[b.b*8+1 : b.b*8+8] AS cvec
         |  FROM embeddings e, (SELECT unnest(generate_series(0, 7)) AS b) b
         |  WHERE e.vec_id < 16),
         |d AS (
         |  SELECT v.vec_id, cb.block, cb.code,
         |         list_reduce(list_transform(generate_series(1, 8), i ->
         |           (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))
         |           * (CAST(v.embedding[cb.block*8+i] AS DOUBLE) - CAST(cb.cvec[i] AS DOUBLE))),
         |           (a, x) -> a + x) AS dist
         |  FROM embeddings v CROSS JOIN cb),
         |codes AS (
         |  SELECT vec_id, block, code FROM (
         |    SELECT vec_id, block, code,
         |           row_number() OVER (PARTITION BY vec_id, block
         |                              ORDER BY dist, code) AS rn
         |    FROM d) WHERE rn = 1),
         |dt AS (
         |  SELECT vec_id AS qid, block, code, dist FROM d WHERE vec_id < 20),
         |pqs AS (
         |  SELECT dt.qid, c.vec_id AS nid,
         |         list_reduce(list(dt.dist ORDER BY c.block), (a, x) -> a + x)
         |           AS adist
         |  FROM codes c JOIN dt ON dt.block = c.block AND dt.code = c.code
         |  WHERE c.vec_id <> dt.qid
         |  GROUP BY dt.qid, c.vec_id),
         |pq AS (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |           row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
         |    FROM pqs) WHERE rank <= 5)
         |SELECT b.qid, CAST(count(p.nid) AS BIGINT) AS hits,
         |       CAST(count(p.nid) AS DOUBLE) / 5 AS recall_at_5
         |FROM brute b LEFT JOIN pq p ON p.qid = b.qid AND p.nid = b.nid
         |GROUP BY b.qid ORDER BY b.qid""".stripMargin,

    // KMV per rollup level, derived from raw data per level — legal
    // because cascaded bottom-k merges are EXACT, not approximate.
    "q83_rollup_distinct" ->
      s"""WITH h AS (
         |  SELECT lang, source, ${oPolyHash("text")} AS hv FROM documents),
         |agg AS (
         |  SELECT lang, source,
         |         CAST(GROUPING(lang, source) AS BIGINT) AS gid,
         |         list_sort(list(DISTINCT hv))[1:32] AS sk
         |  FROM h GROUP BY ROLLUP (lang, source))
         |SELECT lang, source, gid,
         |       CAST(len(sk) AS BIGINT) AS sk_size,
         |       sk[32] AS h_k,
         |       CASE WHEN len(sk) < 32 THEN CAST(len(sk) AS DOUBLE)
         |            ELSE 31.0 * 1000000007 / sk[32] END AS est
         |FROM agg ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    // q29's cosine fold; the struct-max argmax mirrors as
    // row_number() ORDER BY cos DESC, bid ASC.
    "q123_semantic_decontaminate" ->
      s"""WITH $oNorms,
         |bench AS (
         |  SELECT n.vec_id AS bid, n.v, n.nrm FROM norms n
         |  JOIN embeddings e ON e.vec_id = n.vec_id WHERE e.label = 9),
         |corp AS (
         |  SELECT n.vec_id AS cid, n.v, n.nrm FROM norms n
         |  JOIN embeddings e ON e.vec_id = n.vec_id WHERE e.label != 9),
         |scored AS (
         |  SELECT c.cid, b.bid, ${oCos("c", "b")} AS cos
         |  FROM corp c CROSS JOIN bench b),
         |best AS (
         |  SELECT cid, bid, cos FROM (
         |    SELECT cid, bid, cos, row_number() OVER (PARTITION BY cid
         |      ORDER BY cos DESC, bid) AS rn FROM scored)
         |  WHERE rn = 1)
         |SELECT c.cid AS vec_id, best.bid AS bench_id,
         |       coalesce(best.cos, 0.0) AS cos,
         |       CAST(coalesce(best.cos, 0.0) >= 0.35 AS BIGINT) AS contaminated
         |FROM corp c LEFT JOIN best ON c.cid = best.cid
         |ORDER BY vec_id""".stripMargin,

    // Same cosine fold as q29's oracle; neighborhood means via
    // list(cos ORDER BY rn) + the same left fold; margin and the final
    // argmax mirrored op-for-op.
    "q122_bitext_margin" ->
      s"""WITH $oNorms,
         |srcn AS (
         |  SELECT n.vec_id AS sid, n.v, n.nrm FROM norms n
         |  JOIN embeddings e ON e.vec_id = n.vec_id WHERE e.label = 0),
         |tgtn AS (
         |  SELECT n.vec_id AS tid, n.v, n.nrm FROM norms n
         |  JOIN embeddings e ON e.vec_id = n.vec_id WHERE e.label = 1),
         |scored AS (
         |  SELECT s.sid, t.tid, ${oCos("s", "t")} AS cos
         |  FROM srcn s CROSS JOIN tgtn t),
         |savg AS (
         |  SELECT sid, list_reduce(list_prepend(0.0, l), (x, y) -> x + y)
         |           / len(l) AS s_avg
         |  FROM (SELECT sid, list(cos ORDER BY rn) AS l FROM (
         |          SELECT sid, cos, row_number() OVER (PARTITION BY sid
         |            ORDER BY cos DESC, tid) AS rn FROM scored)
         |        WHERE rn <= 4 GROUP BY sid)),
         |tavg AS (
         |  SELECT tid, list_reduce(list_prepend(0.0, l), (x, y) -> x + y)
         |           / len(l) AS t_avg
         |  FROM (SELECT tid, list(cos ORDER BY rn) AS l FROM (
         |          SELECT tid, cos, row_number() OVER (PARTITION BY tid
         |            ORDER BY cos DESC, sid) AS rn FROM scored)
         |        WHERE rn <= 4 GROUP BY tid)),
         |m AS (
         |  SELECT sc.sid, sc.tid, sc.cos,
         |         sc.cos / ((sa.s_avg + ta.t_avg) / 2.0) AS margin
         |  FROM scored sc JOIN savg sa USING (sid) JOIN tavg ta USING (tid)),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY sid
         |    ORDER BY margin DESC, tid) AS rk FROM m)
         |SELECT sid, tid, cos, margin FROM r
         |WHERE rk = 1 AND margin >= 1.0 ORDER BY sid""".stripMargin,

    // Mirrors UrlOps step-for-step: same regexes (RE2-safe — no
    // lookahead; unmatched optional groups substitute empty in both
    // engines), 'g' flag where Spark's regexp_replace is implicitly
    // global, same PSL-lite label logic via list slicing.
    "q117_url_canon" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    CASE doc_id % 6
        |      WHEN 0 THEN concat('https://News.Example.COM/articles/', doc_id)
        |      WHEN 1 THEN concat('https://blog.example.co.uk:443/post?id=', doc_id, '&utm_source=feed')
        |      WHEN 2 THEN concat('http://shop.example.com:80/item/', doc_id, '#reviews')
        |      WHEN 3 THEN concat('https://example.org/?utm_campaign=x&page=', doc_id)
        |      WHEN 4 THEN concat('http://www.data.example.com.au/set/', doc_id, '/')
        |      ELSE concat('https://CDN.example.net/asset/', doc_id, '?v=1#top')
        |    END AS url
        |  FROM documents),
        |steps AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) ||
        |    regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS s2
        |  FROM synth),
        |ported AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(s2, '^(http://[^/?#]*):80([/?#].*)?$', '\1\2'),
        |      '^(https://[^/?#]*):443([/?#].*)?$', '\1\2') AS s3
        |  FROM steps),
        |cleaned AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(s3, '&utm_[^&#]*', '', 'g'),
        |          '\?utm_[^&#]*&', '?'),
        |        '\?utm_[^&#]*$', ''),
        |      '/+$', '') AS url_norm,
        |    lower(regexp_extract(s3, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host
        |  FROM ported),
        |bare AS (
        |  SELECT doc_id, url_norm, host,
        |         regexp_replace(host, ':[0-9]+$', '') AS h FROM cleaned),
        |dom AS (
        |  SELECT doc_id, url_norm, host,
        |    CASE WHEN len(string_split(h, '.')) <= 2 THEN h
        |         WHEN array_to_string(string_split(h, '.')[-2:], '.') IN
        |              ('co.uk','org.uk','ac.uk','gov.uk','co.jp','ne.jp','or.jp',
        |               'com.au','net.au','org.au','com.br','com.cn','com.mx',
        |               'co.in','co.nz','co.za')
        |         THEN array_to_string(string_split(h, '.')[-3:], '.')
        |         ELSE array_to_string(string_split(h, '.')[-2:], '.') END AS domain
        |  FROM bare)
        |SELECT doc_id, url_norm, host, domain,
        |       CAST(count(*) OVER (PARTITION BY domain) AS BIGINT) AS n_domain
        |FROM dom ORDER BY doc_id""".stripMargin,

    "q116_boilerplate" ->
      """WITH docs AS (
        |  SELECT doc_id, replace(text, ' ', chr(10)) AS text FROM documents),
        |lines AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, chr(10))) AS line,
        |         unnest(range(len(string_split(text, chr(10))))) AS pos
        |  FROM docs),
        |nn AS (SELECT count(*) AS ndocs FROM docs),
        |boiler AS (
        |  SELECT line FROM lines CROSS JOIN nn
        |  GROUP BY line, ndocs
        |  HAVING count(DISTINCT doc_id) * 5 >= ndocs * 2),
        |kept AS (SELECT l.* FROM lines l ANTI JOIN boiler b USING (line)),
        |rebuilt AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         string_agg(line, chr(10) ORDER BY pos) AS text_clean
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
        |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        |       coalesce(r.text_clean, '') AS text_clean
        |FROM docs d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // The recount IS the oracle: plain GROUP BY ... HAVING share. The
    // engine's sketch pass only proposes candidates; the guarantee
    // (threshold 1/200 > 1/(k+1) = 1/256) makes both sides exact.
    "q115_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($oToks) AS token FROM documents),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
         |SELECT token AS item, CAST(count(*) AS BIGINT) AS cnt, nn.n
         |FROM tok CROSS JOIN nn
         |GROUP BY 1, nn.n
         |HAVING count(*) * 200 >= nn.n * 1
         |ORDER BY cnt DESC, item""".stripMargin,

    // Same gid convention as q73/q86 (GROUPING bits, leftmost dim = MSB)
    // over exactly the two requested marginals.
    "q114_grouping_sets" ->
      """SELECT lang, source,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_v,
        |       min(n_chars) AS min_v, max(n_chars) AS max_v,
        |       CAST(GROUPING(lang, source) AS BIGINT) AS gid
        |FROM documents GROUP BY GROUPING SETS ((lang), (source))
        |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    // RRF: dense arm = q29's cosine CTEs at k=10; lexical arm =
    // distinct-token overlap at k=10; fused score mirrors the engine's
    // fixed fold (0.0 + dense term + lexical term — each one
    // exactly-rounded division, so doubles match bit-for-bit).
    "q136_rrf_fusion" ->
      s"""WITH $oRrfCtes
         |SELECT * FROM (
         |  SELECT qid,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY score DESC, nid) AS BIGINT) AS rank,
         |         nid, score, r_dense, r_lex
         |  FROM fused)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // Retrieve-then-rerank: the q136 fusion CTEs cut at 8, re-scored by
    // the exact cosine fold (zero-norm candidates drop), final top-5.
    "q145_retrieve_rerank" ->
      s"""WITH $oRrfCtes,
         |fr AS (
         |  SELECT * FROM (
         |    SELECT qid, nid,
         |           row_number() OVER (PARTITION BY qid
         |             ORDER BY score DESC, nid) AS frank
         |    FROM fused) WHERE frank <= 8),
         |rr AS (
         |  SELECT f.qid, f.nid, ${oCos("q", "c")} AS cos
         |  FROM fr f
         |  JOIN norms q ON q.vec_id = f.qid
         |  JOIN norms c ON c.vec_id = f.nid
         |  WHERE q.nrm * c.nrm <> 0)
         |SELECT * FROM (
         |  SELECT qid,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY cos DESC, nid) AS BIGINT) AS rank,
         |         nid, cos
         |  FROM rr)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // k-anonymity: plain GROUP BY over the QI tuple; flags compare the
    // exact integer counts against k=5 / l=3.
    "q137_k_anonymity" ->
      """SELECT lang, n_chars // 200 AS len_bucket,
        |       CAST(count(*) AS BIGINT) AS group_size,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sensitive,
        |       count(*) >= 5 AS k_anonymous,
        |       count(DISTINCT source) >= 3 AS l_diverse
        |FROM documents GROUP BY 1, 2
        |ORDER BY lang, len_bucket""".stripMargin,

    // Priority sampling: the engine's exact arithmetic — priority =
    // (w·2^32)/(h+1) with h the Knuth 32-bit mix, τ = the 41st
    // priority (0 when absent), est = max(w, τ).
    "q138_priority_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |         CAST(n_chars AS DOUBLE) * 4294967296 /
        |           CAST((((doc_id % 2147483648) * 2654435761) % 4294967296) + 1 AS DOUBLE) AS priority
        |  FROM documents WHERE n_chars > 0),
        |rk AS (
        |  SELECT doc_id, n_chars, priority,
        |         row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
        |  FROM h),
        |tau AS (
        |  SELECT coalesce(min(priority), 0.0) AS tau FROM rk WHERE rn = 41)
        |SELECT doc_id, n_chars, CAST(rn AS BIGINT) AS rank, priority,
        |       greatest(CAST(n_chars AS DOUBLE), tau.tau) AS est_weight
        |FROM rk CROSS JOIN tau
        |WHERE rn <= 40 ORDER BY rank""".stripMargin,

    // Compaction: bin = (cumsum − size) // target per source in doc_id
    // order; totals re-aggregated per (source, bin).
    "q139_compaction_plan" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents),
        |b AS (
        |  SELECT source, doc_id, n_chars,
        |         CAST(cum - n_chars AS BIGINT) // 4000 AS bin
        |  FROM c),
        |p AS (
        |  SELECT source, bin, doc_id, n_chars,
        |         CAST(row_number() OVER (PARTITION BY source, bin
        |           ORDER BY doc_id) AS BIGINT) AS bin_pos
        |  FROM b),
        |t AS (
        |  SELECT source, bin, CAST(sum(n_chars) AS BIGINT) AS bin_chars,
        |         CAST(count(*) AS BIGINT) AS bin_docs
        |  FROM b GROUP BY 1, 2)
        |SELECT p.source, p.bin, p.bin_pos, p.doc_id, p.n_chars,
        |       t.bin_chars, t.bin_docs
        |FROM p JOIN t USING (source, bin)
        |ORDER BY p.source, p.bin, p.bin_pos""".stripMargin,

    // Drift: per-bin conditional counts, HUGEINT (=DECIMAL(38,0))
    // cross products for the exact TVD numerator. Round 10: the gate
    // surface is exact-integer only — 2^30 fixed-point shares via `//`
    // (floor; operands non-negative, matching Spark DIV) and the
    // HUGEINT numerator/denominator as VARCHAR — no double or
    // decimal128 column remains for an environment's hash to bend.
    "q140_drift_audit" ->
      """WITH hist AS (
        |  SELECT lang,
        |         CAST(count(*) FILTER (WHERE doc_id < 250) AS BIGINT) AS n_ref,
        |         CAST(count(*) FILTER (WHERE doc_id >= 250) AS BIGINT) AS n_batch
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_ref) AS BIGINT) AS n,
        |         CAST(sum(n_batch) AS BIGINT) AS m FROM hist),
        |pb AS (
        |  SELECT h.lang, h.n_ref, h.n_batch, t.n, t.m,
        |         abs(CAST(h.n_ref AS HUGEINT) * t.m -
        |             CAST(h.n_batch AS HUGEINT) * t.n) AS tvd_num
        |  FROM hist h CROSS JOIN tot t),
        |tv AS (SELECT CAST(sum(tvd_num) AS HUGEINT) AS num_total FROM pb)
        |SELECT pb.lang, pb.n_ref, pb.n_batch,
        |       CASE WHEN pb.n > 0 THEN
        |         CAST((pb.n_ref * 1073741824) // pb.n AS BIGINT)
        |       END AS share_ref_q30,
        |       CASE WHEN pb.m > 0 THEN
        |         CAST((pb.n_batch * 1073741824) // pb.m AS BIGINT)
        |       END AS share_batch_q30,
        |       CAST(pb.tvd_num AS VARCHAR) AS tvd_num_str,
        |       CAST(tv.num_total AS VARCHAR) AS tvd_num_total_str,
        |       CAST(CAST(2 AS HUGEINT) * pb.n * pb.m AS VARCHAR)
        |         AS tvd_den_str
        |FROM pb CROSS JOIN tv
        |ORDER BY pb.lang""".stripMargin,

    // Canonicalization: utf8proc NFC (stability-policy-identical to the
    // JDK tables), then the same two RE2 passes and trim; the dirty
    // prefix is rebuilt from chr() codepoints so both engines see
    // byte-identical input.
    "q141_canonical_text" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |         'Cafe' || chr(769) || chr(8203) || '  du' || chr(9) ||
        |         'monde ' || chr(11) || ' zw' || chr(8205) || 'j: ' || text AS raw
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, raw,
        |         trim(regexp_replace(regexp_replace(nfc_normalize(raw),
        |           '[ \t\n\r\f\x0B]+', ' ', 'g'),
        |           '[\p{Cc}\p{Cf}]', '', 'g')) AS canon
        |  FROM raw)
        |SELECT doc_id, canon, raw <> canon AS changed
        |FROM c ORDER BY doc_id""".stripMargin,

    // Majority vote: fixed-order CASE tallies over the three LF votes.
    "q142_weak_labels" ->
      s"""WITH $oWeakLfs,
         |v AS (
         |  SELECT doc_id, lf_len, lf_the, lf_div,
         |         CAST((CASE WHEN lf_len = 1 THEN 1 ELSE 0 END) +
         |              (CASE WHEN lf_the = 1 THEN 1 ELSE 0 END) +
         |              (CASE WHEN lf_div = 1 THEN 1 ELSE 0 END) AS BIGINT) AS votes_pos,
         |         CAST((CASE WHEN lf_len = 0 THEN 1 ELSE 0 END) +
         |              (CASE WHEN lf_the = 0 THEN 1 ELSE 0 END) +
         |              (CASE WHEN lf_div = 0 THEN 1 ELSE 0 END) AS BIGINT) AS votes_neg
         |  FROM lf)
         |SELECT doc_id, lf_len, lf_the, lf_div, votes_pos, votes_neg,
         |       CASE WHEN votes_pos > votes_neg THEN 1
         |            WHEN votes_neg > votes_pos THEN 0 END AS label,
         |       (votes_pos = 0 OR votes_neg = 0) AND votes_pos + votes_neg > 0 AS unanimous
         |FROM v ORDER BY doc_id""".stripMargin,

    // LF audit: unpivot the votes, join each back to the consensus.
    "q143_lf_stats" ->
      s"""WITH $oWeakLfs,
         |v AS (
         |  SELECT doc_id, lf_len, lf_the, lf_div,
         |         (CASE WHEN lf_len = 1 THEN 1 ELSE 0 END) +
         |         (CASE WHEN lf_the = 1 THEN 1 ELSE 0 END) +
         |         (CASE WHEN lf_div = 1 THEN 1 ELSE 0 END) AS vp,
         |         (CASE WHEN lf_len = 0 THEN 1 ELSE 0 END) +
         |         (CASE WHEN lf_the = 0 THEN 1 ELSE 0 END) +
         |         (CASE WHEN lf_div = 0 THEN 1 ELSE 0 END) AS vn
         |  FROM lf),
         |lab AS (
         |  SELECT doc_id, lf_len, lf_the, lf_div,
         |         CASE WHEN vp > vn THEN 1 WHEN vn > vp THEN 0 END AS label
         |  FROM v),
         |up AS (
         |  SELECT 'lf_len' AS lf, lf_len AS vote, label FROM lab
         |  UNION ALL
         |  SELECT 'lf_the' AS lf, lf_the AS vote, label FROM lab
         |  UNION ALL
         |  SELECT 'lf_div' AS lf, lf_div AS vote, label FROM lab)
         |SELECT lf, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(count(vote) AS BIGINT) AS coverage,
         |       CAST(count(*) FILTER (WHERE vote = label) AS BIGINT) AS agree,
         |       CAST(count(*) FILTER (WHERE vote IS NOT NULL AND label IS NOT NULL
         |                               AND vote <> label) AS BIGINT) AS conflict,
         |       CAST(count(*) FILTER (WHERE vote IS NOT NULL AND label IS NULL)
         |            AS BIGINT) AS no_consensus
         |FROM up GROUP BY lf ORDER BY lf""".stripMargin,

    // Survivorship: per-cluster counts + deterministic mode joins.
    "q144_golden_record" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, source, n_chars,
         |         ${oPolyHash("array_to_string(list_slice(" + oToks + ", 1, 2), ' ')")} AS ckey
         |  FROM documents),
         |base AS (
         |  SELECT ckey, CAST(count(*) AS BIGINT) AS n_members,
         |         min(doc_id) AS rep_id, max(n_chars) AS n_chars
         |  FROM h GROUP BY 1),
         |lc AS (SELECT ckey, lang, count(*) AS cnt FROM h
         |       WHERE lang IS NOT NULL GROUP BY 1, 2),
         |lb AS (SELECT ckey, max(cnt) AS best FROM lc GROUP BY 1),
         |lw AS (SELECT lc.ckey, min(lc.lang) AS lang FROM lc
         |       JOIN lb ON lc.ckey = lb.ckey AND lc.cnt = lb.best GROUP BY 1),
         |sc AS (SELECT ckey, source, count(*) AS cnt FROM h
         |       WHERE source IS NOT NULL GROUP BY 1, 2),
         |sb AS (SELECT ckey, max(cnt) AS best FROM sc GROUP BY 1),
         |sw AS (SELECT sc.ckey, min(sc.source) AS source FROM sc
         |       JOIN sb ON sc.ckey = sb.ckey AND sc.cnt = sb.best GROUP BY 1)
         |SELECT b.ckey, b.n_members, b.rep_id, b.n_chars, lw.lang, sw.source
         |FROM base b LEFT JOIN lw USING (ckey) LEFT JOIN sw USING (ckey)
         |ORDER BY b.rep_id""".stripMargin,

    // Datasheet: one aggregate over one scan-side projection; the dup
    // counter dedups on the polyHash fingerprint exactly as the engine.
    "q146_datasheet" ->
      s"""WITH d AS (
         |  SELECT lang, source, n_chars,
         |         CAST(len($oToks) AS BIGINT) AS ntok,
         |         ${oPolyHash("text")} AS fp,
         |         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
         |         len(regexp_extract_all(text, '([0-9]{1,3}\\.){3}[0-9]{1,3}')) > 0 AS pii
         |  FROM documents)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |       CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS exact_dup_docs,
         |       CAST(count(*) FILTER (WHERE n_chars < 120) AS BIGINT) AS short_docs,
         |       CAST(count(*) FILTER (WHERE pii) AS BIGINT) AS pii_docs,
         |       CASE WHEN count(*) > 0 THEN
         |         CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |       END AS mean_chars
         |FROM d""".stripMargin,

    // LOO ablation: per-source gate-pass sums off the q81 verdict CTEs,
    // closed-form means; delta recomputes the same two divisions and
    // subtracts (identical operands → identical double bits).
    "q147_source_ablation" ->
      s"""WITH $oGateCtes,
         |per AS (
         |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(sum(CASE WHEN v.reasons = 0 THEN 1 ELSE 0 END) AS BIGINT) AS metric_sum
         |  FROM verdict v JOIN documents d USING (doc_id) GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(n_rows) AS BIGINT) AS n,
         |         CAST(sum(metric_sum) AS BIGINT) AS s FROM per)
         |SELECT p.source, p.n_rows, p.metric_sum,
         |       CAST(p.metric_sum AS DOUBLE) / CAST(p.n_rows AS DOUBLE) AS mean_in,
         |       CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) AS mean_overall,
         |       CASE WHEN t.n > p.n_rows THEN
         |         CAST(t.s - p.metric_sum AS DOUBLE) /
         |         CAST(t.n - p.n_rows AS DOUBLE) END AS mean_without,
         |       CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) -
         |         (CASE WHEN t.n > p.n_rows THEN
         |            CAST(t.s - p.metric_sum AS DOUBLE) /
         |            CAST(t.n - p.n_rows AS DOUBLE) END) AS delta
         |FROM per p CROSS JOIN tot t ORDER BY p.source""".stripMargin,

    // Curriculum: q87's familiarity CTEs → floor(×100) integer key →
    // q75's histogram-cumsum bucket rule (k=4, single group) → q35's
    // Knuth-bucket 25% pick.
    "q148_curriculum_sample" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $oToks AS tk FROM documents),
         |dg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS gram
         |  FROM toks),
         |cc AS (SELECT gram, count(*) AS cnt FROM dg GROUP BY 1),
         |st AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |         CAST(sum(cnt) AS BIGINT) AS sum_freq
         |  FROM dg JOIN cc USING (gram) GROUP BY 1),
         |fam AS (
         |  SELECT doc_id,
         |         CAST(sum_freq AS DOUBLE) / n_grams AS familiarity,
         |         CAST(floor((CAST(sum_freq AS DOUBLE) / n_grams) * 100)
         |              AS BIGINT) AS fam_centi
         |  FROM st WHERE n_grams > 0),
         |hb AS (SELECT fam_centi AS v, count(*) AS c FROM fam GROUP BY 1),
         |b AS (
         |  SELECT v,
         |         CAST((sum(c) OVER (ORDER BY v) * 4 - 1)
         |              // (sum(c) OVER ()) + 1 AS BIGINT) AS bucket
         |  FROM hb)
         |SELECT f.doc_id, f.familiarity, f.fam_centi, b.bucket
         |FROM fam f JOIN b ON f.fam_centi = b.v
         |WHERE (((f.doc_id % 2147483648) * 2654435761) % 4294967296) % 100 < 25
         |ORDER BY f.doc_id""".stripMargin,

    // Readability: the same three counts and the same fixed-order FK
    // arithmetic ((0.39·w/s + 11.8·syl/w) − 15.59).
    "q149_readability" ->
      s"""SELECT doc_id,
         |       CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
         |            s -> len(trim(s)) > 0)) AS BIGINT) AS n_sentences,
         |       CAST(len($oToks) AS BIGINT) AS n_words,
         |       CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syllables,
         |       CASE WHEN len(list_filter(string_split_regex(text, '[.!?]+'),
         |                    s -> len(trim(s)) > 0)) > 0
         |                 AND len($oToks) > 0 THEN
         |         0.39 * (CAST(len($oToks) AS DOUBLE) /
         |                 CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
         |                      s -> len(trim(s)) > 0)) AS DOUBLE)) +
         |         11.8 * (CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS DOUBLE) /
         |                 CAST(len($oToks) AS DOUBLE)) -
         |         15.59
         |       END AS fk_grade
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Triplets: q31's pair CTEs as positives; reps = per-bucket top-2 by
    // (Knuth hash, id); negative = first non-colliding rep.
    "q150_triplets" ->
      s"""WITH $oNorms,
         |$oCells,
         |p AS (
         |  SELECT a.id AS anchor, b.id AS positive
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.id < b.id
         |  JOIN norms na ON na.vec_id = a.id
         |  JOIN norms nb ON nb.vec_id = b.id
         |  WHERE ${oCos("na", "nb")} >= 0.3),
         |rep AS (
         |  SELECT vec_id,
         |         (((vec_id % 2147483648) * 2654435761) % 4294967296) % 64 AS b,
         |         (((vec_id % 2147483648) * 2654435761) % 4294967296) % 1000000 AS h
         |  FROM embeddings),
         |rk AS (
         |  SELECT b, vec_id,
         |         row_number() OVER (PARTITION BY b ORDER BY h, vec_id) AS rk
         |  FROM rep),
         |r1 AS (SELECT b, vec_id AS r1 FROM rk WHERE rk = 1),
         |r2 AS (SELECT b, vec_id AS r2 FROM rk WHERE rk = 2),
         |t AS (
         |  SELECT p.anchor, p.positive,
         |         CASE WHEN r1.r1 <> p.anchor AND r1.r1 <> p.positive THEN r1.r1
         |              WHEN r2.r2 <> p.anchor AND r2.r2 <> p.positive THEN r2.r2
         |         END AS negative
         |  FROM p
         |  LEFT JOIN r1 ON r1.b = (((p.anchor % 2147483648) * 2654435761) % 4294967296) % 64
         |  LEFT JOIN r2 ON r2.b = (((p.anchor % 2147483648) * 2654435761) % 4294967296) % 64)
         |SELECT anchor, positive, negative FROM t
         |WHERE negative IS NOT NULL
         |ORDER BY anchor, positive""".stripMargin,

    // KNN-Shapley: q29's cosine fold ranks train per test; δ_j with
    // 10⁹ div max(j,K) fixed-point reciprocals; s_j = suffix window sum
    // (BIGINT, order-free); mean over the 10 test points.
    "q151_knn_shapley" ->
      s"""WITH $oNorms,
         |lab AS (
         |  SELECT n.vec_id, n.v, n.nrm, e.label
         |  FROM norms n JOIN embeddings e USING (vec_id)),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |         ${oCos("q", "c")} AS cos,
         |         CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS ind
         |  FROM lab q JOIN lab c ON q.vec_id < 10 AND c.vec_id >= 10),
         |ranked AS (
         |  SELECT qid, nid, ind,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS r
         |  FROM scored),
         |deltas AS (
         |  SELECT qid, nid, r,
         |         (ind - coalesce(lead(ind) OVER (PARTITION BY qid ORDER BY r), 0)) *
         |           (1000000000 // greatest(r, 5)) AS d
         |  FROM ranked),
         |sfx AS (
         |  SELECT qid, nid,
         |         sum(d) OVER (PARTITION BY qid ORDER BY r DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
         |  FROM deltas)
         |SELECT nid AS vec_id, CAST(count(*) AS BIGINT) AS n_tests,
         |       CAST(sum(s) AS BIGINT) AS shap_num,
         |       CAST(sum(s) AS DOUBLE) /
         |         CAST(count(*) * 1000000000 AS DOUBLE) AS shapley
         |FROM sfx GROUP BY 1 ORDER BY 1""".stripMargin,

    // Gap-fill: generate_series calendar per user span, LEFT JOIN the
    // daily max, last_value IGNORE NULLS carry + staleness age.
    "q152_gapfill_locf" ->
      """WITH daily AS (
        |  SELECT user_id,
        |         DATE '1970-01-01' +
        |           CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INTEGER) AS day,
        |         max(value) AS v
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS lo, max(day) AS hi
        |         FROM daily GROUP BY 1),
        |cal AS (
        |  SELECT user_id, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |j AS (
        |  SELECT c.user_id, c.day, d.v
        |  FROM cal c LEFT JOIN daily d
        |    ON c.user_id = d.user_id AND c.day = d.day)
        |SELECT user_id, day, v,
        |       last_value(v IGNORE NULLS) OVER w AS v_filled,
        |       CAST(day - last_value(CASE WHEN v IS NOT NULL THEN day END
        |         IGNORE NULLS) OVER w AS BIGINT) AS days_since_obs
        |FROM j
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,

    // Chi-squared: exact BIGINT 2×2 cells per token (presence, df >= 5),
    // the same left-assoc double tail, top-25 by (chi2 DESC, token).
    "q153_chi2_tokens" ->
      s"""WITH lab AS (
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |         list_distinct($oToks) AS tk
         |  FROM documents),
         |tot AS (SELECT CAST(sum(y) AS BIGINT) AS n1,
         |               CAST(sum(1 - y) AS BIGINT) AS n0 FROM lab),
         |cells AS (
         |  SELECT token, CAST(sum(y) AS BIGINT) AS n11,
         |         CAST(sum(1 - y) AS BIGINT) AS n01
         |  FROM (SELECT y, unnest(tk) AS token FROM lab)
         |  GROUP BY 1 HAVING CAST(sum(y) AS BIGINT) + CAST(sum(1 - y) AS BIGINT) >= 5),
         |f AS (
         |  SELECT token, n11, n1 - n11 AS n10, n01, n0 - n01 AS n00,
         |         n1 + n0 AS nn
         |  FROM cells CROSS JOIN tot)
         |SELECT token, n11, n10, n01, n00,
         |       CAST(nn AS DOUBLE) * CAST(n11 * n00 - n10 * n01 AS DOUBLE) *
         |         CAST(n11 * n00 - n10 * n01 AS DOUBLE) /
         |         (CAST(n11 + n01 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE) *
         |          CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE)) AS chi2
         |FROM f
         |WHERE CAST(n11 + n01 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE) *
         |      CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE) <> 0
         |ORDER BY chi2 DESC, token LIMIT 25""".stripMargin,

    // Zone-map manifest: month-shard stats of the order date.
    "q154_shard_stats" ->
      """SELECT year(o_orderdate) * 12 + month(o_orderdate) AS shard,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_null,
        |       min(CAST(o_orderdate AS DATE)) AS min_v,
        |       max(CAST(o_orderdate AS DATE)) AS max_v,
        |       CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS ndv
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // Prune simulation: shards whose [min,max] misses 1995-03 are
    // skipped; one summary row.
    "q155_prune_sim" ->
      """WITH st AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS shard,
        |         CAST(count(*) AS BIGINT) AS n_rows,
        |         min(CAST(o_orderdate AS DATE)) AS min_v,
        |         max(CAST(o_orderdate AS DATE)) AS max_v
        |  FROM orders GROUP BY 1),
        |v AS (
        |  SELECT n_rows,
        |         CASE WHEN max_v < DATE '1995-03-01' OR min_v > DATE '1995-03-31'
        |                   OR min_v IS NULL THEN 1 ELSE 0 END AS pruned
        |  FROM st)
        |SELECT CAST(count(*) AS BIGINT) AS n_shards,
        |       CAST(sum(pruned) AS BIGINT) AS n_pruned,
        |       CAST(count(*) - sum(pruned) AS BIGINT) AS n_scanned,
        |       CAST(sum(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END) AS BIGINT)
        |         AS rows_skipped,
        |       CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |       CAST(sum(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(n_rows) AS DOUBLE) AS skip_ratio
        |FROM v""".stripMargin,

    // Incremental agg ≡ recompute over base ∖ deletes ∪ inserts.
    "q156_incr_agg" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS sv
        |FROM orders
        |WHERE (o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0)
        |   OR o_orderkey % 7 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // MRR: q29's top-10 CTEs + labels; first same-label rank per query,
    // 10⁹ div r fixed point, no-hit queries contribute 0.
    "q157_mrr" ->
      s"""WITH $oNorms,
         |lab AS (
         |  SELECT n.vec_id, n.v, n.nrm, e.label
         |  FROM norms n JOIN embeddings e USING (vec_id)),
         |scored AS (
         |  SELECT q.vec_id AS qid, q.label AS ql, c.vec_id AS nid,
         |         c.label AS nl, ${oCos("q", "c")} AS cos
         |  FROM lab q JOIN lab c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, ql, nl,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored),
         |firsts AS (
         |  SELECT qid, min(CASE WHEN ql = nl THEN rank END) AS f
         |  FROM ranked WHERE rank <= 10 GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(coalesce(1000000000 // f, 0)) AS BIGINT) AS mrr_num,
         |       CAST(sum(coalesce(1000000000 // f, 0)) AS DOUBLE) /
         |         CAST(count(*) * 1000000000 AS DOUBLE) AS mrr
         |FROM firsts""".stripMargin,

    // Per-dimension stats: floor(v·2²⁰)/floor(v²·2²⁰) exact BIGINT sums,
    // the same mirrored double tail as the engine.
    "q158_embed_dim_stats" ->
      """WITH ev AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |px AS (
        |  SELECT t.i AS dim, v[t.i + 1] AS x FROM ev, range(64) t(i)),
        |fx AS (
        |  SELECT dim, CAST(floor(x * 1048576) AS BIGINT) AS f,
        |         CAST(floor(x * x * 1048576) AS BIGINT) AS f2
        |  FROM px),
        |agg AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(f) AS BIGINT) AS sum_fixed,
        |         CAST(sum(f2) AS BIGINT) AS sumsq_fixed
        |  FROM fx GROUP BY 1)
        |SELECT dim, n, sum_fixed, sumsq_fixed,
        |       CAST(sum_fixed AS DOUBLE) / CAST(n * 1048576 AS DOUBLE) AS mean,
        |       greatest(0.0,
        |         (CAST(n AS DOUBLE) * CAST(sumsq_fixed AS DOUBLE) -
        |          CAST(sum_fixed AS DOUBLE) * CAST(sum_fixed AS DOUBLE) / 1048576) /
        |         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1048576)) AS variance,
        |       sqrt(greatest(0.0,
        |         (CAST(n AS DOUBLE) * CAST(sumsq_fixed AS DOUBLE) -
        |          CAST(sum_fixed AS DOUBLE) * CAST(sum_fixed AS DOUBLE) / 1048576) /
        |         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1048576))) AS std
        |FROM agg ORDER BY dim""".stripMargin,

    // Kappa: q27's pred CTE → contingency cells → rational closed form.
    "q159_kappa" ->
      s"""WITH scores AS (
         |  SELECT lang,
         |         CAST(len(list_filter($oToks, t -> list_contains(['the','and','of','to','in','is'], t))) AS BIGINT) AS s_en,
         |         CAST(len(list_filter($oToks, t -> list_contains(['der','die','und','das','ist','nicht'], t))) AS BIGINT) AS s_de,
         |         CAST(len(list_filter($oToks, t -> list_contains(['el','la','los','que','una','por'], t))) AS BIGINT) AS s_es,
         |         CAST(len(list_filter($oToks, t -> list_contains(['le','les','des','est','une','dans'], t))) AS BIGINT) AS s_fr
         |  FROM documents),
         |pred AS (
         |  SELECT lang,
         |         CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |              WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |              WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |              WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
         |              ELSE 'und' END AS predicted
         |  FROM scores),
         |cells AS (
         |  SELECT predicted AS a, lang AS b, CAST(count(*) AS BIGINT) AS c
         |  FROM pred WHERE predicted IS NOT NULL AND lang IS NOT NULL
         |  GROUP BY 1, 2),
         |rs AS (SELECT a AS k, CAST(sum(c) AS BIGINT) AS ra FROM cells GROUP BY 1),
         |cs AS (SELECT b AS k, CAST(sum(c) AS BIGINT) AS rb FROM cells GROUP BY 1),
         |e AS (
         |  SELECT coalesce(CAST(sum(ra * rb) AS BIGINT), 0) AS expected_num
         |  FROM rs JOIN cs USING (k)),
         |a AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n,
         |         coalesce(CAST(sum(CASE WHEN a = b THEN c END) AS BIGINT), 0) AS agree
         |  FROM cells)
         |SELECT n, agree, expected_num,
         |       CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |       CASE WHEN n * n <> expected_num THEN
         |         CAST(n * agree - expected_num AS DOUBLE) /
         |         CAST(n * n - expected_num AS DOUBLE) END AS kappa
         |FROM a CROSS JOIN e""".stripMargin,

    // Skip-gram: positional tokens via range lateral, ±2 band, both
    // directions, count floor, deterministic top-50.
    "q160_skipgram" ->
      s"""WITH toksl AS (SELECT doc_id, $oToks AS tk FROM documents),
         |toku AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
         |    i -> struct_pack(pos := i, w := tk[i]))) AS s
         |  FROM toksl),
         |tok AS (SELECT doc_id, s.pos AS pos, s.w AS w FROM toku),
         |fwd AS (
         |  SELECT a.w AS lw, b.w AS rw
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id
         |    AND b.pos > a.pos AND b.pos <= a.pos + 2),
         |dir AS (
         |  SELECT lw AS center, rw AS context FROM fwd
         |  UNION ALL
         |  SELECT rw AS center, lw AS context FROM fwd)
         |SELECT center, context, CAST(count(*) AS BIGINT) AS cnt
         |FROM dir GROUP BY 1, 2 HAVING count(*) >= 5
         |ORDER BY cnt DESC, center, context LIMIT 50""".stripMargin,

    // Pearson from exact BIGINT sufficient stats, mirrored closed form.
    "q161_corr" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
        |         CAST(floor(l_extendedprice / 1000 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |st AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM v GROUP BY 1)
        |SELECT l_returnflag, n,
        |       CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
        |         CAST(n * sxy - sx * sy AS DOUBLE) /
        |         sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |              CAST(n * syy - sy * sy AS DOUBLE)) END AS corr
        |FROM st ORDER BY l_returnflag""".stripMargin,

    // Spearman: histogram-cumsum doubled average ranks (2·cum − cnt + 1)
    // joined back per value, then the q161 closed form over ranks.
    "q162_spearman" ->
      """WITH base AS (
        |  SELECT l_returnflag AS g,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
        |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE (((l_orderkey % 2147483648) * 2654435761) % 4294967296) % 100 < 5
        |    AND l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |hx AS (
        |  SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
        |rx AS (
        |  SELECT g, x,
        |         2 * sum(c) OVER (PARTITION BY g ORDER BY x) - c + 1 AS rx
        |  FROM hx),
        |hy AS (
        |  SELECT g, y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
        |ry AS (
        |  SELECT g, y,
        |         2 * sum(c) OVER (PARTITION BY g ORDER BY y) - c + 1 AS ry
        |  FROM hy),
        |rk AS (
        |  SELECT b.g, CAST(rx.rx AS BIGINT) AS x, CAST(ry.ry AS BIGINT) AS y
        |  FROM base b JOIN rx ON b.g = rx.g AND b.x = rx.x
        |              JOIN ry ON b.g = ry.g AND b.y = ry.y),
        |st AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM rk GROUP BY 1)
        |SELECT g AS l_returnflag, n,
        |       CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
        |         CAST(n * sxy - sx * sy AS DOUBLE) /
        |         sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |              CAST(n * syy - sy * sy AS DOUBLE)) END AS spearman
        |FROM st ORDER BY l_returnflag""".stripMargin,

    // Quantile normalization: per-source histograms + doubled mid-ranks,
    // reference lookup by cross-multiplied cumulative shares, min
    // qualifying reference value.
    "q163_quantile_norm" ->
      """WITH base AS (
        |  SELECT source, n_chars AS v FROM documents WHERE n_chars IS NOT NULL),
        |hist AS (
        |  SELECT source, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM base GROUP BY 1, 2),
        |ranked AS (
        |  SELECT source, v, cnt,
        |         CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v)
        |           AS BIGINT) AS cum
        |  FROM hist),
        |r2 AS (
        |  SELECT source, v, cnt, cum,
        |         CAST(2 * cum - cnt + 1 AS BIGINT) AS rank2 FROM ranked),
        |tot AS (
        |  SELECT source, CAST(max(cum) AS BIGINT) AS n_src
        |  FROM ranked GROUP BY 1),
        |rh AS (
        |  SELECT v AS rv, CAST(2 * cum AS BIGINT) AS rcum2
        |  FROM ranked WHERE source = 'src0'),
        |rt AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_ref
        |  FROM base WHERE source = 'src0')
        |SELECT r.source, r.v, r.cnt AS n_rows, r.rank2, min(rh.rv) AS mapped
        |FROM r2 r JOIN tot USING (source) CROSS JOIN rt
        |LEFT JOIN rh ON rh.rcum2 * tot.n_src >= r.rank2 * rt.n_ref
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,

    // Luhn: same reversed-string mod-10 fold over the padded key.
    "q164_luhn_audit" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |         reverse(lpad(CAST(o_orderkey AS VARCHAR), 16, '0')) AS r
        |  FROM orders),
        |v AS (
        |  SELECT o_orderpriority,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(1, len(r) + 1),
        |             i -> CAST(CASE WHEN i % 2 = 1 THEN ascii(r[i]) - 48
        |                  WHEN (ascii(r[i]) - 48) * 2 > 9
        |                    THEN (ascii(r[i]) - 48) * 2 - 9
        |                  ELSE (ascii(r[i]) - 48) * 2 END AS BIGINT))),
        |           (a, b) -> a + b) % 10 = 0 AS ok
        |  FROM c)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_luhn_valid
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,

    // Interval union: the same sweep — running max of prior ends flags
    // new segments, running flag-sum numbers them, per-segment min/max
    // close the merge.
    "q165_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, ((epoch_ns(ts) - (((epoch_ns(ts) % 1000000000) + 1000000000) % 1000000000)) // 1000000000) AS s,
        |         ((epoch_ns(ts) - (((epoch_ns(ts) % 1000000000) + 1000000000) % 1000000000)) // 1000000000) + 60 +
        |           CAST(floor(abs(value)) AS BIGINT) AS e
        |  FROM events),
        |f AS (
        |  SELECT * FROM iv
        |  WHERE s IS NOT NULL AND e IS NOT NULL AND e > s),
        |m AS (
        |  SELECT user_id, s, e,
        |         max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM f),
        |g AS (
        |  SELECT user_id, s, e,
        |         CAST(sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY s, e
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS seg
        |  FROM m),
        |sg AS (
        |  SELECT user_id, seg, CAST(count(*) AS BIGINT) AS n,
        |         min(s) AS ss, max(e) AS se
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
        |       CAST(count(*) AS BIGINT) AS n_segments,
        |       CAST(sum(se - ss) AS BIGINT) AS covered,
        |       CAST(max(se) - min(ss) AS BIGINT) AS span
        |FROM sg GROUP BY 1 ORDER BY 1""".stripMargin,

    // Release audit: gate CTEs → per-source (all, kept) histogram →
    // q140's exact-numerator TVD → one verdict row.
    "q166_release_audit" ->
      s"""WITH $oGateCtes,
         |k AS (
         |  SELECT d.source,
         |         CASE WHEN v.reasons = 0 THEN 1 ELSE 0 END AS kept
         |  FROM verdict v JOIN documents d USING (doc_id)),
         |hist AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_ref,
         |         CAST(sum(kept) AS BIGINT) AS n_batch
         |  FROM k GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(n_ref) AS BIGINT) AS n,
         |         CAST(sum(n_batch) AS BIGINT) AS m FROM hist),
         |tv AS (
         |  SELECT CASE WHEN min(t.n) > 0 AND min(t.m) > 0 THEN
         |           CAST(sum(abs(CAST(h.n_ref AS HUGEINT) * t.m -
         |                        CAST(h.n_batch AS HUGEINT) * t.n)) AS DOUBLE) /
         |             (2.0 * CAST(min(t.n) AS DOUBLE) * CAST(min(t.m) AS DOUBLE))
         |         END AS tvd
         |  FROM hist h CROSS JOIN tot t)
         |SELECT t.n AS n_docs, t.m AS n_kept,
         |       CAST(t.m AS DOUBLE) / CAST(t.n AS DOUBLE) AS keep_rate,
         |       tv.tvd,
         |       (tv.tvd <= 0.05 AND
         |        CAST(t.m AS DOUBLE) / CAST(t.n AS DOUBLE) >= 0.25) AS release_ok
         |FROM tot t CROSS JOIN tv""".stripMargin,

    // nDCG: q157's ranked CTEs; the SAME driver-computed discount
    // literals ride in this SQL text, so neither engine evaluates log2.
    "q167_ndcg" -> {
      val dLit = s"[${Similarity.ndcgDiscounts(10).mkString(", ")}]"
      s"""WITH $oNorms,
         |lab AS (
         |  SELECT n.vec_id, n.v, n.nrm, e.label
         |  FROM norms n JOIN embeddings e USING (vec_id)),
         |scored AS (
         |  SELECT q.vec_id AS qid, q.label AS ql, c.vec_id AS nid,
         |         c.label AS nl, ${oCos("q", "c")} AS cos
         |  FROM lab q JOIN lab c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, ql, nl,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored),
         |g AS (
         |  SELECT qid, rank,
         |         CASE WHEN ql = nl THEN 1 ELSE 0 END AS g
         |  FROM ranked WHERE rank <= 10),
         |ir AS (
         |  SELECT qid, rank, g,
         |         row_number() OVER (PARTITION BY qid ORDER BY g DESC, rank) AS ir
         |  FROM g)
         |SELECT qid, CAST(sum(g) AS BIGINT) AS n_rel,
         |       CAST(sum(g * ($dLit)[CAST(rank AS INTEGER)]) AS BIGINT) AS dcg_num,
         |       CAST(sum(g * ($dLit)[CAST(ir AS INTEGER)]) AS BIGINT) AS idcg_num,
         |       CASE WHEN CAST(sum(g * ($dLit)[CAST(ir AS INTEGER)]) AS BIGINT) > 0
         |            THEN CAST(sum(g * ($dLit)[CAST(rank AS INTEGER)]) AS DOUBLE) /
         |                 CAST(sum(g * ($dLit)[CAST(ir AS INTEGER)]) AS DOUBLE)
         |       END AS ndcg_at_10
         |FROM ir GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q70's wide-signature + recursive-CC chain, then q99's Knuth-bucket
    // split arithmetic keyed once by doc_id (naive) and once by the CC
    // component (safe); crossing pairs counted over the same pair set.
    "q168_leakage_split" ->
      s"""WITH RECURSIVE ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |reach(node, comp) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS doc_id, min(comp) AS component
         |        FROM reach GROUP BY node),
         |sp AS (
         |  SELECT doc_id,
         |         CASE WHEN (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
         |              WHEN (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
         |              ELSE 'test' END AS naive_split,
         |         CASE WHEN (((component % 2147483648) * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
         |              WHEN (((component % 2147483648) * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
         |              ELSE 'test' END AS safe_split
         |  FROM lab),
         |sizes AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(CASE WHEN safe_split = 'train' THEN 1 END) AS BIGINT) AS safe_train,
         |         CAST(count(CASE WHEN safe_split = 'val' THEN 1 END) AS BIGINT) AS safe_val,
         |         CAST(count(CASE WHEN safe_split = 'test' THEN 1 END) AS BIGINT) AS safe_test
         |  FROM sp),
         |pc AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |         CAST(count(CASE WHEN a.naive_split <> b.naive_split THEN 1 END) AS BIGINT) AS naive_cross,
         |         CAST(count(CASE WHEN a.safe_split <> b.safe_split THEN 1 END) AS BIGINT) AS safe_cross
         |  FROM pairs p JOIN sp a ON a.doc_id = p.i JOIN sp b ON b.doc_id = p.j)
         |SELECT * FROM sizes CROSS JOIN pc""".stripMargin,

    // Midrank Mann-Whitney over the fixed-point score histogram —
    // doubled rank-sum terms stay integer; one division at the end.
    "q169_auc" ->
      s"""WITH $oDistillScoredCtes,
         |hist AS (
         |  SELECT zq AS s, count(*) AS c,
         |         count(CASE WHEN keep THEN 1 END) AS p
         |  FROM scored GROUP BY 1),
         |cum AS (
         |  SELECT s, c, p, sum(c) OVER (ORDER BY s) AS cum FROM hist),
         |a AS (
         |  SELECT CAST(sum(p) AS BIGINT) AS n_pos,
         |         CAST(sum(c - p) AS BIGINT) AS n_neg,
         |         CAST(sum(p * (2 * cum - c + 1)) AS BIGINT) AS r2
         |  FROM cum)
         |SELECT n_pos, n_neg,
         |       r2 - n_pos * (n_pos + 1) AS auc_num,
         |       2 * n_pos * n_neg AS auc_den,
         |       CASE WHEN n_pos > 0 AND n_neg > 0
         |            THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |                 CAST(2 * n_pos * n_neg AS DOUBLE)
         |       END AS auc
         |FROM a""".stripMargin,

    // Descending cumulative TP/FP over the same histogram; precision =
    // tp/(tp+fp), recall = tp/P, each one division.
    "q170_pr_curve" ->
      s"""WITH $oDistillScoredCtes,
         |hist AS (
         |  SELECT zq AS threshold, count(*) AS c,
         |         count(CASE WHEN keep THEN 1 END) AS p
         |  FROM scored GROUP BY 1),
         |cum AS (
         |  SELECT threshold,
         |         CAST(sum(p) OVER (ORDER BY threshold DESC) AS BIGINT) AS tp,
         |         CAST(sum(c - p) OVER (ORDER BY threshold DESC) AS BIGINT) AS fp,
         |         CAST(sum(p) OVER () AS BIGINT) AS pall
         |  FROM hist)
         |SELECT threshold, tp, fp, pall - tp AS fn,
         |       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS "precision",
         |       CASE WHEN pall > 0
         |            THEN CAST(tp AS DOUBLE) / CAST(pall AS DOUBLE) END AS recall
         |FROM cum ORDER BY threshold DESC""".stripMargin,

    // q23's shingle CTE shape (trigrams); singleton shingles keep their
    // only doc id, no join back onto the shingle stream.
    "q171_ngram_novelty" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(tk) - 1),
         |      i -> list_aggregate(tk[i:i+2], 'string_agg', ' ')))) AS s
         |  FROM toks),
         |sizes AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
         |  FROM sh GROUP BY 1),
         |novel AS (
         |  SELECT doc1 AS doc_id, CAST(count(*) AS BIGINT) AS n_novel FROM (
         |    SELECT s, count(*) AS df, min(doc_id) AS doc1 FROM sh GROUP BY s)
         |  WHERE df = 1 GROUP BY 1)
         |SELECT s.doc_id, s.n_shingles,
         |       CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
         |       CAST(COALESCE(n.n_novel, 0) AS DOUBLE) /
         |         CAST(s.n_shingles AS DOUBLE) AS novelty
         |FROM sizes s LEFT JOIN novel n USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // The same literal policy list as the engine query; only docs with
    // >= 1 hit appear.
    "q172_blocklist" ->
      s"""WITH bl(term, cat) AS (VALUES
         |  ('slow','perf'), ('merge','infra'), ('stream','infra'),
         |  ('vector','ml'), ('customer','pii')),
         |tok AS (SELECT doc_id, unnest($oToks) AS term FROM documents),
         |h AS (SELECT doc_id, t.term, cat FROM tok t JOIN bl USING (term))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
         |       CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         |       array_to_string(list_sort(list_distinct(list(cat))), ',')
         |         AS categories
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Margin cross product keeps observed-zero cells; d and contrib
    // mirror chiSquaredCells' fixed arithmetic order.
    "q173_chi2_homogeneity" ->
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT lang, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |fl AS (
        |  SELECT r.source, c.lang, CAST(COALESCE(cl.o, 0) AS BIGINT) AS o,
        |         r.rt, c.ct, nn.n
        |  FROM rt r CROSS JOIN nn CROSS JOIN ct c
        |  LEFT JOIN cells cl ON cl.source = r.source AND cl.lang = c.lang),
        |fd AS (
        |  SELECT source, lang, o, rt, ct, n, o * n - rt * ct AS d FROM fl)
        |SELECT source, lang, o, rt, ct, n, d,
        |       (CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |         AS contrib
        |FROM fd ORDER BY source, lang""".stripMargin,

    // q37's centroid CTEs; top-2 cosines via row_number (cos DESC, cid
    // ASC ties — the engine's sort_array order), fixed-point quantize,
    // exact integer cell sums.
    "q174_silhouette" ->
      s"""WITH $oNorms,
         |centroids AS (
         |  SELECT vec_id // 25 AS cid, v, nrm FROM norms WHERE vec_id % 25 = 0),
         |pc AS (
         |  SELECT e.vec_id AS id, c.cid, ${oCos("e", "c")} AS cos,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY ${oCos("e", "c")} DESC, c.cid) AS rn
         |  FROM norms e CROSS JOIN centroids c),
         |top AS (
         |  SELECT a.id, a.cid AS cell, a.cos AS c1, b.cos AS c2
         |  FROM pc a JOIN pc b ON a.id = b.id AND a.rn = 1 AND b.rn = 2),
         |sil AS (
         |  SELECT cell,
         |         CAST(floor(((c1 - c2) / (CAST(1.0 AS DOUBLE) - c2)) *
         |           CAST(1048576 AS DOUBLE)) AS BIGINT) AS sq
         |  FROM top WHERE c2 < CAST(1.0 AS DOUBLE))
         |SELECT cell, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(sq) AS BIGINT) AS sil_sum_fp,
         |       CAST(sum(sq) AS DOUBLE) /
         |         (CAST(count(*) AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS mean_sil
         |FROM sil GROUP BY cell ORDER BY cell""".stripMargin,

    // The engine's level chain as literal CASE rules: (type, bucket)
    // overrides, then per-type, then the default; level = mask popcount.
    "q175_rule_lookup" ->
      """WITH b AS (
        |  SELECT event_type,
        |         (((user_id % 2147483648) * 2654435761) % 4294967296) % 4 AS ub
        |  FROM events),
        |m AS (
        |  SELECT COALESCE(
        |           CASE WHEN event_type = 'click' AND ub = 0 THEN 'r_click_b0'
        |                WHEN event_type = 'purchase' AND ub = 1 THEN 'r_purch_b1' END,
        |           CASE WHEN event_type = 'click' THEN 'r_click'
        |                WHEN event_type = 'purchase' THEN 'r_purchase'
        |                WHEN event_type = 'view' THEN 'r_view' END,
        |           'r_default') AS matched,
        |         CASE WHEN (event_type = 'click' AND ub = 0)
        |                OR (event_type = 'purchase' AND ub = 1) THEN 2
        |              WHEN event_type IN ('click', 'purchase', 'view') THEN 1
        |              ELSE 0 END AS match_level
        |  FROM b)
        |SELECT matched, match_level, CAST(count(*) AS BIGINT) AS cnt
        |FROM m GROUP BY 1, 2 ORDER BY matched""".stripMargin,

    // Unrolled 4-level tree over the 16 shard leaves; every digest is
    // polyHash(md5(...)) exactly like the engine's chain.
    "q176_merkle_manifest" -> {
      def pair(prev: String) = oPolyHash(
        "md5(concat_ws('|', " +
          "CAST(max(CASE WHEN idx % 2 = 0 THEN digest END) AS VARCHAR), " +
          "CAST(max(CASE WHEN idx % 2 = 1 THEN digest END) AS VARCHAR)))")
      def lv(k: Int) =
        s"""lv$k AS (
           |  SELECT CAST(idx // 2 AS BIGINT) AS idx,
           |         CAST(sum(n_rows) AS BIGINT) AS n_rows,
           |         ${pair(s"lv${k - 1}")} AS digest
           |  FROM lv${k - 1} GROUP BY 1)""".stripMargin
      s"""WITH leaves AS (
         |  SELECT (((doc_id % 2147483648) * 2654435761) % 4294967296) % 16 AS idx,
         |         CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(sum(${oPolyHash(
                     "md5(concat_ws(chr(1), doc_id, lang, source, text))")})
         |           % 1000000000000000 AS BIGINT) AS cmod
         |  FROM documents GROUP BY 1),
         |lv0 AS (
         |  SELECT r.idx, CAST(COALESCE(l.n_rows, 0) AS BIGINT) AS n_rows,
         |         ${oPolyHash("md5(CAST(COALESCE(l.cmod, 0) AS VARCHAR))")} AS digest
         |  FROM range(0, 16) r(idx) LEFT JOIN leaves l USING (idx)),
         |${lv(1)},
         |${lv(2)},
         |${lv(3)},
         |${lv(4)},
         |m AS (
         |  SELECT 0 AS level, idx, n_rows, digest FROM lv0
         |  UNION ALL SELECT 1, idx, n_rows, digest FROM lv1
         |  UNION ALL SELECT 2, idx, n_rows, digest FROM lv2
         |  UNION ALL SELECT 3, idx, n_rows, digest FROM lv3
         |  UNION ALL SELECT 4, idx, n_rows, digest FROM lv4)
         |SELECT level, idx, n_rows, digest,
         |  CAST(bit_xor(digest) OVER (PARTITION BY level) AS BIGINT)
         |    AS level_xor
         |FROM m ORDER BY level, idx""".stripMargin
    },

    // Histogram extremes + exact integer-ceiling salt factor; max_key is
    // the min key string among count ties (deterministic).
    "q177_skew_report" ->
      """WITH h AS (
        |  SELECT CAST(event_type AS VARCHAR) AS k,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(max(cnt) AS BIGINT) AS max_cnt
        |  FROM h),
        |hot AS (SELECT min(k) AS max_key FROM h JOIN t ON cnt = max_cnt)
        |SELECT n_rows, n_keys, max_cnt, max_key,
        |       CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)
        |         AS mean_rows_per_key,
        |       CAST(max_cnt * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE)
        |         AS skew_ratio,
        |       CAST((max_cnt * 32 + n_rows - 1) // n_rows AS BIGINT)
        |         AS salt_factor
        |FROM t CROSS JOIN hot""".stripMargin,

    // The engine's coordinated sample (Knuth bucket % 8 = 0 on BOTH
    // sides) + the exact per-key histogram answer.
    "q178_join_size" ->
      """WITH s AS (
        |  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE (((l_partkey % 2147483648) * 2654435761) % 4294967296) % 8 = 0
        |  GROUP BY 1),
        |est AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sampled_keys,
        |         CAST(COALESCE(sum(c * c), 0) AS BIGINT) AS sampled_pairs,
        |         CAST(COALESCE(sum(c * c) * 8, 0) AS BIGINT) AS est_join_rows
        |  FROM s),
        |ex AS (
        |  SELECT CAST(sum(c * c) AS BIGINT) AS exact_join_rows FROM (
        |    SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY l_partkey))
        |SELECT n_sampled_keys, sampled_pairs, est_join_rows, exact_join_rows,
        |       CAST(est_join_rows AS DOUBLE) / CAST(exact_join_rows AS DOUBLE)
        |         AS ratio
        |FROM est CROSS JOIN ex""".stripMargin,

    // Exact-integer Gram, then the SAME power iteration the engine runs
    // on the driver: left folds over b then a, all-ones start, 20
    // rounds; the matvec expression is inlined twice (value + its own
    // normalizer) because the recursive member cannot name it.
    "q179_top_component" ->
      s"""WITH RECURSIVE $oTopComponentCtes,
         |wf AS (SELECT $oPowerW AS w, v FROM fin, mm),
         |lam AS (
         |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(64), a -> v[a+1] * w[a+1])),
         |    (x, y) -> x + y) AS lambda
         |  FROM wf)
         |SELECT CAST(d.a AS BIGINT) AS dim, f.v[d.a+1] AS loading,
         |       lam.lambda AS lambda
         |FROM fin f, lam, range(64) d(a) ORDER BY dim""".stripMargin,

    // Wide pairs joined to sources on both ends, unordered source pair.
    "q196_cross_source_dups" ->
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |ps AS (
         |  SELECT least(da.source, db.source) AS source_a,
         |         greatest(da.source, db.source) AS source_b
         |  FROM pairs p
         |  JOIN documents da ON da.doc_id = p.i
         |  JOIN documents db ON db.doc_id = p.j)
         |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM ps GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Hamming histogram over the radius-3 wide pair set + cumulation.
    "q197_radius_sweep" ->
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j,
         |         CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |h AS (
         |  SELECT hamming, CAST(count(*) AS BIGINT) AS n_at
         |  FROM pairs GROUP BY 1)
         |SELECT hamming, n_at,
         |       CAST(sum(n_at) OVER (ORDER BY hamming) AS BIGINT) AS n_pairs_le
         |FROM h ORDER BY hamming""".stripMargin,

    // A = exact-Jaccard >= 0.5 trigram pairs (the q24 contract: the
    // engine's LSH has total recall there); B = wide simhash pairs.
    "q198_tier_agreement" ->
      s"""WITH ${oJaccardCtes(3)},
         |aset AS (SELECT i, j FROM jac WHERE jaccard >= 0.5),
         |${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |bset AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |fo AS (
         |  SELECT coalesce(a.i, b.i) AS i, coalesce(a.j, b.j) AS j,
         |         (a.i IS NOT NULL) AS ina, (b.i IS NOT NULL) AS inb
         |  FROM aset a FULL OUTER JOIN bset b ON a.i = b.i AND a.j = b.j),
         |agg AS (
         |  SELECT CAST(count(CASE WHEN ina THEN 1 END) AS BIGINT) AS n_minhash,
         |         CAST(count(CASE WHEN inb THEN 1 END) AS BIGINT) AS n_simhash,
         |         CAST(count(CASE WHEN ina AND inb THEN 1 END) AS BIGINT) AS n_both
         |  FROM fo)
         |SELECT n_minhash, n_simhash, n_both,
         |       CAST(n_both AS DOUBLE) /
         |         CAST(n_minhash + n_simhash - n_both AS DOUBLE) AS pair_jaccard
         |FROM agg""".stripMargin,

    // Frequency-ranked token cumulation over vocab rows; RANGE==ROWS
    // because (c DESC, t) is a total order.
    "q194_vocab_coverage" ->
      s"""WITH tf AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($oToks) AS t FROM documents) GROUP BY 1),
         |r AS (
         |  SELECT t, c,
         |         CAST(sum(c) OVER (ORDER BY c DESC, t) AS BIGINT) AS cum,
         |         CAST(row_number() OVER (ORDER BY c DESC, t) AS BIGINT) AS r,
         |         CAST(sum(c) OVER () AS BIGINT) AS n
         |  FROM tf)
         |SELECT CAST(min(n) AS BIGINT) AS n_tokens,
         |       CAST(count(*) AS BIGINT) AS vocab_size,
         |       CAST(min(CASE WHEN cum * 100 >= n * 50 THEN r END) AS BIGINT) AS v50,
         |       CAST(min(CASE WHEN cum * 100 >= n * 90 THEN r END) AS BIGINT) AS v90,
         |       CAST(min(CASE WHEN cum * 100 >= n * 99 THEN r END) AS BIGINT) AS v99
         |FROM r""".stripMargin,

    // Two full manifest chains (suffix a = full corpus, b = one doc
    // deleted) joined on (level, idx); only digest mismatches ship.
    "q195_merkle_diff" -> {
      def pairExpr = oPolyHash(
        "md5(concat_ws('|', " +
          "CAST(max(CASE WHEN idx % 2 = 0 THEN digest END) AS VARCHAR), " +
          "CAST(max(CASE WHEN idx % 2 = 1 THEN digest END) AS VARCHAR)))")
      def lv(k: Int, sfx: String) =
        s"""lv$k$sfx AS (
           |  SELECT CAST(idx // 2 AS BIGINT) AS idx,
           |         CAST(sum(n_rows) AS BIGINT) AS n_rows,
           |         $pairExpr AS digest
           |  FROM lv${k - 1}$sfx GROUP BY 1)""".stripMargin
      def chain(sfx: String, whereClause: String) =
        s"""leaves$sfx AS (
           |  SELECT (((doc_id % 2147483648) * 2654435761) % 4294967296) % 16 AS idx,
           |         CAST(count(*) AS BIGINT) AS n_rows,
           |         CAST(sum(${oPolyHash(
                       "md5(concat_ws(chr(1), doc_id, lang, source, text))")})
           |           % 1000000000000000 AS BIGINT) AS cmod
           |  FROM documents $whereClause GROUP BY 1),
           |lv0$sfx AS (
           |  SELECT r.idx, CAST(COALESCE(l.n_rows, 0) AS BIGINT) AS n_rows,
           |         ${oPolyHash("md5(CAST(COALESCE(l.cmod, 0) AS VARCHAR))")} AS digest
           |  FROM range(0, 16) r(idx) LEFT JOIN leaves$sfx l USING (idx)),
           |${lv(1, sfx)},
           |${lv(2, sfx)},
           |${lv(3, sfx)},
           |${lv(4, sfx)},
           |m$sfx AS (
           |  SELECT 0 AS level, idx, n_rows, digest FROM lv0$sfx
           |  UNION ALL SELECT 1, idx, n_rows, digest FROM lv1$sfx
           |  UNION ALL SELECT 2, idx, n_rows, digest FROM lv2$sfx
           |  UNION ALL SELECT 3, idx, n_rows, digest FROM lv3$sfx
           |  UNION ALL SELECT 4, idx, n_rows, digest FROM lv4$sfx)""".stripMargin
      s"""WITH ${chain("a", "")},
         |${chain("b", "WHERE doc_id <> 42")}
         |SELECT a.level, a.idx, a.n_rows AS n_rows_a,
         |  b.n_rows AS n_rows_b, b.digest AS digest_b
         |FROM ma a JOIN mb b USING (level, idx)
         |WHERE a.digest <> b.digest ORDER BY level, idx""".stripMargin
    },

    // q94's BPE CTEs aggregated per language with exact sums.
    "q191_bpe_fertility" -> (
      oBpeCtes(8) +
        s"""
           |, wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS nt FROM s8),
           |dw AS (
           |  SELECT doc_id, unnest($oToks) AS w FROM documents),
           |st AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |         CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
           |  FROM dw JOIN wl USING (w) GROUP BY 1),
           |pd AS (
           |  SELECT d.lang, d.n_chars,
           |         coalesce(st.n_words, CAST(0 AS BIGINT)) AS n_words,
           |         coalesce(st.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
           |  FROM documents d LEFT JOIN st USING (doc_id))
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS chars,
           |       CAST(sum(n_words) AS BIGINT) AS words,
           |       CAST(sum(n_bpe_tokens) AS BIGINT) AS bpe_tokens,
           |       CAST(sum(n_chars) AS DOUBLE) /
           |         CAST(sum(n_bpe_tokens) AS DOUBLE) AS chars_per_token,
           |       CAST(sum(n_bpe_tokens) AS DOUBLE) /
           |         CAST(sum(n_words) AS DOUBLE) AS tokens_per_word
           |FROM pd GROUP BY lang ORDER BY lang""".stripMargin),

    // q70's recursive-CC chain reduced to per-size cluster counts.
    "q192_cluster_size_hist" ->
      s"""WITH RECURSIVE ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |reach(node, comp) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS doc_id, min(comp) AS component
         |        FROM reach GROUP BY node),
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS n_members
         |       FROM lab GROUP BY 1)
         |SELECT n_members, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin,

    // All wide pairs with exactly one side in the increment, oriented
    // (i = corpus, j = batch), joined to the corpus split.
    "q193_incremental_leakage" ->
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |allp AS (
         |  SELECT a.doc_id AS x, b.doc_id AS y
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |crossp AS (
         |  SELECT CASE WHEN x % 7 <> 0 THEN x ELSE y END AS i,
         |         CASE WHEN x % 7 <> 0 THEN y ELSE x END AS j
         |  FROM allp WHERE (x % 7 = 0) <> (y % 7 = 0)),
         |j2 AS (
         |  SELECT i, j,
         |         CASE WHEN (((i % 2147483648) * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
         |              WHEN (((i % 2147483648) * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM crossp),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cross_pairs,
         |         CAST(count(CASE WHEN split = 'train' THEN 1 END) AS BIGINT) AS pairs_train,
         |         CAST(count(CASE WHEN split = 'val' THEN 1 END) AS BIGINT) AS pairs_val,
         |         CAST(count(CASE WHEN split = 'test' THEN 1 END) AS BIGINT) AS pairs_test,
         |         CAST(count(DISTINCT CASE WHEN split = 'test' THEN j END) AS BIGINT) AS new_docs_hitting_test
         |  FROM j2),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_new
         |       FROM documents WHERE doc_id % 7 = 0)
         |SELECT nn.n_new, agg.n_cross_pairs, agg.pairs_train, agg.pairs_val,
         |       agg.pairs_test, agg.new_docs_hitting_test
         |FROM nn CROSS JOIN agg""".stripMargin,

    // q169's AUC tail with the cumulation window partitioned by lang
    // (scored now carries doc_id; lang joins from documents).
    "q188_auc_by_slice" ->
      s"""WITH $oDistillScoredCtes,
         |sl AS (
         |  SELECT d.lang, s.zq, s.keep
         |  FROM scored s JOIN documents d USING (doc_id)),
         |hist AS (
         |  SELECT lang, zq AS s2, count(*) AS c,
         |         count(CASE WHEN keep THEN 1 END) AS p
         |  FROM sl GROUP BY 1, 2),
         |cum AS (
         |  SELECT lang, s2, c, p,
         |         sum(c) OVER (PARTITION BY lang ORDER BY s2) AS cum
         |  FROM hist),
         |a AS (
         |  SELECT lang, CAST(sum(p) AS BIGINT) AS n_pos,
         |         CAST(sum(c - p) AS BIGINT) AS n_neg,
         |         CAST(sum(p * (2 * cum - c + 1)) AS BIGINT) AS r2
         |  FROM cum GROUP BY 1)
         |SELECT lang, n_pos, n_neg,
         |       r2 - n_pos * (n_pos + 1) AS auc_num,
         |       2 * n_pos * n_neg AS auc_den,
         |       CASE WHEN n_pos > 0 AND n_neg > 0
         |            THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |                 CAST(2 * n_pos * n_neg AS DOUBLE)
         |       END AS auc
         |FROM a ORDER BY lang""".stripMargin,

    // Descending cumulative TP/FP; per-threshold precision quantized to
    // 2^30 before the sum, matching averagePrecision's fixed point.
    "q189_avg_precision" ->
      s"""WITH $oDistillScoredCtes,
         |hist AS (
         |  SELECT zq AS s2, count(*) AS c,
         |         count(CASE WHEN keep THEN 1 END) AS p
         |  FROM scored GROUP BY 1),
         |cum AS (
         |  SELECT s2, p,
         |         CAST(sum(p) OVER (ORDER BY s2 DESC) AS BIGINT) AS tp,
         |         CAST(sum(c - p) OVER (ORDER BY s2 DESC) AS BIGINT) AS fp
         |  FROM hist),
         |terms AS (
         |  SELECT p,
         |         p * CAST(floor((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
         |           * CAST(1073741824 AS DOUBLE)) AS BIGINT) AS term
         |  FROM cum)
         |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
         |       CAST(sum(term) AS BIGINT) AS ap_num,
         |       CASE WHEN sum(p) > 0
         |            THEN CAST(sum(term) AS DOUBLE) /
         |                 CAST(CAST(sum(p) AS BIGINT) * 1073741824 AS DOUBLE)
         |       END AS ap
         |FROM terms""".stripMargin,

    // Gate verdict -> per-length two-sided counts -> cross-multiplied
    // cumulative compare, exactly ksStatistic's arithmetic.
    "q190_ks_gate_length" ->
      s"""WITH $oGateCtes,
         |g AS (
         |  SELECT d.n_chars AS v, (vd.reasons = 0) AS r
         |  FROM documents d JOIN verdict vd USING (doc_id)),
         |hist AS (
         |  SELECT v, count(CASE WHEN r THEN 1 END) AS cr,
         |         count(CASE WHEN NOT r THEN 1 END) AS cc
         |  FROM g GROUP BY 1),
         |cum AS (
         |  SELECT v,
         |         CAST(sum(cr) OVER (ORDER BY v) AS BIGINT) AS cumr,
         |         CAST(sum(cc) OVER (ORDER BY v) AS BIGINT) AS cumc,
         |         CAST(sum(cr) OVER () AS BIGINT) AS nr,
         |         CAST(sum(cc) OVER () AS BIGINT) AS nc
         |  FROM hist)
         |SELECT CAST(min(nr) AS BIGINT) AS n_ref,
         |       CAST(min(nc) AS BIGINT) AS n_cur,
         |       CAST(max(abs(cumr * nc - cumc * nr)) AS BIGINT) AS ks_num,
         |       CAST(min(nr) * min(nc) AS BIGINT) AS ks_den,
         |       CASE WHEN min(nr) * min(nc) > 0
         |            THEN CAST(max(abs(cumr * nc - cumc * nr)) AS DOUBLE) /
         |                 CAST(min(nr) * min(nc) AS DOUBLE)
         |       END AS ks
         |FROM cum""".stripMargin,

    // Distinct (actor, item) -> HAVING degree cap -> per-actor pair
    // join, exactly the engine's stages.
    "q186_coengagement" ->
      """WITH ai AS (
        |  SELECT DISTINCT l_orderkey AS a, l_partkey AS i FROM lineitem),
        |ok AS (SELECT a FROM ai GROUP BY a HAVING count(*) <= 6),
        |c AS (SELECT ai.a, i FROM ai JOIN ok USING (a))
        |SELECT x.i AS item_a, y.i AS item_b,
        |       CAST(count(*) AS BIGINT) AS n_actors
        |FROM c x JOIN c y ON x.a = y.a AND x.i < y.i
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin,

    // Per-source fixed-point quality sums (q98's f_quality text), one
    // division for the order key, then the running-sum greedy fill.
    "q187_budget_alloc" ->
      s"""WITH m AS (
         |  SELECT source, text, $oToks AS tk FROM documents),
         |f AS (
         |  SELECT source,
         |         (least(CAST(length(text) AS DOUBLE) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |          + least(CAST(len(tk) AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |          + (CAST(1.0 AS DOUBLE) - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS DOUBLE)
         |                 / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE)))) / CAST(3.0 AS DOUBLE) AS q,
         |         CAST(len(tk) AS BIGINT) AS ntok
         |  FROM m),
         |st AS (
         |  SELECT source,
         |         CAST(sum(CAST(floor(q * CAST(1048576 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS qsum,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(ntok) AS BIGINT) AS avail
         |  FROM f GROUP BY 1),
         |qq AS (
         |  SELECT source, CAST(qsum AS DOUBLE) / CAST(n AS DOUBLE) AS quality,
         |         avail
         |  FROM st),
         |alloc AS (
         |  SELECT source, quality, avail,
         |         CAST(COALESCE(sum(avail) OVER (ORDER BY quality DESC, source
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS cum_before
         |  FROM qq)
         |SELECT source, quality, avail, cum_before,
         |       greatest(CAST(0 AS BIGINT),
         |         least(avail, 15000 - cum_before)) AS alloc_tokens
         |FROM alloc ORDER BY source""".stripMargin,

    // q179's chain, then the deflated matrix m2 = M - lambda*v*vT (all
    // DOUBLEs, same op order as the driver) and a SECOND recursive
    // power iteration over it.
    "q185_spectral_gap" ->
      s"""WITH RECURSIVE $oTopComponentCtes,
         |wf AS (SELECT $oPowerW AS w, v FROM fin, mm),
         |lam AS (
         |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(64), a -> v[a+1] * w[a+1])),
         |    (x, y) -> x + y) AS lambda
         |  FROM wf),
         |m2 AS MATERIALIZED (
         |  SELECT list_transform(range(64), a -> list_transform(range(64),
         |    b -> CAST(m[a+1][b+1] AS DOUBLE) - lambda * v[a+1] * v[b+1]))
         |    AS m
         |  FROM mm, fin, lam),
         |it2(t, v) AS (
         |  SELECT 0, list_transform(range(64), x -> CAST(1.0 AS DOUBLE))
         |  UNION ALL
         |  SELECT t + 1,
         |         list_transform($oPowerW, wa -> wa / sqrt(list_reduce(
         |           list_prepend(CAST(0.0 AS DOUBLE),
         |             list_transform($oPowerW, wx -> wx * wx)),
         |           (x, y) -> x + y)))
         |  FROM it2, m2 WHERE t < 20),
         |fin2 AS (SELECT v FROM it2 WHERE t = 20),
         |wf2 AS (SELECT $oPowerW AS w, v FROM fin2, m2),
         |lam2 AS (
         |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(64), a -> v[a+1] * w[a+1])),
         |    (x, y) -> x + y) AS lambda2
         |  FROM wf2)
         |SELECT lam.lambda AS lambda1, lam2.lambda2 AS lambda2,
         |       CASE WHEN lam.lambda <> CAST(0.0 AS DOUBLE)
         |            THEN lam2.lambda2 / lam.lambda END AS gap_ratio
         |FROM lam, lam2""".stripMargin,

    // q179's CTEs give v; residuals r = x - (x.v)v per row, quantized
    // energies per dimension before/after.
    "q181_top_removal" ->
      s"""WITH RECURSIVE $oTopComponentCtes,
         |xd AS (SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |dotc AS (
         |  SELECT x, v, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(64), b -> x[b+1] * v[b+1])),
         |    (p, q) -> p + q) AS dot
         |  FROM xd, fin),
         |qq AS (
         |  SELECT d.b AS dim,
         |         greatest(CAST(-67108864 AS BIGINT), least(CAST(67108864 AS BIGINT),
         |           CAST(floor(x[d.b+1] * CAST(1048576 AS DOUBLE)) AS BIGINT))) AS qx,
         |         greatest(CAST(-67108864 AS BIGINT), least(CAST(67108864 AS BIGINT),
         |           CAST(floor((x[d.b+1] - dot * v[d.b+1])
         |             * CAST(1048576 AS DOUBLE)) AS BIGINT))) AS qr
         |  FROM dotc, range(64) d(b))
         |SELECT CAST(dim AS BIGINT) AS dim,
         |       CAST(sum(qx * qx) AS BIGINT) AS energy_before,
         |       CAST(sum(qr * qr) AS BIGINT) AS energy_after,
         |       CASE WHEN sum(qx * qx) > 0
         |            THEN CAST(1.0 AS DOUBLE) -
         |                 CAST(sum(qr * qr) AS DOUBLE) /
         |                 CAST(sum(qx * qx) AS DOUBLE) END AS removed_frac
         |FROM qq GROUP BY 1 ORDER BY dim""".stripMargin,

    // One WITH: the AUC tail, the PR tail (threshold pick via ORDER BY
    // LIMIT 1), and the bootstrap extremes, cross-joined like the
    // engine's one-row aggregates.
    "q184_eval_verdict" -> {
      val wCases = graft.operators.Sampling.PoissonCdf
        .map(c => s"(CASE WHEN h / CAST(4294967296 AS DOUBLE) >= CAST($c AS DOUBLE) THEN 1 ELSE 0 END)")
        .mkString("\n|         + ")
      s"""WITH $oDistillScoredCtes,
         |ahist AS (
         |  SELECT zq AS s2, count(*) AS c,
         |         count(CASE WHEN keep THEN 1 END) AS p
         |  FROM scored GROUP BY 1),
         |acum AS (
         |  SELECT s2, c, p, sum(c) OVER (ORDER BY s2) AS cum FROM ahist),
         |aa AS (
         |  SELECT CAST(sum(p) AS BIGINT) AS n_pos,
         |         CAST(sum(c - p) AS BIGINT) AS n_neg,
         |         CAST(sum(p * (2 * cum - c + 1)) AS BIGINT) AS r2
         |  FROM acum),
         |auct AS (
         |  SELECT n_pos, n_neg,
         |         CASE WHEN n_pos > 0 AND n_neg > 0
         |              THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |                   CAST(2 * n_pos * n_neg AS DOUBLE)
         |         END AS auc
         |  FROM aa),
         |pcum AS (
         |  SELECT s2 AS threshold,
         |         CAST(sum(p) OVER (ORDER BY s2 DESC) AS BIGINT) AS tp,
         |         CAST(sum(c - p) OVER (ORDER BY s2 DESC) AS BIGINT) AS fp,
         |         CAST(sum(p) OVER () AS BIGINT) AS pall
         |  FROM ahist),
         |psel AS (
         |  SELECT threshold AS thr_sel,
         |         CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision_sel,
         |         CASE WHEN pall > 0
         |              THEN CAST(tp AS DOUBLE) / CAST(pall AS DOUBLE)
         |         END AS recall_sel
         |  FROM pcum
         |  WHERE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) >= CAST(0.95 AS DOUBLE)
         |  ORDER BY threshold LIMIT 1),
         |bk AS (
         |  SELECT doc_id, CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS m
         |  FROM verdict),
         |br AS (
         |  SELECT b.b, m,
         |         (((doc_id * 32 + b.b) % 2147483648) * 2654435761)
         |           % 4294967296 AS h
         |  FROM bk, range(32) b(b)),
         |bw AS (
         |  SELECT b, m,
         |         $wCases AS w
         |  FROM br),
         |brates AS (
         |  SELECT CASE WHEN sum(w) > 0
         |              THEN CAST(sum(w * m) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
         |         END AS rate
         |  FROM bw GROUP BY b),
         |ci AS (SELECT min(rate) AS keep_lo, max(rate) AS keep_hi FROM brates)
         |SELECT a.n_pos, a.n_neg, a.auc, p.thr_sel, p.precision_sel,
         |       p.recall_sel, ci.keep_lo, ci.keep_hi,
         |       (a.auc >= CAST(0.99 AS DOUBLE) AND
         |        p.recall_sel >= CAST(0.9 AS DOUBLE) AND
         |        ci.keep_lo >= CAST(0.5 AS DOUBLE)) AS eval_ok
         |FROM auct a CROSS JOIN psel p CROSS JOIN ci""".stripMargin
    },

    // Row-exact tail trimming off the cumulated histogram; kept rows
    // per value bucket = max(0, min(cum, n-k) - max(cum-c, k)).
    "q183_trimmed_mean" ->
      """WITH h AS (
        |  SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, v, c,
        |         CAST(sum(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS cum,
        |         CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM h),
        |k AS (
        |  SELECT lang, v, c, cum, n, CAST(n * 1 // 10 AS BIGINT) AS kk
        |  FROM cum),
        |kept AS (
        |  SELECT lang, n, kk,
        |         greatest(CAST(0 AS BIGINT),
        |           least(cum, n - kk) - greatest(cum - c, kk)) AS kp, v
        |  FROM k)
        |SELECT lang, CAST(min(n) AS BIGINT) AS n,
        |       CAST(min(kk) AS BIGINT) AS k_trimmed,
        |       CAST(sum(v * kp) AS BIGINT) AS trimmed_sum,
        |       CASE WHEN min(n) - 2 * min(kk) > 0
        |            THEN CAST(sum(v * kp) AS DOUBLE) /
        |                 CAST(min(n) - 2 * min(kk) AS DOUBLE)
        |       END AS trimmed_mean
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,

    // The engine's Knuth-hash draws and driver-literal Poisson CDF,
    // replicated per b via a range cross join.
    "q182_bootstrap_keep" -> {
      val wCases = graft.operators.Sampling.PoissonCdf
        .map(c => s"(CASE WHEN h / CAST(4294967296 AS DOUBLE) >= CAST($c AS DOUBLE) THEN 1 ELSE 0 END)")
        .mkString("\n|         + ")
      s"""WITH $oGateCtes,
         |k AS (
         |  SELECT doc_id, CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS m
         |  FROM verdict),
         |r AS (
         |  SELECT b.b, m,
         |         (((doc_id * 32 + b.b) % 2147483648) * 2654435761)
         |           % 4294967296 AS h
         |  FROM k, range(32) b(b)),
         |w AS (
         |  SELECT b, m,
         |         $wCases AS w
         |  FROM r)
         |SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS w_sum,
         |       CAST(sum(w * m) AS BIGINT) AS metric_wsum,
         |       CASE WHEN sum(w) > 0
         |            THEN CAST(sum(w * m) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
         |       END AS rate
         |FROM w GROUP BY 1 ORDER BY b""".stripMargin
    },

    // q75's ceiling-bucket arithmetic over the score histogram, then
    // per-decile keep rates.
    "q180_reliability" ->
      s"""WITH $oDistillScoredCtes,
         |h AS (
         |  SELECT zq AS v, count(*) AS c,
         |         count(CASE WHEN keep THEN 1 END) AS kc
         |  FROM scored GROUP BY 1),
         |b AS (
         |  SELECT v, kc, c,
         |         CAST((sum(c) OVER (ORDER BY v) * 10 - 1)
         |              // (sum(c) OVER ()) + 1 AS BIGINT) AS bucket
         |  FROM h)
         |SELECT bucket, CAST(sum(c) AS BIGINT) AS n,
         |       CAST(sum(kc) AS BIGINT) AS n_keep,
         |       min(v) AS zq_min, max(v) AS zq_max,
         |       CAST(sum(kc) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS keep_rate
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // Per-column blocks over native values; the engine's CAST-to-STRING
    // histogram image is injective for these types, so the exact NDV /
    // mode-frequency numbers agree.
    "q199_column_profile" -> {
      def block(c: String) =
        s"""SELECT '$c' AS "column", n_rows, n_nulls, n_distinct, max_freq,
           |       CAST(n_rows - n_nulls AS DOUBLE) / CAST(n_rows AS DOUBLE)
           |         AS completeness,
           |       n_distinct > 0 AND max_freq <= 1 AS is_unique
           |FROM (
           |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |         CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |         CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |         CAST(coalesce((SELECT max(cnt) FROM (
           |           SELECT count(*) AS cnt FROM lineitem
           |           WHERE $c IS NOT NULL GROUP BY $c)), 0) AS BIGINT)
           |           AS max_freq
           |  FROM lineitem)""".stripMargin
      Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
        "l_linestatus", "l_shipdate")
        .map(block).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY \"column\"")
    },

    // Row-local rules share one scan; uniqueness rides the key
    // histogram; FK left-joins distinct parent keys. NULL rule
    // predicates count as violations (coalesce TRUE), matching the
    // engine's isViol contract.
    "q200_constraint_audit" ->
      """WITH rr AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(CASE WHEN coalesce(l_shipdate IS NULL, TRUE)
        |           THEN 1 END) AS BIGINT) AS v0,
        |         CAST(count(CASE WHEN coalesce(l_extendedprice < 0, TRUE)
        |           THEN 1 END) AS BIGINT) AS v1,
        |         CAST(count(CASE WHEN coalesce(NOT (l_quantity BETWEEN 1 AND 49), TRUE)
        |           THEN 1 END) AS BIGINT) AS v2,
        |         CAST(count(CASE WHEN coalesce(NOT (l_returnflag IN ('A','N','R')), TRUE)
        |           THEN 1 END) AS BIGINT) AS v3
        |  FROM lineitem),
        |uq AS (
        |  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
        |         CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS v
        |  FROM (SELECT count(*) AS c FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber)),
        |fk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT) AS v
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey)
        |SELECT * FROM (
        |  SELECT 'complete:l_shipdate' AS rule, n AS n_checked,
        |         v0 AS violations, v0 = 0 AS passed FROM rr
        |  UNION ALL SELECT 'nonneg:l_extendedprice', n, v1, v1 = 0 FROM rr
        |  UNION ALL SELECT 'range:l_quantity[1,49]', n, v2, v2 = 0 FROM rr
        |  UNION ALL SELECT 'set:l_returnflag{A,N,R}', n, v3, v3 = 0 FROM rr
        |  UNION ALL SELECT 'unique:(l_orderkey,l_linenumber)', n, v, v = 0 FROM uq
        |  UNION ALL SELECT 'fk:l_orderkey->orders', n, v, v = 0 FROM fk)
        |ORDER BY rule""".stripMargin,

    // Prefix sum minus running min over the day histogram — the CUSUM
    // identity; distinct buckets make DuckDB's RANGE default frame equal
    // to the engine's ROWS frame.
    "q201_cusum" ->
      """WITH h AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(x) AS BIGINT) AS t FROM h),
        |p AS (
        |  SELECT bucket, x, t,
        |         CAST(sum(x * n - t) OVER (ORDER BY bucket) AS BIGINT) AS pf
        |  FROM h CROSS JOIN tot),
        |s AS (
        |  SELECT bucket, x, t,
        |         CAST(pf - least(CAST(0 AS BIGINT),
        |           min(pf) OVER (ORDER BY bucket)) AS BIGINT) AS cusum_scaled
        |  FROM p)
        |SELECT bucket, x, cusum_scaled, cusum_scaled > t * 1 AS alarm
        |FROM s ORDER BY bucket""".stripMargin,

    // Same fixed-order square-and-multiply chains as the engine, per
    // config — bit-identical doubles, no libm pow anywhere.
    "q202_lsh_curve" -> {
      def conf(b: Int, r: Int) = {
        val s = "(CAST(s_pct AS DOUBLE) / 100.0)"
        val p = s"(1.0 - ${oPowFixed(s"(1.0 - ${oPowFixed(s, r)})", b)})"
        s"""SELECT CAST($b AS INTEGER) AS b, CAST($r AS INTEGER) AS r,
           |       s_pct, $p AS p_collide FROM g""".stripMargin
      }
      s"""WITH g AS (
         |  SELECT CAST(i * 5 AS INTEGER) AS s_pct FROM range(1, 20) t(i))
         |SELECT * FROM (
         |${conf(8, 6)}
         |UNION ALL
         |${conf(16, 4)}
         |UNION ALL
         |${conf(32, 3)}
         |) ORDER BY b, r, s_pct""".stripMargin
    },

    // Knuth-hash rank within stratum, round-robin fold; the oracle may
    // use the plain per-stratum window the engine's histogram-offset
    // plan replaces.
    "q203_stratified_kfold" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |         (((doc_id % 2147483648) * 2654435761) % 4294967296) AS hh
        |  FROM documents),
        |r AS (
        |  SELECT lang,
        |         CAST((row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id)
        |           - 1) % 5 AS BIGINT) AS fold
        |  FROM h)
        |SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Exact (source, lang) histogram → Σc², two final divisions.
    "q204_source_diversity" ->
      """WITH h AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |a AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS n_classes,
        |         CAST(sum(c * c) AS BIGINT) AS simpson_num
        |  FROM h GROUP BY 1)
        |SELECT source, n, n_classes, simpson_num,
        |       1.0 - CAST(simpson_num AS DOUBLE) / CAST(n * n AS DOUBLE)
        |         AS gini,
        |       CAST(n * n AS DOUBLE) / CAST(simpson_num AS DOUBLE)
        |         AS inv_simpson
        |FROM a ORDER BY source""".stripMargin,

    // Distinct (source, token) sets; intersections from the token-keyed
    // self-join, unions by inclusion-exclusion.
    "q205_vocab_overlap" ->
      s"""WITH v AS (
         |  SELECT DISTINCT source AS g, t
         |  FROM (SELECT source, unnest($oToks) AS t FROM documents)),
         |sz AS (SELECT g, CAST(count(*) AS BIGINT) AS vz FROM v GROUP BY 1),
         |i AS (
         |  SELECT a.g AS group_a, b.g AS group_b,
         |         CAST(count(*) AS BIGINT) AS inter
         |  FROM v a JOIN v b ON a.t = b.t AND a.g < b.g GROUP BY 1, 2)
         |SELECT group_a, group_b, sa.vz AS vocab_a, sb.vz AS vocab_b, inter,
         |       CAST(inter AS DOUBLE) /
         |         CAST(sa.vz + sb.vz - inter AS DOUBLE) AS jaccard
         |FROM i JOIN sz sa ON sa.g = i.group_a
         |       JOIN sz sb ON sb.g = i.group_b
         |ORDER BY group_a, group_b""".stripMargin,

    // q187's per-doc quality fixed point, then the per-source inclusive
    // running token sum in (qi DESC, doc_id) order — the oracle may use
    // the plain per-source window the engine's histogram-offset plan
    // replaces.
    "q206_domain_cap" ->
      s"""WITH m AS (
         |  SELECT source, doc_id, text, $oToks AS tk FROM documents),
         |f AS (
         |  SELECT source, doc_id, CAST(len(tk) AS BIGINT) AS ntok,
         |         CAST(floor(
         |           (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
         |            + least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
         |            + (1.0 - CAST(len(regexp_extract_all(text,
         |                 '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS DOUBLE)
         |               / greatest(CAST(length(text) AS DOUBLE), 1.0)))
         |           / 3.0 * 1048576) AS BIGINT) AS qi
         |  FROM m),
         |w AS (
         |  SELECT source, ntok,
         |         CAST(sum(ntok) OVER (PARTITION BY source
         |           ORDER BY qi DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS BIGINT) AS cum
         |  FROM f)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(CASE WHEN cum <= 1500 THEN 1 END) AS BIGINT)
         |         AS n_kept,
         |       CAST(coalesce(sum(CASE WHEN cum <= 1500 THEN ntok END), 0)
         |         AS BIGINT) AS kept_tokens,
         |       CAST(sum(ntok) AS BIGINT) AS total_tokens
         |FROM w GROUP BY source ORDER BY source""".stripMargin,

    // Trailing-7 list window (EXCLUDING current), single sorted-element
    // medians — integer-exact, warm-up rows NULL.
    "q208_rolling_mad" ->
      """WITH h AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT bucket, x,
        |         list(x) OVER (ORDER BY bucket
        |           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS t
        |  FROM h),
        |m AS (
        |  SELECT bucket, x,
        |         CASE WHEN len(t) = 7
        |              THEN list_sort(t)[4] END AS med, t
        |  FROM w)
        |SELECT bucket, x, med,
        |       CASE WHEN med IS NOT NULL
        |            THEN list_sort(list_transform(t, v -> abs(v - med)))[4]
        |       END AS mad,
        |       CASE WHEN med IS NOT NULL
        |            THEN abs(x - med) >
        |                 list_sort(list_transform(t, v -> abs(v - med)))[4] * 3
        |       END AS alarm
        |FROM m ORDER BY bucket""".stripMargin,

    // q170's curve + F1, top-1 by (f1 DESC, threshold ASC).
    "q209_f1_point" ->
      s"""WITH $oDistillScoredCtes,
         |hist AS (
         |  SELECT zq AS threshold, count(*) AS c,
         |         count(CASE WHEN keep THEN 1 END) AS p
         |  FROM scored GROUP BY 1),
         |cum AS (
         |  SELECT threshold,
         |         CAST(sum(p) OVER (ORDER BY threshold DESC) AS BIGINT) AS tp,
         |         CAST(sum(c - p) OVER (ORDER BY threshold DESC) AS BIGINT) AS fp,
         |         CAST(sum(p) OVER () AS BIGINT) AS pall
         |  FROM hist),
         |pr AS (
         |  SELECT threshold, tp, fp, pall - tp AS fn,
         |         CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS "precision",
         |         CASE WHEN pall > 0
         |              THEN CAST(tp AS DOUBLE) / CAST(pall AS DOUBLE)
         |         END AS recall,
         |         CASE WHEN 2 * tp + fp + (pall - tp) > 0
         |              THEN CAST(2 * tp AS DOUBLE)
         |                   / CAST(2 * tp + fp + (pall - tp) AS DOUBLE)
         |         END AS f1
         |  FROM cum)
         |SELECT * FROM pr ORDER BY f1 DESC, threshold LIMIT 1""".stripMargin,

    // q104's hash rank → 64-doc shards → q204's Simpson arithmetic per
    // shard.
    "q210_shard_balance" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |         (((doc_id % 2147483648) * 2654435761) % 4294967296) AS hh
        |  FROM documents),
        |r AS (
        |  SELECT source,
        |         CAST((row_number() OVER (ORDER BY hh, doc_id) - 1) // 64
        |           AS BIGINT) AS shard
        |  FROM h),
        |g AS (
        |  SELECT shard, source, CAST(count(*) AS BIGINT) AS c
        |  FROM r GROUP BY 1, 2),
        |a AS (
        |  SELECT shard, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS n_classes,
        |         CAST(sum(c * c) AS BIGINT) AS simpson_num
        |  FROM g GROUP BY 1)
        |SELECT shard, n, n_classes, simpson_num,
        |       1.0 - CAST(simpson_num AS DOUBLE) / CAST(n * n AS DOUBLE)
        |         AS gini,
        |       CAST(n * n AS DOUBLE) / CAST(simpson_num AS DOUBLE)
        |         AS inv_simpson
        |FROM a ORDER BY shard""".stripMargin,

    // Positional postings: word i matches at aligned start pos − i; the
    // phrase is the 3-way (doc, start) intersection.
    "q211_phrase_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($oToks) AS t,
         |         unnest(range(len($oToks))) AS pos
         |  FROM documents),
         |p0 AS (SELECT doc_id, pos AS start FROM toks WHERE t = 'fast'),
         |p1 AS (SELECT doc_id, pos - 1 AS start FROM toks WHERE t = 'table'),
         |p2 AS (SELECT doc_id, pos - 2 AS start FROM toks WHERE t = 'value'),
         |hits AS (
         |  SELECT doc_id, start
         |  FROM p0 JOIN p1 USING (doc_id, start) JOIN p2 USING (doc_id, start))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
         |       CAST(min(start) AS BIGINT) AS first_pos
         |FROM hits GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // q203's fold assignment joined onto the scored set, then q188's
    // midrank AUC partitioned by fold.
    "q212_cv_auc" ->
      s"""WITH $oDistillScoredCtes,
         |fh AS (
         |  SELECT lang, doc_id,
         |         (((doc_id % 2147483648) * 2654435761) % 4294967296) AS hh
         |  FROM documents),
         |fd AS (
         |  SELECT doc_id,
         |         CAST((row_number() OVER (PARTITION BY lang
         |           ORDER BY hh, doc_id) - 1) % 5 AS BIGINT) AS fold
         |  FROM fh),
         |sl AS (
         |  SELECT fd.fold, s.zq, s.keep
         |  FROM scored s JOIN fd USING (doc_id)),
         |hist AS (
         |  SELECT fold, zq AS s2, count(*) AS c,
         |         count(CASE WHEN keep THEN 1 END) AS p
         |  FROM sl GROUP BY 1, 2),
         |cum AS (
         |  SELECT fold, s2, c, p,
         |         sum(c) OVER (PARTITION BY fold ORDER BY s2) AS cum
         |  FROM hist),
         |a AS (
         |  SELECT fold, CAST(sum(p) AS BIGINT) AS n_pos,
         |         CAST(sum(c - p) AS BIGINT) AS n_neg,
         |         CAST(sum(p * (2 * cum - c + 1)) AS BIGINT) AS r2
         |  FROM cum GROUP BY 1)
         |SELECT fold, n_pos, n_neg,
         |       r2 - n_pos * (n_pos + 1) AS auc_num,
         |       2 * n_pos * n_neg AS auc_den,
         |       CASE WHEN n_pos > 0 AND n_neg > 0
         |            THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |                 CAST(2 * n_pos * n_neg AS DOUBLE)
         |       END AS auc
         |FROM a ORDER BY fold""".stripMargin,

    // Exact-position adjacent bigrams; unigram margins; one division.
    "q213_bigram_lift" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($oToks) AS w,
         |         unnest(range(len($oToks))) AS pos
         |  FROM documents),
         |bg AS (
         |  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS c_ab
         |  FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  GROUP BY 1, 2 HAVING count(*) >= 10),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks)
         |SELECT w1, w2, c_ab, ua.c AS c_a, ub.c AS c_b, nn.n,
         |       CAST((c_ab - 2) * nn.n AS BIGINT) AS lift_num,
         |       CAST(ua.c * ub.c AS BIGINT) AS lift_den,
         |       CAST((c_ab - 2) * nn.n AS DOUBLE) /
         |         CAST(ua.c * ub.c AS DOUBLE) AS lift
         |FROM bg JOIN uni ua ON ua.w = bg.w1
         |        JOIN uni ub ON ub.w = bg.w2
         |        CROSS JOIN nn
         |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin,

    // q182's replicate draw over the scored set, then q188's weighted
    // midrank cumulation partitioned by replicate.
    "q214_auc_bootstrap" -> {
      val wCases = graft.operators.Sampling.PoissonCdf
        .map(c => s"(CASE WHEN h / CAST(4294967296 AS DOUBLE) >= CAST($c AS DOUBLE) THEN 1 ELSE 0 END)")
        .mkString("\n|         + ")
      s"""WITH $oDistillScoredCtes,
         |r AS (
         |  SELECT b.b, zq, keep,
         |         (((doc_id * 32 + b.b) % 2147483648) * 2654435761)
         |           % 4294967296 AS h
         |  FROM scored, range(32) b(b)),
         |w AS (
         |  SELECT b, zq, keep,
         |         $wCases AS w
         |  FROM r),
         |hist AS (
         |  SELECT b, zq AS s2, CAST(sum(w) AS BIGINT) AS c,
         |         CAST(sum(CASE WHEN keep THEN w ELSE 0 END) AS BIGINT) AS p
         |  FROM w GROUP BY 1, 2),
         |cum AS (
         |  SELECT b, s2, c, p,
         |         sum(c) OVER (PARTITION BY b ORDER BY s2) AS cum
         |  FROM hist),
         |a AS (
         |  SELECT b, CAST(sum(p) AS BIGINT) AS n_pos,
         |         CAST(sum(c - p) AS BIGINT) AS n_neg,
         |         CAST(sum(p * (2 * cum - c + 1)) AS BIGINT) AS r2
         |  FROM cum GROUP BY 1)
         |SELECT CAST(b AS BIGINT) AS b, n_pos, n_neg,
         |       r2 - n_pos * (n_pos + 1) AS auc_num,
         |       2 * n_pos * n_neg AS auc_den,
         |       CASE WHEN n_pos > 0 AND n_neg > 0
         |            THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |                 CAST(2 * n_pos * n_neg AS DOUBLE)
         |       END AS auc
         |FROM a ORDER BY b""".stripMargin
    },

    // lead() over the same (ts, event_id) total order per user; row
    // totals from the histogram.
    "q215_markov" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_ns(ts), event_id) AS nxt
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_state, nxt AS to_state,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |rt AS (
        |  SELECT from_state, CAST(sum(cnt) AS BIGINT) AS row_total
        |  FROM tr GROUP BY 1)
        |SELECT tr.from_state, tr.to_state, tr.cnt, rt.row_total,
        |       CAST(tr.cnt AS DOUBLE) / CAST(rt.row_total AS DOUBLE) AS p
        |FROM tr JOIN rt USING (from_state)
        |ORDER BY from_state, to_state""".stripMargin,

    // Ordered EMD over the global value ladder: grid = groups × ladder
    // (absent cells still contribute), cross-multiplied BIGINT terms,
    // one division per group.
    "q216_t_closeness" ->
      """WITH s AS (
        |  SELECT lang, CAST(n_chars // 100 AS BIGINT) AS v FROM documents),
        |gv AS (SELECT lang, v, CAST(count(*) AS BIGINT) AS c
        |       FROM s GROUP BY 1, 2),
        |gl AS (SELECT v, CAST(count(*) AS BIGINT) AS cq FROM s GROUP BY 1),
        |glc AS (
        |  SELECT v, CAST(sum(cq) OVER (ORDER BY v) AS BIGINT) AS cumq,
        |         CAST(sum(cq) OVER () AS BIGINT) AS n,
        |         CAST(count(*) OVER () AS BIGINT) AS nv
        |  FROM gl),
        |gs AS (SELECT lang, CAST(count(*) AS BIGINT) AS group_size
        |       FROM s GROUP BY 1),
        |grid AS (
        |  SELECT gs.lang, gs.group_size, glc.v, glc.cumq, glc.n, glc.nv,
        |         CAST(coalesce(gv.c, 0) AS BIGINT) AS c
        |  FROM gs CROSS JOIN glc
        |  LEFT JOIN gv ON gv.lang = gs.lang AND gv.v = glc.v),
        |cc AS (
        |  SELECT lang, group_size, n, nv, cumq,
        |         CAST(sum(c) OVER (PARTITION BY lang ORDER BY v)
        |           AS BIGINT) AS cump
        |  FROM grid)
        |SELECT lang, group_size,
        |       CAST(sum(abs(cump * n - cumq * group_size)) AS BIGINT)
        |         AS t_num,
        |       CASE WHEN nv > 1
        |            THEN CAST(sum(abs(cump * n - cumq * group_size))
        |                   AS DOUBLE)
        |                 / CAST(group_size * n * (nv - 1) AS DOUBLE)
        |       END AS t,
        |       CASE WHEN nv > 1
        |            THEN CAST(sum(abs(cump * n - cumq * group_size))
        |                   AS DOUBLE)
        |                 / CAST(group_size * n * (nv - 1) AS DOUBLE) <= 0.2
        |       END AS t_close
        |FROM cc GROUP BY lang, group_size, n, nv
        |ORDER BY lang""".stripMargin,

    // q138's priority CTEs grouped by lang, left-joined onto the exact
    // per-lang mass; languages missing from the sample report 0/NULL.
    "q217_priority_estimate" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |         CAST(n_chars AS DOUBLE) * 4294967296 /
        |           CAST((((doc_id % 2147483648) * 2654435761) % 4294967296) + 1 AS DOUBLE) AS priority
        |  FROM documents WHERE n_chars > 0),
        |rk AS (
        |  SELECT doc_id, n_chars, priority,
        |         row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
        |  FROM h),
        |tau AS (
        |  SELECT coalesce(min(priority), 0.0) AS tau FROM rk WHERE rn = 41),
        |samp AS (
        |  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled,
        |         sum(greatest(CAST(rk.n_chars AS DOUBLE), tau.tau))
        |           AS est_chars
        |  FROM rk CROSS JOIN tau JOIN documents d USING (doc_id)
        |  WHERE rn <= 40 GROUP BY 1),
        |ex AS (
        |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS exact_chars
        |  FROM documents GROUP BY 1)
        |SELECT ex.lang, CAST(coalesce(samp.n_sampled, 0) AS BIGINT)
        |         AS n_sampled,
        |       samp.est_chars, ex.exact_chars,
        |       samp.est_chars / CAST(ex.exact_chars AS DOUBLE) AS ratio
        |FROM ex LEFT JOIN samp USING (lang)
        |ORDER BY lang""".stripMargin,

    // Two-level histograms per FD; ambiguous determinants contribute
    // all their rows.
    "q218_fd_audit" ->
      """WITH j AS (
        |  SELECT l.l_orderkey, o.o_custkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |fd1c AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT l_orderkey, o_custkey, count(*) FROM j GROUP BY 1, 2)
        |  GROUP BY 1),
        |fd1r AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS rows_
        |  FROM j GROUP BY 1),
        |fd1 AS (
        |  SELECT CAST(coalesce(sum(r.rows_), 0) AS BIGINT) AS n,
        |         CAST(coalesce(sum(CASE WHEN c.c > 1 THEN r.rows_ END), 0)
        |           AS BIGINT) AS v
        |  FROM fd1r r JOIN fd1c c USING (l_orderkey)),
        |fd2c AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT l_partkey, l_suppkey, count(*) FROM lineitem
        |        GROUP BY 1, 2)
        |  GROUP BY 1),
        |fd2r AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS rows_
        |  FROM lineitem GROUP BY 1),
        |fd2 AS (
        |  SELECT CAST(coalesce(sum(r.rows_), 0) AS BIGINT) AS n,
        |         CAST(coalesce(sum(CASE WHEN c.c > 1 THEN r.rows_ END), 0)
        |           AS BIGINT) AS v
        |  FROM fd2r r JOIN fd2c c USING (l_partkey))
        |SELECT * FROM (
        |  SELECT 'fd:l_orderkey->o_custkey' AS rule, n AS n_checked,
        |         v AS violations, v = 0 AS passed FROM fd1
        |  UNION ALL
        |  SELECT 'fd:l_partkey->l_suppkey', n, v, v = 0 FROM fd2)
        |ORDER BY rule""".stripMargin,

    // Batches of 32 along each order; waste = Σ(count·max − sum).
    "q219_padding_waste" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($oToks) AS BIGINT) AS ntok
         |  FROM documents),
         |a AS (
         |  SELECT ntok,
         |         CAST((row_number() OVER (ORDER BY doc_id) - 1) // 32
         |           AS BIGINT) AS batch
         |  FROM d),
         |ab AS (
         |  SELECT batch, CAST(count(*) AS BIGINT) AS c,
         |         CAST(max(ntok) AS BIGINT) AS mx,
         |         CAST(sum(ntok) AS BIGINT) AS tok
         |  FROM a GROUP BY 1),
         |aa AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_batches,
         |         CAST(sum(tok) AS BIGINT) AS total_tokens,
         |         CAST(sum(c * mx - tok) AS BIGINT) AS padding_waste
         |  FROM ab),
         |l AS (
         |  SELECT ntok,
         |         CAST((row_number() OVER (ORDER BY ntok, doc_id) - 1) // 32
         |           AS BIGINT) AS batch
         |  FROM d),
         |lb AS (
         |  SELECT batch, CAST(count(*) AS BIGINT) AS c,
         |         CAST(max(ntok) AS BIGINT) AS mx,
         |         CAST(sum(ntok) AS BIGINT) AS tok
         |  FROM l GROUP BY 1),
         |la AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_batches,
         |         CAST(sum(tok) AS BIGINT) AS total_tokens,
         |         CAST(sum(c * mx - tok) AS BIGINT) AS padding_waste
         |  FROM lb)
         |SELECT * FROM (
         |  SELECT 'arrival' AS strategy, n_batches, total_tokens,
         |         padding_waste,
         |         CAST(padding_waste AS DOUBLE) /
         |           CAST(padding_waste + total_tokens AS DOUBLE)
         |           AS waste_ratio
         |  FROM aa
         |  UNION ALL
         |  SELECT 'length_sorted', n_batches, total_tokens, padding_waste,
         |         CAST(padding_waste AS DOUBLE) /
         |           CAST(padding_waste + total_tokens AS DOUBLE)
         |  FROM la)
         |ORDER BY strategy""".stripMargin,

    // Long-form CDC: gram hashes at their END token, cut flags, chunk
    // id = shifted cumulative cut count, digests of ORDER BY p joined
    // chunk text — identical arithmetic to the engine's array-side plan.
    "q220_cdc_chunks" ->
      s"""WITH ${oCdcChunkCtes("", "SELECT doc_id, text FROM documents")},
         |hist AS (
         |  SELECT digest, n_tokens, CAST(count(*) AS BIGINT) AS c
         |  FROM ch GROUP BY 1, 2)
         |SELECT CAST(sum(c) AS BIGINT) AS n_chunks,
         |       CAST(count(*) AS BIGINT) AS n_distinct_chunks,
         |       CAST(sum(c * n_tokens) AS BIGINT) AS total_tokens,
         |       CAST(sum((c - 1) * n_tokens) AS BIGINT) AS dup_tokens,
         |       CAST(sum((c - 1) * n_tokens) AS DOUBLE) /
         |         CAST(sum(c * n_tokens) AS DOUBLE) AS dup_ratio
         |FROM hist""".stripMargin,

    // Two chunk chains (v1 = corpus, v2 = one edited doc), anti-joined
    // on digest content.
    "q221_delta_sync" ->
      s"""WITH ${oCdcChunkCtes("1", "SELECT doc_id, text FROM documents")},
         |${oCdcChunkCtes("2",
            "SELECT doc_id, CASE WHEN doc_id = 7 THEN text || ' EDITED' " +
              "ELSE text END AS text FROM documents")},
         |v1 AS (SELECT DISTINCT digest FROM ch1),
         |v2d AS (
         |  SELECT digest, CAST(min(n_tokens) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM ch2 GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n_chunks_v2,
         |         CAST(sum(c * n_tokens) AS BIGINT) AS tokens_v2
         |  FROM v2d),
         |new_ AS (
         |  SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS n_new_chunks,
         |         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS new_tokens
         |  FROM v2d LEFT JOIN v1 USING (digest) WHERE v1.digest IS NULL)
         |SELECT n_chunks_v2, tokens_v2, n_new_chunks, new_tokens,
         |       CAST(new_tokens AS DOUBLE) / CAST(tokens_v2 AS DOUBLE)
         |         AS transfer_ratio
         |FROM tot CROSS JOIN new_""".stripMargin,

    // Two q199 profile chains over v1/v2 joined per column; exact
    // integer drift test (|Δndv|·10 > ndv_v1) plus the completeness
    // delta.
    "q222_profile_drift" -> {
      def block(c: String, src: String, sfx: String) =
        s"""SELECT '$c' AS "column",
           |       CAST(count(*) AS BIGINT) AS n_rows_$sfx,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS ndv_$sfx,
           |       CAST(count($c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |         AS comp_$sfx
           |FROM $src""".stripMargin
      val cols = Seq("l_orderkey", "l_quantity", "l_returnflag",
        "l_shipdate")
      val p1 = cols.map(block(_, "lineitem", "v1"))
        .mkString("(\n", "\nUNION ALL\n", ")")
      val p2 = cols
        .map(block(_, "(SELECT * FROM lineitem WHERE l_quantity <= 45)",
          "v2"))
        .mkString("(\n", "\nUNION ALL\n", ")")
      s"""SELECT p1."column", n_rows_v1, ndv_v1, comp_v1,
         |       n_rows_v2, ndv_v2, comp_v2,
         |       n_rows_v2 - n_rows_v1 AS row_delta,
         |       ndv_v2 - ndv_v1 AS ndv_delta,
         |       comp_v2 - comp_v1 AS comp_delta,
         |       abs(ndv_v2 - ndv_v1) * 10 > ndv_v1
         |         OR comp_v2 - comp_v1 <> 0.0 AS drifted
         |FROM $p1 p1 JOIN $p2 p2 USING ("column")
         |ORDER BY p1."column"""".stripMargin
    },

    // q201's CUSUM windows partitioned by event type.
    "q223_cusum_by_type" ->
      """WITH h AS (
        |  SELECT event_type AS grp,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS t
        |  FROM h GROUP BY 1),
        |p AS (
        |  SELECT h.grp, bucket, x, t,
        |         CAST(sum(x * n - t) OVER (PARTITION BY h.grp
        |           ORDER BY bucket) AS BIGINT) AS pf
        |  FROM h JOIN tot USING (grp)),
        |s AS (
        |  SELECT grp, bucket, x, t,
        |         CAST(pf - least(CAST(0 AS BIGINT),
        |           min(pf) OVER (PARTITION BY grp ORDER BY bucket))
        |           AS BIGINT) AS cusum_scaled
        |  FROM p)
        |SELECT grp AS "group", bucket, x, cusum_scaled,
        |       cusum_scaled > t * 1 AS alarm
        |FROM s ORDER BY "group", bucket""".stripMargin,

    // First-3 prefix per user via ranked rows; path = ordered
    // string_agg; identical path strings share a depth by construction.
    "q224_top_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
        |         CAST(count(*) AS BIGINT) AS d
        |  FROM r WHERE rn <= 3 GROUP BY 1)
        |SELECT path, CAST(min(d) AS BIGINT) AS depth,
        |       CAST(count(*) AS BIGINT) AS n_keys
        |FROM p GROUP BY 1 ORDER BY n_keys DESC, path LIMIT 25""".stripMargin,

    // The three derived artifacts recomputed in SQL, each left-joined
    // on the delete set (doc_id % 97 = 0).
    "q225_delete_audit" -> {
      val kfold =
        """SELECT doc_id FROM (
          |  SELECT doc_id FROM (
          |    SELECT lang, doc_id,
          |           (((doc_id % 2147483648) * 2654435761) % 4294967296)
          |             AS hh
          |    FROM documents) h)""".stripMargin
      s"""WITH dels AS (
         |  SELECT doc_id AS del_id FROM documents WHERE doc_id % 97 = 0),
         |${oCdcChunkCtes("", "SELECT doc_id, text FROM documents")},
         |a1 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(count(del_id) AS BIGINT) AS n_residue
         |  FROM ch LEFT JOIN dels ON ch.doc_id = dels.del_id),
         |a2 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(count(del_id) AS BIGINT) AS n_residue
         |  FROM documents d LEFT JOIN dels ON d.doc_id = dels.del_id),
         |kf AS ($kfold),
         |a3 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(count(del_id) AS BIGINT) AS n_residue
         |  FROM kf LEFT JOIN dels ON kf.doc_id = dels.del_id)
         |SELECT * FROM (
         |  SELECT 'cdc_chunks' AS artifact, n_rows, n_residue,
         |         n_residue = 0 AS clean FROM a1
         |  UNION ALL SELECT 'signatures', n_rows, n_residue,
         |         n_residue = 0 FROM a2
         |  UNION ALL SELECT 'kfold', n_rows, n_residue,
         |         n_residue = 0 FROM a3)
         |ORDER BY artifact""".stripMargin
    },

    // q208's list windows partitioned by type.
    "q227_mad_by_type" ->
      """WITH h AS (
        |  SELECT event_type AS grp,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT grp, bucket, x,
        |         list(x) OVER (PARTITION BY grp ORDER BY bucket
        |           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS t
        |  FROM h),
        |m AS (
        |  SELECT grp, bucket, x,
        |         CASE WHEN len(t) = 7
        |              THEN list_sort(t)[4] END AS med, t
        |  FROM w)
        |SELECT grp AS "group", bucket, x, med,
        |       CASE WHEN med IS NOT NULL
        |            THEN list_sort(list_transform(t, v -> abs(v - med)))[4]
        |       END AS mad,
        |       CASE WHEN med IS NOT NULL
        |            THEN abs(x - med) >
        |                 list_sort(list_transform(t, v -> abs(v - med)))[4] * 3
        |       END AS alarm
        |FROM m ORDER BY "group", bucket""".stripMargin,

    // One-row composition of the audit oracles: rules, t-closeness,
    // diversity, wide pairs — cross-joined scalars.
    "q230_quality_verdict" ->
      s"""WITH cons AS (
         |  SELECT CAST(2 AS BIGINT) AS n_rules,
         |         CAST((CASE WHEN count(CASE WHEN text IS NULL THEN 1 END) > 0
         |                THEN 1 ELSE 0 END) +
         |              (CASE WHEN count(*) > count(DISTINCT doc_id)
         |                THEN 1 ELSE 0 END) AS BIGINT) AS rules_failed
         |  FROM documents),
         |s AS (SELECT lang, CAST(n_chars // 100 AS BIGINT) AS v
         |      FROM documents),
         |gv AS (SELECT lang, v, CAST(count(*) AS BIGINT) AS c
         |       FROM s GROUP BY 1, 2),
         |gl AS (SELECT v, CAST(count(*) AS BIGINT) AS cq FROM s GROUP BY 1),
         |glc AS (
         |  SELECT v, CAST(sum(cq) OVER (ORDER BY v) AS BIGINT) AS cumq,
         |         CAST(sum(cq) OVER () AS BIGINT) AS n,
         |         CAST(count(*) OVER () AS BIGINT) AS nv
         |  FROM gl),
         |gs AS (SELECT lang, CAST(count(*) AS BIGINT) AS group_size
         |       FROM s GROUP BY 1),
         |grid AS (
         |  SELECT gs.lang, gs.group_size, glc.v, glc.cumq, glc.n, glc.nv,
         |         CAST(coalesce(gv.c, 0) AS BIGINT) AS c
         |  FROM gs CROSS JOIN glc
         |  LEFT JOIN gv ON gv.lang = gs.lang AND gv.v = glc.v),
         |cc AS (
         |  SELECT lang, group_size, n, nv, cumq,
         |         CAST(sum(c) OVER (PARTITION BY lang ORDER BY v)
         |           AS BIGINT) AS cump
         |  FROM grid),
         |tl AS (
         |  SELECT lang,
         |         CAST(sum(abs(cump * n - cumq * group_size)) AS DOUBLE)
         |           / CAST(group_size * n * (nv - 1) AS DOUBLE) AS t
         |  FROM cc GROUP BY lang, group_size, n, nv),
         |tc AS (
         |  SELECT CAST(count(CASE WHEN NOT (t <= 0.2) THEN 1 END) AS BIGINT)
         |           AS langs_leaking,
         |         max(t) AS max_t
         |  FROM tl),
         |dh AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
         |       FROM documents GROUP BY 1, 2),
         |da AS (
         |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
         |         CAST(sum(c * c) AS BIGINT) AS sq
         |  FROM dh GROUP BY 1),
         |div_ AS (
         |  SELECT min(CAST(n * n AS DOUBLE) / CAST(sq AS DOUBLE))
         |           AS min_inv_simpson
         |  FROM da),
         |${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |dp AS (
         |  SELECT CAST(count(*) AS BIGINT) AS dup_pairs
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT nn.n_docs, cons.n_rules, cons.rules_failed,
         |       tc.langs_leaking, tc.max_t, div_.min_inv_simpson,
         |       dp.dup_pairs,
         |       cons.rules_failed = 0 AND tc.langs_leaking = 0
         |         AND div_.min_inv_simpson >= 1.5
         |         AND dp.dup_pairs * 20 < nn.n_docs AS ship
         |FROM nn CROSS JOIN cons CROSS JOIN tc CROSS JOIN div_
         |CROSS JOIN dp""".stripMargin,

    // q173's grid cells, each contrib quantized to 2^30 before the
    // exact sum; one sqrt at the end.
    "q228_cramers_v" ->
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT lang, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |fl AS (
        |  SELECT r.source, c.lang, CAST(COALESCE(cl.o, 0) AS BIGINT) AS o,
        |         r.rt, c.ct, nn.n
        |  FROM rt r CROSS JOIN nn CROSS JOIN ct c
        |  LEFT JOIN cells cl ON cl.source = r.source AND cl.lang = c.lang),
        |q AS (
        |  SELECT n,
        |         CAST(floor(
        |           (CAST(o * n - rt * ct AS DOUBLE) *
        |            CAST(o * n - rt * ct AS DOUBLE)) /
        |           (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |           * 1073741824) AS BIGINT) AS cq,
        |         source, lang
        |  FROM fl),
        |a AS (
        |  SELECT CAST(min(n) AS BIGINT) AS n,
        |         CAST(count(DISTINCT source) AS BIGINT) AS r,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS c,
        |         CAST(sum(cq) AS BIGINT) AS chi2_fp
        |  FROM q)
        |SELECT n, r, c, chi2_fp,
        |       CAST(chi2_fp AS DOUBLE) / 1073741824 AS chi2,
        |       CASE WHEN least(r - 1, c - 1) > 0
        |            THEN sqrt((CAST(chi2_fp AS DOUBLE) / 1073741824
        |                       / CAST(n AS DOUBLE))
        |                      / CAST(least(r - 1, c - 1) AS DOUBLE))
        |       END AS v
        |FROM a""".stripMargin,

    // Two q158 chains (full vs every-11th-dropped) joined per dim.
    "q229_embed_drift" -> {
      def chain(sfx: String, where: String) =
        s"""ev$sfx AS (
           |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings $where),
           |px$sfx AS (
           |  SELECT t.i AS dim, v[t.i + 1] AS x FROM ev$sfx, range(64) t(i)),
           |fx$sfx AS (
           |  SELECT dim, CAST(floor(x * 1048576) AS BIGINT) AS f
           |  FROM px$sfx),
           |ag$sfx AS (
           |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(f) AS BIGINT) AS s,
           |         CAST(sum(CAST(floor(x * x * 1048576) AS BIGINT)) AS BIGINT)
           |           AS s2
           |  FROM (SELECT dim, x, CAST(floor(x * 1048576) AS BIGINT) AS f
           |        FROM px$sfx) GROUP BY 1)""".stripMargin
      def stats(sfx: String) =
        s"""SELECT dim, n AS n_$sfx, s AS sum_$sfx,
           |       CAST(s AS DOUBLE) / CAST(n * 1048576 AS DOUBLE)
           |         AS mean_$sfx,
           |       sqrt(greatest(0.0,
           |         (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
           |          CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 1048576) /
           |         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1048576)))
           |         AS std_$sfx
           |FROM ag$sfx""".stripMargin
      s"""WITH ${chain("1", "")},
         |${chain("2", "WHERE vec_id % 11 <> 0")},
         |s1 AS (${stats("1")}),
         |s2 AS (${stats("2")})
         |SELECT s1.dim, n_1 AS n_v1, sum_1 AS sum_v1, mean_1 AS mean_v1,
         |       std_1 AS std_v1, n_2 AS n_v2, sum_2 AS sum_v2,
         |       mean_2 AS mean_v2, std_2 AS std_v2,
         |       mean_2 - mean_1 AS mean_shift
         |FROM s1 JOIN s2 ON s1.dim = s2.dim
         |ORDER BY s1.dim""".stripMargin
    },

    // Exact descending-rank ordinals (row_number − 1, ties by doc_id),
    // balanced bucket = (ord·10) // N, then cumulative BIGINT counts;
    // one division per ratio.
    "q231_decile_lift" ->
      s"""WITH $oDistillScoredCtes,
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM scored),
         |rk AS (
         |  SELECT keep,
         |         CAST(row_number() OVER (ORDER BY zq DESC, doc_id) - 1
         |           AS BIGINT) AS ord
         |  FROM scored),
         |dec AS (
         |  SELECT CAST((ord * 10) // nn AS BIGINT) AS decile, keep
         |  FROM rk, tot),
         |h AS (
         |  SELECT decile, CAST(count(*) AS BIGINT) AS n,
         |         CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_pos
         |  FROM dec GROUP BY 1),
         |c AS (
         |  SELECT decile, n, n_pos,
         |         CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
         |         CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT)
         |           AS cum_pos,
         |         CAST(sum(n_pos) OVER () AS BIGINT) AS p,
         |         CAST(sum(n) OVER () AS BIGINT) AS nall
         |  FROM h)
         |SELECT decile, n, n_pos, cum_n, cum_pos,
         |       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
         |       CASE WHEN p > 0
         |            THEN CAST(cum_pos AS DOUBLE) / CAST(p AS DOUBLE)
         |       END AS cum_gain,
         |       CASE WHEN p > 0
         |            THEN CAST(cum_pos * nall AS DOUBLE) /
         |                 CAST(cum_n * p AS DOUBLE)
         |       END AS lift
         |FROM c ORDER BY decile""".stripMargin,

    // q99's hash-bucket split, the k-th-smallest calibration-positive
    // score as min(s) where ascending cum ≥ k = (n_cal+1) // 10, then
    // held-split coverage/pass counts — BIGINTs + one division each.
    "q232_conformal_gate" ->
      s"""WITH $oDistillScoredCtes,
         |b AS (
         |  SELECT doc_id, zq, keep,
         |         (((doc_id % 2147483648) * 2654435761) % 4294967296)
         |           % 100 < 50 AS cal
         |  FROM scored),
         |ch AS (
         |  SELECT zq AS s, CAST(count(*) AS BIGINT) AS c
         |  FROM b WHERE cal AND keep GROUP BY 1),
         |cc AS (
         |  SELECT s, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum,
         |         CAST(sum(c) OVER () AS BIGINT) AS ncal
         |  FROM ch),
         |caln AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cal
         |  FROM b WHERE cal AND keep),
         |thr AS (
         |  SELECT min(s) AS t FROM cc
         |  WHERE cum >= (ncal + 1) // 10 AND (ncal + 1) // 10 >= 1),
         |tst AS (
         |  SELECT CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT)
         |           AS n_test_pos,
         |         CAST(count(CASE WHEN keep AND (t IS NULL OR zq >= t)
         |                         THEN 1 END) AS BIGINT) AS n_test_cov,
         |         CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT)
         |           AS n_test_neg,
         |         CAST(count(CASE WHEN NOT keep AND (t IS NULL OR zq >= t)
         |                         THEN 1 END) AS BIGINT) AS n_neg_pass,
         |         min(t) AS threshold
         |  FROM b, thr WHERE NOT cal)
         |SELECT n_cal, CAST((n_cal + 1) // 10 AS BIGINT) AS k, threshold,
         |       n_test_pos, n_test_cov,
         |       CASE WHEN n_test_pos > 0
         |            THEN CAST(n_test_cov AS DOUBLE) /
         |                 CAST(n_test_pos AS DOUBLE) END AS coverage,
         |       n_test_neg, n_neg_pass,
         |       CASE WHEN n_test_neg > 0
         |            THEN CAST(n_neg_pass AS DOUBLE) /
         |                 CAST(n_test_neg AS DOUBLE) END AS neg_pass_rate
         |FROM caln, tst""".stripMargin,

    // Histogram rank-sum identity: a run of c copies of v after cum0
    // predecessors contributes v·(c·cum0 + c(c+1)/2) to Σ rank·x;
    // G = (2·ranksum − (n+1)·total) / (n·total).
    "q233_gini_chars" ->
      """WITH h AS (
        |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
        |  GROUP BY 1, 2),
        |cc AS (
        |  SELECT source, v, c,
        |         CAST(COALESCE(sum(c) OVER (PARTITION BY source ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS cum0
        |  FROM h),
        |a AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(sum(v * c) AS BIGINT) AS total,
        |         CAST(sum(v * (c * cum0 + c * (c + 1) // 2)) AS BIGINT)
        |           AS rank_sum
        |  FROM cc GROUP BY 1)
        |SELECT source, n, total, rank_sum,
        |       CASE WHEN total > 0
        |            THEN CAST(2 * rank_sum - (n + 1) * total AS DOUBLE) /
        |                 CAST(n * total AS DOUBLE) END AS gini
        |FROM a ORDER BY source""".stripMargin,

    // Leading digit from the BIGINT's decimal string (engine-identical
    // integer formatting — no float log10); Benford expectations as
    // literal doubles; χ² terms quantized to 2^30 before the 9-row sum.
    "q234_benford" ->
      """WITH e(digit, expected_p) AS (VALUES
        |  (1, CAST(0.3010299956639812 AS DOUBLE)),
        |  (2, CAST(0.17609125905568124 AS DOUBLE)),
        |  (3, CAST(0.12493873660829992 AS DOUBLE)),
        |  (4, CAST(0.09691001300805642 AS DOUBLE)),
        |  (5, CAST(0.07918124604762482 AS DOUBLE)),
        |  (6, CAST(0.06694678963061322 AS DOUBLE)),
        |  (7, CAST(0.05799194697768673 AS DOUBLE)),
        |  (8, CAST(0.05115252244738129 AS DOUBLE)),
        |  (9, CAST(0.04575749056067514 AS DOUBLE))),
        |v AS (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |    AND CAST(floor(o_totalprice) AS BIGINT) > 0),
        |cnt AS (
        |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |         CAST(count(*) AS BIGINT) AS observed
        |  FROM v GROUP BY 1),
        |j AS (
        |  SELECT e.digit, e.expected_p,
        |         CAST(COALESCE(cnt.observed, 0) AS BIGINT) AS observed
        |  FROM e LEFT JOIN cnt ON e.digit = cnt.digit),
        |w AS (
        |  SELECT digit, observed, expected_p,
        |         CAST(sum(observed) OVER () AS BIGINT) AS n
        |  FROM j),
        |tm AS (
        |  SELECT digit, observed, n, expected_p,
        |         CAST(floor((CAST(observed AS DOUBLE) -
        |             expected_p * CAST(n AS DOUBLE)) *
        |           (CAST(observed AS DOUBLE) -
        |             expected_p * CAST(n AS DOUBLE)) /
        |           (expected_p * CAST(n AS DOUBLE)) *
        |           CAST(1073741824.0 AS DOUBLE)) AS BIGINT) AS term_fp
        |  FROM w)
        |SELECT digit, observed, n,
        |       CAST(observed AS DOUBLE) / CAST(n AS DOUBLE) AS obs_p,
        |       expected_p, term_fp,
        |       CAST(sum(term_fp) OVER () AS BIGINT) AS chi2_fp,
        |       CAST(CAST(sum(term_fp) OVER () AS BIGINT) AS DOUBLE) /
        |         CAST(1073741824.0 AS DOUBLE) AS chi2
        |FROM tm ORDER BY digit""".stripMargin,

    // Per-group exact (n, Σv, Σv²); each group's Σ²/n quantized to 2^10
    // before the cross-group BIGINT total; SSB/SSW/η²/F as fixed-shape
    // double arithmetic on exact integers.
    "q235_anova_chars" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS ng,
        |         CAST(sum(n_chars) AS BIGINT) AS s,
        |         CAST(sum(n_chars * n_chars) AS BIGINT) AS q
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |gf AS (
        |  SELECT ng, s, q,
        |         CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
        |           CAST(ng AS DOUBLE) * CAST(1024.0 AS DOUBLE)) AS BIGINT)
        |           AS sbfp
        |  FROM g),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |         CAST(sum(s) AS BIGINT) AS ts, CAST(sum(q) AS BIGINT) AS tq,
        |         CAST(sum(sbfp) AS BIGINT) AS sbf
        |  FROM gf)
        |SELECT k, n,
        |       CAST(sbf AS DOUBLE) / CAST(1024.0 AS DOUBLE) -
        |         CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) /
        |           CAST(n AS DOUBLE) AS ssb,
        |       CAST(tq AS DOUBLE) -
        |         CAST(sbf AS DOUBLE) / CAST(1024.0 AS DOUBLE) AS ssw,
        |       CASE WHEN (CAST(tq AS DOUBLE) -
        |                  CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) /
        |                    CAST(n AS DOUBLE)) > 0
        |            THEN (CAST(sbf AS DOUBLE) / CAST(1024.0 AS DOUBLE) -
        |                  CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) /
        |                    CAST(n AS DOUBLE)) /
        |                 (CAST(tq AS DOUBLE) -
        |                  CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) /
        |                    CAST(n AS DOUBLE))
        |       END AS eta2,
        |       CASE WHEN k > 1 AND n > k AND
        |                 (CAST(tq AS DOUBLE) -
        |                  CAST(sbf AS DOUBLE) / CAST(1024.0 AS DOUBLE)) > 0
        |            THEN ((CAST(sbf AS DOUBLE) / CAST(1024.0 AS DOUBLE) -
        |                   CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) /
        |                     CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
        |                 ((CAST(tq AS DOUBLE) -
        |                   CAST(sbf AS DOUBLE) / CAST(1024.0 AS DOUBLE)) /
        |                  CAST(n - k AS DOUBLE))
        |       END AS f
        |FROM a""".stripMargin,

    // (x, y) cell histogram on BINNED values, lexicographic cell-pair
    // join for concordant/discordant mass, tie terms from marginals.
    "q236_kendall" ->
      s"""WITH d AS (
         |  SELECT n_chars // 50 AS xb,
         |         CAST(len($oToks) AS BIGINT) // 10 AS yb
         |  FROM documents),
         |dd AS (SELECT xb, yb FROM d
         |       WHERE xb IS NOT NULL AND yb IS NOT NULL),
         |cells AS (
         |  SELECT xb AS x, yb AS y, CAST(count(*) AS BIGINT) AS c
         |  FROM dd GROUP BY 1, 2),
         |p AS (
         |  SELECT CAST(COALESCE(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
         |                                THEN a.c * b.c END), 0) AS BIGINT)
         |           AS concordant,
         |         CAST(COALESCE(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
         |                                THEN a.c * b.c END), 0) AS BIGINT)
         |           AS discordant
         |  FROM cells a JOIN cells b
         |    ON (a.x < b.x) OR (a.x = b.x AND a.y < b.y)),
         |t1 AS (
         |  SELECT CAST(COALESCE(sum(t * (t - 1) // 2), 0) AS BIGINT) AS n1
         |  FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY x)),
         |t2 AS (
         |  SELECT CAST(COALESCE(sum(t * (t - 1) // 2), 0) AS BIGINT) AS n2
         |  FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY y)),
         |tot AS (
         |  SELECT n, n * (n - 1) // 2 AS n0 FROM
         |    (SELECT CAST(count(*) AS BIGINT) AS n FROM dd))
         |SELECT n, n0, n1, n2, concordant, discordant,
         |       CASE WHEN n0 > n1 AND n0 > n2
         |            THEN CAST(concordant - discordant AS DOUBLE) /
         |                 sqrt(CAST(n0 - n1 AS DOUBLE) *
         |                      CAST(n0 - n2 AS DOUBLE)) END AS tau_b
         |FROM tot, t1, t2, p""".stripMargin,

    // Clamped integer grid cells, core = count >= 4, 8-neighborhood
    // edges between core cells (both directions from the double loop),
    // recursive-CTE components seeded per core cell (q47's fixpoint),
    // point labels via the encoded cell id.
    "q237_density_clusters" ->
      """WITH RECURSIVE pts AS (
        |  SELECT vec_id,
        |         greatest(-1048576, least(1048576,
        |           CAST(floor(CAST(embedding AS DOUBLE[])[1] *
        |             CAST(16.0 AS DOUBLE)) AS BIGINT))) AS cx,
        |         greatest(-1048576, least(1048576,
        |           CAST(floor(CAST(embedding AS DOUBLE[])[2] *
        |             CAST(16.0 AS DOUBLE)) AS BIGINT))) AS cy
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) > 1),
        |cells AS (
        |  SELECT cx, cy, CAST(count(*) AS BIGINT) AS c
        |  FROM pts GROUP BY 1, 2),
        |core AS (
        |  SELECT cx, cy, (cx + 1048576) * 4194304 + (cy + 1048576) AS node
        |  FROM cells WHERE c >= 4),
        |edges AS (
        |  SELECT a.node AS u, b.node AS v
        |  FROM core a, range(-1, 2) dx(dx), range(-1, 2) dy(dy)
        |  JOIN core b ON b.cx = a.cx + dx.dx AND b.cy = a.cy + dy.dy),
        |reach(node, comp) AS (
        |  SELECT node, node FROM core
        |  UNION
        |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
        |lab AS (SELECT node, min(comp) AS cluster FROM reach GROUP BY node)
        |SELECT p.vec_id, p.cx, p.cy, l.cluster, l.cluster IS NULL AS noise
        |FROM pts p LEFT JOIN lab l
        |  ON l.node = (p.cx + 1048576) * 4194304 + (p.cy + 1048576)
        |ORDER BY p.vec_id""".stripMargin,

    // q229's fixed-point per-dim chain; each dim's mean^2 quantized to
    // 2^30 before the 64-row BIGINT total, E||v||^2 from the exact
    // floor(x*x*2^20) sums.
    "q238_anisotropy" ->
      """WITH ev AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |px AS (
        |  SELECT t.i AS dim, v[t.i + 1] AS x FROM ev, range(64) t(i)),
        |ag AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(floor(x * 1048576) AS BIGINT)) AS BIGINT)
        |           AS s,
        |         CAST(sum(CAST(floor(x * x * 1048576) AS BIGINT)) AS BIGINT)
        |           AS s2
        |  FROM px GROUP BY 1),
        |m AS (
        |  SELECT dim, n, s2,
        |         CAST(floor((CAST(s AS DOUBLE) /
        |             CAST(n * 1048576 AS DOUBLE)) *
        |           (CAST(s AS DOUBLE) / CAST(n * 1048576 AS DOUBLE)) *
        |           CAST(1073741824.0 AS DOUBLE)) AS BIGINT) AS m2fp
        |  FROM ag),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS dims,
        |         CAST(max(n) AS BIGINT) AS n,
        |         CAST(sum(m2fp) AS BIGINT) AS msfp,
        |         CAST(sum(s2) AS BIGINT) AS ssf
        |  FROM m)
        |SELECT dims, n,
        |       CAST(msfp AS DOUBLE) / CAST(1073741824.0 AS DOUBLE)
        |         AS mean_norm_sq,
        |       CAST(ssf AS DOUBLE) / CAST(n * 1048576 AS DOUBLE)
        |         AS avg_norm_sq,
        |       CASE WHEN CAST(ssf AS DOUBLE) / CAST(n * 1048576 AS DOUBLE)
        |                 > 0
        |            THEN (CAST(msfp AS DOUBLE) /
        |                  CAST(1073741824.0 AS DOUBLE)) /
        |                 (CAST(ssf AS DOUBLE) /
        |                  CAST(n * 1048576 AS DOUBLE))
        |       END AS anisotropy
        |FROM a""".stripMargin,

    // Daily histogram → PAA frame sums → q75's value-ntile symbol
    // formula (cum·k−1)//n + 1 → 3-symbol words over contiguous frames
    // only (the lead(f,2) = f+2 guard), counted exactly.
    "q239_sax_motifs" ->
      """WITH h AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS b,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |paa AS (
        |  SELECT b // 2 AS f, CAST(sum(x) AS BIGINT) AS s
        |  FROM h GROUP BY 1),
        |hist AS (SELECT s, CAST(count(*) AS BIGINT) AS c
        |         FROM paa GROUP BY 1),
        |cum AS (
        |  SELECT s, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum,
        |         CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM hist),
        |bk AS (SELECT s, CAST((cum * 4 - 1) // n AS BIGINT) + 1 AS sym
        |       FROM cum),
        |symt AS (SELECT f, sym FROM paa JOIN bk USING (s)),
        |w AS (
        |  SELECT f,
        |         CAST(sym AS VARCHAR) ||
        |           CAST(lead(sym, 1) OVER (ORDER BY f) AS VARCHAR) ||
        |           CAST(lead(sym, 2) OVER (ORDER BY f) AS VARCHAR) AS word,
        |         lead(f, 2) OVER (ORDER BY f) AS lf
        |  FROM symt),
        |v AS (SELECT f, word FROM w WHERE lf = f + 2),
        |g AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS n_frames,
        |         CAST(min(f) AS BIGINT) AS first_frame
        |  FROM v GROUP BY 1)
        |SELECT word, n_frames, first_frame,
        |       CAST(n_frames AS DOUBLE) /
        |         CAST(CAST(sum(n_frames) OVER () AS BIGINT) AS DOUBLE)
        |           AS support
        |FROM g ORDER BY word""".stripMargin,

    // Exact covariance numerators n·Σxy − Σx·Σy per lang and pooled;
    // association = integer sign, reversal = strict sign opposition.
    "q240_simpson_audit" ->
      """WITH b AS (
        |  SELECT lang, n_chars AS x,
        |         CAST(len(regexp_extract_all(text,
        |           '[^a-zA-Z0-9 \t\n\f\r]')) AS BIGINT) AS y
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |g AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) * CAST(sum(x * y) AS BIGINT) -
        |           CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT)
        |           AS cov_num
        |  FROM b GROUP BY 1),
        |p AS (
        |  SELECT CAST(count(*) AS BIGINT) * CAST(sum(x * y) AS BIGINT) -
        |           CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT)
        |           AS pooled_num
        |  FROM b),
        |sg AS (
        |  SELECT lang, n, cov_num,
        |         CAST(CASE WHEN cov_num > 0 THEN 1
        |                   WHEN cov_num < 0 THEN -1 ELSE 0 END AS BIGINT)
        |           AS group_sign
        |  FROM g),
        |sp AS (
        |  SELECT pooled_num,
        |         CAST(CASE WHEN pooled_num > 0 THEN 1
        |                   WHEN pooled_num < 0 THEN -1 ELSE 0 END AS BIGINT)
        |           AS pooled_sign
        |  FROM p)
        |SELECT lang, n, cov_num, group_sign, pooled_num, pooled_sign,
        |       group_sign * pooled_sign = -1 AS reversed
        |FROM sg, sp ORDER BY lang""".stripMargin,

    // Frequency-ranked vocab (row_number over count DESC, token — the
    // engine's histogram-offset ordinals), per-position encode join,
    // list(id ORDER BY p) re-assembly; empty docs keep empty arrays.
    "q241_dict_encode" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |tokp AS (
         |  SELECT doc_id, unnest(range(len(tk))) AS p, tk FROM toks),
         |tok AS (SELECT doc_id, p, tk[p + 1] AS t FROM tokp),
         |cnt AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS cnt,
         |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tok GROUP BY 1),
         |vocab AS (
         |  SELECT t, CAST(row_number() OVER (ORDER BY cnt DESC, t) - 1
         |    AS BIGINT) AS vid
         |  FROM cnt WHERE df >= 2),
         |enc AS (
         |  SELECT tok.doc_id, tok.p,
         |         CAST(COALESCE(v.vid, -1) AS BIGINT) AS id
         |  FROM tok LEFT JOIN vocab v ON v.t = tok.t),
         |agg AS (
         |  SELECT doc_id, list(id ORDER BY p) AS ids,
         |         CAST(count(*) AS BIGINT) AS n_tokens,
         |         CAST(count(CASE WHEN id = -1 THEN 1 END) AS BIGINT)
         |           AS n_oov
         |  FROM enc GROUP BY 1)
         |SELECT d.doc_id,
         |       COALESCE(array_to_string(a.ids, ','), '') AS ids,
         |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(COALESCE(a.n_oov, 0) AS BIGINT) AS n_oov
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Distinct-token baskets, level-1 df prune, per-doc pair join,
    // level-2 pair floor; metrics are single divisions of exact counts,
    // top-30 by (lift DESC, a, b) — a total order, engine-stable.
    "q242_assoc_rules" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |it AS (
         |  SELECT doc_id, unnest(list_distinct(tk)) AS t FROM toks),
         |fr AS (SELECT t, CAST(count(*) AS BIGINT) AS df
         |       FROM it GROUP BY 1),
         |bask AS (
         |  SELECT it.doc_id, it.t, fr.df
         |  FROM it JOIN fr USING (t) WHERE fr.df >= 50),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |p AS (
         |  SELECT x.t AS a, y.t AS b, x.df AS c_a, y.df AS c_b,
         |         CAST(count(*) AS BIGINT) AS c_ab
         |  FROM bask x JOIN bask y
         |    ON x.doc_id = y.doc_id AND x.t < y.t
         |  GROUP BY 1, 2, 3, 4),
         |f AS (SELECT * FROM p, nd WHERE c_ab >= 25)
         |SELECT a, b, n_docs, c_a, c_b, c_ab,
         |       CAST(c_ab AS DOUBLE) / CAST(n_docs AS DOUBLE) AS support,
         |       CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE) AS conf_a_b,
         |       CAST(c_ab AS DOUBLE) / CAST(c_b AS DOUBLE) AS conf_b_a,
         |       CAST(c_ab * n_docs AS DOUBLE) / CAST(c_a * c_b AS DOUBLE)
         |         AS lift
         |FROM f ORDER BY lift DESC, a, b LIMIT 30""".stripMargin,

    // q97's truth/candidate CTEs + the n(n−1)/2 comparison base;
    // RR, PC, and their harmonic mean each one division.
    "q243_blocking_quality" ->
      s"""WITH ${oJaccardCtes(2)},
         |truth AS (SELECT i, j FROM jac WHERE jaccard >= 0.6),
         |${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |cand AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |hit AS (SELECT i, j FROM truth INTERSECT SELECT i, j FROM cand),
         |base AS (
         |  SELECT CAST((SELECT count(*) FROM documents) AS BIGINT)
         |           AS n_records,
         |         CAST((SELECT count(*) FROM cand) AS BIGINT)
         |           AS n_candidates,
         |         CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
         |         CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_found),
         |m AS (
         |  SELECT n_records, n_records * (n_records - 1) // 2 AS n_all_pairs,
         |         n_candidates, n_truth, n_found,
         |         CASE WHEN n_records * (n_records - 1) // 2 > 0
         |              THEN CAST(1.0 AS DOUBLE) -
         |                   CAST(n_candidates AS DOUBLE) /
         |                   CAST(n_records * (n_records - 1) // 2 AS DOUBLE)
         |         END AS reduction_ratio,
         |         CASE WHEN n_truth > 0
         |              THEN CAST(n_found AS DOUBLE) / CAST(n_truth AS DOUBLE)
         |         END AS pair_completeness
         |  FROM base)
         |SELECT n_records, n_all_pairs, n_candidates, reduction_ratio,
         |       n_truth, n_found, pair_completeness,
         |       CASE WHEN reduction_ratio + pair_completeness > 0.0
         |            THEN CAST(2.0 AS DOUBLE) * reduction_ratio *
         |                 pair_completeness /
         |                 (reduction_ratio + pair_completeness)
         |       END AS quality
         |FROM m""".stripMargin,

    // n_h·σ_h = sqrt(n·Σv² − (Σv)²) exactly — one sqrt per stratum,
    // 2^20 fixed-point weights, floor allocation, remainder reported.
    "q244_neyman_alloc" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(n_chars) AS BIGINT) AS s,
        |         CAST(sum(n_chars * n_chars) AS BIGINT) AS q
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |w AS (
        |  SELECT source, n, n * q - s * s AS var_num,
        |         CAST(floor(sqrt(CAST(greatest(n * q - s * s, 0)
        |             AS DOUBLE)) * CAST(1048576.0 AS DOUBLE)) AS BIGINT)
        |           AS weight_fp
        |  FROM g),
        |tw AS (SELECT CAST(sum(weight_fp) AS BIGINT) AS tw FROM w),
        |al AS (
        |  SELECT source, n, var_num, weight_fp,
        |         CAST(CASE WHEN tw > 0 THEN (100 * weight_fp) // tw
        |                   ELSE 0 END AS BIGINT) AS alloc,
        |         CASE WHEN tw > 0
        |              THEN CAST(weight_fp AS DOUBLE) / CAST(tw AS DOUBLE)
        |         END AS share
        |  FROM w, tw)
        |SELECT source, n, var_num, weight_fp, alloc, share,
        |       100 - CAST((SELECT sum(alloc) FROM al) AS BIGINT)
        |         AS remainder
        |FROM al ORDER BY source""".stripMargin,

    // Straight lag-window recount of runs (the oracle may funnel — it
    // is DuckDB); identical fixed-shape double tail.
    "q245_runs_test" ->
      """WITH b AS (
        |  SELECT doc_id, (lang = 'en') AS a FROM documents
        |  WHERE (lang = 'en') IS NOT NULL),
        |l AS (SELECT a, lag(a) OVER (ORDER BY doc_id) AS pa FROM b),
        |r AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(CASE WHEN a THEN 1 END) AS BIGINT) AS n1,
        |         CAST(count(CASE WHEN NOT a THEN 1 END) AS BIGINT) AS n2,
        |         CAST(count(CASE WHEN pa IS NOT NULL AND a <> pa
        |                         THEN 1 END) + 1 AS BIGINT) AS runs0
        |  FROM l)
        |SELECT n, n1, n2,
        |       CASE WHEN n > 0 THEN runs0 END AS runs,
        |       CASE WHEN n > 0
        |            THEN CAST(1.0 AS DOUBLE) +
        |                 CAST(2.0 AS DOUBLE) * CAST(n1 AS DOUBLE) *
        |                   CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE)
        |       END AS expected_runs,
        |       CASE WHEN n > 1 AND n1 > 0 AND n2 > 0
        |            THEN CAST(2.0 AS DOUBLE) * CAST(n1 AS DOUBLE) *
        |                   CAST(n2 AS DOUBLE) *
        |                 (CAST(2.0 AS DOUBLE) * CAST(n1 AS DOUBLE) *
        |                    CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE)) /
        |                 (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
        |                  (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)))
        |       END AS variance,
        |       CASE WHEN n > 1 AND n1 > 0 AND n2 > 0 AND
        |                 CAST(2.0 AS DOUBLE) * CAST(n1 AS DOUBLE) *
        |                   CAST(n2 AS DOUBLE) *
        |                 (CAST(2.0 AS DOUBLE) * CAST(n1 AS DOUBLE) *
        |                    CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE)) /
        |                 (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
        |                  (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE))) > 0
        |            THEN (CAST(runs0 AS DOUBLE) -
        |                  (CAST(1.0 AS DOUBLE) +
        |                   CAST(2.0 AS DOUBLE) * CAST(n1 AS DOUBLE) *
        |                     CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE))) /
        |                 sqrt(CAST(2.0 AS DOUBLE) * CAST(n1 AS DOUBLE) *
        |                        CAST(n2 AS DOUBLE) *
        |                      (CAST(2.0 AS DOUBLE) * CAST(n1 AS DOUBLE) *
        |                         CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE)) /
        |                      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
        |                       (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE))))
        |       END AS z
        |FROM r""".stripMargin,

    // Full old-vs-new join recompute, aggregated per priority and
    // diffed — the identity the delta operator must satisfy.
    "q246_incr_join" ->
      """WITH a_old AS (
        |  SELECT l_orderkey AS k, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |b_old AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS prio FROM orders),
        |a_new AS (
        |  SELECT k, qty FROM a_old WHERE k % 37 <> 0
        |  UNION ALL
        |  SELECT k, qty + 100 FROM a_old WHERE k % 41 = 0),
        |b_new AS (
        |  SELECT k, prio FROM b_old WHERE k % 53 <> 0
        |  UNION ALL
        |  SELECT k, '9-CHANGED' AS prio FROM b_old WHERE k % 53 = 0),
        |j_old AS (
        |  SELECT prio, CAST(count(*) AS BIGINT) AS rows_,
        |         CAST(sum(qty) AS BIGINT) AS qty_
        |  FROM a_old JOIN b_old USING (k) GROUP BY 1),
        |j_new AS (
        |  SELECT prio, CAST(count(*) AS BIGINT) AS rows_,
        |         CAST(sum(qty) AS BIGINT) AS qty_
        |  FROM a_new JOIN b_new USING (k) GROUP BY 1),
        |d AS (
        |  SELECT COALESCE(n.prio, o.prio) AS prio,
        |         CAST(COALESCE(n.rows_, 0) - COALESCE(o.rows_, 0)
        |           AS BIGINT) AS net_rows,
        |         CAST(COALESCE(n.qty_, 0) - COALESCE(o.qty_, 0)
        |           AS BIGINT) AS net_qty
        |  FROM j_new n FULL OUTER JOIN j_old o ON n.prio = o.prio)
        |SELECT prio, net_rows, net_qty FROM d
        |WHERE net_rows <> 0 OR net_qty <> 0
        |ORDER BY prio""".stripMargin,

    // Degree-capped actor baskets pair under a<b; RA reciprocals are
    // 10^9 // deg exact integers; Jaccard/PA one division each.
    "q247_link_prediction" ->
      """WITH ai AS (
        |  SELECT DISTINCT l_orderkey AS actor, l_partkey AS item
        |  FROM lineitem),
        |adeg AS (SELECT actor, CAST(count(*) AS BIGINT) AS adeg
        |         FROM ai GROUP BY 1),
        |ideg AS (SELECT item, CAST(count(*) AS BIGINT) AS ideg
        |         FROM ai GROUP BY 1),
        |cap AS (
        |  SELECT ai.actor, ai.item, a.adeg
        |  FROM ai JOIN adeg a USING (actor) WHERE a.adeg <= 6),
        |p AS (
        |  SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS cn,
        |         CAST(sum(1000000000 // x.adeg) AS BIGINT) AS ra_fp
        |  FROM cap x JOIN cap y
        |    ON x.actor = y.actor AND x.item < y.item
        |  GROUP BY 1, 2)
        |SELECT p.a AS item_a, p.b AS item_b, cn, ra_fp,
        |       da.ideg AS deg_a, db.ideg AS deg_b,
        |       CAST(cn AS DOUBLE) / CAST(da.ideg + db.ideg - cn AS DOUBLE)
        |         AS jaccard,
        |       da.ideg * db.ideg AS pa
        |FROM p JOIN ideg da ON da.item = p.a
        |JOIN ideg db ON db.item = p.b
        |ORDER BY ra_fp DESC, item_a, item_b LIMIT 40""".stripMargin,

    // q99's bucket arithmetic labels the split; then the q234 χ²
    // machinery against the promised 80/10/10 shares.
    "q248_srm" ->
      """WITH e(label, expected_p) AS (VALUES
        |  ('train', CAST(0.8 AS DOUBLE)),
        |  ('val', CAST(0.1 AS DOUBLE)),
        |  ('test', CAST(0.1 AS DOUBLE))),
        |b AS (
        |  SELECT CASE WHEN bkt < 80 THEN 'train'
        |              WHEN bkt < 90 THEN 'val' ELSE 'test' END AS label
        |  FROM (SELECT (((doc_id % 2147483648) * 2654435761)
        |                  % 4294967296) % 100 AS bkt FROM documents)),
        |cnt AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS observed
        |  FROM b GROUP BY 1),
        |j AS (
        |  SELECT e.label, e.expected_p,
        |         CAST(COALESCE(cnt.observed, 0) AS BIGINT) AS observed
        |  FROM e LEFT JOIN cnt USING (label)),
        |w AS (
        |  SELECT label, observed, expected_p,
        |         CAST(sum(observed) OVER () AS BIGINT) AS n
        |  FROM j),
        |tm AS (
        |  SELECT label, observed, n, expected_p,
        |         CAST(floor((CAST(observed AS DOUBLE) -
        |             expected_p * CAST(n AS DOUBLE)) *
        |           (CAST(observed AS DOUBLE) -
        |             expected_p * CAST(n AS DOUBLE)) /
        |           (expected_p * CAST(n AS DOUBLE)) *
        |           CAST(1073741824.0 AS DOUBLE)) AS BIGINT) AS term_fp
        |  FROM w)
        |SELECT label, observed, n,
        |       CAST(observed AS DOUBLE) / CAST(n AS DOUBLE) AS obs_p,
        |       expected_p, term_fp,
        |       CAST(sum(term_fp) OVER () AS BIGINT) AS chi2_fp,
        |       CAST(CAST(sum(term_fp) OVER () AS BIGINT) AS DOUBLE) /
        |         CAST(1073741824.0 AS DOUBLE) AS chi2
        |FROM tm ORDER BY label""".stripMargin,

    // First-occurrence doc per token off the histogram; each checkpoint
    // joins tokens/docs at or below its cutoff — no per-checkpoint
    // corpus rescan.
    "q249_heaps_curve" ->
      s"""WITH cp AS (
         |  SELECT CAST(k AS BIGINT) AS k
         |  FROM (VALUES (50), (100), (200), (400), (500)) v(k)),
         |toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |tok AS (SELECT doc_id, unnest(tk) AS t FROM toks),
         |fd AS (SELECT t, CAST(min(doc_id) AS BIGINT) AS fd
         |       FROM tok GROUP BY 1),
         |vocab_at AS (
         |  SELECT k, CAST(count(*) AS BIGINT) AS vocab
         |  FROM cp JOIN fd ON fd.fd <= cp.k GROUP BY 1),
         |per_doc AS (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS c FROM toks
         |  WHERE len(tk) > 0),
         |mass_at AS (
         |  SELECT k, CAST(sum(c) AS BIGINT) AS total_tokens
         |  FROM cp JOIN per_doc ON per_doc.doc_id <= cp.k GROUP BY 1),
         |docs_at AS (
         |  SELECT k, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM cp JOIN documents d ON d.doc_id <= cp.k GROUP BY 1)
         |SELECT cp.k,
         |       CAST(COALESCE(docs_at.n_docs, 0) AS BIGINT) AS n_docs,
         |       CAST(COALESCE(mass_at.total_tokens, 0) AS BIGINT)
         |         AS total_tokens,
         |       CAST(COALESCE(vocab_at.vocab, 0) AS BIGINT) AS vocab
         |FROM cp LEFT JOIN docs_at USING (k) LEFT JOIN mass_at USING (k)
         |LEFT JOIN vocab_at USING (k)
         |ORDER BY cp.k""".stripMargin,

    // NOT EXISTS dominance recount (the O(n²) definition — it is the
    // oracle); engine result is the per-x max-y frontier semi-join.
    "q250_skyline" ->
      s"""WITH m AS (SELECT doc_id, n_chars, text, $oToks AS tk
         |           FROM documents),
         |f AS (
         |  SELECT doc_id, n_chars,
         |         CAST(floor(
         |           (least(CAST(length(text) AS DOUBLE) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |            + least(CAST(len(tk) AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |            + (CAST(1.0 AS DOUBLE) - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS DOUBLE)
         |                   / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE)))) / CAST(3.0 AS DOUBLE)
         |           * CAST(1048576 AS DOUBLE)) AS BIGINT) AS qfp
         |  FROM m)
         |SELECT p.doc_id, p.n_chars, p.qfp
         |FROM f p
         |WHERE p.n_chars IS NOT NULL AND p.qfp IS NOT NULL
         |  AND NOT EXISTS (
         |    SELECT 1 FROM f q
         |    WHERE q.n_chars >= p.n_chars AND q.qfp >= p.qfp
         |      AND (q.n_chars > p.n_chars OR q.qfp > p.qfp))
         |ORDER BY p.doc_id""".stripMargin,

    // q247's capped pair graph symmetrized, recursive min-hop CTE
    // bounded at 4, histogram + the NOT IN unreached remainder.
    "q251_bfs_hops" ->
      """WITH RECURSIVE ai AS (
        |  SELECT DISTINCT l_orderkey AS actor, l_partkey AS item
        |  FROM lineitem),
        |deg AS (SELECT actor, count(*) AS dg FROM ai GROUP BY 1),
        |cap AS (
        |  SELECT ai.actor, ai.item
        |  FROM ai JOIN deg USING (actor) WHERE dg <= 6),
        |pairs AS (
        |  SELECT DISTINCT x.item AS i, y.item AS j
        |  FROM cap x JOIN cap y
        |    ON x.actor = y.actor AND x.item < y.item),
        |e AS (SELECT i AS u, j AS v FROM pairs
        |      UNION SELECT j AS u, i AS v FROM pairs),
        |items AS (SELECT DISTINCT l_partkey AS item FROM lineitem),
        |reach(node, d) AS (
        |  SELECT item, CAST(0 AS BIGINT) FROM items WHERE item % 97 = 0
        |  UNION
        |  SELECT e.v, r.d + 1 FROM reach r JOIN e ON e.u = r.node
        |  WHERE r.d < 4),
        |md AS (SELECT node, CAST(min(d) AS BIGINT) AS d
        |       FROM reach GROUP BY 1),
        |hist AS (SELECT d, CAST(count(*) AS BIGINT) AS n_nodes
        |         FROM md GROUP BY 1),
        |unr AS (
        |  SELECT CAST(-1 AS BIGINT) AS d, CAST(count(*) AS BIGINT)
        |           AS n_nodes
        |  FROM items WHERE item NOT IN (SELECT node FROM md))
        |SELECT d, n_nodes
        |FROM (SELECT * FROM hist UNION ALL SELECT * FROM unr)
        |WHERE n_nodes > 0 ORDER BY d""".stripMargin,

    // q182's deterministic Poisson draw (replicates=32), weighted value
    // histogram per replicate, median = min v with 2·cum ≥ n.
    "q252_median_bootstrap" -> {
      val wCases = graft.operators.Sampling.PoissonCdf
        .map(c => s"(CASE WHEN h / CAST(4294967296 AS DOUBLE) >= CAST($c AS DOUBLE) THEN 1 ELSE 0 END)")
        .mkString("\n|         + ")
      s"""WITH r AS (
         |  SELECT b.b, n_chars AS v,
         |         (((doc_id * 32 + b.b) % 2147483648) * 2654435761)
         |           % 4294967296 AS h
         |  FROM documents, range(32) b(b)
         |  WHERE n_chars IS NOT NULL),
         |w AS (
         |  SELECT b, v,
         |         $wCases AS w
         |  FROM r),
         |hist AS (
         |  SELECT b, v, CAST(sum(w) AS BIGINT) AS c
         |  FROM w GROUP BY 1, 2),
         |cum AS (
         |  SELECT b, v, c,
         |         CAST(sum(c) OVER (PARTITION BY b ORDER BY v)
         |           AS BIGINT) AS cum,
         |         CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS n
         |  FROM hist)
         |SELECT CAST(b AS BIGINT) AS b, CAST(max(n) AS BIGINT) AS n_eff,
         |       CAST(min(v) AS BIGINT) AS median
         |FROM cum WHERE n > 0 AND cum * 2 >= n
         |GROUP BY 1 ORDER BY b""".stripMargin
    },

    // Per-(type, day) histogram; D = (nΣx² − (Σx)²)/(n·Σx) with the
    // verdict as an exact integer comparison.
    "q253_dispersion" ->
      """WITH h AS (
        |  SELECT event_type AS "group",
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS b,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT "group", CAST(count(*) AS BIGINT) AS n_buckets,
        |         CAST(sum(x) AS BIGINT) AS total,
        |         CAST(sum(x * x) AS BIGINT) AS q
        |  FROM h GROUP BY 1)
        |SELECT "group", n_buckets, total,
        |       n_buckets * q - total * total AS disp_num,
        |       n_buckets * total AS disp_den,
        |       CASE WHEN n_buckets * total > 0
        |            THEN CAST(n_buckets * q - total * total AS DOUBLE) /
        |                 CAST(n_buckets * total AS DOUBLE) END AS dispersion,
        |       n_buckets * q - total * total > n_buckets * total
        |         AS overdispersed
        |FROM a ORDER BY "group"""".stripMargin,

    // (Σx)² / (n·Σx²) over per-source counts — one division.
    "q254_jain_fairness" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS x
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |         CAST(sum(x) AS BIGINT) AS total,
        |         CAST(sum(x * x) AS BIGINT) AS sum_sq
        |  FROM g)
        |SELECT n_groups, total, sum_sq,
        |       CASE WHEN sum_sq > 0
        |            THEN CAST(total * total AS DOUBLE) /
        |                 CAST(n_groups * sum_sq AS DOUBLE) END AS jain
        |FROM a""".stripMargin,

    // q97's candidate CTEs at hamming 3; Σmax = total_i + total_j −
    // Σmin, so only the shared-token min-sum joins.
    "q255_weighted_jaccard" ->
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |cand AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT doc_id, unnest($oToks) AS term FROM documents)
         |  GROUP BY 1, 2),
         |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot
         |        FROM tf GROUP BY 1),
         |sh AS (
         |  SELECT cand.i, cand.j,
         |         CAST(sum(least(x.c, y.c)) AS BIGINT) AS min_sum
         |  FROM cand JOIN tf x ON x.doc_id = cand.i
         |  JOIN tf y ON y.doc_id = cand.j AND y.term = x.term
         |  GROUP BY 1, 2)
         |SELECT c.i, c.j,
         |       CAST(COALESCE(sh.min_sum, 0) AS BIGINT) AS min_sum,
         |       CAST(COALESCE(ti.tot, 0) AS BIGINT) AS total_i,
         |       CAST(COALESCE(tj.tot, 0) AS BIGINT) AS total_j,
         |       CASE WHEN COALESCE(ti.tot, 0) + COALESCE(tj.tot, 0) -
         |                 COALESCE(sh.min_sum, 0) > 0
         |            THEN CAST(COALESCE(sh.min_sum, 0) AS DOUBLE) /
         |                 CAST(COALESCE(ti.tot, 0) + COALESCE(tj.tot, 0) -
         |                      COALESCE(sh.min_sum, 0) AS DOUBLE)
         |       END AS wjaccard
         |FROM cand c LEFT JOIN sh ON sh.i = c.i AND sh.j = c.j
         |LEFT JOIN tot ti ON ti.doc_id = c.i
         |LEFT JOIN tot tj ON tj.doc_id = c.j
         |ORDER BY c.i, c.j""".stripMargin,

    // q53/q72 scorers filtered to the query terms, per-doc fixed-point
    // sums, top-20 ranks, then the literal-weight RBO fold.
    "q256_rbo" -> {
      val k1p1 = "CAST(2.2 AS DOUBLE)"
      val k1 = "CAST(1.2 AS DOUBLE)"
      val oneMinusB = "CAST(0.25 AS DOUBLE)"
      val bC = "CAST(0.75 AS DOUBLE)"
      val wVals = graft.operators.Fusion.rboWeights(20, 0.9)
        .map { case (d, w) => s"($d, CAST($w AS BIGINT))" }.mkString(", ")
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest($oToks) AS term FROM documents)
         |  GROUP BY 1, 2),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |dls AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
         |        FROM tf GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM documents),
         |ad AS (SELECT CAST((SELECT coalesce(sum(tf), 0) FROM tf) AS DOUBLE)
         |              / (SELECT n FROM nn) AS avgdl),
         |sca AS (
         |  SELECT tf.doc_id, tf.term,
         |         CAST(tf.tf AS DOUBLE) * (nn.n + 1) / (dfx.df + 1) AS tfidf
         |  FROM tf JOIN dfx USING (term) CROSS JOIN nn),
         |ta AS (
         |  SELECT doc_id,
         |         CAST(sum(CAST(floor(tfidf * CAST(1048576 AS DOUBLE))
         |           AS BIGINT)) AS BIGINT) AS s
         |  FROM sca WHERE term IN ('fast', 'table', 'value') GROUP BY 1),
         |ra AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id)
         |    AS BIGINT) AS rank
         |  FROM ta ORDER BY s DESC, doc_id LIMIT 20),
         |scb AS (
         |  SELECT tf.doc_id, tf.term,
         |         (CAST(nn.n + 1 AS DOUBLE) / (dfx.df + 1)) *
         |           (CAST(tf.tf AS DOUBLE) * $k1p1) /
         |           (CAST(tf.tf AS DOUBLE) +
         |            $k1 * ($oneMinusB + ($bC * dls.dl) / ad.avgdl)) AS bm25
         |  FROM tf JOIN dfx USING (term) JOIN dls USING (doc_id)
         |  CROSS JOIN nn CROSS JOIN ad),
         |tb AS (
         |  SELECT doc_id,
         |         CAST(sum(CAST(floor(bm25 * CAST(1048576 AS DOUBLE))
         |           AS BIGINT)) AS BIGINT) AS s
         |  FROM scb WHERE term IN ('fast', 'table', 'value') GROUP BY 1),
         |rb AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id)
         |    AS BIGINT) AS rank
         |  FROM tb ORDER BY s DESC, doc_id LIMIT 20),
         |wts(d, w_fp) AS (VALUES $wVals),
         |jd AS (
         |  SELECT ra.doc_id, greatest(ra.rank, rb.rank) AS m
         |  FROM ra JOIN rb USING (doc_id)),
         |xd AS (
         |  SELECT w.d, w.w_fp, CAST(count(*) AS BIGINT) AS x_d
         |  FROM wts w JOIN jd ON jd.m <= w.d GROUP BY 1, 2),
         |a AS (
         |  SELECT CAST(sum((w_fp * x_d) // d) AS BIGINT) AS rbo_fp,
         |         CAST(max(CASE WHEN d = 20 THEN x_d END) AS BIGINT)
         |           AS overlap_at_k
         |  FROM xd)
         |SELECT CAST(20 AS BIGINT) AS k,
         |       CAST(COALESCE(overlap_at_k, 0) AS BIGINT) AS overlap_at_k,
         |       CAST(COALESCE(rbo_fp, 0) AS BIGINT) AS rbo_fp,
         |       CAST(COALESCE(rbo_fp, 0) AS DOUBLE) /
         |         CAST(1073741824.0 AS DOUBLE) AS rbo
         |FROM a""".stripMargin
    },

    // User-keyed window join, last touch by (ts, id) row_number,
    // linear shares as exact 2^20 // n integers, direct remainder.
    "q257_attribution" ->
      """WITH b AS (
        |  SELECT user_id AS u, CAST(epoch_ns(ts) AS BIGINT) AS tsn,
        |         event_id AS eid, event_type AS ty
        |  FROM events),
        |conv AS (SELECT u, tsn AS cts, eid AS cid FROM b
        |         WHERE ty = 'purchase'),
        |tch AS (SELECT u, tsn AS tts, eid AS tid, ty FROM b
        |        WHERE ty IN ('view', 'click')),
        |wnd AS (
        |  SELECT conv.cid, tch.tid, tch.ty, tch.tts
        |  FROM conv JOIN tch USING (u)
        |  WHERE tch.tts < conv.cts
        |    AND tch.tts >= conv.cts - 259200000000000),
        |lt AS (
        |  SELECT cid, tid AS last_tid FROM (
        |    SELECT cid, tid, row_number() OVER (PARTITION BY cid
        |      ORDER BY tts DESC, tid DESC) AS rn FROM wnd)
        |  WHERE rn = 1),
        |pc AS (SELECT cid, CAST(count(*) AS BIGINT) AS n
        |       FROM wnd GROUP BY 1),
        |att AS (
        |  SELECT w.ty AS touch_type,
        |         CAST(count(CASE WHEN w.tid = lt.last_tid THEN 1 END)
        |           AS BIGINT) AS n_last_touch,
        |         CAST(count(*) AS BIGINT) AS n_touches,
        |         CAST(sum(1048576 // pc.n) AS BIGINT) AS linear_fp
        |  FROM wnd w JOIN pc USING (cid) JOIN lt USING (cid)
        |  GROUP BY 1),
        |dir_ AS (
        |  SELECT '(direct)' AS touch_type,
        |         CAST(count(*) AS BIGINT) AS n_last_touch,
        |         CAST(0 AS BIGINT) AS n_touches,
        |         CAST(0 AS BIGINT) AS linear_fp
        |  FROM conv WHERE cid NOT IN (SELECT cid FROM pc))
        |SELECT touch_type, n_last_touch, n_touches, linear_fp
        |FROM (SELECT * FROM att UNION ALL SELECT * FROM dir_)
        |ORDER BY touch_type""".stripMargin,

    // q190's histogram/cumulation, per-block term quantized to 2^20
    // before the sum; last block (B = N) skipped as zero-gap.
    "q258_ad_statistic" ->
      s"""WITH $oGateCtes,
         |g AS (
         |  SELECT d.n_chars AS v, (vd.reasons = 0) AS r
         |  FROM documents d JOIN verdict vd USING (doc_id)),
         |hist AS (
         |  SELECT v, CAST(count(CASE WHEN r THEN 1 END) AS BIGINT) AS cr,
         |         CAST(count(CASE WHEN NOT r THEN 1 END) AS BIGINT) AS cc
         |  FROM g GROUP BY 1),
         |cum AS (
         |  SELECT v, cr, cc,
         |         CAST(sum(cr) OVER (ORDER BY v) AS BIGINT) AS m,
         |         CAST(sum(cr + cc) OVER (ORDER BY v) AS BIGINT) AS b,
         |         CAST(sum(cr) OVER () AS BIGINT) AS nr,
         |         CAST(sum(cc) OVER () AS BIGINT) AS ncur
         |  FROM hist),
         |t AS (
         |  SELECT nr, ncur,
         |         CASE WHEN b < nr + ncur AND nr > 0 AND ncur > 0
         |              THEN CAST(floor(
         |                CAST((nr + ncur) * m - nr * b AS DOUBLE) *
         |                CAST((nr + ncur) * m - nr * b AS DOUBLE) *
         |                CAST(cr + cc AS DOUBLE) /
         |                (CAST(nr AS DOUBLE) * CAST(ncur AS DOUBLE) *
         |                 CAST(b AS DOUBLE) *
         |                 CAST((nr + ncur) - b AS DOUBLE)) *
         |                CAST(1048576.0 AS DOUBLE)) AS BIGINT)
         |              ELSE CAST(0 AS BIGINT) END AS term_fp
         |  FROM cum)
         |SELECT CAST(min(nr) AS BIGINT) AS n_ref,
         |       CAST(min(ncur) AS BIGINT) AS n_cur,
         |       CAST(sum(term_fp) AS BIGINT) AS a2_fp,
         |       CASE WHEN min(nr) > 0 AND min(ncur) > 0
         |            THEN CAST(sum(term_fp) AS DOUBLE) /
         |                 CAST(1048576.0 AS DOUBLE) END AS a2
         |FROM t""".stripMargin,

    // q177's skew formulas + q178's coordinated-sample estimate +
    // build-side count, composed; thresholds are plan literals.
    "q259_join_advisor" ->
      """WITH h AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS k,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS rows_a,
        |         CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(max(c) AS BIGINT) AS max_cnt
        |  FROM h),
        |hot AS (SELECT min(k) AS max_key FROM h, tot WHERE c = max_cnt),
        |sk AS (
        |  SELECT rows_a, n_keys, max_cnt, max_key,
        |         (CAST(max_cnt * n_keys AS DOUBLE) / CAST(rows_a AS DOUBLE))
        |           AS skew_ratio,
        |         CAST((max_cnt * 32 + rows_a - 1) // rows_a AS BIGINT)
        |           AS salt_factor
        |  FROM tot, hot),
        |rb AS (SELECT CAST(count(*) AS BIGINT) AS rows_b FROM orders),
        |sa AS (
        |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS ca
        |  FROM lineitem
        |  WHERE (((l_orderkey % 2147483648) * 2654435761) % 4294967296)
        |          % 8 = 0
        |  GROUP BY 1),
        |sb AS (
        |  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
        |  FROM orders
        |  WHERE (((o_orderkey % 2147483648) * 2654435761) % 4294967296)
        |          % 8 = 0
        |  GROUP BY 1),
        |est AS (
        |  SELECT CAST(COALESCE(sum(ca * cb) * 8, 0) AS BIGINT)
        |           AS est_join_rows
        |  FROM sa JOIN sb USING (k)),
        |v AS (SELECT * FROM sk, rb, est)
        |SELECT rows_a, n_keys, max_cnt, max_key, skew_ratio, salt_factor,
        |       rows_b, est_join_rows,
        |       CASE WHEN rows_b <= 100000 THEN 'broadcast_b'
        |            WHEN skew_ratio > 8.0 THEN 'salted_shuffle'
        |            ELSE 'shuffle' END AS strategy,
        |       CAST(CASE WHEN rows_b > 100000 AND skew_ratio > 8.0
        |                 THEN salt_factor ELSE 1 END AS BIGINT)
        |         AS recommended_salt
        |FROM v""".stripMargin,

    // Wide pairs → recursive CC over pair nodes → intra pairs LEFT
    // JOIN exact jac ≥ 0.6; one coherence row per cluster.
    "q262_cluster_coherence" ->
      s"""WITH RECURSIVE ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |nodes AS (SELECT DISTINCT u AS node FROM edges),
         |reach(node, comp) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS id, min(comp) AS component
         |        FROM reach GROUP BY 1),
         |intra AS (
         |  SELECT a.component, a.id AS i, b.id AS j
         |  FROM lab a JOIN lab b
         |    ON a.component = b.component AND a.id < b.id),
         |${oJaccardCtes(2)},
         |good AS (SELECT i, j FROM jac WHERE jaccard >= 0.6),
         |per AS (
         |  SELECT intra.component, CAST(count(*) AS BIGINT) AS n_pairs,
         |         CAST(count(g.i) AS BIGINT) AS n_coherent
         |  FROM intra LEFT JOIN good g
         |    ON g.i = intra.i AND g.j = intra.j
         |  GROUP BY 1),
         |csize AS (SELECT component, CAST(count(*) AS BIGINT) AS size
         |          FROM lab GROUP BY 1)
         |SELECT per.component, csize.size, per.n_pairs, per.n_coherent,
         |       CAST(per.n_coherent AS DOUBLE) /
         |         CAST(per.n_pairs AS DOUBLE) AS coherence
         |FROM per JOIN csize USING (component)
         |ORDER BY per.component""".stripMargin,

    // (first, last) spans per user, right-censored within 7 days of the
    // horizon; suffix-cumulated at-risk; survival = ordered left-fold
    // product of (1 − d/n) prefixes — the engine's driver fold replayed
    // as list_reduce over list(factor ORDER BY t).
    "q263_kaplan_meier" ->
      """WITH sp AS (
        |  SELECT user_id,
        |         CAST(min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS BIGINT) AS f,
        |         CAST(max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS BIGINT) AS l
        |  FROM events GROUP BY 1),
        |hz AS (SELECT max(l) AS h FROM sp),
        |obs AS (
        |  SELECT l - f AS t,
        |         CASE WHEN l < h - 7 THEN 1 ELSE 0 END AS evt
        |  FROM sp, hz),
        |dt0 AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS c,
        |         CAST(sum(evt) AS BIGINT) AS d
        |  FROM obs GROUP BY 1),
        |dt AS (
        |  SELECT t, d,
        |         CAST(sum(c) OVER (ORDER BY t
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |           AS BIGINT) AS n_risk
        |  FROM dt0),
        |fc AS (
        |  SELECT t, n_risk, d,
        |         CAST(1.0 AS DOUBLE) -
        |           CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
        |  FROM dt),
        |sv AS (
        |  SELECT a.t,
        |         list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |           list(b.factor ORDER BY b.t)), (x, y) -> x * y)
        |           AS survival
        |  FROM fc a JOIN fc b ON b.t <= a.t GROUP BY 1)
        |SELECT fc.t, fc.n_risk, fc.d AS d_churn, fc.factor, sv.survival
        |FROM fc JOIN sv USING (t) ORDER BY fc.t""".stripMargin,

    // Daily histogram, weekday = bucket mod 7, per-weekday (n, Σ)
    // broadcast back; mean and residual in fixed shapes.
    "q264_seasonality" ->
      """WITH d AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |dd AS (SELECT bucket, x,
        |              ((bucket % 7) + 7) % 7 AS weekday FROM d),
        |wd AS (
        |  SELECT weekday, CAST(count(*) AS BIGINT) AS wd_n,
        |         CAST(sum(x) AS BIGINT) AS wd_sum
        |  FROM dd GROUP BY 1)
        |SELECT dd.bucket, dd.weekday, dd.x, wd.wd_n, wd.wd_sum,
        |       CAST(wd.wd_sum AS DOUBLE) / CAST(wd.wd_n AS DOUBLE)
        |         AS wd_mean,
        |       CAST(dd.x AS DOUBLE) -
        |         CAST(wd.wd_sum AS DOUBLE) / CAST(wd.wd_n AS DOUBLE)
        |         AS residual
        |FROM dd JOIN wd USING (weekday) ORDER BY dd.bucket""".stripMargin,

    // Daily histogram → q64 winsorize clip → two q118 OLS trees on
    // centered days → 7 rows of both forecasts + the slope delta.
    "q289_robust_trend" -> {
      def ols(src: String, sfx: String) =
        s"""s_$sfx AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |         CAST(sum(x * y) AS BIGINT) AS sxy,
           |         CAST(sum(x * x) AS BIGINT) AS sxx
           |  FROM $src),
           |tr_$sfx AS (
           |  SELECT CASE WHEN n * sxx - sx * sx != 0
           |              THEN (CAST(n * sxy - sx * sy AS DOUBLE) /
           |                    CAST(n * sxx - sx * sx AS DOUBLE)) END
           |           AS slope_$sfx,
           |         CASE WHEN n * sxx - sx * sx != 0
           |              THEN (CAST(sy AS DOUBLE) -
           |                    (CAST(n * sxy - sx * sy AS DOUBLE) /
           |                     CAST(n * sxx - sx * sx AS DOUBLE)) *
           |                    CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
           |         END AS intercept_$sfx
           |  FROM s_$sfx)""".stripMargin
      s"""WITH daily AS (
         |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
         |         CAST(count(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |bd AS (SELECT min(d) AS d0, max(d) AS dmax FROM daily),
         |cum AS (
         |  SELECT y AS v, count(*) AS c FROM daily GROUP BY 1),
         |cc AS (
         |  SELECT v, sum(c) OVER (ORDER BY v) AS cum,
         |         sum(c) OVER () AS n
         |  FROM cum),
         |qs AS (
         |  SELECT min(CASE WHEN cum * 10 >= n * 1 THEN v END) AS qlo,
         |         min(CASE WHEN cum * 10 >= n * 9 THEN v END) AS qhi
         |  FROM cc),
         |raw AS (SELECT d - d0 AS x, y FROM daily, bd),
         |rob AS (
         |  SELECT d - d0 AS x, least(greatest(y, qlo), qhi) AS y
         |  FROM daily, bd, qs),
         |${ols("raw", "raw")},
         |${ols("rob", "robust")}
         |SELECT CAST(bd.dmax + t.i AS BIGINT) AS t_day,
         |       slope_raw, slope_robust,
         |       intercept_raw + slope_raw *
         |         CAST((bd.dmax + t.i) - bd.d0 AS DOUBLE) AS forecast_raw,
         |       intercept_robust + slope_robust *
         |         CAST((bd.dmax + t.i) - bd.d0 AS DOUBLE)
         |         AS forecast_robust,
         |       slope_raw - slope_robust AS slope_delta
         |FROM tr_raw, tr_robust, bd, range(1, 8) t(i)
         |ORDER BY t_day""".stripMargin
    },

    // q27's marker-count expressions; docs hitting ≥ 2 languages, with
    // the minority share as one division of exact counts.
    "q288_code_switch" ->
      s"""WITH scores AS (
         |  SELECT doc_id, lang,
         |         CAST(len(list_filter($oToks, t -> list_contains(['the','and','of','to','in','is'], t))) AS BIGINT) AS s_en,
         |         CAST(len(list_filter($oToks, t -> list_contains(['der','die','und','das','ist','nicht'], t))) AS BIGINT) AS s_de,
         |         CAST(len(list_filter($oToks, t -> list_contains(['el','la','los','que','una','por'], t))) AS BIGINT) AS s_es,
         |         CAST(len(list_filter($oToks, t -> list_contains(['le','les','des','est','une','dans'], t))) AS BIGINT) AS s_fr
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang,
         |         CAST((CASE WHEN s_en > 0 THEN 1 ELSE 0 END) +
         |              (CASE WHEN s_de > 0 THEN 1 ELSE 0 END) +
         |              (CASE WHEN s_es > 0 THEN 1 ELSE 0 END) +
         |              (CASE WHEN s_fr > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_langs,
         |         CAST(s_en + s_de + s_es + s_fr AS BIGINT) AS marker_total,
         |         CAST(s_en + s_de + s_es + s_fr -
         |              greatest(s_en, s_de, s_es, s_fr) AS BIGINT)
         |           AS minority_markers
         |  FROM scores)
         |SELECT doc_id, lang, n_langs, marker_total, minority_markers,
         |       CAST(minority_markers AS DOUBLE) /
         |         CAST(marker_total AS DOUBLE) AS mix_ratio
         |FROM m WHERE marker_total > 0
         |ORDER BY minority_markers DESC, n_langs DESC, doc_id
         |LIMIT 20""".stripMargin,

    // Per-lang descending-cum F1 curves, per-lang argmax (ties to the
    // smaller threshold), q209's global argmax, per-lang F1 at the
    // global cutoff, regret = best − at_global.
    "q287_threshold_transfer" ->
      s"""WITH $oDistillScoredCtes,
         |h AS (
         |  SELECT d.lang, s.zq AS t, CAST(count(*) AS BIGINT) AS c,
         |         CAST(count(CASE WHEN s.keep THEN 1 END) AS BIGINT) AS p
         |  FROM scored s JOIN documents d USING (doc_id) GROUP BY 1, 2),
         |pl AS (
         |  SELECT lang, t,
         |         CAST(sum(p) OVER (PARTITION BY lang ORDER BY t DESC)
         |           AS BIGINT) AS tp,
         |         CAST(sum(c - p) OVER (PARTITION BY lang ORDER BY t DESC)
         |           AS BIGINT) AS fp,
         |         CAST(sum(p) OVER (PARTITION BY lang) AS BIGINT) AS pall
         |  FROM h),
         |pf AS (
         |  SELECT lang, t, tp, fp,
         |         CASE WHEN 2 * tp + fp + (pall - tp) > 0
         |              THEN CAST(2 * tp AS DOUBLE) /
         |                   CAST(2 * tp + fp + (pall - tp) AS DOUBLE)
         |         END AS f1
         |  FROM pl),
         |best AS (
         |  SELECT lang, t AS best_t, f1 AS best_f1 FROM (
         |    SELECT lang, t, f1,
         |           row_number() OVER (PARTITION BY lang
         |             ORDER BY f1 DESC, t) AS r
         |    FROM pf WHERE f1 IS NOT NULL) WHERE r = 1),
         |gh AS (SELECT t, CAST(sum(c) AS BIGINT) AS c,
         |              CAST(sum(p) AS BIGINT) AS p
         |       FROM h GROUP BY 1),
         |gc AS (
         |  SELECT t,
         |         CAST(sum(p) OVER (ORDER BY t DESC) AS BIGINT) AS tp,
         |         CAST(sum(c - p) OVER (ORDER BY t DESC) AS BIGINT) AS fp,
         |         CAST(sum(p) OVER () AS BIGINT) AS pall
         |  FROM gh),
         |gf AS (
         |  SELECT t,
         |         CASE WHEN 2 * tp + fp + (pall - tp) > 0
         |              THEN CAST(2 * tp AS DOUBLE) /
         |                   CAST(2 * tp + fp + (pall - tp) AS DOUBLE)
         |         END AS f1
         |  FROM gc),
         |gt AS (SELECT t AS global_t FROM gf ORDER BY f1 DESC, t LIMIT 1),
         |ag AS (
         |  SELECT h.lang, gt.global_t, CAST(sum(h.p) AS BIGINT) AS tp,
         |         CAST(sum(h.c - h.p) AS BIGINT) AS fp
         |  FROM h, gt WHERE h.t >= gt.global_t GROUP BY 1, 2),
         |ptot AS (SELECT lang, CAST(sum(p) AS BIGINT) AS pall
         |         FROM h GROUP BY 1),
         |agf AS (
         |  SELECT ag.lang, ag.global_t,
         |         CASE WHEN 2 * ag.tp + ag.fp + (ptot.pall - ag.tp) > 0
         |              THEN CAST(2 * ag.tp AS DOUBLE) /
         |                   CAST(2 * ag.tp + ag.fp + (ptot.pall - ag.tp)
         |                     AS DOUBLE)
         |         END AS f1_at_global
         |  FROM ag JOIN ptot USING (lang))
         |SELECT best.lang, best.best_t, best.best_f1, agf.global_t,
         |       agf.f1_at_global,
         |       best.best_f1 - agf.f1_at_global AS regret
         |FROM best JOIN agf USING (lang) ORDER BY lang""".stripMargin,

    // Per-(user, type) lag gaps in whole seconds; the q74 histogram
    // quantile chain per type.
    "q285_interarrival" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS tsn,
        |         event_id
        |  FROM events),
        |g AS (
        |  SELECT event_type, (tsn - prev) // 1000000000 AS gap_s FROM (
        |    SELECT event_type, tsn,
        |           lag(tsn) OVER (PARTITION BY user_id, event_type
        |             ORDER BY tsn, event_id) AS prev
        |    FROM ev)
        |  WHERE prev IS NOT NULL),
        |h AS (SELECT event_type, gap_s AS v, count(*) AS c
        |      FROM g GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, v,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
        |         sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM h)
        |SELECT event_type, CAST(min(n) AS BIGINT) AS n,
        |       min(CASE WHEN cum * 2 >= n * 1 THEN v END) AS p50,
        |       min(CASE WHEN cum * 10 >= n * 9 THEN v END) AS p90
        |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Global top-10 vs per-source leave-one-out top-10 on the token
    // histogram; overlap per source, absent sources report 0.
    "q286_topk_stability" ->
      s"""WITH tok AS (
         |  SELECT source, unnest($oToks) AS t FROM documents),
         |g AS (SELECT t, CAST(count(*) AS BIGINT) AS gc
         |      FROM tok GROUP BY 1),
         |topg AS (
         |  SELECT t FROM (
         |    SELECT t, row_number() OVER (ORDER BY gc DESC, t) AS r
         |    FROM g) WHERE r <= 10),
         |sc AS (SELECT source, t, CAST(count(*) AS BIGINT) AS sc
         |       FROM tok GROUP BY 1, 2),
         |srcs AS (SELECT DISTINCT source FROM documents),
         |wo AS (
         |  SELECT srcs.source, g.t,
         |         g.gc - COALESCE(sc.sc, 0) AS wc
         |  FROM srcs CROSS JOIN g
         |  LEFT JOIN sc ON sc.source = srcs.source AND sc.t = g.t),
         |topwo AS (
         |  SELECT source, t FROM (
         |    SELECT source, t,
         |           row_number() OVER (PARTITION BY source
         |             ORDER BY wc DESC, t) AS r
         |    FROM wo WHERE wc > 0) WHERE r <= 10),
         |ov AS (
         |  SELECT tw.source, CAST(count(*) AS BIGINT) AS overlap_at_10
         |  FROM topwo tw JOIN topg ON topg.t = tw.t
         |  GROUP BY 1)
         |SELECT srcs.source,
         |       CAST(COALESCE(ov.overlap_at_10, 0) AS BIGINT)
         |         AS overlap_at_10
         |FROM srcs LEFT JOIN ov USING (source)
         |ORDER BY source""".stripMargin,

    // q150's triplet chain wrapped with three norm joins; per-triplet
    // margin guarded per cos; fixed-point mean over defined margins.
    "q284_triplet_margin" ->
      s"""WITH $oNorms,
         |$oCells,
         |p AS (
         |  SELECT a.id AS anchor, b.id AS positive
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.id < b.id
         |  JOIN norms na ON na.vec_id = a.id
         |  JOIN norms nb ON nb.vec_id = b.id
         |  WHERE ${oCos("na", "nb")} >= 0.3),
         |rep AS (
         |  SELECT vec_id,
         |         (((vec_id % 2147483648) * 2654435761) % 4294967296) % 64 AS b,
         |         (((vec_id % 2147483648) * 2654435761) % 4294967296) % 1000000 AS h
         |  FROM embeddings),
         |rk AS (
         |  SELECT b, vec_id,
         |         row_number() OVER (PARTITION BY b ORDER BY h, vec_id) AS rk
         |  FROM rep),
         |r1 AS (SELECT b, vec_id AS r1 FROM rk WHERE rk = 1),
         |r2 AS (SELECT b, vec_id AS r2 FROM rk WHERE rk = 2),
         |tri AS (
         |  SELECT anchor, positive, negative FROM (
         |    SELECT p.anchor, p.positive,
         |           CASE WHEN r1.r1 <> p.anchor AND r1.r1 <> p.positive THEN r1.r1
         |                WHEN r2.r2 <> p.anchor AND r2.r2 <> p.positive THEN r2.r2
         |           END AS negative
         |    FROM p
         |    LEFT JOIN r1 ON r1.b = (((p.anchor % 2147483648) * 2654435761) % 4294967296) % 64
         |    LEFT JOIN r2 ON r2.b = (((p.anchor % 2147483648) * 2654435761) % 4294967296) % 64)
         |  WHERE negative IS NOT NULL),
         |mt AS (
         |  SELECT CASE WHEN na.nrm * np.nrm <> 0 AND na.nrm * nn.nrm <> 0
         |              THEN (${oCos("na", "np")}) - (${oCos("na", "nn")})
         |         END AS m
         |  FROM tri
         |  JOIN norms na ON na.vec_id = tri.anchor
         |  JOIN norms np ON np.vec_id = tri.positive
         |  JOIN norms nn ON nn.vec_id = tri.negative),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_triplets,
         |         CAST(count(m) AS BIGINT) AS n_defined,
         |         CAST(count(CASE WHEN m > 0.0 THEN 1 END) AS BIGINT)
         |           AS n_positive_margin,
         |         min(m) AS min_margin, max(m) AS max_margin,
         |         CAST(COALESCE(sum(CAST(floor(m * CAST(1048576.0 AS DOUBLE))
         |           AS BIGINT)), 0) AS BIGINT) AS mfp
         |  FROM mt)
         |SELECT n_triplets, n_defined, n_positive_margin, min_margin,
         |       max_margin,
         |       CASE WHEN n_defined > 0
         |            THEN CAST(mfp AS DOUBLE) /
         |                 CAST(n_defined * 1048576 AS DOUBLE)
         |       END AS mean_margin
         |FROM a""".stripMargin,

    // q27's pred CTE; per-actual recall, per-predicted precision,
    // overall accuracy from the same counts.
    "q282_langid_scorecard" ->
      s"""WITH scores AS (
         |  SELECT lang,
         |         CAST(len(list_filter($oToks, t -> list_contains(['the','and','of','to','in','is'], t))) AS BIGINT) AS s_en,
         |         CAST(len(list_filter($oToks, t -> list_contains(['der','die','und','das','ist','nicht'], t))) AS BIGINT) AS s_de,
         |         CAST(len(list_filter($oToks, t -> list_contains(['el','la','los','que','una','por'], t))) AS BIGINT) AS s_es,
         |         CAST(len(list_filter($oToks, t -> list_contains(['le','les','des','est','une','dans'], t))) AS BIGINT) AS s_fr
         |  FROM documents),
         |pred AS (
         |  SELECT lang,
         |         CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |              WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |              WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |              WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
         |              ELSE 'und' END AS predicted
         |  FROM scores),
         |pl AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |         CAST(count(CASE WHEN predicted = lang THEN 1 END)
         |           AS BIGINT) AS correct
         |  FROM pred GROUP BY 1),
         |pp AS (
         |  SELECT predicted AS lang, CAST(count(*) AS BIGINT)
         |           AS predicted_n
         |  FROM pred GROUP BY 1),
         |j AS (
         |  SELECT pl.lang, pl.n, pl.correct,
         |         CAST(COALESCE(pp.predicted_n, 0) AS BIGINT)
         |           AS predicted_n
         |  FROM pl LEFT JOIN pp USING (lang))
         |SELECT lang, n, correct, predicted_n,
         |       CAST(correct AS DOUBLE) / CAST(n AS DOUBLE) AS recall,
         |       CASE WHEN predicted_n > 0
         |            THEN CAST(correct AS DOUBLE) /
         |                 CAST(predicted_n AS DOUBLE) END AS "precision",
         |       CAST(CAST(sum(correct) OVER () AS BIGINT) AS DOUBLE) /
         |         CAST(CAST(sum(n) OVER () AS BIGINT) AS DOUBLE)
         |         AS accuracy
         |FROM j ORDER BY lang""".stripMargin,

    // Vocab-row rank window; top-k masses as exact BIGINTs, shares one
    // division each.
    "q283_zipf_profile" ->
      s"""WITH tf AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT unnest($oToks) AS t FROM documents)
         |  GROUP BY 1),
         |rk AS (
         |  SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS r
         |  FROM tf),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS vocab,
         |         CAST(sum(c) AS BIGINT) AS total_tokens,
         |         CAST(COALESCE(sum(CASE WHEN r = 1 THEN c END), 0)
         |           AS BIGINT) AS top1_c,
         |         CAST(COALESCE(sum(CASE WHEN r <= 10 THEN c END), 0)
         |           AS BIGINT) AS top10_c,
         |         min(CASE WHEN r = 1 THEN t END) AS top1_token
         |  FROM rk)
         |SELECT vocab, total_tokens, top1_token, top1_c, top10_c,
         |       CASE WHEN total_tokens > 0
         |            THEN CAST(top1_c AS DOUBLE) /
         |                 CAST(total_tokens AS DOUBLE) END AS top1_share,
         |       CASE WHEN total_tokens > 0
         |            THEN CAST(top10_c AS DOUBLE) /
         |                 CAST(total_tokens AS DOUBLE) END AS top10_share,
         |       CASE WHEN total_tokens > 0
         |            THEN CAST(total_tokens - top10_c AS DOUBLE) /
         |                 CAST(total_tokens AS DOUBLE) END AS tail_share
         |FROM a""".stripMargin,

    // One inclusion of the distill/gate CTEs feeds the AD and conformal
    // arms; SRM/Jain/Gini read documents directly; thresholds are plan
    // literals; ship = AND of the booleans.
    "q280_audit_verdict" ->
      s"""WITH $oDistillScoredCtes,
         |sb AS (
         |  SELECT CASE WHEN bkt < 80 THEN 'train'
         |              WHEN bkt < 90 THEN 'val' ELSE 'test' END AS label
         |  FROM (SELECT (((doc_id % 2147483648) * 2654435761)
         |                  % 4294967296) % 100 AS bkt FROM documents)),
         |scnt AS (SELECT label, CAST(count(*) AS BIGINT) AS observed
         |         FROM sb GROUP BY 1),
         |sj AS (
         |  SELECT e.label, e.expected_p,
         |         CAST(COALESCE(scnt.observed, 0) AS BIGINT) AS observed
         |  FROM (VALUES ('train', CAST(0.8 AS DOUBLE)),
         |               ('val', CAST(0.1 AS DOUBLE)),
         |               ('test', CAST(0.1 AS DOUBLE))) e(label, expected_p)
         |  LEFT JOIN scnt USING (label)),
         |sw AS (
         |  SELECT label, observed, expected_p,
         |         CAST(sum(observed) OVER () AS BIGINT) AS n
         |  FROM sj),
         |stm AS (
         |  SELECT CAST(floor((CAST(observed AS DOUBLE) -
         |             expected_p * CAST(n AS DOUBLE)) *
         |           (CAST(observed AS DOUBLE) -
         |             expected_p * CAST(n AS DOUBLE)) /
         |           (expected_p * CAST(n AS DOUBLE)) *
         |           CAST(1073741824.0 AS DOUBLE)) AS BIGINT) AS term_fp
         |  FROM sw),
         |srm AS (
         |  SELECT CAST(CAST(sum(term_fp) AS BIGINT) AS DOUBLE) /
         |           CAST(1073741824.0 AS DOUBLE) AS srm_chi2
         |  FROM stm),
         |jg AS (SELECT source, CAST(count(*) AS BIGINT) AS x
         |       FROM documents WHERE source IS NOT NULL GROUP BY 1),
         |jain AS (
         |  SELECT CASE WHEN CAST(sum(x * x) AS BIGINT) > 0
         |              THEN CAST(CAST(sum(x) AS BIGINT) *
         |                        CAST(sum(x) AS BIGINT) AS DOUBLE) /
         |                   CAST(CAST(count(*) AS BIGINT) *
         |                        CAST(sum(x * x) AS BIGINT) AS DOUBLE)
         |         END AS jain
         |  FROM jg),
         |ahist AS (
         |  SELECT d.n_chars AS v,
         |         CAST(count(CASE WHEN vd.reasons = 0 THEN 1 END) AS BIGINT)
         |           AS cr,
         |         CAST(count(CASE WHEN NOT (vd.reasons = 0) THEN 1 END)
         |           AS BIGINT) AS cc2
         |  FROM documents d JOIN verdict vd USING (doc_id) GROUP BY 1),
         |acum AS (
         |  SELECT v, cr, cc2,
         |         CAST(sum(cr) OVER (ORDER BY v) AS BIGINT) AS m,
         |         CAST(sum(cr + cc2) OVER (ORDER BY v) AS BIGINT) AS b,
         |         CAST(sum(cr) OVER () AS BIGINT) AS nr,
         |         CAST(sum(cc2) OVER () AS BIGINT) AS ncur
         |  FROM ahist),
         |at AS (
         |  SELECT CASE WHEN b < nr + ncur AND nr > 0 AND ncur > 0
         |              THEN CAST(floor(
         |                CAST((nr + ncur) * m - nr * b AS DOUBLE) *
         |                CAST((nr + ncur) * m - nr * b AS DOUBLE) *
         |                CAST(cr + cc2 AS DOUBLE) /
         |                (CAST(nr AS DOUBLE) * CAST(ncur AS DOUBLE) *
         |                 CAST(b AS DOUBLE) *
         |                 CAST((nr + ncur) - b AS DOUBLE)) *
         |                CAST(1048576.0 AS DOUBLE)) AS BIGINT)
         |              ELSE CAST(0 AS BIGINT) END AS term_fp,
         |         nr, ncur
         |  FROM acum),
         |ad AS (
         |  SELECT CASE WHEN min(nr) > 0 AND min(ncur) > 0
         |              THEN CAST(sum(term_fp) AS DOUBLE) /
         |                   CAST(1048576.0 AS DOUBLE) END AS a2
         |  FROM at),
         |wb AS (
         |  SELECT doc_id, zq, keep,
         |         (((doc_id % 2147483648) * 2654435761) % 4294967296)
         |           % 100 < 50 AS cal
         |  FROM scored),
         |wch AS (
         |  SELECT zq AS s, CAST(count(*) AS BIGINT) AS c
         |  FROM wb WHERE cal AND keep GROUP BY 1),
         |wcc AS (
         |  SELECT s, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum,
         |         CAST(sum(c) OVER () AS BIGINT) AS ncal
         |  FROM wch),
         |wthr AS (
         |  SELECT min(s) AS t FROM wcc
         |  WHERE cum >= (ncal + 1) // 10 AND (ncal + 1) // 10 >= 1),
         |conf AS (
         |  SELECT CASE WHEN CAST(count(CASE WHEN keep THEN 1 END)
         |                      AS BIGINT) > 0
         |              THEN CAST(CAST(count(CASE WHEN keep AND
         |                     (t IS NULL OR zq >= t) THEN 1 END) AS BIGINT)
         |                     AS DOUBLE) /
         |                   CAST(CAST(count(CASE WHEN keep THEN 1 END)
         |                     AS BIGINT) AS DOUBLE)
         |         END AS coverage
         |  FROM wb, wthr WHERE NOT cal),
         |gh AS (
         |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
         |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
         |  GROUP BY 1, 2),
         |gc AS (
         |  SELECT source, v, c,
         |         CAST(COALESCE(sum(c) OVER (PARTITION BY source ORDER BY v
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS cum0
         |  FROM gh),
         |ga AS (
         |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
         |         CAST(sum(v * c) AS BIGINT) AS total,
         |         CAST(sum(v * (c * cum0 + c * (c + 1) // 2)) AS BIGINT)
         |           AS rank_sum
         |  FROM gc GROUP BY 1),
         |gini AS (
         |  SELECT max(CASE WHEN total > 0
         |                  THEN CAST(2 * rank_sum - (n + 1) * total
         |                         AS DOUBLE) /
         |                       CAST(n * total AS DOUBLE) END) AS max_gini
         |  FROM ga)
         |SELECT srm.srm_chi2, jain.jain, ad.a2, conf.coverage,
         |       gini.max_gini,
         |       srm.srm_chi2 < CAST(16.27 AS DOUBLE) AS split_ok,
         |       jain.jain >= CAST(0.8 AS DOUBLE) AS balance_ok,
         |       ad.a2 <= CAST(10.0 AS DOUBLE) AS tail_ok,
         |       conf.coverage >= CAST(0.85 AS DOUBLE) AS calibration_ok,
         |       gini.max_gini <= CAST(0.9 AS DOUBLE) AS concentration_ok,
         |       srm.srm_chi2 < CAST(16.27 AS DOUBLE) AND
         |       jain.jain >= CAST(0.8 AS DOUBLE) AND
         |       ad.a2 <= CAST(10.0 AS DOUBLE) AND
         |       conf.coverage >= CAST(0.85 AS DOUBLE) AND
         |       gini.max_gini <= CAST(0.9 AS DOUBLE) AS ship
         |FROM srm, jain, ad, conf, gini""".stripMargin,

    // Capped pair graph; density/giant/assortativity one-row card.
    // CC via the unrolled hook+jump chain (oUnrolledCcCtes).
    "q281_graph_datasheet" ->
      s"""WITH ai AS (
        |  SELECT DISTINCT l_orderkey AS actor, l_partkey AS item
        |  FROM lineitem),
        |deg0 AS (SELECT actor, count(*) AS dg FROM ai GROUP BY 1),
        |cap AS (SELECT ai.actor, ai.item
        |        FROM ai JOIN deg0 USING (actor) WHERE dg <= 6),
        |pairs AS (
        |  SELECT DISTINCT x.item AS i, y.item AS j
        |  FROM cap x JOIN cap y ON x.actor = y.actor AND x.item < y.item),
        |sym AS MATERIALIZED (SELECT i AS u, j AS v FROM pairs
        |        UNION ALL SELECT j, i FROM pairs),
        |nodes AS (SELECT DISTINCT u AS node FROM sym),
        |cnts AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
        |         (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges),
        |dg AS (SELECT u, CAST(count(DISTINCT v) AS BIGINT) AS deg
        |       FROM sym GROUP BY 1),
        |arows AS (
        |  SELECT du.deg AS x, dv.deg AS y
        |  FROM sym JOIN dg du ON du.u = sym.u
        |  JOIN dg dv ON dv.u = sym.v),
        |ast AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM arows),
        |assort AS (
        |  SELECT CASE WHEN n * sxx - sx * sx <> 0 AND
        |                   n * syy - sy * sy <> 0
        |              THEN CAST(n * sxy - sx * sy AS DOUBLE) /
        |                   sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |                        CAST(n * syy - sy * sy AS DOUBLE))
        |         END AS assortativity
        |  FROM ast),
        |${oUnrolledCcCtes("a", "nodes", "sym")},
        |giant AS (
        |  SELECT CAST(COALESCE(max(sz), 0) + (SELECT poison FROM achg)
        |           AS BIGINT) AS giant_size
        |  FROM (SELECT component, count(*) AS sz FROM alab GROUP BY 1))
        |SELECT cnts.n_nodes, cnts.n_edges,
        |       CASE WHEN cnts.n_nodes > 1
        |            THEN CAST(2 * cnts.n_edges AS DOUBLE) /
        |                 CAST(cnts.n_nodes * (cnts.n_nodes - 1) AS DOUBLE)
        |       END AS density,
        |       assort.assortativity, giant.giant_size,
        |       CASE WHEN cnts.n_nodes > 0
        |            THEN CAST(giant.giant_size AS DOUBLE) /
        |                 CAST(cnts.n_nodes AS DOUBLE) END AS giant_share
        |FROM cnts, assort, giant""".stripMargin,

    // Gate keep counts per lang; the Wilson center/half expressions in
    // the engine's exact double shapes. z² goes through a STRING cast:
    // DuckDB parses a bare 17-digit decimal via DECIMAL whose numerator
    // exceeds 2^53, double-rounding one ulp high; CAST('…' AS DOUBLE)
    // parses correctly (verified against the bit pattern).
    "q277_wilson_interval" -> {
      val z2 = "CAST('3.8415999999999997' AS DOUBLE)"
      val z = "CAST(1.96 AS DOUBLE)"
      val nD = "CAST(n AS DOUBLE)"
      val p = s"CAST(k AS DOUBLE) / $nD"
      val denom = s"(CAST(1.0 AS DOUBLE) + $z2 / $nD)"
      val center = s"(($p + $z2 / (CAST(2.0 AS DOUBLE) * $nD)) / $denom)"
      val half = s"(($z * sqrt(($p) * (CAST(1.0 AS DOUBLE) - ($p)) / $nD + $z2 / (CAST(4.0 AS DOUBLE) * $nD * $nD))) / $denom)"
      s"""WITH $oGateCtes,
         |g AS (
         |  SELECT d.lang AS "group", (vd.reasons = 0) AS s
         |  FROM documents d JOIN verdict vd USING (doc_id)),
         |a AS (
         |  SELECT "group", CAST(count(*) AS BIGINT) AS n,
         |         CAST(count(CASE WHEN s THEN 1 END) AS BIGINT) AS k
         |  FROM g GROUP BY 1)
         |SELECT "group", n, k,
         |       CASE WHEN n > 0 THEN $p END AS p_hat,
         |       CASE WHEN n > 0
         |            THEN greatest(CAST(0.0 AS DOUBLE), $center - $half)
         |       END AS wilson_lo,
         |       CASE WHEN n > 0
         |            THEN least(CAST(1.0 AS DOUBLE), $center + $half)
         |       END AS wilson_hi
         |FROM a ORDER BY "group"""".stripMargin
    },

    // q118's OLS trees on centered days, 7 extrapolation rows.
    "q278_capacity_forecast" -> {
      val slope = """(CAST(n * sxy - sx * sy AS DOUBLE) /
                    |             CAST(n * sxx - sx * sx AS DOUBLE))""".stripMargin
      s"""WITH daily AS (
         |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
         |         CAST(count(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |bd AS (SELECT min(d) AS d0, max(d) AS dmax FROM daily),
         |b AS (SELECT d - d0 AS x, y, d0, dmax FROM daily, bd),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(x * y) AS BIGINT) AS sxy,
         |         CAST(sum(x * x) AS BIGINT) AS sxx,
         |         CAST(min(d0) AS BIGINT) AS d0, CAST(min(dmax) AS BIGINT)
         |           AS dmax
         |  FROM b),
         |tr AS (
         |  SELECT CASE WHEN n * sxx - sx * sx != 0
         |              THEN $slope END AS slope,
         |         CASE WHEN n * sxx - sx * sx != 0
         |              THEN (CAST(sy AS DOUBLE) -
         |                    $slope * CAST(sx AS DOUBLE)) /
         |                   CAST(n AS DOUBLE) END AS intercept,
         |         d0, dmax
         |  FROM s)
         |SELECT CAST(dmax + t.i AS BIGINT) AS t_day, slope, intercept,
         |       intercept + slope * CAST((dmax + t.i) - d0 AS DOUBLE)
         |         AS forecast
         |FROM tr, range(1, 8) t(i)
         |ORDER BY t_day""".stripMargin
    },

    // q250's NOT-EXISTS dominance scoped per lang.
    "q279_skyline_by_lang" ->
      s"""WITH m AS (SELECT doc_id, lang, n_chars, text, $oToks AS tk
         |           FROM documents),
         |f AS (
         |  SELECT doc_id, lang, n_chars,
         |         CAST(floor(
         |           (least(CAST(length(text) AS DOUBLE) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |            + least(CAST(len(tk) AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |            + (CAST(1.0 AS DOUBLE) - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS DOUBLE)
         |                   / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE)))) / CAST(3.0 AS DOUBLE)
         |           * CAST(1048576 AS DOUBLE)) AS BIGINT) AS qfp
         |  FROM m)
         |SELECT p.lang, p.doc_id, p.n_chars, p.qfp
         |FROM f p
         |WHERE p.lang IS NOT NULL AND p.n_chars IS NOT NULL
         |  AND p.qfp IS NOT NULL
         |  AND NOT EXISTS (
         |    SELECT 1 FROM f q
         |    WHERE q.lang = p.lang
         |      AND q.n_chars >= p.n_chars AND q.qfp >= p.qfp
         |      AND (q.n_chars > p.n_chars OR q.qfp > p.qfp))
         |ORDER BY p.lang, p.doc_id""".stripMargin,

    // Weekly cohorts from per-user first days; exact-cents revenue per
    // (cohort, offset); cumulative per cohort; one division per row.
    "q274_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |           AS d,
        |         CAST(floor(value * CAST(100.0 AS DOUBLE)) AS BIGINT) AS c
        |  FROM events),
        |f AS (SELECT user_id, CAST(min(d) AS BIGINT) AS fd
        |      FROM ev GROUP BY 1),
        |sz AS (SELECT ((fd - (((fd % 7) + 7) % 7)) // 7) AS cohort, CAST(count(*) AS BIGINT)
        |         AS cohort_users
        |       FROM f GROUP BY 1),
        |cells AS (
        |  SELECT ((f.fd - (((f.fd % 7) + 7) % 7)) // 7) AS cohort, (ev.d - f.fd) // 7 AS "offset",
        |         CAST(sum(ev.c) AS BIGINT) AS revenue_cents
        |  FROM ev JOIN f USING (user_id) GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort, "offset", revenue_cents,
        |         CAST(sum(revenue_cents) OVER (PARTITION BY cohort
        |           ORDER BY "offset") AS BIGINT) AS cum_cents
        |  FROM cells)
        |SELECT cum.cohort, cum."offset", cum.revenue_cents, cum.cum_cents,
        |       sz.cohort_users,
        |       CAST(cum.cum_cents AS DOUBLE) /
        |         CAST(sz.cohort_users AS DOUBLE) AS ltv_per_user_cents
        |FROM cum JOIN sz USING (cohort)
        |ORDER BY cohort, "offset"""".stripMargin,

    // Recursive CC labels every doc (singletons self-labeled); the
    // canonical set carries cluster sizes into the q138 priority
    // formula with weight = n_members.
    "q275_dedup_aware_sample" ->
      s"""WITH RECURSIVE ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |reach(node, comp) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
         |lab AS (SELECT node AS doc_id, min(comp) AS component
         |        FROM reach GROUP BY 1),
         |szs AS (SELECT component, CAST(count(*) AS BIGINT) AS n_members
         |        FROM lab GROUP BY 1),
         |canon AS (
         |  SELECT l.doc_id, s.n_members
         |  FROM lab l JOIN szs s USING (component)
         |  WHERE l.doc_id = l.component),
         |h AS (
         |  SELECT doc_id, n_members,
         |         CAST(n_members AS DOUBLE) * 4294967296 /
         |           CAST((((doc_id % 2147483648) * 2654435761)
         |             % 4294967296) + 1 AS DOUBLE) AS priority
         |  FROM canon WHERE n_members > 0),
         |rk AS (
         |  SELECT doc_id, n_members, priority,
         |         row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
         |  FROM h),
         |tau AS (
         |  SELECT coalesce(min(priority), 0.0) AS tau FROM rk WHERE rn = 31)
         |SELECT doc_id, n_members, CAST(rn AS BIGINT) AS rank, priority,
         |       greatest(CAST(n_members AS DOUBLE), tau.tau) AS est_weight
         |FROM rk CROSS JOIN tau
         |WHERE rn <= 30 ORDER BY rank""".stripMargin,

    // Distinct (type, user) self-join per pair; Jaccard + both
    // conditional shares, one division each.
    "q276_audience_overlap" ->
      """WITH au AS (
        |  SELECT DISTINCT event_type AS t, user_id AS u FROM events),
        |sz AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM au GROUP BY 1),
        |p AS (
        |  SELECT a.t AS type_a, b.t AS type_b,
        |         CAST(count(*) AS BIGINT) AS overlap
        |  FROM au a JOIN au b ON a.u = b.u AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, sa.n AS users_a, sb.n AS users_b,
        |       p.overlap,
        |       CAST(p.overlap AS DOUBLE) /
        |         CAST(sa.n + sb.n - p.overlap AS DOUBLE) AS jaccard,
        |       CAST(p.overlap AS DOUBLE) / CAST(sa.n AS DOUBLE)
        |         AS share_of_a,
        |       CAST(p.overlap AS DOUBLE) / CAST(sb.n AS DOUBLE)
        |         AS share_of_b
        |FROM p JOIN sz sa ON sa.t = p.type_a
        |JOIN sz sb ON sb.t = p.type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // SCD2 versions on nanosecond ts, two literal-offset snapshots from
    // the min-ts anchor.
    "q270_bitemporal_asof" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS tsn,
        |         event_id
        |  FROM events),
        |t0 AS (SELECT min(tsn) AS t0 FROM ev),
        |chg AS (
        |  SELECT user_id, event_type, tsn, event_id FROM (
        |    SELECT user_id, event_type, tsn, event_id,
        |           lag(event_type) OVER (PARTITION BY user_id
        |             ORDER BY tsn, event_id) AS prev
        |    FROM ev)
        |  WHERE prev IS NULL OR prev != event_type),
        |hist AS (
        |  SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
        |         event_type, tsn AS valid_from, lead(tsn) OVER w AS valid_to
        |  FROM chg
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
        |snap AS (
        |  SELECT CAST(d.off AS BIGINT) AS as_of_day, h.user_id, h.version,
        |         h.event_type AS state
        |  FROM hist h, t0, (VALUES (10), (25)) d(off)
        |  WHERE h.valid_from <= t0.t0 + d.off * 86400000000000
        |    AND (h.valid_to IS NULL OR
        |         t0.t0 + d.off * 86400000000000 < h.valid_to))
        |SELECT as_of_day, user_id, version, state
        |FROM snap ORDER BY as_of_day, user_id""".stripMargin,

    // q229's per-dim fixed-point chain grouped by label; per-dim
    // centroid products/squares quantized to 2^30 before the cross-dim
    // totals; cos = dot_fp / sqrt(nsq_a·nsq_b), scale cancels.
    "q271_class_separation" ->
      """WITH ev AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE label IS NOT NULL AND embedding IS NOT NULL),
        |px AS (SELECT label, t.i AS dim, v[t.i + 1] AS x
        |       FROM ev, range(64) t(i)),
        |ag AS (
        |  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(floor(x * 1048576) AS BIGINT)) AS BIGINT)
        |           AS s
        |  FROM px GROUP BY 1, 2),
        |m AS (
        |  SELECT label, dim,
        |         CAST(s AS DOUBLE) / CAST(n * 1048576 AS DOUBLE) AS mu
        |  FROM ag),
        |nrm AS (
        |  SELECT label,
        |         CAST(sum(CAST(floor(mu * mu * CAST(1073741824.0 AS DOUBLE))
        |           AS BIGINT)) AS BIGINT) AS nsq
        |  FROM m GROUP BY 1),
        |p AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |         CAST(sum(CAST(floor(a.mu * b.mu *
        |           CAST(1073741824.0 AS DOUBLE)) AS BIGINT)) AS BIGINT)
        |           AS dot_fp
        |  FROM m a JOIN m b ON a.dim = b.dim AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT p.label_a, p.label_b, p.dot_fp, na.nsq AS nsq_a,
        |       nb.nsq AS nsq_b,
        |       CASE WHEN na.nsq > 0 AND nb.nsq > 0
        |            THEN CAST(p.dot_fp AS DOUBLE) /
        |                 sqrt(CAST(na.nsq AS DOUBLE) *
        |                      CAST(nb.nsq AS DOUBLE)) END AS cos
        |FROM p JOIN nrm na ON na.label = p.label_a
        |JOIN nrm nb ON nb.label = p.label_b
        |ORDER BY label_a, label_b""".stripMargin,

    // Wide pairs at hamming 2; shared distinct bigram shingles with
    // corpus df; the witness = the (df, shingle)-min shared shingle.
    "q272_dup_evidence" ->
      s"""WITH ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |cand AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |shg AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(tk)),
         |      i -> list_aggregate(tk[i:i+1], 'string_agg', ' ')))) AS s
         |  FROM toks),
         |dfx AS (SELECT s, CAST(count(*) AS BIGINT) AS df
         |        FROM shg GROUP BY 1),
         |shared AS (
         |  SELECT c.i, c.j, x.s, dfx.df
         |  FROM cand c
         |  JOIN shg x ON x.doc_id = c.i
         |  JOIN shg y ON y.doc_id = c.j AND y.s = x.s
         |  JOIN dfx ON dfx.s = x.s),
         |agg AS (
         |  SELECT i, j, CAST(count(*) AS BIGINT) AS n_shared,
         |         CAST(min(df) AS BIGINT) AS witness_df,
         |         first(s ORDER BY df, s) AS witness
         |  FROM shared GROUP BY 1, 2)
         |SELECT c.i, c.j,
         |       CAST(COALESCE(a.n_shared, 0) AS BIGINT) AS n_shared,
         |       a.witness_df, a.witness
         |FROM cand c LEFT JOIN agg a ON a.i = c.i AND a.j = c.j
         |ORDER BY c.i, c.j""".stripMargin,

    // The incremental labeling equals a full recompute over ALL pairs
    // (min-label CC is associative over edge unions) — so the oracle IS
    // the full recursive CC.
    "q273_incr_cc" ->
      s"""WITH RECURSIVE ${oSimhashCte("sh31", 31)},
         |${oSimhashCte("sh37", 37, seed = 1)},
         |wide AS (
         |  SELECT a.doc_id, a.sig + b.sig * ${1L << TextAnalysis.SimHashBits} AS sig
         |  FROM sh31 a JOIN sh37 b USING (doc_id)),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j
         |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |edges AS (SELECT i AS u, j AS v FROM pairs
         |          UNION ALL SELECT j, i FROM pairs),
         |nodes AS (SELECT DISTINCT u AS node FROM edges),
         |reach(node, comp) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node)
         |SELECT node AS id, CAST(min(comp) AS BIGINT) AS component
         |FROM reach GROUP BY 1 ORDER BY id""".stripMargin,

    // Prefix (n, Σ, Σx²) over day rows; per-split SSE in fixed double
    // shapes; argmin by (sse, t).
    "q266_changepoint" ->
      """WITH d AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT t,
        |         CAST(sum(1) OVER (ORDER BY t) AS BIGINT) AS nl,
        |         CAST(sum(x) OVER (ORDER BY t) AS BIGINT) AS sl,
        |         CAST(sum(x * x) OVER (ORDER BY t) AS BIGINT) AS ql,
        |         CAST(count(*) OVER () AS BIGINT) AS n,
        |         CAST(sum(x) OVER () AS BIGINT) AS s,
        |         CAST(sum(x * x) OVER () AS BIGINT) AS q
        |  FROM d),
        |c AS (
        |  SELECT t, nl, n - nl AS nr, sl, s - sl AS sr, ql, q - ql AS qr,
        |         n, s, q
        |  FROM p WHERE nl < n),
        |e AS (
        |  SELECT *,
        |         (CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) *
        |            CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)) +
        |         (CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) *
        |            CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)) AS sse
        |  FROM c)
        |SELECT t AS split_t, nl AS n_left, nr AS n_right,
        |       CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS mean_left,
        |       CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS mean_right,
        |       sse AS sse_split,
        |       CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
        |         CAST(n AS DOUBLE) AS sse_total,
        |       CASE WHEN CAST(q AS DOUBLE) - CAST(s AS DOUBLE) *
        |                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0
        |            THEN CAST(1.0 AS DOUBLE) - sse /
        |                 (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) *
        |                    CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |       END AS reduction
        |FROM e ORDER BY sse, t LIMIT 1""".stripMargin,

    // Per-user (recency, frequency, cents) then the q75 ceiling-bucket
    // formula on each metric's histogram; segment histogram.
    "q267_rfm" -> {
      def nt(metric: String) =
        s"""h_$metric AS (
           |  SELECT $metric AS v, count(*) AS c FROM rfm GROUP BY 1),
           |b_$metric AS (
           |  SELECT v, CAST((sum(c) OVER (ORDER BY v) * 4 - 1)
           |    // (sum(c) OVER ()) + 1 AS BIGINT) AS bucket
           |  FROM h_$metric)""".stripMargin
      s"""WITH pu AS (
         |  SELECT user_id,
         |         CAST(max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS BIGINT)
         |           AS last_d,
         |         CAST(count(*) AS BIGINT) AS frequency,
         |         CAST(sum(CAST(floor(value * CAST(100.0 AS DOUBLE))
         |           AS BIGINT)) AS BIGINT) AS monetary
         |  FROM events GROUP BY 1),
         |hz AS (SELECT max(last_d) AS h FROM pu),
         |rfm AS (
         |  SELECT user_id, h - last_d AS recency, frequency, monetary
         |  FROM pu, hz),
         |${nt("recency")},
         |${nt("frequency")},
         |${nt("monetary")}
         |SELECT br.bucket AS r, bf.bucket AS f, bm.bucket AS m,
         |       CAST(count(*) AS BIGINT) AS n_users
         |FROM rfm
         |JOIN b_recency br ON br.v = rfm.recency
         |JOIN b_frequency bf ON bf.v = rfm.frequency
         |JOIN b_monetary bm ON bm.v = rfm.monetary
         |GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin
    },

    // q251's capped pair graph; degrees over both orientations; the
    // corrByGroup closed form on (du, dv) edge rows.
    "q268_assortativity" ->
      """WITH ai AS (
        |  SELECT DISTINCT l_orderkey AS actor, l_partkey AS item
        |  FROM lineitem),
        |deg0 AS (SELECT actor, count(*) AS dg FROM ai GROUP BY 1),
        |cap AS (SELECT ai.actor, ai.item
        |        FROM ai JOIN deg0 USING (actor) WHERE dg <= 6),
        |pairs AS (
        |  SELECT DISTINCT x.item AS i, y.item AS j
        |  FROM cap x JOIN cap y ON x.actor = y.actor AND x.item < y.item),
        |sym AS (SELECT i AS u, j AS v FROM pairs
        |        UNION ALL SELECT j, i FROM pairs),
        |dg AS (SELECT u, CAST(count(DISTINCT v) AS BIGINT) AS deg
        |       FROM sym GROUP BY 1),
        |rows_ AS (
        |  SELECT du.deg AS x, dv.deg AS y
        |  FROM sym JOIN dg du ON du.u = sym.u
        |  JOIN dg dv ON dv.u = sym.v),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM rows_)
        |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
        |       CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
        |            THEN CAST(n * sxy - sx * sy AS DOUBLE) /
        |                 sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |                      CAST(n * syy - sy * sy AS DOUBLE))
        |       END AS corr
        |FROM st""".stripMargin,

    // Two CCs (full graph, hub-filtered graph) via the unrolled
    // hook+jump chain (oUnrolledCcCtes — the recursive form was a
    // 68 s oracle); giant = max component size, nodes = labeled nodes.
    "q269_hub_removal" ->
      s"""WITH ai AS (
        |  SELECT DISTINCT l_orderkey AS actor, l_partkey AS item
        |  FROM lineitem),
        |deg0 AS (SELECT actor, count(*) AS dg FROM ai GROUP BY 1),
        |cap AS (SELECT ai.actor, ai.item
        |        FROM ai JOIN deg0 USING (actor) WHERE dg <= 6),
        |pairs AS (
        |  SELECT DISTINCT x.item AS i, y.item AS j
        |  FROM cap x JOIN cap y ON x.actor = y.actor AND x.item < y.item),
        |sym AS MATERIALIZED (SELECT i AS u, j AS v FROM pairs
        |        UNION ALL SELECT j, i FROM pairs),
        |dg AS (SELECT u AS node, CAST(count(DISTINCT v) AS BIGINT) AS deg
        |       FROM sym GROUP BY 1),
        |hubs AS (SELECT node FROM dg ORDER BY deg DESC, node LIMIT 5),
        |e1 AS MATERIALIZED (SELECT u, v FROM sym),
        |n1 AS (SELECT DISTINCT u AS node FROM e1),
        |${oUnrolledCcCtes("a", "n1", "e1")},
        |g1 AS (SELECT CAST(max(sz) + (SELECT poison FROM achg) AS BIGINT)
        |         AS giant_before FROM (
        |         SELECT component, count(*) AS sz FROM alab GROUP BY 1)),
        |e2 AS MATERIALIZED (
        |  SELECT u, v FROM sym
        |  WHERE u NOT IN (SELECT node FROM hubs)
        |    AND v NOT IN (SELECT node FROM hubs)),
        |n2 AS (SELECT DISTINCT u AS node FROM e2),
        |${oUnrolledCcCtes("b", "n2", "e2")},
        |g2 AS (SELECT CAST(COALESCE(max(sz), 0) + (SELECT poison FROM bchg)
        |         AS BIGINT) AS giant_after
        |       FROM (SELECT component, count(*) AS sz FROM blab GROUP BY 1))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM alab) AS n_nodes,
        |       g1.giant_before, g2.giant_after,
        |       CASE WHEN g1.giant_before > 0
        |            THEN CAST(g2.giant_after AS DOUBLE) /
        |                 CAST(g1.giant_before AS DOUBLE) END AS retained
        |FROM g1, g2""".stripMargin,

    // Per-column rows/NDV/runs along (orderkey, linenumber); runs via a
    // lag recount (equality is intra-engine, so native values suffice);
    // thresholds are plan literals.
    "q265_encoding_advisor" -> {
      def block(c: String) =
        s"""SELECT '$c' AS "column",
           |       CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(count(DISTINCT v) AS BIGINT) AS ndv,
           |       CAST(count(CASE WHEN rn > 1 AND pv IS DISTINCT FROM v
           |                       THEN 1 END) + 1 AS BIGINT) AS runs
           |FROM (
           |  SELECT $c AS v, lag($c) OVER (ORDER BY rn) AS pv, rn
           |  FROM ord)""".stripMargin
      val blocks = Seq("l_returnflag", "l_linestatus", "l_shipdate",
        "l_quantity", "l_orderkey").map(block)
        .mkString("(\n", "\nUNION ALL\n", "\n)")
      s"""WITH ord AS (
         |  SELECT l_returnflag, l_linestatus, l_shipdate, l_quantity,
         |         l_orderkey,
         |         row_number() OVER (ORDER BY l_orderkey, l_linenumber)
         |           AS rn
         |  FROM lineitem),
         |per AS (SELECT * FROM $blocks)
         |SELECT "column", n_rows, ndv, runs,
         |       CASE WHEN n_rows > 0
         |            THEN CAST(runs AS DOUBLE) / CAST(n_rows AS DOUBLE)
         |       END AS runs_ratio,
         |       CASE WHEN n_rows > 0
         |            THEN CAST(ndv AS DOUBLE) / CAST(n_rows AS DOUBLE)
         |       END AS ndv_ratio,
         |       CASE WHEN runs * 8 <= n_rows THEN 'rle'
         |            WHEN ndv * 16 <= n_rows THEN 'dict'
         |            ELSE 'plain' END AS recommended
         |FROM per ORDER BY "column"""".stripMargin
    },

    // q109's stage CTEs, whole-second lags, q74's histogram quantile
    // reads per stage.
    "q260_funnel_latency" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) AS ns, event_type FROM events),
        |s1 AS MATERIALIZED (
        |  SELECT user_id, min(ns) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS MATERIALIZED (
        |  SELECT e.user_id, s1.t1, min(e.ns) AS t2
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ns > s1.t1
        |    AND e.ns <= s1.t1 + 86400000000000
        |  GROUP BY 1, 2),
        |s3 AS MATERIALIZED (
        |  SELECT e.user_id, s2.t1, min(e.ns) AS t3
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ns > s2.t2
        |    AND e.ns <= s2.t1 + 86400000000000
        |  GROUP BY 1, 2),
        |st AS (
        |  SELECT 'click' AS stage, (t2 - t1) // 1000000000 AS lag_s FROM s2
        |  UNION ALL
        |  SELECT 'purchase', (t3 - t1) // 1000000000 FROM s3),
        |h AS (SELECT stage, lag_s AS v, count(*) AS c
        |      FROM st GROUP BY 1, 2),
        |cum AS (
        |  SELECT stage, v,
        |         sum(c) OVER (PARTITION BY stage ORDER BY v) AS cum,
        |         sum(c) OVER (PARTITION BY stage) AS n
        |  FROM h)
        |SELECT stage, CAST(min(n) AS BIGINT) AS n,
        |       min(CASE WHEN cum * 4 >= n * 1 THEN v END) AS p25,
        |       min(CASE WHEN cum * 4 >= n * 2 THEN v END) AS p50,
        |       min(CASE WHEN cum * 4 >= n * 3 THEN v END) AS p75
        |FROM cum GROUP BY stage ORDER BY stage""".stripMargin,

    // Full-dim brute top-5 vs FIRST-16-dim prefix top-5 (prefix norms
    // and dots over v[1:16] with the same fold shapes), per-query
    // recall.
    "q261_matryoshka_recall" -> {
      def pCos(a: String, b: String) =
        s"""list_reduce(list_prepend(0.0, list_transform(range(16),
           |  i -> $a.v[i+1] * $b.v[i+1])), (x, y) -> x + y) / ($a.pnrm * $b.pnrm)""".stripMargin
      s"""WITH $oNorms,
         |pn AS (
         |  SELECT vec_id, v,
         |         sqrt(list_reduce(list_prepend(0.0,
         |           list_transform(v[1:16], x -> x*x)),
         |           (a, b) -> a + b)) AS pnrm
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |        FROM embeddings)),
         |bscored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid, ${oCos("q", "c")} AS cos
         |  FROM norms q JOIN norms c
         |    ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |branked AS (
         |  SELECT qid, nid,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY cos DESC, nid) AS rank
         |  FROM bscored),
         |brute AS (SELECT qid, nid FROM branked WHERE rank <= 5),
         |pscored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |         CASE WHEN q.pnrm * c.pnrm <> 0
         |              THEN ${pCos("q", "c")} END AS cos
         |  FROM pn q JOIN pn c
         |    ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |pranked AS (
         |  SELECT qid, nid,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY cos DESC NULLS LAST, nid) AS rank
         |  FROM pscored),
         |pref AS (SELECT qid, nid FROM pranked WHERE rank <= 5)
         |SELECT b.qid, CAST(count(p.nid) AS BIGINT) AS hits,
         |       CAST(count(p.nid) AS DOUBLE) / 5 AS recall_at_5
         |FROM brute b LEFT JOIN pref p ON p.qid = b.qid AND p.nid = b.nid
         |GROUP BY b.qid ORDER BY b.qid""".stripMargin
    },

    // Per-version protocol verdicts are the publish/vacuum CONTRACT
    // (fixed by the fixture design: v1 orphaned by a crashed sweep,
    // v2 aged out under keep=2, v3 retained, v4 current) — the engine
    // side derives them from the actual post-sweep filesystem, so a
    // sweep bug breaks the hash; retained row counts come from the
    // source table, checking the surviving snapshots' CONTENT.
    "q290_snapshot_retention" ->
      """WITH c3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                   CAST(count(DISTINCT lang) AS BIGINT) AS nl
        |            FROM documents WHERE doc_id < 300),
        |c4 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(count(DISTINCT lang) AS BIGINT) AS nl
        |       FROM documents)
        |SELECT v.version, v.status,
        |       CASE WHEN v.version = 3 THEN (SELECT n FROM c3)
        |            WHEN v.version = 4 THEN (SELECT n FROM c4)
        |       END AS n_rows,
        |       CASE WHEN v.version = 3 THEN (SELECT nl FROM c3)
        |            WHEN v.version = 4 THEN (SELECT nl FROM c4)
        |       END AS n_langs
        |FROM (VALUES
        |  (CAST(1 AS BIGINT), 'swept_orphan'),
        |  (CAST(2 AS BIGINT), 'swept_expired'),
        |  (CAST(3 AS BIGINT), 'retained'),
        |  (CAST(4 AS BIGINT), 'retained_current'))
        |  AS v(version, status)
        |ORDER BY v.version""".stripMargin,

    // The three diff rows are fixed by the staged schema change
    // (remove lang, add source, retype n_chars bigint->double); the
    // engine reads them from parquet footers, so a footer-diff bug
    // breaks the hash; n_to_rows checks the published content.
    "q291_schema_evolution" ->
      """WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(count(DISTINCT source) AS BIGINT) AS ns,
        |                  CAST(count(*) FILTER (source IS NULL)
        |                    AS BIGINT) AS nnull,
        |                  CAST(sum(CAST(n_chars AS DOUBLE))
        |                    AS BIGINT) AS csum
        |           FROM documents)
        |SELECT t."column", t.from_type, t.to_type, t.change,
        |       c.n AS n_to_rows, c.ns AS n_to_sources,
        |       c.nnull AS n_to_null_source, c.csum AS to_chars_sum
        |FROM (VALUES
        |  ('lang', 'string', CAST(NULL AS VARCHAR), 'removed'),
        |  ('n_chars', 'bigint', 'double', 'retyped'),
        |  ('source', CAST(NULL AS VARCHAR), 'string', 'added'))
        |  AS t("column", from_type, to_type, change)
        |CROSS JOIN c
        |ORDER BY t."column"""".stripMargin,

    // MaxMatch: the identical position walk as a RECURSIVE CTE — one
    // step per emitted token, the longest-candidate coalesce and
    // boundary guards generated from the SAME maxLen..1 loop as the
    // engine's lambda, so every decision (including longest-wins on
    // overlapping units) is integer-exact cross-engine. Recursive CTE
    // rather than list_reduce: DuckDB 1.0.0's list_reduce returned
    // BATCH-CONTEXT-DEPENDENT results on a 600-step fold (same CTE,
    // different answer with/without a pushed filter — caught by the
    // fuzz corpus's 600-char single-token doc), so the oracle walks
    // the well-tested recursion path instead. Every step advances pos
    // by >= 1, so the recursion depth is the longest word.
    "q292_maxmatch_tokens" ->
      s"""WITH RECURSIVE dwords AS (
         |  SELECT DISTINCT unnest($oToks) AS w FROM documents),
         |walk(w, pos, ntok, nunk) AS (
         |  SELECT w, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM dwords
         |  UNION ALL
         |  SELECT w,
         |         pos + coalesce($oMaxMatchPick, 1),
         |         ntok + 1,
         |         nunk + CASE WHEN $oMaxMatchPick IS NULL THEN 1 ELSE 0 END
         |  FROM walk WHERE pos <= length(w)),
         |seg AS (SELECT w, ntok, nunk FROM walk WHERE pos > length(w)),
         |tok AS (SELECT doc_id, unnest($oToks) AS w FROM documents),
         |agg AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |         CAST(sum(s.ntok) AS BIGINT) AS n_tokens,
         |         CAST(sum(s.nunk) AS BIGINT) AS n_unk_chars
         |  FROM tok t JOIN seg s USING (w) GROUP BY 1)
         |SELECT d.doc_id,
         |       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
         |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(COALESCE(a.n_unk_chars, 0) AS BIGINT) AS n_unk_chars,
         |       CASE WHEN COALESCE(a.n_words, 0) > 0
         |            THEN CAST(a.n_tokens AS DOUBLE) /
         |                 CAST(a.n_words AS DOUBLE) END AS fertility
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Mergeability: the q111 register chain grouped by source, the
    // per-bucket max across sources, and the same chain ungrouped —
    // the associativity of per-bucket max means both produce the same
    // registers, which the ENGINE must demonstrate (it builds both and
    // compares); the oracle derives the registers once and asserts the
    // equality as the protocol constant TRUE, so any engine-side merge
    // bug breaks the hash. Hash chain and harmonic sum are q111's
    // fuzz-proven lines verbatim.
    "q293_sketch_merge" ->
      s"""WITH tok AS (
         |  SELECT source AS g, text AS t FROM documents
         |  WHERE text IS NOT NULL),
         |h0 AS (SELECT g, ${oPolyHash("t")} AS h FROM tok),
         |hm AS (
         |  SELECT g, xor(e, e >> 16) AS hv FROM (
         |    SELECT g, (xor(b, b >> 13) * 1103515245) % 2147483648 AS e
         |    FROM (
         |      SELECT g, (xor(h, h >> 15) * 1540483477) % 2147483648 AS b
         |      FROM h0))),
         |br AS (
         |  SELECT g, hv % 16 AS bucket,
         |         CASE WHEN hv // 16 = 0 THEN 28
         |              ELSE 28 - length(bin(hv // 16)) END AS rnk
         |  FROM hm),
         |mrgd AS (
         |  SELECT gs.b AS bucket,
         |         coalesce(mx.reg, CAST(0 AS BIGINT)) AS reg
         |  FROM (SELECT unnest(range(16)) AS b) gs
         |  LEFT JOIN (SELECT bucket, CAST(max(rnk) AS BIGINT) AS reg
         |             FROM br GROUP BY 1) mx ON mx.bucket = gs.b),
         |mregs AS (SELECT list(reg ORDER BY bucket) AS regs FROM mrgd),
         |ex AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS n_exact
         |       FROM tok)
         |SELECT array_to_string(m.regs, ',') AS merged_regs,
         |       array_to_string(m.regs, ',') AS global_regs,
         |       TRUE AS mergeable,
         |       (CAST(0.673 AS DOUBLE) * 256)
         |         / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |             list_transform(m.regs, x -> CAST(1.0 AS DOUBLE)
         |               / CAST((CAST(1 AS BIGINT) << x) AS DOUBLE))),
         |             (a, x) -> a + x) AS est,
         |       ex.n_exact
         |FROM mregs m CROSS JOIN ex
         |ORDER BY merged_regs""".stripMargin,

    // DSIR weights: the bucket table is derived once (raw + target
    // counts in one grouped pass — the target flag rides the gram row);
    // the per-gram ratio is two exact-integer→double casts, two IEEE
    // divisions, an exact 2^20 scale and a floor, operand-for-operand
    // the operator's order; per-doc sums are exact BIGINTs, the mean is
    // the single closing division.
    "q294_dsir_weights" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang = 'en' AS t, $oToks AS tk FROM documents),
         |dg AS (
         |  SELECT doc_id, t, ${oPolyHash("gram")} % 256 AS b FROM (
         |    SELECT doc_id, t, unnest(list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i+1])) AS gram
         |    FROM toks)),
         |bc AS (SELECT b, CAST(count(*) AS BIGINT) AS cr,
         |              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS ct
         |       FROM dg GROUP BY 1),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
         |               CAST(sum(ct) AS BIGINT) AS nt FROM bc),
         |w AS (SELECT b, CAST(floor(
         |         (CAST(ct + 1 AS DOUBLE) / CAST(nt + 256 AS DOUBLE))
         |         / (CAST(cr + 1 AS DOUBLE) / CAST(nr + 256 AS DOUBLE))
         |         * 1048576.0) AS BIGINT) AS wt
         |      FROM bc CROSS JOIN tot),
         |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |               CAST(sum(wt) AS BIGINT) AS dsir_fp
         |        FROM dg JOIN w USING (b) GROUP BY 1)
         |SELECT d.doc_id,
         |       coalesce(per.n_grams, CAST(0 AS BIGINT)) AS n_grams,
         |       coalesce(per.dsir_fp, CAST(0 AS BIGINT)) AS dsir_fp,
         |       CASE WHEN per.n_grams > 0
         |            THEN CAST(per.dsir_fp AS DOUBLE) / per.n_grams
         |       END AS dsir_weight
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // W1 per source vs rest: HUGEINT cross-multiplied CDF numerators
    // mirror the engine's DECIMAL(38,0); the quantized quotient is one
    // integral // (positive operands — floor == truncate), the double
    // an exact 2^-30 rescale of a BIGINT.
    "q295_wasserstein_drift" ->
      """WITH base AS (
        |  SELECT source AS g, CAST(n_chars AS BIGINT) AS x FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |hist AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c
        |         FROM base GROUP BY 1, 2),
        |sup AS (SELECT x, CAST(count(*) AS BIGINT) AS cx
        |        FROM base GROUP BY 1),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ng
        |        FROM base GROUP BY 1),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM grp),
        |grid AS (
        |  SELECT grp.g, grp.ng, sup.x, sup.cx,
        |         coalesce(hist.c, CAST(0 AS BIGINT)) AS c
        |  FROM grp CROSS JOIN sup
        |  LEFT JOIN hist ON hist.g = grp.g AND hist.x = sup.x),
        |cum AS (
        |  SELECT g, ng, x, cx, c,
        |         sum(c) OVER (PARTITION BY g ORDER BY x) AS cg,
        |         sum(cx) OVER (PARTITION BY g ORDER BY x) AS cxx,
        |         lead(x) OVER (PARTITION BY g ORDER BY x) - x AS gap
        |  FROM grid),
        |terms AS (
        |  SELECT g, sum(abs(CAST(cg AS HUGEINT) * (n - ng)
        |                    - CAST(cxx - cg AS HUGEINT) * ng) * gap) AS num
        |  FROM cum CROSS JOIN tot WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT grp.g AS source, grp.ng AS n,
        |       CAST(coalesce(terms.num, CAST(0 AS HUGEINT)) AS VARCHAR)
        |         AS w1_num_str,
        |       CAST(CAST(grp.ng AS HUGEINT) * (tot.n - grp.ng) AS VARCHAR)
        |         AS w1_den_str,
        |       CASE WHEN tot.n > grp.ng THEN CAST(
        |         (coalesce(terms.num, CAST(0 AS HUGEINT)) * 1073741824)
        |           // (CAST(grp.ng AS HUGEINT) * (tot.n - grp.ng))
        |         AS BIGINT) END AS w1_q30,
        |       CAST(CASE WHEN tot.n > grp.ng THEN CAST(
        |         (coalesce(terms.num, CAST(0 AS HUGEINT)) * 1073741824)
        |           // (CAST(grp.ng AS HUGEINT) * (tot.n - grp.ng))
        |         AS BIGINT) END AS DOUBLE) / 1073741824.0 AS w1
        |FROM grp CROSS JOIN tot LEFT JOIN terms ON terms.g = grp.g
        |ORDER BY source""".stripMargin,

    // Per-user spend totals are exact cents; the head-to-head is one
    // subject-local self-join (a.i < b.i keeps each unordered pair
    // once, binary string order both engines).
    "q296_pairwise_wins" ->
      """WITH per AS (
        |  SELECT user_id AS s, event_type AS i,
        |         CAST(sum(CAST(floor(value * CAST(100.0 AS DOUBLE))
        |           AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2)
        |SELECT a.i AS item_a, b.i AS item_b,
        |       CAST(count(CASE WHEN a.m > b.m THEN 1 END) AS BIGINT)
        |         AS wins_a,
        |       CAST(count(CASE WHEN b.m > a.m THEN 1 END) AS BIGINT)
        |         AS wins_b,
        |       CAST(count(CASE WHEN a.m = b.m THEN 1 END) AS BIGINT)
        |         AS ties
        |FROM per a JOIN per b ON a.s = b.s AND a.i < b.i
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // The MM iterations unroll as chained CTEs (a recursive CTE may
    // reference its own previous round only once; the update needs
    // r_i AND r_j, so unrolling is the faithful spelling). Every
    // division is positive-operand // — floor, as in the engine's
    // long arithmetic.
    "q297_bradley_terry" -> oBradleyTerrySql(8),

    // q292's recursive walk, re-pointed at a per-(word, pos)
    // longest-match table built by equi-joining candidate slices
    // against the oracle's own copy of the 5k+ fuzz vocab — the same
    // candidate explode + max(k) + walk the engine runs, so every
    // longest-wins and UNK decision is integer-exact cross-engine.
    "q298_maxmatch_joined" -> oMaxMatchJoinedSql(maxMatchVocab5k),

    // Train/apply split: the weight CTE is q294's bucket table derived
    // from the EVEN slice only, DENSIFIED over range(256) so buckets
    // the training slice never saw carry the smoothed prior ratio
    // (coalesce(c,0)+1 operand-for-operand the engine's dense fill);
    // scoring replays the odd slice's gram stream against it.
    "q299_dsir_frozen_apply" ->
      s"""WITH tr AS (
         |  SELECT lang = 'en' AS t, $oToks AS tk FROM documents
         |  WHERE doc_id % 2 = 0),
         |dg AS (
         |  SELECT t, ${oPolyHash("gram")} % 256 AS b FROM (
         |    SELECT t, unnest(list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i+1])) AS gram
         |    FROM tr)),
         |bc AS (SELECT b, CAST(count(*) AS BIGINT) AS cr,
         |              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS ct
         |       FROM dg GROUP BY 1),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
         |               CAST(sum(ct) AS BIGINT) AS nt FROM bc),
         |w AS (SELECT gs.b AS b, CAST(floor(
         |         (CAST(coalesce(bc.ct, 0) + 1 AS DOUBLE)
         |            / CAST(tot.nt + 256 AS DOUBLE))
         |         / (CAST(coalesce(bc.cr, 0) + 1 AS DOUBLE)
         |            / CAST(tot.nr + 256 AS DOUBLE))
         |         * 1048576.0) AS BIGINT) AS wt
         |      FROM (SELECT unnest(range(256)) AS b) gs
         |      CROSS JOIN tot LEFT JOIN bc ON bc.b = gs.b),
         |sc AS (SELECT doc_id, $oToks AS tk FROM documents
         |       WHERE doc_id % 2 = 1),
         |sg AS (
         |  SELECT doc_id, ${oPolyHash("gram")} % 256 AS b FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i+1])) AS gram
         |    FROM sc)),
         |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |               CAST(sum(wt) AS BIGINT) AS dsir_fp
         |        FROM sg JOIN w USING (b) GROUP BY 1)
         |SELECT d.doc_id,
         |       coalesce(per.n_grams, CAST(0 AS BIGINT)) AS n_grams,
         |       coalesce(per.dsir_fp, CAST(0 AS BIGINT)) AS dsir_fp,
         |       CASE WHEN per.n_grams > 0
         |            THEN CAST(per.dsir_fp AS DOUBLE) / per.n_grams
         |       END AS dsir_weight
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
         |LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Same MM unroll as q297, wins derived through the EXPLICIT
    // (winner, loser) comparison shape instead of the subject-local
    // score join.
    "q300_bt_explicit" -> oBradleyTerrySql(8, oExplicitWinsCtes),

    // q92's unrolled merge stages end in the final word table s8; the
    // learned vocab is its distinct symbols, and the q298 candidate-
    // join + recursive walk replays the apply side against it. The
    // candidate explode is UNCAPPED here (no maxLen constant — the
    // learned max unit length is data-dependent); slices longer than
    // any unit simply match nothing, so the capped engine plan and the
    // uncapped oracle are decision-identical.
    "q301_tokenizer_lifecycle" -> oTokenizerLifecycleSql(8),

    // Prefix hash = the positional gram hash's element 1: the polyhash
    // of the space-joined first d tokens — replayed per depth over a
    // VALUES depth table; stats re-derived from the (depth, hash)
    // groups.
    "q302_prefix_sharing" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |pre AS (
         |  SELECT d.depth, t.doc_id,
         |         CASE WHEN len(t.tk) >= d.depth THEN
         |           ${oPolyHash("array_to_string(t.tk[1:d.depth], ' ')")}
         |         END AS h
         |  FROM toks t CROSS JOIN
         |    (VALUES (1),(2),(4),(8),(16)) d(depth)),
         |grp AS (SELECT depth, h, CAST(count(*) AS BIGINT) AS c
         |        FROM pre WHERE h IS NOT NULL GROUP BY 1, 2),
         |st AS (
         |  SELECT depth, CAST(sum(c) AS BIGINT) AS n_docs,
         |         CAST(count(*) AS BIGINT) AS n_prefixes,
         |         CAST(count(CASE WHEN c >= 2 THEN 1 END) AS BIGINT)
         |           AS n_shared_prefixes,
         |         CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0)
         |           AS BIGINT) AS n_docs_sharing
         |  FROM grp GROUP BY 1)
         |SELECT depth, n_docs, n_prefixes, n_shared_prefixes,
         |       n_docs_sharing,
         |       CAST((n_docs_sharing - n_shared_prefixes) * depth
         |         AS BIGINT) AS tokens_saved,
         |       CASE WHEN n_docs > 0 THEN
         |         CAST((n_docs_sharing - n_shared_prefixes) * depth
         |           AS DOUBLE)
         |         / (CAST(n_docs AS DOUBLE) * CAST(depth AS DOUBLE))
         |       END AS saved_frac
         |FROM st ORDER BY depth""".stripMargin,

    // pass@k: the identical falling-factorial products (factors
    // clamped at zero, so n-c < k collapses the numerator and the
    // estimate is exactly 1) in HUGEINT, one positive-operand //
    // quantization; n < k rows keep NULL estimates.
    "q303_pass_at_k" ->
      """WITH per AS (
        |  SELECT user_id AS task, CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(CASE WHEN value >= 50.0 THEN 1 END)
        |           AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT task, n, c,
        |         list_reduce(list_prepend(CAST(1 AS HUGEINT),
        |           list_transform(range(0, 5),
        |             i -> CAST(greatest(n - c - i, 0) AS HUGEINT))),
        |           (a, x) -> a * x) AS num,
        |         list_reduce(list_prepend(CAST(1 AS HUGEINT),
        |           list_transform(range(0, 5),
        |             i -> CAST(greatest(n - i, 0) AS HUGEINT))),
        |           (a, x) -> a * x) AS den
        |  FROM per)
        |SELECT task, n, c,
        |       CAST(num AS VARCHAR) AS passk_num_str,
        |       CAST(den AS VARCHAR) AS passk_den_str,
        |       CASE WHEN n >= 5 THEN
        |         CAST(((den - num) * 1073741824) // den AS BIGINT)
        |       END AS pass_at_k_q30,
        |       CAST(CASE WHEN n >= 5 THEN
        |         CAST(((den - num) * 1073741824) // den AS BIGINT)
        |       END AS DOUBLE) / 1073741824.0 AS pass_at_k
        |FROM f ORDER BY task""".stripMargin,

    // ROUGE-N: gram strings replayed verbatim (q87's identity
    // discipline), clipped overlap = Σ least(cc, rc) per (pair, n,
    // gram), one `//` closing division per metric. The base spine
    // LEFT JOIN keeps pairs whose both sides are shorter than n.
    "q304_rouge_n" ->
      s"""WITH prs AS (
         |  SELECT c.doc_id AS pair_id, c.text AS cand, r.text AS refx
         |  FROM documents c JOIN documents r ON r.doc_id = c.doc_id - 1
         |  WHERE c.doc_id % 2 = 1),
         |tk AS (
         |  SELECT pair_id,
         |    ${oToks.replace("text", "coalesce(cand, '')")} AS ct,
         |    ${oToks.replace("text", "coalesce(refx, '')")} AS rt
         |  FROM prs),
         |g AS (
         |  SELECT pair_id, n.n, sd.sd,
         |    unnest(list_transform(
         |      range(1, len(CASE WHEN sd.sd = 0 THEN ct ELSE rt END)
         |        - n.n + 2),
         |      i -> array_to_string(
         |        (CASE WHEN sd.sd = 0 THEN ct ELSE rt END)[i:i + n.n - 1],
         |        ' '))) AS gr
         |  FROM tk CROSS JOIN (VALUES (1), (2)) n(n)
         |       CROSS JOIN (VALUES (0), (1)) sd(sd)),
         |pg AS (
         |  SELECT pair_id, n, gr,
         |    CAST(count(CASE WHEN sd = 0 THEN 1 END) AS BIGINT) AS cc,
         |    CAST(count(CASE WHEN sd = 1 THEN 1 END) AS BIGINT) AS rc
         |  FROM g GROUP BY 1, 2, 3),
         |per AS (
         |  SELECT pair_id, n,
         |    CAST(sum(cc) AS BIGINT) AS ncg,
         |    CAST(sum(rc) AS BIGINT) AS nrg,
         |    CAST(sum(least(cc, rc)) AS BIGINT) AS ov
         |  FROM pg GROUP BY 1, 2),
         |base AS (
         |  SELECT p.pair_id, n.n FROM prs p
         |  CROSS JOIN (VALUES (1), (2)) n(n)),
         |j AS (
         |  SELECT b.pair_id, CAST(b.n AS BIGINT) AS n,
         |    coalesce(per.ncg, CAST(0 AS BIGINT)) AS n_cand_grams,
         |    coalesce(per.nrg, CAST(0 AS BIGINT)) AS n_ref_grams,
         |    coalesce(per.ov, CAST(0 AS BIGINT)) AS overlap
         |  FROM base b LEFT JOIN per ON per.pair_id = b.pair_id
         |    AND per.n = b.n)
         |SELECT pair_id, n_cand_grams, n_ref_grams, overlap,
         |  CASE WHEN n_cand_grams > 0 THEN
         |    CAST((overlap * 1048576) // n_cand_grams AS BIGINT)
         |  END AS rouge_p_q20,
         |  CASE WHEN n_ref_grams > 0 THEN
         |    CAST((overlap * 1048576) // n_ref_grams AS BIGINT)
         |  END AS rouge_r_q20,
         |  CASE WHEN n_cand_grams + n_ref_grams > 0 THEN
         |    CAST((2 * overlap * 1048576) // (n_cand_grams + n_ref_grams)
         |      AS BIGINT)
         |  END AS rouge_f1_q20,
         |  CAST(CASE WHEN n_cand_grams > 0 THEN
         |    CAST((overlap * 1048576) // n_cand_grams AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS rouge_p,
         |  CAST(CASE WHEN n_ref_grams > 0 THEN
         |    CAST((overlap * 1048576) // n_ref_grams AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS rouge_r,
         |  CAST(CASE WHEN n_cand_grams + n_ref_grams > 0 THEN
         |    CAST((2 * overlap * 1048576) // (n_cand_grams + n_ref_grams)
         |      AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS rouge_f1,
         |  n
         |FROM j ORDER BY n, pair_id""".stripMargin,

    // Draft acceptance: bigram pairs replayed positionally, the table's
    // argmax via (count DESC, next ASC) row_number — the engine's
    // deterministic tie-break — then one join keyed by context and one
    // per-doc aggregate; doc spine LEFT JOIN keeps sub-2-token docs.
    "q305_draft_acceptance" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |bi AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |    i -> {'p': tk[i], 'nx': tk[i + 1]})) AS pn
         |  FROM toks),
         |b2 AS (SELECT doc_id, pn.p AS p, pn.nx AS nx FROM bi),
         |cnt AS (SELECT p, nx, CAST(count(*) AS BIGINT) AS c
         |        FROM b2 GROUP BY 1, 2),
         |pred AS (
         |  SELECT p, nx AS pred_next FROM (
         |    SELECT p, nx, row_number() OVER (
         |      PARTITION BY p ORDER BY c DESC, nx ASC) AS rn
         |    FROM cnt) WHERE rn = 1),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_positions,
         |         CAST(count(CASE WHEN b2.nx = pred.pred_next THEN 1 END)
         |           AS BIGINT) AS n_accepted
         |  FROM b2 JOIN pred USING (p) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(per.n_positions, CAST(0 AS BIGINT)) AS n_positions,
         |  coalesce(per.n_accepted, CAST(0 AS BIGINT)) AS n_accepted,
         |  CASE WHEN per.n_positions > 0 THEN
         |    CAST((per.n_accepted * 1048576) // per.n_positions AS BIGINT)
         |  END AS acceptance_q20,
         |  CAST(CASE WHEN per.n_positions > 0 THEN
         |    CAST((per.n_accepted * 1048576) // per.n_positions AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS acceptance
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Confident joint: identical fixture arithmetic (Knuth hash, +2^19
    // diagonal bonus), thresholds as exact cross-multiplication
    // p_j·c_j ≥ s_j, argmax via (conf DESC, class ASC) row_number,
    // rows clearing no threshold dropped before the k²-bounded joint.
    "q306_confident_joint" ->
      """WITH cls AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483648) * 2654435761) % 4294967296 % 3
        |      AS cstar,
        |    ((doc_id * 7 % 2147483648) * 2654435761) % 4294967296 % 10
        |      AS flip
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN flip = 0 THEN (cstar + 1) % 3
        |         ELSE cstar END AS INTEGER) AS y,
        |    list_transform(range(0, 3), j ->
        |      (((doc_id * 3 + j) % 2147483648) * 2654435761)
        |        % 4294967296 % 262144
        |      + CASE WHEN j = cstar THEN 524288 ELSE 0 END) AS p
        |  FROM cls),
        |slf AS (SELECT doc_id, y, p, p[y + 1] AS sp FROM scored),
        |thr AS (SELECT y AS j, CAST(sum(sp) AS BIGINT) AS s,
        |               CAST(count(*) AS BIGINT) AS c
        |        FROM slf GROUP BY 1),
        |cand AS (
        |  SELECT slf.doc_id, slf.y, t.j, slf.p[t.j + 1] AS pj
        |  FROM slf JOIN thr t ON slf.p[t.j + 1] * t.c >= t.s),
        |pick AS (
        |  SELECT doc_id, y, j FROM (
        |    SELECT doc_id, y, j, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY pj DESC, j ASC) AS rn
        |    FROM cand) WHERE rn = 1)
        |SELECT y AS noisy_label, j AS est_label,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       y <> j AS is_error
        |FROM pick GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q307_viterbi_tokens" ->
      oViterbiSql(viterbiScoredVocab, viterbiUnkScoreQ),

    // ROUGE-L: the classic two-row LCS DP replayed per pair by a
    // recursive CTE over candidate positions, carrying the DP row as a
    // list; the inner row build folds (init ∪ ref positions) with the
    // single-element-list trick (list_reduce needs acc and element
    // types equal). row[k] = DP[i][k-1]; folds are ≤ 129 steps.
    "q308_rouge_l" ->
      s"""WITH RECURSIVE prs AS (
         |  SELECT c.doc_id AS pair_id, c.text AS cand, r.text AS refx
         |  FROM documents c JOIN documents r ON r.doc_id = c.doc_id - 1
         |  WHERE c.doc_id % 2 = 1),
         |tk AS (
         |  SELECT pair_id,
         |    (${oToks.replace("text", "coalesce(cand, '')")})[1:128] AS ct,
         |    (${oToks.replace("text", "coalesce(refx, '')")})[1:128] AS rt
         |  FROM prs),
         |walkL(pair_id, i, r) AS (
         |  SELECT pair_id, 0,
         |    list_transform(range(0, len(rt) + 1), x -> CAST(0 AS BIGINT))
         |  FROM tk
         |  UNION ALL
         |  SELECT w.pair_id, w.i + 1,
         |    list_reduce(
         |      list_prepend([CAST(0 AS BIGINT)],
         |        list_transform(range(1, len(t.rt) + 1),
         |          j -> [CAST(j AS BIGINT)])),
         |      (a, b) -> list_append(a,
         |        CASE WHEN t.ct[w.i + 1] = t.rt[b[1]]
         |          THEN w.r[b[1]] + 1
         |          ELSE greatest(w.r[b[1] + 1], a[len(a)]) END))
         |  FROM walkL w JOIN tk t USING (pair_id)
         |  WHERE w.i < len(t.ct)),
         |seg AS (
         |  SELECT w.pair_id, w.r[len(t.rt) + 1] AS lcs
         |  FROM walkL w JOIN tk t USING (pair_id)
         |  WHERE w.i = len(t.ct)),
         |j AS (
         |  SELECT t.pair_id, CAST(len(t.ct) AS BIGINT) AS n_cand_tokens,
         |         CAST(len(t.rt) AS BIGINT) AS n_ref_tokens,
         |         CAST(s.lcs AS BIGINT) AS lcs_len
         |  FROM tk t JOIN seg s USING (pair_id))
         |SELECT pair_id, n_cand_tokens, n_ref_tokens, lcs_len,
         |  CASE WHEN n_cand_tokens > 0 THEN
         |    CAST((lcs_len * 1048576) // n_cand_tokens AS BIGINT)
         |  END AS rouge_l_p_q20,
         |  CASE WHEN n_ref_tokens > 0 THEN
         |    CAST((lcs_len * 1048576) // n_ref_tokens AS BIGINT)
         |  END AS rouge_l_r_q20,
         |  CASE WHEN n_cand_tokens + n_ref_tokens > 0 THEN
         |    CAST((2 * lcs_len * 1048576) // (n_cand_tokens + n_ref_tokens)
         |      AS BIGINT)
         |  END AS rouge_l_f1_q20,
         |  CAST(CASE WHEN n_cand_tokens > 0 THEN
         |    CAST((lcs_len * 1048576) // n_cand_tokens AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS rouge_l_p,
         |  CAST(CASE WHEN n_ref_tokens > 0 THEN
         |    CAST((lcs_len * 1048576) // n_ref_tokens AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS rouge_l_r,
         |  CAST(CASE WHEN n_cand_tokens + n_ref_tokens > 0 THEN
         |    CAST((2 * lcs_len * 1048576) // (n_cand_tokens + n_ref_tokens)
         |      AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS rouge_l_f1
         |FROM j ORDER BY pair_id""".stripMargin,

    // Self-consistency: identical bucket arithmetic (floor-mod spelled
    // explicitly), the same (ts, event_id) total order for gold vs
    // samples, modal via (count DESC, answer ASC) row_number.
    "q309_self_consistency" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts,
        |    ((CAST(floor(value * 100.0) AS BIGINT) % 7) + 7) % 7 AS ans
        |  FROM events),
        |rk AS (
        |  SELECT user_id, ans, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM ev),
        |gold AS (SELECT user_id, ans AS gold_ans FROM rk WHERE rn = 1),
        |smp AS (SELECT user_id, ans FROM rk WHERE rn > 1),
        |cnt AS (SELECT user_id, ans, CAST(count(*) AS BIGINT) AS c
        |        FROM smp GROUP BY 1, 2),
        |modal AS (
        |  SELECT user_id, ans AS modal_answer, c AS modal_count FROM (
        |    SELECT user_id, ans, c, row_number() OVER (
        |      PARTITION BY user_id ORDER BY c DESC, ans ASC) AS rn
        |    FROM cnt) WHERE rn = 1),
        |per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
        |         CAST(count(DISTINCT ans) AS BIGINT) AS n_distinct_answers
        |  FROM smp GROUP BY 1)
        |SELECT p.user_id, p.n_samples, p.n_distinct_answers,
        |       m.modal_answer, m.modal_count, g.gold_ans AS gold,
        |       m.modal_answer = g.gold_ans AS is_correct
        |FROM per p JOIN modal m USING (user_id)
        |LEFT JOIN gold g USING (user_id)
        |ORDER BY p.user_id""".stripMargin,

    // BLEU per candidate: same gram streams (orders 1..4), per-ref
    // counts first (clipping is max over refs, not sum), left join
    // from the candidate gram side, closest-reference length via the
    // same (|rl-c| ASC, rl ASC) row_number, and the identical
    // sqrt-only 2^10-quantized geometric mean (IEEE sqrt is correctly
    // rounded on both engines; // on nonnegatives = trunc division).
    "q310_bleu" ->
      s"""WITH $oBleuCtes,
         |g AS (SELECT *, $oBleuGm AS bleu_gm_q20 FROM base)
         |SELECT pair_id, n_cand_tokens, r_ref_len, bp_applies,
         |  p1_num, p1_den, p2_num, p2_den, p3_num, p3_den,
         |  p4_num, p4_den, bleu_gm_q20,
         |  CAST(bleu_gm_q20 AS DOUBLE) / 1048576.0 AS bleu_gm
         |FROM g ORDER BY pair_id""".stripMargin,

    // Corpus BLEU: per-order numerators/denominators and brevity
    // lengths pooled over the per-candidate rows before dividing
    // (sum skips NULL r_ref_len on no-reference candidates, matching
    // Spark's sum), then the same quantized geometric mean.
    "q311_bleu_corpus" ->
      s"""WITH $oBleuCtes,
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(n_cand_tokens) AS BIGINT) AS c_total,
         |    CAST(sum(r_ref_len) AS BIGINT) AS r_total,
         |    CAST(sum(p1_num) AS BIGINT) AS p1_num,
         |    CAST(sum(p1_den) AS BIGINT) AS p1_den,
         |    CAST(sum(p2_num) AS BIGINT) AS p2_num,
         |    CAST(sum(p2_den) AS BIGINT) AS p2_den,
         |    CAST(sum(p3_num) AS BIGINT) AS p3_num,
         |    CAST(sum(p3_den) AS BIGINT) AS p3_den,
         |    CAST(sum(p4_num) AS BIGINT) AS p4_num,
         |    CAST(sum(p4_den) AS BIGINT) AS p4_den
         |  FROM base),
         |g AS (SELECT *, $oBleuGm AS bleu_gm_q20 FROM agg)
         |SELECT n_pairs, c_total, r_total,
         |  p1_num, p1_den, p2_num, p2_den, p3_num, p3_den,
         |  p4_num, p4_den, c_total < r_total AS bp_applies,
         |  bleu_gm_q20,
         |  CAST(bleu_gm_q20 AS DOUBLE) / 1048576.0 AS bleu_gm
         |FROM g ORDER BY n_pairs""".stripMargin,

    // chrF components: same whitespace-strip (regexp_replace with the
    // 'g' flag — DuckDB defaults to first-match-only where Spark
    // replaces all), same char-gram streams (substr/length both count
    // code points on both engines), same exact 5o/(4r+c) rational.
    "q312_chrf_components" ->
      s"""WITH $oChrfCtes
         |SELECT pair_id, k, n_cand_grams, n_ref_grams, overlap,
         |  f2_q20, CAST(f2_q20 AS DOUBLE) / 1048576.0 AS f2
         |FROM perf ORDER BY k, pair_id""".stripMargin,

    // Headline chrF2: quantize-then-average — per-order q20 scores
    // summed, ONE further integral division by the effective-order
    // count; pairs with no grams at any order keep a NULL-score row.
    "q313_chrf" ->
      s"""WITH $oChrfCtes,
         |hl AS (
         |  SELECT pair_id, CAST(count(*) AS BIGINT) AS n_eff_orders,
         |         CAST(sum(f2_q20) AS BIGINT) AS s
         |  FROM perf GROUP BY 1)
         |SELECT p.pair_id,
         |  coalesce(h.n_eff_orders, CAST(0 AS BIGINT)) AS n_eff_orders,
         |  CASE WHEN h.n_eff_orders > 0 THEN
         |    CAST(h.s // h.n_eff_orders AS BIGINT) END AS chrf2_q20,
         |  CAST(CASE WHEN h.n_eff_orders > 0 THEN
         |    CAST(h.s // h.n_eff_orders AS BIGINT) END AS DOUBLE)
         |    / 1048576.0 AS chrf2
         |FROM prs p LEFT JOIN hl h USING (pair_id)
         |ORDER BY p.pair_id""".stripMargin,

    // GRPO advantages: identical integer moments, the same
    // sqrt-division-exponent-shift chain (every step correctly rounded
    // or exact on both engines), NULL on zero variance.
    "q314_grpo_advantages" ->
      """WITH r AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(value * 100.0) AS BIGINT) AS reward
        |  FROM events),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_group,
        |    CAST(sum(reward) AS BIGINT) AS s,
        |    CAST(sum(reward * reward) AS BIGINT) AS ss
        |  FROM r GROUP BY 1),
        |j AS (
        |  SELECT r.user_id, r.event_id, r.reward, g.n_group,
        |    g.n_group * g.ss - g.s * g.s AS d,
        |    g.n_group * r.reward - g.s AS num
        |  FROM r JOIN g USING (user_id))
        |SELECT user_id, event_id, reward, n_group,
        |  CASE WHEN d > 0 THEN
        |    CAST(floor(CAST(num AS DOUBLE) / sqrt(CAST(d AS DOUBLE))
        |      * 1048576.0) AS BIGINT)
        |  END AS adv_q20,
        |  CAST(CASE WHEN d > 0 THEN
        |    CAST(floor(CAST(num AS DOUBLE) / sqrt(CAST(d AS DOUBLE))
        |      * 1048576.0) AS BIGINT)
        |  END AS DOUBLE) / 1048576.0 AS adv
        |FROM j ORDER BY user_id, event_id""".stripMargin,

    // MBR selection: same token multiset bags, (task, token)-keyed
    // self-join with sibling exclusion, exact q20 pairwise F1 summed
    // per candidate, spine-coalesced zeros, (score DESC, sid ASC)
    // row_number winner.
    "q315_mbr_select" ->
      s"""WITH toks AS (
         |  SELECT doc_id // 16 AS task_id, doc_id AS sid,
         |         unnest($oToks) AS tok
         |  FROM documents),
         |bags AS (
         |  SELECT task_id, sid, tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM toks GROUP BY 1, 2, 3),
         |lens AS (
         |  SELECT task_id, sid, CAST(sum(cnt) AS BIGINT) AS len
         |  FROM bags GROUP BY 1, 2),
         |ov AS (
         |  SELECT a.task_id, a.sid AS sa, b.sid AS sb,
         |         CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS o
         |  FROM bags a JOIN bags b ON b.task_id = a.task_id
         |    AND b.tok = a.tok AND b.sid <> a.sid
         |  GROUP BY 1, 2, 3),
         |pf AS (
         |  SELECT ov.task_id, ov.sa,
         |    CAST(sum((2 * ov.o * 1048576) // (la.len + lb.len))
         |      AS BIGINT) AS score
         |  FROM ov
         |  JOIN lens la ON la.task_id = ov.task_id AND la.sid = ov.sa
         |  JOIN lens lb ON lb.task_id = ov.task_id AND lb.sid = ov.sb
         |  GROUP BY 1, 2),
         |spine AS (SELECT doc_id // 16 AS task_id, doc_id AS sid
         |          FROM documents),
         |sc AS (
         |  SELECT s.task_id, s.sid,
         |         coalesce(p.score, CAST(0 AS BIGINT)) AS score
         |  FROM spine s LEFT JOIN pf p
         |    ON p.task_id = s.task_id AND p.sa = s.sid),
         |nn AS (SELECT task_id, CAST(count(*) AS BIGINT) AS n_samples
         |       FROM spine GROUP BY 1),
         |win AS (
         |  SELECT task_id, sid, score FROM (
         |    SELECT task_id, sid, score, row_number() OVER (
         |      PARTITION BY task_id ORDER BY score DESC, sid ASC) AS rn
         |    FROM sc) WHERE rn = 1)
         |SELECT w.task_id, nn.n_samples, w.sid AS mbr_choice,
         |  w.score AS mbr_score_q20,
         |  CASE WHEN nn.n_samples > 1 THEN
         |    CAST(w.score // (nn.n_samples - 1) AS BIGINT)
         |  END AS mean_sim_q20,
         |  CAST(CASE WHEN nn.n_samples > 1 THEN
         |    CAST(w.score // (nn.n_samples - 1) AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS mean_sim
         |FROM win w JOIN nn USING (task_id)
         |ORDER BY w.task_id""".stripMargin,

    // BoN curve: same histogram→CDF→falling-factorial pipeline in
    // HUGEINT (DuckDB's exact 128-bit integer, the DECIMAL(38,0)
    // twin); N > n NULL, min-shift undone after the division.
    "q316_bon_curve" -> oBonSql(4),

    // DPO pairs: the same two total-order row_number picks and the
    // same integer margin gate.
    "q317_dpo_pairs" ->
      """WITH r AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(value * 100.0) AS BIGINT) AS rw
        |  FROM events),
        |rk AS (
        |  SELECT user_id, event_id, rw,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY rw DESC, event_id ASC) AS rnt,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY rw ASC, event_id ASC) AS rnb,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        |  FROM r),
        |ch AS (SELECT user_id, n AS n_samples, event_id AS chosen_id,
        |              rw AS chosen_reward
        |       FROM rk WHERE rnt = 1),
        |rj AS (SELECT user_id, event_id AS rejected_id,
        |              rw AS rejected_reward
        |       FROM rk WHERE rnb = 1)
        |SELECT c.user_id, c.n_samples, c.chosen_id, j.rejected_id,
        |       c.chosen_reward, j.rejected_reward,
        |       c.chosen_reward - j.rejected_reward AS margin
        |FROM ch c JOIN rj j USING (user_id)
        |WHERE c.chosen_reward - j.rejected_reward >= 10
        |ORDER BY c.user_id""".stripMargin,

    // GRPO frozen apply: moments re-derived from the even slice, the
    // odd slice LEFT-joined (baseline-less groups keep NULL rows),
    // identical sqrt-division-shift chain.
    "q318_grpo_frozen_apply" ->
      """WITH tr AS (
        |  SELECT user_id, CAST(floor(value * 100.0) AS BIGINT) AS rw
        |  FROM events WHERE event_id % 2 = 0),
        |m AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ref,
        |    CAST(sum(rw) AS BIGINT) AS s,
        |    CAST(sum(rw * rw) AS BIGINT) AS ss
        |  FROM tr GROUP BY 1),
        |ap AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(value * 100.0) AS BIGINT) AS reward
        |  FROM events WHERE event_id % 2 = 1),
        |j AS (
        |  SELECT a.user_id, a.event_id, a.reward, m.n_ref,
        |    m.n_ref * m.ss - m.s * m.s AS d,
        |    m.n_ref * a.reward - m.s AS num
        |  FROM ap a LEFT JOIN m USING (user_id))
        |SELECT user_id, event_id, reward, n_ref,
        |  CASE WHEN d > 0 THEN
        |    CAST(floor(CAST(num AS DOUBLE) / sqrt(CAST(d AS DOUBLE))
        |      * 1048576.0) AS BIGINT)
        |  END AS adv_q20,
        |  CAST(CASE WHEN d > 0 THEN
        |    CAST(floor(CAST(num AS DOUBLE) / sqrt(CAST(d AS DOUBLE))
        |      * 1048576.0) AS BIGINT)
        |  END AS DOUBLE) / 1048576.0 AS adv
        |FROM j ORDER BY user_id, event_id""".stripMargin,

    // Pearson: identical integer moments and the same √Dx·√Dy (two
    // sqrts then multiply — NOT √(Dx·Dy)) so both engines round the
    // same three IEEE ops.
    "q319_reward_time_pearson" ->
      s"""WITH b AS (
         |  SELECT event_type,
         |    epoch_ns(ts) // 86400000000000 - 19000 AS x,
         |    CAST(floor(value * 100.0) AS BIGINT) AS y
         |  FROM events),
         |${oPearsonTail("r")} ORDER BY event_type""".stripMargin,

    // Spearman: doubled midranks (2·rank + tiecount − 1) per side,
    // then the identical Pearson tail.
    "q320_reward_time_spearman" ->
      s"""WITH b0 AS (
         |  SELECT event_type,
         |    epoch_ns(ts) // 86400000000000 - 19000 AS x0,
         |    CAST(floor(value * 100.0) AS BIGINT) AS y0
         |  FROM events),
         |b AS (
         |  SELECT event_type,
         |    2 * rank() OVER (PARTITION BY event_type ORDER BY x0)
         |      + count(*) OVER (PARTITION BY event_type, x0) - 1 AS x,
         |    2 * rank() OVER (PARTITION BY event_type ORDER BY y0)
         |      + count(*) OVER (PARTITION BY event_type, y0) - 1 AS y
         |  FROM b0),
         |${oPearsonTail("rho")} ORDER BY event_type""".stripMargin,

    // SFT render: string_agg with an explicit ORDER BY replays the
    // struct-sorted fold; IS DISTINCT FROM mirrors the null-safe
    // alternation check; lead() windows agree exactly.
    "q321_sft_render" ->
      """WITH tr AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn, event_id,
        |    event_type AS role,
        |    event_type || ':' ||
        |      CAST(CAST(floor(value * 100.0) AS BIGINT) AS VARCHAR)
        |      AS txt
        |  FROM events),
        |w AS (
        |  SELECT *, lead(role) OVER (
        |    PARTITION BY user_id ORDER BY tsn, event_id) AS nr
        |  FROM tr),
        |agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_turns,
        |    bool_and(CASE WHEN nr IS NULL THEN true
        |             ELSE role IS DISTINCT FROM nr END)
        |      AS roles_alternate,
        |    '<|system|>graft-sft-v1' ||
        |      string_agg('<|' || role || '|>' || txt, ''
        |        ORDER BY tsn, event_id) AS sft_text
        |  FROM w GROUP BY 1)
        |SELECT user_id, n_turns, roles_alternate, sft_text,
        |  CAST(length(sft_text) AS BIGINT) AS n_chars
        |FROM agg ORDER BY user_id""".stripMargin,

    // Waterfill: identical cap-sorted bracket scan with
    // cross-multiplied validity, first valid bracket, LEFT-joined
    // 0-or-1-row level (absent level = saturate all).
    "q322_epoch_waterfill" ->
      """WITH s AS (
        |  SELECT coalesce(lang, 'zz') AS src,
        |    CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS avail,
        |    CAST(1 + ascii(coalesce(lang, 'zz')) % 3 AS BIGINT) AS cap
        |  FROM documents GROUP BY 1
        |  HAVING sum(length(coalesce(text, ''))) > 0),
        |o AS (
        |  SELECT *, row_number() OVER (ORDER BY cap, src) AS rn,
        |    coalesce(sum(cap * avail) OVER (ORDER BY cap, src
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS pref_sat,
        |    coalesce(sum(avail) OVER (ORDER BY cap, src
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS pref_a,
        |    coalesce(lag(cap) OVER (ORDER BY cap, src), 0) AS prev_cap
        |  FROM s),
        |lvl AS (
        |  SELECT 250000 - pref_sat AS p,
        |         (SELECT sum(avail) FROM s) - pref_a AS q
        |  FROM o
        |  WHERE 250000 - pref_sat >= prev_cap *
        |          ((SELECT sum(avail) FROM s) - pref_a)
        |    AND 250000 - pref_sat <= cap *
        |          ((SELECT sum(avail) FROM s) - pref_a)
        |  ORDER BY rn LIMIT 1)
        |SELECT s.src, s.avail, s.cap,
        |  CASE WHEN l.p IS NULL OR l.p >= s.cap * l.q
        |       THEN s.cap * s.avail
        |       ELSE CAST((s.avail * l.p) // l.q AS BIGINT) END
        |    AS alloc_tokens,
        |  CASE WHEN l.p IS NULL OR l.p >= s.cap * l.q
        |       THEN s.cap * 1048576
        |       ELSE CAST((l.p * 1048576) // l.q AS BIGINT) END
        |    AS epochs_q20,
        |  CAST(CASE WHEN l.p IS NULL OR l.p >= s.cap * l.q
        |       THEN s.cap * 1048576
        |       ELSE CAST((l.p * 1048576) // l.q AS BIGINT) END
        |    AS DOUBLE) / 1048576.0 AS epochs,
        |  (l.p IS NULL OR l.p >= s.cap * l.q) AS saturated
        |FROM s LEFT JOIN lvl l ON true
        |ORDER BY s.src""".stripMargin,

    // Pack fragmentation: hashBucket replayed arithmetically (the q104
    // spelling), per-stream running offsets via the 1-PRECEDING window
    // sum, fragment count closed-form, ceil as (n + C−1) // C.
    "q323_pack_fragmentation" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(${oToks.replace("text", "coalesce(text, '')")})
         |         AS BIGINT) AS n_toks,
         |    CAST(((doc_id % 2147483648) * 2654435761)
         |         % 4294967296 % 8 AS BIGINT) AS stream
         |  FROM documents),
         |o AS (
         |  SELECT stream, n_toks,
         |    coalesce(sum(n_toks) OVER (PARTITION BY stream
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS off
         |  FROM d),
         |f AS (
         |  SELECT stream, n_toks,
         |    CASE WHEN n_toks > 0
         |      THEN ((off + n_toks - 1) // 128) - (off // 128) + 1
         |      ELSE 0 END AS frags
         |  FROM o),
         |g AS (
         |  SELECT stream, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN frags >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_split_docs
         |  FROM f GROUP BY 1)
         |SELECT stream, n_docs, n_tokens,
         |  CAST((n_tokens + 127) // 128 AS BIGINT) AS n_shards,
         |  CAST(((n_tokens + 127) // 128) * 128 - n_tokens AS BIGINT)
         |    AS pad_tokens,
         |  n_split_docs,
         |  CAST((n_split_docs * 1048576) // n_docs AS BIGINT)
         |    AS split_frac_q20,
         |  CASE WHEN (n_tokens + 127) // 128 > 0 THEN
         |    CAST((n_tokens * 1048576) //
         |         (((n_tokens + 127) // 128) * 128) AS BIGINT)
         |  END AS fill_q20
         |FROM g ORDER BY stream""".stripMargin,

    // Truncation curve: candidate lengths as a VALUES table, the same
    // conditional sums grouped per L (the engine computes them in one
    // aggregate; grouped-by-L sums over the same rows are identical).
    "q324_truncation_curve" ->
      s"""WITH d AS (
         |  SELECT CAST(len(${oToks.replace("text", "coalesce(text, '')")})
         |              AS BIGINT) AS n_toks
         |  FROM documents),
         |l(context_len) AS (VALUES (16), (32), (64), (128), (256)),
         |g AS (
         |  SELECT CAST(l.context_len AS BIGINT) AS context_len,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN d.n_toks > l.context_len THEN 1 ELSE 0
         |             END) AS BIGINT) AS n_truncated,
         |    CAST(sum(d.n_toks) AS BIGINT) AS tokens_total,
         |    CAST(sum(CASE WHEN d.n_toks > l.context_len
         |             THEN d.n_toks - l.context_len ELSE 0 END)
         |         AS BIGINT) AS tokens_lost
         |  FROM d CROSS JOIN l GROUP BY 1)
         |SELECT context_len, n_docs, n_truncated, tokens_total,
         |  tokens_lost,
         |  CASE WHEN tokens_total > 0 THEN
         |    CAST(((tokens_total - tokens_lost) * 1048576)
         |         // tokens_total AS BIGINT)
         |  END AS kept_frac_q20
         |FROM g ORDER BY context_len""".stripMargin,

    // Novelty: q304's gram unnest per side, corpus side DISTINCT, LEFT
    // JOIN membership probe, id spine keeps zero-gram generations.
    "q325_ngram_novelty" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    ${oToks.replace("text", "coalesce(text, '')")} AS tk
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
         |    i -> array_to_string(tk[i:i + 2], ' '))) AS gr
         |  FROM tk WHERE doc_id % 2 = 1),
         |seen AS (
         |  SELECT DISTINCT
         |    unnest(list_transform(range(1, len(tk) - 1),
         |      i -> array_to_string(tk[i:i + 2], ' '))) AS gr
         |  FROM tk WHERE doc_id % 2 = 0),
         |pg AS (
         |  SELECT doc_id, gr, CAST(count(*) AS BIGINT) AS m
         |  FROM g GROUP BY 1, 2),
         |agg AS (
         |  SELECT pg.doc_id, CAST(sum(pg.m) AS BIGINT) AS ng,
         |    CAST(sum(CASE WHEN s.gr IS NULL THEN pg.m ELSE 0 END)
         |         AS BIGINT) AS nv
         |  FROM pg LEFT JOIN seen s ON pg.gr = s.gr
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.ng, CAST(0 AS BIGINT)) AS n_grams,
         |  coalesce(a.nv, CAST(0 AS BIGINT)) AS n_novel,
         |  CASE WHEN coalesce(a.ng, 0) > 0 THEN
         |    CAST((a.nv * 1048576) // a.ng AS BIGINT)
         |  END AS novelty_q20,
         |  CAST(CASE WHEN coalesce(a.ng, 0) > 0 THEN
         |    CAST((a.nv * 1048576) // a.ng AS BIGINT)
         |  END AS DOUBLE) / 1048576.0 AS novelty
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
         |LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // √-temperature mix: the identical isqrt replay — double seed
    // (mass·2^40 is a power-of-two scale, so the double is the same on
    // both engines), 5-candidate exact-integer CASE correction on
    // HUGEINT, then one closing // per weight.
    "q326_sqrt_temperature_mix" ->
      """WITH s AS (
        |  SELECT coalesce(lang, 'zz') AS src,
        |    CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS mass
        |  FROM documents GROUP BY 1
        |  HAVING sum(length(coalesce(text, ''))) > 0),
        |r AS (
        |  SELECT src, mass,
        |    CAST(mass AS HUGEINT) * 1099511627776 AS x,
        |    CAST(floor(sqrt(CAST(mass AS DOUBLE) * 1099511627776))
        |         AS HUGEINT) AS a
        |  FROM s),
        |y AS (
        |  SELECT src, mass,
        |    CASE WHEN (a + 2) * (a + 2) <= x THEN a + 2
        |         WHEN (a + 1) * (a + 1) <= x THEN a + 1
        |         WHEN a * a <= x THEN a
        |         WHEN (a - 1) * (a - 1) <= x THEN a - 1
        |         ELSE a - 2 END AS sq
        |  FROM r),
        |n AS (SELECT sum(sq) AS sm FROM y)
        |SELECT y.src, y.mass, CAST(y.sq AS BIGINT) AS sqrt_mass_q20,
        |  CAST((y.sq * 1048576) // n.sm AS BIGINT) AS weight_q20,
        |  CAST(CAST((y.sq * 1048576) // n.sm AS BIGINT) AS DOUBLE)
        |    / 1048576.0 AS weight
        |FROM y, n ORDER BY y.src""".stripMargin,

    // Loss mask: one grouped conditional aggregate over payload chars.
    "q327_sft_loss_mask" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_train_turns,
        |  CAST(sum(length(coalesce(props, ''))) AS BIGINT)
        |    AS chars_total,
        |  CAST(sum(CASE WHEN event_type = 'click'
        |           THEN length(coalesce(props, '')) ELSE 0 END)
        |       AS BIGINT) AS chars_train,
        |  CASE WHEN sum(length(coalesce(props, ''))) > 0 THEN
        |    CAST((sum(CASE WHEN event_type = 'click'
        |              THEN length(coalesce(props, '')) ELSE 0 END)
        |          * 1048576)
        |         // sum(length(coalesce(props, ''))) AS BIGINT)
        |  END AS mask_q20
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // FIM: list slices at the thirds boundaries, PSM concatenation,
    // token-count conservation visible in the emitted columns.
    "q328_fim_render" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    ${oToks.replace("text", "coalesce(text, '')")} AS tk
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n,
         |    CAST(len(tk) // 3 AS BIGINT) AS p1,
         |    CAST((2 * len(tk)) // 3 AS BIGINT) AS p2
         |  FROM tk),
         |r AS (
         |  SELECT doc_id, n AS n_tokens,
         |    CASE WHEN n >= 3 THEN p1 ELSE n END AS n_pre,
         |    CASE WHEN n >= 3 THEN p2 - p1 ELSE CAST(0 AS BIGINT) END
         |      AS n_mid,
         |    CASE WHEN n >= 3 THEN n - p2 ELSE CAST(0 AS BIGINT) END
         |      AS n_suf,
         |    n >= 3 AS fim_applied,
         |    CASE WHEN n >= 3 THEN
         |      '<|fim_pre|>' || array_to_string(tk[1:p1], ' ') ||
         |      '<|fim_suf|>' || array_to_string(tk[p2 + 1:n], ' ') ||
         |      '<|fim_mid|>' || array_to_string(tk[p1 + 1:p2], ' ')
         |    -- DuckDB array_to_string([]) is NULL where Spark
         |    -- array_join([]) is '' — coalesce the zero-token branch
         |    ELSE coalesce(array_to_string(tk, ' '), '') END AS fim_text
         |  FROM b)
         |SELECT doc_id, n_tokens, n_pre, n_mid, n_suf, fim_applied,
         |  fim_text, CAST(length(fim_text) AS BIGINT) AS n_chars
         |FROM r ORDER BY doc_id""".stripMargin,

    "q329_bpe_rank_encode" -> oBpeRankEncodeSql(8),

    "q334_bytelevel_bpe" -> oByteBpeEncodeSql(8),

    // Byte-level budget: the q334 chain + the q94-style per-doc join.
    "q338_bytelevel_budget" -> (oByteBpeCtes(8) +
      s""",
         |wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS nt FROM a8),
         |dw AS (
         |  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''),
         |    $oByteReLit)) AS w
         |  FROM documents),
         |st AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pretokens,
         |         CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
         |  FROM dw JOIN wl USING (w) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(st.n_pretokens, CAST(0 AS BIGINT)) AS n_pretokens,
         |  coalesce(st.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
         |FROM documents d LEFT JOIN st USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin),

    // ExactSubstr runs: same planted block, literal-gram occurrence
    // counts, lag-based gaps-and-islands merge of [pos, pos+10) spans.
    "q335_exact_substr_runs" ->
      s"""WITH d AS (
         |  SELECT doc_id, CASE WHEN doc_id % 10 = 0
         |    THEN coalesce(text, '') || ' $exactSubstrBlock'
         |    ELSE coalesce(text, '') END AS xt
         |  FROM documents),
         |tk AS (
         |  SELECT doc_id, ${oToks.replace("text", "xt")} AS tk FROM d),
         |gg AS (
         |  SELECT doc_id, pg['p'] AS pos, pg['gr'] AS gr
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(1, len(tk) - 8),
         |          i -> {'p': i, 'gr': array_to_string(tk[i:i+9], ' ')}))
         |          AS pg
         |        FROM tk)),
         |rep AS (
         |  SELECT gr FROM (SELECT gr, count(*) AS c FROM gg GROUP BY 1)
         |  WHERE c >= 2),
         |ds AS (SELECT doc_id, pos FROM gg JOIN rep USING (gr)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos <= coalesce(lag(pos) OVER (
         |        PARTITION BY doc_id ORDER BY pos), -999999) + 10
         |      THEN 0 ELSE 1 END AS brk
         |  FROM ds),
         |grp AS (
         |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
         |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    CURRENT ROW) AS gid
         |  FROM isl),
         |runs AS (
         |  SELECT doc_id, gid,
         |    CAST(max(pos) + 10 - min(pos) AS BIGINT) AS rl
         |  FROM grp GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
         |    CAST(sum(rl) AS BIGINT) AS n_dup,
         |    CAST(max(rl) AS BIGINT) AS max_run
         |  FROM runs GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |  coalesce(p.n_dup, CAST(0 AS BIGINT)) AS n_dup_tokens,
         |  coalesce(p.n_runs, CAST(0 AS BIGINT)) AS n_runs,
         |  coalesce(p.max_run, CAST(0 AS BIGINT)) AS max_run,
         |  CASE WHEN len(t.tk) > 0 THEN
         |    CAST((coalesce(p.n_dup, 0) * 1048576) // len(t.tk) AS BIGINT)
         |  END AS dup_frac_q20
         |FROM tk t LEFT JOIN per p USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    // Excision: q335's gram/ds CTEs, covered positions expanded and
    // deduped, kept tokens rebuilt by a filtered index walk.
    "q339_exact_substr_excise" ->
      s"""WITH d AS (
         |  SELECT doc_id, CASE WHEN doc_id % 10 = 0
         |    THEN coalesce(text, '') || ' $exactSubstrBlock'
         |    ELSE coalesce(text, '') END AS xt
         |  FROM documents),
         |tk AS (
         |  SELECT doc_id, ${oToks.replace("text", "xt")} AS tk FROM d),
         |gg AS (
         |  SELECT doc_id, pg['p'] AS pos, pg['gr'] AS gr
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(1, len(tk) - 8),
         |          i -> {'p': i, 'gr': array_to_string(tk[i:i+9], ' ')}))
         |          AS pg
         |        FROM tk)),
         |rep AS (
         |  SELECT gr FROM (SELECT gr, count(*) AS c FROM gg GROUP BY 1)
         |  WHERE c >= 2),
         |ds AS (SELECT doc_id, pos FROM gg JOIN rep USING (gr)),
         |cov AS (
         |  SELECT DISTINCT doc_id, unnest(range(pos, pos + 10)) AS cp
         |  FROM ds),
         |cl AS (SELECT doc_id, list(cp) AS cps FROM cov GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(len(c.cps), 0) AS BIGINT) AS n_removed,
         |  coalesce(array_to_string(list_transform(
         |    list_filter(range(1, len(t.tk) + 1),
         |      i -> c.cps IS NULL OR NOT list_contains(c.cps, i)),
         |    i -> t.tk[i]), ' '), '') AS cleaned
         |FROM tk t LEFT JOIN cl c USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    // Media gate: the q333 arithmetic extended with the gate CASEs —
    // the oracle predicts every verdict without touching bytes.
    "q336_media_gate" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |      WHEN 2 THEN 'gif' END AS f,
        |    CAST(doc_id % 991 + 1 AS BIGINT) AS w,
        |    CAST((doc_id * 7) % 737 + 1 AS BIGINT) AS hh
        |  FROM documents),
        |v AS (
        |  SELECT coalesce(f, 'unparseable') AS format,
        |    f IS NOT NULL AS parseable,
        |    f IN ('png', 'jpeg') AS allowed,
        |    (w >= 64 AND hh >= 64) AS big,
        |    (w <= hh * 4 AND hh <= w * 4) AS aspect_ok
        |  FROM h)
        |SELECT format, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(CASE WHEN parseable AND allowed AND big
        |    AND aspect_ok THEN 1 END) AS BIGINT) AS n_keep,
        |  CAST(count(CASE WHEN parseable AND NOT allowed THEN 1 END)
        |    AS BIGINT) AS n_not_allowed,
        |  CAST(count(CASE WHEN parseable AND NOT big THEN 1 END)
        |    AS BIGINT) AS n_too_small,
        |  CAST(count(CASE WHEN parseable AND NOT aspect_ok THEN 1 END)
        |    AS BIGINT) AS n_bad_aspect
        |FROM v GROUP BY 1 ORDER BY format""".stripMargin,

    // Media pipeline verdict: gate predicates from pid = doc_id % 200
    // arithmetic; distinct payloads = distinct kept pids (injective).
    "q340_media_pipeline" ->
      """WITH h AS (
        |  SELECT doc_id, doc_id % 200 AS pid,
        |    CASE (doc_id % 200) % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |      WHEN 2 THEN 'gif' END AS f,
        |    CAST((doc_id % 200) % 991 + 1 AS BIGINT) AS w,
        |    CAST(((doc_id % 200) * 7) % 737 + 1 AS BIGINT) AS hh
        |  FROM documents),
        |k AS (
        |  SELECT * FROM h
        |  WHERE f IN ('png', 'jpeg') AND w >= 64 AND hh >= 64
        |    AND w <= hh * 4 AND hh <= w * 4)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM h) AS n_docs,
        |  (SELECT CAST(count(f) AS BIGINT) FROM h) AS n_parseable,
        |  (SELECT CAST(count(*) AS BIGINT) FROM k) AS n_keep,
        |  (SELECT CAST(count(DISTINCT pid) AS BIGINT) FROM k)
        |    AS n_unique_payloads,
        |  (SELECT CAST(count(*) AS BIGINT) FROM k)
        |    - (SELECT CAST(count(DISTINCT pid) AS BIGINT) FROM k)
        |    AS dup_mass,
        |  (SELECT count(*) FROM k) > 0
        |    AND (SELECT count(DISTINCT pid) FROM k) > 0 AS ship
        |ORDER BY n_docs""".stripMargin,

    // Audio headers: pure doc_id arithmetic, no bytes.
    "q341_audio_headers" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 10 = 9 THEN 10
        |    WHEN doc_id % 2 = 0 THEN 36 ELSE 42 END AS BIGINT)
        |    AS n_bytes,
        |  CASE WHEN doc_id % 10 = 9 THEN NULL
        |    WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format,
        |  CASE WHEN doc_id % 10 <> 9
        |    THEN CAST((doc_id % 50) * 1000 + 8000 AS BIGINT)
        |  END AS sample_rate,
        |  CASE WHEN doc_id % 10 <> 9
        |    THEN CAST(doc_id % 8 + 1 AS BIGINT) END AS channels,
        |  CASE WHEN doc_id % 10 <> 9
        |    THEN CAST([8,16,24,32][CAST(doc_id % 4 AS INT) + 1]
        |      AS BIGINT) END AS bits
        |FROM documents ORDER BY doc_id""".stripMargin,

    // WebP/BMP headers: pure doc_id arithmetic, no bytes.
    "q337_webp_bmp_headers" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 25 WHEN 1 THEN 30
        |    WHEN 2 THEN 30 ELSE 54 END AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 4 = 3 THEN 'bmp' ELSE 'webp' END AS format,
        |  CAST(doc_id % 991 + 1 AS BIGINT) AS width,
        |  CAST((doc_id * 7) % 737 + 1 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 4 = 3
        |    THEN [1,4,8,16,24,32][CAST(doc_id % 6 AS INT) + 1]
        |    ELSE 8 END AS BIGINT) AS bit_depth
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Composed RLHF pipeline: the q314/q317/q321 oracle chains
    // re-derived over the gated event set, each closed to its one-row
    // aggregate, cross-joined into the single verdict row.
    "q330_rlhf_pipeline" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_ns(ts) AS tsn, user_id, event_type,
        |    CAST(floor(value * 100.0) AS BIGINT) AS rw
        |  FROM events WHERE value <= 250.0),
        |gate AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_gated,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_groups
        |  FROM ev),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(rw) AS BIGINT) AS s,
        |    CAST(sum(rw * rw) AS BIGINT) AS ss
        |  FROM ev GROUP BY 1),
        |adv AS (
        |  SELECT CAST(count(aq) AS BIGINT) AS n_adv,
        |    CAST(coalesce(sum(aq), 0) AS BIGINT) AS adv_sum_q20
        |  FROM (
        |    SELECT CASE WHEN g.n * g.ss - g.s * g.s > 0 THEN
        |      CAST(floor(CAST(g.n * e.rw - g.s AS DOUBLE) /
        |        sqrt(CAST(g.n * g.ss - g.s * g.s AS DOUBLE))
        |        * 1048576.0) AS BIGINT)
        |    END AS aq
        |    FROM ev e JOIN g USING (user_id))),
        |rk AS (
        |  SELECT user_id, event_id, rw,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY rw DESC, event_id ASC) AS rnt,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY rw ASC, event_id ASC) AS rnb
        |  FROM ev),
        |pairs AS (
        |  SELECT c.user_id, c.rw - j.rw AS margin
        |  FROM (SELECT user_id, rw FROM rk WHERE rnt = 1) c
        |  JOIN (SELECT user_id, rw FROM rk WHERE rnb = 1) j
        |    USING (user_id)
        |  WHERE c.rw - j.rw >= 10),
        |pagg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_dpo_pairs,
        |    CAST(coalesce(sum(margin), 0) AS BIGINT) AS margin_total
        |  FROM pairs),
        |sel AS (
        |  SELECT e.* FROM ev e JOIN (SELECT user_id FROM pairs) p
        |    USING (user_id)),
        |w AS (
        |  SELECT *, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY tsn, event_id) AS nr
        |  FROM sel),
        |per AS (
        |  SELECT user_id,
        |    bool_and(CASE WHEN nr IS NULL THEN true
        |             ELSE event_type IS DISTINCT FROM nr END)
        |      AS roles_alternate,
        |    '<|system|>graft-sft-v1' ||
        |      string_agg('<|' || event_type || '|>' || event_type || ':'
        |          || CAST(rw AS VARCHAR), ''
        |        ORDER BY tsn, event_id) AS sft_text
        |  FROM w GROUP BY 1),
        |sft AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_convs,
        |    CAST(coalesce(sum(length(sft_text)), 0) AS BIGINT)
        |      AS sft_chars,
        |    CAST(count(CASE WHEN roles_alternate THEN 1 END) AS BIGINT)
        |      AS n_alternating
        |  FROM per)
        |SELECT gate.n_events, gate.n_gated, gate.n_groups,
        |  adv.n_adv, adv.adv_sum_q20,
        |  pagg.n_dpo_pairs, pagg.margin_total,
        |  sft.n_convs, sft.sft_chars, sft.n_alternating,
        |  (adv.n_adv > 0 AND pagg.n_dpo_pairs > 0
        |   AND sft.n_convs = pagg.n_dpo_pairs) AS ship
        |FROM gate CROSS JOIN adv CROSS JOIN pagg CROSS JOIN sft
        |ORDER BY n_events""".stripMargin,

    // Frozen-LM filter: model counts from the even slice only, odd
    // slice LEFT-joined (absent grams 0-frequency/unknown), identical
    // integer statistics and closing divisions.
    "q331_lm_filter_frozen" ->
      s"""WITH rt AS (
         |  SELECT $oToks AS tk FROM documents WHERE doc_id % 2 = 0),
         |model AS (
         |  SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i+1])) AS gram
         |    FROM rt) GROUP BY 1),
         |bt AS (
         |  SELECT doc_id, $oToks AS tk FROM documents WHERE doc_id % 2 = 1),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS gram
         |  FROM bt),
         |st AS (
         |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |         CAST(sum(coalesce(m.cnt, 0)) AS BIGINT) AS sum_freq,
         |         CAST(count(m.cnt) AS BIGINT) AS n_known
         |  FROM bg LEFT JOIN model m USING (gram) GROUP BY 1)
         |SELECT d.doc_id,
         |       coalesce(st.n_grams, CAST(0 AS BIGINT)) AS n_grams,
         |       coalesce(st.sum_freq, CAST(0 AS BIGINT)) AS sum_freq,
         |       coalesce(st.n_known, CAST(0 AS BIGINT)) AS n_known,
         |       CASE WHEN st.n_grams > 0
         |            THEN CAST(st.sum_freq AS DOUBLE) / st.n_grams
         |       END AS familiarity,
         |       CASE WHEN st.n_grams > 0
         |            THEN CAST(st.n_known AS DOUBLE) / st.n_grams
         |       END AS known_ratio
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
         |LEFT JOIN st USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // CCNet tertiles: q331's scoring CTEs + the q75 tie-stable bucket
    // expression over distinct fixed-point scores + one bucket card.
    "q332_ccnet_tertiles" ->
      s"""WITH rt AS (
         |  SELECT $oToks AS tk FROM documents WHERE doc_id % 2 = 0),
         |model AS (
         |  SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i+1])) AS gram
         |    FROM rt) GROUP BY 1),
         |bt AS (
         |  SELECT doc_id, $oToks AS tk FROM documents WHERE doc_id % 2 = 1),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS gram
         |  FROM bt),
         |sc AS (
         |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |         CAST(sum(coalesce(m.cnt, 0)) AS BIGINT) AS sum_freq,
         |         CAST((CAST(sum(coalesce(m.cnt, 0)) AS BIGINT) * 1048576)
         |           // CAST(count(*) AS BIGINT) AS BIGINT) AS fam_q20
         |  FROM bg LEFT JOIN model m USING (gram) GROUP BY 1),
         |hist AS (SELECT fam_q20, count(*) AS c FROM sc GROUP BY 1),
         |b AS (
         |  SELECT fam_q20,
         |    CAST((sum(c) OVER (ORDER BY fam_q20
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 3 - 1)
         |      // (SELECT count(*) FROM sc) AS BIGINT) + 1 AS bucket
         |  FROM hist),
         |j AS (SELECT sc.*, b.bucket FROM sc JOIN b USING (fam_q20))
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_grams) AS BIGINT) AS n_grams_total,
         |       CAST(sum(sum_freq) AS BIGINT) AS sum_freq_total,
         |       CAST(min(fam_q20) AS BIGINT) AS fam_q20_min,
         |       CAST(max(fam_q20) AS BIGINT) AS fam_q20_max
         |FROM j GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Media headers: the oracle never touches a byte — every output
    // column (payload SIZES included) re-derives from the same doc_id
    // arithmetic the engine used to CONSTRUCT the payloads, so a
    // construction bug and a parser bug both break the hash. Corrupt
    // rows (doc_id%4=3) must surface NULL header fields.
    "q333_media_headers" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 4
        |    WHEN 0 THEN 33 WHEN 1 THEN 41 WHEN 2 THEN 13
        |    ELSE CASE WHEN doc_id % 8 = 3 THEN 12 ELSE 29 END END
        |    AS BIGINT) AS n_bytes,
        |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    WHEN 2 THEN 'gif' END AS format,
        |  CASE WHEN doc_id % 4 < 3
        |    THEN CAST(doc_id % 991 + 1 AS BIGINT) END AS width,
        |  CASE WHEN doc_id % 4 < 3
        |    THEN CAST((doc_id * 7) % 737 + 1 AS BIGINT) END AS height,
        |  CASE doc_id % 4
        |    WHEN 0 THEN CAST([1,2,4,8,16][CAST(doc_id % 5 AS INT) + 1]
        |      AS BIGINT)
        |    WHEN 1 THEN CAST(8 AS BIGINT)
        |    WHEN 2 THEN CAST(doc_id % 8 + 1 AS BIGINT) END AS bit_depth
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Pixel stats: the oracle never touches a byte — luminance sums,
    // histogram-free integer stats, and the 9×8-grid dHash re-derive
    // from the SAME pixel arithmetic the fixtures rendered (pix =
    // (7x+13y+s)%256; RGB channels (p, 3p%256, 5p%256); lum = BT.601
    // milli-weights). The signed 64-bit dHash is assembled in HUGEINT
    // then wrapped to BIGINT two's-complement.
    "q342_pixel_stats" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 3 AS m, doc_id % 24 + 9 AS w,
        |    (doc_id * 5) % 24 + 8 AS h, doc_id % 10 = 7 AS corrupt
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y,
        |    CASE WHEN m = 0 THEN u.p * 1000
        |      ELSE 299 * u.p + 587 * ((u.p * 3) % 256)
        |        + 114 * ((u.p * 5) % 256) END AS lum
        |  FROM (
        |    SELECT doc_id, m, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + doc_id % 31) * (y + doc_id % 37) * 3
        |                 + doc_id) % 256})))) AS u
        |    FROM d WHERE NOT corrupt)),
        |st AS (
        |  SELECT doc_id, CAST(sum(lum) AS BIGINT) AS lum_sum,
        |    CAST(sum(lum * lum) AS BIGINT) AS lum_sq_sum
        |  FROM lum GROUP BY 1),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |dh AS (
        |  SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(k AS INT)) AS hraw
        |  FROM bits GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN d.corrupt THEN 40
        |    WHEN d.m = 0 THEN 68 + d.h * (1 + d.w)
        |    WHEN d.m = 1 THEN 68 + d.h * (1 + 3 * d.w)
        |    ELSE 54 + d.h * (((3 * d.w + 3) // 4) * 4) END AS BIGINT)
        |    AS n_bytes,
        |  CASE WHEN d.corrupt THEN NULL WHEN d.m = 2 THEN 'bmp'
        |    ELSE 'png' END AS format,
        |  CASE WHEN NOT d.corrupt THEN CAST(d.w AS BIGINT) END AS width,
        |  CASE WHEN NOT d.corrupt THEN CAST(d.h AS BIGINT) END AS height,
        |  CASE WHEN NOT d.corrupt THEN CAST(CASE WHEN d.m = 0 THEN 1
        |    ELSE 3 END AS BIGINT) END AS channels,
        |  CASE WHEN NOT d.corrupt THEN CAST(d.w * d.h AS BIGINT) END
        |    AS n_pixels,
        |  st.lum_sum, st.lum_sq_sum,
        |  CASE WHEN NOT d.corrupt THEN CAST(coalesce(dh.hraw, 0)
        |    - CASE WHEN coalesce(dh.hraw, 0) >= 9223372036854775808
        |        THEN 18446744073709551616 ELSE 0 END AS BIGINT) END
        |    AS dhash
        |FROM d LEFT JOIN st USING (doc_id) LEFT JOIN dh USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // dHash near-dup: banding with 4 bands is EXACT for Hamming <= 3
    // (pigeonhole), so the engine's banded answer equals the all-pairs
    // Hamming answer — which the oracle computes directly over
    // arithmetically re-derived dHashes (odd docs replay the one-pixel
    // origin edit of their even predecessor's grayscale PNG).
    "q343_dhash_neardup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id - (doc_id % 2) AS pid,
        |    doc_id % 2 = 1 AS edited,
        |    (doc_id - (doc_id % 2)) % 24 + 9 AS w,
        |    ((doc_id - (doc_id % 2)) * 5) % 24 + 8 AS h
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y,
        |    (CASE WHEN edited AND u.x = 0 AND u.y = 0
        |      THEN (((u.x + pid % 31) * (u.y + pid % 37) * 3 + pid)
        |            % 256 + 128) % 256
        |      ELSE ((u.x + pid % 31) * (u.y + pid % 37) * 3 + pid)
        |           % 256 END) * 1000 AS lum
        |  FROM (
        |    SELECT doc_id, pid, edited, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |    FROM d)),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(dh.hraw, 0)
        |      - CASE WHEN coalesce(dh.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id,
        |      sum(CAST(1 AS HUGEINT) << CAST(k AS INT)) AS hraw
        |    FROM bits GROUP BY 1) dh USING (doc_id))
        |SELECT a.doc_id AS i, b.doc_id AS j,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 2
        |ORDER BY i, j""".stripMargin,

    // IMA ADPCM: the oracle replays the per-nibble predictor/step
    // recursion — step table literal, diff = step/8 (+step/4 bit0,
    // +step/2 bit1, +step bit2), sign bit3, int16 clamp, index clamp
    // 0..88 — over the same doc_id-derived block headers and nibble
    // bytes, then the q345/q350 statistic shapes over (pos, value).
    "q381_ima_adpcm" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id % 3 + 2 AS nb, doc_id % 4 = 1 AS part,
        |    8000 + (doc_id % 3) * 4000 AS rate,
        |    NOT (doc_id % 10 = 3 OR doc_id % 11 = 7) AS ok
        |  FROM documents),
        |blk AS (
        |  SELECT doc_id, b,
        |    CASE WHEN part AND b = nb - 1 THEN 6 ELSE 12 END AS nbytes,
        |    b * 25 AS pos0,
        |    (doc_id * 7 + b * 131) % 65536 - 32768 AS pred0,
        |    (doc_id + 3 * b) % 89 AS idx0,
        |    rate
        |  FROM (SELECT doc_id, nb, part, rate, unnest(range(nb)) AS b
        |        FROM d WHERE ok)),
        |r(doc_id, b, j, pred, idx, nbytes, pos0) AS (
        |  SELECT doc_id, b, -1, pred0, idx0, nbytes, pos0 FROM blk
        |  UNION ALL
        |  SELECT doc_id, b, j + 1,
        |    greatest(-32768, least(32767,
        |      pred + CASE WHEN nib >= 8 THEN -diff ELSE diff END)),
        |    greatest(0, least(88,
        |      idx + [-1,-1,-1,-1,2,4,6,8][CAST(nib % 8 AS INT) + 1])),
        |    nbytes, pos0
        |  FROM (
        |    SELECT doc_id, b, j, pred, idx, nbytes, pos0, nib,
        |      step // 8
        |        + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END
        |        + CASE WHEN (nib // 2) % 2 = 1 THEN step // 2 ELSE 0 END
        |        + CASE WHEN (nib // 4) % 2 = 1 THEN step ELSE 0 END
        |        AS diff
        |    FROM (
        |      SELECT r.*,
        |        CASE WHEN (j + 1) % 2 = 0
        |          THEN ((doc_id + b * 5 + ((j + 1) // 2) * 7 + 3) % 256) % 16
        |          ELSE ((doc_id + b * 5 + ((j + 1) // 2) * 7 + 3) % 256) // 16
        |        END AS nib,
        |        [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,
        |         37,41,45,50,55,60,66,73,80,88,97,107,118,130,143,
        |         157,173,190,209,230,253,279,307,337,371,408,449,494,
        |         544,598,658,724,796,876,963,1060,1166,1282,1411,1552,
        |         1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,
        |         4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,
        |         12635,13899,15289,16818,18500,20350,22385,24623,27086,
        |         29794,32767][CAST(idx AS INT) + 1] AS step
        |      FROM r WHERE j + 1 < nbytes * 2))),
        |smp AS (
        |  SELECT doc_id, pos0 + j + 1 AS pos, pred AS v FROM r),
        |st AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sum_q,
        |    CAST(sum(v * v) AS BIGINT) AS sq_sum,
        |    CAST(count(CASE WHEN v = 32767 OR v = -32768 THEN 1 END)
        |      AS BIGINT) AS n_clipped,
        |    CAST(coalesce(min(CASE WHEN abs(v) > 256 THEN pos END),
        |      count(*)) AS BIGINT) AS lead_silence,
        |    CAST(coalesce(max(pos) - max(CASE WHEN abs(v) > 256 THEN pos
        |      END), count(*)) AS BIGINT) AS trail_silence
        |  FROM smp GROUP BY 1)
        |SELECT d.doc_id, d.ok AS parsed,
        |  CASE WHEN d.ok THEN 'ima_adpcm' END AS codec,
        |  CASE WHEN d.ok THEN CAST(d.rate AS BIGINT) END AS sample_rate,
        |  CASE WHEN d.ok THEN CAST(4 AS BIGINT) END AS bits,
        |  CASE WHEN d.ok THEN st.n END AS n_samples,
        |  CASE WHEN d.ok THEN st.n * 1000 // d.rate END AS duration_ms,
        |  CASE WHEN d.ok THEN st.sum_q END AS sum_q,
        |  CASE WHEN d.ok THEN st.sq_sum END AS sq_sum,
        |  CASE WHEN d.ok THEN st.n_clipped END AS n_clipped,
        |  CASE WHEN d.ok THEN st.lead_silence END AS lead_silence,
        |  CASE WHEN d.ok THEN st.trail_silence END AS trail_silence
        |FROM d LEFT JOIN st USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // FLAC subset: per-frame samples replayed from the fixture
    // formulas, fixed predictors as ITERATED PREFIX SUMS (two
    // windowed sums), envelope hash via the 65-window abs-energy
    // sign-bit replay (q367's machinery).
    "q388_flac_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 8000 + (doc_id % 5) * 4000 AS rate,
        |    2 * (doc_id % 20) + 40 AS n1, doc_id % 30 + 30 AS n2,
        |    NOT (doc_id % 10 = 3 OR doc_id % 11 = 7) AS ok
        |  FROM documents),
        |fx AS (
        |  SELECT doc_id, f, n, kind, n1, unnest(range(n)) AS i
        |  FROM (
        |    SELECT doc_id, u.f AS f, n1,
        |      CASE WHEN u.f = 0 THEN n1 ELSE n2 END AS n,
        |      (doc_id + u.f) % 4 AS kind
        |    FROM d, (SELECT unnest(range(2)) AS f) u
        |    WHERE ok)),
        |rr AS (
        |  SELECT doc_id, f, n, kind, n1, i,
        |    CASE WHEN kind = 2 AND i >= 1
        |        THEN (doc_id + i * 7 + f * 13) % 16 - 8
        |      WHEN kind = 3 AND i >= 2
        |        THEN (doc_id + i * 7 + f * 13) % 5 - 2
        |      ELSE 0 END AS r
        |  FROM fx),
        |w1 AS (
        |  SELECT *, sum(r) OVER (PARTITION BY doc_id, f ORDER BY i)
        |    AS cum1
        |  FROM rr),
        |w2 AS (
        |  SELECT *, sum(cum1) OVER (PARTITION BY doc_id, f ORDER BY i)
        |    AS cum2
        |  FROM w1),
        |smp AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN f = 0 THEN i ELSE n1 + i END AS pos,
        |    CASE WHEN kind = 0 THEN (doc_id * 11 + f * 17) % 4000 - 2000
        |      WHEN kind = 1
        |        THEN (doc_id * 3 + i * 257 + f * 29) % 4096 - 2048
        |      WHEN kind = 2
        |        THEN (doc_id + f * 31) % 1000 - 500 + cum1
        |      WHEN i = 0 THEN (doc_id + f * 37) % 600 - 300
        |      WHEN i = 1
        |        THEN (doc_id + f * 37) % 600 - 300 + (doc_id + f) % 20 - 10
        |      ELSE (doc_id + f * 37) % 600 - 300 + (doc_id + f) % 20 - 10
        |        + (i - 1) * ((doc_id + f) % 20 - 10) + cum2
        |    END AS v
        |  FROM w2),
        |st AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sum_q,
        |    CAST(sum(v * v) AS BIGINT) AS sq_sum,
        |    CAST(count(CASE WHEN v = 32767 OR v = -32768 THEN 1 END)
        |      AS BIGINT) AS n_clipped,
        |    CAST(coalesce(min(CASE WHEN abs(v) > 256 THEN pos END),
        |      count(*)) AS BIGINT) AS lead_silence,
        |    CAST(coalesce(max(pos) - max(CASE WHEN abs(v) > 256 THEN pos
        |      END), count(*)) AS BIGINT) AS trail_silence
        |  FROM smp GROUP BY 1),
        |env AS (
        |  SELECT s.doc_id, (65 * s.pos) // t.n AS t, sum(abs(s.v)) AS e
        |  FROM smp s JOIN st t USING (doc_id)
        |  GROUP BY 1, 2),
        |hb AS (
        |  SELECT a.doc_id,
        |    sum(CAST(1 AS HUGEINT) << CAST(a.t AS INT)) AS hraw
        |  FROM env a JOIN env b
        |    ON b.doc_id = a.doc_id AND b.t = a.t + 1
        |  WHERE a.t < 64 AND b.e > a.e
        |  GROUP BY 1)
        |SELECT d.doc_id, d.ok AS parsed,
        |  CASE WHEN d.ok THEN 'flac' END AS codec,
        |  CASE WHEN d.ok THEN CAST(d.rate AS BIGINT) END AS sample_rate,
        |  CASE WHEN d.ok THEN CAST(1 AS BIGINT) END AS channels,
        |  CASE WHEN d.ok THEN st.n END AS n_samples,
        |  CASE WHEN d.ok THEN st.n * 1000 // d.rate END AS duration_ms,
        |  CASE WHEN d.ok THEN st.sum_q END AS sum_q,
        |  CASE WHEN d.ok THEN st.sq_sum END AS sq_sum,
        |  CASE WHEN d.ok THEN st.n_clipped END AS n_clipped,
        |  CASE WHEN d.ok THEN st.lead_silence END AS lead_silence,
        |  CASE WHEN d.ok THEN st.trail_silence END AS trail_silence,
        |  CASE WHEN d.ok THEN
        |    CAST(coalesce(hb.hraw, 0)
        |      - CASE WHEN coalesce(hb.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |  END AS ahash
        |FROM d LEFT JOIN st USING (doc_id) LEFT JOIN hb USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // FLAC stereo: decorrelation is lossless, so the oracle replays
    // the target L/R formulas directly (interleaved positions), the
    // q381-style stats, and the 65-window envelope hash.
    "q389_flac_stereo" ->
      """WITH d AS (
        |  SELECT doc_id, 16000 + (doc_id % 3) * 8000 AS rate,
        |    doc_id % 40 + 40 AS n1, doc_id % 20 + 33 AS n2,
        |    NOT (doc_id % 10 = 3 OR doc_id % 11 = 7) AS ok
        |  FROM documents),
        |fx AS (
        |  SELECT doc_id, f, n1, unnest(range(n)) AS i
        |  FROM (
        |    SELECT doc_id, u.f AS f, n1,
        |      CASE WHEN u.f = 0 THEN n1 ELSE n2 END AS n
        |    FROM d, (SELECT unnest(range(2)) AS f) u
        |    WHERE ok)),
        |smp AS MATERIALIZED (
        |  SELECT doc_id,
        |    2 * (CASE WHEN f = 0 THEN i ELSE n1 + i END) + c AS pos,
        |    CASE WHEN c = 0
        |      THEN (doc_id * 3 + i * 257 + f * 71) % 3000 - 1500
        |      ELSE (doc_id * 5 + i * 193 + f * 101) % 3000 - 1500
        |    END AS v
        |  FROM fx, (SELECT unnest(range(2)) AS c)),
        |st AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sum_q,
        |    CAST(sum(v * v) AS BIGINT) AS sq_sum,
        |    CAST(count(CASE WHEN v = 32767 OR v = -32768 THEN 1 END)
        |      AS BIGINT) AS n_clipped,
        |    CAST(coalesce(min(CASE WHEN abs(v) > 256 THEN pos END),
        |      count(*)) AS BIGINT) AS lead_silence,
        |    CAST(coalesce(max(pos) - max(CASE WHEN abs(v) > 256 THEN pos
        |      END), count(*)) AS BIGINT) AS trail_silence
        |  FROM smp GROUP BY 1),
        |env AS (
        |  SELECT s.doc_id, (65 * s.pos) // t.n AS t, sum(abs(s.v)) AS e
        |  FROM smp s JOIN st t USING (doc_id)
        |  GROUP BY 1, 2),
        |hb AS (
        |  SELECT a.doc_id,
        |    sum(CAST(1 AS HUGEINT) << CAST(a.t AS INT)) AS hraw
        |  FROM env a JOIN env b
        |    ON b.doc_id = a.doc_id AND b.t = a.t + 1
        |  WHERE a.t < 64 AND b.e > a.e
        |  GROUP BY 1)
        |SELECT d.doc_id, d.ok AS parsed,
        |  CASE WHEN d.ok THEN 'flac' END AS codec,
        |  CASE WHEN d.ok THEN CAST(d.rate AS BIGINT) END AS sample_rate,
        |  CASE WHEN d.ok THEN CAST(2 AS BIGINT) END AS channels,
        |  CASE WHEN d.ok THEN st.n END AS n_samples,
        |  CASE WHEN d.ok THEN (st.n // 2) * 1000 // d.rate
        |    END AS duration_ms,
        |  CASE WHEN d.ok THEN st.sum_q END AS sum_q,
        |  CASE WHEN d.ok THEN st.sq_sum END AS sq_sum,
        |  CASE WHEN d.ok THEN st.n_clipped END AS n_clipped,
        |  CASE WHEN d.ok THEN st.lead_silence END AS lead_silence,
        |  CASE WHEN d.ok THEN st.trail_silence END AS trail_silence,
        |  CASE WHEN d.ok THEN
        |    CAST(coalesce(hb.hraw, 0)
        |      - CASE WHEN coalesce(hb.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |  END AS ahash
        |FROM d LEFT JOIN st USING (doc_id) LEFT JOIN hb USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // MS-ADPCM: the per-nibble predictor/delta recursion with
    // PER-CHANNEL state carried in one recursive CTE (channel-1
    // columns idle for mono); header samples (iSamp2 then iSamp1 per
    // channel) emitted by position arithmetic; // truncates toward
    // zero in DuckDB exactly as Scala's integer division does.
    "q386_ms_adpcm" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS ch,
        |    11025 * (doc_id % 2 + 1) AS rate,
        |    doc_id % 3 + 2 AS nb, doc_id % 4 = 1 AS part,
        |    NOT (doc_id % 10 = 3 OR doc_id % 11 = 7) AS ok
        |  FROM documents),
        |blk AS (
        |  SELECT doc_id, ch, b,
        |    CASE WHEN part AND b = nb - 1 THEN 6 ELSE 12 END AS nd,
        |    b * (2 * ch + 24) AS pos0,
        |    [256,512,0,192,240,460,392]
        |      [CAST((doc_id + b) % 7 AS INT) + 1] AS c1_0,
        |    [0,-256,0,64,0,-208,-232]
        |      [CAST((doc_id + b) % 7 AS INT) + 1] AS c2_0,
        |    (doc_id * 3 + b * 17) % 1000 + 16 AS d0_0,
        |    (doc_id * 7 + b * 131) % 65536 - 32768 AS is1_0,
        |    (doc_id * 11 + b * 57) % 65536 - 32768 AS is2_0,
        |    [256,512,0,192,240,460,392]
        |      [CAST((doc_id + b + 1) % 7 AS INT) + 1] AS c1_1,
        |    [0,-256,0,64,0,-208,-232]
        |      [CAST((doc_id + b + 1) % 7 AS INT) + 1] AS c2_1,
        |    (doc_id * 3 + b * 17 + 29) % 1000 + 16 AS d0_1,
        |    (doc_id * 7 + b * 131 + 37) % 65536 - 32768 AS is1_1,
        |    (doc_id * 11 + b * 57 + 73) % 65536 - 32768 AS is2_1
        |  FROM (SELECT doc_id, ch, nb, part, unnest(range(nb)) AS b
        |        FROM d WHERE ok)),
        |r(doc_id, b, j, ch, nd, pos0, s1_0, s2_0, dl_0, c1_0, c2_0,
        |  s1_1, s2_1, dl_1, c1_1, c2_1, v) AS (
        |  SELECT doc_id, b, -1, ch, nd, pos0, is1_0, is2_0, d0_0, c1_0,
        |    c2_0, is1_1, is2_1, d0_1, c1_1, c2_1, CAST(NULL AS BIGINT)
        |  FROM blk
        |  UNION ALL
        |  SELECT doc_id, b, j + 1, ch, nd, pos0,
        |    CASE WHEN c = 0 THEN pred ELSE s1_0 END,
        |    CASE WHEN c = 0 THEN s1_0 ELSE s2_0 END,
        |    CASE WHEN c = 0
        |      THEN greatest(16, least(32767, (adapt * dl_0) // 256))
        |      ELSE dl_0 END,
        |    c1_0, c2_0,
        |    CASE WHEN c = 1 THEN pred ELSE s1_1 END,
        |    CASE WHEN c = 1 THEN s1_1 ELSE s2_1 END,
        |    CASE WHEN c = 1
        |      THEN greatest(16, least(32767, (adapt * dl_1) // 256))
        |      ELSE dl_1 END,
        |    c1_1, c2_1,
        |    pred
        |  FROM (
        |    SELECT doc_id, b, j, ch, nd, pos0, s1_0, s2_0, dl_0, c1_0,
        |      c2_0, s1_1, s2_1, dl_1, c1_1, c2_1, c, nib,
        |      [230,230,230,230,307,409,512,614,768,614,512,409,307,
        |       230,230,230][CAST(nib AS INT) + 1] AS adapt,
        |      greatest(-32768, least(32767,
        |        CASE WHEN c = 0
        |          THEN (s1_0 * c1_0 + s2_0 * c2_0) // 256
        |            + (CASE WHEN nib >= 8 THEN nib - 16 ELSE nib END) * dl_0
        |          ELSE (s1_1 * c1_1 + s2_1 * c2_1) // 256
        |            + (CASE WHEN nib >= 8 THEN nib - 16 ELSE nib END) * dl_1
        |        END)) AS pred
        |    FROM (
        |      SELECT r.*, (j + 1) % ch AS c,
        |        CASE WHEN (j + 1) % 2 = 0
        |          THEN ((doc_id + b * 5 + ((j + 1) // 2) * 7 + 3) % 256) // 16
        |          ELSE ((doc_id + b * 5 + ((j + 1) // 2) * 7 + 3) % 256) % 16
        |        END AS nib
        |      FROM r WHERE j + 1 < nd * 2))),
        |smp AS (
        |  SELECT doc_id, pos0 AS pos, is2_0 AS v FROM blk
        |  UNION ALL SELECT doc_id, pos0 + ch, is1_0 FROM blk
        |  UNION ALL SELECT doc_id, pos0 + 1, is2_1 FROM blk WHERE ch = 2
        |  UNION ALL SELECT doc_id, pos0 + 3, is1_1 FROM blk WHERE ch = 2
        |  UNION ALL SELECT doc_id, pos0 + 2 * ch + j, v FROM r WHERE j >= 0),
        |st AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sum_q,
        |    CAST(sum(v * v) AS BIGINT) AS sq_sum,
        |    CAST(count(CASE WHEN v = 32767 OR v = -32768 THEN 1 END)
        |      AS BIGINT) AS n_clipped,
        |    CAST(coalesce(min(CASE WHEN abs(v) > 256 THEN pos END),
        |      count(*)) AS BIGINT) AS lead_silence,
        |    CAST(coalesce(max(pos) - max(CASE WHEN abs(v) > 256 THEN pos
        |      END), count(*)) AS BIGINT) AS trail_silence
        |  FROM smp GROUP BY 1)
        |SELECT d.doc_id, d.ok AS parsed,
        |  CASE WHEN d.ok THEN 'ms_adpcm' END AS codec,
        |  CASE WHEN d.ok THEN CAST(d.rate AS BIGINT) END AS sample_rate,
        |  CASE WHEN d.ok THEN CAST(d.ch AS BIGINT) END AS channels,
        |  CASE WHEN d.ok THEN st.n END AS n_samples,
        |  CASE WHEN d.ok THEN (st.n // d.ch) * 1000 // d.rate
        |    END AS duration_ms,
        |  CASE WHEN d.ok THEN st.sum_q END AS sum_q,
        |  CASE WHEN d.ok THEN st.sq_sum END AS sq_sum,
        |  CASE WHEN d.ok THEN st.n_clipped END AS n_clipped,
        |  CASE WHEN d.ok THEN st.lead_silence END AS lead_silence,
        |  CASE WHEN d.ok THEN st.trail_silence END AS trail_silence
        |FROM d LEFT JOIN st USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Stereo IMA ADPCM: q381's per-nibble recursion run once per LANE
    // (left/right), the chunk byte mapping k = (t//4)·8 + lane·4 +
    // t%4 picking each lane's bytes out of the alternating 4-byte
    // channel chunks, frame interleave by position arithmetic
    // pos = pos0 + 2·(j+1) + lane.
    "q387_stereo_ima_adpcm" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id % 3 + 2 AS nb, doc_id % 4 = 1 AS part,
        |    8000 + (doc_id % 3) * 4000 AS rate,
        |    NOT (doc_id % 10 = 3 OR doc_id % 11 = 7) AS ok
        |  FROM documents),
        |blk AS (
        |  SELECT doc_id, b, lane,
        |    CASE WHEN part AND b = nb - 1 THEN 4 ELSE 8 END AS nbytes,
        |    b * 34 AS pos0,
        |    CASE WHEN lane = 0 THEN (doc_id * 7 + b * 131) % 65536 - 32768
        |      ELSE (doc_id * 13 + b * 59) % 65536 - 32768 END AS pred0,
        |    CASE WHEN lane = 0 THEN (doc_id + 3 * b) % 89
        |      ELSE (doc_id * 5 + 7 * b) % 89 END AS idx0
        |  FROM (SELECT doc_id, nb, part, unnest(range(nb)) AS b
        |        FROM d WHERE ok),
        |    (SELECT unnest(range(2)) AS lane)),
        |r(doc_id, b, lane, j, pred, idx, nbytes, pos0) AS (
        |  SELECT doc_id, b, lane, -1, pred0, idx0, nbytes, pos0 FROM blk
        |  UNION ALL
        |  SELECT doc_id, b, lane, j + 1,
        |    greatest(-32768, least(32767,
        |      pred + CASE WHEN nib >= 8 THEN -diff ELSE diff END)),
        |    greatest(0, least(88,
        |      idx + [-1,-1,-1,-1,2,4,6,8][CAST(nib % 8 AS INT) + 1])),
        |    nbytes, pos0
        |  FROM (
        |    SELECT doc_id, b, lane, j, pred, idx, nbytes, pos0, nib,
        |      step // 8
        |        + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END
        |        + CASE WHEN (nib // 2) % 2 = 1 THEN step // 2 ELSE 0 END
        |        + CASE WHEN (nib // 4) % 2 = 1 THEN step ELSE 0 END
        |        AS diff
        |    FROM (
        |      SELECT r.*,
        |        CASE WHEN (j + 1) % 2 = 0
        |          THEN ((doc_id + b * 5
        |            + ((((j + 1) // 2) // 4) * 8 + lane * 4
        |               + ((j + 1) // 2) % 4) * 7 + 3) % 256) % 16
        |          ELSE ((doc_id + b * 5
        |            + ((((j + 1) // 2) // 4) * 8 + lane * 4
        |               + ((j + 1) // 2) % 4) * 7 + 3) % 256) // 16
        |        END AS nib,
        |        [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,
        |         37,41,45,50,55,60,66,73,80,88,97,107,118,130,143,
        |         157,173,190,209,230,253,279,307,337,371,408,449,494,
        |         544,598,658,724,796,876,963,1060,1166,1282,1411,1552,
        |         1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,
        |         4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,
        |         12635,13899,15289,16818,18500,20350,22385,24623,27086,
        |         29794,32767][CAST(idx AS INT) + 1] AS step
        |      FROM r WHERE j + 1 < nbytes * 2))),
        |smp AS (
        |  SELECT doc_id, pos0 + 2 * (j + 1) + lane AS pos, pred AS v
        |  FROM r),
        |st AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sum_q,
        |    CAST(sum(v * v) AS BIGINT) AS sq_sum,
        |    CAST(count(CASE WHEN v = 32767 OR v = -32768 THEN 1 END)
        |      AS BIGINT) AS n_clipped,
        |    CAST(coalesce(min(CASE WHEN abs(v) > 256 THEN pos END),
        |      count(*)) AS BIGINT) AS lead_silence,
        |    CAST(coalesce(max(pos) - max(CASE WHEN abs(v) > 256 THEN pos
        |      END), count(*)) AS BIGINT) AS trail_silence
        |  FROM smp GROUP BY 1)
        |SELECT d.doc_id, d.ok AS parsed,
        |  CASE WHEN d.ok THEN 'ima_adpcm' END AS codec,
        |  CASE WHEN d.ok THEN CAST(d.rate AS BIGINT) END AS sample_rate,
        |  CASE WHEN d.ok THEN CAST(2 AS BIGINT) END AS channels,
        |  CASE WHEN d.ok THEN st.n END AS n_samples,
        |  CASE WHEN d.ok THEN (st.n // 2) * 1000 // d.rate
        |    END AS duration_ms,
        |  CASE WHEN d.ok THEN st.sum_q END AS sum_q,
        |  CASE WHEN d.ok THEN st.sq_sum END AS sq_sum,
        |  CASE WHEN d.ok THEN st.n_clipped END AS n_clipped,
        |  CASE WHEN d.ok THEN st.lead_silence END AS lead_silence,
        |  CASE WHEN d.ok THEN st.trail_silence END AS trail_silence
        |FROM d LEFT JOIN st USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Occupancy guard under the constant-image flood: flood docs all
    // dHash to 0 (flat image — no cell comparison fires); non-flood
    // docs replay q343's pixel arithmetic. Bands come from the
    // UNSIGNED hash (HUGEINT division by 2^16b), saturation is the
    // occ > 32 rule, exact groups become star edges, near pairs only
    // through unsaturated buckets, survivors via the unrolled CC.
    "q378_occupancy_guard" ->
      s"""WITH d AS (
        |  SELECT doc_id, doc_id % 5 <= 2 AS flood,
        |    doc_id - (doc_id % 2) AS pid, doc_id % 2 = 1 AS edited,
        |    (doc_id - (doc_id % 2)) % 24 + 9 AS w,
        |    ((doc_id - (doc_id % 2)) * 5) % 24 + 8 AS h
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y,
        |    (CASE WHEN edited AND u.x = 0 AND u.y = 0
        |      THEN (((u.x + pid % 31) * (u.y + pid % 37) * 3 + pid)
        |            % 256 + 128) % 256
        |      ELSE ((u.x + pid % 31) * (u.y + pid % 37) * 3 + pid)
        |           % 256 END) * 1000 AS lum
        |  FROM (
        |    SELECT doc_id, pid, edited, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |    FROM d WHERE NOT flood)),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS MATERIALIZED (
        |  SELECT d.doc_id,
        |    CASE WHEN d.flood THEN CAST(0 AS HUGEINT)
        |      ELSE coalesce(dh.hraw, 0) END AS hraw,
        |    CAST(CASE WHEN d.flood THEN CAST(0 AS HUGEINT)
        |        ELSE coalesce(dh.hraw, 0) END
        |      - CASE WHEN (CASE WHEN d.flood THEN CAST(0 AS HUGEINT)
        |          ELSE coalesce(dh.hraw, 0) END) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id,
        |      sum(CAST(1 AS HUGEINT) << CAST(k AS INT)) AS hraw
        |    FROM bits GROUP BY 1) dh USING (doc_id)),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, dhash, b.band AS band,
        |    CAST((hraw // CAST([1, 65536, 4294967296, 281474976710656]
        |      [CAST(b.band AS INT) + 1] AS HUGEINT)) % 65536 AS BIGINT)
        |      AS nib
        |  FROM sig, (SELECT unnest(range(4)) AS band) b),
        |occ AS (
        |  SELECT band, nib, count(*) AS occ
        |  FROM bands GROUP BY 1, 2),
        |okb AS (SELECT band, nib FROM occ WHERE occ <= 32),
        |bandok AS MATERIALIZED (
        |  SELECT b.doc_id, b.band, b.nib, b.dhash
        |  FROM bands b JOIN okb USING (band, nib)),
        |near AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bandok a JOIN bandok b
        |    ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.dhash, b.dhash)) BETWEEN 1 AND 2),
        |grp AS (
        |  SELECT dhash, min(doc_id) AS mn, count(*) AS n
        |  FROM sig GROUP BY 1),
        |star AS MATERIALIZED (
        |  SELECT g.mn AS i, s.doc_id AS j
        |  FROM grp g JOIN sig s ON s.dhash = g.dhash
        |  WHERE g.n >= 2 AND s.doc_id <> g.mn),
        |esym AS MATERIALIZED (
        |  SELECT i AS u, j AS v FROM star
        |  UNION ALL SELECT j, i FROM star
        |  UNION ALL SELECT i, j FROM near
        |  UNION ALL SELECT j, i FROM near),
        |enodes AS (SELECT DISTINCT u AS node FROM esym),
        |${oUnrolledCcCtes("a", "enodes", "esym")}
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig) AS n_images,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig) AS n_hashed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE dhash = 0)
        |    AS n_flat,
        |  (SELECT CAST(count(CASE WHEN occ > 32 THEN 1 END) AS BIGINT)
        |   FROM occ) AS n_saturated_buckets,
        |  (SELECT CAST(coalesce(sum(CASE WHEN occ > 32 THEN occ END), 0)
        |     AS BIGINT) FROM occ) AS n_rows_saturated,
        |  (SELECT CAST(count(*) AS BIGINT) FROM star) AS n_exact_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM near) AS n_near_pairs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig)
        |    - (SELECT CAST(count(*) AS BIGINT) FROM alab)
        |    + (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM alab)
        |    + (SELECT poison FROM achg) AS n_survivors
        |ORDER BY n_images""".stripMargin,

    // Incremental occupancy guard: q378's sig/band/occupancy replay
    // split even→corpus / odd→batch; representative cross edges (min
    // corpus holder per matched batch id), batch star edges, near
    // matches through combined-unsaturated buckets, survivors via the
    // unrolled CC over all four edge sets.
    "q380_incremental_guard" ->
      s"""WITH d AS (
        |  SELECT doc_id, doc_id % 5 <= 2 AS flood,
        |    doc_id - (doc_id % 2) AS pid, doc_id % 2 = 1 AS edited,
        |    (doc_id - (doc_id % 2)) % 24 + 9 AS w,
        |    ((doc_id - (doc_id % 2)) * 5) % 24 + 8 AS h
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y,
        |    (CASE WHEN edited AND u.x = 0 AND u.y = 0
        |      THEN (((u.x + pid % 31) * (u.y + pid % 37) * 3 + pid)
        |            % 256 + 128) % 256
        |      ELSE ((u.x + pid % 31) * (u.y + pid % 37) * 3 + pid)
        |           % 256 END) * 1000 AS lum
        |  FROM (
        |    SELECT doc_id, pid, edited, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |    FROM d WHERE NOT flood)),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS MATERIALIZED (
        |  SELECT d.doc_id,
        |    CASE WHEN d.flood THEN CAST(0 AS HUGEINT)
        |      ELSE coalesce(dh.hraw, 0) END AS hraw,
        |    CAST(CASE WHEN d.flood THEN CAST(0 AS HUGEINT)
        |        ELSE coalesce(dh.hraw, 0) END
        |      - CASE WHEN (CASE WHEN d.flood THEN CAST(0 AS HUGEINT)
        |          ELSE coalesce(dh.hraw, 0) END) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id,
        |      sum(CAST(1 AS HUGEINT) << CAST(k AS INT)) AS hraw
        |    FROM bits GROUP BY 1) dh USING (doc_id)),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, dhash, b.band AS band,
        |    CAST((hraw // CAST([1, 65536, 4294967296, 281474976710656]
        |      [CAST(b.band AS INT) + 1] AS HUGEINT)) % 65536 AS BIGINT)
        |      AS nib
        |  FROM sig, (SELECT unnest(range(4)) AS band) b),
        |occ AS (
        |  SELECT band, nib, count(*) AS occ
        |  FROM bands GROUP BY 1, 2),
        |okb AS (SELECT band, nib FROM occ WHERE occ <= 32),
        |bandok AS MATERIALIZED (
        |  SELECT b.doc_id, b.band, b.nib, b.dhash
        |  FROM bands b JOIN okb USING (band, nib)),
        |cmin AS (
        |  SELECT dhash, min(doc_id) AS cm
        |  FROM sig WHERE doc_id % 2 = 0 GROUP BY 1),
        |ec AS MATERIALIZED (
        |  SELECT c.cm AS i, s.doc_id AS j
        |  FROM sig s JOIN cmin c USING (dhash)
        |  WHERE s.doc_id % 2 = 1),
        |bgrp AS (
        |  SELECT dhash, min(doc_id) AS mn, count(*) AS n
        |  FROM sig WHERE doc_id % 2 = 1 GROUP BY 1),
        |st AS MATERIALIZED (
        |  SELECT g.mn AS i, s.doc_id AS j
        |  FROM bgrp g JOIN sig s USING (dhash)
        |  WHERE s.doc_id % 2 = 1 AND g.n >= 2 AND s.doc_id <> g.mn),
        |nc AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bandok a JOIN bandok b
        |    ON a.band = b.band AND a.nib = b.nib
        |    AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  WHERE bit_count(xor(a.dhash, b.dhash)) BETWEEN 1 AND 2),
        |nw AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bandok a JOIN bandok b
        |    ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
        |    AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
        |  WHERE bit_count(xor(a.dhash, b.dhash)) BETWEEN 1 AND 2),
        |esym AS MATERIALIZED (
        |  SELECT i AS u, j AS v FROM (
        |    SELECT i, j FROM ec UNION ALL SELECT i, j FROM st
        |    UNION ALL SELECT i, j FROM nc UNION ALL SELECT i, j FROM nw)
        |  UNION ALL
        |  SELECT j, i FROM (
        |    SELECT i, j FROM ec UNION ALL SELECT i, j FROM st
        |    UNION ALL SELECT i, j FROM nc UNION ALL SELECT i, j FROM nw)),
        |enodes AS (SELECT DISTINCT u AS node FROM esym),
        |${oUnrolledCcCtes("a", "enodes", "esym")}
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE doc_id % 2 = 0)
        |    AS n_corpus_sigs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE doc_id % 2 = 1)
        |    AS n_batch_sigs,
        |  (SELECT CAST(count(CASE WHEN occ > 32 THEN 1 END) AS BIGINT)
        |   FROM occ) AS n_saturated_buckets,
        |  (SELECT CAST(coalesce(sum(CASE WHEN occ > 32 THEN occ END), 0)
        |     AS BIGINT) FROM occ) AS n_rows_saturated,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ec) AS n_exact_cross,
        |  (SELECT CAST(count(*) AS BIGINT) FROM st) AS n_exact_star,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nc) AS n_near_cross,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nw) AS n_near_within,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE doc_id % 2 = 1)
        |    - (SELECT CAST(count(*) AS BIGINT) FROM alab
        |       WHERE node % 2 = 1 AND component <> node)
        |    + (SELECT poison FROM achg) AS n_survivors
        |ORDER BY n_corpus_sigs""".stripMargin,

    // Text-tier occupancy guard: wide simhash replayed over the
    // boilerplate-flooded corpus, 14-bit banding, occ > 32 rule, star
    // edges per exact group, near pairs through unsaturated buckets,
    // survivors via the unrolled CC.
    "q383_simhash_flood_guard" ->
      s"""WITH ${oWideFloodCtes},
        |near AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bandok a JOIN bandok b
        |    ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.sig, b.sig)) BETWEEN 1 AND 2),
        |grp AS (
        |  SELECT sig, min(doc_id) AS mn, count(*) AS n
        |  FROM wide GROUP BY 1),
        |star AS MATERIALIZED (
        |  SELECT g.mn AS i, s.doc_id AS j
        |  FROM grp g JOIN wide s ON s.sig = g.sig
        |  WHERE g.n >= 2 AND s.doc_id <> g.mn),
        |esym AS MATERIALIZED (
        |  SELECT i AS u, j AS v FROM star
        |  UNION ALL SELECT j, i FROM star
        |  UNION ALL SELECT i, j FROM near
        |  UNION ALL SELECT j, i FROM near),
        |enodes AS (SELECT DISTINCT u AS node FROM esym),
        |${oUnrolledCcCtes("a", "enodes", "esym")}
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM wide) AS n_docs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE doc_id % 5 <= 2) AS n_flood,
        |  (SELECT CAST(count(CASE WHEN occ > 32 THEN 1 END) AS BIGINT)
        |   FROM occ) AS n_saturated_buckets,
        |  (SELECT CAST(coalesce(sum(CASE WHEN occ > 32 THEN occ END), 0)
        |     AS BIGINT) FROM occ) AS n_rows_saturated,
        |  (SELECT CAST(count(*) AS BIGINT) FROM star) AS n_exact_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM near) AS n_near_pairs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM wide)
        |    - (SELECT CAST(count(*) AS BIGINT) FROM alab)
        |    + (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM alab)
        |    + (SELECT poison FROM achg) AS n_survivors
        |ORDER BY n_docs""".stripMargin,

    // Incremental text guard: q383's sig/band/occupancy replay split
    // even→corpus / odd→batch; representative cross edges, batch
    // stars, near matches through combined-unsaturated buckets,
    // survivors via the unrolled CC over all four edge sets.
    "q384_incremental_text_guard" ->
      s"""WITH ${oWideFloodCtes},
        |cmin AS (
        |  SELECT sig, min(doc_id) AS cm
        |  FROM wide WHERE doc_id % 2 = 0 GROUP BY 1),
        |ec AS MATERIALIZED (
        |  SELECT c.cm AS i, s.doc_id AS j
        |  FROM wide s JOIN cmin c USING (sig)
        |  WHERE s.doc_id % 2 = 1),
        |bgrp AS (
        |  SELECT sig, min(doc_id) AS mn, count(*) AS n
        |  FROM wide WHERE doc_id % 2 = 1 GROUP BY 1),
        |st AS MATERIALIZED (
        |  SELECT g.mn AS i, s.doc_id AS j
        |  FROM bgrp g JOIN wide s USING (sig)
        |  WHERE s.doc_id % 2 = 1 AND g.n >= 2 AND s.doc_id <> g.mn),
        |nc AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bandok a JOIN bandok b
        |    ON a.band = b.band AND a.nib = b.nib
        |    AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  WHERE bit_count(xor(a.sig, b.sig)) BETWEEN 1 AND 2),
        |nw AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bandok a JOIN bandok b
        |    ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
        |    AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
        |  WHERE bit_count(xor(a.sig, b.sig)) BETWEEN 1 AND 2),
        |esym AS MATERIALIZED (
        |  SELECT i AS u, j AS v FROM (
        |    SELECT i, j FROM ec UNION ALL SELECT i, j FROM st
        |    UNION ALL SELECT i, j FROM nc UNION ALL SELECT i, j FROM nw)
        |  UNION ALL
        |  SELECT j, i FROM (
        |    SELECT i, j FROM ec UNION ALL SELECT i, j FROM st
        |    UNION ALL SELECT i, j FROM nc UNION ALL SELECT i, j FROM nw)),
        |enodes AS (SELECT DISTINCT u AS node FROM esym),
        |${oUnrolledCcCtes("a", "enodes", "esym")}
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM wide WHERE doc_id % 2 = 0)
        |    AS n_corpus_sigs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM wide WHERE doc_id % 2 = 1)
        |    AS n_batch_sigs,
        |  (SELECT CAST(count(CASE WHEN occ > 32 THEN 1 END) AS BIGINT)
        |   FROM occ) AS n_saturated_buckets,
        |  (SELECT CAST(coalesce(sum(CASE WHEN occ > 32 THEN occ END), 0)
        |     AS BIGINT) FROM occ) AS n_rows_saturated,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ec) AS n_exact_cross,
        |  (SELECT CAST(count(*) AS BIGINT) FROM st) AS n_exact_star,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nc) AS n_near_cross,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nw) AS n_near_within,
        |  (SELECT CAST(count(*) AS BIGINT) FROM wide WHERE doc_id % 2 = 1)
        |    - (SELECT CAST(count(*) AS BIGINT) FROM alab
        |       WHERE node % 2 = 1 AND component <> node)
        |    + (SELECT poison FROM achg) AS n_survivors
        |ORDER BY n_corpus_sigs""".stripMargin,

    // MJPEG video dedup: first-frame dHash replayed from the DC-only
    // JPEG closed form (q372's pinned-IDCT contract) over the shared
    // pair seed sp = doc_id - doc_id % 2, area-weighted 9×8 cells,
    // guarded batch-vs-corpus matching (representative cross edges,
    // batch stars, combined-occupancy near rule), unrolled-CC
    // survivors. Truncated payloads (doc % 10 = 9) have no signature.
    "q385_mjpeg_video_dedup" ->
      s"""WITH d AS (
        |  SELECT doc_id, sp, sp % 24 + 72 AS w, (sp * 5) % 24 + 64 AS h
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN doc_id % 12 IN (4, 5, 8, 10) THEN 5000011 + doc_id
        |        WHEN doc_id % 12 IN (9, 11) THEN 7000019 + doc_id // 12
        |        ELSE doc_id - doc_id % 2 END AS sp
        |    FROM documents WHERE doc_id % 10 <> 9)),
        |bv AS (
        |  SELECT doc_id, bx, by,
        |    CASE WHEN f < -128 THEN 0 WHEN f > 127 THEN 255
        |      ELSE f + 128 END AS val
        |  FROM (
        |    SELECT doc_id, bx, by,
        |      CAST(floor((dc * 8 * 2096704 + 8388608) / 16777216.0)
        |        AS BIGINT) AS f
        |    FROM (
        |      SELECT doc_id, u.bx AS bx, u.by AS by,
        |        ((u.bx + sp % 31) * (u.by + sp % 37) * 3 + sp)
        |          % 256 - 128 AS dc
        |      FROM (
        |        SELECT doc_id, sp,
        |          unnest(flatten(list_transform(range((h + 7) // 8),
        |            by -> list_transform(range((w + 7) // 8), bx ->
        |              {'bx': bx, 'by': by})))) AS u
        |        FROM d)))),
        |xm AS (
        |  SELECT doc_id, cx, bx,
        |    least(x1, 8 * bx + 7) - greatest(x0, 8 * bx) + 1 AS nx,
        |    x1 - x0 + 1 AS tx
        |  FROM (
        |    SELECT doc_id, u.cx AS cx, u.bx AS bx,
        |      (u.cx * w + 8) // 9 AS x0, ((u.cx + 1) * w - 1) // 9 AS x1
        |    FROM (
        |      SELECT doc_id, w,
        |        unnest(flatten(list_transform(range(9), cx ->
        |          list_transform(range((w + 7) // 8), bx ->
        |            {'cx': cx, 'bx': bx})))) AS u
        |      FROM d))
        |  WHERE least(x1, 8 * bx + 7) >= greatest(x0, 8 * bx)),
        |ym AS (
        |  SELECT doc_id, cy, by,
        |    least(y1, 8 * by + 7) - greatest(y0, 8 * by) + 1 AS ny,
        |    y1 - y0 + 1 AS ty
        |  FROM (
        |    SELECT doc_id, u.cy AS cy, u.by AS by,
        |      (u.cy * h + 7) // 8 AS y0, ((u.cy + 1) * h - 1) // 8 AS y1
        |    FROM (
        |      SELECT doc_id, h,
        |        unnest(flatten(list_transform(range(8), cy ->
        |          list_transform(range((h + 7) // 8), by ->
        |            {'cy': cy, 'by': by})))) AS u
        |      FROM d))
        |  WHERE least(y1, 8 * by + 7) >= greatest(y0, 8 * by)),
        |cells AS (
        |  SELECT b.doc_id, x.cx, y.cy,
        |    (1000 * sum(b.val * x.nx * y.ny)) // (x.tx * y.ty) AS cavg
        |  FROM bv b
        |  JOIN xm x ON x.doc_id = b.doc_id AND x.bx = b.bx
        |  JOIN ym y ON y.doc_id = b.doc_id AND y.by = b.by
        |  GROUP BY 1, 2, 3, x.tx, y.ty),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS MATERIALIZED (
        |  SELECT d.doc_id, coalesce(x.hraw, 0) AS hraw,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1) x USING (doc_id)),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, dhash, b.band AS band,
        |    CAST((hraw // CAST([1, 65536, 4294967296, 281474976710656]
        |      [CAST(b.band AS INT) + 1] AS HUGEINT)) % 65536 AS BIGINT)
        |      AS nib
        |  FROM sig, (SELECT unnest(range(4)) AS band) b),
        |occ AS (
        |  SELECT band, nib, count(*) AS occ
        |  FROM bands GROUP BY 1, 2),
        |okb AS (SELECT band, nib FROM occ WHERE occ <= 32),
        |bandok AS MATERIALIZED (
        |  SELECT b.doc_id, b.band, b.nib, b.dhash
        |  FROM bands b JOIN okb USING (band, nib)),
        |cmin AS (
        |  SELECT dhash, min(doc_id) AS cm
        |  FROM sig WHERE doc_id % 2 = 0 GROUP BY 1),
        |ec AS MATERIALIZED (
        |  SELECT c.cm AS i, s.doc_id AS j
        |  FROM sig s JOIN cmin c USING (dhash)
        |  WHERE s.doc_id % 2 = 1),
        |bgrp AS (
        |  SELECT dhash, min(doc_id) AS mn, count(*) AS n
        |  FROM sig WHERE doc_id % 2 = 1 GROUP BY 1),
        |st AS MATERIALIZED (
        |  SELECT g.mn AS i, s.doc_id AS j
        |  FROM bgrp g JOIN sig s USING (dhash)
        |  WHERE s.doc_id % 2 = 1 AND g.n >= 2 AND s.doc_id <> g.mn),
        |nc AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bandok a JOIN bandok b
        |    ON a.band = b.band AND a.nib = b.nib
        |    AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  WHERE bit_count(xor(a.dhash, b.dhash)) BETWEEN 1 AND 2),
        |nw AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bandok a JOIN bandok b
        |    ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
        |    AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
        |  WHERE bit_count(xor(a.dhash, b.dhash)) BETWEEN 1 AND 2),
        |esym AS MATERIALIZED (
        |  SELECT i AS u, j AS v FROM (
        |    SELECT i, j FROM ec UNION ALL SELECT i, j FROM st
        |    UNION ALL SELECT i, j FROM nc UNION ALL SELECT i, j FROM nw)
        |  UNION ALL
        |  SELECT j, i FROM (
        |    SELECT i, j FROM ec UNION ALL SELECT i, j FROM st
        |    UNION ALL SELECT i, j FROM nc UNION ALL SELECT i, j FROM nw)),
        |enodes AS (SELECT DISTINCT u AS node FROM esym),
        |${oUnrolledCcCtes("a", "enodes", "esym")}
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE doc_id % 2 = 0) AS n_corpus_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE doc_id % 2 = 0)
        |    AS n_corpus_sigs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE doc_id % 2 = 1) AS n_batch_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE doc_id % 2 = 1)
        |    AS n_batch_sigs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ec) AS n_exact_cross,
        |  (SELECT CAST(count(*) AS BIGINT) FROM st) AS n_exact_star,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nc) AS n_near_cross,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nw) AS n_near_within,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE doc_id % 2 = 1)
        |    - (SELECT CAST(count(*) AS BIGINT) FROM alab
        |       WHERE node % 2 = 1 AND component <> node)
        |    + (SELECT poison FROM achg) AS n_survivors
        |ORDER BY n_corpus_rows""".stripMargin,

    // TIFF/EXIF headers: pure doc_id arithmetic — sizes from the fixed
    // container layouts, the rotation gate's display dims swapped when
    // orientation is in the 90°-family (5..8).
    "q344_tiff_exif" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS m,
        |    CAST(doc_id % 991 + 1 AS BIGINT) AS w,
        |    CAST((doc_id * 7) % 737 + 1 AS BIGINT) AS h,
        |    CAST((doc_id // 4) % 8 + 1 AS BIGINT) AS o
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, m, w, h, o,
        |    CASE WHEN o >= 5 THEN h ELSE w END AS dw,
        |    CASE WHEN o >= 5 THEN w ELSE h END AS dh
        |  FROM d)
        |SELECT doc_id,
        |  CAST(CASE m WHEN 0 THEN 62 WHEN 1 THEN 68 WHEN 2 THEN 59
        |    ELSE CASE WHEN doc_id % 8 = 3 THEN 12 ELSE 62 END END
        |    AS BIGINT) AS n_bytes,
        |  CASE WHEN m = 2 THEN 'jpeg' WHEN m < 2 THEN 'tiff' END
        |    AS format,
        |  CASE WHEN m < 3 THEN w END AS width,
        |  CASE WHEN m < 3 THEN h END AS height,
        |  CASE WHEN m < 3 THEN CASE WHEN m = 2 THEN CAST(8 AS BIGINT)
        |    ELSE CAST([1,2,4,8,16][CAST(doc_id % 5 AS INT) + 1]
        |      AS BIGINT) END END AS bit_depth,
        |  CASE WHEN m < 3 THEN o END AS orientation,
        |  CASE WHEN m < 3 THEN dw END AS disp_width,
        |  CASE WHEN m < 3 THEN dh END AS disp_height,
        |  CASE WHEN m < 3 THEN dw <= dh * 4 AND dh <= dw * 4 END
        |    AS aspect_ok
        |FROM v ORDER BY doc_id""".stripMargin,

    // PCM stats: the oracle replays the sample formulas over range(n)
    // — energy sums, full-scale-rail clip counts, and the edge-silence
    // runs as min/max over non-silent indices. Never touches a byte.
    "q345_pcm_stats" ->
      s"""$oPcmCtes
         |SELECT d.doc_id,
         |  CAST(CASE WHEN d.corrupt THEN 44 + d.n
         |    ELSE 44 + 2 * d.n END AS BIGINT) AS n_bytes,
         |  CASE WHEN NOT d.corrupt THEN 'pcm16' END AS codec,
         |  CASE WHEN NOT d.corrupt THEN CAST(d.rate AS BIGINT) END
         |    AS sample_rate,
         |  CASE WHEN NOT d.corrupt THEN CAST(1 AS BIGINT) END AS channels,
         |  CASE WHEN NOT d.corrupt THEN CAST(16 AS BIGINT) END AS bits,
         |  st.n_samples,
         |  CASE WHEN NOT d.corrupt
         |    THEN CAST(d.n * 1000 // d.rate AS BIGINT) END AS duration_ms,
         |  st.sum_q, st.sq_sum, st.n_clipped,
         |  st.lead_silence, st.trail_silence
         |FROM d LEFT JOIN st USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Audio pipeline verdict: the q345 CTEs closed to one aggregate —
    // rate window, clip ratio <= 1%, edge silence <= 20%.
    "q346_audio_pipeline" ->
      s"""$oPcmCtes,
         |v AS (
         |  SELECT d.doc_id, NOT d.corrupt AS parseable,
         |    d.rate BETWEEN 16000 AND 48000 AS rate_ok,
         |    st.n_clipped * 100 <= st.n_samples AS clip_ok,
         |    (st.lead_silence + st.trail_silence) * 5 <= st.n_samples
         |      AS sil_ok,
         |    d.n * 1000 // d.rate AS dur
         |  FROM d LEFT JOIN st USING (doc_id))
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(CASE WHEN parseable THEN 1 END) AS BIGINT)
         |    AS n_parseable,
         |  CAST(count(CASE WHEN parseable AND NOT rate_ok THEN 1 END)
         |    AS BIGINT) AS n_bad_rate,
         |  CAST(count(CASE WHEN parseable AND NOT clip_ok THEN 1 END)
         |    AS BIGINT) AS n_clipping,
         |  CAST(count(CASE WHEN parseable AND NOT sil_ok THEN 1 END)
         |    AS BIGINT) AS n_too_silent,
         |  CAST(count(CASE WHEN parseable AND rate_ok AND clip_ok
         |    AND sil_ok THEN 1 END) AS BIGINT) AS n_keep,
         |  CAST(coalesce(sum(CASE WHEN parseable AND rate_ok AND clip_ok
         |    AND sil_ok THEN dur END), 0) AS BIGINT) AS keep_duration_ms,
         |  count(CASE WHEN parseable AND rate_ok AND clip_ok AND sil_ok
         |    THEN 1 END) > 0 AS ship
         |FROM v ORDER BY n_docs""".stripMargin,

    "q347_viterbi_bytefallback" ->
      oViterbiByteFallbackSql(viterbiScoredVocab, viterbiByteScoreQ,
        7L, byteFallbackWord),

    // Composed graph health-check: the q281 + q269 + q251 oracle CTEs
    // over ONE shared sym edge table, closed to a single verdict row.
    "q348_graph_pipeline" -> oGraphPipelineSql,

    // The bucketed-edge-table twin grades against the IDENTICAL SQL:
    // the driver's hash compare IS the cached-vs-materialized identity
    // proof.
    "q371_bucketed_graph" -> oGraphPipelineSql,

    // G.711 stats: the oracle replays the CCITT expansion formulas —
    // μ-law via the complemented byte's mantissa/exponent fields,
    // A-law via the xor-0x55 segment table — in pure CASE arithmetic
    // over range(n), then the q345 statistic shapes.
    "q350_g711_stats" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 90 + 30 AS n, doc_id % 2 = 0 AS mu
        |  FROM documents),
        |sm AS (
        |  SELECT doc_id, mu, i, (i * 37 + doc_id * 11) % 256 AS c
        |  FROM (SELECT doc_id, n, mu, unnest(range(n)) AS i FROM d)),
        |dec AS (
        |  SELECT doc_id, mu, i,
        |    CASE WHEN mu THEN
        |      CASE WHEN 255 - c >= 128
        |        THEN 132 - (((255 - c) % 16) * 8 + 132) *
        |          ([1,2,4,8,16,32,64,128]
        |            [CAST(((255 - c) // 16) % 8 AS INT) + 1])
        |        ELSE (((255 - c) % 16) * 8 + 132) *
        |          ([1,2,4,8,16,32,64,128]
        |            [CAST(((255 - c) // 16) % 8 AS INT) + 1]) - 132
        |      END
        |    ELSE
        |      (CASE WHEN xor(c, 85) >= 128 THEN 1 ELSE -1 END) *
        |      (CASE WHEN (xor(c, 85) // 16) % 8 = 0
        |         THEN (xor(c, 85) % 16) * 16 + 8
        |       WHEN (xor(c, 85) // 16) % 8 = 1
        |         THEN (xor(c, 85) % 16) * 16 + 264
        |       ELSE ((xor(c, 85) % 16) * 16 + 264) *
        |         ([2,4,8,16,32,64]
        |           [CAST((xor(c, 85) // 16) % 8 AS INT) - 1])
        |       END)
        |    END AS v
        |  FROM sm),
        |st AS (
        |  SELECT doc_id,
        |    CAST(sum(v) AS BIGINT) AS sum_q,
        |    CAST(sum(v * v) AS BIGINT) AS sq_sum,
        |    CAST(count(CASE WHEN (mu AND abs(v) = 32124)
        |      OR (NOT mu AND abs(v) = 32256) THEN 1 END) AS BIGINT)
        |      AS n_clipped,
        |    CAST(coalesce(min(CASE WHEN abs(v) > 256 THEN i END),
        |      max(i) + 1) AS BIGINT) AS lead_silence,
        |    CAST(coalesce(max(i) - max(CASE WHEN abs(v) > 256 THEN i END),
        |      max(i) + 1) AS BIGINT) AS trail_silence
        |  FROM dec GROUP BY 1)
        |SELECT d.doc_id, CAST(44 + d.n AS BIGINT) AS n_bytes,
        |  CASE WHEN d.mu THEN 'ulaw' ELSE 'alaw' END AS codec,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(d.n AS BIGINT) AS n_samples,
        |  CAST(d.n * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  st.sum_q, st.sq_sum, st.n_clipped,
        |  st.lead_silence, st.trail_silence
        |FROM d JOIN st USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // GIF pixels: q342's RGB-luminance arithmetic over the palette
    // indices — the oracle never touches a byte of the LZW stream.
    "q351_gif_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 24 + 9 AS w, (doc_id * 5) % 24 + 8 AS h,
        |    doc_id % 10 = 7 AS corrupt
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y,
        |    299 * u.p + 587 * ((u.p * 3) % 256)
        |      + 114 * ((u.p * 5) % 256) AS lum
        |  FROM (
        |    SELECT doc_id, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + doc_id % 31) * (y + doc_id % 37) * 3
        |                 + doc_id) % 256})))) AS u
        |    FROM d WHERE NOT corrupt)),
        |st AS (
        |  SELECT doc_id, CAST(sum(lum) AS BIGINT) AS lum_sum,
        |    CAST(sum(lum * lum) AS BIGINT) AS lum_sq_sum
        |  FROM lum GROUP BY 1),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |dh AS (
        |  SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(k AS INT)) AS hraw
        |  FROM bits GROUP BY 1)
        |SELECT d.doc_id,
        |  CASE WHEN NOT d.corrupt THEN 'gif' END AS format,
        |  CASE WHEN NOT d.corrupt THEN CAST(d.w AS BIGINT) END AS width,
        |  CASE WHEN NOT d.corrupt THEN CAST(d.h AS BIGINT) END AS height,
        |  CASE WHEN NOT d.corrupt THEN CAST(3 AS BIGINT) END AS channels,
        |  CASE WHEN NOT d.corrupt THEN CAST(d.w * d.h AS BIGINT) END
        |    AS n_pixels,
        |  st.lum_sum, st.lum_sq_sum,
        |  CASE WHEN NOT d.corrupt THEN CAST(coalesce(dh.hraw, 0)
        |    - CASE WHEN coalesce(dh.hraw, 0) >= 9223372036854775808
        |        THEN 18446744073709551616 ELSE 0 END AS BIGINT) END
        |    AS dhash
        |FROM d LEFT JOIN st USING (doc_id) LEFT JOIN dh USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Image dedup pipeline: the q343 dHash CTEs + all-pairs Hamming
    // (pigeonhole makes the engine's banding exact at this radius) +
    // recursive min-label CC flood, closed to one verdict row.
    "q349_image_dedup_pipeline" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id - (doc_id % 2) AS pid,
        |    doc_id % 2 = 1 AS edited,
        |    (doc_id - (doc_id % 2)) % 24 + 9 AS w,
        |    ((doc_id - (doc_id % 2)) * 5) % 24 + 8 AS h
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y,
        |    (CASE WHEN edited AND u.x = 0 AND u.y = 0
        |      THEN (((u.x + pid % 31) * (u.y + pid % 37) * 3 + pid)
        |            % 256 + 128) % 256
        |      ELSE ((u.x + pid % 31) * (u.y + pid % 37) * 3 + pid)
        |           % 256 END) * 1000 AS lum
        |  FROM (
        |    SELECT doc_id, pid, edited, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |    FROM d)),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(dh.hraw, 0)
        |      - CASE WHEN coalesce(dh.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id,
        |      sum(CAST(1 AS HUGEINT) << CAST(k AS INT)) AS hraw
        |    FROM bits GROUP BY 1) dh USING (doc_id)),
        |p AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 2),
        |symp AS (SELECT i AS u, j AS v FROM p UNION ALL SELECT j, i FROM p),
        |pn AS (SELECT DISTINCT u AS node FROM symp),
        |r(node, comp) AS (
        |  SELECT node, node FROM pn
        |  UNION
        |  SELECT e.v, r.comp FROM r JOIN symp e ON e.u = r.node),
        |l AS (SELECT node, min(comp) AS component FROM r GROUP BY 1),
        |ca AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(count(DISTINCT component) AS BIGINT) AS n_clusters
        |  FROM l)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM sig) AS n_images,
        |  (SELECT CAST(count(dhash) AS BIGINT) FROM sig) AS n_decoded,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs,
        |  ca.n_members, ca.n_clusters,
        |  ca.n_members - ca.n_clusters AS n_dup_excess,
        |  (SELECT count(dhash) FROM sig) > 0
        |    AND ca.n_members - ca.n_clusters >= 0 AS ship
        |FROM ca ORDER BY n_images""".stripMargin,

    // Video headers: pure doc_id arithmetic — container sizes from the
    // fixed box/chunk layouts, duration_ms by integer division exactly
    // as the kernels compute it.
    "q352_video_headers" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 5 AS m,
        |    doc_id % 16 + 12 AS aw, (doc_id * 3) % 12 + 8 AS ah,
        |    doc_id % 6 + 4 AS af, doc_id % 30 + 10 AS ams,
        |    doc_id % 1800 + 2 AS mw, (doc_id * 7) % 1000 + 2 AS mh,
        |    (doc_id % 29 + 1) * 1000 AS ts, doc_id % 9000 + 1000 AS dur,
        |    doc_id % 200 + 10 AS mf,
        |    ['avc1','hev1','mp4v'][CAST(doc_id % 3 AS INT) + 1] AS mc
        |  FROM documents),
        |v AS (SELECT *, ((3 * aw + 3) // 4) * 4 * ah AS fb FROM d)
        |SELECT doc_id,
        |  CAST(CASE WHEN m = 0 THEN 224 + af * (8 + fb)
        |    WHEN m = 1 THEN 308 WHEN m = 2 THEN 332 WHEN m = 3 THEN 408
        |    ELSE CASE WHEN doc_id % 2 = 1 THEN 30 ELSE 308 END END
        |    AS BIGINT) AS n_bytes,
        |  CASE WHEN m = 0 THEN 'avi' WHEN m < 4 THEN 'mp4' END AS format,
        |  CASE WHEN m = 0 THEN CAST(aw AS BIGINT)
        |    WHEN m < 4 THEN CAST(mw AS BIGINT) END AS width,
        |  CASE WHEN m = 0 THEN CAST(ah AS BIGINT)
        |    WHEN m < 4 THEN CAST(mh AS BIGINT) END AS height,
        |  CASE WHEN m = 0 THEN CAST(af * ams AS BIGINT)
        |    WHEN m < 4 THEN CAST(dur * 1000 // ts AS BIGINT) END
        |    AS duration_ms,
        |  CASE WHEN m = 0 THEN CAST(af AS BIGINT)
        |    WHEN m < 4 THEN CAST(mf AS BIGINT) END AS n_frames,
        |  CASE WHEN m = 0 THEN 'dib' WHEN m < 4 THEN mc END AS codec
        |FROM v ORDER BY doc_id""".stripMargin,

    // Video frames: the q342 dHash CTE discipline PER SAMPLED FRAME —
    // the oracle replays every second frame's pixels from the fixture
    // formula and re-derives the 9×8-grid dHash; the %10==7 truncated
    // docs yield no frame rows on either side.
    "q353_video_frames" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 16 + 12 AS w, (doc_id * 3) % 12 + 8 AS h,
        |    doc_id % 6 + 4 AS nf
        |  FROM documents WHERE doc_id % 10 <> 7),
        |fr AS (SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS f FROM d),
        |lum AS (
        |  SELECT doc_id, f, w, h, u.x AS x, u.y AS y,
        |    299 * u.p + 587 * ((u.p * 3) % 256)
        |      + 114 * ((u.p * 5) % 256) AS lum
        |  FROM (
        |    SELECT doc_id, f, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + doc_id % 29) * (y + doc_id % 23)
        |                 + 17 * f + doc_id) % 256})))) AS u
        |    FROM fr)),
        |st AS (
        |  SELECT doc_id, f, CAST(sum(lum) AS BIGINT) AS lum_sum,
        |    CAST(sum(lum * lum) AS BIGINT) AS lum_sq_sum
        |  FROM lum GROUP BY 1, 2),
        |cells AS (
        |  SELECT doc_id, f, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT a.doc_id, a.f, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.f = b.f AND b.cy = a.cy
        |      AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |dh AS (
        |  SELECT doc_id, f, sum(CAST(1 AS HUGEINT) << CAST(k AS INT))
        |    AS hraw
        |  FROM bits GROUP BY 1, 2)
        |SELECT st.doc_id, CAST(st.f AS BIGINT) AS frame_idx,
        |  st.lum_sum, st.lum_sq_sum,
        |  CAST(coalesce(dh.hraw, 0)
        |    - CASE WHEN coalesce(dh.hraw, 0) >= 9223372036854775808
        |        THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS dhash
        |FROM st LEFT JOIN dh USING (doc_id, f)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // Pixel resize: the q342 lum CTE + the 4×4 integer cell partition
    // (⌊4x/W⌋, ⌊4y/H⌋, floor-average) — plain division, never a byte.
    "q354_pixel_resize" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 3 AS m, doc_id % 24 + 9 AS w,
        |    (doc_id * 5) % 24 + 8 AS h
        |  FROM documents WHERE doc_id % 10 <> 7),
        |lum AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y,
        |    CASE WHEN m = 0 THEN u.p * 1000
        |      ELSE 299 * u.p + 587 * ((u.p * 3) % 256)
        |        + 114 * ((u.p * 5) % 256) END AS lum
        |  FROM (
        |    SELECT doc_id, m, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + doc_id % 31) * (y + doc_id % 37) * 3
        |                 + doc_id) % 256})))) AS u
        |    FROM d))
        |SELECT doc_id,
        |  CAST(((4 * y) // h) * 4 + (4 * x) // w AS INT) AS cell,
        |  CAST(sum(lum) // count(*) AS BIGINT) AS cell_lum
        |FROM lum GROUP BY 1, 2 ORDER BY doc_id, cell""".stripMargin,

    // MP3 headers: the public Layer III tables as SQL literals; frame
    // sizes, the per-frame padding-bit count, and the ID3v2 preamble
    // length re-derived arithmetically. (The ID3 slice %4==1 is always
    // odd, so its synchsafe size doc_id%50 is never zero.)
    "q355_mp3_headers" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 9 + 3 AS n,
        |    [32,40,48,56,64,80,96,112,128,160,192,224,256,320]
        |      [CAST(doc_id % 14 AS INT) + 1] AS kbps,
        |    [44100,48000,32000][CAST(doc_id % 3 AS INT) + 1] AS rate,
        |    CASE WHEN doc_id % 4 = 1 THEN 10 + doc_id % 50 ELSE 0 END
        |      AS id3,
        |    doc_id % 10 = 6 AS corrupt
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, n, kbps, rate, id3, corrupt,
        |    kbps * 144000 // rate AS fs,
        |    n // 2 + (n % 2) * (doc_id % 2) AS npad
        |  FROM d)
        |SELECT doc_id,
        |  CAST(id3 + n * fs + npad
        |    - CASE WHEN corrupt THEN 3 ELSE 0 END AS BIGINT) AS n_bytes,
        |  CASE WHEN NOT corrupt THEN CAST(rate AS BIGINT) END
        |    AS sample_rate,
        |  CASE WHEN NOT corrupt THEN CAST(CASE WHEN doc_id % 2 = 0
        |    THEN 1 ELSE 2 END AS BIGINT) END AS channels,
        |  CASE WHEN NOT corrupt THEN CAST(n AS BIGINT) END AS n_frames,
        |  CASE WHEN NOT corrupt THEN CAST(n * 1152 * 1000 // rate
        |    AS BIGINT) END AS duration_ms,
        |  CASE WHEN NOT corrupt THEN CAST(kbps AS BIGINT) END
        |    AS bitrate_kbps
        |FROM v ORDER BY doc_id""".stripMargin,

    // Video pipeline: header-gate arithmetic + the q353 per-frame
    // dHash CTEs restricted to keepers + a lag() scene-change count,
    // closed to one verdict row.
    "q356_video_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 16 + 12 AS w, (doc_id * 3) % 12 + 8 AS h,
        |    doc_id % 6 + 4 AS nf,
        |    (doc_id % 6 + 4) * (doc_id % 30 + 10) AS dur,
        |    doc_id % 10 <> 7 AS ok
        |  FROM documents),
        |g AS (
        |  SELECT *, ok AND w >= 16 AND h >= 10 AND dur >= 100 AS keep
        |  FROM d),
        |gates AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(CASE WHEN ok THEN 1 END) AS BIGINT)
        |      AS n_parseable,
        |    CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_keep,
        |    CAST(coalesce(sum(CASE WHEN keep THEN dur END), 0)
        |      AS BIGINT) AS keep_duration_ms
        |  FROM g),
        |fr AS (
        |  SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS f
        |  FROM g WHERE keep),
        |lum AS (
        |  SELECT doc_id, f, w, h, u.x AS x, u.y AS y,
        |    299 * u.p + 587 * ((u.p * 3) % 256)
        |      + 114 * ((u.p * 5) % 256) AS lum
        |  FROM (
        |    SELECT doc_id, f, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + doc_id % 29) * (y + doc_id % 23)
        |                 + 17 * f + doc_id) % 256})))) AS u
        |    FROM fr)),
        |cells AS (
        |  SELECT doc_id, f, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT a.doc_id, a.f, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.f = b.f AND b.cy = a.cy
        |      AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |dh AS (
        |  SELECT fr.doc_id, fr.f,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM fr LEFT JOIN (
        |    SELECT doc_id, f, sum(CAST(1 AS HUGEINT) << CAST(k AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1, 2) x
        |    ON x.doc_id = fr.doc_id AND x.f = fr.f),
        |lagged AS (
        |  SELECT doc_id, dhash,
        |    lag(dhash) OVER (PARTITION BY doc_id ORDER BY f) AS prev
        |  FROM dh),
        |scenes AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_frames_sampled,
        |    CAST(count(CASE WHEN bit_count(xor(dhash, prev)) > 16
        |      THEN 1 END) AS BIGINT) AS n_scene_changes
        |  FROM lagged)
        |SELECT gates.n_docs, gates.n_parseable, gates.n_keep,
        |  gates.keep_duration_ms, scenes.n_frames_sampled,
        |  scenes.n_scene_changes, gates.n_keep > 0 AS ship
        |FROM gates, scenes ORDER BY n_docs""".stripMargin,

    // Cross-modal match: one dHash table over every (video s, frame f)
    // either side needs — all frames of even docs (the corpus) plus
    // frame f* of odd docs' predecessors (the probes; computed even
    // when the predecessor video is truncated, since the STILL's
    // pixels exist regardless) — then the full probe×corpus Hamming
    // join (band recall is pigeonhole-exact at radius 1).
    "q357_crossmodal_match" ->
      """WITH p2 AS (
        |  SELECT doc_id AS s, unnest(range(doc_id % 6 + 4)) AS f
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION
        |  SELECT doc_id - 1 AS s,
        |    ((doc_id - 1) // 2) % ((doc_id - 1) % 6 + 4) AS f
        |  FROM documents WHERE doc_id % 2 = 1),
        |pp AS (
        |  SELECT s, f, s % 16 + 12 AS w, (s * 3) % 12 + 8 AS h FROM p2),
        |lum AS (
        |  SELECT s, f, w, h, u.x AS x, u.y AS y,
        |    299 * u.p + 587 * ((u.p * 3) % 256)
        |      + 114 * ((u.p * 5) % 256) AS lum
        |  FROM (
        |    SELECT s, f, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + s % 29) * (y + s % 23)
        |                 + 17 * f + s) % 256})))) AS u
        |    FROM pp)),
        |cells AS (
        |  SELECT s, f, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT a.s, a.f, a.cy * 8 + a.cx AS k
        |  FROM cells a JOIN cells b
        |    ON a.s = b.s AND a.f = b.f AND b.cy = a.cy
        |      AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |dh AS (
        |  SELECT pp.s, pp.f,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM pp LEFT JOIN (
        |    SELECT s, f, sum(CAST(1 AS HUGEINT) << CAST(k AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1, 2) x ON x.s = pp.s AND x.f = pp.f),
        |imgs AS (
        |  SELECT d.doc_id AS img_doc, dh.dhash
        |  FROM documents d JOIN dh ON dh.s = d.doc_id - 1
        |    AND dh.f = ((d.doc_id - 1) // 2) % ((d.doc_id - 1) % 6 + 4)
        |  WHERE d.doc_id % 2 = 1),
        |frames AS (
        |  SELECT d.doc_id AS vid_doc, dh.f, dh.dhash
        |  FROM documents d JOIN dh ON dh.s = d.doc_id
        |  WHERE d.doc_id % 2 = 0 AND d.doc_id % 10 <> 4)
        |SELECT i.img_doc, fr.vid_doc, CAST(fr.f AS BIGINT) AS frame_idx,
        |  CAST(bit_count(xor(i.dhash, fr.dhash)) AS BIGINT) AS hamming
        |FROM imgs i JOIN frames fr
        |  ON bit_count(xor(i.dhash, fr.dhash)) <= 1
        |ORDER BY img_doc, vid_doc, frame_idx""".stripMargin,

    // Matroska headers: pure doc_id arithmetic — element sizes from
    // the fixed EBML layout (1-byte size varints, the Segment's
    // 2-byte), duration_ms = d·(id%4+1) since the planted float
    // durations are exact integers.
    "q358_mkv_headers" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 < 2 THEN 7 ELSE 11 END AS hlen,
        |    CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 8 END AS dlen,
        |    [5, 5, 15][CAST(doc_id % 3 AS INT) + 1] AS clen,
        |    CASE WHEN doc_id % 3 = 0 THEN 13 ELSE 0 END AS alen,
        |    doc_id % 7 = 5 AS corrupt
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN corrupt THEN 20
        |    ELSE 5 + hlen + 6 + 10 + (11 + dlen) + (alen + 17 + clen)
        |    END AS BIGINT) AS n_bytes,
        |  CASE WHEN NOT corrupt THEN
        |    CASE WHEN doc_id % 4 < 2 THEN 'webm' ELSE 'matroska' END
        |    END AS format,
        |  CASE WHEN NOT corrupt THEN CAST(doc_id % 1800 + 2 AS BIGINT)
        |    END AS width,
        |  CASE WHEN NOT corrupt THEN
        |    CAST((doc_id * 7) % 1000 + 2 AS BIGINT) END AS height,
        |  CASE WHEN NOT corrupt THEN
        |    CAST((doc_id % 5000 + 100) * (doc_id % 4 + 1) AS BIGINT)
        |    END AS duration_ms,
        |  CASE WHEN NOT corrupt THEN CAST(0 AS BIGINT) END AS n_frames,
        |  CASE WHEN NOT corrupt THEN
        |    ['V_VP9', 'V_AV1', 'V_MPEG4/ISO/AVC']
        |      [CAST(doc_id % 3 AS INT) + 1] END AS codec
        |FROM d ORDER BY doc_id""".stripMargin,

    // Tar members: the archive layout replayed as arithmetic — member
    // sizes from the q342 BMP size formula and the txt token count,
    // offsets as the windowed cumulative 512-padded block sum.
    "q359_tar_members" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS s
        |  FROM documents WHERE doc_id % 9 <> 8),
        |mem AS (
        |  SELECT doc_id, u.j AS j, u.name AS name, u.size AS size
        |  FROM (
        |    SELECT doc_id, unnest(flatten(list_transform(range(s),
        |      k -> [
        |        {'j': 2 * k,
        |         'name': CAST(doc_id AS VARCHAR) || '_'
        |           || CAST(k AS VARCHAR) || '.bmp',
        |         'size': 54 + (((4 * doc_id + k) * 5) % 24 + 8)
        |           * (((3 * ((4 * doc_id + k) % 24 + 9) + 3) // 4) * 4)},
        |        {'j': 2 * k + 1,
        |         'name': CAST(doc_id AS VARCHAR) || '_'
        |           || CAST(k AS VARCHAR) || '.txt',
        |         'size': 2 * ((doc_id + k) % 7 + 1) - 1}]))) AS u
        |    FROM d)),
        |off AS (
        |  SELECT doc_id, j, name, size,
        |    512 * (j + 1) + coalesce(sum((size + 511) // 512 * 512)
        |      OVER (PARTITION BY doc_id ORDER BY j
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS off
        |  FROM mem),
        |tot AS (
        |  SELECT doc_id,
        |    CAST(sum(512 + (size + 511) // 512 * 512) + 1024 AS BIGINT)
        |      AS n_bytes
        |  FROM mem GROUP BY 1)
        |SELECT o.doc_id, tot.n_bytes, o.name,
        |  CAST(o.off AS BIGINT) AS "offset",
        |  CAST(o.size AS BIGINT) AS size
        |FROM off o JOIN tot USING (doc_id)
        |ORDER BY doc_id, "offset"""".stripMargin,

    // WebDataset pipeline: per-sample pixel statistics re-derived from
    // the BMP pixel formula (s' = 4·doc + k — the q342 lum/dHash CTEs)
    // joined to the arithmetic token count; offsets never appear — the
    // engine's slices are proven by the stats matching.
    "q360_webdataset_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS s
        |  FROM documents WHERE doc_id % 9 <> 8),
        |sm AS (
        |  SELECT doc_id, unnest(range(s)) AS k FROM d),
        |pp AS (
        |  SELECT doc_id, k, 4 * doc_id + k AS sp,
        |    (4 * doc_id + k) % 24 + 9 AS w,
        |    ((4 * doc_id + k) * 5) % 24 + 8 AS h
        |  FROM sm),
        |lum AS (
        |  SELECT doc_id, k, w, h, u.x AS x, u.y AS y,
        |    299 * u.p + 587 * ((u.p * 3) % 256)
        |      + 114 * ((u.p * 5) % 256) AS lum
        |  FROM (
        |    SELECT doc_id, k, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + sp % 31) * (y + sp % 37) * 3 + sp)
        |                % 256})))) AS u
        |    FROM pp)),
        |st AS (
        |  SELECT doc_id, k, CAST(sum(lum) AS BIGINT) AS lum_sum
        |  FROM lum GROUP BY 1, 2),
        |cells AS (
        |  SELECT doc_id, k, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT a.doc_id, a.k, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.k = b.k AND b.cy = a.cy
        |      AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |dh AS (
        |  SELECT pp.doc_id, pp.k,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM pp LEFT JOIN (
        |    SELECT doc_id, k, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1, 2) x
        |    ON x.doc_id = pp.doc_id AND x.k = pp.k)
        |SELECT pp.doc_id, CAST(pp.k AS BIGINT) AS sample,
        |  CAST(pp.w AS BIGINT) AS width, CAST(pp.h AS BIGINT) AS height,
        |  st.lum_sum, dh.dhash,
        |  CAST((pp.doc_id + pp.k) % 7 + 1 AS BIGINT) AS n_tokens,
        |  pp.w >= 12 AND (pp.doc_id + pp.k) % 7 + 1 >= 3 AS keep
        |FROM pp JOIN st ON st.doc_id = pp.doc_id AND st.k = pp.k
        |JOIN dh ON dh.doc_id = pp.doc_id AND dh.k = pp.k
        |ORDER BY pp.doc_id, sample""".stripMargin,

    // Gzip decode: frame sizes are arithmetic — 23 bytes of overhead
    // per plain member (10 header + 5 stored-block + 8 trailer), +6
    // for the planted FNAME, ×2 members on the concatenation slice.
    "q361_gzip_decode" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 40 + 1 AS n,
        |    2 * (doc_id % 40 + 1) - 1 AS sz,
        |    doc_id % 10 = 3 AS corrupt
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 6 = 5 THEN 46 + sz
        |    WHEN doc_id % 4 = 2 THEN 29 + sz
        |    ELSE 23 + sz END AS BIGINT) AS gz_bytes,
        |  CASE WHEN NOT corrupt THEN CAST(sz AS BIGINT) END AS n_bytes,
        |  CASE WHEN NOT corrupt THEN CAST(n AS BIGINT) END AS n_tokens
        |FROM d ORDER BY doc_id""".stripMargin,

    // .tar.gz chain: the q359 layout arithmetic behind a 23-byte gzip
    // envelope, minus both corruption slices (gzip-level %11==7 and
    // the in-envelope tar truncation %9==8).
    "q362_webdataset_gz" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS s
        |  FROM documents WHERE doc_id % 9 <> 8 AND doc_id % 11 <> 7),
        |mem AS (
        |  SELECT doc_id, u.j AS j, u.name AS name, u.size AS size
        |  FROM (
        |    SELECT doc_id, unnest(flatten(list_transform(range(s),
        |      k -> [
        |        {'j': 2 * k,
        |         'name': CAST(doc_id AS VARCHAR) || '_'
        |           || CAST(k AS VARCHAR) || '.bmp',
        |         'size': 54 + (((4 * doc_id + k) * 5) % 24 + 8)
        |           * (((3 * ((4 * doc_id + k) % 24 + 9) + 3) // 4) * 4)},
        |        {'j': 2 * k + 1,
        |         'name': CAST(doc_id AS VARCHAR) || '_'
        |           || CAST(k AS VARCHAR) || '.txt',
        |         'size': 2 * ((doc_id + k) % 7 + 1) - 1}]))) AS u
        |    FROM d)),
        |off AS (
        |  SELECT doc_id, j, name, size,
        |    512 * (j + 1) + coalesce(sum((size + 511) // 512 * 512)
        |      OVER (PARTITION BY doc_id ORDER BY j
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS off
        |  FROM mem),
        |tot AS (
        |  SELECT doc_id,
        |    CAST(sum(512 + (size + 511) // 512 * 512) + 1024 AS BIGINT)
        |      AS tar_bytes
        |  FROM mem GROUP BY 1)
        |SELECT o.doc_id, CAST(tot.tar_bytes + 23 AS BIGINT) AS gz_bytes,
        |  o.name, CAST(o.off AS BIGINT) AS "offset",
        |  CAST(o.size AS BIGINT) AS size
        |FROM off o JOIN tot USING (doc_id)
        |ORDER BY doc_id, "offset"""".stripMargin,

    // Metadata strip: every size is layout arithmetic (the PNG's tEXt
    // chunk is 16 + digits-of-doc_id bytes; the JPEG's planted
    // Exif + COM total 44), orientation resets to 1, invariance TRUE
    // by the engine's own re-decode.
    "q363_metadata_strip" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 3 AS m,
        |    68 + ((doc_id * 5) % 24 + 8) * (1 + doc_id % 24 + 9)
        |      AS png_sz,
        |    doc_id % 8 + 1 AS o,
        |    length(CAST(doc_id AS VARCHAR)) AS dg
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN m = 0 THEN png_sz + 16 + dg
        |    WHEN m = 1 THEN 85 ELSE png_sz END AS BIGINT) AS n_bytes,
        |  CASE WHEN m = 0 THEN CAST(png_sz AS BIGINT)
        |    WHEN m = 1 THEN CAST(41 AS BIGINT) END AS stripped_bytes,
        |  CASE WHEN m = 0 THEN 'png' WHEN m = 1 THEN 'jpeg' END
        |    AS format,
        |  CASE WHEN m = 0 THEN CAST(1 AS BIGINT)
        |    WHEN m = 1 THEN CAST(o AS BIGINT) END AS orientation_before,
        |  CASE WHEN m < 2 THEN CAST(1 AS BIGINT) END
        |    AS orientation_after,
        |  CASE WHEN m = 0 THEN CAST(16 + dg AS BIGINT)
        |    WHEN m = 1 THEN CAST(44 AS BIGINT) END AS meta_removed,
        |  CASE WHEN m < 2 THEN TRUE END AS pixels_invariant
        |FROM d ORDER BY doc_id""".stripMargin,

    // Zip members: the tight-packed layout replayed as arithmetic
    // (locals 30+nl, central entries 46+nl, EOCD 22; deflated csize =
    // usize + 5 for the one stored block) + the q360 pixel CTEs for
    // the stored .bmp content column.
    "q364_zip_members" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 3 + 2 AS s,
        |    length(CAST(doc_id AS VARCHAR)) + 6 AS nl
        |  FROM documents WHERE doc_id % 8 <> 6),
        |mem AS (
        |  SELECT doc_id, nl, u.j AS j, u.k AS k, u.name AS name,
        |    u.method AS method, u.csize AS csize, u.usize AS usize
        |  FROM (
        |    SELECT doc_id, nl, unnest(flatten(list_transform(range(s),
        |      k -> [
        |        {'j': 2 * k, 'k': k,
        |         'name': CAST(doc_id AS VARCHAR) || '_'
        |           || CAST(k AS VARCHAR) || '.bmp',
        |         'method': 0,
        |         'csize': 54 + (((4 * doc_id + k) * 5) % 24 + 8)
        |           * (((3 * ((4 * doc_id + k) % 24 + 9) + 3) // 4) * 4),
        |         'usize': 54 + (((4 * doc_id + k) * 5) % 24 + 8)
        |           * (((3 * ((4 * doc_id + k) % 24 + 9) + 3) // 4) * 4)},
        |        {'j': 2 * k + 1, 'k': k,
        |         'name': CAST(doc_id AS VARCHAR) || '_'
        |           || CAST(k AS VARCHAR) || '.txt',
        |         'method': 8,
        |         'csize': 2 * ((doc_id + k) % 7 + 1) - 1 + 5,
        |         'usize': 2 * ((doc_id + k) % 7 + 1) - 1}]))) AS u
        |    FROM d)),
        |off AS (
        |  SELECT *, coalesce(sum(30 + nl + csize)
        |      OVER (PARTITION BY doc_id ORDER BY j
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + 30 + nl AS dataoff
        |  FROM mem),
        |tot AS (
        |  SELECT doc_id, CAST(sum(30 + nl + csize) + sum(46 + nl) + 22
        |    AS BIGINT) AS n_bytes
        |  FROM mem GROUP BY 1),
        |pp AS (
        |  SELECT doc_id, k, 4 * doc_id + k AS sp,
        |    (4 * doc_id + k) % 24 + 9 AS w,
        |    ((4 * doc_id + k) * 5) % 24 + 8 AS h
        |  FROM (SELECT doc_id, unnest(range(s)) AS k FROM d)),
        |lum AS (
        |  SELECT doc_id, k,
        |    299 * u.p + 587 * ((u.p * 3) % 256)
        |      + 114 * ((u.p * 5) % 256) AS lum
        |  FROM (
        |    SELECT doc_id, k,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'p': ((x + sp % 31) * (y + sp % 37) * 3 + sp)
        |                % 256})))) AS u
        |    FROM pp)),
        |st AS (
        |  SELECT doc_id, k, CAST(sum(lum) AS BIGINT) AS lum_sum
        |  FROM lum GROUP BY 1, 2)
        |SELECT o.doc_id, tot.n_bytes, o.name,
        |  CAST(o.method AS BIGINT) AS method,
        |  CAST(o.dataoff AS BIGINT) AS "offset",
        |  CAST(o.csize AS BIGINT) AS csize,
        |  CAST(o.usize AS BIGINT) AS usize,
        |  CASE WHEN o.method = 8
        |    THEN CAST((o.doc_id + o.k) % 7 + 1 AS BIGINT)
        |    ELSE st.lum_sum END AS content_check
        |FROM off o JOIN tot USING (doc_id)
        |LEFT JOIN st ON st.doc_id = o.doc_id AND st.k = o.k
        |ORDER BY o.doc_id, "offset"""".stripMargin,

    // Shard dedup: every image dHash re-derived from pixel arithmetic
    // (sample 0's pixels come from the PAIR-shared s'), exact-match
    // pairs over the full image set, CC as the q349 recursive
    // min-label flood, one verdict row.
    "q365_shard_dedup_pipeline" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS s
        |  FROM documents WHERE doc_id % 10 <> 9),
        |pq AS (
        |  SELECT doc_id, k, sp, sp % 24 + 9 AS w, (sp * 5) % 24 + 8 AS h
        |  FROM (
        |    SELECT doc_id, k,
        |      CASE WHEN k = 0 THEN 4 * (doc_id - doc_id % 2)
        |        ELSE 4 * doc_id + k END AS sp
        |    FROM (SELECT doc_id, unnest(range(s)) AS k FROM d))),
        |lum AS (
        |  SELECT doc_id, k, w, h, u.x AS x, u.y AS y,
        |    299 * u.p + 587 * ((u.p * 3) % 256)
        |      + 114 * ((u.p * 5) % 256) AS lum
        |  FROM (
        |    SELECT doc_id, k, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x ->
        |          {'x': x, 'y': y,
        |           'p': ((x + sp % 31) * (y + sp % 37) * 3 + sp)
        |                % 256})))) AS u
        |    FROM pq)),
        |cells AS (
        |  SELECT doc_id, k, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT a.doc_id, a.k, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.k = b.k AND b.cy = a.cy
        |      AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT pq.doc_id * 8 + pq.k AS img_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM pq LEFT JOIN (
        |    SELECT doc_id, k, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1, 2) x
        |    ON x.doc_id = pq.doc_id AND x.k = pq.k),
        |p AS (
        |  SELECT a.img_id AS i, b.img_id AS j
        |  FROM sig a JOIN sig b
        |    ON a.img_id < b.img_id AND a.dhash = b.dhash),
        |symp AS (SELECT i AS u, j AS v FROM p UNION SELECT j, i FROM p),
        |pn AS (SELECT DISTINCT u AS node FROM symp),
        |r(node, comp) AS (
        |  SELECT node, node FROM pn
        |  UNION
        |  SELECT e.v, r.comp FROM r JOIN symp e ON e.u = r.node),
        |l AS (SELECT node, min(comp) AS component FROM r GROUP BY 1),
        |ca AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(count(DISTINCT component) AS BIGINT) AS n_clusters
        |  FROM l)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_shards,
        |  (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_parseable,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig) AS n_images,
        |  (SELECT CAST(count(dhash) AS BIGINT) FROM sig) AS n_hashed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs,
        |  ca.n_members, ca.n_clusters,
        |  ca.n_members - ca.n_clusters AS n_dup_excess,
        |  (SELECT count(*) FROM d) > 0
        |    AND ca.n_members - ca.n_clusters >= 0 AS ship
        |FROM ca ORDER BY n_shards""".stripMargin,

    // Incremental image dedup: dHashes re-derived from pixel
    // arithmetic (q365's pipeline with q366's sp plan: sample 0 pair-
    // shared, sample 1 shared across odd (4m+1, 4m+3) pairs, sample
    // count doc%3+2), split even→corpus / odd→batch, exact-match cross
    // and within pair sets, keepCanonical over the batch (component ≠
    // id drops), survivors appended to the corpus signature table.
    "q366_incremental_image_dedup" -> oIncrementalImageDedupSql,

    // The bucketed pre-banded signature-table twin grades against the
    // IDENTICAL SQL: the driver's hash compare IS the session-built
    // vs published-artifact identity proof (the q348/q371 pattern).
    "q373_bucketed_image_dedup" -> oIncrementalImageDedupSql,

    // Audio perceptual dedup: every doc's linear samples replayed
    // arithmetically (μ-law expansion as the public CCITT formula in
    // CASE arithmetic for the v≤1 trio members, the per-doc ramp for
    // v=2), 65-window abs-energy envelope, sign bits to a
    // two's-complement BIGINT hash, brute-force Hamming ≤ 2 pairs, CC
    // flood, one verdict row.
    "q367_audio_dedup" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id // 3 AS f, doc_id % 3 AS v,
        |    (doc_id // 3) % 90 + 80 AS n
        |  FROM documents WHERE doc_id % 10 <> 9),
        |sm AS (
        |  SELECT doc_id, n, i,
        |    CASE WHEN v <= 1 THEN
        |      CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END
        |    ELSE (i * i * 1997 + i * 523
        |      + (doc_id % 251) * (i % 17) * 64
        |      + doc_id * 31) % 65536 - 32768
        |    END AS s
        |  FROM (
        |    SELECT doc_id, v, n, i, u,
        |      ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS t
        |    FROM (
        |      SELECT doc_id, v, n, i,
        |        255 - ((i * i * (f % 13 + 3) + i * 37
        |          + (f // 13) * (i % 11) + f * 11 + 1) % 256) AS u
        |      FROM (SELECT doc_id, f, v, n, unnest(range(n)) AS i
        |            FROM d)))),
        |we AS (
        |  SELECT doc_id, (65 * i) // n AS w, sum(abs(s)) AS e
        |  FROM sm GROUP BY 1, 2),
        |bits AS (
        |  SELECT a.doc_id, a.w AS t
        |  FROM we a JOIN we b ON b.doc_id = a.doc_id AND b.w = a.w + 1
        |  WHERE a.w < 64 AND b.e > a.e),
        |sig AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS ahash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(t AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1) x ON x.doc_id = d.doc_id),
        |p AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |    AND bit_count(xor(a.ahash, b.ahash)) <= 2),
        |symp AS (SELECT i AS u, j AS v FROM p UNION SELECT j, i FROM p),
        |pn AS (SELECT DISTINCT u AS node FROM symp),
        |r(node, comp) AS (
        |  SELECT node, node FROM pn
        |  UNION
        |  SELECT e.v, r.comp FROM r JOIN symp e ON e.u = r.node),
        |l AS (SELECT node, min(comp) AS component FROM r GROUP BY 1),
        |ca AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(count(DISTINCT component) AS BIGINT) AS n_clusters
        |  FROM l)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig) AS n_hashed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs,
        |  ca.n_members, ca.n_clusters,
        |  ca.n_members - ca.n_clusters AS n_dup_excess
        |FROM ca ORDER BY n_docs""".stripMargin,

    // PNG palette/alpha: stats re-derived from the shared pixel
    // arithmetic; palette luminance through the GIF-shared palette
    // formula (entry i = (i, 3i%256, 5i%256)); the corrupt variant's
    // NULL-ness decided by the replayed max-index predicate.
    "q368_png_palette_alpha" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS v,
        |    doc_id % 24 + 9 AS w, (doc_id * 5) % 24 + 8 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, v,
        |    ((u.x + doc_id % 31) * (u.y + doc_id % 37) * 3 + doc_id)
        |      % 256 AS p
        |  FROM (
        |    SELECT doc_id, v,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |    FROM d)),
        |lm AS (
        |  SELECT doc_id, v, p,
        |    CASE WHEN v = 1 THEN 1000 * p
        |      ELSE 299 * p + 587 * ((p * 3) % 256)
        |        + 114 * ((p * 5) % 256) END AS lum
        |  FROM px),
        |agg AS (
        |  SELECT doc_id, max(p) AS maxp,
        |    CAST(sum(lum) AS BIGINT) AS lum_sum,
        |    CAST(sum(lum * lum) AS BIGINT) AS lum_sq_sum
        |  FROM lm GROUP BY 1),
        |ok AS (
        |  SELECT d.doc_id, d.v, d.w, d.h, a.lum_sum, a.lum_sq_sum,
        |    d.doc_id % 10 <> 7 AND NOT (d.v = 3 AND a.maxp >= 64)
        |      AS parsed
        |  FROM d JOIN agg a USING (doc_id))
        |SELECT doc_id, parsed,
        |  CASE WHEN parsed THEN 'png' END AS format,
        |  CASE WHEN parsed THEN CAST(w AS BIGINT) END AS width,
        |  CASE WHEN parsed THEN CAST(h AS BIGINT) END AS height,
        |  CASE WHEN parsed THEN CAST(CASE v WHEN 0 THEN 3 WHEN 1 THEN 2
        |    WHEN 2 THEN 4 ELSE 3 END AS BIGINT) END AS channels,
        |  CASE WHEN parsed THEN CAST(w * h AS BIGINT) END AS n_pixels,
        |  CASE WHEN parsed THEN lum_sum END AS lum_sum,
        |  CASE WHEN parsed THEN lum_sq_sum END AS lum_sq_sum
        |FROM ok ORDER BY doc_id""".stripMargin,

    // PNG 16-bit + Adam7: the wire layout (depth, interlace) changes
    // NOTHING about the logical pixels — the oracle replays the shared
    // pixel arithmetic (gray 1000·p; RGB 299p+587(3p%256)+114(5p%256))
    // per pixel and re-derives sums + dHash; %10==7 truncation NULLs.
    "q377_png_deep_interlace" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS v,
        |    doc_id % 24 + 9 AS w, (doc_id * 5) % 24 + 8 AS h
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, x, y,
        |    CASE WHEN v IN (0, 2) THEN 1000 * p
        |      ELSE 299 * p + 587 * ((p * 3) % 256) + 114 * ((p * 5) % 256)
        |    END AS lum
        |  FROM (
        |    SELECT doc_id, v, w, h, u.x AS x, u.y AS y,
        |      ((u.x + doc_id % 31) * (u.y + doc_id % 37) * 3 + doc_id)
        |        % 256 AS p
        |    FROM (
        |      SELECT doc_id, v, w, h,
        |        unnest(flatten(list_transform(range(h), y ->
        |          list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |      FROM d))),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1) x ON x.doc_id = d.doc_id),
        |agg AS (
        |  SELECT doc_id, CAST(sum(lum) AS BIGINT) AS lum_sum,
        |    CAST(sum(lum * lum) AS BIGINT) AS lum_sq_sum
        |  FROM lum GROUP BY 1)
        |SELECT d.doc_id, d.doc_id % 10 <> 7 AS parsed,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN 'png' END AS format,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.w AS BIGINT) END
        |    AS width,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.h AS BIGINT) END
        |    AS height,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN
        |    CAST(CASE WHEN d.v IN (0, 2) THEN 1 ELSE 3 END AS BIGINT)
        |    END AS channels,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.w * d.h AS BIGINT)
        |    END AS n_pixels,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN a.lum_sum END AS lum_sum,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN a.lum_sq_sum END
        |    AS lum_sq_sum,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN s.dhash END AS dhash
        |FROM d JOIN agg a USING (doc_id) JOIN sig s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Sub-byte PNG: per-pixel lum from the depth's value mapping —
    // 1-bit (p%2)·255, 2-bit (p%4)·85, 4-bit (p%16)·17, palette
    // 4-bit via the shared palette arithmetic over index p%16.
    "q379_png_subbyte" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS v,
        |    doc_id % 24 + 9 AS w, (doc_id * 5) % 24 + 8 AS h
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, w, h, x, y,
        |    CASE v
        |      WHEN 0 THEN 1000 * ((p % 2) * 255)
        |      WHEN 1 THEN 1000 * ((p % 4) * 85)
        |      WHEN 2 THEN 1000 * ((p % 16) * 17)
        |      ELSE 299 * (p % 16) + 587 * ((p % 16) * 3 % 256)
        |        + 114 * ((p % 16) * 5 % 256)
        |    END AS lum
        |  FROM (
        |    SELECT doc_id, v, w, h, u.x AS x, u.y AS y,
        |      ((u.x + doc_id % 31) * (u.y + doc_id % 37) * 3 + doc_id)
        |        % 256 AS p
        |    FROM (
        |      SELECT doc_id, v, w, h,
        |        unnest(flatten(list_transform(range(h), y ->
        |          list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |      FROM d))),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1) x ON x.doc_id = d.doc_id),
        |agg AS (
        |  SELECT doc_id, CAST(sum(lum) AS BIGINT) AS lum_sum,
        |    CAST(sum(lum * lum) AS BIGINT) AS lum_sq_sum
        |  FROM lum GROUP BY 1)
        |SELECT d.doc_id, d.doc_id % 10 <> 7 AS parsed,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN 'png' END AS format,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.w AS BIGINT) END
        |    AS width,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.h AS BIGINT) END
        |    AS height,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN
        |    CAST(CASE WHEN d.v = 3 THEN 3 ELSE 1 END AS BIGINT)
        |    END AS channels,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.w * d.h AS BIGINT)
        |    END AS n_pixels,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN a.lum_sum END AS lum_sum,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN a.lum_sq_sum END
        |    AS lum_sq_sum,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN s.dhash END AS dhash
        |FROM d JOIN agg a USING (doc_id) JOIN sig s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // zstd hop: decoded-side columns only (compressed size is
    // encoder-dependent); corrupt = bitflip or truncation.
    "q369_zstd_decode" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 40 + 1 AS n,
        |    2 * (doc_id % 40 + 1) - 1 AS sz,
        |    doc_id % 10 = 3 OR doc_id % 11 = 7 AS corrupt
        |  FROM documents)
        |SELECT doc_id, NOT corrupt AS parsed,
        |  CASE WHEN NOT corrupt THEN CAST(sz AS BIGINT) END AS n_bytes,
        |  CASE WHEN NOT corrupt THEN CAST(n AS BIGINT) END AS n_tokens
        |FROM d ORDER BY doc_id""".stripMargin,

    // .tar.zst chain: the q362 member layout behind the zstd hop.
    "q370_webdataset_zst" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS s
        |  FROM documents WHERE doc_id % 9 <> 8 AND doc_id % 11 <> 7),
        |mem AS (
        |  SELECT doc_id, u.j AS j, u.name AS name, u.size AS size
        |  FROM (
        |    SELECT doc_id, unnest(flatten(list_transform(range(s),
        |      k -> [
        |        {'j': 2 * k,
        |         'name': CAST(doc_id AS VARCHAR) || '_'
        |           || CAST(k AS VARCHAR) || '.bmp',
        |         'size': 54 + (((4 * doc_id + k) * 5) % 24 + 8)
        |           * (((3 * ((4 * doc_id + k) % 24 + 9) + 3) // 4) * 4)},
        |        {'j': 2 * k + 1,
        |         'name': CAST(doc_id AS VARCHAR) || '_'
        |           || CAST(k AS VARCHAR) || '.txt',
        |         'size': 2 * ((doc_id + k) % 7 + 1) - 1}]))) AS u
        |    FROM d))
        |SELECT doc_id, name,
        |  CAST(512 * (j + 1) + coalesce(sum((size + 511) // 512 * 512)
        |    OVER (PARTITION BY doc_id ORDER BY j
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS "offset",
        |  CAST(size AS BIGINT) AS size
        |FROM mem ORDER BY doc_id, "offset"""".stripMargin,

    // JPEG pixels: DC-only blocks replay the pinned IDCT's closed form
    // per block (floor((dc·8·2096704 + 2^23)/2^24), clamped, +128);
    // per-pixel luminance is the block value, the dHash the q365 cell
    // flood over it. Gray, neutral-chroma color, and restart variants
    // share one luminance formula; %10==7 truncation is NULL.
    "q372_jpeg_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS v,
        |    doc_id % 24 + 9 AS w, (doc_id * 5) % 24 + 8 AS h
        |  FROM documents),
        |blk AS (
        |  SELECT doc_id, u.bx AS bx, u.by AS by,
        |    ((u.bx + doc_id % 31) * (u.by + doc_id % 37) * 3 + doc_id)
        |      % 256 - 128 AS dc
        |  FROM (
        |    SELECT doc_id,
        |      unnest(flatten(list_transform(range((h + 7) // 8), by ->
        |        list_transform(range((w + 7) // 8), bx ->
        |          {'bx': bx, 'by': by})))) AS u
        |    FROM d)),
        |bv AS (
        |  SELECT doc_id, bx, by,
        |    CASE WHEN f < -128 THEN 0 WHEN f > 127 THEN 255
        |      ELSE f + 128 END AS val
        |  FROM (
        |    SELECT doc_id, bx, by,
        |      CAST(floor((dc * 8 * 2096704 + 8388608) / 16777216.0)
        |        AS BIGINT) AS f
        |    FROM blk)),
        |px AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y
        |  FROM (
        |    SELECT doc_id, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |    FROM d)),
        |lum AS (
        |  SELECT p.doc_id, p.w, p.h, p.x, p.y, 1000 * b.val AS lum
        |  FROM px p JOIN bv b ON b.doc_id = p.doc_id
        |    AND b.bx = p.x // 8 AND b.by = p.y // 8),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1) x ON x.doc_id = d.doc_id),
        |agg AS (
        |  SELECT doc_id, CAST(sum(lum) AS BIGINT) AS lum_sum,
        |    CAST(sum(lum * lum) AS BIGINT) AS lum_sq_sum
        |  FROM lum GROUP BY 1)
        |SELECT d.doc_id, d.doc_id % 10 <> 7 AS parsed,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN 'jpeg' END AS format,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.w AS BIGINT) END
        |    AS width,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.h AS BIGINT) END
        |    AS height,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN
        |    CAST(CASE WHEN d.v IN (1, 3) THEN 3 ELSE 1 END AS BIGINT)
        |    END AS channels,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.w * d.h AS BIGINT)
        |    END AS n_pixels,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN a.lum_sum END AS lum_sum,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN a.lum_sq_sum END
        |    AS lum_sq_sum,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN s.dhash END AS dhash
        |FROM d JOIN agg a USING (doc_id) JOIN sig s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Progressive JPEG pixels: q372's replay with the AC base
    // functions live — per-pixel value is the pinned IDCT's three-term
    // closed form (DC + zigzag-1 horizontal + zigzag-20 vertical), the
    // K1/K5 basis rows inlined as literal lists. Small dims keep the
    // per-pixel CTE inside the oracle budget (q372's shape).
    "q376_progressive_jpeg" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS v,
        |    doc_id % 24 + 9 AS w, (doc_id * 5) % 24 + 8 AS h
        |  FROM documents),
        |kb AS (SELECT
        |  [2009, 1703, 1138, 400, -400, -1138, -1703, -2009] AS k1,
        |  [1138, -2009, 400, 1703, -1703, -400, 2009, -1138] AS k5),
        |px AS (
        |  SELECT doc_id, w, h, u.x AS x, u.y AS y
        |  FROM (
        |    SELECT doc_id, w, h,
        |      unnest(flatten(list_transform(range(h), y ->
        |        list_transform(range(w), x -> {'x': x, 'y': y})))) AS u
        |    FROM d)),
        |lum AS (
        |  SELECT doc_id, w, h, x, y,
        |    1000 * (CASE WHEN f < -128 THEN 0 WHEN f > 127 THEN 255
        |      ELSE f + 128 END) AS lum
        |  FROM (
        |    SELECT doc_id, w, h, x, y,
        |      CAST(floor((2096704 * 8 * dc
        |        + 23168 * (k1[x % 8 + 1] * a1 + k5[y % 8 + 1] * a2)
        |        + 8388608) / 16777216.0) AS BIGINT) AS f
        |    FROM (
        |      SELECT doc_id, w, h, x, y,
        |        ((x // 8 + doc_id % 31) * (y // 8 + doc_id % 37) * 3
        |          + doc_id) % 256 - 128 AS dc,
        |        (x // 8 + 2 * (y // 8) + doc_id) % 9 - 4 AS a1,
        |        (3 * (x // 8) + y // 8 + 2 * doc_id) % 7 - 3 AS a2,
        |        k1, k5
        |      FROM px, kb))),
        |cells AS (
        |  SELECT doc_id, (9 * x) // w AS cx, (8 * y) // h AS cy,
        |    sum(lum) // count(*) AS cavg
        |  FROM lum GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1) x ON x.doc_id = d.doc_id),
        |agg AS (
        |  SELECT doc_id, CAST(sum(lum) AS BIGINT) AS lum_sum,
        |    CAST(sum(lum * lum) AS BIGINT) AS lum_sq_sum
        |  FROM lum GROUP BY 1)
        |SELECT d.doc_id, d.doc_id % 10 <> 7 AS parsed,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN 'jpeg' END AS format,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.w AS BIGINT) END
        |    AS width,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.h AS BIGINT) END
        |    AS height,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN
        |    CAST(CASE WHEN d.v IN (1, 3) THEN 3 ELSE 1 END AS BIGINT)
        |    END AS channels,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN CAST(d.w * d.h AS BIGINT)
        |    END AS n_pixels,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN a.lum_sum END AS lum_sum,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN a.lum_sq_sum END
        |    AS lum_sq_sum,
        |  CASE WHEN d.doc_id % 10 <> 7 THEN s.dhash END AS dhash
        |FROM d JOIN agg a USING (doc_id) JOIN sig s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // The compressed-shard capstone: q366's incremental structure with
    // q372's closed-form JPEG block values, both corruption layers
    // excluded up front (tar truncation %10==9, frame truncation
    // %11==7 — a corrupt shard contributes no images).
    //
    // ORACLE BUDGET (round 16): the round-15 form materialized one row
    // per PIXEL (w×h ≈ 8,000/image) and ran a recursive
    // connected-components CTE — measured >15 min / ~45 GB in DuckDB
    // for 500 docs, which zeroed the driver's whole CORRECTNESS_r15
    // artifact. This form is arithmetically identical (verified equal
    // on 24/60/120-doc subsets) but closed-form:
    //  * blocks are DC-only constant, so each 9×8 dHash cell average
    //    is the area-weighted average of the ≤9 overlapping blocks —
    //    the xm/ym axis maps carry pixel-overlap counts (nx, ny) and
    //    cell totals (tx, ty), so sum(lum)//count(*) becomes
    //    1000·Σ val·nx·ny // (tx·ty) over ~648 rows/image, never w×h;
    //  * maxHamming = 0 makes hash equality the edge relation, which
    //    is transitive — a connected component IS an equal-dhash
    //    group, so pair counts and canonical survivors come from one
    //    GROUP BY dhash (cross = nc·nb, within = C(nb,2), survivor =
    //    isolated batch row or group-min img_id), no recursion.
    // Full 500-doc runtime: ~1 s.
    "q374_compressed_shard_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 3 + 2 AS s
        |  FROM documents
        |  WHERE doc_id % 10 <> 9 AND doc_id % 11 <> 7),
        |pq AS (
        |  SELECT doc_id, k, sp,
        |    sp % 24 + 72 AS w, (sp * 5) % 24 + 64 AS h
        |  FROM (
        |    SELECT doc_id, k,
        |      CASE WHEN k = 0 THEN 4 * (doc_id - doc_id % 2)
        |        WHEN k = 1 AND doc_id % 4 = 3 THEN 4 * (doc_id - 2) + 1
        |        ELSE 4 * doc_id + k END AS sp
        |    FROM (SELECT doc_id, unnest(range(s)) AS k FROM d))),
        |bv AS (
        |  SELECT doc_id, k, bx, by,
        |    CASE WHEN f < -128 THEN 0 WHEN f > 127 THEN 255
        |      ELSE f + 128 END AS val
        |  FROM (
        |    SELECT doc_id, k, bx, by,
        |      CAST(floor((dc * 8 * 2096704 + 8388608) / 16777216.0)
        |        AS BIGINT) AS f
        |    FROM (
        |      SELECT doc_id, k, u.bx AS bx, u.by AS by,
        |        ((u.bx + sp % 31) * (u.by + sp % 37) * 3 + sp)
        |          % 256 - 128 AS dc
        |      FROM (
        |        SELECT doc_id, k, sp,
        |          unnest(flatten(list_transform(range((h + 7) // 8),
        |            by -> list_transform(range((w + 7) // 8), bx ->
        |              {'bx': bx, 'by': by})))) AS u
        |        FROM pq)))),
        |xm AS (
        |  SELECT doc_id, k, cx, bx,
        |    least(x1, 8 * bx + 7) - greatest(x0, 8 * bx) + 1 AS nx,
        |    x1 - x0 + 1 AS tx
        |  FROM (
        |    SELECT doc_id, k, u.cx AS cx, u.bx AS bx,
        |      (u.cx * w + 8) // 9 AS x0, ((u.cx + 1) * w - 1) // 9 AS x1
        |    FROM (
        |      SELECT doc_id, k, w,
        |        unnest(flatten(list_transform(range(9), cx ->
        |          list_transform(range((w + 7) // 8), bx ->
        |            {'cx': cx, 'bx': bx})))) AS u
        |      FROM pq))
        |  WHERE least(x1, 8 * bx + 7) >= greatest(x0, 8 * bx)),
        |ym AS (
        |  SELECT doc_id, k, cy, by,
        |    least(y1, 8 * by + 7) - greatest(y0, 8 * by) + 1 AS ny,
        |    y1 - y0 + 1 AS ty
        |  FROM (
        |    SELECT doc_id, k, u.cy AS cy, u.by AS by,
        |      (u.cy * h + 7) // 8 AS y0, ((u.cy + 1) * h - 1) // 8 AS y1
        |    FROM (
        |      SELECT doc_id, k, h,
        |        unnest(flatten(list_transform(range(8), cy ->
        |          list_transform(range((h + 7) // 8), by ->
        |            {'cy': cy, 'by': by})))) AS u
        |      FROM pq))
        |  WHERE least(y1, 8 * by + 7) >= greatest(y0, 8 * by)),
        |cells AS (
        |  SELECT b.doc_id, b.k, x.cx, y.cy,
        |    (1000 * sum(b.val * x.nx * y.ny)) // (x.tx * y.ty) AS cavg
        |  FROM bv b
        |  JOIN xm x ON x.doc_id = b.doc_id AND x.k = b.k AND x.bx = b.bx
        |  JOIN ym y ON y.doc_id = b.doc_id AND y.k = b.k AND y.by = b.by
        |  GROUP BY 1, 2, 3, 4, x.tx, y.ty),
        |bits AS (
        |  SELECT a.doc_id, a.k, a.cy * 8 + a.cx AS kk
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.k = b.k AND b.cy = a.cy
        |      AND b.cx = a.cx + 1
        |  WHERE a.cx < 8 AND b.cavg > a.cavg),
        |sig AS (
        |  SELECT pq.doc_id, pq.doc_id * 8 + pq.k AS img_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM pq LEFT JOIN (
        |    SELECT doc_id, k, sum(CAST(1 AS HUGEINT) << CAST(kk AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1, 2) x
        |    ON x.doc_id = pq.doc_id AND x.k = pq.k),
        |g AS (
        |  SELECT dhash, min(img_id) AS mn, count(*) AS n,
        |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS nc,
        |    sum(doc_id % 2) AS nb
        |  FROM sig GROUP BY dhash),
        |bat AS (SELECT img_id, dhash FROM sig WHERE doc_id % 2 = 1),
        |surv AS (
        |  SELECT b.img_id FROM bat b JOIN g ON g.dhash = b.dhash
        |  WHERE g.n = 1 OR b.img_id = g.mn)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE doc_id % 2 = 0)
        |    AS n_corpus_sigs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM bat) AS n_batch_images,
        |  (SELECT CAST(count(dhash) AS BIGINT) FROM bat)
        |    AS n_batch_hashed,
        |  (SELECT CAST(coalesce(sum(nc * nb), 0) AS BIGINT) FROM g)
        |    AS n_cross_pairs,
        |  (SELECT CAST(coalesce(sum(nb * (nb - 1) // 2), 0) AS BIGINT)
        |   FROM g) AS n_within_pairs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM surv)
        |    AS n_batch_survivors,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sig WHERE doc_id % 2 = 0)
        |    + (SELECT CAST(count(*) AS BIGINT) FROM surv)
        |    AS n_total_sigs
        |ORDER BY n_corpus_sigs""".stripMargin,

    // Incremental audio dedup: the q367 envelope-hash replay split
    // even→corpus / odd→batch, Hamming-≤2 cross and within pair sets,
    // survivors over the HASHED batch (an undecodable clip has no
    // perceptual identity — quarantined upstream, never "kept").
    "q375_incremental_audio_dedup" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id // 3 AS f, doc_id % 3 AS v,
        |    (doc_id // 3) % 90 + 80 AS n
        |  FROM documents WHERE doc_id % 10 <> 9),
        |sm AS (
        |  SELECT doc_id, n, i,
        |    CASE WHEN v <= 1 THEN
        |      CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END
        |    ELSE (i * i * 1997 + i * 523
        |      + (doc_id % 251) * (i % 17) * 64
        |      + doc_id * 31) % 65536 - 32768
        |    END AS s
        |  FROM (
        |    SELECT doc_id, v, n, i, u,
        |      ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS t
        |    FROM (
        |      SELECT doc_id, v, n, i,
        |        255 - ((i * i * (f % 13 + 3) + i * 37
        |          + (f // 13) * (i % 11) + f * 11 + 1) % 256) AS u
        |      FROM (SELECT doc_id, f, v, n, unnest(range(n)) AS i
        |            FROM d)))),
        |we AS (
        |  SELECT doc_id, (65 * i) // n AS w, sum(abs(s)) AS e
        |  FROM sm GROUP BY 1, 2),
        |bits AS (
        |  SELECT a.doc_id, a.w AS t
        |  FROM we a JOIN we b ON b.doc_id = a.doc_id AND b.w = a.w + 1
        |  WHERE a.w < 64 AND b.e > a.e),
        |sig AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(x.hraw, 0)
        |      - CASE WHEN coalesce(x.hraw, 0) >= 9223372036854775808
        |          THEN 18446744073709551616 ELSE 0 END AS BIGINT)
        |      AS ahash
        |  FROM d LEFT JOIN (
        |    SELECT doc_id, sum(CAST(1 AS HUGEINT) << CAST(t AS INT))
        |      AS hraw
        |    FROM bits GROUP BY 1) x ON x.doc_id = d.doc_id),
        |cor AS (SELECT doc_id, ahash FROM sig WHERE doc_id % 2 = 0),
        |bat AS (SELECT doc_id, ahash FROM sig WHERE doc_id % 2 = 1),
        |cp AS (
        |  SELECT c.doc_id AS i, b.doc_id AS j
        |  FROM cor c JOIN bat b
        |    ON bit_count(xor(c.ahash, b.ahash)) <= 2),
        |wp AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM bat a JOIN bat b ON a.doc_id < b.doc_id
        |    AND bit_count(xor(a.ahash, b.ahash)) <= 2),
        |p AS (SELECT i, j FROM cp UNION SELECT i, j FROM wp),
        |symp AS (SELECT i AS u, j AS v FROM p UNION SELECT j, i FROM p),
        |pn AS (SELECT DISTINCT u AS node FROM symp),
        |r(node, comp) AS (
        |  SELECT node, node FROM pn
        |  UNION
        |  SELECT e.v, r.comp FROM r JOIN symp e ON e.u = r.node),
        |l AS (SELECT node, min(comp) AS component FROM r GROUP BY 1),
        |surv AS (
        |  SELECT b.doc_id FROM bat b LEFT JOIN l ON l.node = b.doc_id
        |  WHERE l.node IS NULL OR l.component = b.doc_id)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE doc_id % 2 = 0) AS n_corpus_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cor) AS n_corpus_sigs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE doc_id % 2 = 1) AS n_batch_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM bat) AS n_batch_sigs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cp) AS n_cross_pairs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM wp) AS n_within_pairs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM surv)
        |    AS n_batch_survivors
        |ORDER BY n_corpus_rows""".stripMargin
  )

  /** q382 grades against q380's EXACT oracle string — the guarded
    * matcher over the PUBLISHED pre-banded bucketed table must hash
    * identically to the session-built guard on the same flood fixture
    * (the q366/q373 identity-proof pattern), so the driver's hash
    * compare IS the proof that the published-artifact path re-brackets
    * nothing.
    */
  val oracles: Map[String, String] = oraclesBase +
    ("q382_published_banded_guard" ->
      oraclesBase("q380_incremental_guard"))

  /** The q345/q346 shared sample-replay CTEs: d (per-doc parameters),
    * st (per-doc integer statistics over the replayed samples).
    */
  private def oPcmCtes: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 3 AS m, doc_id % 120 + 40 AS n,
      |    (doc_id % 50) * 1000 + 8000 AS rate,
      |    doc_id % 10 = 9 AS corrupt
      |  FROM documents),
      |sm AS (
      |  SELECT doc_id, n, i,
      |    CASE WHEN m = 0 THEN (i * 523 + doc_id * 31) % 65536 - 32768
      |      WHEN m = 1 THEN CASE WHEN (i // 8) % 2 = 0 THEN a ELSE -a END
      |      ELSE CASE WHEN i < doc_id % 10 OR i >= n - (doc_id * 3) % 10
      |        THEN 0 ELSE 5000 END END AS v
      |  FROM (
      |    SELECT doc_id, m, n,
      |      CASE WHEN doc_id % 5 = 0 THEN 32767
      |        ELSE doc_id % 30000 + 1000 END AS a,
      |      unnest(range(n)) AS i
      |    FROM d WHERE NOT corrupt)),
      |st AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
      |    CAST(sum(v) AS BIGINT) AS sum_q,
      |    CAST(sum(v * v) AS BIGINT) AS sq_sum,
      |    CAST(count(CASE WHEN v = 32767 OR v = -32768 THEN 1 END)
      |      AS BIGINT) AS n_clipped,
      |    CAST(coalesce(min(CASE WHEN abs(v) > 256 THEN i END), max(i) + 1)
      |      AS BIGINT) AS lead_silence,
      |    CAST(coalesce(max(i) - max(CASE WHEN abs(v) > 256 THEN i END),
      |      max(i) + 1) AS BIGINT) AS trail_silence
      |  FROM sm GROUP BY 1)""".stripMargin

  /** q329: the training oracle's merge stages (s0 restricted to the
    * doc_id%3=0 training slice) feed an APPLY chain a0..aN over the
    * FULL corpus's distinct words — each a-stage replays exactly one
    * merge rank with the same greedy left-to-right list_reduce rewrite
    * the training stages use (rank-sequential application, equivalent
    * to the engine kernel's min-rank loop on the well-formed trained
    * list — see graft.expressions.BpeEncodeKernel).
    *
    * Precondition (shared with the q92/q301 oracles, whose unrolled
    * stages assume the same): the training slice yields the full
    * `numMerges` merges — an early-exhausted b-stage would CROSS JOIN
    * every later stage empty. The gate corpus trains 8+ comfortably;
    * trainMerges-side exhaustion on a different fixture would surface
    * as a loud row-count mismatch, not a silent wrong answer.
    */
  /** q334: the q329 oracle chain over BYTE-level symbols of regex
    * pretokens. The byte→unicode table rides as a 256-string list
    * literal generated from the SAME Scala table the engine uses (the
    * q298 shared-artifact discipline — the table is the public GPT-2
    * algorithm's output, embedded verbatim on both sides); byte values
    * come from hex-pair arithmetic (strpos over '0-9A-F'), the
    * pretokenizer regex is the engine's RE2-safe literal, and the
    * merge stages are the identical rank-sequential list_reduce
    * rewrites.
    */
  private def oByteBpeEncodeSql(numMerges: Int): String =
    oByteBpeCtes(numMerges) +
      s"""
         |SELECT w, CAST(len(syms) AS BIGINT) AS n_tokens,
         |  array_to_string(syms, ' ') AS seg
         |FROM a$numMerges ORDER BY w""".stripMargin

  /** The q334 chain through the applied stage aN, reusable by count-
    * style tails (q338): WITH ... aN AS (...) — no trailing comma.
    */
  /** The byte-level pretokenizer regex as a DuckDB string literal
    * (a def, NOT a val — the oracleSql val initializes before
    * later-declared vals in object init order, which would read null).
    */
  private def oByteReLit: String = "'" +
    graft.operators.Bpe.byteLevelPretokenRegex.replace("'", "''") + "'"

  private def oByteBpeCtes(numMerges: Int): String = {
    val tblLit = graft.operators.Bpe.byteLevelTable
      .map(s => "'" + s.replace("'", "''") + "'").mkString("[", ", ", "]")
    val reLit = oByteReLit
    def syms(w: String): String =
      s"""list_transform(range(1, length(hex(encode($w))) // 2 + 1),
         |    i -> tbl[(strpos('0123456789ABCDEF',
         |                     hex(encode($w))[2*i-1:2*i-1]) - 1) * 16
         |             + strpos('0123456789ABCDEF',
         |                      hex(encode($w))[2*i:2*i])])""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH bl(tbl) AS (SELECT $tblLit),
              |w0 AS (
              |  SELECT w, CAST(count(*) AS BIGINT) AS cnt
              |  FROM (SELECT unnest(regexp_extract_all(coalesce(text, ''),
              |                $reLit)) AS w
              |        FROM documents WHERE doc_id % 3 = 0)
              |  GROUP BY w),
              |s0 AS (SELECT w, cnt, ${syms("w")} AS syms
              |       FROM w0 CROSS JOIN bl),
              |""".stripMargin
    for (s <- 1 to numMerges) {
      sb ++= s"""p$s AS (
                |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS freq
                |  FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
                |          i -> [syms[i], syms[i+1]])) AS pr
                |        FROM s${s - 1})
                |  GROUP BY 1, 2),
                |b$s AS (SELECT l, r, freq FROM p$s ORDER BY freq DESC, l, r LIMIT 1),
                |s$s AS (
                |  SELECT w, cnt, list_reduce(list_transform(syms, x -> [x]),
                |    (acc, e) -> CASE WHEN acc[-1] = b.l AND e[1] = b.r
                |                     THEN list_append(acc[1:len(acc)-1], b.l || b.r)
                |                     ELSE list_append(acc, e[1]) END) AS syms
                |  FROM s${s - 1} CROSS JOIN b$s b),
                |""".stripMargin
    }
    sb ++= s"""aw AS (
              |  SELECT DISTINCT unnest(regexp_extract_all(coalesce(text, ''),
              |    $reLit)) AS w
              |  FROM documents),
              |a0 AS (SELECT w, ${syms("w")} AS syms
              |       FROM aw CROSS JOIN bl),
              |""".stripMargin
    for (s <- 1 to numMerges) {
      sb ++= s"""a$s AS (
                |  SELECT w, list_reduce(list_transform(syms, x -> [x]),
                |    (acc, e) -> CASE WHEN acc[-1] = b.l AND e[1] = b.r
                |                     THEN list_append(acc[1:len(acc)-1], b.l || b.r)
                |                     ELSE list_append(acc, e[1]) END) AS syms
                |  FROM a${s - 1} CROSS JOIN b$s b),
                |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop the last CTE's trailing ",\n"
    sb.result()
  }

  private def oBpeRankEncodeSql(numMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH s0 AS (
              |  SELECT w, CAST(count(*) AS BIGINT) AS cnt, string_split(w, '') AS syms
              |  FROM (SELECT unnest($oToks) AS w FROM documents
              |        WHERE doc_id % 3 = 0)
              |  GROUP BY w),
              |""".stripMargin
    for (s <- 1 to numMerges) {
      sb ++= s"""p$s AS (
                |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS freq
                |  FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
                |          i -> [syms[i], syms[i+1]])) AS pr
                |        FROM s${s - 1})
                |  GROUP BY 1, 2),
                |b$s AS (SELECT l, r, freq FROM p$s ORDER BY freq DESC, l, r LIMIT 1),
                |s$s AS (
                |  SELECT w, cnt, list_reduce(list_transform(syms, x -> [x]),
                |    (acc, e) -> CASE WHEN acc[-1] = b.l AND e[1] = b.r
                |                     THEN list_append(acc[1:len(acc)-1], b.l || b.r)
                |                     ELSE list_append(acc, e[1]) END) AS syms
                |  FROM s${s - 1} CROSS JOIN b$s b),
                |""".stripMargin
    }
    sb ++= s"""a0 AS (
              |  SELECT w, string_split(w, '') AS syms
              |  FROM (SELECT DISTINCT unnest($oToks) AS w FROM documents)),
              |""".stripMargin
    for (s <- 1 to numMerges) {
      sb ++= s"""a$s AS (
                |  SELECT w, list_reduce(list_transform(syms, x -> [x]),
                |    (acc, e) -> CASE WHEN acc[-1] = b.l AND e[1] = b.r
                |                     THEN list_append(acc[1:len(acc)-1], b.l || b.r)
                |                     ELSE list_append(acc, e[1]) END) AS syms
                |  FROM a${s - 1} CROSS JOIN b$s b),
                |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop the last CTE's trailing ",\n"
    sb ++= s"""
              |SELECT w, CAST(len(syms) AS BIGINT) AS n_tokens,
              |  array_to_string(syms, ' ') AS seg
              |FROM a$numMerges ORDER BY w""".stripMargin
    sb.result()
  }

  /** q319/q320's shared Pearson tail over `b(event_type, x, y)`:
    * exact BIGINT moments, the num/√Dx·√Dy closing chain; `name` is
    * the output column stem (r for Pearson, rho for Spearman).
    */
  private def oPearsonTail(name: String): String =
    s"""m AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM b GROUP BY 1),
       |res AS (
       |  SELECT event_type, n,
       |    CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
       |      CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) /
       |        (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
       |         sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       |        * 1048576.0) AS BIGINT)
       |    END AS rq
       |  FROM m)
       |SELECT event_type, n, rq AS ${name}_q20,
       |  CAST(rq AS DOUBLE) / 1048576.0 AS $name
       |FROM res""".stripMargin

  /** q316's oracle: per-group reward histogram, cumulative CDF over
    * distinct values, per-N falling-factorial numerators (one arm per
    * N — the engine computes the same N columns in one aggregate), the
    * closing `(num·2^20) // ff(n,N) + min·2^20`, UNION-ALL'd long.
    */
  private def oBonSql(maxN: Int): String = {
    def ffSql(c: String, n: Int): String =
      (0 until n).map(j => s"CAST($c - $j AS HUGEINT)").mkString(" * ")
    val numArms = (1 to maxN).map(n =>
      s"""CAST(sum(CAST(rw - mn AS HUGEINT) *
         |      (${ffSql("F", n)} - (${ffSql("Fp", n)}))) AS HUGEINT)
         |      AS num$n""".stripMargin).mkString(",\n    ")
    val eArms = (1 to maxN).map(n =>
      s"""CASE WHEN n_samples >= $n THEN
         |    CAST((num$n * 1048576) // (${ffSql("n_samples", n)})
         |      AS BIGINT) + mn * 1048576
         |  END AS e$n""".stripMargin).mkString(",\n  ")
    val union = (1 to maxN).map(n =>
      s"""SELECT user_id, n_samples, CAST($n AS BIGINT) AS n_draws,
         |      e$n AS e_max_q20 FROM pe2""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH r AS (
       |  SELECT user_id, CAST(floor(value * 100.0) AS BIGINT) AS rw
       |  FROM events),
       |hist AS (
       |  SELECT user_id, rw, CAST(count(*) AS BIGINT) AS c
       |  FROM r GROUP BY 1, 2),
       |g AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
       |         min(rw) AS mn
       |  FROM r GROUP BY 1),
       |cum AS (
       |  SELECT user_id, rw, c,
       |    CAST(sum(c) OVER (PARTITION BY user_id ORDER BY rw)
       |      AS BIGINT) AS F
       |  FROM hist),
       |t AS (
       |  SELECT c.user_id, c.rw, c.F, c.F - c.c AS Fp, g.n_samples, g.mn
       |  FROM cum c JOIN g USING (user_id)),
       |pe AS (
       |  SELECT user_id, n_samples, mn,
       |    $numArms
       |  FROM t GROUP BY 1, 2, 3),
       |pe2 AS (
       |  SELECT user_id, n_samples,
       |  $eArms
       |  FROM pe),
       |lg AS (
       |  $union)
       |SELECT user_id, n_samples, n_draws, e_max_q20,
       |  CAST(e_max_q20 AS DOUBLE) / 1048576.0 AS e_max
       |FROM lg ORDER BY user_id, n_draws""".stripMargin
  }

  /** q312/q313's shared chrF pipeline: q304's doc pairing, whitespace
    * stripped, character n-grams of orders 1..6 from both sides in one
    * unnest, per-(pair, order, gram) counts, per-(pair, order) sums,
    * and the exact one-division β=2 F. Produces `prs` (the pair spine)
    * and `perf(pair_id, k, n_cand_grams, n_ref_grams, overlap,
    * f2_q20)`.
    */
  private def oChrfCtes: String =
    s"""prs AS (
       |  SELECT c.doc_id AS pair_id, c.text AS cand, r.text AS refx
       |  FROM documents c JOIN documents r ON r.doc_id = c.doc_id - 1
       |  WHERE c.doc_id % 2 = 1),
       |st AS (
       |  SELECT pair_id,
       |    regexp_replace(coalesce(cand, ''),
       |      '[ \\t\\n\\f\\r]+', '', 'g') AS cs,
       |    regexp_replace(coalesce(refx, ''),
       |      '[ \\t\\n\\f\\r]+', '', 'g') AS rs
       |  FROM prs),
       |gch AS (
       |  SELECT pair_id, k.k AS k, sd.sd AS sd,
       |    unnest(list_transform(
       |      range(1, length(CASE WHEN sd.sd = 0 THEN cs ELSE rs END)
       |        - k.k + 2),
       |      i -> substr(CASE WHEN sd.sd = 0 THEN cs ELSE rs END,
       |        CAST(i AS INTEGER), k.k))) AS gr
       |  FROM st CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6)) k(k)
       |       CROSS JOIN (VALUES (0), (1)) sd(sd)),
       |pg AS (
       |  SELECT pair_id, k, gr,
       |    CAST(count(CASE WHEN sd = 0 THEN 1 END) AS BIGINT) AS cc,
       |    CAST(count(CASE WHEN sd = 1 THEN 1 END) AS BIGINT) AS rc
       |  FROM gch GROUP BY 1, 2, 3),
       |perf AS (
       |  SELECT pair_id, CAST(k AS BIGINT) AS k,
       |    CAST(sum(cc) AS BIGINT) AS n_cand_grams,
       |    CAST(sum(rc) AS BIGINT) AS n_ref_grams,
       |    CAST(sum(least(cc, rc)) AS BIGINT) AS overlap,
       |    CAST((5 * CAST(sum(least(cc, rc)) AS BIGINT) * 1048576)
       |      // (4 * CAST(sum(rc) AS BIGINT) + CAST(sum(cc) AS BIGINT))
       |      AS BIGINT) AS f2_q20
       |  FROM pg GROUP BY 1, 2)""".stripMargin

  /** q310/q311's shared per-candidate BLEU pipeline: candidates are
    * every 7th doc (every 14th truncated to its first 3 tokens — since
    * whitespace tokens contain no whitespace, slicing the token list
    * equals re-tokenizing the re-joined string), references the two
    * following docs. Mirrors [[graft.operators.GenerationEval.bleu]]'s
    * plan CTE-for-stage; produces `base(pair_id, n_cand_tokens,
    * r_ref_len, bp_applies, p1_num..p4_den)`.
    */
  private def oBleuCtes: String = {
    val ks = "(VALUES (1), (2), (3), (4)) k(k)"
    s"""toks AS (SELECT doc_id,
       |  ${oToks.replace("text", "coalesce(text, '')")} AS tk
       |  FROM documents),
       |cands AS (
       |  SELECT doc_id AS pair_id,
       |    CASE WHEN doc_id % 14 = 1 THEN tk[1:3] ELSE tk END AS ct
       |  FROM toks WHERE doc_id % 7 = 1),
       |refs AS (
       |  SELECT t.doc_id - o.o AS pair_id, o.o AS rid, t.tk AS rt
       |  FROM toks t CROSS JOIN (VALUES (1), (2)) o(o)
       |  JOIN (SELECT pair_id FROM cands) cp
       |    ON cp.pair_id = t.doc_id - o.o),
       |cg AS (
       |  SELECT pair_id, k.k AS k,
       |    unnest(list_transform(range(1, len(ct) - k.k + 2),
       |      i -> array_to_string(ct[i:i + k.k - 1], ' '))) AS g
       |  FROM cands CROSS JOIN $ks),
       |ccnt AS (SELECT pair_id, k, g, CAST(count(*) AS BIGINT) AS cc
       |         FROM cg GROUP BY 1, 2, 3),
       |rg AS (
       |  SELECT pair_id, rid, k.k AS k,
       |    unnest(list_transform(range(1, len(rt) - k.k + 2),
       |      i -> array_to_string(rt[i:i + k.k - 1], ' '))) AS g
       |  FROM refs CROSS JOIN $ks),
       |rcnt AS (
       |  SELECT pair_id, k, g, CAST(max(c) AS BIGINT) AS mrc FROM (
       |    SELECT pair_id, rid, k, g, count(*) AS c
       |    FROM rg GROUP BY 1, 2, 3, 4) GROUP BY 1, 2, 3),
       |per AS (
       |  SELECT c.pair_id, c.k,
       |    CAST(sum(least(c.cc, coalesce(r.mrc, 0))) AS BIGINT) AS num,
       |    CAST(sum(c.cc) AS BIGINT) AS den
       |  FROM ccnt c LEFT JOIN rcnt r ON r.pair_id = c.pair_id
       |    AND r.k = c.k AND r.g = c.g
       |  GROUP BY 1, 2),
       |piv AS (
       |  SELECT pair_id,
       |    ${(1 to 4).map(k =>
        s"""max(CASE WHEN k = $k THEN num END) AS p${k}_num,
           |    max(CASE WHEN k = $k THEN den END) AS p${k}_den""".stripMargin)
        .mkString(",\n    ")}
       |  FROM per GROUP BY 1),
       |clen AS (SELECT pair_id, CAST(len(ct) AS BIGINT) AS n_cand_tokens
       |         FROM cands),
       |closest AS (
       |  SELECT pair_id, rl AS r_ref_len FROM (
       |    SELECT r.pair_id, CAST(len(r.rt) AS BIGINT) AS rl,
       |      row_number() OVER (PARTITION BY r.pair_id
       |        ORDER BY abs(CAST(len(r.rt) AS BIGINT) - c.n_cand_tokens)
       |          ASC, len(r.rt) ASC) AS rn
       |    FROM refs r JOIN clen c USING (pair_id)) WHERE rn = 1),
       |base AS (
       |  SELECT c.pair_id, c.n_cand_tokens, cl.r_ref_len,
       |    c.n_cand_tokens < cl.r_ref_len AS bp_applies,
       |    ${(1 to 4).map(k =>
        s"""coalesce(p.p${k}_num, CAST(0 AS BIGINT)) AS p${k}_num,
           |    coalesce(p.p${k}_den, CAST(0 AS BIGINT)) AS p${k}_den"""
          .stripMargin).mkString(",\n    ")}
       |  FROM clen c LEFT JOIN closest cl USING (pair_id)
       |       LEFT JOIN piv p USING (pair_id))""".stripMargin
  }

  /** The sqrt-only quantized BLEU geometric mean over columns
    * p1_num..p4_den: NULL if any order's denominator is 0, else
    * floor(sqrt(sqrt(Π floor(num·2^10/den)))·2^10) — all-integer until
    * the exactly-representable ≤2^40 product enters the two correctly
    * rounded IEEE sqrts.
    */
  private def oBleuGm: String = {
    val prod = (1 to 4).map(k => s"((p${k}_num * 1024) // p${k}_den)")
      .mkString(" * ")
    val dens = (1 to 4).map(k => s"p${k}_den > 0").mkString(" AND ")
    s"""CASE WHEN $dens THEN
       |  CAST(floor(sqrt(sqrt(CAST($prod AS DOUBLE))) * 1024.0) AS BIGINT)
       |END""".stripMargin
  }

  /** q307: the per-END-position candidate table (same slices as
    * [[oMaxMatchJoinedSql]]'s cand, joined to the scored vocab), then
    * the exact DP replayed by a recursive CTE whose state is the
    * growing best[] list — bests[i] = best over prefixes of length
    * i−1 as {'s','nt','nu'}, maximized by (score, fewest tokens,
    * fewest unks) via an explicit comparator fold. Folds are
    * per-position candidate lists (≤ maxLen+1 elements), far under the
    * list_reduce batch-dependence range.
    */
  /** q347: [[oViterbiSql]]'s recursive DP with the UNK transition
    * replaced by BYTE FALLBACK — the fallback step at end position e
    * consumes one code point as strlen-many byte tokens at `byteQ`
    * each — over the planted-OOV corpus. strlen counts BYTES and
    * substr counts CODE POINTS on DuckDB, exactly mirroring the
    * engine's octet_length-per-position table.
    */
  private def oViterbiByteFallbackSql(vocab: Seq[(String, Long)],
                                      byteQ: Long, plantMod: Long,
                                      plantWord: String): String = {
    val vlist = vocab.map { case (u, sc) => s"{'u': '$u', 'sc': $sc}" }
      .mkString("[", ",", "]")
    val maxLen = vocab.map(_._1.length).max
    s"""WITH RECURSIVE
       |pdocs AS (
       |  SELECT doc_id, CASE WHEN doc_id % $plantMod = 0
       |    THEN coalesce(text, '') || ' $plantWord'
       |    ELSE coalesce(text, '') END AS text
       |  FROM documents),
       |vocab AS (SELECT x.u AS u, CAST(x.sc AS BIGINT) AS sc
       |          FROM (SELECT unnest($vlist) AS x)),
       |dwords AS (SELECT DISTINCT unnest($oToks) AS w FROM pdocs),
       |cand AS (
       |  SELECT w, u.pos AS pos, u.k AS k FROM (
       |    SELECT w, unnest(flatten(list_transform(range(1, length(w) + 1),
       |      p -> list_transform(range(1, least($maxLen, length(w) - p + 1) + 1),
       |        k -> {'pos': p, 'k': k})))) AS u
       |    FROM dwords)),
       |m AS (
       |  SELECT c.w, c.pos, c.k, v.sc
       |  FROM cand c JOIN vocab v ON v.u = substr(c.w, c.pos, c.k)),
       |ends AS (
       |  SELECT w, pos + k - 1 AS e,
       |         list({'k': k, 'sc': sc}) AS cands
       |  FROM m GROUP BY 1, 2),
       |walk(w, e, bests) AS (
       |  SELECT w, 0, [{'s': CAST(0 AS BIGINT), 'nt': CAST(0 AS BIGINT),
       |                 'nu': CAST(0 AS BIGINT)}]
       |  FROM dwords
       |  UNION ALL
       |  SELECT walk.w, walk.e + 1,
       |    list_append(walk.bests, list_reduce(
       |      list_prepend(
       |        {'s': walk.bests[walk.e + 1].s +
       |           strlen(substr(walk.w, walk.e + 1, 1)) * ($byteQ),
       |         'nt': walk.bests[walk.e + 1].nt +
       |           strlen(substr(walk.w, walk.e + 1, 1)),
       |         'nu': walk.bests[walk.e + 1].nu +
       |           strlen(substr(walk.w, walk.e + 1, 1))},
       |        list_transform(coalesce(en.cands,
       |            CAST([] AS STRUCT(k BIGINT, sc BIGINT)[])), c ->
       |          {'s': walk.bests[walk.e + 2 - c.k].s + c.sc,
       |           'nt': walk.bests[walk.e + 2 - c.k].nt + 1,
       |           'nu': walk.bests[walk.e + 2 - c.k].nu})),
       |      (a, b) -> CASE WHEN b.s > a.s OR (b.s = a.s AND
       |        (b.nt < a.nt OR (b.nt = a.nt AND b.nu < a.nu)))
       |        THEN b ELSE a END))
       |  FROM walk LEFT JOIN ends en
       |    ON en.w = walk.w AND en.e = walk.e + 1
       |  WHERE walk.e < length(walk.w)),
       |seg AS (SELECT w, bests[length(w) + 1] AS b
       |        FROM walk WHERE e = length(w)),
       |tok AS (SELECT doc_id, unnest($oToks) AS w FROM pdocs),
       |agg AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(s.b.nt) AS BIGINT) AS n_tokens,
       |         CAST(sum(s.b.nu) AS BIGINT) AS n_byte_tokens,
       |         CAST(sum(s.b.s) AS BIGINT) AS viterbi_score_q
       |  FROM tok t JOIN seg s USING (w) GROUP BY 1)
       |SELECT d.doc_id,
       |       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       CAST(COALESCE(a.n_byte_tokens, 0) AS BIGINT)
       |         AS n_byte_tokens,
       |       CAST(COALESCE(a.viterbi_score_q, 0) AS BIGINT)
       |         AS viterbi_score_q
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  private def oViterbiSql(vocab: Seq[(String, Long)], unkQ: Long): String = {
    val vlist = vocab.map { case (u, sc) => s"{'u': '$u', 'sc': $sc}" }
      .mkString("[", ",", "]")
    val maxLen = vocab.map(_._1.length).max
    s"""WITH RECURSIVE
       |vocab AS (SELECT x.u AS u, CAST(x.sc AS BIGINT) AS sc
       |          FROM (SELECT unnest($vlist) AS x)),
       |dwords AS (SELECT DISTINCT unnest($oToks) AS w FROM documents),
       |cand AS (
       |  SELECT w, u.pos AS pos, u.k AS k FROM (
       |    SELECT w, unnest(flatten(list_transform(range(1, length(w) + 1),
       |      p -> list_transform(range(1, least($maxLen, length(w) - p + 1) + 1),
       |        k -> {'pos': p, 'k': k})))) AS u
       |    FROM dwords)),
       |m AS (
       |  SELECT c.w, c.pos, c.k, v.sc
       |  FROM cand c JOIN vocab v ON v.u = substr(c.w, c.pos, c.k)),
       |ends AS (
       |  SELECT w, pos + k - 1 AS e,
       |         list({'k': k, 'sc': sc}) AS cands
       |  FROM m GROUP BY 1, 2),
       |walk(w, e, bests) AS (
       |  SELECT w, 0, [{'s': CAST(0 AS BIGINT), 'nt': CAST(0 AS BIGINT),
       |                 'nu': CAST(0 AS BIGINT)}]
       |  FROM dwords
       |  UNION ALL
       |  SELECT walk.w, walk.e + 1,
       |    list_append(walk.bests, list_reduce(
       |      list_prepend(
       |        {'s': walk.bests[walk.e + 1].s + ($unkQ),
       |         'nt': walk.bests[walk.e + 1].nt + 1,
       |         'nu': walk.bests[walk.e + 1].nu + 1},
       |        list_transform(coalesce(en.cands,
       |            CAST([] AS STRUCT(k BIGINT, sc BIGINT)[])), c ->
       |          {'s': walk.bests[walk.e + 2 - c.k].s + c.sc,
       |           'nt': walk.bests[walk.e + 2 - c.k].nt + 1,
       |           'nu': walk.bests[walk.e + 2 - c.k].nu})),
       |      (a, b) -> CASE WHEN b.s > a.s OR (b.s = a.s AND
       |        (b.nt < a.nt OR (b.nt = a.nt AND b.nu < a.nu)))
       |        THEN b ELSE a END))
       |  FROM walk LEFT JOIN ends en
       |    ON en.w = walk.w AND en.e = walk.e + 1
       |  WHERE walk.e < length(walk.w)),
       |seg AS (SELECT w, bests[length(w) + 1] AS b
       |        FROM walk WHERE e = length(w)),
       |tok AS (SELECT doc_id, unnest($oToks) AS w FROM documents),
       |agg AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(s.b.nt) AS BIGINT) AS n_tokens,
       |         CAST(sum(s.b.nu) AS BIGINT) AS n_unk_chars,
       |         CAST(sum(s.b.s) AS BIGINT) AS viterbi_score_q
       |  FROM tok t JOIN seg s USING (w) GROUP BY 1)
       |SELECT d.doc_id,
       |       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       CAST(COALESCE(a.n_unk_chars, 0) AS BIGINT) AS n_unk_chars,
       |       CAST(COALESCE(a.viterbi_score_q, 0) AS BIGINT)
       |         AS viterbi_score_q
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q301: oBpeCtes' merge stages (promoted to WITH RECURSIVE for the
    * walk) + learned-vocab CTE + the q298 apply-side replay.
    */
  private def oTokenizerLifecycleSql(numMerges: Int): String =
    oBpeCtes(numMerges).replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""",
         |vocab AS (SELECT DISTINCT unnest(syms) AS u FROM s$numMerges),
         |dwords AS (SELECT DISTINCT unnest($oToks) AS w FROM documents),
         |cand AS (
         |  SELECT w, u.pos AS pos, u.k AS k FROM (
         |    SELECT w, unnest(flatten(list_transform(range(1, length(w) + 1),
         |      p -> list_transform(range(1, length(w) - p + 2),
         |        k -> {'pos': p, 'k': k})))) AS u
         |    FROM dwords)),
         |best AS (
         |  SELECT c.w, c.pos, CAST(max(c.k) AS INTEGER) AS bl
         |  FROM cand c JOIN vocab v ON v.u = substr(c.w, c.pos, c.k)
         |  GROUP BY 1, 2),
         |walk(w, pos, ntok, nunk) AS (
         |  SELECT w, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM dwords
         |  UNION ALL
         |  SELECT walk.w, walk.pos + coalesce(b.bl, 1), walk.ntok + 1,
         |         walk.nunk + CASE WHEN b.bl IS NULL THEN 1 ELSE 0 END
         |  FROM walk LEFT JOIN best b ON b.w = walk.w AND b.pos = walk.pos
         |  WHERE walk.pos <= length(walk.w)),
         |seg AS (SELECT w, ntok, nunk FROM walk WHERE pos > length(w)),
         |tok AS (SELECT doc_id, unnest($oToks) AS w FROM documents),
         |agg AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |         CAST(sum(s.ntok) AS BIGINT) AS n_tokens,
         |         CAST(sum(s.nunk) AS BIGINT) AS n_unk_chars
         |  FROM tok t JOIN seg s USING (w) GROUP BY 1)
         |SELECT d.doc_id,
         |       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
         |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(COALESCE(a.n_unk_chars, 0) AS BIGINT) AS n_unk_chars
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin

  /** q298: candidate-slice explode + vocab equi-join + per-position
    * max(k) + the q292 recursive walk probing that table; the vocab
    * list literal and maxLen constant are generated from the SAME Seq
    * the engine stages as a DataFrame.
    */
  private def oMaxMatchJoinedSql(vocab: Seq[String]): String = {
    val vlist = vocab.map(u => "'" + u + "'").mkString("[", ",", "]")
    val maxLen = vocab.map(_.length).max
    s"""WITH RECURSIVE vocab AS (SELECT unnest($vlist) AS u),
       |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM vocab),
       |dwords AS (SELECT DISTINCT unnest($oToks) AS w FROM documents),
       |cand AS (
       |  SELECT w, u.pos AS pos, u.k AS k FROM (
       |    SELECT w, unnest(flatten(list_transform(range(1, length(w) + 1),
       |      p -> list_transform(range(1, least($maxLen, length(w) - p + 1) + 1),
       |        k -> {'pos': p, 'k': k})))) AS u
       |    FROM dwords)),
       |best AS (
       |  SELECT c.w, c.pos, CAST(max(c.k) AS INTEGER) AS bl
       |  FROM cand c JOIN vocab v ON v.u = substr(c.w, c.pos, c.k)
       |  GROUP BY 1, 2),
       |walk(w, pos, ntok, nunk) AS (
       |  SELECT w, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM dwords
       |  UNION ALL
       |  SELECT walk.w, walk.pos + coalesce(b.bl, 1), walk.ntok + 1,
       |         walk.nunk + CASE WHEN b.bl IS NULL THEN 1 ELSE 0 END
       |  FROM walk LEFT JOIN best b ON b.w = walk.w AND b.pos = walk.pos
       |  WHERE walk.pos <= length(walk.w)),
       |seg AS (SELECT w, ntok, nunk FROM walk WHERE pos > length(w)),
       |tok AS (SELECT doc_id, unnest($oToks) AS w FROM documents),
       |agg AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(s.ntok) AS BIGINT) AS n_tokens,
       |         CAST(sum(s.nunk) AS BIGINT) AS n_unk_chars
       |  FROM tok t JOIN seg s USING (w) GROUP BY 1)
       |SELECT d.doc_id,
       |       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       CAST(COALESCE(a.n_unk_chars, 0) AS BIGINT) AS n_unk_chars,
       |       CASE WHEN COALESCE(a.n_words, 0) > 0
       |            THEN CAST(a.n_tokens AS DOUBLE) /
       |                 CAST(a.n_words AS DOUBLE) END AS fertility,
       |       (SELECT n_vocab FROM nv) AS n_vocab
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q292: the longest-candidate picker, generated from the SAME
    * maxLen..1 loop as [[graft.operators.Bpe.maxMatchTokenCount]]'s
    * lambda (boundary guard + literal-vocab membership per length);
    * written against the recursion's bare `pos`/`w` columns.
    */
  /** q297: per/wins/pairs/wtot CTEs plus `iters` unrolled Hunter-MM
    * rounds — each round k builds d_k (both directed views of every
    * pair against round k−1's ratings) and r_k (⌊W·2⁴⁰/d⌋, rating
    * carried when d = 0), mirroring
    * [[graft.operators.Preference.bradleyTerryStrengths]] long-for-long.
    */
  /** q297's wins derivation: implicit head-to-heads from per-subject
    * summed scores (Preference.pairwiseWins).
    */
  private def oImplicitWinsCtes: String =
    """per AS MATERIALIZED (
      |  SELECT user_id AS s, event_type AS i,
      |         CAST(sum(CAST(floor(value * CAST(100.0 AS DOUBLE))
      |           AS BIGINT)) AS BIGINT) AS m
      |  FROM events GROUP BY 1, 2),
      |wins AS MATERIALIZED (
      |  SELECT a.i AS item_a, b.i AS item_b,
      |         CAST(count(CASE WHEN a.m > b.m THEN 1 END) AS BIGINT)
      |           AS wins_a,
      |         CAST(count(CASE WHEN b.m > a.m THEN 1 END) AS BIGINT)
      |           AS wins_b
      |  FROM per a JOIN per b ON a.s = b.s AND a.i < b.i
      |  GROUP BY 1, 2)""".stripMargin

  /** q300's wins derivation: EXPLICIT (winner, loser) comparison rows
    * first (one row per decided head-to-head — the RLHF input shape),
    * then Preference.winMatrixFromComparisons' least/greatest normalize
    * + count per side.
    */
  private def oExplicitWinsCtes: String =
    """per AS MATERIALIZED (
      |  SELECT user_id AS s, event_type AS i,
      |         CAST(sum(CAST(floor(value * CAST(100.0 AS DOUBLE))
      |           AS BIGINT)) AS BIGINT) AS m
      |  FROM events GROUP BY 1, 2),
      |cmp AS MATERIALIZED (
      |  SELECT a.i AS winner, b.i AS loser
      |  FROM per a JOIN per b
      |    ON a.s = b.s AND a.i <> b.i AND a.m > b.m),
      |wins AS MATERIALIZED (
      |  SELECT least(winner, loser) AS item_a,
      |         greatest(winner, loser) AS item_b,
      |         CAST(count(CASE WHEN winner < loser THEN 1 END) AS BIGINT)
      |           AS wins_a,
      |         CAST(count(CASE WHEN loser < winner THEN 1 END) AS BIGINT)
      |           AS wins_b
      |  FROM cmp GROUP BY 1, 2)""".stripMargin

  private def oBradleyTerrySql(iters: Int,
                               winsCtes: String = oImplicitWinsCtes): String = {
    val rounds = (1 to iters).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT u.item, CAST(sum(CASE WHEN u.rs + u.ro > 0
         |           THEN (u.n * 1099511627776) // (u.rs + u.ro)
         |           ELSE 0 END) AS BIGINT) AS d
         |  FROM (
         |    SELECT p.a AS item, p.n, ra.r AS rs, rb.r AS ro
         |    FROM pairs p JOIN r${k - 1} ra ON ra.item = p.a
         |                 JOIN r${k - 1} rb ON rb.item = p.b
         |    UNION ALL
         |    SELECT p.b, p.n, rb.r, ra.r
         |    FROM pairs p JOIN r${k - 1} ra ON ra.item = p.a
         |                 JOIN r${k - 1} rb ON rb.item = p.b) u
         |  GROUP BY 1),
         |r$k AS MATERIALIZED (
         |  SELECT w.item,
         |         CASE WHEN coalesce(d.d, CAST(0 AS BIGINT)) > 0
         |              THEN CAST((w.w * 1099511627776) // d.d AS BIGINT)
         |              ELSE rp.r END AS r
         |  FROM wtot w JOIN r${k - 1} rp ON rp.item = w.item
         |  LEFT JOIN d$k d ON d.item = w.item)""".stripMargin
    }.mkString(",\n")
    s"""WITH $winsCtes,
       |pairs AS MATERIALIZED (
       |  SELECT item_a AS a, item_b AS b, wins_a + wins_b AS n
       |  FROM wins WHERE wins_a + wins_b > 0),
       |wtot AS MATERIALIZED (
       |  SELECT item, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT item_a AS item, wins_a AS w FROM wins
       |    UNION ALL
       |    SELECT item_b, wins_b FROM wins)
       |  GROUP BY 1),
       |ctot AS MATERIALIZED (
       |  SELECT item, CAST(sum(n) AS BIGINT) AS n FROM (
       |    SELECT a AS item, n FROM pairs
       |    UNION ALL
       |    SELECT b, n FROM pairs)
       |  GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT item, CAST(1048576 AS BIGINT) AS r FROM wtot),
       |$rounds
       |SELECT w.item, w.w AS wins,
       |       coalesce(c.n, CAST(0 AS BIGINT)) AS comparisons,
       |       rf.r AS strength_fp,
       |       CAST(rf.r AS DOUBLE) / 1048576.0 AS strength
       |FROM wtot w JOIN r$iters rf ON rf.item = w.item
       |LEFT JOIN ctot c ON c.item = w.item
       |ORDER BY w.item""".stripMargin
  }

  private def oMaxMatchPick: String = {
    val vlit = maxMatchVocab.map(v => s"'$v'").mkString("[", ", ", "]")
    val maxLen = maxMatchVocab.map(_.length).max
    (maxLen to 1 by -1).map { k =>
      s"CASE WHEN pos + ${k - 1} <= length(w) AND " +
        s"list_contains($vlit, substr(w, pos, $k)) THEN $k END"
    }.mkString("coalesce(", ", ", ")")
  }
}
