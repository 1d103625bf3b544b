package graft.streaming

import java.sql.Timestamp

import graft.operators.TextAnalysis
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators over a document stream (doc_id, ts, text) — the
  * corpus-side twin of [[EventStreams]]: what an INGEST stream runs so
  * near-duplicate documents are flagged against the recent corpus as
  * they arrive, instead of waiting for the next batch dedup sweep.
  */
object CorpusStreams {

  /** One streamed document. */
  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** A banded document row (one per band). */
  case class BandedDoc(band: Int, nib: Long, doc_id: Long, ts: Timestamp, sig: Long)

  /** Candidate match: `j` arrived after (or within the same batch,
    * later in event time than) `i`, within Hamming `hamming`. As with
    * the batch `Dedup.simhashMatches`, a pair colliding in several
    * bands emits one row per band — consumers that need distinct pairs
    * deduplicate downstream (min-aggregates absorb parallel edges).
    */
  case class Match(i: Long, j: Long, hamming: Long)

  /** Per-(band, nib) bucket state: (doc_id, sig, ts millis), newest first. */
  case class BucketState(entries: List[(Long, Long, Long)])

  /** Streaming near-duplicate candidate matches — streaming twin of
    * `Dedup.simhashMatchesWide`, same signature and banding (56-bit wide
    * simhash, 4 × 14-bit bands; total recall for hamming ≤ 3 among docs
    * co-resident in state).
    *
    * Every arriving doc is checked against the docs seen in its band
    * buckets within the WATERMARK horizon, then remembered. State is
    * bounded on three axes, all load-bearing on an indefinite stream:
    *   - keyed by (band, nib): hash-partitioned across executors —
    *     16,384 values per band spread hot boilerplate buckets;
    *   - event-time watermark: entries older than the horizon are
    *     filtered on every touch, and an idle bucket's state is REMOVED
    *     by an event-time timeout once the watermark passes its newest
    *     entry + horizon (no tombstones for buckets never touched again);
    *   - `maxPerBucket` caps a pathological bucket (the newest entries
    *     win — a documented recall trade, not an OOM).
    *
    * At-least-once sources: a re-delivered doc_id never matches itself
    * and is not re-registered, so exact re-delivery emits nothing.
    */
  def nearDupMatches(docs: Dataset[Doc], maxHamming: Int = 2,
                     watermark: String = "10 minutes",
                     maxPerBucket: Int = 1024): Dataset[Match] = {
    require(maxHamming <= 3, "4 bands only guarantee recall for hamming <= 3")
    require(maxPerBucket > 0)
    import docs.sparkSession.implicits._
    val banded = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        TextAnalysis.simHashWide(col("text")).as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            // same band derivation as the batch operator, by
            // construction (shared helper)
            graft.operators.Dedup.wideBandNib(col("sig"), b).as("nib"))): _*)).as("__b"))
      .select(col("__b.band").as("band"), col("__b.nib").as("nib"),
        col("doc_id"), col("ts"), col("sig"))
      .as[BandedDoc]
    banded
      .groupByKey(d => (d.band, d.nib))
      .flatMapGroupsWithState[BucketState, Match](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // watermark passed newest entry + horizon: every entry is
            // already unmatchable, drop the bucket entirely
            state.remove()
            Iterator.empty
          } else {
            val horizon = state.getCurrentWatermarkMs()
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_._3 >= horizon)
            val out = List.newBuilder[Match]
            // deterministic in-batch order: event time, then id —
            // micro-batch iterator order is not a contract
            rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              if (!entries.exists(_._1 == d.doc_id)) {
                entries.foreach { case (pid, psig, _) =>
                  val h = java.lang.Long.bitCount(psig ^ d.sig)
                  if (h <= maxHamming) out += Match(pid, d.doc_id, h.toLong)
                }
                entries = ((d.doc_id, d.sig, d.ts.getTime) :: entries)
                  .take(maxPerBucket)
              }
            }
            if (entries.isEmpty) state.remove()
            else {
              state.update(BucketState(entries))
              // Evict once nothing in the bucket can match anymore. The
              // natural anchor (newest entry) is kept >= the watermark by
              // the horizon filter above, and Spark 4.1.2 rejects only a
              // timeout STRICTLY below the watermark (GroupStateImpl
              // compares with `<`), so the bare anchor can never throw —
              // verified against the shipped bytecode, and a zero-
              // duration anchor==watermark state update is exercised by
              // StreamingSpec. The max() is defensive: the API contract
              // is documented as "cannot be earlier", and a future Spark
              // tightening `<` to `<=` would otherwise surface as a
              // stream-thread crash on zero/sub-millisecond horizons.
              // Entries survive `horizon + duration` either way — the
              // clamp shifts eviction by at most 1 ms.
              state.setTimeoutTimestamp(
                math.max(entries.map(_._3).max, horizon + 1L), watermark)
            }
            out.result().iterator
          }
      }
  }

  /** Continuous corpus ingest — the streaming half of incremental dedup
    * ([[graft.operators.Dedup.simhashPairsWideIncremental]], q71). Each
    * micro-batch of (doc_id, ts, text):
    *   1. drops exact-id re-deliveries (within the batch and against the
    *      persisted signature store — the at-least-once-source guard);
    *   2. near-dup matches against the corpus signatures AND within
    *      itself — the corpus is never re-paired;
    *   3. survivor-selects by connected components over the batch's
    *      pairs: a batch doc in a component touching the existing corpus
    *      drops (near-dup chains collapse transitively, the q63/q70
    *      semantics; the corpus side is immutable), a pure-batch
    *      component keeps its min-id representative;
    *   4. commits the survivors' documents and their signatures.
    *
    * State lives in TABLES, not stream state: the signature store (one
    * long per corpus doc) is all the loop carries forward, so a restart
    * resumes from the store alone and stream-state size is zero.
    * Idempotency, two layers: (a) both sinks partition by a
    * (run tag, batch id) key with dynamic partition overwrite, so a
    * within-run retry replaces its own partition instead of appending
    * twice (batchId alone would clobber older runs — a fresh checkpoint
    * restarts it at 0); (b) the exact-id guard makes cross-restart
    * replays doc-idempotent — a replayed already-committed doc is in the
    * signature store and drops before pairing. Residual window: a crash
    * BETWEEN the corpus and signature commits replayed under a new run
    * tag can duplicate that one batch's corpus rows; a transactional
    * table format closes it. At 100 TB, store the signature table bucketed
    * ([[graft.io.TableIO.writeBucketed]]) so the exact-id anti-join and
    * the band join read co-located buckets; the per-batch work is
    * proportional to the BATCH (batch bands × matching corpus buckets),
    * never the corpus.
    */
  def incrementalIngest(docs: org.apache.spark.sql.DataFrame,
                        sigDir: String, corpusDir: String,
                        checkpointDir: String, maxHamming: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val runTag = java.util.UUID.randomUUID().toString.take(8)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        ingestBatch(batch, s"$runTag-$batchId", sigDir, corpusDir, maxHamming)
      }
      .start()
  }

  /** One [[incrementalIngest]] micro-batch, also callable on a plain
    * batch frame (the batch/stream parity the specs lock).
    */
  private[graft] def ingestBatch(batch: org.apache.spark.sql.DataFrame,
                                 batchTag: String, sigDir: String,
                                 corpusDir: String, maxHamming: Int): Unit = {
    import graft.operators.{Components, Dedup}
    val spark = batch.sparkSession
    // Explicit schema (an empty store must not hit inference), and an
    // existence probe: before the first commit the store doesn't exist
    // at all, which reads as "no corpus yet", not an error.
    val sigPath = new org.apache.hadoop.fs.Path(sigDir)
    val sigFs = sigPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sigs =
      if (sigFs.exists(sigPath))
        spark.read.schema("id LONG, sig LONG, batch_id STRING")
          .parquet(sigDir).select("id", "sig")
      else
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL("id LONG, sig LONG"))
    val fresh = batch.dropDuplicates("doc_id")
      .join(sigs.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
      .persist()
    val pairs = Dedup.simhashPairsWideIncremental(
      fresh, "doc_id", "text", sigs, maxHamming)
    val comps = Components.connectedComponents(pairs, "i", "j")
    val tainted = comps.join(sigs.select("id"), Seq("id"), "left_semi")
      .select("component").distinct()
    val losers = comps.join(tainted, Seq("component"), "left_semi")
      .select("id")
      .union(comps.filter(col("id") =!= col("component")).select("id"))
      .distinct()
    val survivors = fresh.join(losers.withColumnRenamed("id", "doc_id"),
      Seq("doc_id"), "left_anti").persist()
    // Materialize before the first commit so the signature write reads
    // the cache, not a sigDir re-scan racing its own output.
    survivors.count()
    survivors.withColumn("batch_id", lit(batchTag))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(corpusDir)
    Dedup.wideSignatures(survivors, "doc_id", "text")
      .withColumn("batch_id", lit(batchTag))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(sigDir)
    survivors.unpersist()
    fresh.unpersist()
    ()
  }

  /** Windowed per-language LENGTH-QUANTILE estimates from the
    * deterministic bottom-k sample — streaming twin of
    * [[graft.operators.Sketch.sampledQuantiles]]: per (window, lang)
    * the state is the k-pair [[graft.expressions.BottomKLongPairs]]
    * buffer plus a count, regardless of how many documents the window
    * sees — the drift monitor a corpus-ingest stream runs (exact
    * windowed quantiles would buffer every distinct length). The
    * sample key is the Knuth-mixed portable hash of doc_id, identical
    * to the batch operator, so a window's (sample, estimates) equal
    * the batch `sampledQuantiles` over that window's slice.
    *
    * @return streaming (window_start, lang, n, sample_size, p50)
    */
  def windowedLengthQuantiles(docs: org.apache.spark.sql.DataFrame,
                              langCol: String, textCol: String, tsCol: String,
                              k: Int, windowDur: String, watermark: String,
                              idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val h = pmod(pmod(TextAnalysis.polyHash(col(idCol).cast("string")),
      lit(2147483648L)) * 2654435761L, lit(4294967296L))
    val sk = toColumn(graft.expressions.BottomKLongPairs(
      toExpression(h), toExpression(length(col(textCol)).cast("long")), k)
      .toAggregateExpression())
    docs.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"), col(langCol))
      .agg(count(lit(1)).as("n"), sk.as("__sk"))
      .withColumn("sample_size", size(col("__sk")).cast("long"))
      .withColumn("__vals",
        array_sort(transform(col("__sk"), p => p.getField("v"))))
      .select(col("__win.start").as("window_start"), col(langCol), col("n"),
        col("sample_size"),
        when(col("sample_size") > 0,
          expr("element_at(__vals, CAST((sample_size * 1 - 1) DIV 2 + 1 AS INT))"))
          .as("p50"))
  }

  /** Windowed token-frequency COUNT-MIN over the document stream —
    * streaming twin of [[graft.operators.Sketch.countMinTable]], and the
    * reason that sketch merges by addition: per event-time window the
    * streaming aggregate keeps d·w counters, REGARDLESS of how many
    * distinct tokens the stream carries — an exact windowed token count
    * would hold |window vocabulary| keys of state (unbounded on a web
    * stream), while this state is a constant a streaming heavy-hitter /
    * trending-terms monitor can hold forever. Same Carter–Wegman bucket
    * formula as the batch table, so a window's sketch rows are
    * BIT-IDENTICAL to `countMinTable` over that window's batch slice
    * (parity test-locked), and [[graft.operators.Sketch.cmsEstimate]]
    * probes them unchanged.
    *
    * The watermark bounds window state lifetime the usual way; append
    * mode emits each window's final sketch once the watermark passes.
    *
    * @return streaming (window_start, row, bucket, cnt)
    */
  def windowedTokenCountMin(docs: org.apache.spark.sql.DataFrame,
                            textCol: String, tsCol: String, d: Int, w: Int,
                            windowDur: String, watermark: String): org.apache.spark.sql.DataFrame = {
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(TextAnalysis.tokens(col(textCol))).as("__token"))
      .select(col(tsCol),
        TextAnalysis.polyHash(col("__token")).as("__h0"))
      .select(col(tsCol), col("__h0"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .groupBy(window(col(tsCol), windowDur).as("__win"), col("row"),
        graft.operators.Sketch.cmsBucket(col("__h0"), col("row"), d, w)
          .as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("__win.start").as("window_start"), col("row"),
        col("bucket"), col("cnt"))
  }

  /** Windowed MEDIA-GATE scorecard over a binary-payload stream —
    * streaming twin of the q336 batch gate (round-14 brief task 7):
    * per (event-time window, format — unparseable bucketed under its
    * own key) the keep / reason counts from the REAL codec-free header
    * kernel. The gate columns are
    * [[graft.operators.Multimodal.gateCounts]], SHARED with the batch
    * scorecard (the wideBandNib discipline — batch and stream can
    * never gate differently), so a window's rows equal the batch gate
    * over that window's slice (parity test-locked).
    *
    * Scale shape: a pure map-side projection (one kernel call per
    * payload, bytes never shuffle) into a windowed count aggregate —
    * state is one row per (window, format), bounded by the format
    * universe, not the stream.
    *
    * @return streaming (window_start, format, n_docs, n_keep,
    *         n_not_allowed, n_too_small, n_bad_aspect)
    */
  def windowedMediaGate(media: org.apache.spark.sql.DataFrame,
                        contentCol: String, tsCol: String,
                        windowDur: String, watermark: String,
                        minDim: Long = 64L, maxAspect: Long = 4L,
                        allowed: Seq[String] = Seq("png", "jpeg")): org.apache.spark.sql.DataFrame = {
    val cs = graft.operators.Multimodal.gateCounts(col("__h.format"),
      col("__h.width"), col("__h.height"), minDim, maxAspect, allowed)
    media.select(col(tsCol),
        graft.functions.mediaHeader(col(contentCol)).as("__h"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"),
        coalesce(col("__h.format"), lit("unparseable")).as("format"))
      .agg(cs.head, cs.tail: _*)
      .select(col("__win.start").as("window_start"), col("format"),
        col("n_docs"), col("n_keep"), col("n_not_allowed"),
        col("n_too_small"), col("n_bad_aspect"))
  }

  /** Windowed AUDIO-QUALITY gate over a binary-payload stream — the
    * audio twin of [[windowedMediaGate]] (round 14): per (event-time
    * window, codec — unparseable under its own key) the keep / reason
    * counts AND admitted duration from the REAL PCM/G.711 sample
    * decode. The gate columns are
    * [[graft.operators.Multimodal.audioGateCounts]], SHARED with the
    * q346 batch verdict, so a window's rows equal the batch gate over
    * that window's slice (parity test-locked).
    *
    * Scale shape: one kernel call per payload (map-side; sample bytes
    * never shuffle) into a windowed count/sum aggregate — state is one
    * row per (window, codec), bounded by the codec universe.
    *
    * @return streaming (window_start, codec, n_docs, n_parseable,
    *         n_bad_rate, n_clipping, n_too_silent, n_keep,
    *         keep_duration_ms)
    */
  def windowedAudioGate(media: org.apache.spark.sql.DataFrame,
                        contentCol: String, tsCol: String,
                        windowDur: String, watermark: String,
                        minRate: Long = 16000L, maxRate: Long = 48000L,
                        clipPctMax: Long = 1L,
                        silencePctMax: Long = 20L): org.apache.spark.sql.DataFrame = {
    val cs = graft.operators.Multimodal.audioGateCounts(col("__s"),
      minRate, maxRate, clipPctMax, silencePctMax)
    media.select(col(tsCol),
        graft.functions.pcmStats(col(contentCol)).as("__s"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"),
        coalesce(col("__s.codec"), lit("unparseable")).as("codec"))
      .agg(cs.head, cs.tail: _*)
      .select(col("__win.start").as("window_start"), col("codec"),
        col("n_docs"), col("n_parseable"), col("n_bad_rate"),
        col("n_clipping"), col("n_too_silent"), col("n_keep"),
        col("keep_duration_ms"))
  }

  /** Windowed VIDEO gate over a binary-payload stream — the third
    * modality's twin beside [[windowedMediaGate]] (image) and
    * [[windowedAudioGate]] (audio), completing the set: per
    * (event-time window, container format — unparseable under its own
    * key) the keep counts AND admitted duration from the REAL MP4/AVI
    * header decode. The keep predicate and gate columns are
    * [[graft.operators.Multimodal.videoKeep]] /
    * [[graft.operators.Multimodal.videoGateCounts]], SHARED with the
    * q356 batch pipeline, so a window's rows equal the batch gate over
    * that window's slice (parity test-locked).
    *
    * Scale shape: one kernel call per payload (map-side; container
    * bytes never shuffle) into a windowed count/sum aggregate — state
    * is one row per (window, format), bounded by the format universe.
    *
    * @return streaming (window_start, format, n_docs, n_parseable,
    *         n_keep, keep_duration_ms)
    */
  def windowedVideoGate(media: org.apache.spark.sql.DataFrame,
                        contentCol: String, tsCol: String,
                        windowDur: String, watermark: String,
                        minW: Long = 16L, minH: Long = 10L,
                        minDurMs: Long = 100L): org.apache.spark.sql.DataFrame = {
    val cs = graft.operators.Multimodal.videoGateCounts(col("__h"),
      minW, minH, minDurMs)
    media.select(col(tsCol),
        graft.operators.Multimodal.videoMeta(col(contentCol)).as("__h"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"),
        coalesce(col("__h.format"), lit("unparseable")).as("format"))
      .agg(cs.head, cs.tail: _*)
      .select(col("__win.start").as("window_start"), col("format"),
        col("n_docs"), col("n_parseable"), col("n_keep"),
        col("keep_duration_ms"))
  }

  /** Windowed WEBDATASET SHARD gate over a binary-payload stream — the
    * archive-layer twin beside the image/audio/video gate triple: per
    * event-time window, the shard / member / per-modality counts and
    * member-byte mass out of the REAL tar enumeration
    * ([[graft.functions.tarMembers]] — corrupt shards parse NULL and
    * carry no member mass). Gate columns are
    * [[graft.operators.Multimodal.shardGateCounts]], SHARED with the
    * batch read, so a window's row equals the batch gate over that
    * window's slice (parity test-locked). The monitoring read an
    * ingest pipeline actually watches: arriving shard rate, members
    * per shard, modality balance, corrupt fraction.
    *
    * Scale shape: one kernel call per payload (map-side; archive bytes
    * never shuffle) into a windowed count/sum aggregate — state is one
    * row per window.
    *
    * @return streaming (window_start, n_shards, n_parseable,
    *         n_members, n_images, n_texts, member_bytes)
    */
  def windowedShardGate(media: org.apache.spark.sql.DataFrame,
                        contentCol: String, tsCol: String,
                        windowDur: String,
                        watermark: String): org.apache.spark.sql.DataFrame = {
    val cs = graft.operators.Multimodal.shardGateCounts(col("__m"))
    media.select(col(tsCol),
        graft.functions.tarMembers(col(contentCol)).as("__m"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"))
      .agg(cs.head, cs.tail: _*)
      .select(col("__win.start").as("window_start"), col("n_shards"),
        col("n_parseable"), col("n_members"), col("n_images"),
        col("n_texts"), col("member_bytes"))
  }

  /** Windowed per-SAMPLE WebDataset gate over a binary-payload stream —
    * the sample-level twin beside [[windowedShardGate]]'s shard-level
    * one, completing batch parity for the q360 path: per event-time
    * window, the keep / drop-reason counts over every (image, text)
    * SAMPLE inside the arriving shards. The per-sample rows come from
    * [[graft.operators.Multimodal.wdsSampleRows]] — pairing is array
    * arithmetic inside one payload projection, which is exactly what
    * makes this possible as a stream: no stream-stream img⋈txt join,
    * no extra state beyond one count row per window. Gate columns are
    * [[graft.operators.Multimodal.sampleGateCounts]], SHARED with the
    * batch read (and the q360 join formulation agrees with the array
    * formulation — both locked in StreamingSpec).
    *
    * @return streaming (window_start, n_samples, n_keep, n_img_drop,
    *         n_txt_drop)
    */
  def windowedSampleGate(media: org.apache.spark.sql.DataFrame,
                         contentCol: String, tsCol: String,
                         windowDur: String, watermark: String,
                         minW: Long = 12L, minTokens: Long = 3L): org.apache.spark.sql.DataFrame = {
    val cs = graft.operators.Multimodal.sampleGateCounts(
      col("__s.width"), col("__s.n_tokens"), minW, minTokens)
    media.select(col(tsCol),
        explode(graft.operators.Multimodal.wdsSampleRows(
          col(contentCol))).as("__s"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"))
      .agg(cs.head, cs.tail: _*)
      .select(col("__win.start").as("window_start"), col("n_samples"),
        col("n_keep"), col("n_img_drop"), col("n_txt_drop"))
  }

  /** Windowed INCREMENTAL image-dedup gate over a binary-payload
    * stream — the streaming face of the q366/q373 pattern: every
    * arriving image is dHashed and checked against the PUBLISHED
    * corpus signature table (a STATIC side — stream-static equi-join,
    * no stream state beyond the window counts). Radius is EXACT match
    * (Hamming 0 — the q366 batch radius): the corpus side is reduced
    * to its DISTINCT dhash set with a hit marker, so the left join is
    * multiplicity-free and each arriving image contributes exactly one
    * row. Per event-time window: arrivals, decodable, corpus-dup, and
    * new-signature counts. Batch-internal near-dups are deliberately
    * NOT the stream's business — the daily batch job (q366) resolves
    * those with the banded matcher; this gate answers the ingest-time
    * question "is this image already in the corpus?" at wire speed.
    *
    * @param corpusSigs the persisted `(id, sig)` table
    *        ([[graft.operators.Dedup.wideSignatures]]-shaped; the
    *        image case stores (img_id, dhash))
    * @return streaming (window_start, n_images, n_hashed,
    *         n_corpus_dups, n_new)
    */
  def windowedImageDedupGate(media: org.apache.spark.sql.DataFrame,
                             contentCol: String, tsCol: String,
                             corpusSigs: org.apache.spark.sql.DataFrame,
                             sigCol: String, windowDur: String,
                             watermark: String): org.apache.spark.sql.DataFrame = {
    val corpus = corpusSigs.select(col(sigCol).as("__sig")).distinct()
      .withColumn("__hit", lit(1))
    media.select(col(tsCol),
        graft.functions.pixelStats(col(contentCol))
          .getField("dhash").as("__sig"))
      .join(corpus, Seq("__sig"), "left")
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"))
      .agg(count(lit(1)).as("n_images"),
        count(col("__sig")).as("n_hashed"),
        count(col("__hit")).as("n_corpus_dups"),
        count(when(col("__sig").isNotNull && col("__hit").isNull, 1))
          .as("n_new"))
      .select(col("__win.start").as("window_start"), col("n_images"),
        col("n_hashed"), col("n_corpus_dups"), col("n_new"))
  }

  /** Windowed INCREMENTAL audio-dedup gate over a binary-payload
    * stream — the audio twin of [[windowedImageDedupGate]], restoring
    * the modality symmetry at the newest feature, and at the FULL
    * q375 batch radius (Hamming ≤ `maxHamming` over the 64-bit
    * envelope hash) rather than exact-match: every arriving clip is
    * envelope-hashed ([[graft.functions.audioHash]] — the q367/q375
    * signature) and checked against the persisted corpus signature
    * table via chained stream-static LEFT joins — one EXACT-signature
    * membership join (the image gate's shape — bounded, multiplicity-
    * free, unconditional exact recall) plus one per 16-bit band of the
    * banded machinery for the near radius. Every static side is
    * pre-reduced to one row per key, so every join is multiplicity-
    * free BY CONSTRUCTION — each arriving clip stays exactly one row
    * end to end. Pigeonhole gives near recall: at Hamming ≤ 3 over 4
    * bands, some band matches verbatim; each bucket's candidate list
    * is Hamming-VERIFIED (`exists` + bit_count) before counting. No
    * stream state beyond the window counts.
    *
    * OCCUPANCY GUARD (round 17 — the batch matchers' q378 discipline,
    * here per micro-batch): an unguarded bucket join would carry a
    * flood bucket's ENTIRE distinct-signature set on every matching
    * stream row — ~12 MB/bucket row AVERAGE at 10^11 corpus
    * signatures, unbounded under a silence/logo flood. Instead each
    * band's candidate list is capped at `maxOccupancy` BEFORE
    * collection (a per-bucket rank filter — no unbounded array is
    * ever materialized, so the static-side build itself is flood-
    * safe), with the bucket's true occupancy kept alongside. Exact
    * duplicates stay unconditionally caught by the exact-membership
    * join; NEAR recall degrades only inside saturated buckets — and
    * LOUDLY: `n_saturated` counts the hashed non-dup clips whose
    * lookups touched a saturated bucket, i.e. exactly the "new"
    * verdicts that passed through degraded near-recall.
    *
    * Callers should `.persist()` the bucketed static sides (they are
    * re-evaluated per micro-batch otherwise) — the production shape is
    * the PUBLISHED pre-banded table (q373's layout) grouped once.
    *
    * @param corpusSigs the persisted `(id, sig)` table ((doc_id,
    *        ahash) for audio — any 64-bit signature column works)
    * @return streaming (window_start, n_clips, n_hashed,
    *         n_corpus_dups, n_new, n_saturated)
    */
  def windowedAudioDedupGate(media: org.apache.spark.sql.DataFrame,
                             contentCol: String, tsCol: String,
                             corpusSigs: org.apache.spark.sql.DataFrame,
                             sigCol: String, windowDur: String,
                             watermark: String,
                             maxHamming: Int = 2,
                             maxOccupancy: Int = 32): org.apache.spark.sql.DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4 bands only guarantee recall for hamming <= 3")
    require(maxOccupancy >= 1, "occupancy cap must be positive")
    val distinctSigs = corpusSigs
      .select(col(sigCol).as("__csig")).filter(col("__csig").isNotNull)
      .distinct()
    def nibOf(sig: org.apache.spark.sql.Column, b: Int) =
      shiftrightunsigned(sig, 16 * b).bitwiseAND(lit(0xFFFFL))
    // exact membership — the bounded join saturation cannot touch
    var s = media.select(col(tsCol),
        graft.functions.audioHash(col(contentCol)).as("__sig"))
      .join(distinctSigs.select(col("__csig").as("__sig"))
        .withColumn("__exact", lit(1)), Seq("__sig"), "left")
    (0 until 4).foreach { b =>
      val withNib = distinctSigs.withColumn(s"__nib$b", nibOf(col("__csig"), b))
      // rank-then-collect: the candidate list is capped BEFORE any
      // array exists, so a flooded nib never materializes its pile
      val capped = withNib
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(s"__nib$b")).orderBy(col("__csig"))))
        .filter(col("__rk") <= maxOccupancy)
        .groupBy(col(s"__nib$b"))
        .agg(collect_list(col("__csig")).as(s"__cands$b"))
      val bucket = capped.join(
        withNib.groupBy(col(s"__nib$b"))
          .agg(count(lit(1)).as("__occ")), Seq(s"__nib$b"))
        .select(col(s"__nib$b"), col(s"__cands$b"),
          (col("__occ") > maxOccupancy).as(s"__sat$b"))
      s = s.withColumn(s"__nib$b", nibOf(col("__sig"), b))
        .join(bucket, Seq(s"__nib$b"), "left")
    }
    val dup = col("__exact").isNotNull || (0 until 4).map { b =>
      coalesce(exists(col(s"__cands$b"),
        c => bit_count(c.bitwiseXOR(col("__sig"))) <= lit(maxHamming)),
        lit(false))
    }.reduce(_ || _)
    val touchedSat = (0 until 4)
      .map(b => coalesce(col(s"__sat$b"), lit(false))).reduce(_ || _)
    s.withColumn("__dup", dup).withColumn("__touched_sat", touchedSat)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"))
      .agg(count(lit(1)).as("n_clips"),
        count(col("__sig")).as("n_hashed"),
        count(when(col("__sig").isNotNull && col("__dup"), 1))
          .as("n_corpus_dups"),
        count(when(col("__sig").isNotNull && !col("__dup"), 1))
          .as("n_new"),
        count(when(col("__sig").isNotNull && !col("__dup") &&
          col("__touched_sat"), 1)).as("n_saturated"))
      .select(col("__win.start").as("window_start"), col("n_clips"),
        col("n_hashed"), col("n_corpus_dups"), col("n_new"),
        col("n_saturated"))
  }

  /** Windowed INCREMENTAL video-dedup gate over a binary-payload
    * stream (round 17 — completing the image/audio/video gate-twin
    * triple at the dedup tier): every arriving clip's FIRST sampled
    * frame is decoded (DIB or MJPEG AVIs — [[graft.functions
    * .videoFrameStats]] with a stride past any real frame count, so
    * exactly one frame's pixels are ever touched per clip) and its
    * dHash checked against the persisted corpus signature table by
    * exact-membership equi-join — the image gate's bounded,
    * multiplicity-free shape, which a byte-unequal RE-MUX of a corpus
    * video still hits because container bytes never enter the hash
    * (q385's duplicate class, at wire speed). Undecodable clips count
    * as arrivals but carry no signature. No stream state beyond the
    * window counts.
    *
    * @param corpusSigs the persisted `(id, sig)` table (the q385 job
    *        stores (doc_id, first-frame dhash))
    * @return streaming (window_start, n_clips, n_hashed,
    *         n_corpus_dups, n_new)
    */
  def windowedVideoDedupGate(media: org.apache.spark.sql.DataFrame,
                             contentCol: String, tsCol: String,
                             corpusSigs: org.apache.spark.sql.DataFrame,
                             sigCol: String, windowDur: String,
                             watermark: String): org.apache.spark.sql.DataFrame = {
    val corpus = corpusSigs.select(col(sigCol).as("__sig")).distinct()
      .withColumn("__hit", lit(1))
    media.select(col(tsCol),
        element_at(graft.functions.videoFrameStats(col(contentCol),
          1000000), 1).getField("dhash").as("__sig"))
      .join(corpus, Seq("__sig"), "left")
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("__win"))
      .agg(count(lit(1)).as("n_clips"),
        count(col("__sig")).as("n_hashed"),
        count(col("__hit")).as("n_corpus_dups"),
        count(when(col("__sig").isNotNull && col("__hit").isNull, 1))
          .as("n_new"))
      .select(col("__win.start").as("window_start"), col("n_clips"),
        col("n_hashed"), col("n_corpus_dups"), col("n_new"))
  }

  /** Windowed heavy-hitter CANDIDATES over the token stream — streaming
    * twin of [[graft.operators.HeavyHitters.mgSummary]], and the second
    * bounded-state trending-terms path next to [[windowedTokenCountMin]]:
    * where the CMS twin answers point lookups ("how often was X?"), the
    * Misra–Gries twin answers enumeration ("WHICH tokens are hot?") with
    * ≤ k counters of state per window, token count plus n alongside.
    *
    * The summary keeps its superset guarantee (every item above
    * n/(k+1) per window is present) across micro-batch re-aggregation —
    * the merge is the same error-additive operation the batch partials
    * use. Its WEIGHTS stay batch-boundary-dependent (documented at the
    * aggregate), so unlike the CMS twin there is no bit-parity lock with
    * the batch sketch — downstream consumers recount candidates exactly
    * (the q115 composition) per window.
    *
    * @return streaming (window_start, n, mg: array<struct<item, w>>)
    */
  def windowedHeavyHitterCandidates(docs: org.apache.spark.sql.DataFrame,
                                    textCol: String, tsCol: String, k: Int,
                                    windowDur: String, watermark: String): org.apache.spark.sql.DataFrame = {
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(TextAnalysis.tokens(col(textCol))).as("__token"))
      .groupBy(window(col(tsCol), windowDur).as("__win"))
      .agg(count(lit(1)).as("n"),
        graft.operators.HeavyHitters.mgSummary(col("__token"), k).as("mg"))
      .select(col("__win.start").as("window_start"), col("n"), col("mg"))
  }

  /** Continuously-maintained aggregate snapshot — the streaming half of
    * [[graft.operators.Merge.applyAggDelta]] (q156): each micro-batch of
    * SIGNED changelog rows (sign ∈ {+1,−1} inserts/deletes) is folded
    * into a persisted (keys…, n, sums…) snapshot table; per-batch work
    * is ∝ |batch| + |groups|, the corpus is never re-read. The
    * incremental-MV loop a 100 TB stats table runs under CDC ingest.
    *
    * State lives in the snapshot TABLE (the [[incrementalIngest]]
    * discipline, zero stream state): commits are parquet partitions
    * `commit=<batchId>`, and each batch merges the delta onto the
    * LATEST COMMIT STRICTLY BELOW ITS OWN ID — so a failed batch's
    * partial partition is both invisible to the retry (which re-merges
    * onto the predecessor) and replaced by it via dynamic partition
    * overwrite: exactly-once snapshots on an at-least-once source.
    * Restarts must reuse the checkpoint (batch ids continue); a fresh
    * checkpoint needs a fresh `aggDir` — same contract as
    * [[incrementalIngest]]'s run-tag caveat. Old commits accumulate for
    * time travel until a retention sweep drops them (out of scope here).
    *
    * Metric columns follow applyAggDelta's contract: subtractable
    * BIGINTs (counts/sums — min/max need recompute or a sketch).
    *
    * @param sums (snapshot column name → changelog source column name)
    */
  def maintainedAgg(changes: org.apache.spark.sql.DataFrame, aggDir: String,
                    checkpointDir: String, keys: Seq[String],
                    signCol: String, sums: Seq[(String, String)])
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        maintainBatch(batch, batchId, aggDir, keys, signCol, sums)
      }
      .start()

  /** One [[maintainedAgg]] micro-batch (also callable on a plain batch
    * frame — the batch/stream parity the spec locks).
    */
  private[graft] def maintainBatch(batch: org.apache.spark.sql.DataFrame,
                                   batchId: Long, aggDir: String,
                                   keys: Seq[String], signCol: String,
                                   sums: Seq[(String, String)]): Unit = {
    val spark = batch.sparkSession
    val aggPath = new org.apache.hadoop.fs.Path(aggDir)
    val fs = aggPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keyFields = batch.select(keys.map(col): _*).schema.fields
    val snapSchema = org.apache.spark.sql.types.StructType(
      keyFields ++ (("n" +: sums.map(_._1)).map(n =>
        org.apache.spark.sql.types.StructField(
          n, org.apache.spark.sql.types.LongType))))
    val old =
      if (fs.exists(aggPath)) {
        val all = spark.read.schema(snapSchema.add("commit",
          org.apache.spark.sql.types.LongType)).parquet(aggDir)
          .filter(col("commit") < batchId)
        val latest = all.agg(max(col("commit"))).head.get(0)
        if (latest == null)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snapSchema)
        else all.filter(col("commit") === latest.asInstanceOf[Long])
          .drop("commit")
      } else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snapSchema)
    val merged = graft.operators.Merge.applyAggDelta(
      old, batch, keys, col(signCol), sums.map { case (n, c) => n -> col(c) })
      .persist()
    // Materialize before the commit: the write must read the cache, not
    // re-scan aggDir while its own output partition is appearing.
    merged.count()
    merged.withColumn("commit", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("commit").parquet(aggDir)
    merged.unpersist()
    ()
  }
}
