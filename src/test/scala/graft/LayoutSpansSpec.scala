package graft

import graft.operators.{Layout, Profiling, Spans}
import org.apache.spark.sql.functions._

/** Z-order layout, repeated-span coverage, and the table checksum. */
class LayoutSpansSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ Layout

  test("rendezvousShard: balanced, and a resize moves only winners of the new shard") {
    val keys = (1 to 10000).map(i => s"key$i").toDF("k")
    val both = keys.select(
      Layout.rendezvousShard(col("k"), 8).as("s8"),
      Layout.rendezvousShard(col("k"), 9).as("s9")).collect()
    // shard 0..7 each get roughly 1/8 of the keys
    val byShard = both.groupBy(_.getInt(0)).map { case (s, rs) => s -> rs.length }
    assert(byShard.keySet === (0 until 8).toSet)
    byShard.values.foreach(c => assert(c > 800 && c < 1700, s"imbalance: $byShard"))
    // minimal disruption: a key that moves moves TO the new shard only
    val moved = both.filter(r => r.getInt(0) != r.getInt(1))
    moved.foreach(r => assert(r.getInt(1) === 8))
    // expected move fraction 1/9 ≈ 11%
    assert(moved.length > 500 && moved.length < 1800, s"moved=${moved.length}")
  }

  test("zValue interleaves bits: x=3,y=1 at 2 bits → 0b0111") {
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.zValue(2, col("x"), col("y")).as("z"))
      .head.getLong(0)
    assert(z === 7L)
  }

  test("zValue places bit b of col i at position b*k+i (3 columns)") {
    // x=1 (bit0 → out bit 0), y=1 (bit0 → out bit 1), w=2 (bit1 → out bit 5)
    val z = Seq((1L, 1L, 2L)).toDF("x", "y", "w")
      .select(Layout.zValue(2, col("x"), col("y"), col("w")).as("z"))
      .head.getLong(0)
    assert(z === (1L | 2L | 32L))
  }

  test("clusterByZ preserves rows and yields the requested partition count") {
    val grid = for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val out = Layout.clusterByZ(df, 4, 4, col("x"), col("y"))
    assert(out.rdd.getNumPartitions === 4)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      === grid.sorted)
  }

  test("clusterByZ partitions bound both dimensions (quadrant locality)") {
    // 16×16 grid into 4 z-ranges: every partition's bounding box must be
    // far tighter than a 1-D sort's full-width stripes in the other dim.
    val grid = for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)
    val boxes = Layout.clusterByZ(grid.toDF("x", "y"), 4, 4, col("x"), col("y"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(boxes.nonEmpty)
    // A contiguous quarter of the 4-bit z-curve stays inside one 8×8
    // quadrant plus at most a straddled boundary; both extents < 16 means
    // parquet min/max stats prune on EITHER column, the layout's point.
    boxes.foreach { r =>
      assert(r.getLong(1) <= 8, s"x extent too wide: $r")
      assert(r.getLong(2) <= 8, s"y extent too wide: $r")
    }
  }

  test("zValue rejects bit budgets that overflow a long") {
    intercept[IllegalArgumentException] {
      Layout.zValue(32, col("x"), col("y"))
    }
  }

  // ------------------------------------------------------------- Spans

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("repeatedSpanCoverage marks positions under shared trigrams only") {
    val out = Spans.repeatedSpanCoverage(
      docs(1L -> "a b c d e", 2L -> "x b c d y", 3L -> "zz qq"),
      "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    // "b c d" is the only trigram in ≥2 docs; it covers token positions
    // 1..3 in both docs. Doc 3 is too short for any trigram.
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 5L, 3L), (2L, 5L, 3L), (3L, 2L, 0L)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.6, 0.6, 0.0))
  }

  test("repeatedSpanCoverage unions overlapping windows exactly") {
    val out = Spans.repeatedSpanCoverage(
      docs(1L -> "a b c d", 2L -> "a b c d"), "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    // Windows "a b c" and "b c d" overlap on positions 1-2: coverage is
    // the union (4 tokens), not 2×3 window-size sums.
    out.foreach { r =>
      assert(r.getLong(2) === 4L)
      assert(r.getDouble(3) === 1.0)
    }
  }

  test("repeatedSpanCoverage ignores within-doc repeats (distinct docs)") {
    val out = Spans.repeatedSpanCoverage(
      docs(1L -> "p q r p q r", 2L -> "unrelated words here entirely"),
      "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    // "p q r" repeats inside doc 1 only — df counts DISTINCT docs, so
    // nothing qualifies.
    assert(out.forall(_.getLong(2) === 0L))
  }

  test("repeatedSpanCoverage general minDocs path counts distinct docs") {
    // "b c d" occurs in 3 docs, "a b c" in 2 — minDocs=3 keeps only the
    // former, covering positions 1..3 of docs 1-2 and 0..2 of doc 3.
    val out = Spans.repeatedSpanCoverage(
      docs(1L -> "a b c d", 2L -> "a b c d e", 3L -> "b c d z"),
      "doc_id", "text", n = 3, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 3L, 3L))
  }

  test("repeatedSpanCoverage plans no distinct aggregate on the gram key") {
    // The df-filter must stay a plain min/max hash aggregate: a
    // count(distinct doc) keyed by the gram funnels every (hot gram, doc)
    // row through one reducer — the 100 TB boilerplate-trigram skew this
    // operator exists to avoid.
    val plan = Spans.repeatedSpanCoverage(
      docs(1L -> "a b c d", 2L -> "a b c d"), "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("distinct __id"), plan)
  }

  test("removeRepeatedSpans excises covered tokens and rebuilds the text") {
    val out = Spans.removeRepeatedSpans(
      docs(1L -> "a b c d e", 2L -> "x b c d y", 3L -> "zz qq"),
      "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // "b c d" covers positions 1..3 in docs 1 and 2; doc 3 untouched.
    assert(out.toSeq === Seq(
      (1L, 5L, 3L, "a e"), (2L, 5L, 3L, "x y"), (3L, 2L, 0L, "zz qq")))
  }

  test("removeRepeatedSpans: full coverage yields empty cleaned text") {
    val out = Spans.removeRepeatedSpans(
      docs(1L -> "a b c d", 2L -> "a b c d"), "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getLong(2) === 4L)
      assert(r.getString(3) === "")
    }
  }

  test("removeRepeatedSpans n_removed agrees with repeatedSpanCoverage") {
    val d = docs(1L -> "p q r s t u", 2L -> "q r s x p q r", 3L -> "r s t u p")
    val cov = Spans.repeatedSpanCoverage(d, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val rem = Spans.removeRepeatedSpans(d, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(cov.toSeq === rem.toSeq)
  }

  // ---------------------------------------------------------- checksum

  test("tableChecksum is order- and partitioning-insensitive") {
    val df = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "s1", "s2")
    val cols = Seq(col("id"), col("s1"), col("s2"))
    val base = Profiling.tableChecksum(df, cols: _*).head
    val shuffled = Profiling.tableChecksum(
      df.orderBy(desc("id")).repartition(7), cols: _*).head
    assert(base.getLong(0) === 3L)
    assert(base.getDecimal(1) === shuffled.getDecimal(1))
  }

  test("tableChecksum detects a single-row change") {
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b = Seq((1L, "a"), (2L, "B")).toDF("id", "s")
    val ca = Profiling.tableChecksum(a, col("id"), col("s")).head.getDecimal(1)
    val cb = Profiling.tableChecksum(b, col("id"), col("s")).head.getDecimal(1)
    assert(ca !== cb)
  }

  test("compactionPlan: greedy sequential bins, order preserved, last-item overflow only") {
    import spark.implicits._
    // sizes within one group: 3,4,5,9,2 with target 6 →
    // cum:  3 7 12 21 23 ; bin = (cum−size)/6: 0 0 1 2 3
    val df = Seq(("g", 1L, 3L), ("g", 2L, 4L), ("g", 3L, 5L),
      ("g", 4L, 9L), ("g", 5L, 2L)).toDF("grp", "ord", "sz")
    val plan = Layout.compactionPlan(df, "grp", "ord", "sz", target = 6L)
      .orderBy("ord").collect()
    assert(plan.map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 1L, 1L), (4L, 2L, 1L), (5L, 3L, 1L)))
    // bins are contiguous runs: within a bin, positions count 1..n
    val byBin = plan.groupBy(_.getLong(3)).view.mapValues(_.map(_.getLong(4)).sorted.toSeq)
    assert(byBin.forall { case (_, ps) => ps == (1L to ps.length) })
  }

  test("compactionPlan: groups bin independently") {
    import spark.implicits._
    val df = Seq(("a", 1L, 7L), ("b", 1L, 7L), ("a", 2L, 5L), ("b", 2L, 5L))
      .toDF("grp", "ord", "sz")
    val plan = Layout.compactionPlan(df, "grp", "ord", "sz", target = 6L)
      .orderBy("grp", "ord").collect()
    // each group restarts at bin 0 (the 7 overflows it); the next item
    // starts at offset 7 ≥ 6 → bin 1 — cumulative state never crosses
    // group boundaries
    assert(plan.map(r => (r.getString(0), r.getLong(3))).toSeq ==
      Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L)))
  }

  test("distributionDrift: exact TVD numerators, headline 0.5 on a mirrored mix") {
    import spark.implicits._
    // ref: 3×A 1×B; batch: 1×A 3×B → per-bin |n_ref·M − n_batch·N| = 8,
    // TVD = 16/(2·4·4) = 0.5
    val df = (Seq.fill(3)(("A", true)) ++ Seq(("B", true)) ++
      Seq(("A", false)) ++ Seq.fill(3)(("B", false)))
      .toDF("bin", "is_ref")
    val got = Profiling.distributionDrift(df, "bin", col("is_ref"))
      .orderBy("bin").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("A", 3L, 1L), ("B", 1L, 3L)))
    assert(got.map(_.getDecimal(5).longValueExact()).toSeq == Seq(8L, 8L))
    assert(got.forall(_.getDouble(6) == 0.5))
    assert(got.head.getDouble(3) == 0.75 && got.head.getDouble(4) == 0.25)
  }

  test("datasheet: one-row card with volume, diversity, and hygiene counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world", "en", "a", 11L),
      (2L, "hello world", "en", "b", 11L),             // exact dup of 1
      (3L, "short", "de", "a", 5L),                    // short
      (4L, "mail me at x@y.io today", "en", "a", 23L)  // PII
    ).toDF("id", "text", "lang", "source", "n_chars")
    val r = Profiling.datasheet(docs, "text", "lang", "source",
      lenChars = col("n_chars"), shortBelowChars = 10L).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 10L, 50L))
    assert((r.getLong(3), r.getLong(4)) == (2L, 2L))      // langs, sources
    assert(r.getLong(5) == 1L)                            // one dup doc
    assert(r.getLong(6) == 1L && r.getLong(7) == 1L)      // short, pii
    assert(r.getDouble(8) == 12.5)
  }

  test("leaveOneOutMeans: closed-form LOO deltas from one pass") {
    import spark.implicits._
    // source a: 2 of 3 pass; source b: 0 of 1 → overall 2/4
    val df = Seq(("a", 1L), ("a", 1L), ("a", 0L), ("b", 0L))
      .toDF("src", "pass")
    val got = Profiling.leaveOneOutMeans(df, "src", col("pass"))
      .orderBy("src").collect()
    val a = got(0); val b = got(1)
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L)
    assert(a.getDouble(4) == 0.5 && a.getDouble(5) == 0.0)
    assert(a.getDouble(6) == 0.5)   // removing a drops the corpus to 0
    assert(b.getDouble(5) == 2.0 / 3 && b.getDouble(6) == 0.5 - 2.0 / 3)
  }

  test("leaveOneOutMeans: a group that is the whole corpus has NULL mean_without") {
    import spark.implicits._
    val df = Seq(("only", 1L), ("only", 0L)).toDF("src", "pass")
    val got = Profiling.leaveOneOutMeans(df, "src", col("pass")).head
    assert(got.isNullAt(5) && got.isNullAt(6))
  }

  test("wasserstein1PerGroup: exact W1 on a hand-computed shift") {
    import spark.implicits._
    // group a: {0, 0}; group b: {2} → distributions δ₀ vs δ₂, W1 = 2.
    // Cross-multiplied: support {0,2}, gap 2; at x=0: Ca=2, C_rest=0 →
    // |2·1 − 0·2|·2 = 4; den = 2·1 = 2 → W1 = 2 exactly.
    val df = Seq(("a", 0L), ("a", 0L), ("b", 2L)).toDF("src", "len")
    val got = Profiling.wasserstein1PerGroup(df, "src", col("len"))
      .orderBy("src").collect()
    val a = got(0); val b = got(1)
    assert(a.getString(2) == "4" && a.getString(3) == "2")
    assert(a.getLong(4) == 2L * 1073741824L && a.getDouble(5) == 2.0)
    // symmetric: b vs rest is the same transport
    assert(b.getString(2) == "4" && b.getString(3) == "2")
    assert(b.getDouble(5) == 2.0)
  }

  test("wasserstein1PerGroup: identical distributions score zero; " +
    "single-group corpus yields NULL quantiles") {
    import spark.implicits._
    val same = Seq(("a", 1L), ("a", 5L), ("b", 1L), ("b", 5L))
      .toDF("src", "len")
    val got = Profiling.wasserstein1PerGroup(same, "src", col("len"))
      .orderBy("src").collect()
    assert(got.forall(_.getString(2) == "0"))
    assert(got.forall(_.getLong(4) == 0L))
    val solo = Seq(("only", 1L), ("only", 2L)).toDF("src", "len")
    val s = Profiling.wasserstein1PerGroup(solo, "src", col("len")).head
    assert(s.getString(3) == "0" && s.isNullAt(4) && s.isNullAt(5))
  }

  test("wasserstein1PerGroup: an unquantized support fails loud, not a mega-grid") {
    import spark.implicits._
    // 6 distinct values under maxSupport=4 → the quantize-first contract
    // trips BEFORE any grid is built (ADVICE r10: it was scaladoc-only)
    val raw = Seq(("a", 10L), ("a", 21L), ("a", 32L),
      ("b", 43L), ("b", 54L), ("b", 65L)).toDF("src", "len")
    val e = intercept[IllegalArgumentException] {
      Profiling.wasserstein1PerGroup(raw, "src", col("len"), maxSupport = 4)
    }
    assert(e.getMessage.contains("quantize"))
    // coarsely quantized, the same call fits the contract
    val ok = Profiling.wasserstein1PerGroup(
      raw, "src", graft.functions.floorDivLit(col("len"), 32L),
      maxSupport = 4)
    assert(ok.count() === 2L)
  }

  test("distributionDrift: empty slice yields NULL tvd, not a division blowup") {
    import spark.implicits._
    val df = Seq(("A", true), ("B", true)).toDF("bin", "is_ref")
    val got = Profiling.distributionDrift(df, "bin", col("is_ref")).collect()
    assert(got.forall(_.isNullAt(6)) && got.forall(_.isNullAt(4)))
    assert(got.forall(!_.isNullAt(3)))
  }

  test("runsTest: exact run count across block boundaries") {
    import graft.operators.Layout
    // sequence over ids 0..9: T T F F F T F T T T -> runs = 5
    val attrs = Seq(true, true, false, false, false, true, false, true,
      true, true)
    val d = attrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "a")
    // bucket width 1 forces EVERY adjacency across a block boundary in
    // the histogram-offset plan when Block=4096 keeps them in one block;
    // exercise the cross-block path with DIV 1 buckets anyway
    val r = Layout.runsTest(d, expr("id DIV 3"), Seq(col("id")), col("a"))
      .collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n1") === 6L && r.getAs[Long]("n2") === 4L)
    assert(r.getAs[Long]("runs") === 5L)
    // E[R] = 1 + 2*6*4/10 = 5.8
    assert(math.abs(r.getAs[Double]("expected_runs") - 5.8) < 1e-12)
  }

  test("encodingAdvisor: runs and NDV drive the verdict; NULL runs count") {
    import graft.operators.Layout
    // col a: one long run of 'x' then one of NULL -> 2 runs over 32 rows
    //   -> rle (2*8 <= 32)
    // col b: 2 distinct values alternating -> 32 runs, ndv 2
    //   -> dict (2*16 <= 32)
    // col c: all distinct -> 32 runs, 32 ndv -> plain
    val rows = (0L until 32L).map { i =>
      (i, if (i < 16) "x" else null, if (i % 2 == 0) "p" else "q", s"u$i")
    }
    val d = rows.toDF("id", "a", "b", "c")
    val r = Layout.encodingAdvisor(d, expr("id DIV 8"), Seq(col("id")),
      Seq("a", "b", "c")).orderBy("column").collect()
    val byCol = r.map(x => x.getAs[String]("column") -> x).toMap
    assert(byCol("a").getAs[Long]("runs") === 2L)
    assert(byCol("a").getAs[String]("recommended") === "rle")
    assert(byCol("a").getAs[Long]("ndv") === 1L) // NULLs not in NDV
    assert(byCol("b").getAs[Long]("runs") === 32L)
    assert(byCol("b").getAs[String]("recommended") === "dict")
    assert(byCol("c").getAs[Long]("ndv") === 32L)
    assert(byCol("c").getAs[String]("recommended") === "plain")
  }

  test("runsTest: perfectly alternating and single-class sequences") {
    import graft.operators.Layout
    val alt = (0L until 8L).map(i => (i, i % 2 == 0L)).toDF("id", "a")
    val r = Layout.runsTest(alt, expr("id DIV 4"), Seq(col("id")), col("a"))
      .collect()(0)
    assert(r.getAs[Long]("runs") === 8L) // maximum runs
    assert(r.getAs[Double]("z") > 0.0)   // more runs than expected
    val mono = (0L until 5L).map(i => (i, true)).toDF("id", "a")
    val m = Layout.runsTest(mono, expr("id DIV 4"), Seq(col("id")), col("a"))
      .collect()(0)
    assert(m.getAs[Long]("runs") === 1L)
    assert(m.isNullAt(m.fieldIndex("z"))) // one class: no variance
  }

  test("duplicatedRuns: planted long repeat reads as ONE run of its " +
    "full length; within-doc repeats count; zeros elsewhere") {
    // the ExactSubstr property fixed-k coverage can't express: a
    // 12-token block repeated across two docs must surface max_run=12
    // (11-token windows at starts 0,1 merge), not just "covered"
    val block = (0 until 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $block gamma"),
      (2L, s"$block delta"),
      (3L, "entirely unique tokens here nothing repeats at all okay"),
      // within-doc repeat: one doc, the 4-token phrase twice with
      // minLen=4 -> suffix-array semantics say DUPLICATED
      (4L, "p q r s xx p q r s"),
      (5L, "")).toDF("id", "text")
    val got = Spans.duplicatedRuns(docs, "id", "text", minLen = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_tokens"),
          r.getAs[Long]("n_runs"), r.getAs[Long]("max_run")))).toMap
    // doc1: 15 tokens (alpha beta + 12 + gamma), block at positions
    // 2..13 -> one 12-token run
    assert(got(1L) === ((15L, 12L, 1L, 12L)))
    // doc2: block at 0..11 -> one 12-token run of 13 tokens
    assert(got(2L) === ((13L, 12L, 1L, 12L)))
    assert(got(3L) === ((9L, 0L, 0L, 0L)))
    // doc4: "p q r s" at starts 0 and 5 (9 tokens total): two runs of
    // 4 (they don't touch: positions 0-3 and 5-8)
    assert(got(4L) === ((9L, 8L, 2L, 4L)))
    assert(got(5L) === ((0L, 0L, 0L, 0L)))
    // dup_frac: doc2 = floor(12*2^20/13); empty doc NULL
    val fr = Spans.duplicatedRuns(docs, "id", "text", minLen = 4)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(fr(2L).getAs[Long]("dup_frac_q20") === 12L * 1048576L / 13L)
    assert(fr(5L).isNullAt(fr(5L).fieldIndex("dup_frac_q20")))
    // touching repeats merge: "a b c d a b c d a b c d" minLen=4 —
    // every 4-window repeats (12 tokens, starts 0..8 all duplicated)
    val chain = Seq((9L, "a b c d a b c d a b c d")).toDF("id", "text")
    val ch = Spans.duplicatedRuns(chain, "id", "text", minLen = 4)
      .collect()(0)
    assert(ch.getAs[Long]("n_dup_tokens") === 12L)
    assert(ch.getAs[Long]("n_runs") === 1L)
    assert(ch.getAs[Long]("max_run") === 12L)
  }

  test("removeDuplicatedRuns: excises exactly duplicatedRuns' covered " +
    "mass; cleaned text is the kept tokens in order") {
    val block = (0 until 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $block gamma"),
      (2L, s"$block delta"),
      (3L, "entirely unique tokens here nothing repeats at all okay"),
      (4L, "p q r s xx p q r s")).toDF("id", "text")
    val cleaned = Spans.removeDuplicatedRuns(docs, "id", "text", minLen = 4)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val runs = Spans.duplicatedRuns(docs, "id", "text", minLen = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("n_dup_tokens")).toMap
    // shared covered set: n_removed == n_dup_tokens, every doc
    (1L to 4L).foreach { id =>
      assert(cleaned(id).getAs[Long]("n_removed") === runs(id), s"doc $id")
    }
    assert(cleaned(1L).getAs[String]("cleaned") === "alpha beta gamma")
    assert(cleaned(2L).getAs[String]("cleaned") === "delta")
    assert(cleaned(3L).getAs[String]("cleaned") ===
      "entirely unique tokens here nothing repeats at all okay")
    assert(cleaned(4L).getAs[String]("cleaned") === "xx")
    // an all-duplicated doc cleans to ""
    val all = Seq((9L, "a b c d a b c d a b c d")).toDF("id", "text")
    val c9 = Spans.removeDuplicatedRuns(all, "id", "text", minLen = 4)
      .collect()(0)
    assert(c9.getAs[String]("cleaned") === "")
    assert(c9.getAs[Long]("n_removed") === 12L)
  }

  test("duplicatedRuns: scala-side reference on a fuzz corpus") {
    val rnd = new scala.util.Random(335L)
    val vocab = ('a' to 'f').map(_.toString)
    val docs = (1 to 30).map { i =>
      (i.toLong, (0 until (3 + rnd.nextInt(25)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val minLen = 3
    // reference: exact gram counting + interval union
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    toks.values.foreach(tk => tk.sliding(minLen).filter(_.size == minLen)
      .foreach(g => counts(g) = counts.getOrElse(g, 0) + 1))
    def ref(id: Long): (Long, Long, Long) = {
      val tk = toks(id)
      val starts = tk.sliding(minLen).zipWithIndex
        .collect { case (g, p) if g.size == minLen && counts(g) >= 2 => p }
        .toSeq
      val cov = starts.flatMap(p => p until p + minLen).toSet
      // runs over covered positions
      val runs = cov.toSeq.sorted.foldLeft(Seq.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && acc.last._2 == p - 1 =>
          acc.init :+ (acc.last._1, p)
        case (acc, p) => acc :+ (p, p)
      }
      (cov.size.toLong, runs.size.toLong,
        if (runs.isEmpty) 0L else runs.map(r => r._2 - r._1 + 1).max.toLong)
    }
    val got = Spans.duplicatedRuns(docs.toDF("id", "text"), "id", "text",
        minLen)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_dup_tokens"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("max_run")))).toMap
    docs.foreach { case (id, _) =>
      assert(got(id) === ref(id), s"doc $id: '${toks(id).mkString(" ")}'")
    }
    assert(got.values.exists(_._1 > 0L)) // fuzz actually hit repeats
  }
}
