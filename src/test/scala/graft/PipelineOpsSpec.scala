package graft

import graft.operators.{BloomPrune, Cdc, Chunking, Merge, Normalize, Profiling, Similarity}
import org.apache.spark.sql.functions._

/** Unit coverage for the round-5 pipeline operators: changelog compaction
  * (Merge), snapshot diff (Cdc), histogram profiling, per-group z-score,
  * fixed chunking, and ANN recall evaluation.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- Merge

  test("latestByKey keeps the greatest version per key") {
    val log = Seq(
      ("a", 1L, 10L, "v1"), ("a", 3L, 11L, "v3"), ("a", 2L, 12L, "v2"),
      ("b", 5L, 13L, "w5")).toDF("k", "ver", "seq", "payload")
    val out = Merge.latestByKey(log, Seq("k"), Seq("ver", "seq"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSeq ===
      Seq(("a", 3L, "v3"), ("b", 5L, "w5")))
  }

  test("latestByKey breaks version ties by the later version column") {
    val log = Seq(("a", 1L, 10L, "lo"), ("a", 1L, 20L, "hi"))
      .toDF("k", "ver", "seq", "payload")
    val out = Merge.latestByKey(log, Seq("k"), Seq("ver", "seq")).collect()
    assert(out.length === 1 && out.head.getString(3) === "hi")
  }

  test("upsert overrides base rows and appends new keys") {
    val base = Seq(("a", 1L, "old"), ("b", 1L, "keep")).toDF("k", "ver", "v")
    val updates = Seq(("a", 2L, "new"), ("c", 1L, "add")).toDF("k", "ver", "v")
    val out = Merge.upsert(base, updates, Seq("k"), Seq("ver"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("a", "new"), ("b", "keep"), ("c", "add")))
  }

  test("latestByKey plan is a hash aggregate, not a window sort") {
    val log = Seq(("a", 1L, "x")).toDF("k", "ver", "v")
    val plan = Merge.latestByKey(log, Seq("k"), Seq("ver"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked into plan:\n$plan")
  }

  // --------------------------------------------------------------- Cdc

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "price")
    val b = Seq((2L, 20.0), (3L, 33.0), (4L, 40.0)).toDF("id", "price")
    val out = Cdc.snapshotDiff(a, b, Seq("id"), Seq("price"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
    val changed = out(1)
    assert(changed.getDouble(2) === 30.0 && changed.getDouble(3) === 33.0)
  }

  test("snapshotDiff is null-safe on compare columns") {
    val a = Seq((1L, Some(1.0)), (2L, None), (3L, None))
      .toDF("id", "price")
    val b = Seq((1L, None), (2L, None), (3L, Some(3.0)))
      .toDF("id", "price")
    val out = Cdc.snapshotDiff(a, b, Seq("id"), Seq("price"))
      .orderBy("id").collect()
    // NULL vs NULL (id 2) is unchanged; value↔NULL flips are changed.
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "changed"), (3L, "changed")))
  }

  // --------------------------------------------------------- Profiling

  test("histogram buckets, clamps overflow, and tracks min/max") {
    val df = Seq(0L, 5L, 10L, 19L, 25L, 999L).toDF("v")
    val out = Profiling.histogram(df, col("v"), width = 10, maxBucket = 2)
      .orderBy("bucket").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ===
      Seq((0L, 0L, 2L, 0L, 5L), (1L, 10L, 2L, 10L, 19L),
        (2L, 20L, 2L, 25L, 999L)))
  }

  // --------------------------------------------------------- Normalize

  test("zscoreByGroup normalizes within each group; n=1 group is NULL") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("solo", 7.0))
      .toDF("grp", "x")
    val out = Normalize.zscoreByGroup(df, Seq("grp"), "x")
      .orderBy("grp", "x").collect()
    val zs = out.filter(_.getString(0) == "g").map(_.getDouble(2))
    assert(math.abs(zs(0) + 1.0) < 1e-12 && math.abs(zs(1)) < 1e-12 &&
      math.abs(zs(2) - 1.0) < 1e-12)
    assert(out.filter(_.getString(0) == "solo").head.isNullAt(2))
  }

  test("zscoreByGroup plan has no Window operator") {
    val df = Seq(("g", 1.0)).toDF("grp", "x")
    val plan = Normalize.zscoreByGroup(df, Seq("grp"), "x")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked into plan:\n$plan")
  }

  // ---------------------------------------------------------- Chunking

  test("fixedChunks covers the text with the right starts and lengths") {
    val df = Seq((1L, "a" * 950), (2L, "xy"), (3L, "")).toDF("id", "text")
    val out = Chunking.fixedChunks(df, "id", "text", size = 500, overlap = 100)
      .orderBy("id", "chunk_idx").collect()
    val doc1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // stride 400: starts 1, 401, 801; last chunk truncated to 150 chars
    assert(doc1 === Seq((0L, 1L, 500L), (1L, 401L, 500L), (2L, 801L, 150L)))
    val doc2 = out.filter(_.getLong(0) == 2L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(doc2 === Seq((0L, 1L, 2L)))
    assert(!out.exists(_.getLong(0) == 3L), "empty text must yield no chunks")
  }

  test("fixedChunks consecutive chunks overlap by `overlap` characters") {
    val text = (0 until 900).map(i => ('a' + i % 26).toChar).mkString
    val df = Seq((1L, text)).toDF("id", "text")
    val chunks = Chunking.fixedChunks(df, "id", "text", size = 500, overlap = 100)
      .orderBy("chunk_idx").collect()
    // stride 400 over 900 chars: chunks at 1, 401, 801 — adjacent chunks
    // share 100 characters, the final one holds the 100-char tail.
    assert(chunks.map(_.getLong(2)).toSeq === Seq(1L, 401L, 801L))
    assert(chunks.map(_.getLong(3)).toSeq === Seq(500L, 500L, 100L))
  }

  // ------------------------------------------------------- BloomPrune

  test("bloomSemiFilter never drops a matching key; empty build drops all") {
    val probe = (1L to 200L).toDF("k")
    val build = Seq(3L, 50L, 199L).toDF("bk")
    val kept = BloomPrune.bloomSemiFilter(probe, "k", build, "bk", 100L)
      .collect().map(_.getLong(0)).toSet
    assert(Set(3L, 50L, 199L).subsetOf(kept), "bloom lost a true match")
    val none = BloomPrune.bloomSemiFilter(probe, "k",
      build.filter(col("bk") < 0), "bk", 100L)
    assert(none.count() === 0L)
  }

  test("bloomPrunedJoin equals the plain join") {
    val probe = (1L to 500L).toDF("k")
    val build = Seq(7L, 8L, 480L).toDF("bk")
    val got = BloomPrune.bloomPrunedJoin(probe, "k", build, "bk", 100L)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(7L, 8L, 480L))
  }

  // ------------------------------------------------ ExactQuantiles.winsorize

  test("winsorizeByGroup clips at exact rational quantiles per group") {
    val df = (1L to 10L).map(v => ("g", v)).toDF("grp", "x")
    val out = graft.operators.ExactQuantiles
      .winsorizeByGroup(df, "grp", "x", loNum = 2, hiNum = 8, den = 10)
      .orderBy("x").collect()
    // q20 = smallest v with cum*10 >= 10*2 → 2; q80 → 8.
    assert(out.map(_.getLong(2)).toSeq ===
      Seq(2L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 8L, 8L))
  }

  // ----------------------------------------------- Components.keepCanonical

  test("keepCanonical drops every non-minimal cluster member") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val pairs = Seq((2L, 3L), (3L, 5L), (4L, 9L)).toDF("i", "j")
    val out = graft.operators.Components.keepCanonical(docs, "id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    // clusters {2,3,5} → keep 2; {4,9} → keep 4; singleton 1 survives.
    assert(out === Seq(1L, 2L, 4L))
  }

  // -------------------------------------------------------- recallAtK

  test("recallAtK counts per-query overlap, keeping zero-hit queries") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("qid", "nid")
    val approx = Seq((1L, 10L), (1L, 99L), (2L, 98L), (2L, 97L))
      .toDF("qid", "nid")
    val out = Similarity.recallAtK(exact, approx, "qid", "nid", k = 2)
      .orderBy("qid").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((1L, 1L, 0.5), (2L, 0L, 0.0)))
  }

  // ------------------------------------------------------- GroupingSets

  test("rollup cascade matches Spark's built-in Expand rollup exactly") {
    val df = Seq(
      ("en", "web", 10L), ("en", "web", 20L), ("en", "book", 5L),
      ("de", "web", 7L), (null: String, "web", 3L) // data NULL vs rollup NULL
    ).toDF("lang", "source", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .sortBy(_.toString).toSeq
    val ours = graft.operators.GroupingSets.rollup(df, Seq("lang", "source"), "v")
    val builtin = df.rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"),
        grouping_id().as("gid"))
    assert(canon(ours) === canon(builtin))
    // the data-NULL lang row at gid=0 coexists with rollup NULLs at gid>0
    assert(ours.filter(col("gid") === 0 && col("lang").isNull).count() === 1)
  }

  test("cube cascade matches Spark's built-in cube on all 2^d subsets") {
    val df = Seq(("en", "web", 1L), ("de", "book", 2L), ("en", "book", 4L))
      .toDF("lang", "source", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .sortBy(_.toString).toSeq
    val ours = graft.operators.GroupingSets.cube(df, Seq("lang", "source"), "v")
    val builtin = df.cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"),
        grouping_id().as("gid"))
    assert(canon(ours) === canon(builtin))
  }

  test("groupingSets matches built-in GROUPING SETS; rejects dup/foreign sets") {
    val df = Seq(("en", "web", 1L), ("de", "book", 2L), ("en", "book", 4L))
      .toDF("lang", "source", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .sortBy(_.toString).toSeq
    val ours = graft.operators.GroupingSets.groupingSets(
      df, Seq("lang", "source"), "v", Seq(Seq("lang"), Seq("source")))
    df.createOrReplaceTempView("gs_t")
    val builtin = spark.sql(
      """SELECT lang, source, count(1) AS n, sum(v) AS sum_v,
        |  min(v) AS min_v, max(v) AS max_v, grouping_id() AS gid
        |FROM gs_t GROUP BY GROUPING SETS ((lang), (source))""".stripMargin)
    assert(canon(ours) === canon(builtin))
    val noExpand = ours.queryExecution.optimizedPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e }
    assert(noExpand.isEmpty)
    intercept[IllegalArgumentException] {
      graft.operators.GroupingSets.groupingSets(
        df, Seq("lang", "source"), "v", Seq(Seq("lang"), Seq("lang")))
    }
    intercept[IllegalArgumentException] {
      graft.operators.GroupingSets.groupingSets(
        df, Seq("lang", "source"), "v", Seq(Seq("nope")))
    }
  }

  test("rollupDistinctKmv: cascaded sketches equal direct per-level sketches") {
    val rnd = new scala.util.Random(99)
    val df = (1 to 400).map { _ =>
      val lang = s"l${rnd.nextInt(3)}"
      val src = s"s${rnd.nextInt(4)}"
      (lang, src, rnd.nextInt(60).toLong) // hashes with plenty of cross-group dups
    }.toDF("lang", "source", "h")
    val k = 8
    val out = graft.operators.GroupingSets
      .rollupDistinctKmv(df, Seq("lang", "source"), "h", k, hashMod = 1000000007L)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getDouble(5)))
      .sortBy(_.toString)
    // direct reference: per level, bottom-k of the raw distinct hashes
    def direct(keep: Set[String], gidVal: Long) = {
      val grouped = df.collect()
        .map(r => (if (keep("lang")) Option(r.getString(0)) else None,
          if (keep("source")) Option(r.getString(1)) else None, r.getLong(2)))
        .groupBy(t => (t._1, t._2))
      grouped.map { case ((l, s), rows) =>
        val sk = rows.map(_._3).distinct.sorted.take(k)
        val hk = if (sk.length >= k) sk(k - 1) else -1L
        val est = if (sk.length < k) sk.length.toDouble
          else (k - 1).toDouble * 1000000007L / sk(k - 1)
        (l, s, gidVal, sk.length.toLong, hk, est)
      }.toSeq
    }
    val expected = (direct(Set("lang", "source"), 0L) ++
      direct(Set("lang"), 1L) ++ direct(Set(), 3L)).sortBy(_.toString)
    assert(out.toSeq === expected)
  }

  test("robustZscoreByGroup: exact median/MAD, NULL rz for spread-free groups") {
    val df = ((1L to 9L).map(v => ("a", v)) ++ Seq(("b", 7L), ("b", 7L), ("b", 7L)))
      .toDF("g", "v")
    val out = graft.operators.Normalize.robustZscoreByGroup(df, "g", "v")
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // a: median 5 (lower-median of 1..9), devs 0..4 each ≤2x → MAD 2
    val a9 = out.filter(_._1 == "a").last
    assert(a9 === (("a", 9L, 5L, 2L, Some(2.0))))
    assert(out.count(_._1 == "a") === 9)
    // b: constant group → MAD 0 → rz NULL, median still defined
    assert(out.filter(_._1 == "b").forall(t => t._3 == 7L && t._4 == 0L && t._5.isEmpty))
  }

  test("rollup/cube plans contain no Expand (the operator's reason to exist)") {
    val df = Seq(("en", "web", 3L), ("de", "book", 5L)).toDF("lang", "source", "v")
    for (plan <- Seq(
      graft.operators.GroupingSets.rollup(df, Seq("lang", "source"), "v"),
      graft.operators.GroupingSets.cube(df, Seq("lang", "source"), "v"))) {
      val expands = plan.queryExecution.optimizedPlan.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e }
      assert(expands.isEmpty,
        "the cascade must re-aggregate the finest grain, never Expand the raw scan")
    }
    // the built-in formulation DOES Expand — the guard is meaningful
    val builtin = df.cube($"lang", $"source").agg(count(lit(1)))
      .queryExecution.optimizedPlan.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e }
    assert(builtin.nonEmpty)
  }

  test("rollupDistinctKmv: empty-sketch group survives coarser levels") {
    // l0's hashes are all NULL → its finest sketch is empty. Every level
    // must still emit the l0 groups (sk_size=0), not just the finest —
    // plain explode() would drop them from the coarser re-aggregations.
    val df = Seq(
      ("l0", "s0", None: Option[Long]), ("l0", "s1", None: Option[Long]),
      ("l1", "s0", Some(7L)), ("l1", "s0", Some(9L)))
      .toDF("lang", "source", "h")
    val out = graft.operators.GroupingSets
      .rollupDistinctKmv(df, Seq("lang", "source"), "h", k = 4,
        hashMod = 1000000007L)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
        r.getLong(3)))
      .sortBy(_.toString).toSeq
    val expected = Seq(
      (Some("l0"), Some("s0"), 0L, 0L), (Some("l0"), Some("s1"), 0L, 0L),
      (Some("l1"), Some("s0"), 0L, 2L),
      (Some("l0"), None, 1L, 0L), (Some("l1"), None, 1L, 2L),
      (None, None, 3L, 2L)).sortBy(_.toString)
    assert(out === expected)
  }

  // -------------------------------------------- ExactQuantiles (multi/ntile)

  test("quantilesByGroup reads all targets off one histogram pass") {
    val df = ((1L to 10L).map(v => ("a", v)) ++ Seq(("b", 5L), ("b", 5L)))
      .toDF("g", "v")
    val out = graft.operators.ExactQuantiles
      .quantilesByGroup(df, "g", "v",
        Seq(("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4)))
      .orderBy("g").collect()
    // group a (1..10): smallest v with cum*4 >= 10*num → 3, 5, 8
    // group b (5,5): every target reads 5
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ===
      Seq(("a", 10L, 3L, 5L, 8L), ("b", 2L, 5L, 5L, 5L)))
  }

  // ---------------------------------------------------------- GlobalIds

  test("contiguousIds equals the global row_number, without its plan") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 300L).map(id => (id, rnd.nextInt(50).toLong))
      .toDF("id", "v")
    val ours = graft.operators.GlobalIds.contiguousIds(
      df, expr("v DIV 8"), Seq(col("v"), col("id")))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val naive = df.withColumn("gid",
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("v"), col("id"))) - 1).cast("long"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ours.toSeq === naive.toSeq)
    // and the corpus-facing window is bucket-partitioned, not global
    val plan = graft.operators.GlobalIds.contiguousIds(
      df, expr("v DIV 8"), Seq(col("v"), col("id")))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__b"), plan)
  }

  test("shardByOrder yields equal consecutive shards (last one ragged)") {
    val df = (0L until 100L).map(id => (id, id * 3 % 41)).toDF("id", "v")
    val out = graft.operators.GlobalIds.shardByOrder(
      df, expr("v DIV 5"), Seq(col("v"), col("id")), shardSize = 32)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(out.forall { case (gid, shard) => shard == gid / 32 })
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes === Map(0L -> 32, 1L -> 32, 2L -> 32, 3L -> 4))
  }

  test("valueNtile: tie-stable per-group buckets spanning 1..k") {
    val df = ((1L to 8L).map(v => ("a", v)) ++ Seq(("b", 9L), ("b", 9L), ("b", 1L)))
      .toDF("g", "v")
    val out = graft.operators.ExactQuantiles.valueNtile(df, "g", "v", k = 4)
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // a: 8 rows into quartiles of 2 — bucket = ceil(cum*4/8)
    assert(out.filter(_._1 == "a").map(_._3) ===
      Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
    // b: v=1 cum=1 → ceil(4/3)=2... bucket math: (1*4-1)/3+1 = 2;
    // ties at v=9 share bucket (3*4-1)/3+1 = 4
    assert(out.filter(_._1 == "b").map(_._3) === Seq(2L, 4L, 4L))
  }

  test("momentsByGroup: exact moments, NULL shape stats for constant groups") {
    val df = (Seq.fill(1)(("sym", 1L)) ++ Seq(("sym", 2L), ("sym", 3L)) ++
      Seq(("skewed", 0L), ("skewed", 0L), ("skewed", 0L), ("skewed", 4L)) ++
      Seq(("flat", 7L), ("flat", 7L))).toDF("g", "y")
    val out = graft.operators.Profiling.momentsByGroup(df, Seq("g"), col("y"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    val flat = out(0); val skewed = out(1); val sym = out(2)
    // constant group: variance 0, shape stats NULL
    assert(flat === (("flat", 2L, 7.0, 0.0, None, None)))
    // symmetric 1,2,3: mean 2, var 2/3, skew 0, excess kurtosis -1.5
    assert(sym._3 === 2.0 && math.abs(sym._4 - 2.0 / 3.0) < 1e-15)
    assert(math.abs(sym._5.get) < 1e-12 && math.abs(sym._6.get + 1.5) < 1e-12)
    // 0,0,0,4: mean 1, m2 3, m3 = 16-12+2... hand: E[y]=1, m2=(3*1+9)/4=3,
    // m3=(3*(-1)^3+27)/4=6, skew=6/(3*sqrt(3)); m4=(3*1+81)/4=21, kurt=21/9-3
    assert(skewed._3 === 1.0 && skewed._4 === 3.0)
    assert(math.abs(skewed._5.get - 6.0 / (3.0 * math.sqrt(3.0))) < 1e-12)
    assert(math.abs(skewed._6.get - (21.0 / 9.0 - 3.0)) < 1e-12)
    // population skewness agrees with Spark's float-moment builtin
    val builtin = df.filter(col("g") === "skewed").agg(expr("skewness(y)"))
      .head().getDouble(0)
    assert(math.abs(builtin - skewed._5.get) < 1e-9)
  }

  test("goldenRecord: deterministic mode, max policy, null-blind consolidation") {
    import spark.implicits._
    val df = Seq(
      // cluster 10: lang 2-2 TIE (en/de) and source 2-2 TIE (a/b) —
      // both resolve to the smallest value; sizes 5,9,7,1 → max 9
      (10L, 1L, Some("en"), Some("b"), 5L),
      (10L, 2L, Some("en"), Some("a"), 9L),
      (10L, 3L, Some("de"), Some("a"), 7L),
      (10L, 4L, Some("de"), Some("b"), 1L),
      // cluster 20: all-NULL lang stays NULL; singleton source survives
      (20L, 7L, None, Some("c"), 3L)
    ).toDF("ck", "id", "lang", "source", "sz")
    val got = Merge.goldenRecord(df, "ck", "id",
      modeCols = Seq("lang", "source"), maxCols = Seq("sz"))
      .orderBy("ck").collect()
    val rows = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), Option(r.getString(4)), Option(r.getString(5)))).toSeq
    // cluster 10: lang 2-2 tie en/de → 'de' (smallest); source 2-2 tie → 'a'
    assert(rows == Seq(
      (10L, 4L, 1L, 9L, Some("de"), Some("a")),
      (20L, 1L, 7L, 3L, None, Some("c"))))
  }
}
