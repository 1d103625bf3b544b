package graft

import graft.io.TableIO
import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join result") {
    val facts = Seq((1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0), (3, 1.0))
      .toDF("k", "v")
    val dim = Seq((1, "hot"), (2, "warm"), (4, "unused")).toDF("k", "name")
    val plain = facts.join(dim, Seq("k"), "inner")
      .select("k", "v", "name").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), saltFactor = 4)
      .select("k", "v", "name").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted === plain)
    // left join keeps unmatched left rows exactly once
    val leftPlain = facts.join(dim, Seq("k"), "left").count()
    val leftSalted = Skew.saltedJoin(facts, dim, Seq("k"), 4, "left").count()
    assert(leftSalted === leftPlain)
  }

  test("saltedSum equals plain sum per key") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "cold" else "hot", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", saltFactor = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted === plain)
  }

  test("pre-banded bucketed signature table: exact parity, no corpus-side exchange") {
    import graft.operators.Dedup
    val corpus = Seq((10L, 0x00FF00FF00FF00FFL),
      (11L, 0x1234567812345678L), (12L, -1L)).toDF("img_id", "dhash")
    TableIO.writeBucketed(Dedup.bandRows64(corpus, "img_id", "dhash"),
      "sig_banded_test", Seq("band", "nib"), numBuckets = 8)
    val batch = Seq[(Long, java.lang.Long)](
      (100L, 0x00FF00FF00FF00FDL), (101L, 0x1234567812345678L),
      (102L, 0x0F0F0F0F0F0F0F0FL), (103L, null))
      .toDF("img_id", "dhash")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val banded = Dedup.signatureMatches64IncrementalBanded(batch,
        "img_id", "dhash", spark.table("sig_banded_test"), "img_id",
        "dhash", maxHamming = 2)
      // output contract identical to the session-built matcher
      val ref = Dedup.signatureMatches64Incremental(batch, "img_id",
        "dhash", corpus.toDF("id", "sig").select($"id".as("img_id"),
          $"sig".as("dhash")), "img_id", "dhash", maxHamming = 2)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows(banded) === rows(ref))
      assert(rows(banded).contains((10L, 100L, 1L)))
      // plan shape: the cross join's CORPUS side reads co-located
      // buckets — exactly ONE (band, nib) exchange (the batch side),
      // never two
      val cross = spark.table("sig_banded_test")
        .select($"img_id".as("i"), $"dhash".as("__si"), $"band", $"nib")
        .join(Dedup.bandRows64(batch, "img_id", "dhash")
          .select($"img_id".as("j"), $"dhash".as("__sj"),
            $"band", $"nib"), Seq("band", "nib"))
      val plan = cross.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val nExchanges =
        "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(nExchanges == 1,
        s"corpus side must not re-shuffle ($nExchanges band exchanges):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS sig_banded_test")
    }
  }

  test("guarded banded matcher: corpus reduction aggregates in place on the bucketed table") {
    import graft.operators.Dedup
    val corpus = ((0L until 40L).map(i => (i, i / 10L)) :+
      ((99L, 0x1234567812345678L))).toDF("img_id", "dhash")
    TableIO.writeBucketed(Dedup.bandRows64(corpus, "img_id", "dhash"),
      "sig_banded_guard_test", Seq("band", "nib"), numBuckets = 8)
    val batch = Seq[(Long, java.lang.Long)](
      (100L, 0L), (101L, 0x1234567812345679L), (102L, null))
      .toDF("img_id", "dhash")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the per-(band, nib, sig) reduction groups by a SUPERSET of the
      // bucket keys — it must aggregate with NO exchange, so a stored
      // flood collapses to one row per bucket before any join sees it
      val reps = spark.table("sig_banded_guard_test")
        .groupBy($"band", $"nib", $"dhash")
        .agg(min($"img_id"), count(lit(1)))
      val plan = reps.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed reduction must not shuffle:\n$plan")
      // and the guarded banded matcher matches the session-built guard
      // on the published table end-to-end
      val got = Dedup.signatureMatches64IncrementalBandedGuarded(
        batch, "img_id", "dhash", spark.table("sig_banded_guard_test"),
        "img_id", "dhash", maxHamming = 2, maxOccupancy = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ref = Dedup.signatureMatches64IncrementalGuarded(
        batch, "img_id", "dhash", corpus, "img_id", "dhash",
        maxHamming = 2, maxOccupancy = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === ref)
      assert(got.contains((0L, 100L, 0L))) // representative, min corpus holder
      assert(got.contains((99L, 101L, 1L))) // near pair through clear buckets
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS sig_banded_guard_test")
    }
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val a = (1 to 1000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong % 100, i * 2.0)).toDF("k", "vb")
    TableIO.writeBucketed(a, "bucketed_a", Seq("k"), numBuckets = 8)
    TableIO.writeBucketed(b, "bucketed_b", Seq("k"), numBuckets = 8)
    // disable auto-broadcast so the test can't pass vacuously via BHJ
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      // a real shuffle-join shape, but co-located buckets: no exchange
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }
}
