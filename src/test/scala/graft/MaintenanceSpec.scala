package graft

import graft.operators.{Merge, Profiling, Similarity}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance, shard-stats pruning manifest, and
  * fixed-point MRR.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- applyAggDelta

  private val base = Seq(
    ("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L), ("c", 4L, 40L)
  ).toDF("k", "id", "v")

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))

  test("applyAggDelta equals a full recompute over base ∖ deletes ∪ inserts") {
    val deletes = base.filter(col("id") === 2L || col("id") === 3L)
    val inserts = Seq(("b", 5L, 50L), ("d", 6L, 60L)).toDF("k", "id", "v")
    val delta = deletes.withColumn("sign", lit(-1L))
      .unionByName(inserts.withColumn("sign", lit(1L)))
    val maintained = Merge.applyAggDelta(aggOf(base), delta, Seq("k"),
      col("sign"), Seq("sv" -> col("v")))
    val recomputed = aggOf(base.exceptAll(deletes).unionByName(inserts))
    assert(maintained.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(maintained).isEmpty)
  }

  test("applyAggDelta drops groups whose count reaches zero") {
    val delta = base.filter(col("k") === "b").withColumn("sign", lit(-1L))
    val out = Merge.applyAggDelta(aggOf(base), delta, Seq("k"),
      col("sign"), Seq("sv" -> col("v")))
    assert(!out.collect().map(_.getString(0)).contains("b"))
  }

  test("joinDelta equals the full old-vs-new join diff as signed multisets") {
    val a = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L)).toDF("k", "av")
    val b = Seq((1L, "x"), (2L, "y"), (2L, "z"), (4L, "w")).toDF("k", "bv")
    // delete one a-row of k=1, insert a new k=2 row; replace k=2's "y"
    val dA = a.filter(col("av") === 10L).withColumn("sign", lit(-1L))
      .unionByName(Seq((2L, 25L)).toDF("k", "av").withColumn("sign", lit(1L)))
    val dB = b.filter(col("bv") === "y").withColumn("sign", lit(-1L))
      .unionByName(Seq((2L, "y2")).toDF("k", "bv").withColumn("sign", lit(1L)))
    val delta = Merge.joinDelta(a, dA, b, dB, Seq("k"), "sign",
      Seq("av"), Seq("bv"))
    val aNew = a.exceptAll(a.filter(col("av") === 10L))
      .unionByName(Seq((2L, 25L)).toDF("k", "av"))
    val bNew = b.exceptAll(b.filter(col("bv") === "y"))
      .unionByName(Seq((2L, "y2")).toDF("k", "bv"))
    val jOld = a.join(b, "k")
    val jNew = aNew.join(bNew, "k")
    // apply the signed delta to the old join and compare multisets
    val plus = delta.filter(col("sign") === 1L).drop("sign")
    val minus = delta.filter(col("sign") === -1L).drop("sign")
    val applied = jOld.unionByName(plus).exceptAll(minus)
    assert(applied.exceptAll(jNew).isEmpty && jNew.exceptAll(applied).isEmpty)
  }

  test("joinDelta: delete joining an insert nets out through sign products") {
    // replace the only b-row for k=1; a unchanged -> join delta is
    // (-1 old pairing) + (+1 new pairing)
    val a = Seq((1L, 10L)).toDF("k", "av")
    val b = Seq((1L, "old")).toDF("k", "bv")
    val dA = Seq.empty[(Long, Long, Long)].toDF("k", "av", "sign")
    val dB = Seq((1L, "old", -1L), (1L, "new", 1L)).toDF("k", "bv", "sign")
    val out = Merge.joinDelta(a, dA, b, dB, Seq("k"), "sign",
      Seq("av"), Seq("bv")).collect()
    assert(out.length === 2)
    val bySign = out.map(r => r.getAs[String]("bv") -> r.getAs[Long]("sign")).toMap
    assert(bySign === Map("old" -> -1L, "new" -> 1L))
  }

  test("applyAggDelta ignores deletes of rows already gone (count < 0 drops)") {
    val ghost = Seq(("z", 9L, 9L)).toDF("k", "id", "v")
      .withColumn("sign", lit(-1L))
    val out = Merge.applyAggDelta(aggOf(base), ghost, Seq("k"),
      col("sign"), Seq("sv" -> col("v")))
    assert(!out.collect().map(_.getString(0)).contains("z"))
  }

  // ------------------------------------------- shardStats / pruneSimulation

  private val sharded = Seq(
    (0L, Some(5L)), (0L, Some(9L)), (1L, Some(20L)), (1L, None),
    (2L, Some(100L)), (2L, Some(100L)), (3L, None: Option[Long])
  ).toDF("file_id", "v")

  test("shardStats: min/max/nulls/ndv per shard; all-NULL shard has NULL bounds") {
    val st = Profiling.shardStats(sharded, col("file_id"), col("v"))
      .orderBy("shard").collect()
    assert(st.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 0L), (1L, 2L, 1L), (2L, 2L, 0L), (3L, 1L, 1L)))
    assert(st(0).getLong(3) === 5L && st(0).getLong(4) === 9L && st(0).getLong(5) === 2L)
    assert(st(2).getLong(5) === 1L) // two equal values, ndv 1
    assert(st(3).isNullAt(3) && st(3).isNullAt(4))
  }

  test("pruneSimulation skips out-of-range and all-NULL shards, conservatively keeps the rest") {
    val st = Profiling.shardStats(sharded, col("file_id"), col("v"))
    // predicate v BETWEEN 8 AND 15: shard0 overlaps ([5,9]), shard1 kept
    // conservatively ([20,20] > hi → pruned), shard2 pruned, shard3 all-NULL pruned
    val out = Profiling.pruneSimulation(st, lit(8L), lit(15L)).head
    assert(out.getAs[Long]("n_shards") === 4L)
    assert(out.getAs[Long]("n_pruned") === 3L)
    assert(out.getAs[Long]("n_scanned") === 1L)
    assert(out.getAs[Long]("rows_skipped") === 5L)
    assert(out.getAs[Long]("rows_total") === 7L)
    assert(math.abs(out.getAs[Double]("skip_ratio") - 5.0 / 7.0) < 1e-15)
  }

  // ----------------------------------------------------- mrrFixedPoint

  test("mrrFixedPoint averages first-relevant reciprocal ranks; no-hit queries contribute 0") {
    val ranked = Seq(
      (1L, 1L, false), (1L, 2L, true), (1L, 3L, true), // first hit rank 2
      (2L, 1L, true), (2L, 2L, false),                 // rank 1
      (3L, 1L, false), (3L, 2L, false)                 // no hit
    ).toDF("qid", "rank", "rel")
    val out = Similarity.mrrFixedPoint(ranked, "qid", "rank", col("rel")).head
    assert(out.getAs[Long]("n_queries") === 3L)
    assert(out.getAs[Long]("mrr_num") === 1500000000L)
    assert(out.getAs[Double]("mrr") === 0.5)
  }

  test("ndcgFixedPoint: hand-checked numerators, exact 1.0 on perfect ranking, NULL on no-hit") {
    val d = Similarity.ndcgDiscounts(3)
    assert(d.head === 1000000000L) // log2(2) = 1
    val ranked = Seq(
      (1L, 1L, false), (1L, 2L, true), (1L, 3L, true), // rel at 2,3
      (2L, 1L, true), (2L, 2L, true), (2L, 3L, false), // perfect
      (3L, 1L, false), (3L, 2L, false)                 // no hit
    ).toDF("qid", "rank", "rel")
    val out = Similarity.ndcgFixedPoint(ranked, "qid", "rank", col("rel"), 3)
      .orderBy("qid").collect()
    assert(out(0).getAs[Long]("dcg_num") === d(1) + d(2))
    assert(out(0).getAs[Long]("idcg_num") === d(0) + d(1))
    assert(out(0).getAs[Double]("ndcg_at_3") ===
      (d(1) + d(2)).toDouble / (d(0) + d(1)).toDouble)
    assert(out(1).getAs[Double]("ndcg_at_3") === 1.0) // dcg == idcg exactly
    assert(out(2).isNullAt(out(2).fieldIndex("ndcg_at_3")))
    assert(out(2).getAs[Long]("n_rel") === 0L)
  }
}
