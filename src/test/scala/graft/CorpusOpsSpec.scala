package graft

import graft.operators.{LineDedup, Packing, Sampling, TopK}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

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
}
