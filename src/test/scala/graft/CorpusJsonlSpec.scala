package graft

import java.nio.file.Files

import graft.io.CorpusJsonl

class CorpusJsonlSpec extends SparkSpec {

  private def withJsonl(lines: Seq[String])(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-jsonl").toFile
    try {
      val file = new java.io.File(dir, "part-0.jsonl")
      val w = new java.io.PrintWriter(file, "UTF-8")
      try lines.foreach(w.println) finally w.close()
      f(file.getAbsolutePath)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

  test("well-formed lines parse to the documents schema; corrupt lines quarantine with raw text") {
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}""",
      """this is not json at all""",
      """{"doc_id": 3, "text": "truncated""", // malformed: unterminated
      """{"doc_id": 4, "text": "extra ok", "lang": "de", "source": "s", "n_chars": 8, "unknown_field": true}""")
    withJsonl(lines) { path =>
      // cache() = the in-memory form of "materialize the parse once,
      // then split" (see CorpusJsonl.quarantined — Spark refuses
      // corrupt-column-only queries over the raw scan)
      val df = CorpusJsonl.read(spark, path).cache()
      val good = CorpusJsonl.wellFormed(df).collect()
      // unknown extra fields are ignored (explicit schema), not corrupt
      assert(good.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 2L, 4L))
      assert(good.find(_.getAs[Long]("doc_id") == 1L).get
        .getAs[String]("text") === "hello world")
      val bad = CorpusJsonl.quarantined(df).collect().map(_.getString(0))
      assert(bad.length === 2)
      assert(bad.contains("this is not json at all"))
      assert(bad.exists(_.startsWith("""{"doc_id": 3""")),
        "malformed JSON must keep its raw line for reprocessing")
    }
  }

  test("corrupt-column-only pruning over a raw scan is rejected; materialized parse is not") {
    // count() of either split prunes all data columns, leaving a
    // corrupt-only query over the raw file — Spark rejects it at
    // analysis. The ingest pattern (materialize once, split from the
    // parsed copy) sidesteps it; lock both behaviors so the operator's
    // documented contract stays true across Spark upgrades.
    val lines = Seq("""{"doc_id": 1, "text": "t", "lang": "e", "source": "s", "n_chars": 1}""")
    withJsonl(lines) { path =>
      val raw = CorpusJsonl.read(spark, path)
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        CorpusJsonl.wellFormed(raw).count()
      }
      assert(e.getMessage.contains("corrupt"))
      // readSplit is the safe front-door: parse persisted before split
      val split = CorpusJsonl.readSplit(spark, path)
      try {
        assert(split.wellFormed.count() === 1L)
        assert(split.quarantined.count() === 0L)
      } finally split.unpersist()
    }
  }

  test("round-trip: parquet documents -> JSONL export -> read back equal") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "s0", 5L),
      (2L, "中文 文本", "zh", "s1", 5L),
      (3L, "", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-jsonl-rt").toFile
    val out = new java.io.File(dir, "export").getAbsolutePath
    try {
      CorpusJsonl.write(docs, out)
      val back = CorpusJsonl.wellFormed(CorpusJsonl.read(spark, out))
        .orderBy("doc_id")
        .as[(Long, String, String, String, Long)].collect().toSeq
      // (Spark's json writer drops NULL fields, which would not round-trip;
      // empty strings and CJK do — this frame has no nulls by design)
      assert(back === Seq(
        (1L, "a b c", "en", "s0", 5L),
        (2L, "中文 文本", "zh", "s1", 5L),
        (3L, "", "en", "s0", 0L)))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  test("interchange gate: real documents table -> JSONL -> back, checksum-equal; corrupt line quarantines") {
    // The operational claim behind the JSONL source: a corpus can leave
    // the engine as interchange shards and come back BIT-EQUAL as a
    // multiset — verified with the engine's own migration fingerprint
    // (Profiling.tableChecksum), the same check a real 100 TB export
    // would run on both sides. Plus the robustness half: one garbage
    // line dropped into the shard directory lands in quarantine without
    // touching the checksum of the well-formed split.
    import org.apache.spark.sql.functions.col
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cols = src.columns.toSeq.map(col)
    def fp(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
      val r = graft.operators.Profiling.tableChecksum(df, cols: _*).collect()(0)
      (r.getAs[Long]("n_rows"), r.getAs[java.math.BigDecimal]("checksum"))
    }
    val dir = Files.createTempDirectory("graft-jsonl-gate").toFile
    val out = new java.io.File(dir, "export").getAbsolutePath
    try {
      CorpusJsonl.write(src, out)
      val clean = CorpusJsonl.readSplit(spark, out)
      try {
        assert(fp(clean.wellFormed) === fp(src),
          "JSONL round-trip of the documents table must be checksum-identical")
        assert(clean.quarantined.count() === 0L)
      } finally clean.unpersist()
      // drop a malformed shard line into the directory (upstream writer
      // crash, partial upload) — it must quarantine, not corrupt
      val w = new java.io.PrintWriter(new java.io.File(out, "zz-broken.json"), "UTF-8")
      try w.println("""{"doc_id": 99999, "text": "unterminated""") finally w.close()
      val dirty = CorpusJsonl.readSplit(spark, out)
      try {
        assert(dirty.quarantined.count() === 1L)
        assert(fp(dirty.wellFormed) === fp(src),
          "a quarantined line must not perturb the well-formed split")
      } finally dirty.unpersist()
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }
}
