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
}
