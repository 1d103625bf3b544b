package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.io.WarcSource

class WarcSourceSpec extends SparkSpec {

  /** Minimal well-formed WARC: version line, headers, blank line,
    * payload, record terminated by two CRLF.
    */
  private def warcRecord(warcType: String, id: String, uri: Option[String],
                         payload: String): String = {
    val uriLine = uri.map(u => s"WARC-Target-URI: $u\r\n").getOrElse("")
    s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
      uriLine +
      s"Content-Length: ${payload.getBytes(StandardCharsets.UTF_8).length}\r\n" +
      "\r\n" +
      payload + "\r\n\r\n"
  }

  private val httpOk =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hello crawl</html>"
  private val httpNotFound =
    "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"

  private def withWarc(content: String)(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-warc").toFile
    try {
      val file = new java.io.File(dir, "crawl.warc")
      Files.write(file.toPath, content.getBytes(StandardCharsets.UTF_8))
      f(file.getAbsolutePath)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

  test("readRecords splits on record boundaries and parses the header subset") {
    val warc =
      warcRecord("warcinfo", "aaa", None, "software: graft-test") +
        warcRecord("response", "bbb", Some("http://example.com/"), httpOk) +
        warcRecord("request", "ccc", Some("http://example.com/"),
          "GET / HTTP/1.1\r\nHost: example.com\r\n\r\n") +
        warcRecord("response", "ddd", Some("http://example.com/404"), httpNotFound)
    withWarc(warc) { path =>
      val recs = WarcSource.readRecords(spark, path).collect()
      assert(recs.length === 4)
      val byId = recs.map(r => r.getAs[String]("record_id") -> r).toMap
      assert(byId("<urn:uuid:aaa>").getAs[String]("record_type") === "warcinfo")
      assert(byId("<urn:uuid:aaa>").getAs[String]("target_uri") === null)
      val resp = byId("<urn:uuid:bbb>")
      assert(resp.getAs[String]("record_type") === "response")
      assert(resp.getAs[String]("target_uri") === "http://example.com/")
      assert(resp.getAs[Long]("content_length") === httpOk.length.toLong)
      assert(resp.getAs[String]("content") === httpOk)
    }
  }

  test("WARC/1.1 files and lower-cased headers parse identically") {
    // ISO 28500:2017 bumps the version line (wget/warcio emit 1.1) and
    // does not mandate header casing — both must parse like 1.0.
    val warc11 =
      ("WARC/1.1\r\n" +
        "warc-type: response\r\n" +
        "warc-record-id: <urn:uuid:eee>\r\n" +
        "WARC-Target-URI: http://example.com/v11\r\n" +
        s"content-length: ${httpOk.length}\r\n" +
        "\r\n" + httpOk + "\r\n\r\n") * 2
    withWarc(warc11) { path =>
      val recs = WarcSource.readRecords(spark, path).collect()
      assert(recs.length === 2)
      recs.foreach { r =>
        assert(r.getAs[String]("record_type") === "response")
        assert(r.getAs[String]("record_id") === "<urn:uuid:eee>")
        assert(r.getAs[Long]("content_length") === httpOk.length.toLong)
        assert(r.getAs[String]("content") === httpOk)
      }
    }
  }

  test("responses extracts HTTP status and body; toDocuments lands on the corpus contract") {
    val warc =
      warcRecord("response", "bbb", Some("http://example.com/"), httpOk) +
        warcRecord("request", "ccc", Some("http://example.com/"), "GET /") +
        warcRecord("response", "ddd", Some("http://example.com/404"), httpNotFound)
    withWarc(warc) { path =>
      val resp = WarcSource.responses(WarcSource.readRecords(spark, path))
        .orderBy("record_id").collect()
      assert(resp.length === 2) // the request record is filtered out
      assert(resp(0).getAs[Long]("http_status") === 200L)
      assert(resp(0).getAs[String]("body") === "<html>hello crawl</html>")
      assert(resp(1).getAs[Long]("http_status") === 404L)
      // the final record of the file must not keep its framing CRLFs
      assert(resp(1).getAs[String]("body") === "gone")

      val docs = WarcSource.toDocuments(
        WarcSource.responses(WarcSource.readRecords(spark, path)))
      assert(docs.columns.toSeq ===
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      val d = docs.orderBy("source").collect()
      assert(d.length === 2)
      assert(d(0).getAs[String]("text") === "<html>hello crawl</html>")
      assert(d(0).getAs[Long]("n_chars") === 24L)
      // doc_id is the portable hash of the record id: deterministic
      // across re-reads of the same crawl
      val again = WarcSource.toDocuments(
        WarcSource.responses(WarcSource.readRecords(spark, path)))
        .orderBy("source").collect()
      assert(d.map(_.getAs[Long]("doc_id")).toSeq ===
        again.map(_.getAs[Long]("doc_id")).toSeq)
    }
  }

  test("framingAudit classifies phantom/truncated/inflated/undeclared/clean in octets") {
    // The audit must count BYTES (Content-Length's unit), not characters:
    // the non-ASCII record below is clean only under octet semantics.
    val nonAscii = "héllo wörld — ünïcode ⚡" // chars < UTF-8 bytes
    val boundaryPayload = "before the boundary\r\n\r\nWARC/1.0\r\nafter it"
    val declared = boundaryPayload.getBytes(StandardCharsets.UTF_8).length
    val warc =
      warcRecord("response", "clean-ascii", Some("http://a/"), httpOk) +
        warcRecord("response", "clean-utf8", Some("http://b/"), nonAscii) +
        // embedded record boundary: truncates here, remainder = phantom
        warcRecord("response", "split-me", Some("http://c/"), boundaryPayload) +
        // no Content-Length header at all
        ("WARC/1.0\r\n" +
          "WARC-Type: response\r\n" +
          "WARC-Record-ID: <urn:uuid:nolen>\r\n" +
          "\r\nshort\r\n\r\n") +
        // declared length smaller than the actual payload
        ("WARC/1.0\r\n" +
          "WARC-Type: response\r\n" +
          "WARC-Record-ID: <urn:uuid:liar>\r\n" +
          "Content-Length: 3\r\n" +
          "\r\nmuch longer than three\r\n\r\n")
    withWarc(warc) { path =>
      val audit = WarcSource.framingAudit(WarcSource.readRecords(spark, path))
        .collect()(0)
      assert(audit.getAs[Long]("phantom") === 1L,
        "the post-boundary remnant must surface as one phantom")
      assert(audit.getAs[Long]("truncated") === 1L,
        s"split-me declares $declared bytes but was cut at the boundary")
      assert(audit.getAs[Long]("inflated") === 1L)
      assert(audit.getAs[Long]("undeclared") === 1L)
      assert(audit.getAs[Long]("clean") === 2L,
        "ascii AND utf-8 records are byte-exact — char counting would flag the utf-8 one")
    }
  }

  test("framingAudit returns zeros, not NULLs, on an empty scan") {
    // sum() over zero rows is NULL; the audit must coalesce to 0 so a
    // consumer comparing counts to 0 on an empty shard sees real zeros.
    withWarc("") { path =>
      val audit = WarcSource.framingAudit(WarcSource.readRecords(spark, path))
        .collect()(0)
      Seq("phantom", "truncated", "inflated", "undeclared", "clean").foreach { c =>
        assert(!audit.isNullAt(audit.fieldIndex(c)), s"$c must not be NULL")
        assert(audit.getAs[Long](c) === 0L)
      }
    }
  }

  test("golden path: WARC crawl -> documents -> wide near-dup dedup survivors") {
    import graft.operators.{Components, Dedup}
    import org.apache.spark.sql.functions.col
    // A miniature crawl with every hazard the pipeline must survive:
    // exact dups across URIs, a near-dup (one token changed), an
    // unrelated page, a too-short page (quality-filtered), a request
    // record (not a response), and a payload containing the record
    // boundary (phantom + truncation).
    val dupText = "the quick brown fox jumps over the lazy dog and runs far away home"
    val nearDup = "the quick brown fox jumps over the lazy cat and runs far away home"
    val unrelated = "completely different page speaking about parquet shuffles and broadcast joins"
    val warc =
      warcRecord("response", "d1", Some("http://site/a"), s"HTTP/1.1 200 OK\r\n\r\n$dupText") +
        warcRecord("response", "d2", Some("http://site/b"), s"HTTP/1.1 200 OK\r\n\r\n$dupText") +
        warcRecord("response", "d3", Some("http://site/c"), s"HTTP/1.1 200 OK\r\n\r\n$nearDup") +
        warcRecord("response", "d4", Some("http://site/d"), s"HTTP/1.1 200 OK\r\n\r\n$unrelated") +
        warcRecord("response", "d5", Some("http://site/tiny"), "HTTP/1.1 200 OK\r\n\r\nok") +
        warcRecord("request", "d6", Some("http://site/a"), "GET /a HTTP/1.1") +
        warcRecord("response", "d7", Some("http://site/evil"),
          "HTTP/1.1 200 OK\r\n\r\npayload embedding a boundary\r\n\r\nWARC/1.0\r\nnot a real record")
    withWarc(warc) { path =>
      val records = WarcSource.readRecords(spark, path)
      // the documented ingest order: audit, then drop phantoms
      val audit = WarcSource.framingAudit(records).collect()(0)
      assert(audit.getAs[Long]("phantom") === 1L)
      val real = records.filter(col("record_id").isNotNull)
      val docs = WarcSource.toDocuments(WarcSource.responses(real))
      // quality gate drops the 2-char page (and the truncated d7 body
      // survives it here — realistic: truncation is not a quality signal)
      val quality = docs.filter(col("n_chars") >= 25)
      val pairs = Dedup.simhashMatchesWide(quality, "doc_id", "text", maxHamming = 3)
      val survivors = Components.keepCanonical(quality, "doc_id", pairs)
        .select("source", "doc_id").collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("doc_id")).toMap
      // ground truth from the same signatures: which of a/b/c cluster?
      val sigs = quality.select(col("doc_id"),
        graft.operators.TextAnalysis.simHashWide(col("text")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ids = quality.select("source", "doc_id").collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("doc_id")).toMap
      val abc = Seq("http://site/a", "http://site/b", "http://site/c").map(ids)
      val clustered = abc.combinations(2).filter { case Seq(x, y) =>
        java.lang.Long.bitCount(sigs(x) ^ sigs(y)) <= 3
      }.flatten.toSet
      // exact dups a/b always cluster (hamming 0): exactly one survives
      assert(clustered.contains(ids("http://site/a")) &&
        clustered.contains(ids("http://site/b")))
      val expectedSurvivors =
        quality.select("doc_id").collect().map(_.getLong(0)).toSet --
          (clustered - clustered.min)
      assert(survivors.values.toSet === expectedSurvivors)
      // the unrelated page and the truncated-but-unique page survive
      assert(survivors.contains("http://site/d"))
      assert(survivors.contains("http://site/evil"))
      // the tiny page died to quality, not dedup
      assert(!survivors.contains("http://site/tiny"))
    }
  }
}
