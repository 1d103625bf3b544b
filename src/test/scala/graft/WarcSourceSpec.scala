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
}
