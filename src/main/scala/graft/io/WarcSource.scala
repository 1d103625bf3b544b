package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** WARC (Web ARChive, ISO 28500) ingestion — the raw wire format of web
  * crawls (Common Crawl ships WARC), i.e. the very front of an LLM
  * training-data pipeline.
  *
  * The reader is DataFrame-native and SPLITTABLE: the text source's
  * `lineSep` option makes "\r\n\r\nWARC/" (blank line + version-line
  * prefix — the inter-record boundary) the record delimiter, so a WARC
  * file splits across executors at record boundaries exactly like any
  * line-delimited format — no custom InputFormat, no RDD code, and the
  * per-record parse is a narrow whole-stage-codegen projection
  * (substring_index / regexp_extract). The classic caveat applies
  * unchanged from JSONL: .gz WARC shards are not splittable — one shard,
  * one task — so shard size IS the parallelism knob (Common Crawl's ~1 GB
  * shards exist for exactly this reason).
  *
  * Header grammar parsed here is the minimal load-bearing subset:
  * WARC-Type, WARC-Target-URI, WARC-Record-ID, Content-Length, and for
  * response records the HTTP status + payload (header names matched
  * case-insensitively — ISO 28500 does not mandate casing). Everything
  * else rides along in the raw header block for downstream access.
  *
  * KNOWN LIMIT of delimiter framing: a payload that itself contains the
  * literal record boundary (blank line + "WARC/" version line — e.g. a
  * crawled page ABOUT the WARC format, or a .warc served as text) is
  * split at that point: the real record's content truncates there and
  * the remainder surfaces as a phantom record with NULL headers.
  * Exact framing needs Content-Length-driven segmentation, which is not
  * expressible as a splittable DataFrame scan — the standard trade
  * every delimiter-based WARC reader makes. Phantom records are
  * identifiable (record_id IS NULL) and filterable; Content-Length is
  * carried so downstream can audit — see [[framingAudit]]. The audit
  * compares BYTE counts (octet_length of the re-encoded content), not
  * character counts: WARC Content-Length is octets, and length() on a
  * non-ASCII payload undercounts. Underlying assumption, shared by the
  * whole reader: the scan DECODES the file as UTF-8 text, so a binary
  * payload (gzip, images) survives only as lossily-decoded text — this
  * reader is for text crawls; binary payloads need a byte-oriented
  * (non-splittable or offset-indexed) ingest.
  */
object WarcSource {

  /** Inter-record boundary: two CRLF closing the previous payload, then
    * the next record's version line. The version NUMBER is left out of
    * the delimiter so WARC/1.0 and WARC/1.1 (ISO 28500:2017 — wget,
    * warcio) both split; the version remnant is stripped per record.
    */
  private val RecordSep = "\r\n\r\nWARC/"

  private val BlankLine = "\r\n\r\n"

  /** Everything after the first blank line of `rec` ("" when none). */
  private def afterBlankLine(rec: Column): Column =
    when(instr(rec, BlankLine) > 0,
      rec.substr(instr(rec, BlankLine) + lit(4), lit(Int.MaxValue)))
      .otherwise(lit(""))

  /** One row per WARC record: (record_type, record_id, target_uri,
    * content_length, headers, content). `headers` is the raw WARC header
    * block; `content` is everything after the header/content blank line
    * (for response records: the full HTTP message).
    */
  def readRecords(spark: SparkSession, path: String): DataFrame = {
    // The first record of a file still carries its full version line
    // "WARC/x.y\r\n" (no preceding separator to eat it); later records
    // start with the version REMNANT ("1.0\r\n" — the delimiter ate
    // "WARC/"). Normalize both shapes once.
    val rec = regexp_replace(col("value"), "^(WARC/)?[0-9]+\\.[0-9]+\\r\\n", "")
    val headers = substring_index(col("__rec"), BlankLine, 1)
    def header(name: String) = {
      val m = regexp_extract(col("__headers"), "(?mi)^" + name + ": *(.*?)\\r?$", 1)
      when(m =!= "", m) // absent header → NULL, not empty string
    }
    spark.read.option("lineSep", RecordSep).text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(rec.as("__rec"))
      .withColumn("__headers", headers)
      .select(
        header("WARC-Type").as("record_type"),
        header("WARC-Record-ID").as("record_id"),
        header("WARC-Target-URI").as("target_uri"),
        graft.functions.tryCast(header("Content-Length"), LongType)
          .as("content_length"),
        col("__headers").as("headers"),
        // the two CRLF after the payload are record FRAMING (ISO 28500),
        // not payload — mid-file they are eaten by the record delimiter,
        // but the file's final record still carries them
        regexp_replace(afterBlankLine(col("__rec")), "\\r\\n\\r\\n$", "")
          .as("content"))
  }

  /** Framing health of a [[readRecords]] scan, ONE row of counts — the
    * audit a crawl ingest runs before trusting delimiter framing:
    *   - `phantom`: rows with NULL record_id — payload fragments split
    *     off by an embedded record boundary (drop, and count against
    *     `truncated`'s source records);
    *   - `truncated`: declared Content-Length exceeds the payload's
    *     byte count — the tail was eaten by an embedded boundary;
    *   - `inflated`: payload bytes exceed the declaration (malformed
    *     writer, or a boundary string inside the HEADER block);
    *   - `undeclared`: no parseable Content-Length to audit against;
    *   - `clean`: identified, declared, and byte-exact.
    * Comparisons are in OCTETS (octet_length re-encodes the decoded
    * string to UTF-8), matching the header's unit — `length()` counts
    * CHARACTERS and disagrees on any non-ASCII payload. Byte-exactness
    * therefore also assumes the shard is UTF-8 on disk (see the class
    * doc's decoding caveat): a latin-1 shard audits as truncated/
    * inflated noise rather than silently passing.
    */
  def framingAudit(records: DataFrame): DataFrame = {
    val declared = col("content_length")
    val actual = octet_length(col("content")).cast(LongType)
    val identified = col("record_id").isNotNull
    // count(when(...)), not sum(when/otherwise): sum over ZERO rows is
    // NULL, so an empty scan would audit as all-NULL counts where a
    // "one row of counts" consumer comparing to 0 expects zeros. count
    // of a null-gated expression is 0 on empty input by definition.
    def cnt(c: Column) = count(when(c, 1L))
    records.agg(
      cnt(!identified).as("phantom"),
      cnt(identified && declared.isNotNull && actual < declared).as("truncated"),
      cnt(identified && declared.isNotNull && actual > declared).as("inflated"),
      cnt(identified && declared.isNull).as("undeclared"),
      cnt(identified && declared.isNotNull && actual === declared).as("clean"))
  }

  /** Response records only, with the HTTP envelope split off: adds
    * `http_status` (NULL when the payload is not an HTTP message) and
    * `body` (payload after the HTTP headers — the HTML).
    */
  def responses(records: DataFrame): DataFrame =
    records.filter(col("record_type") === "response")
      .withColumn("http_status",
        graft.functions.tryCast(
          regexp_extract(col("content"), "^HTTP/[0-9.]+ +([0-9]{3})", 1),
          LongType))
      .withColumn("body", afterBlankLine(col("content")))

  /** Map crawl responses onto the engine's documents contract:
    * deterministic doc_id (64-bit hash of the record id — stable
    * across re-reads, unlike monotonically_increasing_id), body as text,
    * URI as source. The entry point from raw crawl to every dedup /
    * quality / analysis operator in the library.
    */
  def toDocuments(responses: DataFrame): DataFrame =
    responses.select(
      // xxhash64, NOT the portable 30-bit polyHash: doc_id is corpus
      // IDENTITY (every dedup/cluster operator keys on it), and a 2^30
      // space birthday-collides by ~100k records — a 64-bit space holds
      // to billions. Still deterministic across re-reads of the crawl.
      xxhash64(col("record_id")).as("doc_id"),
      col("body").as("text"),
      lit(null).cast("string").as("lang"),
      col("target_uri").as("source"),
      length(col("body")).cast("long").as("n_chars"))
}
