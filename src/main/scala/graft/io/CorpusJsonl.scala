package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the de-facto wire format of LLM training
  * corpora (one JSON document per line: web dumps, filtered sets,
  * instruction data). Parquet is the engine's processing format; JSONL
  * is how corpora arrive and leave.
  *
  * Scale/robustness rules, all load-bearing at 100 TB:
  *   - the schema is EXPLICIT — schema inference triggers a full extra
  *     pass over the data before the real read, doubling ingest I/O;
  *   - PERMISSIVE mode with a captured corrupt-record column: one
  *     malformed line among billions must neither kill the job
  *     (FAILFAST) nor silently vanish (DROPMALFORMED) — it lands in
  *     quarantine with the raw line preserved for re-processing;
  *   - multiLine stays false: line-delimited JSON is splittable (every
  *     worker seeks to a newline and starts parsing), a multi-line JSON
  *     array is ONE unsplittable record read by one task;
  *   - compression: line-JSONL under gzip is NOT splittable — one 10 GB
  *     .gz = one task. Write-side defaults to uncompressed JSONL
  *     shards sized by upstream partitioning (zstd parquet remains the
  *     processing format; export is for interchange).
  */
object CorpusJsonl {

  /** The documents-table schema (TESTDATA.md): doc_id, text, lang,
    * source, n_chars — the engine's corpus contract.
    */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val CorruptCol = "_corrupt_record"

  /** Read a JSONL corpus with explicit schema + quarantine column.
    * Returns the full frame INCLUDING the corrupt column; split with
    * [[wellFormed]] / [[quarantined]].
    */
  def read(spark: SparkSession, path: String,
           schema: StructType = DocumentsSchema): DataFrame = {
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** The materialized parse, split once: the SAFE front-door for
    * callers that touch both splits or run column-pruned queries
    * (counts/audits) — every shape that trips Spark's corrupt-only
    * analyzer check on a raw scan works on these frames, because the
    * parse is persisted before splitting. Call `unpersist()` when done;
    * at corpus scale, prefer writing the parse to a bronze table and
    * splitting from the written copy (one read of the raw JSONL total).
    */
  case class ParsedCorpus(parsed: DataFrame) {
    def wellFormed: DataFrame = CorpusJsonl.wellFormed(parsed)
    def quarantined: DataFrame = CorpusJsonl.quarantined(parsed)
    def unpersist(): Unit = { parsed.unpersist(); () }
  }

  /** [[read]] + persist, wrapped as [[ParsedCorpus]]. */
  def readSplit(spark: SparkSession, path: String,
                schema: StructType = DocumentsSchema): ParsedCorpus =
    ParsedCorpus(read(spark, path, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Parsed rows only (quarantine column dropped).
    *
    * Same analyzer caveat as [[quarantined]], in disguise: a row-COUNT
    * of this split over the raw scan prunes every data column away,
    * leaving a corrupt-column-only query that Spark rejects
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Queries that read data columns
    * are fine; for counts/audits, materialize the parse first (locked
    * by CorpusJsonlSpec).
    */
  def wellFormed(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Malformed lines, raw text preserved for reprocessing/audit.
    *
    * Spark refuses to answer queries that reference ONLY the corrupt
    * column of a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    * column exists per-parse, not in the file. The ingest pattern is to
    * materialize the parse ONCE and split from that: at corpus scale,
    * write the parsed frame to the bronze table and quarantine from the
    * written copy (one read of the raw JSONL total); in-memory, cache()
    * before splitting. This mirrors the engine's bronze flow — raw text
    * is read exactly once.
    */
  def quarantined(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))

  /** Export a corpus frame as JSONL interchange shards. */
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)
}
