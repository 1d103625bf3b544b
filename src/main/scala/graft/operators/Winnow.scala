package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints — the MOSS algorithm (Schleimer,
  * Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003).
  *
  * From each document's ordered sequence of word-n-gram hashes, slide a
  * window of `w` consecutive grams and select the window's MINIMUM hash,
  * breaking ties toward the RIGHTMOST position. The distinct selected
  * (position, hash) pairs are the document's fingerprints. Guarantees
  * (both locked by WinnowSpec):
  *
  *   - **coverage**: every run of `w` consecutive grams contributes at
  *     least one fingerprint, so any shared substring of
  *     `w + n - 1` tokens or more between two documents yields at least
  *     one shared fingerprint — the detection guarantee plagiarism /
  *     near-dup systems build on;
  *   - **density**: expected fingerprints per position is 2/(w+1) on
  *     random input, so the index is ~w/2× smaller than a full posting
  *     list ([[InvertedIndex]]) at bounded detection loss.
  *
  * Selection is ONE window pass: pack (hash, position) into a single
  * BIGINT key `(mod − h)·2^32 + pos` — lexicographic max of the packed
  * key IS (min hash, rightmost position) — take the windowed max over
  * `ROWS w−1 PRECEDING..CURRENT`, keep full windows, and decode. No
  * join-back to resolve the argmin, no struct ordering (which DuckDB
  * windows cannot reproduce), exact for positions < 2^32 (a 4-billion-
  * token document; far beyond any real document — and `h < mod ≤ 10^9+7`
  * keeps the packed key under 4.7·10^18 < 2^63, so ANSI mode never
  * throws).
  *
  * Scale shape: grams come from one posexplode of the per-row shingle
  * array (narrow, no shuffle); the only shuffle is the hash partition by
  * document for the per-document window — state is one document's grams,
  * never global. Fingerprint output is ~2/(w+1) of gram count; feeding
  * it to an inverted-index pair join ([[Dedup.ngramJaccardPairs]]'s
  * bucket-join shape) gives near-dup candidate generation at a w/2×
  * smaller index than full shingle postings. Hashes are the portable
  * polynomial fold ([[TextAnalysis.polyHash]]), so the DuckDB oracle
  * (q129) reproduces fingerprints bit-for-bit.
  */
object Winnow {

  /** Positions pack into the low 32 bits of the selection key. */
  val PosCap: Long = 1L << 32

  /** ROW-LOCAL winnowing: the whole selection as one array expression —
    * `array<struct<pos,fp>>` per document, sorted by position, equal
    * row-for-row to exploding [[fingerprints]] (parity locked by
    * WinnowSpec). A pure projection: NO shuffle (the window variant's
    * only exchange disappears) and therefore STATELESS-STREAMING
    * compatible — winnowing slots into the append-mode curation chain
    * like any other per-doc metric (StreamingSpec). Trade-off, stated
    * honestly: the interpreted transform/slice/array_max walk is
    * O(G·w) per row and slower per byte than the compiled window plan,
    * and the whole fingerprint set materializes in one row — prefer
    * [[fingerprints]] for batch corpora, this for streams and for
    * pipelines that want fingerprints as a document column.
    */
  def fingerprintArray(text: Column, n: Int = 3, w: Int = 8): Column = {
    require(n >= 1, "gram size must be >= 1")
    require(w >= 1, "window must be >= 1")
    val mod = TextAnalysis.HashMod
    val hs = graft.functions.polyGramHashSeq(text, n)
    val keys = transform(hs, (h, i) => (lit(mod) - h) * lit(PosCap) + i.cast("long"))
    // window ending at 0-based gram e covers e-w+1..e = 1-based start e-(w-2)
    val sel = transform(sequence(lit(w - 1), size(hs) - 1),
      e => array_max(slice(keys, e - lit(w - 2), lit(w))))
    val fps = transform(array_distinct(sel),
      k => struct(k.bitwiseAND(lit(0xFFFFFFFFL)).as("pos"),
        (lit(mod) - shiftright(k, 32)).as("fp")))
    // the guard also keeps sequence() from going descending on short docs
    when(size(hs) >= w, array_sort(fps))
      .otherwise(array().cast("array<struct<pos:bigint,fp:bigint>>"))
  }

  /** Distinct winnowed fingerprints per document: (idCol, pos, fp) with
    * `pos` the gram position (0-based) and `fp` the gram's polyHash.
    * Documents with fewer than `n + w − 1` tokens (no full window) emit
    * no rows.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, w: Int = 8): DataFrame = {
    require(n >= 1, "gram size must be >= 1")
    require(w >= 1, "window must be >= 1")
    val mod = TextAnalysis.HashMod
    // compiled positional gram hashes — no gram STRINGS are ever built
    // (expressions/PolyGramHash; bit-equal to hashing the joined
    // shingles, which WinnowSpec re-derives as the executable spec)
    val hashed = docs.select(
      col(idCol),
      posexplode(graft.functions.polyGramHashSeq(col(textCol), n, mod))
        .as(Seq("pos", "h")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("h"))
    val packed = (lit(mod) - col("h")) * lit(PosCap) + col("pos")
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    hashed
      .withColumn("__wk", max(packed).over(win))
      // positions are dense 0..G−1 per doc, so pos ≥ w−1 ⇔ full window
      .where(col("pos") >= w - 1)
      .select(col(idCol),
        (col("__wk") % PosCap).as("pos"),
        (lit(mod) - expr(s"__wk DIV $PosCap")).as("fp"))
      .distinct()
  }
}
