package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide duplicate-LINE removal (the CCNet/RefinedWeb paragraph
  * dedup pass): boilerplate lines — headers, footers, cookie banners,
  * navigation — repeat across millions of pages, so dedup must run at
  * LINE granularity across the WHOLE corpus, keeping each distinct line's
  * first occurrence and reassembling the surviving lines per document.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - "first occurrence" = the minimum of one packed long
  *     `doc_id * maxLinesPerDoc + position`, so the winner per line value
  *     is a plain `min` — a map-side-combinable hash aggregate. A line
  *     repeated on a billion pages (think "Home | About | Contact")
  *     collapses to one row per map task BEFORE the shuffle; the shuffle
  *     then moves one (line, min) pair per partition, never the billion
  *     copies. The tempting alternative — window `row_number() over
  *     (partition by line)` or a join back on the line value — funnels
  *     every copy of a hot line through one task: the classic dedup skew
  *     bug.
  *   - The winner row is RECONSTRUCTED from the packed min (id = ord div
  *     M, pos = ord mod M) instead of joined back, so there is no second
  *     pass over the exploded lines at all: explode → agg → reassemble,
  *     two shuffles total (line hash, then doc id).
  *   - Reassembly is a per-document sort of its OWN surviving lines
  *     (array_sort over a collected struct array) — bounded by document
  *     size, not corpus size.
  */
object LineDedup {

  /** @param docs           input table
    * @param idCol          non-negative unique long document id
    * @param textCol        string column; lines are `\n`-separated
    * @param maxLinesPerDoc packing radix for (doc, position) — must
    *                       exceed any document's line count, and
    *                       idCol·maxLinesPerDoc must fit in a long
    * @return one row per input document: (idCol, n_lines, n_kept,
    *         text_dedup) where text_dedup keeps only lines whose FIRST
    *         corpus-wide occurrence (smallest (doc id, position)) is in
    *         this document, in original order; a document whose every
    *         line appeared earlier keeps n_kept = 0 and text_dedup = "".
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 maxLinesPerDoc: Int = 1000000): DataFrame = {
    require(maxLinesPerDoc > 0)
    val m = maxLinesPerDoc.toLong
    val lines = docs.select(col(idCol), posexplode(split(col(textCol), "\n"))
      .as(Seq("__pos", "__line")))
    val winners = lines
      .select((col(idCol) * m + col("__pos")).as("__ord"), col("__line"))
      .groupBy("__line").agg(min("__ord").as("__ord"))
      .select(expr(s"__ord DIV ${m}L").as("__id"),
        pmod(col("__ord"), lit(m)).as("__pos"), col("__line"))
    val rebuilt = winners.groupBy("__id")
      .agg(count(lit(1)).as("__kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            x => x.getField("__line")),
          "\n").as("__text"))
    docs.select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, col(idCol) === col("__id"), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("__kept"), lit(0L)).as("n_kept"),
        coalesce(col("__text"), lit("")).as("text_dedup"))
  }

  /** Boilerplate removal by DOCUMENT FREQUENCY — the CCNet/C4 companion
    * pass to [[dedupLines]] with the opposite keep rule: a line present
    * in at least num/denom of all documents (nav bars, cookie banners,
    * license footers) is boilerplate, and EVERY occurrence is removed —
    * including the first, which dedupLines would keep.
    *
    * Scale shape:
    *   - Document frequency is `count(distinct doc)` per line value —
    *     partial-distinct aggregates, so a line on a billion pages
    *     collapses per map task before either shuffle, and the result is
    *     bounded by DISTINCT lines, not occurrences.
    *   - The doc total enters the threshold as a broadcast one-row cross
    *     join (no driver collect; the whole operator is one plan).
    *   - The boilerplate list is explicitly `broadcast()` into a
    *     LEFT ANTI join: by construction it has at most
    *     total_line_occurrences·denom/(num·n_docs) entries (each needs
    *     ≥ num·n_docs/denom occurrences), and the broadcast is what keeps
    *     the anti-join skew-proof — every probe task drops its own copies
    *     of a hot line locally instead of shuffling a billion copies of
    *     "Accept cookies" to one reducer. For thresholds low enough that
    *     the list outgrows a broadcast, pre-filter with
    *     [[BloomPrune]] and salt the residual join; this operator keeps
    *     the high-threshold (genuinely-boilerplate) regime.
    *
    * @return one row per input document: (idCol, n_lines, n_kept,
    *         text_clean) — surviving lines in original order; a document
    *         that was pure boilerplate keeps n_kept = 0, text_clean = "".
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        num: Long, denom: Long): DataFrame = {
    require(num > 0 && denom > 0 && num <= denom,
      "doc-frequency threshold must be a fraction in (0, 1]")
    val lines = docs.select(col(idCol), posexplode(split(col(textCol), "\n"))
      .as(Seq("__pos", "__line")))
    val total = docs.agg(count(lit(1)).as("__ndocs"))
    val docFreq = lines.select(col("__line"), col(idCol))
      .groupBy("__line")
      .agg(countDistinct(col(idCol)).as("__df"))
    val boiler = docFreq.crossJoin(broadcast(total))
      .filter(col("__df") * denom >= col("__ndocs") * num)
      .select("__line")
    val kept = lines.join(broadcast(boiler), Seq("__line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol).as("__id"))
      .agg(count(lit(1)).as("__kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            x => x.getField("__line")),
          "\n").as("__text"))
    docs.select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, col(idCol) === col("__id"), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("__kept"), lit(0L)).as("n_kept"),
        coalesce(col("__text"), lit("")).as("text_clean"))
  }
}
