package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → document-frequency, total term
  * frequency, and a BOUNDED posting list (the `maxPostings` smallest doc
  * ids) — the search/retrieval-side artifact of a corpus pipeline.
  *
  * Scale shape: the tempting `collect_list(doc) per term` gathers a
  * stopword's ENTIRE posting list (possibly billions of ids) into one
  * aggregation buffer before any truncation. Instead the bounded prefix
  * is selected FIRST with [[TopK.topKPerGroup]] (two-phase salted rank —
  * no whole-term funnel, survivors ≤ maxPostings·salts per term), and
  * only those ≤ maxPostings ids per term are collected; the unbounded
  * df/tf statistics are plain combinable aggregates on a separate pass.
  */
object InvertedIndex {

  /** @return (term, df, total_tf, postings): postings is the ascending
    *         comma-joined list of the `maxPostings` smallest doc ids
    *         containing the term.
    */
  def postingLists(docs: DataFrame, idCol: String, textCol: String,
                   maxPostings: Int): DataFrame = {
    require(maxPostings > 0)
    val tf = docs
      .select(col(idCol).as("doc"), explode(graft.functions.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc")
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
    // smallest ids rank first: score = -doc, ties impossible (doc unique
    // within a term after the tf aggregate)
    val top = TopK.topKPerGroup(tf.withColumn("__neg", -col("doc")),
      "term", "__neg", "doc", maxPostings)
    val postings = top.groupBy("term")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rank"), col("doc")))),
          x => x.getField("doc").cast("string")),
        ",").as("postings"))
    stats.join(postings, "term")
  }

  /** Exact PHRASE search over POSITIONAL postings — the retrieval
    * primitive q54's position-free lists cannot answer: find every
    * document containing the words of `phrase` consecutively, with the
    * occurrence count and first position.
    *
    * Classic positional-intersection shape: each phrase word i yields
    * (doc, pos − i) rows — an occurrence of the full phrase at start s
    * is exactly one (doc, s) row in EVERY part — so the phrase match is
    * an equi-join chain on (doc, aligned start), never a string scan
    * with a composite pattern. Each part filters to ITS word before
    * shuffling (the selective words prune the stream; a stopword part
    * carries that word's postings only), and every join key includes the
    * doc id, so fan-out per key is the per-doc occurrence count —
    * bounded, skew-safe. Repeated words in the phrase are handled by
    * construction (each index position is its own part; a doc position
    * can satisfy several parts only via distinct aligned starts).
    *
    * @return (idCol, n_hits, first_pos) — docs with ≥ 1 occurrence;
    *         positions are 0-based token offsets
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val toks = docs.select(col(idCol).as("__id"),
      posexplode(graft.functions.tokens(col(textCol))).as(Seq("__pos", "__t")))
    val parts = phrase.zipWithIndex.map { case (w, i) =>
      toks.filter(col("__t") === w)
        .select(col("__id"), (col("__pos") - i).as("__start"))
    }
    parts.reduce(_.join(_, Seq("__id", "__start")))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col("__start")).cast("long").as("first_pos"))
  }
}
