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
}
