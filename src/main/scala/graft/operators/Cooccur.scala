package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skip-gram co-occurrence counting — the (center, context) pair tensor
  * word2vec/GloVe-style embedding training consumes, and the raw input
  * to any association statistic (PMI's counts, [[FeatureSelect]]'s
  * cells) over token neighborhoods.
  *
  * Scale shape — the join is NEVER keyed by document alone: a doc-keyed
  * self-join fans out L² pairs for an L-token document (the long-doc
  * quadratic trap). Instead each token emits `window` PROBES at
  * positions pos+1..pos+window, and probes equi-join tokens on exact
  * (doc, pos) — fan-out is a hard 2·window per token regardless of
  * document length. Each matched (left, right) pair yields both
  * directions row-local (no second join); the count aggregate is
  * map-side combinable with state bounded by the distinct-pair
  * vocabulary. Top-k is TakeOrderedAndProject.
  *
  * Determinism: counts are exact BIGINTs; the top-k boundary orders by
  * (count DESC, center, context) so ties cut identically everywhere.
  */
object Cooccur {

  /** Directional co-occurrence counts within ±`window` token positions.
    *
    * @param docs    corpus
    * @param idCol   document id column name
    * @param textCol text column name (house whitespace tokenization)
    * @param window  max |position difference| (≥ 1)
    * @param minCount pairs below this count are dropped (the vocabulary
    *                 floor every embedding trainer applies)
    * @param topK    pairs kept, by (cnt DESC, center, context)
    * @return (center, context, cnt)
    */
  /** Co-engagement pair counts over a bipartite (actor, item) table —
    * "which items share audiences": for each unordered item pair, how
    * many DISTINCT actors touched both. The item-item similarity input
    * for source-correlation analysis and co-click-style curation.
    *
    * Scale discipline — the hub problem: a per-actor self-join fans out
    * d² pairs for a degree-d actor, and power-law actors (crawlers,
    * bots) dominate the stage. So actors are DEGREE-CAPPED first: the
    * distinct (actor, item) projection is aggregated to per-actor item
    * counts (one combinable pass), actors above `maxDegree` are DROPPED
    * (standard co-occurrence practice — a hub's co-engagement signal is
    * noise anyway; the drop is explicit, not sampled), and only then do
    * surviving actors self-join, bounding fan-out at maxDegree² per
    * actor. Output is each pair once (a < b) with its distinct-actor
    * count.
    *
    * @return (item_a, item_b, n_actors)
    */
  def coEngagementPairs(df: DataFrame, actorCol: String, itemCol: String,
                        maxDegree: Int): DataFrame = {
    require(maxDegree >= 2, "need maxDegree >= 2 to form any pair")
    val ai = df.select(col(actorCol).as("__actor"), col(itemCol).as("__item"))
      .distinct()
    val ok = ai.groupBy("__actor")
      .agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") <= maxDegree)
      .select("__actor")
    // Baskets are collected only for CAPPED actors, so per-group
    // aggregation state is <= maxDegree items (collect before the cap
    // would hold a hub's whole history). Pairs then explode MAP-SIDE
    // from each small basket — the engagement table is never self-
    // joined, so it is not shuffled twice; the one remaining
    // aggregation shuffle is the pair stream itself, which is the
    // operator's output-bound cost.
    ai.join(ok, "__actor")
      .groupBy("__actor")
      .agg(collect_list(col("__item")).as("__items"))
      .select(explode(col("__items")).as("__a"), col("__items"))
      .select(col("__a"), explode(col("__items")).as("__b"))
      .filter(col("__a") < col("__b"))
      .groupBy(col("__a").as("item_a"), col("__b").as("item_b"))
      .agg(count(lit(1)).as("n_actors"))
  }

  def skipgramPairs(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, minCount: Long, topK: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(topK > 0, "topK must be positive")
    val toks = docs
      .select(col(idCol).as("__d"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__p", "__w")))
    val probes = toks.select(col("__d"), col("__w").as("__lw"),
      explode(sequence(col("__p") + 1, col("__p") + window)).as("__p"))
    val pairs = probes.join(toks, Seq("__d", "__p"))
      .select(col("__lw"), col("__w").as("__rw"))
    val directional = pairs.select(col("__lw").as("center"), col("__rw").as("context"))
      .unionAll(pairs.select(col("__rw").as("center"), col("__lw").as("context")))
    directional.groupBy("center", "context")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(desc("cnt"), col("center"), col("context"))
      .limit(topK)
  }
}
