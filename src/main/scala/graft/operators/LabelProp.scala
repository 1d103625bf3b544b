package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Synchronous label propagation (LPA, Raghavan–Albert–Kumara) over an
  * undirected simple graph — the community-detection primitive next to
  * [[Components]] (which finds CONNECTED pieces; LPA splits a connected
  * graph into DENSE neighborhoods, e.g. topic clusters in a near-dup
  * pair graph or product communities in a purchase graph).
  *
  * Semantics, pinned for determinism: every node starts with its own id
  * as label; each ROUND every node simultaneously adopts the most
  * frequent label among its NEIGHBORS (its own current label does not
  * vote), ties broken toward the SMALLEST label; after `rounds` rounds
  * the (node, label) assignment is emitted. Synchronous updates make the
  * result independent of visit order — the property that lets a parallel
  * engine hash-match a sequential SQL oracle bit-for-bit — at the
  * documented cost that classic ASYNC LPA's convergence theorem does not
  * apply: bipartite-ish regions can oscillate with period 2, so the
  * contract is "exactly `rounds` synchronous rounds" (the [[KCore]]
  * unrolled-round pattern), not "the fixpoint".
  *
  * 100 TB story: one round = one equi-join of the symmetrized adjacency
  * against the label table (both keyed by node — co-partitioned after
  * the first round) + one map-side-combinable (node, label) count + one
  * `min_by` argmax per node. No driver-side graph, no collect; per-round
  * shuffle is bounded by edge count. Labels are `localCheckpoint`ed per
  * round to truncate lineage exactly as [[PageRank]]; a cluster
  * deployment swaps in reliable `checkpoint`. Input tolerance matches
  * [[Triangles]]: direction, duplicates and self-loops normalize away;
  * NULL endpoints drop.
  */
object LabelProp {

  /** @param rounds number of synchronous rounds (≥ 1)
    * @return (node LONG, label LONG) — the label after `rounds` rounds;
    *         isolated nodes (no edges) are absent, as in every graph
    *         operator here
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val und = edges
      .select(col(srcCol).cast(LongType).as("a"), col(dstCol).cast(LongType).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
      .localCheckpoint(eager = true)
    var labels = adj.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        // argmax by (count DESC, label ASC) in one aggregate: min_by over
        // the lexicographic (-cnt, label) struct — no per-node sort, no
        // row_number window over the full message table.
        .agg(min_by(col("label"),
          struct((-col("cnt")).as("nc"), col("label"))).as("label"))
        .localCheckpoint(eager = false)
    }
    labels.select(col("node"), col("label"))
  }
}
