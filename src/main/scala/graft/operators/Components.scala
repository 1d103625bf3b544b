package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that turns
  * near-duplicate PAIRS (MinHash / SimHash / embedding candidates) into
  * dedup CLUSTERS with one canonical representative (the min id), which is
  * what a training-data pipeline actually acts on: keep the representative,
  * drop the rest.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  *   - propagate: along every edge, a node offers its current component
  *     label to its neighbor; each node keeps the MIN of its own label and
  *     all offers. The min aggregate is map-side combinable, so a
  *     high-degree node (a 10M-member duplicate cluster at 100 TB) reduces
  *     its offers inside each map task instead of funneling them through
  *     one reducer — degree skew is absorbed by partial aggregation.
  *   - jump: label(u) <- label(label(u)) (one self-join). Pointer jumping
  *     halves the remaining path length each round, so convergence takes
  *     O(log diameter) rounds instead of O(diameter) — a 1M-long duplicate
  *     chain converges in ~20 rounds.
  *
  * Per round: two shuffles (edge join + min agg) and one label self-join,
  * all keyed by node id — no cartesian products, nothing driver-side except
  * one scalar per round.
  *
  * Convergence test: labels only ever DECREASE, so the Decimal sum of all
  * labels is a strictly decreasing measure until fixpoint — one cheap
  * scalar aggregate per round replaces a full previous-vs-current anti-join
  * (Decimal(38) keeps the sum exact for any realistic id range; a double
  * sum could miss a single-node change at 1e15 scale).
  *
  * Each round's labels are `localCheckpoint`ed: an iterative self-joining
  * DataFrame otherwise doubles its logical plan every round (analysis cost
  * grows exponentially) — checkpointing truncates the lineage to the
  * materialized result. On a multi-executor cluster a production job would
  * point `spark.checkpoint.dir` at reliable storage and use `checkpoint()`
  * instead (localCheckpoint blocks are lost with an executor); same plan
  * shape either way.
  *
  * Determinism: the fixpoint is the component-min labeling — a pure
  * function of the edge SET, independent of partitioning, merge order, or
  * round count. That is what makes a parallel graph algorithm
  * oracle-checkable against a sequential engine.
  */
object Components {

  /** (id, component) for every node that appears in `edges`; `component`
    * is the smallest node id reachable from `id`. Nodes absent from the
    * edge list are absent from the output (callers union singletons back
    * with component = own id, typically via a left join + coalesce).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    // Symmetrize + drop self-loops/parallel edges once; every round scans
    // this table, so it is persisted for the loop and released after.
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = sym.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("comp"))
        .localCheckpoint()

      def labelSum(l: DataFrame): java.math.BigDecimal = {
        val d = l.agg(sum(col("comp").cast(DecimalType(38, 0)))).head.getDecimal(0)
        if (d == null) java.math.BigDecimal.ZERO else d
      }

      var prevSum = labelSum(labels)
      var round = 0
      var converged = labels.isEmpty
      while (!converged) {
        if (round >= maxRounds)
          throw new IllegalStateException(
            s"connectedComponents did not converge in $maxRounds rounds")
        // fresh aliases on BOTH union branches: `offers` derives from
        // `labels`, so without re-aliasing the two branches share
        // attribute ids and Union's constraint rewrite trips over the
        // self-reference
        val offers = sym.join(labels, sym("u") === labels("node"))
          .select(col("v").as("node"), col("comp").as("comp"))
        val merged = labels.select(col("node").as("node"), col("comp").as("comp"))
          .union(offers)
          .groupBy("node").agg(min("comp").as("comp"))
        val jumped = merged.as("a")
          .join(merged.select(col("node").as("__c"), col("comp").as("__cc")).as("b"),
            col("a.comp") === col("b.__c"), "left")
          .select(col("a.node").as("node"),
            coalesce(col("__cc"), col("a.comp")).as("comp"))
          .localCheckpoint()
        val s = labelSum(jumped)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = jumped
        round += 1
      }
      labels.select(col("node").as("id"), col("comp").as("component"))
    } finally sym.unpersist()
  }

  /** Cluster assignment for a full table: every row of `df` labeled with
    * its duplicate-cluster component (its own id when it appears in no
    * pair), the cluster size, and whether it is the canonical (min-id)
    * representative — the row a dedup pass keeps.
    */
  def dedupClusters(df: DataFrame, idCol: String, pairs: DataFrame,
                    iCol: String = "i", jCol: String = "j"): DataFrame = {
    val comps = connectedComponents(pairs, iCol, jCol)
    val labeled = df.select(col(idCol))
      .join(comps, col(idCol) === col("id"), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("component"))
    val sizes = labeled.groupBy("component").agg(count(lit(1)).as("n_members"))
    labeled.join(sizes, "component")
      .select(col(idCol), col("component"), col("n_members"),
        (col(idCol) === col("component")).cast("long").as("is_canonical"))
  }
}
