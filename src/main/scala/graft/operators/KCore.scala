package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** k-core extraction over an undirected simple graph — the fourth graph
  * primitive next to [[Components]], [[PageRank]] and [[Triangles]]: the
  * k-core is the maximal subgraph where every node keeps ≥ k neighbors,
  * the standard density filter for "real community vs stragglers" (a
  * near-dup cluster's core survives; chains of borderline pairs peel
  * away) and for link-farm/spam pruning in crawl graphs.
  *
  * Algorithm: synchronous peeling. Each round drops every node whose
  * CURRENT degree is below k, then the edges touching it; the survivor
  * set shrinks monotonically and the fixpoint is the k-core (classic
  * Batagelj–Zaveršnik, parallelized the obvious way). Peeling is
  * IDEMPOTENT at the fixpoint — extra rounds are no-ops — so the
  * operator's contract is "`rounds` rounds of peeling", which a SQL
  * oracle can unroll literally: any unroll ≥ the convergence depth
  * produces the identical (exact, integer-only) result. The loop stops
  * early once an edge-count probe (one scalar per round, the
  * [[Components]] convergence pattern) stops moving; `rounds` is the
  * documented ceiling, not the forced cost.
  *
  * 100 TB story: each round is one map-side-combinable degree count
  * (explode both endpoints → sum per node) plus two broadcast-or-shuffle
  * semi-joins of edges against the keep-set — all keyed work, no
  * driver-side graph. Rounds needed equal the peeling DEPTH (longest
  * chain of cascading removals), which for power-law graphs is small
  * (the heavy core never peels; tendrils go in a handful of rounds).
  * Edges are `localCheckpoint`ed per round to truncate lineage, exactly
  * as [[Components]]/[[PageRank]]; a cluster deployment swaps in
  * reliable `checkpoint`.
  *
  * Input tolerance matches [[Triangles]]: direction, duplicates and
  * self-loops normalize away; NULL endpoints drop.
  */
object KCore {

  /** @param k      minimum degree to survive (k ≥ 1)
    * @param rounds peeling-round ceiling; the result is bit-identical
    *               for every value ≥ the graph's convergence depth
    * @return nodes of the k-core: (node LONG, core_deg LONG) where
    *         core_deg is the degree WITHIN the core (≥ k by definition);
    *         empty when the graph has no k-core
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int = 32): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spark = edges.sparkSession

    def degrees(und: DataFrame): DataFrame =
      und.select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))

    var und = edges
      .select(col(srcCol).cast(LongType).as("a"), col(dstCol).cast(LongType).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(eager = true)
    var edgeCount = und.count()
    var round = 0
    var converged = edgeCount == 0L
    while (!converged && round < rounds) {
      val keep = degrees(und).filter(col("deg") >= k)
        .select(col("node"))
      // keep has at most 2·edgeCount nodes, and edgeCount is already
      // materialized this round — so the broadcast decision is free
      // (Components.maybeBcast): under the cap the two semi-joins stop
      // re-exchanging the full edge set against a stats-less aggregate
      // (und is a checkpointed leaf, so the planner's estimates are
      // blind here); above it the plan is the previous sort-merge.
      val keepB = Components.maybeBcast(keep, 2 * edgeCount)
      val next = und
        .join(keepB.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keepB.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(eager = false)
      val nextCount = next.count() // materializes the checkpoint
      converged = nextCount == edgeCount || nextCount == 0L
      und = next
      edgeCount = nextCount
      round += 1
    }
    if (edgeCount == 0L)
      spark.emptyDataFrame
        .select(lit(0L).as("node"), lit(0L).as("core_deg")).limit(0)
    else
      degrees(und).select(col("node"), col("deg").as("core_deg"))
  }
}
