package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-DENSITY clustering (DBSCAN's cell-grid approximation) over two
  * embedding dimensions — the density-based complement to [[Pq]]/k-means
  * partition clustering: finds arbitrarily-shaped dense regions and
  * labels sparse points NOISE instead of forcing every point into a
  * centroid cell.
  *
  * Semantics: quantize the chosen two coordinates to integer grid cells
  * (`floor(v·mult)`, clamped to ±2²⁰ so outlier magnitudes collapse into
  * boundary cells instead of overflowing the cell key); a cell with ≥
  * `minPts` points is CORE; core cells that touch (Chebyshev distance ≤
  * 1 — the 8-neighborhood) merge into one cluster via
  * [[Components.connectedComponents]]; every point in a core cell gets
  * its cluster id, points in non-core cells get NULL + `noise = true`.
  * This is classic grid-DBSCAN: ε ≈ cell width, minPts per cell rather
  * than per ε-ball — deterministic, exact, and oracle-reproducible
  * (no float distance comparisons anywhere: cells are BIGINT).
  *
  * Scale shape: the corpus collapses to the occupied-CELL histogram in
  * one combinable aggregate; the neighbor join is a 9-way explode of
  * CORE cells equi-joined back on cell coordinates (no distance join,
  * no candidate pairs over points); connected components runs on the
  * core-cell graph — nodes bounded by occupied-cell count, never point
  * count. Point labels come back through one broadcastable cell-id
  * equi-join. 100 TB of points with a bounded grid is the same CC
  * problem as 1 GB.
  *
  * Reference basis: grid-based DBSCAN approximations in the density
  * clustering literature; same CC machinery as the dedup cluster tier
  * (q47).
  */
object DensityCluster {

  private val Cap = 1048576L // ±2^20 cell-coordinate clamp

  /** @param mult   grid resolution: cell = floor(value · mult)
    * @param minPts core-cell threshold (≥ minPts points in the cell)
    * @param dimX   0-based index of the first coordinate
    * @param dimY   0-based index of the second coordinate
    * @return one row per input point: (idCol, cx, cy, cluster, noise) —
    *         `cluster` is the smallest member cell's encoded id, NULL
    *         for noise points
    */
  def gridClusters(df: DataFrame, idCol: String, vecCol: String,
                   mult: Double = 16.0, minPts: Long = 4L,
                   dimX: Int = 0, dimY: Int = 1): DataFrame = {
    require(minPts >= 1, "minPts must be positive")
    require(dimX != dimY, "need two distinct coordinates")
    def cell(i: Int): Column = greatest(lit(-Cap), least(lit(Cap),
      floor(element_at(col("__v"), i + 1).cast("double") * lit(mult))
        .cast("long")))
    // node id: (cx+2^20)·2^22 + (cy+2^20) < 2^43 — collision-free under
    // the clamp
    def node(x: Column, y: Column): Column =
      (x + Cap) * lit(4194304L) + (y + Cap)
    val pts = df
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull &&
        size(col("__v")) > lit(math.max(dimX, dimY)))
      .select(col("__id"), cell(dimX).as("cx"), cell(dimY).as("cy"))
    val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("__c"))
    val core = cells.filter(col("__c") >= minPts).select("cx", "cy")
    // 9-neighborhood (incl. self: guarantees isolated core cells appear
    // in the edge list as singleton components)
    val nbr = core
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("cx"), col("cy"),
        (col("cx") + col("dx")).as("nx"), (col("cy") + col("dy")).as("ny"))
    val edges = nbr
      .join(core.select(col("cx").as("nx"), col("cy").as("ny")),
        Seq("nx", "ny"))
      .select(node(col("cx"), col("cy")).as("src"),
        node(col("nx"), col("ny")).as("dst"))
    val comp = Components.connectedComponents(edges, "src", "dst")
      .select(col("id").as("__node"), col("component").as("__comp"))
    // CC drops self-loops, so an ISOLATED core cell is absent from its
    // output — union singletons back with component = own id (the
    // documented connectedComponents contract).
    val coreMark = core.withColumn("__core", lit(true))
    pts
      .withColumn("__node", node(col("cx"), col("cy")))
      .join(coreMark, Seq("cx", "cy"), "left")
      .join(comp, Seq("__node"), "left")
      .withColumn("cluster",
        coalesce(col("__comp"), when(col("__core"), col("__node"))))
      .select(col("__id").as(idCol), col("cx"), col("cy"), col("cluster"),
        col("cluster").isNull.as("noise"))
  }
}
