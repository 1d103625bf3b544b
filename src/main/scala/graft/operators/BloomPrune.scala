package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning: drop probe-side rows that cannot join
  * BEFORE they reach the join shuffle.
  *
  * At 100 TB the probe side (facts) dominates shuffle volume; when the
  * build side (a filtered dimension) matches only a sliver of it, most
  * probe rows are shuffled just to be discarded by the join. The fix:
  * aggregate the build side's join keys into a Bloom filter (KBs-MBs, ONE
  * row), broadcast it, and filter the probe side with `might_contain`
  * inside its scan stage — rows that cannot match never enter the
  * exchange. False positives survive pruning but are eliminated by the
  * join itself, so the final result is EXACTLY the plain join: the bloom
  * only cuts wire volume, never changes semantics (which is what makes it
  * oracle-checkable against the unpruned join).
  *
  * This is the manual, composable form of Spark's runtime row-level
  * filtering (`spark.sql.optimizer.runtime.bloomFilter.*`, which only
  * triggers under size heuristics on shuffle-join plans); here the
  * pipeline author states the asymmetry explicitly, and the pruned probe
  * remains a plain DataFrame usable by ANY downstream shape (aggregate,
  * window, write), not just the join the optimizer saw.
  *
  * Built on Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions over xxhash64 keys — the exact machinery the runtime
  * filter injects, driven from the public API via the expression bridge.
  */
object BloomPrune {

  private def bloomAgg(key: Column, expectedItems: Long): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(toExpression(xxhash64(key)), expectedItems)
      .toAggregateExpression())
  }

  private def mightContain(bloom: Column, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      toExpression(bloom), toExpression(xxhash64(key))))
  }

  /** The serialized Bloom filter of `build`'s `buildKey` values — one
    * aggregated row pulled to the driver (KBs–MBs; the same bytes Spark's
    * runtime row-level filtering ships as a scalar subquery). NULL when
    * `build` is empty.
    */
  def bloomFilterFor(build: DataFrame, buildKey: String,
                     expectedItems: Long): Array[Byte] =
    build.agg(bloomAgg(col(buildKey), expectedItems).as("__bloom"))
      .head.getAs[Array[Byte]](0)

  /** `probe` reduced to rows whose `probeKey` MIGHT appear among `build`'s
    * `buildKey` values: a superset of the semi-join (bloom false-positive
    * rate ~`1%` at the default sizing), with NULL keys dropped (they can
    * never equi-join).
    *
    * The filter bytes are computed EAGERLY (one action over the build
    * side) and inlined as a literal: `might_contain` requires a constant
    * or scalar-subquery bloom argument, so a lazily-joined one-row table
    * does not analyze. The driver round-trip moves exactly the filter —
    * what a scalar subquery would move anyway — and the probe side is
    * then filtered inside its scan stage with zero shuffle.
    */
  def bloomSemiFilter(probe: DataFrame, probeKey: String,
                      build: DataFrame, buildKey: String,
                      expectedItems: Long): DataFrame = {
    val bytes = bloomFilterFor(build, buildKey, expectedItems)
    if (bytes == null) probe.filter(lit(false)) // empty build: nothing joins
    else probe.filter(mightContain(lit(bytes), col(probeKey)))
  }

  /** Inner equi-join with bloom-pruned probe side — result identical to
    * `probe.join(build, probeKey === buildKey)`, shuffle volume cut to
    * matching rows (+ the bloom's false positives).
    */
  def bloomPrunedJoin(probe: DataFrame, probeKey: String,
                      build: DataFrame, buildKey: String,
                      expectedItems: Long): DataFrame = {
    val pruned = bloomSemiFilter(probe, probeKey, build, buildKey, expectedItems)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
