package graft

import graft.operators.{GlobalIds, Mixing}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  // Supply proportional to the weights (5:3:2 among mapped sources) —
  // the prefix-share property of a weighted interleave only holds while
  // no source is exhausted, which is the regime a mixture config targets
  // (weights are chosen to drain the sources together).
  private val pattern = Seq("web", "web", "web", "web", "web",
    "wiki", "wiki", "wiki", "code", "code", "junk") // junk unmapped

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, pattern(i % pattern.size)))
    .toDF("id", "src")

  private val weights = Map("web" -> 5L, "wiki" -> 3L, "code" -> 2L)

  private def mixed(n: Int, bucketRows: Long = 16L) =
    Mixing.weightedInterleave(corpus(n), "src",
      orderBucket = expr("id DIV 16"), order = Seq(col("id")),
      weights = weights, keyBucketRows = bucketRows)

  test("matches the window-function reference row for row") {
    val got = mixed(200).select("position", "id", "src", "mix_key")
    // Reference: plain windows (the formulation the operator replaces).
    val l = 30L // lcm(5,3,2)
    val stride = typedLit(weights.map { case (s, w) => (s, l / w) })
    val ref = corpus(200).filter(col("src").isin(weights.keys.toSeq: _*))
      .withColumn("mix_key",
        row_number().over(Window.partitionBy("src").orderBy("id"))
          * stride(col("src")))
      .withColumn("position",
        row_number().over(Window.orderBy(col("mix_key"), col("src")))
          .cast("long") - 1)
      .select("position", "id", "src", "mix_key")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("every prefix holds each source within one slot of its share") {
    val rows = mixed(330).select("position", "src")
      .orderBy("position").collect()
    val total = weights.values.sum.toDouble
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var maxDev = 0.0
    rows.zipWithIndex.foreach { case (r, idx) =>
      counts(r.getString(1)) += 1
      val n = idx + 1
      weights.foreach { case (s, w) =>
        maxDev = math.max(maxDev, math.abs(counts(s) - n * w / total))
      }
    }
    // Rate-monotonic schedule: deviation stays O(1), independent of n.
    assert(maxDev <= weights.size + 1, s"prefix deviation $maxDev")
  }

  test("positions are contiguous, start at 0, and exclude unmapped sources") {
    val got = mixed(110).cache()
    try {
      val n = got.count()
      assert(n === 100) // 10 'junk' rows dropped
      assert(got.agg(min("position"), max("position")).as[(Long, Long)]
        .head() === ((0L, n - 1)))
      assert(got.select("position").distinct().count() === n)
      assert(got.filter(col("src") === "junk").isEmpty)
    } finally { got.unpersist(); () }
  }

  test("result is partitioning-invariant and bucket-width-invariant") {
    val a = mixed(150).select("position", "id").collect().toSet
    val b = Mixing.weightedInterleave(
      corpus(150).repartition(7, col("src")), "src",
      orderBucket = expr("id DIV 16"), order = Seq(col("id")),
      weights = weights, keyBucketRows = 1L)
      .select("position", "id").collect().toSet
    assert(a === b)
  }

  test("contiguousIdsByGroup matches per-group row_number; NULL group drops") {
    val df = Seq(
      (Some("a"), 3L), (Some("a"), 1L), (Some("a"), 2L),
      (Some("b"), 10L), (Some("b"), 5L), (None, 99L)
    ).toDF("g", "v")
    val got = GlobalIds.contiguousIdsByGroup(df, col("g"),
      expr("v DIV 2"), Seq(col("v")), idName = "r")
    val ref = df.filter(col("g").isNotNull)
      .withColumn("r",
        row_number().over(Window.partitionBy("g").orderBy("v")).cast("long") - 1)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    assert(got.count() === 5) // the NULL-group row dropped (documented)
  }

  test("epochWaterfill: brackets, saturation, over-capacity, zero-avail") {
    val Q = 1048576L
    val st = Seq(("A", 100L, 1L), ("B", 100L, 2L), ("C", 100L, 4L),
      ("D", 0L, 9L)) // zero mass -> excluded
      .toDF("src", "avail", "cap")
    def run(b: Long) = Mixing.epochWaterfill(st, "src", "avail", "cap", b)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    // budget 250 < everyone's cap: t = 250/300, nobody saturated
    val low = run(250L)
    assert(low.keySet === Set("A", "B", "C"))
    assert(low.values.forall(!_.getAs[Boolean]("saturated")))
    assert(low("A").getAs[Long]("alloc_tokens") === 100L * 250L / 300L)
    assert(low("A").getAs[Long]("epochs_q20") === 250L * Q / 300L)
    // budget 450: A saturates at cap 1, t = (450-100)/200 = 1.75
    val mid = run(450L)
    assert(mid("A").getAs[Boolean]("saturated") === true)
    assert(mid("A").getAs[Long]("alloc_tokens") === 100L)
    assert(mid("A").getAs[Long]("epochs_q20") === Q)
    assert(mid("B").getAs[Long]("alloc_tokens") === 175L)
    assert(mid("C").getAs[Long]("epochs_q20") === 350L * Q / 200L)
    // budget beyond the 700 capacity: everyone saturates at cap
    val high = run(800L)
    assert(high.values.forall(_.getAs[Boolean]("saturated")))
    assert(high("C").getAs[Long]("alloc_tokens") === 400L)
    assert(high("C").getAs[Long]("epochs_q20") === 4L * Q)
  }

  test("isqrt: exact across the 2^104 domain, NULL past it") {
    import org.apache.spark.sql.functions.col
    val two52m1 = java.math.BigInteger.ONE.shiftLeft(52)
      .subtract(java.math.BigInteger.ONE)
    val inDomain: Seq[java.math.BigInteger] = Seq(
      java.math.BigInteger.ZERO, java.math.BigInteger.ONE,
      java.math.BigInteger.valueOf(2), java.math.BigInteger.valueOf(3),
      java.math.BigInteger.valueOf(4),
      java.math.BigInteger.valueOf(999999999999L),
      two52m1.multiply(two52m1),                       // exact square
      two52m1.multiply(two52m1).add(two52m1.shiftLeft(1)), // root²+2root
      java.math.BigInteger.ONE.shiftLeft(104)
        .subtract(java.math.BigInteger.ONE))           // domain edge
    val outDomain: Seq[java.math.BigInteger] = Seq(
      java.math.BigInteger.ONE.shiftLeft(104),
      java.math.BigInteger.TEN.pow(37))
    val rows = (inDomain ++ outDomain).zipWithIndex.map { case (v, i) =>
      (i.toLong, v.toString)
    }
    val df = rows.toDF("id", "x")
      .select(col("id"), col("x").cast("decimal(38,0)").as("x"))
    val got = df.select(col("id"), graft.functions.isqrt(col("x")).as("r"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getDecimal(1)).map(_.toBigInteger)).toMap
    inDomain.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) === Some(v.sqrt()), s"x=$v")
    }
    outDomain.zipWithIndex.foreach { case (_, i) =>
      assert(got((inDomain.size + i).toLong).isEmpty)
    }
  }
}
