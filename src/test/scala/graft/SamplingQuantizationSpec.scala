package graft

import graft.operators.{Quantization, Sampling}
import org.apache.spark.sql.functions._

class SamplingQuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("quantize: codes bounded, extremes hit ±127, mse small") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f, 1.0f))).toDF("id", "v")
    val r = df.select(
      Quantization.maxAbs($"v").as("mx"),
      Quantization.quantize($"v").as("q"),
      Quantization.quantizationMse($"v").as("mse")).collect()(0)
    assert(r.getAs[Double]("mx") === 1.0)
    val q = r.getSeq[Long](r.fieldIndex("q"))
    assert(q === Seq(64L, -127L, 32L, 127L)) // 0.5*127=63.5 → half-up 64
    assert(q.forall(c => c >= -127 && c <= 127))
    assert(r.getAs[Double]("mse") < 1e-4)
  }

  test("quantize: all-zero vector yields zero codes and NULL mse (no ANSI throw)") {
    val df = Seq((1L, Array(0.0f, 0.0f, 0.0f)), (2L, Array(0.5f, -0.5f, 0.0f)))
      .toDF("id", "v")
    val rows = df.select($"id",
      Quantization.quantize($"v").as("q"),
      Quantization.quantizationMse($"v").as("mse"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Long](1) === Seq(0L, 0L, 0L))
    assert(rows(0).isNullAt(2))
    assert(rows(1).getSeq[Long](1) === Seq(127L, -127L, 0L))
    assert(!rows(1).isNullAt(2))
  }

  test("hashBucket: keys beyond 2^31 neither overflow nor throw, stay reduced") {
    // ids at 100TB scale routinely exceed 2^31; the unreduced multiply
    // overflowed signed 64-bit (ANSI: runtime error) for keys >= ~3.5e9.
    val df = Seq(0L, 1L, 2147483647L, 2147483648L, 5000000000L,
      Long.MaxValue).toDF("id")
    val buckets = df.select($"id", Sampling.hashBucket($"id", 100).as("b")).collect()
    buckets.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b < 100, s"bucket $b out of range for key ${r.getLong(0)}")
    }
    // reduction semantics: key and key mod 2^31 land in the same bucket
    val pair = df.filter($"id".isin(2147483648L, 0L))
      .select(Sampling.hashBucket($"id", 100)).as[Long].collect()
    assert(pair.toSet.size === 1)
  }

  test("deterministicSample is reproducible and roughly proportional") {
    val df = spark.range(0, 10000).toDF("id")
    val s1 = Sampling.deterministicSample(df, "id", 10).as[Long].collect().sorted
    val s2 = Sampling.deterministicSample(df, "id", 10).as[Long].collect().sorted
    assert(s1 === s2)
    assert(s1.length > 500 && s1.length < 1500)
  }

  test("hashSplit: exhaustive bands, stable under repartition, agrees with deterministicSample") {
    val df = spark.range(0, 5000).toDF("id")
    val split = Sampling.hashSplit(df, "id", trainPct = 80, valPct = 10)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 5000L)
    assert(counts("train") > 3500 && counts("val") < 1000)
    // Membership is a function of the key alone — repartitioning must
    // not move a single row between splits.
    val a = split.orderBy("id").select("split").as[String].collect()
    val b = Sampling.hashSplit(df.repartition(13), "id", 80, 10)
      .orderBy("id").select("split").as[String].collect()
    assert(a === b)
    // train band == deterministicSample at the same pct (same buckets).
    val train = split.filter($"split" === "train").select("id").as[Long].collect().sorted
    val det = Sampling.deterministicSample(df, "id", 80).select("id").as[Long].collect().sorted
    assert(train === det)
    intercept[IllegalArgumentException](Sampling.hashSplit(df, "id", 80, 30))
  }

  test("stratifiedSample: exact ceil(fraction*n) per stratum, reproducible") {
    val df = (1 to 100).map(i => (i.toLong, if (i <= 30) "a" else "b"))
      .toDF("id", "s")
    val sample = Sampling.stratifiedSample(df, "s", "id", 0.2)
    val counts = sample.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") === 6) // ceil(30*0.2)
    assert(counts("b") === 14) // ceil(70*0.2)
    val again = Sampling.stratifiedSample(df, "s", "id", 0.2)
      .select("id").as[Long].collect().sorted
    assert(again === sample.select("id").as[Long].collect().sorted)
  }

  test("temperatureQuota: sqrt-weighted exact quotas, oversized quota takes all") {
    // strata sizes 400 / 100 / 4: sqrt weights 20 / 10 / 2, denom 32.
    // target 64 → quotas floor(64*20/32)=40, floor(64*10/32)=20,
    // floor(64*2/32)=4 (= whole stratum c).
    val df = ((1 to 400).map(i => (i.toLong, "a")) ++
      (1001 to 1100).map(i => (i.toLong, "b")) ++
      (2001 to 2004).map(i => (i.toLong, "c"))).toDF("id", "s")
    val out = Sampling.temperatureQuota(df, "s", "id", totalTarget = 64)
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 40L, "b" -> 20L, "c" -> 4L))
    // reproducible and a subset chosen by the (hash bucket, key) order
    val again = Sampling.temperatureQuota(df, "s", "id", totalTarget = 64)
      .select("id").as[Long].collect().sorted
    assert(again === out.select("id").as[Long].collect().sorted)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"s")
      .orderBy(Sampling.hashBucket($"id", 1000000), $"id")
    val ref = df.withColumn("rn", row_number().over(w))
      .filter(($"s" === "a" && $"rn" <= 40) || ($"s" === "b" && $"rn" <= 20) ||
        ($"s" === "c" && $"rn" <= 4))
      .select("id").as[Long].collect().sorted
    assert(again === ref)
  }

  test("matchDistribution: proportional quotas, tightest stratum binds") {
    // sizes 400 / 100 / 4 with weights 2 / 1 / 1: C = min(200, 100, 4)
    // = 4 → quotas 8 / 4 / 4; result proportions equal the weights.
    val df = ((1 to 400).map(i => (i.toLong, "a")) ++
      (1001 to 1100).map(i => (i.toLong, "b")) ++
      (2001 to 2004).map(i => (i.toLong, "c"))).toDF("id", "s")
    val out = Sampling.matchDistribution(df, "s", "id",
      Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0))
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 8L, "b" -> 4L, "c" -> 4L))
  }

  test("matchDistribution: unweighted strata drop; missing target empties") {
    val df = ((1 to 40).map(i => (i.toLong, "a")) ++
      (101 to 120).map(i => (i.toLong, "b"))).toDF("id", "s")
    val dropped = Sampling.matchDistribution(df, "s", "id", Map("a" -> 1.0))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dropped === Map("a" -> 40L)) // b has no weight → gone
    // target stratum absent from corpus → unreachable distribution → empty
    assert(Sampling.matchDistribution(df, "s", "id",
      Map("a" -> 1.0, "zz" -> 1.0)).count() === 0L)
  }

  test("stratifiedSample matches the rank-window formulation row-for-row") {
    // the two-pass threshold design must reproduce the old semantics
    // exactly: rank by (hashBucket asc, key asc), keep rank <= ceil(f*n)
    val df = (1 to 997).map(i => (i.toLong, s"s${i % 7}")).toDF("id", "s")
    for (f <- Seq(0.1, 0.25, 0.5, 1.0)) {
      val got = Sampling.stratifiedSample(df, "s", "id", f)
        .select("id").as[Long].collect().sorted
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"s")
        .orderBy(Sampling.hashBucket($"id", 1000000), $"id")
      val cw = org.apache.spark.sql.expressions.Window.partitionBy($"s")
      val want = df.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(cw))
        .filter($"__rn" <= ceil($"__n" * f))
        .select("id").as[Long].collect().sorted
      assert(got === want, s"fraction $f")
    }
  }

  test("stratifiedSample plan: no raw-data window partitioned by stratum alone") {
    // the scale contract: any single-column (stratum-only) window must sit
    // over the per-(stratum,bucket) HISTOGRAM aggregate, never over the
    // raw rows — a raw-data per-stratum window funnels each stratum
    // through one task (~20 TB sorts at 100 TB scale).
    val df = (1 to 100).map(i => (i.toLong, if (i <= 30) "a" else "b"))
      .toDF("id", "s")
    val qe = Sampling.stratifiedSample(df, "s", "id", 0.2).queryExecution
    val windows = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val overAggregate = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isDefined
      assert(w.partitionSpec.size >= 2 || overAggregate,
        s"stratum-only window over raw data:\n$w")
    }
  }

  test("prioritySample: k largest priorities, tau threshold, est = max(w, tau)") {
    val df = (0L until 30L).map(i => (i, (i % 7 + 1) * 10)).toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", k = 5)
      .orderBy("rank").collect()
    // replicate the arithmetic exactly
    def pri(id: Long, w: Long): Double =
      w.toDouble * 4294967296.0 / ((((id % 2147483648L) * 2654435761L) % 4294967296L) + 1).toDouble
    val all = (0L until 30L).map(i => (i, (i % 7 + 1) * 10L))
      .map { case (i, w) => (i, w, pri(i, w)) }
      .sortBy { case (i, _, p) => (-p, i) }
    val tau = all(5)._3
    assert(got.map(_.getLong(0)).toSeq == all.take(5).map(_._1))
    assert(got.map(_.getDouble(3)).toSeq == all.take(5).map(_._3))
    assert(got.map(_.getDouble(4)).toSeq ==
      all.take(5).map { case (_, w, _) => math.max(w.toDouble, tau) })
    // every sampled priority clears the threshold
    assert(got.forall(_.getDouble(3) >= tau))
  }

  test("prioritySample: corpus smaller than k is exact (tau=0, est=w)") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 0L)).toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", k = 5)
      .orderBy("id").collect()
    // zero-weight row excluded; survivors estimate their own weight
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got.map(r => r.getDouble(4)).toSeq == Seq(10.0, 20.0))
  }

  test("neymanAllocation: variable strata earn samples, constant strata earn none") {
    import org.apache.spark.sql.functions.col
    // stratum a: constant (sigma 0); stratum b: spread
    val d = (Seq.fill(10)(("a", 5L)) ++
      Seq(("b", 0L), ("b", 10L), ("b", 0L), ("b", 10L))).toDF("g", "v")
    val r = graft.operators.Sampling
      .neymanAllocation(d, "g", col("v"), budget = 100L)
      .orderBy("g").collect()
    assert(r(0).getAs[Long]("var_num") === 0L)
    assert(r(0).getAs[Long]("alloc") === 0L)
    // all weight on b -> floor(100 * w / w) = 100
    assert(r(1).getAs[Long]("alloc") === 100L)
    assert(r(1).getAs[Double]("share") === 1.0)
    assert(r.forall(_.getAs[Long]("remainder") === 0L))
  }

  test("neymanAllocation: equal strata split evenly; remainder is the floor loss") {
    import org.apache.spark.sql.functions.col
    val d = (Seq(("a", 0L), ("a", 10L)) ++ Seq(("b", 0L), ("b", 10L)) ++
      Seq(("c", 0L), ("c", 10L))).toDF("g", "v")
    val r = graft.operators.Sampling
      .neymanAllocation(d, "g", col("v"), budget = 100L)
      .orderBy("g").collect()
    assert(r.map(_.getAs[Long]("alloc")).toSeq === Seq(33L, 33L, 33L))
    assert(r.forall(_.getAs[Long]("remainder") === 1L))
    assert(math.abs(r.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
  }

  test("neymanAllocation: all-constant corpus allocates nothing, budget intact") {
    import org.apache.spark.sql.functions.col
    val d = Seq(("a", 5L), ("b", 7L)).toDF("g", "v")
    val r = graft.operators.Sampling
      .neymanAllocation(d, "g", col("v"), budget = 50L).collect()
    assert(r.forall(_.getAs[Long]("alloc") === 0L))
    assert(r.forall(_.getAs[Long]("remainder") === 50L))
  }

  test("bootstrapMedian: unit weights reproduce the exact median; replicates vary") {
    import org.apache.spark.sql.functions.col
    val d = (1L to 101L).map(k => (k, k)).toDF("k", "v")
    val rows = graft.operators.Sampling
      .bootstrapMedian(d, "k", col("v"), replicates = 16).collect()
    assert(rows.length === 16)
    // every replicate's weighted median is a real data value near the
    // true median 51, and n_eff ~ n (Poisson(1) total)
    assert(rows.forall(r => r.getAs[Long]("median") >= 30L &&
      r.getAs[Long]("median") <= 72L))
    assert(rows.forall(r => math.abs(r.getAs[Long]("n_eff") - 101L) < 50L))
    // deterministic: same call, same table
    val again = graft.operators.Sampling
      .bootstrapMedian(d, "k", col("v"), replicates = 16).collect()
    assert(rows.map(r => (r.getAs[Long]("b"), r.getAs[Long]("median")))
      .toSet === again.map(r => (r.getAs[Long]("b"),
      r.getAs[Long]("median"))).toSet)
  }

  test("jainFairness and dispersion verdicts are exact integer comparisons") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // equal groups -> jain 1
    val eq = (Seq.fill(3)("a") ++ Seq.fill(3)("b")).toDF("g")
    val j = graft.operators.Profiling.jainFairness(eq, "g").collect()(0)
    assert(j.getAs[Double]("jain") === 1.0)
    // one group holds everything among n=2 groups -> 1/2... requires a
    // second empty group which a histogram cannot see; skewed case:
    val sk = (Seq.fill(9)("a") ++ Seq.fill(1)("b")).toDF("g")
    val js = graft.operators.Profiling.jainFairness(sk, "g").collect()(0)
    assert(js.getAs[Double]("jain") === 100.0 / (2.0 * 82.0))
    // dispersion: buckets 1,1,4 -> n=3 S=6 Q=18: num=54-36=18 den=18 -> D=1
    val ev = Seq(("t", 0L), ("t", 1L), ("t", 2L), ("t", 2L), ("t", 2L),
      ("t", 2L)).toDF("ty", "b")
    val dd = graft.operators.EventAnalytics
      .dispersionByGroup(ev, col("ty"), col("b")).collect()(0)
    assert(dd.getAs[Long]("disp_num") === 18L)
    assert(dd.getAs[Long]("disp_den") === 18L)
    assert(!dd.getAs[Boolean]("overdispersed")) // strict: D = 1 is not over
  }
}
