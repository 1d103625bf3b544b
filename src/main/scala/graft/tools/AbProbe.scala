package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** In-JVM A/B probe (optimization round): OLD vs NEW operator shapes
  * interleaved in one session so ambient host drift cancels. Scratch
  * tool — not referenced by queries.
  */
object AbProbe {

  // ---- OLD boundedHops (pre-round-17 shape) --------------------------
  private def boundedHopsOld(edges: DataFrame, srcCol: String, dstCol: String,
                             seeds: DataFrame, seedCol: String,
                             maxHops: Int): DataFrame = {
    val e = graft.operators.CacheScope.track(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
        .filter(col("u") =!= col("v")).distinct())
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("d", lit(0L))
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("d") === lit(h - 1L))
      val offers = frontier.join(e, frontier("node") === e("u"))
        .select(col("v").as("node"), lit(h.toLong).as("d"))
      dist = graft.operators.CacheScope.track(
        dist.unionByName(offers).groupBy("node").agg(min("d").as("d")))
    }
    dist
  }

  // ---- OLD connectedComponents (pre-round-17 shape) ------------------
  private def starMin(g: DataFrame): DataFrame =
    g.groupBy(col("u"))
      .agg(min(col("v")).as("__mn"))
      .select(col("u").as("node"), least(col("u"), col("__mn")).as("comp"))

  private def contractOld(g: DataFrame, m: DataFrame): DataFrame =
    g.join(m.select(col("node").as("__nu"), col("comp").as("__cu")),
        col("u") === col("__nu"))
      .join(m.select(col("node").as("__nv"), col("comp").as("__cv")),
        col("v") === col("__nv"))
      .select(col("__cu").as("u"), col("__cv").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  private def applyMapOld(base: DataFrame, m: DataFrame): DataFrame =
    base.join(m.select(col("node").as("__n"), col("comp").as("__c")),
        base("comp") === col("__n"), "left")
      .select(base("node").as("node"),
        coalesce(col("__c"), base("comp")).as("comp"))

  private def labelSum(l: DataFrame): java.math.BigDecimal = {
    val d = l.agg(sum(col("comp").cast(
      org.apache.spark.sql.types.DecimalType(38, 0)))).head.getDecimal(0)
    if (d == null) java.math.BigDecimal.ZERO else d
  }

  private def propagateOld(g: DataFrame, maxRounds: Int): DataFrame = {
    var labels = starMin(g).localCheckpoint(eager = false)
    var prevSum = labelSum(labels)
    var round = 0
    var converged = labels.isEmpty
    while (!converged) {
      if (round >= maxRounds) throw new IllegalStateException("no converge")
      val offers = g.join(labels, g("u") === labels("node"))
        .select(col("v").as("node"), col("comp").as("comp"))
      val merged = labels.select(col("node").as("node"), col("comp").as("comp"))
        .union(offers)
        .groupBy("node").agg(min("comp").as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val jumped = applyMapOld(merged, merged).localCheckpoint(eager = false)
      val s = labelSum(jumped)
      merged.unpersist()
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = jumped
      round += 1
    }
    labels
  }

  private def ccOld(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    try {
      val m0 = starMin(sym).localCheckpoint()
      val remnant = contractOld(sym, m0).localCheckpoint()
      val labels =
        if (remnant.isEmpty) m0
        else applyMapOld(m0, propagateOld(remnant, 50))
      labels.select(col("node").as("id"), col("comp").as("component"))
    } finally { e.unpersist(); () }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = graft.operators.CacheScope.track(
      graft.operators.Cooccur.coEngagementPairs(li,
        "l_orderkey", "l_partkey", maxDegree = 6)
        .select(col("item_a"), col("item_b")))
    edges.count()
    val items = li.select(col("l_partkey").as("item")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    items.count()
    val seeds = items.filter(col("item") % 97 === 0)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val which = args.headOption.getOrElse("cc,hops")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val res = collection.mutable.Map.empty[String, List[Double]]
    (1 to reps).foreach { _ =>
      import graft.operators.CacheScope.scoped
      if (which.contains("tiny")) {
        // a q349-shaped pair graph: a few hundred 2-cliques
        val tiny = graft.operators.CacheScope.track(
          spark.range(0, 5000).selectExpr("id as item_a", "id + 1 as item_b")
            .where("id % 17 = 0"))
        tiny.count()
        res("tiny_old") = time {
          scoped { ccOld(tiny, "item_a", "item_b").count() }; ()
        } :: res.getOrElse("tiny_old", Nil)
        res("tiny_new") = time {
          scoped { graft.operators.Components.connectedComponents(
            tiny, "item_a", "item_b").count() }; ()
        } :: res.getOrElse("tiny_new", Nil)
      }
      if (which.contains("cc")) {
        res("cc_old") = time {
          scoped { ccOld(edges, "item_a", "item_b").count() }; ()
        } :: res.getOrElse("cc_old", Nil)
        res("cc_new") = time {
          scoped { graft.operators.Components.connectedComponents(
            edges, "item_a", "item_b").count() }; ()
        } :: res.getOrElse("cc_new", Nil)
      }
      if (which.contains("hops")) {
        res("hops_old") = time {
          scoped { boundedHopsOld(edges, "item_a", "item_b", seeds, "item", 4)
            .count() }; ()
        } :: res.getOrElse("hops_old", Nil)
        res("hops_new") = time {
          scoped { graft.operators.Components.boundedHops(
            edges, "item_a", "item_b", seeds, "item", 4).count() }; ()
        } :: res.getOrElse("hops_new", Nil)
      }
    }
    res.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      println(f"[ab] $k%-10s min ${vs.min}%7.3f  med ${vs.sorted.apply(vs.size / 2)}%7.3f  all ${vs.reverse.map(v => f"$v%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
