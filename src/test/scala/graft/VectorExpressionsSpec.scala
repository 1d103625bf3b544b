package graft

import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = Seq(
    (1L, Array(1.0f, 2.5f, -3.0f), Array(0.5f, -1.0f, 2.0f)),
    (2L, Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f)),
    (3L, Array.empty[Float], Array.empty[Float])
  ).toDF("id", "a", "b")

  test("native dot product is bit-identical to the HOF fold") {
    val both = pairs.select(
      graft.functions.dotProductF($"a", $"b").as("native"),
      graft.functions.dotProduct($"a", $"b").as("hof"),
      graft.functions.l2NormF($"a").as("native_norm"),
      graft.functions.l2Norm($"a").as("hof_norm")).collect()
    both.foreach { r =>
      // exact bit equality, not tolerance — the whole point is oracle parity
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("mismatched lengths and null inputs yield NULL") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f)), None)
    ).toDF("a", "b")
      .select(graft.functions.dotProductF($"a", $"b").as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("wrong input type fails analysis, not execution") {
    val bad = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(graft.functions.dotProductF($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>") ||
      e.getMessage.toLowerCase.contains("datatype mismatch"))
  }

  test("intersectCountSorted equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L, 9L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L))
    ).toDF("a", "b")
    val rows = df.select(
      graft.functions.intersectCountSorted($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).cast("long").as("generic")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // interpreted path agrees with codegen path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = graft.expressions.IntersectCountSortedLong(
      Literal.create(Array(1L, 3L, 5L, 7L), ArrayType(LongType, false)),
      Literal.create(Array(3L, 4L, 5L, 9L), ArrayType(LongType, false)))
    assert(e.eval(null) === 2L)
  }

  test("string kernels handle edge inputs: empty, whitespace-only, short docs") {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    def ngrams(text: String, n: Int): Seq[Long] = {
      val df = Seq(Tuple1(text)).toDF("t")
        .select(toColumn(graft.expressions.NgramHashSet(toExpression($"t"), n)).as("g"))
      val r = df.collect()(0)
      r.getSeq[Long](0)
    }
    assert(ngrams("", 2).isEmpty)
    assert(ngrams("   \t  ", 2).isEmpty)
    assert(ngrams("solo", 2).isEmpty) // fewer tokens than n
    assert(ngrams("solo", 1).length === 1)
    assert(ngrams("a b", 2).length === 1)
    assert(ngrams("a b a b", 2).toSet.size === 2) // distinct: (a b), (b a)
    // sorted ascending (feeds the merge-intersect kernel)
    val g = ngrams("w x y z q r s t u v", 3)
    assert(g === g.sorted)

    val sims = Seq((1L, ""), (2L, " \t "), (3L, "one"))
      .toDF("id", "t")
      .select($"id", graft.operators.TextAnalysis.simHash($"t").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) === 0L) // no tokens → all votes 0 → sign bits 0
    assert(sims(2L) === 0L)
    assert(sims(3L) !== 0L)
  }

  test("NgramHashSeq is the positional form of NgramHashSet; TokenCountNative = size(tokens)") {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val docs = Seq((1L, "a b c d e"), (2L, "a b a b"), (3L, ""),
      (4L, " \t\n "), (5L, "solo"), (6L, "x  y\tz")).toDF("id", "t")
    val n = 2
    val rows = docs.select($"id",
      graft.functions.ngramHashSeq($"t", n).as("seq"),
      toColumn(graft.expressions.NgramHashSet(toExpression($"t"), n)).as("set"),
      graft.functions.tokenCountNative($"t").as("cnt"),
      size(graft.functions.tokens($"t")).cast("long").as("hof_cnt")).collect()
    rows.foreach { r =>
      val seq = r.getSeq[Long](1)
      val set = r.getSeq[Long](2)
      // the seq deduped+sorted IS the set (same tokenization + hash)
      assert(seq.distinct.sorted === set, s"id=${r.getLong(0)}")
      // positional: one entry per window, count = max(0, tokens - n + 1)
      assert(seq.length === math.max(0L, r.getLong(3) - n + 1),
        s"id=${r.getLong(0)}")
      assert(r.getLong(3) === r.getLong(4), s"id=${r.getLong(0)}")
    }
    // order is positional, not sorted: "a b a b" has windows
    // (a b), (b a), (a b) — first and third equal, middle different
    val ababSeq = rows.find(_.getLong(0) == 2L).get.getSeq[Long](1)
    assert(ababSeq.length === 3)
    assert(ababSeq(0) === ababSeq(2))
    assert(ababSeq(0) !== ababSeq(1))
  }

  test("PolyHashNative is bit-identical to the HOF spec (incl. astral/CJK/whitespace)") {
    val texts = Seq("", " ", "abc", "the quick brown fox",
      "café naïve über", "中文 分词 测试", "emoji 😀😀 mix 🚀 end",
      "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕞𝕒𝕥𝕙", "💯" * 40, "x\ty\nz\fw\rv", "a" * 600,
      "flags 🇺🇳 🇪🇺 and zwj 👩‍🚀 sequence")
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id",
        graft.operators.TextAnalysis.polyHash($"t").as("native"),
        graft.operators.TextAnalysis.polyHashHof($"t").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id=${r.getLong(0)}")
    }
    // interpreted path agrees with codegen (eval through a literal)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.expressions.PolyHashNative(
      Literal.create("emoji 😀 x", org.apache.spark.sql.types.StringType),
      graft.operators.TextAnalysis.HashMod)
    val viaDf = Seq(Tuple1("emoji 😀 x")).toDF("t")
      .select(graft.operators.TextAnalysis.polyHash($"t")).collect()(0).getLong(0)
    assert(e.eval(null) === viaDf)
  }

  test("expression works in both codegen and interpreted mode") {
    val expected = 1.0f * 0.5f + 2.5f * -1.0f + -3.0f * 2.0f
    val viaCodegen = pairs.filter($"id" === 1)
      .select(graft.functions.dotProductF($"a", $"b")).collect()(0).getDouble(0)
    assert(math.abs(viaCodegen - expected.toDouble) < 1e-6)
    // interpreted path: eval through catalyst literals
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val expr = graft.expressions.DotProductFloat(
      Literal.create(Array(1.0f, 2.5f, -3.0f), ArrayType(FloatType, false)),
      Literal.create(Array(0.5f, -1.0f, 2.0f), ArrayType(FloatType, false)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    assert(java.lang.Double.doubleToLongBits(interpreted) ===
      java.lang.Double.doubleToLongBits(viaCodegen))
  }

  test("NearestCentroidCell matches max_by(cid, struct(cos, -cid)) semantics") {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    import org.apache.spark.sql.functions.col
    def cellOf(vecs: Seq[(Long, Seq[Float])], cents: Seq[(Long, Array[Float])]): Map[Long, Long] = {
      val df = vecs.toDF("id", "v")
        .withColumn("__n", graft.functions.l2NormF(col("v")))
      val cids = cents.map(_._1).toArray
      val mat = cents.map(_._2).toArray
      val norms = cents.map(c => math.sqrt(c._2.map(x => x.toDouble * x).sum)).toArray
      df.select(col("id"), toColumn(graft.expressions.NearestCentroidCell(
          toExpression(col("v")), toExpression(col("__n")), cids, mat, norms)).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val cents = Seq(
      0L -> Array(1.0f, 0.0f),
      1L -> Array(0.0f, 1.0f),
      2L -> Array(1.0f, 0.0f)) // duplicate of 0: tie must resolve to cid 0
    val out = cellOf(Seq(
      (10L, Seq(2.0f, 0.1f)),  // nearest x-axis → tie between 0 and 2 → 0
      (11L, Seq(0.1f, 3.0f)),  // nearest y-axis → 1
      (12L, Seq(0.0f, 0.0f))), // zero norm: every cosine NULL → smallest cid
      cents)
    assert(out === Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
    // interpreted eval agrees with the codegen'd path
    val expr = graft.expressions.NearestCentroidCell(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.1f, 3.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal(
        math.sqrt(0.1 * 0.1 + 9.0)),
      Array(0L, 1L, 2L), Seq(cents(0)._2, cents(1)._2, cents(2)._2).toArray,
      Array(1.0, 1.0, 1.0))
    assert(expr.eval(null) === 1L)
  }
}
