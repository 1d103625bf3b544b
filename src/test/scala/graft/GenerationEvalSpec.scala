package graft

import graft.operators.GenerationEval

class GenerationEvalSpec extends SparkSpec {
  import spark.implicits._

  private def one(cand: String, ref: String, n: Int) =
    GenerationEval.rougeN(
      Seq((1L, cand, ref)).toDF("pid", "cand", "ref"),
      "pid", "cand", "ref", n).collect()(0)

  test("rougeN: hand-computed ROUGE-1 on a 2/3-overlap pair") {
    val r = one("the cat sat", "the cat lay", 1)
    assert(r.getAs[Long]("n_cand_grams") === 3L)
    assert(r.getAs[Long]("n_ref_grams") === 3L)
    assert(r.getAs[Long]("overlap") === 2L)
    // P = R = 2/3, F1 = 4/6 = 2/3; q20 floor of 2/3 = 699050
    assert(r.getAs[Long]("rouge_p_q20") === 699050L)
    assert(r.getAs[Long]("rouge_f1_q20") === 699050L)
  }

  test("rougeN: clipping caps repeated candidate grams at the ref count") {
    val r = one("a a a a", "a b", 1)
    // cand has 4 'a', ref has 1 'a' -> clipped overlap 1; P = 1/4, R = 1/2
    assert(r.getAs[Long]("overlap") === 1L)
    assert(r.getAs[Long]("rouge_p_q20") === 1048576L / 4)
    assert(r.getAs[Long]("rouge_r_q20") === 1048576L / 2)
    // F1 = 2*1/(4+2) = 1/3
    assert(r.getAs[Long]("rouge_f1_q20") === 1048576L / 3)
  }

  test("rougeN: bigram order sensitivity — reversed text shares no bigram") {
    val r = one("a b c", "c b a", 2)
    assert(r.getAs[Long]("n_cand_grams") === 2L)
    assert(r.getAs[Long]("overlap") === 0L)
    assert(r.getAs[Long]("rouge_f1_q20") === 0L)
    // identical text is a perfect score
    val p = one("a b c", "a b c", 2)
    assert(p.getAs[Long]("rouge_f1_q20") === 1048576L)
  }

  test("rougeN: empty/NULL sides — NULL where undefined, 0 where defined") {
    // empty reference: recall undefined, precision defined and 0
    val r = one("a b", "", 1)
    assert(r.getAs[Long]("n_ref_grams") === 0L)
    assert(r.isNullAt(r.fieldIndex("rouge_r_q20")))
    assert(r.getAs[Long]("rouge_p_q20") === 0L)
    assert(r.getAs[Long]("rouge_f1_q20") === 0L)
    // both sides shorter than n: the pair still surfaces, all NULL ratios
    val b = GenerationEval.rougeN(
      Seq((7L, "x", null.asInstanceOf[String])).toDF("pid", "cand", "ref"),
      "pid", "cand", "ref", 2).collect()(0)
    assert(b.getAs[Long]("pid") === 7L)
    assert(b.getAs[Long]("n_cand_grams") === 0L)
    assert(b.isNullAt(b.fieldIndex("rouge_f1_q20")))
  }

  private def oneL(cand: String, ref: String, maxTokens: Int = 256) =
    GenerationEval.rougeL(
      Seq((1L, cand, ref)).toDF("pid", "cand", "ref"),
      "pid", "cand", "ref", maxTokens).collect()(0)

  test("rougeL: hand-computed LCS metrics") {
    val r = oneL("a b c d", "a x c")
    assert(r.getAs[Long]("lcs_len") === 2L) // [a, c]
    assert(r.getAs[Long]("rouge_l_p_q20") === 1048576L / 2)
    assert(r.getAs[Long]("rouge_l_r_q20") === 2L * 1048576L / 3)
    assert(r.getAs[Long]("rouge_l_f1_q20") === 4L * 1048576L / 7)
  }

  test("rougeL: order sensitivity where ROUGE-1 sees full overlap") {
    val r = oneL("a b c", "c b a")
    assert(r.getAs[Long]("lcs_len") === 1L) // any single token
    // repetition structure: LCS of 'a b a' vs 'b a b' is 2
    assert(oneL("a b a", "b a b").getAs[Long]("lcs_len") === 2L)
  }

  test("rougeL: truncation bounds the kernel and the reported counts") {
    val r = oneL("a b c", "a b z", maxTokens = 2)
    assert(r.getAs[Long]("n_cand_tokens") === 2L)
    assert(r.getAs[Long]("n_ref_tokens") === 2L)
    assert(r.getAs[Long]("lcs_len") === 2L) // 'c'/'z' never seen
    assert(r.getAs[Long]("rouge_l_f1_q20") === 1048576L)
  }

  test("rougeL: empty sides — NULL where undefined, 0 where defined") {
    val r = oneL("", "a")
    assert(r.getAs[Long]("lcs_len") === 0L)
    assert(r.isNullAt(r.fieldIndex("rouge_l_p_q20")))
    assert(r.getAs[Long]("rouge_l_r_q20") === 0L)
    assert(r.getAs[Long]("rouge_l_f1_q20") === 0L)
  }

  test("rougeL matches a scala-side LCS on fuzz pairs") {
    val words = Vector("a", "b", "c", "d")
    def text(seed: Int, len: Int): String =
      (0 until len).map(i => words((seed * 19 + i * 7) % words.size))
        .mkString(" ")
    def lcsRef(x: Seq[String], y: Seq[String]): Int = {
      val dp = Array.ofDim[Int](x.size + 1, y.size + 1)
      for (i <- 1 to x.size; j <- 1 to y.size)
        dp(i)(j) = if (x(i - 1) == y(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(x.size)(y.size)
    }
    val pairs = (0 until 50).map(i =>
      (i.toLong, text(i, i % 11), text(i + 5, (i * 3) % 9)))
    val got = GenerationEval.rougeL(pairs.toDF("pid", "cand", "ref"),
      "pid", "cand", "ref").collect()
      .map(r => r.getAs[Long]("pid") -> r.getAs[Long]("lcs_len")).toMap
    pairs.foreach { case (id, c, r) =>
      val exp = lcsRef(c.split("\\s+").filter(_.nonEmpty).toSeq,
        r.split("\\s+").filter(_.nonEmpty).toSeq)
      assert(got(id) === exp.toLong, s"pid=$id")
    }
  }

  test("rougeN matches a scala-side reference on fuzz pairs") {
    val words = Vector("a", "b", "cc", "d", "ee", "f")
    def text(seed: Int, len: Int): String =
      (0 until len).map(i => words((seed * 31 + i * 17) % words.size))
        .mkString(" ")
    val pairs = (0 until 40).map(i =>
      (i.toLong, text(i, i % 9), text(i + 3, (i * 5) % 7)))
    val df = pairs.toDF("pid", "cand", "ref")
    for (n <- Seq(1, 2, 3)) {
      def gs(t: String): Seq[String] = {
        val tk = t.split("\\s+").filter(_.nonEmpty).toSeq
        if (tk.size < n) Seq.empty
        else tk.sliding(n).map(_.mkString(" ")).toSeq
      }
      val exp = pairs.map { case (id, c, r) =>
        val (cg, rg) = (gs(c), gs(r))
        val cm = cg.groupBy(identity).view.mapValues(_.size)
        val rm = rg.groupBy(identity).view.mapValues(_.size)
        val ov = cm.map { case (g, cc) => math.min(cc, rm.getOrElse(g, 0)) }.sum
        id -> ((cg.size.toLong, rg.size.toLong, ov.toLong))
      }.toMap
      val got = GenerationEval.rougeN(df, "pid", "cand", "ref", n)
        .collect().map(r => r.getAs[Long]("pid") ->
          ((r.getAs[Long]("n_cand_grams"), r.getAs[Long]("n_ref_grams"),
            r.getAs[Long]("overlap")))).toMap
      assert(got.keySet === exp.keySet)
      exp.foreach { case (id, (nc, nr, ov)) =>
        assert(got(id) === ((nc, nr, ov)), s"n=$n pid=$id")
      }
    }
  }
}
