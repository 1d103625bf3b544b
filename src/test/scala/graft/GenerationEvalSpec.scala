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
