package graft

import org.apache.spark.sql.functions._

/** Property-style parity tests for the compiled string kernels: on a
  * seeded stream of adversarial random strings (mixed ASCII / CJK /
  * astral code points / every whitespace kind / degenerate repeats),
  * each kernel must agree bit-for-bit with the interpreted HOF
  * formulation it replaced. The HOFs ARE the executable spec — they are
  * what the DuckDB oracles mirror — so kernel↔HOF equality on arbitrary
  * input is what licenses swapping kernels into oracle-gated paths.
  * (Seeded hand-rolled generation, same rationale as BronzePropertySpec:
  * the scalatest↔scalacheck bridge is not in the offline cache.)
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Random string from an alphabet that stresses every edge the kernels
    * care about: the explicit whitespace class, multi-space runs, astral
    * pairs (😀 💯), combining ZWJ sequences, CJK, and single-letter
    * tokens that collide into repeated grams.
    */
  private def genTexts(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val atoms = Seq(
      "a", "b", "ab", "the", "42", "x!", "é", "ß", "中", "文", "λ",
      "😀", "💯", "🚀", "👩‍🚀", "𝔘", "𝓍",
      " ", "  ", "\t", "\n", "\f", "\r", " \t ", "")
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }
  }

  test("kernels equal their HOF specs on seeded adversarial strings") {
    val texts = genTexts(300, seed = 20260812L)
    val n = 3
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id",
        graft.functions.tokenCountNative($"t").as("tc_k"),
        size(graft.functions.tokens($"t")).cast("long").as("tc_h"),
        graft.functions.ngramHashSeq($"t", n).as("seq"),
        toColumn(graft.expressions.NgramHashSet(toExpression($"t"), n)).as("set"),
        graft.operators.TextAnalysis.polyHash($"t").as("ph_k"),
        graft.operators.TextAnalysis.polyHashHof($"t").as("ph_h"),
        graft.operators.TextAnalysis.simHash($"t").as("sh_k"),
        graft.operators.TextAnalysis.simHashHof($"t").as("sh_h"),
        graft.operators.TextAnalysis.simHashWith($"t", 37L,
          graft.operators.TextAnalysis.WideSeed).as("sh37_k"),
        graft.operators.TextAnalysis.simHashHofWith($"t", 37L,
          graft.operators.TextAnalysis.WideSeed).as("sh37_h"),
        graft.operators.TextAnalysis.simHashWide($"t").as("wide_fused"),
        (graft.operators.TextAnalysis.simHashWith($"t", 31L) +
          graft.operators.TextAnalysis.simHashWith($"t", 37L,
            graft.operators.TextAnalysis.WideSeed) *
            lit(1L << graft.operators.TextAnalysis.SimHashBits)).as("wide_composed"),
        graft.operators.TextAnalysis.maxNgramRepeat($"t", 2).as("rep_k"),
        graft.operators.TextAnalysis.maxNgramRepeatSpec($"t", 2).as("rep_h"))
      .collect()
    assert(rows.length === texts.length)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === r.getLong(2), s"tokenCount mismatch id=$id")
      val seq = r.getSeq[Long](3)
      assert(seq.distinct.sorted === r.getSeq[Long](4), s"ngram seq/set id=$id")
      assert(seq.length === math.max(0L, r.getLong(1) - n + 1), s"ngram count id=$id")
      assert(r.getLong(5) === r.getLong(6), s"polyHash mismatch id=$id")
      assert(r.getLong(7) === r.getLong(8), s"simHash mismatch id=$id")
      assert(r.getLong(9) === r.getLong(10), s"simHash mult=37 mismatch id=$id")
      assert(r.getLong(11) === r.getLong(12),
        s"fused wide simhash != composed halves id=$id")
      assert(r.getLong(13) === r.getLong(14), s"maxNgramRepeat mismatch id=$id")
    }
  }

  test("wide simhash halves decorrelate on single-character tokens") {
    // With both families seeded 0, a 1-char token hashes identically
    // under any multiplier ((0*31+cp)%p == (0*37+cp)%p), so 1-char-token
    // text produced IDENTICAL halves — band buckets stopped spreading on
    // CJK-split/code-heavy corpora. WideSeed breaks the tie; lock it.
    val oneCharTokens = "a b c 中 文 x 1 2 ."
    val bits = graft.operators.TextAnalysis.SimHashBits
    val r = Seq(oneCharTokens).toDF("t")
      .select(graft.operators.TextAnalysis.simHashWide($"t").as("wide"),
        graft.operators.TextAnalysis.simHashWith($"t", 37L).as("unseeded37"),
        graft.operators.TextAnalysis.simHash($"t").as("sh31"))
      .head()
    val lower = r.getLong(0) & ((1L << bits) - 1)
    val upper = r.getLong(0) >>> bits
    assert(lower === r.getLong(2)) // family A is the standard simhash
    // the OLD behavior (seed 0): family B collapses onto family A here
    assert(r.getLong(1) === r.getLong(2),
      "precondition lost: 1-char tokens no longer collide at seed 0 — " +
        "the WideSeed rationale (and this test) needs revisiting")
    // the fix: the seeded family must not mirror family A on this text
    assert(upper !== lower,
      "wide halves identical on 1-char tokens: WideSeed regressed to 0?")
  }
}
