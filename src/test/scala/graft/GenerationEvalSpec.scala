package graft

import graft.operators.GenerationEval
import org.apache.spark.sql.functions.{sort_array, transform, when}

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

  private def bleuRows(cands: Seq[(Long, String)],
                       refs: Seq[(Long, Long, String)]) =
    GenerationEval.bleu(
      cands.toDF("pid", "cand"), "pid", "cand",
      refs.toDF("pid", "rid", "ref"), "rid", "ref")
      .collect().map(r => r.getAs[Long]("pid") -> r).toMap

  test("bleu: perfect match scores gm 1.0; hand example clips across refs") {
    val got = bleuRows(
      Seq(1L -> "the cat is on the mat", 2L -> "the cat sat on the mat"),
      Seq((1L, 1L, "the cat is on the mat"), (1L, 2L, "there is a cat"),
        (2L, 1L, "the cat is on the mat"),
        (2L, 2L, "there is a cat on the mat")))
    val p = got(1L)
    assert(p.getAs[Long]("bleu_gm_q20") === 1048576L)
    assert(p.getAs[Long]("r_ref_len") === 6L) // closest of {6, 4}
    assert(p.getAs[Boolean]("bp_applies") === false)
    val h = got(2L)
    // unigram: the(min(2,2)) cat on the(counted) mat + sat(0) = 5/6
    assert((h.getAs[Long]("p1_num"), h.getAs[Long]("p1_den")) === ((5L, 6L)))
    // bigrams "the cat","on the","the mat" survive = 3/5
    assert((h.getAs[Long]("p2_num"), h.getAs[Long]("p2_den")) === ((3L, 5L)))
    assert((h.getAs[Long]("p3_num"), h.getAs[Long]("p3_den")) === ((1L, 4L)))
    assert((h.getAs[Long]("p4_num"), h.getAs[Long]("p4_den")) === ((0L, 3L)))
    // p4 = 0 -> unsmoothed sentence GM is exactly 0 (not NULL: den > 0)
    assert(h.getAs[Long]("bleu_gm_q20") === 0L)
    // closest ref by |len-6|: lengths {6, 7} -> 6
    assert(h.getAs[Long]("r_ref_len") === 6L)
  }

  test("bleu: short candidate NULL gm; no-ref candidate zero nums NULL r") {
    val got = bleuRows(
      Seq(3L -> "hi there", 4L -> "a b c d e"),
      Seq((3L, 1L, "hi there friend")))
    val s3 = got(3L)
    assert((s3.getAs[Long]("p3_den"), s3.getAs[Long]("p4_den")) === ((0L, 0L)))
    assert(s3.isNullAt(s3.fieldIndex("bleu_gm_q20")))
    assert(s3.getAs[Boolean]("bp_applies") === true) // c=2 < r=3
    val s4 = got(4L)
    assert((1 to 4).forall(k => s4.getAs[Long](s"p${k}_num") === 0L))
    assert((s4.getAs[Long]("p1_den"), s4.getAs[Long]("p4_den")) === ((5L, 2L)))
    assert(s4.getAs[Long]("bleu_gm_q20") === 0L)
    assert(s4.isNullAt(s4.fieldIndex("r_ref_len")))
    assert(s4.isNullAt(s4.fieldIndex("bp_applies")))
  }

  test("bleu: closest-ref ties break to the shorter reference") {
    val got = bleuRows(Seq(5L -> "a b c d"),
      Seq((5L, 1L, "x y z"), (5L, 2L, "p q r s t"))) // |3-4|=|5-4|=1
    assert(got(5L).getAs[Long]("r_ref_len") === 3L)
  }

  private def chainMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("bleu: duplicate reference ids within a candidate fail loudly") {
    // ADVICE r12: the collected-refs rewrite silently changed duplicate
    // (id, refId) rows from "one pooled reference" to "two independent
    // references" — neither reading is trustworthy, so it now errors.
    val ex = intercept[Exception] {
      bleuRows(Seq(6L -> "a b"), Seq((6L, 1L, "a b"), (6L, 1L, "a c")))
    }
    assert(chainMsg(ex).contains("duplicate or NULL"))
    val exNull = intercept[Exception] {
      GenerationEval.bleu(Seq(6L -> "a b").toDF("pid", "cand"),
        "pid", "cand",
        Seq((6L, Option.empty[Long], "a b")).toDF("pid", "rid", "ref"),
        "rid", "ref").collect()
    }
    assert(chainMsg(exNull).contains("duplicate or NULL"))
  }

  test("bleu: per-candidate reference fan-in past the cap fails loudly") {
    // ADVICE r12: one giant collected row (a skewed id violating the
    // <=4-refs eval protocol) must fail, not OOM an executor.
    val refs = (1 to 5).map(i => (7L, i.toLong, s"ref $i"))
    val ex = intercept[Exception] {
      GenerationEval.bleu(Seq(7L -> "a b").toDF("pid", "cand"),
        "pid", "cand", refs.toDF("pid", "rid", "ref"), "rid", "ref",
        maxRefsPerCandidate = 4).collect()
    }
    assert(chainMsg(ex).contains("reference rows"))
    // at the cap exactly: fine
    val ok = GenerationEval.bleu(Seq(7L -> "a b").toDF("pid", "cand"),
      "pid", "cand", refs.toDF("pid", "rid", "ref"), "rid", "ref",
      maxRefsPerCandidate = 5).collect()
    assert(ok.length === 1)
  }

  test("bleuCorpus: pooled sums and sqrt-only geometric mean") {
    val per = GenerationEval.bleu(
      Seq(1L -> "the cat is on the mat", 2L -> "the cat sat on the mat")
        .toDF("pid", "cand"), "pid", "cand",
      Seq((1L, 1L, "the cat is on the mat"),
        (2L, 1L, "the cat is on the mat"),
        (2L, 2L, "there is a cat on the mat")).toDF("pid", "rid", "ref"),
      "rid", "ref")
    val r = GenerationEval.bleuCorpus(per).collect()(0)
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert(r.getAs[Long]("c_total") === 12L)
    assert(r.getAs[Long]("r_total") === 12L)
    // pooled: p1 11/12, p2 8/10, p3 5/8, p4 3/6 (3 four-grams per cand)
    assert((r.getAs[Long]("p1_num"), r.getAs[Long]("p1_den")) === ((11L, 12L)))
    assert((r.getAs[Long]("p4_num"), r.getAs[Long]("p4_den")) === ((3L, 6L)))
    val q = Seq((11L, 12L), (8L, 10L), (5L, 8L), (3L, 6L))
      .map { case (n, d) => n * 1024L / d }.product
    val expGm = math.floor(math.sqrt(math.sqrt(q.toDouble)) * 1024.0).toLong
    assert(r.getAs[Long]("bleu_gm_q20") === expGm)
  }

  test("chrF: hand-computed components and quantize-then-average headline") {
    val pairs = Seq((1L, "the cat", "the bat")).toDF("pid", "cand", "ref")
    val comp = GenerationEval.chrFComponents(pairs, "pid", "cand", "ref")
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_cand_grams"), r.getAs[Long]("n_ref_grams"),
          r.getAs[Long]("overlap"), r.getAs[Long]("f2_q20"))).toMap
    // stripped: "thecat" vs "thebat" (6 chars each)
    assert(comp(1L) === ((6L, 6L, 5L, 25L * 1048576L / 30L)))
    assert(comp(2L) === ((5L, 5L, 3L, 15L * 1048576L / 25L)))
    assert(comp(3L) === ((4L, 4L, 1L, 5L * 1048576L / 20L)))
    assert(comp(4L) === ((3L, 3L, 0L, 0L)))
    assert(comp(6L) === ((1L, 1L, 0L, 0L)))
    val hl = GenerationEval.chrF(pairs, "pid", "cand", "ref").collect()(0)
    assert(hl.getAs[Long]("n_eff_orders") === 6L)
    val expected = (25L * 1048576L / 30L + 15L * 1048576L / 25L +
      5L * 1048576L / 20L) / 6L
    assert(hl.getAs[Long]("chrf2_q20") === expected)
  }

  test("chrF: effective orders skip both-empty; all-empty pair NULL score") {
    val pairs = Seq((1L, "ab", "a b c d"), (2L, " \t ", null))
      .toDF("pid", "cand", "ref")
    val comp = GenerationEval.chrFComponents(pairs, "pid", "cand", "ref")
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("k")) ->
        (r.getAs[Long]("n_cand_grams"), r.getAs[Long]("n_ref_grams"),
          r.getAs[Long]("overlap"))).toMap
    // cand "ab" (2 chars), ref "abcd" (4): orders 3-4 are ref-only,
    // orders 5-6 have no grams on either side and must be absent
    assert(comp((1L, 1L)) === ((2L, 4L, 2L)))
    assert(comp((1L, 2L)) === ((1L, 3L, 1L)))
    assert(comp((1L, 3L)) === ((0L, 2L, 0L)))
    assert(comp((1L, 4L)) === ((0L, 1L, 0L)))
    assert(!comp.contains((1L, 5L)) && !comp.contains((1L, 6L)))
    assert(!comp.keys.exists(_._1 == 2L)) // whitespace-only + NULL
    val hl = GenerationEval.chrF(pairs, "pid", "cand", "ref")
      .collect().map(r => r.getAs[Long]("pid") -> r).toMap
    assert(hl(1L).getAs[Long]("n_eff_orders") === 4L)
    assert(hl(2L).getAs[Long]("n_eff_orders") === 0L)
    assert(hl(2L).isNullAt(hl(2L).fieldIndex("chrf2_q20")))
  }

  test("mbrSelect: consensus winner, zero-overlap and singleton tasks") {
    val df = Seq(
      // task 1: s1/s2 agree exactly, s3 is the outlier -> s1 wins (tie
      // with s2 broken by smaller sid)
      (1L, 1L, "a b"), (1L, 2L, "a b"), (1L, 3L, "x y"),
      // task 2: singleton
      (2L, 9L, "hello"),
      // task 3: empty text + one-token text, no overlap -> both score
      // 0, smaller sid wins
      (3L, 10L, ""), (3L, 11L, "w"))
      .toDF("task", "sid", "text")
    val got = GenerationEval.mbrSelect(df, "task", "sid", "text")
      .collect().map(r => r.getAs[Long]("task") -> r).toMap
    val Q = 1048576L
    val t1 = got(1L)
    assert(t1.getAs[Long]("mbr_choice") === 1L)
    assert(t1.getAs[Long]("mbr_score_q20") === Q) // one perfect sibling
    assert(t1.getAs[Long]("mean_sim_q20") === Q / 2L)
    assert(t1.getAs[Long]("n_samples") === 3L)
    val t2 = got(2L)
    assert(t2.getAs[Long]("mbr_choice") === 9L)
    assert(t2.getAs[Long]("mbr_score_q20") === 0L)
    assert(t2.isNullAt(t2.fieldIndex("mean_sim_q20")))
    val t3 = got(3L)
    assert(t3.getAs[Long]("mbr_choice") === 10L)
    assert(t3.getAs[Long]("mbr_score_q20") === 0L)
  }

  test("mbrSelect: multiset clipping in the pairwise F1") {
    // cand "a a b" vs "a c": overlap min(2,1)=1 on 'a' -> f1 =
    // 2*1/(3+2) = 0.4; both directions symmetric
    val df = Seq((7L, 1L, "a a b"), (7L, 2L, "a c"))
      .toDF("task", "sid", "text")
    val got = GenerationEval.mbrSelect(df, "task", "sid", "text")
      .collect()(0)
    assert(got.getAs[Long]("mbr_score_q20") === 2L * 1048576L / 5L)
    assert(got.getAs[Long]("mbr_choice") === 1L)
  }

  test("multisetClipMaxRef kernel: max-over-refs clip, not max-of-intersects") {
    // cand [a a b]; ref1 [a b b]; ref2 [a a]. Per gram: a →
    // min(2, max(1, 2)) = 2, b → min(1, max(2, 0)) = 1 ⇒ 3. The naive
    // max of per-ref INTERSECTS is 2 (ref1: 1+1, ref2: 2) — the clip is
    // per-GRAM max, which no two-array intersect composition expresses.
    val one = Seq((Seq("a", "a", "b"), Seq(Seq("a", "b", "b"), Seq("a", "a"))))
      .toDF("c", "r")
      .select(graft.functions.multisetClipMaxRef(
        sort_array($"c"), transform($"r", x => sort_array(x))).as("o"))
      .head.getLong(0)
    assert(one === 3L)
    // edges: empty cand → 0; empty ref set → 0; NULL inner ref skipped
    val edges = Seq(
      (Seq.empty[String], Seq(Seq("a"))),
      (Seq("a"), Seq.empty[Seq[String]]),
      (Seq("a"), Seq(null, Seq("a")))).toDF("c", "r")
      .select(graft.functions.multisetClipMaxRef(
        sort_array($"c"),
        transform($"r", x => when(x.isNotNull, sort_array(x)))).as("o"))
      .collect().map(_.getLong(0)).toSeq
    assert(edges === Seq(0L, 0L, 1L))
    // randomized pin against the brute-force definition
    val rnd = new scala.util.Random(20260815L)
    val atoms = Seq("a", "b", "c", "d")
    val cases = (0 until 60).map { i =>
      val cand = Seq.fill(rnd.nextInt(12))(atoms(rnd.nextInt(atoms.size)))
      val refs = Seq.fill(rnd.nextInt(4))(
        Seq.fill(rnd.nextInt(12))(atoms(rnd.nextInt(atoms.size))))
      (i.toLong, cand, refs)
    }
    val got = cases.toDF("id", "c", "r")
      .select($"id", graft.functions.multisetClipMaxRef(
        sort_array($"c"), transform($"r", x => sort_array(x))).as("o"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (id, cand, refs) =>
      val exp = cand.distinct.map { g =>
        val cc = cand.count(_ == g)
        val mrc = if (refs.isEmpty) 0 else refs.map(_.count(_ == g)).max
        math.min(cc, mrc).toLong
      }.sum
      assert(got(id) === exp, s"case $id cand=$cand refs=$refs")
    }
  }

  test("chrF native kernel == HOF spec on multibyte / adversarial strings " +
    "(fingerprint fast path AND object fallback)") {
    // The 1-long fingerprint path covers grams ≤ 7 bytes; 8–23-byte
    // grams (CJK at k ≥ 3, emoji at k 2..5) take the round-13 WIDE
    // 2/3-long tier; emoji at k = 6 (24 bytes) takes the object
    // fallback — all three paths must equal the HOF executable spec
    // (sort_array(charShingles) → multisetIntersectSorted), including
    // NUL bytes, combining marks, and repeated grams.
    val rnd = new scala.util.Random(20260812L)
    val atoms = Seq("a", "b", "\u0000", "é", "漢", "字", "🎉", "é")
    def randText(): String =
      (0 until rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
    val cases = ((0 until 80).map(i => (i.toLong, randText(), randText())) ++
      Seq((900L, "漢字漢字漢字", "字漢字漢"), (901L, "", "abc"),
        (902L, "ab", "ab"), (903L, "🎉🎉🎉", "🎉🎉")))
      .toDF("pid", "cand", "ref")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))
    val native = GenerationEval.chrFComponents(cases, "pid", "cand", "ref")
      .select("pid", "k", "n_cand_grams", "n_ref_grams", "overlap")
      .collect().map(key).toMap
    // HOF executable spec, inline (the pre-kernel formulation)
    import org.apache.spark.sql.functions._
    def strip(c: org.apache.spark.sql.Column) =
      regexp_replace(coalesce(c, lit("")), "[ \\t\\n\\f\\r]+", "")
    val perOrder = (1 to 6).map { k =>
      val cg = sort_array(graft.functions.charShingles(strip($"cand"), k))
      val rg = sort_array(graft.functions.charShingles(strip($"ref"), k))
      struct(lit(k.toLong).as("k"),
        size(cg).cast("long").as("n_cand_grams"),
        size(rg).cast("long").as("n_ref_grams"),
        graft.functions.multisetIntersectSorted(cg, rg).as("overlap"))
    }
    val spec = cases.select($"pid",
        explode(filter(array(perOrder: _*),
          s => s("n_cand_grams") + s("n_ref_grams") > 0L)).as("o"))
      .select($"pid", $"o.k", $"o.n_cand_grams", $"o.n_ref_grams",
        $"o.overlap")
      .collect().map(key).toMap
    assert(native === spec)
    assert(native.nonEmpty)
  }

  test("chrF wide fingerprint tier == HOF spec on pure-CJK corpora " +
    "(every order k <= 6 stays off the object path)") {
    // 3-byte code points: k=1,2 ride the 1-long path (3, 6 bytes);
    // k=3..5 the W=2 tier (9–15 bytes); k=6 the W=3 tier (18 bytes).
    // Long strings with few distinct chars force heavy duplication —
    // the regime where a sort/merge bug (stability, padding collision,
    // record-swap off-by-one) would miscount the clipped overlap.
    val rnd = new scala.util.Random(20260815L)
    val cjk = "漢字文本語言模型訓練"
    def randCjk(n: Int): String =
      (0 until n).map(_ => cjk(rnd.nextInt(cjk.length))).mkString
    val cases = ((0 until 60).map(i =>
      (i.toLong, randCjk(5 + rnd.nextInt(120)), randCjk(5 + rnd.nextInt(120)))) ++
      Seq((900L, "漢" * 40, "漢" * 25 + "字" * 15), // max duplication
        (901L, randCjk(200), randCjk(200))))
      .toDF("pid", "cand", "ref")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))
    val native = GenerationEval.chrFComponents(cases, "pid", "cand", "ref")
      .select("pid", "k", "n_cand_grams", "n_ref_grams", "overlap")
      .collect().map(key).toMap
    import org.apache.spark.sql.functions._
    def strip(c: org.apache.spark.sql.Column) =
      regexp_replace(coalesce(c, lit("")), "[ \\t\\n\\f\\r]+", "")
    val perOrder = (1 to 6).map { k =>
      val cg = sort_array(graft.functions.charShingles(strip($"cand"), k))
      val rg = sort_array(graft.functions.charShingles(strip($"ref"), k))
      struct(lit(k.toLong).as("k"),
        size(cg).cast("long").as("n_cand_grams"),
        size(rg).cast("long").as("n_ref_grams"),
        graft.functions.multisetIntersectSorted(cg, rg).as("overlap"))
    }
    val spec = cases.select($"pid",
        explode(filter(array(perOrder: _*),
          s => s("n_cand_grams") + s("n_ref_grams") > 0L)).as("o"))
      .select($"pid", $"o.k", $"o.n_cand_grams", $"o.n_ref_grams",
        $"o.overlap")
      .collect().map(key).toMap
    assert(native === spec)
    // the identical-text control: every order's overlap == gram count
    val same = randCjk(80)
    val ctl = GenerationEval.chrFComponents(
      Seq((1L, same, same)).toDF("pid", "cand", "ref"), "pid", "cand", "ref")
      .collect()
    assert(ctl.length === 6)
    ctl.foreach(r => assert(
      r.getAs[Long]("overlap") === r.getAs[Long]("n_cand_grams")))
  }

  test("chrF: identical texts score exactly 1.0") {
    val hl = GenerationEval.chrF(
      Seq((9L, "same text here", "same text here")).toDF("pid", "c", "r"),
      "pid", "c", "r").collect()(0)
    assert(hl.getAs[Long]("chrf2_q20") === 1048576L)
    assert(hl.getAs[Double]("chrf2") === 1.0)
  }
}
