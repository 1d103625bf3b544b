package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges learns most-frequent pairs with deterministic tie-breaks") {
    // corpus: "abab" x2, "ab" x3, "cd" x1
    // chars: a,b pairs — (a,b): 2*2+3 = 7; (b,a): 2*1 = 2; (c,d): 1
    val docs = Seq((1L, "abab abab ab"), (2L, "ab ab cd")).toDF("id", "text")
    val out = Bpe.trainMerges(docs, "text", numMerges = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // step 1: (a,b) freq 7 → words become [ab,ab]x2, [ab]x3, [c,d]
    assert(out(0) === ((1, "a", "b", 7L)))
    // step 2: pairs now (ab,ab): 2, (c,d): 1 → (ab,ab)
    assert(out(1) === ((2, "ab", "ab", 2L)))
    // step 3: only (c,d) remains
    assert(out(2) === ((3, "c", "d", 1L)))
  }

  test("trainMerges greedy rewrite is non-overlapping left-to-right") {
    // "aaa": pairs (a,a) freq 2; after merging, word is [aa, a] — so the
    // next round sees (aa, a) once, not (a, aa)
    val docs = Seq((1L, "aaa")).toDF("id", "text")
    val out = Bpe.trainMerges(docs, "text", numMerges = 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) === ((1, "a", "a", 2L)))
    assert(out(1) === ((2, "aa", "a", 1L)))
  }

  test("subwordVocab counts final-segmentation symbols weighted by word freq") {
    // after merge (a,b): abab→[ab,ab], ab→[ab], cd→[c,d]
    val docs = Seq((1L, "abab abab ab"), (2L, "ab ab cd")).toDF("id", "text")
    val out = Bpe.subwordVocab(docs, "text", numMerges = 1)
      .orderBy(org.apache.spark.sql.functions.desc("freq"), $"subword")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("ab", 7L), ("c", 1L), ("d", 1L)))
  }

  test("bpeTokenCount: per-doc counts under the learned segmentation") {
    // after merge (a,b): abab→2 subwords, ab→1, cd stays [c,d]→2
    val docs = Seq((1L, "abab abab ab"), (2L, "ab ab cd"), (3L, "")).toDF("id", "text")
    val out = Bpe.bpeTokenCount(docs, "id", "text", numMerges = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out(0) === ((1L, 3L, 5L))) // abab(2) + abab(2) + ab(1)
    assert(out(1) === ((2L, 3L, 4L))) // ab(1) + ab(1) + cd(2)
    assert(out(2) === ((3L, 0L, 0L))) // empty doc survives with zeros
  }

  test("trainMerges stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("id", "text")
    val out = Bpe.trainMerges(docs, "text", numMerges = 10).collect()
    // step 1 fuses ab; single-symbol words have no pairs → 1 merge only
    assert(out.length === 1)
  }

  test("tie on frequency breaks by (lhs, rhs) binary order") {
    // (a,b) and (b,c) both appear once ("abc"): max freq ties at 1 —
    // chosen pair must be (a,b), the smaller (l, r)
    val docs = Seq((1L, "abc")).toDF("id", "text")
    val out = Bpe.trainMerges(docs, "text", numMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(out.head === (("a", "b")))
  }

  test("maxMatchTokenCount: longest unit wins, UNK consumes one char, empty docs keep zeros") {
    val vocab = Seq("a", "b", "ab", "abc")
    val docs = Seq(
      (1L, "abcab"),  // "abc"+"ab" = 2 tokens (longest-first, NOT a+b+c...)
      (2L, "abz"),    // "ab" + UNK(z) = 2 tokens, 1 unk
      (3L, "zz"),     // UNK+UNK = 2 tokens, 2 unk
      (4L, "")        // no words
    ).toDF("id", "text")
    val out = Bpe.maxMatchTokenCount(docs, "id", "text", vocab)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === ((1L, 1L, 2L, 0L)))
    assert(out(1) === ((2L, 1L, 2L, 1L)))
    assert(out(2) === ((3L, 1L, 2L, 2L)))
    assert(out(3) === ((4L, 0L, 0L, 0L)))
  }

  test("maxMatchTokenCount: a failed long candidate falls back, not skips — 'aab' with vocab {ab,a}") {
    // at pos 1 the longest match is "a" (not "aa"); then "ab" — 2 tokens
    val docs = Seq((1L, "aab")).toDF("id", "text")
    val out = Bpe.maxMatchTokenCount(docs, "id", "text", Seq("ab", "a"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head === ((1L, 2L, 0L)))
  }

  test("maxMatchTokenCountJoined == literal path on the hand-built cases") {
    val vocab = Seq("a", "b", "ab", "abc")
    val docs = Seq(
      (1L, "abcab"), (2L, "abz"), (3L, "zz"), (4L, ""),
      (5L, "aab xyababc")).toDF("id", "text")
    val lit = Bpe.maxMatchTokenCount(docs, "id", "text", vocab)
      .orderBy("id").collect().toSeq
    val joined = Bpe.maxMatchTokenCountJoined(docs, "id", "text",
      vocab.toDF("unit"), "unit").orderBy("id").collect().toSeq
    assert(joined === lit)
  }

  test("maxMatchTokenCountJoined: fuzz equality vs the literal path on a " +
    "thousands-unit overlapping vocab (the >=5k production size is gated" +
    " end-to-end by q298)") {
    // seeded fuzz: 200 words over a 4-char alphabet (heavy unit overlap,
    // so longest-wins decisions fire constantly) against ~1800 distinct
    // units of length 1..6 that deliberately OMIT the single char 'd' so
    // UNK paths are exercised too. The literal path is the q292-gated
    // semantics; the joined path must match row-for-row.
    val rng = new scala.util.Random(20260814L)
    val alpha = "abcd"
    def randStr(len: Int): String =
      (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    val vocab = ((1 to 6000).map(_ => randStr(1 + rng.nextInt(6)))
      .filterNot(_ == "d") ++ Seq("a", "b", "c")).distinct
    assert(vocab.size > 1500)
    val docs = (1 to 200).map(i =>
      (i.toLong, (1 to 8).map(_ => randStr(1 + rng.nextInt(12)))
        .mkString(" "))).toDF("id", "text")
    val lit = Bpe.maxMatchTokenCount(docs, "id", "text", vocab)
      .orderBy("id").collect().toSeq
    val joined = Bpe.maxMatchTokenCountJoined(docs, "id", "text",
      vocab.toDF("unit"), "unit").orderBy("id").collect().toSeq
    assert(joined === lit)
    assert(lit.map(_.getLong(3)).sum > 0L) // UNKs actually exercised
  }

  test("maxMatchTokenCountJoined: all-UNK words and bad vocabs") {
    val docs = Seq((1L, "zzz qq")).toDF("id", "text")
    val out = Bpe.maxMatchTokenCountJoined(docs, "id", "text",
      Seq("ab", "ba").toDF("unit"), "unit").collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ===
      ((2L, 5L, 5L)))
    intercept[IllegalArgumentException] {
      Bpe.maxMatchTokenCountJoined(docs, "id", "text",
        Seq.empty[String].toDF("unit"), "unit")
    }
    intercept[IllegalArgumentException] {
      Bpe.maxMatchTokenCountJoined(docs, "id", "text",
        Seq("ab", "").toDF("unit"), "unit")
    }
  }

  private def vit1(word: String, vocab: Seq[(String, Long)], unkQ: Long) = {
    val r = Bpe.viterbiTokenCount(
      Seq((1L, word)).toDF("id", "text"), "id", "text",
      vocab.toDF("unit", "score_q"), "unit", "score_q", unkQ).collect()(0)
    (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unk_chars"),
      r.getAs[Long]("viterbi_score_q"))
  }

  test("viterbiTokenCount: global optimum beats the greedy MaxMatch path") {
    // greedy takes 'abc' then UNKs 'd' (score 10-100); Viterbi defers
    // to 'ab'+'cd' (score 2, 2 tokens, 0 unks)
    val vocab = Seq(("ab", 1L), ("cd", 1L), ("abc", 10L))
    assert(vit1("abcd", vocab, unkQ = -100L) === ((2L, 0L, 2L)))
    // raising the unit score past the split flips the optimum back
    val vocab2 = Seq(("ab", 1L), ("cd", 1L), ("abc", 200L))
    assert(vit1("abcd", vocab2, unkQ = -100L) === ((2L, 1L, 100L)))
  }

  test("viterbiTokenCount: score ties prefer fewer tokens") {
    // 'aa'(2) vs 'a'+'a'(1+1): equal score, the 1-token path wins
    val r = vit1("aa", Seq(("aa", 2L), ("a", 1L)), unkQ = -100L)
    assert(r === ((1L, 0L, 2L)))
  }

  test("viterbiTokenCount: all-UNK words and doc-spine zeros") {
    val docs = Seq((1L, "zz xyx"), (2L, "")).toDF("id", "text")
    val got = Bpe.viterbiTokenCount(docs, "id", "text",
      Seq(("q", 5L)).toDF("unit", "score_q"), "unit", "score_q", -7L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_unk_chars"),
          r.getAs[Long]("viterbi_score_q")))).toMap
    assert(got(1L) === ((2L, 5L, 5L, -35L))) // every char UNKs at -7
    assert(got(2L) === ((0L, 0L, 0L, 0L)))
  }

  test("bpeRankSegment: merge-rank apply disagrees with longest-match " +
    "on the same units") {
    // merges rank 1 (b,c), rank 2 (a,b); unit set {a,b,c,bc,ab}. On
    // "abc" the rank loop fuses (b,c) FIRST → [a, bc]; greedy
    // longest-match takes "ab" at position 1 → [ab, c]. Token counts
    // tie at 2 — the TOKEN IDENTITIES differ, which is what breaks a
    // model fed the wrong apply semantics.
    val docs = Seq((1L, "abc abc"), (2L, "bca")).toDF("id", "text")
    val merges = Seq((1, "b", "c"), (2, "a", "b")).toDF("step", "lhs", "rhs")
    val seg = Bpe.bpeRankSegment(docs, "text", merges, "step", "lhs", "rhs")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(seg("abc") === ((2L, "a bc")))
    assert(seg("bca") === ((2L, "bc a")))
    // reference longest-match walk over the same unit set
    val vocab = Set("a", "b", "c", "bc", "ab")
    def maxMatch(w: String): Seq[String] = {
      var i = 0
      val out = Seq.newBuilder[String]
      while (i < w.length) {
        val k = (math.min(2, w.length - i) to 1 by -1)
          .find(k => vocab(w.substring(i, i + k))).get
        out += w.substring(i, i + k); i += k
      }
      out.result()
    }
    assert(maxMatch("abc") === Seq("ab", "c"))
    assert(seg("abc")._2 !== maxMatch("abc").mkString(" "))
  }

  test("bpeRankSegment: kernel min-rank loop == rank-sequential spec on " +
    "trained merges over a fuzz corpus; count twin == bpeTokenCount") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(329L)
    val alpha = "abcd"
    val docs = (1 to 150).map { i =>
      val words = (1 to 8).map(_ => (0 until (1 + rng.nextInt(10)))
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString)
      (i.toLong, words.mkString(" "))
    }.toDF("id", "text")
    val train = docs.filter($"id" % 3 === 0)
    val merges = Bpe.trainMerges(train, "text", numMerges = 12)
    val ms = merges.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(ms.size === 12)
    val got = Bpe.bpeRankSegment(docs, "text", merges, "step", "lhs", "rhs")
      .orderBy("w").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // executable spec: the merges applied ONCE EACH in rank order with
    // the training rewrite's greedy left-to-right fold
    val exp = docs
      .select(explode(graft.operators.TextAnalysis.tokens($"text")).as("w"))
      .distinct()
      .withColumn("__syms", Bpe.bpeEncodeSeqSpec(split($"w", ""), ms))
      .select($"w", size($"__syms").cast("long").as("n"),
        array_join($"__syms", " ").as("seg"))
      .orderBy("w").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === exp)
    assert(got.exists(_._2 > 1L)) // merges actually fired somewhere
    // conservation: BPE only fuses, never drops — concatenating the
    // segmentation reproduces the word exactly (words are whitespace
    // tokens, so the space join is losslessly invertible)
    got.foreach { case (w, n, seg) =>
      assert(seg.replace(" ", "") === w)
      assert(n === seg.split(' ').length.toLong)
    }
    // train-on-self crosscheck: frozen-apply counts == bpeTokenCount's
    // same-corpus counts (trainState's final table IS the rank apply)
    val frozen = Bpe.bpeRankTokenCount(train, "id", "text", merges,
      "step", "lhs", "rhs").orderBy("id").collect().toSeq
    val same = Bpe.bpeTokenCount(train, "id", "text", numMerges = 12)
      .orderBy("id").collect().toSeq
    assert(frozen === same)
  }

  test("bpeRankSegment/bpeRankTokenCount: bad merge lists rejected") {
    val docs = Seq((1L, "ab")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Bpe.bpeRankSegment(docs, "text",
        Seq.empty[(Int, String, String)].toDF("step", "lhs", "rhs"),
        "step", "lhs", "rhs")
    }
    intercept[IllegalArgumentException] {
      Bpe.bpeRankSegment(docs, "text",
        Seq((1, "a", "")).toDF("step", "lhs", "rhs"), "step", "lhs", "rhs")
    }
  }

  test("bpeRankSegment: ill-formed merge lists fail loudly (ADVICE r12)") {
    val docs = Seq((1L, "abc xyz")).toDF("id", "text")
    // underivable unit: 'xy' is multi-char but no earlier merge made it
    val e1 = intercept[IllegalArgumentException] {
      Bpe.bpeRankSegment(docs, "text",
        Seq((1, "xy", "z")).toDF("step", "lhs", "rhs"),
        "step", "lhs", "rhs")
    }
    assert(e1.getMessage.contains("neither a single code point"))
    // duplicate output: 'ab'+'c' and 'a'+'bc' both produce 'abc' — the
    // min-rank kernel and the rank-sequential spec can disagree there
    val e2 = intercept[IllegalArgumentException] {
      Bpe.bpeRankSegment(docs, "text",
        Seq((1, "a", "b"), (2, "b", "c"), (3, "ab", "c"), (4, "a", "bc"))
          .toDF("step", "lhs", "rhs"),
        "step", "lhs", "rhs")
    }
    assert(e2.getMessage.contains("duplicate merge output"))
    // well-formed chains (derived units on both sides) still pass
    val ok = Bpe.bpeRankSegment(docs, "text",
      Seq((1, "a", "b"), (2, "b", "c"), (3, "ab", "bc"))
        .toDF("step", "lhs", "rhs"),
      "step", "lhs", "rhs")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // on "abc": rank-1 (a,b) fuses first -> [ab, c]; (b,c) can no
    // longer fire; (ab,bc) needs a bc that never formed
    assert(ok("abc") === "ab c")
  }

  test("viterbi byte fallback: OOV code points become UTF-8 byte pieces, never UNK") {
    val docs = Seq((1L, "ab aü"), (2L, "")).toDF("id", "text")
    val vocab = Seq(("a", 10L), ("b", 8L), ("ab", 25L)).toDF("u", "sc")
    val got = Bpe.viterbiTokenCountByteFallback(docs, "id", "text",
        vocab, "u", "sc", byteScoreQ = -100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // "ab": unit ab (25) beats a+b (18) → 1 token, 0 byte tokens.
    // "aü": a (10) then ü = TWO byte pieces (2·−100) → 3 tokens, 2 byte
    // tokens, word score −190. Doc total: 4 tokens, score −165.
    assert(got(1L) === ((2L, 4L, 2L, -165L)))
    assert(got(2L) === ((0L, 0L, 0L, 0L)))
    // a word NO unit touches takes the all-bytes path: "çç" = 4 bytes
    val g2 = Bpe.viterbiTokenCountByteFallback(
        Seq((1L, "çç")).toDF("id", "text"), "id", "text",
        vocab, "u", "sc", byteScoreQ = -7L)
      .collect()(0)
    assert((g2.getLong(2), g2.getLong(3), g2.getLong(4)) ===
      ((4L, 4L, -28L)))
    // with a mild byte penalty the DP may PREFER bytes over a bad unit:
    // unit 'a' scored -1000 loses to one byte at -3
    val cheapBytes = Bpe.viterbiTokenCountByteFallback(
        Seq((1L, "a")).toDF("id", "text"), "id", "text",
        Seq(("a", -1000L)).toDF("u", "sc"), "u", "sc", byteScoreQ = -3L)
      .collect()(0)
    assert((cheapBytes.getLong(2), cheapBytes.getLong(3),
      cheapBytes.getLong(4)) === ((1L, 1L, -3L)))
  }

  test("byteLevelPretokens: GPT-2-style split, RE2-safe divergence pinned") {
    import org.apache.spark.sql.functions._
    def pre(s: String): Seq[String] =
      Seq(s).toDF("t").select(Bpe.byteLevelPretokens($"t").as("p"))
        .collect()(0).getSeq[String](0)
    assert(pre("hello world") === Seq("hello", " world"))
    assert(pre("it's fine") === Seq("it", "'s", " fine"))
    assert(pre("x=42, ok") === Seq("x", "=", "42", ",", " ok"))
    assert(pre("café déjà") === Seq("café", " déjà")) // \p{L} is Unicode
    // RE2-safe divergence (documented): interior multi-space runs stay
    // one whitespace token — GPT-2's \s+(?!\S) would emit [" ", " b"]
    assert(pre("a  b") === Seq("a", "  ", "b"))
    assert(pre("") === Seq.empty)
    // lossless: pretokens concatenate back to the text
    Seq("the quick  brown fox", "it's x=1,  y=2", "café!").foreach { s =>
      assert(pre(s).mkString === s)
    }
  }

  test("byteLevelSyms: GPT-2 byte->unicode table, multibyte + space bytes") {
    import org.apache.spark.sql.functions._
    def syms(s: String): Seq[String] =
      Seq(s).toDF("w").select(Bpe.byteLevelSyms($"w").as("s"))
        .collect()(0).getSeq[String](0)
    // printable ASCII maps to itself
    assert(syms("abc") === Seq("a", "b", "c"))
    // leading space -> U+0120 (Ġ): byte 0x20 is the 33rd remapped byte
    assert(syms(" the") === Seq("Ġ", "t", "h", "e"))
    // é = UTF-8 C3 A9: both bytes are in the keep ranges -> Ã, ©
    assert(syms("café") === Seq("c", "a", "f", "Ã", "©"))
    // newline (0x0A) -> 256 + 10 = U+010A
    assert(syms("\n") === Seq("Ċ"))
    // every symbol is ONE code point and never an ASCII space
    val all = syms(" a\tbé漢") // space, tab, é, 漢 (E6 BC A2)
    assert(all.forall(u => u.codePointCount(0, u.length) == 1 && u != " "))
    assert(all.size === 9) // 1+1+1+1+2+3 bytes of " a\tbé漢"
    // the table is a bijection: inverse-map recovers the exact bytes
    val inv = Bpe.byteLevelTable.zipWithIndex.toMap
    val back = all.map(u => inv(u).toByte).toArray
    assert(back === " a\tbé漢".getBytes("UTF-8"))
  }

  test("byte-level BPE: train/apply lifecycle; segments differ from " +
    "char-level on multibyte words") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "low low lower"), (2L, "low lowest"))
      .toDF("id", "text")
    val merges = Bpe.trainMergesByteLevel(docs, "text", numMerges = 3)
    val ms = merges.orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    // " low" appears 3x as a space-prefixed pretoken (the byte-level
    // signature): (Ġ, l) leads with freq 3 tied with (l,o)/(o,w) at 4?
    // counts: words: "low"(1), " low"(3? "low low lower" -> ["low",
    // " low", " lower"], "low lowest" -> ["low", " lowest"]) so
    // (l,o) freq 5, (o,w) 5, (Ġ,l) 3 — tie (l,o) vs (o,w): lex 'l'<'o'
    assert(ms.head === ((1, "l", "o")))
    val seg = Bpe.bpeRankSegmentByteLevel(docs, "text", merges,
      "step", "lhs", "rhs")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // pretokens carry their leading space as Ġ inside the symbols
    assert(seg.keySet.contains(" low"))
    assert(seg(" low").startsWith("Ġ"))
    // char-level and byte-level DIVERGE on a multibyte word: "éé" is
    // [é,é] at char level (one pair) but [Ã,©,Ã,©] at byte level
    val mdocs = Seq((1L, "éé éé")).toDF("id", "text")
    val charMerges = Bpe.trainMerges(mdocs, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val byteMerges = Bpe.trainMergesByteLevel(mdocs, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(charMerges.head === (("é", "é")))
    assert(byteMerges.head === (("Ã", "©")))
    // lossless round-trip: inverse-mapping the seg symbols reproduces
    // every pretoken's exact UTF-8 bytes
    val inv = Bpe.byteLevelTable.zipWithIndex.toMap
    seg.foreach { case (w, sg) =>
      val bytes = sg.split(' ').flatMap(_.map(c => inv(c.toString).toByte))
      assert(bytes.toSeq === w.getBytes("UTF-8").toSeq, s"pretoken '$w'")
    }
  }

  test("byte-level budget: operator == per-pretoken segment sums; " +
    "row-local twin == operator") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "low low lower"), (2L, "low lowest café"),
      (3L, "")).toDF("id", "text")
    val merges = Bpe.trainMergesByteLevel(docs, "text", numMerges = 3)
    val counts = Bpe.bpeRankTokenCountByteLevel(docs, "id", "text",
        merges, "step", "lhs", "rhs")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // reference: sum the q334-style segmentation's n_tokens per doc
    val seg = Bpe.bpeRankSegmentByteLevel(docs, "text", merges,
        "step", "lhs", "rhs")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def pre(s: String): Seq[String] =
      Seq(s).toDF("t").select(Bpe.byteLevelPretokens($"t").as("p"))
        .collect()(0).getSeq[String](0)
    Seq(1L -> "low low lower", 2L -> "low lowest café").foreach {
      case (id, text) =>
        val ws = pre(text)
        assert(counts(id) === ((ws.size.toLong, ws.map(seg).sum)))
    }
    assert(counts(3L) === ((0L, 0L)))
    // row-local twin
    val ms = Bpe.collectMergeList(merges, "step", "lhs", "rhs")
    val twin = docs.select($"id",
        Bpe.byteLevelCounts($"text", ms).as("c"))
      .select($"id", $"c.n_pretokens", $"c.n_bpe_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(twin === counts)
  }

  test("viterbiTokenCount: matches a scala-side DP on fuzz words") {
    val rng = new scala.util.Random(307L)
    val multi = Seq.fill(40) {
      val len = 2 + rng.nextInt(3)
      (0 until len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString ->
        (3L + rng.nextInt(50))
    }
    val units = (Seq("a", "b", "c").map(u => u -> (1L + rng.nextInt(8))) ++
      multi).groupBy(_._1).map { case (u, vs) => (u, vs.head._2) }.toSeq
    val unkQ = -20L
    val words = (0 until 30).map(i =>
      (0 until (1 + i % 7)).map(j =>
        ('a' + ((i * 13 + j * 7) % 4)).toChar).mkString) // includes 'd'
    def dp(w: String): (Long, Long, Long) = {
      val vm = units.toMap
      // best[i]: (score, -ntok, -nunk) maximized lexicographically
      val best = Array.fill(w.length + 1)((Long.MinValue, 0L, 0L))
      best(0) = (0L, 0L, 0L)
      for (e <- 1 to w.length) {
        var b = (best(e - 1)._1 + unkQ, best(e - 1)._2 - 1,
          best(e - 1)._3 - 1)
        for (k <- 1 to e; u = w.substring(e - k, e) if vm.contains(u)) {
          val c = (best(e - k)._1 + vm(u), best(e - k)._2 - 1,
            best(e - k)._3)
          if (Ordering[(Long, Long, Long)].gt(c, b)) b = c
        }
        best(e) = b
      }
      (-best(w.length)._2, -best(w.length)._3, best(w.length)._1)
    }
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")
    val got = Bpe.viterbiTokenCount(docs, "id", "text",
      units.toDF("unit", "score_q"), "unit", "score_q", unkQ)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unk_chars"),
          r.getAs[Long]("viterbi_score_q")))).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) === dp(w), s"word '$w'")
    }
  }
}
