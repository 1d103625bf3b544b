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
}
