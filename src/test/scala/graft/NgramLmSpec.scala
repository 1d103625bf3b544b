package graft

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("familiarity: integer stats from corpus bigram frequencies") {
    // corpus bigrams: "a b" appears in docs 1 and 2 (cnt 2); "b a" only
    // in doc 1 (cnt 1); "c c" twice within doc 3 (cnt 2)
    val docs = Seq(
      (1L, "a b a"), // bigrams: "a b", "b a"
      (2L, "a b"),   // bigrams: "a b"
      (3L, "c c c"), // bigrams: "c c", "c c"
      (4L, "x")      // no bigrams
    ).toDF("doc_id", "text")
    val out = NgramLm.familiarity(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
    assert(out(0) === ((1L, 2L, 3L, 1L, Some(1.5), Some(0.5)))) // (2+1)/2; "a b" known
    assert(out(1) === ((2L, 1L, 2L, 1L, Some(2.0), Some(1.0))))
    assert(out(2) === ((3L, 2L, 4L, 2L, Some(2.0), Some(1.0)))) // "c c" cnt 2 (within one doc)
    assert(out(3) === ((4L, 0L, 0L, 0L, None, None)))
  }

  test("familiarity counts occurrences with multiplicity, not distinct grams") {
    val docs = Seq((1L, "t t t t")).toDF("doc_id", "text") // "t t" ×3
    val r = NgramLm.familiarity(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(1) === 3L) // n_grams: three occurrences
    assert(r.getLong(2) === 9L) // each occurrence sees corpus cnt 3
    assert(r.getLong(3) === 3L)
    assert(r.getDouble(4) === 3.0)
  }

  test("draftTable: mode next token per context, ties to min lex") {
    val docs = Seq((1L, "a b a b a c"), (2L, "x p x q")).toDF("id", "t")
    val tab = NgramLm.draftTable(docs, "t").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(tab("a") === (("b", 2L))) // (a,b)x2 beats (a,c)x1
    assert(tab("b") === (("a", 2L)))
    assert(tab("x") === (("p", 1L))) // p/q tie at 1 -> lexicographic min
    assert(!tab.contains("c")) // final token: no outgoing bigram
  }

  test("draftAcceptance: in-sample per-doc accept counts and q20 rate") {
    val docs = Seq((1L, "a b a b a c")).toDF("id", "t")
    val r = NgramLm.draftAcceptance(docs, "id", "t").collect()(0)
    assert(r.getAs[Long]("n_positions") === 5L)
    assert(r.getAs[Long]("n_accepted") === 4L) // all but the final (a,c)
    assert(r.getAs[Long]("acceptance_q20") === 4L * 1048576L / 5L)
  }

  test("draftAcceptanceWith: unseen contexts draft nothing; short docs " +
    "surface with zero positions and NULL rate") {
    val table = Seq(("a", "b", 2L)).toDF("prev", "pred_next", "n_obs")
    val docs = Seq((1L, "z z z"), (2L, "a b"), (3L, "solo"), (4L, ""))
      .toDF("id", "t")
    val got = NgramLm.draftAcceptanceWith(docs, "id", "t", table)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_positions"), r.getAs[Long]("n_accepted"),
          r.isNullAt(r.fieldIndex("acceptance_q20"))))).toMap
    assert(got(1L) === ((2L, 0L, false))) // z absent from table: misses
    assert(got(2L) === ((1L, 1L, false)))
    assert(got(3L) === ((0L, 0L, true))) // 1 token: no phantom pair
    assert(got(4L) === ((0L, 0L, true)))
  }

  test("familiarityWith: frozen reference model, OOV grams score zero") {
    val ref = Seq((10L, "a b c"), (11L, "a b")).toDF("id", "text")
    // reference bigram model: "a b" -> 2, "b c" -> 1
    val batch = Seq((1L, "a b c d"), (2L, "x"), (3L, "q r s"))
      .toDF("id", "text")
    val got = NgramLm.familiarityWith(batch, "id", "text", ref, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    // doc1: grams "a b"(2), "b c"(1), "c d"(OOV, 0): sum 3, known 2
    assert(got(1L) === ((3L, 3L, 2L, Some(1.0), Some(2.0 / 3.0))))
    // doc2: under n tokens -> zeros, NULL ratios
    assert(got(2L) === ((0L, 0L, 0L, None, None)))
    // doc3: all grams OOV -> the filter signal (familiarity exactly 0)
    assert(got(3L) === ((2L, 0L, 0L, Some(0.0), Some(0.0))))
  }
}
