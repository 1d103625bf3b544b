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
}
