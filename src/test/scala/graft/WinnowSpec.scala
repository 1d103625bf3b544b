package graft

import graft.operators.Winnow
import org.apache.spark.sql.functions._

/** Winnowing fingerprints vs a direct Scala reference implementation,
  * plus the paper's coverage guarantee.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val Mod = graft.operators.TextAnalysis.HashMod

  private def refHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Mod)

  /** Reference winnowing: per window of w gram hashes select (min hash,
    * rightmost tie), distinct (pos, hash).
    */
  private def refWinnow(text: String, n: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val hs = toks.sliding(n).filter(_.length == n)
      .map(g => refHash(g.mkString(" "))).toArray
    (if (hs.length < w) Iterator.empty
     else (w - 1 until hs.length).iterator.map { e =>
       val frame = (e - w + 1) to e
       val m = frame.map(hs).min
       val pos = frame.filter(i => hs(i) == m).max
       (pos.toLong, m)
     }).toSet
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (2L, "a b c d e f g h i j k l m n o p q r s t"),
    (3L, "dup dup dup dup dup dup dup dup dup dup dup dup"),
    (4L, "too short"),
    (5L, "the quick brown fox jumps over the lazy dog then the quick brown fox jumps over the lazy dog again")
  ).toDF("doc_id", "text")

  test("fingerprints agree with the reference implementation per document") {
    val n = 3; val w = 4
    val got = Winnow.fingerprints(docs, "doc_id", "text", n, w)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    val want = docs.collect().map { r =>
      r.getLong(0) -> refWinnow(r.getString(1), n, w)
    }.filter(_._2.nonEmpty).toMap
    assert(got === want)
  }

  test("coverage: every full window of w grams contains a selected position") {
    val n = 3; val w = 5
    val sel = Winnow.fingerprints(docs, "doc_id", "text", n, w)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    docs.collect().foreach { r =>
      val toks = r.getString(1).split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val nGrams = math.max(toks.length - n + 1, 0)
      if (nGrams >= w) {
        val s = sel(r.getLong(0))
        ((w - 1) until nGrams).foreach { e =>
          assert(((e - w + 1) to e).exists(i => s.contains(i.toLong)),
            s"doc ${r.getLong(0)}: window ending at $e uncovered")
        }
      } else assert(!sel.contains(r.getLong(0)))
    }
  }

  test("repeated content shares fingerprints (the detection guarantee)") {
    // doc 5 repeats doc 1's 9-token opening: with w+n-1 = 8 < 9 the
    // shared run must produce at least one common fingerprint VALUE.
    val n = 3; val w = 6
    val fps = Winnow.fingerprints(docs, "doc_id", "text", n, w)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert((fps(1L) & fps(5L)).nonEmpty)
  }

  test("PolyGramHashSeq kernel equals the shingle-join HOF spec (incl. astral)") {
    import org.apache.spark.sql.functions._
    val texts = docs.select($"text")
      .union(Seq("hello 😀 world again 𤭢𤭢 end", "  padded   runs\tand\nlines  ",
        "one", "").toDF("text"))
    for (n <- Seq(1, 2, 3)) {
      val rows = texts.select(
        graft.functions.polyGramHashSeq($"text", n).as("k"),
        transform(
          graft.functions.shingles(graft.functions.tokens($"text"), n),
          g => graft.operators.TextAnalysis.polyHash(g)).as("h"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("fingerprintArray (row-local) equals the window-plan fingerprints") {
    import org.apache.spark.sql.functions._
    for ((n, w) <- Seq((3, 4), (2, 7), (3, 8))) {
      val inline = docs.select($"doc_id",
        explode(Winnow.fingerprintArray($"text", n, w)).as("e"))
        .select($"doc_id", $"e.pos", $"e.fp")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val windowed = Winnow.fingerprints(docs, "doc_id", "text", n, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(inline === windowed, s"n=$n w=$w")
    }
  }

  test("density is near 2/(w+1) on hash-random grams") {
    val n = 2; val w = 7
    val long = (1 to 2000).map(i => s"tok${i * 2654435761L % 100003}").mkString(" ")
    val one = Seq((1L, long)).toDF("doc_id", "text")
    val nGrams = 2000 - n + 1
    val cnt = Winnow.fingerprints(one, "doc_id", "text", n, w).count()
    val expected = 2.0 / (w + 1) * nGrams
    assert(cnt > expected * 0.7 && cnt < expected * 1.3,
      s"density off: $cnt vs expected ~$expected")
  }
}
