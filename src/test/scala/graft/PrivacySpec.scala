package graft

import graft.operators.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // (lang, bucket) = ("en", 0): 3 rows, 2 distinct sources
    (0L, "en", 0L, "a"), (1L, "en", 0L, "a"), (2L, "en", 0L, "b"),
    // ("en", 1): 1 row — fails k=2
    (3L, "en", 1L, "a"),
    // ("de", 0): 2 rows, 1 source — passes k=2, fails l=2
    (4L, "de", 0L, "c"), (5L, "de", 0L, "c")
  ).toDF("id", "lang", "bucket", "source")

  test("kAnonymityAudit flags small and non-diverse groups") {
    val audit = Privacy.kAnonymityAudit(docs, Seq("lang", "bucket"), "source",
      k = 2, l = 2).orderBy("lang", "bucket").collect()
    val rows = audit.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toSeq
    assert(rows == Seq(
      ("de", 0L, 2L, 1L, true, false),
      ("en", 0L, 3L, 2L, true, true),
      ("en", 1L, 1L, 1L, false, false)))
  }

  test("suppressSmallGroups drops exactly the failing groups' rows") {
    val kept = Privacy.suppressSmallGroups(docs, Seq("lang", "bucket"), k = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L, 4L, 5L))
  }

  test("luhnValid matches the reference mod-10 algorithm") {
    def refLuhn(s: String): Boolean = s.nonEmpty && {
      s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 0) d else { val t = d * 2; if (t > 9) t - 9 else t }
      }.sum % 10 == 0
    }
    val cands = Seq(
      "4111111111111111", // canonical Luhn-valid test number
      "4111111111111112", "79927398713", "79927398710",
      "0000000000000000", "18", "1", "0")
    val out = cands.toDF("d")
      .select($"d", Privacy.luhnValid($"d").as("v")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cands.foreach(c => assert(out(c) === refLuhn(c), s"candidate $c"))
    assert(out("4111111111111111"))
    assert(!out("4111111111111112"))
  }

  test("luhnValid: exactly one check digit validates any prefix; empty false, NULL null") {
    val variants = (0 to 9).map(d => s"12345678901234$d")
    val valid = variants.toDF("d")
      .select(Privacy.luhnValid($"d").as("v")).collect().count(_.getBoolean(0))
    assert(valid === 1)
    val edge = Seq(Some(""), None: Option[String]).toDF("d")
      .select(Privacy.luhnValid($"d").as("v")).collect()
    assert(edge(0).getBoolean(0) === false)
    assert(edge(1).isNullAt(0))
  }
}
