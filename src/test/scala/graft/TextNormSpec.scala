package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private val Acute = 0x0301.toChar.toString // combining acute
  private val Zws = 0x200B.toChar.toString // zero-width space (Cf)
  private val Zwj = 0x200D.toChar.toString // zero-width joiner (Cf)
  private val Vt = 0x000B.toChar.toString // vertical tab (Cc, not RE2 \\s)

  private def canonOf(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.canonicalize($"t").as("c"))
      .as[String].head

  test("nfc composes combining sequences; ascii passes through") {
    val got = Seq("Cafe" + Acute, "plain ascii").toDF("t")
      .select(TextAnalysis.nfc($"t")).as[String].collect()
    assert(got.toSeq == Seq("Café", "plain ascii"))
  }

  test("nfc is null-preserving") {
    val got = Seq(Option.empty[String]).toDF("t")
      .select(TextAnalysis.nfc($"t")).collect()
    assert(got.head.isNullAt(0))
  }

  test("canonicalize: collapse, strip, trim, compose") {
    // tab + VT + multi-space collapse; ZWS/ZWJ stripped; NFC composed;
    // ends trimmed
    assert(canonOf(s" Cafe$Acute$Zws  du\tmonde $Vt zw${Zwj}j: x ") ==
      "Café du monde zwj: x")
    // already-canonical text is a fixpoint
    assert(canonOf("Café du monde zwj: x") == "Café du monde zwj: x")
  }

  test("canonicalize merges exact-dup groups split by invisible bytes") {
    val docs = Seq("a b", s"a$Zws b", "a  b", "a\tb").toDF("t")
    val distinct = docs.select(TextAnalysis.canonicalize($"t").as("c"))
      .distinct().count()
    assert(distinct == 1L)
  }

  test("graft_nfc and graft_canonical_text are SQL-callable") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      s"SELECT graft_nfc('Café') AS n, graft_canonical_text(' a\tb ') AS c")
      .head
    assert(r.getString(0) == "Café" && r.getString(1) == "a b")
  }
}
