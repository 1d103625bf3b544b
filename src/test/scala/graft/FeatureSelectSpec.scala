package graft

import graft.operators.FeatureSelect
import org.apache.spark.sql.functions._

/** Chi-squared token/label association. */
class FeatureSelectSpec extends SparkSpec {
  import spark.implicits._

  private def chi2(n11: Long, n10: Long, n01: Long, n00: Long): Double = {
    val n = (n11 + n10 + n01 + n00).toDouble
    val num = (n11 * n00 - n10 * n01).toDouble
    n * num * num / ((n11 + n01).toDouble * (n10 + n00).toDouble *
      (n11 + n10).toDouble * (n01 + n00).toDouble)
  }

  // 3 positive docs, 2 negative; "pos" only in positives, "both" in all
  // but one negative, "neg" only in negatives.
  private val docs = Seq(
    (1L, "pos both x", true), (2L, "pos both", true), (3L, "pos both", true),
    (4L, "neg both", false), (5L, "neg y", false)
  ).toDF("doc_id", "text", "is_pos")

  test("cell counts and chi2 match the closed form") {
    val out = FeatureSelect.chiSquaredTokens(docs, "doc_id", "text",
      col("is_pos"), minDf = 1L, topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(out("pos") === ((3L, 0L, 0L, 2L, chi2(3, 0, 0, 2))))
    assert(out("neg") === ((0L, 3L, 2L, 0L, chi2(0, 3, 2, 0))))
    assert(out("both") === ((3L, 0L, 1L, 1L, chi2(3, 0, 1, 1))))
    // presence, not counts: token x appears once in one doc
    assert(out("x") === ((1L, 2L, 0L, 2L, chi2(1, 2, 0, 2))))
  }

  test("minDf drops rare tokens; topK keeps the highest-chi2 prefix") {
    val top = FeatureSelect.chiSquaredTokens(docs, "doc_id", "text",
      col("is_pos"), minDf = 2L, topK = 2)
      .collect().map(_.getString(0)).toSeq
    // x (df=1) and y (df=1) are df-cut; pos and neg are perfectly
    // separating (chi2 = N = 5) and beat both (ties pos < neg textually)
    assert(top === Seq("neg", "pos"))
  }

  test("duplicate tokens within a doc count once (presence semantics)") {
    val d2 = Seq((1L, "t t t", true), (2L, "u", false)).toDF("doc_id", "text", "y")
    val out = FeatureSelect.chiSquaredTokens(d2, "doc_id", "text", col("y"),
      minDf = 1L, topK = 10).collect()
    val t = out.find(_.getString(0) == "t").get
    assert(t.getLong(1) === 1L && t.getLong(3) === 0L)
  }
}
