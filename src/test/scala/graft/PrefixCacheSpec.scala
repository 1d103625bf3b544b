package graft

import graft.operators.PrefixCache
import org.apache.spark.sql.functions._

class PrefixCacheSpec extends SparkSpec {
  import spark.implicits._

  test("prefixSharingStats counts shared prefixes and saved tokens per depth") {
    // depth 1: prefixes {a: 3 docs, x: 1} -> 1 shared prefix, 3 sharers,
    //          saved = (3-1)*1 = 2 of 4 tokens
    // depth 2: "a b" x2, "a c", "x y" -> 1 shared prefix, 2 sharers,
    //          saved = (2-1)*2 = 2 of 8
    // depth 4: only docs 1/2 have >= 4 tokens and differ at token 4
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "a c d"), (4L, "x y")
    ).toDF("id", "text")
    val got = PrefixCache.prefixSharingStats(docs, "id", "text",
      Seq(1, 2, 4)).orderBy("depth").collect()
    val d1 = got(0)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3), d1.getLong(4),
      d1.getLong(5)) === ((4L, 2L, 1L, 3L, 2L)))
    assert(d1.getDouble(6) === 0.5)
    val d2 = got(1)
    assert((d2.getLong(1), d2.getLong(3), d2.getLong(4), d2.getLong(5)) ===
      ((4L, 1L, 2L, 2L)))
    val d4 = got(2)
    assert((d4.getLong(1), d4.getLong(2), d4.getLong(3), d4.getLong(5)) ===
      ((2L, 2L, 0L, 0L)))
  }

  test("prefixSharingStats: depths no doc reaches produce no row; bad depths fail") {
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("id", "text")
    val got = PrefixCache.prefixSharingStats(docs, "id", "text", Seq(2, 64))
    assert(got.collect().map(_.getInt(0)).toSeq === Seq(2))
    intercept[IllegalArgumentException] {
      PrefixCache.prefixSharingStats(docs, "id", "text", Seq(2, 2))
    }
    intercept[IllegalArgumentException] {
      PrefixCache.prefixSharingStats(docs, "id", "text", Seq.empty)
    }
  }
}
