package graft

import graft.operators.SftFormat
import org.apache.spark.sql.functions._

class SftFormatSpec extends SparkSpec {
  import spark.implicits._

  test("renderConversations: ordered fold, alternation audit, header") {
    val df = Seq(
      // conv 1: out-of-order input rows, alternating roles
      (1L, 20L, 2L, "assistant", "hi there"),
      (1L, 10L, 1L, "user", "hello"),
      (1L, 30L, 3L, "user", "bye"),
      // conv 2: two consecutive user turns -> not alternating
      (2L, 10L, 4L, "user", "a"),
      (2L, 20L, 5L, "user", "b"),
      // conv 3: single turn -> vacuously alternating
      (3L, 10L, 6L, "system", "solo"))
      .toDF("conv", "ts", "eid", "role", "text")
    val got = SftFormat.renderConversations(
      df, "conv", Seq("ts", "eid"), col("role"), col("text"), "<|s|>SYS")
      .collect().map(r => r.getAs[Long]("conv") -> r).toMap
    val c1 = got(1L)
    assert(c1.getAs[String]("sft_text") ===
      "<|s|>SYS<|user|>hello<|assistant|>hi there<|user|>bye")
    assert(c1.getAs[Long]("n_turns") === 3L)
    assert(c1.getAs[Boolean]("roles_alternate") === true)
    assert(c1.getAs[Long]("n_chars") ===
      c1.getAs[String]("sft_text").length.toLong)
    assert(got(2L).getAs[Boolean]("roles_alternate") === false)
    assert(got(3L).getAs[Boolean]("roles_alternate") === true)
  }

  test("renderConversations: ties broken by the second order column") {
    val df = Seq(
      (1L, 10L, 2L, "b", "second"),
      (1L, 10L, 1L, "a", "first"))
      .toDF("conv", "ts", "eid", "role", "text")
    val got = SftFormat.renderConversations(
      df, "conv", Seq("ts", "eid"), col("role"), col("text"), "")
      .collect()(0)
    assert(got.getAs[String]("sft_text") === "<|a|>first<|b|>second")
  }

  test("renderConversations: NULL text renders empty, not poisoned") {
    val df = Seq((1L, 10L, 1L, "user", Option("x")),
      (1L, 20L, 2L, "assistant", Option.empty[String]))
      .toDF("conv", "ts", "eid", "role", "text")
    val got = SftFormat.renderConversations(
      df, "conv", Seq("ts", "eid"), col("role"), col("text"), "")
      .collect()(0)
    assert(got.getAs[String]("sft_text") === "<|user|>x<|assistant|>")
  }
}
