package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT serialization — the chat-template step that turns a multi-turn
  * conversation table into the ONE training string per conversation a
  * fine-tune job consumes (the HF `apply_chat_template` shape,
  * re-expressed as a relational fold), plus the role-alternation
  * integrity audit every SFT ingest runs first (a conversation whose
  * roles don't alternate is a logging bug that silently teaches the
  * model to answer itself).
  *
  * Determinism: turns are folded in (orderCols…) order — the caller
  * must supply a TOTAL order within each conversation (ts + a unique
  * tie-break), making the rendered string a pure function of the row
  * set; `collect_list`'s arrival order is laundered through
  * `sort_array` over structs whose LEADING fields are the order
  * columns. String assembly is plain concatenation — byte-identical
  * on any engine.
  *
  * Scale shape: one lead() window for the alternation flags (shares
  * the conversation partition), one hash-aggregate per conversation.
  * The rendered string is conversation-sized — bounded by the turn
  * protocol, not the corpus; no join, no second shuffle.
  */
object SftFormat {

  /** @param orderCols total order within a conversation (e.g. ts,
    *                  event_id) — leading sort-struct fields
    * @param role      turn role expression (string)
    * @param text      turn text expression (string; NULL turns render
    *                  as empty — coalesce upstream if NULL is illegal)
    * @param header    prepended once per conversation (system prompt /
    *                  BOS marker); "" for none
    * @return one row per conversation: (convCol, n_turns,
    *         roles_alternate, sft_text, n_chars)
    */
  def renderConversations(df: DataFrame, convCol: String,
                          orderCols: Seq[String], role: Column,
                          text: Column, header: String): DataFrame = {
    require(orderCols.nonEmpty, "need a total turn order")
    val w = Window.partitionBy(convCol)
      .orderBy(orderCols.map(col): _*)
    val turns = df.select((col(convCol) +: orderCols.map(col)) ++ Seq(
        role.cast("string").as("__role"),
        coalesce(text.cast("string"), lit("")).as("__text")): _*)
      .withColumn("__next_role", lead(col("__role"), 1).over(w))
    turns.groupBy(convCol).agg(
        count(lit(1)).as("n_turns"),
        // vacuously true for single-turn conversations; NULL roles
        // compare as non-alternating (<=> is null-safe equality)
        min(when(col("__next_role").isNull, lit(true))
          .otherwise(!(col("__role") <=> col("__next_role"))))
          .as("roles_alternate"),
        array_join(
          transform(
            sort_array(collect_list(struct(
              orderCols.map(col) ++
                Seq(col("__role"), col("__text")): _*))),
            t => concat(lit("<|"), t("__role"), lit("|>"),
              t("__text"))), "")
          .as("__body"))
      .withColumn("sft_text", concat(lit(header), col("__body")))
      .withColumn("n_chars", length(col("sft_text")).cast("long"))
      .select(convCol, "n_turns", "roles_alternate", "sft_text",
        "n_chars")
  }

  /** LOSS-MASK audit — the companion measurement to
    * [[renderConversations]]: an SFT run masks the loss to the
    * assistant turns (training on user/system text teaches the model to
    * imitate its users), so the TRAINABLE fraction of each rendered
    * conversation is the assistant-turn payload share. A conversation
    * that is 98% user boilerplate and 2% assistant text costs full
    * sequence length for 2% signal — this table is what a pipeline
    * sorts by before paying for those tokens.
    *
    * Convention: ratios are over turn PAYLOAD characters (role markers
    * and header are protocol overhead, masked on every side, so they'd
    * only dilute the comparison). All counts exact BIGINTs off ONE
    * conversation-keyed hash aggregate — no window, no join;
    * `mask_q20` is one closing 2^20 integral division, NULL for
    * all-empty conversations (0/0).
    *
    * @param role      turn role expression (string)
    * @param text      turn text expression (NULL counts as empty)
    * @param trainRole role value whose turns carry loss (exact match)
    * @return one row per conversation: (convCol, n_turns,
    *         n_train_turns, chars_total, chars_train, mask_q20)
    */
  def lossMaskAudit(df: DataFrame, convCol: String, role: Column,
                    text: Column, trainRole: String): DataFrame = {
    val Q = 1048576L // 2^20
    val t = df.select(col(convCol),
      role.cast("string").as("__role"),
      length(coalesce(text.cast("string"), lit(""))).cast("long")
        .as("__len"))
    t.groupBy(convCol).agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("__role") === trainRole, 1L).otherwise(0L))
          .cast("long").as("n_train_turns"),
        sum(col("__len")).cast("long").as("chars_total"),
        sum(when(col("__role") === trainRole, col("__len"))
          .otherwise(0L)).cast("long").as("chars_train"))
      .withColumn("mask_q20", when(col("chars_total") > 0L,
        graft.functions.posIntDiv(col("chars_train") * Q,
          col("chars_total"))))
  }
}
