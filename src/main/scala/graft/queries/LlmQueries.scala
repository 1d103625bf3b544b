package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline queries (dedup / similarity / text analysis /
  * multimodal) — populated alongside graft.operators.
  */
object LlmQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
