package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper

/** Validation of the `tools/oracle_budget.py` report — the round-16
  * response to the round-15 zeroed driver artifact: one DuckDB oracle
  * the driver could not afford (q374's per-pixel form, measured
  * >15 min / ~45 GB for 500 documents) emptied `CORRECTNESS_r15.json`
  * for all 375 queries. An oracle the driver can't run is a gate that
  * doesn't exist, so the budget report is now a CONTRACT artifact:
  * GateContractSpec fails the build unless the committed
  * `ORACLE_BUDGET.json` covers every gated oracle, every row is within
  * budget, and the budget itself has not been quietly loosened.
  *
  * Kept in main (not test) so the validation logic is one shared
  * implementation between the spec that enforces the real artifact and
  * the saboteur tests that prove an over-budget / missing / stale row
  * cannot slip through.
  */
object OracleBudgetReport {

  /** Per-oracle budget ceilings the report must have been run with —
    * the verdict's "an oracle the driver can't afford" line in numbers.
    */
  val MaxBudgetSec: Double = 30.0
  val MaxBudgetMb: Long = 2048L

  final case class Row(query: String, status: String, wallSec: Double,
                       peakRssMb: Double)

  final case class Report(budgetSec: Double, budgetMb: Long,
                          sfDir: String, rows: Seq[Row])

  def parse(json: String): Report = {
    val m = new ObjectMapper().readTree(json)
    val rows = {
      val it = m.get("results").elements()
      val buf = Seq.newBuilder[Row]
      while (it.hasNext) {
        val r = it.next()
        buf += Row(
          r.get("query").asText(),
          r.get("status").asText(),
          if (r.has("wall_sec")) r.get("wall_sec").asDouble() else -1.0,
          if (r.has("peak_rss_mb")) r.get("peak_rss_mb").asDouble() else -1.0)
      }
      buf.result()
    }
    Report(m.get("budget_sec").asDouble(), m.get("budget_mb").asLong(),
      m.get("sf_dir").asText(), rows)
  }

  /** Violation messages; empty = the report proves every oracle in
    * `expected` affordable. `expected` is SparkEntry.oracleSql.keySet.
    */
  def violations(report: Report, expected: Set[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (report.budgetSec > MaxBudgetSec)
      out += s"budget_sec ${report.budgetSec} loosened beyond $MaxBudgetSec"
    if (report.budgetMb > MaxBudgetMb)
      out += s"budget_mb ${report.budgetMb} loosened beyond $MaxBudgetMb"
    val have = report.rows.map(_.query).toSet
    (expected -- have).toSeq.sorted.foreach(q =>
      out += s"$q: oracle has no budget-report row (report stale - rerun tools/oracle_budget.py)")
    (have -- expected).toSeq.sorted.foreach(q =>
      out += s"$q: budget-report row for a query that no longer exists")
    report.rows.filterNot(_.status == "OK").sortBy(_.query).foreach(r =>
      out += s"${r.query}: ${r.status} (wall=${r.wallSec}s rss=${r.peakRssMb}MB)")
    out.result()
  }
}
