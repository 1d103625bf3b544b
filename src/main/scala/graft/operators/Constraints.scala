package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint verification — the Deequ shape
  * (AWS's Spark data-quality library, VLDB'18 "Automating Large-Scale
  * Data Quality Verification"): a rule set compiles to a FIXED number of
  * aggregate passes whose result is one row per rule,
  * `(rule, n_checked, violations, passed)` — the table a pipeline gates a
  * snapshot publish on.
  *
  * Scale shape, by rule class:
  *   - ROW-LOCAL rules (completeness, range, set membership, column
  *     ordering): ALL of them share ONE aggregate pass — each rule is a
  *     conditional count in the same `agg`, so checking 50 rules costs
  *     one corpus scan, not 50 (Deequ's central trick). The single wide
  *     row is then unpivoted to long form driver-free via `stack`.
  *   - UNIQUENESS: one key histogram (map-side combine bounds the
  *     shuffle by distinct keys) — violations = rows carrying a key seen
  *     more than once.
  *   - FOREIGN KEY: orphan count via a left join against the DISTINCT
  *     parent keys (broadcast when the parent is dimension-sized, AQE
  *     otherwise); the child streams, never the reverse.
  *
  * All counts are exact BIGINTs; `passed` = violations == 0. Rules never
  * abort the scan — the audit REPORTS, the caller gates.
  */
object Constraints {

  private val schemaCols = Seq("rule", "n_checked", "violations", "passed")

  /** The shared one-pass aggregate: total count + one conditional count
    * per rule (NULL predicate results count as violations — a rule that
    * cannot evaluate did not pass). Used by [[rowRules]] and the
    * streaming windowed audit, so batch and stream share the exact
    * aggregation and stay bit-identical on the same rows.
    */
  private[graft] def ruleAggs(rules: Seq[(String, Column)]): Seq[Column] = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.length == rules.length,
      "rule names must be unique")
    count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, viol), i) =>
        count(when(coalesce(viol, lit(true)), lit(1))).as(s"__v$i")
    }
  }

  /** The wide→long unpivot of [[ruleAggs]]'s output columns. */
  private[graft] def ruleStackExpr(rules: Seq[(String, Column)]): String = {
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) =>
        s"'${name.replace("'", "''")}', __v$i" }
      .mkString(", ")
    s"stack(${rules.length}, $stackArgs) AS (rule, violations)"
  }

  /** All row-local rules in ONE aggregate pass over `df`. */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = ruleAggs(rules)
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("__n", ruleStackExpr(rules))
      .select(col("rule"), col("__n").as("n_checked"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** Key-uniqueness rule: `violations` = rows whose composite key occurs
    * more than once (both copies count — the "non-unique row count", so
    * a wholly-duplicated table reports n_checked violations, not n/2).
    * NULL-containing keys group per ANSI GROUP BY (two NULL-keyed rows
    * ARE duplicates).
    */
  def uniqueRule(df: DataFrame, name: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_checked"),
        coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L))
          .as("violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** Referential-integrity rule: `violations` = child rows whose
    * `childKey` has no match among DISTINCT `parentKey` values. A NULL
    * child key is an orphan (it references nothing) — filter upstream if
    * NULL means "intentionally unparented".
    */
  def fkRule(child: DataFrame, name: String, childKey: String,
             parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
      .withColumn("__hit", lit(true))
    child.select(col(childKey).as("__ck"))
      .join(keys, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_checked"),
        count(when(col("__hit").isNull, lit(1))).as("violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** Functional-dependency rule det → dep: `violations` = rows whose
    * determinant tuple maps to MORE than one distinct dependent value
    * (all rows of an ambiguous determinant count — they are all
    * unresolvable). The schema-inference check behind "is this column
    * derivable from that key", and the Deequ `hasUniqueValueRatio`
    * sibling. NULL dependents are a real value (a determinant mapping
    * to {x, NULL} is ambiguous). Two combinable histograms: (det, dep)
    * cells, then per-det distinct-dep counts — state bounded by cell
    * cardinality, never rows.
    */
  def fdRule(df: DataFrame, name: String, detCols: Seq[String],
             depCol: String): DataFrame = {
    require(detCols.nonEmpty, "need at least one determinant column")
    df.groupBy((detCols :+ depCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(detCols.map(col): _*)
      .agg(sum(col("__c")).as("__rows"), count(lit(1)).as("__ndep"))
      .agg(coalesce(sum(col("__rows")), lit(0L)).as("n_checked"),
        coalesce(sum(when(col("__ndep") > 1, col("__rows"))), lit(0L))
          .as("violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** Union of rule result tables into the one audit report, ordered by
    * rule name (the long-format artifact a publish gate reads).
    */
  def audit(results: Seq[DataFrame]): DataFrame = {
    require(results.nonEmpty, "need at least one rule table")
    results
      .map(_.select(schemaCols.map(col): _*))
      .reduce(_.unionByName(_))
      .orderBy("rule")
  }
}
