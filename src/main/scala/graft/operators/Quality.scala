package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the dbt-test / Deequ shape): each
  * rule produces one (rule, n_violations) row; a pipeline gates a
  * load on `all n_violations == 0` or publishes the report next to the
  * table. The reference validates implicitly (unique-index insert
  * errors, silent drops); this is the audited form.
  *
  * Scale shape: all ROW-LOCAL rules (null / range / domain) fold into
  * ONE aggregate pass over one scan — adding a rule adds a counter,
  * not a job. Uniqueness is one groupBy on the key; referential
  * integrity is one anti-join (broadcast when the parent is a
  * dimension). Nothing collects; the report is |rules| rows.
  */
object Quality {

  /** One scan, many row-local rules: `rules` maps rule name → a
    * violation predicate (true = row violates). Returns one row per
    * rule by exploding the single aggregate row through a typed
    * name→count map — rule names travel as DATA literals, never as
    * spliced SQL text, so any name (quotes, backticks, unicode) is
    * safe. */
  def scanChecks(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.map(_._1).distinct.size == rules.size,
      "scanChecks: rule names must be unique")
    val aggs = rules.zipWithIndex.map { case ((_, bad), i) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"__r$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(map_from_arrays(
        array(rules.map { case (name, _) => lit(name) }: _*),
        array(rules.indices.map(i => coalesce(col(s"__r$i"), lit(0L))): _*)))
      .as(Seq("rule", "n_violations")))
  }

  /** Key-uniqueness rule: counts the rows involved in duplicated keys
    * (0 when the key is unique). */
  def uniqueCheck(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .agg(coalesce(sum("__c"), lit(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))

  /** Referential-integrity rule: child rows whose key has no parent
    * (null child keys are orphans too — count them; add an explicit
    * null rule if a different policy is wanted). */
  def fkCheck(child: DataFrame, name: String, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))

  /** Union of rule reports, presentation-sorted by rule name. */
  def report(checks: DataFrame*): DataFrame =
    checks.reduce(_ unionByName _).orderBy("rule")
}
