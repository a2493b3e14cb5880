package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One data-quality expectation: `predicateSql` must evaluate TRUE for a
  * row to pass. STRICT-TRUE semantics — a NULL verdict is a violation
  * (the gate guards training consumption; "unknown" is not "clean").
  * This deliberately diverges from SQL CHECK constraints (which admit
  * NULL, see [[CdcTable.addConstraint]]): a CHECK protects writes, an
  * expectation audits a batch.
  */
final case class Expectation(name: String, predicateSql: String)

/** Batch data-quality gate (the Delta-Live-Tables-expectations shape):
  * declare named row predicates, split a batch into clean rows and a
  * quarantine carrying WHICH rules each row violated, and audit
  * per-rule violation counts — the ingestion gate a training pipeline
  * runs before a corpus slice is consumed.
  *
  * Scale design: everything is one map-side pass. The violation array
  * is a per-row `array_compact` over codegen'd built-in predicates —
  * zero shuffles, zero joins, zero UDFs; [[audit]] folds to a single
  * output row through map-side-combinable conditional sums. Filters on
  * the verdict column stay inside the scan stage, so clean/quarantine
  * splits read the batch once each (or cache one pass and split it).
  */
object Expectations {

  val ViolationsCol = "violations"

  private def validated(rules: Seq[Expectation]): Seq[Expectation] = {
    require(rules.nonEmpty, "at least one expectation")
    val dup = rules.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    require(dup.isEmpty, s"duplicate expectation names: ${dup.mkString(", ")}")
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"expectation name: ${r.name}"))
    rules
  }

  /** The batch plus a `violations` array column listing the names of
    * every failed expectation, in rule order (deterministic — safe to
    * hash-compare and to route on).
    */
  def withViolations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val rs = validated(rules)
    require(!df.columns.contains(ViolationsCol),
      s"batch already has a $ViolationsCol column")
    val verdicts = rs.map(r =>
      when(!coalesce(expr(r.predicateSql), lit(false)), lit(r.name)))
    df.withColumn(ViolationsCol, array_compact(array(verdicts: _*)))
  }

  /** Rows meeting EVERY expectation, verdict column dropped. */
  def clean(df: DataFrame, rules: Seq[Expectation]): DataFrame =
    withViolations(df, rules)
      .filter(size(col(ViolationsCol)) === 0).drop(ViolationsCol)

  /** Rows violating at least one expectation, with the verdict array. */
  def quarantine(df: DataFrame, rules: Seq[Expectation]): DataFrame =
    withViolations(df, rules).filter(size(col(ViolationsCol)) > 0)

  /** One audit row: total rows, clean rows, quarantined rows, then one
    * `viol_<name>` count per rule (a row can count toward several).
    */
  def audit(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val rs = validated(rules)
    val perRule = rs.map(r => sum(
      when(!coalesce(expr(r.predicateSql), lit(false)), 1L).otherwise(0L))
      .as(s"viol_${r.name}"))
    val anyViol = rs.map(r => !coalesce(expr(r.predicateSql), lit(false)))
      .reduce(_ || _)
    val cols = Seq(
      count(lit(1)).as("n_rows"),
      sum(when(anyViol, 0L).otherwise(1L)).as("n_clean"),
      sum(when(anyViol, 1L).otherwise(0L)).as("n_quarantined")) ++ perRule
    df.agg(cols.head, cols.tail: _*)
  }
}
