package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the engine's version of dbt's
  * schema tests (`unique`, `not_null`, `relationships`), which the
  * reference's dbt models rely on for contract enforcement. Each check
  * returns a violation COUNT frame so a pipeline can gate a commit on
  * `n_violations == 0` without materializing offending rows (at 100 TB
  * the report is what you page on; the offending-row drill-down is a
  * follow-up filter).
  *
  * Cost shapes: unique = one partial-agg'd groupBy on the key;
  * not_null = one scan aggregate; relationships = one left-anti join
  * (broadcast when the parent key side is dimension-sized). */
object Constraints {

  /** dbt `unique`: number of non-null key values appearing more than once
    * (dbt semantics — NULLs are not counted as duplicates of each other). */
  def uniqueViolations(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(count(lit(1)).as("n_violations"))

  /** dbt `not_null`: number of rows with a NULL in the column. The
    * coalesce matters standalone: sum over ZERO rows is NULL, and a gate
    * comparing `n_violations === 0` would silently fail a clean empty
    * batch (NULL === 0 is NULL, the row filters out). */
  def notNullViolations(df: DataFrame, c: String): DataFrame =
    df.agg(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
      .as("n_violations"))

  /** dbt `relationships`: child rows whose non-null foreign key has no
    * matching parent key. */
  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  /** Run a batch of named checks into one (test, n_violations) report —
    * a union of 1-row aggregates, one declarative plan. Fails loudly on an
    * empty check list (reduce would throw an inscrutable reduceLeft error;
    * and a silently-empty report reads as "all clean"). */
  def report(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty,
      "Constraints.report: no checks declared — an empty report would read as all-clean")
    checks.map { case (name, df) =>
      df.select(lit(name).as("test"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
    }.reduce(_ unionByName _)
  }
}
