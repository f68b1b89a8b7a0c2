package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single right row
  * with the same key and the greatest (rightTime, tieBreak) at or before
  * the left row's time. The time-series primitive Spark has no native
  * operator for (trades→quotes, orders→price, event→last-checkpoint).
  *
  * Implementation is the scalable union-tag formulation, NOT a range self
  * join: both sides union into one stream tagged (time, side, tiebreak),
  * one window partitioned by key carries the latest right payload forward
  * (`last(..., ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT), and
  * left rows are filtered back out. Cost at any scale: ONE shuffle on the
  * key + a per-partition sort — O(|L|+|R|) rows moved, versus the
  * O(|L|·|R|) blowup of the naive `l.ts >= r.ts` range join Catalyst
  * would plan (BroadcastNestedLoopJoin). No driver state, no skew beyond
  * the key's own distribution.
  *
  * Determinism: right rows sort (time, tiebreak) and sit BEFORE left rows
  * at equal time (side 0 < 1), so an exactly-simultaneous right row
  * matches ("at or before"), and equal-time right rows resolve to the
  * greatest tiebreak — a total order both engines agree on. Left-row
  * relative order within a tie never matters: they only read window state.
  */
object AsOf {

  /** Left frame + `prefix`-renamed `rightVals` of the matched right row
    * (nulls when no right row precedes). `rightTieBreak` must be non-null
    * on the right side. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, rightTieBreak: String,
               rightVals: Seq[String], prefix: String = "asof_"): DataFrame = {
    val tbType = right.schema(rightTieBreak).dataType
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(right.select(rightVals.map(col): _*).schema).as("__rv"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightTieBreak).as("__tb"),
        struct(rightVals.map(col): _*).as("__rv"),
        lit(null).cast(left.schema).as("__lrow")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      // getField resolves literal field names — a dotted column name would
      // make the "__lrow.a.b" path form resolve as a nested struct path
      .select(left.columns.map(c => col("__lrow").getField(c).as(c)) ++
        rightVals.map(v => col("__m").getField(v).as(s"$prefix$v")): _*)
  }
}
