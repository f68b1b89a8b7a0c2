package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** One-pass table profiler — the data-quality summary an ingest run logs
  * before committing a batch: per column, row/null counts, approximate
  * distinct (HLL++ via approx_count_distinct — profile-grade, not the
  * oracle-exact sketch), and min/max rendered as strings.
  *
  * Cost model: ONE scan regardless of column count — every statistic is an
  * aggregate in a single wide agg row (partial aggregation everywhere),
  * pivoted to per-column rows on the driver (columns × 4 values — bytes).
  * No per-column jobs, no sampling. min/max aggregate on the NATIVE type
  * (cast to string only at the end — string-cast-first would order
  * numerics lexicographically, e.g. min(2, 10) = "10"); map columns are
  * unorderable and report null bounds.
  */
object Profiler {

  /** Backtick-quote a column name so dots and backticks in messy source
    * schemas resolve as the literal name, not a nested-field path. */
  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** (column, n_rows, n_nulls, approx_distinct, min, max) per column. */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val orderable = df.schema.fields.map(f =>
      f.name -> !f.dataType.isInstanceOf[MapType]).toMap
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        cols.zipWithIndex.flatMap { case (c, i) =>
          val (mn, mx) =
            if (orderable(c)) (min(q(c)).cast("string"), max(q(c)).cast("string"))
            else (lit(null).cast("string"), lit(null).cast("string"))
          Seq(
            sum(when(q(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
            approx_count_distinct(q(c)).as(s"__dist_$i"),
            mn.as(s"__min_$i"), mx.as(s"__max_$i"))
        }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    cols.zipWithIndex.map { case (c, i) =>
      (c, n, row.getAs[Long](s"__nulls_$i"), row.getAs[Long](s"__dist_$i"),
        Option(row.getAs[String](s"__min_$i")), Option(row.getAs[String](s"__max_$i")))
    }.toDF("column", "n_rows", "n_nulls", "approx_distinct", "min", "max")
  }

  /** Join-key skew report — the diagnostic to run BEFORE a 100 TB join:
    * the `topK` heaviest key values with their row share (e4) and a `hot`
    * verdict at `hotShareE4`. A hot key means a plain hash join puts that
    * share of the table in ONE task — reach for Relational.saltedJoin (or
    * broadcast the other side) instead. One partial-agg'd groupBy + a
    * TakeOrdered of k rows; the share denominator rides a broadcast scalar,
    * so the diagnostic costs one scan. */
  def skewReport(df: DataFrame, keyCol: String, topK: Int,
                 hotShareE4: Long = 1000L): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.join(broadcast(total), lit(true))
      .withColumn("share_e4", graft.functions.TextFunctions.fixedPoint(
        col("n") / col("__total"), 4))
      .withColumn("hot", col("share_e4") >= hotShareE4)
      .select(col("key"), col("n"), col("share_e4"), col("hot"))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
  }
}
