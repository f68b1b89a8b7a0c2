package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiler — the data-quality summary an ingest run logs
  * before committing a batch: per column, row/null counts, approximate
  * distinct (HLL++ via approx_count_distinct — profile-grade, not the
  * oracle-exact sketch), and min/max rendered as strings.
  *
  * Cost model: ONE scan regardless of column count — every statistic is an
  * aggregate in a single wide agg row (partial aggregation everywhere),
  * pivoted to per-column rows on the driver (columns × 4 values — bytes).
  * No per-column jobs, no sampling.
  */
object Profiler {

  /** (column, n_rows, n_nulls, approx_distinct, min, max) per column. */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            approx_count_distinct(col(c)).as(s"__dist_$c"),
            min(col(c).cast("string")).as(s"__min_$c"),
            max(col(c).cast("string")).as(s"__max_$c"))
        }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    cols.map { c =>
      (c, n, row.getAs[Long](s"__nulls_$c"), row.getAs[Long](s"__dist_$c"),
        Option(row.getAs[String](s"__min_$c")), Option(row.getAs[String](s"__max_$c")))
    }.toDF("column", "n_rows", "n_nulls", "approx_distinct", "min", "max")
  }
}
