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

  /** Pairwise token-distribution drift between corpus slices — the
    * DISTRIBUTIONAL complement of the verbatim-overlap matrix (q127):
    * two sources can share zero text yet have near-identical token
    * distributions (same register/domain), or share boilerplate yet
    * diverge distributionally. The metric is total-variation distance
    * over the global top-`topN` tokens plus one residual "other" bucket:
    * TV = ½ Σ |p_i − q_i| ∈ [0, 1], reported e4. The question it
    * answers at 100 TB: "did this source's distribution shift between
    * crawls" / "which sources are interchangeable in a mixture".
    *
    * Exactness: with n_i, m_i the bucket counts and N_a, N_b the slice
    * totals, ½ Σ |n_i/N_a − m_i/N_b| = Σ|n_i·N_b − m_i·N_a| / (2·N_a·N_b)
    * — an exact INTEGER numerator (addition order-free), one IEEE
    * division at the end: engine-exact like the theta estimators. Bound:
    * n_i·N_b must stay under 2^63 — fine to ~3·10^9 tokens per slice;
    * beyond that, pre-scale counts to e-9 proportions before calling.
    *
    * Scale shape: one token explode → (slice, token) count (map-side
    * combine, uniform keys), top-N via TakeOrdered (k rows to the
    * driver plan, no global sort), bucketed histograms are slices×(N+1)
    * rows, and the pair stage joins two copies of that tiny frame —
    * slices²·N work, independent of corpus size. The count frame is
    * persisted across its three consumers and released before returning
    * (result is eagerly checkpointed, matrix-sized). */
  def tokenDrift(docs: DataFrame, sliceCol: String, textCol: String,
                 topN: Int = 64): DataFrame = {
    import graft.functions.TextFunctions.wsTokens
    val OtherBucket = "\u0001other" // control-prefixed: no natural token collides
    val counts = docs
      .select(col(sliceCol).as("src"),
        explode(wsTokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("src"), col("tok")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = try {
      val totals = counts.groupBy(col("src")).agg(sum(col("n")).as("nt"))
      val top = counts.groupBy(col("tok")).agg(sum(col("n")).as("g"))
        .orderBy(col("g").desc, col("tok")).limit(topN).select(col("tok"))
      val keyed = counts
        .join(broadcast(top.withColumn("__t", lit(1))), Seq("tok"), "left")
        .select(col("src"),
          when(col("__t").isNotNull, col("tok")).otherwise(lit(OtherBucket)).as("tok"),
          col("n"))
        .groupBy(col("src"), col("tok")).agg(sum(col("n")).as("n"))
      // zero-filled grid: a token absent from a slice must contribute its
      // FULL other-side mass to the distance, not silently drop
      val filled = totals.select(col("src"))
        .join(broadcast(keyed.select(col("tok")).distinct()), lit(true))
        .join(keyed, Seq("src", "tok"), "left")
        .select(col("src"), col("tok"), coalesce(col("n"), lit(0L)).as("n"))
        .join(totals, Seq("src"))
      val a = filled.select(col("src").as("src_a"), col("tok"),
        col("n").as("na"), col("nt").as("nta"))
      val b = filled.select(col("src").as("src_b"), col("tok"),
        col("n").as("nb"), col("nt").as("ntb"))
      a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(max(col("nta")).as("n_a"), max(col("ntb")).as("n_b"),
          sum(abs(col("na") * col("ntb") - col("nb") * col("nta"))).as("s"))
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          floor(col("s").cast("double") * 10000.0d /
            (lit(2.0d) * col("n_a") * col("n_b")) + 0.5d).cast("long").as("tv_e4"))
        .localCheckpoint(true)
    } finally counts.unpersist()
    out
  }
}
