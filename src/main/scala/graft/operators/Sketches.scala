package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable sketch aggregates (SURVEY §2 sketches; reference uses engine
  * sketches for approximate distincts at scale).
  *
  * `hllDistinct` is a from-scratch HyperLogLog over md5-derived hashes with
  * every step deterministic AND engine-portable: the register maxima and
  * their scaled harmonic sum are exact integer arithmetic, and the floating
  * point tail is one int→double conversion, IEEE-exact multiply/divide, and
  * (in the small-range branch) ln over the finite set {m/V : V ∈ 1..m} —
  * so DuckDB reproduces the estimate bit-for-bit (unlike
  * `approx_count_distinct`, whose HLL++ internals are engine-specific).
  *
  * Scale: two map-side-combinable aggregations — groupBy(keys, bucket).max
  * collapses to ≤ groups·4096 rows before the second shuffle. No per-group
  * collection, no window; a 100 TB column costs one pass + two tiny
  * shuffles. This is the standard distributed-HLL shape (partial registers
  * merged by max).
  */
object Sketches {

  /** 2^12 buckets from the first 3 md5 hex digits; first-one position over
    * the next 48 bits (12 hex digits). σ ≈ 1.04/√4096 ≈ 1.6%. */
  private val M = 4096
  private val TwoPow49 = 562949953421312L
  // alpha_4096 · M² · 2^49 = alpha · 2^73, explicit association mirrored in
  // the oracle SQL (each op either exact or singly-rounded IEEE).
  private def rawEstimate(sScaled: Column): Column =
    (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(4096.0)) *
      lit(math.pow(2, 73))) / sScaled.cast("double")

  /** Per-group HLL registers: one row per (keys, bucket) with the max
    * first-one position. Exposed for incremental merging — unions of
    * register frames re-aggregate with max. */
  def hllRegisters(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val h = md5(col(valueCol).cast("string"))
    val rest = conv(substring(h, 4, 12), 16, 10).cast("long")
    df.select(keys.map(col) :+
        conv(substring(h, 1, 3), 16, 10).cast("int").as("bucket") :+
        when(rest === 0, lit(49))
          .otherwise(lit(49) - length(bin(rest))).cast("int").as("rho"): _*)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** HLL distinct estimate per group, surfaced as exact fixed-point e2.
    * Standard small-range correction: when the raw estimate ≤ 2.5·m and
    * empty buckets remain, linear counting m·ln(m/V) is the estimator
    * (ln's input domain is the finite set {m/V}, so cross-engine agreement
    * is a checkable finite property, not a per-row gamble). */
  def hllDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                  estCol: String = "hll_est_e2"): DataFrame =
    estimateFromRegisters(hllRegisters(df, keys, valueCol), keys, estCol)

  /** Estimate from a register frame — the merge path: union register
    * frames from independent partitions/batches, re-max per bucket, then
    * estimate. This is what makes the sketch distributable: registers are
    * the only state that ever moves. */
  def estimateFromRegisters(registers: DataFrame, keys: Seq[String],
                            estCol: String = "hll_est_e2"): DataFrame = {
    val raw = rawEstimate(
      (lit(M) - col("used")) * lit(TwoPow49) + col("s_present"))
    val v = lit(M) - col("used") // empty buckets
    val est = when(raw <= lit(2.5 * M) && v > 0,
      lit(4096.0) * log(lit(4096.0) / v)).otherwise(raw)
    registers
      .groupBy(keys.map(col) :+ col("bucket"): _*).agg(max(col("m")).as("m"))
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("used"),
        sum(expr("shiftleft(cast(1 as bigint), 49 - m)")).as("s_present"))
      .select(keys.map(col) :+
        floor(est * 100 + 0.5).cast("long").as(estCol): _*)
  }

  // --- Count-min sketch: the frequency-estimation sibling of the HLL.
  // depth salted-md5 rows × width integer counters; counters are the only
  // state that moves (mergeable by +), estimates are min over the probed
  // counters — overestimates only, never under. Everything is integer
  // arithmetic on md5-derived hashes, so any engine reproduces the sketch
  // exactly. At 100 TB: one pass + one (r,c) groupBy that collapses to
  // ≤ width·depth rows — the counter frame broadcasts for probing. ---

  private def cmsCol(v: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$r:"), v.cast("string"))), 1, 15), 16, 10)
      .cast("long") % width

  /** Counter frame (r, c, n): occurrences hashed into `width` cells per
    * salted row. Union counter frames from independent batches and re-sum
    * per (r, c) to merge — same contract as hllRegisters. */
  def cmsCounters(df: DataFrame, valueCol: String,
                  width: Int = 1024, depth: Int = 4): DataFrame =
    df.select(posexplode(array((0 until depth).map(r =>
        cmsCol(col(valueCol), r, width)): _*)).as(Seq("r", "c")))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("n"))

  /** Estimated frequency per probe value: min over depth rows of the
    * counter each row hashes the value into (0 when the cell is empty). */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, valueCol: String,
                  width: Int = 1024, depth: Int = 4,
                  estCol: String = "cms_est"): DataFrame =
    probes.select(col(valueCol), posexplode(array((0 until depth).map(r =>
        cmsCol(col(valueCol), r, width)): _*)).as(Seq("r", "c")))
      .join(broadcast(counters), Seq("r", "c"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("n"), lit(0L))).as(estCol))

  // --- Fixed-width histogram quantiles: the percentile sketch. One pass
  // buckets values into integer cells (floor(cents/width)), the per-group
  // cell counts ARE the sketch (mergeable by +, like the CMS counters), and
  // a quantile resolves to the first cell whose cumulative count reaches
  // ceil(q·n) — error bounded by the cell width, cost bounded by
  // groups × occupied cells. The at-scale answer to percentiles over
  // 100 TB, where exact would mean a global sort; everything is integer
  // arithmetic, so any engine reproduces the estimates exactly. ---

  /** Histogram cells per group: (keys, cell, n) for cents-quantized
    * `valueCol` with `cellWidthCents`-wide cells. */
  def histogramCells(df: DataFrame, keys: Seq[String], valueCol: String,
                     cellWidthCents: Long): DataFrame =
    df.select(keys.map(col) :+
        floor(floor(col(valueCol) * 100 + 0.5) / cellWidthCents)
          .cast("long").as("cell"): _*)
      .groupBy(keys.map(col) :+ col("cell"): _*)
      .agg(count(lit(1)).as("n"))

  /** Quantile estimates from histogram cells: for each q in `qs` (e4 ints,
    * e.g. 5000 = p50), the upper bound in cents of the first cell whose
    * cumulative count reaches ceil(q·n). One window pass + one groupBy for
    * ALL requested quantiles (min-over-qualifying-cells per q — no
    * per-quantile re-windowing, no join chain). Output: keys + one
    * `p{q}_cents` column per requested quantile. */
  def histogramQuantiles(cells: DataFrame, keys: Seq[String],
                         cellWidthCents: Long, qs: Seq[Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("cell"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = cells
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)))
    val quantileCols = qs.map { q =>
      // target rank = ceil(q·total / 10000), integer-exact (the +9999 floor
      // form survives the double division's 1-ulp error; plain ceil doesn't)
      val target = floor((col("total") * q + 9999L) / 10000L)
      ((min(when(col("cum") >= target, col("cell"))) + 1) * cellWidthCents)
        .as(s"p${q}_cents")
    }
    cum.groupBy(keys.map(col): _*).agg(quantileCols.head, quantileCols.tail: _*)
  }

  /** The oracle-side mirror of hllDistinct as DuckDB SQL, kept adjacent to
    * the Scala so the two formulations stay in lockstep. */
  def hllOracleSql(table: String, keyCol: String, valueCol: String,
                   estCol: String = "hll_est_e2"): String =
    s"""WITH br AS (SELECT $keyCol,
           CAST('0x'||substr(h,1,3) AS INT) AS bucket,
           CASE WHEN CAST('0x'||substr(h,4,12) AS BIGINT) = 0 THEN 49
                ELSE 49 - length(bin(CAST('0x'||substr(h,4,12) AS BIGINT))) END AS rho
         FROM (SELECT $keyCol, md5(CAST($valueCol AS VARCHAR)) AS h FROM $table)),
       mx AS (SELECT $keyCol, bucket, max(rho) AS m FROM br GROUP BY 1, 2),
       ag AS (SELECT $keyCol, count(*) AS used,
           -- power(2,k) is double-EXACT for k <= 49 and the per-term CAST
           -- keeps the sum in HUGEINT; ** would sum doubles and round
           -- once the register spread exceeds 53 bits
           CAST(sum(CAST(power(2, 49 - m) AS BIGINT)) AS BIGINT) AS s_present
         FROM mx GROUP BY 1),
       es AS (SELECT $keyCol,
           0.7213/(1.0+1.079/4096.0)*9444732965739290427392.0 /
             CAST((4096 - used)*562949953421312 + s_present AS DOUBLE) AS raw,
           4096 - used AS v
         FROM ag)
       SELECT $keyCol,
         CAST(floor((CASE WHEN raw <= 10240.0 AND v > 0
                     THEN 4096.0*ln(4096.0/v) ELSE raw END)*100 + 0.5)
           AS BIGINT) AS $estCol
       FROM es"""
}
