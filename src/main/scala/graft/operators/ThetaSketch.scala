package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.stableHash60

/** KMV/theta distinct-count sketches with set-operation estimators —
  * union, intersection, and per-group distincts across corpus slices
  * (which sources share users/tokens/urls, how big is the overlap) from
  * k-bounded state instead of a full distinct join.
  *
  * Determinism/portability: hashes are md5-derived 60-bit ints
  * (stableHash60 — engine-portable, unlike engine-internal hashes), the
  * k minima of a distinct set are order-independent, and every estimator
  * below is integer-or-single-division arithmetic the DuckDB oracle
  * replays bit-for-bit: (k-1)·2^60 is exact in a double (≤ 8 mantissa
  * bits · power of two), the divisor is one long→double conversion, and
  * floor of the single IEEE division is the published estimate.
  *
  * Scale shape: one scan → map-side k-capped partials (KmvMinKAgg) →
  * one shuffle of ≤ k longs per group per partition → per-group arrays
  * of ≤ k ints. Set operations then explode only sketch rows (groups·k,
  * not data-sized) and join on hash — the theta-sketch contract: cost
  * proportional to sketch size, error ~1/√k, regardless of data size.
  */
object ThetaSketch {

  /** Hash domain: stableHash60 ∈ [0, 2^60). */
  val HMax: Long = 1L << 60

  /** Raw per-group KMV buffer: (group, hs ascending array ≤ k). The
    * streaming surface (StreamingSketch.kmvSketchStream) maintains exactly
    * this frame as its state; `withMeta` turns any snapshot of it into the
    * estimator-ready sketch. */
  def rawSketch(df: DataFrame, groupCol: String, valueCol: String,
                k: Int, salt: String = "theta"): DataFrame =
    df.select(col(groupCol),
        stableHash60(concat(lit(salt + ":"), col(valueCol).cast("string"))).as("h"))
      // NULL values hash to NULL (concat/md5 propagate) and count nothing:
      // the explicit filter makes that contract engine-independent — the
      // oracle replay filters h IS NOT NULL identically, so a nullable
      // value column can never make an unsaturated group's n differ by 1
      .filter(col("h").isNotNull)
      .groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graft.KmvMinKAgg(col("h"), k).as("hs"))

  /** Attach (n = |hs|, theta = k-th min or 2^60) to a (group, hs) frame. */
  def withMeta(raw: DataFrame, groupCol: String, k: Int): DataFrame =
    raw.select(col(groupCol), col("hs"),
      size(col("hs")).cast("long").as("n"),
      when(size(col("hs")) < k, lit(HMax))
        .otherwise(element_at(col("hs"), k)).as("theta"))

  /** Per-group KMV sketch of `valueCol`'s distinct values:
    * (group, hs ascending array ≤ k, n = |hs|, theta = k-th min or 2^60).
    * `salt` decorrelates sketches built over the same column. */
  def sketch(df: DataFrame, groupCol: String, valueCol: String,
             k: Int, salt: String = "theta"): DataFrame =
    withMeta(rawSketch(df, groupCol, valueCol, k, salt), groupCol, k)

  /** The KMV distinct estimate from (n, theta): exact n below saturation,
    * else floor((k-1)·2^60 / theta) — single IEEE division, engine-exact. */
  def estimate(n: Column, theta: Column, k: Int): Column =
    when(n < k, n)
      .otherwise(floor(lit((k - 1).toDouble * HMax.toDouble) / theta.cast("double"))
        .cast("long"))

  /** Distinct-count estimate per group. */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
                       k: Int, salt: String = "theta"): DataFrame =
    sketch(df, groupCol, valueCol, k, salt)
      .select(col(groupCol), col("n").as("n_hashes"),
        estimate(col("n"), col("theta"), k).as("est_distinct"))

  /** Pairwise set-operation estimates between every two groups' sketches
    * (grp_a < grp_b): intersection and union distinct-count estimates.
    * The sketch frame is consumed several times (meta, explode, census);
    * callers should persist/checkpoint it — it is groups·(k+3) values —
    * or the lineage re-aggregates the source per consumer.
    *
    * Theta algebra: at the pair's common threshold θ = min(θa, θb), each
    * sketch is a uniform sample of its set at rate θ/2^60, so
    * |A∩B| ≈ |{h ∈ hsA ∩ hsB : h < θ}| · 2^60/θ, and the union estimate
    * is inclusion-exclusion over the same θ. Only sketch rows move:
    * groups·k exploded hashes, one self-join on hash. */
  def pairwiseOps(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    val meta = sketches.select(col(groupCol).as("g"), col("n"), col("theta"))
    val hs = sketches.select(col(groupCol).as("g"), explode(col("hs")).as("h"))
    val pairs = meta.select(col("g").as("grp_a"), col("theta").as("ta"))
      .join(meta.select(col("g").as("grp_b"), col("theta").as("tb")),
        col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"), least(col("ta"), col("tb")).as("theta_ab"))
    val common = hs.select(col("g").as("grp_a"), col("h"))
      .join(hs.select(col("g").as("grp_b"), col("h")), Seq("h"))
      .filter(col("grp_a") < col("grp_b"))
      .join(pairs.select(col("grp_a"), col("grp_b"), col("theta_ab")), Seq("grp_a", "grp_b"))
      .filter(col("h") < col("theta_ab"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    // |A|+|B| counted below the COMMON threshold — the same uniform sample
    // the intersection is counted in, so inclusion-exclusion
    // (nA@θ + nB@θ − n_common, scaled once) stays internally consistent.
    // The pair table is exploded to one row per (pair, member group) so
    // the sketch join is an equi-join, not an OR-condition nested loop.
    val pairSides = pairs.select(col("grp_a"), col("grp_b"), col("theta_ab"),
      explode(array(col("grp_a"), col("grp_b"))).as("g"))
    val below = hs.join(pairSides, Seq("g"))
      .filter(col("h") < col("theta_ab"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_below"))
    pairs.join(common, Seq("grp_a", "grp_b"), "left")
      .join(below, Seq("grp_a", "grp_b"), "left")
      .select(col("grp_a"), col("grp_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        scaled(coalesce(col("n_common"), lit(0L)), col("theta_ab")).as("est_intersect"),
        scaled(coalesce(col("n_below"), lit(0L)) - coalesce(col("n_common"), lit(0L)),
          col("theta_ab")).as("est_union"))
  }

  /** count·2^60/θ, floored — the theta scale-up, engine-exact (count < 2^9
    * keeps count·2^60 inside exact-double range). */
  private def scaled(count: Column, theta: Column): Column =
    floor(count.cast("double") * lit(HMax.toDouble) / theta.cast("double")).cast("long")
}
