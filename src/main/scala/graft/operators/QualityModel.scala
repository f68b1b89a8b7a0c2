package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Model-based quality filtering: a frozen linear classifier over cheap,
  * engine-portable text features — the deterministic stand-in for the
  * fastText/logreg quality models production corpora are filtered with
  * (e.g. the CCNet/GPT-3 "looks like reference text" filter). Training
  * happens offline; what a 100 TB pipeline runs per document is exactly
  * this: a handful of counters and one dot product, so the scoring pass
  * is a single codegen'd scan — no shuffle, no UDF, no model server.
  *
  * Determinism contract: every feature is a ratio of integer counts and
  * the score is the raw LOGIT (w·x + b), not the sigmoid — `exp` is a
  * libm call whose low bits differ across engines, while the logit is
  * pure +/×/÷ over integer-derived doubles, bit-identical everywhere
  * (same IEEE ops in the same order; see TextFunctions.fixedPoint).
  * Thresholding at probability p is thresholding the logit at
  * ln(p/(1-p)), so no expressiveness is lost: `keep` = logit > 0 is
  * exactly p > 0.5.
  */
object QualityModel {

  /** Frozen model weights. The defaults are hand-set to the fixture's
    * quality signal (length-saturated, punctuation/digit-noise-penalized,
    * stopword-naturalness-rewarded) — a deployment would paste its
    * offline-trained coefficients here (or load them as literals from a
    * model registry) and the scoring plan is unchanged. */
  final case class Weights(
      bias: Double = -1.2,
      wLen: Double = 2.4, // length saturation: tokens/200 capped at 1
      wPunct: Double = -3.5, // punctuation density (noise)
      wStop: Double = 1.6, // stopword naturalness (capped)
      wDigit: Double = -2.0, // digit density (tables/boilerplate)
      wCharsPerTok: Double = -0.8, // very long "words" = markup/URLs
      wNonAscii: Double = -0.5) // non-ASCII presence flag

  val Default: Weights = Weights()

  /** Count of ASCII digits. */
  def digitCount(c: Column): Column = regexp_count(c, lit("[0-9]"))

  /** The feature vector, each in [0,1]: (fLen, fPunct, fStop, fDigit,
    * fCharsPerTok, fNonAscii). Exposed for tests and for the datasheet
    * surface; all ratios guard their zero denominators. */
  def features(c: Column): Seq[Column] = {
    val nTok = tokenCount(c).cast("double")
    val nChr = length(c).cast("double")
    Seq(
      least(nTok / 200.0, lit(1.0)),
      when(nChr > 0, punctCount(c) / nChr).otherwise(lit(0.0)),
      least(when(nTok > 0, stopwordCount(c) * 5.0 / nTok).otherwise(lit(0.0)), lit(1.0)),
      when(nChr > 0, digitCount(c) / nChr).otherwise(lit(0.0)),
      least(when(nTok > 0, nChr / (nTok * 20.0)).otherwise(lit(0.0)), lit(1.0)),
      when(nonAsciiCount(c) > 0, lit(1.0)).otherwise(lit(0.0)))
  }

  /** The raw classifier logit w·x + b, accumulated strictly left-to-right
    * (bias first) so any engine writing the same expression text gets the
    * same double. */
  def logit(c: Column, w: Weights = Default): Column = {
    val fs = features(c)
    val ws = Seq(w.wLen, w.wPunct, w.wStop, w.wDigit, w.wCharsPerTok, w.wNonAscii)
    ws.zip(fs).foldLeft(lit(w.bias): Column) { case (acc, (wi, fi)) => acc + lit(wi) * fi }
  }

  /** Fixed-point logit (×10^4) for cross-engine comparison. */
  def logitE4(c: Column, w: Weights = Default): Column = fixedPoint(logit(c, w), 4)

  /** Keep decision at p > 0.5 (logit > 0). For another operating point t,
    * compare the logit against ln(t/(1-t)). */
  def keep(c: Column, w: Weights = Default): Column = logit(c, w) > 0.0

  // ---- training: the missing half of the frozen-weights story. A real
  // deployment fits the weights offline; this is that fit as a
  // DETERMINISTIC distributed job any engine can replay bit-for-bit:
  // fixed-iteration batch gradient descent over e4-quantized integer
  // features with a HARD sigmoid (clamp(0.5 + z/4, 0, 1) — the standard
  // piecewise-linear logistic surrogate of quantized training). Every
  // intermediate is an integer exactly representable in a double
  // (features ≤ 1e4, per-row products ≤ 1e8, corpus sums ≪ 2^53), and
  // the only divisions are floor()-quantized — so a SQL oracle unrolling
  // the same T iterations lands on the SAME weights, something a libm
  // exp() could never promise across engines (the logit-not-sigmoid
  // scoring contract above, applied to training).

  /** The e4-quantized integer feature vector — the same six signals as
    * [[features]], each as floor(ratio·10⁴ + 0.5) ∈ [0, 10000]. Integer
    * features make every training step exact; scoring with learned
    * weights stays one codegen'd scan. */
  def featuresE4(c: Column): Seq[Column] = {
    val nTok = tokenCount(c).cast("long")
    val nChr = length(c).cast("long")
    Seq(
      least(nTok * 50L, lit(10000L)),
      when(nChr > 0, floor(punctCount(c) * 10000.0 / nChr + 0.5)).otherwise(0L)
        .cast("long"),
      least(when(nTok > 0, floor(stopwordCount(c) * 50000.0 / nTok + 0.5))
        .otherwise(0L).cast("long"), lit(10000L)),
      when(nChr > 0, floor(digitCount(c) * 10000.0 / nChr + 0.5)).otherwise(0L)
        .cast("long"),
      least(when(nTok > 0, floor(nChr * 500.0 / nTok + 0.5)).otherwise(0L)
        .cast("long"), lit(10000L)),
      when(nonAsciiCount(c) > 0, lit(10000L)).otherwise(lit(0L)))
  }

  /** Learned weights at e4 scale (real weight ≈ value / 10⁴) plus the
    * integer per-feature means the features were centered by — scoring
    * must subtract the SAME means, so they are part of the model. */
  final case class TrainedWeights(bias: Long, w: Seq[Long], mu: Seq[Long])

  /** Hard sigmoid at e4 scale over an e8-scale logit: clamp(5000 + ⌊z/4⌋).
    * Pure integer — the cross-engine-safe logistic surrogate. */
  private def hardSigmoidE4(zE8: Column): Column =
    greatest(lit(0L), least(lit(10000L),
      lit(5000L) + floor(zE8 / 40000.0).cast("long")))

  /** The e8-scale logit of a document under trained weights:
    * bias·10⁴ + Σ wⱼ·(fⱼ − μⱼ) (weights and centered features both e4).
    * Row-local, codegen'd — the q123 scoring shape with learned instead
    * of pasted coefficients. */
  def trainedScoreE8(c: Column, tw: TrainedWeights): Column =
    featuresE4(c).zip(tw.w.zip(tw.mu))
      .foldLeft(lit(tw.bias) * lit(10000L): Column) {
        case (acc, (f, (wi, mi))) => acc + lit(wi) * (f - lit(mi))
      }

  /** Fit the linear quality classifier by `iters` rounds of full-batch
    * gradient descent against `label` (0/1). Features are CENTERED by
    * their integer corpus means first (μⱼ = ⌊Σfⱼ/n⌋ — one aggregate;
    * uncentered, the shared mass direction dominates every step and GD
    * saturates at the majority class before it discriminates — measured:
    * keep-all at any depth uncentered vs 0.88–0.91 label agreement
    * centered). Per round, one aggregate scan computes the seven gradient
    * sums Σ (σ̂(z) − 10⁴·y)·(fⱼ−μⱼ) with the CURRENT weights folded in as
    * literals, seven longs come back to the driver (bounded control-plane
    * read, the kmeans pattern), and the update is
    * wⱼ ← wⱼ − ⌊gⱼ·lr/(n·10⁴) + ½⌋. Deterministic: zero init, fixed
    * iteration count, integer arithmetic throughout, no RNG, no order
    * sensitivity (sums of exact ints ≪ 2⁵³). O(iters · corpus) with the
    * centered feature frame persisted across rounds — at 100 TB each
    * round is one map-side-combinable aggregate. */
  def trainHardSigmoid(df: org.apache.spark.sql.DataFrame, textCol: String,
                       label: Column, iters: Int = 16,
                       lr: Long = 16L): TrainedWeights =
    trainHardSigmoidTrajectory(df, textCol, label, iters, lr).last

  /** The full weight TRAJECTORY of the fit — element t is the model after
    * t+1 iterations. GD iterations form a chain (the t-iteration model IS
    * the prefix of the T-iteration run, exactly like BPE's merge-prefix
    * property), so a training curve at several depths costs ONE training
    * run, not one per point — q168 reads agreement at 4/8/16 iterations
    * from a single 16-round fit. */
  def trainHardSigmoidTrajectory(df: org.apache.spark.sql.DataFrame,
                                 textCol: String, label: Column,
                                 iters: Int = 16,
                                 lr: Long = 16L): Seq[TrainedWeights] = {
    val (traj, feats) =
      trainHardSigmoidTrajectoryKeepFeatures(df, textCol, label, Nil, iters, lr)
    feats.unpersist()
    traj
  }

  /** [[trainHardSigmoidTrajectory]], returning BOTH the trajectory and the
    * PERSISTED quantized feature frame it was fitted on (`passthrough`
    * columns ++ f0..f5 ++ y) — the caller scores against the frame via
    * [[trainedScoreE8FromFeatures]] instead of re-running the regex
    * feature extraction over the corpus text, then MUST `unpersist()` it.
    * The training loop itself pays exactly ONE extraction pass: features
    * are persisted RAW (uncentered) and the mean-centering is folded into
    * each iteration's aggregate algebraically —
    * z = bias·10⁴ + Σwᵢ(fᵢ−μᵢ) = (bias·10⁴ − Σwᵢμᵢ) + Σwᵢfᵢ and
    * Σ err·(fⱼ−μⱼ) = Σ err·fⱼ − μⱼ·Σ err — exact integer identities, so
    * the trajectory is bit-identical to the centered-frame formulation
    * the oracle unrolls. */
  def trainHardSigmoidTrajectoryKeepFeatures(
      df: org.apache.spark.sql.DataFrame, textCol: String, label: Column,
      passthrough: Seq[String], iters: Int = 16,
      lr: Long = 16L): (Seq[TrainedWeights], org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    require(iters >= 1, "iters must be >= 1")
    require(lr >= 1, "lr must be >= 1")
    val nf = 6
    val raw = df.select(
      passthrough.map(col) ++
        featuresE4(col(textCol)).zipWithIndex.map { case (f, i) => f.as(s"f$i") } :+
        label.cast("long").as("y"): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val muRow = raw.agg(
      count(lit(1)).as("n"),
      (0 until nf).map(i => floor(sum(col(s"f$i")) / count(lit(1))).cast("long")
        .as(s"m$i")): _*).head()
    val n = muRow.getLong(0)
    require(n > 0, "trainHardSigmoid: empty corpus")
    val mu = Array.tabulate(nf)(i => muRow.getLong(i + 1))
    var bias = 0L
    var w = Array.fill(nf)(0L)
    val out = Seq.newBuilder[TrainedWeights]
    for (_ <- 1 to iters) {
      // z over the RAW features, centering folded into the constant term
      val c0 = bias * 10000L - w.zip(mu).map { case (wi, mi) => wi * mi }.sum
      val zE8 = w.zipWithIndex.foldLeft(lit(c0): Column) {
        case (acc, (wi, i)) => acc + lit(wi) * col(s"f$i")
      }
      val err = hardSigmoidE4(zE8) - lit(10000L) * col("y")
      val aggs = (0 until nf).map(i => sum(err * col(s"f$i"))) :+ sum(err)
      val row = raw.agg(aggs.head, aggs.tail: _*).head()
      val sErr = row.getLong(nf)
      def step(cur: Long, g: Long): Long =
        cur - math.floor(g * lr / (n * 10000.0) + 0.5).toLong
      // recover the centered gradient exactly: Σerr·(fⱼ−μⱼ) = Σerr·fⱼ − μⱼ·Σerr
      w = Array.tabulate(nf)(i => step(w(i), row.getLong(i) - mu(i) * sErr))
      bias = step(bias, sErr * 10000L)
      out += TrainedWeights(bias, w.toSeq, mu.toSeq)
    }
    (out.result(), raw)
  }

  /** The trained model's e4 hard-sigmoid probability over the persisted
    * feature frame — the confidence the calibration audit (q200) bins:
    * pure integer clamp of the e8 logit, identical in any engine. */
  def trainedProbE4FromFeatures(tw: TrainedWeights): Column =
    hardSigmoidE4(trainedScoreE8FromFeatures(tw))

  /** The trained-model logit over a frame that already carries the
    * quantized feature columns f0..f5 (the frame
    * [[trainHardSigmoidTrajectoryKeepFeatures]] returns) — the same
    * integers as [[trainedScoreE8]] re-deriving the features from text,
    * without the regex extraction scan. */
  def trainedScoreE8FromFeatures(tw: TrainedWeights): Column =
    tw.w.zip(tw.mu).zipWithIndex
      .foldLeft(lit(tw.bias) * lit(10000L): Column) {
        case (acc, ((wi, mi), i)) => acc + lit(wi) * (col(s"f$i") - lit(mi))
      }
}
