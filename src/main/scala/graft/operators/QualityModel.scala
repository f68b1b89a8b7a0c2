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
}
