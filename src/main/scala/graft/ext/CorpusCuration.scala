package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup

/** The composed training-data curation pipeline — the operators of
  * graft.operators/graft.functions chained into the shape an LLM data run
  * actually uses:
  *
  *   1. language-ID + quality scoring (row-local expressions, one scan)
  *   2. filter: target languages, quality floor, length band
  *   3. exact dedup on the canonical fingerprint (keep min id)
  *   4. near-dup removal via MinHash→LSH→Jaccard (keep the smaller id of
  *      each surviving pair)
  *   5. curated output with per-stage survival counts
  *
  * Every stage is declarative; the only shuffles are the exact-dedup
  * groupBy (uniform 128-bit keys) and the LSH candidate join. At 100 TB
  * the stage order matters: cheap row-local filters run FIRST so the
  * expensive near-dup stage sees only the quality-filtered survivors.
  */
object CorpusCuration {

  case class Params(
      langs: Set[String] = Set("en"),
      minQualityE4: Long = 4000L,
      minChars: Int = 50,
      maxChars: Int = 100000,
      minJaccard: Double = 0.5)

  /** Stage 1+2: annotate and filter. */
  def qualityFilter(docs: DataFrame, p: Params): DataFrame =
    docs
      .withColumn("pred_lang", langId(col("text")))
      .withColumn("quality_e4", fixedPoint(qualityScore(col("text")), 4))
      .filter(col("pred_lang").isin(p.langs.toSeq: _*) &&
        col("quality_e4") >= p.minQualityE4 &&
        length(col("text")).between(p.minChars, p.maxChars))

  /** Stage 3: exact dedup — keep each fingerprint's min doc_id. */
  def exactDeduped(docs: DataFrame, idCol: String): DataFrame =
    docs.join(
      Dedup.exactDedup(docs, idCol, "text").select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Stage 4: near-dup removal — drop the larger id of every verified pair
    * (transitive chains collapse toward the smallest id over iterations;
    * one pass is the standard curation tradeoff). */
  def nearDupRemoved(docs: DataFrame, idCol: String, minJaccard: Double): DataFrame = {
    val losers = Dedup.nearDupPairs(docs, idCol, "text", minJaccard = minJaccard)
      .select(col("b_id").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** The full pipeline. Returns (curated docs, per-stage counts). */
  def curate(spark: SparkSession, docs: DataFrame, p: Params = Params()):
      (DataFrame, DataFrame) = {
    import spark.implicits._
    val filtered = qualityFilter(docs, p)
    val exact = exactDeduped(filtered, "doc_id")
    val curated = nearDupRemoved(exact, "doc_id", p.minJaccard)
    // counts are actions — the pipeline is materialized once per stage here
    // because the funnel report is part of the contract (curation runs
    // always log survival); callers wanting laziness use the stages directly
    val counts = Seq(
      ("0_input", docs.count()),
      ("1_quality_filtered", filtered.count()),
      ("2_exact_deduped", exact.count()),
      ("3_near_dup_removed", curated.count()))
      .toDF("stage", "n_docs")
    (curated, counts)
  }
}
