package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class CorpusCurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation funnel: monotone survival, no dups in output") {
    val docs = Tables(spark, sf, "documents")
    val (curated, counts) = CorpusCuration.curate(spark, docs,
      CorpusCuration.Params(langs = Set("en", "und"), minQualityE4 = 0L,
        minChars = 1, minJaccard = 0.5))
    val byStage = counts.as[(String, Long)].collect().toMap
    assert(byStage("0_input") === 500L)
    assert(byStage("1_quality_filtered") <= byStage("0_input"))
    assert(byStage("2_exact_deduped") <= byStage("1_quality_filtered"))
    assert(byStage("3_near_dup_removed") <= byStage("2_exact_deduped"))
    assert(byStage("3_near_dup_removed") > 0)
    // canonical fingerprints are unique after curation
    val n = curated.count()
    assert(curated.select(graft.functions.TextFunctions.fingerprint(col("text")))
      .distinct().count() === n)
  }

  test("near-dup removal keeps the smaller id of a planted dup pair") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "alpha beta gamma delta epsilon zeta eta theta iota kapPa"), // near dup
      (30L, "unrelated content entirely different from everything else here")
    ).toDF("doc_id", "text")
    val out = CorpusCuration.nearDupRemoved(docs, "doc_id", minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(10L) && !out.contains(20L) && out.contains(30L))
  }
}
