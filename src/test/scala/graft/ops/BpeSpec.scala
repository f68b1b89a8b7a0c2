package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Bpe

/** Merge-table BPE: deterministic training and the codegen'd encode. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges finds frequency-ranked merges with lexicographic ties") {
    val corpus = Seq("aaab aaab aaab").toDF("text")
    val merges = Bpe.learnMerges(corpus, "text", nMerges = 3)
    // (a,a) appears 6×; then (a,b) ties (aa,a) at 3 and wins lexicographically;
    // then (aa,ab) closes the word
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("bpeTokenCount applies merges lowest-rank-first per word") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val out = Seq("low lower", "", "x").toDF("text")
      .select(Bpe.bpeTokenCount(col("text"), merges).as("n"))
      .as[Long].collect()
    // "low" → [low] = 1; "lower" → [low,e,r] = 3; "" → 0; "x" → 1
    assert(out.toSeq === Seq(4L, 0L, 1L))
  }

  test("learned merges compress the fixture corpus between ws and char counts") {
    val docs = Tables(spark, sf, "documents").limit(100)
    val merges = Bpe.learnMerges(docs, "text", nMerges = 40)
    assert(merges.size === 40)
    val stats = docs.select(
      sum(Bpe.bpeTokenCount(col("text"), merges)).as("bpe"),
      sum(size(graft.functions.TextFunctions.wsTokens(lower(col("text"))))
        .cast("long")).as("ws"),
      sum(length(regexp_replace(col("text"), "\\s+", "")).cast("long")).as("chars"))
      .head()
    val (bpe, ws, chars) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    assert(bpe < chars, s"bpe $bpe should compress below char count $chars")
    assert(bpe >= ws, s"bpe $bpe can never go below the word count $ws")
    // training is deterministic end to end
    assert(Bpe.learnMerges(docs, "text", nMerges = 40) === merges)
  }
}
