package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Blocklist

/** Blocklist phrase matching: consecutive-sequence semantics (not
  * bag-of-words, not substring), normalization, counts, and the clean()
  * anti-join. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "quick the brown fox"),          // has both words, wrong order
    (3L, "THE   Quick brown fox"),        // case + whitespace normalize
    (4L, "raindrop tablet drop tablets"), // substrings must NOT match
    (5L, "drop table drop table users"),  // two hits of the same phrase
    (6L, "")
  ).toDF("doc_id", "text")

  private def phrases = Seq("the quick", "drop table", "quick brown fox")
    .toDF("phrase")

  test("matches only consecutive normalized word sequences, with counts") {
    val m = Blocklist.matches(docs, phrases, "doc_id", "text")
      .orderBy("doc_id", "phrase")
      .as[(Long, String, Long)].collect().toSeq
    assert(m === Seq(
      (1L, "quick brown fox", 1L),
      (1L, "the quick", 1L),
      (3L, "quick brown fox", 1L),
      (3L, "the quick", 1L),
      (5L, "drop table", 2L)))
  }

  test("bag-of-words and substring lookalikes do not match") {
    val ids = Blocklist.matches(docs, phrases, "doc_id", "text")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(!ids.contains(2L)) // words present, order wrong
    assert(!ids.contains(4L)) // "drop table" inside "raindrop tablet"
  }

  test("clean() keeps exactly the unmatched docs") {
    val kept = Blocklist.clean(docs, phrases, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L, 6L))
  }

  test("phrase list with duplicate normalized entries counts each match once") {
    val dupPhrases = Seq("Drop  Table", "drop table").toDF("phrase")
    val m = Blocklist.matches(docs, dupPhrases, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSeq
    assert(m === Seq((5L, "drop table", 2L)))
  }

  test("phrases outside 2..maxLen words fail loudly, never silently skip") {
    // a 5-word phrase exceeds the default maxLen=4: silently generating no
    // gram for it would be a policy-filter bypass
    val tooLong = Seq("one two three four five").toDF("phrase")
    val eLong = intercept[IllegalArgumentException] {
      Blocklist.matches(docs, tooLong, "doc_id", "text")
    }
    assert(eLong.getMessage.contains("one two three four five"))
    // single-word phrases belong on the plain token path, not the n-gram one
    val single = Seq("drop").toDF("phrase")
    intercept[IllegalArgumentException] {
      Blocklist.clean(docs, single, "doc_id", "text")
    }
    // raising maxLen admits the long phrase
    val m = Blocklist.matches(
      Seq((9L, "say one two three four five end")).toDF("doc_id", "text"),
      tooLong, "doc_id", "text", maxLen = 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(m === Seq((9L, "one two three four five", 1L)))
  }
}
