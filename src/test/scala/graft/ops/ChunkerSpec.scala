package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Chunker

/** Token-window chunking and passage-level dup stats on hand fixtures. */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("windows cover every token, overlap by size-stride, clip at the end") {
    // 7 tokens, size 4, stride 3 -> starts 0,3,6: [a b c d][d e f g][g]
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunker.tokenChunks(docs, "doc_id", "text", size = 4, stride = 3)
      .orderBy("chunk_idx").as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((1L, 0L, "a b c d"), (1L, 1L, "d e f g"), (1L, 2L, "g")))
  }

  test("a doc shorter than one window is a single chunk; blank docs vanish") {
    val docs = Seq((1L, "x y"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val got = Chunker.tokenChunks(docs, "doc_id", "text", size = 8, stride = 8)
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((1L, 0L, "x y")))
  }

  test("stride > size is rejected (it would drop tokens)") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.tokenChunks(docs, "doc_id", "text", size = 2, stride = 3)
    }
  }

  test("passage dup stats count cross-doc verbatim windows only") {
    // size 2, non-overlapping: doc1 = [a b][c d], doc2 = [a b][x y],
    // doc3 = [p q]. 'a b' is shared; everything else is unique.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "p q")).toDF("doc_id", "text")
    val got = Chunker.passageDupStats(docs, "doc_id", "text", size = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 1L, 5000L), (2L, 2L, 1L, 5000L), (3L, 1L, 0L, 0L)))
  }

  test("a window repeated INSIDE one doc is not a duplicate") {
    val docs = Seq((1L, "a b a b"), (2L, "z z")).toDF("doc_id", "text")
    val got = Chunker.passageDupStats(docs, "doc_id", "text", size = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // doc1's two windows are both 'a b' -> ONE distinct passage, unshared
    assert(got === Seq((1L, 1L, 0L, 0L), (2L, 1L, 0L, 0L)))
  }
}
