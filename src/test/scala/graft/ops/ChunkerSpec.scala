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

  test("repeated windows are dropped after their first occurrence") {
    // size 2: doc1 windows [a b][c d][a b][e] -> kept [a b][c d][e]
    val docs = Seq((1L, "a b c d a b e"), (2L, "x y"), (3L, "")).toDF("doc_id", "text")
    val got = Chunker.dropRepeatedPassages(docs, "doc_id", "text", size = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === Seq(
      (1L, 4L, 3L, h("a b c d e")),
      (2L, 1L, 1L, h("x y")),
      (3L, 0L, 0L, h(""))))
  }

  test("a doc with no repeats is reconstructed verbatim") {
    val docs = Seq((1L, "p q r s t u")).toDF("doc_id", "text")
    val got = Chunker.dropRepeatedPassages(docs, "doc_id", "text", size = 2)
      .as[(Long, Long, Long, String)].head()
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === ((1L, 3L, 3L, h("p q r s t u"))))
  }

  test("packing fills every sequence to budget except a shard's last") {
    // shard s: docs of 3,4,2 tokens, budget 4 -> stream of 9 tokens ->
    // seqs [0,4)=4, [4,8)=4, [8,9)=1. doc2 (tokens 3..6) spans seqs 0+1.
    val docs = Seq(
      ("s", 1L, "a b c"), ("s", 2L, "d e f g"), ("s", 3L, "h i"),
      ("t", 9L, "x y")).toDF("source", "doc_id", "text")
    val got = Chunker.packSequences(docs, "doc_id", "text", "source", budget = 4)
      .orderBy("source", "seq_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // (shard, seq, n_docs, n_tokens, n_split_docs)
      ("s", 0L, 2L, 4L, 1L),  // doc1 whole + doc2's first token
      ("s", 1L, 2L, 4L, 2L),  // doc2's tail + doc3's first token
      ("s", 2L, 1L, 1L, 1L),  // doc3's last token
      ("t", 0L, 1L, 2L, 0L))) // underfull last sequence of shard t
  }

  test("packing conserves tokens and never overfills") {
    val docs = Seq(("s", 1L, "a b c d e"), ("s", 2L, "f"), ("s", 3L, "g h i"),
      ("", 4L, "")).toDF("source", "doc_id", "text")
    val seqs = Chunker.packSequences(docs, "doc_id", "text", "source", budget = 3)
    val total = seqs.agg(sum("n_tokens")).as[Long].head()
    assert(total == 9L)
    assert(seqs.filter(col("n_tokens") > 3).isEmpty)
  }

  test("length-bucketed batches group similar lengths; waste is to batch max") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // token counts: 3, 5 (bucket 0), 12, 15, 18 (bucket 1), 25 (bucket 2)
    val docs = Seq(3, 5, 12, 15, 18, 25).zipWithIndex
      .map { case (n, i) => (i.toLong, words(n)) }.toDF("doc_id", "text")
      .unionByName(Seq((99L, "")).toDF("doc_id", "text")) // blank drops
    val got = Chunker.lengthBucketedBatches(docs, "doc_id", "text",
      bucketWidth = 10L, batchSize = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 0L, 3L), (0L, 0L, 1L, 5L),          // bucket 0, one batch
      (1L, 0L, 2L, 12L), (1L, 0L, 3L, 15L),        // bucket 1, batch 0
      (1L, 1L, 4L, 18L),                           // bucket 1, underfull
      (2L, 0L, 5L, 25L)))                          // bucket 2 singleton
    // padding waste of bucket-1 batch 0: both rows pad to 15 → 3 wasted
    val waste = Chunker.lengthBucketedBatches(docs, "doc_id", "text", 10L, 2)
      .groupBy("bucket", "batch_no")
      .agg((count(lit(1)) * max("n_tok") - sum("n_tok")).as("w"))
      .filter(col("bucket") === 1 && col("batch_no") === 0)
      .select("w").as[Long].head()
    assert(waste === 3L)
  }
}
