package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.{Decontaminate, Search}

/** BM25 retrieval, decontamination, Gopher stats, PII redaction — math
  * pinned on tiny hand-computed fixtures. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks the rare-term doc above common-term docs") {
    val docs = Seq(
      (1L, "dup dup alpha"),        // rare term twice
      (2L, "table table table table table alpha"),
      (3L, "alpha beta gamma"),
      (4L, "table join alpha")).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("dup", "table"), 4)
      .as[(Long, Long)].collect()
    assert(got.map(_._1).head === 1L, s"rare-term doc must rank first: ${got.toSeq}")
    assert(got.length === 4 && got.map(_._2).toSeq === got.map(_._2).sorted.reverse.toSeq)
  }

  test("bm25 score matches the hand formula on a one-doc corpus") {
    // N=1, term df=1, tf=2, dl=3 → idf=(1-1+0.5)/(1+0.5)=1/3
    // w = idf * (2*2.2)/(2 + 1.2*(0.25+0.75*3/3)) = (1/3)*4.4/3.2
    val docs = Seq((7L, "x y x")).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("x"), 1)
      .as[(Long, Long)].head()
    val expected = math.floor((1.0 / 3.0) * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0)) * 10000 + 0.5).toLong
    assert(got === ((7L, expected)))
  }

  test("bm25 on an all-blank corpus scores 0, not NULL (sum_dl=0 NaN guard)") {
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("x"), 5)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 0L)))
  }

  test("decontamination flags exactly the docs sharing a word 4-gram") {
    val eval = Seq((100L, "one two three four five")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "zzz one two three four yyy"), // shares 'one two three four'
      (2L, "two three four six"),         // no shared 4-gram
      (3L, "one two three")).toDF("doc_id", "text") // too short to match
    val got = Decontaminate.contaminated(corpus, eval, "doc_id", "text", 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L))
    val kept = Decontaminate.clean(corpus, eval, "doc_id", "text", 4)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 3L))
  }

  test("semantic decontamination flags embedding matches, spares the rest") {
    import graft.operators.Similarity
    val planes = Similarity.hyperplanes(spark, 8, 4)
    // two identical eval vectors; corpus 1 matches both exactly (cos = 1),
    // 2 is orthogonal and 3 opposite — even if a negative lands in the
    // same LSH bucket, the exact cosine filter rejects it (no flakiness)
    val eval = Seq(
      (100L, Array(1f, 0f, 0f, 0f)), (101L, Array(1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(-1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Decontaminate.semanticContaminated(corpus, eval, planes, 2500L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 10000L))) // both eval hits, cos = 1.0000
  }

  test("fingerprint decontamination flags an embedded verbatim span") {
    // corpus doc 1 CONTAINS eval doc 100's span verbatim, surrounded by
    // unrelated text; doc 2 shares nothing
    val span = "the quick brown fox jumps over the lazy dog tonight"
    val eval = Seq((100L, span)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"unrelated prefix words here $span and an unrelated suffix too"),
      (2L, "completely different content with no overlap whatsoever okay"))
      .toDF("doc_id", "text")
    val got = Decontaminate.fingerprintContaminated(corpus, eval,
      "doc_id", "text", minShared = 3L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(1L), s"got $got")
    assert(got.head._2 === 1L && got.head._3 >= 3L)
  }

  test("gopher stats on a fully repeated doc") {
    val df = Seq((1L, "aa aa aa aa")).toDF("doc_id", "text")
    val r = df.select(
      TextFunctions.dupTokenFracE4(col("text")),
      TextFunctions.topTokenFracE4(col("text")),
      TextFunctions.meanTokenLenE4(col("text"))).as[(Long, Long, Long)].head()
    assert(r === ((7500L, 10000L, 20000L)))
  }

  test("pii redaction replaces email, ip, and phone but not plain text") {
    val df = Seq((1L, "write bob.smith+x@corp.example.org or 192.168.0.1 or +1-555-0199 v1.2 end"))
      .toDF("doc_id", "text")
    val got = df.select(TextFunctions.redactPii(col("text"))).as[String].head()
    assert(got === "write <EMAIL> or <IP> or <PHONE> v1.2 end")
  }

  test("moreLikeThis ranks rare-token overlap above common-token overlap") {
    val docs = Seq(
      (0L, "zebra zebra common"),       // the query doc (rare token ×2)
      (1L, "zebra other words here"),   // shares the rare token
      (2L, "common other words here"),  // shares only the common token
      (3L, "common nothing shared at")) // ditto (ties with 2, id-ordered)
      .toDF("doc_id", "text")
    val got = Search.moreLikeThis(docs, "doc_id", "text", queryId = 0L, k = 10)
      .as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L), s"got ${got.toSeq}")
    assert(got(0)._2 > got(1)._2 && got(1)._2 === got(2)._2)
  }

  test("edge inputs: blank text, empty corpus, PII-free text") {
    val blank = Seq((1L, ""), (2L, "   "), (3L, "one two three")).toDF("doc_id", "text")
    // blank docs: no n-grams, zero stats — never NaN/null surprises
    val grams = blank.select(col("doc_id"),
      size(TextFunctions.wordNgrams(col("text"), 2)).as("n")).as[(Long, Int)]
      .collect().toMap
    assert(grams === Map(1L -> 0, 2L -> 0, 3L -> 2))
    val stats = blank.filter(col("doc_id") === 1L).select(
      TextFunctions.dupTokenFracE4(col("text")),
      TextFunctions.topTokenFracE4(col("text")),
      TextFunctions.meanTokenLenE4(col("text"))).as[(Long, Long, Long)].head()
    assert(stats === ((0L, 0L, 0L)))
    // redaction is identity on PII-free text, including empty
    assert(blank.select(TextFunctions.redactPii(col("text"))).as[String]
      .collect().toSeq === Seq("", "   ", "one two three"))
    // bm25 over an empty corpus returns an empty frame, not a crash
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Search.bm25TopK(empty, "doc_id", "text", Seq("x"), 5).count() === 0L)
  }

  test("sampleBucket is stable and in range") {
    val b = spark.range(1000).select(TextFunctions.sampleBucket(col("id")).as("b"))
      .agg(min(col("b")), max(col("b"))).as[(Long, Long)].head()
    assert(b._1 >= 0L && b._2 < 10000L)
  }
}
