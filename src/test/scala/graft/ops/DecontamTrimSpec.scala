package graft.ops

import graft.SparkSpec
import graft.operators.Decontaminate

/** Span-level contamination localization + trim (q188's operator) — interval
  * merge, coverage accounting, and trimmed text pinned on hand-computed
  * fixtures. */
class DecontamTrimSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // eval set: one 4-gram "a b c d"; a 5-token doc contributing the
  // overlapping grams "p q r s" and "q r s t"
  private val eval = Seq(
    (100L, "a b c d"),
    (101L, "p q r s t")).toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "x a b c d y a b c d z"), // two disjoint matches at pos 2 and 7
    (2L, "a b c d e"),             // one match at pos 1
    (3L, "p q r s t u"),           // two OVERLAPPING matches merge to one span
    (4L, "a b c d"),               // fully covered doc
    (5L, "m n o p")                // clean — must be absent
  ).toDF("doc_id", "text")

  private lazy val got = Decontaminate
    .contaminatedSpans(corpus, eval, "doc_id", "text", n = 4)
    .orderBy("doc_id")
    .as[(Long, Long, Long, Long, Long, Long, Long, Long, String)]
    .collect().toSeq

  test("clean docs are absent; flagged ids are exactly the leaking ones") {
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 4L))
  }

  test("disjoint matches stay two spans with the gap token kept") {
    // doc 1: tokens 1..11, matches cover [2,6) and [7,11)
    val r = got.find(_._1 == 1L).get
    assert(r === ((1L, 11L, 2L, 2L, 2L, 10L, 8L, 3L, md5hex("x y z"))))
  }

  test("single match at doc start trims to the tail token") {
    val r = got.find(_._1 == 2L).get
    assert(r === ((2L, 5L, 1L, 1L, 1L, 4L, 4L, 1L, md5hex("e"))))
  }

  test("overlapping matches merge into one span covering their union") {
    // positions 1 and 2, n=4: one interval [1, 6) → 5 covered tokens
    val r = got.find(_._1 == 3L).get
    assert(r === ((3L, 6L, 2L, 1L, 1L, 5L, 5L, 1L, md5hex("u"))))
  }

  test("a fully covered doc keeps zero tokens and trims to md5 of empty") {
    val r = got.find(_._1 == 4L).get
    assert(r === ((4L, 4L, 1L, 1L, 1L, 4L, 4L, 0L, md5hex(""))))
  }

  test("fused multi-n serve equals the per-n loop on every (doc, n) verdict") {
    val wh = new graft.core.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_multin_wh_").toString)
    graft.operators.DecontamStore.registerBenchmark(
      wh, "g", "dc", "bench", eval, "doc_id", "text", n = 4)
    graft.operators.DecontamStore.registerBenchmark(
      wh, "g", "dc", "bench", eval, "doc_id", "text", n = 2)
    val fused = graft.operators.DecontamStore
      .contaminatedMultiN(wh, "g", "dc", corpus, "doc_id", "text", Seq(2, 4))
      .as[(Long, Long, Long)].collect().toSet
    val looped = Seq(2, 4).flatMap { n =>
      graft.operators.DecontamStore
        .contaminated(wh, "g", "dc", corpus, "doc_id", "text", n)
        .as[(Long, Long)].collect().map { case (id, c) => (id, n.toLong, c) }
    }.toSet
    assert(fused === looped && fused.nonEmpty)
  }

  test("store-served trim equals the one-shot span answer") {
    val wh = new graft.core.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_trim_wh_").toString)
    graft.operators.DecontamStore.registerBenchmark(
      wh, "g", "dc", "bench", eval, "doc_id", "text", n = 4)
    val served = graft.operators.DecontamStore
      .trimSpans(wh, "g", "dc", corpus, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq
    assert(served === got)
  }

  test("trim is idempotent: re-checking trimmed docs finds no contamination") {
    // strip doc 2's span by hand ("e") and doc 1's ("x y z"): no eval
    // 4-gram can survive in a gap shorter than 4 tokens
    val trimmed = Seq((1L, "x y z"), (2L, "e")).toDF("doc_id", "text")
    val again = Decontaminate
      .contaminatedSpans(trimmed, eval, "doc_id", "text", n = 4)
    assert(again.isEmpty)
  }
}
