package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Sign-bit Hamming search: SignBitsWord against a Scala-computed reference,
  * and hammingTopK against a brute-force shortlist+rerank on the fixture. */
class HammingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("SignBitsWord packs sign bits exactly as the Scala reference") {
    val got = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qe"))
      .select(col("vec_id"), col("qe"),
        org.apache.spark.sql.graft.SignBitsWord(col("qe"), 0, 32).as("w0"),
        org.apache.spark.sql.graft.SignBitsWord(col("qe"), 32, 32).as("w1"))
      .as[(Long, Seq[Long], Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, qe, w0, w1) =>
      def ref(from: Int): Long =
        (0 until 32).foldLeft(0L) { (s, j) =>
          if (from + j < qe.length && qe(from + j) > 0) s | (1L << j) else s
        }
      assert(w0 === ref(0), s"w0 mismatch for vec $id")
      assert(w1 === ref(32), s"w1 mismatch for vec $id")
    }
  }

  test("shortlist window group-limits map-side (no corpus-per-query task state)") {
    // the srk <= shortlist rank filter must keep its WindowGroupLimit
    // shape: the PARTIAL node bounds every scan task to `shortlist` rows
    // per query BEFORE the exchange — without it, one task would buffer
    // |corpus| scored rows per query. Pin it for both the ad-hoc path and
    // the stored-words serving path (a refactor that breaks the
    // rank-filter pattern silently loses the bound, not correctness).
    val queries = emb.filter(col("vec_id") < 5)
    val adHoc = Similarity.hammingTopK(queries, emb, 3, 10)
      .queryExecution.executedPlan.toString
    assert(adHoc.contains("WindowGroupLimit") && adHoc.contains("Partial"),
      s"hammingTopK shortlist lost its partial group-limit:\n$adHoc")
    val words = Similarity.signWords(emb, "c")
    val stored = Similarity.hammingTopKFromWords(queries,
      words.select(col("c"), col("c_w0"), col("c_w1")),
      words.select(col("c"), col("c_qe")), 3, 10)
      .queryExecution.executedPlan.toString
    assert(stored.contains("WindowGroupLimit") && stored.contains("Partial"),
      s"hammingTopKFromWords shortlist lost its partial group-limit:\n$stored")
  }

  test("hammingTopK equals the brute-force shortlist + exact rerank") {
    val queries = emb.filter(col("vec_id") < 5)
    val k = 3
    val shortlist = 10
    val got = Similarity.hammingTopK(queries, emb, k, shortlist)
      .select("q_id", "neighbor_id", "hamming", "rank")
      .as[(Long, Long, Int, Int)].collect().toSet

    // reference: full sign-bit + quantized cosine in Scala
    val vecs = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qe"))
      .as[(Long, Seq[Long])].collect().toMap
    def words(qe: Seq[Long]): (Long, Long) = {
      def w(from: Int) = (0 until 32).foldLeft(0L) { (s, j) =>
        if (from + j < qe.length && qe(from + j) > 0) s | (1L << j) else s
      }
      (w(0), w(32))
    }
    def cosE4(a: Seq[Long], b: Seq[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val na = math.sqrt(a.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(b.map(x => x * x).sum.toDouble)
      math.floor(dot / (na * nb) * 10000 + 0.5).toLong
    }
    val expected = (0L until 5L).flatMap { q =>
      val (qw0, qw1) = words(vecs(q))
      val sl = vecs.keys.filter(_ != q).toSeq
        .map { c =>
          val (cw0, cw1) = words(vecs(c))
          val h = java.lang.Long.bitCount(qw0 ^ cw0) + java.lang.Long.bitCount(qw1 ^ cw1)
          (c, h)
        }
        .sortBy { case (c, h) => (h, c) }.take(shortlist)
      sl.map { case (c, h) => (c, h, cosE4(vecs(q), vecs(c))) }
        .sortBy { case (c, _, cos) => (-cos, c) }.take(k)
        .zipWithIndex.map { case ((c, h, _), i) => (q, c, h, i + 1) }
    }.toSet
    assert(got === expected)
  }

  test("hamming recall curve (q153): monotone in shortlist, per-point equals " +
    "hammingTopK, exact at corpus width") {
    val q = emb.filter(col("vec_id") < 10)
    val n = emb.count().toInt
    val k = 5
    val curve = Similarity.hammingRecallCurve(q, emb, k, Seq(5, 20, n))
      .select(col("shortlist"), col("n_queries"), col("n_hits"), col("recall_e4"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._2).forall(_ === 10L))
    // a larger shortlist reranks a superset by the same exact cosine +
    // tie-break, so hits never decrease
    assert(curve.map(_._3).toSeq === curve.map(_._3).toSeq.sorted)
    // a corpus-wide shortlist reranks every candidate — that IS the exact
    // ranking (same scores, same tie-breaks), so recall@k is perfect
    assert(curve.last._3 === 50L && curve.last._4 === 10000L)
    // each curve point is value-identical to running hammingTopK there
    val exact = Similarity.bruteForceTopK(q, emb, k)
      .select(col("q_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    Seq(5, 20).foreach { s =>
      val hits = Similarity.hammingTopK(q, emb, k, s)
        .select(col("q_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().count(exact).toLong
      assert(curve.find(_._1 === s.toLong).get._3 === hits,
        s"curve point $s disagrees with hammingTopK")
    }
  }
}
