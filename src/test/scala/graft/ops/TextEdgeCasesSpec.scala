package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Degenerate-input behavior of the text operators: empty/blank text,
  * text shorter than the shingle width, single tokens. */
class TextEdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    (1L, ""), (2L, "   "), (3L, "ab"), (4L, "word"), (5L, "two words")
  ).toDF("doc_id", "text")

  test("token/punct counts are 0 for blank text; shingles never vanish") {
    val r = edge.select(col("doc_id"), tokenCount(col("text")).as("t"),
      punctCount(col("text")).as("p"), size(charShingles(col("text"), 5)).as("s"))
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Int]("t")).toSeq === Seq(0, 0, 1, 1, 2))
    assert(r.map(_.getAs[Int]("p")).toSeq === Seq(0, 0, 0, 0, 0))
    // short texts shingle to themselves: always >= 1 shingle
    assert(r.map(_.getAs[Int]("s")).forall(_ >= 1))
  }

  test("quality score stays in [0,1] on degenerate inputs") {
    val q = edge.select(qualityScore(col("text"))).as[Double].collect()
    assert(q.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("dedup pipelines run on degenerate inputs without loss of ids") {
    // every doc appears in the signature frame exactly once
    assert(Dedup.minhashSignature(edge, "doc_id", "text").count() === 5)
    assert(Dedup.simhash(edge, "doc_id", "text").count() === 5)
    // blank texts are exact dups of each other modulo normalization
    val fp = Dedup.exactDedup(edge, "doc_id", "text")
    assert(fp.count() === 4) // "" == "   " after trim-normalize
  }

  test("langId returns und for empty text") {
    assert(Seq("").toDF("text").select(langId(col("text"))).as[String].head() === "und")
  }
}
