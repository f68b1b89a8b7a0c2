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

  test("fused hashedShingles is bit-identical to the composable form") {
    import org.apache.spark.sql.graft.MinHashExprs
    // edge rows plus realistic text, repeats (distinct-order matters),
    // and a non-ASCII doc (char-based substring semantics must match)
    val docs = edge.unionByName(Seq(
      (6L, "the quick brown fox jumps over the lazy dog"),
      (7L, "ababababab"), (8L, "héllo wörld again")).toDF("doc_id", "text"))
    for (n <- Seq(3, 5)) {
      val fusedD = docs.select(col("doc_id"),
        MinHashExprs.hashedShingles(col("text"), n, distinct = true).as("h"))
      val composD = docs.select(col("doc_id"),
        transform(charShingles(col("text"), n), s => stableHash60(s)).as("h"))
      assert(fusedD.exceptAll(composD).isEmpty && composD.exceptAll(fusedD).isEmpty,
        s"distinct path diverged at n=$n")
      val grams = when(length(col("text")) >= n,
        transform(sequence(lit(1), length(col("text")) - n + 1),
          i => col("text").substr(i, lit(n))))
        .otherwise(array(col("text")))
      val fusedP = docs.select(col("doc_id"),
        MinHashExprs.hashedShingles(col("text"), n, distinct = false).as("h"))
      val composP = docs.select(col("doc_id"),
        transform(grams, g => stableHash60(g)).as("h"))
      assert(fusedP.exceptAll(composP).isEmpty && composP.exceptAll(fusedP).isEmpty,
        s"positional path diverged at n=$n")
    }
  }

  test("fused hashedWordNgrams is bit-identical to the composable form") {
    import org.apache.spark.sql.graft.MinHashExprs
    val docs = edge.unionByName(Seq(
      (6L, "the quick brown fox the quick brown fox"), // repeat grams
      (7L, "  padded   with \t odd\nwhitespace  "),
      (8L, "uno"), (9L, "héllo wörld wieder héllo wörld"),
      // trim removes only 0x20 — text bounded by non-space whitespace
      // splits to boundary "" tokens that the fused path must also emit
      // (Java split needs limit -1 to keep the trailing one)
      (10L, "drop table\n"), (11L, "\ttabbed text\t"),
      (12L, "\n")).toDF("doc_id", "text"))
    for (n <- Seq(2, 3)) {
      val fused = docs.select(col("doc_id"),
        MinHashExprs.hashedWordNgrams(col("text"), n).as("h"))
      val compos = docs.select(col("doc_id"),
        transform(wordNgrams(col("text"), n), g => stableHash60(g)).as("h"))
      assert(fused.exceptAll(compos).isEmpty && compos.exceptAll(fused).isEmpty,
        s"word-gram path diverged at n=$n")
    }
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

  test("wordBigrams: empty for <2 tokens, adjacent pairs otherwise") {
    import graft.functions.TextFunctions.{wordBigrams, wsTokens}
    val rows = Seq("", "   ", "one", "a b", "a b c")
      .zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"), wordBigrams(wsTokens(col("text"))).as("bg"))
      .orderBy("id").as[(Int, Seq[String])].collect().toSeq
    assert(rows === Seq(
      (0, Nil), (1, Nil), (2, Nil),
      (3, Seq("a b")), (4, Seq("a b", "b c"))))
  }

  test("langId returns und for empty text") {
    assert(Seq("").toDF("text").select(langId(col("text"))).as[String].head() === "und")
  }
}
