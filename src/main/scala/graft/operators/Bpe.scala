package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** Distributed byte-pair-encoding training (Sennrich-style, SURVEY north
  * star "token counting"): learn a ranked merge table from a corpus, then
  * count/encode with the codegen'd `BpeTokenCount` expression.
  *
  * Scale shape: one corpus pass builds the DISTINCT word vocabulary with
  * counts — the working set for every later round is vocab-sized, not
  * corpus-sized. Each merge round is one adjacent-pair aggregation
  * (map-side combinable, uniform string keys) plus a row-local pieces
  * rewrite; lineage is cut per round (localCheckpoint) so N rounds stay
  * N independent small jobs. Ties break deterministically on
  * (count desc, pair asc) — identical merges on every run and engine.
  *
  * At 100 TB one trains on a sample of the corpus (standard practice);
  * the vocabulary aggregation and per-round cost are sample-sized either
  * way, and the encode path scales with the full corpus row-locally.
  */
object Bpe {

  /** Greedy left-to-right single-pair merge of a pieces array — SQL
    * formulation used during training (vocab-scale rows, HOF interpretation
    * is fine there; the corpus-scale encode path is the codegen'd
    * expression instead). */
  private def mergeOnce(pieces: Column, a: String, b: String): Column = {
    val lit_a = lit(a)
    val lit_b = lit(b)
    aggregate(pieces, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit_a && x === lit_b,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(lit_a, lit_b))))
        .otherwise(concat(acc, array(x))))
  }

  /** Learn `nMerges` merges from the corpus text column. Returns the
    * ranked merge table (highest-frequency pair first). Stops early when
    * no adjacent pair occurs at least `minCount` times. */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
                  minCount: Long = 2L): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    // distinct word vocabulary with counts, pieces = codepoints
    var vocab = df
      .select(explode(wsTokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("pieces", split(col("word"), ""))
      .select(col("cnt"), col("pieces"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    var round = 0
    while (continue && round < nMerges) {
      round += 1
      val best = vocab
        .filter(size(col("pieces")) >= 2) // sequence(0,-1) would descend
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(pieces) - 2), j -> struct(pieces[j] AS a, pieces[j+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).as[(String, String, Long)].collect()
      best.headOption match {
        case Some((a, b, n)) if n >= minCount =>
          merges += ((a, b))
          vocab = vocab
            .withColumn("pieces", mergeOnce(col("pieces"), a, b))
            .localCheckpoint(true) // cut the per-round lineage
        case _ => continue = false
      }
    }
    merges.toList
  }

  /** Corpus-scale BPE token count with a learned merge table — the
    * codegen'd row-local encode path. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.BpeExprs.bpeTokenCount(lower(text), merges)
}
