package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination — remove (or at least flag) training documents
  * that share verbatim word n-grams with an evaluation set, the standard
  * guard against test-set leakage when assembling a training corpus.
  *
  * Shape: explode the eval set into its distinct n-grams (an eval set is
  * benchmarks — MBs, not TBs — so the gram table broadcasts), explode the
  * corpus into per-doc distinct n-grams, hash-join on the gram string, count
  * hits per doc. The corpus-side explode is the only heavy stage: it is
  * row-local fan-out (no shuffle before the join, and with the broadcast
  * the join itself ships nothing), so the whole operator is one scan of the
  * corpus at any scale. Callers repartition before the explode when the
  * input files are few and fat (see TextQueries.docsWide).
  */
object Decontaminate {

  /** (idCol, n_eval_grams) for every corpus doc sharing ≥ 1 word n-gram
    * with `evalDocs`. Grams are distinct per doc, so the count is the
    * number of distinct leaked grams. */
  def contaminated(corpus: DataFrame, evalDocs: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(TextFunctions.wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
    corpus
      .select(col(idCol), explode(TextFunctions.wordNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_eval_grams"))
  }

  /** The decontaminated corpus: every doc with no eval-set n-gram overlap
    * (left-anti against the contamination verdicts — one broadcast join). */
  def clean(corpus: DataFrame, evalDocs: DataFrame,
            idCol: String, textCol: String, n: Int): DataFrame =
    corpus.join(contaminated(corpus, evalDocs, idCol, textCol, n)
      .select(col(idCol)), Seq(idCol), "left_anti")
}
