package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocklist phrase filtering — flag documents containing any of a set of
  * multi-word phrases (policy/safety/boilerplate lists), matched as
  * CONSECUTIVE normalized word sequences, not substrings ("drop table"
  * must not match "raindrop tablet").
  *
  * Shape: the phrase list is config-scale (thousands of rows — broadcast);
  * the corpus is the heavy side. Each doc emits its word n-grams for every
  * phrase length in ONE row-local projection (the per-length gram arrays
  * concatenate before a single explode — one corpus scan regardless of how
  * many lengths the list mixes), then a broadcast hash join keeps only
  * gram occurrences equal to some phrase. Nothing shuffles until after the
  * join, and what shuffles is matches only — at 100 TB the post-join
  * traffic is proportional to policy violations, not corpus size.
  *
  * Scanning a doc once per phrase (the naive `contains` loop) would read
  * the corpus |phrases| times; this reads it once for all of them.
  */
object Blocklist {

  /** Word n-gram strings of `ts` (a tokenized array column): windows of
    * `n` consecutive tokens joined by a single space. Empty when the doc
    * has fewer than `n` tokens (sequence() would otherwise count DOWN).
    * Built from the Column parameter itself — no name capture, so any
    * caller alias works. */
  private def ngramStrings(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ts) - lit(n - 1)),
        i => array_join(slice(ts, i, lit(n)), " ")))

  /** Normalize a phrase/text column for matching: lowercase, trim,
    * collapse runs of whitespace. Mirrors the exact-dedup canonicalizer. */
  def normPhrase(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** (idCol, phrase, n_hits) for every document × blocklist phrase that
    * occurs in it, with the occurrence count. `phrases` has a single
    * `phrase` column; lengths 2..`maxLen` words are matched (single-word
    * blocklists are a plain token join — use the token path directly).
    *
    * Every phrase MUST normalize to 2..maxLen words — a phrase outside
    * that range would silently never match (a safety-filter bypass), so
    * this validates the list up front and fails loudly instead. The check
    * is one tiny job over the config-scale phrase frame, negligible next
    * to the corpus scan it guards. */
  def matches(corpus: DataFrame, phrases: DataFrame,
              idCol: String, textCol: String, maxLen: Int = 4): DataFrame = {
    require(maxLen >= 2, s"maxLen must be >= 2, got $maxLen")
    val bad = phrases
      .select(normPhrase(col("phrase")).as("g"))
      .filter(size(split(col("g"), " ")) < 2 ||
        size(split(col("g"), " ")) > maxLen)
      .take(5)
    require(bad.isEmpty,
      s"blocklist phrases must have 2..$maxLen words after normalization; " +
        s"offenders include: ${bad.map(_.getString(0)).mkString("'", "', '", "'")}")
    val pnorm = broadcast(
      phrases.select(normPhrase(col("phrase")).as("g")).distinct())
    val toks = corpus.select(col(idCol),
      graft.functions.TextFunctions.wsTokens(normPhrase(col(textCol))).as("ts"))
    val allGrams = concat((2 to maxLen).map(n => ngramStrings(col("ts"), n)): _*)
    toks.select(col(idCol), explode(allGrams).as("g"))
      .join(pnorm, "g")
      .groupBy(col(idCol), col("g").as("phrase"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The blocklist-clean corpus: docs matching no phrase (left-anti). */
  def clean(corpus: DataFrame, phrases: DataFrame,
            idCol: String, textCol: String, maxLen: Int = 4): DataFrame =
    corpus.join(matches(corpus, phrases, idCol, textCol, maxLen)
      .select(col(idCol)).distinct(), Seq(idCol), "left_anti")
}
