package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis query surface over the `documents` fixture: token stats,
  * quality scoring, language-ID, and fingerprint dedup. Each query has a
  * DuckDB oracle computing the identical expression tree — all arithmetic
  * is integer-derived so results match bit-for-bit.
  */
object TextQueries {

  /** q16: per-language corpus statistics — token counts (whitespace + BPE-ish),
    * punctuation, average length. One scan, one shuffle on `lang`. */
  def q16TokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text")).cast("long")).as("n_tokens"),
        sum(bpeTokenCount(col("text")).cast("long")).as("n_bpe_tokens"),
        sum(punctCount(col("text")).cast("long")).as("n_punct"),
        fixedPoint(avg(col("n_chars")), 2).as("avg_chars_e2"))
      .orderBy(col("lang"))

  /** Regex-heavy per-doc stages: spread byte-small fixture files across
    * cores (an explicit count so AQE can't coalesce the tiny shuffle).
    * Shared by every documents-scanning query module. */
  private[queries] def docsWide(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .repartition(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** q17: per-document quality score — length/punct/stopword composite. */
  def q17QualityScores(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        fixedPoint(qualityScore(col("text")), 4).as("quality_e4"))
      .orderBy(col("doc_id"))

  /** q18: language-ID confusion matrix — labeled lang × predicted lang. */
  def q18LangidConfusion(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .groupBy(col("lang"), langId(col("text")).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))

  /** q19: exact dedup on the canonical fingerprint of the first 40 chars
    * (prefix-truncated to manufacture collisions in the fixture). */
  def q19FingerprintDedup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("t40"))
    Dedup.exactDedup(t, "doc_id", "t40").orderBy(col("fp"))
  }

  /** q52: unigram-LM commonness score — each doc's mean corpus frequency of
    * its tokens, the deterministic proxy for LM-perplexity quality filters
    * (log-prob would need transcendentals; mean probability ranks docs the
    * same way for filtering rare-token noise). One integer sum per doc over
    * a broadcast frequency table, one division at the end — engine-exact. */
  def q52TokenCommonness(spark: SparkSession, dir: String): DataFrame = {
    val occ = docsWide(spark, dir)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
    val freq = occ.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    occ.join(broadcast(freq), "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("s"), count(lit(1)).as("n"))
      .join(broadcast(total), lit(true))
      .select(col("doc_id"), col("n").as("n_tokens"),
        fixedPoint(col("s") / (col("n") * col("total")), 4).as("commonness_e4"))
      .orderBy(col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_token_stats" -> (q16TokenStats _),
    "q17_quality_scores" -> (q17QualityScores _),
    "q18_langid_confusion" -> (q18LangidConfusion _),
    "q19_fingerprint_dedup" -> (q19FingerprintDedup _),
    "q52_token_commonness" -> (q52TokenCommonness _))

  private[queries] val tokCountSql =
    raw"CASE WHEN len(trim(text))=0 THEN 0 ELSE len(regexp_split_to_array(trim(text),'\s+')) END"
  private[queries] val punctCountSql = raw"len(regexp_extract_all(text,'[^A-Za-z0-9\s]'))"
  private[queries] val stopCountSql =
    raw"len(regexp_extract_all(lower(text),'\b(the|and|is|of|to|in|a|for|on|it)\b'))"

  val oracles: Map[String, String] = Map(
    "q16_token_stats" ->
      raw"""SELECT lang, count(*) AS n_docs,
         CAST(sum($tokCountSql) AS BIGINT) AS n_tokens,
         CAST(sum(len(regexp_extract_all(text,'[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_bpe_tokens,
         CAST(sum($punctCountSql) AS BIGINT) AS n_punct,
         CAST(floor(avg(n_chars)*100 + 0.5) AS BIGINT) AS avg_chars_e2
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q17_quality_scores" ->
      raw"""WITH t AS (SELECT doc_id, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop, len(text) AS n_chr
           FROM documents)
         SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(floor((least(n_tok/100.0, 1.0)*0.4
             + (1.0 - CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)*0.3
             + least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT) AS quality_e4
         FROM t ORDER BY doc_id""",
    "q18_langid_confusion" ->
      raw"""WITH s AS (SELECT lang,
           len(regexp_extract_all(text,'[^ -~]')) AS cjk,
           len(regexp_extract_all(lower(text),'\b(the|and|is|of|to)\b')) AS s_en,
           len(regexp_extract_all(lower(text),'\b(der|die|und|ist|ein)\b')) AS s_de,
           len(regexp_extract_all(lower(text),'\b(le|les|des|est|une)\b')) AS s_fr,
           len(regexp_extract_all(lower(text),'\b(el|los|las|una|por)\b')) AS s_es
           FROM documents),
         p AS (SELECT lang, CASE WHEN cjk > 0 THEN 'zh'
             WHEN s_en = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) > 0 THEN 'en'
             WHEN s_de = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) > 0 THEN 'de'
             WHEN s_fr = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) > 0 THEN 'fr'
             WHEN s_es = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) > 0 THEN 'es'
             ELSE 'und' END AS pred_lang FROM s)
         SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1,2 ORDER BY 1,2""",
    "q19_fingerprint_dedup" ->
      raw"""SELECT md5(regexp_replace(lower(trim(substr(text,1,40))), '\s+', ' ', 'g')) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q52_token_commonness" ->
      raw"""WITH occ AS (SELECT doc_id, unnest(CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(trim(text),'\s+') END) AS token FROM documents),
         freq AS (SELECT token, count(*) AS cnt FROM occ GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
         d AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS s, count(*) AS n
           FROM occ JOIN freq USING (token) GROUP BY 1)
         SELECT doc_id, n AS n_tokens,
           CAST(floor(s/(n*total)*10000 + 0.5) AS BIGINT) AS commonness_e4
         FROM d, tot ORDER BY doc_id""")
}
