package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.CorpusCuration
import graft.operators.Dedup

/** q35: the SQL-surface entry (spark.sql over registered views — the
  * reference's native interface was SQL strings); q36: the end-to-end
  * corpus-curation funnel, oracle-checked through every stage (langid →
  * quality floor → exact dedup → LSH near-dup removal). */
object CurationQueries {

  /** q35: TPC-H Q6-shaped revenue-delta query expressed as `spark.sql`
    * over a temp view — exercising the SQL front door end to end. */
  def q35SqlRevenueFilter(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT CAST(sum(floor(l_extendedprice * l_discount * 100 + 0.5)) AS BIGINT) AS revenue_cents,
         count(*) AS n_items
         FROM lineitem_v
         WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")
  }

  private val P = CorpusCuration.Params(
    langs = Set("en", "und"), minQualityE4 = 4000L,
    minChars = 50, maxChars = 100000, minJaccard = 0.5)

  /** q36: curated doc ids after the full funnel, via the fused dedup path:
    * ONE signing scan computes the exact-dedup fingerprint and the MinHash
    * signatures together, exact survivors come from a min-id window over
    * that frame, and the near-dup verify reuses the same signatures — the
    * quality-filter lineage (8 regex passes/doc) evaluates once instead of
    * once per dedup stage. */
  def q36CorpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val filtered = CorpusCuration.qualityFilter(docs, P)
    CorpusCuration.dedupedIds(filtered, "doc_id", "text", P.minJaccard)
      .orderBy(col("doc_id"))
  }

  /** q64: per-domain cap — at most 5 docs per source, best quality first
    * (doc_id breaks ties), the guard against one domain flooding the
    * corpus. Window rank partitioned by source: domains rank in parallel,
    * no global sort in the plan. */
  def q64SourceCap(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextQueries.docsWide(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.fixedPoint(
          graft.functions.TextFunctions.qualityScore(col("text")), 4).as("quality_e4"))
    CorpusCuration.capPerSource(scored, "doc_id", "source", "quality_e4", n = 5)
      .select(col("source"), col("src_rank").cast("long").as("src_rank"),
        col("doc_id"), col("quality_e4"))
      .orderBy(col("source"), col("src_rank"))
  }

  /** q78: weighted priority sampling — per language, the 10 docs drawn by
    * the deterministic bottom-k weighted reservoir (weight = token count;
    * heavier docs draw smaller priorities). Every engine draws the SAME
    * sample — the reproducibility a training-data run needs. */
  def q78PrioritySample(spark: SparkSession, dir: String): DataFrame = {
    val weighted = TextQueries.docsWide(spark, dir)
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    CorpusCuration.prioritySample(weighted, "doc_id", "lang", "n_tok", k = 10)
      .select(col("lang"), col("rnk").cast("long").as("rnk"), col("doc_id"),
        col("n_tok"), col("priority"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** q79: join-key skew report — the top event types by row share with the
    * hot verdict at 10% (ext.Profiler.skewReport). The diagnostic that
    * tells a 100 TB join to salt or broadcast BEFORE it runs. */
  def q79SkewReport(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profiler.skewReport(
      Tables(spark, dir, "events"), "event_type", topK = 10)

  /** q106: deterministic train/val/test split — 90/5/5 by a salted md5
    * bucket of doc_id, reported as per-(source, split) doc and token
    * counts. Row-local assignment (no shuffle, no RNG state): the same
    * doc lands in the same split on every engine, every rerun, every
    * cluster size — so eval rows can never drift into train. The salt
    * differs from q45's sampling bucket, keeping the two decisions
    * independent on the same ids. */
  def q106SplitAssignment(spark: SparkSession, dir: String): DataFrame =
    CorpusCuration.assignSplits(
      Tables(spark, dir, "documents"), "doc_id",
      Seq("train" -> 9000, "val" -> 500, "test" -> 500))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
          .as("n_tokens"))
      .orderBy(col("source"), col("split"))

  /** q110: distribution-matching rejection sampling — downsample the
    * corpus so the five main languages end up UNIFORM (2000 e4 each),
    * with the scarcest language keeping everything. Rates are DERIVED
    * from measured counts (q45's rates are fixed constants); the
    * per-language summary proves the rate arithmetic and the
    * deterministic keep decision. */
  def q110DistributionMatch(spark: SparkSession, dir: String): DataFrame =
    CorpusCuration.matchDistribution(
      Tables(spark, dir, "documents"), "doc_id", "lang",
      Seq("en" -> 2000, "de" -> 2000, "fr" -> 2000, "es" -> 2000,
        "zh" -> 2000))
      .groupBy(col("lang"), col("t_e4").cast("long").as("t_e4"),
        col("rate_e4"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))

  /** q117: deterministic epoch shuffle — every doc drawn into one of 8
    * shards with a stable within-shard position, reproducible from
    * (seed, doc_id) alone. The op a 100 TB training run uses to get a
    * global pseudo-random data order without a global sort. */
  def q117EpochShuffle(spark: SparkSession, dir: String): DataFrame =
    CorpusCuration.epochShuffle(
      Tables(spark, dir, "documents"), "doc_id", seed = "e1", nShards = 8)
      .select(col("shard"), col("position"), col("doc_id"))
      .orderBy(col("shard"), col("position"))

  /** q118: the full tokenizer pipeline in one query — learn 200 BPE
    * merges from the corpus (one-job learner), then ENCODE every doc
    * with the codegen'd kernel and report the 40 most-frequent pieces.
    *
    * Oracle design (the learn/encode seam): no SQL oracle can replay an
    * iterative learner, so the query FREEZES the learned merge table to
    * a deterministic temp parquet (`/tmp/graft_q118_merges_<sf>` — the
    * learner is deterministic, so every run of the same corpus rewrites
    * identical rows) and the DuckDB oracle replays ENCODE-GIVEN-MERGES
    * from that frozen table: a nested list-fold applies the merges in
    * rank order over the distinct word vocabulary, exactly the kernel's
    * greedy left-to-right pass per rank (BpeExprs.BpeMergeKernel). The
    * learner itself stays pinned by BpeSpec (batched ≡ sequential ≡
    * fast); the oracle closes the remaining gap — the corpus-scale
    * encode + aggregation — with a real hash check. */
  def q118BpeVocabUsage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // n_docs (the oracle's scale fingerprint) rides the learner's vocab
    // scan as an Observation — a dedicated docs.count() cost one extra
    // full corpus scan for pure oracle plumbing
    val (merges, nDocs) =
      graft.operators.Bpe.learnMergesFastCounted(docs, "text", 200, minCount = 2L)
    spark.createDataFrame(merges.zipWithIndex.map { case ((a, b), i) => (i, a, b, nDocs) })
      .toDF("rank", "a", "b", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(q118MergeDump(dir))
    docs.select(explode(graft.operators.Bpe.bpeEncode(col("text"), merges)).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("piece")).limit(40)
  }

  /** Frozen-merge-table location, keyed by the sf dir's basename so a
    * bench run at one scale can never clobber another scale's table; the
    * oracle globs every dump and selects by the `n_docs` fingerprint, so
    * the SAME static SQL replays correctly at whichever scale the
    * harness bound its table views to. */
  private def q118MergeDump(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_q118_merges_${new java.io.File(dir).getName}"

  /** q136: tokenizer fertility per source — how well the learned BPE
    * vocabulary fits each slice of the corpus. Learns the same 200-merge
    * table as q118 (its own frozen dump — the query stays self-contained
    * under subset verification), encodes every doc with the codegen'd
    * kernel, and reports per source: words, pieces, characters, and the
    * two integer-exact ratios a mixture designer reads — `fert_e4`
    * (pieces per word ×1e4: high = the tokenizer fragments this source;
    * the OOV/garbage signal) and `cpp_e4` (chars per piece ×1e4: low =
    * poor compression). Entirely integer arithmetic — counts and two
    * integer floor-divisions, no IEEE anywhere.
    *
    * Scale shape: the encode is one row-local codegen'd projection (no
    * shuffle), the aggregate is one map-side-combined groupBy(source) of
    * three longs; learning is the q118 sample-scale seam. At 100 TB the
    * cost is the tokenize scan itself — the signal that tells you WHICH
    * source is bloating your token budget before you train. */
  def q136TokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.wsTokens
    val docs = Tables(spark, dir, "documents")
    val (merges, nDocs) =
      graft.operators.Bpe.learnMergesFastCounted(docs, "text", 200, minCount = 2L)
    spark.createDataFrame(merges.zipWithIndex.map { case ((a, b), i) => (i, a, b, nDocs) })
      .toDF("rank", "a", "b", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(q136MergeDump(dir))
    docs
      .select(col("source"),
        size(wsTokens(lower(col("text")))).cast("long").as("n_w"),
        graft.operators.Bpe.bpeEncode(col("text"), merges).as("pieces"))
      .select(col("source"), col("n_w"),
        size(col("pieces")).cast("long").as("n_p"),
        aggregate(col("pieces"), lit(0L),
          (acc, p) => acc + length(p).cast("long")).as("n_c"))
      .groupBy(col("source"))
      .agg(sum(col("n_w")).as("n_words"), sum(col("n_p")).as("n_pieces"),
        sum(col("n_c")).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_pieces"), col("n_chars"),
        expr("CASE WHEN n_words > 0 THEN n_pieces * 10000 div n_words ELSE 0 END")
          .as("fert_e4"),
        expr("CASE WHEN n_pieces > 0 THEN n_chars * 10000 div n_pieces ELSE 0 END")
          .as("cpp_e4"))
      .orderBy(col("source"))
  }

  private def q136MergeDump(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_q136_merges_${new java.io.File(dir).getName}"

  /** q147: tokenizer compression curve — corpus-wide fertility
    * (pieces/word) and compression (chars/piece) at three vocab sizes,
    * all served from ONE learned merge table: vocab truncation in BPE is
    * merge-prefix truncation (deploying the first v merges IS the
    * v-merge tokenizer), so the 100/200/400 points cost one learn and
    * one encode scan, not three learns. The "choose the vocab size"
    * design input: where the chars-per-piece curve flattens is where
    * additional merges stop buying compression — measured on the real
    * corpus before committing a vocabulary. Entirely integer arithmetic.
    *
    * Scale shape: one learn (the q118 learner), then a single corpus
    * scan computing all three piece arrays row-locally (the encodes are
    * non-cheap HOF chains, so CollapseProject leaves the shared arrays
    * in place — the q124 lesson); the aggregate is three longs per vocab
    * point. Oracle replays encode-given-frozen-merges per DISTINCT word
    * per vocab (the q118/q136 seam), with `rank < v` truncating the same
    * dump three ways. */
  def q147CompressionCurve(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.wsTokens
    val docs = Tables(spark, dir, "documents")
    val (merges, nDocs) =
      graft.operators.Bpe.learnMergesFastCounted(docs, "text", 400, minCount = 2L)
    spark.createDataFrame(merges.zipWithIndex.map { case ((a, b), i) => (i, a, b, nDocs) })
      .toDF("rank", "a", "b", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(q147MergeDump(dir))
    val vocabs = Seq(100, 200, 400)
    val pieces = docs.select(
      size(wsTokens(lower(col("text")))).cast("long").as("n_w") +:
        vocabs.map(v =>
          graft.operators.Bpe.bpeEncode(col("text"), merges.take(v)).as(s"p$v")): _*)
    val counted = pieces.select(
      col("n_w") +: vocabs.flatMap(v => Seq(
        size(col(s"p$v")).cast("long").as(s"np$v"),
        aggregate(col(s"p$v"), lit(0L),
          (acc, p) => acc + length(p).cast("long")).as(s"nc$v"))): _*)
    val totals = counted.agg(
      sum(col("n_w")).as("n_words"),
      vocabs.flatMap(v => Seq(
        sum(col(s"np$v")).as(s"tp$v"), sum(col(s"nc$v")).as(s"tc$v"))): _*)
    val rows = vocabs.map(v =>
      totals.select(lit(v.toLong).as("vocab_merges"), col("n_words"),
        col(s"tp$v").as("n_pieces"), col(s"tc$v").as("n_chars")))
    rows.reduce(_.unionByName(_))
      .select(col("vocab_merges"), col("n_words"), col("n_pieces"), col("n_chars"),
        expr("CASE WHEN n_words > 0 THEN n_pieces * 10000 div n_words ELSE 0 END")
          .as("fert_e4"),
        expr("CASE WHEN n_pieces > 0 THEN n_chars * 10000 div n_pieces ELSE 0 END")
          .as("cpp_e4"))
      .orderBy(col("vocab_merges"))
  }

  private def q147MergeDump(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_q147_merges_${new java.io.File(dir).getName}"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_sql_revenue_filter" -> (q35SqlRevenueFilter _),
    "q36_corpus_curation" -> (q36CorpusCuration _),
    "q64_source_cap" -> (q64SourceCap _),
    "q78_priority_sample" -> (q78PrioritySample _),
    "q79_skew_report" -> (q79SkewReport _),
    "q106_split_assignment" -> (q106SplitAssignment _),
    "q110_distribution_match" -> (q110DistributionMatch _),
    "q117_epoch_shuffle" -> (q117EpochShuffle _),
    "q118_bpe_vocab_usage" -> (q118BpeVocabUsage _),
    "q136_tokenizer_fertility" -> (q136TokenizerFertility _),
    "q147_compression_curve" -> (q147CompressionCurve _))

  // ---- oracle SQL ----

  import TextQueries.{punctCountSql, stopCountSql, tokCountSql}

  private val qualitySql =
    raw"""CAST(floor((least($tokCountSql/100.0, 1.0)*0.4
      + (1.0 - CASE WHEN len(text)>0 THEN $punctCountSql/CAST(len(text) AS DOUBLE) ELSE 0.0 END)*0.3
      + least(CASE WHEN $tokCountSql>0 THEN $stopCountSql*5.0/$tokCountSql ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT)"""

  // pred_lang ∈ {en, und} as a boolean: no CJK, and either no marker hits
  // at all (und) or the en score ties the max (en has top priority in the
  // argmax chain, so s_en = max ⇒ pred = 'en' even on ties).

  private val sigCols = (0 until 16).map(i =>
    s"list_min(list_transform(hs, x -> ((x % ${Dedup.MinhashP20}) * ${Dedup.affineA(i)}" +
      s" + ${Dedup.affineB(i)}) % ${Dedup.MinhashP31})) AS mh_$i").mkString(", ")

  private val bandSelects = (0 until 4).map { j =>
    val cc = (0 until 4).map(i => s"CAST(mh_${j * 4 + i} AS VARCHAR)").mkString("||'|'||")
    s"SELECT doc_id, $j AS band, md5($cc) AS bh FROM sig"
  }.mkString(" UNION ALL ")

  val oracles: Map[String, String] = Map(
    // q118: encode-given-frozen-merges (see q118BpeVocabUsage scaladoc).
    // The merge table is written by the Spark query itself — the learner
    // is deterministic, so the replay checks the corpus-scale encode +
    // aggregation, while BpeSpec pins the learner. The glob sees every
    // scale's dump; the n_docs fingerprint picks the one learned from
    // the corpus THIS harness run bound its views to.
    // chr(1) separates pieces inside the fold accumulator; chr(2)
    // separates a|b inside one encoded merge — neither occurs in text.
    "q118_bpe_vocab_usage" ->
      raw"""WITH magg AS (SELECT list(a || chr(2) || b ORDER BY rank) AS ms
             FROM read_parquet('${System.getProperty("java.io.tmpdir")}/graft_q118_merges_*/*.parquet')
             WHERE n_docs = (SELECT count(*) FROM documents)),
         toks AS (SELECT unnest(CASE WHEN len(trim(lower(text))) = 0 THEN []
               ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS w
             FROM documents),
         wc AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
         enc AS (SELECT c, list_reduce(
             list_prepend(array_to_string([w[i] for i in range(1, len(w)+1)], chr(1)), ms),
             (acc, x) -> list_reduce(
                string_split(acc, chr(1)),
                (a2, y) -> CASE
                   WHEN string_split(a2, chr(1))[-1] = string_split(x, chr(2))[1]
                        AND y = string_split(x, chr(2))[2]
                   THEN array_to_string(list_append(string_split(a2, chr(1))[1:-2],
                          string_split(x, chr(2))[1] || string_split(x, chr(2))[2]), chr(1))
                   ELSE a2 || chr(1) || y END)) AS e
           FROM wc, magg),
         pieces AS (SELECT unnest(string_split(e, chr(1))) AS piece, c FROM enc)
         SELECT piece, CAST(sum(c) AS BIGINT) AS n FROM pieces
         GROUP BY 1 ORDER BY n DESC, piece LIMIT 40""",
    // q136: encode each distinct word ONCE from the frozen q136 merge
    // dump (same fold kernel as q118's oracle), derive per-word piece
    // and char counts, then join the per-(source, word) counts — the
    // fold cost stays at q118's global-vocab scale, not vocab×sources.
    "q136_tokenizer_fertility" ->
      raw"""WITH magg AS (SELECT list(a || chr(2) || b ORDER BY rank) AS ms
             FROM read_parquet('${System.getProperty("java.io.tmpdir")}/graft_q136_merges_*/*.parquet')
             WHERE n_docs = (SELECT count(*) FROM documents)),
         toks AS (SELECT source, unnest(CASE WHEN len(trim(lower(text))) = 0 THEN []
               ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS w
             FROM documents),
         wc AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
         enc AS (SELECT w, list_reduce(
             list_prepend(array_to_string([w[i] for i in range(1, len(w)+1)], chr(1)), ms),
             (acc, x) -> list_reduce(
                string_split(acc, chr(1)),
                (a2, y) -> CASE
                   WHEN string_split(a2, chr(1))[-1] = string_split(x, chr(2))[1]
                        AND y = string_split(x, chr(2))[2]
                   THEN array_to_string(list_append(string_split(a2, chr(1))[1:-2],
                          string_split(x, chr(2))[1] || string_split(x, chr(2))[2]), chr(1))
                   ELSE a2 || chr(1) || y END)) AS e
           FROM wc, magg),
         pw AS (SELECT w, len(string_split(e, chr(1))) AS np, len(w) AS nc FROM enc),
         sc AS (SELECT source, w, count(*) AS cs FROM toks GROUP BY 1, 2),
         agg AS (SELECT sc.source, CAST(sum(sc.cs) AS BIGINT) AS n_words,
             CAST(sum(sc.cs * pw.np) AS BIGINT) AS n_pieces,
             CAST(sum(sc.cs * pw.nc) AS BIGINT) AS n_chars
           FROM sc JOIN pw USING (w) GROUP BY 1)
         SELECT source, n_words, n_pieces, n_chars,
           CAST(CASE WHEN n_words > 0 THEN (n_pieces * 10000) // n_words
             ELSE 0 END AS BIGINT) AS fert_e4,
           CAST(CASE WHEN n_pieces > 0 THEN (n_chars * 10000) // n_pieces
             ELSE 0 END AS BIGINT) AS cpp_e4
         FROM agg ORDER BY source""",
    "q147_compression_curve" ->
      raw"""WITH vv(v) AS (VALUES (100), (200), (400)),
         magg AS (SELECT vv.v AS v, list(a || chr(2) || b ORDER BY rank) AS ms
             FROM read_parquet('${System.getProperty("java.io.tmpdir")}/graft_q147_merges_*/*.parquet'), vv
             WHERE n_docs = (SELECT count(*) FROM documents) AND rank < vv.v
             GROUP BY vv.v),
         toks AS (SELECT unnest(CASE WHEN len(trim(lower(text))) = 0 THEN []
               ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS w
             FROM documents),
         wc AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
         enc AS (SELECT magg.v AS v, w, c, list_reduce(
             list_prepend(array_to_string([w[i] for i in range(1, len(w)+1)], chr(1)), magg.ms),
             (acc, x) -> list_reduce(
                string_split(acc, chr(1)),
                (a2, y) -> CASE
                   WHEN string_split(a2, chr(1))[-1] = string_split(x, chr(2))[1]
                        AND y = string_split(x, chr(2))[2]
                   THEN array_to_string(list_append(string_split(a2, chr(1))[1:-2],
                          string_split(x, chr(2))[1] || string_split(x, chr(2))[2]), chr(1))
                   ELSE a2 || chr(1) || y END)) AS e
           FROM wc, magg),
         pw AS (SELECT v, c, len(string_split(e, chr(1))) AS np, len(w) AS nc FROM enc),
         agg AS (SELECT v, CAST(sum(c) AS BIGINT) AS n_words,
             CAST(sum(c * np) AS BIGINT) AS n_pieces,
             CAST(sum(c * nc) AS BIGINT) AS n_chars
           FROM pw GROUP BY 1)
         SELECT CAST(v AS BIGINT) AS vocab_merges, n_words, n_pieces, n_chars,
           CAST(CASE WHEN n_words > 0 THEN (n_pieces * 10000) // n_words
             ELSE 0 END AS BIGINT) AS fert_e4,
           CAST(CASE WHEN n_pieces > 0 THEN (n_chars * 10000) // n_pieces
             ELSE 0 END AS BIGINT) AS cpp_e4
         FROM agg ORDER BY vocab_merges""",
    "q117_epoch_shuffle" ->
      raw"""WITH h AS (SELECT doc_id,
             CAST(('0x'||substr(md5('shuf:e1:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS h
           FROM documents)
         SELECT CAST(h % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT)
             AS position,
           doc_id
         FROM h ORDER BY shard, position""",
    "q110_distribution_match" ->
      raw"""WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         t(lang, t_e4) AS (VALUES ('en',2000),('de',2000),('fr',2000),
           ('es',2000),('zh',2000)),
         j AS (SELECT n.lang, n.n, t.t_e4 FROM n JOIN t USING (lang)),
         sc AS (SELECT min(n*10000 // t_e4) AS scale FROM j),
         r AS (SELECT lang, n, t_e4, (sc.scale*t_e4) // n AS rate_e4
           FROM j, sc),
         d AS (SELECT doc.lang, r.t_e4, r.rate_e4,
             CASE WHEN CAST(('0x'||substr(md5('dist:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
               % 10000 < r.rate_e4 THEN 1 ELSE 0 END AS keep
           FROM documents doc JOIN r USING (lang))
         SELECT lang, CAST(t_e4 AS BIGINT) AS t_e4,
           CAST(rate_e4 AS BIGINT) AS rate_e4,
           count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_kept
         FROM d GROUP BY 1, 2, 3 ORDER BY 1""",
    "q106_split_assignment" ->
      raw"""WITH b AS (SELECT source, CAST($tokCountSql AS BIGINT) AS n_tok,
             CAST(('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
               % 10000 AS bucket
           FROM documents)
         SELECT source,
           CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    "q78_priority_sample" ->
      raw"""WITH d AS (SELECT doc_id, lang,
             CAST($tokCountSql AS BIGINT) AS n_tok FROM documents),
         p AS (SELECT doc_id, lang, n_tok,
             CAST(('0x'||substr(md5('ps:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
               // greatest(n_tok, 1) AS priority
           FROM d),
         r AS (SELECT lang, doc_id, n_tok, priority,
             row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rnk
           FROM p)
         SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, n_tok, priority
         FROM r WHERE rnk <= 10 ORDER BY lang, rnk""",
    "q79_skew_report" ->
      """WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS n
           FROM events GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
         SELECT key, n,
           CAST(floor(CAST(n AS DOUBLE)/total*10000 + 0.5) AS BIGINT) AS share_e4,
           CAST(floor(CAST(n AS DOUBLE)/total*10000 + 0.5) AS BIGINT) >= 1000 AS hot
         FROM c, t ORDER BY n DESC, key LIMIT 10""",
    "q64_source_cap" ->
      raw"""WITH s AS (SELECT doc_id, source, $qualitySql AS quality_e4 FROM documents),
         r AS (SELECT source, doc_id, quality_e4,
             row_number() OVER (PARTITION BY source
               ORDER BY quality_e4 DESC, doc_id) AS src_rank
           FROM s)
         SELECT source, CAST(src_rank AS BIGINT) AS src_rank, doc_id, quality_e4
         FROM r WHERE src_rank <= 5 ORDER BY source, src_rank""",
    "q35_sql_revenue_filter" ->
      """SELECT CAST(sum(floor(l_extendedprice * l_discount * 100 + 0.5)) AS BIGINT) AS revenue_cents,
         count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q36_corpus_curation" ->
      raw"""WITH ann AS (SELECT doc_id, text,
           len(regexp_extract_all(text,'[^ -~]')) AS cjk,
           len(regexp_extract_all(lower(text),'\b(the|and|is|of|to)\b')) AS s_en,
           len(regexp_extract_all(lower(text),'\b(der|die|und|ist|ein)\b')) AS s_de,
           len(regexp_extract_all(lower(text),'\b(le|les|des|est|une)\b')) AS s_fr,
           len(regexp_extract_all(lower(text),'\b(el|los|las|una|por)\b')) AS s_es,
           $qualitySql AS q
           FROM documents),
         f AS (SELECT doc_id, text FROM ann
           WHERE cjk = 0
             AND (greatest(s_en,s_de,s_fr,s_es) = 0 OR s_en = greatest(s_en,s_de,s_fr,s_es))
             AND q >= 4000 AND len(text) BETWEEN 50 AND 100000),
         fp AS (SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM f),
         keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
         e AS (SELECT f.doc_id, f.text FROM f JOIN keep USING (doc_id)),
         d AS (SELECT doc_id, CASE WHEN len(text) >= 5
             THEN list_distinct([substr(text, i, 5) for i in range(1, len(text)-3)])
             ELSE [text] END AS shs0 FROM e),
         h AS (SELECT doc_id, len(shs0) AS sz,
             list_transform(shs0, s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT)) AS hs
           FROM d),
         sig AS (SELECT doc_id, sz, list_distinct(hs) AS shs, $sigCols FROM h),
         bands AS ($bandSelects),
         cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         scored AS (SELECT c.a_id, c.b_id,
             len(list_intersect(sa.shs, sb.shs)) AS inter, sa.sz AS sz_a, sb.sz AS sz_b
           FROM cand c JOIN sig sa ON sa.doc_id = c.a_id JOIN sig sb ON sb.doc_id = c.b_id),
         losers AS (SELECT DISTINCT b_id AS doc_id FROM (
             SELECT a_id, b_id,
               CAST(floor(inter/(sz_a + sz_b - inter)*10000 + 0.5) AS BIGINT) AS j
             FROM scored) WHERE j >= 5000)
         SELECT doc_id FROM e WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         ORDER BY doc_id""")
}
