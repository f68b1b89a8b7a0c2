package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** q141: per-source quality calibration — keep each source's top 80% by
    * the q17 composite score, ranked WITHIN the source, instead of one
    * global cutoff. A global threshold silently deletes entire low-register
    * sources (forums, OCR scans) while keeping all of a clean one;
    * per-source rank calibration applies uniform selectivity pressure
    * and preserves the mixture — the complement of q135, which MONITORS
    * per-source quality distributions, where this ACTS on them. The cut
    * is pure integer rank arithmetic, deterministic under ties and
    * engine-portable: a doc survives iff 5·(rank−1) ≥ n_source, i.e. at
    * least a fifth of its source scores strictly below it (rank() gives
    * tied scores the same rank, so equal-quality docs share one fate).
    *
    * Scale shape: the score is a row-local projection; rank and source
    * count ride ONE window partitioned by source (n_sources independent
    * external sorts, the epochShuffle per-shard shape) — no join, no
    * second corpus scan, nothing collected. */
  def q141SourceQualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    val scored = docsWide(spark, dir).select(
      col("doc_id"), col("source"),
      fixedPoint(qualityScore(col("text")), 4).as("quality_e4"))
    val bySource = Window.partitionBy(col("source"))
    scored
      .withColumn("src_rank",
        rank().over(bySource.orderBy(col("quality_e4"))).cast("long"))
      .withColumn("n_src", count(lit(1)).over(bySource))
      .filter(lit(5L) * (col("src_rank") - 1L) >= col("n_src"))
      .orderBy(col("doc_id"))
  }

  /** q18: language-ID confusion matrix — labeled lang × predicted lang. */
  def q18LangidConfusion(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .groupBy(col("lang"), langId(col("text")).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))

  /** q175: mixed-language document detection — q18's language-ID applied
    * PER 32-TOKEN CHUNK (q57's proven non-overlapping chunker), reduced
    * per doc to chunk count, distinct predicted languages, and adjacent
    * chunk-pair language flips; docs predicting ≥ 2 languages flag. The
    * curation signal doc-level langid structurally misses: a document
    * that is half one language half another gets ONE doc-level label and
    * silently pollutes whichever monolingual bucket it lands in — chunk
    * granularity is how fastText-style pipelines catch code-switched and
    * concatenated-crawl pages. Scale shape: the chunk explode is
    * row-local, scoring is per-chunk regex (no shuffle), and the doc
    * rollup rides one uniform doc_id window + aggregate. */
  def q175MixedLangDocs(spark: SparkSession, dir: String): DataFrame = {
    val chunks = graft.operators.Chunker.tokenChunks(
      docsWide(spark, dir), "doc_id", "text", size = 32, stride = 32)
      .select(col("doc_id"), col("chunk_idx"), langId(col("chunk")).as("cl"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
    chunks
      .withColumn("prev", lag(col("cl"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("cl")).as("n_langs"),
        sum(when(col("prev").isNotNull && col("prev") =!= col("cl"), 1L)
          .otherwise(0L)).as("n_flips"))
      .filter(col("n_langs") >= 2)
      .orderBy(col("doc_id"))
  }

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

  /** q142: per-source n-gram diversity — type-token ratio and distinct-
    * bigram ratio per source, the corpus-level self-repetition monitor
    * (the aggregate complement of q67's per-doc repetition filter): a
    * templated or boilerplate-heavy source shows high token volume with
    * a collapsing distinct-bigram ratio long before any pair-level dedup
    * fires, and a falling TTR flags machine-generated spam floods. The
    * integer ratios (one `div` each, no IEEE) make the row engine-exact.
    *
    * Scale shape: two explode→aggregate passes (unigrams, bigrams), each
    * a map-side-combinable count + a two-phase distinct on (source, gram)
    * — the same shuffle class as q16/q52; the result is source-cardinality
    * rows joined source-to-source. The tokenized projection is persisted
    * so the corpus is scanned and tokenized ONCE across both passes
    * (q127's persist → eager-checkpoint → release idiom; the result is
    * source-cardinality rows, so the checkpoint is registry-sized). No
    * pair stage, no corpus-sized window, nothing collected. */
  def q142NgramDiversity(spark: SparkSession, dir: String): DataFrame = {
    val t = docsWide(spark, dir).select(col("source"), wsTokens(col("text")).as("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = t.select(col("source"), explode(col("ts")).as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("n_uni"))
    val big = t.select(col("source"), explode(wordBigrams(col("ts"))).as("bg"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_big"), countDistinct(col("bg")).as("n_big_d"))
    val out = uni.join(big, Seq("source"))
      .select(col("source"), col("n_tok"), col("n_uni"), col("n_big"), col("n_big_d"),
        when(col("n_tok") > 0, expr("n_uni * 10000L div n_tok")).otherwise(0L).as("ttr_e4"),
        when(col("n_big") > 0, expr("n_big_d * 10000L div n_big")).otherwise(0L).as("big_div_e4"))
      .orderBy(col("source"))
      .localCheckpoint(true)
    t.unpersist()
    out
  }

  /** q143: token-budget corpus selection — keep the highest-quality docs
    * (q17's composite score, ties broken by doc_id) until the cumulative
    * token count reaches half the corpus: the data-constrained regime's
    * core primitive ("we can afford B training tokens — which documents?"),
    * the budgeted counterpart of q141's fixed-share cut. Selection rule is
    * a total order, so the kept set is exactly a prefix — integer
    * arithmetic end to end.
    *
    * Scale shape: the naive formulation is ONE global cumsum window — a
    * single task holding the corpus. Instead the prefix decomposes: token
    * sums per quality bucket (≤ 10001 rows — map-side combinable), the
    * strictly-higher-bucket running total over that TINY frame, broadcast
    * back; the only corpus-sized window partitions BY quality bucket
    * (parallel, bucket-bounded state) for the within-bucket doc_id cumsum.
    * cum_tok = hi_tok + within — identical to the global cumsum, with no
    * global funnel. The regex-heavy score projection is persisted
    * (narrow: three longs/row) so the corpus is scanned and scored
    * exactly ONCE across the census and per-doc passes — q127's
    * persist → eager-checkpoint → release idiom. */
  def q143TokenBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val scored = docsWide(spark, dir).select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tok"),
      fixedPoint(qualityScore(col("text")), 4).as("quality_e4"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = scored.groupBy(col("quality_e4"))
      .agg(sum(col("n_tok")).as("bucket_tok"))
    val wHi = Window.orderBy(col("quality_e4").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hi = buckets.select(col("quality_e4"),
      coalesce(sum(col("bucket_tok")).over(wHi), lit(0L)).as("hi_tok"))
    val budget = buckets.agg(expr("sum(bucket_tok) div 2").as("budget"))
    val wIn = Window.partitionBy(col("quality_e4")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = scored
      .withColumn("cum_in", sum(col("n_tok")).over(wIn))
      .join(broadcast(hi), Seq("quality_e4"))
      .join(broadcast(budget), lit(true))
      .withColumn("cum_tok", col("hi_tok") + col("cum_in"))
      .filter(col("cum_tok") <= col("budget"))
      .select(col("doc_id"), col("quality_e4"), col("n_tok"), col("cum_tok"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    scored.unpersist()
    out
  }

  /** q145: temperature-budgeted mixture selection — q73's α=0.5
    * temperature weights allocate a global token budget (half the corpus)
    * ACROSS sources, then each source independently keeps its
    * highest-quality docs (q17 score, doc_id tie-break) until its own
    * allocation is spent: the full "design the mixture, then fill it with
    * the best documents" pipeline step. Flat-share budgeting starves
    * scarce sources; α=0.5 up-weights them (√-mass) exactly as
    * multilingual mixture design does, and the per-source fill keeps the
    * selection quality-maximal WITHIN each allocation. Integer end to end
    * (the √ is q73's fixedPoint — one IEEE sqrt of an exact integer per
    * source, engine-identical).
    *
    * Scale shape: q143's decomposition applied per source — the corpus
    * window partitions by (source, quality bucket), never by source alone
    * (a 30%-of-corpus source would otherwise funnel into one task); the
    * running totals ride the sources×buckets census frame, weights and
    * budgets are source-cardinality broadcasts; the regex-scored
    * projection is persisted so the corpus is scanned once. */
  def q145MixtureBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val scored = docsWide(spark, dir).select(
      col("doc_id"), col("source"),
      tokenCount(col("text")).cast("long").as("n_tok"),
      fixedPoint(qualityScore(col("text")), 4).as("quality_e4"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = scored.groupBy(col("source"), col("quality_e4"))
      .agg(sum(col("n_tok")).as("bucket_tok"))
    val wHi = Window.partitionBy(col("source")).orderBy(col("quality_e4").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hi = buckets.select(col("source"), col("quality_e4"),
      coalesce(sum(col("bucket_tok")).over(wHi), lit(0L)).as("hi_tok"))
    val mass = buckets.groupBy(col("source")).agg(sum(col("bucket_tok")).as("n_tokens"))
    val w = mass.select(col("source"),
      fixedPoint(sqrt(col("n_tokens").cast("double")), 4).as("w_e4"))
    val glob = mass.agg(expr("sum(n_tokens) div 2").as("b"))
    val wTot = w.agg(sum(col("w_e4")).as("wt"))
    val sb = w.join(broadcast(glob), lit(true)).join(broadcast(wTot), lit(true))
      .select(col("source"), expr("b * w_e4 div wt").as("src_budget"))
    val wIn = Window.partitionBy(col("source"), col("quality_e4"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = scored
      .withColumn("cum_in", sum(col("n_tok")).over(wIn))
      .join(broadcast(hi), Seq("source", "quality_e4"))
      .join(broadcast(sb), Seq("source"))
      .withColumn("cum_tok", col("hi_tok") + col("cum_in"))
      .filter(col("cum_tok") <= col("src_budget"))
      .select(col("doc_id"), col("source"), col("quality_e4"), col("n_tok"),
        col("cum_tok"), col("src_budget"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    scored.unpersist()
    out
  }

  /** q149: quality-filter agreement audit — per source, the 2×2
    * contingency between the learned filter (q123's frozen model,
    * keep ≡ logit > 0) and the heuristic composite (q17's score at the
    * fixed 0.5 operating point): where the two keep decisions agree, the
    * call is safe; a source with high model-only or heuristic-only mass
    * is exactly where one of the filters is wrong for that register and
    * a human should look before 100 TB of it is kept or dropped. The
    * "which filter do I trust where" input that ties the two quality
    * surfaces together. Integer counts, one division.
    *
    * Scale shape: both scores are row-local projections over ONE scan;
    * the aggregate is five conditional sums per source — map-side
    * combinable, source-cardinality output, no join, no window. */
  def q149FilterAgreement(spark: SparkSession, dir: String): DataFrame = {
    val t = docsWide(spark, dir).select(
      col("source"),
      graft.operators.QualityModel.keep(col("text")).as("mk"),
      (fixedPoint(qualityScore(col("text")), 4) >= 5000L).as("hk"))
    t.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("mk") && col("hk"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("mk") && !col("hk"), 1L).otherwise(0L)).as("n_model_only"),
        sum(when(!col("mk") && col("hk"), 1L).otherwise(0L)).as("n_heur_only"),
        sum(when(!col("mk") && !col("hk"), 1L).otherwise(0L)).as("n_neither"))
      .select(col("source"), col("n_docs"), col("n_both"), col("n_model_only"),
        col("n_heur_only"), col("n_neither"),
        expr("(n_both + n_neither) * 10000L div n_docs").as("agree_e4"))
      .orderBy(col("source"))
  }

  /** q92: bigram-LM fluency score — the conditional-probability upgrade of
    * q52's unigram proxy (CCNet-style perplexity filters rank docs by how
    * predictable each token is from its predecessor; rare CONTEXTS, not
    * just rare tokens, mark noise). p(w₂|w₁) = c(w₁w₂)/c(w₁·) from corpus
    * counts, each distinct bigram's probability e4-quantized ONCE, then a
    * per-doc integer mean — exact in any aggregation order. Counts derive
    * from one row-local bigram projection: the context table is sum(cnt)
    * over the bigram table (vocab²-bounded), never a second corpus pass. */
  def q92BigramLm(spark: SparkSession, dir: String): DataFrame = {
    val toks = docsWide(spark, dir)
      .select(col("doc_id"), wsTokens(col("text")).as("ts"))
    val big = toks.select(col("doc_id"), explode(wordBigrams(col("ts"))).as("bg"))
    val freq = big.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val ctx = freq.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("cnt")).as("ctx"))
    val prob = freq.withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, "w1")
      .select(col("bg"), fixedPoint(col("cnt") / col("ctx"), 4).as("p_e4"))
    // NO forced broadcast: the bigram table is vocab²-bounded — tiny here,
    // but potentially billions of rows at corpus scale. AQE broadcasts it
    // when it measures small; otherwise this is a shuffle join on uniform
    // string keys (unlike q52's unigram table, which is always vocab-sized).
    val perDoc = big.join(prob, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_e4")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        fixedPoint(col("s") / col("n_bigrams"), 0).as("mean_p_e4"))
    Tables(spark, dir, "documents").select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("mean_p_e4"), lit(0L)).as("mean_p_e4"))
      .orderBy(col("doc_id"))
  }

  /** The q93 blocklist fixture: mixed 2/3/4-word phrases, some present in
    * the corpus and some deliberately absent (the absent ones prove the
    * match is consecutive-sequence, not bag-of-words). MUST stay equal to
    * the VALUES list in the q93 oracle. */
  private val BlockPhrases = Seq(
    "table hash", "slow key", "customer join", "drop table", "select star",
    "slow filter value", "the part data", "key agg row scan")

  /** q93: blocklist phrase filtering — which documents contain which
    * policy-list phrases, and how often. One corpus scan emits every
    * 2/3/4-word gram row-locally; the broadcast phrase join keeps matches
    * only, so the single shuffle carries violations, not the corpus. */
  def q93Blocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val phrases = BlockPhrases.toDF("phrase")
    graft.operators.Blocklist.matches(
      docsWide(spark, dir), phrases, "doc_id", "text")
      .orderBy(col("doc_id"), col("phrase"))
  }

  /** q94: per-language quality-quantile gate — keep the top 75% of docs by
    * quality score WITHIN each language (a global threshold would let a
    * high-scoring language crowd out the rest of the mixture; per-stratum
    * quantiles are how production filters set their cut). The threshold is
    * pure integer arithmetic — rank·4 ≤ n·3 — no percentile doubles to
    * disagree on. One window per language stratum: scales as long as no
    * single language is a whole-cluster partition, the documented
    * window-per-stratum envelope. */
  def q94QualityGate(spark: SparkSession, dir: String): DataFrame = {
    val scored = docsWide(spark, dir).select(
      col("doc_id"), col("lang"),
      fixedPoint(qualityScore(col("text")), 4).as("quality_e4"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality_e4").desc, col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .select(col("doc_id"), col("lang"), col("quality_e4"),
        (col("rn") * 4 <= col("n") * 3).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** q123: model-based quality filtering — the frozen linear classifier
    * (QualityModel) scored over every document: raw logit (e4 fixed-point)
    * plus the p>0.5 keep decision. One codegen'd scan, no shuffle — the
    * per-document cost a 100 TB filtering pass actually pays. */
  def q123QualityModel(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(
        col("doc_id"),
        graft.operators.QualityModel.logitE4(col("text")).as("logit_e4"),
        graft.operators.QualityModel.keep(col("text")).as("keep"))
      .orderBy(col("doc_id"))

  /** q165: TRAINING the quality model — q123 scores with pasted frozen
    * weights; this fits them: 16 rounds of deterministic full-batch
    * gradient descent (hard-sigmoid logistic surrogate, e4-integer
    * mean-centered features, floor-quantized lr=16 updates —
    * [[graft.operators.QualityModel.trainHardSigmoid]]) distilling the
    * q17 heuristic composite (label: quality_e4 ≥ 5000) into the
    * six-feature linear model, then every document scored with the
    * LEARNED weights via the q123 scan shape. The fit is non-degenerate
    * at every gate scale (0.88–0.91 label agreement vs the 0.81–0.82
    * keep-all base rate). The oracle unrolls the identical 16 iterations
    * in SQL — same integer means, same zero init, same gradient sums,
    * same floor updates — so a hash match proves the distributed fit is
    * replayable bit-for-bit by another engine: the strongest determinism
    * statement a training job can make. Per round the cost is ONE
    * map-side-combinable aggregate over the persisted quantized feature
    * frame; seven longs reach the driver (the kmeans pattern). The final
    * scoring reads the SAME persisted frame (doc_id rides along), so the
    * whole job pays exactly one regex extraction pass over the corpus;
    * the scored result is localCheckpoint'd so the frame can be
    * unpersisted before the query returns. */
  def q165QualityTrain(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityModel
    val docs = docsWide(spark, dir)
    val label = fixedPoint(qualityScore(col("text")), 4) >= 5000L
    val (traj, feats) = QualityModel.trainHardSigmoidTrajectoryKeepFeatures(
      docs, "text", label, Seq("doc_id"), iters = 16, lr = 16L)
    try {
      feats.select(col("doc_id"),
          QualityModel.trainedScoreE8FromFeatures(traj.last).as("score_e8"))
        .withColumn("keep", col("score_e8") > 0L)
        .localCheckpoint(true)
        .orderBy(col("doc_id"))
    } finally feats.unpersist()
  }

  /** q168: the training curve for q165's fit — documents kept and
    * label agreement at 4, 8, and 16 GD iterations, ALL from ONE
    * training run: GD iterations form a chain, so the t-iteration model
    * is a prefix of the 16-iteration trajectory (the q147 merge-prefix
    * property applied to training) — one fit, three curve points, and
    * one scoring scan computing all three models' decisions as parallel
    * columns. The "when does training stop buying agreement" input that
    * decides the iteration budget before fitting at 100 TB. The oracle
    * reads the SAME three points from its unrolled 16-CTE chain (w4, w8,
    * w16 are intermediate CTEs of q165's derivation — nothing re-trains). */
  def q168TrainingCurve(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityModel
    val docs = docsWide(spark, dir)
    val label = fixedPoint(qualityScore(col("text")), 4) >= 5000L
    val (traj, feats) = QualityModel.trainHardSigmoidTrajectoryKeepFeatures(
      docs, "text", label, Nil, iters = 16, lr = 16L)
    val points = Seq(4, 8, 16)
    // curve points score against the persisted training frame (y is already
    // a column of it) — zero additional extraction passes over the text
    val scored = feats.select(
      col("y") +:
        points.map(p =>
          (QualityModel.trainedScoreE8FromFeatures(traj(p - 1)) > 0L)
            .cast("long").as(s"k$p")): _*)
    val agg = scored.agg(
      count(lit(1)).as("n"),
      points.flatMap(p => Seq(
        sum(col(s"k$p")).as(s"nk$p"),
        sum(when(col(s"k$p") === col("y"), 1L).otherwise(0L)).as(s"na$p"))): _*)
    // collect the 1-row aggregate ONCE and build the 3-row curve locally —
    // a union of selects over the uncached agg would re-run the full
    // scoring scan per curve point
    val row = try agg.head() finally feats.unpersist()
    val n = row.getAs[Long]("n")
    import spark.implicits._
    // empty corpus: the per-point sums are null and the agreement ratio is
    // undefined — emit the 3 curve points with null agree_e4 (the
    // null-tolerant shape the SQL `div` formulation had) instead of NPEing
    // on primitive unboxing / dividing by zero
    if (n == 0L)
      points.map(p => (p.toLong, 0L)).toDF("iters", "n_keep")
        .withColumn("agree_e4", lit(null).cast("long"))
        .orderBy(col("iters"))
    else
      points.map { p =>
        (p.toLong, row.getAs[Long](s"nk$p"), row.getAs[Long](s"na$p") * 10000L / n)
      }.toDF("iters", "n_keep", "agree_e4").orderBy(col("iters"))
  }

  /** q199: per-feature importance of the TRAINED quality model — the
    * filter-audit surface that answers "which signal actually drives the
    * keep decision": importance_j = |w_j| · sd_j, the trained weight
    * magnitude scaled by the feature's corpus standard deviation (a large
    * weight on a near-constant feature moves nothing; a modest weight on
    * a high-variance feature dominates). Same 16-round fit as q165 (the
    * oracle reuses the identical unrolled CTE chain), plus ONE aggregate
    * over the persisted training frame for the six Σ(fⱼ−μⱼ)² sums —
    * exact integers; sd is the one terminal sqrt (IEEE-correctly-rounded
    * in both engines over an exactly-representable quotient), rounded to
    * e4, and the importance product |w|·sd is then pure integer. Output
    * is six rows, importance-ranked — the "can I drop this feature /
    * what do I tune next" input a production filter audit reads. */
  def q199FeatureImportance(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityModel
    import spark.implicits._
    val docs = docsWide(spark, dir)
    val label = fixedPoint(qualityScore(col("text")), 4) >= 5000L
    val (traj, feats) = QualityModel.trainHardSigmoidTrajectoryKeepFeatures(
      docs, "text", label, Nil, iters = 16, lr = 16L)
    val tw = traj.last
    val row =
      try feats.agg(
        count(lit(1)).as("n"),
        (0 until 6).map(j => sum((col(s"f$j") - lit(tw.mu(j)))
          * (col(s"f$j") - lit(tw.mu(j)))).as(s"s$j")): _*).head()
      finally feats.unpersist()
    val n = row.getLong(0)
    val names = Seq("len_sat", "punct_density", "stopword_nat",
      "digit_density", "chars_per_tok", "non_ascii")
    names.zipWithIndex.map { case (name, j) =>
      val sd = math.floor(math.sqrt(row.getLong(j + 1).toDouble / n) + 0.5).toLong
      (name, tw.w(j), sd, math.abs(tw.w(j)) * sd)
    }.toDF("feature", "w_e4", "sd_e4", "importance_e8")
      .orderBy(col("importance_e8").desc, col("feature"))
  }

  /** q200: calibration (reliability) curve of the TRAINED quality model —
    * docs binned by the model's hard-sigmoid confidence (10 e4-probability
    * bins), each bin reporting its mean predicted probability next to the
    * EMPIRICAL label rate. The "is 0.9 confidence actually right 90% of
    * the time" audit that decides whether the keep threshold can move to
    * another operating point without relabeling — the q165-family's
    * fourth surface (fit → curve-over-iterations → feature importance →
    * calibration). Same 16-round fit; the scoring pass reads the
    * persisted training frame (probability is a pure integer clamp of the
    * e8 logit) and one 10-row aggregate follows. Every cell is integer —
    * means are integer DIVs — so the oracle (the q165 chain + one rollup)
    * matches bit-for-bit. */
  def q200CalibrationCurve(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityModel
    val docs = docsWide(spark, dir)
    val label = fixedPoint(qualityScore(col("text")), 4) >= 5000L
    val (traj, feats) = QualityModel.trainHardSigmoidTrajectoryKeepFeatures(
      docs, "text", label, Nil, iters = 16, lr = 16L)
    try {
      feats
        .select(QualityModel.trainedProbE4FromFeatures(traj.last).as("p"),
          col("y"))
        .groupBy(least(expr("p div 1000"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(p) div count(1)").as("mean_p_e4"),
          expr("sum(y) * 10000 div count(1)").as("label_rate_e4"))
        .orderBy(col("bin"))
        .localCheckpoint(true)
    } finally feats.unpersist()
  }

  /** q135: quality-distribution drift per source — each source's
    * quality-score decile histogram compared between snapshot A (even
    * doc_id) and snapshot B (odd doc_id) by exact-integer total-variation
    * distance (Profiler.distributionDrift). Closes the drift family:
    * q131 tokens, q133 embeddings, q135 quality — the three monitors a
    * recurring-crawl pipeline runs before trusting a new snapshot. */
  def q135QualityDrift(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = q135Bucketed(spark, dir)
    // snapshot split on the doc-id BLOCK, not doc_id parity: the fixture
    // assigns source = src{doc_id % 20}, so a parity split would put each
    // source wholly in one snapshot (drift undefined everywhere); block
    // parity cycles every source through both snapshots
    graft.ext.Profiler.distributionDrift(
      bucketed.filter(expr("(doc_id div 20) % 2") === 0),
      bucketed.filter(expr("(doc_id div 20) % 2") === 1),
      "source", "decile")
      .orderBy(col("source"))
  }

  /** The q135 bucketing: integer decile bucket quality_e4 DIV 1000 ∈
    * [0, 10] — exact integer division on both engines. */
  private def q135Bucketed(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(col("doc_id"), col("source"),
        fixedPoint(qualityScore(col("text")), 4).as("q_e4"))
      .select(col("doc_id"), col("source"), expr("q_e4 div 1000").as("decile"))

  /** q137: q135's quality drift served from the VERSIONED PROFILE STORE —
    * each snapshot's decile histogram is committed as a Warehouse version
    * (ProfileStore.snapshot), and the drift replays from the two stored
    * versions alone (Warehouse.readAt time travel), with neither corpus
    * snapshot re-scanned. Same oracle SQL as q135: the store is a serving
    * path, not a different metric — at 100 TB the corpus scan happens
    * once per snapshot, and every later "how far since version v" is a
    * registry-scale join. */
  def q137ProfileStoreDrift(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = q135Bucketed(spark, dir)
    val whDir = java.nio.file.Files.createTempDirectory("graft_q137_")
    val wh = new graft.core.Warehouse(spark, whDir.toString)
    val va = graft.ext.ProfileStore.snapshot(wh, "mon", "quality",
      bucketed.filter(expr("(doc_id div 20) % 2") === 0), "source", "decile")
    val vb = graft.ext.ProfileStore.snapshot(wh, "mon", "quality",
      bucketed.filter(expr("(doc_id div 20) % 2") === 1), "source", "decile")
    QueryUtil.withTempWarehouse(whDir) {
      graft.ext.ProfileStore.drift(wh, "mon", "quality", va, vb, "source")
        .orderBy(col("source"))
    }
  }

  /** q151: per-document token surprisal — mean bits-per-token under the
    * corpus unigram LM, with the log2 taken EXACTLY as the binary-digit
    * count of an integer ratio: bits(token) = len(bin(N_total div cnt)),
    * so a token carrying 1/1024 of the corpus mass scores 11 bits and the
    * most common token scores ~1. The log-space complement of q52's mean-
    * frequency commonness: q52 ranks by how MUCH of a doc is common
    * tokens (linear in probability, dominated by stopwords), q151 by the
    * information content of the whole doc (log-scale, where one hapax
    * legomenon outweighs fifty "the"s) — the deterministic stand-in for
    * the perplexity filters a curation pipeline runs (CCNet-style): low
    * bits ≈ boilerplate, high bits ≈ novel or gibberish, both tails worth
    * inspecting. `bin()` is engine-portable integer plumbing (Spark and
    * DuckDB both print exact binary digits), so the score needs NO
    * transcendental log — every value is integer-exact cross-engine.
    *
    * Scale shape: q52's exact plan class — one token explode into a
    * map-side-combinable vocab count, bits computed ONCE per vocab entry
    * (vocab-sized frame, not per occurrence), the occurrence stream joins
    * the broadcast per-token bits and folds into one integer sum per doc.
    * One corpus-sized shuffle (the per-doc aggregate); the division is a
    * single integer DIV at the end. */
  def q151TokenSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val occ = docsWide(spark, dir)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
    val freq = occ.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val bits = freq.join(broadcast(total), lit(true))
      .select(col("token"),
        length(bin(expr("total div cnt"))).cast("long").as("bits"))
    occ.join(broadcast(bits), "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("bits")).as("s"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr("s * 10000L div n_tokens").as("surprisal_e4"))
      .orderBy(col("doc_id"))
  }

  /** q152: bigram collocation lift — the top-50 adjacent word pairs that
    * co-occur far more than their unigram frequencies predict: lift =
    * P(ab) / (P(a)·P(b)), the exponentiated PMI. The phrase-mining /
    * tokenizer-design input ("New York", "et al") and the template
    * detector (a machine-generated corpus shows absurd lifts on its
    * boilerplate transitions); multi-word entities found here are what a
    * vocab learner (q117/q118) should keep whole. minCount 5 drops the
    * noise floor where one co-occurrence of two hapaxes scores N².
    * The lift is one pinned-order IEEE chain over exact integer counts
    * (q123's determinism contract): both engines compute
    * ((c_ab·N_uni)·N_uni) / ((N_big·c_a)·c_b) with identical
    * association, so the doubles — and the e4 floor — are bit-identical.
    *
    * Scale shape: the tokenized projection is persisted and scanned twice
    * (unigram + bigram explode, each a map-side-combinable count); the
    * surviving ≥ minCount bigram frame (collocation-scale, not corpus-
    * scale) joins the vocab counts twice on the word key; totals are
    * one-row broadcasts; the cut is TakeOrdered on (lift, pair) — no
    * corpus-sized window, nothing driver-side. Output is 50 rows. */
  def q152CollocationLift(spark: SparkSession, dir: String): DataFrame = {
    val t = docsWide(spark, dir).select(wsTokens(col("text")).as("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = t.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totals = t.agg(
      sum(size(col("ts")).cast("long")).as("n_uni"),
      sum(greatest(size(col("ts")) - 1, lit(0)).cast("long")).as("n_big"))
    val big = t.select(explode(wordBigrams(col("ts"))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"), col("c_ab"))
    val out = big
      .join(uni.select(col("tok").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), Seq("w2"))
      .join(broadcast(totals), lit(true))
      .withColumn("lift_e4", floor(
        (col("c_ab").cast("double") * col("n_uni").cast("double")
          * col("n_uni").cast("double"))
          / (col("n_big").cast("double") * col("c_a").cast("double")
            * col("c_b").cast("double")) * 10000.0 + 0.5).cast("long"))
      .select(col("w1"), col("w2"), col("c_ab"), col("lift_e4"))
      .orderBy(col("lift_e4").desc, col("w1"), col("w2"))
      .limit(50)
      .localCheckpoint(true)
    t.unpersist()
    out
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_quality_drift" -> (q135QualityDrift _),
    "q151_token_surprisal" -> (q151TokenSurprisal _),
    "q152_collocation_lift" -> (q152CollocationLift _),
    "q137_profile_store_drift" -> (q137ProfileStoreDrift _),
    "q16_token_stats" -> (q16TokenStats _),
    "q123_quality_model" -> (q123QualityModel _),
    "q165_quality_train" -> (q165QualityTrain _),
    "q168_training_curve" -> (q168TrainingCurve _),
    "q199_quality_feature_importance" -> (q199FeatureImportance _),
    "q200_quality_calibration_curve" -> (q200CalibrationCurve _),
    "q92_bigram_lm" -> (q92BigramLm _),
    "q93_blocklist" -> (q93Blocklist _),
    "q94_quality_gate" -> (q94QualityGate _),
    "q17_quality_scores" -> (q17QualityScores _),
    "q141_source_quality_calibration" -> (q141SourceQualityCalibration _),
    "q142_ngram_diversity" -> (q142NgramDiversity _),
    "q143_token_budget_select" -> (q143TokenBudgetSelect _),
    "q145_mixture_budget_select" -> (q145MixtureBudgetSelect _),
    "q149_filter_agreement" -> (q149FilterAgreement _),
    "q18_langid_confusion" -> (q18LangidConfusion _),
    "q175_mixed_lang_docs" -> (q175MixedLangDocs _),
    "q19_fingerprint_dedup" -> (q19FingerprintDedup _),
    "q52_token_commonness" -> (q52TokenCommonness _))

  private[queries] val tokCountSql =
    raw"CASE WHEN len(trim(text))=0 THEN 0 ELSE len(regexp_split_to_array(trim(text),'\s+')) END"
  private[queries] val punctCountSql = raw"len(regexp_extract_all(text,'[^A-Za-z0-9\s]'))"
  private[queries] val stopCountSql =
    raw"len(regexp_extract_all(lower(text),'\b(the|and|is|of|to|in|a|for|on|it)\b'))"

  // q123: the frozen QualityModel weights, replayed feature-for-feature.
  // The logit accumulates bias-first, left-to-right — the same IEEE op
  // order as QualityModel.logit, so the doubles are bit-identical.
  private val q123LogitSql =
    raw"""(-1.2 + 2.4*least(n_tok/200.0, 1.0)
      + (-3.5)*(CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)
      + 1.6*least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)
      + (-2.0)*(CASE WHEN n_chr>0 THEN n_dig/CAST(n_chr AS DOUBLE) ELSE 0.0 END)
      + (-0.8)*least(CASE WHEN n_tok>0 THEN CAST(n_chr AS DOUBLE)/(n_tok*20.0) ELSE 0.0 END, 1.0)
      + (-0.5)*(CASE WHEN n_na>0 THEN 1.0 ELSE 0.0 END))"""

  // q135: the q17 quality chain bucketed to deciles, then the same
  // exact-integer TV arithmetic as q131's oracle, per source between
  // the even/odd snapshots (full outer on buckets, inner on slices).
  // q137 serves the identical metric from the versioned profile store,
  // so it shares this oracle verbatim.
  private val q135DriftSql =
    raw"""WITH t AS (SELECT doc_id, source, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop, len(text) AS n_chr
           FROM documents),
         q AS (SELECT doc_id, source,
             CAST(floor((least(n_tok/100.0, 1.0)*0.4
               + (1.0 - CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)*0.3
               + least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT)
               // 1000 AS decile
           FROM t),
         ha AS (SELECT source AS src, decile AS bk, count(*) AS n FROM q
           WHERE (doc_id // 20) % 2 = 0 GROUP BY 1, 2),
         hb AS (SELECT source AS src, decile AS bk, count(*) AS n FROM q
           WHERE (doc_id // 20) % 2 = 1 GROUP BY 1, 2),
         ta AS (SELECT src, CAST(sum(n) AS BIGINT) AS nta FROM ha GROUP BY 1),
         tb AS (SELECT src, CAST(sum(n) AS BIGINT) AS ntb FROM hb GROUP BY 1),
         j AS (SELECT coalesce(ha.src, hb.src) AS src, coalesce(ha.bk, hb.bk) AS bk,
             coalesce(ha.n, 0) AS na, coalesce(hb.n, 0) AS nb
           FROM ha FULL OUTER JOIN hb ON ha.src = hb.src AND ha.bk = hb.bk),
         p AS (SELECT j.src, max(ta.nta) AS n_a, max(tb.ntb) AS n_b,
             CAST(sum(abs(j.na*tb.ntb - j.nb*ta.nta)) AS BIGINT) AS s
           FROM j JOIN ta ON ta.src = j.src JOIN tb ON tb.src = j.src
           GROUP BY 1)
         SELECT src AS source, n_a, n_b,
           CAST(floor(CAST(s AS DOUBLE)*10000.0/(2.0*n_a*n_b) + 0.5) AS BIGINT) AS tv_e4
         FROM p ORDER BY source"""

  // q165: the training replay — e4 feature CTE (+ the q17-composite label),
  // then THREE unrolled GD iterations, each one gradient-sum CTE over the
  // feature frame crossed with the previous 1-row weight CTE and one
  // floor-quantized weight-update CTE; MATERIALIZED hints keep the chain
  // from inline-exploding (the q100 discipline). Every number is an
  // integer exactly representable in a double, so the engines agree.
  private def q165TrainSql: String = q165Derived._1
  private def q168CurveSql: String = q165Derived._2
  private def q199ImportanceSql: String = q165Derived._3
  private def q200CalibrationSql: String = q165Derived._4

  /** One CTE chain (features → means → centered frame → 16 unrolled GD
    * iterations), four final selects: q165 scores every doc under w16;
    * q168 reads the training curve off the INTERMEDIATE weight CTEs
    * (w4/w8/w16 — the chain's own prefixes, nothing re-trains); q199
    * ranks the six features by |w16 weight| · corpus sd (one Σf² CTE over
    * the centered frame — f0..f5 in `f` are already mean-centered); q200
    * bins the w16 hard-sigmoid probability into the 10-cell reliability
    * rollup. */
  private lazy val q165Derived: (String, String, String, String) = {
    val iters = 16
    val zSql = "(w.b*10000 + w.w0*f.f0 + w.w1*f.f1 + w.w2*f.f2 + " +
      "w.w3*f.f3 + w.w4*f.f4 + w.w5*f.f5)"
    val iterCtes = (1 to iters).map { k =>
      val prev = if (k == 1) "w0" else s"w${k - 1}"
      val gTerms = (0 to 5).map(j => s"CAST(sum(e*f$j) AS BIGINT) AS g$j")
        .mkString(", ")
      val wTerms = (0 to 5).map(j =>
        s"CAST(w.w$j - floor(g.g$j*16/(nn.n*10000.0) + 0.5) AS BIGINT) AS w$j")
        .mkString(", ")
      s"""g$k AS (SELECT $gTerms, CAST(sum(e*10000) AS BIGINT) AS gb
          FROM (SELECT greatest(0, least(10000,
              5000 + CAST(floor($zSql/40000.0) AS BIGINT))) - 10000*f.y AS e,
              f.f0, f.f1, f.f2, f.f3, f.f4, f.f5
            FROM f, $prev w)),
         w$k AS MATERIALIZED (SELECT
           CAST(w.b - floor(g.gb*16/(nn.n*10000.0) + 0.5) AS BIGINT) AS b, $wTerms
          FROM g$k g, $prev w, nn)"""
    }.mkString(",\n")
    val scoreSql = s"(w.b*10000 + w.w0*f.f0 + w.w1*f.f1 + w.w2*f.f2 + " +
      s"w.w3*f.f3 + w.w4*f.f4 + w.w5*f.f5)"
    val withChain = raw"""WITH t AS (SELECT doc_id, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop,
           len(regexp_extract_all(text,'[0-9]')) AS n_dig,
           len(regexp_extract_all(text,'[^ -~]')) AS n_na,
           len(text) AS n_chr FROM documents),
         fr AS MATERIALIZED (SELECT doc_id,
           least(n_tok*50, 10000) AS f0,
           CASE WHEN n_chr>0 THEN CAST(floor(n_punct*10000.0/n_chr + 0.5) AS BIGINT) ELSE 0 END AS f1,
           least(CASE WHEN n_tok>0 THEN CAST(floor(n_stop*50000.0/n_tok + 0.5) AS BIGINT) ELSE 0 END, 10000) AS f2,
           CASE WHEN n_chr>0 THEN CAST(floor(n_dig*10000.0/n_chr + 0.5) AS BIGINT) ELSE 0 END AS f3,
           least(CASE WHEN n_tok>0 THEN CAST(floor(n_chr*500.0/n_tok + 0.5) AS BIGINT) ELSE 0 END, 10000) AS f4,
           CASE WHEN n_na>0 THEN 10000 ELSE 0 END AS f5,
           CASE WHEN CAST(floor((least(n_tok/100.0, 1.0)*0.4
             + (1.0 - CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)*0.3
             + least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT) >= 5000
             THEN 1 ELSE 0 END AS y
           FROM t),
         mu AS (SELECT ${(0 to 5).map(j =>
             s"CAST(floor(sum(f$j)/count(*)) AS BIGINT) AS m$j").mkString(", ")}
           FROM fr),
         f AS MATERIALIZED (SELECT doc_id,
             ${(0 to 5).map(j => s"fr.f$j - mu.m$j AS f$j").mkString(", ")}, y
           FROM fr, mu),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
         w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS w0,
           CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
           CAST(0 AS BIGINT) AS w3, CAST(0 AS BIGINT) AS w4,
           CAST(0 AS BIGINT) AS w5),
         $iterCtes"""
    val trainSql = raw"""$withChain
         SELECT f.doc_id, CAST($scoreSql AS BIGINT) AS score_e8,
           $scoreSql > 0 AS keep
         FROM f, w$iters w ORDER BY f.doc_id"""
    val curvePoint = (p: Int) =>
      raw"""SELECT CAST($p AS BIGINT) AS iters,
           CAST(sum(CASE WHEN $scoreSql > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN (CASE WHEN $scoreSql > 0 THEN 1 ELSE 0 END) = f.y
             THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS agree_e4
         FROM f, w$p w"""
    val curveSql = raw"""$withChain,
         curve AS (${Seq(4, 8, 16).map(curvePoint).mkString("\nUNION ALL\n")})
         SELECT iters, n_keep, agree_e4 FROM curve ORDER BY iters"""
    val featNames = Seq("len_sat", "punct_density", "stopword_nat",
      "digit_density", "chars_per_tok", "non_ascii")
    val impRows = featNames.zipWithIndex.map { case (name, j) =>
      s"""SELECT '$name' AS feature, w.w$j AS w_e4,
           CAST(floor(sqrt(s.s$j/CAST(s.n AS DOUBLE)) + 0.5) AS BIGINT) AS sd_e4
         FROM w$iters w, ssq s"""
    }.mkString("\nUNION ALL\n")
    val importanceSql = raw"""$withChain,
         ssq AS (SELECT CAST(count(*) AS BIGINT) AS n,
           ${(0 to 5).map(j => s"CAST(sum(f$j*f$j) AS BIGINT) AS s$j")
             .mkString(", ")} FROM f),
         imp AS ($impRows)
         SELECT feature, w_e4, sd_e4, abs(w_e4)*sd_e4 AS importance_e8
         FROM imp ORDER BY importance_e8 DESC, feature"""
    val calibrationSql = raw"""$withChain
         SELECT least(p//1000, 9) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p)//count(*) AS BIGINT) AS mean_p_e4,
           CAST(sum(y)*10000//count(*) AS BIGINT) AS label_rate_e4
         FROM (SELECT greatest(0, least(10000,
             5000 + CAST(floor($zSql/40000.0) AS BIGINT))) AS p, f.y
           FROM f, w$iters w)
         GROUP BY 1 ORDER BY bin"""
    (trainSql, curveSql, importanceSql, calibrationSql)
  }

  val oracles: Map[String, String] = Map(
    "q165_quality_train" -> q165TrainSql,
    "q168_training_curve" -> q168CurveSql,
    "q199_quality_feature_importance" -> q199ImportanceSql,
    "q200_quality_calibration_curve" -> q200CalibrationSql,
    "q135_quality_drift" -> q135DriftSql,
    "q137_profile_store_drift" -> q135DriftSql,
    "q123_quality_model" ->
      raw"""WITH t AS (SELECT doc_id, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop,
           len(regexp_extract_all(text,'[0-9]')) AS n_dig,
           len(regexp_extract_all(text,'[^ -~]')) AS n_na,
           len(text) AS n_chr
           FROM documents)
         SELECT doc_id,
           CAST(floor($q123LogitSql*10000 + 0.5) AS BIGINT) AS logit_e4,
           $q123LogitSql > 0.0 AS keep
         FROM t ORDER BY doc_id""",
    "q149_filter_agreement" ->
      raw"""WITH t AS (SELECT source, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop,
           len(regexp_extract_all(text,'[0-9]')) AS n_dig,
           len(regexp_extract_all(text,'[^ -~]')) AS n_na,
           len(text) AS n_chr
           FROM documents),
         k AS (SELECT source,
             $q123LogitSql > 0.0 AS mk,
             CAST(floor((least(n_tok/100.0, 1.0)*0.4
               + (1.0 - CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)*0.3
               + least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT) >= 5000 AS hk
           FROM t),
         a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN mk AND hk THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN mk AND NOT hk THEN 1 ELSE 0 END) AS BIGINT) AS n_model_only,
             CAST(sum(CASE WHEN NOT mk AND hk THEN 1 ELSE 0 END) AS BIGINT) AS n_heur_only,
             CAST(sum(CASE WHEN NOT mk AND NOT hk THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
           FROM k GROUP BY 1)
         SELECT source, n_docs, n_both, n_model_only, n_heur_only, n_neither,
           CAST((n_both + n_neither) * 10000 // n_docs AS BIGINT) AS agree_e4
         FROM a ORDER BY source""",
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
    "q141_source_quality_calibration" ->
      raw"""WITH t AS (SELECT doc_id, source, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop, len(text) AS n_chr
           FROM documents),
         s AS (SELECT doc_id, source,
             CAST(floor((least(n_tok/100.0, 1.0)*0.4
               + (1.0 - CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)*0.3
               + least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT) AS quality_e4
           FROM t),
         r AS (SELECT doc_id, source, quality_e4,
             CAST(rank() OVER (PARTITION BY source ORDER BY quality_e4) AS BIGINT) AS src_rank,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
           FROM s)
         SELECT doc_id, source, quality_e4, src_rank, n_src
         FROM r WHERE 5*(src_rank-1) >= n_src ORDER BY doc_id""",
    "q142_ngram_diversity" ->
      raw"""WITH t AS (SELECT source, CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(trim(text),'\s+') END AS ts FROM documents),
         u AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tok,
             CAST(count(DISTINCT tok) AS BIGINT) AS n_uni
           FROM (SELECT source, unnest(ts) AS tok FROM t) GROUP BY 1),
         b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_big,
             CAST(count(DISTINCT bg) AS BIGINT) AS n_big_d
           FROM (SELECT source,
               unnest([ts[i+1] || ' ' || ts[i+2] for i in range(0, len(ts)-1)]) AS bg
             FROM t) GROUP BY 1)
         SELECT u.source, n_tok, n_uni, n_big, n_big_d,
           CAST(CASE WHEN n_tok>0 THEN n_uni*10000 // n_tok ELSE 0 END AS BIGINT) AS ttr_e4,
           CAST(CASE WHEN n_big>0 THEN n_big_d*10000 // n_big ELSE 0 END AS BIGINT) AS big_div_e4
         FROM u JOIN b USING (source) ORDER BY source""",
    "q143_token_budget_select" ->
      raw"""WITH t AS (SELECT doc_id, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop, len(text) AS n_chr
           FROM documents),
         s AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             CAST(floor((least(n_tok/100.0, 1.0)*0.4
               + (1.0 - CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)*0.3
               + least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT) AS quality_e4
           FROM t),
         tot AS (SELECT CAST(sum(n_tok) // 2 AS BIGINT) AS budget FROM s),
         c AS (SELECT doc_id, quality_e4, n_tok,
             CAST(sum(n_tok) OVER (ORDER BY quality_e4 DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
           FROM s)
         SELECT doc_id, quality_e4, n_tok, cum_tok
         FROM c, tot WHERE cum_tok <= budget ORDER BY doc_id""",
    "q145_mixture_budget_select" ->
      raw"""WITH t AS (SELECT doc_id, source, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop, len(text) AS n_chr
           FROM documents),
         s AS (SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
             CAST(floor((least(n_tok/100.0, 1.0)*0.4
               + (1.0 - CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)*0.3
               + least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT) AS quality_e4
           FROM t),
         m AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM s GROUP BY 1),
         w AS (SELECT source,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))*10000 + 0.5) AS BIGINT) AS w_e4
           FROM m),
         g AS (SELECT CAST(sum(n_tokens) // 2 AS BIGINT) AS b FROM m),
         wt AS (SELECT CAST(sum(w_e4) AS BIGINT) AS wt FROM w),
         sb AS (SELECT source, CAST(g.b * w_e4 // wt.wt AS BIGINT) AS src_budget
           FROM w, g, wt),
         c AS (SELECT doc_id, source, quality_e4, n_tok,
             CAST(sum(n_tok) OVER (PARTITION BY source
               ORDER BY quality_e4 DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
           FROM s)
         SELECT c.doc_id, c.source, c.quality_e4, c.n_tok, c.cum_tok, sb.src_budget
         FROM c JOIN sb USING (source) WHERE cum_tok <= src_budget
         ORDER BY doc_id""",
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
    // q175: q57's chunk CTE + q18's scoring per chunk + a lag window
    "q175_mixed_lang_docs" ->
      raw"""WITH t AS (SELECT doc_id, CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(trim(text),'\s+') END AS tks FROM documents),
         c AS (SELECT doc_id, tks, unnest(range(0, len(tks), 32)) AS s FROM t),
         ch AS (SELECT doc_id, s // 32 AS chunk_idx,
             array_to_string(tks[s+1:s+32], ' ') AS chunk FROM c),
         sc AS (SELECT doc_id, chunk_idx,
             len(regexp_extract_all(chunk,'[^ -~]')) AS cjk,
             len(regexp_extract_all(lower(chunk),'\b(the|and|is|of|to)\b')) AS s_en,
             len(regexp_extract_all(lower(chunk),'\b(der|die|und|ist|ein)\b')) AS s_de,
             len(regexp_extract_all(lower(chunk),'\b(le|les|des|est|une)\b')) AS s_fr,
             len(regexp_extract_all(lower(chunk),'\b(el|los|las|una|por)\b')) AS s_es
           FROM ch),
         p AS (SELECT doc_id, chunk_idx, CASE WHEN cjk > 0 THEN 'zh'
             WHEN s_en = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) > 0 THEN 'en'
             WHEN s_de = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) > 0 THEN 'de'
             WHEN s_fr = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) > 0 THEN 'fr'
             WHEN s_es = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) > 0 THEN 'es'
             ELSE 'und' END AS cl FROM sc),
         f AS (SELECT doc_id, cl,
             lag(cl) OVER (PARTITION BY doc_id ORDER BY chunk_idx) AS prev FROM p),
         a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(DISTINCT cl) AS BIGINT) AS n_langs,
             CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> cl THEN 1 ELSE 0 END) AS BIGINT) AS n_flips
           FROM f GROUP BY 1)
         SELECT doc_id, n_chunks, n_langs, n_flips FROM a
         WHERE n_langs >= 2 ORDER BY doc_id""",
    "q19_fingerprint_dedup" ->
      raw"""SELECT md5(regexp_replace(lower(trim(substr(text,1,40))), '\s+', ' ', 'g')) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q92_bigram_lm" ->
      raw"""WITH t AS (SELECT doc_id, CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(trim(text),'\s+') END AS ts FROM documents),
         big AS (SELECT doc_id,
             unnest([ts[i+1] || ' ' || ts[i+2] for i in range(0, len(ts)-1)]) AS bg FROM t),
         freq AS (SELECT bg, count(*) AS cnt FROM big GROUP BY 1),
         ctx AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(cnt) AS BIGINT) AS ctx
           FROM freq GROUP BY 1),
         prob AS (SELECT bg, CAST(floor(cnt/ctx*10000 + 0.5) AS BIGINT) AS p_e4
           FROM freq JOIN ctx ON split_part(bg, ' ', 1) = w1),
         d AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(p_e4) AS BIGINT) AS s
           FROM big JOIN prob USING (bg) GROUP BY 1)
         SELECT t.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
           coalesce(CAST(floor(s/n_bigrams + 0.5) AS BIGINT), 0) AS mean_p_e4
         FROM t LEFT JOIN d ON t.doc_id = d.doc_id ORDER BY t.doc_id""",
    "q94_quality_gate" ->
      raw"""WITH t AS (SELECT doc_id, lang, $tokCountSql AS n_tok,
           $punctCountSql AS n_punct, $stopCountSql AS n_stop, len(text) AS n_chr
           FROM documents),
         s AS (SELECT doc_id, lang,
           CAST(floor((least(n_tok/100.0, 1.0)*0.4
             + (1.0 - CASE WHEN n_chr>0 THEN n_punct/CAST(n_chr AS DOUBLE) ELSE 0.0 END)*0.3
             + least(CASE WHEN n_tok>0 THEN n_stop*5.0/n_tok ELSE 0.0 END, 1.0)*0.3)*10000 + 0.5) AS BIGINT) AS quality_e4
           FROM t),
         r AS (SELECT *,
           row_number() OVER (PARTITION BY lang ORDER BY quality_e4 DESC, doc_id) AS rn,
           count(*) OVER (PARTITION BY lang) AS n FROM s)
         SELECT doc_id, lang, quality_e4, rn*4 <= n*3 AS kept
         FROM r ORDER BY doc_id""",
    "q93_blocklist" ->
      raw"""WITH ph AS (SELECT regexp_replace(lower(trim(phrase)), '\s+', ' ', 'g') AS g
           FROM (VALUES ('table hash'), ('slow key'), ('customer join'),
             ('drop table'), ('select star'), ('slow filter value'),
             ('the part data'), ('key agg row scan')) t(phrase)),
         t AS (SELECT doc_id, CASE WHEN len(tn)=0 THEN []
             ELSE regexp_split_to_array(tn, '\s+') END AS ts
           FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS tn
             FROM documents)),
         g AS (SELECT doc_id, unnest(
             [array_to_string(list_slice(ts, i+1, i+2), ' ') for i in range(0, len(ts)-1)]
             || [array_to_string(list_slice(ts, i+1, i+3), ' ') for i in range(0, len(ts)-2)]
             || [array_to_string(list_slice(ts, i+1, i+4), ' ') for i in range(0, len(ts)-3)]) AS g
           FROM t)
         SELECT doc_id, g AS phrase, count(*) AS n_hits
         FROM g JOIN ph USING (g) GROUP BY 1, 2 ORDER BY 1, 2""",
    "q52_token_commonness" ->
      raw"""WITH occ AS (SELECT doc_id, unnest(CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(trim(text),'\s+') END) AS token FROM documents),
         freq AS (SELECT token, count(*) AS cnt FROM occ GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
         d AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS s, count(*) AS n
           FROM occ JOIN freq USING (token) GROUP BY 1)
         SELECT doc_id, n AS n_tokens,
           CAST(floor(s/(n*total)*10000 + 0.5) AS BIGINT) AS commonness_e4
         FROM d, tot ORDER BY doc_id""",
    // q151: bits(token) = binary digit count of the integer ratio
    // total // cnt — bin() prints exact digits on both engines, so the
    // "log2" needs no transcendental and the score is integer-exact.
    "q151_token_surprisal" ->
      raw"""WITH occ AS (SELECT doc_id, unnest(CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(trim(text),'\s+') END) AS token FROM documents),
         freq AS (SELECT token, count(*) AS cnt FROM occ GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
         bits AS (SELECT token,
             CAST(len(bin(total // cnt)) AS BIGINT) AS bits FROM freq, tot),
         d AS (SELECT doc_id, CAST(sum(bits) AS BIGINT) AS s, count(*) AS n
           FROM occ JOIN bits USING (token) GROUP BY 1)
         SELECT doc_id, n AS n_tokens,
           CAST(s * 10000 // n AS BIGINT) AS surprisal_e4
         FROM d ORDER BY doc_id""",
    // q152: the lift chain replays Spark's exact IEEE association —
    // ((c_ab·N)·N) / ((N_big·c_a)·c_b), then ·10000, then +0.5 — so the
    // doubles round identically and the floor is bit-exact.
    "q152_collocation_lift" ->
      raw"""WITH t AS (SELECT CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(trim(text),'\s+') END AS ts FROM documents),
         uni AS (SELECT tok, count(*) AS c
           FROM (SELECT unnest(ts) AS tok FROM t) GROUP BY 1),
         tot AS (SELECT CAST(sum(len(ts)) AS BIGINT) AS n_uni,
             CAST(sum(greatest(len(ts)-1, 0)) AS BIGINT) AS n_big FROM t),
         big AS (SELECT bg, count(*) AS c_ab FROM (
             SELECT unnest(CASE WHEN len(ts) < 2 THEN []
               ELSE [ts[i+1] || ' ' || ts[i+2] for i in range(0, len(ts)-1)] END) AS bg
             FROM t) GROUP BY 1 HAVING count(*) >= 5),
         sp AS (SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
             CAST(c_ab AS BIGINT) AS c_ab FROM big),
         j AS (SELECT w1, w2, c_ab,
             CAST(floor(
               (CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE))
               / (CAST(n_big AS DOUBLE) * CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))
               * 10000.0 + 0.5) AS BIGINT) AS lift_e4
           FROM sp JOIN uni a ON a.tok = sp.w1 JOIN uni b ON b.tok = sp.w2, tot)
         SELECT w1, w2, c_ab, lift_e4 FROM j
         ORDER BY lift_e4 DESC, w1, w2 LIMIT 50""")
}
