package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup

/** The composed training-data curation pipeline — the operators of
  * graft.operators/graft.functions chained into the shape an LLM data run
  * actually uses:
  *
  *   1. language-ID + quality scoring (row-local expressions, one scan)
  *   2. filter: target languages, quality floor, length band
  *   3. exact dedup on the canonical fingerprint (keep min id)
  *   4. near-dup removal via MinHash→LSH→Jaccard (keep the smaller id of
  *      each surviving pair)
  *   5. curated output with per-stage survival counts
  *
  * Every stage is declarative; the only shuffles are the exact-dedup
  * groupBy (uniform 128-bit keys) and the LSH candidate join. At 100 TB
  * the stage order matters: cheap row-local filters run FIRST so the
  * expensive near-dup stage sees only the quality-filtered survivors.
  */
object CorpusCuration {

  case class Params(
      langs: Set[String] = Set("en"),
      minQualityE4: Long = 4000L,
      minChars: Int = 50,
      maxChars: Int = 100000,
      minJaccard: Double = 0.5)

  /** Spread regex-heavy row-local work across cores when the input arrives
    * in fewer partitions than the session's parallelism (the byte-small-
    * fixture / few-fat-files case: a 2 MB parquet is ONE split, serializing
    * 8 regex passes per doc onto one core). A 100 TB corpus already has
    * thousands of input splits, so the shuffle is skipped there. */
  private def spread(docs: DataFrame): DataFrame = {
    val target = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (docs.rdd.getNumPartitions < target) docs.repartition(target) else docs
  }

  /** Stage 1+2: annotate and filter. */
  def qualityFilter(docs: DataFrame, p: Params): DataFrame =
    annotateAndFilter(spread(docs), p)

  /** The filter body without the spread — curate() repartitions BEFORE
    * attaching its Observation, because probing `.rdd` on an observed
    * lineage silently swallows the metric (the CollectMetrics node ends up
    * on a plan instance the action never runs). */
  private def annotateAndFilter(docs: DataFrame, p: Params): DataFrame =
    docs
      .withColumn("pred_lang", langId(col("text")))
      .withColumn("quality_e4", fixedPoint(qualityScore(col("text")), 4))
      .filter(col("pred_lang").isin(p.langs.toSeq: _*) &&
        col("quality_e4") >= p.minQualityE4 &&
        length(col("text")).between(p.minChars, p.maxChars))

  /** Stage 3: exact dedup — keep each fingerprint's min doc_id. */
  def exactDeduped(docs: DataFrame, idCol: String): DataFrame =
    docs.join(
      Dedup.exactDedup(docs, idCol, "text").select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Stage 4: near-dup removal — drop the larger id of every verified pair
    * (transitive chains collapse toward the smallest id over iterations;
    * one pass is the standard curation tradeoff). */
  def nearDupRemoved(docs: DataFrame, idCol: String, minJaccard: Double): DataFrame = {
    val losers = Dedup.nearDupPairs(docs, idCol, "text", minJaccard = minJaccard)
      .select(col("b_id").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Stages 3+4 over ONE signing scan — the scale-honest funnel shape:
    * `signDocumentsWithFingerprint` computes the exact-dedup fingerprint
    * AND the MinHash signature/shingle sets in the same text projection,
    * exact survivors come from a min-id-per-fingerprint window (one
    * shuffle of the signed frame — no self-semi-join that would re-derive
    * the input lineage twice), and the near-dup verify runs off the same
    * persisted signatures. Returns (exactIds, curatedIds, signedHandle);
    * the signed frame stays persisted backing both id frames — callers
    * that materialize their results should unpersist the handle after.
    */
  private[ext] def fusedDedup(docs: DataFrame, idCol: String, textCol: String,
                              minJaccard: Double): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    val signed = Dedup.signDocumentsWithFingerprint(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // exact survivors via a NARROW (fp, id) aggregate + semi-join back:
    // column pruning keeps the exact-dedup shuffle to two small columns,
    // and AQE sees the tiny keep-list at runtime and broadcasts the semi
    // join — the wide signature rows never shuffle for this stage. (A
    // min-id window over signed would instead sort-exchange every shingle
    // array.) sigExact persists because every downstream consumer — band
    // join, verify stats, both verify sides, the final anti-join — reads
    // it; signed unpersists once the verify stage has materialized it.
    val keep = signed.groupBy(col("fp")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val sigExact = signed.join(keep, Seq(idCol), "left_semi").drop("fp")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val losers = Dedup.nearDupPairsFromSignatures(sigExact, idCol, minJaccard = minJaccard)
      .select(col("b_id").as(idCol)).distinct()
    // the verify stage's actions above materialized sigExact fully, so the
    // pre-dedup signature cache can go now
    signed.unpersist()
    val curatedIds = sigExact.select(col(idCol)).join(losers, Seq(idCol), "left_anti")
    (sigExact.select(col(idCol)), curatedIds, sigExact)
  }

  /** Surviving doc ids after exact + near-dup dedup, one signing pass
    * (see fusedDedup). The id frame is materialized eagerly (ids only —
    * narrow) so fusedDedup's internal signature cache can be released
    * here rather than leaking for the session lifetime (same
    * checkpoint-then-unpersist discipline as Dedup.nearDupPairs);
    * queries that want full rows semi-join the result back. */
  def dedupedIds(docs: DataFrame, idCol: String, textCol: String,
                 minJaccard: Double): DataFrame = {
    val (_, ids, sigHandle) = fusedDedup(docs, idCol, textCol, minJaccard)
    val out = ids.localCheckpoint(true)
    sigHandle.unpersist()
    out
  }

  /** Deterministic disjoint split assignment (train/val/test): each doc
    * lands in exactly one named split by its md5 bucket against cumulative
    * e4 thresholds. Row-local (no shuffle, no sampling state), stable
    * across engines/runs/cluster sizes — the property a training pipeline
    * needs so an eval doc NEVER drifts into train between reruns. The
    * hash is salted differently from the sampling bucket ("split:" vs
    * "samp:") so split assignment stays independent of any upstream
    * stratified sampling decision on the same ids.
    *
    * `splits`: (name, weight_e4) in assignment order; weights must sum to
    * 10000 (exhaustive + mutually exclusive by construction). */
  def assignSplits(docs: DataFrame, idCol: String,
                   splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "each split needs a positive e4 weight")
    require(splits.map(_._2).sum == 10000,
      s"split weights must sum to 10000 (e4), got ${splits.map(_._2).sum}")
    val bucket = graft.functions.TextFunctions.stableHash60(
      concat(lit("split:"), col(idCol).cast("string"))) % 10000
    val cum = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val assign = splits.zip(cum).init.foldRight(
      lit(splits.last._1): org.apache.spark.sql.Column) {
      case (((name, _), hi), acc) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    docs.withColumn("split", assign)
  }

  /** Deterministic epoch shuffle + sharding: every doc gets a pseudo-
    * random 60-bit draw h = md5("shuf:<seed>:<id>"), shard = h % nShards,
    * and a position from ordering (h, id) within the shard. Changing the
    * seed reshuffles globally (one seed per training epoch); the same
    * seed reproduces the same order on any engine, rerun, or cluster
    * size — the property that makes a 100 TB training run resumable and
    * its data order auditable.
    *
    * Scale shape: the draw and shard are row-local projections; the
    * position is a per-shard sort (row_number windowed by shard — nShards
    * independent external sorts, no global order). At write time a real
    * run skips the position column entirely and lands files via
    * repartition(nShards, shard) + sortWithinPartitions(h): the sort
    * order IS the shuffle, and position exists for verification and
    * resume bookkeeping. */
  def epochShuffle(docs: DataFrame, idCol: String, seed: String,
                   nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, "epochShuffle: nShards must be positive")
    val h = graft.functions.TextFunctions.stableHash60(
      concat(lit(s"shuf:$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    docs.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("position", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Distribution-matching rejection sampling: derive per-stratum keep
    * rates so the KEPT corpus matches `targets`' share mix (e4, sums to
    * 10000), keeping as much data as possible — the stratum that is
    * scarcest relative to its target keeps everything and every other
    * stratum downsamples to match. All integer arithmetic:
    *   scale   = min_s(n_s·10000 DIV t_s)   (kept-corpus size, e4 units)
    *   rate_s  = (scale·t_s) DIV n_s        (≤ 10000 by construction)
    * and the keep decision is the salted md5 bucket < rate_s, so every
    * engine/rerun keeps the same rows. Strata absent from `targets` are
    * dropped (inner join) — a target of 0 is not a valid weight, exclude
    * the stratum instead. `scale·t_s` stays far under 2^63 for any
    * realistic corpus (n_s ≤ 10^14 rows). Unlike q45's FIXED per-stratum
    * rates, the rates here are DERIVED from measured counts — one tiny
    * counts aggregate, broadcast back; the corpus scans once.
    *
    * Returns docs + (t_e4, rate_e4, keep); callers filter on `keep`. */
  def matchDistribution(docs: DataFrame, idCol: String, strataCol: String,
                        targets: Seq[(String, Int)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "each target stratum needs a positive e4 share")
    require(targets.map(_._2).sum == 10000,
      s"target shares must sum to 10000 (e4), got ${targets.map(_._2).sum}")
    val spark = docs.sparkSession
    import spark.implicits._
    val tgt = targets.toDF(strataCol, "t_e4")
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .join(broadcast(tgt), strataCol)
    val scale = counts.agg(min(expr("__n * 10000 DIV t_e4")).as("__scale"))
    val rates = counts.join(broadcast(scale), lit(true))
      .withColumn("rate_e4", expr("(__scale * t_e4) DIV __n"))
      .select(col(strataCol), col("t_e4"), col("rate_e4"))
    docs.join(broadcast(rates), strataCol)
      .withColumn("keep", graft.functions.TextFunctions.stableHash60(
        concat(lit("dist:"), col(idCol).cast("string"))) % 10000 < col("rate_e4"))
  }

  /** Per-domain cap — keep at most `n` docs per `srcCol`, highest
    * `scoreCol` first with the id as a deterministic tie-break. The crawl
    * pipeline's guard against one domain flooding the corpus. A window
    * rank partitioned by domain: every domain ranks in parallel, no global
    * sort; at 100 TB a skewed mega-domain is one fat partition — rank only
    * needs (score, id) per row, so even that stays sort-of-columns cheap. */
  def capPerSource(docs: DataFrame, idCol: String, srcCol: String,
                   scoreCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "cap must be positive")
    docs
      .withColumn("src_rank", row_number().over(
        Window.partitionBy(col(srcCol))
          .orderBy(col(scoreCol).desc, col(idCol))))
      .filter(col("src_rank") <= n)
  }

  /** Deterministic weighted sampling without replacement — priority
    * (bottom-k) sampling: per stratum keep the k rows with the smallest
    * `hash(id) DIV weight`. Heavier rows draw proportionally smaller
    * priorities, the deterministic analogue of an A-Res weighted
    * reservoir, and keeping "the k smallest priorities" is a bottom-k
    * sketch: executors can keep local bottom-k and merge, no global sort
    * (here a rank window per stratum; strata rank in parallel). Hash is
    * md5-derived so every engine draws the same sample. */
  def prioritySample(docs: DataFrame, idCol: String, strataCol: String,
                     weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "sample size must be positive")
    docs
      .withColumn("__h", graft.functions.TextFunctions.stableHash60(
        concat(lit("ps:"), col(idCol).cast("string"))))
      // integer DIV — the 60-bit hash exceeds 2^53, double division would
      // round and engines could disagree on the drawn sample
      .withColumn("priority", expr(s"__h DIV greatest($weightCol, 1)"))
      .drop("__h")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(col("priority"), col(idCol))))
      .filter(col("rnk") <= k)
  }

  /** Vocabulary growth curve (the Heaps'-law audit): arrival batches of
    * `batchSize` docs (batch = id div batchSize — arrival order for an
    * id-ordered crawl), and per batch how many token TYPES appear for the
    * first time ever, alongside the batch's occurrence mass and the
    * running type total. The "when does this crawl stop teaching the
    * tokenizer new words" input: a batch whose new_types collapses while
    * n_tokens holds is pure repetition of known vocabulary — the signal
    * to stop crawling a source (or stop growing the BPE vocab, q147's
    * complementary curve from the merge side).
    *
    * Scale shape: one token explode (row-local), ONE shuffle on the
    * uniform token key for the first-arrival min, then every aggregate is
    * batch-keyed (n_batches rows — the only window runs over that tiny
    * frame). No per-batch rescans: a token's first batch is a single
    * min() whatever the batch count. */
  def vocabularyGrowth(docs: DataFrame, idCol: String, textCol: String,
                       batchSize: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(batchSize > 0, "batchSize must be positive")
    val occ = spread(docs)
      .select(expr(s"$idCol div ${batchSize}L").as("batch"),
        col(idCol).as("__id"), explode(wsTokens(col(textCol))).as("tok"))
    val perBatch = occ.groupBy(col("batch"))
      .agg(countDistinct(col("__id")).as("n_docs"),
        count(lit(1)).as("n_tokens"))
    val firstSeen = occ.groupBy(col("tok")).agg(min(col("batch")).as("batch"))
      .groupBy(col("batch")).agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBatch.join(firstSeen, Seq("batch"), "left")
      .select(col("batch"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_types", sum(col("new_types")).over(w))
  }

  /** The full pipeline. Returns (curated docs, per-stage counts).
    *
    * One scan of the input (persist + observe), ONE signing pass feeding
    * both dedup stages (fusedDedup), and one materialization per stage:
    * curated.count() populates the whole lineage, the exact-stage count
    * reads the signature cache. The intermediates unpersist before
    * returning; `curated` stays persisted — the caller reads it without
    * re-deriving the funnel and owns its lifecycle. */
  def curate(spark: SparkSession, docs: DataFrame, p: Params = Params()):
      (DataFrame, DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.Observation
    import org.apache.spark.storage.StorageLevel
    val obs = Observation()
    val filtered = annotateAndFilter(
      spread(docs).observe(obs, count(lit(1)).as("n")), p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // action #1 runs the observed plan directly while building the filtered
    // cache: the input count rides the same scan as an observe metric
    val nFiltered = filtered.count()
    val nInput = obs.get("n").asInstanceOf[Long]
    val (exactIds, curatedIds, signed) = fusedDedup(filtered, "doc_id", "text", p.minJaccard)
    val curated = filtered.join(curatedIds, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCurated = curated.count() // materializes the remaining stages once
    val counts = Seq(
      ("0_input", nInput),
      ("1_quality_filtered", nFiltered),
      ("2_exact_deduped", exactIds.count()), // served from the signature cache
      ("3_near_dup_removed", nCurated))
      .toDF("stage", "n_docs")
    signed.unpersist()
    filtered.unpersist()
    (curated, counts)
  }
}
