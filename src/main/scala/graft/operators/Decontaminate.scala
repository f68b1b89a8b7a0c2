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
    * number of distinct leaked grams.
    *
    * The join key is the 60-bit stable hash of each gram, not the gram
    * string itself: the corpus-side explode (the only heavy stage) then
    * carries 8-byte longs instead of ~8n-byte strings, and the broadcast
    * build is a long hash set. Hashing happens INSIDE the gram array
    * (row-local) before the explode. The DuckDB oracle applies the same
    * md5-prefix hash to the same distinct gram list, so even a collision
    * (odds ~2^-60 per pair) perturbs both engines identically. */
  def contaminated(corpus: DataFrame, evalDocs: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    // an unresolved Column — binds to whichever frame selects it (a df
    // parameter here would be ignored and only suggest per-frame binding).
    // Fused tokenize+gram+hash expression (bit-identical to
    // transform(wordNgrams, stableHash60) — parity-spec'd)
    val gramHashes =
      org.apache.spark.sql.graft.MinHashExprs.hashedWordNgrams(col(textCol), n)
    val evalGrams = evalDocs
      .select(explode(gramHashes).as("gh"))
      .distinct()
    corpus
      .select(col(idCol), explode(gramHashes).as("gh"))
      .join(broadcast(evalGrams), "gh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_eval_grams"))
  }

  /** The decontaminated corpus: every doc with no eval-set n-gram overlap
    * (left-anti against the contamination verdicts — one broadcast join). */
  def clean(corpus: DataFrame, evalDocs: DataFrame,
            idCol: String, textCol: String, n: Int): DataFrame =
    corpus.join(contaminated(corpus, evalDocs, idCol, textCol, n)
      .select(col(idCol)), Seq(idCol), "left_anti")

  /** Fingerprint-level decontamination — winnowing instead of exact word
    * n-grams, so a corpus doc CONTAINING an eval span (with unrelated text
    * around it, where the word-gram set barely overlaps) still flags: any
    * shared substring of length ≥ n+w-1 chars contributes a shared
    * fingerprint (Schleimer et al.'s guarantee). Stop-fingerprints above
    * `maxDocFreq` total doc-frequency are dropped first — boilerplate
    * would otherwise flag everything AND unbounds the join fan-out (kept
    * fan-out ≤ maxDocFreq² per fingerprint). Output per contaminated
    * corpus doc: how many eval docs it matches (≥ `minShared` shared
    * fingerprints each) and the strongest match. */
  def fingerprintContaminated(corpus: DataFrame, evalDocs: DataFrame,
                              idCol: String, textCol: String,
                              n: Int = 5, w: Int = 4,
                              maxDocFreq: Long = 30L,
                              minShared: Long = 5L): DataFrame = {
    def fps(df: DataFrame, as: String) = df.select(
      col(idCol).as(as),
      explode(TextFunctions.winnowingFingerprints(col(textCol), n, w)).as("fp"))
    val cfp = fps(corpus, "c_id")
    val efp = fps(evalDocs, "e_id")
    val keep = cfp.select(col("fp")).unionByName(efp.select(col("fp")))
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq).select(col("fp"))
    cfp.join(keep, Seq("fp"))
      .join(efp.join(keep, Seq("fp")), Seq("fp"))
      .groupBy(col("c_id"), col("e_id")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .groupBy(col("c_id").as(idCol))
      .agg(count(lit(1)).as("n_eval_docs"), max(col("shared")).as("max_shared"))
  }

  /** Semantic decontamination — flag corpus vectors whose embedding sits
    * within cosine `tauE4`/1e4 of ANY eval-set embedding. Catches the
    * leakage the verbatim paths above cannot: paraphrased or re-worded
    * benchmark items share almost no word n-grams or fingerprints but
    * land next to the eval item in embedding space (the reasoning behind
    * SemDeDup-style embedding filters applied to eval overlap).
    *
    * Shape mirrors Similarity.cosineNearDupPairs, cross-frame: both sides
    * bucket under the SAME deterministic hyperplanes, candidates share a
    * bucket, exact integer cosine decides. The eval side is benchmark-
    * scale so its bucketed vectors broadcast; the corpus never shuffles
    * its embeddings — the bucket is a ROW-LOCAL expression (the planes
    * fold in as literal arrays, Similarity.bucketCol) riding the same
    * projection as the norm, and the candidate join ships bucket-collision
    * rows only. Same LSH recall caveat as q24: a pair in no shared bucket
    * is missed; more planes trade recall for candidate volume.
    *
    * Output per contaminated corpus vector: (idCol, n_eval_hits,
    * max_cos_e4) — how many eval items it matches and the strongest. */
  def semanticContaminated(corpus: DataFrame, evalVecs: DataFrame,
                           planes: DataFrame, tauE4: Long,
                           idCol: String = "vec_id",
                           embCol: String = "embedding"): DataFrame = {
    import graft.operators.Similarity.{planesLocal, qdot, withNormAndBucket}
    val pl = planesLocal(planes)
    def bucketed(df: DataFrame, id: String, emb: String, norm: String) =
      withNormAndBucket(df, pl, idCol, embCol, id, emb, norm)
    val ev = broadcast(bucketed(evalVecs, "e_id", "e_emb", "e_n"))
    bucketed(corpus, "c_id", "c_emb", "c_n")
      .join(ev, "bucket")
      .withColumn("cos_e4", TextFunctions.fixedPoint(
        qdot(col("c_emb"), col("e_emb")) / (col("c_n") * col("e_n")), 4))
      .filter(col("cos_e4") >= tauE4)
      .groupBy(col("c_id").as(idCol))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos_e4")).as("max_cos_e4"))
  }
}
