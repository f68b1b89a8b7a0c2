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

  /** Span-level contamination localization — WHERE inside each flagged doc
    * the eval overlap sits, as merged token intervals, plus the stats a
    * trim-vs-drop policy decision needs. [[contaminated]] answers "which
    * docs leak"; this answers "which tokens" — the input to the TRIM
    * policy (cut the leaked span, keep the document) that standard
    * decontamination tooling applies instead of dropping whole documents,
    * because a 10k-token doc sharing one 4-gram with a benchmark is worth
    * keeping minus ~4 tokens, not worth losing.
    *
    * Mechanics: the corpus side explodes POSITIONAL gram hashes (struct
    * (pos, gh), 1-based token index — non-distinct, unlike
    * [[contaminated]]'s distinct-gram count, because every occurrence
    * covers its own span), joins the broadcast eval gram set, and each
    * doc's sorted match positions merge row-locally into disjoint token
    * intervals [s, e): a match at pos p covers tokens [p, p+n-1], and a
    * new interval starts at positions[j] iff j == 1 or positions[j] >
    * positions[j-1] + n (the [[Dedup.stripRepeatedSpans]] idiom — filter/
    * zip_with over the sorted array, O(|matches|), never an aggregate()
    * fold that would go quadratic on dense leaks). The trimmed text is
    * the concatenation of the token gaps around the intervals, joined
    * back to the corpus on the LEAK-BOUNDED id set (AQE broadcasts it).
    *
    * Scale shape is [[contaminated]]'s: one corpus scan, row-local
    * explode of 8-byte (pos, gh) pairs, broadcast join, and a groupBy
    * whose state is bounded by actual leak volume. Nothing corpus-sized
    * shuffles.
    *
    * Output per contaminated doc: (idCol, n_tokens, n_contam_grams,
    * n_spans, span_first_tok, span_last_tok inclusive, covered_tokens,
    * kept_tokens, trimmed_md5 — md5 of the space-joined kept tokens,
    * md5("") when the whole doc is covered). */
  def contaminatedSpans(corpus: DataFrame, evalDocs: DataFrame,
                        idCol: String, textCol: String, n: Int): DataFrame =
    contaminatedSpansFromGrams(corpus,
      evalDocs.select(explode(
        org.apache.spark.sql.graft.MinHashExprs.hashedWordNgrams(col(textCol), n))
        .as("gh")).distinct(),
      idCol, textCol, n)

  /** [[contaminatedSpans]] against a pre-derived eval gram-hash frame
    * (single column `gh`) — the store-served form: a persisted benchmark
    * gram table (see DecontamStore) serves the trim path without ever
    * re-reading benchmark text. */
  def contaminatedSpansFromGrams(corpus: DataFrame, evalGramHashes: DataFrame,
                                 idCol: String, textCol: String, n: Int): DataFrame = {
    val tks = TextFunctions.wsTokens(col(textCol))
    // positional gram hashes: (pos, gh) with pos the 1-based index of the
    // gram's first token; same md5-prefix 60-bit hash as hashedWordNgrams
    // so the eval side's distinct set joins directly
    val posGrams = when(size(tks) >= n,
      transform(sequence(lit(1), size(tks) - n + 1),
        i => struct(i.as("pos"),
          TextFunctions.stableHash60(concat_ws(" ", slice(tks, i, lit(n)))).as("gh"))))
      .otherwise(array().cast("array<struct<pos:int,gh:long>>"))
    val evalGrams = evalGramHashes.select(col("gh")).distinct()
    val matched = corpus
      .select(col(idCol), size(tks).as("n_tokens"), explode(posGrams).as("pg"))
      .select(col(idCol), col("n_tokens"),
        col("pg").getField("pos").as("pos"), col("pg").getField("gh").as("gh"))
      .join(broadcast(evalGrams), "gh")
      .groupBy(col(idCol), col("n_tokens"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("n_contam_grams"))
    // row-local interval merge over the sorted positions (see scaladoc)
    val posArr = col("positions")
    val startIdxs = filter(sequence(lit(1), size(posArr)), j =>
      (j === 1) || (element_at(posArr, j) > element_at(posArr, j - 1) + n))
    val nextIdxs = concat(
      slice(startIdxs, lit(2), size(startIdxs) - 1),
      array(size(posArr) + 1))
    val intervals = zip_with(startIdxs, nextIdxs, (sj, nj) => struct(
      element_at(posArr, sj).as("s"),
      (element_at(posArr, nj - 1) + n).as("e")))
    val withIv = matched.withColumn("__iv", intervals)
    val iv = col("__iv")
    val covered = aggregate(iv, lit(0),
      (acc, x) => acc + x.getField("e") - x.getField("s"))
    val stats = withIv.select(
      col(idCol), col("n_tokens").cast("long").as("n_tokens"), col("n_contam_grams"),
      size(iv).cast("long").as("n_spans"),
      element_at(iv, 1).getField("s").cast("long").as("span_first_tok"),
      (element_at(iv, -1).getField("e") - 1).cast("long").as("span_last_tok"),
      covered.cast("long").as("covered_tokens"),
      (col("n_tokens") - covered).cast("long").as("kept_tokens"),
      iv.as("__ivs"))
    // trimmed text: token-gap slices around the intervals, re-joined —
    // computed on the leak-bounded join back to the corpus text
    val ivs = col("__ivs")
    val gaps = concat(
      array(slice(tks, lit(1), element_at(ivs, 1).getField("s") - 1)),
      zip_with(slice(ivs, lit(1), size(ivs) - 1), slice(ivs, lit(2), size(ivs) - 1),
        (a, b) => slice(tks, a.getField("e"), b.getField("s") - a.getField("e"))),
      array(slice(tks, element_at(ivs, -1).getField("e"),
        size(tks) - element_at(ivs, -1).getField("e") + 1)))
    stats
      .join(corpus.select(col(idCol), col(textCol)), Seq(idCol))
      .withColumn("trimmed_md5", md5(array_join(flatten(gaps), " ")))
      .drop(textCol, "__ivs")
  }

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
