package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-window chunking — the primitive every training-data / RAG pipeline
  * runs between curation and tokenization: split each document into fixed
  * token windows (optionally overlapping via `stride` < `size`) so
  * downstream stages see bounded-length passages.
  *
  * Chunking is ENTIRELY row-local (a `sequence` of window starts + a
  * `slice` per start inside `transform`, then one `posexplode`) — zero
  * shuffle at any corpus size; the ~(n/stride)× row fan-out happens after
  * the caller's repartition spreads the compact doc rows (same pattern as
  * Dedup.shingleRows). Window starts are 0, stride, 2·stride, … < n_tokens,
  * each chunk = the next `size` tokens clipped at the document end, so every
  * token lands in ≥1 chunk whenever stride ≤ size. Deterministic by
  * construction — the DuckDB oracle rebuilds the identical windows.
  */
object Chunker {

  /** One row per (doc, window): (idCol, chunk_idx, chunk) with chunk_idx
    * counting windows from 0 in token order. Empty/blank docs emit no rows. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "chunk size and stride must be positive")
    require(stride <= size, "stride > size would drop tokens between windows")
    val tks = TextFunctions.wsTokens(col(textCol))
    val starts = when(org.apache.spark.sql.functions.size(tks) > 0,
      sequence(lit(0), org.apache.spark.sql.functions.size(tks) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    val chunks = transform(starts, s => concat_ws(" ", slice(tks, s + 1, lit(size))))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"))
  }

  /** Intra-document repetition removal — drop every repeated
    * non-overlapping `size`-token window after its first occurrence and
    * rebuild the document (the within-doc cousin of C4's repeated-line
    * scrub; crawl text repeats nav boilerplate, templated corpora repeat
    * spans). ENTIRELY row-local: the chunk array materializes once per row
    * (its own projection, so the keep-filter's lambda references the bound
    * attribute, not a re-evaluated expression tree), then an index-aware
    * `filter` keeps chunk i iff no identical chunk precedes it. Zero
    * shuffle at any corpus size; per-row cost is O(windows²) string
    * compares, fine for real document lengths. Output: (idCol, n_windows,
    * n_kept, cleaned_md5). */
  def dropRepeatedPassages(df: DataFrame, idCol: String, textCol: String,
                           size: Int): DataFrame = {
    require(size > 0, "window size must be positive")
    val tks = TextFunctions.wsTokens(col(textCol))
    val nTks = org.apache.spark.sql.functions.size(tks)
    val starts = when(nTks > 0, sequence(lit(0), nTks - 1, lit(size)))
      .otherwise(array().cast("array<int>"))
    val chunks = transform(starts, s => concat_ws(" ", slice(tks, s + 1, lit(size))))
    df.select(col(idCol), chunks.as("__chunks"))
      .select(col(idCol),
        org.apache.spark.sql.functions.size(col("__chunks")).cast("long").as("n_windows"),
        filter(col("__chunks"), (c, i) =>
          array_position(slice(col("__chunks"), lit(1), i), c) === 0L).as("__kept"))
      .select(col(idCol), col("n_windows"),
        org.apache.spark.sql.functions.size(col("__kept")).cast("long").as("n_kept"),
        md5(concat_ws(" ", col("__kept"))).as("cleaned_md5"))
  }

  /** Concat-and-split sequence packing — the step between curation and the
    * trainer: documents are concatenated in deterministic order and the
    * token stream is cut every `budget` tokens, so every training sequence
    * except a shard's last is exactly full (GPT-style packing; no padding
    * waste, docs may span a boundary).
    *
    * Packing is per `shardCol` — the window cumsum partitions by shard, so
    * shards pack in parallel and NO global sort exists anywhere in the
    * plan. That is also the semantically right unit at 100 TB: a trainer
    * reads shards independently, so cross-shard packing would serialize
    * the pipeline for no benefit. A doc with tokens [cum_before, cum_after)
    * lands in sequences floor(cum_before/budget)..floor((cum_after-1)/
    * budget); the tiny per-doc explode enumerates those (≈1 row per doc
    * when docs ≪ budget). All arithmetic is integer (DIV), so the oracle
    * is bit-exact.
    *
    * Output per (shard, seq_id): `n_docs` contributing ≥1 token,
    * `n_tokens` in the sequence (= budget except the shard's last), and
    * `n_split_docs` — docs crossing into or out of this sequence. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    import org.apache.spark.sql.expressions.Window
    // ROWS frame, not the default RANGE: with RANGE, rows tied on idCol
    // would share cum_after and silently double-count the per-sequence
    // token accounting (both engines agree, so the oracle can't catch it).
    // idCol must still be unique within a shard for a DETERMINISTIC
    // packing — ROWS makes ties an ordering ambiguity rather than a
    // double-count, and q63's doc_id satisfies uniqueness outright.
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(shardCol), col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("cum_after", sum(col("n_tok")).over(w))
      .withColumn("cum_before", col("cum_after") - col("n_tok"))
      .withColumn("seq_id", explode(sequence(
        expr(s"cum_before DIV $budget"), expr(s"(cum_after - 1) DIV $budget"))))
      .groupBy(col(shardCol), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least(col("cum_after"), (col("seq_id") + 1) * budget)
          - greatest(col("cum_before"), col("seq_id") * budget)).as("n_tokens"),
        sum(when(col("cum_before") < col("seq_id") * budget ||
          col("cum_after") > (col("seq_id") + 1) * budget, 1L).otherwise(0L))
          .as("n_split_docs"))
  }

  /** Length-bucketed batching — assign rows to fixed-size batches of
    * similar token length (bucket = n_tok DIV bucketWidth; batch =
    * arrival rank within the bucket DIV batchSize). Batching similar
    * lengths together is how serving/training loops cut padding waste: a
    * batch pads every row to ITS max, so mixing a 10-token doc into a
    * 1000-token batch wastes 990 pad tokens. Deterministic (rank orders
    * by the unique id, integer DIV everywhere) and one window per
    * bucket — buckets rank in parallel, the window-per-stratum envelope;
    * no global sort anywhere. Output per row: (bucket, batch_no, idCol,
    * n_tok); aggregate per (bucket, batch_no) for padding accounting. */
  def lengthBucketedBatches(df: DataFrame, idCol: String, textCol: String,
                            bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(batchSize > 0, "batchSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    df.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", expr(s"n_tok DIV $bucketWidth"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("batch_no", expr(s"(rn - 1) DIV $batchSize"))
      .select(col("bucket"), col("batch_no"), col(idCol), col("n_tok"))
  }

  /** Passage-level duplication profile (CCNet-style paragraph dedup,
    * re-expressed over non-overlapping token windows since the corpus
    * carries no paragraph breaks): for every doc, how many of its distinct
    * passages also occur verbatim in ANOTHER doc. Shape: per-doc distinct
    * passage fingerprints (row-local md5), one groupBy(fingerprint) for the
    * doc-frequency, one groupBy(doc) for the verdict — two shuffles on
    * uniform 128-bit keys, no joins wider than the passage table. Output:
    * (idCol, n_chunks, n_dup_chunks, dup_frac_e4). */
  def passageDupStats(df: DataFrame, idCol: String, textCol: String,
                      size: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fps = tokenChunks(df, idCol, textCol, size, size)
      .select(col(idCol), md5(col("chunk")).as("fp"))
      .distinct()
    // docs-per-fingerprint as a window count rather than a groupBy+self-join:
    // the self-join formulation makes Catalyst scan AND re-chunk the whole
    // corpus once per branch (no common-subplan reuse across differing
    // aggregates); the window keeps it to ONE chunk+hash pass, then two
    // compact shuffles of (id, fp) pairs — by fp for the count, by id for
    // the verdict
    fps.withColumn("fp_docs",
        count(lit(1)).over(Window.partitionBy(col("fp"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("fp_docs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_frac_e4", TextFunctions.fixedPoint(
        col("n_dup_chunks") / col("n_chunks"), 4))
  }
}
