package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.{Blocklist, Decontaminate, DecontamStore, Dedup}

/** The full training-data assembly pipeline as ONE composition of library
  * calls — the "a user can run the whole thing" proof: blocklist →
  * exact dedup → near-dup removal → decontamination → per-source cap →
  * sequence packing → sharded JSONL export with a verified manifest.
  * Asserts the funnel only shrinks, each stage's guarantee holds on the
  * final corpus, and the export manifest accounts for every row. */
class EndToEndCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("corpus assembly end to end: filters compose, export manifest reconciles") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val n0 = docs.count()

    // 1. policy blocklist (phrases known to occur in the fixture)
    val phrases = Seq("table hash", "slow key").toDF("phrase")
    val afterBlock = Blocklist.clean(docs, phrases, "doc_id", "text")
    val n1 = afterBlock.count()
    assert(n1 < n0, "fixture must contain blocklisted phrases")

    // 2. exact dedup on the canonical fingerprint
    val afterExact = CorpusCuration.exactDeduped(afterBlock, "doc_id")
    val n2 = afterExact.count()
    assert(n2 <= n1)

    // 3. near-dup removal (MinHash→LSH→verified Jaccard ≥ 0.5)
    val afterNear = CorpusCuration.nearDupRemoved(afterExact, "doc_id", 0.5)
    val n3 = afterNear.count()
    assert(n3 <= n2)

    // 4. decontamination vs an eval slice (every 97th doc plays the
    // benchmark) — run through the PRODUCTION serving path: the benchmark
    // registers once into the persistent gram store, the corpus arrives
    // as two batches, and the accumulated verdicts drive the anti-join;
    // must equal the ad-hoc one-shot clean exactly
    val evalSlice = docs.filter(col("doc_id") % 97 === 0)
    val train = afterNear.filter(col("doc_id") % 97 =!= 0)
    val wh = new graft.core.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_e2e_wh_").toString)
    DecontamStore.registerBenchmark(wh, "g", "dc", "eval", evalSlice,
      "doc_id", "text", n = 13)
    DecontamStore.checkBatch(wh, "g", "dc",
      train.filter(col("doc_id") % 2 === 0), "doc_id", "text", n = 13)
    DecontamStore.checkBatch(wh, "g", "dc",
      train.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", n = 13)
    val afterDecon = train.join(
      DecontamStore.verdicts(wh, "g", "dc").select("doc_id"),
      Seq("doc_id"), "left_anti")
    val n4 = afterDecon.count()
    assert(n4 <= n3)
    val adHoc = Decontaminate.clean(train, evalSlice, "doc_id", "text", 13)
    assert(afterDecon.select("doc_id").exceptAll(adHoc.select("doc_id")).isEmpty
      && adHoc.select("doc_id").exceptAll(afterDecon.select("doc_id")).isEmpty,
      "store-served decontamination must equal the one-shot clean")

    // 5. per-source cap, scored by doc length
    val capped = CorpusCuration.capPerSource(
      afterDecon.withColumn("len", length(col("text"))),
      "doc_id", "source", "len", 40)
    val n5 = capped.count()
    assert(n5 <= n4)
    assert(capped.groupBy("source").count().filter(col("count") > 40).isEmpty)

    // final-corpus guarantees, re-checked from scratch
    val finalDocs = capped.select("doc_id", "source", "text").cache()
    assert(Blocklist.matches(finalDocs, phrases, "doc_id", "text").isEmpty,
      "blocklisted phrase survived the funnel")
    val fps = finalDocs.select(graft.functions.TextFunctions
      .fingerprint(col("text")).as("fp"))
    assert(fps.count() === fps.distinct().count(),
      "exact duplicates survived the funnel")
    assert(Decontaminate.contaminated(finalDocs, evalSlice, "doc_id", "text", 13)
      .isEmpty, "eval-contaminated doc survived the funnel")

    // 6. strip cross-doc repeated spans (boilerplate/template removal) —
    // never grows a doc, never touches docs with no repeated span
    val stripped = graft.operators.Dedup
      .stripRepeatedSpans(finalDocs, "doc_id", "text", n = 20)
      .select(col("doc_id"), col("source"), col("clean_text").as("text"))
    assert(stripped.count() === n5)
    val grew = stripped.join(finalDocs.select(col("doc_id"),
        length(col("text")).as("len0")), "doc_id")
      .filter(length(col("text")) > col("len0")).count()
    assert(grew === 0L, "strip must never grow a document")

    // 7. tokenize with corpus-learned BPE: count == encode length on
    // every cleaned doc (the two codegen paths share one kernel)
    val merges = graft.operators.Bpe.learnMergesFast(stripped, "text", 80, minCount = 2L)
    val tokDrift = stripped.select(
      size(graft.operators.Bpe.bpeEncode(col("text"), merges)).cast("long").as("a"),
      graft.operators.Bpe.bpeTokenCount(col("text"), merges).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(tokDrift === 0L)

    // 8. pack into fixed token-budget sequences, epoch-shuffle, export
    val packed = graft.operators.Chunker.packSequences(
      stripped.withColumn("shard", col("doc_id") % 4), // deterministic shards
      "doc_id", "text", "shard", budget = 512)
    assert(packed.count() > 0)
    val shuffled = CorpusCuration.epochShuffle(stripped, "doc_id", "e2e", nShards = 4)
    assert(shuffled.count() === n5, "shuffle must cover the whole corpus")

    val outDir = java.nio.file.Files.createTempDirectory("e2e_export").toString
    val manifest = Export.writeJsonlShards(
      finalDocs, outDir, nShards = 4, shardKey = "doc_id", verifyCounts = true)
    val manifestRows = manifest.agg(sum(col("rows"))).head().getLong(0)
    assert(manifestRows === n5, "manifest row count must equal the final corpus")
    finalDocs.unpersist()
  }
}
