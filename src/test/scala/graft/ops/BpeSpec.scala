package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Bpe

/** Merge-table BPE: deterministic training and the codegen'd encode. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges finds frequency-ranked merges with lexicographic ties") {
    val corpus = Seq("aaab aaab aaab").toDF("text")
    val merges = Bpe.learnMerges(corpus, "text", nMerges = 3)
    // (a,a) appears 6×; then (a,b) ties (aa,a) at 3 and wins lexicographically;
    // then (aa,ab) closes the word
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("bpeTokenCount applies merges lowest-rank-first per word") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val out = Seq("low lower", "", "x").toDF("text")
      .select(Bpe.bpeTokenCount(col("text"), merges).as("n"))
      .as[Long].collect()
    // "low" → [low] = 1; "lower" → [low,e,r] = 3; "" → 0; "x" → 1
    assert(out.toSeq === Seq(4L, 0L, 1L))
  }

  test("bpeEncode emits the piece sequence; size always equals bpeTokenCount") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val pieces = Seq("low lower", "", "x").toDF("text")
      .select(Bpe.bpeEncode(col("text"), merges).as("p"))
      .as[Seq[String]].collect()
    assert(pieces.toSeq === Seq(Seq("low", "low", "er"), Seq(), Seq("x")))
    // cross-check against the count expression on real fixture text, with
    // merges actually learned from that corpus
    val docs = Tables(spark, sf, "documents").limit(200)
    val learned = Bpe.learnMergesFast(docs, "text", 100, minCount = 2L)
    val mismatches = docs.select(
      size(Bpe.bpeEncode(col("text"), learned)).cast("long").as("ne"),
      Bpe.bpeTokenCount(col("text"), learned).as("nc"))
      .filter(col("ne") =!= col("nc")).count()
    assert(mismatches === 0L)
    // pieces concatenate back to the whitespace-free lowercased text:
    // encode may merge but never drop or reorder characters
    val broken = docs.select(
      concat_ws("", Bpe.bpeEncode(col("text"), learned)).as("joined"),
      regexp_replace(lower(col("text")), "\\s+", "").as("flat"))
      .filter(col("joined") =!= col("flat")).count()
    assert(broken === 0L)
  }

  test("batched learner equals the sequential learner merge for merge") {
    val docs = Tables(spark, sf, "documents").limit(60)
    val seq = Bpe.learnMerges(docs, "text", nMerges = 60)
    for (bs <- Seq(2, 8, 32)) {
      val (batched, rounds) = Bpe.learnMergesBatched(docs, "text", nMerges = 60,
        batchSize = bs)
      assert(batched === seq, s"batchSize=$bs diverged from sequential")
      // exactness caps the fill on natural text (top character pairs
      // overlap), so only require no worse than sequential pacing; the
      // production-vocab fix is learnMergesFast's in-memory loop
      assert(rounds <= 60, s"batchSize=$bs used $rounds rounds")
    }
    // the adversarial overlap shape: heavy chains force clash-stops
    val chains = Seq("aaaa aaab abab baba bbbb aabb").toDF("text")
    val seqC = Bpe.learnMerges(chains, "text", nMerges = 10)
    val (batC, _) = Bpe.learnMergesBatched(chains, "text", nMerges = 10, batchSize = 8)
    assert(batC === seqC)
  }

  test("fast learner equals the sequential learner and runs ONE Spark job") {
    val docs = Tables(spark, sf, "documents").limit(200)
    val n = 80 // the 200-doc fixture supports ~89 merges at minCount=2
    val seq = Bpe.learnMerges(docs, "text", nMerges = n)
    val sc = spark.sparkContext
    val jobsBefore = sc.statusTracker.getJobIdsForGroup(null).length
    val fast = Bpe.learnMergesFast(docs, "text", nMerges = n)
    val jobsUsed = sc.statusTracker.getJobIdsForGroup(null).length - jobsBefore
    assert(fast === seq, "in-memory learner diverged from sequential")
    assert(fast.size === n)
    // the whole merge loop must ride the single vocab-collect job — this is
    // the production-vocab fix (32k merges == 1 job, not 32k jobs)
    assert(jobsUsed <= 2, s"fast learner ran $jobsUsed jobs; merges must not cost jobs")
    // deeper run at minCount=1: exhausts shallow pairs, exercises chained
    // merges whose symbols were created by earlier merges (the sequential
    // baseline costs one job per merge, so keep its depth test-sized)
    val deep = Bpe.learnMergesFast(docs, "text", nMerges = 120, minCount = 1L)
    val deepSeq = Bpe.learnMerges(docs, "text", nMerges = 120, minCount = 1L)
    assert(deep === deepSeq)
  }

  test("learned merges compress the fixture corpus between ws and char counts") {
    val docs = Tables(spark, sf, "documents").limit(100)
    val merges = Bpe.learnMerges(docs, "text", nMerges = 40)
    assert(merges.size === 40)
    val stats = docs.select(
      sum(Bpe.bpeTokenCount(col("text"), merges)).as("bpe"),
      sum(size(graft.functions.TextFunctions.wsTokens(lower(col("text"))))
        .cast("long")).as("ws"),
      sum(length(regexp_replace(col("text"), "\\s+", "")).cast("long")).as("chars"))
      .head()
    val (bpe, ws, chars) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    assert(bpe < chars, s"bpe $bpe should compress below char count $chars")
    assert(bpe >= ws, s"bpe $bpe can never go below the word count $ws")
    // training is deterministic end to end
    assert(Bpe.learnMerges(docs, "text", nMerges = 40) === merges)
  }

  test("compression curve (q147): merge-prefix truncation, char invariance, " +
    "monotone compression, v=200 row ≡ q136's corpus totals") {
    // prefix property of the sequential greedy learner: the first v merges
    // of a deeper run ARE the v-merge run — q147's whole premise
    val docs = Tables(spark, sf, "documents")
    val m400 = Bpe.learnMergesFast(docs, "text", nMerges = 400, minCount = 2L)
    assert(m400.take(200) === Bpe.learnMergesFast(docs, "text", 200, minCount = 2L))
    val curve = graft.queries.CurationQueries.q147CompressionCurve(spark, sf)
      .select(col("vocab_merges"), col("n_words"), col("n_pieces"), col("n_chars"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq === Seq(100L, 200L, 400L))
    // pieces PARTITION each word's chars: n_chars identical at every vocab;
    // more merges never increase the piece count
    assert(curve.map(_._4).distinct.length === 1)
    assert(curve.map(_._2).distinct.length === 1)
    assert(curve.map(_._3).toSeq === curve.map(_._3).toSeq.sorted.reverse)
    assert(curve.last._3 >= curve.last._2, "pieces can never go below words")
    // cross-query pin: the v=200 point equals q136's per-source rows summed
    val q136 = graft.queries.CurationQueries.q136TokenizerFertility(spark, sf)
      .agg(sum(col("n_words")), sum(col("n_pieces")), sum(col("n_chars")))
      .as[(Long, Long, Long)].head()
    val v200 = curve.find(_._1 == 200L).get
    assert((v200._2, v200._3, v200._4) === q136)
  }
}
