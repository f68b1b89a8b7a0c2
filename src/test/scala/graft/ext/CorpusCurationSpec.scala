package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class CorpusCurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation funnel: monotone survival, no dups in output") {
    val docs = Tables(spark, sf, "documents")
    val (curated, counts) = CorpusCuration.curate(spark, docs,
      CorpusCuration.Params(langs = Set("en", "und"), minQualityE4 = 0L,
        minChars = 1, minJaccard = 0.5))
    val byStage = counts.as[(String, Long)].collect().toMap
    assert(byStage("0_input") === 500L)
    assert(byStage("1_quality_filtered") <= byStage("0_input"))
    assert(byStage("2_exact_deduped") <= byStage("1_quality_filtered"))
    assert(byStage("3_near_dup_removed") <= byStage("2_exact_deduped"))
    assert(byStage("3_near_dup_removed") > 0)
    // canonical fingerprints are unique after curation
    val n = curated.count()
    assert(curated.select(graft.functions.TextFunctions.fingerprint(col("text")))
      .distinct().count() === n)
  }

  test("curate scans its input exactly once (persist + observe, no re-derive)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog again and again"),
      Row(2L, "the quick brown fox jumps over the lazy dog again and again"),
      Row(3L, "some other english sentence with enough words to pass the bar"),
      Row(4L, "yet another unique document body that is long enough to keep"))
    val acc = spark.sparkContext.longAccumulator("source_scans")
    val rdd = spark.sparkContext.parallelize(rows, 1)
      .mapPartitions { it => acc.add(1); it }
    val docs = spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    val (curated, counts) = CorpusCuration.curate(spark, docs,
      CorpusCuration.Params(langs = Set("en", "und"), minQualityE4 = 0L,
        minChars = 1, minJaccard = 0.5))
    curated.count() // caller-side consumption reads the persisted result
    assert(counts.as[(String, Long)].collect().toMap.apply("0_input") === 4L)
    assert(acc.value === 1L,
      s"funnel evaluated its input ${acc.value} times; persist+observe should make it 1")
    curated.unpersist()
  }

  test("fused one-scan dedup ids equal the staged exact+near-dup pipeline") {
    val docs = Tables(spark, sf, "documents")
    val p = CorpusCuration.Params(langs = Set("en", "und"), minQualityE4 = 0L,
      minChars = 1, minJaccard = 0.5)
    val filtered = CorpusCuration.qualityFilter(docs, p)
    val staged = CorpusCuration.nearDupRemoved(
      CorpusCuration.exactDeduped(filtered, "doc_id"), "doc_id", p.minJaccard)
      .select("doc_id").as[Long].collect().toSet
    val fused = CorpusCuration.dedupedIds(filtered, "doc_id", "text", p.minJaccard)
      .as[Long].collect().toSet
    assert(fused === staged)
  }

  test("near-dup removal keeps the smaller id of a planted dup pair") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "alpha beta gamma delta epsilon zeta eta theta iota kapPa"), // near dup
      (30L, "unrelated content entirely different from everything else here")
    ).toDF("doc_id", "text")
    val out = CorpusCuration.nearDupRemoved(docs, "doc_id", minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(10L) && !out.contains(20L) && out.contains(30L))
  }

  test("split assignment is exhaustive, deterministic, and ~proportional") {
    val docs = Tables(spark, sf, "documents")
    val splits = Seq("train" -> 9000, "val" -> 500, "test" -> 500)
    val a = CorpusCuration.assignSplits(docs, "doc_id", splits)
    val counts = a.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = docs.count()
    // every doc in exactly one NAMED split (withColumn keeps row count;
    // the case expression is total by construction)
    assert(counts.keySet.subsetOf(splits.map(_._1).toSet))
    assert(counts.values.sum === n)
    // 90% ± 5pp on the fixture corpus — the md5 bucket is uniform
    assert(math.abs(counts("train").toDouble / n - 0.9) < 0.05)
    // deterministic: identical assignment on a rerun
    val b = CorpusCuration.assignSplits(docs, "doc_id", splits)
      .select("doc_id", "split")
    assert(a.select("doc_id", "split").exceptAll(b).isEmpty)
    // invalid weights fail loudly
    intercept[IllegalArgumentException] {
      CorpusCuration.assignSplits(docs, "doc_id", Seq("train" -> 9000))
    }
  }

  test("cluster-aware splits (q140): zero cross-split near-dup leakage; " +
    "doc-hash splits (q139) leak on the same corpus") {
    val leaked = graft.queries.CorpusQueries.q139SplitLeakage(spark, sf)
    val fixed = graft.queries.CorpusQueries.q140ClusterSplits(spark, sf)
    // the fixture corpus DOES leak under per-doc hashing (the audit has
    // signal), and cluster-aware assignment eliminates it by construction:
    // every verified near-dup pair is an edge inside one component, and
    // the whole component hashes as one unit
    assert(leaked.count() > 0, "expected the doc-hash split to leak on the fixture")
    val pairs = graft.operators.Dedup.nearDupPairs(
      Tables(spark, sf, "documents"), "doc_id", "text",
      k = 16, b = 4, shingleN = 5, minJaccard = 0.5)
    val crossFixed = pairs
      .join(fixed.select(col("doc_id").as("a_id"), col("split").as("a_split")), Seq("a_id"))
      .join(fixed.select(col("doc_id").as("b_id"), col("split").as("b_split")), Seq("b_id"))
      .filter(col("a_split") =!= col("b_split"))
    assert(crossFixed.isEmpty, "cluster-aware assignment must never split a near-dup pair")
    // still a partition of the corpus, with ~q106 proportions
    val n = Tables(spark, sf, "documents").count()
    assert(fixed.count() === n)
    val train = fixed.filter(col("split") === "train").count()
    assert(math.abs(train.toDouble / n - 0.9) < 0.05)
  }

  test("per-source quality calibration (q141): uniform selectivity, " +
    "no source deleted, bottom-ranked docs cut") {
    val kept = graft.queries.TextQueries.q141SourceQualityCalibration(spark, sf)
    val docs = Tables(spark, sf, "documents")
    val perSource = docs.groupBy("source").count()
      .withColumnRenamed("count", "n_total")
      .join(kept.groupBy("source").count().withColumnRenamed("count", "n_kept"),
        Seq("source"), "left")
      .na.fill(0L, Seq("n_kept"))
      .as[(String, Long, Long)].collect()
    // every source survives with 60-80% of its docs (80% minus tie mass:
    // rank() drops a whole tie group when it straddles the cut)
    perSource.foreach { case (src, total, keptN) =>
      assert(keptN > 0, s"source $src was deleted entirely")
      assert(keptN <= math.ceil(total * 0.8).toLong + 1,
        s"source $src kept $keptN of $total — more than the top 80%")
      assert(keptN >= (total * 0.6).toLong,
        s"source $src kept $keptN of $total — tie mass should not cut below 60%")
    }
    // the cut is bottom-ranked: every kept doc outranks at least a fifth
    // of its source
    assert(kept.filter(lit(5L) * (col("src_rank") - 1L) < col("n_src")).isEmpty)
  }

  test("n-gram diversity (q142): bigram identity, ratio bounds, all sources") {
    val got = graft.queries.TextQueries.q142NgramDiversity(spark, sf)
    val docs = Tables(spark, sf, "documents")
    // fixture precondition for the identity: every doc tokenizes non-empty
    import graft.functions.TextFunctions.wsTokens
    val perSrc = docs.select(col("source"), wsTokens(col("text")).as("ts"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), min(size(col("ts"))).as("min_tok"))
    val j = got.join(perSrc, Seq("source"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Int)].collect()
    assert(j.length === docs.select("source").distinct().count())
    j.foreach { case (src, nTok, nUni, nBig, nBigD, ttr, bigDiv, nDocs, minTok) =>
      assert(minTok >= 1, s"$src has an empty doc — identity precondition broken")
      // each doc contributes exactly (tokens − 1) bigrams
      assert(nBig === nTok - nDocs, s"$src: n_big $nBig ≠ n_tok $nTok − n_docs $nDocs")
      assert(nUni <= nTok && nBigD <= nBig)
      assert(ttr === nUni * 10000 / nTok)
      assert(bigDiv === nBigD * 10000 / nBig)
      assert(ttr >= 1 && ttr <= 10000 && bigDiv >= 1 && bigDiv <= 10000)
    }
  }

  test("token-budget selection (q143): bucket decomposition ≡ global cumsum, " +
    "budget respected, selection maximal") {
    import graft.functions.TextFunctions.{fixedPoint, qualityScore, tokenCount}
    val kept = graft.queries.TextQueries.q143TokenBudgetSelect(spark, sf)
      .select(col("doc_id"), col("cum_tok")).as[(Long, Long)].collect().toMap
    // the naive formulation: ONE global cumsum window over the total order
    // (fixture-scale only — the query itself must never plan this)
    val scored = Tables(spark, sf, "documents").select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tok"),
      fixedPoint(qualityScore(col("text")), 4).as("quality_e4"))
      .as[(Long, Long, Long)].collect()
    val budget = scored.map(_._2).sum / 2
    var cum = 0L
    val naive = scored.sortBy { case (id, _, q) => (-q, id) }.flatMap {
      case (id, n, _) => cum += n; if (cum <= budget) Some(id -> cum) else None
    }.toMap
    assert(kept === naive, "bucket-decomposed prefix must equal the global cumsum")
    assert(kept.nonEmpty && kept.size < scored.length)
    assert(kept.values.max <= budget)
  }

  test("mixture-budget selection (q145): per-source decomposition ≡ driver " +
    "replay, budgets respected, scarce sources over-represented vs flat share") {
    import graft.functions.TextFunctions.{fixedPoint, qualityScore, tokenCount}
    val kept = graft.queries.TextQueries.q145MixtureBudgetSelect(spark, sf)
      .select(col("doc_id"), col("cum_tok"), col("src_budget"))
      .as[(Long, Long, Long)].collect()
    val scored = Tables(spark, sf, "documents").select(
      col("doc_id"), col("source"),
      tokenCount(col("text")).cast("long").as("n_tok"),
      fixedPoint(qualityScore(col("text")), 4).as("quality_e4"))
      .as[(Long, String, Long, Long)].collect()
    // driver replay of the whole policy: √-mass weights, integer budget
    // split, per-source (quality desc, doc_id) prefix
    val mass = scored.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val wE4 = mass.view.mapValues(n => math.floor(math.sqrt(n.toDouble) * 10000 + 0.5).toLong).toMap
    val b = mass.values.sum / 2
    val wt = wE4.values.sum
    val budget = wE4.view.mapValues(w => b * w / wt).toMap
    val want = scored.groupBy(_._2).flatMap { case (src, rows) =>
      var cum = 0L
      rows.toSeq.sortBy { case (id, _, _, q) => (-q, id) }.flatMap { case (id, _, n, _) =>
        cum += n
        if (cum <= budget(src)) Some((id, cum, budget(src))) else None
      }
    }.toSet
    assert(kept.toSet === want)
    // every source's kept mass is inside its allocation, and the √
    // temperature provably flattens: the scarcest source keeps a LARGER
    // share of its own tokens than the most massive source
    kept.foreach { case (_, cum, sb) => assert(cum <= sb) }
    val smallest = mass.minBy(_._2)._1; val biggest = mass.maxBy(_._2)._1
    assert(budget(smallest) * mass(biggest) >= budget(biggest) * mass(smallest),
      "√-temperature must give the scarce source at least the massive one's own-share")
  }

  test("distribution match: scarcest stratum keeps all, kept mix ~uniform") {
    val docs = Tables(spark, sf, "documents")
    val targets = Seq("en" -> 2000, "de" -> 2000, "fr" -> 2000,
      "es" -> 2000, "zh" -> 2000)
    val out = CorpusCuration.matchDistribution(docs, "doc_id", "lang", targets)
    val per = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), max("rate_e4").as("rate"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .as[(String, Long, Long, Long)].collect()
    assert(per.map(_._1).toSet === targets.map(_._1).toSet) // others dropped
    // the scarcest language keeps everything: (n_min·5·2000) DIV n_min
    // is exactly 10000
    val scarcest = per.minBy(_._2)
    assert(scarcest._3 === 10000L)
    assert(scarcest._4 === scarcest._2)
    // kept counts target equality across strata: each expects
    // scale·2000/10000 docs; md5-bucket noise is binomial, allow 20%
    val kepts = per.map(_._4.toDouble)
    assert(kepts.max / kepts.min < 1.2,
      s"kept mix should be ~uniform, got ${per.mkString(", ")}")
    intercept[IllegalArgumentException] {
      CorpusCuration.matchDistribution(docs, "doc_id", "lang",
        Seq("en" -> 5000))
    }
  }

  test("epoch shuffle: disjoint shards, dense positions, seed-sensitive order") {
    val docs = graft.core.Tables(spark, sf, "documents")
    val n = docs.count()
    val s1 = CorpusCuration.epochShuffle(docs, "doc_id", "e1", nShards = 4)
      .select("shard", "position", "doc_id")
      .as[(Int, Long, Long)].collect()
    assert(s1.length === n) // every doc lands in exactly one shard
    assert(s1.map(_._1).toSet.subsetOf((0 until 4).toSet))
    // positions are 1..|shard| dense within each shard
    s1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // rerun reproduces the identical order; a new seed permutes it
    val s1b = CorpusCuration.epochShuffle(docs, "doc_id", "e1", nShards = 4)
      .select("shard", "position", "doc_id").as[(Int, Long, Long)].collect()
    assert(s1.sortBy(r => (r._1, r._2)).toSeq === s1b.sortBy(r => (r._1, r._2)).toSeq)
    val s2 = CorpusCuration.epochShuffle(docs, "doc_id", "e2", nShards = 4)
      .select("shard", "position", "doc_id").as[(Int, Long, Long)].collect()
    assert(s2.map(r => r._3 -> (r._1, r._2)).toMap !== s1.map(r => r._3 -> (r._1, r._2)).toMap)
  }

  test("per-source cap keeps the n best per domain, id as tie-break") {
    val docs = Seq(
      (1L, "a", 50L), (2L, "a", 90L), (3L, "a", 90L), (4L, "a", 10L),
      (5L, "b", 30L)).toDF("doc_id", "source", "score")
    val kept = CorpusCuration.capPerSource(docs, "doc_id", "source", "score", n = 2)
      .select("doc_id", "src_rank").as[(Long, Int)].collect().toMap
    // source a: 90@2 (rank 1, lower id wins tie), 90@3 (rank 2); b: 5
    assert(kept === Map(2L -> 1, 3L -> 2, 5L -> 1))
  }

  test("best-of-cluster (q150): kept doc is the cluster's max-quality member, " +
    "sizes exact, one row per multi-member cluster") {
    val got = graft.queries.CorpusQueries.q150BestOfCluster(spark, sf)
      .select($"cluster", $"keep_id", $"n_dups", $"quality_e4")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // replay cluster membership from the same public operators and
    // quality from the public scoring surface, then argmax driver-side
    val docs = Tables(spark, sf, "documents")
    val members = graft.operators.Clusters.dedupClusters(
      graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
        k = 16, b = 4, shingleN = 5, minJaccard = 0.5))
      .select($"doc_id", $"cluster").as[(Long, Long)].collect()
    val qual = docs.select($"doc_id", graft.functions.TextFunctions.fixedPoint(
        graft.functions.TextFunctions.qualityScore($"text"), 4).as("q"))
      .as[(Long, Long)].collect().toMap
    val byCluster = members.groupBy(_._2)
    assert(got.length === byCluster.size)
    got.foreach { case (cl, keep, n, q) =>
      val mem = byCluster(cl).map(_._1)
      assert(n === mem.size.toLong, s"cluster $cl size")
      assert(mem.size >= 2, s"cluster $cl is a singleton — CC must not emit those")
      val best = mem.map(id => (-qual(id), id)).min._2
      assert(keep === best, s"cluster $cl kept $keep, expected argmax $best")
      assert(q === qual(keep), s"cluster $cl quality mismatch")
    }
  }

  test("near-dup source matrix (q156): cells replay the pair rollup, " +
    "unordered, every pair in exactly one cell") {
    val got = graft.queries.DedupQueries.q156NearDupSourceMatrix(spark, sf)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val docs = Tables(spark, sf, "documents")
    val pairs = graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
      k = 16, b = 4, shingleN = 5, minJaccard = 0.5, candidatePairBudget = 0L)
      .select($"a_id", $"b_id", $"jaccard_e4").as[(Long, Long, Long)].collect()
    val srcOf = docs.select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val exp = pairs.groupBy { case (a, b, _) =>
      val (x, y) = (srcOf(a), srcOf(b)); if (x <= y) (x, y) else (y, x)
    }.map { case ((x, y), v) =>
      (x, y, v.length.toLong, v.map(_._3).sum / v.length)
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(got === exp)
    assert(got.map(_._3).sum === pairs.length.toLong)
    got.foreach { case (a, b, _, m) =>
      assert(a <= b && m >= 5000L && m <= 10000L)
    }
  }

  test("dup-quality contingency (q159): deciles partition the corpus, " +
    "cells replay the public member + scoring surfaces") {
    val got = graft.queries.CorpusQueries.q159DupQualityContingency(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val docs = Tables(spark, sf, "documents")
    assert(got.map(_._2).sum === docs.count())
    val members = graft.operators.Clusters.dedupClusters(
      graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
        k = 16, b = 4, shingleN = 5, minJaccard = 0.5))
      .select($"doc_id").as[Long].collect().toSet
    val qual = docs.select($"doc_id", graft.functions.TextFunctions.fixedPoint(
        graft.functions.TextFunctions.qualityScore($"text"), 4).as("q"))
      .as[(Long, Long)].collect()
    val exp = qual.groupBy { case (_, q) => math.min(q / 1000L, 9L) }
      .map { case (dec, v) =>
        val d = v.count(t => members(t._1)).toLong
        (dec, v.length.toLong, d, d * 10000L / v.length)
      }.toSeq.sortBy(_._1)
    assert(got === exp)
    assert(got.map(_._3).sum === members.size.toLong)
  }

  test("decontam curve (q162): monotone in n, the n=4 point equals q42's " +
    "flagged set, cells replay the public pipeline") {
    val got = graft.queries.CorpusQueries.q162DecontamCurve(spark, sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(3L, 4L, 6L))
    // a longer n can only match fewer grams and flag fewer docs
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted.reverse)
    assert(got.map(_._3).toSeq === got.map(_._3).toSeq.sorted.reverse)
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
    Seq(3, 4, 6).foreach { n =>
      val flagged = graft.operators.Decontaminate.contaminated(
        docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0),
        "doc_id", "text", n)
        .as[(Long, Long)].collect()
      val row = got.find(_._1 === n.toLong).get
      assert(row._2 === flagged.length.toLong, s"n=$n flagged")
      assert(row._3 === flagged.map(_._2).sum, s"n=$n matched")
    }
    // the fixture has contamination signal at the default n
    assert(got.find(_._1 === 4L).get._2 > 0)
  }

  test("token surprisal (q151): driver replay of the bin-length unigram LM") {
    val got = graft.queries.TextQueries.q151TokenSurprisal(spark, sf)
      .as[(Long, Long, Long)].collect()
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def toks(t: String): Seq[String] = {
      val s = t.trim; if (s.isEmpty) Nil else s.split("\\s+").toSeq
    }
    val all = docs.flatMap { case (_, t) => toks(t) }
    val cnt = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = all.length.toLong
    val bits = cnt.map { case (k, c) =>
      k -> java.lang.Long.toBinaryString(total / c).length.toLong
    }
    val exp = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      if (ts.isEmpty) None
      else Some((id, ts.size.toLong, ts.map(bits).sum * 10000L / ts.size))
    }.toSet
    assert(got.toSet === exp)
    // the most informative doc must carry more bits/token than the least —
    // the fixture has both boilerplate and varied text, so the score spreads
    assert(got.map(_._3).distinct.length > 1)
  }

  test("collocation lift (q152): driver replay of the pinned-order top-50") {
    val got = graft.queries.TextQueries.q152CollocationLift(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(got.length === 50)
    val docs = Tables(spark, sf, "documents")
      .select($"text").as[String].collect()
    def toks(t: String): Seq[String] = {
      val s = t.trim; if (s.isEmpty) Nil else s.split("\\s+").toSeq
    }
    val tss = docs.map(toks)
    val uni = tss.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nUni = tss.map(_.size.toLong).sum
    val nBig = tss.map(ts => math.max(ts.size - 1, 0).toLong).sum
    val big = tss.flatMap(ts => ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 5L)
    val exp = big.map { case ((w1, w2), cab) =>
      val lift = math.floor(
        (cab.toDouble * nUni.toDouble * nUni.toDouble)
          / (nBig.toDouble * uni(w1).toDouble * uni(w2).toDouble)
          * 10000.0 + 0.5).toLong
      (w1, w2, cab, lift)
    }.toSeq.sortBy { case (w1, w2, _, lift) => (-lift, w1, w2) }.take(50)
    assert(got.sortBy { case (w1, w2, _, lift) => (-lift, w1, w2) }.toSeq === exp)
  }
}
