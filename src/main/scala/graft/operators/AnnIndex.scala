package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Warehouse

/** Persistent ANN index lifecycle over the [[Warehouse]] — the serving
  * store that turns the ad-hoc IVF path into production shape: the
  * corpus is quantized and assigned to inverted lists ONCE at build,
  * new vectors append by assigning ONLY the arriving batch against the
  * stored centroids, and queries probe the stored lists without ever
  * touching raw embeddings again.
  *
  * Two tables per index: `<name>_centroids` (label, ce) and
  * `<name>_lists` (id, label, qe, n). Because an IVF assignment depends
  * only on the centroids, append-then-query is EXACTLY equal to
  * rebuild-on-the-union — the invariant AnnIndexSpec pins — so the index
  * never needs a rebuild for correctness, only (eventually) for recall
  * as the data distribution drifts from the frozen centroids.
  *
  * 100 TB shape: build is one assignment scan (centroids broadcast);
  * append is O(batch); a query touches ~|lists probed| stored rows per
  * query vector with the query side broadcast — the store itself never
  * shuffles. The lists/codes tables are hive-partitioned by `label`, so
  * a serving read with `probes` lists scans only the probed partition
  * directories — the scan prunes with the index, it never widens with
  * the corpus (AnnIndexSpec pins the pruned file set).
  *
  * ID-COLLISION HAZARD: `topK`/`topKPq` default to `excludeSelf = true`
  * (drop candidates whose id equals the query id) — correct when queries
  * are drawn from the indexed corpus, as in q120/q121. A serving
  * deployment whose query ids come from an UNRELATED id space must pass
  * `excludeSelf = false`, or any stored vector that happens to share an
  * id with a query is silently dropped from that query's top-k.
  */
object AnnIndex {

  private[graft] def centroidsTable(name: String) = s"${name}_centroids"
  private def listsTable(name: String) = s"${name}_lists"

  /** Create (or replace) the index: store the centroid table and the
    * one-time inverted-list assignment of `corpus`. `centroids` come
    * from the caller — `Similarity.kmeansCentroids` (learned) or
    * `Similarity.ivfCentroids` (label-derived) — so the clustering
    * policy stays a composable choice, not an index parameter. */
  def build(wh: Warehouse, schema: String, name: String, corpus: DataFrame,
            centroids: DataFrame, idCol: String = "vec_id",
            embCol: String = "embedding"): Unit = {
    wh.overwrite(schema, centroidsTable(name), centroids.select(col("label"), col("ce")))
    // hive-partition the lists by label: a serving read of `probes` lists
    // scans only the probed partition dirs (sticky — appends keep it)
    wh.overwrite(schema, listsTable(name),
      assign(wh, schema, name, corpus, idCol, embCol), partitionBy = Seq("label"))
  }

  /** Assign ONLY the arriving batch against the stored centroids and
    * append it to the lists table — O(batch), the corpus never re-signs. */
  def append(wh: Warehouse, schema: String, name: String, newVectors: DataFrame,
             idCol: String = "vec_id", embCol: String = "embedding"): Unit =
    wh.append(schema, listsTable(name),
      assign(wh, schema, name, newVectors, idCol, embCol))

  private def assign(wh: Warehouse, schema: String, name: String, vectors: DataFrame,
                     idCol: String, embCol: String): DataFrame =
    Similarity.ivfAssign(vectors,
        wh.read(schema, centroidsTable(name)), probes = 1, idCol, embCol)
      .select(col(idCol).as("id"), col("label"),
        col("__qe").as("qe"), col("__n").as("n"))

  /** Top-k from the stored lists: queries assign against the stored
    * centroids (broadcast), probe their `probes` nearest lists, and rank
    * candidates by the exact quantized cosine — identical results to
    * `Similarity.ivfTopK` over the same corpus and centroids.
    *
    * The probed labels are resolved FIRST (one tiny query-side assignment
    * — |Q|·probes ints on the driver, the same bounded-collect class as
    * the hyperplane table) and pushed as a STATIC partition filter, so
    * the lists scan lists only the probed `label=` directories. Dynamic
    * partition pruning would reach the same files, but a static filter
    * prunes at planning time and is assertable (AnnIndexSpec reads the
    * scan's selected partitions). */
  def topK(wh: Warehouse, schema: String, name: String, queries: DataFrame,
           k: Int, probes: Int = 2, idCol: String = "vec_id",
           embCol: String = "embedding", excludeSelf: Boolean = true): DataFrame = {
    val cents = wh.read(schema, centroidsTable(name))
    val probed = Similarity.ivfAssign(queries, cents, probes, idCol, embCol)
      .select(col("label")).distinct().collect().map(_.get(0))
    val lists = wh.read(schema, listsTable(name))
      .filter(col("label").isInCollection(probed))
      .select(col("id").as(idCol), col("label"),
        col("qe").as("__qe"), col("n").as("__n"))
    Similarity.ivfTopKFromLists(queries, lists, cents, k, probes, idCol, embCol,
      excludeSelf)
  }

  /** Measured recall@k of the STORED index against the exact cosine
    * ranking over `corpus` (the index's source-of-truth table): a
    * deterministic id-hash sample of ~`nQueries` corpus vectors queries
    * both sides, recall = |stored top-k ∩ exact top-k| / (|Q|·k). The
    * number that decides whether the frozen centroids still fit the data
    * — [[Similarity.centroidDrift]] and [[stats]] explain WHY recall
    * moved; this is the signal itself, measured on the live store.
    *
    * Cost shape: the exact side is one corpus scan against the broadcast
    * query sample (|Q|·n scores — |Q| is the budget knob); the stored
    * side is the partition-pruned [[topK]]. Returns (recall_e4,
    * n_queries). */
  def storedRecall(wh: Warehouse, schema: String, name: String, corpus: DataFrame,
                   k: Int, probes: Int = 2, nQueries: Int = 100,
                   idCol: String = "vec_id", embCol: String = "embedding"): (Long, Long) =
    measuredRecall(corpus, k, nQueries, idCol, embCol,
      qs => topK(wh, schema, name, qs, k, probes, idCol, embCol))

  /** One row of ANN-maintenance evidence: what the gate measured and what
    * it did. Persisted by [[graft.pipeline.Housekeeping.runAnnMaintenance]]
    * so rebuild decisions are auditable after the fact. */
  final case class RecallGateReport(
      schema: String, name: String, nQueries: Long,
      recallBeforeE4: Long, minRecallE4: Long, rebuilt: Boolean,
      recallAfterE4: Long, nListsAfter: Long,
      centroidsVersionBefore: Long, centroidsVersionAfter: Long)

  /** The closed ANN lifecycle loop: measure the stored index's recall@k
    * against the exact ranking, and if it has drifted below
    * `minRecallE4`, RE-LEARN the coarse quantizer from the current corpus
    * (deterministic k-means, nLists = ⌈n / targetListSize⌉ — the
    * [[Similarity.knnDensityAuto]] scale rule, so list sizes stay bounded
    * as the corpus grows) and swap the rebuilt index in atomically via
    * the Warehouse version pointer ([[build]]'s overwrite bumps
    * `_current`; readers of the old version are undisturbed, `readAt`
    * still serves it). A healthy index is measured and left alone — the
    * no-drift run costs one recall probe, no writes.
    *
    * This is the piece the monitors feed: appends under the
    * append-equals-rebuild invariant never corrupt the index, they only
    * let the data walk away from the frozen centroids; recall is the
    * one signal that says WHEN re-freezing pays. */
  def recallGate(wh: Warehouse, schema: String, name: String, corpus: DataFrame,
                 k: Int, probes: Int = 2, minRecallE4: Long = 9000L,
                 targetListSize: Long = 10000L, kmeansIters: Int = 5,
                 nQueries: Int = 100, idCol: String = "vec_id",
                 embCol: String = "embedding"): RecallGateReport = {
    require(minRecallE4 >= 0 && minRecallE4 <= 10000, "minRecallE4 in [0, 10000]")
    require(targetListSize > 0, "targetListSize must be positive")
    val vBefore = wh.currentVersion(schema, centroidsTable(name))
    val (before, nq) = storedRecall(wh, schema, name, corpus, k, probes, nQueries,
      idCol, embCol)
    if (before >= minRecallE4)
      return RecallGateReport(schema, name, nq, before, minRecallE4,
        rebuilt = false, recallAfterE4 = before,
        nListsAfter = wh.read(schema, centroidsTable(name)).count(),
        centroidsVersionBefore = vBefore, centroidsVersionAfter = vBefore)
    val n = corpus.count()
    val listsLong = math.max(1L, (n + targetListSize - 1) / targetListSize)
    require(listsLong <= Int.MaxValue,
      s"recallGate: derived nLists=$listsLong exceeds Int.MaxValue — raise targetListSize")
    val cents = Similarity.kmeansCentroids(corpus, listsLong.toInt, kmeansIters,
      idCol, embCol)
    build(wh, schema, name, corpus, cents, idCol, embCol)
    val (after, _) = storedRecall(wh, schema, name, corpus, k, probes, nQueries,
      idCol, embCol)
    RecallGateReport(schema, name, nq, before, minRecallE4, rebuilt = true,
      recallAfterE4 = after, nListsAfter = listsLong,
      centroidsVersionBefore = vBefore,
      centroidsVersionAfter = wh.currentVersion(schema, centroidsTable(name)))
  }

  /** [[storedRecall]] for the composed IVF-PQ store: the stored side is
    * [[topKIvfPq]] (partition-pruned ADC), the exact side the same
    * brute-force cosine — so the number folds BOTH loss sources a served
    * IVFADC query pays (coarse-list misses AND code-quantization
    * distortion) into one serving-recall figure. */
  def storedRecallIvfPq(wh: Warehouse, schema: String, name: String,
                        corpus: DataFrame, k: Int, probes: Int = 2,
                        m: Int = 4, dim: Int = 64, nQueries: Int = 100,
                        idCol: String = "vec_id",
                        embCol: String = "embedding"): (Long, Long) =
    measuredRecall(corpus, k, nQueries, idCol, embCol,
      qs => topKIvfPq(wh, schema, name, qs, k, probes, m, dim, idCol, embCol))

  /** [[recallGate]] for the composed IVF-PQ store: below-threshold recall
    * re-learns BOTH frozen models from the current corpus — the coarse
    * quantizer (k-means at nLists = ⌈n / targetListSize⌉) and the m
    * per-subspace codebooks — and swaps via [[buildIvfPq]]'s versioned
    * overwrites. Appends can drift a composed store two ways (data walks
    * away from the coarse lists, or from the codebook cells); the gate
    * doesn't need to know which: measured serving recall is the one
    * signal, and the rebuild re-freezes both. */
  def recallGateIvfPq(wh: Warehouse, schema: String, name: String,
                      corpus: DataFrame, k: Int, probes: Int = 2,
                      m: Int = 4, dim: Int = 64, pqK: Int = 8,
                      minRecallE4: Long = 9000L, targetListSize: Long = 10000L,
                      kmeansIters: Int = 5, pqIters: Int = 2,
                      nQueries: Int = 100, idCol: String = "vec_id",
                      embCol: String = "embedding"): RecallGateReport = {
    require(minRecallE4 >= 0 && minRecallE4 <= 10000, "minRecallE4 in [0, 10000]")
    require(targetListSize > 0, "targetListSize must be positive")
    val vBefore = wh.currentVersion(schema, centroidsTable(name))
    val (before, nq) = storedRecallIvfPq(wh, schema, name, corpus, k, probes,
      m, dim, nQueries, idCol, embCol)
    if (before >= minRecallE4)
      return RecallGateReport(schema, name, nq, before, minRecallE4,
        rebuilt = false, recallAfterE4 = before,
        nListsAfter = wh.read(schema, centroidsTable(name)).count(),
        centroidsVersionBefore = vBefore, centroidsVersionAfter = vBefore)
    val n = corpus.count()
    val listsLong = math.max(1L, (n + targetListSize - 1) / targetListSize)
    require(listsLong <= Int.MaxValue,
      s"recallGateIvfPq: derived nLists=$listsLong exceeds Int.MaxValue — raise targetListSize")
    val coarse = Similarity.kmeansCentroids(corpus, listsLong.toInt, kmeansIters,
      idCol, embCol)
    val books = Similarity.pqCodebooks(corpus, m, pqK, dim, pqIters, idCol, embCol)
    buildIvfPq(wh, schema, name, corpus, coarse, books, m, dim, idCol, embCol)
    val (after, _) = storedRecallIvfPq(wh, schema, name, corpus, k, probes,
      m, dim, nQueries, idCol, embCol)
    RecallGateReport(schema, name, nq, before, minRecallE4, rebuilt = true,
      recallAfterE4 = after, nListsAfter = listsLong,
      centroidsVersionBefore = vBefore,
      centroidsVersionAfter = wh.currentVersion(schema, centroidsTable(name)))
  }

  /** [[storedRecall]] for the composed IVF+SQ8 store — the served
    * recall through [[topKSq8]] (pruned lists of byte codes,
    * reconstruct-and-score), folding coarse-list misses and scalar-
    * quantization distortion into one figure. */
  def storedRecallSq8(wh: Warehouse, schema: String, name: String,
                      corpus: DataFrame, k: Int, probes: Int = 2,
                      nQueries: Int = 100, idCol: String = "vec_id",
                      embCol: String = "embedding"): (Long, Long) =
    measuredRecall(corpus, k, nQueries, idCol, embCol,
      qs => topKSq8(wh, schema, name, qs, k, probes, idCol, embCol))

  /** [[recallGate]] for the IVF+SQ8 store: its frozen model is the
    * (centroids, per-dim bounds) PAIR — appended data can walk away from
    * either (new regions miss the lists; values outside the frozen
    * bounds clamp and score wrong) — so a below-threshold rebuild
    * re-learns both from the current corpus and swaps via
    * [[buildSq8]]'s versioned overwrites. With this, every store kind
    * that freezes model state has a closed lifecycle loop: IVF
    * (centroids), IVF-PQ (centroids + codebooks), IVF-SQ8 (centroids +
    * bounds); the sign-word store has no frozen state to drift. */
  def recallGateSq8(wh: Warehouse, schema: String, name: String,
                    corpus: DataFrame, k: Int, probes: Int = 2,
                    minRecallE4: Long = 9000L, targetListSize: Long = 10000L,
                    kmeansIters: Int = 5, nQueries: Int = 100,
                    idCol: String = "vec_id",
                    embCol: String = "embedding"): RecallGateReport = {
    require(minRecallE4 >= 0 && minRecallE4 <= 10000, "minRecallE4 in [0, 10000]")
    require(targetListSize > 0, "targetListSize must be positive")
    val vBefore = wh.currentVersion(schema, centroidsTable(name))
    val (before, nq) = storedRecallSq8(wh, schema, name, corpus, k, probes,
      nQueries, idCol, embCol)
    if (before >= minRecallE4)
      return RecallGateReport(schema, name, nq, before, minRecallE4,
        rebuilt = false, recallAfterE4 = before,
        nListsAfter = wh.read(schema, centroidsTable(name)).count(),
        centroidsVersionBefore = vBefore, centroidsVersionAfter = vBefore)
    val n = corpus.count()
    val listsLong = math.max(1L, (n + targetListSize - 1) / targetListSize)
    require(listsLong <= Int.MaxValue,
      s"recallGateSq8: derived nLists=$listsLong exceeds Int.MaxValue — raise targetListSize")
    val cents = Similarity.kmeansCentroids(corpus, listsLong.toInt, kmeansIters,
      idCol, embCol)
    buildSq8(wh, schema, name, corpus, cents, Similarity.sq8Bounds(corpus, embCol),
      idCol, embCol)
    val (after, _) = storedRecallSq8(wh, schema, name, corpus, k, probes,
      nQueries, idCol, embCol)
    RecallGateReport(schema, name, nq, before, minRecallE4, rebuilt = true,
      recallAfterE4 = after, nListsAfter = listsLong,
      centroidsVersionBefore = vBefore,
      centroidsVersionAfter = wh.currentVersion(schema, centroidsTable(name)))
  }

  /** Shared recall measurement: deterministic id-hash query sample, exact
    * side one brute-force corpus scan, approx side supplied by the store
    * kind. Returns (recall_e4, n_queries). */
  private def measuredRecall(corpus: DataFrame, k: Int, nQueries: Int,
                             idCol: String, embCol: String,
                             serve: DataFrame => DataFrame): (Long, Long) = {
    require(k >= 1, "k must be >= 1")
    require(nQueries >= 1, "nQueries must be >= 1")
    val n = corpus.count()
    val stride = math.max(1L, n / nQueries)
    val queries = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
      .select(col(idCol), col(embCol))
    val nq = queries.count()
    if (nq == 0) return (10000L, 0L) // empty store: nothing can be missed
    val exact = Similarity.bruteForceTopK(queries, corpus, k, idCol, embCol)
      .select(col("q_id"), col("neighbor_id"))
      .persist()
    // denominator = the exact side's ACTUAL row count, not nq*k: a corpus
    // with n <= k vectors yields fewer than k true neighbors per query,
    // and dividing by the unattainable nq*k would make a perfect index
    // fail the gate (and rebuild) forever
    val attainable = exact.count()
    if (attainable == 0) { exact.unpersist(); return (10000L, nq) }
    val approx = serve(queries).select(col("q_id"), col("neighbor_id"))
    val hits = approx.join(exact, Seq("q_id", "neighbor_id"), "left_semi").count()
    exact.unpersist()
    (hits * 10000L / attainable, nq)
  }

  /** Inverted-list occupancy report from the STORED index — the
    * maintenance monitor a serving deployment runs after appends: list
    * sizes, share of the corpus, and skew vs the uniform ideal
    * (skew_e4 = n·nlists/total, 10000 = perfectly balanced). Empty lists
    * (a centroid no vector chose) report n = 0 — a probe of that list
    * scans nothing, but many empties mean the centroids no longer fit
    * the data; a hot list (skew ≫ 1) means probes that hit it scan far
    * more than corpus/nlists. Together with [[Similarity.centroidDrift]]
    * this is the rebuild-for-recall decision input. Integer/e4-exact:
    * one groupBy over the (label-pruned-width) lists scan, joined to the
    * centroid table at list granularity. */
  def stats(wh: Warehouse, schema: String, name: String): DataFrame = {
    val counts = wh.read(schema, listsTable(name))
      .groupBy(col("label")).agg(count(lit(1)).as("n_vectors"))
    val lists = wh.read(schema, centroidsTable(name)).select(col("label"))
    val nLists = lists.count()
    val sized = lists.join(counts, Seq("label"), "left")
      .select(col("label"), coalesce(col("n_vectors"), lit(0L)).as("n_vectors"))
    val total = broadcast(sized.agg(sum(col("n_vectors")).as("__total")))
    sized.join(total, lit(true))
      .select(col("label"), col("n_vectors"),
        graft.functions.TextFunctions.fixedPoint(
          col("n_vectors") / col("__total"), 4).as("share_e4"),
        graft.functions.TextFunctions.fixedPoint(
          col("n_vectors") * lit(nLists) / col("__total"), 4).as("skew_e4"))
  }

  // ---- PQ variant: 16× smaller stored payload (m code ints per vector
  // instead of the quantized embedding), ADC serving off the codes alone.
  // Same append-equals-rebuild invariant: codes depend only on the
  // frozen codebooks.

  private def codebooksTable(name: String) = s"${name}_codebooks"
  private def codesTable(name: String) = s"${name}_codes"

  /** The store's FROZEN per-subspace codebooks (sub, label, ce) — the
    * model the distortion pre-gate audits arriving data against
    * ([[graft.pipeline.Housekeeping.runAnnMaintenance]]): distortion
    * measured vs the frozen books moves when appends walk away from the
    * codebook cells, which is exactly the drift the recall gate would
    * eventually pay an exact side to notice. */
  def storedCodebooks(wh: Warehouse, schema: String, name: String): DataFrame =
    wh.read(schema, codebooksTable(name))

  /** Store the PQ codebooks and the one-time code assignment of `corpus`.
    * `codebooks` from `Similarity.pqCodebooks` — (sub, label, ce). */
  def buildPq(wh: Warehouse, schema: String, name: String, corpus: DataFrame,
              codebooks: DataFrame, m: Int, dim: Int,
              idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    wh.overwrite(schema, codebooksTable(name),
      codebooks.select(col("sub"), col("label"), col("ce")))
    // partitioned by subspace: plain ADC reads every code by design (the
    // label here is a codebook entry, not a coarse list — candidate
    // pruning is the IVF stage's job), but per-subspace maintenance
    // (rebuild one codebook, audit one subspace) prunes to its dir
    wh.overwrite(schema, codesTable(name),
      encode(wh, schema, name, corpus, m, dim, idCol, embCol),
      partitionBy = Seq("sub"))
  }

  /** Encode ONLY the arriving batch against the stored codebooks and
    * append — O(batch · m · k) scoring, nothing re-reads the corpus. */
  def appendPq(wh: Warehouse, schema: String, name: String, newVectors: DataFrame,
               m: Int, dim: Int, idCol: String = "vec_id",
               embCol: String = "embedding"): Unit =
    wh.append(schema, codesTable(name),
      encode(wh, schema, name, newVectors, m, dim, idCol, embCol))

  private def encode(wh: Warehouse, schema: String, name: String, vectors: DataFrame,
                     m: Int, dim: Int, idCol: String, embCol: String): DataFrame =
    Similarity.pqEncode(vectors, wh.read(schema, codebooksTable(name)),
        m, dim, idCol, embCol)
      .select(col(idCol).as("id"), col("sub"), col("label"))

  /** ADC top-k from the stored codes — identical results to
    * `Similarity.pqTopK` over the same corpus and codebooks. No partition
    * prune here: plain ADC scores every stored code (see [[buildPq]]);
    * [[buildIvfPq]]/[[topKIvfPq]] is the candidate-pruned composition. */
  def topKPq(wh: Warehouse, schema: String, name: String, queries: DataFrame,
             k: Int, m: Int, dim: Int, idCol: String = "vec_id",
             embCol: String = "embedding", excludeSelf: Boolean = true): DataFrame =
    Similarity.pqTopKFromCodes(queries,
      wh.read(schema, codesTable(name)).select(col("id").as(idCol), col("sub"), col("label")),
      wh.read(schema, codebooksTable(name)), k, m, dim, idCol, embCol,
      excludeSelf)

  // ---- composed IVF+PQ store (IVFADC): coarse lists prune candidates,
  // PQ codes score them. The stored rows carry each vector's coarse list
  // NEXT TO its m codes and are hive-partitioned by that list, so a
  // probes=p serving read scans only the probed `clist=` directories —
  // candidate pruning happens in the FILE LISTING, not after a full code
  // scan (plain topKPq reads every code by design). Both the coarse
  // assignment and the codes depend only on frozen centroids/codebooks,
  // so append-equals-rebuild holds exactly as for the simple index.

  private def ivfPqCodesTable(name: String) = s"${name}_ivfpq_codes"

  /** Store coarse centroids + codebooks + the one-time composed
    * (id, sub, label, clist) encoding of `corpus`, partitioned by clist. */
  def buildIvfPq(wh: Warehouse, schema: String, name: String, corpus: DataFrame,
                 coarse: DataFrame, codebooks: DataFrame, m: Int, dim: Int,
                 idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    wh.overwrite(schema, centroidsTable(name), coarse.select(col("label"), col("ce")))
    wh.overwrite(schema, codebooksTable(name),
      codebooks.select(col("sub"), col("label"), col("ce")))
    wh.overwrite(schema, ivfPqCodesTable(name),
      encodeIvfPq(wh, schema, name, corpus, m, dim, idCol, embCol),
      partitionBy = Seq("clist"))
  }

  /** Assign + encode ONLY the arriving batch against the stored
    * centroids/codebooks and append — O(batch), corpus never re-read. */
  def appendIvfPq(wh: Warehouse, schema: String, name: String, newVectors: DataFrame,
                  m: Int, dim: Int, idCol: String = "vec_id",
                  embCol: String = "embedding"): Unit =
    wh.append(schema, ivfPqCodesTable(name),
      encodeIvfPq(wh, schema, name, newVectors, m, dim, idCol, embCol))

  private def encodeIvfPq(wh: Warehouse, schema: String, name: String,
                          vectors: DataFrame, m: Int, dim: Int,
                          idCol: String, embCol: String): DataFrame =
    Similarity.pqEncode(vectors, wh.read(schema, codebooksTable(name)),
        m, dim, idCol, embCol)
      .join(Similarity.ivfAssign(vectors, wh.read(schema, centroidsTable(name)),
          probes = 1, idCol, embCol)
        .select(col(idCol), col("label").as("clist")), Seq(idCol))
      .select(col(idCol).as("id"), col("sub"), col("label"), col("clist"))

  /** IVFADC top-k from the store — identical results to
    * `Similarity.ivfPqTopK` over the same corpus, coarse centroids, and
    * codebooks. Probed coarse lists are resolved FIRST (the same bounded
    * query-side collect as [[topK]]) and pushed as a STATIC partition
    * filter, so the codes scan lists only the probed `clist=` dirs — a
    * probes=2 query batch reads 2 directories of (id, sub, label) ints,
    * never the corpus. */
  def topKIvfPq(wh: Warehouse, schema: String, name: String, queries: DataFrame,
                k: Int, probes: Int = 2, m: Int = 4, dim: Int = 64,
                idCol: String = "vec_id", embCol: String = "embedding",
                excludeSelf: Boolean = true): DataFrame = {
    val cents = wh.read(schema, centroidsTable(name))
    val probed = Similarity.ivfAssign(queries, cents, probes, idCol, embCol)
      .select(col("label")).distinct().collect().map(_.get(0))
    val codes = wh.read(schema, ivfPqCodesTable(name))
      .filter(col("clist").isInCollection(probed))
      .select(col("id").as(idCol), col("sub"), col("label"), col("clist"))
    Similarity.ivfPqTopKFromCodes(queries, codes, cents,
      wh.read(schema, codebooksTable(name)), k, probes, m, dim,
      idCol, embCol, excludeSelf)
  }

  // ---- composed IVF+SQ8 store: coarse lists prune, byte codes (4× over
  // raw floats) reconstruct-and-score. The frozen model is the
  // (centroids, bounds) pair — per-dim corpus bounds are as much a model
  // artifact as a codebook, so they freeze at build and appended batches
  // encode against them (append-equals-rebuild holds over the frozen
  // pair, exactly like PQ over its codebooks).

  private def sq8BoundsTable(name: String) = s"${name}_sq8_bounds"
  private def sq8CodesTable(name: String) = s"${name}_sq8_codes"

  /** Store coarse centroids + per-dim bounds + the composed
    * (id, label, sq_codes) encoding of `corpus`, partitioned by label.
    * `bounds` from `Similarity.sq8Bounds(corpus)` — frozen at build. */
  def buildSq8(wh: Warehouse, schema: String, name: String, corpus: DataFrame,
               centroids: DataFrame, bounds: DataFrame,
               idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    wh.overwrite(schema, centroidsTable(name), centroids.select(col("label"), col("ce")))
    wh.overwrite(schema, sq8BoundsTable(name), bounds.select(col("lo"), col("hi")))
    wh.overwrite(schema, sq8CodesTable(name),
      encodeSq8(wh, schema, name, corpus, idCol, embCol),
      partitionBy = Seq("label"))
  }

  /** Assign + encode ONLY the arriving batch against the stored frozen
    * (centroids, bounds) and append — O(batch). */
  def appendSq8(wh: Warehouse, schema: String, name: String, newVectors: DataFrame,
                idCol: String = "vec_id", embCol: String = "embedding"): Unit =
    wh.append(schema, sq8CodesTable(name),
      encodeSq8(wh, schema, name, newVectors, idCol, embCol))

  private def encodeSq8(wh: Warehouse, schema: String, name: String,
                        vectors: DataFrame, idCol: String, embCol: String): DataFrame =
    Similarity.ivfSq8Encode(vectors,
        wh.read(schema, centroidsTable(name)),
        wh.read(schema, sq8BoundsTable(name)), idCol, embCol)
      .select(col(idCol).as("id"), col("label"), col("sq_codes"))

  /** IVF+SQ8 top-k from the store — identical results to
    * `Similarity.ivfSq8TopK` over the same corpus, centroids, and bounds.
    * Probed labels resolve first and push as a static partition filter
    * (the [[topK]]/[[topKIvfPq]] pattern): serving scans only the probed
    * `label=` dirs of byte codes, never raw embeddings. */
  def topKSq8(wh: Warehouse, schema: String, name: String, queries: DataFrame,
              k: Int, probes: Int = 2, idCol: String = "vec_id",
              embCol: String = "embedding", excludeSelf: Boolean = true): DataFrame = {
    val cents = wh.read(schema, centroidsTable(name))
    val probed = Similarity.ivfAssign(queries, cents, probes, idCol, embCol)
      .select(col("label")).distinct().collect().map(_.get(0))
    val codes = wh.read(schema, sq8CodesTable(name))
      .filter(col("label").isInCollection(probed))
      .select(col("id").as(idCol), col("label"), col("sq_codes"))
    Similarity.ivfSq8TopKFromCodes(queries, codes, cents,
      wh.read(schema, sq8BoundsTable(name)), k, probes, idCol, embCol, excludeSelf)
  }

  // ---- binary sign-word store: 16 bytes of Hamming shortlist state per
  // vector, with the quantized embedding co-stored for the exact rerank.
  // Sign words are a pure row-local function of the vector (centroid- and
  // codebook-independent), so append-equals-rebuild holds TRIVIALLY — no
  // frozen model state exists to drift from.

  private def signsTable(name: String) = s"${name}_signs"

  /** Store (id, w0, w1, qe) for every corpus vector — one row-local
    * signing scan. Serving shortlists from (id, w0, w1) alone (parquet
    * column pruning keeps `qe` out of that scan: 16 B/vector of IO) and
    * fetches `qe` only for shortlisted candidates. */
  def buildHamming(wh: Warehouse, schema: String, name: String, corpus: DataFrame,
                   idCol: String = "vec_id", embCol: String = "embedding"): Unit =
    wh.overwrite(schema, signsTable(name), signRows(corpus, idCol, embCol))

  /** Sign ONLY the arriving batch and append — O(batch). */
  def appendHamming(wh: Warehouse, schema: String, name: String, newVectors: DataFrame,
                    idCol: String = "vec_id", embCol: String = "embedding"): Unit =
    wh.append(schema, signsTable(name), signRows(newVectors, idCol, embCol))

  private def signRows(vectors: DataFrame, idCol: String, embCol: String): DataFrame =
    Similarity.signWords(vectors, "c", idCol, embCol)
      .select(col("c").as("id"), col("c_w0").as("w0"), col("c_w1").as("w1"),
        col("c_qe").as("qe"))

  /** Binary-shortlist + exact-rerank top-k from the stored sign words —
    * identical results to `Similarity.hammingTopK` over the same corpus.
    * The Hamming stage scans only (id, w0, w1); `qe` joins back for the
    * |Q|·shortlist survivors. */
  def topKHamming(wh: Warehouse, schema: String, name: String, queries: DataFrame,
                  k: Int, shortlist: Int = 20, idCol: String = "vec_id",
                  embCol: String = "embedding"): DataFrame = {
    val t = wh.read(schema, signsTable(name))
    Similarity.hammingTopKFromWords(queries,
      t.select(col("id").as("c"), col("w0").as("c_w0"), col("w1").as("c_w1")),
      t.select(col("id").as("c"), col("qe").as("c_qe")),
      k, shortlist, idCol, embCol)
  }
}
