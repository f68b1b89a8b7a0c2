package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Multimodal
import graft.operators.Sketches

/** Multimodal featurization and sketch-based approximate distincts — both
  * fully oracle-checked: the q32 stub codec derives features from portable
  * md5, and q33 uses the from-scratch portable HLL (Sketches.hllDistinct)
  * whose integer-exact register math DuckDB reproduces bit-for-bit. */
object MiscQueries {

  /** q32: multimodal decode pipeline over the demo media table — binary
    * columns in, per-media feature rows out (stub codec, real plumbing). */
  def q32MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(spark, dir)

  /** q33: sketch aggregates — portable HLL estimate next to the exact
    * count per group, with the relative error surfaced as exact e4 fixed
    * point. At 100 TB the sketch is the only affordable distinct; the
    * exact column is the test. */
  def q33ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val exact = orders.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_custs"))
    val est = Sketches.hllDistinct(orders, Seq("o_orderpriority"), "o_custkey")
    exact.join(broadcast(est), Seq("o_orderpriority"))
      .withColumn("rel_err_e4",
        floor(abs(col("hll_est_e2") - col("exact_custs") * 100) /
          (col("exact_custs") * lit(100.0)) * 10000 + 0.5).cast("long"))
      .orderBy(col("o_orderpriority"))
  }

  /** q40: distributed-sketch merge — HLL registers built INDEPENDENTLY
    * over two disjoint halves of orders, merged by per-bucket max, must
    * estimate exactly what the single-pass sketch (and the DuckDB oracle)
    * computes. This is the contract that lets 1000 executors sketch
    * locally and merge tiny register frames instead of shuffling rows. */
  def q40HllMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val halves = Seq(0, 1).map(p =>
      Sketches.hllRegisters(orders.filter(col("o_orderkey") % 2 === p),
        Seq("o_orderpriority"), "o_custkey"))
    val merged = Sketches.estimateFromRegisters(
      halves.reduce(_ unionByName _), Seq("o_orderpriority"), "merged_e2")
    val direct = Sketches.hllDistinct(orders, Seq("o_orderpriority"), "o_custkey")
      .withColumnRenamed("hll_est_e2", "direct_e2")
    merged.join(direct, Seq("o_orderpriority")).orderBy(col("o_orderpriority"))
  }

  /** q47: count-min sketch over token occurrences — estimated vs exact
    * frequency per token, with the overcount surfaced. Width 8 × depth 2 is
    * fixture-scale ON PURPOSE: it forces hash collisions so the sketch's
    * ≥-overestimate property is actually exercised (the operator defaults,
    * 1024×4, would make est == exact trivially here); production keeps the
    * defaults. */
  def q47CmsFreq(spark: SparkSession, dir: String): DataFrame = {
    // the tokenize+explode feeds three subtrees (counters, exact, probes) —
    // materialize it once instead of re-running the regex split per branch
    val occ = Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("token"))
      .localCheckpoint(true)
    val counters = Sketches.cmsCounters(occ, "token", width = 8, depth = 2)
    val exact = occ.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
    Sketches.cmsEstimate(counters, exact.select(col("token")), "token",
      width = 8, depth = 2)
      .join(exact, Seq("token"))
      .withColumn("overcount", col("cms_est") - col("exact_n"))
      .orderBy(col("token"))
  }

  /** q108: per-source corpus datasheet — the one-pager a curator reads
    * before mixing sources into a training run: doc/token totals, integer
    * mean length, HLL distinct-token estimate, and p50/p90 token-length
    * quantiles from the histogram sketch. Three composable aggregates
    * (exact counts, mergeable HLL registers, histogram cells) joined on
    * the handful of source rows; at 100 TB each input is one scan with
    * map-side combine and the join is trivially broadcast. */
  def q108CorpusDatasheet(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = Tables(spark, dir, "documents")
    val base = docs.select(col("source"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    val exact = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
      expr("sum(n_tok) DIV count(1)").as("mean_tok"))
    val toks = docs.select(col("source"),
      explode(TextFunctions.wsTokens(lower(col("text")))).as("token"))
    val hll = Sketches.hllDistinct(toks, Seq("source"), "token")
    val cells = Sketches.histogramCells(base, Seq("source"), "n_tok",
      cellWidthCents = 1000L)
    val qs = Sketches.histogramQuantiles(cells, Seq("source"), 1000L,
      Seq(5000, 9000))
    exact.join(hll, "source").join(qs, "source").orderBy(col("source"))
  }

  /** q49: percentile sketch — p50/p90/p99 of l_extendedprice per return
    * flag from a one-pass $100-cell histogram (Sketches.histogramCells).
    * The sketch answer a 100 TB column gets instead of a global sort. */
  def q49QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val cells = Sketches.histogramCells(Tables(spark, dir, "lineitem"),
      Seq("l_returnflag"), "l_extendedprice", cellWidthCents = 10000L)
    Sketches.histogramQuantiles(cells, Seq("l_returnflag"), 10000L,
      Seq(5000, 9000, 9900))
      .orderBy(col("l_returnflag"))
  }

  /** q66: z-order vs insertion-order layout quality — per 1/64th slice of
    * each layout's order key, how wide the (partkey, suppkey) bounds are.
    * Tight spans == row groups a predicate on that column can skip. The
    * z-order slices bound BOTH keys ~8× tighter than orderkey slices;
    * this is the min/max-pruning win quantified, all-integer. */
  def q66ZorderStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.ZOrder
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    def shaped(stats: DataFrame, layout: String): DataFrame =
      stats.select(lit(layout).as("layout"), col("bucket"), col("n_rows"),
        col("a_span").as("part_span"), col("b_span").as("supp_span"))
    // 31 bits per dimension — the maximum zvalue supports — so ANY
    // int32-scale key interleaves without truncation. Fewer bits would
    // silently alias keys above 2^bits and scramble the diagnostic, and
    // the oracle would reproduce the identical truncation, so the verify
    // sweep could never catch it (l_partkey already exceeds 2^16 at sf1
    // and would pass 2^20 at sf6). 31-bit z-values span up to ~2^62,
    // which layoutStats' division-only bucket math handles exactly.
    val zorder = ZOrder.layoutStats(li,
      ZOrder.zvalue(col("l_partkey"), col("l_suppkey"), bits = 31),
      "l_partkey", "l_suppkey", nBuckets = 64)
    val linear = ZOrder.layoutStats(li, col("l_orderkey"),
      "l_partkey", "l_suppkey", nBuckets = 64)
    shaped(zorder, "zorder").unionByName(shaped(linear, "linear"))
      .orderBy(col("layout"), col("bucket"))
  }

  /** q82: constraint report — dbt-style schema tests (unique / not_null /
    * relationships) over a deliberately corrupted orders snapshot, so
    * every check has non-zero work to find: key%89==0 rows are duplicated,
    * priority NULLs out at key%11==0, and key%13==0 rows point at a
    * non-existent customer. One declarative plan of 1-row aggregates. */
  def q82ConstraintReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.Constraints
    val o = Tables(spark, dir, "orders")
    val key = col("o_orderkey")
    val dirty = o
      .withColumn("o_orderpriority",
        when(key % 11 === 0, lit(null).cast("string")).otherwise(col("o_orderpriority")))
      .withColumn("o_custkey",
        when(key % 13 === 0, -col("o_custkey")).otherwise(col("o_custkey")))
      .unionByName(o.filter(key % 89 === 0))
    Constraints.report(Seq(
      "unique:o_orderkey" ->
        Constraints.uniqueViolations(dirty, Seq("o_orderkey")),
      "not_null:o_orderpriority" ->
        Constraints.notNullViolations(dirty, "o_orderpriority"),
      "fk:o_custkey->customer" ->
        Constraints.fkViolations(dirty, "o_custkey",
          Tables(spark, dir, "customer"), "c_custkey")))
      .orderBy(col("test"))
  }

  /** q85: frame-sampled video features — the slice-before-shuffle path
    * (Multimodal.sampleFrames): every video cuts 4 evenly-spaced byte
    * ranges row-locally, each frame row carries ONLY its slice (payload
    * crosses the exchange once in total), and each slice stub-decodes
    * independently (salt = frame_no + 1) on its own task. Slice bounds
    * and md5-derived features are integer/ASCII-exact, hence fully
    * oracle-checked like q32.
    *
    * Decoder stance (r13): this query KEEPS the stub — the fixture's
    * media bytes are text, and a raw byte range of any real encoded
    * payload is not decodable, which is exactly why the stub path salts
    * by frame. The REAL per-frame decode exists and is spec-proven on
    * the other path: `Multimodal.sampleIndexedFrames` over a
    * `frameContainer` (offset-indexed complete encoded images, decoded
    * by `imageIoDecoder` with luminance-pinned MultimodalSpec
    * fixtures). A production swap is: containerize the payloads, point
    * this query at sampleIndexedFrames — plan shape identical. */
  def q85FrameFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.mediaFromDocuments(spark, dir), nFrames = 4,
      durationMs = 60000L,
      partitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .toDF()
      .select(col("media_id"), col("frame_no"), col("offset_ms"), col("n_bytes"),
        floor(element_at(col("features"), 1).cast("double") * 10000 + 0.5)
          .cast("long").as("f0_e4"))
      .orderBy(col("media_id"), col("frame_no"))

  /** q88: record-count reconciliation — the root DAG's `check_records`
    * task (dag_etlpipeline__root.py:16,55-60) as an oracle-checked query.
    * Three simulated sources over the fixtures: `orders` stages short
    * (every key divisible by 997 dropped — source_n ≠ staging_n),
    * `customer` stages fully but its hub lost the key%500==0 rows
    * (vault_missing_n > 0), and `nation` is clean — so the report
    * exercises both mismatch modes and the match path in one run.
    * One union-tag pass + one count shuffle of O(sources) rows
    * (ControlPlane.reconcileCounts). */
  def q88RecordReconcile(spark: SparkSession, dir: String): DataFrame = {
    import graft.controlplane.ControlPlane
    import graft.ops.Relational
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val stgOrders = orders.filter(col("o_orderkey") % 997 =!= 0)
    val hubOrders = stgOrders.select(col("o_orderkey")).distinct()
    val hubCustomer = customer.filter(col("c_custkey") % 500 =!= 0)
      .select(col("c_custkey")).distinct()
    ControlPlane.reconcileCounts(Seq(
      ("orders", "source", orders),
      ("orders", "staging", stgOrders),
      ("orders", "vault_missing", Relational.antiJoin(
        stgOrders.select(col("o_orderkey")).distinct(), hubOrders, Seq("o_orderkey"))),
      ("customer", "source", customer),
      ("customer", "staging", customer),
      ("customer", "vault_missing", Relational.antiJoin(
        customer.select(col("c_custkey")).distinct(), hubCustomer, Seq("c_custkey"))),
      ("nation", "source", nation),
      ("nation", "staging", nation),
      ("nation", "vault_missing", Relational.antiJoin(
        nation.select(col("n_nationkey")).distinct(),
        Tables(spark, dir, "nation").select(col("n_nationkey")), Seq("n_nationkey")))))
      .orderBy(col("source_name"))
  }

  /** q125: theta/KMV sketch set algebra — per-event-type distinct-user
    * sketches (k=256, map-side-capped KMV partials), then pairwise
    * intersection/union estimates between every two event types from the
    * sketches alone. Diagonal rows (grp_a = grp_b) carry each single
    * sketch's own estimate; off-diagonal rows the pair algebra. The
    * cross-slice overlap question ("how many users do click and purchase
    * share?") answered from k-bounded state — no distinct join. */
  def q125ThetaSketchOps(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    // the sketch is groups·(k+3) values — persisted so the singles +
    // pair-algebra consumers read it once instead of re-aggregating the
    // events scan per consumer (5 scans in the unpersisted plan), and
    // RELEASED before returning (the nearDupPairs discipline): the tiny
    // result is eagerly checkpointed first, so a long-lived caller
    // accumulates nothing across invocations
    val sk = graft.operators.ThetaSketch.sketch(
      Tables(spark, dir, "events"), "event_type", "user_id", k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = graft.operators.ThetaSketch.estimate(col("n"), col("theta"), k)
    val singles = sk.select(
      col("event_type").as("grp_a"), col("event_type").as("grp_b"),
      col("n").as("n_common"), est.as("est_intersect"), est.as("est_union"))
    val out = singles
      .unionByName(graft.operators.ThetaSketch.pairwiseOps(sk, "event_type", k))
      .orderBy(col("grp_a"), col("grp_b"))
      .localCheckpoint(true)
    sk.unpersist()
    out
  }

  /** q127: cross-source text-overlap matrix — a theta sketch of each
    * source's winnowing fingerprints (q38's n=5/w=4 family), then the
    * q125 pair algebra over all source pairs: which slices of the corpus
    * share verbatim-ish text, estimated from k-bounded state instead of
    * a fingerprint self-join. The contamination/provenance question
    * ("how much of source A is also in source B?") at matrix scale:
    * cost is sources²·k, independent of corpus size. */
  def q127SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val fps = Tables(spark, dir, "documents").select(
      col("source"),
      explode(graft.functions.TextFunctions.winnowingFingerprints(
        col("text"), 5, 4)).as("fp"))
    // persist-then-release like q125: the fingerprint explode + KMV
    // aggregation runs once, not once per algebra consumer, and the cache
    // goes before returning (only the tiny checkpointed result remains)
    val sk = graft.operators.ThetaSketch.sketch(fps, "source", "fp", k, salt = "srcov")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = graft.operators.ThetaSketch.estimate(col("n"), col("theta"), k)
    val singles = sk.select(
      col("source").as("grp_a"), col("source").as("grp_b"),
      col("n").as("n_common"), est.as("est_intersect"), est.as("est_union"))
    val out = singles
      .unionByName(graft.operators.ThetaSketch.pairwiseOps(sk, "source", k))
      .orderBy(col("grp_a"), col("grp_b"))
      .localCheckpoint(true)
    sk.unpersist()
    out
  }

  /** q132: q125's theta set-algebra served from a PERSISTED sketch store —
    * the store is built from the even-event_id half, the odd half arrives
    * as an APPEND (merge cost O(batch + groups·k); history never re-read),
    * and the estimators run from the stored buffers. Because the KMV merge
    * is an exact capped set-union, the served matrix is ROW-IDENTICAL to
    * q125's one-shot derivation — same oracle SQL pins it. The production
    * shape for "distinct users per event type, maintained forever":
    * per-batch sketch upkeep over a registry-sized table instead of a
    * growing distinct-count rescan. */
  def q132SketchStoreOps(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val events = Tables(spark, dir, "events")
    val whDir = java.nio.file.Files.createTempDirectory("graft_q132_")
    val wh = new graft.core.Warehouse(spark, whDir.toString)
    graft.operators.SketchStore.build(wh, "sk", "users",
      events.filter(col("event_id") % 2 === 0), "event_type", "user_id", k)
    graft.operators.SketchStore.append(wh, "sk", "users",
      events.filter(col("event_id") % 2 === 1), "event_type", "user_id", k)
    val sk = graft.operators.SketchStore.sketch(wh, "sk", "users", k)
      .withColumnRenamed("g", "event_type")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = graft.operators.ThetaSketch.estimate(col("n"), col("theta"), k)
    val singles = sk.select(
      col("event_type").as("grp_a"), col("event_type").as("grp_b"),
      col("n").as("n_common"), est.as("est_intersect"), est.as("est_union"))
    val out = QueryUtil.withTempWarehouse(whDir) {
      singles
        .unionByName(graft.operators.ThetaSketch.pairwiseOps(sk, "event_type", k))
        .orderBy(col("grp_a"), col("grp_b"))
    }
    sk.unpersist()
    out
  }

  /** q131: token-distribution drift matrix — pairwise total-variation
    * distance between every two sources' token distributions (global
    * top-64 tokens + residual bucket), integer-exact (see
    * Profiler.tokenDrift). The distributional complement of q127's
    * verbatim-overlap matrix: q127 asks "do these sources share TEXT",
    * q131 asks "do they share a REGISTER" — the drift/mixture-design
    * signal for a training-data pipeline. */
  def q131TokenDrift(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profiler.tokenDrift(
      Tables(spark, dir, "documents"), "source", "text", topN = 64)
      .orderBy(col("src_a"), col("src_b"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q125_theta_sketch_ops" -> (q125ThetaSketchOps _),
    "q127_source_overlap" -> (q127SourceOverlap _),
    "q131_token_drift" -> (q131TokenDrift _),
    "q132_sketch_store_ops" -> (q132SketchStoreOps _),
    "q82_constraint_report" -> (q82ConstraintReport _),
    "q88_record_reconcile" -> (q88RecordReconcile _),
    "q85_frame_features" -> (q85FrameFeatures _),
    "q66_zorder_stats" -> (q66ZorderStats _),
    "q32_media_features" -> (q32MediaFeatures _),
    "q33_approx_distinct" -> (q33ApproxDistinct _),
    "q40_hll_merge" -> (q40HllMerge _),
    "q47_cms_freq" -> (q47CmsFreq _),
    "q49_quantile_sketch" -> (q49QuantileSketch _),
    "q108_corpus_datasheet" -> (q108CorpusDatasheet _))

  /** Morton interleave of the low 31 bits of two columns, as SQL
    * (mirrors q66's bits = 31). */
  private def zSql(a: String, b: String): String =
    (0 until 31).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** The q125/q127 theta-algebra oracle chain from a CTE `h(g, h)` of
    * distinct (group, hash60) rows: KMV sketch via row_number ≤ k (the k
    * smallest distinct hashes are a pure function of the set, so this
    * rebuilds KmvMinKAgg's buffer exactly), then the same single-division
    * estimators. 1152921504606846976 = 2^60 (stableHash60's domain),
    * exact as a double; counts ≤ 2k keep every product exact-double. */
  private def thetaOpsSql(hashCte: String): String =
    raw"""WITH h AS ($hashCte),
         r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
           FROM h WHERE h IS NOT NULL),
         sk AS (SELECT g, h FROM r WHERE rn <= 256),
         meta AS (SELECT g, count(*) AS n,
             CASE WHEN count(*) < 256 THEN 1152921504606846976 ELSE max(h) END AS theta
           FROM sk GROUP BY 1),
         est AS (SELECT g, n,
             CASE WHEN n < 256 THEN n
               ELSE CAST(floor(255.0*1152921504606846976 / CAST(theta AS DOUBLE)) AS BIGINT) END AS e
           FROM meta),
         singles AS (SELECT g AS grp_a, g AS grp_b, n AS n_common, e AS est_intersect,
             e AS est_union FROM est),
         pairs AS (SELECT a.g AS grp_a, b.g AS grp_b, least(a.theta, b.theta) AS theta_ab
           FROM meta a JOIN meta b ON a.g < b.g),
         common AS (SELECT p.grp_a, p.grp_b, count(*) AS n_common
           FROM pairs p JOIN sk a ON a.g = p.grp_a JOIN sk b ON b.g = p.grp_b AND b.h = a.h
           WHERE a.h < p.theta_ab GROUP BY 1, 2),
         below AS (SELECT p.grp_a, p.grp_b, count(*) AS n_below
           FROM pairs p JOIN sk s ON s.g = p.grp_a OR s.g = p.grp_b
           WHERE s.h < p.theta_ab GROUP BY 1, 2),
         pairrows AS (SELECT p.grp_a, p.grp_b,
             coalesce(c.n_common, 0) AS n_common,
             CAST(floor(CAST(coalesce(c.n_common, 0) AS DOUBLE) * 1152921504606846976.0
               / CAST(p.theta_ab AS DOUBLE)) AS BIGINT) AS est_intersect,
             CAST(floor(CAST(coalesce(b.n_below, 0) - coalesce(c.n_common, 0) AS DOUBLE)
               * 1152921504606846976.0 / CAST(p.theta_ab AS DOUBLE)) AS BIGINT) AS est_union
           FROM pairs p LEFT JOIN common c ON c.grp_a = p.grp_a AND c.grp_b = p.grp_b
           LEFT JOIN below b ON b.grp_a = p.grp_a AND b.grp_b = p.grp_b)
         SELECT grp_a, grp_b, CAST(n_common AS BIGINT) AS n_common,
           est_intersect, est_union
         FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairrows)
         ORDER BY grp_a, grp_b"""

  val oracles: Map[String, String] = Map(
    // q131: the TV-distance replay — same top-64 + chr(1)-other bucketing,
    // same exact-integer numerator Σ|n_i·N_b − m_i·N_a|, same single IEEE
    // division (the theta-estimator exactness pattern)
    "q131_token_drift" ->
      raw"""WITH occ AS (SELECT source AS src, unnest(CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(lower(trim(text)),'\s+') END) AS tok FROM documents),
         c AS (SELECT src, tok, count(*) AS n FROM occ GROUP BY 1, 2),
         tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1),
         top AS (SELECT tok FROM (SELECT tok, sum(n) AS g FROM c GROUP BY 1
             ORDER BY g DESC, tok LIMIT 64)),
         keyed AS (SELECT src, CASE WHEN tok IN (SELECT tok FROM top) THEN tok
             ELSE chr(1)||'other' END AS tok, CAST(sum(n) AS BIGINT) AS n
           FROM c GROUP BY 1, 2),
         toks AS (SELECT DISTINCT tok FROM keyed),
         grid AS (SELECT t.src, k.tok FROM tot t, toks k),
         filled AS (SELECT g.src, g.tok, coalesce(k.n, 0) AS n, tot.nt
           FROM grid g LEFT JOIN keyed k ON k.src = g.src AND k.tok = g.tok
           JOIN tot ON tot.src = g.src),
         p AS (SELECT a.src AS src_a, b.src AS src_b,
             max(a.nt) AS n_a, max(b.nt) AS n_b,
             CAST(sum(abs(a.n*b.nt - b.n*a.nt)) AS BIGINT) AS s
           FROM filled a JOIN filled b ON a.tok = b.tok AND a.src < b.src
           GROUP BY 1, 2)
         SELECT src_a, src_b, n_a, n_b,
           CAST(floor(CAST(s AS DOUBLE)*10000.0/(2.0*n_a*n_b) + 0.5) AS BIGINT) AS tv_e4
         FROM p ORDER BY src_a, src_b""",
    "q125_theta_sketch_ops" -> thetaOpsSql(
      raw"""SELECT DISTINCT event_type AS g,
          CAST(('0x'||substr(md5('theta:'||CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
        FROM events"""),
    // q132 serves q125's matrix from the persisted sketch store (built in
    // two batches) — the KMV merge is an exact set-union, so the same
    // one-shot oracle derivation pins it
    "q132_sketch_store_ops" -> thetaOpsSql(
      raw"""SELECT DISTINCT event_type AS g,
          CAST(('0x'||substr(md5('theta:'||CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
        FROM events"""),
    // q127: the winnowing fingerprint family is q38's (n=5, w=4) keyed by
    // source; the theta chain then runs over the distinct (source, fp)
    // hashes with its own salt.
    "q127_source_overlap" -> thetaOpsSql(
      raw"""SELECT DISTINCT source AS g,
          CAST(('0x'||substr(md5('srcov:'||CAST(fp AS VARCHAR)),1,15)) AS BIGINT) AS h
        FROM (SELECT source, unnest(list_distinct(CASE WHEN len(hs) >= 4
              THEN [list_min(hs[i+1:i+4]) for i in range(0, len(hs)-3)]
              ELSE [list_min(hs)] END)) AS fp
          FROM (SELECT source,
              list_transform(CASE WHEN len(text) >= 5
                THEN [substr(text, i, 5) for i in range(1, len(text)-3)]
                ELSE [text] END,
                x -> CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)) AS hs
            FROM documents))"""),
    "q88_record_reconcile" ->
      """WITH stg_orders AS (
           SELECT o_orderkey FROM orders WHERE o_orderkey % 997 <> 0),
         tagged AS (
           SELECT 'orders' AS source_name, 'source' AS layer FROM orders
           UNION ALL SELECT 'orders', 'staging' FROM stg_orders
           UNION ALL SELECT 'orders', 'vault_missing' FROM (
             SELECT DISTINCT o_orderkey FROM stg_orders) s
             WHERE o_orderkey NOT IN (SELECT DISTINCT o_orderkey FROM stg_orders)
           UNION ALL SELECT 'customer', 'source' FROM customer
           UNION ALL SELECT 'customer', 'staging' FROM customer
           UNION ALL SELECT 'customer', 'vault_missing' FROM (
             SELECT DISTINCT c_custkey FROM customer) s
             WHERE c_custkey NOT IN (
               SELECT c_custkey FROM customer WHERE c_custkey % 500 <> 0)
           UNION ALL SELECT 'nation', 'source' FROM nation
           UNION ALL SELECT 'nation', 'staging' FROM nation
           UNION ALL SELECT 'nation', 'vault_missing' FROM (
             SELECT DISTINCT n_nationkey FROM nation) s
             WHERE n_nationkey NOT IN (SELECT n_nationkey FROM nation))
         SELECT source_name,
           count(*) FILTER (layer = 'source') AS source_n,
           count(*) FILTER (layer = 'staging') AS staging_n,
           count(*) FILTER (layer = 'vault_missing') AS vault_missing_n,
           CASE WHEN count(*) FILTER (layer = 'source') =
                  count(*) FILTER (layer = 'staging')
                 AND count(*) FILTER (layer = 'vault_missing') = 0
                THEN 'match' ELSE 'mismatch' END AS status
         FROM tagged GROUP BY source_name ORDER BY source_name""",
    "q82_constraint_report" ->
      """WITH dirty AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN -o_custkey ELSE o_custkey END AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
           FROM orders
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 89 = 0),
         u AS (SELECT count(*) AS n FROM (
             SELECT o_orderkey FROM dirty WHERE o_orderkey IS NOT NULL
             GROUP BY 1 HAVING count(*) > 1)),
         nn AS (SELECT count(*) FILTER (o_orderpriority IS NULL) AS n FROM dirty),
         fk AS (SELECT count(*) AS n FROM dirty
           WHERE o_custkey IS NOT NULL
             AND o_custkey NOT IN (SELECT c_custkey FROM customer))
         SELECT test, CAST(n AS BIGINT) AS n_violations FROM (
           SELECT 'fk:o_custkey->customer' AS test, n FROM fk
           UNION ALL SELECT 'not_null:o_orderpriority', n FROM nn
           UNION ALL SELECT 'unique:o_orderkey', n FROM u)
         ORDER BY test""",
    "q66_zorder_stats" ->
      raw"""WITH src AS (SELECT l_partkey, l_suppkey, l_orderkey,
             (${zSql("l_partkey", "l_suppkey")}) AS z FROM lineitem),
         zb AS (SELECT min(z) AS lo, max(z) AS hi FROM src),
         ob AS (SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi FROM src),
         u AS (
           SELECT 'zorder' AS layout,
             (z - lo) // ((hi - lo) // 64 + 1) AS bucket,
             l_partkey, l_suppkey FROM src, zb
           UNION ALL
           SELECT 'linear',
             (l_orderkey - lo) // ((hi - lo) // 64 + 1),
             l_partkey, l_suppkey FROM src, ob)
         SELECT layout, bucket, count(*) AS n_rows,
           CAST(max(l_partkey) - min(l_partkey) AS BIGINT) AS part_span,
           CAST(max(l_suppkey) - min(l_suppkey) AS BIGINT) AS supp_span
         FROM u GROUP BY 1, 2 ORDER BY 1, 2""",
    "q85_frame_features" ->
      """WITH v AS (SELECT doc_id AS media_id, text,
             CAST(len(text) AS BIGINT) AS L FROM documents
           WHERE doc_id % 3 + 1 = 3),
         f AS (SELECT media_id, text, L,
             CAST(unnest(range(0, 4)) AS INT) AS frame_no FROM v),
         s AS (SELECT media_id, frame_no,
             CAST((frame_no * 60000) // 4 AS BIGINT) AS offset_ms,
             CAST(((frame_no + 1) * L) // 4 - (frame_no * L) // 4 AS BIGINT) AS n_bytes,
             substr(text, CAST((frame_no * L) // 4 AS BIGINT) + 1,
               CAST(((frame_no + 1) * L) // 4 - (frame_no * L) // 4 AS BIGINT)) AS fb
           FROM f),
         h AS (SELECT media_id, frame_no, offset_ms, n_bytes,
             CAST('0x'||substr(md5(fb || CAST(frame_no + 1 AS VARCHAR)),1,2) AS INT) AS b0
           FROM s)
         SELECT media_id, frame_no, offset_ms, n_bytes,
           CAST(floor((CASE WHEN b0 >= 128 THEN b0 - 256 ELSE b0 END)/128.0*10000 + 0.5)
             AS BIGINT) AS f0_e4
         FROM h ORDER BY media_id, frame_no""",
    "q32_media_features" ->
      """SELECT doc_id AS media_id,
         (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS content_md5,
         CAST(floor((CASE WHEN b0 >= 128 THEN b0 - 256 ELSE b0 END)/128.0*10000 + 0.5)
              AS BIGINT) AS f0_e4
         FROM (SELECT *, CAST('0x'||substr(md5(text),1,2) AS INT) AS b0 FROM documents)
         ORDER BY media_id""",
    "q33_approx_distinct" -> {
      val hll = Sketches.hllOracleSql("orders", "o_orderpriority", "o_custkey")
      s"""WITH hll AS ($hll),
         ex AS (SELECT o_orderpriority,
             count(DISTINCT o_custkey) AS exact_custs FROM orders GROUP BY 1)
         SELECT ex.o_orderpriority, exact_custs, hll_est_e2,
           CAST(floor(abs(hll_est_e2 - exact_custs*100) /
             (exact_custs*100.0) * 10000 + 0.5) AS BIGINT) AS rel_err_e4
         FROM ex JOIN hll ON ex.o_orderpriority = hll.o_orderpriority
         ORDER BY 1"""
    },
    "q40_hll_merge" -> {
      // register-merge is associative/idempotent, so BOTH columns equal the
      // single-pass estimate the oracle computes once
      val hll = Sketches.hllOracleSql("orders", "o_orderpriority", "o_custkey")
      s"""WITH hll AS ($hll)
         SELECT o_orderpriority, hll_est_e2 AS merged_e2, hll_est_e2 AS direct_e2
         FROM hll ORDER BY 1"""
    },
    "q47_cms_freq" ->
      raw"""WITH occ AS (SELECT unnest(CASE WHEN len(trim(text))=0 THEN []
             ELSE regexp_split_to_array(trim(text),'\s+') END) AS token FROM documents),
         pr AS (SELECT token, r,
             CAST(('0x'||substr(md5(CAST(r AS VARCHAR)||':'||token),1,15)) AS BIGINT) % 8 AS c
           FROM occ, range(0,2) t(r)),
         counters AS (SELECT r, c, count(*) AS n FROM pr GROUP BY 1, 2),
         probes AS (SELECT DISTINCT token FROM occ),
         pp AS (SELECT token, r,
             CAST(('0x'||substr(md5(CAST(r AS VARCHAR)||':'||token),1,15)) AS BIGINT) % 8 AS c
           FROM probes, range(0,2) t(r)),
         est AS (SELECT pp.token, min(coalesce(n, 0)) AS cms_est
           FROM pp LEFT JOIN counters USING (r, c) GROUP BY 1),
         ex AS (SELECT token, count(*) AS exact_n FROM occ GROUP BY 1)
         SELECT est.token, cms_est, exact_n, cms_est - exact_n AS overcount
         FROM est JOIN ex USING (token) ORDER BY 1""",
    "q108_corpus_datasheet" -> {
      import TextQueries.tokCountSql
      val hll = Sketches.hllOracleSql("tok", "source", "token")
      raw"""WITH base AS (SELECT source, CAST($tokCountSql AS BIGINT) AS n_tok
             FROM documents),
         ex AS (SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(n_tok) // count(*) AS BIGINT) AS mean_tok
           FROM base GROUP BY 1),
         tok AS (SELECT source,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
           FROM documents WHERE len(trim(text)) > 0),
         hll AS ($hll),
         cells AS (SELECT source,
             CAST(floor(CAST(floor(n_tok*100 + 0.5) AS BIGINT)/1000) AS BIGINT) AS cell,
             count(*) AS n
           FROM base GROUP BY 1, 2),
         cum AS (SELECT *,
             sum(n) OVER (PARTITION BY source ORDER BY cell
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(n) OVER (PARTITION BY source) AS total
           FROM cells),
         q50 AS (SELECT source, (min(cell)+1)*1000 AS p5000_cents FROM cum
           WHERE cum >= floor((total*5000 + 9999)/10000) GROUP BY 1),
         q90 AS (SELECT source, (min(cell)+1)*1000 AS p9000_cents FROM cum
           WHERE cum >= floor((total*9000 + 9999)/10000) GROUP BY 1)
         SELECT ex.source, n_docs, n_tokens, mean_tok, hll_est_e2,
           p5000_cents, p9000_cents
         FROM ex JOIN hll USING (source) JOIN q50 USING (source)
           JOIN q90 USING (source)
         ORDER BY 1"""
    },
    "q49_quantile_sketch" ->
      """WITH cells AS (SELECT l_returnflag,
           CAST(floor(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)/10000) AS BIGINT) AS cell,
           count(*) AS n
           FROM lineitem GROUP BY 1, 2),
         cum AS (SELECT *,
             sum(n) OVER (PARTITION BY l_returnflag ORDER BY cell
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(n) OVER (PARTITION BY l_returnflag) AS total
           FROM cells),
         q50 AS (SELECT l_returnflag, (min(cell)+1)*10000 AS p5000_cents FROM cum
           WHERE cum >= floor((total*5000 + 9999)/10000) GROUP BY 1),
         q90 AS (SELECT l_returnflag, (min(cell)+1)*10000 AS p9000_cents FROM cum
           WHERE cum >= floor((total*9000 + 9999)/10000) GROUP BY 1),
         q99 AS (SELECT l_returnflag, (min(cell)+1)*10000 AS p9900_cents FROM cum
           WHERE cum >= floor((total*9900 + 9999)/10000) GROUP BY 1)
         SELECT q50.l_returnflag, p5000_cents, p9000_cents, p9900_cents
         FROM q50 JOIN q90 USING (l_returnflag) JOIN q99 USING (l_returnflag)
         ORDER BY 1""")
}
