package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Okapi BM25 keyword retrieval over a document table — the standard
  * relevance ranking for corpus triage (find the docs about X before
  * curating them). For a fixed query-term list the whole computation is two
  * scans: one tiny global aggregate for corpus stats (N, Σdl, per-term df),
  * broadcast back over a second scoring scan — no per-term inverted index
  * materialization, no shuffle of the corpus itself.
  *
  * Determinism (cross-engine contract): tf, dl, df, N are exact integers;
  * the classic `ln`-based idf is replaced by its rational core
  * `(N - df + 0.5) / (df + 0.5)`, so every operation is a correctly-
  * rounded IEEE +,*,/ on integer-derived doubles → bit-identical in any
  * engine that evaluates the same expression shape (the DuckDB oracle
  * mirrors the association order exactly).
  *
  * Scoring caveat: dropping the ln preserves each TERM's ranking (the
  * transform is monotone per term) but NOT the ranking of multi-term
  * sums — rare terms weigh multiplicatively more than under Okapi BM25
  * (idf 1000 vs ln≈6.9). This is a deliberate BM25 VARIANT trading
  * exact Okapi mixing for cross-engine bit-exactness; for single-term
  * queries the two rank identically.
  *
  * Scale: at 100 TB the stats aggregate is a partial-agg tree (bytes to the
  * driver), the scoring pass is embarrassingly parallel, and the final
  * top-k is TakeOrderedAndProject (per-partition heaps, k rows merged on
  * the driver) — no global sort, no single-partition window.
  */
object Search {

  /** "More like this": rank documents by tf-idf token overlap with one
    * query document. The idf weight is e4-quantized to an INTEGER before
    * scoring, so each doc's score is a pure integer sum — exact in any
    * summation order and in any engine (a double Σ tf·tf·idf would depend
    * on partial-aggregation order). Shape: per-(doc, token) tf counts, the
    * query doc's vector broadcast, one join on token + one groupBy(doc) —
    * cost bounded by the posting lists of the QUERY's tokens, never
    * all-pairs. Output: (idCol, mlt_score) top `k`, score desc / id asc. */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
                   queryId: Long, k: Int): DataFrame = {
    val tf = docs.select(col(idCol),
        explode(TextFunctions.wsTokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val idf = tf.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
      .join(broadcast(stats), lit(true))
      // e4-quantized rational idf as an integer weight
      .select(col("token"), TextFunctions.fixedPoint(
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)), 4)
        .as("idf_e4"))
    val qvec = tf.filter(col(idCol) === queryId)
      .select(col("token"), col("tf").as("q_tf"))
    tf.filter(col(idCol) =!= queryId)
      .join(broadcast(qvec), "token")
      .join(idf, "token")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("q_tf") * col("idf_e4")).as("mlt_score"))
      .orderBy(col("mlt_score").desc, col(idCol)).limit(k)
  }

  /** moreLikeThis for a SET of query docs in one pass: the tf table is
    * built once, the query vectors (all tokens of all query docs)
    * broadcast together, and one join + one groupBy(q_id, doc) scores
    * every (query, candidate) pair — |Q| queries cost one corpus scan,
    * not |Q|. Output: (q_id, idCol, mlt_score, rank ≤ k). */
  def moreLikeThisMulti(docs: DataFrame, idCol: String, textCol: String,
                        queryIds: Seq[Long], k: Int): DataFrame = {
    require(queryIds.nonEmpty, "moreLikeThisMulti needs at least one query doc")
    val tf = docs.select(col(idCol),
        explode(TextFunctions.wsTokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val idf = tf.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
      .join(broadcast(stats), lit(true))
      .select(col("token"), TextFunctions.fixedPoint(
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)), 4)
        .as("idf_e4"))
    val qvec = tf.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("q_id"), col("token"), col("tf").as("q_tf"))
    val scored = tf.join(broadcast(qvec), "token")
      .filter(col("q_id") =!= col(idCol))
      .join(idf, "token")
      .groupBy(col("q_id"), col(idCol))
      .agg(sum(col("tf") * col("q_tf") * col("idf_e4")).as("mlt_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("mlt_score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion of two ranked lists — the standard way to
    * combine lexical (BM25/tf-idf) and vector (cosine) retrieval without
    * comparable score scales: fused = Σ 1/(c + rank) over the legs a doc
    * appears in. Each leg's reciprocal is e6-quantized ONCE (ranks are
    * small ints, so the quantized table is exact and engine-portable);
    * the fusion sum is integer. Inputs carry (q_id, `idCol`, rank);
    * output (q_id, idCol, rrf_e6, rank ≤ k) per query. */
  def rrfFuse(legA: DataFrame, legB: DataFrame, idCol: String, k: Int,
              c: Int = 60): DataFrame = {
    def recip(df: DataFrame, as: String) = df.select(col("q_id"), col(idCol),
      TextFunctions.fixedPoint(lit(1.0) / (lit(c) + col("rank")), 6).as(as))
    val fused = recip(legA, "ra").join(recip(legB, "rb"),
        Seq("q_id", idCol), "full_outer")
      .select(col("q_id"), col(idCol),
        (coalesce(col("ra"), lit(0L)) + coalesce(col("rb"), lit(0L))).as("rrf_e6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("rrf_e6").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col(idCol), col("rrf_e6"),
        col("rank").cast("int").as("rank"))
  }

  /** Per-document BM25 score (e4-quantized) for `terms`, top `k` rows by
    * (score desc, id asc). Output: (idCol, bm25_e4). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val perDoc = docs.select(
      Seq(col(idCol),
        size(TextFunctions.wsTokens(col(textCol))).cast("double").as("dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(TextFunctions.wsTokens(col(textCol)),
            x => x === lit(t))).cast("double").as(s"tf_$i")
        }: _*)
    val statCols =
      Seq(count(lit(1)).cast("double").as("n_docs"), sum(col("dl")).as("sum_dl")) ++
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).cast("double").as(s"df_$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    // one broadcast row; BNLJ of a single row is a free "attach constants"
    val scored = perDoc.join(broadcast(stats), lit(true))
    val avgdl = col("sum_dl") / col("n_docs")
    // degenerate-corpus guard: if every doc tokenizes empty, sum_dl = 0 and
    // dl/avgdl is 0/0 = NaN, poisoning every score to NULL — define the
    // length norm as 0 there (scores are all 0 anyway since tf = 0). On any
    // non-degenerate corpus the branch is dl/avgdl verbatim, so the oracle
    // (which mirrors this CASE) hashes identically.
    val lenNorm = when(col("sum_dl") > 0, col("dl") / avgdl).otherwise(lit(0.0))
    val score: Column = terms.indices.map { i =>
      val tf = col(s"tf_$i"); val df = col(s"df_$i")
      val idf = (col("n_docs") - df + lit(0.5)) / (df + lit(0.5))
      // k1 = 1.2, b = 0.75; constants written as the same decimal literals
      // the oracle parses, never derived arithmetic (2.2, not 1.2 + 1)
      idf * (tf * lit(2.2)) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * lenNorm))
    }.reduce(_ + _)
    scored.select(col(idCol), TextFunctions.fixedPoint(score, 4).as("bm25_e4"))
      .orderBy(col("bm25_e4").desc, col(idCol)).limit(k)
  }
}
