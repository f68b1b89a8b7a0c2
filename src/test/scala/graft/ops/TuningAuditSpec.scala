package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.{Dedup, Similarity}

/** Round-10 tuning/audit operators: the banding planner's invariants and
  * the two quantizer-distortion monitors' integer contracts. */
class TuningAuditSpec extends SparkSpec {
  import spark.implicits._

  test("bandingPlan: every winner respects the budget, covers every " +
    "threshold once, and moves toward longer rows as tau rises") {
    val taus = Seq(2000L, 3000L, 5000L, 8000L, 9000L)
    val plan = Dedup.bandingPlan(spark, hashBudget = 16, tausE4 = taus)
      .select("tau_e4", "bands", "rows_per_band", "total_err")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(plan.map(_._1).toSeq === taus.sorted)
    plan.foreach { case (t, b, r, e) =>
      assert(b >= 1 && r >= 1 && b * r <= 16, s"tau=$t violates budget: ${b}x$r")
      assert(e >= 0)
    }
    // the S-curve analysis direction: a higher threshold never wants
    // SHORTER rows (more bands = fatter low-j tail)
    val rows = plan.map(_._3)
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b },
      s"rows_per_band must be non-decreasing in tau: ${rows.toSeq}")
  }

  test("bandingPlan matches a driver-side replica of the integer arithmetic") {
    def powE4(x: Long, n: Long): Long = {
      var acc = 10000L; var i = 0L
      while (i < n) { acc = acc * x / 10000L; i += 1 }; acc
    }
    def err(t: Long, b: Long, r: Long): Long =
      (1 until 40).map { i =>
        val j = i * 250L
        val p = 10000L - powE4(10000L - powE4(j, r), b)
        math.abs(p - (if (j >= t) 10000L else 0L))
      }.sum
    val expected = Seq(3000L, 5000L, 8000L).map { t =>
      val (e, b, r) = (for { b <- 1L to 16L; r <- 1L to 16L if b * r <= 16 }
        yield (err(t, b, r), b, r)).min
      (t, b, r, e)
    }
    val got = Dedup.bandingPlan(spark, 16, Seq(3000L, 5000L, 8000L))
      .select("tau_e4", "bands", "rows_per_band", "total_err")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("bandingCensus: projected pairs are the exact sample census times " +
    "mod^2, monotone-decreasing in rows per band at fixed bands") {
    val docs = Tables(spark, sf, "documents")
    val cen = Dedup.bandingCensus(docs, "doc_id", "text", hashBudget = 16,
      shingleN = 5, sampleMod = 2)
      .as[(Long, Long, Long)].collect().map { case (b, r, p) => (b, r) -> p }
      .toMap
    assert(cen.keySet === (for { b <- 1L to 16L; r <- 1L to 16L
      if b * r <= 16 } yield (b, r)).toSet)
    cen.values.foreach(p => assert(p >= 0 && p % 4 == 0,
      "projection must be census * mod^2"))
    // longer rows = stricter collision requirement = never MORE candidates
    for (b <- 1L to 4L; r <- 1L until 16L / b)
      assert(cen((b, r + 1)) <= cen((b, r)),
        s"census must fall as rows grow: b=$b r=$r")
  }

  test("bandingPlanBudgeted: an unconstraining budget reproduces " +
    "bandingPlan's picks; a tight budget moves every pick to a feasible " +
    "banding; an impossible budget yields no rows") {
    val docs = Tables(spark, sf, "documents")
    val taus = Seq(3000L, 5000L, 8000L)
    val free = Dedup.bandingPlanBudgeted(docs, "doc_id", "text", 16, taus,
        sampleMod = 2, pairBudget = Long.MaxValue)
      .select("tau_e4", "bands", "rows_per_band", "total_err")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val unbudgeted = Dedup.bandingPlan(spark, 16, taus)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(free === unbudgeted)
    val cen = Dedup.bandingCensus(docs, "doc_id", "text", 16, 5, 2)
      .as[(Long, Long, Long)].collect().map { case (b, r, p) => (b, r) -> p }
      .toMap
    // a budget below the free picks' mass forces a different, feasible pick
    val freeMass = free.map { case (t, b, r, _) => cen((b, r)) }.max
    val tight = Dedup.bandingPlanBudgeted(docs, "doc_id", "text", 16, taus,
        sampleMod = 2, pairBudget = math.max(1L, freeMass / 4))
      .select("tau_e4", "bands", "rows_per_band")
      .as[(Long, Long, Long)].collect()
    tight.foreach { case (t, b, r) =>
      assert(cen((b, r)) <= math.max(1L, freeMass / 4),
        s"tau=$t picked an over-budget banding ${b}x$r") }
    // pairBudget 1: either some banding projects <= 1 pair and every tau
    // picks such a banding, or none does and the plan is EMPTY (the
    // "this corpus can't be LSH'd under this budget" answer, not a crash)
    val one = Dedup.bandingPlanBudgeted(docs, "doc_id", "text", 16, taus,
        sampleMod = 2, pairBudget = 1L)
      .select("bands", "rows_per_band").as[(Long, Long)].collect()
    if (cen.values.exists(_ <= 1L))
      one.foreach { case (b, r) => assert(cen((b, r)) <= 1L) }
    else assert(one.isEmpty)
  }

  test("sq8Distortion: errors are bounded by the quantizer contract " +
    "(0 <= err, mean <= max, every dimension covered once)") {
    val emb = Tables(spark, sf, "embeddings")
    val d = Similarity.sq8Distortion(emb).collect()
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    assert(d.length === dim)
    val n = emb.count()
    d.foreach { row =>
      val (nv, sum, sumSq, mx, mean) = (row.getAs[Long]("n_vectors"),
        row.getAs[Long]("sum_err"), row.getAs[Long]("sum_sq_err"),
        row.getAs[Long]("max_err"), row.getAs[Long]("mean_err_e4"))
      assert(nv === n)
      assert(sum >= 0 && mx >= 0 && sumSq >= 0)
      assert(mean <= mx * 10000, "mean cannot exceed max")
      assert(sum <= mx * nv, "sum cannot exceed n*max")
    }
  }

  test("pqDistortion: one row per subspace, every vector encoded, and the " +
    "distortion of a vector that IS a codebook entry is zero") {
    val emb = Tables(spark, sf, "embeddings")
    val m = 4; val dim = 64
    val cbs = Similarity.pqCodebooks(emb, m, k = 8, dim = dim)
    val d = Similarity.pqDistortion(emb, cbs, m, dim).collect()
    assert(d.map(_.getAs[Long]("sub")).toSet === (0L until m).toSet)
    val n = emb.count()
    d.foreach(r => assert(r.getAs[Long]("n_vectors") === n))
    // a corpus consisting of exactly the codebook entries reconstructs
    // losslessly: distortion must be identically zero
    val cents = cbs.filter(col("sub") === 0)
      .select(col("label").cast("long").as("vec_id"),
        transform(col("ce"), c => c.cast("double") / 1000.0).as("embedding"))
    val dimSub = dim / m
    val zero = Similarity.pqDistortion(
      cents, cbs.filter(col("sub") === 0), 1, dimSub)
    assert(zero.agg(sum(col("sum_sq_err"))).as[Long].head() === 0L)
  }
}
