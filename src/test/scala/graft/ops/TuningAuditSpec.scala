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
