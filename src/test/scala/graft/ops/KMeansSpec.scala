package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Deterministic k-means: recovers planted clusters, is reproducible, and
  * plugs into ivfTopK as learned centroids. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters around axis directions
  private def planted = (0 until 30).map { i =>
    val base = i % 3 match {
      case 0 => Array(1.0f, 0.05f * (i / 3), 0f, 0f)
      case 1 => Array(0f, 1.0f, 0.05f * (i / 3), 0f)
      case _ => Array(0f, 0f, 1.0f, 0.05f * (i / 3))
    }
    (i.toLong, base)
  }.toDF("vec_id", "embedding")

  test("k-means recovers planted clusters and is deterministic") {
    val cent = Similarity.kmeansCentroids(planted, k = 3, iters = 4)
    assert(cent.count() === 3)
    val assign = Similarity.ivfAssign(planted, cent, probes = 1)
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    // all members of a true cluster share a learned label
    (0 until 3).foreach { c =>
      val labels = (0 until 30).filter(_ % 3 == c).map(i => assign(i.toLong)).distinct
      assert(labels.size === 1, s"cluster $c split across $labels")
    }
    // distinct true clusters get distinct labels
    assert((0 until 3).map(c => assign(c.toLong)).distinct.size === 3)
    // reproducible
    val cent2 = Similarity.kmeansCentroids(planted, k = 3, iters = 4)
    assert(cent.collect().map(_.toString).sorted
      .sameElements(cent2.collect().map(_.toString).sorted))
  }

  test("seed selection is top-k, not a global single-partition window") {
    val seeds = Similarity.kmeansSeeds(planted, k = 3)
    val plan = seeds.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"seeds should use per-partition top-k heaps:\n$plan")
  }

  test("ivfTopK with learned centroids returns same-cluster neighbors") {
    val cent = Similarity.kmeansCentroids(planted, k = 3, iters = 4)
    val top = Similarity.ivfTopK(planted.filter(col("vec_id") < 3), planted, cent,
      k = 3, probes = 1)
    top.select("q_id", "neighbor_id").as[(Long, Long)].collect().foreach {
      case (q, n) => assert(q % 3 === n % 3, s"query $q got cross-cluster neighbor $n")
    }
  }
}
