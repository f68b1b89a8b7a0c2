package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1.0 correctness surrogate for q122 (BENCH.md round-8 gate): the
  * DuckDB oracle chain is disk-infeasible at sf1.0 on this box (its
  * auto-k ≈ 318 k-means cross-join CTEs materialize > 79 GB of temp —
  * measured ENOSPC twice, 100 GB memory limit included), so the scale
  * gate pins the equivalence the oracle checks at the tri-scale gates:
  * semDedupAuto(target=63) must be ROW-IDENTICAL to semDedup with the
  * explicitly derived k = ceil(n / 63) — auto ≡ manual at 20k vectors.
  * Run: sbt "runMain graft.tools.Q122Sf1Check [sfDir]". */
object Q122Sf1Check {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1.0")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val k = math.ceil(n.toDouble / 63).toInt
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("cluster", "vec_id", "dist_sq", "keep")
      .collect().map(_.toString).sorted
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q122sf1] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val auto = timed("semDedupAuto(63)")(rows(
      graft.operators.Similarity.semDedupAuto(emb, targetClusterSize = 63L,
        iters = 2, tauE4 = 3500L, pairBudget = 50_000_000L)))
    val manual = timed(s"semDedup(k=$k)")(rows(
      graft.operators.Similarity.semDedup(emb, k = k, iters = 2, tauE4 = 3500L,
        pairBudget = 50_000_000L)))
    println(s"[q122sf1] n=$n derived_k=$k rows=${auto.length}")
    println(s"[q122sf1] AUTO==MANUAL: ${auto.sameElements(manual)}")
    spark.stop()
  }
}
