package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.operators.{Clusters, Similarity}

/** Dev profiler for the q97 SemDeDup stages (not part of the API). */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables(spark, dir, "embeddings")
    def time[A](name: String)(f: => A): A = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("kmeans k=8 it=2")(Similarity.kmeansCentroids(emb, 8, 2).count())
    val cent = Similarity.kmeansCentroids(emb, 8, 2)
    time("ivfAssign")(Similarity.ivfAssign(emb, cent, 1).count())
    val assigned = Similarity.ivfAssign(emb, cent, 1).persist()
    assigned.count()
    val a = assigned.select(col("vec_id").as("a_id"), col("label"),
      col("__qe").as("ae"), col("__n").as("an"))
    val b = assigned.select(col("vec_id").as("b_id"), col("label"),
      col("__qe").as("be"), col("__n").as("bn"))
    val pairs = a.join(b, Seq("label")).filter(col("a_id") < col("b_id"))
      .withColumn("cos_e4", graft.functions.TextFunctions.fixedPoint(
        Similarity.qdot(col("ae"), col("be")) / (col("an") * col("bn")), 4))
      .filter(col("cos_e4") >= 3500L)
      .select(col("a_id"), col("b_id"))
    time("pairs")(pairs.count())
    val p = pairs.localCheckpoint(true)
    time("components")(Clusters.dedupClusters(p).count())
    time("full q97")(graft.queries.SimQueries.q97SemDedup(spark, dir).write
      .format("noop").mode("overwrite").save())
    spark.stop()
  }
}
