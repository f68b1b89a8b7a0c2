package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{GraftSession, Tables}
import graft.functions.TextFunctions._

/** Dev profiler for q119's internal stages (not part of the API). */
object ProfileQ119 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val n = 20
    // stage A: raw gram explode + hash (count only, no shuffle) —
    // xxhash64, matching the shipped Dedup.positionalGrams kernel
    val grams = docs.select(col("doc_id"),
      explode(when(length(col("text")) >= n,
        transform(sequence(lit(1), length(col("text")) - n + 1),
          i => struct(i.cast("int").as("pos"),
            xxhash64(col("text").substr(i, lit(n))).as("gh"))))
        .otherwise(array().cast("array<struct<pos:int,gh:long>>"))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    time("warm scan")(docs.count())
    time("gram explode count")(grams.count())
    time("gram explode count 2nd")(grams.count())
    val p = grams.persist(StorageLevel.MEMORY_AND_DISK)
    time("persist materialize")(p.count())
    val rep = p.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx")).select(col("gh"))
    time("repeated agg")(rep.count())
    val semi = p.join(rep, Seq("gh"), "left_semi")
    time("semi join")(semi.count())
    time("final groupBy doc")(semi.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nr")).count())
    p.unpersist()
    spark.stop()
  }
}
