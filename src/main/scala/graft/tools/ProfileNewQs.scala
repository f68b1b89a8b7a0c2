package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.operators.{Bpe, Dedup}

/** Dev profiler for q117/q118/q119 (not part of the API). */
object ProfileNewQs {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables(spark, dir, "documents")
    time("q117 full")(graft.queries.CurationQueries.q117EpochShuffle(spark, dir)
      .write.format("noop").mode("overwrite").save())
    graft.queries.CurationQueries.q117EpochShuffle(spark, dir).explain("formatted")
    time("bpe learn 200")(Bpe.learnMergesFast(docs, "text", 200, minCount = 2L).size)
    val merges = Bpe.learnMergesFast(docs, "text", 200, minCount = 2L)
    time("bpe encode+count")(docs.select(
      explode(Bpe.bpeEncode(col("text"), merges)).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("piece")).limit(40)
      .write.format("noop").mode("overwrite").save())
    time("q119 grams only")(Dedup.repeatedSpanStats(docs, "doc_id", "text", 20)
      .filter(col("n_repeated") > 0)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
