package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ext.CorpusCuration
import graft.ext.CorpusCuration.Params

/** Dev profiler for the q36 curation funnel stages (not part of the API). */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      f // warm: JIT + codegen + parquet footers off the clock
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val p = Params()
    time("count")(docs.count())
    time("langId only")(docs.select(graft.functions.TextFunctions.langId(col("text")).as("pl"))
      .filter(col("pl").isNotNull).count())
    val filtered = CorpusCuration.qualityFilter(docs, p)
    time("qualityFilter")(filtered.count())
    time("signWithFp")(graft.operators.Dedup
      .signDocumentsWithFingerprint(filtered, "doc_id", "text").count())
    time("exactDeduped")(CorpusCuration.exactDeduped(filtered, "doc_id").count())
    val exact = CorpusCuration.exactDeduped(filtered, "doc_id")
    time("nearDupRemoved")(CorpusCuration.nearDupRemoved(exact, "doc_id", p.minJaccard).count())
    time("fused dedupedIds")(
      CorpusCuration.dedupedIds(filtered, "doc_id", "text", p.minJaccard).count())
    time("full curate")(CorpusCuration.curate(spark, docs, p)._1.count())
    spark.stop()
  }
}
