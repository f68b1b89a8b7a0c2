package graft.tools

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup

/** Dev profiler for the near-dup pipeline stages (not part of the API). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup")(docs.count())
    time("shingleRows")(Dedup.shingleRows(docs, "doc_id", "text", 5).count())
    time("minhashSignature")(Dedup.minhashSignature(docs, "doc_id", "text").count())
    val sig = Dedup.minhashSignature(docs, "doc_id", "text")
    time("cands")(Dedup.lshCandidatePairs(Dedup.lshBands(sig, "doc_id", 4, 4), "doc_id").count())
    time("full nearDupPairs")(Dedup.nearDupPairs(docs, "doc_id", "text").count())
    time("simhash")(Dedup.simhash(docs, "doc_id", "text").count())
    time("simhashPairs")(Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"), "doc_id").count())
    spark.stop()
  }
}
