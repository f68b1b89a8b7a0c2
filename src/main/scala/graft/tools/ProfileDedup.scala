package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{GraftSession, Tables}
import graft.operators.Dedup
import graft.functions.TextFunctions._

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
    // composed pipeline, persisted stage by stage
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 5).persist(StorageLevel.MEMORY_AND_DISK)
    time("1 shingles+persist")(sh.count())
    val hashed = sh.withColumn("__h", stableHash60(col("sh")) % Dedup.MinhashP20)
    val aggs = (0 until 16).map(i =>
      min((col("__h") * Dedup.affineA(i) + Dedup.affineB(i)) % Dedup.MinhashP31).as(s"mh_$i"))
    val sig = hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("2 signature+persist")(sig.count())
    val cands = Dedup.lshCandidatePairs(Dedup.lshBands(sig, "doc_id", 4, 4), "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("3 cands+persist")(cands.count())
    val sets = sh.groupBy(col("doc_id"))
      .agg(collect_set(stableHash60(col("sh"))).as("shs"), count(lit(1)).as("sz"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("4 sets+persist")(sets.count())
    val scored = cands
      .join(sets.select(col("doc_id").as("a_id"), col("shs").as("sh_a"), col("sz").as("sz_a")), Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"), col("shs").as("sh_b"), col("sz").as("sz_b")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
    time("5 verify join")(scored.count())
    val scoredB = cands
      .join(broadcast(sets.select(col("doc_id").as("a_id"), col("shs").as("sh_a"), col("sz").as("sz_a"))), Seq("a_id"))
      .join(broadcast(sets.select(col("doc_id").as("b_id"), col("shs").as("sh_b"), col("sz").as("sz_b"))), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
    time("5b verify bcast")(scoredB.count())
    // prefilter variant: minhash agreement >= 4 of 16 before array join
    val sigA = sig.select(col("doc_id").as("a_id"), struct((0 until 16).map(i => col(s"mh_$i").as(s"a_$i")): _*).as("sa"))
    val sigB = sig.select(col("doc_id").as("b_id"), struct((0 until 16).map(i => col(s"mh_$i").as(s"b_$i")): _*).as("sb"))
    val agree = (0 until 16).map(i => when(col(s"sa.a_$i") === col(s"sb.b_$i"), 1).otherwise(0)).reduce(_ + _)
    val pre = cands.join(broadcast(sigA), Seq("a_id")).join(broadcast(sigB), Seq("b_id"))
      .withColumn("agree", agree).filter(col("agree") >= 4).select("a_id", "b_id")
    time("6 prefilter")(pre.count())
    val scoredC = pre
      .join(broadcast(sets.select(col("doc_id").as("a_id"), col("shs").as("sh_a"), col("sz").as("sz_a"))), Seq("a_id"))
      .join(broadcast(sets.select(col("doc_id").as("b_id"), col("shs").as("sh_b"), col("sz").as("sz_b"))), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
    time("7 verify prefiltered")(scoredC.count())
    time("full nearDupPairs")(Dedup.nearDupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
