// not part of the library: one-off workload probe (chunk & pair counts)
package graft.tools
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
object Q111Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.core.Tables(spark, dir, "documents")
    val chunks = graft.operators.Chunker.tokenChunks(docs, "doc_id", "text", size = 32, stride = 24)
      .select((col("doc_id") * lit(100000L) + col("chunk_idx")).as("doc_id"), col("chunk").as("text"))
    println("CHUNKS " + chunks.count())
    val pairs = graft.queries.DedupQueries.q111ChunkNearDup(spark, dir)
    println("PAIRS " + pairs.count())
    spark.stop()
  }
}
