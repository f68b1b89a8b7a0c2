package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump99 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q99_incremental_near_dup")(spark, "/root/testdata/sf0.001")
    // q99 returns an eagerly-checkpointed frame; dump the OPTIMIZED plan of
    // the pre-checkpoint computation via a fresh non-eager run
    val out = new java.io.PrintWriter(args(0))
    out.println(df.queryExecution.optimizedPlan.numberedTreeString)
    out.close()
    spark.stop()
  }
}
