package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing proof: two tables bucketed on the join key join with ZERO
  * exchanges — the co-located repeated-join strategy for 100 TB fact-fact
  * joins (write once bucketed, join many times shuffle-free). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a crashed prior run can leave the managed location behind without a
    // catalog entry — clear it so saveAsTable can claim the path
    val whDir = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(whDir, t)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "ov")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_orders")
    (1 to 3000).map(i => ((i % 1000 + 1).toLong, s"l$i")).toDF("k", "lv")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_lineitem")
    // force the non-broadcast path: the point is that two bucketed sides
    // sort-merge WITHOUT a shuffle exchange (broadcast would trivially win
    // at this toy size and bypass bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "k")
      assert(joined.count() === 3000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
