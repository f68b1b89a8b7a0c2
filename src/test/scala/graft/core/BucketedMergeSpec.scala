package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed-mart MERGE: the target side must join straight off its buckets
  * (exactly one Exchange in the whole merge plan — the source delta), the
  * merge semantics must match mergeAsRewrite, and the post-merge mart must
  * still be bucketed (joins again with zero exchanges). */
class BucketedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshMart(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft_mart.$name")
    spark.sql(s"DROP TABLE IF EXISTS graft_mart.${name}__next")
    val whDir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_mart.db")
    Seq(name, s"${name}__next").foreach { t =>
      val d = new java.io.File(whDir, t)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
  }

  test("merging into a never-published mart fails with the contract message") {
    val wh = new Warehouse(spark, java.nio.file.Files
      .createTempDirectory("graft_bm").toString)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_mart")
    freshMart("facts_nope")
    val e = intercept[IllegalArgumentException](
      wh.mergeBucketedMart("facts", "nope",
        Seq((1L, "a")).toDF("id", "v"), Seq("id"), 4))
    assert(e.getMessage.contains("publishBucketedMart"))
  }

  test("mergeBucketedMart shuffles only the source delta and stays bucketed") {
    val wh = new Warehouse(spark, java.nio.file.Files
      .createTempDirectory("graft_bm").toString)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_mart")
    freshMart("facts_sales")
    wh.overwrite("facts", "sales",
      (1L to 1000L).map(k => (k, s"v$k", "old")).toDF("k", "payload", "status"))
    wh.publishBucketedMart("facts", "sales", Seq("k"), nBuckets = 8)

    val delta = Seq(
      (5L, "v5b", "updated"),    // update an existing key
      (2000L, "vn", "inserted")) // brand-new key
      .toDF("k", "payload", "status")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // plan check on the exact frame the merge writes
      val merged = graft.ops.Relational.mergeAsRewrite(
        spark.table("graft_mart.facts_sales"), delta, Seq("k"), nullSafe = false)
      val plan = merged.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1,
        s"expected ONE exchange (source delta only), got $exchanges:\n$plan")

      val mart = wh.mergeBucketedMart("facts", "sales", delta, Seq("k"), nBuckets = 8)
      val after = spark.table(mart)
      assert(after.count() === 1001)
      assert(after.filter(col("k") === 5L).select("payload", "status")
        .as[(String, String)].head() === (("v5b", "updated")))
      assert(after.filter(col("k") === 2000L).count() === 1)
      assert(after.filter(col("status") === "old").count() === 999)

      // still bucketed: a second bucketed-side join plans no exchange on it
      val again = graft.ops.Relational.mergeAsRewrite(
        spark.table(mart), delta.withColumn("status", lit("x")), Seq("k"),
        nullSafe = false)
      val planAgain = again.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(planAgain).length === 1,
        s"mart lost its bucket layout after merge:\n$planAgain")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a crash between DROP and RENAME is recovered, not destroyed, on retry") {
    val wh = new Warehouse(spark, java.nio.file.Files
      .createTempDirectory("graft_bm2_").toString)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_mart")
    freshMart("facts_crash")
    wh.overwrite("facts", "crash",
      (1L to 100L).map(k => (k, "old")).toDF("k", "status"))
    wh.publishBucketedMart("facts", "crash", Seq("k"), nBuckets = 4)
    val delta = Seq((1L, "updated"), (500L, "inserted")).toDF("k", "status")
    wh.mergeBucketedMart("facts", "crash", delta, Seq("k"), nBuckets = 4)

    // simulate the crash window: merged result sits in __next, mart is gone
    spark.sql("ALTER TABLE graft_mart.facts_crash RENAME TO graft_mart.facts_crash__next")
    // a retry of the same merge must adopt __next and re-apply (idempotent)
    wh.mergeBucketedMart("facts", "crash", delta, Seq("k"), nBuckets = 4)
    val after = spark.table("graft_mart.facts_crash")
    assert(after.count() === 101)
    assert(after.filter(col("k") === 1L).select("status").as[String].head() === "updated")
    assert(after.filter(col("k") === 500L).count() === 1)
  }
}
