package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Sketches

/** Streaming HLL: the register table is the whole (bounded) state, any
  * snapshot estimates exactly like the batch sketch over the same rows,
  * and the micro-batch split cannot change the answer. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rows(grp: String, lo: Long, hi: Long): Seq[(String, Long)] =
    (lo until hi).map(grp -> _)

  test("streaming registers == batch registers; estimate matches batch HLL") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val run = StreamingSketch.hllRegisterStream(
        src.toDF().toDF("grp", "v"), Seq("grp"), "v")
      .writeStream.outputMode("complete").format("memory").queryName("hll_reg")
      .option("checkpointLocation", Files.createTempDirectory("graft_shll_").toString)
      .start()
    try {
      // three batches with overlap — idempotent merge must absorb replays
      src.addData(rows("a", 0, 400) ++ rows("b", 0, 50): _*)
      run.processAllAvailable()
      src.addData(rows("a", 200, 700) ++ rows("b", 25, 80): _*)
      run.processAllAvailable()
      src.addData(rows("a", 650, 1000): _*)
      run.processAllAvailable()
      val streamed = spark.table("hll_reg")
      val batch = (rows("a", 0, 400) ++ rows("b", 0, 50) ++
        rows("a", 200, 700) ++ rows("b", 25, 80) ++ rows("a", 650, 1000))
        .toDF("grp", "v")
      // the register tables are identical row-for-row...
      val expectReg = Sketches.hllRegisters(batch, Seq("grp"), "v")
      assert(streamed.exceptAll(expectReg).isEmpty &&
        expectReg.exceptAll(streamed).isEmpty)
      // ...so the estimates are too, and state is register-bounded
      val est = Sketches.estimateFromRegisters(streamed, Seq("grp"))
        .as[(String, Long)].collect().toMap
      val expect = Sketches.hllDistinct(batch, Seq("grp"), "v")
        .as[(String, Long)].collect().toMap
      assert(est === expect)
      // sanity: estimates in HLL error range of the true cardinalities
      assert(math.abs(est("a") / 100.0 - 1000) < 1000 * 0.05)
      assert(math.abs(est("b") / 100.0 - 80) < 80 * 0.1 + 3)
      assert(streamed.count() <= 2 * 4096)
    } finally run.stop()
  }

  test("registers survive a stop/restart from the checkpoint (state store)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("graft_shllr_src_").toString
    val ckpt = Files.createTempDirectory("graft_shllr_ck_").toString
    val schema = StructType(Seq(
      StructField("grp", StringType), StructField("v", LongType)))
    def runOnce(name: String): Unit = {
      val run = StreamingSketch.hllRegisterStream(
          spark.readStream.schema(schema).parquet(s"$srcDir/*.parquet"),
          Seq("grp"), "v")
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      run.awaitTermination()
    }
    rows("a", 0, 500).toDF("grp", "v")
      .coalesce(1).write.parquet(s"$srcDir/b1.parquet")
    runOnce("hll_r1")
    // second run picks up only the new file; the register state restores
    // from the checkpointed state store, so the final table reflects BOTH
    rows("a", 400, 900).toDF("grp", "v")
      .coalesce(1).write.parquet(s"$srcDir/b2.parquet")
    runOnce("hll_r2")
    val got = spark.table("hll_r2")
    val expect = Sketches.hllRegisters(
      rows("a", 0, 900).toDF("grp", "v"), Seq("grp"), "v")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("a different batch split yields the identical register table") {
    implicit val sqlCtx = spark.sqlContext
    def runWith(batches: Seq[Seq[(String, Long)]], name: String) = {
      val src = MemoryStream[(String, Long)]
      val run = StreamingSketch.hllRegisterStream(
          src.toDF().toDF("grp", "v"), Seq("grp"), "v")
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft_shll_$name").toString)
        .start()
      try {
        batches.foreach { b => src.addData(b: _*); run.processAllAvailable() }
        spark.table(name).collect().toSet
      } finally run.stop()
    }
    val all = rows("a", 0, 300)
    val one = runWith(Seq(all), "hll_one")
    val three = runWith(Seq(all.take(10), all.slice(10, 250), all.drop(250)),
      "hll_three")
    assert(one === three)
  }
}
