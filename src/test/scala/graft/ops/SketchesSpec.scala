package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("hllDistinct estimates within 5% on a known cardinality") {
    import spark.implicits._
    val df = (1 to 20000).map(i => ("g", i % 7919)).toDF("g", "v")
    val est = Sketches.hllDistinct(df, Seq("g"), "v")
      .select(col("hll_est_e2")).as[Long].head() / 100.0
    assert(math.abs(est - 7919) / 7919.0 < 0.05, s"estimate $est vs 7919")
  }

  test("hllDistinct is insensitive to duplication and ordering") {
    import spark.implicits._
    val base = (1 to 3000).map(i => ("g", i)).toDF("g", "v")
    val dup = base.union(base).union(base).orderBy(rand(42))
    val a = Sketches.hllDistinct(base, Seq("g"), "v").collect().toSeq
    val b = Sketches.hllDistinct(dup, Seq("g"), "v").collect().toSeq
    assert(a === b)
  }

  test("hllDistinct tracks approx_count_distinct on real data") {
    val orders = graft.core.Tables(spark, sf, "orders")
    val ours = Sketches.hllDistinct(orders, Seq("o_orderpriority"), "o_custkey")
      .withColumnRenamed("hll_est_e2", "ours")
    val ref = orders.groupBy(col("o_orderpriority"))
      .agg((approx_count_distinct(col("o_custkey"), 0.02) * 100).as("spark_hll"),
        (countDistinct(col("o_custkey")) * 100).as("exact"))
    val rows = ours.join(ref, Seq("o_orderpriority")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Long]("ours"), r.getAs[Long]("exact"))
      assert(math.abs(est - exact).toDouble / exact < 0.10,
        s"${r.getString(0)}: $est vs exact $exact")
    }
  }

  test("register frames merge incrementally by max") {
    import spark.implicits._
    val all = (1 to 4000).map(i => ("g", i)).toDF("g", "v")
    val (left, right) = (all.filter(col("v") <= 2500), all.filter(col("v") > 1500))
    val merged = Sketches.hllRegisters(left, Seq("g"), "v")
      .union(Sketches.hllRegisters(right, Seq("g"), "v"))
      .groupBy(col("g"), col("bucket")).agg(max(col("m")).as("m"))
    val direct = Sketches.hllRegisters(all, Seq("g"), "v")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }
}
