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

  test("cms never underestimates and is exact at default width") {
    import spark.implicits._
    val occ = (1 to 5000).map(i => s"tok${i % 40}").toDF("v")
    val probes = occ.distinct()
    val exact = occ.groupBy(col("v")).agg(count(lit(1)).as("exact_n"))
    // tight sketch (collisions forced): est >= exact, always
    val tight = Sketches.cmsEstimate(
      Sketches.cmsCounters(occ, "v", width = 8, depth = 2), probes, "v",
      width = 8, depth = 2).join(exact, "v")
    assert(tight.filter(col("cms_est") < col("exact_n")).isEmpty)
    // roomy sketch (default 1024x4): 40 keys never collide in all rows
    val roomy = Sketches.cmsEstimate(
      Sketches.cmsCounters(occ, "v"), probes, "v").join(exact, "v")
    assert(roomy.filter(col("cms_est") =!= col("exact_n")).isEmpty)
  }

  test("histogram quantiles land within one cell of the exact percentile") {
    import spark.implicits._
    // values 1.00 .. 100.00 in cents; $1 cells
    val df = (1 to 10000).map(i => ("g", i / 100.0)).toDF("g", "v")
    val cells = Sketches.histogramCells(df, Seq("g"), "v", cellWidthCents = 100L)
    val got = Sketches.histogramQuantiles(cells, Seq("g"), 100L, Seq(5000, 9900))
      .select(col("p5000_cents"), col("p9900_cents")).as[(Long, Long)].head()
    assert(math.abs(got._1 - 5000L) <= 100L, s"p50 ${got._1}")
    assert(math.abs(got._2 - 9900L) <= 100L, s"p99 ${got._2}")
  }

  test("histogram cells merge by re-summing, quantiles unchanged") {
    import spark.implicits._
    val df = (1 to 8000).map(i => (if (i % 2 == 0) "a" else "b", (i % 997) / 10.0))
      .toDF("g", "v")
    val halves = Seq(0, 1).map(p =>
      Sketches.histogramCells(df.filter(crc32(col("v").cast("string")) % 2 === p),
        Seq("g"), "v", 50L))
    val merged = halves.reduce(_ unionByName _)
      .groupBy(col("g"), col("cell")).agg(sum(col("n")).as("n"))
    val a = Sketches.histogramQuantiles(merged, Seq("g"), 50L, Seq(5000)).collect().toSeq
    val b = Sketches.histogramQuantiles(
      Sketches.histogramCells(df, Seq("g"), "v", 50L), Seq("g"), 50L, Seq(5000)).collect().toSeq
    assert(a.sortBy(_.getString(0)) === b.sortBy(_.getString(0)))
  }

  test("cms counter frames merge by re-summing per cell") {
    import spark.implicits._
    val occ = (1 to 4000).map(i => s"w${i % 25}").toDF("v")
    val halves = Seq(0, 1).map(p =>
      Sketches.cmsCounters(occ.filter(crc32(col("v")) % 2 === p), "v",
        width = 16, depth = 3))
    val merged = halves.reduce(_ unionByName _)
      .groupBy(col("r"), col("c")).agg(sum(col("n")).as("n"))
    val direct = Sketches.cmsCounters(occ, "v", width = 16, depth = 3)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }
}
