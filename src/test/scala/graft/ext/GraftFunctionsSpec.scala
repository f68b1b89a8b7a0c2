package graft.ext

import org.apache.spark.sql.graft.GraftFunctions

import graft.SparkSpec

/** SQL-surface registration of the native expressions. */
class GraftFunctionsSpec extends SparkSpec {

  test("registered functions evaluate from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
         array_long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot,
         array_long_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS inter,
         element_at(minhash_sigs(array(7L, 8L), 4), 1) AS mh0""").head()
    assert(r.getLong(0) === 32L)
    assert(r.getLong(1) === 2L)
    // mh0 = min over h∈{7,8} of (h*1000003 + 12345) % (2^31-1)
    assert(r.getLong(2) === (7L * 1000003L + 12345L) % 2147483647L)
  }

  test("bpe_token_count evaluates from spark.sql with a literal merge table") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT bpe_token_count('low lower',
           array(array('l','o'), array('lo','w'))) AS n""").head()
    assert(r.getLong(0) === 4L) // [low] + [low,e,r]
  }

  test("sorted intersect count = hash intersect count on sorted distinct sets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.apache.spark.sql.graft.MinHashExprs
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)), // partial overlap -> 2
      (Seq(1L, 2L), Seq(1L, 2L)),                   // identical -> 2
      (Seq(1L, 2L), Seq(7L, 8L)),                   // disjoint -> 0
      (Seq.empty[Long], Seq(1L)),                   // empty side -> 0
      (Seq(5L), Seq(1L, 2L, 3L, 4L, 5L))).toDF("a", "b")
    val got = df.select(
      MinHashExprs.sortedIntersectCount(col("a"), col("b")).as("s"),
      MinHashExprs.intersectCount(col("a"), col("b")).as("h"))
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(2L, 2L, 0L, 0L, 1L))
    assert(got.forall(r => r._1 == r._2), s"sorted vs hash disagree: $got")
  }

  test("kernel rule rewrites HOF patterns to the codegen'd expressions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val withRule = !spark.experimental.extraOptimizations
      .contains(org.apache.spark.sql.graft.GraftKernelRules)
    if (withRule)
      spark.experimental.extraOptimizations ++=
        Seq(org.apache.spark.sql.graft.GraftKernelRules)
    // parquet-backed input: a local Seq would be constant-folded away
    // before the plan string can show the rewrite
    val dir = java.nio.file.Files.createTempDirectory("graft_kernel_").toString
    Seq(
      (Array(1L, 2L, 3L), Array(2L, 3L, 9L)),
      (Array(4L, 5L), Array(5L, 4L))).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)

    val inter = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(inter.queryExecution.optimizedPlan.toString
      .contains("array_long_intersect_count"),
      inter.queryExecution.optimizedPlan.toString)
    assert(inter.as[Int].collect().toSeq === Seq(2, 2))

    val dot = df.select(
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _).as("d"))
    assert(dot.queryExecution.optimizedPlan.toString.contains("array_long_dot"),
      dot.queryExecution.optimizedPlan.toString)
    assert(dot.as[Long].collect().toSeq === Seq(2L * 1 + 3 * 2 + 9 * 3, 4L * 5 + 5 * 4))

    // HOF-exact edge semantics survive the rewrite: unequal lengths and
    // null elements yield NULL (zip_with pads; null products null the sum)
    val edir = java.nio.file.Files.createTempDirectory("graft_kernel_e_").toString
    Seq(
      (Array[java.lang.Long](1L, 2L), Array[java.lang.Long](3L)),
      (Array[java.lang.Long](1L, null), Array[java.lang.Long](3L, 4L)),
      (Array[java.lang.Long](2L, 3L), Array[java.lang.Long](4L, 5L)))
      .toDF("a", "b").write.mode("overwrite").parquet(edir)
    val edge = spark.read.parquet(edir)
      .select(aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _).as("d"))
    assert(edge.queryExecution.optimizedPlan.toString.contains("array_long_dot"))
    assert(edge.orderBy(col("d").asc_nulls_first).as[Option[Long]].collect().toSeq ===
      Seq(None, None, Some(23L)))

    // a pattern that must NOT rewrite: non-long arrays
    val sdir = java.nio.file.Files.createTempDirectory("graft_kernel_s_").toString
    Seq((Array("x"), Array("x"))).toDF("a", "b").write.mode("overwrite").parquet(sdir)
    val strs = spark.read.parquet(sdir)
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(!strs.queryExecution.optimizedPlan.toString
      .contains("array_long_intersect_count"))
    assert(strs.as[Int].head() === 1)
  }
}
