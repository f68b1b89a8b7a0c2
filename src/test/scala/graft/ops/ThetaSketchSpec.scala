package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ThetaSketch

/** KMV/theta sketches: the aggregate's k-min-distinct contract, partition
  * invariance, exact-below-saturation estimates, and the pair algebra
  * against a Scala re-derivation. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(salt: String, v: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)

  test("sketch holds the k smallest distinct hashes, ascending, any partitioning") {
    val df = (1 to 1000).map(i => ("g", s"v${i % 400}")).toDF("g", "v")
    val expected = (0 until 400).map(i => hash60("theta", s"v$i")).distinct.sorted.take(64)
    for (parts <- Seq(1, 7)) {
      val sk = ThetaSketch.sketch(df.repartition(parts), "g", "v", k = 64)
        .select(col("hs")).as[Seq[Long]].head()
      assert(sk === expected, s"parts=$parts")
    }
  }

  test("NULL values count nothing: sketch over nullable input equals the non-null subset") {
    // previously latent: a NULL value hashes to NULL and KmvMinKAgg skips
    // it, but an oracle chain without the explicit h IS NOT NULL keeps a
    // NULL row through DISTINCT — the two sides are now pinned identical
    val withNulls = Seq(("a", Some("x")), ("a", None), ("a", Some("y")),
      ("b", None), ("b", None)).toDF("g", "v")
    val got = ThetaSketch.sketch(withNulls, "g", "v", k = 16)
      .select("g", "n").as[(String, Long)].collect().toMap
    // an all-null group contributes no hashes and therefore NO sketch row —
    // the same groups the oracle's WHERE h IS NOT NULL chain yields
    assert(got === Map("a" -> 2L),
      "nulls must not contribute hashes; all-null groups must vanish")
  }

  test("estimate is exactly n below saturation") {
    val df = (1 to 50).map(i => ("g", s"x$i")).toDF("g", "v")
    val got = ThetaSketch.distinctEstimate(df, "g", "v", k = 256)
      .select("n_hashes", "est_distinct").as[(Long, Long)].head()
    assert(got === ((50L, 50L)))
  }

  test("saturated estimate is within ~3 sigma of the true distinct count") {
    val k = 64
    val n = 5000
    val df = (1 to n).map(i => ("g", s"u$i")).toDF("g", "v")
    val est = ThetaSketch.distinctEstimate(df, "g", "v", k)
      .select("est_distinct").as[Long].head()
    val sigma = n / math.sqrt(k - 1)
    assert(math.abs(est - n) < 3 * sigma, s"est $est vs true $n (sigma $sigma)")
  }

  test("SketchStore: append equals rebuild, replays are idempotent, contract mismatch refuses") {
    import graft.operators.SketchStore
    val k = 32
    val rows = (0L until 600L).map(i => (if (i % 3 == 0) "a" else "b", i))
      .toDF("g", "v")
    def freshWh() = new graft.core.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_skstore_").toString)
    // two-batch build+append vs one-shot build: buffers row-identical
    val incr = freshWh()
    SketchStore.build(incr, "s", "t", rows.filter(col("v") % 2 === 0), "g", "v", k)
    SketchStore.append(incr, "s", "t", rows.filter(col("v") % 2 === 1), "g", "v", k)
    val full = freshWh()
    SketchStore.build(full, "s", "t", rows, "g", "v", k)
    def buffers(wh: graft.core.Warehouse) =
      SketchStore.sketch(wh, "s", "t", k)
        .select("g", "hs").as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(buffers(incr) === buffers(full))
    // replaying an already-absorbed batch changes nothing (idempotent
    // merge — at-least-once ingest is safe)
    SketchStore.append(incr, "s", "t", rows.filter(col("v") % 2 === 1), "g", "v", k)
    assert(buffers(incr) === buffers(full))
    // a sketch is only mergeable under its own (k, salt) contract
    val e1 = intercept[IllegalArgumentException](
      SketchStore.append(incr, "s", "t", rows, "g", "v", k = 64))
    assert(e1.getMessage.contains("k=32"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      SketchStore.append(incr, "s", "t", rows, "g", "v", k, salt = "other"))
    assert(e2.getMessage.contains("salt"), e2.getMessage)
  }

  test("pairwise ops match the Scala re-derivation of the theta algebra") {
    val k = 32
    val rows =
      (1 to 300).map(i => ("a", s"u$i")) ++ // a: u1..u300
        (101 to 400).map(i => ("b", s"u$i")) // b: u101..u400, overlap 200
    val sk = ThetaSketch.sketch(rows.toDF("g", "v"), "g", "v", k)
    val got = ThetaSketch.pairwiseOps(sk, "g", k)
      .select("grp_a", "grp_b", "n_common", "est_intersect", "est_union")
      .as[(String, String, Long, Long, Long)].head()

    def kmv(vs: Seq[String]): Seq[Long] =
      vs.distinct.map(v => hash60("theta", v)).sorted.take(k)
    val (ha, hb) = (kmv((1 to 300).map(i => s"u$i")), kmv((101 to 400).map(i => s"u$i")))
    val hmax = 1L << 60
    val (ta, tb) = (if (ha.size < k) hmax else ha(k - 1), if (hb.size < k) hmax else hb(k - 1))
    val theta = math.min(ta, tb)
    val nCommon = ha.toSet.intersect(hb.toSet).count(_ < theta).toLong
    val nBelow = ha.count(_ < theta).toLong + hb.count(_ < theta).toLong
    def scaled(c: Long) = math.floor(c.toDouble * hmax.toDouble / theta.toDouble).toLong
    assert(got === (("a", "b", nCommon, scaled(nCommon), scaled(nBelow - nCommon))))
  }
}
