package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** JSONL shard export (stable membership, manifest counts, round-trip) and
  * the one-pass profiler. */
class ExportProfileSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl shards round-trip, manifest counts match, membership is stable") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text", "lang")
    val out = Files.createTempDirectory("graft_exp_").toString
    val manifest = Export.writeJsonlShards(docs, out, nShards = 4,
      shardKey = "doc_id", verifyCounts = true)
    val rows = manifest.collect()
    assert(rows.length >= 1 && rows.length <= 4)
    assert(rows.map(_.getAs[Long]("rows")).sum === docs.count())
    assert(rows.forall(_.getAs[Long]("bytes") > 0))
    // round trip: nothing lost or duplicated
    val back = spark.read.json(s"$out/part-*")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // stability: re-export to a second dir yields identical shard membership
    val out2 = Files.createTempDirectory("graft_exp2_").toString
    Export.writeJsonlShards(docs, out2, nShards = 4, shardKey = "doc_id")
    def membership(dir: String) = spark.read.json(s"$dir/part-*")
      .select(element_at(split(input_file_name(), "/"), -1).as("f"), col("doc_id"))
      .withColumn("shard", regexp_extract(col("f"), "part-(\\d+)", 1))
      .select("shard", "doc_id")
    val a = membership(out).collect().toSet
    val b = membership(out2).collect().toSet
    assert(a === b, "shard membership must be content-defined, not run-defined")
  }

  test("profiler: one row per column with exact null counts and sane ranges") {
    val df = Seq((1L, Some("a"), 1.5), (2L, None, 2.5), (3L, Some("c"), 2.5))
      .toDF("id", "s", "v")
    val p = Profiler.profile(df).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet === Set("id", "s", "v"))
    assert(p("id").getAs[Long]("n_rows") === 3L)
    assert(p("s").getAs[Long]("n_nulls") === 1L)
    assert(p("id").getAs[String]("min") === "1" && p("id").getAs[String]("max") === "3")
    assert(p("v").getAs[Long]("approx_distinct") === 2L)
  }

  test("profiler: numeric bounds are numeric (not lexicographic), dotted names and maps survive") {
    val df = Seq((2L, Map("a" -> 1)), (10L, Map("b" -> 2)))
      .toDF("user.id", "props")
    val p = Profiler.profile(df).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    // lexicographic order would give min "10" / max "2"
    assert(p("user.id").getAs[String]("min") === "2")
    assert(p("user.id").getAs[String]("max") === "10")
    // unorderable map column: null bounds, counts still real
    assert(p("props").getAs[String]("min") === null)
    assert(p("props").getAs[Long]("n_nulls") === 0L)
  }

  test("tokenDrift equals a hand-computed TV distance; identical slices read 0, disjoint 1") {
    // a: {x:2, y:1, z:1} (N=4); b: {x:1, y:3} (N=4); c ≡ a; d: {q:2} disjoint
    val docs = Seq(
      ("a", "x x y z"), ("b", "x y y y"), ("c", "x x y z"), ("d", "q q"))
      .toDF("src", "text")
    val got = Profiler.tokenDrift(docs, "src", "text", topN = 64)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // TV(a,b) = ½(|2/4−1/4| + |1/4−3/4| + |1/4−0|) = ½·(1/4+2/4+1/4) = 1/2
    assert(got(("a", "b")) === 5000L)
    assert(got(("a", "c")) === 0L, "identical distributions must read 0")
    assert(got(("a", "d")) === 10000L, "disjoint vocabularies must read 1")
    assert(got.size === 6) // 4 slices → 6 pairs
    // the residual bucket carries mass: with topN=1 only the global top
    // token (x? counts: x=5? x:2+1+2=5, y:1+3+1=5, q:2 — tie x/y → y? order
    // by count desc, token asc picks the lexicographically FIRST of the
    // tie: x) stays itemized, everything else folds into "other" —
    // TV(a,d): p_a = {x:2/4, other:2/4}, p_d = {x:0, other:1} → ½(2/4+2/4)= ½
    val coarse = Profiler.tokenDrift(docs, "src", "text", topN = 1)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(coarse(("a", "d")) === 5000L)
    assert(coarse(("a", "c")) === 0L)
  }

  test("empty export with verifyCounts returns an empty manifest, no crash") {
    val out = Files.createTempDirectory("graft_exp0_").toString
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m = Export.writeJsonlShards(empty, out, nShards = 4,
      shardKey = "doc_id", verifyCounts = true)
    assert(m.columns.toSeq === Seq("shard", "file", "bytes", "rows"))
    assert(m.filter(col("rows") > 0).count() === 0L)
  }
}
