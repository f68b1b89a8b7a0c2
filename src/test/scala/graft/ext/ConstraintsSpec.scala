package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** dbt-schema-test semantics: unique ignores NULL keys, not_null counts
  * them, relationships ignores NULL foreign keys, and the report is one
  * row per check with zero-coalesced counts. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("uniqueViolations counts duplicated non-null keys (dbt semantics)") {
    val df = Seq(Option(1), Option(1), Option(2),
      None, None).toDF("k")
    // two NULLs are NOT a duplicate pair; key 1 is one violating value
    val n = Constraints.uniqueViolations(df, Seq("k")).as[Long].head()
    assert(n === 1L)
  }

  test("notNullViolations counts NULL rows") {
    val df = Seq(Option("a"), None, None).toDF("c")
    assert(Constraints.notNullViolations(df, "c").as[Long].head() === 2L)
  }

  test("fkViolations counts only non-null orphans") {
    val child = Seq(Option(1), Option(2), Option(99), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val n = Constraints.fkViolations(child, "fk", parent, "pk").as[Long].head()
    assert(n === 1L) // only 99; the NULL fk passes (dbt relationships)
  }

  test("report unions named checks with zero-coalesced counts") {
    val clean = Seq(1, 2, 3).toDF("k")
    val got = Constraints.report(Seq(
      "u" -> Constraints.uniqueViolations(clean, Seq("k")),
      "n" -> Constraints.notNullViolations(clean, "k")))
      .as[(String, Long)].collect().toMap
    assert(got === Map("u" -> 0L, "n" -> 0L))
  }
}
