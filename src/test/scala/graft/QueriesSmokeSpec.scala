package graft

/** t1 smoke (SURVEY §5): every declared query runs end-to-end on sf0.001
  * and its oracle key set stays in sync. Value-level correctness is the
  * driver's DuckDB gate (tools/check_oracle.py locally). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materialize — no exception = pass; many are 0-row at sf0.001
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
