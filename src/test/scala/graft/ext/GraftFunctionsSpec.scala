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
}
