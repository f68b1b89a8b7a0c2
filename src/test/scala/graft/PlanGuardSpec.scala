package graft

/** Plan-quality guard over EVERY declared query: no unconditioned
  * cartesian product and no Python/Scala UDF may appear in any physical
  * plan. (BroadcastNestedLoopJoin with a tiny broadcast side — centroids,
  * planes — is legitimate and distinct from CartesianProduct.) Catches the
  * classic silent regressions a refactor can introduce. */
class PlanGuardSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plan has no cartesian product or UDF") {
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ArrowEvalPython"),
        s"$name plans a Python UDF")
      assert(!plan.toLowerCase.contains("scalaudf"),
        s"$name plans a Scala UDF")
    }
  }
}
