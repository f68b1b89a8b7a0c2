package graft.workflow

import org.scalatest.funsuite.AnyFunSuite

import Workflow._

/** Trigger-rule truth table, branching, retries, resume-skip, and the
  * end-rollup raise — the reference's Airflow semantics (SURVEY §7.4.1). */
class WorkflowSpec extends AnyFunSuite {

  private def spec(id: String, deps: Seq[String] = Nil,
                   fail: Boolean = false, retries: Int = 0,
                   rule: TriggerRule = AllSuccess,
                   log: StringBuilder = new StringBuilder): TaskSpec =
    TaskSpec(id, deps,
      run = () => { log.append(id + ";"); if (fail) throw new RuntimeException(s"$id boom") },
      retries = retries, triggerRule = rule)

  test("linear success chain runs in order") {
    val log = new StringBuilder
    val r = Workflow.run(Seq(
      spec("a", log = log), spec("b", Seq("a"), log = log), spec("c", Seq("b"), log = log)))
    assert(log.toString === "a;b;c;")
    assert(r.allSuccess)
  }

  test("failure marks dependents upstream_failed; all_done end task still runs") {
    val log = new StringBuilder
    val r = Workflow.run(Seq(
      spec("a", fail = true, log = log),
      spec("b", Seq("a"), log = log),
      spec("end", Seq("b"), rule = AllDone, log = log)))
    assert(r.status("a") === "failed")
    assert(r.status("b") === "upstream_failed")
    assert(r.status("end") === "success") // ran despite upstream failure
    assert(log.toString === "a;end;")
    val ex = intercept[IllegalStateException](r.assertAllSuccess())
    assert(ex.getMessage.contains("a=failed"))
  }

  test("retries: flaky task succeeds on second attempt") {
    var calls = 0
    val r = Workflow.run(Seq(TaskSpec("flaky",
      run = () => { calls += 1; if (calls < 2) throw new RuntimeException("flake") },
      retries = 3)))
    assert(r.status("flaky") === "success")
    assert(r.runs.head.attempts === 2)
  }

  test("branch skips unchosen dependents; none_skipped propagates, all_done ignores") {
    val log = new StringBuilder
    val r = Workflow.run(Seq(
      TaskSpec("check", branch = Some(() => Seq("work"))),
      spec("work", Seq("check"), log = log),
      spec("bypass", Seq("check"), log = log),
      spec("after_bypass", Seq("bypass"), log = log), // all_success: skip cascades
      spec("guard", Seq("bypass"), rule = NoneSkipped, log = log),
      spec("end", Seq("work", "bypass"), rule = AllDone, log = log)))
    assert(r.status("work") === "success")
    assert(r.status("bypass") === "skipped")
    assert(r.status("after_bypass") === "skipped")
    assert(r.status("guard") === "skipped")
    assert(r.status("end") === "success")
    assert(r.allSuccess) // skipped counts as ok (reference: success/skipped)
  }

  test("resume-skip: previously-succeeded tasks don't re-run") {
    val log = new StringBuilder
    val r = Workflow.run(Seq(
      spec("a", log = log), spec("b", Seq("a"), log = log)),
      resumeDone = Set("a"))
    assert(log.toString === "b;")
    assert(r.status("a") === "success")
  }

  test("python all([])==True parity: empty graph rolls up success") {
    Workflow.run(Seq.empty).assertAllSuccess()
  }

  test("cycles are rejected") {
    intercept[IllegalArgumentException] {
      Workflow.run(Seq(spec("a", Seq("b")), spec("b", Seq("a"))))
    }
  }

  test("resume never skips a branch task: the branch re-decides on re-run") {
    val log = new StringBuilder
    val r = Workflow.run(Seq(
      TaskSpec("check", branch = Some(() => Seq.empty)), // chooses NO dependent
      spec("work", Seq("check"), log = log)),
      resumeDone = Set("check")) // a prior run recorded the branch as done
    assert(r.status("work") === "skipped") // branch ran and skipped it
    assert(log.isEmpty)
  }

  test("execution timeout: hung task fails, dependents upstream_failed, rollup raises") {
    val r = Workflow.run(Seq(
      TaskSpec("hung", run = () => Thread.sleep(60000), timeoutMs = Some(100L)),
      TaskSpec("after", deps = Seq("hung")),
      TaskSpec("end", deps = Seq("after"), triggerRule = AllDone)))
    assert(r.status("hung") === "failed")
    assert(r.runs.find(_.taskId == "hung").get.error.get.contains("execution timeout"))
    assert(r.status("after") === "upstream_failed")
    assert(r.status("end") === "success") // all_done still runs
    intercept[IllegalStateException](r.assertAllSuccess())
  }

  test("a timed-out attempt retries like any failure") {
    var calls = 0
    val r = Workflow.run(Seq(TaskSpec("flaky_slow",
      run = () => { calls += 1; if (calls == 1) Thread.sleep(60000) },
      retries = 1, timeoutMs = Some(100L))))
    assert(calls === 2)
    assert(r.status("flaky_slow") === "success")
    assert(r.runs.head.attempts === 2)
  }

  test("retry delay waits between attempts") {
    var calls = 0
    val t0 = System.nanoTime()
    val r = Workflow.run(Seq(TaskSpec("flaky",
      run = () => { calls += 1; if (calls <= 2) sys.error("boom") },
      retries = 2, retryDelayMs = 120L)))
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(r.status("flaky") === "success")
    assert(elapsedMs >= 240L, s"two retry delays of 120ms each, got ${elapsedMs}ms")
  }

  test("time sensor blocks until the (virtual) clock reaches its target") {
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    var observedAtRun = -1L
    val r = Workflow.run(Seq(
      Workflow.timeSensor("wait", deps = Nil, targetMs = 500L,
        clock = () => clock.addAndGet(100L), pollMs = 1L),
      TaskSpec("work", deps = Seq("wait"),
        run = () => observedAtRun = clock.get())))
    assert(r.allSuccess)
    assert(observedAtRun >= 500L, s"work ran at virtual time $observedAtRun, before the sensor target")
  }

  test("dagrun timeout: tasks past the deadline fail with dagrun_timeout") {
    val r = Workflow.run(Seq(
      TaskSpec("slow", run = () => Thread.sleep(150)),
      TaskSpec("late", deps = Seq("slow")),
      TaskSpec("end", deps = Seq("late"), triggerRule = AllDone)),
      runTimeoutMs = Some(50L))
    assert(r.status("slow") === "success") // already running when deadline hit
    assert(r.status("late") === "failed")
    assert(r.runs.find(_.taskId == "late").get.error === Some("dagrun_timeout"))
    intercept[IllegalStateException](r.assertAllSuccess())
  }
}
