package graft.workflow

import scala.collection.mutable

/** Deterministic workflow runner — the engine's control plane replacing the
  * reference's Airflow DAG semantics (SURVEY §2.11): dependencies,
  * trigger rules (`all_success` default, `all_done` end tasks,
  * `none_skipped`), branch operators, retries, resume-skip, and the
  * end-of-run status rollup that *raises* after the all_done tasks ran
  * (reference utlis/etl_manager.py:471-548 — subtle vs fail-fast).
  *
  * Tasks execute sequentially in deterministic topological order (input
  * order breaks ties); at cluster scale the data-plane parallelism lives
  * inside each task's Spark job, and independent tasks can be dispatched to
  * Spark scheduler pools — the runner's semantics don't change.
  */
object Workflow {

  sealed trait TriggerRule
  /** Run iff every dependency succeeded (Airflow default). */
  case object AllSuccess extends TriggerRule
  /** Run once every dependency is terminal, regardless of outcome
    * (reference end/status tasks, dag_etlpipeline__root.py:51,141). */
  case object AllDone extends TriggerRule
  /** Run unless some dependency was skipped
    * (reference dag_etlpipeline__staging.py:94,120,189). */
  case object NoneSkipped extends TriggerRule

  sealed trait Status { def terminal: Boolean = true }
  case object Success extends Status
  case object Failed extends Status
  case object Skipped extends Status
  case object UpstreamFailed extends Status

  /** One task: `run` does the work (a Spark job); `branch`, when set, runs
    * instead and returns the dependent task ids to follow — all other
    * dependents are skipped (BranchPythonOperator semantics, reference
    * dag_etlpipeline__datavault.py:112-118).
    *
    * `retryDelayMs` waits between attempts (reference retry_delay=10–60 s,
    * dag_etlpipeline__root.py:38); `timeoutMs` bounds one attempt
    * (execution_timeout) — a timed-out attempt fails and retries like any
    * other failure. */
  final case class TaskSpec(
      id: String,
      deps: Seq[String] = Nil,
      run: () => Unit = () => (),
      retries: Int = 0,
      triggerRule: TriggerRule = AllSuccess,
      branch: Option[() => Seq[String]] = None,
      retryDelayMs: Long = 0L,
      timeoutMs: Option[Long] = None)

  /** TimeSensor (reference dag_etlpipeline__root.py:81-85): blocks until
    * `clock()` reaches `targetMs`, polling at `pollMs`. The reference
    * staggers source groups by wait_time minutes to spread cluster load;
    * with the default real clock this does exactly that, and tests inject
    * a virtual clock so the semantics stay deterministic. */
  def timeSensor(id: String, deps: Seq[String], targetMs: Long,
                 clock: () => Long = () => System.currentTimeMillis(),
                 pollMs: Long = 50L): TaskSpec =
    TaskSpec(id, deps, run = () => {
      while (clock() < targetMs) Thread.sleep(pollMs)
    }, triggerRule = NoneSkipped)

  /** TriggerDagRunOperator(wait_for_completion=True, allowed_states=
    * ['success']) as a task: runs the child graph inline, records its
    * result, and fails the trigger task unless the child run reaches an
    * allowed overall state (reference dag_etlpipeline__root.py:62-68).
    * The child's result is retrievable from `childResults` after the run. */
  def triggerTask(id: String, deps: Seq[String],
                  child: () => RunResult,
                  childResults: mutable.Map[String, RunResult],
                  retries: Int = 0, retryDelayMs: Long = 0L,
                  triggerRule: TriggerRule = NoneSkipped): TaskSpec =
    TaskSpec(id, deps, run = () => {
      val res = child()
      childResults(id) = res
      if (!res.allSuccess)
        throw new IllegalStateException(
          s"sub-workflow $id not in allowed states: " +
            res.runs.filter(r => r.status != "success" && r.status != "skipped")
              .map(r => s"${r.taskId}=${r.status}").mkString(", "))
    }, retries = retries, retryDelayMs = retryDelayMs, triggerRule = triggerRule)

  final case class TaskRun(taskId: String, status: String, attempts: Int, error: Option[String])

  final case class RunResult(runs: Seq[TaskRun]) {
    def status(id: String): String = runs.find(_.taskId == id).get.status
    def allSuccess: Boolean = runs.forall(r => r.status == "success" || r.status == "skipped")
    /** The reference's check_state rollup: raise unless every task is
      * success/skipped (etl_manager.py:511-548). Called after the run —
      * all_done tasks have already executed. */
    def assertAllSuccess(): Unit = {
      val bad = runs.filter(r => r.status != "success" && r.status != "skipped")
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"run failed: ${bad.map(r => s"${r.taskId}=${r.status}").mkString(", ")}")
    }
  }

  /** Execute the graph. `resumeDone`: task ids with a prior success for this
    * (etl_date, source) — they are marked success without running
    * (check_conditions skip-if-succeeded, reference etl_manager.py:435-468).
    * `runTimeoutMs` is the dagrun_timeout (reference 90–360 min,
    * dag_etlpipeline__root.py:27): once the run exceeds it, no further task
    * starts — each remaining runnable task is marked failed with
    * `dagrun_timeout`, so the end-of-run rollup raises. */
  def run(tasks: Seq[TaskSpec], resumeDone: Set[String] = Set.empty,
          runTimeoutMs: Option[Long] = None): RunResult = {
    val deadline = runTimeoutMs.map(System.currentTimeMillis() + _)
    val byId = tasks.map(t => t.id -> t).toMap
    require(byId.size == tasks.size, "duplicate task ids")
    tasks.foreach(t => t.deps.foreach(d =>
      require(byId.contains(d), s"task ${t.id} depends on unknown $d")))

    val status = mutable.LinkedHashMap.empty[String, Status]
    val attempts = mutable.Map.empty[String, Int].withDefaultValue(0)
    val errors = mutable.Map.empty[String, String]
    // branch selections: dependents of a branch task not chosen get skipped
    val notChosen = mutable.Set.empty[String]

    def ready(t: TaskSpec): Boolean =
      !status.contains(t.id) && t.deps.forall(status.contains)

    def decide(t: TaskSpec): Status = {
      val depStatuses = t.deps.map(status)
      if (notChosen.contains(t.id)) Skipped
      else t.triggerRule match {
        case AllDone => null // always runs
        case NoneSkipped =>
          if (depStatuses.contains(Skipped)) Skipped else null
        case AllSuccess =>
          if (depStatuses.contains(Failed) || depStatuses.contains(UpstreamFailed)) UpstreamFailed
          else if (depStatuses.contains(Skipped)) Skipped
          else null
      }
    }

    // one attempt, bounded by the task's execution timeout when set. The
    // attempt runs on a pooled thread only in the timeout case; on timeout
    // the attempt is abandoned (recorded failed — the thread itself cannot
    // be safely killed, same as Airflow's zombie-task reality).
    def attemptOnce(t: TaskSpec, body: () => Unit): Unit = t.timeoutMs match {
      case None => body()
      case Some(ms) =>
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        try Await.result(Future(body()), Duration(ms, "ms"))
        catch {
          case _: java.util.concurrent.TimeoutException =>
            throw new IllegalStateException(s"task ${t.id} exceeded ${ms}ms execution timeout")
        }
    }

    def execute(t: TaskSpec): Status = {
      // branch tasks are never resume-skipped: the branch DECIDES which
      // dependents run, and skipping it would silently run all of them
      // (Airflow re-evaluates branches on re-run for the same reason)
      if (resumeDone.contains(t.id) && t.branch.isEmpty) return Success
      if (deadline.exists(System.currentTimeMillis() > _)) {
        errors(t.id) = "dagrun_timeout"
        return Failed
      }
      var attempt = 0
      while (true) {
        attempt += 1
        attempts(t.id) = attempt
        try {
          t.branch match {
            case Some(b) =>
              // branches run on the caller thread, timeout or not: they are
              // decision lambdas, and an abandoned timed-out thread would
              // mutate notChosen concurrently with this scheduler loop
              val chosen = b().toSet
              val dependents = tasks.filter(_.deps.contains(t.id)).map(_.id)
              notChosen ++= dependents.filterNot(chosen)
            case None => attemptOnce(t, () => t.run())
          }
          return Success
        } catch {
          case e: Exception =>
            if (attempt > t.retries) { errors(t.id) = e.toString; return Failed }
            if (t.retryDelayMs > 0) Thread.sleep(t.retryDelayMs)
        }
      }
      Failed // unreachable
    }

    var progressed = true
    while (progressed) {
      progressed = false
      tasks.filter(ready).foreach { t =>
        val decided = decide(t)
        status(t.id) = if (decided != null) decided else execute(t)
        progressed = true
      }
    }
    require(status.size == tasks.size, "cycle detected in task graph")

    RunResult(tasks.map { t =>
      val s = status(t.id) match {
        case Success => "success"
        case Failed => "failed"
        case Skipped => "skipped"
        case UpstreamFailed => "upstream_failed"
      }
      TaskRun(t.id, s, attempts(t.id), errors.get(t.id))
    })
  }
}
