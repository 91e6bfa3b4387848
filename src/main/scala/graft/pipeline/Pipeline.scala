package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.collection.mutable

/** Step/pipeline orchestration with a persisted status manifest —
  * the reference's control plane (arbirk/ETL-template tools/tools.go:
  * 30-272), re-expressed as a driver-side Scala layer around a
  * SparkSession.
  *
  * Semantics preserved:
  *  - 6-state status enum (tools.go:30-37)
  *  - run manifest with runId `run_<wallclock>` (tools.go:84-93),
  *    per-step start/end/duration bookkeeping (tools.go:120-188),
  *    re-running a step resets it (retry-aware, tools.go:126-132)
  *  - fail-fast: first step error persists the Failed manifest and
  *    aborts the pipeline (tools.go:97-116) — as an exception, not
  *    os.Exit, so embedding applications and tests can recover
  *  - `knoll()` ensures+wipes the staging dir at pipeline start
  *    (tools.go:254-263); `stow()` persists the final manifest
  *    (tools.go:267-272)
  *  - manifest persisted as pretty JSON (tools.go:233-250)
  *
  * Intentional deviations (SURVEY.md §7.4): timestamps are
  * driver-side wall clock exactly like the reference, but the clock is
  * injectable for deterministic tests; status persistence is per-step,
  * not per-record (per-record durability is the streaming engine's
  * checkpoint, see graft.streaming).
  */
object Status extends Enumeration {
  // tools.go:30-37
  val Pending, Running, Completed, Failed, Skipped, Unknown = Value
}

final case class StepStatus(
    name: String,
    var status: Status.Value = Status.Pending,
    var startTime: Option[Instant] = None,
    var endTime: Option[Instant] = None,
    var durationMillis: Long = 0L,
    var message: String = "")

final class PipelineRun(
    spark: SparkSession,
    statusFile: String,
    tempDir: String = "temp",
    clock: () => Instant = () => Instant.now()) {

  private val runIdFmt = DateTimeFormatter
    .ofPattern("yyyyMMdd_HHmmss.SSS").withZone(ZoneOffset.UTC)
  /** tools.go:86: run_<timestamp>. */
  val runId: String = s"run_${runIdFmt.format(clock())}"

  var status: Status.Value = Status.Pending
  val startTime: Instant = clock()
  private val steps = mutable.LinkedHashMap.empty[String, StepStatus]

  def stepStatuses: Seq[StepStatus] = steps.values.toSeq

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Ensure + wipe the staging dir for a fresh run (Knoll, tools.go:254-263). */
  def knoll(): Unit = {
    val p = new Path(tempDir)
    val f = fs(p)
    if (f.exists(p)) f.delete(p, true)
    f.mkdirs(p)
  }

  /** Run one step fail-fast (ExecuteStep, tools.go:97-116): Running →
    * body → Completed; on failure persist the manifest with the step and
    * pipeline Failed, then rethrow. Re-running a completed/failed step
    * resets its bookkeeping (tools.go:126-132). */
  def executeStep[A](name: String)(body: => A): A = {
    val st = steps.getOrElseUpdate(name, StepStatus(name))
    st.status = Status.Running
    st.startTime = Some(clock())
    st.endTime = None
    st.durationMillis = 0L
    st.message = ""
    if (status == Status.Pending) status = Status.Running
    try {
      val out = body
      end(st, Status.Completed, "")
      out
    } catch {
      case e: Throwable =>
        end(st, Status.Failed, Option(e.getMessage).getOrElse(e.getClass.getName))
        status = Status.Failed
        saveStatus()
        throw e
    }
  }

  private def end(st: StepStatus, s: Status.Value, msg: String): Unit = {
    st.status = s
    st.endTime = Some(clock())
    st.durationMillis = st.startTime
      .map(t0 => st.endTime.get.toEpochMilli - t0.toEpochMilli).getOrElse(0L)
    st.message = msg
  }

  /** Persist the final successful manifest (Stow, tools.go:267-272). */
  def stow(): Unit = {
    if (steps.values.forall(_.status == Status.Completed))
      status = Status.Completed // all-steps fold, tools.go:173-186
    saveStatus()
  }

  /** Human-readable run render (LogStatus, tools.go:191-230). */
  def logStatus(): String = {
    val sb = new StringBuilder
    sb.append(s"Pipeline $runId: $status\n")
    steps.values.foreach { st =>
      sb.append(f"  ${st.name}%-24s ${st.status}%-10s ${st.durationMillis}%6d ms")
      if (st.message.nonEmpty) sb.append(s"  ${st.message}")
      sb.append('\n')
    }
    val s = sb.toString
    print(s)
    s
  }

  /** Pretty-JSON manifest (SaveStatus, tools.go:233-250). Hand-rolled
    * writer: the manifest is control-plane, not data-plane, and the
    * schema is fixed. */
  def saveStatus(): Unit = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val stepJson = steps.values.map { st =>
      s"""    {
         |      "name": ${q(st.name)},
         |      "status": ${q(st.status.toString)},
         |      "startTime": ${st.startTime.map(t => q(t.toString)).getOrElse("null")},
         |      "endTime": ${st.endTime.map(t => q(t.toString)).getOrElse("null")},
         |      "durationMillis": ${st.durationMillis},
         |      "message": ${q(st.message)}
         |    }""".stripMargin
    }.mkString(",\n")
    val json =
      s"""{
         |  "runId": ${q(runId)},
         |  "status": ${q(status.toString)},
         |  "startTime": ${q(startTime.toString)},
         |  "steps": [
         |$stepJson
         |  ]
         |}
         |""".stripMargin
    val p = new Path(statusFile)
    val f = fs(p)
    if (p.getParent != null) f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
  }
}
