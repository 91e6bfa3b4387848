package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Task-level console progress — the reference's LoopProgressManager
  * (arbirk/ETL-template tools/tools.go:891-951: progressbar with total/
  * add/describe/finish), re-expressed as a SparkListener: the unit of
  * progress is the task (the engine's parallel work quantum), not the
  * record, because records are processed thousands-per-task and a
  * per-record bar would serialize the hot path (the reference pays an
  * extra full input scan just to obtain its denominator, tools.go:699 —
  * Spark stages know their task counts for free).
  *
  * Use [[withProgress]] to scope reporting to a pipeline step.
  */
final class ConsoleProgress(label: String) extends SparkListener {
  private val done = new AtomicInteger
  private val submitted = new AtomicInteger
  private val recordsRead = new AtomicLong

  override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
    submitted.addAndGet(s.stageInfo.numTasks)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val d = done.incrementAndGet()
    if (t.taskMetrics != null)
      recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    val total = math.max(submitted.get, d)
    if (d % 32 == 0 || d == total)
      print(f"\r[$label] tasks $d%d/$total%d  records ${recordsRead.get}%d")
  }

  def tasksCompleted: Int = done.get
  def finish(): Unit = println()
}

object ConsoleProgress {
  /** Run `body` with a progress listener attached; returns (result,
    * tasks completed). Listener add/remove is cheap and thread-safe. */
  def withProgress[A](spark: SparkSession, label: String)(body: => A): (A, Int) = {
    val p = new ConsoleProgress(label)
    spark.sparkContext.addSparkListener(p)
    try {
      val out = body
      // The listener bus is async; poll briefly so in-flight TaskEnd
      // events land before we read the counter (private API avoided).
      val deadline = System.nanoTime() + 2_000_000_000L
      var last = -1
      while (System.nanoTime() < deadline && p.tasksCompleted != last) {
        last = p.tasksCompleted
        Thread.sleep(50)
      }
      p.finish()
      (out, p.tasksCompleted)
    } finally spark.sparkContext.removeSparkListener(p)
  }
}
