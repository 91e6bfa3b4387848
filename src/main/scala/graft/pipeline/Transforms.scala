package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference's user-extension surface (SURVEY.md §2.9), typed:
  * a 1→1 record transform and a per-record foreach loader, plus the
  * per-record retry combinator.
  *
  *  - `RecordTransformer func(interface{}) (interface{}, error)` +
  *    `CreateTransformer[In, Out]` (tools/tools.go:72-74, 841-859) →
  *    [[Transforms.transform]]: `Dataset.map` with Encoders. The Go
  *    version's runtime type assertions vanish — Scala's types are
  *    compile-time.
  *  - `RecordLoader func(interface{}) error` + `CreateLoader[In]`
  *    (tools.go:77, 864-884) → [[Transforms.load]]:
  *    `foreachPartition`, the side-effecting sink shape.
  *  - `RetryConfig{MaxRetries, Delay}` with per-record retry
  *    (tools.go:67-70, 733-761) → [[Transforms.retry]], applied inside
  *    the loader loop. Zero-value config = no retries (tools.go:684-687).
  *
  * Scale note: both operators are embarrassingly parallel per partition;
  * the loader runs on executors (no driver collect). Task-level retry
  * (`spark.task.maxFailures`) replays a whole partition — record-level
  * retry here is for transient per-record sink errors, the reference's
  * actual use case.
  */
object Transforms {

  final case class RetryConfig(maxRetries: Int = 0, delayMillis: Long = 0L)

  /** Run `f`, retrying up to cfg.maxRetries extra attempts with a fixed
    * delay (tools.go:733-761: fixed delay, fail-fast after exhaustion). */
  def retry[A](cfg: RetryConfig)(f: => A): A = {
    var attempt = 0
    while (true) {
      // NonFatal only: retrying OutOfMemoryError is hopeless, and eating
      // InterruptedException breaks task cancellation inside foreachPartition.
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt > cfg.maxRetries) throw e
          if (cfg.delayMillis > 0) Thread.sleep(cfg.delayMillis)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Typed 1→1 transform (T1/T2). Per-record transform retry is
    * intentionally not replicated: a deterministic map either fails
    * every attempt or none — retrying only makes sense at the sink. */
  def transform[In, Out: Encoder](ds: Dataset[In])(f: In => Out): Dataset[Out] =
    ds.map(f)

  /** Per-record loader (K4) with per-record retry (ST3), executed
    * distributed via foreachPartition. */
  def load[T](ds: Dataset[T], cfg: RetryConfig = RetryConfig())(f: T => Unit): Unit =
    ds.foreachPartition { (it: Iterator[T]) =>
      it.foreach(r => retry(cfg)(f(r)))
    }
}
