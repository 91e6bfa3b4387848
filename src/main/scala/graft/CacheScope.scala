package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tracks the DataFrames a composite operator persists internally
  * (signature tables, scored intermediates) so the CALLER can release
  * them once the final action has run — the operators return lazy
  * frames, so they cannot unpersist their own intermediates without
  * recomputing them on every downstream action.
  *
  * Usage:
  * {{{
  *   val scope = new CacheScope
  *   val out = Curation.curate(docs, scope = scope)
  *   out.write.parquet(dest)   // final action
  *   scope.release()           // drop the cached intermediates
  * }}}
  *
  * Operators that take a scope default to a fresh private one, which
  * keeps blocks cached until `spark.catalog.clearCache()` (the
  * convention the test/bench drivers already use); long-lived callers
  * should pass and release their own scope. Operators whose callers
  * cannot release (a lazy return built with a purely internal scope)
  * can bound the pin with [[CacheScope.releaseAfterNextAction]].
  */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and remember it for [[release]]. */
  def cache(df: DataFrame): DataFrame = synchronized {
    frames += df.persist()
    df
  }

  /** Unpersist every frame cached through this scope (non-blocking,
    * idempotent; safe from a listener thread). */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}

object CacheScope {

  /** Release `scope` as soon as the NEXT query execution in `spark`'s
    * session completes (success or failure) — the lazy-return twin of
    * the try/finally pattern: an operator that creates a scope
    * internally but returns an unmaterialized frame cannot release in
    * a finally block, so it hands the release to a one-shot
    * [[org.apache.spark.sql.util.QueryExecutionListener]] instead. In
    * the one-action-per-query flows (Verify / Bench / specs) that next
    * execution IS the returned frame's materialization, so the cache
    * lives exactly as long as it is useful. If an unrelated action
    * fires first the release is merely EARLY — downstream actions
    * recompute without the cache (correct, slower), never read stale
    * data. Callers that materialize a result more than once should
    * pass and release their own scope instead. */
  def releaseAfterNextAction(spark: SparkSession, scope: CacheScope): Unit = {
    val lm = spark.listenerManager
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def fire(): Unit =
        if (done.compareAndSet(false, true)) {
          scope.release()
          lm.unregister(this)
        }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = fire()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = fire()
    }
    lm.register(listener)
  }
}
