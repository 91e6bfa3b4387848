package graft

import org.apache.spark.sql.DataFrame

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
  * should pass and release their own scope.
  */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and remember it for [[release]]. */
  def cache(df: DataFrame): DataFrame = {
    frames += df.persist()
    df
  }

  /** Unpersist every frame cached through this scope (non-blocking). */
  def release(): Unit = {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}
