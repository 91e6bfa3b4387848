package graft

import org.apache.spark.sql.SparkSession

/** Registry of every build-once, sfDir-keyed store family — the bench
  * warmup seam (spark_optimization_guide §1: measure the steady-state
  * serve path, not a one-off build). Each entry calls the family's
  * idempotent ensure: a first call pays the build, later calls are a
  * version probe. Pre-paying them before pass 1 (a) makes every timed
  * pass measure SERVING, (b) removes the build-inflated pass-1 total
  * that guaranteed the >1.3 spread re-run trigger, and (c) keeps the
  * whole bench inside the driver's wall-clock window (the r18 DNF).
  *
  * Per-invocation catalog queries (q60/q61/q66/q117/q135/q146/q205/
  * q218/...) build into a FRESH scratch dir inside the query on
  * purpose — the build IS their semantics — and are not listed here.
  */
object Stores {

  /** Build every store for `dir`, labeled per family; failures are
    * logged and skipped (the owning query's own ensure retries). */
  def prebuild(s: SparkSession, dir: String): Unit = {
    val families: Seq[(String, () => Unit)] = Seq(
      ("clf-store", () => ext.ClassifierStore.prebuild(s, dir)),
      ("cur2-store", () => ext.CurationV2.prebuild(s, dir)),
      ("hclf-store", () => ext.HashedClassifier.prebuild(s, dir)),
      ("phrase-store", () => ext.PhraseSearch.prebuild(s, dir)),
      ("sfx-store", () => ext.SuffixDedup.prebuild(s, dir)),
      ("zorder-store", () => ops.Relational.prebuild(s, dir)))
    families.foreach { case (name, build) =>
      s.sparkContext.setJobDescription(s"store prebuild: $name")
      val t0 = System.nanoTime()
      try build() catch {
        case e: Throwable =>
          System.err.println(s"[stores] $name prebuild FAILED " +
            s"(the owning queries will retry): ${e.getMessage}")
      }
      System.err.println(
        f"[stores] $name prebuild ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    s.sparkContext.setJobDescription(null)
  }
}
