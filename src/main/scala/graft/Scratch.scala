package graft

import java.nio.file.{Files, Path}

/** Per-JVM scratch root for queries that materialize catalog state
  * (q60/q61/q66/q117-q122): one `graft-scratch-*` directory per process,
  * recursively deleted by a shutdown hook, with each query allocating its
  * own subdirectory under it.
  *
  * Why not per-invocation deletion: the query functions return LAZY
  * DataFrames that read the committed catalog parquet — deleting the work
  * directory before the driver triggers execution would break the read, and
  * materializing eagerly just to allow deletion would put a driver-side
  * collect into a data path. Deferring cleanup to process exit keeps every
  * plan lazy while bounding the on-disk residue of repeated bench/verify
  * passes to one process lifetime (previously each invocation leaked a
  * `graft-qNNN-*` directory forever).
  */
object Scratch {

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  /** A fresh unique work directory under the self-cleaning root. */
  def dir(tag: String): String =
    Files.createTempDirectory(root, tag + "-").toString

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_))
      finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }
}
