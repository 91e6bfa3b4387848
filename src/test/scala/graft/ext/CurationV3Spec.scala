package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract tests for the v3 curation capstone (q212) — the hashed
  * (j, w)-table classifier as the learned gate. The load-bearing law:
  * [[HashedClassifier.trainTransient]] (the capstone's one-action-per-
  * epoch loop with in-plan cooled shifts, scoped AQE/bloom confs, and
  * localCheckpoint snapshots) must reproduce the Store's catalog loop
  * (3 actions/epoch, parquet-committed snapshots) WEIGHT FOR WEIGHT on
  * the same universe — the restructure is a pure scheduling change. */
class CurationV3Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("transient loop reproduces the Store's catalog loop exactly") {
    val occ = HashedClassifier.servedOcc(spark, dir).coalesce(8).persist()
    val lab = HashedClassifier.servedLab(spark, dir).coalesce(4).persist()
    val wT = HashedClassifier.trainTransient(spark, occ, lab)
      .orderBy(col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val wS = HashedClassifier.weights(spark, dir, "hw")
      .orderBy(col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(wT.length == wS.length,
      s"weight table sizes differ: ${wT.length} vs ${wS.length}")
    assert(wT.sameElements(wS),
      "transient and catalog training diverged on identical inputs")
  }

  test("v3 capstone: non-empty bin table, exact per-source token ledger") {
    val bins = graft.SparkEntry
      .queries("q212_curation_pipeline_v3")(spark, dir).collect()
    assert(bins.nonEmpty, "the v3 pipeline kept no documents")
    // packing conservation: within a source, bins partition the kept
    // docs — every bin holds at least one doc and bin ids are dense
    bins.groupBy(_.getAs[String]("source")).foreach { case (src, g) =>
      assert(g.forall(_.getAs[Long]("n_docs") >= 1L))
      val ids = g.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L && ids.sameElements(ids.head to ids.last),
        s"$src: bin ids not dense: ${ids.mkString(",")}")
    }
  }

  test("scoped confs restore after transient training") {
    val s = spark
    val aqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    val bloom =
      s.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    val occ = HashedClassifier.servedOcc(spark, dir).coalesce(8)
    val lab = HashedClassifier.servedLab(spark, dir).coalesce(4)
    HashedClassifier.trainTransient(spark, occ, lab)
    assert(s.conf.get("spark.sql.adaptive.enabled", "true") == aqe)
    assert(s.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.enabled", "true") == bloom)
  }
}
