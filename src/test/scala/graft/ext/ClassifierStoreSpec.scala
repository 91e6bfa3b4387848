package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract for [[ClassifierStore]] — the build-once feature/weight
  * store the classifier family serves from: the committed tables must
  * be VALUE-IDENTICAL to a fresh recompute (the hash-unchanged claim
  * the round-16 re-pointing rests on), and serving must be idempotent
  * (second read hits the committed version, never a rebuild). */
class ClassifierStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("served features equal a fresh recompute, row for row") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fresh = Classifier.features(docs)
      .orderBy(col("doc_id")).collect()
      .map(r => (0 until 7).map(r.getLong).toSeq)
    val served = ClassifierStore.features(spark, dir)
      .orderBy(col("doc_id")).collect()
      .map(r => (0 until 7).map(r.getLong).toSeq)
    assert(served.length == fresh.length && served.sameElements(fresh))
  }

  test("served weights equal training on the fresh features") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val feat = Classifier.features(docs).persist()
    try {
      val fresh = Classifier.trainPerceptron(feat)
        .map { case (r, w, nm) => (r.toLong +: w.toSeq) :+ nm }
      val served = ClassifierStore.weightsTable(spark, dir)
        .orderBy(col("epoch")).collect()
        .map(r => (0 until 8).map(r.getLong).toSeq)
      assert(served.map(_.toSeq).sameElements(fresh.map(_.toSeq)))
      val wavg = ClassifierStore.averagedWeights(spark, dir)
      assert(wavg.toSeq == Classifier.averagedWeights(
        Classifier.trainPerceptron(feat)).toSeq)
    } finally { feat.unpersist(); () }
  }

  test("serving is idempotent across calls") {
    val a = ClassifierStore.averagedWeights(spark, dir).toSeq
    val b = ClassifierStore.averagedWeights(spark, dir).toSeq
    assert(a == b)
  }
}
