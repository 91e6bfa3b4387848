package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract tests for [[HashedClassifier]] — the hashed bag-of-n-grams
  * model with a distributed weight table: convergence of the cooled
  * batch perceptron (the serving queries rely on the last snapshot
  * being a separator), the held-out generalization gate, and the
  * weight-table shape claims (bounded bucket ids, engineered rows
  * present) that the 100 TB broadcastability argument rests on. */
class HashedClassifierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("training converges: n_mis reaches 0 within the epoch budget") {
    val log = HashedClassifier.trainLog(spark, dir, "hlog")
      .orderBy(col("epoch")).collect()
    assert(log.length == HashedClassifier.Epochs)
    assert(log.last.getAs[Long]("n_mis") == 0L,
      s"full-universe training did not converge: ${log.map(_.getAs[Long]("n_mis")).mkString(",")}")
    val logE = HashedClassifier.trainLog(spark, dir, "hloge")
      .orderBy(col("epoch")).collect()
    assert(logE.last.getAs[Long]("n_mis") == 0L,
      s"even-half training did not converge: ${logE.map(_.getAs[Long]("n_mis")).mkString(",")}")
  }

  test("held-out agreement >= 0.93 for both classes") {
    val rows = graft.SparkEntry
      .queries("q200_hashed_classifier_heldout")(spark, dir)
      .collect()
    assert(rows.length == 2, "expected one row per head/tail class")
    rows.foreach { r =>
      assert(r.getAs[Long]("agree_e4") >= 9300L,
        s"class ${r.getAs[Long]("y")}: ${r.getAs[Long]("agree_e4")} bps")
    }
  }

  test("weight table is bounded and carries the engineered rows") {
    val w = HashedClassifier.weights(spark, dir, "hw")
    val r = w.agg(
      count(lit(1)).as("rows"),
      max(col("j")).as("jmax"),
      min(col("j")).as("jmin"),
      sum(when(col("j") < 0L, 1L).otherwise(0L)).as("engineered"))
      .collect()(0)
    assert(r.getAs[Long]("rows") <= HashedClassifier.Dim + 2L,
      "weight table exceeds the hashed space + engineered rows")
    assert(r.getAs[Long]("jmax") < HashedClassifier.Dim.toLong)
    assert(r.getAs[Long]("jmin") >= -2L)
    assert(r.getAs[Long]("engineered") == 2L,
      "bias (j=-1) and length (j=-2) rows must survive training")
  }

  test("char model: subword training converges and holds the held-out " +
    "gate for both classes") {
    val log = HashedClassifier.charTrainLog(spark, dir, "hclog")
      .orderBy(col("epoch")).collect()
    assert(log.length == HashedClassifier.Epochs)
    assert(log.last.getAs[Long]("n_mis") == 0L,
      s"char-model training did not converge: ${log.map(_.getAs[Long]("n_mis")).mkString(",")}")
    val rows = graft.SparkEntry
      .queries("q214_hashed_char_heldout")(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("agree_e4") >= 9300L,
        s"char model class ${r.getAs[Long]("y")}: ${r.getAs[Long]("agree_e4")} bps")
    }
  }

  test("char model: feature table carries subword buckets beyond the " +
    "word model's and stays within the hashed space") {
    val word = HashedClassifier.servedOcc(spark, dir)
    val char = HashedClassifier.servedOccChar(spark, dir)
    val wStats = word.agg(count(lit(1)).as("n"),
      countDistinct(col("j")).as("dj")).collect()(0)
    val cStats = char.agg(count(lit(1)).as("n"),
      countDistinct(col("j")).as("dj"),
      max(col("j")).as("jmax"), min(col("j")).as("jmin")).collect()(0)
    assert(cStats.getAs[Long]("n") > wStats.getAs[Long]("n"),
      "subword features should add occupied (doc, bucket) pairs")
    assert(cStats.getAs[Long]("dj") > wStats.getAs[Long]("dj"),
      "subword features should occupy more distinct buckets")
    assert(cStats.getAs[Long]("jmax") < HashedClassifier.Dim.toLong &&
      cStats.getAs[Long]("jmin") >= -2L)
  }

  test("operating curve: tighter threshold never increases kept count, " +
    "and the k=0 point matches the apply gate") {
    val rows = graft.SparkEntry
      .queries("q209_hashed_threshold_sweep")(spark, dir)
      .orderBy(col("thr_k")).collect()
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_kept") >= b.getAs[Long]("n_kept"),
        "kept count must be non-increasing in the threshold")
    }
    // converged training: at thr = 0 the kept set IS the positive set
    val mid = rows(2)
    assert(mid.getAs[Long]("precision_e4") == 10000L &&
      mid.getAs[Long]("recall_e4") == 10000L,
      s"k=0 row should match the converged separator: $mid")
  }

  test("calibration: positive rate is monotone non-decreasing in bin") {
    val rows = graft.SparkEntry
      .queries("q210_hashed_calibration")(spark, dir)
      .orderBy(col("bin")).collect()
    assert(rows.nonEmpty)
    rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("pos_rate_e4") <= b.getAs[Long]("pos_rate_e4"),
        s"calibration must be monotone: bins ${a.getAs[Long]("bin")} -> " +
          s"${b.getAs[Long]("bin")}")
    }
  }

  test("active learning: 5 picks per source, margins non-decreasing, " +
    "middle band eligible") {
    val rows = graft.SparkEntry
      .queries("q211_hashed_active_learning")(spark, dir)
      .collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.values.forall(_.length == 5))
    bySrc.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("pick"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("margin") <= b.getAs[Long]("margin"))
      }
    }
    // uncertainty sampling surfaces the ambiguous middle band: on the
    // fixture the lowest-margin docs are overwhelmingly y = 0 docs
    assert(rows.exists(_.getAs[Long]("y") == 0L),
      "expected at least one middle-band (y = 0) selection")
  }

  test("ordinal cuts: both trainings run their epoch budget and the band " +
      "report is a coherent partition of the universe") {
    val log = graft.SparkEntry
      .queries("q223_ordinal_band_train")(spark, dir).collect()
    assert(log.length == 2 * HashedClassifier.Epochs)
    assert(log.map(_.getAs[String]("cut")).distinct.sorted.sameElements(
      Array("a", "b")))
    val rep = graft.SparkEntry
      .queries("q224_ordinal_band_report")(spark, dir).collect()
    val universe = HashedClassifier.servedLab(spark, dir).count()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == universe,
      "confusion cells must partition the scored universe")
    rep.foreach { r =>
      assert(r.getAs[Long]("rule_band") >= 0L && r.getAs[Long]("rule_band") <= 2L)
      assert(r.getAs[Long]("pred_band") >= 0L && r.getAs[Long]("pred_band") <= 2L)
      assert(r.getAs[Long]("n_inv") <= r.getAs[Long]("n_docs"))
    }
  }

  test("ordinal cuts: the clear extreme bands agree with the rule") {
    // docs the RULE puts in band 0 (q <= t1) or band 2 (q > t3) are the
    // cut models' own clear training regions; agreement there is the
    // serving floor (the middle band is margin-excluded by design).
    val rep = graft.SparkEntry
      .queries("q224_ordinal_band_report")(spark, dir).collect()
      .map(r => ((r.getAs[Long]("rule_band"), r.getAs[Long]("pred_band")),
        r.getAs[Long]("n_docs"))).toMap
    for (band <- Seq(0L, 2L)) {
      val total = rep.collect { case ((rb, _), n) if rb == band => n }.sum
      val hit = rep.getOrElse((band, band), 0L)
      assert(total > 0)
      assert(hit * 10000L / total >= 9000L,
        s"rule band $band served at ${hit * 10000 / total} bps")
    }
  }

  test("store is idempotent: serving twice returns identical weights") {
    val a = HashedClassifier.weights(spark, dir, "hw")
      .orderBy(col("j")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = HashedClassifier.weights(spark, dir, "hw")
      .orderBy(col("j")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("invalidateStore forces a rebuild that reproduces the same weights") {
    val before = HashedClassifier.weights(spark, dir, "hw")
      .orderBy(col("j")).collect().map(r => (r.getLong(0), r.getLong(1)))
    HashedClassifier.invalidateStore(dir)
    val after = HashedClassifier.weights(spark, dir, "hw")
      .orderBy(col("j")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(before.sameElements(after),
      "rebuild from the unchanged corpus must reproduce the weights")
  }
}
