package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract tests for q225 weighted order sampling (sequential
  * Poisson): exact-k per stratum, priority ordering, the
  * size-biased-inclusion property the weighting exists for, and
  * rerun reproducibility (the production resumability claim). */
class WeightedSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sample() = graft.SparkEntry
    .queries("q225_weighted_order_sample")(spark, dir).collect()

  test("exactly k docs per source, ranks contiguous, priorities non-decreasing") {
    val rows = sample()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rs) =>
      assert(rs.length == 10, s"$src selected ${rs.length}")
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).sameElements(1L to 10L))
      val pris = sorted.map(_.getAs[Long]("pri"))
      assert(pris.zip(pris.tail).forall { case (a, b) => a <= b },
        s"$src priorities not sorted")
    }
  }

  test("inclusion is size-biased: the sample's mean n_chars exceeds the universe mean") {
    val rows = sample()
    val selMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    val uni = graft.Tables.documents(spark, dir)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(selMean > uni,
      s"selected mean $selMean vs universe mean $uni — weighting inert")
  }

  test("the sample is reproducible run to run (hash-seeded, no RNG state)") {
    val a = sample().map(_.toString).sorted
    val b = sample().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
