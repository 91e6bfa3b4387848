package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch (q102/q103): structural invariants of the
  * relational build plus the sketch-as-data catalog round-trip. */
class CountMinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every sketch row conserves the token stream; estimates dominate true counts") {
    val tc = CountMin.tokenCounts(spark, dir)
    val totalTokens = tc.agg(sum(col("cnt"))).head().getLong(0)
    val vocab = tc.count()
    val cells = CountMin.sketchCells(tc).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // each hash row partitions the token stream: per-row cell sums and
    // token tallies must BOTH conserve the input exactly
    cells.groupBy(_._1).foreach { case (d, rows) =>
      assert(rows.map(_._3).sum == totalTokens, s"row $d loses counts")
      assert(rows.map(_._4).sum == vocab, s"row $d loses tokens")
    }
    assert(cells.groupBy(_._1).keySet == (0 until 4).toSet)
    // the one-sided CMS guarantee, checked for EVERY token (q103 only
    // serves the top 20): est = min_d cell(d, h_d(t)) >= true count
    val probed = tc.select(col("token"), col("cnt"),
        explode(sequence(lit(0), lit(3))).as("d"))
      .withColumn("w", pmod(TextDsl.h60(
        concat(lit("cms "), col("d").cast("string"), lit(" "), col("token"))),
        lit(64L)))
      .join(CountMin.sketchCells(tc).select(col("d"), col("w"), col("cell_sum")),
        Seq("d", "w"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("cell_sum")).as("est"))
      .collect()
    assert(probed.length == vocab)
    probed.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS underestimated ${r.getString(0)}"))
  }

  test("sketch round-trips through the catalog; estimates serve from the reloaded table") {
    val tc = CountMin.tokenCounts(spark, dir)
    val cells = CountMin.sketchCells(tc)
    val tmp = java.nio.file.Files.createTempDirectory("graft-cms-").toString
    val cat = new graft.catalog.VersionedCatalog(spark, tmp, format = "parquet")
    cat.writeNext("cms", cells)
    val reloaded = cat.latest("cms")
    // int64 cells round-trip parquet bit-exactly: the reloaded sketch
    // IS the built sketch
    assert(reloaded.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      cells.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    spark.catalog.clearCache()
  }

  test("mergeSketches: two persisted sketch versions fold to the union sketch, cell for cell") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, dir)
    val skA = CountMin.sketchCells(
      CountMin.tokenCountsOf(docs.filter(col("doc_id") % 2 === 0)))
    val skB = CountMin.sketchCells(
      CountMin.tokenCountsOf(docs.filter(col("doc_id") % 2 === 1)))
    // persist each half as its own catalog version (epoch sketches),
    // reload, merge — the serving-side flow q104 oracles
    val tmp = java.nio.file.Files.createTempDirectory("graft-cms-merge-").toString
    val cat = new graft.catalog.VersionedCatalog(spark, tmp, format = "parquet")
    cat.writeNext("cms", skA)
    cat.writeNext("cms", skB)
    val merged = CountMin.mergeSketches(cat.read("cms", 1), cat.read("cms", 2))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = CountMin.sketchCells(CountMin.tokenCountsOf(docs))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full)
  }
}
