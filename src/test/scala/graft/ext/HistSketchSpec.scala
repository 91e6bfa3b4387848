package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit-level properties of the histogram sketch the q112/q113 oracles
  * cannot see (oracles prove cross-engine parity — a wrong bin width
  * or a lossy merge law would hash-match if both engines shared the
  * bug; these tests pin the sketch against independently computed
  * truth, the HllSpec discipline). */
class HistSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("binCells: complete table, mass conservation, independently recomputed placement") {
    val s = spark
    import s.implicits._
    val vals = Seq(0.0, 2.4999, 2.5, 5.0, 639.9999, 640.0, 1e6, -0.0001, -5.0, 100.0)
    val bins = HistSketch.binCells(vals.toDF("value"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every bin present exactly once, total mass = input size
    assert(bins.size == 256 && bins.keySet == (0L until 256L).toSet)
    assert(bins.values.sum == vals.size.toLong)
    // placement recomputed independently: bin = clamp(floor(v*1e4)/25000)
    val expect = vals.groupBy { v =>
      math.min(math.max(math.floor(v * 10000).toLong.Lquot, 0L), 255L)
    }.map { case (b, vs) => b -> vs.size.toLong }
    expect.foreach { case (b, n) => assert(bins(b) == n, s"bin $b") }
    // boundary semantics, hand-counted: half-open bins put 2.4999 in
    // bin 0 and 2.5 in bin 1; negatives clamp into bin 0, overshoots
    // (640.0 = the first out-of-range value, 1e6) into bin 255 next to
    // the in-range 639.9999
    assert(bins(0L) == 4L && bins(1L) == 1L && bins(255L) == 3L)
  }

  // floor-div by the bin width W = 25000 at the ×1e4 scale, matching
  // the engine's `div` on ALREADY-FLOORED long values (non-negative
  // after clamp; negatives clamp to 0 whichever rounding applies)
  private implicit class LongOps(v: Long) {
    def Lquot: Long = {
      val q = v / 25000L
      if (v < 0 && v % 25000L != 0) q - 1 else q
    }
  }

  test("mergeBins over random partitions equals the whole-corpus sketch (linearity)") {
    val events = graft.Tables.events(spark, dir).select(col("value"))
    val whole = HistSketch.binCells(events, col("value"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // split three ways by a hash residue, merge pairwise in both orders
    val parts = (0 until 3).map { r =>
      HistSketch.binCells(
        events.filter(abs(hash(col("value"))) % 3 === r), col("value"))
    }
    val ab = HistSketch.mergeBins(parts(0), parts(1))
    val abc = HistSketch.mergeBins(ab, parts(2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cba = HistSketch.mergeBins(parts(2), HistSketch.mergeBins(parts(1), parts(0)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(abc == whole, "merge law broke against the whole-corpus sketch")
    assert(cba == whole, "merge is order-sensitive")
  }

  test("served quantiles within one bin width of truth on the real fixture") {
    val s = spark
    import s.implicits._
    val row = HistSketch.quantileMergeCheck(spark, dir).collect().head
    // the within-bin flags are IN the row; recompute the exact side
    // independently from the raw values as a second opinion
    val vals = graft.Tables.events(spark, dir)
      .select(col("value")).collect().map(_.getDouble(0))
      .map(v => math.floor(v * 10000).toLong).sorted
    def exact(p: Int): Long = vals((((vals.length.toLong * p + 99) / 100) - 1).toInt)
    val idx = row.schema.fieldNames.zipWithIndex.toMap
    assert(row.getLong(idx("p50_exact_e4")) == exact(50))
    assert(row.getLong(idx("p95_exact_e4")) == exact(95))
    assert(row.getLong(idx("p99_exact_e4")) == exact(99))
    Seq(50, 95, 99).foreach { p =>
      val est = row.getLong(idx(s"p${p}_est_e4"))
      assert(math.abs(est - exact(p)) <= 25000L,
        s"p$p served $est vs exact ${exact(p)} — outside one bin width")
      assert(row.getBoolean(idx(s"p${p}_within_bin")))
    }
    assert(row.getLong(idx("bins_equal")) == 256L)
    spark.catalog.clearCache()
  }
}
