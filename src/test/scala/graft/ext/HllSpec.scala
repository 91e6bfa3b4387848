package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operator-level properties of the relational HLL sketch that the
  * q107/q108 oracles can NOT check: the oracles prove cross-engine
  * parity (both engines compute the same integers), but a broken α
  * constant or regime rule would flip identically on both sides and
  * still hash-match — estimator ACCURACY needs a known-cardinality
  * fixture, and the merge law needs a split the queries don't use. */
class HllSpec extends SparkSpec {

  // synthetic corpus with a controlled shingle space: doc i contributes
  // exactly the 2 distinct 3-shingles ("w<i> x<i> y<i>", "x<i> y<i> z")
  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n)
      .map(i => (i.toLong, s"w$i x$i y$i z"))
      .toDF("doc_id", "text")
  }

  test("estimator accuracy on a known cardinality; three-way MAX-merge law") {
    val docs = corpus(3000) // 6000 distinct shingles — raw-HLL regime
    val full = Hll.registerTable(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.size == 256 && full.keys.min == 0L && full.keys.max == 255L)
    // estimate from the registers with the module's exact arithmetic
    val sScaled = full.values.map(m => 1L << (25 - m.toInt)).sum
    val est = 718272L * 256 * 256 * (1L << 25) / sScaled / 1000000L
    assert(math.abs(est - 6000.0) / 6000.0 < 0.2,
      s"HLL estimate $est vs true 6000 — outside ±20% (m=256 σ≈6.5%)")
    // merge law on a split the oracle does not use: thirds, MAX-wise
    val parts = (0 until 3).map(r =>
      Hll.registerTable(docs.filter(col("doc_id") % 3 === r))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap)
    val merged = (0 until 256).map(j =>
      j.toLong -> parts.map(_(j.toLong)).max).toMap
    assert(merged == full, "register-wise MAX of thirds != full sketch")
    spark.catalog.clearCache()
  }

  test("small-range regime flags: tiny cardinality leaves zero registers") {
    val docs = corpus(20) // 40 distinct shingles << m
    val regs = Hll.registerTable(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val zero = regs.values.count(_ == 0L)
    // ≤ 40 registers can be inhabited, so ≥ 216 must be zero — the
    // linear-counting inputs q108 emits are meaningful in this regime
    assert(zero >= 216, s"expected >= 216 zero registers, got $zero")
    spark.catalog.clearCache()
  }
}
