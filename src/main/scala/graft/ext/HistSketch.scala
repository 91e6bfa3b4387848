package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Mergeable fixed-boundary HISTOGRAM sketch over the events value
  * stream — the third sketch family, completing the triad: CMS covers
  * counts (q102–q104), HLL covers cardinality (q107/q108), this one
  * covers the DISTRIBUTION (quantiles), which until now required exact
  * batch passes (q26/q28 are batch-only).
  *
  * Construction is the [[CountMin]] discipline applied to binning:
  * values scale to exact int64 (v = ⌊value·10⁴⌋ — one IEEE
  * multiply+floor, identical on both engines, the scaledVec trick on
  * scalars), bin k = clamp(v div W, 0, B−1) over FIXED integer
  * boundaries, and each bin's count is an order-free int64 SUM — so the
  * sketch is partial-aggregable (map-side combine), mergeable across
  * any partitioning or epoch split by bin-wise ADDITION (the CMS
  * linearity law: hist(A) ⊕ hist(B) = hist(A ∪ B) exactly, proven bin
  * for bin by q113), and bit-exactly reproducible on any engine. Fixed
  * boundaries — not equi-depth — are what make the merge law exact:
  * adaptive boundaries would need re-binning on merge, which is lossy
  * and order-dependent (Greenwald–Khanna / t-digest style sketches
  * trade exact mergeability for adaptivity; a fold through the catalog
  * wants the exact law).
  *
  * Serving: quantile q reads the cumulative bin table — t = ⌈q·N/100⌉,
  * the unique bin with cum ≥ t > cum−cnt contains the t-th smallest
  * value, and the served estimate interpolates INSIDE that bin with one
  * exact integer division: est = bin·W + (t − cum_before)·W div cnt.
  * The estimate is within one bin width of the exact order statistic BY
  * CONSTRUCTION whenever the t-th value lands in an unclamped bin (both
  * live in the same half-open bin interval, and the clamp bins are
  * empty at any SF of this fixture since B·W covers the value range) —
  * q113 asserts |est − exact| ≤ W per percentile IN the hashed row, so
  * the bound is checked, not just argued.
  *
  * 100 TB shape: the value stream reduces map-side to B cells
  * regardless of corpus size; the bin table is catalog-persistable
  * index-as-data next to the CMS/HLL state, folds through the SAME
  * atomic-epoch-tag machinery ([[graft.streaming.EventPipelines
  * .runCatalogHistogramSink]] — additive like CMS, so the tag carries
  * the exactly-once burden), and a quantile probe reads B rows, never
  * the corpus.
  */
object HistSketch extends QueryModule {

  /** Bin count and integer width at the ×10⁴ value scale: 256 bins of
    * 2.5 units cover [0, 640) — the events fixture spans [0, ~561] at
    * every SF, so the clamp bins never absorb interior quantiles and
    * the served-quantile error bound is W/10⁴ = 2.5 units. */
  private val B = 256
  private val W = 25000L

  /** Clamped bin of an already-×10⁴-scaled int64 value — shared by the
    * batch sketch, the streaming epochs, and (as text) the oracle, so
    * bin placement can never drift between them. The clamp absorbs ANY
    * out-of-range value into the edge bins; negative values hit bin 0
    * on both engines regardless of their integer-division rounding
    * (Spark's div truncates, DuckDB's // floors — both land < 0, and
    * greatest(·, 0) erases the difference). The scaled/bin exprs are
    * SQL text (not Column combinators) because integral `div` has no
    * Column-API form. */
  private val scaledSqlExpr = "CAST(floor(_hv * 10000) AS BIGINT)"
  private def binExprOf(v: String): String =
    s"least(greatest(($v) div ${W}L, 0L), ${B - 1}L)"

  private def binSql(value: String): String =
    s"least(greatest(CAST(floor(($value) * 10000) AS BIGINT) // $W, 0), ${B - 1})"

  /** The complete B-bin table over an arbitrary value column — every
    * bin present, 0 when empty (the [[Hll.registerCells]] discipline:
    * the state a serving job persists must be complete, or a merge
    * would have to distinguish "empty" from "absent"). */
  def binCells(rows: DataFrame, value: Column): DataFrame = {
    val s = rows.sparkSession
    s.range(B).toDF("bin")
      .join(rows.select(value.as("_hv"))
          .selectExpr(s"${binExprOf(scaledSqlExpr)} AS bin")
          .groupBy(col("bin")).agg(count(lit(1)).as("c")),
        Seq("bin"), "left")
      .select(col("bin"), coalesce(col("c"), lit(0L)).as("cnt"))
  }

  /** Bin-wise ADDITIVE merge: hist(A) ⊕ hist(B) = hist(A ∪ B) exactly
    * (counts are linear, like CMS cells and unlike HLL's MAX —
    * so the streaming fold needs the atomic epoch tag for
    * exactly-once). Inputs need (bin, cnt); absent bins count 0. O(B)
    * rows, never the corpus. */
  def mergeBins(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bin"), col("cnt").as("ca"))
      .join(b.select(col("bin"), col("cnt").as("cb")), Seq("bin"), "full_outer")
      .select(col("bin"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("cnt"))

  /** One percentile served from a cumulative bin table — the t-th
    * order statistic's bin plus one exact integer interpolation
    * (t − cum_before ∈ [1, cnt], so the division never sees
    * negatives). Shared text between the merge-check and the
    * catalog-serving query so the serving arithmetic cannot fork. */
  private def servedExprOf(p: Int, cnt: String): String = {
    val t = s"(ntot * $p + 99) div 100"
    s"""min(CASE WHEN cum >= $t AND cum - $cnt < $t
                 THEN bin * $W + ((($t) - (cum - $cnt)) * $W) div $cnt
            END) AS p${p}_est_e4"""
  }

  /** Serve (n_total, p50/p95/p99 estimates) from a persisted B-bin
    * table — the read side of sketch-as-data: B rows in, one row out,
    * the corpus never touched. The single-partition windows sort B =
    * 256 rows, not data. */
  def serveQuantiles(bins: DataFrame): DataFrame =
    bins
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("ntot", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .selectExpr("max(ntot) AS n_total",
        servedExprOf(50, "cnt"), servedExprOf(95, "cnt"), servedExprOf(99, "cnt"))

  /** Served quantiles + merge-law check in ONE pass over cached
    * per-(parity, bin) counts (the [[CountMin.mergeCheck]] shape):
    * parity-split bin tables, their bin-wise additive fold, the
    * independently derived full table compared bin for bin, and
    * p50/p95/p99 served from the MERGED sketch next to the exact order
    * statistics and the within-one-bin-width assertions. Pass your own
    * `scope` and release after materializing; when omitted the
    * internal scope self-releases after the next completed action
    * ([[graft.CacheScope.releaseAfterNextAction]]). */
  def quantileMergeCheck(s: SparkSession, dir: String,
      scope: graft.CacheScope = null): DataFrame = {
    val sc = Option(scope).getOrElse {
      val own = new graft.CacheScope
      graft.CacheScope.releaseAfterNextAction(s, own)
      own
    }
    val ve = T.events(s, dir)
      .select((col("event_id") % 2 === 0).as("even"),
        expr("CAST(floor(value * 10000) AS BIGINT)").as("v"))
      .transform(sc.cache)
    // bin directly from the cached integer v (the scaling already ran
    // once into the cache) — binExprOf applied to `v`, not a re-scale
    val bins = ve
      .selectExpr("even", s"${binExprOf("v")} AS bin")
      .groupBy(col("even"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val ga = s.range(B).toDF("bin")
      .join(bins.groupBy(col("bin")).agg(
          sum(when(col("even"), col("cnt"))).as("ca"),
          sum(when(!col("even"), col("cnt"))).as("cb"),
          sum(col("cnt")).as("cf")),
        Seq("bin"), "left")
      .select(col("bin"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L)))
          .as("merged_cnt"),
        coalesce(col("cf"), lit(0L)).as("full_cnt"))
    // B rows: the single-partition windows below sort 256 rows, not data
    val cum = ga
      .withColumn("cum", sum(col("merged_cnt")).over(
        Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("ntot", sum(col("merged_cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // exact order statistics (the comparison side — one global sort at
    // fixture scale; production serves from the sketch alone)
    val exact = ve
      .withColumn("rn", row_number().over(Window.orderBy(col("v"))))
      .withColumn("ntot", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rn") === expr("(ntot * 50 + 99) div 100") ||
        col("rn") === expr("(ntot * 95 + 99) div 100") ||
        col("rn") === expr("(ntot * 99 + 99) div 100"))
      .agg(
        min(when(col("rn") === expr("(ntot * 50 + 99) div 100"), col("v")))
          .as("p50_exact_e4"),
        min(when(col("rn") === expr("(ntot * 95 + 99) div 100"), col("v")))
          .as("p95_exact_e4"),
        min(when(col("rn") === expr("(ntot * 99 + 99) div 100"), col("v")))
          .as("p99_exact_e4"))
    def servedExpr(p: Int): String = servedExprOf(p, "merged_cnt")
    val stats = cum.selectExpr("bin", "merged_cnt", "full_cnt", "cum", "ntot")
      .selectExpr(
        s"count(*) AS m",
        "CAST(sum(CASE WHEN merged_cnt = full_cnt THEN 1 ELSE 0 END) AS BIGINT) AS bins_equal",
        "max(ntot) AS n_total",
        servedExpr(50), servedExpr(95), servedExpr(99))
    stats.crossJoin(broadcast(exact))
      .selectExpr("m", "bins_equal", "n_total",
        "p50_est_e4", "p50_exact_e4",
        s"abs(p50_est_e4 - p50_exact_e4) <= $W AS p50_within_bin",
        "p95_est_e4", "p95_exact_e4",
        s"abs(p95_est_e4 - p95_exact_e4) <= $W AS p95_within_bin",
        "p99_est_e4", "p99_exact_e4",
        s"abs(p99_est_e4 - p99_exact_e4) <= $W AS p99_within_bin")
  }

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q112: the histogram sketch ITSELF, hash-checked bin for bin — the
    // q102/q107 sketch-as-data discipline applied to the distribution:
    // the exact B-bin state a serving job persists through the catalog
    // and folds epochs into. Every cell is an order-free integer count
    // over deterministically placed values, so a distributed partial-agg
    // build and DuckDB's single-node GROUP BY cannot differ.
    QueryDef(
      "q112_hist_sketch",
      (s, dir) =>
        binCells(T.events(s, dir), col("value"))
          .select(col("bin"), (col("bin") * W).as("bin_lo_e4"), col("cnt"))
          .orderBy(col("bin")),
      Some(s"""
        SELECT CAST(gj.j AS BIGINT) AS bin,
               CAST(gj.j * $W AS BIGINT) AS bin_lo_e4,
               CAST(coalesce(SUM(c), 0) AS BIGINT) AS cnt
        FROM (SELECT unnest(range(0, $B)) AS j) gj
        LEFT JOIN (SELECT ${binSql("value")} AS bin, COUNT(*) AS c
                   FROM events GROUP BY 1) h ON h.bin = gj.j
        GROUP BY gj.j ORDER BY bin""")),

    // ------------------------------------------------------------------
    // q113: the MERGE LAW + served quantiles, all exact integers — the
    // q104/q108 construction for the distribution family. Split the
    // events by event_id parity, build a bin table per half, fold
    // bin-wise ADDITION, and compare against the independently built
    // full table (merged ≡ hist(A ∪ B) on every bin). Then serve
    // p50/p95/p99 FROM the merged sketch — cumulative counts + one
    // integer interpolation per percentile — next to the exact order
    // statistics, with |est − exact| ≤ W asserted per percentile IN the
    // hashed row: the sketch's error contract is part of the checked
    // result, not prose.
    QueryDef(
      "q113_hist_quantile_merge",
      (s, dir) => quantileMergeCheck(s, dir),
      Some(s"""
        WITH ve AS (SELECT event_id % 2 AS par,
                           CAST(floor(value * 10000) AS BIGINT) AS v
                    FROM events),
        pc AS (SELECT par, least(greatest(v // $W, 0), ${B - 1}) AS bin,
                      COUNT(*) AS cnt
               FROM ve GROUP BY par, bin),
        ga AS (SELECT gj.j AS bin,
                      CAST(coalesce(SUM(CASE WHEN par = 0 THEN cnt END), 0)
                        AS BIGINT) AS ca,
                      CAST(coalesce(SUM(CASE WHEN par = 1 THEN cnt END), 0)
                        AS BIGINT) AS cb,
                      CAST(coalesce(SUM(cnt), 0) AS BIGINT) AS cf
               FROM (SELECT unnest(range(0, $B)) AS j) gj
               LEFT JOIN pc ON pc.bin = gj.j
               GROUP BY gj.j),
        mg AS (SELECT bin, ca + cb AS merged_cnt, cf AS full_cnt FROM ga),
        cum AS (SELECT bin, merged_cnt, full_cnt,
                       CAST(SUM(merged_cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
                       CAST(SUM(merged_cnt) OVER () AS BIGINT) AS ntot
                FROM mg),
        ex AS (SELECT MIN(CASE WHEN rn = (ntot * 50 + 99) // 100 THEN v END)
                        AS p50_exact_e4,
                      MIN(CASE WHEN rn = (ntot * 95 + 99) // 100 THEN v END)
                        AS p95_exact_e4,
                      MIN(CASE WHEN rn = (ntot * 99 + 99) // 100 THEN v END)
                        AS p99_exact_e4
               FROM (SELECT v, row_number() OVER (ORDER BY v) AS rn,
                            COUNT(*) OVER () AS ntot
                     FROM ve)),
        st AS (SELECT COUNT(*) AS m,
                      CAST(SUM(CASE WHEN merged_cnt = full_cnt THEN 1 ELSE 0 END)
                        AS BIGINT) AS bins_equal,
                      MAX(ntot) AS n_total,
                      MIN(CASE WHEN cum >= (ntot * 50 + 99) // 100
                                AND cum - merged_cnt < (ntot * 50 + 99) // 100
                               THEN bin * $W + (((ntot * 50 + 99) // 100)
                                    - (cum - merged_cnt)) * $W // merged_cnt
                          END) AS p50_est_e4,
                      MIN(CASE WHEN cum >= (ntot * 95 + 99) // 100
                                AND cum - merged_cnt < (ntot * 95 + 99) // 100
                               THEN bin * $W + (((ntot * 95 + 99) // 100)
                                    - (cum - merged_cnt)) * $W // merged_cnt
                          END) AS p95_est_e4,
                      MIN(CASE WHEN cum >= (ntot * 99 + 99) // 100
                                AND cum - merged_cnt < (ntot * 99 + 99) // 100
                               THEN bin * $W + (((ntot * 99 + 99) // 100)
                                    - (cum - merged_cnt)) * $W // merged_cnt
                          END) AS p99_est_e4
               FROM cum)
        SELECT CAST(m AS BIGINT) AS m, bins_equal, n_total,
               p50_est_e4, p50_exact_e4,
               abs(p50_est_e4 - p50_exact_e4) <= $W AS p50_within_bin,
               p95_est_e4, p95_exact_e4,
               abs(p95_est_e4 - p95_exact_e4) <= $W AS p95_within_bin,
               p99_est_e4, p99_exact_e4,
               abs(p99_est_e4 - p99_exact_e4) <= $W AS p99_within_bin
        FROM st CROSS JOIN ex""")),

    // ------------------------------------------------------------------
    // q118: SERVING FROM THE PERSISTED SKETCH — sketch-as-data closed
    // end to end through the catalog: epoch A's bin table commits as
    // v1, epoch B folds in additively as v2 (the runCatalogHistogramSink
    // fold, run relationally in-query), and p50/p95/p99 serve from EACH
    // version by reading its 256 rows — version isolation for sketch
    // state (v1 answers "the distribution as of epoch A" forever) and
    // the quantile probe never touching the corpus, both as one hashed
    // result. The serving arithmetic is shared text with q113
    // (servedExprOf), so the probe cannot fork from the checked bound.
    QueryDef(
      "q118_hist_catalog_serving",
      (s, dir) => {
        val work = graft.Scratch.dir("q118")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "bin BIGINT, cnt BIGINT")
        val ev = graft.Tables.events(s, dir)
        // bounded state (256 bins): one file per version, not one per
        // shuffle partition
        cat.writeNext("hist",
          binCells(ev.filter(col("event_id") % 2 === 0), col("value"))
            .coalesce(1))
        cat.writeNext("hist", mergeBins(
          cat.read("hist", 1, Some(schema)),
          binCells(ev.filter(col("event_id") % 2 === 1), col("value")))
          .coalesce(1))
        (1 to 2).map { v =>
          serveQuantiles(cat.read("hist", v, Some(schema)))
            .select(lit(v.toLong).as("version"), col("n_total"),
              col("p50_est_e4"), col("p95_est_e4"), col("p99_est_e4"))
        }.reduce(_ unionByName _).orderBy(col("version"))
      },
      Some(s"""
        WITH ve AS (SELECT event_id % 2 AS par,
                           CAST(floor(value * 10000) AS BIGINT) AS v
                    FROM events),
        pc AS (SELECT par, least(greatest(v // $W, 0), ${B - 1}) AS bin,
                      COUNT(*) AS cnt
               FROM ve GROUP BY par, bin),
        -- v1 = epoch A (even ids) alone; v2 = the additive fold of both
        ga AS (SELECT gj.j AS bin,
                      CAST(coalesce(SUM(CASE WHEN par = 0 THEN cnt END), 0)
                        AS BIGINT) AS c1,
                      CAST(coalesce(SUM(cnt), 0) AS BIGINT) AS c2
               FROM (SELECT unnest(range(0, $B)) AS j) gj
               LEFT JOIN pc ON pc.bin = gj.j
               GROUP BY gj.j),
        cum AS (SELECT bin, c1, c2,
                       CAST(SUM(c1) OVER (ORDER BY bin) AS BIGINT) AS cum1,
                       CAST(SUM(c1) OVER () AS BIGINT) AS n1,
                       CAST(SUM(c2) OVER (ORDER BY bin) AS BIGINT) AS cum2,
                       CAST(SUM(c2) OVER () AS BIGINT) AS n2
                FROM ga),
        s1 AS (SELECT MAX(n1) AS n_total,
                      MIN(CASE WHEN cum1 >= (n1 * 50 + 99) // 100
                                AND cum1 - c1 < (n1 * 50 + 99) // 100
                               THEN bin * $W + (((n1 * 50 + 99) // 100)
                                    - (cum1 - c1)) * $W // c1 END) AS p50_est_e4,
                      MIN(CASE WHEN cum1 >= (n1 * 95 + 99) // 100
                                AND cum1 - c1 < (n1 * 95 + 99) // 100
                               THEN bin * $W + (((n1 * 95 + 99) // 100)
                                    - (cum1 - c1)) * $W // c1 END) AS p95_est_e4,
                      MIN(CASE WHEN cum1 >= (n1 * 99 + 99) // 100
                                AND cum1 - c1 < (n1 * 99 + 99) // 100
                               THEN bin * $W + (((n1 * 99 + 99) // 100)
                                    - (cum1 - c1)) * $W // c1 END) AS p99_est_e4
               FROM cum),
        s2 AS (SELECT MAX(n2) AS n_total,
                      MIN(CASE WHEN cum2 >= (n2 * 50 + 99) // 100
                                AND cum2 - c2 < (n2 * 50 + 99) // 100
                               THEN bin * $W + (((n2 * 50 + 99) // 100)
                                    - (cum2 - c2)) * $W // c2 END) AS p50_est_e4,
                      MIN(CASE WHEN cum2 >= (n2 * 95 + 99) // 100
                                AND cum2 - c2 < (n2 * 95 + 99) // 100
                               THEN bin * $W + (((n2 * 95 + 99) // 100)
                                    - (cum2 - c2)) * $W // c2 END) AS p95_est_e4,
                      MIN(CASE WHEN cum2 >= (n2 * 99 + 99) // 100
                                AND cum2 - c2 < (n2 * 99 + 99) // 100
                               THEN bin * $W + (((n2 * 99 + 99) // 100)
                                    - (cum2 - c2)) * $W // c2 END) AS p99_est_e4
               FROM cum)
        SELECT CAST(1 AS BIGINT) AS version, n_total,
               p50_est_e4, p95_est_e4, p99_est_e4 FROM s1
        UNION ALL
        SELECT CAST(2 AS BIGINT) AS version, n_total,
               p50_est_e4, p95_est_e4, p99_est_e4 FROM s2
        ORDER BY version"""))
  )
}
