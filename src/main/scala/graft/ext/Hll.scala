package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** HyperLogLog-style distinct-count sketch over the documents
  * 3-shingle stream, built RELATIONALLY — the [[CountMin]] discipline applied to
  * cardinality: register j = MAX over items hashing to j of the
  * first-set-bit rank of the hash suffix (Flajolet–Martin style rank;
  * geometric(1/2) under a uniform hash, so the HyperLogLog estimator
  * applies unchanged — Flajolet, Fusy, Gandouet & Meunier,
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm", AofA 2007). MAX is order-free, so the register table is
  * partial-aggregable (map-side combine), mergeable across ANY
  * partitioning or epoch split (register-wise MAX IS the union — the
  * CMS linearity story with SUM replaced by MAX), and — md5-derived,
  * not RNG-seeded — bit-exactly reproducible on any engine, unlike the
  * opaque binary state of `approx_count_distinct`.
  *
  * q107 hash-checks the ENTIRE m=256 register table (sketch-as-data,
  * the q102 discipline). q108 proves the merge law cell-for-cell on a
  * corpus split AND serves the cardinality estimate as exact integer
  * arithmetic: registers are clamped at [[RhoCap]] so the harmonic sum
  * Σ 2^(RhoCap−M[j]) (integer bit-shifts, both engines) and the
  * estimator numerator α_m·m²·2^RhoCap both stay inside exact int64 —
  * every engine computes the identical estimate, no floats anywhere.
  *
  * 100 TB shape: the token stream reduces map-side to m registers
  * regardless of corpus size; the register table is catalog-persistable
  * next to the CMS sketch (dedup-rate and vocabulary-growth monitoring
  * read both), and epoch tables from the streaming side fold by the
  * same MAX-merge (`VersionedCatalog.writeNext(epochTag)` gives the
  * additive-fold-free idempotence for free — MAX-merge IS
  * content-idempotent, the [[graft.streaming.EventPipelines
  * .runCatalogMergeSink]] class).
  */
object Hll extends QueryModule {

  private val P = 8
  private val M = 1 << P // 256 registers
  /** Register clamp: ranks ≥ RhoCap collapse (probability 2^-24 per
    * item — invisible below ~10⁷ distinct); keeps Σ 2^(RhoCap−M[j])
    * ≤ m·2^25 = 2^33 and the estimator numerator α_e6·m²·2^25 ≈
    * 1.6×10¹⁸ exactly representable in int64 on both engines. */
  private val RhoCap = 25
  /** α_256 × 10⁶ = ⌊0.7213/(1 + 1.079/256)·10⁶⌋ — a shared literal, so
    * cross-engine parity never depends on float evaluation. */
  private val AlphaE6 = 718272L

  /** (j, rho) ranks over an ARBITRARY item column — the streaming epochs
    * (EventPipelines.runCatalogRegisterSink) place items through this
    * exact definition, so their register tables MAX-merge with
    * document-built ones. `carry` columns pass through untouched (q108
    * tags each rank with its corpus half). */
  private[graft] def ranksOf(items: DataFrame, item: org.apache.spark.sql.Column,
      carry: Seq[String] = Nil): DataFrame =
    items
      .select(carry.map(col) :+ X.h60(concat(lit("hll "), item.cast("string"))).as("h"): _*)
      .selectExpr(carry ++ Seq(s"h % $M AS j", s"h div $M AS v"): _*)
      .selectExpr(carry ++ Seq("j",
        s"IF(v = 0, $RhoCap, least(bit_count((v & -v) - 1) + 1, $RhoCap)) AS rho"): _*)

  /** The complete m-register table over an arbitrary item column —
    * every register present, 0 when nothing hashed to it (the state a
    * serving job persists). */
  def registerCells(items: DataFrame, item: org.apache.spark.sql.Column): DataFrame = {
    val s = items.sparkSession
    s.range(M).toDF("j")
      .join(ranksOf(items, item).groupBy(col("j")).agg(max(col("rho")).as("mr")),
        Seq("j"), "left")
      .select(col("j"), coalesce(col("mr"), lit(0)).cast("long").as("register"))
  }

  /** Register-wise MAX merge: sketch(A) ⊔ sketch(B) = sketch(A ∪ B)
    * exactly — MAX is the HLL union law the way SUM is CMS's
    * ([[CountMin.mergeSketches]]). Uninhabited registers on either
    * side count as 0; O(m) rows, never the corpus. Unlike the additive
    * CMS fold, MAX-merge is content-IDEMPOTENT: re-merging a sketch
    * already folded in changes nothing. */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("j"), col("register").as("ra"))
      .join(b.select(col("j"), col("register").as("rb")), Seq("j"), "full_outer")
      .select(col("j"),
        greatest(coalesce(col("ra"), lit(0L)), coalesce(col("rb"), lit(0L)))
          .as("register"))

  /** Serve the cardinality estimate from a persisted m-register table
    * (the [[estimateMergeCheck]] arithmetic, factored so catalog
    * serving cannot fork from the checked bound): S = Σ 2^(RhoCap−M[j])
    * exact in int64, est = α·m²·2^RhoCap / S as two integer divisions,
    * plus the small-range-regime flag (est < 2.5m ⇔ linear counting
    * applies) and its zero-register input. O(m) rows in, 1 row out —
    * never the corpus. */
  def serveEstimate(regs: DataFrame): DataFrame =
    regs.agg(
        sum(expr(s"shiftleft(1L, CAST($RhoCap - register AS INT))"))
          .as("s_scaled"),
        sum(when(col("register") === 0, 1L).otherwise(0L)).as("zero_regs"))
      .selectExpr("s_scaled", "zero_regs",
        s"(${AlphaE6}L * $M * $M * ${1L << RhoCap}L) div s_scaled div 1000000"
          + " AS est_e0")
      .selectExpr("s_scaled", "zero_regs", "est_e0",
        s"est_e0 * 2 < 5 * $M AS small_range")

  /** The complete m-register table over the documents 3-shingle stream
    * — the q107/q108 fixture instantiation of [[registerCells]], BY
    * DELEGATION: the streamed/batch register-definition identity holds
    * by construction, not by keeping two copies in sync.
    *
    * The item stream is token 3-SHINGLES, not tokens: shingle-space
    * cardinality is what LSH/n-gram dedup design actually needs, and
    * the fixture's token vocabulary (31 words) sits in HLL's
    * small-range bias regime where the honest estimator is linear
    * counting over zero registers — shingles (~3×10⁴ distinct) put the
    * raw HyperLogLog estimator in its design range. q108 emits the
    * regime inputs (zero_regs, small_range) alongside, so a serving
    * layer can apply the small-range correction when it fires.
    * Duplicate items cost nothing: MAX absorbs them, so no
    * pre-distinct shuffle. */
  private[graft] def registerTable(docs: DataFrame): DataFrame =
    registerCells(
      docs.select(explode(X.shingles(X.tokens(col("text")), 3)).as("item")),
      col("item"))

  private def ranksSqlCtes(src: String): String =
    s"""items AS (SELECT unnest(${X.shinglesSql("tk", 3)}) AS item
                  FROM (SELECT ${X.tokensSql("text")} AS tk FROM $src)),
        hv AS (SELECT ${X.h60Sql("'hll ' || item")} AS h FROM items),
        rk AS (SELECT h % $M AS j,
                      CASE WHEN h // $M = 0 THEN $RhoCap
                           ELSE least(bit_count(((h // $M) & -(h // $M)) - 1) + 1,
                                      $RhoCap) END AS rho
               FROM hv)"""

  private val registersSqlTail =
    s"""regs AS (SELECT gj.j AS j, coalesce(MAX(rho), 0) AS register
                 FROM (SELECT unnest(range(0, $M)) AS j) gj
                 LEFT JOIN rk USING (j)
                 GROUP BY gj.j)"""

  /** q108's operator body: parity-split register tables, their
    * register-wise MAX fold, the independently derived full table, and
    * the served estimate — ONE corpus pass. The corpus reduces once to
    * the cached DISTINCT (half, item) set (registers and the exact
    * distinct count are both functions of the set, so nothing else is
    * ever needed), and one conditional-MAX aggregation yields all
    * three register tables — the same one-grouped-pass shape the
    * DuckDB oracle uses, and the [[CountMin.mergeCheck]] caching
    * pattern. Pass your own `scope` and release after materializing. */
  def estimateMergeCheck(s: SparkSession, dir: String,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val di = T.documents(s, dir)
      .select((col("doc_id") % 2 === 0).as("even"),
        explode(X.shingles(X.tokens(col("text")), 3)).as("item"))
      .distinct()
      .transform(scope.cache)
    val rk = ranksOf(di, col("item"), carry = Seq("even"))
    val merged = s.range(M).toDF("j")
      .join(rk.groupBy(col("j")).agg(
          max(when(col("even"), col("rho"))).as("ma"),
          max(when(!col("even"), col("rho"))).as("mb"),
          max(col("rho")).as("mf")),
        Seq("j"), "left")
      .select(col("j"),
        greatest(coalesce(col("ma"), lit(0)), coalesce(col("mb"), lit(0)))
          .cast("long").as("merged_reg"),
        coalesce(col("mf"), lit(0)).cast("long").as("full_reg"))
    val stats = merged.agg(
      count(lit(1)).as("m"),
      sum(when(col("merged_reg") === col("full_reg"), 1L).otherwise(0L))
        .as("regs_equal"),
      sum(expr(s"shiftleft(1L, CAST($RhoCap - merged_reg AS INT))"))
        .as("s_scaled"),
      sum(when(col("merged_reg") === 0, 1L).otherwise(0L)).as("zero_regs"))
    val nd = di.agg(countDistinct(col("item")).as("n_distinct"))
    stats.crossJoin(broadcast(nd))
      .selectExpr("m", "regs_equal", "s_scaled", "zero_regs",
        s"(${AlphaE6}L * $M * $M * ${1L << RhoCap}L) div s_scaled div 1000000 AS est_e0",
        "n_distinct")
      .selectExpr("m", "regs_equal", "s_scaled", "zero_regs", "est_e0",
        "n_distinct",
        s"est_e0 * 2 < 5 * $M AS small_range",
        "est_e0 >= n_distinct div 2 AND est_e0 <= n_distinct * 2 AS est_within_2x")
  }

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q107: the register table ITSELF, hash-checked register for
    // register — the q102 sketch-as-data discipline for cardinality:
    // not an estimate contract, the exact m-register state a serving
    // job would persist through the catalog and fold epochs into.
    QueryDef(
      "q107_hll_sketch",
      (s, dir) => registerTable(T.documents(s, dir)).orderBy(col("j")),
      Some(s"""
        WITH ${ranksSqlCtes("documents")},
        $registersSqlTail
        SELECT CAST(j AS BIGINT) AS j, CAST(register AS BIGINT) AS register
        FROM regs ORDER BY j""")),

    // ------------------------------------------------------------------
    // q108: the MERGE LAW + the served estimate, all exact integers.
    // Split the corpus by doc_id parity, build a register table per
    // half, fold register-wise MAX, and compare against the
    // independently built full table — merged(A, B) ≡ sketch(A ∪ B) on
    // every register (the CMS q104 construction with SUM → MAX). Then
    // serve the cardinality estimate FROM the merged sketch:
    // S = Σ 2^(RhoCap−M[j]) (exact int64), est = α·m²·2^RhoCap / S as
    // two integer divisions — identical on any engine — next to the
    // exact distinct-shingle count, the small-range-regime inputs
    // (zero_regs, small_range: est < 2.5m ⇔ apply linear counting)
    // and a ±2× sanity flag (m=256 gives ~6.5% standard error, so 2×
    // headroom is conservative in the raw-estimator regime).
    QueryDef(
      "q108_hll_estimate_merge",
      (s, dir) => estimateMergeCheck(s, dir),
      Some(s"""
        WITH items AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 3)}) AS item
                       FROM (SELECT doc_id, ${X.tokensSql("text")} AS tk
                             FROM documents)),
        hv AS (SELECT doc_id % 2 AS par,
                      ${X.h60Sql("'hll ' || item")} AS h
               FROM items),
        rk AS (SELECT par, h % $M AS j,
                      CASE WHEN h // $M = 0 THEN $RhoCap
                           ELSE least(bit_count(((h // $M) & -(h // $M)) - 1) + 1,
                                      $RhoCap) END AS rho
               FROM hv),
        -- one grouped pass yields both parity tables AND the full one
        -- (conditional MAX); the engine builds them independently —
        -- same values either way, MAX is order- and duplication-free
        ra AS (SELECT gj.j AS j,
                      coalesce(MAX(CASE WHEN par = 0 THEN rho END), 0) AS reg_a,
                      coalesce(MAX(CASE WHEN par = 1 THEN rho END), 0) AS reg_b,
                      coalesce(MAX(rho), 0) AS full_reg
               FROM (SELECT unnest(range(0, $M)) AS j) gj
               LEFT JOIN rk USING (j)
               GROUP BY gj.j),
        mg AS (SELECT j, greatest(reg_a, reg_b) AS merged_reg, full_reg FROM ra),
        st AS (SELECT COUNT(*) AS m,
                      CAST(SUM(CASE WHEN merged_reg = full_reg THEN 1 ELSE 0 END)
                        AS BIGINT) AS regs_equal,
                      CAST(SUM(CAST(1 AS BIGINT) << ($RhoCap - merged_reg))
                        AS BIGINT) AS s_scaled,
                      CAST(SUM(CASE WHEN merged_reg = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS zero_regs
               FROM mg),
        nd AS (SELECT COUNT(DISTINCT item) AS n_distinct FROM items),
        est AS (SELECT CAST(m AS BIGINT) AS m, regs_equal, s_scaled, zero_regs,
                       CAST(CAST($AlphaE6 AS BIGINT) * $M * $M
                            * ${1L << RhoCap} // s_scaled // 1000000
                         AS BIGINT) AS est_e0
                FROM st)
        SELECT m, regs_equal, s_scaled, zero_regs, est_e0,
               CAST(n_distinct AS BIGINT) AS n_distinct,
               est_e0 * 2 < 5 * $M AS small_range,
               est_e0 >= n_distinct // 2 AND est_e0 <= n_distinct * 2
                 AS est_within_2x
        FROM est CROSS JOIN nd""")),

    // ------------------------------------------------------------------
    // q119: SERVING FROM THE PERSISTED HLL — the q118 discipline for
    // cardinality: epoch A's register table commits as v1, epoch B
    // folds in by register-wise MAX as v2 (the
    // runCatalogRegisterSink fold, run relationally in-query; the
    // sink itself delegates to the same registerCells/mergeRegisters,
    // so streamed state is this state by construction), and the
    // distinct-count estimate serves from EACH version's 256 rows —
    // version isolation for sketch state (v1 answers "cardinality as
    // of epoch A" forever) with the probe never touching the event
    // stream. All exact int64 arithmetic ([[serveEstimate]]), so the
    // served numbers hash-match any engine.
    QueryDef(
      "q119_hll_catalog_serving",
      (s, dir) => {
        val work = graft.Scratch.dir("q119")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "j BIGINT, register BIGINT")
        val ev = T.events(s, dir)
        // bounded state (256 registers): one file per version
        cat.writeNext("hll",
          registerCells(ev.filter(col("event_id") % 2 === 0), col("event_id"))
            .coalesce(1))
        cat.writeNext("hll", mergeRegisters(
          cat.read("hll", 1, Some(schema)),
          registerCells(ev.filter(col("event_id") % 2 === 1), col("event_id")))
          .coalesce(1))
        (1 to 2).map { v =>
          serveEstimate(cat.read("hll", v, Some(schema)))
            .select(lit(v.toLong).as("version"), col("s_scaled"),
              col("zero_regs"), col("est_e0"), col("small_range"))
        }.reduce(_ unionByName _).orderBy(col("version"))
      },
      Some(s"""
        WITH hv AS (SELECT event_id % 2 AS par,
                           ${X.h60Sql("'hll ' || CAST(event_id AS VARCHAR)")} AS h
                    FROM events),
        rk AS (SELECT par, h % $M AS j,
                      CASE WHEN h // $M = 0 THEN $RhoCap
                           ELSE least(bit_count(((h // $M) & -(h // $M)) - 1) + 1,
                                      $RhoCap) END AS rho
               FROM hv),
        -- v1 = epoch A (even ids) alone; v2 = MAX-merge of both epochs,
        -- which IS the full-stream table (max(max A, max B) = max(A∪B))
        ra AS (SELECT gj.j AS j,
                      coalesce(MAX(CASE WHEN par = 0 THEN rho END), 0) AS reg1,
                      coalesce(MAX(rho), 0) AS reg2
               FROM (SELECT unnest(range(0, $M)) AS j) gj
               LEFT JOIN rk USING (j)
               GROUP BY gj.j),
        st AS (SELECT
                 CAST(SUM(CAST(1 AS BIGINT) << ($RhoCap - reg1)) AS BIGINT) AS s1,
                 CAST(SUM(CASE WHEN reg1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z1,
                 CAST(SUM(CAST(1 AS BIGINT) << ($RhoCap - reg2)) AS BIGINT) AS s2,
                 CAST(SUM(CASE WHEN reg2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z2
               FROM ra),
        sv AS (SELECT CAST(1 AS BIGINT) AS version, s1 AS s_scaled, z1 AS zero_regs,
                      CAST(CAST($AlphaE6 AS BIGINT) * $M * $M
                           * ${1L << RhoCap} // s1 // 1000000 AS BIGINT) AS est_e0
               FROM st
               UNION ALL
               SELECT CAST(2 AS BIGINT), s2, z2,
                      CAST(CAST($AlphaE6 AS BIGINT) * $M * $M
                           * ${1L << RhoCap} // s2 // 1000000 AS BIGINT)
               FROM st)
        SELECT version, s_scaled, zero_regs, est_e0,
               est_e0 * 2 < 5 * $M AS small_range
        FROM sv ORDER BY version""")),
  )
}
