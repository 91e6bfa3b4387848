package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Count-min sketch over the documents token stream, built
  * RELATIONALLY: cell (d, w) = Σ counts of tokens whose row-d hash
  * lands in column w — an order-free int64 SUM, so the sketch is
  * partial-aggregable (map-side combine), mergeable across any
  * partitioning (cell-wise addition IS the shuffle), and — because the
  * row hashes are md5-derived, not RNG-seeded — bit-exactly
  * reproducible on any engine (Cormode & Muthukrishnan, "An improved
  * data stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005).
  *
  * q102 hash-checks the ENTIRE sketch table — the q96 discipline
  * applied to sketches: not an estimate contract, the exact sketch
  * state the serving side would load. q103 serves heavy-hitter
  * estimates from it: est(t) = min_d cell(d, h_d(t)), with the CMS
  * one-sided guarantee (est ≥ true count) checked as exact integer
  * arithmetic per row.
  *
  * 100 TB shape: the token stream reduces map-side to D×W cells
  * regardless of corpus size; the sketch table is catalog-persistable
  * index-as-data (like the Bloom shard and PQ code tables), and a
  * heavy-hitter probe joins D cells per candidate token, never the
  * corpus.
  */
object CountMin extends QueryModule {

  private val D = 4 // independent hash rows
  private val W = 64 // columns per row

  /** Row-d column index of a token — md5-derived, shared with the
    * oracle text so both engines place every token identically.
    * private[graft]: the STREAMING build (EventPipelines.countMinCells)
    * must place items through this exact definition, or its state
    * would not be mergeable with batch-built sketches. */
  private[graft] def cellCol(d: Column, token: Column): Column =
    pmod(X.h60(concat(lit("cms "), d.cast("string"), lit(" "), token)),
      lit(W.toLong))

  private[graft] def dRows: Int = D

  private def cellSql(d: String, token: String): String =
    s"(${X.h60Sql(s"'cms ' || CAST($d AS VARCHAR) || ' ' || $token")} % $W)"

  /** (token, cnt) exact counts over an arbitrary documents slice — the
    * stream the sketch summarizes. */
  private[graft] def tokenCountsOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(X.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))

  /** (token, cnt) exact counts — the stream the sketch summarizes.
    * private[graft] so CountMinSpec exercises the PRODUCTION build. */
  private[graft] def tokenCounts(s: SparkSession, dir: String): DataFrame =
    tokenCountsOf(T.documents(s, dir))

  private val tokenCountsSqlCte =
    s"""tc AS (SELECT token, COUNT(*) AS cnt
               FROM (SELECT unnest(tk) AS token
                     FROM (SELECT ${X.tokensSql("text")} AS tk FROM documents))
               GROUP BY token)"""

  /** The D×W sketch as a DataFrame — one row per inhabited cell. */
  private[graft] def sketchCells(tc: DataFrame): DataFrame =
    tc.select(explode(sequence(lit(0), lit(D - 1))).as("d"),
        col("token"), col("cnt"))
      .withColumn("w", cellCol(col("d"), col("token")))
      .groupBy(col("d"), col("w"))
      .agg(sum(col("cnt")).as("cell_sum"), count(lit(1)).as("n_tokens"))

  /** Cell-wise merge of two sketches — the mergeability claim as code:
    * because every cell is an order-free SUM placed by the shared
    * md5-derived [[cellCol]], sketch(A) ⊕ sketch(B) = sketch(A ∪ B)
    * exactly (Cormode & Muthukrishnan §3: CMS is a linear sketch).
    * Inputs need (d, w, cell_sum); uninhabited cells on either side
    * count as 0. One full-outer join on the D×W cell table — never the
    * corpus — so merging persisted epoch sketches costs O(D·W). */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("d"), col("w"), col("cell_sum").as("sum_a"))
      .join(b.select(col("d"), col("w"), col("cell_sum").as("sum_b")),
        Seq("d", "w"), "full_outer")
      .select(col("d"), col("w"),
        (coalesce(col("sum_a"), lit(0L)) + coalesce(col("sum_b"), lit(0L)))
          .as("cell_sum"))

  /** Heavy-hitter serving: CMS estimate min_d cell(d, h_d(t)) for the
    * `topK` highest-exact-count tokens, with the one-sided guarantee
    * (est ≥ true) emitted as exact per-row arithmetic. The exact token
    * counts feed both the sketch build and the top-k probe, so they are
    * cached through `scope` — pass your own scope and release it after
    * materializing, like the SimilarityJoin operators; when omitted
    * (`null`, the QueryDef path) the internal scope self-releases after
    * the next completed action
    * ([[graft.CacheScope.releaseAfterNextAction]]), so the default path
    * cannot pin the projection for the session. */
  def heavyHitters(
      s: SparkSession, dir: String, topK: Int = 20,
      scope: graft.CacheScope = null): DataFrame = {
    val sc = Option(scope).getOrElse {
      val own = new graft.CacheScope
      graft.CacheScope.releaseAfterNextAction(s, own)
      own
    }
    val tc = tokenCounts(s, dir).transform(sc.cache)
    val cells = sketchCells(tc).select(col("d"), col("w"), col("cell_sum"))
    tc.orderBy(col("cnt").desc, col("token")).limit(topK)
      .select(col("token"), col("cnt"),
        explode(sequence(lit(0), lit(D - 1))).as("d"))
      .withColumn("w", cellCol(col("d"), col("token")))
      .join(cells, Seq("d", "w"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("cell_sum")).as("cms_est"))
      .select(col("token"), col("cnt").as("true_cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("overcount"),
        (col("cms_est") >= col("cnt")).as("est_ge_true"))
      .orderBy(col("true_cnt").desc, col("token"))
  }

  /** q104's operator body: parity-split epoch sketches, their cell-wise
    * [[mergeSketches]] fold, and the independently aggregated full
    * sketch, compared cell for cell. ONE tokenization pass feeds all
    * three builds: the corpus reduces once to cached per-(parity,
    * token) counts, and each sketch is a different aggregation path
    * over that table — the halves through cell placement then merge,
    * the full side through token-level summation first. Pass your own
    * `scope` and release after materializing (the q103 pattern); when
    * omitted the internal scope self-releases after the next completed
    * action, as in [[heavyHitters]]. */
  def mergeCheck(s: SparkSession, dir: String,
      scope: graft.CacheScope = null): DataFrame = {
    val sc = Option(scope).getOrElse {
      val own = new graft.CacheScope
      graft.CacheScope.releaseAfterNextAction(s, own)
      own
    }
    val byPar = T.documents(s, dir)
      .select((col("doc_id") % 2 === 0).as("even"),
        explode(X.tokens(col("text"))).as("token"))
      .groupBy(col("even"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .transform(sc.cache)
    val skA = sketchCells(byPar.filter(col("even")).select(col("token"), col("cnt")))
    val skB = sketchCells(byPar.filter(!col("even")).select(col("token"), col("cnt")))
    val full = sketchCells(
        byPar.groupBy(col("token")).agg(sum(col("cnt")).as("cnt")))
      .select(col("d"), col("w"), col("cell_sum").as("full_sum"))
    mergeSketches(skA, skB)
      .join(full, Seq("d", "w"), "full_outer")
      .select(col("d").cast("long").as("d"), col("w"),
        coalesce(col("cell_sum"), lit(0L)).as("merged_sum"),
        coalesce(col("full_sum"), lit(0L)).as("full_sum"),
        (coalesce(col("cell_sum"), lit(0L))
          === coalesce(col("full_sum"), lit(0L))).as("cells_equal"))
      .orderBy(col("d"), col("w"))
  }

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q102: the sketch ITSELF, hash-checked cell for cell. Every cell
    // is an order-free integer sum over md5-placed tokens, so a
    // distributed partial-agg build and DuckDB's single-node GROUP BY
    // cannot differ — the whole D×W state a serving job would persist
    // through the catalog is bit-exact, not estimate-contracted.
    QueryDef(
      "q102_cms_sketch",
      (s, dir) =>
        sketchCells(tokenCounts(s, dir))
          .select(col("d").cast("long").as("d"), col("w"),
            col("cell_sum"), col("n_tokens"))
          .orderBy(col("d"), col("w")),
      Some(s"""
        WITH $tokenCountsSqlCte
        SELECT CAST(gd.d AS BIGINT) AS d,
               ${cellSql("gd.d", "token")} AS w,
               CAST(SUM(cnt) AS BIGINT) AS cell_sum,
               COUNT(*) AS n_tokens
        FROM tc CROSS JOIN (SELECT unnest(range(0, $D)) AS d) gd
        GROUP BY 1, 2 ORDER BY d, w""")),

    // ------------------------------------------------------------------
    // q103: heavy-hitter estimates served FROM the sketch — for the 20
    // highest-count tokens (exact top via q35's ordering), the CMS
    // estimate min_d cell(d, h_d(t)) and its overcount vs the exact
    // count. The one-sided CMS guarantee est >= true is exact integer
    // arithmetic here, so it is hash-checked per row rather than
    // asserted in aggregate; the probe joins D cells per token against
    // the D×W sketch, never the corpus.
    QueryDef(
      "q103_cms_heavy_hitters",
      (s, dir) => heavyHitters(s, dir, topK = 20),
      Some(s"""
        WITH $tokenCountsSqlCte,
        cells AS (SELECT gd.d AS d, ${cellSql("gd.d", "token")} AS w,
                         CAST(SUM(cnt) AS BIGINT) AS cell_sum
                  FROM tc CROSS JOIN (SELECT unnest(range(0, $D)) AS d) gd
                  GROUP BY 1, 2),
        top AS (SELECT token, cnt FROM tc ORDER BY cnt DESC, token LIMIT 20),
        probe AS (SELECT t.token, t.cnt, MIN(c.cell_sum) AS cms_est
                  FROM top t CROSS JOIN (SELECT unnest(range(0, $D)) AS d) gd
                  JOIN cells c ON c.d = gd.d
                             AND c.w = ${cellSql("gd.d", "t.token")}
                  GROUP BY t.token, t.cnt)
        SELECT token, cnt AS true_cnt, cms_est,
               cms_est - cnt AS overcount,
               cms_est >= cnt AS est_ge_true
        FROM probe ORDER BY true_cnt DESC, token""")),

    // ------------------------------------------------------------------
    // q104: sketch MERGE as an oracled operator — the linearity claim
    // (q102's doc) proven cell for cell: split the corpus in two
    // (doc_id parity), build a sketch per half, merge them cell-wise,
    // and hash-check merged(sketch(A), sketch(B)) ≡ sketch(A ∪ B) on
    // every inhabited cell of EITHER side. This is the catalog-serving
    // primitive: persisted epoch sketches (batch or streamed,
    // EventPipelines.runCatalogSketchSink) combine by exactly this
    // join, O(D×W) rows, never touching the corpus.
    QueryDef(
      "q104_cms_merge",
      (s, dir) => mergeCheck(s, dir),
      Some(s"""
        WITH toks AS (SELECT doc_id, unnest(tk) AS token
                      FROM (SELECT doc_id, ${X.tokensSql("text")} AS tk
                            FROM documents)),
        tca AS (SELECT token, COUNT(*) AS cnt FROM toks
                WHERE doc_id % 2 = 0 GROUP BY token),
        tcb AS (SELECT token, COUNT(*) AS cnt FROM toks
                WHERE doc_id % 2 = 1 GROUP BY token),
        tcf AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
        ska AS (SELECT gd.d AS d, ${cellSql("gd.d", "token")} AS w,
                       CAST(SUM(cnt) AS BIGINT) AS cell_sum
                FROM tca CROSS JOIN (SELECT unnest(range(0, $D)) AS d) gd
                GROUP BY 1, 2),
        skb AS (SELECT gd.d AS d, ${cellSql("gd.d", "token")} AS w,
                       CAST(SUM(cnt) AS BIGINT) AS cell_sum
                FROM tcb CROSS JOIN (SELECT unnest(range(0, $D)) AS d) gd
                GROUP BY 1, 2),
        skf AS (SELECT gd.d AS d, ${cellSql("gd.d", "token")} AS w,
                       CAST(SUM(cnt) AS BIGINT) AS full_sum
                FROM tcf CROSS JOIN (SELECT unnest(range(0, $D)) AS d) gd
                GROUP BY 1, 2),
        merged AS (SELECT d, w,
                          coalesce(a.cell_sum, 0) + coalesce(b.cell_sum, 0)
                            AS merged_sum
                   FROM ska a FULL JOIN skb b USING (d, w))
        SELECT CAST(d AS BIGINT) AS d, w,
               coalesce(merged_sum, 0) AS merged_sum,
               coalesce(full_sum, 0) AS full_sum,
               coalesce(merged_sum, 0) = coalesce(full_sum, 0) AS cells_equal
        FROM merged FULL JOIN skf USING (d, w)
        ORDER BY d, w""")),

    // ------------------------------------------------------------------
    // q120: SERVING FROM THE PERSISTED CMS — the third leg of the
    // catalog-serving trio (q118 histogram, q119 HLL): epoch A's D×W
    // cell table commits as v1, epoch B folds in additively as v2 (the
    // runCatalogSketchSink fold, run relationally in-query), and
    // heavy-hitter estimates serve from EACH version's ≤D×W rows. The
    // one-sided guarantee is checked per VERSION against the exact
    // count of the epoch range that version summarizes — version
    // isolation means v1 answers "counts as of epoch A" forever, and
    // est ≥ true holds within every version, not just the latest. The
    // probe joins D cells per token; the corpus is touched only to
    // derive the probe set and the exact counts it is checked against.
    QueryDef(
      "q120_cms_catalog_serving",
      (s, dir) => {
        val work = graft.Scratch.dir("q120")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "d BIGINT, w BIGINT, cell_sum BIGINT")
        val docs = T.documents(s, dir)
        def cells(even: Boolean) = sketchCells(tokenCountsOf(
            docs.filter((col("doc_id") % 2 === 0) === lit(even))))
          .select(col("d").cast("long").as("d"), col("w"), col("cell_sum"))
        // bounded state (D x W = 256 cells): one file per version
        cat.writeNext("cms", cells(even = true).coalesce(1))
        cat.writeNext("cms", mergeSketches(
          cat.read("cms", 1, Some(schema)), cells(even = false)).coalesce(1))
        val tc = docs
          .select((col("doc_id") % 2 === 0).as("even"),
            explode(X.tokens(col("text"))).as("token"))
          .groupBy(col("token"))
          .agg(sum(when(col("even"), 1L).otherwise(0L)).as("cnt_a"),
            count(lit(1)).as("cnt_full"))
        val top = tc.orderBy(col("cnt_full").desc, col("token")).limit(10)
        (1 to 2).map { v =>
          top
            .select(col("token"),
              (if (v == 1) col("cnt_a") else col("cnt_full")).as("epoch_cnt"),
              explode(sequence(lit(0), lit(D - 1))).as("d"))
            .withColumn("w", cellCol(col("d"), col("token")))
            // left: a probe cell absent from this version's table is an
            // uninhabited cell = 0 mass (the CMS empty-cell semantics)
            .join(cat.read("cms", v, Some(schema)), Seq("d", "w"), "left")
            .groupBy(col("token"), col("epoch_cnt"))
            .agg(min(coalesce(col("cell_sum"), lit(0L))).as("cms_est"))
            .select(lit(v.toLong).as("version"), col("token"),
              col("epoch_cnt"), col("cms_est"),
              (col("cms_est") >= col("epoch_cnt")).as("est_ge_true"))
        }.reduce(_ unionByName _).orderBy(col("version"), col("token"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id % 2 = 0 AS even, unnest(tk) AS token
                      FROM (SELECT doc_id, ${X.tokensSql("text")} AS tk
                            FROM documents)),
        tc AS (SELECT token,
                      CAST(coalesce(SUM(CASE WHEN even THEN 1 END), 0)
                        AS BIGINT) AS cnt_a,
                      COUNT(*) AS cnt_full
               FROM toks GROUP BY token),
        top AS (SELECT token, cnt_a, cnt_full FROM tc
                ORDER BY cnt_full DESC, token LIMIT 10),
        -- v1 = epoch A (even doc_ids) alone; v2 = the additive fold of
        -- both epochs, which IS the full-corpus sketch (CMS linearity)
        cells AS (SELECT gd.d AS d, ${cellSql("gd.d", "token")} AS w,
                         CAST(coalesce(SUM(CASE WHEN even THEN 1 END), 0)
                           AS BIGINT) AS sum_a,
                         CAST(COUNT(*) AS BIGINT) AS sum_full
                  FROM toks CROSS JOIN (SELECT unnest(range(0, $D)) AS d) gd
                  GROUP BY 1, 2),
        probe AS (SELECT t.token, t.cnt_a, t.cnt_full,
                         MIN(c.sum_a) AS est_a, MIN(c.sum_full) AS est_full
                  FROM top t CROSS JOIN (SELECT unnest(range(0, $D)) AS d) gd
                  JOIN cells c ON c.d = gd.d
                             AND c.w = ${cellSql("gd.d", "t.token")}
                  GROUP BY t.token, t.cnt_a, t.cnt_full),
        sv AS (SELECT CAST(1 AS BIGINT) AS version, token,
                      cnt_a AS epoch_cnt, est_a AS cms_est FROM probe
               UNION ALL
               SELECT CAST(2 AS BIGINT), token, cnt_full, est_full FROM probe)
        SELECT version, token, epoch_cnt, cms_est,
               cms_est >= epoch_cnt AS est_ge_true
        FROM sv ORDER BY version, token"""))
  )
}
