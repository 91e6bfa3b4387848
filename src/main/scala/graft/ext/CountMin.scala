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

  /** (token, cnt) exact counts — the stream the sketch summarizes.
    * private[graft] so CountMinSpec exercises the PRODUCTION build. */
  private[graft] def tokenCounts(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir)
      .select(explode(X.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))

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

  /** Heavy-hitter serving: CMS estimate min_d cell(d, h_d(t)) for the
    * `topK` highest-exact-count tokens, with the one-sided guarantee
    * (est ≥ true) emitted as exact per-row arithmetic. The exact token
    * counts feed both the sketch build and the top-k probe, so they are
    * cached through `scope` — pass your own scope and release it after
    * materializing, like the SimilarityJoin operators. */
  def heavyHitters(
      s: SparkSession, dir: String, topK: Int = 20,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val tc = tokenCounts(s, dir).transform(scope.cache)
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
        FROM probe ORDER BY true_cnt DESC, token"""))
  )
}
