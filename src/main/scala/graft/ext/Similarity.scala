package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine nearest-neighbor as the correctness baseline, a
  * sign-bit LSH bucketed variant as the scale path, and an intra-label
  * cosine analytics aggregate.
  *
  * Determinism: floats are scaled to exact int64 (×1e7, floor) so dot
  * products and norms are exact integers; cosine is then one division on
  * identical operands — bit-identical on Spark and DuckDB — so rank
  * orderings (with id tiebreaks) agree exactly.
  *
  * Scale notes (100 TB): brute-force all-pairs is O(n²) — correct at
  * fixture scale, shipped as the oracle baseline. The production path is
  * q51's LSH bucketing (hyperplane-sign signatures → candidates share a
  * bucket → shuffle ∝ bucket sizes), the same pattern an IVF index gives.
  * For a q-vs-corpus workload, the query side is small → broadcast it
  * and the corpus never shuffles at all.
  */
object Similarity extends QueryModule {

  /** vec_id, label, scaled int vector, exact squared norm. */
  private def scaled(s: SparkSession, dir: String): DataFrame =
    T.embeddings(s, dir)
      .select(col("vec_id"), col("label"), X.scaledVec(col("embedding")).as("v"))
      .withColumn("n2", X.norm2Int(col("v")))

  /** Average pairwise intra-label cosine with a label-size cap: labels
    * past `maxPerLabel` members are deterministically hash-thinned to
    * ~that many BEFORE the pair join, so one skewed label can never go
    * quadratic (10⁷ members would otherwise cost 5×10¹³ pairs). The
    * average over a uniform member sample estimates the same statistic.
    * Thinning (not dropping, as cappedBuckets does for near-dup
    * candidates): for an analytics aggregate the label must still
    * appear in the output — a near-dup bucket past its cap carries ~no
    * pair information, but a big label's average is exactly what the
    * query asks for. Thinned-label count is published as observe
    * metric `intra_label_cap.thinned_labels`.
    *
    * The thin hash is the md5-residue helper ([[TextDsl.hp]]), NOT an
    * engine hash like xxhash64: the oracle mirrors the thin predicate
    * verbatim (`hpSql`), so engine and oracle agree even WHEN the cap
    * fires — the contract is scale-independent, not an artifact of
    * fixture labels sitting under the cap.
    * Input needs columns (vec_id, label, v, n2) — [[scaled]] shape. */
  private[graft] def intraLabelCosine(
      all: DataFrame, maxPerLabel: Long): DataFrame = {
    val sizes = all.groupBy(col("label")).agg(count(lit(1)).as("_ln"))
      .observe("intra_label_cap",
        sum(when(col("_ln") > maxPerLabel, 1L).otherwise(0L)).as("thinned_labels"))
    val base = all.join(broadcast(sizes), "label") // labels: low cardinality
      .filter(col("_ln") <= maxPerLabel ||
        X.hp(col("vec_id").cast("string")) %
          ceil(col("_ln").cast("double") / maxPerLabel).cast("long") === 0)
      .drop("_ln")
    val a = base.select(col("label"), col("vec_id").as("ida"),
      col("v").as("va"), col("n2").as("n2a"))
    val b = base.select(col("label").as("lb"), col("vec_id").as("idb"),
      col("v").as("vb"), col("n2").as("n2b"))
    a.join(b, col("label") === col("lb") && col("ida") < col("idb"))
      .withColumn("cos_e9", floor(X.cosineFromInts(
        X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")) * 1e9).cast("long"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("cos_e9")).cast("double")
          / count(lit(1)).cast("double")).as("avg_intra_cos_e9"))
  }

  private val scaledSqlCte =
    s"""sc AS (SELECT vec_id, label, ${X.scaledVecSql("embedding")} AS v FROM embeddings),
       scn AS (SELECT vec_id, label, v, ${X.norm2IntSql("v")} AS n2 FROM sc)"""

  /** Deterministic md5-derived IVF centroids + per-vector cell
    * assignment — the oracle-side mirror of the NearestCentroid kernel,
    * shared verbatim by q81 (serving), q84/q92 (semantic dedup), q87/
    * q91 (IVF-PQ) so the contracts can never drift on assignment
    * semantics. `nCells` parameterizes ONLY the centroid count (q92
    * runs the 64-cell table); all other text is byte-identical across
    * call sites. */
  private def ivfAssignSqlCtes(nCells: Int = 16): String = s"""
        cent AS (
          SELECT gc.c AS cell,
                 list_transform(range(0, 64), d ->
                   (CAST(${X.h60Sql("'ivf ' || CAST(gc.c AS VARCHAR) || ' ' || CAST(d AS VARCHAR)")}
                      % 4001 AS BIGINT) - 2000) / 10000.0) AS ctr
          FROM (SELECT unnest(range(0, $nCells)) AS c) gc),
        vecs AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fd,
                        ${X.scaledVecSql("embedding")} AS v
                 FROM embeddings),
        vn AS (SELECT vec_id, fd, v, ${X.norm2IntSql("v")} AS n2 FROM vecs),
        dist AS (SELECT vec_id, cell,
                   list_aggregate(list_transform(range(0, 64),
                     i -> (fd[i+1] - ctr[i+1]) * (fd[i+1] - ctr[i+1])), 'sum') AS d
                 FROM vn, cent),
        assigned AS (SELECT vec_id, cell FROM (
                       SELECT vec_id, cell,
                              row_number() OVER (PARTITION BY vec_id
                                ORDER BY d, cell) AS rn
                       FROM dist) WHERE rn = 1)"""

  /** `assigned` joined back to its scaled vectors — the pair-join input
    * shared verbatim by the q84, q89, q92 and q93 oracles so the full,
    * incremental and two-level dedup contracts read the same rows.
    * `asg` names the assignment CTE (q94 passes its partial-probe
    * `assigned2`); all other text is byte-identical across call
    * sites. */
  private def ivfAvSqlCte(asg: String = "assigned") =
    s"""av AS (SELECT a.vec_id, a.cell, n.v, n.n2
               FROM $asg a JOIN vn n ON n.vec_id = a.vec_id)"""

  /** Lloyd sweep count shared by the q94/q95 ENGINE calls (fitIters)
    * and their oracle CTE chains — one definition, so the two sides
    * cannot drift on iteration count. */
  private val twoLevelOracleIters = 10

  /** The integer-exact Lloyd coarse fit + partial-probe two-level
    * assignment, unrolled as oracle CTEs — the SQL mirror of
    * [[graft.functions.TwoLevelIndex.fitExact]] +
    * [[graft.functions.TwoLevelIndex.nearestCellTwoLevel]]. Mirrors
    * hold because every fit step is either exact int64 arithmetic
    * (centroid sums — ORDER-FREE, so SQL SUM reproduces them) or one
    * deterministic IEEE op (the sumInt/(cnt·1e4) mean division; the
    * ascending (x−m)² distance folds). Per-iteration CTEs are
    * MATERIALIZED: each `coarse_i` is referenced twice, so default
    * inlining would expand the chain exponentially. The probe join
    * restricts to supers WITH members (`JOIN (SELECT DISTINCT j FROM
    * asg_N)`), mirroring the kernel's memberless-super skip. Expects
    * [[ivfAssignSqlCtes]]'s `cent`/`vecs`/`dist` earlier in the WITH;
    * emits `assigned2 (vec_id, cell)`. */
  /** The fit prefix of [[twoLevelAssignSqlCtes]] — centroid table
    * quantized to int64 (`centi`), strided seeds (`coarse_0`), `iters`
    * unrolled Lloyd sweeps, and the final means (`mv_iters`) + cell →
    * super assignment (`asg_iters`). Shared by the dedup-assignment
    * mirror (q94/q95) and the serving-probe mirror (q98) so the fit
    * arithmetic is ONE piece of SQL text. */
  private def twoLevelFitSqlCtes(
      nCells: Int, dim: Int, nCoarse: Int, iters: Int): String = {
    def mv(i: Int) = s"""
        mv_$i AS MATERIALIZED (
          SELECT j, list_transform(sv, s -> CAST(s AS DOUBLE) / CAST(cnt * 10000 AS DOUBLE)) AS mv
          FROM coarse_$i)"""
    def asg(i: Int) = s"""
        asg_$i AS MATERIALIZED (
          SELECT cell, j FROM (
            SELECT c.cell, m.j,
                   row_number() OVER (PARTITION BY c.cell ORDER BY
                     list_aggregate(list_transform(range(0, $dim),
                       d -> (c.ctr[d+1] - m.mv[d+1]) * (c.ctr[d+1] - m.mv[d+1])), 'sum'),
                     m.j) AS rn
            FROM cent c, mv_$i m) WHERE rn = 1)"""
    val iterations = (0 until iters).map { i =>
      s"""${mv(i)},
        ${asg(i)},
        nsum_$i AS MATERIALIZED (
          SELECT a.j, list(s ORDER BY d) AS sv, MAX(nc) AS cnt FROM (
            SELECT a0.j, dm.d, CAST(SUM(ci.iv[dm.d+1]) AS BIGINT) AS s,
                   COUNT(*) AS nc
            FROM asg_$i a0 JOIN centi ci ON ci.cell = a0.cell,
                 (SELECT unnest(range(0, $dim)) AS d) dm
            GROUP BY a0.j, dm.d) a GROUP BY a.j),
        coarse_${i + 1} AS MATERIALIZED (
          SELECT p.j, COALESCE(n.sv, p.sv) AS sv, COALESCE(n.cnt, p.cnt) AS cnt
          FROM coarse_$i p LEFT JOIN nsum_$i n ON n.j = p.j)"""
    }.mkString(",\n")
    s"""
        centi AS MATERIALIZED (
          SELECT cell, list_transform(ctr, x -> CAST(round(x * 10000) AS BIGINT)) AS iv
          FROM cent),
        coarse_0 AS MATERIALIZED (
          SELECT sj.j AS j, ci.iv AS sv, CAST(1 AS BIGINT) AS cnt
          FROM (SELECT unnest(range(0, $nCoarse)) AS j) sj
          JOIN centi ci ON ci.cell = (sj.j * $nCells) // $nCoarse),
        $iterations,
        ${mv(iters)},
        ${asg(iters)}"""
  }

  /** The per-vector wProbe-super probe CTE — ONE definition of the
    * probe-selection mirror (coarse distance fold, memberless-super
    * skip via the DISTINCT-j join, (dist, j) tie rule) shared by the
    * assignment (q94/q95) and serving (q98/q101) chains, so the two
    * can never drift on probe semantics. `src` is the probed vector
    * source ("vecs", or a filtered subquery for the query-side). */
  private def vprobeSqlCte(
      dim: Int, iters: Int, wProbe: Int, src: String = "vecs"): String = s"""
        vprobe AS (
          SELECT vec_id, j FROM (
            SELECT v.vec_id, m.j,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                     list_aggregate(list_transform(range(0, $dim),
                       d -> (v.fd[d+1] - m.mv[d+1]) * (v.fd[d+1] - m.mv[d+1])), 'sum'),
                     m.j) AS pr
            FROM $src v, (SELECT m0.* FROM mv_$iters m0
                          JOIN (SELECT DISTINCT j FROM asg_$iters) nz USING (j)) m)
          WHERE pr <= $wProbe)"""

  private def twoLevelAssignSqlCtes(
      nCells: Int, dim: Int, nCoarse: Int, iters: Int, wProbe: Int): String = {
    // the ENGINE kernel clamps wProbe/nCoarse; this SQL text does not —
    // reject parameterizations where the two sides would silently
    // diverge rather than emit an unmirrorable oracle
    require(wProbe >= 1 && wProbe <= nCoarse && nCoarse <= nCells && iters >= 1,
      s"twoLevelAssignSqlCtes: need 1 <= wProbe ($wProbe) <= nCoarse " +
        s"($nCoarse) <= nCells ($nCells) and iters >= 1 ($iters) to mirror the kernel")
    s"""${twoLevelFitSqlCtes(nCells, dim, nCoarse, iters)},
        ${vprobeSqlCte(dim, iters, wProbe)},
        assigned2 AS (
          SELECT vec_id, cell FROM (
            SELECT p.vec_id, a.cell,
                   row_number() OVER (PARTITION BY p.vec_id ORDER BY dd.d, a.cell) AS rn
            FROM vprobe p JOIN asg_$iters a ON a.j = p.j
            JOIN dist dd ON dd.vec_id = p.vec_id AND dd.cell = a.cell) WHERE rn = 1)"""
  }

  /** The two-level PARTIAL-probe stage for the SERVING paths, as
    * oracle CTEs — the SQL mirror of
    * [[graft.functions.TwoLevelIndex.topCellsTwoLevel]]: each query
    * probes its `wProbe` nearest fitted supers ([[vprobeSqlCte]] — the
    * same text the assignment mirror uses) and keeps the `nProbe`
    * nearest member cells by (dist, cell). Expects
    * [[ivfAssignSqlCtes]] (`cent`/`vecs`/`dist`) and
    * [[twoLevelFitSqlCtes]] (`mv_iters`/`asg_iters`) earlier in the
    * WITH; emits `probes (qid, cell)` — the same CTE name the q81
    * serving tail consumes, so q98 differs from q81 ONLY in how
    * `probes` is produced. */
  private def twoLevelServeProbeSqlCtes(
      dim: Int, nCoarse: Int, iters: Int, wProbe: Int, nProbe: Int,
      queryPred: String): String = {
    // same silent-divergence guard as twoLevelAssignSqlCtes: the engine
    // kernel clamps wProbe and selectTopByDistance rejects nProbe < 1;
    // this text does neither, so refuse unmirrorable parameterizations
    require(wProbe >= 1 && wProbe <= nCoarse && nProbe >= 1 && iters >= 1,
      s"twoLevelServeProbeSqlCtes: need 1 <= wProbe ($wProbe) <= nCoarse " +
        s"($nCoarse), nProbe >= 1 ($nProbe) and iters >= 1 ($iters) to mirror the kernel")
    s"""${vprobeSqlCte(dim, iters, wProbe,
          src = s"(SELECT * FROM vecs WHERE $queryPred)")},
        probes AS (
          SELECT vec_id AS qid, cell FROM (
            SELECT p.vec_id, a.cell,
                   row_number() OVER (PARTITION BY p.vec_id ORDER BY dd.d, a.cell) AS rn
            FROM vprobe p JOIN asg_$iters a ON a.j = p.j
            JOIN dist dd ON dd.vec_id = p.vec_id AND dd.cell = a.cell) WHERE rn <= $nProbe)"""
  }

  /** The incremental (new-batch) dup flag + per-cell summary shared
    * VERBATIM by the q89, q93 and q95 oracles — same discipline as
    * [[semanticDedupSqlTail]]: the queries differ only in the cell
    * count fed to [[ivfAssignSqlCtes]] and (q95) the assignment CTE
    * name. `newPred` must be the SQL mirror of the `isNew` Column the
    * engine call passes (the current call sites all use the odd-id
    * daily-batch convention, the default) — a query with a different
    * batch predicate must parameterize BOTH sides together. The
    * predicate is a FUNCTION of the row alias (not text to rewrite),
    * so qualified or substring-colliding column names cannot corrupt
    * one of its two uses. */
  private def semanticDedupIncSqlTail(
      asg: String = "assigned",
      newPred: String => String = a => s"$a.vec_id % 2 = 1"): String = s"""
        dup AS (SELECT DISTINCT y.cell, y.vec_id AS idb
                FROM av x JOIN av y
                  ON x.cell = y.cell AND x.vec_id < y.vec_id
                WHERE ${newPred("y")}
                  AND ${X.cosineFromIntsSql(X.dotIntSql("x.v", "y.v"), "x.n2", "y.n2")} >= 0.4),
        nc AS (SELECT na.cell, COUNT(*) AS n_new FROM $asg na
               WHERE ${newPred("na")} GROUP BY na.cell),
        dc AS (SELECT cell, COUNT(*) AS n_new_dups FROM dup GROUP BY cell)
        SELECT CAST(nc.cell AS BIGINT) AS cell, nc.n_new,
               COALESCE(dc.n_new_dups, 0) AS n_new_dups,
               nc.n_new - COALESCE(dc.n_new_dups, 0) AS n_new_kept
        FROM nc LEFT JOIN dc ON dc.cell = nc.cell
        ORDER BY cell"""

  /** The exact-pairs dup flag + per-cell keep/drop summary shared
    * VERBATIM by the q84, q92 and q94 oracles — the queries differ
    * only in the cell count fed to [[ivfAssignSqlCtes]] and (q94) the
    * assignment CTE name, so the dedup semantics text cannot drift
    * between the flat, two-level and partial-probe variants. The
    * cosine threshold parameterizes alongside the engine calls'
    * `threshold` argument (q111 runs 0.9 over its all-positive pixel
    * embeddings; the embedding-fixture queries keep the 0.4 default) —
    * a query must pass BOTH sides together. */
  private def semanticDedupSqlTail(
      asg: String = "assigned", threshold: String = "0.4"): String = s"""
        dup AS (SELECT DISTINCT x.cell, y.vec_id AS idb
                FROM av x JOIN av y
                  ON x.cell = y.cell AND x.vec_id < y.vec_id
                WHERE ${X.cosineFromIntsSql(X.dotIntSql("x.v", "y.v"), "x.n2", "y.n2")} >= $threshold),
        pc AS (SELECT cell, COUNT(*) AS n_vecs FROM $asg GROUP BY cell),
        dc AS (SELECT cell, COUNT(*) AS n_dups FROM dup GROUP BY cell)
        SELECT CAST(pc.cell AS BIGINT) AS cell, pc.n_vecs,
               COALESCE(dc.n_dups, 0) AS n_dups,
               pc.n_vecs - COALESCE(dc.n_dups, 0) AS n_kept
        FROM pc LEFT JOIN dc ON dc.cell = pc.cell
        ORDER BY cell"""

  /** md5-derived deterministic PQ codebook distances + per-subspace
    * argmin — the oracle-side mirror of the PqEncode/PqLut kernels,
    * shared verbatim by q85 (codes), q86 (flat ADC serving) and q87
    * (IVF-PQ, via a name prefix so these CTEs can coexist with the
    * [[ivfAssignSqlCtes]] cell-assignment CTEs in one WITH). */
  private def pqSqlCtes(p: String = ""): String =
    s"""${p}vecs AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fd
                      FROM embeddings),
        ${p}grid AS (SELECT gm.m AS m, gc.c AS c
                 FROM (SELECT unnest(range(0, 8)) AS m) gm,
                      (SELECT unnest(range(0, 16)) AS c) gc),
        ${p}dist AS (SELECT vec_id, m, c,
                   list_aggregate(list_transform(
                     list_transform(range(0, 8), d ->
                       fd[m*8 + d + 1] -
                         (CAST(${X.h60Sql("'pq ' || CAST(m AS VARCHAR) || ' ' || CAST(c AS VARCHAR) || ' ' || CAST(d AS VARCHAR)")}
                            % 4001 AS BIGINT) - 2000) / 10000.0),
                     x -> x * x), 'sum') AS dst
                 FROM ${p}vecs, ${p}grid),
        ${p}best AS (SELECT vec_id, m, c, dst,
                        row_number() OVER (PARTITION BY vec_id, m
                          ORDER BY dst, c) AS rn
                 FROM ${p}dist)"""

  /** The distributed integer-exact Lloyd IVF BUILD, unrolled as oracle
    * CTEs — the SQL mirror of [[graft.operators.SimilarityJoin
    * .ivfBuildIndexExact]] (q96), the [[twoLevelFitSqlCtes]]
    * construction applied to the corpus itself: ×1e7 int64 vectors,
    * min-id-per-residue seeds, per-sweep (assignment by ascending IEEE
    * distance fold, ties to the lower cell) + order-free int64 centroid
    * sums (SQL SUM ≡ the engine's distributed partial agg), one
    * division per mean, emptied cells carrying their previous state.
    * CTE names carry a `b` prefix so the chain could coexist with the
    * serving/fit CTEs in one WITH. */
  private def ivfBuildExactSqlCtes(nCells: Int, dim: Int, iters: Int): String = {
    def sweep(i: Int) = s"""
        bmv_$i AS MATERIALIZED (
          SELECT cell, list_transform(sv, s -> CAST(s AS DOUBLE) / CAST(cnt * 10000000 AS DOUBLE)) AS mv
          FROM bcoarse_$i),
        basg_$i AS MATERIALIZED (
          SELECT vec_id, cell FROM (
            SELECT f.vec_id, m.cell,
                   row_number() OVER (PARTITION BY f.vec_id ORDER BY
                     list_aggregate(list_transform(range(0, $dim),
                       d -> (f.fd[d+1] - m.mv[d+1]) * (f.fd[d+1] - m.mv[d+1])), 'sum'),
                     m.cell) AS rn
            FROM bfd f, bmv_$i m) WHERE rn = 1)"""
    val iterations = (0 until iters).map { i =>
      s"""${sweep(i)},
        bnsum_$i AS MATERIALIZED (
          SELECT a.cell, list(s ORDER BY d) AS sv, MAX(nc) AS cnt FROM (
            SELECT a0.cell, dm.d, CAST(SUM(q.iv[dm.d+1]) AS BIGINT) AS s,
                   COUNT(*) AS nc
            FROM basg_$i a0 JOIN bqv q ON q.vec_id = a0.vec_id,
                 (SELECT unnest(range(0, $dim)) AS d) dm
            GROUP BY a0.cell, dm.d) a GROUP BY a.cell),
        bcoarse_${i + 1} AS MATERIALIZED (
          SELECT p.cell, COALESCE(n.sv, p.sv) AS sv, COALESCE(n.cnt, p.cnt) AS cnt
          FROM bcoarse_$i p LEFT JOIN bnsum_$i n ON n.cell = p.cell)"""
    }.mkString(",\n")
    s"""
        bqv AS (SELECT vec_id, ${X.scaledVecSql("embedding")} AS iv FROM embeddings),
        bfd AS (SELECT vec_id, list_transform(iv, x -> CAST(x AS DOUBLE) / 10000000.0) AS fd FROM bqv),
        bseed AS (SELECT vec_id % $nCells AS cell, MIN(vec_id) AS sid FROM bqv GROUP BY vec_id % $nCells),
        bcoarse_0 AS MATERIALIZED (
          SELECT s.cell, q.iv AS sv, CAST(1 AS BIGINT) AS cnt
          FROM bseed s JOIN bqv q ON q.vec_id = s.sid),
        $iterations,
        ${sweep(iters)},
        bmemb AS (SELECT cell, COUNT(*) AS n_members FROM basg_$iters GROUP BY cell)
        SELECT CAST(c.cell AS BIGINT) AS cell, CAST(dm.d AS BIGINT) AS d,
               CAST(c.sv[dm.d+1] AS BIGINT) AS sum_e7, c.cnt AS cnt,
               CAST(c.sv[dm.d+1] AS DOUBLE) / CAST(c.cnt * 10000000 AS DOUBLE) AS mean,
               COALESCE(m.n_members, 0) AS n_members
        FROM bcoarse_$iters c CROSS JOIN (SELECT unnest(range(0, $dim)) AS d) dm
        LEFT JOIN bmemb m ON m.cell = c.cell
        ORDER BY cell, d"""
  }

  /** The flat probe stage of the q81/q97 oracles: per query, the 4
    * nearest of ALL cells by (dist, cell) — mirror of
    * [[graft.functions.VectorIndex.topCells]]. */
  private val ivfFlatProbeSqlCte = s"""
        probes AS (SELECT vec_id AS qid, cell FROM (
                     SELECT vec_id, cell,
                            row_number() OVER (PARTITION BY vec_id
                              ORDER BY d, cell) AS pr
                     FROM dist WHERE vec_id < 50) WHERE pr <= 4)"""

  /** The IVF serving chain shared VERBATIM by the q81, q97 and q98
    * oracles: probed cells → candidates → exact integer-cosine scores
    * → per-query top-3, emitted as a CTE `ivfk (qid, rank, nid, cos)`
    * so the recall report (q166) can consume the ranked set without
    * re-stating the scoring text. The serving queries differ ONLY in
    * how the `probes` CTE is produced (flat scan / two-level full
    * probe / two-level partial probe). */
  private val ivfServeRankSqlCtes = s"""
        cand AS (SELECT p.qid, a.vec_id AS nid
                 FROM probes p JOIN assigned a ON a.cell = p.cell
                 WHERE a.vec_id != p.qid),
        scored AS (SELECT c.qid, c.nid,
                     ${X.cosineFromIntsSql(X.dotIntSql("q.v", "n.v"), "q.n2", "n.n2")} AS cos
                   FROM cand c JOIN vn q ON q.vec_id = c.qid
                               JOIN vn n ON n.vec_id = c.nid),
        ivfk AS (SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM (
          SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, nid) AS rank
          FROM scored) WHERE rank <= 3)"""

  /** [[ivfServeRankSqlCtes]] + the final ordered projection — the text
    * the q81/q97/q98/q105 oracles end with. */
  private val ivfServeSqlTail = s"""$ivfServeRankSqlCtes
        SELECT qid, rank, nid, cos FROM ivfk
        ORDER BY qid, rank"""

  /** Sign-bit LSH signature CTE (first 8 dims, axis-aligned signs) —
    * shared VERBATIM by the q51 oracle and the q166 recall report so
    * the two contracts cannot drift on bucketing. Expects `scn` from
    * [[scaledSqlCte]]. */
  private val lshSigSqlCte = s"""
        sig AS (SELECT vec_id, label, v, n2,
                  list_aggregate(list_transform(range(1, 9),
                    i -> CASE WHEN v[i] >= 0 THEN (CAST(1 AS BIGINT) << (i-1))
                              ELSE CAST(0 AS BIGINT) END), 'sum') AS sig
                FROM scn)"""

  /** Multi-table sign-LSH geometry (q187 + q166's mlsh report row).
    * 16 tables × 7 md5-derived hyperplanes each: the single-table
    * 8-bit path (q51) collapses the corpus into ≤256 buckets and q166
    * measured it at recall@3 = 66 bps; unioning candidates across 16
    * independent 7-bit tables lifts that to ~5100 bps (87% of the IVF
    * row) while each query still scans ~13% of the corpus — parameters
    * chosen from a measured sweep on the sf0.1 fixture (L=4/b=16 → 66,
    * L=16/b=8 → 3266, L=16/b=7 → 5133, L=16/b=6 → 6800 bps at 24%
    * scan). Miss probability decays as (1−p^b)^L — more tables buy
    * recall at linear candidate cost, never quadratic. */
  private val MlshTables = 16
  private val MlshBits = 7

  /** The multi-table LSH serving path, shared VERBATIM by q187 and
    * q166's mlsh row (one definition = the report audits the operator
    * it ships): ONE compiled signature pass per row
    * ([[graft.functions.SignLshSignatures]] — project 64 dims through
    * the md5("mlsh i j") sign matrix, pack 7 sign bits per table),
    * posexplode to (tbl, sig) bucket keys, candidates = bucket
    * cohabitants in ANY table (distinct), exact integer-cosine re-rank
    * via the bounded-heap top_k (map-side partial top-3 per query —
    * never a corpus-wide sort). 100 TB: the corpus replicates L× into
    * the bucket join (the standard multi-table cost) but candidates
    * stay ∝ Σ bucket²/2^b per table; everything is keyed equi-joins. */
  /** The mlsh sign matrix (md5("mlsh i j"), built once per JVM). */
  private lazy val MlshSigns = graft.functions.VectorFunctions.rpSignsTagged(
    "mlsh", 64, MlshTables * MlshBits)

  /** Per-row array of 16 int64 bucket signatures (compiled kernel). */
  private def mlshSigs(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.signLshSigs(v, MlshSigns, MlshBits)

  /** Explode a (id, v) frame into (id → `as`, tbl, sig) bucket keys. */
  private def mlshBuckets(df: DataFrame, as: String): DataFrame =
    df.select(col("vec_id").as(as), posexplode(mlshSigs(col("v"))))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "sig")

  /** Exact integer-cosine re-rank of a (qid, nid) candidate set
    * against a (vec_id, v, n2) vector table — top-3 per query via the
    * bounded-heap top_k; the tail shared by the in-query (q187/q166)
    * and catalog-served (q192) mlsh plans. */
  private def mlshRankTail(cand: DataFrame, vn: DataFrame): DataFrame =
    cand
      .join(vn.select(col("vec_id").as("qid"), col("v").as("va"),
        col("n2").as("n2a")), Seq("qid"))
      .join(vn.select(col("vec_id").as("nid"), col("v").as("vb"),
        col("n2").as("n2b")), Seq("nid"))
      .withColumn("cos", X.cosineFromInts(
        X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")))
      .groupBy(col("qid"))
      .agg(graft.functions.AggFunctions.topK(
        struct(col("cos").as("c"), (-col("nid")).as("nn"),
          col("nid").as("nid")), 3).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("col.nid").as("nid"), col("col.c").as("cos"))

  private def mlshTop3(base: DataFrame): DataFrame = {
    val q = mlshBuckets(base.filter(col("vec_id") < 50), "qid")
    val c = mlshBuckets(base, "nid")
    val cand = q.join(c, Seq("tbl", "sig")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    mlshRankTail(cand, base.select(col("vec_id"), col("v"), col("n2")))
  }

  /** (nid, tbl, sig) bucket rows of a scaled (vec_id, v, …) frame —
    * the q192 index construction, private[graft] so the streaming
    * ANN-index sink appends epochs through the SAME definition. */
  private[graft] def annIndexRows(scaledVecs: DataFrame): DataFrame =
    mlshBuckets(scaledVecs, "nid")

  /** Scale a raw (vec_id, embedding) frame into the (vec_id, v, n2)
    * shape every mlsh stage consumes — map-side, the scaledSqlCte
    * twin; private[graft] for the streaming sink. */
  private[graft] def annScaled(vectors: DataFrame): DataFrame =
    vectors.select(col("vec_id"), X.scaledVec(col("embedding")).as("v"))
      .withColumn("n2", X.norm2Int(col("v")))

  /** q192's served probe — queries (vec_id < 50) bucket map-side,
    * probe the index, exact-cosine top-3 against the vector store;
    * ONE definition shared by q192 and the streaming-sink spec so a
    * streamed index provably serves identically. */
  private[graft] def annServeTop3(vecs: DataFrame, idx: DataFrame): DataFrame = {
    val q = mlshBuckets(vecs.filter(col("vec_id") < 50), "qid")
    val cand = q.join(idx, Seq("tbl", "sig"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    mlshRankTail(cand, vecs)
  }


  /** The multi-table LSH oracle CTE chain (mgrid → mproj → msig →
    * mcand → mscored → mlshk) shared VERBATIM by the q187 oracle and
    * the q166 report — the sign matrix derives relationally from
    * md5("mlsh i j") (the q76 sign-grid discipline), the signature
    * packs sign bits per 7-dim group, candidates union across tables,
    * exact cosine top-3. Expects `scn` from [[scaledSqlCte]]. */
  private val mlshSqlCtes = s"""
        mgrid AS (SELECT gi.i AS i, gj.j AS j,
                         1 - 2*(${X.h60Sql("'mlsh ' || CAST(gi.i AS VARCHAR) || ' ' || CAST(gj.j AS VARCHAR)")} % 2) AS sgn
                  FROM (SELECT unnest(range(0, 64)) AS i) gi,
                       (SELECT unnest(range(0, ${MlshTables * MlshBits})) AS j) gj),
        mproj AS (SELECT vec_id, j, CAST(SUM(v[i+1] * sgn) AS BIGINT) AS p
                  FROM scn, mgrid GROUP BY vec_id, j),
        msig AS (SELECT vec_id, j // $MlshBits AS tbl,
                        CAST(SUM(CASE WHEN p >= 0
                          THEN (CAST(1 AS BIGINT) << (j % $MlshBits))
                          ELSE 0 END) AS BIGINT) AS sig
                 FROM mproj GROUP BY vec_id, j // $MlshBits),
        mcand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
                  FROM msig a JOIN msig b ON a.tbl = b.tbl AND a.sig = b.sig
                    AND a.vec_id != b.vec_id
                  WHERE a.vec_id < 50),
        mscored AS (SELECT c.qid, c.nid,
                      ${X.cosineFromIntsSql(X.dotIntSql("q.v", "n.v"), "q.n2", "n.n2")} AS cos
                    FROM mcand c JOIN scn q ON q.vec_id = c.qid
                                 JOIN scn n ON n.vec_id = c.nid),
        mlshk AS (SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM (
                    SELECT qid, nid, cos,
                           row_number() OVER (PARTITION BY qid
                             ORDER BY cos DESC, nid) AS rank
                    FROM mscored) WHERE rank <= 3)"""

  /** The q187 oracle text — shared VERBATIM by q192 (catalog-served):
    * the served plan is proven against the DEFINITION, the q169
    * discipline. (Declared AFTER mlshSqlCtes: object vals initialize
    * in declaration order.) */
  private val mlshOracleSql = s"""
        WITH $scaledSqlCte,
        $mlshSqlCtes
        SELECT qid, rank, nid, cos FROM mlshk ORDER BY qid, rank"""

  /** Multi-PROBE sign-LSH geometry (q194): 4 tables × 8 bits, each
    * query probing its exact bucket PLUS all 8 one-bit-flip neighbors
    * per table (Lv et al., "Multi-Probe LSH", VLDB 2007). Measured on
    * the sf0.1 fixture: 4600 bps recall@3 at 13.9% corpus scan — the
    * same recall/cost class as q187's 16 exact tables with a QUARTER
    * of the index (4n signature rows vs 16n): multi-probe trades
    * query-side probe fanout (9 keys/table, driver-free) for index
    * memory, which is what matters when the index replicates across a
    * 100 TB corpus. */
  private val MplshTables = 4
  private val MplshBits = 8

  private lazy val MplshSigns = graft.functions.VectorFunctions.rpSignsTagged(
    "mplsh", 64, MplshTables * MplshBits)

  /** (id → `as`, tbl, sig) exact bucket keys under the mplsh geometry. */
  private def mplshBuckets(df: DataFrame, as: String): DataFrame =
    df.select(col("vec_id").as(as), posexplode(
        graft.functions.VectorFunctions.signLshSigs(
          col("v"), MplshSigns, MplshBits)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "sig")

  /** Query-side probe keys: the exact bucket + its 8 one-bit flips. */
  private def mplshProbes(qsigs: DataFrame): DataFrame =
    qsigs.select(col("qid"), col("tbl"), explode(array(
      col("sig") +: (0 until MplshBits).map(j =>
        col("sig").bitwiseXOR(lit(1L << j))): _*)).as("sig"))

  /** The q194 oracle CTE chain — mplsh signatures (the q187 grid
    * discipline at the 4×8 geometry), probe expansion via a 9-row
    * flip range, bucket join, exact cosine top-3. Expects `scn`. */
  private val mplshSqlCtes = s"""
        pgrid AS (SELECT gi.i AS i, gj.j AS j,
                         1 - 2*(${X.h60Sql("'mplsh ' || CAST(gi.i AS VARCHAR) || ' ' || CAST(gj.j AS VARCHAR)")} % 2) AS sgn
                  FROM (SELECT unnest(range(0, 64)) AS i) gi,
                       (SELECT unnest(range(0, ${MplshTables * MplshBits})) AS j) gj),
        pproj AS (SELECT vec_id, j, CAST(SUM(v[i+1] * sgn) AS BIGINT) AS p
                  FROM scn, pgrid GROUP BY vec_id, j),
        psig AS (SELECT vec_id, j // $MplshBits AS tbl,
                        CAST(SUM(CASE WHEN p >= 0
                          THEN (CAST(1 AS BIGINT) << (j % $MplshBits))
                          ELSE 0 END) AS BIGINT) AS sig
                 FROM pproj GROUP BY vec_id, j // $MplshBits),
        pprobe AS (SELECT s.vec_id AS qid, s.tbl,
                          CASE WHEN f.k = 0 THEN s.sig
                               ELSE xor(s.sig, CAST(1 AS BIGINT) << (f.k - 1))
                          END AS sig
                   FROM psig s,
                        (SELECT unnest(range(0, ${MplshBits + 1})) AS k) f
                   WHERE s.vec_id < 50),
        pcand AS (SELECT DISTINCT p.qid, b.vec_id AS nid
                  FROM pprobe p JOIN psig b
                    ON b.tbl = p.tbl AND b.sig = p.sig
                   AND b.vec_id != p.qid),
        pscored AS (SELECT c.qid, c.nid,
                      ${X.cosineFromIntsSql(X.dotIntSql("q.v", "n.v"), "q.n2", "n.n2")} AS cos
                    FROM pcand c JOIN scn q ON q.vec_id = c.qid
                                 JOIN scn n ON n.vec_id = c.nid),
        plshk AS (SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM (
                    SELECT qid, nid, cos,
                           row_number() OVER (PARTITION BY qid
                             ORDER BY cos DESC, nid) AS rank
                    FROM pscored) WHERE rank <= 3)"""

  /** The candidates → ADC-score half of the IVF-PQ oracle chain —
    * everything downstream of the `probes` CTE, so the flat (q87/q91)
    * and two-level (q101) probe variants share the scoring text
    * verbatim. Expects `probes (qid, cell)`, [[ivfAssignSqlCtes]]
    * (for `assigned`) and `pqSqlCtes("pq_")` (for `pq_dist`/
    * `pq_best`) earlier in the WITH. */
  private val ivfPqAdcScoreSqlCtes = s"""
        lut AS (SELECT vec_id AS qid, m, c, CAST(floor(dst * 1e9) AS BIGINT) AS de9
                FROM pq_dist WHERE vec_id < 50),
        cand AS (SELECT p.qid, a.vec_id AS nid
                 FROM probes p JOIN assigned a ON a.cell = p.cell
                 WHERE a.vec_id != p.qid),
        adc AS (SELECT cd.qid, cd.nid, CAST(SUM(l.de9) AS BIGINT) AS dist_e9
                FROM cand cd
                JOIN pq_best b ON b.vec_id = cd.nid AND b.rn = 1
                JOIN lut l ON l.qid = cd.qid AND l.m = b.m AND l.c = b.c
                GROUP BY cd.qid, cd.nid)"""

  /** The probe → candidates → ADC-score CTE chain shared VERBATIM by
    * the q87 and q91 oracles (q91 = q87's ADC ranking + an exact
    * re-rank stage on top), so the two contracts can never drift on
    * probing or ADC arithmetic: the flat probe ([[ivfFlatProbeSqlCte]],
    * same text as q81's) feeding [[ivfPqAdcScoreSqlCtes]]. */
  private val ivfPqAdcSqlCtes = s"""$ivfFlatProbeSqlCte,
        $ivfPqAdcScoreSqlCtes"""

  /** The ADC-shortlist → exact-cosine re-rank tail shared VERBATIM by
    * the q91 and q101 oracles — the two queries differ only in how
    * `probes` is produced (flat vs two-level partial). Expects `adc`
    * and `vn` earlier in the WITH. */
  private val ivfPqRerankSqlTail = s"""
        sl AS (SELECT qid, nid FROM (
                 SELECT qid, nid,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY dist_e9, nid) AS srn
                 FROM adc) WHERE srn <= 10),
        scored AS (SELECT s.qid, s.nid,
                     ${X.cosineFromIntsSql(X.dotIntSql("q.v", "n.v"), "q.n2", "n.n2")} AS cos
                   FROM sl s JOIN vn q ON q.vec_id = s.qid
                             JOIN vn n ON n.vec_id = s.nid)
        SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM (
          SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, nid) AS rank
          FROM scored) WHERE rank <= 3
        ORDER BY qid, rank"""

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q50: brute-force cosine nearest neighbor for every vector.
    QueryDef(
      "q50_nn_brute",
      (s, dir) => {
        // argmax via max_by instead of a row_number window: the all-pairs
        // stream reduces map-side to one row per query vector (partial
        // aggregation), so the O(n²) pair set is never shuffled or sorted.
        // Tie-break on least nid = greatest -nid (struct compare is
        // lexicographic).
        val base = scaled(s, dir)
        val a = base.select(col("vec_id").as("qid"), col("v").as("va"), col("n2").as("n2a"))
        val b = base.select(col("vec_id").as("nid"), col("v").as("vb"), col("n2").as("n2b"))
        a.crossJoin(b).filter(col("qid") =!= col("nid"))
          .select(col("qid"), col("nid"), X.cosineFromInts(
            X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")).as("cos"))
          .groupBy(col("qid"))
          .agg(max_by(struct(col("nid"), col("cos")),
            struct(col("cos"), (-col("nid")).as("neg"))).as("best"))
          .select(col("qid"), col("best.nid").as("nn_id"), col("best.cos").as("nn_cos"))
          .orderBy(col("qid"))
      },
      Some(s"""
        WITH $scaledSqlCte,
        pairs AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                    ${X.cosineFromIntsSql(X.dotIntSql("a.v", "b.v"), "a.n2", "b.n2")} AS cos
                  FROM scn a JOIN scn b ON a.vec_id != b.vec_id)
        SELECT qid, nid AS nn_id, cos AS nn_cos
        FROM (SELECT qid, nid, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              FROM pairs)
        WHERE rn = 1 ORDER BY qid""")),

    // ------------------------------------------------------------------
    // q51: LSH-bucketed ANN — signature = sign bits of the first 8 dims
    // (16 fixed hyperplanes would be the general form; axis-aligned signs
    // keep the oracle exact). Candidates share a bucket; top-3 per query.
    QueryDef(
      "q51_ann_lsh",
      (s, dir) => {
        // sig as a plain sum of when() terms, not a lambda fold: the
        // HOF formulation hit a Spark attribute-binding bug under this
        // query's self-join + AQE shape at larger scale (v#N not found
        // at task bind time); expanded expressions survive it.
        val sigExpr = (1 to 8).map(i =>
          when(element_at(col("v"), i) >= 0, lit(1L << (i - 1)))
            .otherwise(lit(0L))).reduce(_ + _)
        val base = scaled(s, dir).withColumn("sig", sigExpr)
        val q = base.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("v").as("va"),
            col("n2").as("n2a"), col("sig"))
        val c = base.select(col("vec_id").as("nid"), col("v").as("vb"),
          col("n2").as("n2b"), col("sig"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        q.join(c, Seq("sig")).filter(col("qid") =!= col("nid"))
          .withColumn("cos", X.cosineFromInts(
            X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("rank"), col("nid"), col("cos"))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH $scaledSqlCte,
        $lshSigSqlCte,
        pairs AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                    ${X.cosineFromIntsSql(X.dotIntSql("a.v", "b.v"), "a.n2", "b.n2")} AS cos
                  FROM sig a JOIN sig b
                    ON a.sig = b.sig AND a.vec_id != b.vec_id
                  WHERE a.vec_id < 50)
        SELECT qid, rank, nid, cos FROM (
          SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
          FROM pairs)
        WHERE rank <= 3 ORDER BY qid, rank""")),

    // ------------------------------------------------------------------
    // q52: average pairwise intra-label cosine — embedding analytics.
    // Each pairwise cosine is a bit-identical double; flooring it to a
    // ×1e9-scaled int64 makes the SUM exact and order-independent, and
    // the final int64/count division is identical IEEE on both engines.
    // (A decimal-sum-then-cast would NOT work here: Spark and DuckDB
    // round wide-decimal→double differently in the last bit.)
    //
    // Scale bound: the pair join is quadratic in label size. Labels past
    // `maxPerLabel` members are deterministically hash-thinned to ~that
    // many first — the average over a uniform member sample estimates the
    // same statistic, and one 10⁷-member label stops costing 5×10¹³
    // pairs. The oracle CTE mirrors the thin predicate (md5-residue
    // hash, `hpSql` — the same text every sampled query shares), so the
    // contract holds whether or not the cap fires: at fixture scale the
    // `thin` CTE passes every row through (labels ≪ cap) and past the
    // cap both engines thin the IDENTICAL member subset.
    QueryDef(
      "q52_intra_label_cosine",
      (s, dir) =>
        intraLabelCosine(scaled(s, dir), maxPerLabel = 2000L)
          .orderBy(col("label")),
      Some(s"""
        WITH $scaledSqlCte,
        ls AS (SELECT label, COUNT(*) AS ln FROM scn GROUP BY label),
        thin AS (SELECT s.* FROM scn s JOIN ls USING (label)
                 WHERE ln <= 2000
                    OR ${X.hpSql("CAST(vec_id AS VARCHAR)")}
                         % CAST(ceil(CAST(ln AS DOUBLE) / 2000) AS BIGINT) = 0),
        pairs AS (SELECT a.label,
                    CAST(floor(${X.cosineFromIntsSql(X.dotIntSql("a.v", "b.v"), "a.n2", "b.n2")} * 1e9) AS BIGINT) AS cos_e9
                  FROM thin a JOIN thin b ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT label, COUNT(*) AS n_pairs,
               CAST(SUM(cos_e9) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_intra_cos_e9
        FROM pairs GROUP BY label ORDER BY label""")),

    // ------------------------------------------------------------------
    // q53: IVF ANN — KMeans cell index, probe 4 of 16 cells per query,
    // exact cosine re-rank, top-3 for the first 50 vectors. The KMeans
    // fit itself is not oracle-expressible, but its QUALITY is a
    // checkable contract (the q25/q58 pattern): brute-force top-3 over
    // the same embeddings is plain SQL, so the query emits per-query
    // structure (exactly k results each) plus an aggregate
    // recall-vs-brute boolean the oracle pins TRUE. Recall is aggregate,
    // not per-query: probing 4/16 cells of near-orthogonal vectors
    // leaves some individual queries at 0 hits while the fleet-wide
    // recall is stable (measured 0.57–0.63 across sf0.001/0.01/0.1;
    // deterministic for a given dataset — fixed seed, fit sample cap not
    // reached — so 0.5 holds with margin, and SimilarityIvfSpec pins the
    // serving-path exactness separately).
    QueryDef(
      "q53_ann_ivf",
      (s, dir) => {
        val k = 3
        val ivf = graft.operators.SimilarityJoin.ivfTopK(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50,
            nCells = 16, nProbe = 4, k = k)
          .select(col("qid"), col("nid"))
        val base = scaled(s, dir)
        val q = base.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("v").as("va"), col("n2").as("n2a"))
        val c = base.select(col("vec_id").as("nid"), col("v").as("vb"), col("n2").as("n2b"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        // 50 × n pairs — the brute side is bounded by the query count,
        // not the corpus squared, so the contract scales with the probe
        // set. Same integer-exact cosine + id tiebreak as q50.
        val brute = q.crossJoin(c).filter(col("qid") =!= col("nid"))
          .withColumn("cos", X.cosineFromInts(
            X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select(col("qid"), col("nid"), lit(true).as("in_brute"))
        val per = ivf.join(brute, Seq("qid", "nid"), "left")
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_ivf"),
            sum(when(col("in_brute"), 1L).otherwise(0L)).as("hits"))
        // fleet-wide recall folded via a broadcast 1-row aggregate, not
        // an unpartitioned window: same result, no "moving all data to a
        // single partition" WindowExec — and the pattern stays safe to
        // copy onto a corpus-sized frame
        val tot = per.agg(sum(col("hits")).as("tot_hits"),
          count(lit(1)).as("tot_q"))
        per.crossJoin(broadcast(tot))
          .select(col("qid"), col("n_ivf"),
            (col("tot_hits").cast("double")
              >= lit(0.5) * col("tot_q").cast("double") * lit(k))
              .as("recall_ge_half"))
          .orderBy(col("qid"))
      },
      Some("""
        SELECT vec_id AS qid, CAST(3 AS BIGINT) AS n_ivf,
               TRUE AS recall_ge_half
        FROM embeddings WHERE vec_id < 50 ORDER BY qid""")),

    // ------------------------------------------------------------------
    // q54: embedding quantization audit — int8-style compression via
    // power-of-two fixed-point: code = v >> 17 on the exact ×1e7 int64
    // representation (arithmetic shift floors identically on both
    // engines, unlike integer division, which truncates in Spark and
    // floors in DuckDB). Per-label reconstruction error is then exact
    // integer arithmetic end to end; only the final avg divides. The
    // whole pass is map-side + one partial-aggregable group-by — the
    // shape of an index-compression audit over 100 TB of vectors.
    QueryDef(
      "q54_embedding_quantize",
      (s, dir) => {
        // reconstruction error of code = v >> 17 is v - ((v>>17)<<17),
        // which in two's complement is exactly v & (2^17 - 1) — one AND,
        // identical on both engines (DuckDB refuses << on negatives)
        scaled(s, dir)
          .select(col("label"),
            expr("aggregate(transform(v, x -> x & 131071), 0L, (a, e) -> a + e)")
              .as("vec_err"),
            expr("array_max(transform(v, x -> x & 131071))").as("vec_max"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            max(col("vec_max")).as("max_err"),
            sum(col("vec_err")).as("total_err"))
          .select(col("label"), col("n_vecs"), col("max_err"), col("total_err"),
            (col("total_err").cast("double")
              / (col("n_vecs") * 64L).cast("double")).as("avg_err"))
          .orderBy(col("label"))
      },
      Some(s"""
        WITH $scaledSqlCte,
        per AS (SELECT label,
                  CAST(list_aggregate(list_transform(v, x -> x & 131071), 'sum') AS BIGINT) AS vec_err,
                  CAST(list_aggregate(list_transform(v, x -> x & 131071), 'max') AS BIGINT) AS vec_max
                FROM scn)
        SELECT label, COUNT(*) AS n_vecs,
               CAST(MAX(vec_max) AS BIGINT) AS max_err,
               CAST(SUM(vec_err) AS BIGINT) AS total_err,
               CAST(SUM(vec_err) AS DOUBLE) / CAST(COUNT(*) * 64 AS DOUBLE) AS avg_err
        FROM per GROUP BY label ORDER BY label""")),

    // ------------------------------------------------------------------
    // q76: deterministic ±1 random projection (JL sketch), 64 → 16 dims.
    // The sign matrix derives from md5("rp i j") so both engines build
    // the identical matrix and the projected int64 vectors compare
    // bit-for-bit — no tolerance needed, unlike RNG-seeded projections.
    // Engine side is one compiled kernel per row (map-side, zero
    // shuffle); the oracle expands the 64×16 grid relationally. Output:
    // the first 4 projected coords + the exact projected squared norm.
    QueryDef(
      "q76_random_projection",
      (s, dir) => {
        val signs = graft.functions.VectorFunctions.rpSigns(64, 16)
        scaled(s, dir)
          .withColumn("proj",
            graft.functions.VectorFunctions.signedProject(col("v"), signs))
          .select(col("vec_id"),
            element_at(col("proj"), 1).as("p0"),
            element_at(col("proj"), 2).as("p1"),
            element_at(col("proj"), 3).as("p2"),
            element_at(col("proj"), 4).as("p3"),
            X.dotInt(col("proj"), col("proj")).as("proj_n2"))
          .orderBy(col("vec_id"))
      },
      Some(s"""
        WITH sc AS (SELECT vec_id, ${X.scaledVecSql("embedding")} AS v FROM embeddings),
        grid AS (SELECT gi.i AS i, gj.j AS j,
                        1 - 2*(${X.h60Sql("'rp ' || CAST(gi.i AS VARCHAR) || ' ' || CAST(gj.j AS VARCHAR)")} % 2) AS sgn
                 FROM (SELECT unnest(range(0, 64)) AS i) gi,
                      (SELECT unnest(range(0, 16)) AS j) gj),
        pr AS (SELECT vec_id, j, CAST(SUM(v[i+1] * sgn) AS BIGINT) AS p
               FROM sc, grid GROUP BY vec_id, j)
        SELECT vec_id,
               CAST(SUM(CASE WHEN j = 0 THEN p ELSE 0 END) AS BIGINT) AS p0,
               CAST(SUM(CASE WHEN j = 1 THEN p ELSE 0 END) AS BIGINT) AS p1,
               CAST(SUM(CASE WHEN j = 2 THEN p ELSE 0 END) AS BIGINT) AS p2,
               CAST(SUM(CASE WHEN j = 3 THEN p ELSE 0 END) AS BIGINT) AS p3,
               CAST(SUM(p * p) AS BIGINT) AS proj_n2
        FROM pr GROUP BY vec_id ORDER BY vec_id""")),

    // ------------------------------------------------------------------
    // q81: the IVF SERVING path under a full oracle. q53 checks the
    // KMeans-built index via a recall contract (the fit isn't
    // oracle-expressible) — but serving (cell assignment → probe →
    // exact re-rank), the part that runs at 100 TB, is fully
    // expressible: this query serves from a DETERMINISTIC centroid table derived
    // from md5("ivf c d"), which both engines construct identically.
    // Distances are left-fold sums of identical IEEE (x-c)² terms (the
    // compiled NearestCentroid kernel and DuckDB's list_aggregate both
    // fold ascending), so cell assignment, probe ranking, and the exact
    // integer cosine re-rank all hash-match bit-for-bit.
    QueryDef(
      "q81_ann_ivf_served",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s)
        graft.operators.SimilarityJoin.ivfTopKServing(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50, cents, nProbe = 4, k = 3)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes()},
        $ivfFlatProbeSqlCte,
        $ivfServeSqlTail""")),

    // ------------------------------------------------------------------
    // q84: SemDeDup-style semantic dedup — cluster by nearest centroid
    // (the q81 deterministic centroid table, so the oracle can mirror
    // the assignment), then within each cell mark every vector with a
    // lower-id cosine-≥-τ neighbor as a semantic duplicate; report
    // per-cell keep/drop totals. Cells bound the pair expansion the way
    // LSH buckets do (cappedBuckets + observe metric); at 100 TB the
    // centroid count grows with the corpus so Σ cell² stays bounded.
    // Exact integer cosine throughout — both engines agree bit-for-bit.
    // Cap-vs-oracle contract (the q52 pattern): the SQL computes exact
    // all-pairs with NO cap, so the comparison relies on every cell
    // staying under maxCell=65536 — true by orders of magnitude at all
    // driver SFs (16 fixed cells × ≤2000 fixture vectors ⇒ ≤ a few
    // hundred per cell). Past the cap the engine deliberately reports
    // n_dups=0 for the degenerate cell (dropped, counted in the observe
    // metric) — a scale guard, not an estimate, and the divergence is
    // intentional.
    QueryDef(
      "q84_semantic_dedup",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s)
        graft.operators.SimilarityJoin.semanticDedup(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            cents, threshold = 0.4)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes()},
        ${ivfAvSqlCte()},
        ${semanticDedupSqlTail()}""")),

    // ------------------------------------------------------------------
    // q85: product-quantization codes (Jégou et al., TPAMI 2011) — the
    // compression half of an IVF-PQ index: 8 subspaces × 8 dims, each
    // assigned to its nearest of 16 md5-derived sub-centroids (the q81
    // determinism trick, so the oracle rebuilds the identical codebook),
    // packed into one int64 (32 bits vs 2048 for the raw floats — a 64×
    // index shrink) plus the e9-floored reconstruction error as the
    // codebook-quality audit. One compiled kernel per row, zero shuffle;
    // per-subspace distances fold ascending like list_aggregate, and
    // code/error cross-subspace sums are exact integers, so the whole
    // row is bit-comparable. A production build would fit the books with
    // sampled per-subspace KMeans (ivfBuildIndex) and catalog them.
    QueryDef(
      "q85_pq_codes",
      (s, dir) => {
        val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
        T.embeddings(s, dir)
          .select(col("vec_id"),
            graft.functions.VectorIndexFunctions.pqEncode(
              col("embedding").cast("array<double>"), books).as("ce"))
          .select(col("vec_id"),
            element_at(col("ce"), 1).as("pq_code"),
            element_at(col("ce"), 2).as("err_e9"))
          .orderBy(col("vec_id"))
      },
      Some(s"""
        WITH ${pqSqlCtes()}
        SELECT vec_id,
               CAST(SUM(CASE WHEN rn = 1 THEN (c << (4*m)) ELSE 0 END) AS BIGINT) AS pq_code,
               CAST(SUM(CASE WHEN rn = 1 THEN CAST(floor(dst * 1e9) AS BIGINT) ELSE 0 END) AS BIGINT) AS err_e9
        FROM best GROUP BY vec_id ORDER BY vec_id""")),

    // ------------------------------------------------------------------
    // q86: PQ-ADC top-k serving — search over the COMPRESSED codes,
    // completing the q85 story: each query builds its M×K e9-integer
    // lookup table once (compiled PqLut kernel, 1024 mults amortized
    // over the whole scan), then every candidate costs 8 integer array
    // reads + adds on its 32-bit code (PqAdc) — no float math per
    // candidate, the Jégou et al. ADC trick. Everything after the LUT
    // build is exact int64, so ranking and output hash-match the oracle
    // bit-for-bit. The scan is flat-PQ (all codes); composing with
    // q81's cell probe gives IVF-PQ — candidates there are the probed
    // cells' codes instead of the full table. At 100 TB the code table
    // is 64× smaller than the raw vectors (32 bits vs 2048) and the
    // query side broadcasts: the corpus never shuffles.
    QueryDef(
      "q86_pq_adc_topk",
      (s, dir) => {
        val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
        val fd = T.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("fd"))
        val codes = fd.select(col("vec_id").as("nid"),
          element_at(graft.functions.VectorIndexFunctions.pqEncode(
            col("fd"), books), 1).as("code"))
        val q = fd.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"),
            graft.functions.VectorIndexFunctions.pqLut(col("fd"), books).as("lut"))
        val w = Window.partitionBy(col("qid")).orderBy(col("dist_e9"), col("nid"))
        codes.join(broadcast(q), col("qid") =!= col("nid"))
          .withColumn("dist_e9", graft.functions.VectorIndexFunctions.pqAdc(
            col("lut"), col("code"), 8, 16))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("rank"), col("nid"), col("dist_e9"))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH ${pqSqlCtes()},
        lut AS (SELECT vec_id AS qid, m, c, CAST(floor(dst * 1e9) AS BIGINT) AS de9
                FROM dist WHERE vec_id < 50),
        adc AS (SELECT l.qid, b.vec_id AS nid, CAST(SUM(l.de9) AS BIGINT) AS dist_e9
                FROM best b JOIN lut l ON l.m = b.m AND l.c = b.c AND l.qid != b.vec_id
                WHERE b.rn = 1
                GROUP BY l.qid, b.vec_id)
        SELECT qid, CAST(rank AS BIGINT) AS rank, nid, dist_e9 FROM (
          SELECT qid, nid, dist_e9,
                 row_number() OVER (PARTITION BY qid ORDER BY dist_e9, nid) AS rank
          FROM adc) WHERE rank <= 3
        ORDER BY qid, rank""")),

    // ------------------------------------------------------------------
    // q89: INCREMENTAL semantic dedup — q84's contract for a daily
    // batch (odd vec_ids stand in for today's arrivals, as in q80): a
    // new vector is a dup iff some lower-id vector — old or new — in
    // its cell has cosine ≥ τ; old∕old pairs were resolved by the
    // previous run and never form. Only cells containing a new vector
    // participate, so the old corpus joins through those cells alone —
    // work ∝ Σ |new∩cell|·|cell|, the q80 shape at embedding level.
    // Cap contract like q84: cells past maxCell drop whole (observe
    // metric `semantic_dedup_inc_cell_cap`); inactive at every driver
    // SF, so the oracle compares the exact computation.
    QueryDef(
      "q89_semantic_dedup_incremental",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s)
        graft.operators.SimilarityJoin.semanticDedupIncremental(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            isNew = col("vec_id") % 2 === 1, cents, threshold = 0.4)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes()},
        ${ivfAvSqlCte()},
        ${semanticDedupIncSqlTail()}""")),

    // ------------------------------------------------------------------
    // q87: IVF-PQ serving end-to-end — the flagship compressed-index ANN
    // path at 100 TB: probe the 4 nearest of 16 cells per query (q81's
    // deterministic centroid table), then ADC-score ONLY the probed
    // cells' candidates from their 32-bit PQ codes (q85's deterministic
    // codebook + q86's integer LUT trick). The corpus participates as
    // (cell, code) pairs — 64× smaller than the raw floats, prunable by
    // cell — and everything after the two map-side kernel passes is
    // exact int64, so the full pipeline (assign → probe → ADC rank)
    // hash-matches the oracle bit-for-bit. Both index tables are
    // catalog-persistable index-as-data.
    QueryDef(
      "q87_ivf_pq_topk",
      (s, dir) => {
        val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s)
        graft.operators.SimilarityJoin.ivfPqTopK(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50, cents, books, nProbe = 4, k = 3)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes()},
        ${pqSqlCtes("pq_")},
        $ivfPqAdcSqlCtes
        SELECT qid, CAST(rank AS BIGINT) AS rank, nid, dist_e9 FROM (
          SELECT qid, nid, dist_e9,
                 row_number() OVER (PARTITION BY qid ORDER BY dist_e9, nid) AS rank
          FROM adc) WHERE rank <= 3
        ORDER BY qid, rank""")),

    // ------------------------------------------------------------------
    // q91: IVF-PQ + EXACT RE-RANK — the production serving composition
    // (Jégou et al. §V): q87's compressed ADC pass ranks the probed
    // cells' candidates down to a k′=10 shortlist per query, then ONLY
    // those 10 survivors pay the exact integer-cosine re-rank (q81's
    // arithmetic) and the top-3 ship. The corpus is scanned as 32-bit
    // codes; exact float-width vectors join back BY ID for 10 rows per
    // query — cost ≈ q87 + a k′-bounded exact stage, independent of
    // corpus size. Every stage is deterministic (md5 centroids +
    // codebooks, e9-integer ADC, exact-int cosine), so the composed
    // pipeline hash-matches the oracle bit-for-bit.
    QueryDef(
      "q91_ivf_pq_rerank",
      (s, dir) => {
        val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s)
        graft.operators.SimilarityJoin.ivfPqRerankTopK(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50, cents, books,
            nProbe = 4, shortlist = 10, k = 3)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes()},
        ${pqSqlCtes("pq_")},
        $ivfPqAdcSqlCtes,
        $ivfPqRerankSqlTail""")),

    // ------------------------------------------------------------------
    // q92: semantic dedup through the TWO-LEVEL assignment kernel at 64
    // cells — the high-cell-count form of q84 (at 10⁵ cells the flat
    // argmin scan costs 6.4M FLOPs/vector; the coarse quantizer makes
    // it ~2√nCells·dim — SCALE.md). Run at wProbe = nCoarse = 8, the
    // oracle-checkable end of the probe dial: full probing is proven
    // bit-identical to the flat scan (ties included, SemanticPqSpec),
    // so the whole two-level path — driver-side coarse Lloyd fit,
    // super-cell probe selection, member scan, codegen plumbing — is
    // hash-checked against q84's exact oracle on the 64-cell table.
    // Partial probing (the FLOP win at 10⁵ cells) keeps this plan and
    // schema; only boundary-cell assignments can shift, a trade the
    // kernel doc states and the spec pins on separated clusters.
    QueryDef(
      "q92_semantic_dedup_two_level",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        graft.operators.SimilarityJoin.semanticDedupTwoLevel(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            cents, threshold = 0.4, nCoarse = 8, wProbe = 8)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        ${ivfAvSqlCte()},
        ${semanticDedupSqlTail()}""")),

    // ------------------------------------------------------------------
    // q110: q92's dedup with the coarse structure fitted DISTRIBUTEDLY
    // and injected through `prefit` — the DEDUP-side twin of q105's
    // serving-path check, under q92's oracle text VERBATIM. Valid
    // because at wProbe = nCoarse the two-level assignment equals the
    // flat scan for ANY partition of the cells (the q97 invariant), so
    // the full-probe oracle is fit-agnostic: the hash check proves the
    // distributed fit + prefit plumbing is invisible to dedup results,
    // closing the one prefit consumer (semanticDedupTwoLevel) that had
    // only spec coverage. 3 sweeps, as q105 (each sweep is a whole
    // Spark job at fixture scale).
    QueryDef(
      "q110_semantic_dedup_dist_fit",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        val structure = graft.operators.SimilarityJoin
          .twoLevelFitExactDistributed(cents, nCoarse = 8, iters = 3)
        graft.operators.SimilarityJoin.semanticDedupTwoLevel(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            cents, threshold = 0.4, nCoarse = 8, wProbe = 8,
            prefit = Some(structure))
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        ${ivfAvSqlCte()},
        ${semanticDedupSqlTail()}""")),

    // ------------------------------------------------------------------
    // q111: MULTIMODAL IN, DEDUP VERDICTS OUT — semantic dedup over
    // embeddings derived from ACTUAL PIXEL BYTES end to end, closing the
    // round-9 verdict's top item (retire the featurizer stand-in's
    // deterministic half). Each document's P6 container splits into 4
    // vertical patches (q72's crop kernel, inlined — no explode), each
    // patch pools to its per-channel integer means (q106's channel-stats
    // kernel), and the 12-dim integer feature vector JL-projects to 16
    // dims through the md5-derived ±1 sign matrix (q76's SignedProject)
    // — a classic random-pooled pixel embedding, every stage a compiled
    // map-side kernel over real decoded samples. The embeddings then
    // feed the UNCHANGED semantic-dedup path (q84's operator) on an
    // 8-cell/16-dim md5 centroid table. The oracle re-derives every
    // patch's channel sums from the container hex (q109's construction),
    // mirrors the projection grid relationally (q76's construction), and
    // reuses the dedup tail TEXT shared with q84/q92/q110 — one wrong
    // pixel byte, sign bit, or scaled coordinate anywhere in the
    // composition hash-fails. After this the multimodal stand-in surface
    // is exactly "call a learned model here" (Multimodal.scala:
    // decodeStubFeatures).
    QueryDef(
      "q111_pixel_semantic_dedup",
      (s, dir) => {
        // ≥ 12 payload bytes ⇒ w ≥ 4 pixels ⇒ all 4 patches non-empty
        val docs = T.documents(s, dir).filter(octet_length(col("text")) >= 12)
        val emb = graft.ext.Multimodal.pixelEmbedding(
          graft.ext.Multimodal.ppmWrap(docs), nFrames = 4, outDims = 16)
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(
          s, nCells = 8, dim = 16)
        graft.operators.SimilarityJoin.semanticDedup(
            emb, col("media_id"), col("emb"), cents, threshold = 0.9)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH src AS (SELECT doc_id AS media_id,
                            octet_length(encode(text)) // 3 AS w,
                            hex(encode(text)) AS hx
                     FROM documents WHERE octet_length(encode(text)) >= 12),
        fr AS (SELECT media_id, CAST(i AS BIGINT) AS f,
                      w * i // 4 AS fa, w * (i + 1) // 4 AS fb
               FROM src CROSS JOIN (SELECT unnest(range(0, 4)) AS i)),
        -- byte i of the SOURCE pixel run for i in [3·fa, 3·fb);
        -- channel = i mod 3 because 3·fa ≡ 0 (mod 3) (q109's invariant)
        pb AS (SELECT media_id, f, fb - fa AS n_px,
                      CAST(unnest(range(3 * fa, 3 * fb)) AS BIGINT) AS i
               FROM fr),
        pv AS (SELECT media_id, f, n_px, CAST(i % 3 AS INT) AS ch,
                      (strpos('0123456789ABCDEF',
                         substring(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
                      + strpos('0123456789ABCDEF',
                         substring(hx, CAST(2 * i + 2 AS INT), 1)) - 1 AS val
               FROM pb JOIN src USING (media_id)),
        st AS (SELECT media_id, f, ch, MAX(n_px) AS n_px, SUM(val) AS s
               FROM pv GROUP BY media_id, f, ch),
        -- feature k = 3·f + ch: patch channel mean ×100, floored
        feat0 AS (SELECT media_id, CAST(f * 3 + ch AS BIGINT) AS k,
                         CAST(s * 100 // n_px AS BIGINT) AS x
                  FROM st),
        -- per-item integer mean over non-negative features (floor ≡
        -- truncate here, so // mirrors Spark's div); centering removes
        -- the shared brightness direction so the cloud spreads on
        -- contrast
        fmean AS (SELECT media_id, CAST(SUM(x) // 12 AS BIGINT) AS mu
                  FROM feat0 GROUP BY media_id),
        feat AS (SELECT media_id, k, x - mu AS x
                 FROM feat0 JOIN fmean USING (media_id)),
        grid AS (SELECT gi.i AS i, gj.j AS j,
                        1 - 2*(${X.h60Sql("'rp ' || CAST(gi.i AS VARCHAR) || ' ' || CAST(gj.j AS VARCHAR)")} % 2) AS sgn
                 FROM (SELECT unnest(range(0, 12)) AS i) gi,
                      (SELECT unnest(range(0, 16)) AS j) gj),
        proj AS (SELECT media_id, j, CAST(SUM(x * sgn) AS BIGINT) AS p
                 FROM feat JOIN grid ON grid.i = feat.k
                 GROUP BY media_id, j),
        embl AS (SELECT media_id AS vec_id, list(p ORDER BY j) AS pl
                 FROM proj GROUP BY media_id),
        cent AS (
          SELECT gc.c AS cell,
                 list_transform(range(0, 16), d ->
                   (CAST(${X.h60Sql("'ivf ' || CAST(gc.c AS VARCHAR) || ' ' || CAST(d AS VARCHAR)")}
                      % 4001 AS BIGINT) - 2000) / 10000.0) AS ctr
          FROM (SELECT unnest(range(0, 8)) AS c) gc),
        vecs AS (SELECT vec_id,
                        list_transform(pl, p -> CAST(p AS DOUBLE) / 10000.0) AS fd,
                        ${X.scaledVecSql(
                          "list_transform(pl, p -> CAST(p AS DOUBLE) / 10000.0)")} AS v
                 FROM embl),
        vn AS (SELECT vec_id, fd, v, ${X.norm2IntSql("v")} AS n2 FROM vecs),
        dist AS (SELECT vec_id, cell,
                   list_aggregate(list_transform(range(0, 16),
                     i -> (fd[i+1] - ctr[i+1]) * (fd[i+1] - ctr[i+1])), 'sum') AS d
                 FROM vn, cent),
        assigned AS (SELECT vec_id, cell FROM (
                       SELECT vec_id, cell,
                              row_number() OVER (PARTITION BY vec_id
                                ORDER BY d, cell) AS rn
                       FROM dist) WHERE rn = 1),
        ${ivfAvSqlCte()},
        ${semanticDedupSqlTail(threshold = "0.9")}""")),

    // ------------------------------------------------------------------
    // q116: the AUDIO twin of q111 — semantic dedup over embeddings
    // derived from ACTUAL PCM SAMPLES end to end, proving the
    // multimodal→embedding→dedup seam is format-generic: q111's
    // patch/pool/center/JL-project pipeline transliterated from pixel
    // space (P6 crop + channel stats) to sample space (q116's
    // wav_crop_frames + wav_channel_stats over the q114 codec), feeding
    // the SAME dedup operator under the SAME shared oracle tail. Window
    // means shift to non-negative before the integer division (sample
    // sums can be negative; truncate-vs-floor would split the engines)
    // and the constant vanishes under per-item centering. One wrong
    // decoded sample, window boundary, or sign bit hash-fails.
    QueryDef(
      "q116_audio_semantic_dedup",
      (s, dir) => {
        // ≥ 32 payload bytes ⇒ ≥ 8 stereo frames ⇒ all 8 windows non-empty
        val docs = T.documents(s, dir).filter(octet_length(col("text")) >= 32)
        val media = docs.select(col("doc_id").as("media_id"),
          graft.functions.WavCodecFunctions.wavWrap(
            col("text").cast("binary"), lit(8000)).as("content"))
        val emb = graft.ext.Multimodal.audioEmbedding(
          media, nWindows = 8, outDims = 16)
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(
          s, nCells = 8, dim = 16)
        graft.operators.SimilarityJoin.semanticDedup(
            emb, col("media_id"), col("emb"), cents, threshold = 0.9)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH src AS (SELECT doc_id AS media_id,
                            octet_length(encode(text)) // 4 AS n,
                            hex(encode(text)) AS hx
                     FROM documents WHERE octet_length(encode(text)) >= 32),
        win AS (SELECT media_id, CAST(i AS BIGINT) AS w,
                       n * i // 8 AS wa, n * (i + 1) // 8 AS wb
                FROM src CROSS JOIN (SELECT unnest(range(0, 8)) AS i)),
        -- sample i (frame i//2, channel i%2) sits at text bytes [2i, 2i+2):
        -- int16 LE, low byte first, two's-complement fold (q114's
        -- construction); window w covers samples [2*wa, 2*wb)
        sm AS (SELECT media_id, w, wb - wa AS n_px,
                      CAST(i % 2 AS INT) AS ch,
                      (strpos('0123456789ABCDEF',
                         substring(hx, CAST(4 * i + 1 AS INT), 1)) - 1) * 16
                      + strpos('0123456789ABCDEF',
                         substring(hx, CAST(4 * i + 2 AS INT), 1)) - 1
                      + 256 * ((strpos('0123456789ABCDEF',
                                  substring(hx, CAST(4 * i + 3 AS INT), 1)) - 1) * 16
                               + strpos('0123456789ABCDEF',
                                  substring(hx, CAST(4 * i + 4 AS INT), 1)) - 1) AS uv
               FROM (SELECT media_id, w, wa, wb,
                            CAST(unnest(range(2 * wa, 2 * wb)) AS BIGINT) AS i
                     FROM win) q JOIN src USING (media_id)),
        st AS (SELECT media_id, w, ch, MAX(n_px) AS n_px,
                      SUM(CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END) AS s
               FROM sm GROUP BY media_id, w, ch),
        -- feature k = 2·w + ch: window channel mean SHIFTED to [0, 65535]
        -- (numerator non-negative, so // mirrors Spark's div)
        feat0 AS (SELECT media_id, CAST(w * 2 + ch AS BIGINT) AS k,
                         CAST((s + 32768 * n_px) // n_px AS BIGINT) AS x
                  FROM st),
        fmean AS (SELECT media_id, CAST(SUM(x) // 16 AS BIGINT) AS mu
                  FROM feat0 GROUP BY media_id),
        feat AS (SELECT media_id, k, x - mu AS x
                 FROM feat0 JOIN fmean USING (media_id)),
        grid AS (SELECT gi.i AS i, gj.j AS j,
                        1 - 2*(${X.h60Sql("'rp ' || CAST(gi.i AS VARCHAR) || ' ' || CAST(gj.j AS VARCHAR)")} % 2) AS sgn
                 FROM (SELECT unnest(range(0, 16)) AS i) gi,
                      (SELECT unnest(range(0, 16)) AS j) gj),
        proj AS (SELECT media_id, j, CAST(SUM(x * sgn) AS BIGINT) AS p
                 FROM feat JOIN grid ON grid.i = feat.k
                 GROUP BY media_id, j),
        embl AS (SELECT media_id AS vec_id, list(p ORDER BY j) AS pl
                 FROM proj GROUP BY media_id),
        cent AS (
          SELECT gc.c AS cell,
                 list_transform(range(0, 16), d ->
                   (CAST(${X.h60Sql("'ivf ' || CAST(gc.c AS VARCHAR) || ' ' || CAST(d AS VARCHAR)")}
                      % 4001 AS BIGINT) - 2000) / 10000.0) AS ctr
          FROM (SELECT unnest(range(0, 8)) AS c) gc),
        vecs AS (SELECT vec_id,
                        list_transform(pl, p -> CAST(p AS DOUBLE) / 1000000.0) AS fd,
                        ${X.scaledVecSql(
                          "list_transform(pl, p -> CAST(p AS DOUBLE) / 1000000.0)")} AS v
                 FROM embl),
        vn AS (SELECT vec_id, fd, v, ${X.norm2IntSql("v")} AS n2 FROM vecs),
        dist AS (SELECT vec_id, cell,
                   list_aggregate(list_transform(range(0, 16),
                     i -> (fd[i+1] - ctr[i+1]) * (fd[i+1] - ctr[i+1])), 'sum') AS d
                 FROM vn, cent),
        assigned AS (SELECT vec_id, cell FROM (
                       SELECT vec_id, cell,
                              row_number() OVER (PARTITION BY vec_id
                                ORDER BY d, cell) AS rn
                       FROM dist) WHERE rn = 1),
        ${ivfAvSqlCte()},
        ${semanticDedupSqlTail(threshold = "0.9")}""")),

    // ------------------------------------------------------------------
    // q134: CONV FEATURIZER, one level deeper than q111's patch means —
    // semantic dedup over embeddings from a genuine 3×3 convolution
    // stack: resize every P6 payload to a fixed 16×8 grid (the REAL
    // resample kernel), 4 md5-derived ±2 integer 3×3×3 kernels in valid
    // mode + 2×2 stride-2 max pooling over the decoded samples
    // (PpmCodec.convPool3x3 — true 2D, vertical-structure-sensitive;
    // MultimodalSpec pins a multi-row container against a scalar
    // reference), 84 pooled features shifted non-negative, centered,
    // JL-projected 84→16, feeding the UNCHANGED dedup tail. The oracle
    // derives the conv WEIGHTS relationally from the same md5 grid (the
    // q76 discipline at 5 values), re-derives every resized sample from
    // the container hex, and exploits one construction invariant: the
    // wrap's sources are all h = 1, so resize replicates rows and the
    // 2D conv collapses to column-summed weights — valid for ANY input
    // of this pipeline, not just the fixture. One wrong pixel byte,
    // weight, pool bound, or projection sign anywhere hash-fails.
    QueryDef(
      "q134_conv_semantic_dedup",
      (s, dir) => {
        val docs = T.documents(s, dir).filter(octet_length(col("text")) >= 3)
        val emb = graft.ext.Multimodal.convEmbedding(
          graft.ext.Multimodal.ppmWrap(docs), k = 4, outDims = 16)
        // centroids ÷100 (±0.002): the conv embedding's envelope-safe
        // rescale puts typical norms ~0.1 (see convEmbedding doc) — at
        // the stock ±0.2 centroid scale the ||c||² spread would dominate
        // −2v·c and every item would take the smallest-norm cell; at
        // ÷100 the assignment is direction-driven. Cosine dedup within
        // cells is scale-invariant either way.
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(
            s, nCells = 8, dim = 16)
          .withColumn("centroid",
            transform(col("centroid"), x => x / lit(100.0)))
        graft.operators.SimilarityJoin.semanticDedup(
            emb, col("media_id"), col("emb"), cents, threshold = 0.9)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH src AS (SELECT doc_id AS media_id,
                            octet_length(encode(text)) // 3 AS w,
                            hex(encode(text)) AS hx
                     FROM documents WHERE octet_length(encode(text)) >= 3),
        -- resized sample (x, ·, c) of the 16×8 grid: nearest-neighbor
        -- from an h = 1 source ⇒ every output row copies row 0, so one
        -- (x, c) plane stands for all 8 rows; v = pixel-run byte
        -- 3·(x·w//16) + c, decoded from hex
        rp AS (SELECT media_id, gx.x, gc.c,
                      (strpos('0123456789ABCDEF',
                         substring(hx, CAST(2*(3*(gx.x*w//16)+gc.c)+1 AS INT), 1)) - 1) * 16
                      + strpos('0123456789ABCDEF',
                         substring(hx, CAST(2*(3*(gx.x*w//16)+gc.c)+2 AS INT), 1)) - 1 AS val
               FROM src, (SELECT unnest(range(0, 16)) AS x) gx,
                    (SELECT unnest(range(0, 3)) AS c) gc),
        -- md5-derived conv weights, relationally (the q76 grid at 5
        -- values): raw w = h60('conv k dy dx c') % 5 − 2, made ZERO-SUM
        -- per kernel by W = 27·w − Σw (integer-exact; see convWeights —
        -- nonzero kernel mass responds to shared brightness and
        -- collapses every item into one cell)
        wr AS (SELECT gk.kk, gdy.dy, gdx.dx, gc2.c,
                      CAST(${X.h60Sql("'conv ' || CAST(gk.kk AS VARCHAR) || ' ' || CAST(gdy.dy AS VARCHAR) || ' ' || CAST(gdx.dx AS VARCHAR) || ' ' || CAST(gc2.c AS VARCHAR)")} % 5 AS BIGINT) - 2 AS wv
               FROM (SELECT unnest(range(0, 4)) AS kk) gk,
                    (SELECT unnest(range(0, 3)) AS dy) gdy,
                    (SELECT unnest(range(0, 3)) AS dx) gdx,
                    (SELECT unnest(range(0, 3)) AS c) gc2),
        ws AS (SELECT kk, CAST(SUM(wv) AS BIGINT) AS s FROM wr GROUP BY kk),
        wt AS (SELECT kk, dy, dx, c, 27 * wv - s AS wv
               FROM wr JOIN ws USING (kk)),
        -- identical rows ⇒ Σ_dy W[k][dy][dx][c] acts once per column
        cw AS (SELECT kk, dx, c, CAST(SUM(wv) AS BIGINT) AS cw
               FROM wt GROUP BY 1, 2, 3),
        -- valid conv positions ox ∈ [0, 14): conv(k, ox) = Σ_{dx,c}
        -- cw · v(ox+dx, c); oy-independent by the row identity
        conv AS (SELECT rp.media_id, cw.kk, go.ox,
                        CAST(SUM(cw.cw * rp.val) AS BIGINT) AS cv
                 FROM (SELECT unnest(range(0, 14)) AS ox) go
                 JOIN cw ON TRUE
                 JOIN rp ON rp.x = go.ox + cw.dx AND rp.c = cw.c
                 GROUP BY 1, 2, 3),
        -- 2×2 stride-2 max pool: px pairs (2px, 2px+1); pooled rows are
        -- again identical, materialized as py ∈ {0,1,2}
        pool AS (SELECT media_id, kk, ox // 2 AS px, MAX(cv) AS pv
                 FROM conv GROUP BY 1, 2, 3),
        -- flatten ((k·3)+py)·7+px (the kernel's index order), shift
        -- +743580 = Σ|W|·255 bound so the centering division sees only
        -- non-negative operands (// ≡ div); centering erases the shift
        feat0 AS (SELECT media_id,
                         CAST((kk * 3 + gpy.py) * 7 + px AS BIGINT) AS k,
                         pv + 743580 AS x
                  FROM pool, (SELECT unnest(range(0, 3)) AS py) gpy),
        fmean AS (SELECT media_id, CAST(SUM(x) // 84 AS BIGINT) AS mu
                  FROM feat0 GROUP BY media_id),
        feat AS (SELECT media_id, k, x - mu AS x
                 FROM feat0 JOIN fmean USING (media_id)),
        grid AS (SELECT gi.i AS i, gj.j AS j,
                        1 - 2*(${X.h60Sql("'rp ' || CAST(gi.i AS VARCHAR) || ' ' || CAST(gj.j AS VARCHAR)")} % 2) AS sgn
                 FROM (SELECT unnest(range(0, 84)) AS i) gi,
                      (SELECT unnest(range(0, 16)) AS j) gj),
        proj AS (SELECT media_id, j, CAST(SUM(x * sgn) AS BIGINT) AS p
                 FROM feat JOIN grid ON grid.i = feat.k
                 GROUP BY media_id, j),
        embl AS (SELECT media_id AS vec_id, list(p ORDER BY j) AS pl
                 FROM proj GROUP BY media_id),
        -- ÷100-scaled centroids (±0.002) — see the engine-side comment
        cent AS (
          SELECT gc3.c AS cell,
                 list_transform(range(0, 16), d ->
                   (CAST(${X.h60Sql("'ivf ' || CAST(gc3.c AS VARCHAR) || ' ' || CAST(d AS VARCHAR)")}
                      % 4001 AS BIGINT) - 2000) / 10000.0 / 100.0) AS ctr
          FROM (SELECT unnest(range(0, 8)) AS c) gc3),
        vecs AS (SELECT vec_id,
                        list_transform(pl, p -> CAST(p AS DOUBLE) / 2000000.0) AS fd,
                        ${X.scaledVecSql(
                          "list_transform(pl, p -> CAST(p AS DOUBLE) / 2000000.0)")} AS v
                 FROM embl),
        vn AS (SELECT vec_id, fd, v, ${X.norm2IntSql("v")} AS n2 FROM vecs),
        dist AS (SELECT vec_id, cell,
                   list_aggregate(list_transform(range(0, 16),
                     i -> (fd[i+1] - ctr[i+1]) * (fd[i+1] - ctr[i+1])), 'sum') AS d
                 FROM vn, cent),
        assigned AS (SELECT vec_id, cell FROM (
                       SELECT vec_id, cell,
                              row_number() OVER (PARTITION BY vec_id
                                ORDER BY d, cell) AS rn
                       FROM dist) WHERE rn = 1),
        ${ivfAvSqlCte()},
        ${semanticDedupSqlTail(threshold = "0.9")}""")),

    // ------------------------------------------------------------------
    // q115: INDEX APPEND WITHOUT REFIT — the daily maintenance path of
    // a serving index: the "fit-time" corpus (even vec_ids) is assigned
    // and persisted; the new batch (odd vec_ids) assigns through the
    // SAME compiled kernel against the SAME centroid table and appends
    // — the old side is never re-scanned (SimilarityIvfSpec proves
    // no-rescan by appending under a DIFFERENT centroid table; here the
    // oracle proves RESULT equivalence: because the kernel is stateless
    // in the vectors, append ≡ from-scratch assignment over the union,
    // so the per-cell composition of the appended table hash-matches
    // one full assignment pass). On top rides the occupancy/staleness
    // report — the refit trigger: per cell, fit-time vs current counts,
    // integer growth ratio ×100, and the needs_refit flag (growth ≥
    // 1.5× or a cell the fit never saw). All counts and ratios are
    // exact integers; assignment is the q92 64-cell construction.
    QueryDef(
      "q115_index_append_occupancy",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        val emb = T.embeddings(s, dir)
        val fitSide = graft.operators.SimilarityJoin.ivfAssignTable(
          emb.filter(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"), cents)
        val newSide = graft.operators.SimilarityJoin.ivfAssignTable(
          emb.filter(col("vec_id") % 2 === 1), col("vec_id"), col("embedding"), cents)
        graft.operators.SimilarityJoin.indexOccupancyReport(
            fitSide.unionByName(newSide),
            fitSide.groupBy(col("cell")).agg(count(lit(1)).as("n_fit")),
            staleFactorE2 = 150L)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        oc AS (SELECT cell,
                      CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_fit,
                      CAST(COUNT(*) AS BIGINT) AS n_total
               FROM assigned GROUP BY cell)
        SELECT CAST(cell AS BIGINT) AS cell, n_fit, n_total,
               n_total - n_fit AS n_new,
               n_total * 100 // greatest(n_fit, 1) AS growth_e2,
               n_total * 100 // greatest(n_fit, 1) >= 150 OR n_fit = 0
                 AS needs_refit
        FROM oc ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q93: the INCREMENTAL twin of q92 — daily embedding batch (odd
    // vec_ids, the q89 contract) deduped against new ∪ existing on the
    // 64-cell table, with BOTH sides assigned through the two-level
    // kernel at wProbe = nCoarse (the oracle-checkable end of the
    // dial, bit-identical to the flat scan). Together q92/q93 close
    // the high-cell-count story for the full AND incremental passes:
    // same caps, same shared oracle text, only the assignment column
    // differs from q84/q89.
    QueryDef(
      "q93_semantic_dedup_inc_two_level",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        graft.operators.SimilarityJoin.semanticDedupIncrementalTwoLevel(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            isNew = col("vec_id") % 2 === 1, cents, threshold = 0.4,
            nCoarse = 8, wProbe = 8)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        ${ivfAvSqlCte()},
        ${semanticDedupIncSqlTail()}""")),

    // ------------------------------------------------------------------
    // q94: the PARTIAL-probe two-level path under a full oracle — the
    // configuration the coarse quantizer exists for (probe 2 of 8
    // super-cells, scanning ~1/4 of the cells per vector; at sf0.01,
    // 171 of 500 vectors assign differently from the flat scan, so
    // this oracle checks the partial semantics, not a disguised full
    // probe). Expressible because the coarse fit is the INTEGER-EXACT
    // variant: centroid sums are order-free int64 (SQL SUM reproduces
    // them), each mean is one division, and the 10 Lloyd sweeps unroll
    // as materialized CTEs (the q75 PageRank pattern). Every stage —
    // fit, probe selection with the memberless-super skip, member
    // argmin, dedup summary — hash-matches DuckDB bit-for-bit.
    QueryDef(
      "q94_semantic_dedup_partial_probe",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        graft.operators.SimilarityJoin.semanticDedupTwoLevel(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            cents, threshold = 0.4, nCoarse = 8, wProbe = 2,
            sqlExactFit = true, fitIters = twoLevelOracleIters)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        ${twoLevelAssignSqlCtes(nCells = 64, dim = 64, nCoarse = 8,
          iters = twoLevelOracleIters, wProbe = 2)},
        ${ivfAvSqlCte("assigned2")},
        ${semanticDedupSqlTail("assigned2")}""")),

    // ------------------------------------------------------------------
    // q95: q94's partial-probe assignment driving the INCREMENTAL
    // contract — completing the {full, incremental} × {flat,
    // full-probe, partial-probe} matrix with every cell oracled: daily
    // batch (odd vec_ids) vs corpus, both sides assigned by the
    // exact-fit two-level kernel at wProbe=2 of 8. Identical CTE text
    // to q94 up to the tail; identical tail text to q89/q93 up to the
    // assignment CTE name.
    QueryDef(
      "q95_semantic_dedup_inc_partial",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        graft.operators.SimilarityJoin.semanticDedupIncrementalTwoLevel(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            isNew = col("vec_id") % 2 === 1, cents, threshold = 0.4,
            nCoarse = 8, wProbe = 2, sqlExactFit = true,
            fitIters = twoLevelOracleIters)
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        ${twoLevelAssignSqlCtes(nCells = 64, dim = 64, nCoarse = 8,
          iters = twoLevelOracleIters, wProbe = 2)},
        ${ivfAvSqlCte("assigned2")},
        ${semanticDedupIncSqlTail("assigned2")}""")),

    // ------------------------------------------------------------------
    // q96: ORACLE-EXACT distributed IVF BUILD — retiring the suite's
    // last recall-only contract class: q53 checks the MLlib KMeans
    // build by recall (its float fit is unmirrorable), this query
    // hash-checks an actual Lloyd BUILD bit-for-bit. The q94 fitExact
    // construction applied to the corpus: ×1e7 int64 vectors (the
    // scaled-cosine representation), min-id-per-residue seeds (one
    // partial-aggregable group-by — no global rank shuffle), each sweep
    // = one compiled-kernel assignment pass + order-free int64 per-dim
    // centroid sums (a distributed SUM and DuckDB's SUM cannot differ),
    // means existing only as one division each. Output is the ENTIRE
    // build state (cell × dim: sum, cnt, mean, final occupancy), so
    // every word the serving path would load from the catalog is
    // hash-checked. Production path at 100 TB: sample → this build →
    // persist through the catalog (ivfBuildIndex's fitSampleCap note).
    QueryDef(
      "q96_ivf_build_exact",
      (s, dir) =>
        graft.operators.SimilarityJoin.ivfBuildIndexExact(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            nCells = 16, iters = 5)
          .orderBy(col("cell"), col("d")),
      Some(s"""
        WITH ${ivfBuildExactSqlCtes(nCells = 16, dim = 64, iters = 5)}""")),

    // ------------------------------------------------------------------
    // q97: IVF SERVING through the two-level probe kernel at 64 cells,
    // full probe (wProbe = nCoarse = 8) — the serving twin of q92: the
    // probe stage runs the coarse-quantized TopCellsTwoLevel kernel,
    // which at full probe emits the bit-identical probe set (ties and
    // all) to the flat scan, so the whole two-level serving path —
    // driver coarse fit, memberless-super skip, compiled probe, explode
    // plumbing — is hash-checked against q81's oracle text on the
    // 64-cell table. Partial probing (q98) keeps this plan and schema.
    QueryDef(
      "q97_ann_ivf_two_level",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        graft.operators.SimilarityJoin.ivfTopKServing(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50, cents, nProbe = 4, k = 3,
            probe = Some(graft.operators.SimilarityJoin.CoarseProbe(
              nCoarse = 8, wProbe = 8)))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        $ivfFlatProbeSqlCte,
        $ivfServeSqlTail""")),

    // ------------------------------------------------------------------
    // q98: PARTIAL-probe two-level SERVING under a full oracle — the
    // q94 construction applied to the path that serves queries: each
    // query probes 2 of 8 fitted supers and scans only their member
    // cells for its 4 probe cells (~1/4 of the centroid FLOPs; at the
    // 10⁵-cell design point, ~2√nCells·dim). Expressible because the
    // coarse fit is the integer-exact variant (order-free int64 sums,
    // one division per mean, sweeps unrolled as MATERIALIZED CTEs), so
    // probe selection — memberless-super skip included — mirrors in
    // SQL. The serving tail is q81's text verbatim: the three serving
    // queries differ only in how `probes` is produced.
    QueryDef(
      "q98_ann_ivf_partial_probe",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        graft.operators.SimilarityJoin.ivfTopKServing(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50, cents, nProbe = 4, k = 3,
            probe = Some(graft.operators.SimilarityJoin.CoarseProbe(
              nCoarse = 8, wProbe = 2, sqlExactFit = true,
              fitIters = twoLevelOracleIters)))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        ${twoLevelFitSqlCtes(nCells = 64, dim = 64, nCoarse = 8,
          iters = twoLevelOracleIters)},
        ${twoLevelServeProbeSqlCtes(dim = 64, nCoarse = 8, iters = twoLevelOracleIters,
          wProbe = 2, nProbe = 4, queryPred = "vec_id < 50")},
        $ivfServeSqlTail""")),

    // ------------------------------------------------------------------
    // q101: the COMPLETE production serving configuration in one
    // oracled query — every scale lever engaged at once: two-level
    // PARTIAL probe (2 of 8 fitted supers per query — the ~2√nCells
    // probe cost, q98's machinery), candidates scanned as 32-bit PQ
    // codes with integer ADC (q87's machinery), k′=10 shortlist
    // re-ranked by exact integer cosine (q91's machinery). Each CTE
    // block is shared verbatim with the query that introduced it, so
    // q101 adds COMPOSITION, not new contract text — and the whole
    // five-stage pipeline (fit → probe → ADC → shortlist → re-rank)
    // still hash-matches DuckDB bit-for-bit.
    QueryDef(
      "q101_ivf_pq_rerank_two_level",
      (s, dir) => {
        val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        graft.operators.SimilarityJoin.ivfPqRerankTopK(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50, cents, books,
            nProbe = 4, shortlist = 10, k = 3,
            probe = Some(graft.operators.SimilarityJoin.CoarseProbe(
              nCoarse = 8, wProbe = 2, sqlExactFit = true,
              fitIters = twoLevelOracleIters)))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        ${pqSqlCtes("pq_")},
        ${twoLevelFitSqlCtes(nCells = 64, dim = 64, nCoarse = 8,
          iters = twoLevelOracleIters)},
        ${twoLevelServeProbeSqlCtes(dim = 64, nCoarse = 8, iters = twoLevelOracleIters,
          wProbe = 2, nProbe = 4, queryPred = "vec_id < 50")},
        $ivfPqAdcScoreSqlCtes,
        $ivfPqRerankSqlTail""")),

    // ------------------------------------------------------------------
    // q105: q98's partial-probe serving with BOTH round-9 scale levers
    // engaged, under q98's oracle CTE BUILDERS (at iters = 3) — the
    // hash check proves each lever is invisible to results within this
    // configuration: (1) the coarse structure
    // comes from `twoLevelFitExactDistributed` (Lloyd sweeps as
    // compiled-kernel scans + order-free int64 partial aggregations on
    // EXECUTORS — the 10⁶-cell-decade fit) passed through
    // CoarseProbe.prefit, bit-identical to the driver fitExact the
    // oracle CTEs unroll; (2) the per-query rank runs the two-stage
    // salted top-k (rankSalt = 8 — the hot-cell partition bound),
    // bit-identical to the one-stage window because top-k under the
    // total (cos, nid) order is associative. Same fixture, same
    // queries, same oracle BUILDERS — only the execution geometry
    // changed. Sweeps = 3, not q98's 10: each distributed sweep is a
    // full Spark job, pure scheduling overhead on a 64-row fixture
    // table (the real decade amortizes it over 10⁶ cells), and 3
    // sweeps exercise the seed/carryover/final-assignment machinery
    // identically — the oracle unrolls exactly 3 CTE sweeps to match.
    QueryDef(
      "q105_ann_serving_dist_fit",
      (s, dir) => {
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s, nCells = 64)
        val structure = graft.operators.SimilarityJoin
          .twoLevelFitExactDistributed(cents, nCoarse = 8, iters = 3)
        graft.operators.SimilarityJoin.ivfTopKServing(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50, cents, nProbe = 4, k = 3,
            probe = Some(graft.operators.SimilarityJoin.CoarseProbe(
              nCoarse = 8, wProbe = 2, prefit = Some(structure))),
            rankSalt = 8)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH ${ivfAssignSqlCtes(64)},
        ${twoLevelFitSqlCtes(nCells = 64, dim = 64, nCoarse = 8,
          iters = 3)},
        ${twoLevelServeProbeSqlCtes(dim = 64, nCoarse = 8, iters = 3,
          wProbe = 2, nProbe = 4, queryPred = "vec_id < 50")},
        $ivfServeSqlTail""")),

    // ------------------------------------------------------------------
    // q166: ANN RECALL REPORT — the index-quality regression check every
    // ANN deployment runs before swapping an index into serving
    // (Faiss/ScaNN publish exactly this table): brute-force exact top-3
    // over a 50-query sample is the ground truth; each candidate serving
    // path (q51's single-table sign-bit LSH, q81's md5-centroid IVF at
    // nProbe 4/16, and q187's 16-table multi-probe LSH — the fix this
    // report's 66 bps row motivated) is scored against it side by side.
    // Per variant:
    // queries answered, rows returned, ground-truth hits, queries whose
    // TRUE nearest neighbor was found anywhere in the top-3, and
    // recall@3 in integer basis points (nonneg-operand div). Both
    // serving paths are deterministic, so the whole report — including
    // the recall numbers — is oracle-expressible, not just a pinned
    // boolean (q53's weaker contract for the non-mirrorable KMeans fit).
    // 100 TB: ground truth is bounded by the SAMPLE (50 queries × corpus
    // map-side rank — the q53 brute discipline, never corpus²); the
    // serving sides are the production plans unchanged; the compare is
    // a broadcast-able ~300-row join.
    QueryDef(
      "q166_ann_recall_report",
      (s, dir) => {
        val k = 3
        val base = scaled(s, dir)
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        // ground truth: exact top-k per sampled query (50 × n, q53's shape)
        val q = base.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("v").as("va"), col("n2").as("n2a"))
        val c = base.select(col("vec_id").as("nid"), col("v").as("vb"), col("n2").as("n2b"))
        val truth = q.crossJoin(c).filter(col("qid") =!= col("nid"))
          .withColumn("cos", X.cosineFromInts(
            X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select(col("qid"), col("nid"), col("rn"))
        // candidate path 1: q51's LSH buckets (same expanded sig expression)
        val sigExpr = (1 to 8).map(i =>
          when(element_at(col("v"), i) >= 0, lit(1L << (i - 1)))
            .otherwise(lit(0L))).reduce(_ + _)
        val sigd = base.withColumn("sig", sigExpr)
        val lq = sigd.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("v").as("va"),
            col("n2").as("n2a"), col("sig"))
        val lc = sigd.select(col("vec_id").as("nid"), col("v").as("vb"),
          col("n2").as("n2b"), col("sig"))
        val lsh = lq.join(lc, Seq("sig")).filter(col("qid") =!= col("nid"))
          .withColumn("cos", X.cosineFromInts(
            X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k)
          .select(col("qid"), col("nid"))
        // candidate path 2: q81's served IVF plan, unchanged
        val cents = graft.operators.SimilarityJoin.md5CentroidTable(s)
        val ivf = graft.operators.SimilarityJoin.ivfTopKServing(
            T.embeddings(s, dir), col("vec_id"), col("embedding"),
            queryPred = col("vec_id") < 50, cents, nProbe = 4, k = k)
          .select(col("qid"), col("nid"))
        // candidate path 3: q187's multi-table LSH (shared mlshTop3 —
        // the fix the single-table row motivated, audited side by side)
        val mlsh = mlshTop3(base).select(col("qid"), col("nid"))
        val approx = ivf.withColumn("variant", lit("ivf"))
          .unionByName(lsh.withColumn("variant", lit("lsh")))
          .unionByName(mlsh.withColumn("variant", lit("mlsh")))
        val tot = truth.agg(count(lit(1)).as("n_truth"))
        approx.join(truth, Seq("qid", "nid"), "left")
          .groupBy(col("variant"))
          .agg(countDistinct(col("qid")).as("n_queries"),
            count(lit(1)).as("n_returned"),
            sum(when(col("rn").isNotNull, 1L).otherwise(0L)).as("n_hits"),
            countDistinct(when(col("rn") === 1, col("qid"))).as("nn_found"))
          .crossJoin(broadcast(tot)) // 1-row denominator broadcast
          .select(col("variant"), col("n_queries"), col("n_returned"),
            col("n_hits"), col("nn_found"),
            expr("(n_hits * 10000) div n_truth").as("recall_bps"))
          .orderBy(col("variant"))
      },
      Some(s"""
        WITH $scaledSqlCte,
        $lshSigSqlCte,
        lpairs AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                     ${X.cosineFromIntsSql(X.dotIntSql("a.v", "b.v"), "a.n2", "b.n2")} AS cos
                   FROM sig a JOIN sig b
                     ON a.sig = b.sig AND a.vec_id != b.vec_id
                   WHERE a.vec_id < 50),
        lshk AS (SELECT qid, nid FROM (
                   SELECT qid, nid,
                          row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, nid) AS rank
                   FROM lpairs) WHERE rank <= 3),
        $mlshSqlCtes,
        ${ivfAssignSqlCtes()},
        $ivfFlatProbeSqlCte,
        $ivfServeRankSqlCtes,
        truth AS (SELECT qid, nid, rn FROM (
                    SELECT a.vec_id AS qid, b.vec_id AS nid,
                           row_number() OVER (PARTITION BY a.vec_id
                             ORDER BY ${X.cosineFromIntsSql(X.dotIntSql("a.v", "b.v"), "a.n2", "b.n2")} DESC,
                                      b.vec_id) AS rn
                    FROM scn a JOIN scn b ON a.vec_id != b.vec_id
                    WHERE a.vec_id < 50) WHERE rn <= 3),
        tt AS (SELECT COUNT(*) AS n_truth FROM truth),
        approx AS (SELECT 'ivf' AS variant, qid, nid FROM ivfk
                   UNION ALL
                   SELECT 'lsh' AS variant, qid, nid FROM lshk
                   UNION ALL
                   SELECT 'mlsh' AS variant, qid, nid FROM mlshk),
        hit AS (SELECT ap.variant, ap.qid, ap.nid, t.rn
                FROM approx ap LEFT JOIN truth t
                  ON t.qid = ap.qid AND t.nid = ap.nid)
        SELECT variant, COUNT(DISTINCT qid) AS n_queries,
               COUNT(*) AS n_returned,
               CAST(SUM(CASE WHEN rn IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               COUNT(DISTINCT CASE WHEN rn = 1 THEN qid END) AS nn_found,
               CAST(SUM(CASE WHEN rn IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 * 10000 // (SELECT n_truth FROM tt) AS recall_bps
        FROM hit GROUP BY variant ORDER BY variant""")),

    // ------------------------------------------------------------------
    // q187: MULTI-TABLE SIGN-LSH ANN — the production replacement for
    // q51's single-table path, built because the engine's own recall
    // report (q166) measured that path at recall@3 = 66 bps vs IVF's
    // 5866: one 8-bit signature collapses the corpus into ≤256 buckets
    // and near-orthogonal true neighbors almost never cohabit. The
    // Indyk-Motwani fix: L = 16 independent tables of b = 7 md5-derived
    // hyperplanes each (miss probability (1−p^b)^L decays exponentially
    // in L), candidates unioned across tables, exact integer-cosine
    // re-rank, top-3 per query — measured at ~5100 bps on the sf0.1
    // fixture (87% of the IVF row) scanning ~13% of the corpus per
    // query. Serving code is mlshTop3, shared VERBATIM with q166's
    // mlsh row, and the oracle chain (mlshSqlCtes) is likewise shared —
    // the operator and its regression report cannot drift. 100 TB: one
    // compiled signature pass per row; the bucket join replicates the
    // corpus L× (the standard multi-table cost) but per-table work
    // stays ∝ Σ bucket²; the re-rank is a bounded-heap top_k, never a
    // corpus sort.
    QueryDef(
      "q187_ann_lsh_multitable",
      (s, dir) =>
        mlshTop3(scaled(s, dir)).orderBy(col("qid"), col("rank")),
      Some(mlshOracleSql)),

    // ------------------------------------------------------------------
    // q192: CATALOG-SERVED MULTI-TABLE LSH — the serving family
    // (LM/sketches/classifier/BM25 q169/dedup q170/hybrid q185)
    // extended to the round-15 ANN path: construct persists the BUCKET
    // INDEX (tbl, sig, vec_id — the posexploded signature table, ONE
    // shuffle) and the scaled vector store as two catalog versions;
    // the SERVED plan reads ONLY those versions — arriving queries
    // compute their 16 signatures map-side (the same compiled kernel),
    // probe the persisted bucket cells, and re-rank by exact cosine
    // against the stored vectors via the shared mlshRankTail. The
    // corpus is never re-projected at serve time. Oracle is q187's
    // text VERBATIM (mlshOracleSql): the served plan is proven against
    // the definition, not a copy of it. 100 TB: the index version is
    // (tbl, sig)-clusterable for readRange file pruning (the q169
    // postings discipline); probe work ∝ Σ |query∩cell|·|cell|.
    QueryDef(
      "q192_ann_lsh_catalog_served",
      (s, dir) => {
        val cat = new graft.catalog.VersionedCatalog(
          s, graft.Scratch.dir("q192"), format = "parquet")
        val base = scaled(s, dir)
          .localCheckpoint(eager = false) // both index builds read it
        // rebalance before write (guide §6): file count follows data
        // size, and the served probe re-reads these versions
        cat.writeNext("mlsh_vectors",
          base.select(col("vec_id"), col("v"), col("n2"))
            .hint("rebalance"))
        cat.writeNext("mlsh_index", annIndexRows(base).hint("rebalance"))
        import org.apache.spark.sql.types.StructType
        val vecs = cat.read("mlsh_vectors", 1,
          Some(StructType.fromDDL(
            "vec_id BIGINT, v ARRAY<BIGINT>, n2 BIGINT")))
        val idx = cat.read("mlsh_index", 1,
          Some(StructType.fromDDL("nid BIGINT, tbl INT, sig BIGINT")))
        annServeTop3(vecs, idx).orderBy(col("qid"), col("rank"))
      },
      Some(mlshOracleSql)),

    // ------------------------------------------------------------------
    // q194: MULTI-PROBE SIGN-LSH ANN — the index-memory complement to
    // q187 (Lv et al., VLDB 2007; see the mplsh geometry comment): 4
    // tables × 8 bits with each query probing its exact bucket plus
    // all 8 one-bit-flip neighbors per table. A flipped bucket holds
    // vectors differing on exactly that hyperplane — the most likely
    // place for a near neighbor the exact bucket missed — so probing
    // them recovers the recall extra tables would buy WITHOUT storing
    // extra tables: measured 4600 bps recall@3 at 13.9% corpus scan,
    // q187's recall/cost class at a QUARTER of its index rows. Probe
    // expansion is a 9-key array explode on the 50-query side only
    // (the corpus indexes ONCE per table); candidates dedup across
    // probes and tables; exact cosine top-3 via the shared
    // bounded-heap tail. 100 TB: index replication is the binding
    // cost of multi-table LSH — this is the standard production knob
    // for trading it against query fanout.
    QueryDef(
      "q194_ann_lsh_multiprobe",
      (s, dir) => {
        val base = scaled(s, dir)
        val probes = mplshProbes(
          mplshBuckets(base.filter(col("vec_id") < 50), "qid"))
        val cand = probes.join(mplshBuckets(base, "nid"), Seq("tbl", "sig"))
          .filter(col("qid") =!= col("nid"))
          .select(col("qid"), col("nid")).distinct()
        mlshRankTail(cand, base.select(col("vec_id"), col("v"), col("n2")))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
        WITH $scaledSqlCte,
        $mplshSqlCtes
        SELECT qid, rank, nid, cos FROM plshk ORDER BY qid, rank""")),

    // ------------------------------------------------------------------
    // q197: ANN INDEX VERSIONS — the append-type counterpart to q192's
    // frozen serving pair (and the oracled twin of the streaming
    // ANN-index sink's fold law): epoch A (even vec_ids) commits
    // index + vector versions as v1, epoch B appends the odd half as
    // v2, and the SAME served probe (annServeTop3 — q192's code) runs
    // against EACH version. Version isolation does real work: v1
    // serves only the even half (even queries, even candidates — a
    // point-in-time corpus state), v2 equals the from-scratch build
    // over the union, which is exactly what the oracle computes — v2's
    // chain is q187's mlshSqlCtes text VERBATIM, v1's is the same
    // bucket/score text restricted to the even corpus, sharing mgrid/
    // mproj/msig so the two versions cannot drift on geometry. This is
    // model/index time travel for ANN: reproduce any day's retrieval
    // by serving that day's version. 100 TB: appends never re-project
    // history; each serve is q192's 3-exchange probe.
    QueryDef(
      "q197_ann_index_versions",
      (s, dir) => {
        import org.apache.spark.sql.types.StructType
        val cat = new graft.catalog.VersionedCatalog(
          s, graft.Scratch.dir("q197"), format = "parquet")
        val base = scaled(s, dir)
          .localCheckpoint(eager = false) // both epochs read it
        val vSchema = StructType.fromDDL(
          "vec_id BIGINT, v ARRAY<BIGINT>, n2 BIGINT")
        val iSchema = StructType.fromDDL("nid BIGINT, tbl INT, sig BIGINT")
        val even = base.filter(col("vec_id") % 2 === 0)
          .select(col("vec_id"), col("v"), col("n2"))
        val odd = base.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id"), col("v"), col("n2"))
        // rebalance before write (guide §6 — the q192 move)
        cat.writeNext("ann_vectors", even.hint("rebalance"))
        cat.writeNext("ann_index", annIndexRows(even).hint("rebalance"))
        cat.writeNext("ann_vectors",
          cat.read("ann_vectors", 1, Some(vSchema)).unionByName(odd)
            .hint("rebalance"))
        cat.writeNext("ann_index",
          cat.read("ann_index", 1, Some(iSchema))
            .unionByName(annIndexRows(odd)).hint("rebalance"))
        (1 to 2).map { v =>
          annServeTop3(cat.read("ann_vectors", v, Some(vSchema)),
              cat.read("ann_index", v, Some(iSchema)))
            .select(lit(v.toLong).as("version"), col("qid"), col("rank"),
              col("nid"), col("cos"))
        }.reduce(_ unionByName _)
          .orderBy(col("version"), col("qid"), col("rank"))
      },
      Some(s"""
        WITH $scaledSqlCte,
        $mlshSqlCtes,
        c1 AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
               FROM msig a JOIN msig b ON a.tbl = b.tbl AND a.sig = b.sig
                 AND a.vec_id != b.vec_id
               WHERE a.vec_id < 50 AND a.vec_id % 2 = 0
                 AND b.vec_id % 2 = 0),
        s1 AS (SELECT c.qid, c.nid,
                 ${X.cosineFromIntsSql(X.dotIntSql("q.v", "n.v"), "q.n2", "n.n2")} AS cos
               FROM c1 c JOIN scn q ON q.vec_id = c.qid
                         JOIN scn n ON n.vec_id = c.nid),
        k1 AS (SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM (
                 SELECT qid, nid, cos,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY cos DESC, nid) AS rank
                 FROM s1) WHERE rank <= 3)
        SELECT version, qid, rank, nid, cos FROM (
          SELECT CAST(1 AS BIGINT) AS version, qid, rank, nid, cos FROM k1
          UNION ALL
          SELECT CAST(2 AS BIGINT) AS version, qid, rank, nid, cos FROM mlshk)
        ORDER BY version, qid, rank"""))
  )
}
