package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** UNIGRAM-LM TOKENIZER (SentencePiece's second model family — Kudo,
  * "Subword Regularization", ACL 2018): pieces carry unigram costs and
  * a word's tokenization is the MINIMUM-TOTAL-COST segmentation,
  * found by Viterbi DP — next to word/byte BPE (ext/Bpe.scala) this
  * completes the tokenizer families that ship in practice.
  *
  * Exact-integer re-expression (the q215 scaled-integer rules):
  *
  *  - piece costs are ⌊1024·log2((tot + |P|)/(u + 1))⌋ — add-one
  *    unigram surprisal in [[HashedClassifier.cbCol]]'s 1/1024-bit
  *    fixed point, so Viterbi comparisons are int64-exact on both
  *    engines (float log would hash-diverge);
  *  - the DP runs RELATIONALLY over the distinct-word table: position
  *    i's best state = argmin over j ∈ [i−Lmax, i) of best(j) +
  *    cost(w[j..i)), ties broken by (cost, n_pieces, j) — one
  *    equi-join + one word-partitioned argmin window per position,
  *    [[Lmax]] rounds total (the q131 unrolled-round discipline; the
  *    oracle unrolls the same rounds as MATERIALIZED CTEs). The
  *    winning segmentation STRING rides through the DP, so the output
  *    hash pins every boundary choice, not just the cost;
  *  - training is Kudo's prune loop simplified to count pruning
  *    (usage-weighted, the published heuristic's first-order term):
  *    seed = every ≤Lmax-char substring of the word vocabulary
  *    (coverage: single chars are never pruned), Viterbi-segment under
  *    seed costs, keep single chars ∪ the top-[[KeepK]] pieces by
  *    usage, re-cost from usage, re-segment — the committed piece
  *    table is the tokenizer artifact.
  *
  * 100 TB shape: everything after the one word-count shuffle is
  * vocabulary-sized (the BPE per-task word-cache discipline) — the DP
  * table is |distinct words| × word length rows, piece tables are
  * vocabulary-derived, and documents are only touched by the initial
  * count and any downstream apply-by-join. */
object UnigramLm extends QueryModule {

  /** Longest piece (chars) — covers every fixture word whole. */
  private val Lmax = 8

  /** Multi-char pieces kept by the prune round (single chars always
    * survive — segmentation coverage). */
  private val KeepK = 20

  // -------------------------------------------------------------------
  // Engine side.

  /** Distinct words with corpus counts — the per-task word cache. */
  private[ext] def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(X.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Seed piece usage: every substring of length 1..Lmax of every
    * distinct word, weighted by the word's corpus count. */
  private[ext] def seedUsage(wc: DataFrame): DataFrame =
    wc.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           st -> transform(sequence(st, least(length(w), st + ${Lmax - 1})),
           en -> substring(w, st, en - st + 1))))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("u"))

  /** Integer piece costs from a usage table: cost =
    * ⌊1024·log2((tot + n_pieces)/(u + 1))⌋ (add-one over the piece
    * set). */
  private[ext] def pieceCosts(usage: DataFrame): DataFrame = {
    val t1 = usage.agg(sum(col("u")).as("tot"),
      count(lit(1)).as("np_all"))
    HashedClassifier.cbCol(
      usage.crossJoin(broadcast(t1)),
      col("tot") + col("np_all"), col("u") + 1L, "cost")
      .select(col("piece"), col("cost"))
  }

  /** Relational Viterbi over the distinct words under a (piece, cost)
    * table: returns the final-position states (w, best, np, seg). */
  private[ext] def viterbi(words: DataFrame, pieces: DataFrame): DataFrame = {
    var b = words.select(col("w"), lit(0L).as("pos"),
      lit(0L).as("best"), lit(0L).as("np"), lit("").as("seg"))
    for (i <- 1 to Lmax) {
      val cand = b
        .filter(col("pos") < i && col("pos") >= i - Lmax &&
          length(col("w")) >= i)
        .select(col("w"), col("pos").as("j"), col("best"), col("np"),
          col("seg"),
          expr(s"substring(w, pos + 1, $i - pos)").as("piece"))
        .join(pieces, "piece")
        .select(col("w"), lit(i.toLong).as("pos"),
          (col("best") + col("cost")).as("best"),
          (col("np") + 1L).as("np"),
          when(col("seg") === "", col("piece"))
            .otherwise(concat(col("seg"), lit(" "), col("piece")))
            .as("seg"),
          col("j"))
      val win = Window.partitionBy(col("w"))
        .orderBy(col("best").asc, col("np").asc, col("j").asc)
      val next = cand.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select(col("w"), col("pos"), col("best"), col("np"), col("seg"))
      // LAZY lineage cut per round on the NEW rows only: b is
      // referenced twice per round (candidates + union), so an uncut
      // plan tree doubles per round — 2^Lmax subtree copies hang the
      // optimizer long before any data moves (the q212 plan-doubling
      // lesson). A lazy localCheckpoint rewrites next's LOGICAL plan
      // to an RDD leaf immediately (no per-round job — an eager
      // whole-union variant paid ~16 scheduling floors ≈ 24 s at
      // sf0.1), and the whole layered DAG still executes as one
      // action. b stays a union of ≤ Lmax checkpoint leaves —
      // linear, never doubled.
      b = b.unionByName(next.localCheckpoint(eager = false))
    }
    b.filter(col("pos") === length(col("w")))
      .select(col("w"), col("best"), col("np"), col("seg"))
  }

  /** Driver-collected (piece, cost) rows for the compiled kernel — the
    * tokenizer artifact, vocabulary-derived and bounded (the BpeTable
    * merges-table discipline: KBs–MBs at any corpus size). */
  private def collectCosts(pieces: DataFrame): Seq[(String, Long)] =
    pieces.collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Compiled-kernel segmentation of the distinct-word table: wc plus
    * the struct column `v` = (best, np, seg). Null v = word dropped
    * (longer than Lmax — exactly the relational DP's final filter). */
  private def kernelSeg(wc: DataFrame, costs: Seq[(String, Long)]): DataFrame =
    wc.withColumn("v",
        graft.functions.UnigramFunctions.viterbiSegment(col("w"), costs, Lmax))
      .filter(col("v").isNotNull)

  /** Piece usage from a kernel segmentation, word-count weighted. */
  private def kernelUsage(seg: DataFrame): DataFrame =
    seg.select(col("cnt"),
        explode(split(col("v").getField("seg"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("u"))

  /** The prune rule: EVERY single char of the seed universe survives
    * (coverage — a word whose multi-char pieces are all pruned must
    * still segment char by char; a char unused by round 1 carries
    * usage 0 and add-one prices it), plus the top [[KeepK]] multi-char
    * pieces by (round-1 usage desc, piece asc). Top-K via
    * orderBy+limit (TakeOrderedAndProject: per-partition heaps, k rows
    * ship) — NOT an unpartitioned row_number window, which would
    * single-partition-sort the piece universe (∝ vocab × Lmax
    * substrings at web scale); the (u desc, piece asc) order is total
    * (piece is unique), so the limit is deterministic. */
  private[ext] def prune(u1: DataFrame, seedU: DataFrame): DataFrame =
    u1.filter(length(col("piece")) > 1)
      .orderBy(col("u").desc, col("piece").asc)
      .limit(KeepK)
      .select(col("piece"), col("u"))
      .unionByName(seedU.filter(length(col("piece")) === 1)
        .select(col("piece"))
        .join(u1, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("u"), lit(0L)).as("u")))

  // -------------------------------------------------------------------
  // Oracle builders. Namespaced ug*; the Viterbi rounds and the cb
  // layers are MATERIALIZED per the unrolled-chain rule.

  /** Unrolled Viterbi rounds over `${tag}b0` reading piece costs from
    * `piecesCte(piece, cost)` — final states land in `${tag}fin`. */
  private def viterbiCtesSql(piecesCte: String, tag: String): String = {
    val rounds = (1 to Lmax).map { i =>
      val prev = s"${tag}b${i - 1}"
      s"""        ${tag}b$i AS MATERIALIZED (
          SELECT * FROM $prev
          UNION ALL
          SELECT w, pos, best, np, seg FROM (
            SELECT c.w, CAST($i AS BIGINT) AS pos,
                   c.best + p.cost AS best, c.np + 1 AS np,
                   CASE WHEN c.seg = '' THEN p.piece
                        ELSE c.seg || ' ' || p.piece END AS seg,
                   row_number() OVER (PARTITION BY c.w
                     ORDER BY c.best + p.cost, c.np + 1, c.pos) AS rn
            FROM $prev c
            JOIN $piecesCte p
              ON p.piece = substr(c.w, CAST(c.pos AS INT) + 1,
                                  $i - CAST(c.pos AS INT))
            WHERE c.pos < $i AND c.pos >= $i - $Lmax
              AND length(c.w) >= $i) WHERE rn = 1)"""
    }
    s"""${tag}b0 AS (
          SELECT w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS best,
                 CAST(0 AS BIGINT) AS np, '' AS seg
          FROM ugwc),
${rounds.mkString(",\n")},
        ${tag}fin AS MATERIALIZED (
          SELECT w, best, np, seg FROM ${tag}b$Lmax
          WHERE pos = length(w))"""
  }

  /** Word counts + seed usage + seed costs (shared by both queries). */
  private def seedCtesSql: String = s"""
        ugwc AS MATERIALIZED (
          SELECT w, COUNT(*) AS cnt FROM (
            SELECT unnest(${X.tokensSql("text")}) AS w FROM documents)
          GROUP BY w),
        ugsu AS MATERIALIZED (
          SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u FROM (
            SELECT cnt, unnest(flatten(list_transform(
                     range(1, length(w) + 1),
                     st -> list_transform(
                       range(st, least(length(w), st + ${Lmax - 1}) + 1),
                       en -> substr(w, CAST(st AS INT),
                                    CAST(en - st + 1 AS INT)))))) AS piece
            FROM ugwc)
          GROUP BY piece),
        ugst AS (SELECT CAST(SUM(u) AS BIGINT) AS tot,
                        COUNT(*) AS np_all FROM ugsu),
        ugp0 AS MATERIALIZED (
          SELECT piece, cost FROM
          ${HashedClassifier.cbSql(
            "(SELECT s.piece, s.u, t.tot, t.np_all FROM ugsu s CROSS JOIN ugst t)",
            Seq("piece", "u"), "tot + np_all", "u + 1", "cost")} ugp0q)"""

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q234: UNIGRAM-LM SEGMENTATION (Viterbi apply) — every distinct
    // word's minimum-cost segmentation under the seed unigram costs:
    // the whole DP is hash-checked INCLUDING the winning piece
    // sequence (seg rides the DP), so a single boundary choice or
    // tie-break divergence anywhere in the 8 rounds fails loudly.
    QueryDef(
      "q234_unigram_segment",
      (s, dir) => {
        // COMPILED DP (r19): the (piece, cost) table is collected once
        // (vocabulary-sized — the BpeTable broadcast-dim discipline)
        // and the whole Viterbi runs as one per-word kernel pass over
        // the CACHED distinct-word table: 1 corpus tokenize instead of
        // the relational unrolling's Lmax × (join + window +
        // checkpoint) stages (measured 7.1 s → sub-second at sf0.1).
        // The relational viterbi() stays as the spec law witness;
        // UnigramLmSpec asserts kernel ≡ relational, value for value.
        val scope = new graft.CacheScope
        val wc = scope.cache(wordCounts(T.documents(s, dir)))
        val p0 = collectCosts(pieceCosts(seedUsage(wc)))
        val out = kernelSeg(wc, p0)
          .select(col("w").as("word"), col("cnt"),
            col("v").getField("np").as("n_pieces"),
            col("v").getField("best").as("cost_cb"),
            col("v").getField("seg").as("seg"))
          .orderBy(col("word"))
        graft.CacheScope.releaseAfterNextAction(s, scope)
        out
      },
      Some(s"""
        WITH $seedCtesSql,
        ${viterbiCtesSql("ugp0", "ug1")}
        SELECT f.w AS word, c.cnt, f.np AS n_pieces, f.best AS cost_cb,
               f.seg
        FROM ug1fin f JOIN ugwc c ON c.w = f.w
        ORDER BY word""")),

    // ------------------------------------------------------------------
    // q235: UNIGRAM-LM PRUNE TRAINING — one full Kudo-style prune
    // round: segment under seed costs, keep single chars ∪ the
    // top-$KeepK pieces by word-count-weighted usage, re-cost from
    // usage, re-segment under the pruned vocabulary. The output is the
    // committed tokenizer artifact: every surviving piece with its
    // pre-prune usage, pruned-set cost, and post-prune usage — plus
    // each round's usage totals pinning the corpus-level effect.
    QueryDef(
      "q235_unigram_prune_train",
      (s, dir) => {
        // COMPILED DP (r19): both Viterbi passes run as per-word
        // kernels over ONE cached distinct-word table (1 corpus
        // tokenize total; measured 29.3 s → ~1 s at sf0.1). The pruned
        // vocabulary is collected as a LOCAL relation — it IS the
        // committed tokenizer artifact, vocabulary-sized control state
        // (the Lloyd/BPE collect discipline) — so the served output
        // plan is the usage agg + two local-relation joins + sort.
        val scope = new graft.CacheScope
        val wc = scope.cache(wordCounts(T.documents(s, dir)))
        val seed = scope.cache(seedUsage(wc))
        val p0 = collectCosts(pieceCosts(seed))
        val u1 = kernelUsage(kernelSeg(wc, p0))
        val keptRows = prune(u1, seed).collect()
        val keptL = s.createDataFrame(
          java.util.Arrays.asList(keptRows: _*),
          org.apache.spark.sql.types.StructType.fromDDL(
            "piece STRING, u BIGINT"))
        val p1df = pieceCosts(keptL)
        val p1 = collectCosts(p1df)
        val p1L = s.createDataFrame(
          java.util.Arrays.asList(p1.map { case (p, c) =>
            org.apache.spark.sql.Row(p, c) }: _*),
          org.apache.spark.sql.types.StructType.fromDDL(
            "piece STRING, cost BIGINT"))
        val u2 = kernelUsage(kernelSeg(wc, p1))
          .withColumnRenamed("u", "u2")
        val out = keptL.join(p1L, "piece")
          .join(u2, Seq("piece"), "left")
          .select(col("piece"),
            length(col("piece")).cast("long").as("plen"),
            col("u").as("u1"), col("cost").as("cost_cb"),
            coalesce(col("u2"), lit(0L)).as("u2"))
          .orderBy(col("piece"))
        graft.CacheScope.releaseAfterNextAction(s, scope)
        out
      },
      Some(s"""
        WITH $seedCtesSql,
        ${viterbiCtesSql("ugp0", "ug1")},
        ugu1 AS MATERIALIZED (
          SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u FROM (
            SELECT c.cnt, unnest(string_split(f.seg, ' ')) AS piece
            FROM ug1fin f JOIN ugwc c ON c.w = f.w)
          GROUP BY piece),
        ugkept AS MATERIALIZED (
          SELECT piece, u FROM (
            SELECT piece, u,
                   row_number() OVER (ORDER BY u DESC, piece) AS rk
            FROM ugu1 WHERE length(piece) > 1) WHERE rk <= $KeepK
          UNION ALL
          SELECT s.piece, coalesce(x.u, 0) AS u
          FROM (SELECT piece FROM ugsu WHERE length(piece) = 1) s
          LEFT JOIN ugu1 x USING (piece)),
        ugkt AS (SELECT CAST(SUM(u) AS BIGINT) AS tot,
                        COUNT(*) AS np_all FROM ugkept),
        ugp1 AS MATERIALIZED (
          SELECT piece, cost FROM
          ${HashedClassifier.cbSql(
            "(SELECT s.piece, s.u, t.tot, t.np_all FROM ugkept s CROSS JOIN ugkt t)",
            Seq("piece", "u"), "tot + np_all", "u + 1", "cost")} ugp1q),
        ${viterbiCtesSql("ugp1", "ug2")},
        ugu2 AS (
          SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u2 FROM (
            SELECT c.cnt, unnest(string_split(f.seg, ' ')) AS piece
            FROM ug2fin f JOIN ugwc c ON c.w = f.w)
          GROUP BY piece)
        SELECT k.piece, CAST(length(k.piece) AS BIGINT) AS plen,
               k.u AS u1, p.cost AS cost_cb, coalesce(x.u2, 0) AS u2
        FROM ugkept k
        JOIN ugp1 p USING (piece)
        LEFT JOIN ugu2 x USING (piece)
        ORDER BY k.piece"""))
  )
}
