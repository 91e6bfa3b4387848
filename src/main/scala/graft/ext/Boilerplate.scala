package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** LINE-level boilerplate detection and removal — the jusText /
  * C4 / FineWeb filter class (Raffel et al., "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", JMLR
  * 2020 §2.2: terminal-punctuation line rule; Penedo et al., "The
  * FineWeb Datasets", 2024: duplicated-line fraction): production
  * curation removes LINES (navigation chrome, cookie banners, repeated
  * footers), not just whole documents — the doc-level passes (q40-q46,
  * q57) cannot reach them.
  *
  * The operator surface works over ANY (doc_id, line_idx, line) frame;
  * how lines are derived is the caller's choice of [[linesRaw]]
  * (raw-text newline split — real web corpora) or [[linesTokenWindows]]
  * (fixed token windows — the fixture corpus carries no newlines or
  * punctuation, so windows are the line structure it HAS; the
  * terminal-punctuation signal is still computed and hash-compared,
  * constant-false there, and exercised on punctuated raw lines by
  * BoilerplateSpec's crafted documents).
  *
  * Signals per line:
  *  - `nd`: DISTINCT documents carrying this exact line (by 60-bit
  *    line hash) — the boilerplate signal: chrome repeats across pages.
  *  - `ends_terminal`: line ends in terminal punctuation ([.!?]) —
  *    C4's "keep only sentence-like lines" rule's input.
  *  - `n_link_tokens`: tokens starting http/www — link-density input.
  * Removal (the q124 cut-and-rejoin discipline): cut lines duplicated
  * across ≥ [[DupDocs]] documents, reassemble the survivors in line
  * order, and hash the cleaned text BYTE FOR BYTE — an off-by-one
  * anywhere in either engine's cut or rejoin fails the hash compare.
  *
  * 100 TB shape: line derivation and per-line signals are map-side;
  * the duplicate count reduces lines to (h60, doc_id) pairs before the
  * one shuffle on the line hash (partial-aggregable distinct-doc
  * count, ∝ distinct lines, never doc pairs); the join back is
  * hash-keyed; reassembly is the corpus's one unavoidable per-doc
  * exchange (same as q124's). Nothing driver-sided, nothing quadratic.
  */
object Boilerplate extends QueryModule {

  /** Tokens per pseudo-line for the fixture instantiation. */
  val LineTokens = 10

  /** A line duplicated across ≥ this many DISTINCT docs is boilerplate. */
  val DupDocs = 3L

  // -------------------------------------------------------------------
  // Line derivation.

  /** (doc_id, line_idx, line) from raw text split on newlines —
    * the real-corpus instantiation. Blank lines are kept (their
    * indices matter for faithful reassembly); callers can filter.
    * CRLF is normalized: splitting on `\r?\n` keeps a trailing `\r`
    * out of the line so per-line signals (ends_terminal) agree with
    * the RE2 oracle semantics; reassembly is byte-exact for LF text
    * and LF-normalizing for CRLF text. */
  def linesRaw(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), "\r?\n")))
      .select(col("doc_id"), col("pos").cast("long").as("line_idx"),
        col("col").as("line"))

  /** (doc_id, line_idx, line) as fixed [[LineTokens]]-token windows of
    * the tokenized text (trailing window ragged) — the fixture
    * instantiation; map-side HOF, the q55 chunk construction. */
  def linesTokenWindows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), X.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .withColumn("lines", expr(
        s"transform(sequence(0, (size(tk)-1) div $LineTokens), " +
          s"i -> concat_ws(' ', slice(tk, i*$LineTokens + 1, $LineTokens)))"))
      .select(col("doc_id"), posexplode(col("lines")))
      .select(col("doc_id"), col("pos").cast("long").as("line_idx"),
        col("col").as("line"))

  /** The oracle's token-window `ln` CTE (doc_id, line_idx, line). */
  def linesTokenWindowsSql: String = s"""
        tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        ln AS (SELECT doc_id, CAST(i AS BIGINT) AS line_idx,
                      array_to_string(
                        tk[i*$LineTokens+1 : i*$LineTokens+$LineTokens],
                        ' ') AS line
               FROM (SELECT doc_id, tk,
                            unnest(range(0, (len(tk)+${LineTokens - 1})
                              //$LineTokens)) AS i
                     FROM tk WHERE len(tk) > 0))"""

  // -------------------------------------------------------------------
  // Signals and removal over a (doc_id, line_idx, line) frame.

  /** Lines with their 60-bit hash and map-side signals attached. */
  private def withLineSignals(lines: DataFrame): DataFrame =
    lines.select(col("doc_id"), col("line_idx"), col("line"),
      X.h60(col("line")).as("lh"),
      // \z, not $: Java's $ also matches before a final \r/\n while
      // the DuckDB oracle's RE2 $ is end-of-string only
      col("line").rlike("[.!?]\\z").as("ends_terminal"),
      size(filter(split(col("line"), " "),
        t => t.startsWith("http") || t.startsWith("www")))
        .cast("long").as("n_link_tokens"))

  /** Per-line-hash distinct-document counts (lh, nd) — ∝ distinct
    * lines, and a LINEAR sketch in the CMS/LM sense when documents
    * partition into epochs (each doc in exactly one epoch): epoch
    * tables fold by [[mergeLineStats]] and the fold equals the
    * union-corpus counts exactly — the q149 catalog law. */
  def lineStats(lines: DataFrame): DataFrame =
    lines.select(col("doc_id"), X.h60(col("line")).as("lh"))
      .groupBy(col("lh")).agg(countDistinct(col("doc_id")).as("nd"))

  /** Additive fold: stats(A) ⊕ stats(B) = stats(A ∪ B) exactly for
    * epoch-partitioned corpora (the [[LmScore.mergeBigramCounts]]
    * shape). */
  def mergeLineStats(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("lh"), col("nd").as("na"))
      .join(b.select(col("lh"), col("nd").as("nb")), Seq("lh"), "full_outer")
      .select(col("lh"),
        (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)))
          .as("nd"))

  private def dupCounts(sig: DataFrame): DataFrame =
    sig.groupBy(col("lh")).agg(countDistinct(col("doc_id")).as("nd"))

  /** Per-document line-signal report (see the q143 QueryDef). */
  def lineSignalReport(lines: DataFrame): DataFrame = {
    val sig = withLineSignals(lines)
    sig.join(dupCounts(sig), "lh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("nd") >= DupDocs, 1L).otherwise(0L)).as("n_dup_lines"),
        max(col("nd")).as("max_dup_docs"),
        sum(when(col("ends_terminal"), 1L).otherwise(0L))
          .as("n_terminal_lines"),
        sum(col("n_link_tokens")).as("n_link_tokens"))
      .withColumn("dup_line_frac_e4",
        expr("(n_dup_lines * 10000) div n_lines"))
      .select(col("doc_id"), col("n_lines"), col("n_dup_lines"),
        col("dup_line_frac_e4"), col("max_dup_docs"),
        col("n_terminal_lines"), col("n_link_tokens"))
  }

  /** Cut corpus-duplicated lines (nd ≥ [[DupDocs]]) and reassemble the
    * survivors in line order, joined by `sep`; the cleaned text leaves
    * as a 60-bit hash plus kept counts. Every input doc emits a row —
    * a fully-boilerplate doc keeps 0 lines and hashes the empty
    * string. */
  def removeDuplicatedLines(lines: DataFrame, sep: String): DataFrame = {
    val sig = withLineSignals(lines)
    removeLinesUnder(lines, dupCounts(sig), sep)
  }

  /** [[removeDuplicatedLines]] under an EXTERNAL (lh, nd) stats table —
    * the serving seam (q149): the stats may be a persisted catalog
    * version folded over past epochs; lines absent from it count as
    * nd = 0 (never seen → kept). */
  def removeLinesUnder(lines: DataFrame, stats: DataFrame,
      sep: String): DataFrame = {
    val kept = lines
      .select(col("doc_id"), col("line_idx"), col("line"),
        X.h60(col("line")).as("lh"))
      .join(stats, Seq("lh"), "left")
      .filter(coalesce(col("nd"), lit(0L)) < DupDocs)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines_kept"),
        sum(size(split(col("line"), " ")).cast("long")).as("n_tokens_kept"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("line_idx"), col("line")))),
          x => x.getField("line"))).as("cleaned"))
    lines.select(col("doc_id")).distinct()
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        X.h60(coalesce(col("cleaned"), lit(""))).as("cleaned_fp"))
  }

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q143: per-document LINE-SIGNAL report over the fixture's
    // token-window lines — duplicated-line count/fraction (the
    // boilerplate signal: nd ≥ 3 distinct docs), max duplication
    // degree, terminal-punctuation and link-token tallies (computed
    // and hash-compared; constant 0 on this corpus, live on raw lines
    // — BoilerplateSpec). All integers; the e4 fraction divides
    // non-negative operands.
    QueryDef(
      "q143_line_boilerplate_signals",
      (s, dir) => {
        // cache the line derivation (r19): the signal report reads it
        // twice (signals + dup counts) — was two tokenize+window
        // corpus passes. Construct runs no actions, so the early
        // one-shot release registration is exactly right here.
        val scope = new graft.CacheScope
        graft.CacheScope.releaseAfterNextAction(s, scope)
        lineSignalReport(
            scope.cache(linesTokenWindows(T.documents(s, dir))))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $linesTokenWindowsSql,
        sig AS (SELECT doc_id, line_idx, line,
                       ${X.h60Sql("line")} AS lh,
                       regexp_matches(line, '[.!?]$$') AS ends_terminal,
                       CAST(len(list_filter(string_split(line, ' '),
                         t -> t LIKE 'http%' OR t LIKE 'www%')) AS BIGINT)
                         AS n_link_tokens
                FROM ln),
        d AS (SELECT lh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
              FROM sig GROUP BY lh)
        SELECT doc_id, COUNT(*) AS n_lines,
               CAST(SUM(CASE WHEN nd >= $DupDocs THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_lines,
               CAST(SUM(CASE WHEN nd >= $DupDocs THEN 1 ELSE 0 END) * 10000
                 // COUNT(*) AS BIGINT) AS dup_line_frac_e4,
               MAX(nd) AS max_dup_docs,
               CAST(SUM(CASE WHEN ends_terminal THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_terminal_lines,
               CAST(SUM(n_link_tokens) AS BIGINT) AS n_link_tokens
        FROM sig JOIN d USING (lh)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q144: LINE REMOVAL — cut every line duplicated across ≥ 3 docs,
    // rejoin the survivors in order (space-joined: token-window lines
    // reassemble into the cleaned token stream), and hash the cleaned
    // text byte for byte (the q124 cut-and-rejoin discipline). Docs
    // whose every line was boilerplate still emit (0 lines, hash of
    // ""). A boundary shift, a dropped separator, or a wrong cut
    // anywhere in either engine corrupts cleaned_fp and fails loudly.
    QueryDef(
      "q144_line_boilerplate_removal",
      (s, dir) => {
        // cache the line derivation (r19): removal reads it four ways
        // (signals→dup counts, the kept join, the doc universe) — was
        // four tokenize+window corpus passes (q143's move).
        val scope = new graft.CacheScope
        graft.CacheScope.releaseAfterNextAction(s, scope)
        removeDuplicatedLines(
            scope.cache(linesTokenWindows(T.documents(s, dir))), " ")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $linesTokenWindowsSql,
        sig AS (SELECT doc_id, line_idx, line, ${X.h60Sql("line")} AS lh
                FROM ln),
        d AS (SELECT lh, COUNT(DISTINCT doc_id) AS nd FROM sig GROUP BY lh),
        kept AS (SELECT doc_id, COUNT(*) AS n_lines_kept,
                        CAST(SUM(len(string_split(line, ' '))) AS BIGINT)
                          AS n_tokens_kept,
                        string_agg(line, ' ' ORDER BY line_idx) AS cleaned
                 FROM sig JOIN d USING (lh)
                 WHERE nd < $DupDocs
                 GROUP BY doc_id)
        SELECT u.doc_id,
               coalesce(k.n_lines_kept, 0) AS n_lines_kept,
               coalesce(k.n_tokens_kept, 0) AS n_tokens_kept,
               ${X.h60Sql("coalesce(k.cleaned, '')")} AS cleaned_fp
        FROM (SELECT DISTINCT doc_id FROM ln) u
        LEFT JOIN kept k USING (doc_id)
        ORDER BY u.doc_id""")),

    // ------------------------------------------------------------------
    // q149: LINE STATS THROUGH THE CATALOG — seventh catalog-serving
    // member, and the incremental form of line boilerplate (the
    // q80/q89 incremental-dedup discipline applied to lines): the
    // per-line distinct-doc count table IS a linear sketch for
    // epoch-partitioned corpora (each doc in one epoch ⇒ counts are
    // additive), so epoch A's stats commit as v1, epoch B folds in as
    // v2 ≡ the union-corpus stats exactly (the law the oracle proves
    // by counting over ALL docs while the engine folds persisted
    // epoch tables). A probe batch (every 5th doc) is CLEANED under
    // EACH version: v1 cuts only epoch-A boilerplate forever (lines
    // unseen in v1 keep — never seen ⇒ nd 0), v2 cuts union
    // boilerplate — version isolation for the cleaning rule itself.
    QueryDef(
      "q149_line_stats_catalog_serving",
      (s, dir) => {
        val work = graft.Scratch.dir("q149")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val stSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "lh BIGINT, nd BIGINT")
        val docs = T.documents(s, dir)
        // ONE line-derivation pass (r19; was four): the token-window
        // table is per-doc map-side, so doc_id filters commute with it
        // exactly — cache it once, slice epochs and the probe from the
        // cache. The probe is cached too (both version branches clean
        // it). Values identical; only the pass count changes.
        val scope = new graft.CacheScope
        val lsig = scope.cache(linesTokenWindows(docs))
        // rebalance before write (guide §6 — the q122/q140 move)
        cat.writeNext("line_stats",
          lineStats(lsig.filter(col("doc_id") % 2 === 0)).hint("rebalance"))
        cat.writeNext("line_stats", mergeLineStats(
          cat.read("line_stats", 1, Some(stSchema)),
          lineStats(lsig.filter(col("doc_id") % 2 === 1))).hint("rebalance"))
        val probe = scope.cache(lsig.filter(col("doc_id") % 5 === 0))
        // registered AFTER the construct-time writes (the q140 lesson:
        // an early registration fires on the first write and drops the
        // cache before the returned plan runs)
        graft.CacheScope.releaseAfterNextAction(s, scope)
        (1 to 2).map { v =>
          removeLinesUnder(probe, cat.read("line_stats", v, Some(stSchema)), " ")
            .select(lit(v.toLong).as("version"), col("doc_id"),
              col("n_lines_kept"), col("n_tokens_kept"), col("cleaned_fp"))
        }.reduce(_ unionByName _).orderBy(col("version"), col("doc_id"))
      },
      Some(s"""
        WITH $linesTokenWindowsSql,
        sig AS (SELECT doc_id, line_idx, line, ${X.h60Sql("line")} AS lh
                FROM ln),
        -- v1 = epoch A (even doc_ids) alone; v2 = the additive fold,
        -- which IS the union-corpus count table (distinct-doc counts
        -- are additive across epoch-partitioned corpora)
        d1 AS (SELECT lh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
               FROM sig WHERE doc_id % 2 = 0 GROUP BY lh),
        d2 AS (SELECT lh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
               FROM sig GROUP BY lh),
        pl AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
        kept AS (
          SELECT 1 AS version, p.doc_id, COUNT(*) AS n_lines_kept,
                 CAST(SUM(len(string_split(p.line, ' '))) AS BIGINT)
                   AS n_tokens_kept,
                 string_agg(p.line, ' ' ORDER BY p.line_idx) AS cleaned
          FROM pl p LEFT JOIN d1 USING (lh)
          WHERE coalesce(d1.nd, 0) < $DupDocs GROUP BY p.doc_id
          UNION ALL
          SELECT 2, p.doc_id, COUNT(*),
                 CAST(SUM(len(string_split(p.line, ' '))) AS BIGINT),
                 string_agg(p.line, ' ' ORDER BY p.line_idx)
          FROM pl p LEFT JOIN d2 USING (lh)
          WHERE coalesce(d2.nd, 0) < $DupDocs GROUP BY p.doc_id)
        SELECT CAST(v.version AS BIGINT) AS version, u.doc_id,
               coalesce(k.n_lines_kept, 0) AS n_lines_kept,
               coalesce(k.n_tokens_kept, 0) AS n_tokens_kept,
               ${X.h60Sql("coalesce(k.cleaned, '')")} AS cleaned_fp
        FROM (SELECT DISTINCT doc_id FROM pl) u
        CROSS JOIN (SELECT unnest([1, 2]) AS version) v
        LEFT JOIN kept k ON k.version = v.version AND k.doc_id = u.doc_id
        ORDER BY version, u.doc_id"""))
  )
}
