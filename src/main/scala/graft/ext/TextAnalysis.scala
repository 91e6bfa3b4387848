package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: per-doc statistics,
  * n-gram-heuristic language ID, quality scoring, token counting
  * (whitespace + BPE-ish regex), and positional document fingerprinting.
  *
  * The reference (arbirk/ETL-template) has no text analytics — its only
  * scalar string work is sprintf/trim (tools/tools.go:533, etl.go:57);
  * this module is north-star surface for LLM-data pipelines.
  *
  * Scale notes (100 TB): every query here is scan → per-row HOF compute →
  * (optionally) one partial-aggregable group-by. No joins, no explodes:
  * token arrays never leave the row, so shuffle volume is O(groups).
  */
object TextAnalysis extends QueryModule {

  private val stop = X.stopwords
  private def stopArr = X.stopwordsArr
  private def stopSql = X.stopwordsSql

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q30: per-document token statistics. Counts are exact ints; the one
    // double (avg token length) is a single division of exact operands.
    QueryDef(
      "q30_text_stats",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
          .select(
            col("doc_id"),
            size(col("tk")).cast("long").as("n_tokens"),
            size(array_distinct(col("tk"))).cast("long").as("n_distinct"),
            aggregate(col("tk"), lit(0L), (a, t) => a + length(t)).as("sum_len"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            (col("sum_len").cast("double") / col("n_tokens").cast("double"))
              .as("avg_token_len"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
               CAST(list_aggregate(list_transform(tk, t -> length(t)), 'sum') AS DOUBLE)
                 / CAST(len(tk) AS DOUBLE) AS avg_token_len
        FROM (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents)
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q31: language ID by stopword-hit heuristic, validated against the
    // fixture's lang column; output is the (lang, guess) confusion matrix.
    QueryDef(
      "q31_lang_id",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("lang"), array_distinct(X.tokens(col("text"))).as("td"))
          .withColumn("hits", size(array_intersect(col("td"), stopArr)).cast("long"))
          .withColumn("guess", when(col("hits") >= 2, lit("en")).otherwise(lit("unk")))
          .groupBy(col("lang"), col("guess"))
          .agg(count(lit(1)).as("n"), sum(col("hits")).as("total_hits"))
          .orderBy(col("lang"), col("guess"))
      },
      Some(s"""
        SELECT lang, guess, COUNT(*) AS n, CAST(SUM(hits) AS BIGINT) AS total_hits
        FROM (SELECT lang, CAST(len(list_intersect(list_distinct(tk), $stopSql)) AS BIGINT) AS hits,
                     CASE WHEN len(list_intersect(list_distinct(tk), $stopSql)) >= 2
                          THEN 'en' ELSE 'unk' END AS guess
              FROM (SELECT lang, ${X.tokensSql("text")} AS tk FROM documents))
        GROUP BY lang, guess ORDER BY lang, guess""")),

    // ------------------------------------------------------------------
    // q32: composite quality score — length, stopword density, and
    // short-token penalty, linearly combined. All ratios are exact-int
    // divisions; the weighted sum applies identical double ops per engine.
    QueryDef(
      "q32_quality_score",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
          .withColumn("n", size(col("tk")).cast("long"))
          .withColumn("stop_hits",
            size(filter(col("tk"), t => t.isin(stop: _*))).cast("long"))
          .withColumn("short_hits",
            size(filter(col("tk"), t => length(t) <= 2)).cast("long"))
          .select(col("doc_id"),
            (least(col("n"), lit(200L)).cast("double") / 200.0 * 0.5
              + col("stop_hits").cast("double") / col("n").cast("double") * 0.3
              + (lit(1.0) - col("short_hits").cast("double") / col("n").cast("double")) * 0.2)
              .as("quality"))
          .withColumn("band",
            when(col("quality") >= 0.4, "high")
              .when(col("quality") >= 0.25, "mid").otherwise("low"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        SELECT doc_id, quality,
               CASE WHEN quality >= 0.4 THEN 'high'
                    WHEN quality >= 0.25 THEN 'mid' ELSE 'low' END AS band
        FROM (
          SELECT doc_id,
                 CAST(least(len(tk), 200) AS DOUBLE) / 200.0 * 0.5
                 + CAST(len(list_filter(tk, t -> list_contains($stopSql, t))) AS DOUBLE)
                   / CAST(len(tk) AS DOUBLE) * 0.3
                 + (1.0 - CAST(len(list_filter(tk, t -> length(t) <= 2)) AS DOUBLE)
                   / CAST(len(tk) AS DOUBLE)) * 0.2 AS quality
          FROM (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents))
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q33: token counting three ways per source — whitespace split,
    // BPE-ish regex segmentation, and the chars/4 heuristic.
    QueryDef(
      "q33_token_counts",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("source"),
            size(X.tokens(col("text"))).cast("long").as("ws"),
            size(regexp_extract_all(lower(col("text")),
              lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("bpe"),
            (length(col("text")).cast("long") / lit(4L)).cast("long").as("est"))
          .groupBy(col("source"))
          .agg(sum(col("ws")).as("ws_tokens"),
            sum(col("bpe")).as("bpe_tokens"),
            sum(col("est")).as("est_tokens"),
            count(lit(1)).as("n_docs"))
          .orderBy(col("source"))
      },
      Some("""
        SELECT source,
               CAST(SUM(ws) AS BIGINT) AS ws_tokens,
               CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
               CAST(SUM(est) AS BIGINT) AS est_tokens,
               COUNT(*) AS n_docs
        FROM (SELECT source,
                     CAST(len(list_filter(regexp_split_to_array(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +'), t -> t != '')) AS BIGINT) AS ws,
                     CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe,
                     CAST(length(text) // 4 AS BIGINT) AS est
              FROM documents)
        GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // q34: positional document fingerprint — Σ_i hash(token_i)·i mod P,
    // order-sensitive, collision-resistant enough for dedup bucketing.
    QueryDef(
      "q34_fingerprint",
      (s, dir) => {
        // compiled kernel (was: an aggregate-over-sequence HOF whose
        // lambda re-evaluated interpreted md5 per position); the oracle
        // keeps the declarative formulation, the kernel matches it
        // step for step (HashKernelsSpec asserts equality)
        T.documents(s, dir)
          .select(col("doc_id"), col("source"), X.tokens(col("text")).as("tk"))
          .withColumn("fp",
            graft.functions.HashFunctions.positionalFingerprint(col("tk")))
          .groupBy(col("source"))
          .agg(countDistinct(col("fp")).as("n_fingerprints"),
            count(lit(1)).as("n_docs"),
            min(col("fp")).as("min_fp"))
          .orderBy(col("source"))
      },
      Some(s"""
        SELECT source, COUNT(DISTINCT fp) AS n_fingerprints, COUNT(*) AS n_docs,
               MIN(fp) AS min_fp
        FROM (SELECT doc_id, source,
                     CASE WHEN len(tk) < 1 THEN CAST(0 AS BIGINT) ELSE
                       CAST(list_aggregate(list_transform(range(1, len(tk)+1),
                         i -> (${X.hpSql("tk[i]")} * i) % ${X.P}), 'sum') % ${X.P} AS BIGINT)
                     END AS fp
              FROM (SELECT doc_id, source, ${X.tokensSql("text")} AS tk FROM documents))
        GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // q35: vocabulary heavy hitters — top-20 tokens by term frequency
    // with document frequency. Scale shape: the exploded token stream
    // partial-aggregates map-side before one shuffle ∝ distinct
    // (token, doc) pairs, and the top-k is TakeOrderedAndProject (per-
    // partition heaps, never a global sort of the vocabulary).
    QueryDef(
      "q35_vocab_topk",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("doc_id"), explode(X.tokens(col("text"))).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
          .orderBy(col("tf").desc, col("token"))
          .limit(20)
      },
      Some(s"""
        SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(tk) AS token
              FROM (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents))
        GROUP BY token ORDER BY tf DESC, token LIMIT 20""")),

    // ------------------------------------------------------------------
    // q36: top-3 documents per source by length — via the bounded-heap
    // top_k aggregate (graft.functions.TopKOrdered), NOT a row_number
    // window: the window sort-shuffles every document to its group; the
    // heap aggregate partial-reduces each map task to ≤3 rows per group
    // before the exchange. The oracle states the same semantics with the
    // window (fine for DuckDB's single node).
    QueryDef(
      "q36_topk_docs_per_source",
      (s, dir) => {
        T.documents(s, dir)
          .groupBy(col("source"))
          .agg(graft.functions.AggFunctions.topK(
            struct(col("n_chars"), col("doc_id")), 3).as("top"))
          .select(col("source"), posexplode(col("top")))
          .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
            col("col.doc_id").as("doc_id"), col("col.n_chars").as("n_chars"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""
        SELECT source, rank, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id DESC) AS rank
          FROM documents)
        WHERE rank <= 3 ORDER BY source, rank""")),

    // ------------------------------------------------------------------
    // q37: deterministic stratified sampling — keep docs whose md5-based
    // hash (the engine-independent TextDsl hash, not Spark's murmur3 /
    // DuckDB's wyhash) lands in 1 of 10 residue classes. Hash-based
    // sampling is how a training-data pipeline samples at 100 TB:
    // map-side only, reproducible across reruns and engines, stable
    // under retries/partial failures, and consistent per key (a doc is
    // in or out everywhere it appears) — none of which rand() gives.
    QueryDef(
      "q37_stratified_sample",
      (s, dir) => {
        T.documents(s, dir)
          .filter(X.hp(col("doc_id").cast("string")) % 10 === 0)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("n_chars")).as("sampled_chars"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("source"))
      },
      Some(s"""
        SELECT source, COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
               MIN(doc_id) AS first_doc
        FROM documents
        WHERE ${X.hpSql("CAST(doc_id AS VARCHAR)")} % 10 = 0
        GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // q38: PII-style redaction — numbers and email-shaped tokens replaced
    // with placeholder tags; a pure map-side regexp pass (the scrubbing
    // stage of a training-data pipeline). Patterns stay in the common
    // Java-regex/RE2 subset (no backrefs/lookarounds) so both engines
    // rewrite identically; outputs are the redacted-text digest + counts
    // so huge documents never land in the compared result.
    QueryDef(
      "q38_redact",
      (s, dir) => {
        val email = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
        T.documents(s, dir)
          .select(col("doc_id"),
            md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
              "[0-9]+", "<NUM>")).as("redacted_md5"),
            size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
              .cast("long").as("n_numbers"),
            size(regexp_extract_all(col("text"), lit(email), lit(0)))
              .cast("long").as("n_emails"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               md5(regexp_replace(
                 regexp_replace(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
                 '[0-9]+', '<NUM>', 'g')) AS redacted_md5,
               CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
               CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+')) AS BIGINT)
                 AS n_emails
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q77: fixed-SIZE deterministic per-group sampling — the reservoir-
    // sample complement to q37's rate-based residue sampling: exactly k
    // docs per source, chosen as the k smallest md5 priorities
    // (A-Res with a deterministic priority, so the "random" sample is
    // reproducible across engines, reruns, and retries). Runs on the
    // bounded-heap top_k aggregate: each task ships ≤ k rows per group
    // (partial-aggregable), where row_number would sort-shuffle every
    // row — at 100 TB that is the difference between a k-row exchange
    // and a corpus-wide sort. Oracle = the row_number formulation.
    QueryDef(
      "q77_reservoir_sample",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("source"), col("doc_id"), col("n_chars"),
            X.hp(col("doc_id").cast("string")).as("pr"))
          .groupBy(col("source"))
          // top_k orders its struct DESC, so negate (priority, id) to get
          // the k smallest priorities with ascending-id ties
          .agg(graft.functions.AggFunctions.topK(
            struct((-col("pr")).as("npr"), (-col("doc_id")).as("ndid"),
              col("n_chars")), 5).as("top"))
          .select(col("source"), posexplode(col("top")))
          .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
            (-col("col.ndid")).as("doc_id"), (-col("col.npr")).as("priority"),
            col("col.n_chars").as("n_chars"))
          .orderBy(col("source"), col("rank"))
      },
      Some(s"""
        SELECT source, rank, doc_id, priority, n_chars FROM (
          SELECT source, doc_id, n_chars, pr AS priority,
                 row_number() OVER (PARTITION BY source
                   ORDER BY pr, doc_id) AS rank
          FROM (SELECT source, doc_id, n_chars,
                       ${X.hpSql("CAST(doc_id AS VARCHAR)")} AS pr
                FROM documents))
        WHERE rank <= 5 ORDER BY source, rank""")),

    // ------------------------------------------------------------------
    // q165: PARAGRAPH-LEVEL LANGUAGE SEGMENTATION — CCNet's actual LID
    // granularity (Wenzek et al. LREC 2020 run fastText per PARAGRAPH
    // and keep/split documents by the vote, because web pages mix
    // languages): the q31 stopword heuristic applied per token-window
    // "paragraph" (the Boilerplate.LineTokens windowing — the fixture
    // is single-line), then per document the paragraph vote: counts,
    // English share in basis points, majority label (en iff
    // 2·n_en ≥ n_paras — deterministic tie-to-en), and the
    // mixed-language flag (some but not all paragraphs English) that
    // a segmenting curation pass would split on. 100 TB: map-side
    // window derivation + one per-doc partial agg; nothing else.
    QueryDef(
      "q165_paragraph_lang",
      (s, dir) => {
        val docs = T.documents(s, dir)
        graft.ext.Boilerplate.linesTokenWindows(docs)
          .withColumn("hits",
            size(array_intersect(array_distinct(split(col("line"), " ")),
              stopArr)).cast("long"))
          .withColumn("is_en", col("hits") >= 2)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_paras"),
            sum(when(col("is_en"), 1L).otherwise(0L)).as("n_en"))
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .select(col("doc_id"), col("lang"), col("n_paras"), col("n_en"),
            expr("(n_en * 10000) div n_paras").as("en_bps"),
            when(col("n_en") * 2 >= col("n_paras"), "en").otherwise("unk")
              .as("doc_lang"),
            (col("n_en") > 0 && col("n_en") < col("n_paras")).as("mixed"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${graft.ext.Boilerplate.linesTokenWindowsSql},
        p AS (SELECT doc_id,
                     CAST(len(list_intersect(
                       list_distinct(string_split(line, ' ')), $stopSql))
                       AS BIGINT) >= 2 AS is_en
              FROM ln),
        a AS (SELECT doc_id, COUNT(*) AS n_paras,
                     CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_en
              FROM p GROUP BY doc_id)
        SELECT a.doc_id, d.lang, a.n_paras, a.n_en,
               a.n_en * 10000 // a.n_paras AS en_bps,
               CASE WHEN a.n_en * 2 >= a.n_paras THEN 'en' ELSE 'unk' END
                 AS doc_lang,
               a.n_en > 0 AND a.n_en < a.n_paras AS mixed
        FROM a JOIN documents d USING (doc_id)
        ORDER BY a.doc_id""")),

    // ------------------------------------------------------------------
    // q180: VOCABULARY GROWTH CURVE — the Heaps'-law saturation
    // measurement (Heaps 1978; "is more crawl still adding new
    // content?" is decided with exactly this curve): per ingest decile
    // (doc_id-range buckets — the ingest order), the count of NEW
    // 3-gram types (first corpus occurrence lands in that decile), the
    // cumulative type count, and the cumulative type/token ratio ×1e6.
    // A corpus that stops yielding new types stops being worth
    // ingesting; at sf0.01 the yield decays 2413 → 886 per decile with
    // TTR 917490 → 598012 — a live Heaps curve.
    //
    // 100 TB: types shuffle as 60-bit HASHES (8 bytes, the q56
    // discipline — collisions merge identically on both engines), the
    // one vocab-proportional exchange of the canonical measurement;
    // per-decile doc stats are ONE partial agg; everything after runs
    // on the 10-row grid. Deciles derive from a 1-row min/max
    // broadcast, map-side.
    QueryDef(
      "q180_vocab_growth",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = T.documents(s, dir)
        val mm = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
        val base = docs
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
          .select(col("doc_id"), size(col("tk")).cast("long").as("n"),
            array_distinct(X.shingles(col("tk"), 3)).as("sh"))
        val gper = base.crossJoin(broadcast(mm))
          .select(expr("((doc_id - lo) * 10) div (hi - lo + 1)").as("dec"),
            col("n"))
          .groupBy(col("dec"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
        val gnew = base
          .select(col("doc_id"), explode(transform(col("sh"), x => X.h60(x))).as("h"))
          .groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
          .crossJoin(broadcast(mm))
          .select(expr("((first_doc - lo) * 10) div (hi - lo + 1)").as("dec"))
          .groupBy(col("dec")).agg(count(lit(1)).as("new_types"))
        s.range(0, 10).select(col("id").as("decile"))
          .join(gper, col("decile") === gper("dec"), "left").drop("dec")
          .join(gnew, col("decile") === gnew("dec"), "left").drop("dec")
          .select(col("decile"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("new_types"), lit(0L)).as("new_types"))
          .withColumn("cum_types", sum(col("new_types")).over(
            Window.orderBy(col("decile"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(
            Window.orderBy(col("decile"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("decile"), col("n_docs"), col("n_tokens"),
            col("new_types"), col("cum_types"),
            when(col("cum_tokens") === 0L, 0L)
              .otherwise(expr("(cum_types * 1000000) div cum_tokens"))
              .as("ttr_e6"))
          .orderBy(col("decile"))
      },
      Some(s"""
        WITH gtok AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        gsh AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
                       list_distinct(${X.shinglesSql("tk", 3)}) AS sh
                FROM gtok),
        gmm AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
        gper AS (SELECT ((t.doc_id - m.lo) * 10) // (m.hi - m.lo + 1) AS dec,
                        COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
                 FROM gsh t, gmm m GROUP BY 1),
        gocc AS (SELECT u.h AS h, MIN(doc_id) AS first_doc
                 FROM gsh, unnest(list_transform(sh, x -> ${X.h60Sql("x")})) AS u(h)
                 GROUP BY 1),
        gnew AS (SELECT ((o.first_doc - m.lo) * 10) // (m.hi - m.lo + 1) AS dec,
                        COUNT(*) AS new_types
                 FROM gocc o, gmm m GROUP BY 1),
        ggrid AS (SELECT g.d AS decile,
                         coalesce(p.n_docs, 0) AS n_docs,
                         coalesce(p.n_tokens, 0) AS n_tokens,
                         coalesce(nw.new_types, 0) AS new_types
                  FROM (SELECT unnest(range(0, 10)) AS d) g
                  LEFT JOIN gper p ON p.dec = g.d
                  LEFT JOIN gnew nw ON nw.dec = g.d),
        gcum AS (SELECT decile, n_docs, n_tokens, new_types,
                        CAST(SUM(new_types) OVER (ORDER BY decile) AS BIGINT) AS cum_types,
                        CAST(SUM(n_tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens
                 FROM ggrid)
        SELECT decile, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(new_types AS BIGINT) AS new_types, cum_types,
               CAST(CASE WHEN cum_tokens = 0 THEN 0
                    ELSE (cum_types * 1000000) // cum_tokens END AS BIGINT) AS ttr_e6
        FROM gcum ORDER BY decile""")),

    // ------------------------------------------------------------------
    // q228: COLLOCATION MINING — adjacent-pair association by scaled
    // PMI ratio: for bigram (a,b), score_e6 = ((c_ab·10⁶ div c_a) · N)
    // div c_b ≈ 10⁶·N·p(ab)/(p(a)p(b)) — the lift a tokenizer/phrase-
    // vocabulary induction pass ranks merge candidates by, kept in
    // exact integer arithmetic instead of a float log (both engines
    // truncate identically; the inner div caps the intermediate at
    // 10⁶ so ·N stays int64-safe to N ≈ 9·10¹²). Support floor
    // c_ab ≥ 5 (the standard collocation noise gate), top-20 by
    // (score, bigram) via TakeOrderedAndProject — k rows per
    // partition ship. Counts: one bigram agg + one unigram agg + a
    // 1-row total broadcast; the unigram table joins twice (left and
    // right word), both sides broadcastable (vocabulary-sized).
    QueryDef(
      "q228_collocations",
      (s, dir) => {
        val tk = T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
        // persisted: the vocabulary-sized count table feeds the corpus
        // total AND both join sides — uncached each reference re-runs
        // the corpus tokenize+explode (measured: the ×100 scale point
        // went super-linear on exactly this, 3 corpus passes instead
        // of 1; bare persist per the verify/bench clearCache convention)
        val uni = tk.select(explode(col("tk")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("c"))
          .persist()
        val n1 = uni.agg(sum(col("c")).as("n_uni"))
        val bg = tk.select(explode(X.shingles(col("tk"), 2)).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 5L)
          .withColumn("a", split(col("bigram"), " ").getItem(0))
          .withColumn("b", split(col("bigram"), " ").getItem(1))
        bg.join(broadcast(uni.withColumnRenamed("t", "a")
            .withColumnRenamed("c", "c_a")), "a")
          .join(broadcast(uni.withColumnRenamed("t", "b")
            .withColumnRenamed("c", "c_b")), "b")
          .crossJoin(broadcast(n1))
          .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
            expr("(((c_ab * 1000000) div c_a) * n_uni) div c_b")
              .as("score_e6"))
          .orderBy(col("score_e6").desc, col("bigram"))
          .limit(20)
      },
      Some(s"""
        WITH cltk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk
                      FROM documents),
        cluni AS (SELECT t, COUNT(*) AS c
                  FROM cltk, unnest(tk) AS u(t) GROUP BY t),
        cln AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM cluni),
        clbg AS (SELECT g AS bigram, COUNT(*) AS c_ab
                 FROM cltk, unnest(${X.shinglesSql("tk", 2)}) AS u(g)
                 GROUP BY g HAVING COUNT(*) >= 5)
        SELECT bigram, c_ab, c_a, c_b, score_e6 FROM (
          SELECT bigram, c_ab, a.c AS c_a, b.c AS c_b,
                 (((c_ab * 1000000) // a.c) * n_uni) // b.c AS score_e6
          FROM clbg
          JOIN cluni a ON a.t = string_split(bigram, ' ')[1]
          JOIN cluni b ON b.t = string_split(bigram, ' ')[2]
          CROSS JOIN cln)
        ORDER BY score_e6 DESC, bigram LIMIT 20"""))
  )
}
