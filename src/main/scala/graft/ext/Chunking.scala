package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._

/** Document chunking and repetition analysis — the two remaining
  * pre-training text passes: slicing documents into overlapping
  * fixed-token windows (RAG / context-window packing input), and the
  * Gopher-style repetition signals that gate low-quality machine text.
  *
  * The reference (arbirk/ETL-template) has no text analytics (its
  * record transform is 1→1, etl.go:57); both operators are north-star
  * surface for LLM-data pipelines.
  *
  * Scale notes (100 TB): chunking is scan → per-row HOF → posexplode;
  * the explode multiplies rows by ~n/stride but each output row carries
  * only (id, chunk_id, fingerprint) — the chunk text itself stays
  * row-local and is reduced to a 60-bit hash before anything shuffles.
  * Repetition metrics are pure map-side folds (the top-token run count
  * works on the row's own sorted array — NO token explode, NO shuffle),
  * so the whole query shuffles only the final per-doc rows.
  */
object Chunking extends QueryModule {

  /** Chunk size / stride in tokens (overlap = size - stride). */
  private val C = 32
  private val S = 24

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q55: sliding-window token chunking. Chunk i covers tokens
    // [i·S, i·S + C); windows start while iS < n, so the trailing
    // partial window is kept (every token lands in ≥1 chunk). Each
    // chunk leaves the row as a 60-bit fingerprint, not text.
    QueryDef(
      "q55_doc_chunking",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
          .filter(size(col("tk")) > 0)
          .withColumn("chunks",
            expr(s"transform(sequence(0, (size(tk)-1) div $S), i -> slice(tk, i*$S + 1, $C))"))
          .select(col("doc_id"), posexplode(col("chunks")))
          .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
            size(col("col")).cast("long").as("n_tokens"),
            X.h60(concat_ws(" ", col("col"))).as("fp"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        ch AS (SELECT doc_id, unnest(range(0, ((len(tk)-1)//$S)+1)) AS chunk_id, tk
               FROM toks WHERE len(tk) > 0)
        SELECT doc_id, chunk_id,
               CAST(len(tk[chunk_id*$S+1 : chunk_id*$S+$C]) AS BIGINT) AS n_tokens,
               ${X.h60Sql(s"array_to_string(tk[chunk_id*$S+1 : chunk_id*$S+$C], ' ')")} AS fp
        FROM ch ORDER BY doc_id, chunk_id""")),

    // ------------------------------------------------------------------
    // q57: Gopher-style repetition signals per document — duplicate
    // 2-/3-gram fractions plus the top-token fraction (max run length
    // in the row's own SORTED token array — a single fold, zero
    // shuffle; the oracle computes the same integer via the O(d·n)
    // distinct-scan formulation, exactness makes them equal). All
    // divisions are single IEEE ops on exact integer operands.
    QueryDef(
      "q57_repetition_scores",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
          .filter(size(col("tk")) >= 3)
          .select(col("doc_id"), col("tk"),
            size(col("tk")).cast("long").as("n_tokens"),
            X.shingles(col("tk"), 2).as("s2"),
            X.shingles(col("tk"), 3).as("s3"))
          .select(col("doc_id"), col("n_tokens"),
            ((size(col("s2")) - size(array_distinct(col("s2")))).cast("double")
              / size(col("s2")).cast("double")).as("dup_2gram_frac"),
            ((size(col("s3")) - size(array_distinct(col("s3")))).cast("double")
              / size(col("s3")).cast("double")).as("dup_3gram_frac"),
            expr("""aggregate(sort_array(tk),
                named_struct('prev', '', 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
                (acc, t) -> named_struct(
                  'prev', t,
                  'run',  IF(t = acc.prev, acc.run + 1, CAST(1 AS BIGINT)),
                  'best', greatest(acc.best, IF(t = acc.prev, acc.run + 1, CAST(1 AS BIGINT)))),
                acc -> acc.best)""").as("top_cnt"))
          .select(col("doc_id"), col("n_tokens"),
            col("dup_2gram_frac"), col("dup_3gram_frac"),
            (col("top_cnt").cast("double") / col("n_tokens").cast("double"))
              .as("top_tok_frac"))
          .withColumn("flagged",
            col("dup_3gram_frac") > 0.05 || col("top_tok_frac") > 0.15)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        base AS (
          SELECT doc_id, tk, len(tk) AS n,
                 ${X.shinglesSql("tk", 2)} AS s2,
                 ${X.shinglesSql("tk", 3)} AS s3
          FROM toks WHERE len(tk) >= 3)
        SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
               CAST(len(s2) - len(list_distinct(s2)) AS DOUBLE)
                 / CAST(len(s2) AS DOUBLE) AS dup_2gram_frac,
               CAST(len(s3) - len(list_distinct(s3)) AS DOUBLE)
                 / CAST(len(s3) AS DOUBLE) AS dup_3gram_frac,
               CAST(list_max(list_transform(list_distinct(tk),
                      d -> len(list_filter(tk, x -> x = d)))) AS DOUBLE)
                 / CAST(n AS DOUBLE) AS top_tok_frac,
               (CAST(len(s3) - len(list_distinct(s3)) AS DOUBLE)
                  / CAST(len(s3) AS DOUBLE) > 0.05
                OR CAST(list_max(list_transform(list_distinct(tk),
                      d -> len(list_filter(tk, x -> x = d)))) AS DOUBLE)
                  / CAST(n AS DOUBLE) > 0.15) AS flagged
        FROM base ORDER BY doc_id"""))
  )
}
