package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring — BM25 ranking of documents against a fixed
  * query-term set. The missing piece between the text-analysis passes
  * (q30-q35) and similarity search (q50-q53): lexical relevance ranking,
  * the retrieval half of every RAG data pipeline.
  *
  * The reference (arbirk/ETL-template) has no retrieval surface; this is
  * north-star LLM-pipeline material.
  *
  * Scale shape (100 TB): term frequencies are row-local array filters
  * (NO token explode — the corpus never shuffles); the corpus statistics
  * (N, Σdl, per-term document frequencies) reduce to ONE row via
  * partial-aggregable sums and broadcast back; scoring is map-side; the
  * only ordered exchange is the top-k TakeOrderedAndProject, which ships
  * k rows per partition.
  *
  * Determinism: BM25 is floating-point, so the contract is the one used
  * everywhere in this library — exact integer operands (tf, df, dl, N
  * are exact longs; idf is floor-scaled to an int64), then a FIXED
  * parenthesization of IEEE ops mirrored token-for-token in the oracle
  * SQL. Per-doc scores sum over the query terms in declared order (a
  * fixed-width column sum, never a shuffle-order float aggregation).
  */
object Retrieval extends QueryModule {

  /** Query terms, in scoring order (fixture vocabulary). */
  private val terms = Seq("spark", "join", "window")
  // k1 = 1.2, b = 0.75 (the standard Robertson parameters); the literals
  // below are spelled identically in the oracle so both engines parse
  // the same doubles: k1+1 = 2.2, 1-b = 0.25.

  override val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q59_bm25_search",
      (s, dir) => {
        val docs = T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
          .withColumn("dl", size(col("tk")).cast("long"))
        val statAggs =
          sum(col("dl")).as("tot") +:
            terms.zipWithIndex.map { case (t, i) =>
              sum(when(array_contains(col("tk"), t), 1L).otherwise(0L))
                .as(s"df_$i")
            }
        val stats = docs.agg(count(lit(1)).as("n_docs"), statAggs: _*)
        val avgdl = col("tot").cast("double") / col("n_docs").cast("double")
        def tf(i: Int): Column =
          size(filter(col("tk"), x => x === lit(terms(i)))).cast("long")
        def idf(i: Int): Column =
          floor(lit(1000000.0d) * ((col("n_docs") - col(s"df_$i")).cast("double") + lit(0.5d))
            / (col(s"df_$i").cast("double") + lit(0.5d))).cast("long")
        def term(i: Int): Column = {
          val tfd = col(s"tf_$i").cast("double")
          (col(s"idf_$i").cast("double") * (tfd * lit(2.2d))) /
            (tfd + lit(1.2d) * (lit(0.25d) + (lit(0.75d) * col("dl").cast("double")) / col("avgdl")))
        }
        docs.crossJoin(broadcast(stats))
          .select(Seq(col("doc_id"), col("dl"), avgdl.as("avgdl")) ++
            terms.indices.map(i => tf(i).as(s"tf_$i")) ++
            terms.indices.map(i => idf(i).as(s"idf_$i")): _*)
          .withColumn("score", terms.indices.map(term).reduceLeft(_ + _))
          .filter(col("score") > 0d)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
          .select(col("doc_id"), col("dl"), col("score"))
      },
      Some(s"""
        WITH docs AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS dl
                      FROM (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents)),
        st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot,
${terms.zipWithIndex.map { case (t, i) =>
        s"               CAST(SUM(CASE WHEN list_contains(tk, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$i"
      }.mkString(",\n")}
               FROM docs),
        scored AS (
          SELECT doc_id, dl,
${terms.indices.map { i =>
        s"""            (CAST(idf_$i AS DOUBLE) * (CAST(tf_$i AS DOUBLE) * 2.2)) /
              (CAST(tf_$i AS DOUBLE) + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl))"""
      }.mkString("            ", "\n            + ", "")} AS score
          FROM (SELECT doc_id, dl,
${terms.zipWithIndex.map { case (t, i) =>
        s"                       CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf_$i"
      }.mkString(",\n")},
${terms.indices.map { i =>
        s"                       CAST(floor(1000000.0 * (CAST(n_docs - df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5)) AS BIGINT) AS idf_$i"
      }.mkString(",\n")},
                       CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
                FROM docs, st))
        SELECT doc_id, dl, score FROM scored
        WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20"""))
  )
}
