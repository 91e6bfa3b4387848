package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`: exact (hash group-by),
  * MinHash+LSH banding, SimHash, and exact n-gram Jaccard.
  *
  * The reference has no dedup of any kind (SURVEY.md §2.4 documents the
  * absence of group-by); these are north-star LLM-pipeline operators.
  *
  * Scale notes (100 TB):
  *  - exact dedup = one shuffle on the normalized-text hash; partial agg
  *    keeps the exchange ∝ distinct docs.
  *  - MinHash signatures are computed per-row with HOFs (no shuffle, no
  *    UDF); only the (band, band-signature) pairs — k ints per doc, not
  *    shingles — are exchanged for the LSH bucket join. Candidate pairs
  *    ∝ true near-dups, never O(n²).
  *  - SimHash likewise: 60-bit row-local fingerprint, then a 4×15-bit
  *    band join on the fingerprint only.
  *  - exact n-gram Jaccard (q43) IS O(shared-shingle pairs) — shipped as
  *    the recall baseline; production path is q41.
  */
object Dedup extends QueryModule {

  /** doc_id, distinct 3-word shingle set, and per-shingle hashes mod P. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir)
      .select(col("doc_id"),
        array_distinct(X.shingles(X.tokens(col("text")), 3)).as("sh"))
      .withColumn("hm", transform(col("sh"), x => X.hp(x)))

  private val shingledSqlCte =
    s"""toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
       shg AS (SELECT doc_id, list_distinct(${X.shinglesSql("tk", 3)}) AS sh FROM toks),
       hm AS (SELECT doc_id, sh, list_transform(sh, s -> ${X.hpSql("s")}) AS hm FROM shg)"""

  /** Exact Jaccard between two distinct shingle-set columns: intersection
    * and union counts are exact ints; one double division. */
  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") /
      (size(a) + size(b) - inter).cast("double")
  }

  private def jaccardSql(a: String, b: String): String =
    s"(CAST(len(list_intersect($a, $b)) AS DOUBLE) / " +
      s"CAST(len($a) + len($b) - len(list_intersect($a, $b)) AS DOUBLE))"

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q40: exact dedup — group by normalized text, keep min doc_id.
    QueryDef(
      "q40_dedup_exact",
      (s, dir) => {
        T.documents(s, dir)
          .select(col("doc_id"),
            concat_ws(" ", X.tokens(col("text"))).as("norm"))
          .groupBy(col("norm"))
          .agg(min(col("doc_id")).as("survivor_id"),
            count(lit(1)).as("n_copies"))
          .select(col("survivor_id"), col("n_copies"))
          .orderBy(col("survivor_id"))
      },
      Some(s"""
        SELECT MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
        FROM (SELECT doc_id, array_to_string(${X.tokensSql("text")}, ' ') AS norm
              FROM documents)
        GROUP BY norm ORDER BY survivor_id""")),

    // ------------------------------------------------------------------
    // q41: MinHash + LSH near-dup: 12 minhashes, 3 bands × 4 rows;
    // candidates = band-signature collisions; verify with exact Jaccard.
    QueryDef(
      "q41_dedup_minhash_lsh",
      (s, dir) => {
        val base = shingled(s, dir)
          .withColumn("sig", X.minhashSig(col("hm"), 12))
        val bands = base.select(col("doc_id"),
            explode(transform(sequence(lit(0), lit(2)), b =>
              struct(b.as("band"),
                concat_ws("-", slice(col("sig"), b * 4 + 1, lit(4))).as("bsig"))))
              .as("bd"))
          .select(col("doc_id"), col("bd.band").as("band"), col("bd.bsig").as("bsig"))
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val sets = base.select(col("doc_id"), col("sh"))
        cand
          .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
          .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
          .filter(size(col("sha")) > 0)
          .withColumn("jac", jaccard(col("sha"), col("shb")))
          .filter(col("jac") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("jac"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH $shingledSqlCte,
        sig AS (SELECT doc_id, sh, ${X.minhashSigSql("hm", 12)} AS sig FROM hm),
        bands AS (SELECT doc_id, bnd, array_to_string(sig[bnd*4+1:bnd*4+4], '-') AS bsig
                  FROM sig, (SELECT unnest(range(0, 3)) AS bnd)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.bnd = b.bnd AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, ${jaccardSql("x.sh", "y.sh")} AS jac
        FROM cand JOIN sig x ON x.doc_id = doc_a JOIN sig y ON y.doc_id = doc_b
        WHERE len(x.sh) > 0 AND ${jaccardSql("x.sh", "y.sh")} >= 0.5
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q42: SimHash near-dup: 60-bit row-local fingerprint from token
    // hashes, 4×15-bit LSH bands, hamming-distance verify (≤ 12 bits).
    QueryDef(
      "q42_dedup_simhash",
      (s, dir) => {
        val base = T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
          .withColumn("hs", transform(col("tk"), t => X.h60(t)))
          .withColumn("sim", X.simhash("hs"))
          .select(col("doc_id"), col("sim"))
        val bands = base.select(col("doc_id"), col("sim"),
            explode(expr(
              "transform(sequence(0, 3), b -> struct(b AS band, shiftright(sim, b*15) % 32768 AS bval))"))
              .as("bd"))
          .select(col("doc_id"), col("sim"),
            col("bd.band").as("band"), col("bd.bval").as("bval"))
        bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sim").as("sa"), col("b.sim").as("sb"))
          .distinct()
          .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
          .filter(col("hamming") <= 12)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        hs AS (SELECT doc_id, list_transform(tk, t -> ${X.h60Sql("t")}) AS hs FROM toks),
        sim AS (SELECT doc_id, ${X.simhashSql("hs")} AS sim FROM hs),
        bands AS (SELECT doc_id, sim, bnd, (sim >> (bnd*15)) % 32768 AS bval
                  FROM sim, (SELECT unnest(range(0, 4)) AS bnd)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        a.sim AS sa, b.sim AS sb
                 FROM bands a JOIN bands b
                   ON a.bnd = b.bnd AND a.bval = b.bval AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 12
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q43: exact n-gram Jaccard near-dup — shared-shingle candidate join
    // (full recall; the O(n²)-risk baseline that q41 approximates).
    QueryDef(
      "q43_dedup_ngram_jaccard",
      (s, dir) => {
        val base = shingled(s, dir)
        val ex = base.select(col("doc_id"), explode(col("sh")).as("s"))
        val cand = ex.as("a")
          .join(ex.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val sets = base.select(col("doc_id"), col("sh"))
        cand
          .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
          .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
          .withColumn("jac", jaccard(col("sha"), col("shb")))
          .filter(col("jac") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("jac"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH $shingledSqlCte,
        ex AS (SELECT doc_id, unnest(sh) AS s FROM shg),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, ${jaccardSql("x.sh", "y.sh")} AS jac
        FROM cand JOIN shg x ON x.doc_id = doc_a JOIN shg y ON y.doc_id = doc_b
        WHERE ${jaccardSql("x.sh", "y.sh")} >= 0.5
        ORDER BY doc_a, doc_b"""))
  )
}
