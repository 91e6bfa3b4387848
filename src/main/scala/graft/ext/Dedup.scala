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
  *  - MinHash signatures are computed per-row with single-fold HOFs (no
  *    shuffle, no UDF, input hashed exactly once per row); the signature
  *    table is persisted so banding and Jaccard verification share ONE
  *    computation — at cluster scale this materialization would be a
  *    checkpoint to storage, the standard shape of a minhash pipeline.
  *  - candidate pairs come from groupBy(band-signature) + collect_list +
  *    in-row pair expansion: one exchange of (band, sig, doc_id) tuples —
  *    k ints per doc, not shingles — and work ∝ Σ bucket², never O(n²).
  *    Empty-shingle docs are filtered BEFORE banding: they all share the
  *    degenerate all-P signature and would otherwise form one quadratic
  *    bucket (they can never be true near-dups — Jaccard is 0/0).
  *  - exact n-gram Jaccard (q43) IS O(shared-shingle pairs) — shipped as
  *    the recall baseline; production path is q41.
  */
object Dedup extends QueryModule {

  /** doc_id and the distinct 3-word shingle set. Staged projections
    * (tk, then sh) keep each stage's input referenced ≥2× so
    * CollapseProject cannot inline the tokenizer into every downstream
    * lambda. Hashing happens in the compiled kernels
    * (graft.functions.HashKernels), not in HOF space. */
  private def shingled(s: SparkSession, dir: String, minTokens: Int = 0): DataFrame = {
    val toks = T.documents(s, dir)
      .select(col("doc_id"), X.tokens(col("text")).as("tk"))
    // Filter on token count, not on size(sh) downstream: an equivalent
    // predicate (shingles empty ⟺ tokens < n) that stays cheap when
    // predicate pushdown substitutes it below the projections.
    val kept = if (minTokens > 0) toks.filter(size(col("tk")) >= minTokens) else toks
    kept.select(col("doc_id"), array_distinct(X.shingles(col("tk"), 3)).as("sh"))
  }

  private def shingledSqlCteFrom(from: String) =
    s"""toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM $from),
       shg AS (SELECT doc_id, list_distinct(${X.shinglesSql("tk", 3)}) AS sh FROM toks),
       hm AS (SELECT doc_id, sh, list_transform(sh, s -> ${X.hpSql("s")}) AS hm FROM shg)"""

  private val shingledSqlCte = shingledSqlCteFrom("documents")

  /** Oracle CTE chain up to the verified MinHash-LSH pair set
    * (q41 parameters: 12 hashes, 3 bands × 4 rows, Jaccard ≥ 0.5) —
    * shared by q41 (pair listing) and q46 (transitive clusters). */
  private def minhashPairsSqlCte(jacFilter: String = "0.5",
      from: String = "documents") =
    s"""${shingledSqlCteFrom(from)},
       sig AS (SELECT doc_id, sh, ${X.minhashSigSql("hm", 12)} AS sig FROM hm WHERE len(sh) > 0),
       bands AS (SELECT doc_id, bnd, array_to_string(sig[bnd*4+1:bnd*4+4], '-') AS bsig
                 FROM sig, (SELECT unnest(range(0, 3)) AS bnd)),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.bnd = b.bnd AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
       mh_pairs AS (SELECT doc_a, doc_b, ${jaccardSql("x.sh", "y.sh")} AS jac
                    FROM cand JOIN sig x ON x.doc_id = doc_a JOIN sig y ON y.doc_id = doc_b
                    WHERE len(x.sh) > 0 AND ${jaccardSql("x.sh", "y.sh")} >= $jacFilter)"""

  /** All (a, b) pairs with a < b from a bucket's collected sorted id
    * array — in-row expansion after the band group-by, so candidate
    * generation is a single aggregation, not a self-join that recomputes
    * the signature pipeline on both sides. Compiled kernel. */
  private def pairsOf(ids: Column): Column =
    graft.functions.HashFunctions.sortedIdPairs(ids)

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

  /** digit → unicode fragment map for q100's parity fixture — ONE
    * definition feeding both engines, covering the classes where
    * byte-, UTF-16- and codepoint-level implementations disagree:
    * astral-plane chars (🙂 U+1F642, 𝛼 U+1D6FC: 4 UTF-8 bytes, 2
    * UTF-16 units, ONE codepoint edit), a combining mark (e+U+0301 —
    * TWO codepoints, canonically equal but NOT codepoint-equal to
    * precomposed é U+00E9), and multi-codepoint expansions (λμ). */
  private val uniMap = Seq(
    "0" -> "α", "1" -> "β", "2" -> "𝛼", "3" -> "é", "4" -> "é",
    "5" -> "ß", "6" -> "中", "7" -> "🙂", "8" -> "k", "9" -> "λμ")

  /** The doc_id → unicode-string expression q100's engine and oracle
    * share: digits of (doc_id·7919 mod 1e5) replaced through
    * [[uniMap]]. `strType` is the only dialect difference (Spark casts
    * to STRING, DuckDB to VARCHAR). */
  private def uniStringSql(strType: String): String =
    uniMap.foldLeft(s"CAST(doc_id * 7919 % 100000 AS $strType)") {
      case (acc, (d, r)) => s"replace($acc, '$d', '$r')"
    }

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q40: exact dedup — group by normalized text, keep min doc_id.
    QueryDef(
      "q40_dedup_exact",
      (s, dir) => {
        graft.operators.NearDup.exact(T.documents(s, dir),
            col("doc_id"), concat_ws(" ", X.tokens(col("text"))))
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
        graft.operators.NearDup.minhashLsh(T.documents(s, dir),
            col("doc_id"), col("text"),
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH ${minhashPairsSqlCte()}
        SELECT doc_a, doc_b, jac FROM mh_pairs
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q80: incremental near-dup — the q41 pass restricted to pairs that
    // involve the "new batch" (odd doc_ids stand in for today's
    // arrivals; even ids are the already-deduped corpus). The operator
    // joins only new band tuples against shared buckets, so the oracle
    // is exactly q41's pair set filtered to ≥1 new member — the
    // incremental contract: old-old pairs were resolved by the prior
    // run and must not be recomputed or re-emitted.
    QueryDef(
      "q80_dedup_incremental",
      (s, dir) => {
        graft.operators.NearDup.minhashLshIncremental(T.documents(s, dir),
            col("doc_id"), col("text"), col("doc_id") % 2 === 1,
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH ${minhashPairsSqlCte()}
        SELECT doc_a, doc_b, jac FROM mh_pairs
        WHERE doc_a % 2 = 1 OR doc_b % 2 = 1
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q82: the signature TABLE as a first-class, hash-checked artifact —
    // what a production run persists to the catalog between incremental
    // passes (q80 consumes it). Signatures leave the row as a joined
    // key string so the compare needs no array support; n_shingles pins
    // the shingle sets too.
    QueryDef(
      "q82_minhash_signatures",
      (s, dir) => {
        graft.operators.NearDup.minhashSignatures(T.documents(s, dir),
            col("doc_id"), col("text"), numHashes = 12, shingleWidth = 3)
          .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
            concat_ws("-", col("sig")).as("sig_key"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $shingledSqlCte,
        sig AS (SELECT doc_id, sh, ${X.minhashSigSql("hm", 12)} AS sig
                FROM hm WHERE len(sh) > 0)
        SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
               array_to_string(sig, '-') AS sig_key
        FROM sig ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q46: transitive dedup clusters — the q41 pair set closed into
    // connected components (A~B~C collapses to one survivor even when A
    // and C never shared a bucket), via Graph.connectedComponents'
    // min-label propagation; the oracle closes the same edges with a
    // recursive CTE. The pair-based greedy (drop every doc_b) that q45
    // uses is one-pass; this is the exact-cluster upgrade.
    QueryDef(
      "q46_dedup_clusters",
      (s, dir) => {
        val pairs = graft.operators.NearDup.minhashLsh(T.documents(s, dir),
            col("doc_id"), col("text"),
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        graft.operators.Graph.connectedComponents(pairs)
          .groupBy(col("label").as("survivor_id"))
          .agg(count(lit(1)).as("cluster_size"))
          .orderBy(col("survivor_id"))
      },
      Some(s"""
        WITH RECURSIVE ${minhashPairsSqlCte()},
        edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                  UNION SELECT doc_b, doc_a FROM mh_pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lbl AS (SELECT r.a AS doc, least(MIN(r.b), r.a) AS root
                FROM reach r GROUP BY r.a)
        SELECT root AS survivor_id, COUNT(*) AS cluster_size
        FROM lbl GROUP BY root ORDER BY survivor_id""")),

    // ------------------------------------------------------------------
    // q129: QUALITY-AWARE survivor selection — q46 keeps each cluster's
    // min-id doc (an arbitrary identity); real dedup keeps the BEST
    // member (Lee et al. ACL 2022 keep the longest). Per connected
    // near-dup cluster: survivor = argmax token count, ties to the
    // smaller doc_id — the argmax as ONE max(struct(n_tokens,
    // -doc_id)) partial-aggregable MAX, no per-cluster window sort.
    // The cluster label stays in the output so the selection is
    // auditable against q46's identity.
    QueryDef(
      "q129_dedup_survivor_quality",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val pairs = graft.operators.NearDup.minhashLsh(docs,
            col("doc_id"), col("text"),
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val ntok = docs.select(col("doc_id"),
          size(X.tokens(col("text"))).cast("long").as("n_tokens"))
        graft.operators.Graph.connectedComponents(pairs)
          .join(ntok, col("node") === col("doc_id"))
          .groupBy(col("label").as("cluster_root"))
          .agg(count(lit(1)).as("cluster_size"),
            max(struct(col("n_tokens"), (-col("doc_id")).as("neg"))).as("s"))
          .select(col("cluster_root"), col("cluster_size"),
            col("s.neg").cast("long").as("neg"),
            col("s.n_tokens").as("survivor_tokens"))
          .select(col("cluster_root"), col("cluster_size"),
            (-col("neg")).as("survivor_id"), col("survivor_tokens"),
            (col("cluster_size") - 1).as("n_dropped"))
          .orderBy(col("cluster_root"))
      },
      Some(s"""
        WITH RECURSIVE ${minhashPairsSqlCte()},
        edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                  UNION SELECT doc_b, doc_a FROM mh_pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lbl AS (SELECT r.a AS doc, least(MIN(r.b), r.a) AS root
                FROM reach r GROUP BY r.a),
        nt AS (SELECT doc_id, CAST(len(${X.tokensSql("text")}) AS BIGINT)
                        AS n_tokens
               FROM documents),
        ranked AS (SELECT l.root, l.doc, n.n_tokens,
                          row_number() OVER (PARTITION BY l.root
                            ORDER BY n.n_tokens DESC, l.doc) AS rn,
                          COUNT(*) OVER (PARTITION BY l.root) AS sz
                   FROM lbl l JOIN nt n ON n.doc_id = l.doc)
        SELECT root AS cluster_root, CAST(sz AS BIGINT) AS cluster_size,
               doc AS survivor_id, n_tokens AS survivor_tokens,
               CAST(sz - 1 AS BIGINT) AS n_dropped
        FROM ranked WHERE rn = 1 ORDER BY cluster_root""")),

    // ------------------------------------------------------------------
    // q42: SimHash near-dup: 60-bit row-local fingerprint from token
    // hashes, 4×15-bit LSH bands, hamming-distance verify (≤ 12 bits).
    // The fingerprint rides through the band group-by inside the
    // collected struct, so no verify join-back is needed at all.
    QueryDef(
      "q42_dedup_simhash",
      (s, dir) => {
        // Persisted: the capped bucket group-by scans the banded stream
        // twice (size pass + membership pass); the fingerprint table is
        // 2 longs/doc, so materializing it beats re-hashing every token.
        val base = T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
          .select(col("doc_id"),
            graft.functions.HashFunctions.simhash60(col("tk")).as("sim"))
          .persist()
        val bands = base.select(
            struct(col("doc_id"), col("sim")).as("ds"),
            explode(expr(
              "transform(sequence(0, 3), b -> struct(b AS band, shiftright(sim, b*15) % 32768 AS bval))"))
              .as("bd"))
          .select(col("ds"), col("bd.band").as("band"), col("bd.bval").as("bval"))
        // compiled in-bucket expansion (ids sorted by doc_id, sim rides
        // along) — was an interpreted nested-transform HOF allocating a
        // struct per candidate
        graft.operators.NearDup.cappedBuckets(
            bands, Seq("band", "bval"), "ds", 1024, "simhash_bucket_cap")
          .select(explode(
            graft.functions.HashFunctions.sortedPayloadPairs(col("ids"))).as("p"))
          .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
            col("p.sa").as("sa"), col("p.sb").as("sb"))
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
    // q43: exact n-gram Jaccard near-dup — shared-shingle candidate
    // group-by (full recall; the O(n²)-risk baseline q41 approximates).
    QueryDef(
      "q43_dedup_ngram_jaccard",
      (s, dir) => {
        // |a ∩ b| = number of shingles the pair shares = the pair's
        // multiplicity in the exploded shingle → pair expansion, so the
        // Jaccard verification is a count aggregation — no distinct, no
        // join back to the full shingle arrays, no array_intersect.
        // Only |a| and |b| need a lookup. NO broadcast hint on the size
        // table: it grows with doc count, so a forced broadcast is a
        // driver OOM at 10⁹ docs — left to AQE, which broadcasts it only
        // while it actually fits and shuffle-joins beyond that.
        val base = shingled(s, dir).select(col("doc_id"), col("sh")).persist()
        val sizes = base.select(col("doc_id"), size(col("sh")).as("sz"))
        // The bucket cap here IS the document-frequency cap: a shingle
        // shared by df docs expands to df²/2 pairs, so candidate work is
        // Σ df² and one stopword-ish shingle with df=10⁵ yields ~10¹⁰
        // pairs. Capping df drops only near-zero-information shingles
        // (|a∩b| loses at most the capped shingles; high-Jaccard pairs
        // share many low-df shingles too). Fixture df max ≪ 1024, so
        // small-scale results are unchanged — asserted by the oracle gate.
        val inter = graft.operators.NearDup.cappedBuckets(
            base.select(col("doc_id"), explode(col("sh")).as("s")),
            Seq("s"), "doc_id", 1024, "ngram_df_cap")
          .select(explode(pairsOf(col("ids"))).as("p"))
          .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
          .withColumn("jac", col("inter").cast("double") /
            (col("sza") + col("szb") - col("inter")).cast("double"))
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
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q44: embedding-cosine near-dup — candidates from 4 bands × 4
    // sign-bit hyperplane LSH over the first 16 dims (multi-band trades
    // precision for recall at moderate thresholds), verified with the
    // exact integer-scaled cosine. documents.doc_id == embeddings.vec_id
    // (FIXTURES.md), so these are document near-dups by embedding.
    // Threshold 0.4 suits the fixture's near-orthogonal vectors (max
    // pairwise cos ≈ 0.51); real corpora would use ≥ 0.9 and more bands.
    QueryDef(
      "q44_dedup_embedding_cosine",
      (s, dir) => {
        graft.operators.SimilarityJoin.cosineLsh(T.embeddings(s, dir),
            col("vec_id"), col("embedding"),
            bands = 4, bitsPerBand = 4, threshold = 0.4)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH sc AS (SELECT vec_id AS doc_id, ${X.scaledVecSql("embedding")} AS v FROM embeddings),
        scn AS (SELECT doc_id, v, ${X.norm2IntSql("v")} AS n2 FROM sc),
        bands AS (SELECT doc_id, bnd,
                    list_aggregate(list_transform(range(1, 5),
                      i -> CASE WHEN v[CAST(bnd*4 + i AS INT)] >= 0
                                THEN (CAST(1 AS BIGINT) << (i-1))
                                ELSE CAST(0 AS BIGINT) END), 'sum') AS bits
                  FROM scn, (SELECT unnest(range(0, 4)) AS bnd)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.bnd = b.bnd AND a.bits = b.bits AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               ${X.cosineFromIntsSql(X.dotIntSql("x.v", "y.v"), "x.n2", "y.n2")} AS cos
        FROM cand JOIN scn x ON x.doc_id = doc_a JOIN scn y ON y.doc_id = doc_b
        WHERE ${X.cosineFromIntsSql(X.dotIntSql("x.v", "y.v"), "x.n2", "y.n2")} >= 0.4
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q88: fuzzy (edit-distance) dedup — the entity-resolution modality
    // the token/shingle passes miss: single-character typo duplicates.
    // Semantics: a part is a duplicate iff some LOWER-key part's name is
    // within one edit (incl. exact copies); summarized per name length.
    //
    // Scale shape (why this isn't an all-pairs query): exact-copy mass
    // resolves in ONE hash aggregation (the q40 move) — no pair ever
    // forms between same-name parts, which is where corpus-proportional
    // quadratics live. The fuzzy pass then runs only over DISTINCT
    // names (the entity vocabulary — 64 here, bounded at any corpus
    // size) using deletion-neighborhood keys: FULL recall for dist ≤ 1
    // by construction, intrinsically small buckets, so the oracle's
    // exact all-pairs definition is matched with no cap caveat. A rep
    // (min-key part of its name) is a dup iff some name within one edit
    // has a smaller min key; every non-rep is a dup of its name's rep.
    QueryDef(
      "q88_dedup_edit_distance",
      (s, dir) => {
        // no persist: editDistancePairs caches its own projection of
        // this through its CacheScope, and the summary's second read is
        // one cheap hash agg over part — recomputing beats holding two
        // cached copies of the vocabulary table
        val names = T.part(s, dir)
          .groupBy(col("p_name"))
          .agg(min(col("p_partkey")).as("rep"), count(lit(1)).as("copies"))
        val pairs = graft.operators.NearDup.editDistancePairs(
          names, col("rep"), col("p_name"),
          graft.operators.NearDup.deletionVariants(col("p_name")), maxDist = 1)
        // doc_a < doc_b always ⇒ doc_b's name has a smaller-rep neighbor
        val repDups = pairs.select(col("doc_b").as("rep")).distinct()
          .withColumn("rep_dup", lit(1L))
        names.join(repDups, Seq("rep"), "left")
          .groupBy(length(col("p_name")).cast("long").as("name_len"))
          .agg(sum(col("copies")).as("n_parts"),
            sum(col("copies") - 1L + coalesce(col("rep_dup"), lit(0L)))
              .as("n_dups"))
          .select(col("name_len"), col("n_parts"), col("n_dups"),
            (col("n_parts") - col("n_dups")).as("n_kept"))
          .orderBy(col("name_len"))
      },
      Some("""
        WITH p AS (SELECT p_partkey, p_name FROM part),
        dup AS (SELECT DISTINCT b.p_partkey AS pk
                FROM p a JOIN p b
                  ON a.p_partkey < b.p_partkey
                  AND abs(length(a.p_name) - length(b.p_name)) <= 1
                WHERE levenshtein(a.p_name, b.p_name) <= 1)
        SELECT length(p.p_name) AS name_len, COUNT(*) AS n_parts,
               COUNT(d.pk) AS n_dups,
               COUNT(*) - COUNT(d.pk) AS n_kept
        FROM p LEFT JOIN dup d ON d.pk = p.p_partkey
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // q100: NON-ASCII edit-distance parity — upgrading q88's unicode
    // note from "documented contract" to "tested". DuckDB's builtin
    // levenshtein counts UTF-8 BYTE edits, so the oracle implements the
    // CODEPOINT-level DP itself: codepoints via regexp_extract_all
    // (RE2's '.' matches one codepoint), DP rows unrolled through a
    // recursive CTE whose per-row fold is a list_reduce with a
    // list-typed accumulator. Inputs derive from doc_ids through a
    // shared digit → unicode map that exercises every nasty class:
    // astral plane (🙂, 𝛼 — 2 UTF-16 units, 4 UTF-8 bytes, ONE edit),
    // combining marks (e+U+0301, TWO codepoints ≠ precomposed é), and
    // multi-codepoint expansions (λμ). Spark's levenshtein + length
    // must agree with the DP bit-for-bit — they do because both are
    // codepoint-level (the engine property OperatorsSpec pins).
    QueryDef(
      "q100_edit_distance_unicode",
      (s, dir) => {
        val u = T.documents(s, dir).filter(col("doc_id") < 40)
          .select(col("doc_id"), expr(uniStringSql("STRING")).as("s"))
        val a = u.select(col("doc_id").as("pid"), col("s").as("sa"))
        val b = u.select((col("doc_id") - 1).as("pid"), col("s").as("sb"))
        a.join(b, "pid")
          .select(col("pid"),
            length(col("sa")).cast("long").as("cp_a"),
            length(col("sb")).cast("long").as("cp_b"),
            levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
          .orderBy(col("pid"))
      },
      Some(s"""
        WITH RECURSIVE
        u AS (SELECT doc_id, ${uniStringSql("VARCHAR")} AS s
              FROM documents WHERE doc_id < 40),
        up AS (SELECT a.doc_id AS pid, a.s AS sa, b.s AS sb
               FROM u a JOIN u b ON b.doc_id = a.doc_id + 1),
        cp AS (SELECT pid, regexp_extract_all(sa, '.') AS ca,
                      regexp_extract_all(sb, '.') AS cb FROM up),
        dp AS (
          SELECT pid, 0 AS i, ca, cb,
                 list_transform(range(0, len(cb)+1), j -> CAST(j AS BIGINT)) AS row
          FROM cp
          UNION ALL
          SELECT pid, i+1, ca, cb,
                 list_reduce(
                   list_concat([[CAST(i+1 AS BIGINT)]],
                               list_transform(range(1, len(cb)+1), j -> [CAST(j AS BIGINT)])),
                   (acc, x) -> list_append(acc, least(
                       row[x[1]+1] + 1,
                       acc[len(acc)] + 1,
                       row[x[1]] + CASE WHEN ca[i+1] = cb[x[1]] THEN 0 ELSE 1 END))) AS row
          FROM dp WHERE i < len(ca))
        SELECT pid, CAST(len(ca) AS BIGINT) AS cp_a, CAST(len(cb) AS BIGINT) AS cp_b,
               CAST(row[len(cb)+1] AS BIGINT) AS dist
        FROM dp WHERE i = len(ca) ORDER BY pid""")),

    // ------------------------------------------------------------------
    // q123: repeated-span coverage per document (ExactSubstr dedup
    // signal, Lee et al. ACL 2022 — see [[repeatedSpanCoverage]]). The
    // whole table is hash-checked: occurrence counting, the hash
    // keying, AND the interval-union sweep must all agree exactly.
    QueryDef(
      "q123_repeated_span_coverage",
      (s, dir) => repeatedSpanCoverage(T.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""
        WITH toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        sl AS (SELECT doc_id, len(tk) AS n_tokens,
                      ${X.shinglesSql("tk", 10)} AS sh
               FROM toks),
        pos AS (SELECT doc_id, sh, unnest(range(1, len(sh)+1)) AS i FROM sl),
        keyed AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                         ${X.h60Sql("sh[i]")} AS k
                  FROM pos),
        rep AS (SELECT k FROM keyed GROUP BY k HAVING COUNT(*) >= 2),
        sw AS (SELECT doc_id, pos,
                      max(pos + 10) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS prev_end
               FROM keyed JOIN rep USING (k)),
        cov AS (SELECT doc_id, COUNT(*) AS n_rep_spans,
                       CAST(SUM(greatest(0, pos + 10
                         - greatest(pos, coalesce(prev_end, -1)))) AS BIGINT)
                         AS covered_tokens
                FROM sw GROUP BY doc_id)
        SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
               coalesce(c.n_rep_spans, 0) AS n_rep_spans,
               coalesce(c.covered_tokens, 0) AS covered_tokens,
               CASE WHEN d.n_tokens = 0 THEN 0
                    ELSE coalesce(c.covered_tokens, 0) * 100 // d.n_tokens
               END AS coverage_pct
        FROM (SELECT doc_id, n_tokens FROM sl) d
        LEFT JOIN cov c USING (doc_id)
        ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // q124: repeated-span REMOVAL — the apply step of the ExactSubstr
    // pair (q123 measures, this cuts; see [[removeRepeatedSpans]]).
    // The cleaned text itself is hash-compared, so span explosion, the
    // anti-join, and the ordered token reassembly must all agree
    // byte-for-byte on every document.
    QueryDef(
      "q124_repeated_span_removal",
      (s, dir) => removeRepeatedSpans(T.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""
        WITH toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        sl AS (SELECT doc_id, len(tk) AS n_tokens,
                      ${X.shinglesSql("tk", 10)} AS sh
               FROM toks),
        pos AS (SELECT doc_id, sh, unnest(range(1, len(sh)+1)) AS i FROM sl),
        keyed AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                         ${X.h60Sql("sh[i]")} AS k
                  FROM pos),
        rep AS (SELECT k FROM keyed GROUP BY k HAVING COUNT(*) >= 2),
        spans AS (SELECT doc_id, pos FROM keyed JOIN rep USING (k)),
        covered AS (SELECT DISTINCT doc_id, tpos
                    FROM (SELECT doc_id, unnest(range(pos, pos + 10)) AS tpos
                          FROM spans)),
        ptok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS tpos, tk[i] AS tok
                 FROM (SELECT doc_id, tk, unnest(range(1, len(tk)+1)) AS i
                       FROM toks)),
        kept AS (SELECT p.doc_id, p.tpos, p.tok
                 FROM ptok p ANTI JOIN covered c
                   ON p.doc_id = c.doc_id AND p.tpos = c.tpos),
        cleaned AS (SELECT doc_id, COUNT(*) AS kept_tokens,
                           string_agg(tok, ' ' ORDER BY tpos) AS cleaned_text
                    FROM kept GROUP BY doc_id)
        SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
               coalesce(c.kept_tokens, 0) AS kept_tokens,
               CAST(d.n_tokens - coalesce(c.kept_tokens, 0) AS BIGINT)
                 AS removed_tokens,
               coalesce(c.cleaned_text, '') AS cleaned_text
        FROM (SELECT doc_id, n_tokens FROM sl) d
        LEFT JOIN cleaned c USING (doc_id)
        ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // q206: MULTI-L repeated-span coverage — q123 generalized to
    // L ∈ {10, 20, 50} with the spans from all three lengths UNIONED
    // into one interval sweep (variable `end` replaces pos+L; the
    // per-doc sum telescopes to the union measure regardless of
    // equal-pos tie order, so it is engine-exact). Per-L span counts
    // ride along hash-checked — the routing between lengths is part
    // of the contract. Approximates Lee et al.'s arbitrary-length
    // ≥50-char semantics relationally; see repeatedSpansMulti.
    QueryDef(
      "q206_repeated_span_coverage_multi",
      (s, dir) => {
        // action-free construct: the one-shot release fires on the
        // returned plan's own materialization (the q143/q144 shape)
        val scope = new graft.CacheScope
        graft.CacheScope.releaseAfterNextAction(s, scope)
        repeatedSpanCoverageMulti(T.documents(s, dir), scope)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        $multiSpansCtesSql,
        sw AS (SELECT doc_id, l,
                      greatest(0, e - greatest(pos,
                        coalesce(max(e) OVER (PARTITION BY doc_id
                          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), -1))) AS contrib
               FROM mspans),
        cov AS (SELECT doc_id, COUNT(*) AS n_rep_spans,
                       CAST(SUM(CASE WHEN l = 10 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_spans_l10,
                       CAST(SUM(CASE WHEN l = 20 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_spans_l20,
                       CAST(SUM(CASE WHEN l = 50 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_spans_l50,
                       CAST(SUM(contrib) AS BIGINT) AS covered_tokens
                FROM sw GROUP BY doc_id)
        SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
               coalesce(c.n_rep_spans, 0) AS n_rep_spans,
               coalesce(c.n_spans_l10, 0) AS n_spans_l10,
               coalesce(c.n_spans_l20, 0) AS n_spans_l20,
               coalesce(c.n_spans_l50, 0) AS n_spans_l50,
               coalesce(c.covered_tokens, 0) AS covered_tokens,
               CASE WHEN d.n_tokens = 0 THEN 0
                    ELSE coalesce(c.covered_tokens, 0) * 100 // d.n_tokens
               END AS coverage_pct
        FROM (SELECT doc_id, len(tk) AS n_tokens FROM toks) d
        LEFT JOIN cov c USING (doc_id)
        ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // q207: MULTI-L repeated-span REMOVAL — q124's cut with the
    // covered-position set unioned across the three lengths; the
    // cleaned text is hash-compared byte for byte, so the cross-L
    // union, anti-join, and ordered reassembly must all agree.
    QueryDef(
      "q207_repeated_span_removal_multi",
      (s, dir) => {
        val scope = new graft.CacheScope
        graft.CacheScope.releaseAfterNextAction(s, scope)
        removeRepeatedSpansMulti(T.documents(s, dir), scope)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        $multiSpansCtesSql,
        covered AS (SELECT DISTINCT doc_id, tpos
                    FROM (SELECT doc_id, unnest(range(pos, e)) AS tpos
                          FROM mspans)),
        ptok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS tpos, tk[i] AS tok
                 FROM (SELECT doc_id, tk, unnest(range(1, len(tk)+1)) AS i
                       FROM toks)),
        kept AS (SELECT p.doc_id, p.tpos, p.tok
                 FROM ptok p ANTI JOIN covered c
                   ON p.doc_id = c.doc_id AND p.tpos = c.tpos),
        cleaned AS (SELECT doc_id, COUNT(*) AS kept_tokens,
                           string_agg(tok, ' ' ORDER BY tpos) AS cleaned_text
                    FROM kept GROUP BY doc_id)
        SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
               coalesce(c.kept_tokens, 0) AS kept_tokens,
               CAST(d.n_tokens - coalesce(c.kept_tokens, 0) AS BIGINT)
                 AS removed_tokens,
               coalesce(c.cleaned_text, '') AS cleaned_text
        FROM (SELECT doc_id, len(tk) AS n_tokens FROM toks) d
        LEFT JOIN cleaned c USING (doc_id)
        ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // q128: span-level decontamination ([[spanContamination]]) — eval
    // slice = source 'src0', train = every other source. Per eval doc:
    // how many of its 10-token spans occur anywhere in train, and what
    // fraction of its tokens they cover.
    QueryDef(
      "q128_span_decontam",
      (s, dir) => {
        val docs = T.documents(s, dir)
        spanContamination(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, source, ${X.tokensSql("text")} AS tk
                    FROM documents),
        trainkeys AS (SELECT DISTINCT ${X.h60Sql("sh")} AS k
                      FROM (SELECT unnest(${X.shinglesSql("tk", 10)}) AS sh
                            FROM tk WHERE source <> 'src0')),
        esl AS (SELECT doc_id, len(tk) AS n_tokens,
                       ${X.shinglesSql("tk", 10)} AS sh
                FROM tk WHERE source = 'src0'),
        epos AS (SELECT doc_id, sh, unnest(range(1, len(sh)+1)) AS i FROM esl),
        ekeyed AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                          ${X.h60Sql("sh[i]")} AS k
                   FROM epos),
        sw AS (SELECT doc_id, pos,
                      max(pos + 10) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS prev_end
               FROM ekeyed JOIN trainkeys USING (k)),
        cov AS (SELECT doc_id, COUNT(*) AS n_hit_spans,
                       CAST(SUM(greatest(0, pos + 10
                         - greatest(pos, coalesce(prev_end, -1)))) AS BIGINT)
                         AS covered_tokens
                FROM sw GROUP BY doc_id)
        SELECT e.doc_id, CAST(e.n_tokens AS BIGINT) AS n_tokens,
               coalesce(c.n_hit_spans, 0) AS n_hit_spans,
               coalesce(c.covered_tokens, 0) AS covered_tokens,
               CASE WHEN e.n_tokens = 0 THEN 0
                    ELSE coalesce(c.covered_tokens, 0) * 100 // e.n_tokens
               END AS contamination_pct
        FROM (SELECT doc_id, n_tokens FROM esl) e
        LEFT JOIN cov c USING (doc_id)
        ORDER BY e.doc_id""")),

    // ------------------------------------------------------------------
    // q167: CONTAINMENT near-dup — Broder's second resemblance measure
    // (c(A,B) = |A∩B| / |A|, "On the resemblance and containment of
    // documents", SEQUENCES 1997): asymmetric, so it catches the pair
    // Jaccard (q43) structurally misses — a short document contained
    // INSIDE a long one (a quote, an excerpt, a page embedding another).
    // An excerpt half the source's length has containment 1.0 but
    // Jaccard ≈ 0.5⁻; at a 0.5 Jaccard gate it survives dedup as a
    // "unique" doc and leaks duplicated text into training. The fixture
    // text has no planted excerpts, so the query DERIVES them
    // relationally (the q162/q164 planting discipline): every document
    // with ≥ 12 tokens contributes an excerpt pseudo-doc (id + 10⁷,
    // tokens[3 .. 2+n/2]) whose 3-shingles are a subset of its source's
    // by construction — containment exactly 10000 bps, provably
    // surfacing at every SF. Candidates and |A∩B| ride q43's machinery
    // (shared-shingle df-capped buckets; intersection = pair
    // multiplicity, a count aggregation); only the verdict differs:
    // containment of the SMALLER shingle set in integer bps, with the
    // Jaccard bps alongside to show what the symmetric gate would have
    // said. 100 TB: identical profile to q43 — work ∝ Σ df², the df cap
    // bounds stopword shingles, no pair ever carries the shingle arrays.
    QueryDef(
      "q167_dedup_containment",
      (s, dir) => {
        val toks = T.documents(s, dir)
          .select(col("doc_id"), X.tokens(col("text")).as("tk"))
        val exc = toks.filter(size(col("tk")) >= 12)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            expr("slice(tk, 3, int(size(tk) div 2))").as("tk"))
        val base = toks.unionByName(exc)
          .select(col("doc_id"), array_distinct(X.shingles(col("tk"), 3)).as("sh"))
          .persist()
        val sizes = base.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
        val inter = graft.operators.NearDup.cappedBuckets(
            base.select(col("doc_id"), explode(col("sh")).as("s")),
            Seq("s"), "doc_id", 1024, "containment_df_cap")
          .select(explode(graft.functions.HashFunctions.sortedIdPairs(col("ids"))).as("p"))
          .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
          .withColumn("cont_bps", expr("(inter * 10000) div least(sza, szb)"))
          .filter(col("cont_bps") >= 8000L)
          .select(col("doc_a"), col("doc_b"), col("inter"),
            col("sza"), col("szb"), col("cont_bps"),
            expr("(inter * 10000) div (sza + szb - inter)").as("jac_bps"),
            when(col("sza") < col("szb"), col("doc_a"))
              .when(col("szb") < col("sza"), col("doc_b"))
              .otherwise(least(col("doc_a"), col("doc_b"))).as("contained_id"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        exc AS (SELECT doc_id + 10000000 AS doc_id, tk[3:2+len(tk)//2] AS tk
                FROM toks WHERE len(tk) >= 12),
        uni AS (SELECT * FROM toks UNION ALL SELECT * FROM exc),
        shg AS (SELECT doc_id, list_distinct(${X.shinglesSql("tk", 3)}) AS sh FROM uni),
        sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS sz FROM shg),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM shg),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         CAST(COUNT(*) AS BIGINT) AS inter
                  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b, inter, x.sz AS sza, y.sz AS szb,
               inter * 10000 // least(x.sz, y.sz) AS cont_bps,
               inter * 10000 // (x.sz + y.sz - inter) AS jac_bps,
               CASE WHEN x.sz < y.sz THEN doc_a
                    WHEN y.sz < x.sz THEN doc_b
                    ELSE least(doc_a, doc_b) END AS contained_id
        FROM pairs JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
        WHERE inter * 10000 // least(x.sz, y.sz) >= 8000
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q170: DEDUP INDEX CATALOG SERVING — the serving-from-persisted-
    // state shape (LM q122/q158, sketches q118-q120, PageRank q146,
    // classifier q147, line stats q149, BM25 q169) completed for the
    // dedup family, which is where it matters most at 100 TB: the
    // MinHash BAND INDEX and the hashed-shingle VERIFICATION STORE are
    // catalog versions written at construct (minhashBandTable — the
    // exact construction q41/q80 use in-query, so a served probe can
    // never disagree with the definition), and the served plan for an
    // arriving batch (doc_id % 3 = 0) computes its own signatures
    // map-side, probes the PERSISTED band cells (new-side-only join, ∝
    // Σ |new∩cell|·|cell|), and verifies exact Jaccard against the
    // persisted 60-bit shingle-hash arrays — the old corpus is never
    // re-tokenized, the q80 incremental contract from cold state.
    // Jaccard here is over the DISTINCT hashed shingle sets on both
    // engines (array_distinct/transform ↔ list_distinct over hm), so a
    // hash collision — ≈2⁻⁶⁰ per shingle pair — hits both sides
    // identically and the compare stays exact. Production adds q80's
    // bucket cap before the probe join; the fixture sits far under it.
    QueryDef(
      "q170_dedup_catalog_serving",
      (s, dir) => {
        val work = graft.Scratch.dir("q170")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val docs = T.documents(s, dir)
        val (cbase, cbands) = graft.operators.NearDup.minhashBandTable(
          docs.filter(col("doc_id") % 3 =!= 0), col("doc_id"), col("text"),
          numHashes = 12, bands = 3, shingleWidth = 3)
        cat.writeNext("mh_bands",
          cbands.select(col("band"), col("bsig"), col("doc_id")))
        cat.writeNext("mh_shingles", cbase.select(col("doc_id"),
          array_distinct(transform(col("sh"), sh => X.hp(sh))).as("hsh")))
        import org.apache.spark.sql.types.StructType
        val pb = cat.read("mh_bands", 1,
          Some(StructType.fromDDL("band INT, bsig STRING, doc_id BIGINT")))
        val csh = cat.read("mh_shingles", 1,
          Some(StructType.fromDDL("doc_id BIGINT, hsh ARRAY<BIGINT>")))
        val (nbase, nbands) = graft.operators.NearDup.minhashBandTable(
          docs.filter(col("doc_id") % 3 === 0), col("doc_id"), col("text"),
          numHashes = 12, bands = 3, shingleWidth = 3)
        val cand = nbands
          .select(col("band"), col("bsig"), col("doc_id").as("nid"))
          .join(pb.select(col("band"), col("bsig"), col("doc_id").as("mid")),
            Seq("band", "bsig"))
          .select(col("nid"), col("mid")).distinct()
        val inter = size(array_intersect(col("ha"), col("hb")))
        cand
          .join(nbase.select(col("doc_id").as("nid"),
            array_distinct(transform(col("sh"), sh => X.hp(sh))).as("ha")), "nid")
          .join(csh.select(col("doc_id").as("mid"), col("hsh").as("hb")), "mid")
          .withColumn("jac", inter.cast("double") /
            (size(col("ha")) + size(col("hb")) - inter).cast("double"))
          .filter(col("jac") >= 0.5)
          .select(least(col("nid"), col("mid")).as("doc_a"),
            greatest(col("nid"), col("mid")).as("doc_b"), col("jac"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH $shingledSqlCte,
        sig AS (SELECT doc_id, list_distinct(hm) AS hs,
                       ${X.minhashSigSql("hm", 12)} AS sig
                FROM hm WHERE len(sh) > 0),
        bands AS (SELECT doc_id, bnd, array_to_string(sig[bnd*4+1:bnd*4+4], '-') AS bsig
                  FROM sig, (SELECT unnest(range(0, 3)) AS bnd)),
        cand AS (SELECT DISTINCT n.doc_id AS nid, c.doc_id AS mid
                 FROM bands n JOIN bands c
                   ON n.bnd = c.bnd AND n.bsig = c.bsig
                 WHERE n.doc_id % 3 = 0 AND c.doc_id % 3 != 0),
        pr AS (SELECT least(nid, mid) AS doc_a, greatest(nid, mid) AS doc_b,
                      CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) /
                        CAST(len(x.hs) + len(y.hs)
                             - len(list_intersect(x.hs, y.hs)) AS DOUBLE) AS jac
               FROM cand JOIN sig x ON x.doc_id = nid
                         JOIN sig y ON y.doc_id = mid)
        SELECT doc_a, doc_b, jac FROM pr
        WHERE jac >= 0.5 ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q173: SPLIT LEAKAGE AUDIT — the eval-hygiene gate every training
    // run needs before trusting its val/test numbers (the published
    // failure mode: GPT-3's Appendix C found eval-set overlap AFTER
    // training; Dolma/FineWeb audit splits exactly this way): q48's
    // deterministic hash split assigns train/val/test, then every
    // val/test document is measured for EXACT-SUBSTRING contamination
    // against the train split — q128's span machinery (10-token
    // positional shingles → train-key semi-join → per-doc interval
    // union) with the decontam corpus replaced by the engine's own
    // train partition. Per split: docs, contaminated docs, token
    // totals, and leakage in integer bps. A random split of a corpus
    // with near-duplicates LEAKS BY CONSTRUCTION (dup pairs straddle
    // the split boundary) — this query makes that number visible,
    // which is why dedup-before-split is the shipped ordering. 100 TB:
    // q128's linear shape — no pairs, work ∝ corpus tokens.
    QueryDef(
      "q173_split_leakage_audit",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val r = X.hp(col("doc_id").cast("string")) % 20
        val withSplit = docs.withColumn("split",
          when(r <= 17, "train").when(r === 18, "val").otherwise("test"))
        val evalSide = withSplit.filter(col("split") =!= "train")
        spanContamination(
            withSplit.filter(col("split") === "train"),
            evalSide.select(col("doc_id"), col("text")))
          .join(evalSide.select(col("doc_id"), col("split")), "doc_id")
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("covered_tokens") > 0L, 1L).otherwise(0L))
              .as("n_contaminated"),
            sum(col("n_tokens")).as("eval_tokens"),
            sum(col("covered_tokens")).as("covered_tokens"))
          .select(col("split"), col("n_docs"), col("n_contaminated"),
            col("eval_tokens"), col("covered_tokens"),
            when(col("eval_tokens") === 0L, lit(0L))
              .otherwise(expr("(covered_tokens * 10000) div eval_tokens"))
              .as("leak_bps"))
          .orderBy(col("split"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk,
                           ${X.hpSql("CAST(doc_id AS VARCHAR)")} % 20 AS r
                    FROM documents),
        trainkeys AS (SELECT DISTINCT ${X.h60Sql("sh")} AS k
                      FROM (SELECT unnest(${X.shinglesSql("tk", 10)}) AS sh
                            FROM tk WHERE r <= 17)),
        esl AS (SELECT doc_id,
                       CASE WHEN r = 18 THEN 'val' ELSE 'test' END AS split,
                       len(tk) AS n_tokens,
                       ${X.shinglesSql("tk", 10)} AS sh
                FROM tk WHERE r >= 18),
        epos AS (SELECT doc_id, sh, unnest(range(1, len(sh)+1)) AS i FROM esl),
        ekeyed AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                          ${X.h60Sql("sh[i]")} AS k
                   FROM epos),
        sw AS (SELECT doc_id, pos,
                      max(pos + 10) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS prev_end
               FROM ekeyed JOIN trainkeys USING (k)),
        cov AS (SELECT doc_id,
                       CAST(SUM(greatest(0, pos + 10
                         - greatest(pos, coalesce(prev_end, -1)))) AS BIGINT)
                         AS covered_tokens
                FROM sw GROUP BY doc_id)
        SELECT e.split, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN coalesce(c.covered_tokens, 0) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
               CAST(SUM(e.n_tokens) AS BIGINT) AS eval_tokens,
               CAST(SUM(coalesce(c.covered_tokens, 0)) AS BIGINT)
                 AS covered_tokens,
               CASE WHEN SUM(e.n_tokens) = 0 THEN 0
                    ELSE CAST(SUM(coalesce(c.covered_tokens, 0)) * 10000
                      // SUM(e.n_tokens) AS BIGINT)
               END AS leak_bps
        FROM esl e LEFT JOIN cov c USING (doc_id)
        GROUP BY e.split ORDER BY e.split""")),

    // ------------------------------------------------------------------
    // q174: DEDUP IMPACT REPORT — the "X% of the corpus removed" table
    // every published dedup run leads with (Lee et al. ACL 2022 Table
    // 1; RefinedWeb/Dolma report per-source removal rates): q41's
    // verified near-dup pairs close into q46's transitive clusters,
    // each cluster keeps its min-id survivor, and the REMOVED mass
    // rolls up per source — docs, tokens, and removal in integer bps.
    // This is the number a curation owner actually decides with
    // (is src3 40% duplicate? is the dedup worth the pass?), sitting
    // one aggregation above the pair/cluster queries that justify it.
    // 100 TB: the pair/cluster machinery is q41/q46's (banded, capped,
    // min-label propagation); the report itself is one partial-agg
    // over (doc_id, source, n_tokens) — nothing new shuffles.
    QueryDef(
      "q174_dedup_impact_report",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val toks = docs.select(col("doc_id"), col("source"),
          size(X.tokens(col("text"))).cast("long").as("n_tokens"))
        val pairs = graft.operators.NearDup.minhashLsh(docs,
            col("doc_id"), col("text"),
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val removed = graft.operators.Graph.connectedComponents(pairs)
          .filter(col("node") =!= col("label"))
          .select(col("node").as("doc_id"), lit(1L).as("rm"))
        toks.join(removed, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("rm"), lit(0L))).as("n_removed"),
            sum(col("n_tokens")).as("tokens_total"),
            sum(when(col("rm").isNotNull, col("n_tokens")).otherwise(0L))
              .as("tokens_removed"))
          .select(col("source"), col("n_docs"), col("n_removed"),
            col("tokens_total"), col("tokens_removed"),
            when(col("tokens_total") === 0L, lit(0L))
              .otherwise(expr("(tokens_removed * 10000) div tokens_total"))
              .as("removed_bps"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH RECURSIVE ${minhashPairsSqlCte()},
        edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                  UNION SELECT doc_b, doc_a FROM mh_pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lbl AS (SELECT r.a AS doc, least(MIN(r.b), r.a) AS root
                FROM reach r GROUP BY r.a),
        rmv AS (SELECT doc FROM lbl WHERE doc != root),
        tok AS (SELECT doc_id, source,
                       CAST(len(${X.tokensSql("text")}) AS BIGINT) AS n_tokens
                FROM documents)
        SELECT t.source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN r.doc IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_removed,
               CAST(SUM(t.n_tokens) AS BIGINT) AS tokens_total,
               CAST(SUM(CASE WHEN r.doc IS NOT NULL THEN t.n_tokens
                        ELSE 0 END) AS BIGINT) AS tokens_removed,
               CASE WHEN SUM(t.n_tokens) = 0 THEN 0
                    ELSE CAST(SUM(CASE WHEN r.doc IS NOT NULL THEN t.n_tokens
                              ELSE 0 END) * 10000
                      // SUM(t.n_tokens) AS BIGINT)
               END AS removed_bps
        FROM tok t LEFT JOIN rmv r ON r.doc = t.doc_id
        GROUP BY t.source ORDER BY t.source""")),

    // ------------------------------------------------------------------
    // q176: LSH BAND PRECISION REPORT — the banding-tuning table (the
    // dedup-side complement of q166's recall report): per band, how
    // many candidate pairs the band generates (n_cand), how many are
    // its MARGINAL contribution (n_new: pairs no earlier band already
    // found — the number that justifies paying for band b+1), how many
    // verify as true near-dups at Jaccard ≥ 0.5 (n_true), and the
    // band's candidate precision in bps. This is how b×r gets chosen
    // in practice (Leskovec/Rajaraman/Ullman ch.3's S-curve, measured
    // on the actual corpus instead of assumed).
    //
    // 100 TB: candidate generation is q41's banded bucket machinery
    // (k ints per doc shuffle, capped buckets); each pair verifies
    // ONCE (on the distinct pair set) and the per-band attribution
    // joins the verdict back to the ≤ bands-row candidate list — no
    // extra shingle traffic. The report is one partial agg over that.
    QueryDef(
      "q176_lsh_band_precision",
      (s, dir) => {
        val scope = new graft.CacheScope
        graft.CacheScope.releaseAfterNextAction(s, scope)
        val (base, banded) = graft.operators.NearDup.minhashBandTable(
          T.documents(s, dir), col("doc_id"), col("text"), scope = scope)
        val cand = scope.cache(
          graft.operators.NearDup.cappedBuckets(
              banded.select(col("band"), col("bsig"), col("doc_id")),
              Seq("band", "bsig"), "doc_id", 1024, "q176_bucket_cap")
            .select(col("band"),
              explode(graft.operators.NearDup.pairsOf(col("ids"))).as("p"))
            .select(col("band").cast("long").as("band"),
              col("p.a").as("doc_a"), col("p.b").as("doc_b")))
        val first = cand.groupBy(col("doc_a"), col("doc_b"))
          .agg(min(col("band")).as("first_band"))
        val ver = first
          .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
          .join(base.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), col("first_band"),
            when(jaccard(col("sha"), col("shb")) >= 0.5, 1L).otherwise(0L)
              .as("is_true"))
        cand.join(ver, Seq("doc_a", "doc_b"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_cand"),
            sum(when(col("band") === col("first_band"), 1L).otherwise(0L))
              .as("n_new"),
            sum(col("is_true")).as("n_true"))
          .select(col("band"), col("n_cand"), col("n_new"), col("n_true"),
            expr("CAST((n_true * 10000) div n_cand AS BIGINT)")
              .as("precision_bps"))
          .orderBy(col("band"))
      },
      Some(s"""
        WITH $shingledSqlCte,
        sig AS (SELECT doc_id, sh, ${X.minhashSigSql("hm", 12)} AS sig FROM hm WHERE len(sh) > 0),
        bands AS (SELECT doc_id, bnd, array_to_string(sig[bnd*4+1:bnd*4+4], '-') AS bsig
                  FROM sig, (SELECT unnest(range(0, 3)) AS bnd)),
        bpc AS (SELECT a.bnd AS band, a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.bnd = b.bnd AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
        bpf AS (SELECT doc_a, doc_b, MIN(band) AS first_band FROM bpc GROUP BY 1, 2),
        bpv AS (SELECT f.doc_a, f.doc_b, f.first_band,
                       CASE WHEN ${jaccardSql("x.sh", "y.sh")} >= 0.5 THEN 1 ELSE 0 END AS is_true
                FROM bpf f JOIN sig x ON x.doc_id = f.doc_a
                           JOIN sig y ON y.doc_id = f.doc_b)
        SELECT c.band, COUNT(*) AS n_cand,
               CAST(SUM(CASE WHEN c.band = v.first_band THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               CAST(SUM(v.is_true) AS BIGINT) AS n_true,
               CAST((CAST(SUM(v.is_true) AS BIGINT) * 10000) // COUNT(*) AS BIGINT) AS precision_bps
        FROM bpc c JOIN bpv v ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b
        GROUP BY c.band ORDER BY c.band""")),

    // ------------------------------------------------------------------
    // q181: DEDUP LINEAGE TABLE — the provenance record a curation
    // team keeps for every removal (RefinedWeb §3 and Dolma both ship
    // per-doc removal attribution; it's what makes a dedup AUDITABLE
    // and reversible): one row per removed doc with its surviving
    // representative and the modality that killed it, in the shipped
    // pipeline order — exact dedup over normalized tokens first
    // (q40's contract: survivor = min doc_id per norm), then near-dup
    // clusters over the exact survivors (q41's pairs → q46's
    // transitive min-label clusters). A doc removed exactly never
    // reaches the near pass, so lineage rows are unique by doc_id.
    //
    // 100 TB: the exact pass is one hash agg on norm; the near pass is
    // q41/q46's banded machinery over the (smaller) survivor set; the
    // lineage union adds no new shuffle class.
    QueryDef(
      "q181_dedup_lineage",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val norm = docs.select(col("doc_id"),
          concat_ws(" ", X.tokens(col("text"))).as("norm"))
        val groups = norm.groupBy(col("norm")).agg(min(col("doc_id")).as("surv"))
        val normed = norm.join(groups, "norm")
        val exactRemoved = normed.filter(col("doc_id") =!= col("surv"))
          .select(col("doc_id"), col("surv").as("survivor_id"),
            lit("exact").as("modality"))
        val survDocs = docs.join(
          normed.filter(col("doc_id") === col("surv")).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        val pairs = graft.operators.NearDup.minhashLsh(survDocs,
            col("doc_id"), col("text"),
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val nearRemoved = graft.operators.Graph.connectedComponents(pairs)
          .filter(col("node") =!= col("label"))
          .select(col("node").as("doc_id"), col("label").as("survivor_id"),
            lit("near").as("modality"))
        exactRemoved.unionByName(nearRemoved).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE
        lt AS (SELECT doc_id, array_to_string(${X.tokensSql("text")}, ' ') AS norm
               FROM documents),
        lg AS (SELECT norm, MIN(doc_id) AS surv FROM lt GROUP BY norm),
        lsv AS (SELECT surv AS doc_id FROM lg GROUP BY surv),
        ldocs AS (SELECT d.* FROM documents d JOIN lsv USING (doc_id)),
        ${minhashPairsSqlCte(from = "ldocs")},
        edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                  UNION SELECT doc_b, doc_a FROM mh_pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lbl AS (SELECT r.a AS doc, least(MIN(r.b), r.a) AS root
                FROM reach r GROUP BY r.a)
        SELECT doc_id, survivor_id, modality FROM (
          SELECT t.doc_id, g.surv AS survivor_id, 'exact' AS modality
          FROM lt t JOIN lg g USING (norm) WHERE t.doc_id != g.surv
          UNION ALL
          SELECT doc AS doc_id, root AS survivor_id, 'near' AS modality
          FROM lbl WHERE doc != root)
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q183: INCREMENTAL DEDUP LINEAGE — q181's provenance record for
    // the DAILY-BATCH case (the shape production actually runs: the
    // corpus is already deduped, today's batch must be attributed
    // against it without re-pairing the corpus): for each NEW doc
    // (q80's parity convention), the exact stage attaches it to the
    // min-id holder of its normalized text across corpus ∪ batch; the
    // near stage runs q80's new-side-only incremental pair machinery
    // over exact survivors, and a new doc is removed iff some verified
    // partner has a smaller id — survivor = its smallest partner (the
    // FIRST-FIT contract: incremental dedup attaches to an existing
    // representative, it never re-clusters the corpus — which is
    // exactly why q181's full closure exists as the batch-rebuild
    // complement).
    //
    // 100 TB: candidate work is q80's Σ |new∩cell|·|cell| (buckets
    // without a new member prune before any pair forms); the exact
    // stage is one hash agg; lineage rows ship only for the batch.
    QueryDef(
      "q183_incremental_lineage",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val isNew = col("doc_id") % 2 === 1
        val norm = docs.select(col("doc_id"),
          concat_ws(" ", X.tokens(col("text"))).as("norm"))
        val groups = norm.groupBy(col("norm")).agg(min(col("doc_id")).as("surv"))
        val normed = norm.join(groups, "norm")
        val exactRemovedNew = normed
          .filter(col("doc_id") =!= col("surv") && isNew)
          .select(col("doc_id"), col("surv").as("survivor_id"),
            lit("exact").as("modality"))
        val survDocs = docs.join(
          normed.filter(col("doc_id") === col("surv")).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        val pairs = graft.operators.NearDup.minhashLshIncremental(survDocs,
          col("doc_id"), col("text"), col("doc_id") % 2 === 1,
          numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
        val nearRemovedNew = pairs
          .select(col("doc_a").as("d"), col("doc_b").as("p"))
          .unionByName(pairs.select(col("doc_b").as("d"), col("doc_a").as("p")))
          .filter(col("d") % 2 === 1)
          .groupBy(col("d")).agg(min(col("p")).as("mp"))
          .filter(col("mp") < col("d"))
          .select(col("d").as("doc_id"), col("mp").as("survivor_id"),
            lit("near").as("modality"))
        exactRemovedNew.unionByName(nearRemovedNew).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH
        lt AS (SELECT doc_id, array_to_string(${X.tokensSql("text")}, ' ') AS norm
               FROM documents),
        lg AS (SELECT norm, MIN(doc_id) AS surv FROM lt GROUP BY norm),
        lsv AS (SELECT surv AS doc_id FROM lg GROUP BY surv),
        ldocs AS (SELECT d.* FROM documents d JOIN lsv USING (doc_id)),
        ${minhashPairsSqlCte(from = "ldocs")},
        ipart AS (SELECT doc_a AS d, doc_b AS p FROM mh_pairs
                  UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
        inear AS (SELECT d, MIN(p) AS mp FROM ipart
                  WHERE d % 2 = 1 GROUP BY d HAVING MIN(p) < d)
        SELECT doc_id, survivor_id, modality FROM (
          SELECT t.doc_id, g.surv AS survivor_id, 'exact' AS modality
          FROM lt t JOIN lg g USING (norm)
          WHERE t.doc_id != g.surv AND t.doc_id % 2 = 1
          UNION ALL
          SELECT d AS doc_id, mp AS survivor_id, 'near' AS modality FROM inear)
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q217: INCREMENTAL cluster maintenance — q46's transitive clusters
    // kept up to date as a batch arrives, WITHOUT re-closing the corpus
    // graph. Prior state = connected components over the existing half
    // (even doc_ids — in production the cluster table read from the
    // catalog); delta = the q80 incremental LSH pairs (≥1 new member);
    // the merge contracts old endpoints to their prior cluster label and
    // runs min-label CC on the delta-sized contracted graph
    // ([[graft.operators.Graph.mergeComponents]]). The oracle re-closes
    // the FULL pair set from scratch — hash equality per cluster (id,
    // size, new-member count, #old clusters united) IS the incremental ≡
    // full-recompute proof. 100 TB: the corpus is never re-tokenized
    // (old side enters through band tuples + its signature table, the
    // q80 contract) and never re-closed (CC work ∝ delta edges) — the
    // two costs that make daily full dedup runs infeasible.
    QueryDef(
      "q217_dedup_clusters_incremental",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val isNew = col("doc_id") % 2 === 1
        val scope = new graft.CacheScope
        // prior state: clusters over the existing corpus only
        val oldPairs = graft.operators.NearDup.minhashLsh(
            docs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"),
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val oldLabels = graft.operators.Graph.connectedComponents(oldPairs)
        // delta: only pairs involving the new batch (new-new + new-old).
        // Cached: the merge walks it twice (endpoint set + contraction)
        // and the output reads the merge twice (sizes + united count) —
        // uncached, the whole LSH pipeline would replay 4× in one plan.
        val newEdges = scope.cache(
          graft.operators.NearDup.minhashLshIncremental(
              docs, col("doc_id"), col("text"), isNew,
              numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
            .select(col("doc_a").as("a"), col("doc_b").as("b")))
        val merged = scope.cache(
          graft.operators.Graph.mergeComponents(oldLabels, newEdges))
        val perCluster = merged.groupBy(col("label").as("survivor_id"))
          .agg(count(lit(1)).as("cluster_size"),
            sum(when(col("node") % 2 === 1, 1L).otherwise(0L)).as("n_new"))
        // how many PRIOR clusters each final cluster united (old
        // singleton endpoints are not prior clusters — their repr is
        // not a prior label)
        val oldClusterIds = oldLabels.select(col("label").as("repr")).distinct()
        val united = merged.join(oldClusterIds, "repr")
          .select(col("label"), col("repr")).distinct()
          .groupBy(col("label")).agg(count(lit(1)).as("n_old_clusters"))
        perCluster
          .join(united, perCluster("survivor_id") === united("label"), "left")
          .select(col("survivor_id"), col("cluster_size"), col("n_new"),
            coalesce(col("n_old_clusters"), lit(0L)).as("n_old_clusters"))
          .orderBy(col("survivor_id"))
      },
      Some(s"""
        WITH RECURSIVE ${minhashPairsSqlCte()},
        edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                  UNION SELECT doc_b, doc_a FROM mh_pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lbl AS (SELECT r.a AS doc, least(MIN(r.b), r.a) AS root
                FROM reach r GROUP BY r.a),
        oedges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                   WHERE doc_a % 2 = 0 AND doc_b % 2 = 0
                   UNION SELECT doc_b, doc_a FROM mh_pairs
                   WHERE doc_a % 2 = 0 AND doc_b % 2 = 0),
        oreach(a, b) AS (SELECT a, b FROM oedges
                         UNION SELECT r.a, e.b FROM oreach r JOIN oedges e ON r.b = e.a),
        olbl AS (SELECT r.a AS doc, least(MIN(r.b), r.a) AS root
                 FROM oreach r GROUP BY r.a),
        mgd AS (SELECT root AS survivor_id, COUNT(*) AS cluster_size,
                       CAST(SUM(CASE WHEN doc % 2 = 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_new
                FROM lbl GROUP BY root),
        uni AS (SELECT froot, CAST(COUNT(DISTINCT oroot) AS BIGINT)
                         AS n_old_clusters
                FROM (SELECT DISTINCT o.root AS oroot, l.root AS froot
                      FROM olbl o JOIN lbl l ON o.doc = l.doc)
                GROUP BY froot)
        SELECT m.survivor_id, m.cluster_size, m.n_new,
               coalesce(u.n_old_clusters, 0) AS n_old_clusters
        FROM mgd m LEFT JOIN uni u ON u.froot = m.survivor_id
        ORDER BY m.survivor_id""")),

    // ------------------------------------------------------------------
    // q218: the cluster table as CATALOG STATE — q217's merge persisted
    // the way every other serving family keeps its index: v1 = the
    // existing corpus's components committed to the versioned catalog,
    // v2 = v1 + the batch delta folded in by graph contraction (the
    // prior state is READ BACK from the catalog, never recomputed —
    // the maintenance contract). Output = both versions' cluster
    // summaries served from catalog parquet; the oracle recomputes each
    // version's components from scratch, so hash equality proves the
    // persisted v2 ≡ a full re-close of old ∪ new. 100 TB: between
    // batches the cluster table IS the state (time-travelable like the
    // ANN/LM/BM25 indexes); each arrival pays one delta-LSH + one
    // contracted CC + one version write, never a corpus re-close.
    QueryDef(
      "q218_dedup_cluster_catalog",
      (s, dir) => {
        val work = graft.Scratch.dir("q218")
        val cat = new graft.catalog.VersionedCatalog(s, work)
        val docs = T.documents(s, dir)
        val clSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "node BIGINT, label BIGINT")
        // v1: components over the existing corpus, committed
        val oldPairs = graft.operators.NearDup.minhashLsh(
            docs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"),
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        cat.writeNext("clusters",
          graft.operators.Graph.connectedComponents(oldPairs))
        // v2: the batch folded into the CATALOG-READ prior state
        val newEdges = graft.operators.NearDup.minhashLshIncremental(
            docs, col("doc_id"), col("text"), col("doc_id") % 2 === 1,
            numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        cat.writeNext("clusters",
          graft.operators.Graph
            .mergeComponents(cat.read("clusters", 1, Some(clSchema)), newEdges)
            .select(col("node"), col("label")))
        // serve both versions' summaries from the committed parquet
        (1 to 2).map { v =>
          cat.read("clusters", v, Some(clSchema))
            .groupBy(col("label").as("survivor_id"))
            .agg(count(lit(1)).as("cluster_size"))
            .select(lit(v.toLong).as("version"), col("survivor_id"),
              col("cluster_size"))
        }.reduce(_ unionByName _)
          .orderBy(col("version"), col("survivor_id"))
      },
      Some(s"""
        WITH RECURSIVE ${minhashPairsSqlCte()},
        edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                  UNION SELECT doc_b, doc_a FROM mh_pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lbl AS (SELECT r.a AS doc, least(MIN(r.b), r.a) AS root
                FROM reach r GROUP BY r.a),
        oedges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                   WHERE doc_a % 2 = 0 AND doc_b % 2 = 0
                   UNION SELECT doc_b, doc_a FROM mh_pairs
                   WHERE doc_a % 2 = 0 AND doc_b % 2 = 0),
        oreach(a, b) AS (SELECT a, b FROM oedges
                         UNION SELECT r.a, e.b FROM oreach r JOIN oedges e ON r.b = e.a),
        olbl AS (SELECT r.a AS doc, least(MIN(r.b), r.a) AS root
                 FROM oreach r GROUP BY r.a)
        SELECT CAST(1 AS BIGINT) AS version, root AS survivor_id,
               COUNT(*) AS cluster_size
        FROM olbl GROUP BY root
        UNION ALL
        SELECT CAST(2 AS BIGINT), root, COUNT(*) FROM lbl GROUP BY root
        ORDER BY version, survivor_id"""))
  )

  /** Span length (in tokens) for [[repeatedSpanCoverage]] / q123. */
  private val SpanL = 10

  /** Per-document REPEATED-SPAN coverage — the ExactSubstr dedup
    * signal (Lee, Ippolito, Nystrom, Zhang, Eck, Callison-Burch &
    * Carlini, "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022): a position is "repeated" if it lies inside
    * some L-token span occurring more than once corpus-wide (other
    * docs or elsewhere in the same doc). Their suffix array is a
    * single-node structure; the distributed re-expression is
    * positional L-shingles → corpus-wide occurrence counts → per-doc
    * INTERVAL UNION of the repeated spans, swept relationally with one
    * running-max window (gaps-and-islands: contribution =
    * pos+L − max(pos, max prior end), clamped at 0). Spans key on the
    * md5-derived 60-bit shingle hash, NOT the shingle text — the
    * shuffle rows stay narrow at 100 TB and both engines hash
    * identically, so a collision (≈2⁻⁶⁰ per pair) affects both sides
    * the same way and the compare stays exact.
    *
    * 100 TB shape: one partial-aggregable count over positional
    * shingle hashes (rows ∝ corpus tokens, width ~3 ints), one
    * equi-join of positions against the repeated keys (count ≥ 2 —
    * at web scale this side is the small one: most shingles are
    * unique), one per-doc window. No pairs are ever materialized —
    * unlike the pairwise dedup family, coverage needs only the
    * repeated-key SET, so work is linear in corpus tokens. */
  /** (doc_id, pos) of every L-token span whose 60-bit shingle hash
    * occurs ≥ 2 times corpus-wide — the shared discovery stage of the
    * ExactSubstr pair ([[repeatedSpanCoverage]] measures,
    * [[removeRepeatedSpans]] cuts). */
  private def repeatedSpans(toks: DataFrame): DataFrame = {
    val keyed = toks
      .select(col("doc_id"), posexplode(X.shingles(col("tk"), SpanL)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        X.h60(col("col")).as("k"))
    val repeated = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("k"))
    keyed.join(repeated, "k").select(col("doc_id"), col("pos"))
  }

  def repeatedSpanCoverage(docs: DataFrame): DataFrame =
    repeatedSpanCoverageTk(
      docs.select(col("doc_id"), X.tokens(col("text")).as("tk")))

  /** [[repeatedSpanCoverage]] over a PRE-TOKENIZED (doc_id, tk) frame —
    * the seam that lets a multi-branch report (q126) tokenize the corpus
    * once, cache it, and feed this branch alongside the LM branch. */
  def repeatedSpanCoverageTk(toks: DataFrame): DataFrame = {
    val base = toks.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cov = repeatedSpans(toks)
      .withColumn("prev_end", max(col("pos") + SpanL).over(w))
      .select(col("doc_id"),
        greatest(lit(0L), col("pos") + SpanL
          - greatest(col("pos"), coalesce(col("prev_end"), lit(-1L))))
          .as("contrib"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rep_spans"), sum(col("contrib")).as("covered_tokens"))
    base.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_rep_spans"), lit(0L)).as("n_rep_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("coverage_pct",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("(covered_tokens * 100) div n_tokens")))
  }

  /** Span-level DECONTAMINATION — the cross-corpus member of the
    * ExactSubstr family: for every `eval` document, how much of it is
    * covered by L-token spans that ALSO occur anywhere in `train`?
    * Doc-level decontamination (q56/q58/q83) answers "is this eval doc
    * tainted"; this answers "which parts, exactly" — the granularity
    * benchmark-leakage audits actually need (an eval doc quoting one
    * training paragraph is partially compromised, not binary). Same
    * linear shape as [[repeatedSpanCoverage]] with the repeated-key
    * set replaced by the TRAIN span-hash set (distinct, so the train
    * side reduces before the join; the eval side is the small one in
    * the usual direction, making the join's big side a semi-join
    * against a reduced key set). */
  def spanContamination(train: DataFrame, eval: DataFrame): DataFrame = {
    val evalToks = eval.select(col("doc_id"), X.tokens(col("text")).as("tk"))
    val trainKeys = train
      .select(explode(X.shingles(X.tokens(col("text")), SpanL)).as("sh"))
      .select(X.h60(col("sh")).as("k")).distinct()
    val evalKeyed = evalToks
      .select(col("doc_id"), posexplode(X.shingles(col("tk"), SpanL)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        X.h60(col("col")).as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cov = evalKeyed.join(trainKeys, "k")
      .withColumn("prev_end", max(col("pos") + SpanL).over(w))
      .select(col("doc_id"),
        greatest(lit(0L), col("pos") + SpanL
          - greatest(col("pos"), coalesce(col("prev_end"), lit(-1L))))
          .as("contrib"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_spans"), sum(col("contrib")).as("covered_tokens"))
    evalToks.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_hit_spans"), lit(0L)).as("n_hit_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("contamination_pct",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("(covered_tokens * 100) div n_tokens")))
  }

  /** Span lengths for the MULTI-L sweep (q206/q207) — the round-15
    * verdict's item #6: q123/q124 fix L = 10, Lee et al.'s suffix
    * array removes arbitrary ≥ 50-char matches; sweeping L ∈ {10, 20,
    * 50} and UNIONING the intervals approximates the arbitrary-length
    * semantics relationally (a repeated run of length n is covered by
    * its repeated 10-spans up to the last n mod 10 tail; the longer Ls
    * add precision for long verbatim blocks where the 10-span signal
    * is noisy). Repetition is judged PER L — each length's key space
    * is its own occurrence universe. (def, not val: referenced from
    * `defs` via multiSpansCtesSql, the object-init-order rule.) */
  private def SpanLs = Seq(10, 20, 50)

  /** (doc_id, pos, end, l) of every repeated L-token span for
    * L ∈ [[SpanLs]] — three linear discovery passes unioned; the
    * downstream interval sweep/cut is LENGTH-AGNOSTIC (variable `end`
    * instead of pos+L), so spans from different Ls provably union. */
  private def repeatedSpansMulti(toks: DataFrame,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame =
    SpanLs.map { l =>
      // each L's keyed table feeds BOTH the repetition count and the
      // join probe — cached (r19, guide §2.3 do fewer passes), or the
      // tokenize+shingle+hash pipeline runs twice per L (the two
      // branches shuffle with different subtrees, so ReuseExchange
      // never dedups them)
      val keyed = scope.cache(toks
        .select(col("doc_id"), posexplode(X.shingles(col("tk"), l)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          X.h60(col("col")).as("k")))
      val repeated = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select(col("k"))
      keyed.join(repeated, "k")
        .select(col("doc_id"), col("pos"), (col("pos") + l).as("end"),
          lit(l.toLong).as("l"))
    }.reduce(_ unionByName _)

  /** Multi-L repeated-span coverage (q206): the q123 sweep with
    * variable-length intervals — contribution = end − max(pos, max
    * prior end), clamped at 0. The running max ties on equal pos are
    * engine-order-dependent per ROW but the per-doc SUM telescopes to
    * the union measure regardless of tie order (max(ends) − max(pos,
    * prior max)), so only order-invariant aggregates are output. */
  def repeatedSpanCoverageMulti(docs: DataFrame,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    // the token table feeds the per-doc base AND all three per-L span
    // discoveries — cached (r19), or tokenization re-runs per branch
    val toks = scope.cache(
      docs.select(col("doc_id"), X.tokens(col("text")).as("tk")))
    val base = toks.select(col("doc_id"),
      size(col("tk")).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cov = repeatedSpansMulti(toks, scope)
      .withColumn("prev_end", max(col("end")).over(w))
      .select(col("doc_id"), col("l"),
        greatest(lit(0L), col("end")
          - greatest(col("pos"), coalesce(col("prev_end"), lit(-1L))))
          .as("contrib"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rep_spans"),
        sum(when(col("l") === 10L, 1L).otherwise(0L)).as("n_spans_l10"),
        sum(when(col("l") === 20L, 1L).otherwise(0L)).as("n_spans_l20"),
        sum(when(col("l") === 50L, 1L).otherwise(0L)).as("n_spans_l50"),
        sum(col("contrib")).as("covered_tokens"))
    base.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_rep_spans"), lit(0L)).as("n_rep_spans"),
        coalesce(col("n_spans_l10"), lit(0L)).as("n_spans_l10"),
        coalesce(col("n_spans_l20"), lit(0L)).as("n_spans_l20"),
        coalesce(col("n_spans_l50"), lit(0L)).as("n_spans_l50"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("coverage_pct",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("(covered_tokens * 100) div n_tokens")))
  }

  /** Multi-L removal (q207): q124's cut with the covered-position set
    * unioned across all three span lengths. */
  def removeRepeatedSpansMulti(docs: DataFrame,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    // cached for the same three-consumer reason as coverage (r19):
    // ptok, the span discoveries, and the n_tokens base all read it
    val toks = scope.cache(
      docs.select(col("doc_id"), X.tokens(col("text")).as("tk")))
    val ptok = toks
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), col("pos").cast("long").as("tpos"),
        col("col").as("tok"))
    val covered = repeatedSpansMulti(toks, scope)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("end") - 1)).as("tpos"))
      .distinct()
    val cleaned = ptok.join(covered, Seq("doc_id", "tpos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
            x => x.getField("tok"))).as("cleaned_text"))
    toks.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** The q206/q207 shared oracle CTE chain: per-L keyed/repeated CTEs
    * (keyedN/repN) unioned into `mspans (doc_id, pos, e, l)`. Expects
    * a `toks (doc_id, tk)` CTE upstream. */
  private def multiSpansCtesSql: String =
    SpanLs.map { l =>
      s"""
        keyed$l AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                           ${X.h60Sql(s"sh[i]")} AS k
                    FROM (SELECT doc_id, sh, unnest(range(1, len(sh)+1)) AS i
                          FROM (SELECT doc_id, ${X.shinglesSql("tk", l)} AS sh
                                FROM toks))),
        rep$l AS (SELECT k FROM keyed$l GROUP BY k HAVING COUNT(*) >= 2)"""
    }.mkString(",") + s""",
        mspans AS (${SpanLs.map(l =>
      s"""SELECT doc_id, pos, pos + $l AS e, CAST($l AS BIGINT) AS l
          FROM keyed$l JOIN rep$l USING (k)""").mkString(" UNION ALL ")})"""

  /** The APPLY step of ExactSubstr dedup — Lee et al. remove the
    * repeated substrings rather than whole documents: every token
    * inside some corpus-repeated L-span is cut and the survivors
    * rejoin IN ORDER (token space: whitespace is normalized, exactly
    * like every hash/shingle path here). Span rows explode to at most
    * L covered positions each — the multiplier rides the REPEATED side
    * only, which at web scale is the small one — then one anti-join
    * against the positional token stream and one ordered per-doc
    * reassembly (array_sort on (pos, token) structs, so the rebuild is
    * deterministic under any partitioning). Fully-covered documents
    * come back as empty text: the caller's filter threshold, not a
    * dropped row. */
  def removeRepeatedSpans(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), X.tokens(col("text")).as("tk"))
    val ptok = toks
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), col("pos").cast("long").as("tpos"),
        col("col").as("tok"))
    val covered = repeatedSpans(toks)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SpanL - 1))).as("tpos"))
      .distinct()
    val cleaned = ptok.join(covered, Seq("doc_id", "tpos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
            x => x.getField("tok"))).as("cleaned_text"))
    toks.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }
}
