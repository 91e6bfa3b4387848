package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the individual operators
  * exist for: quality-score filter → language filter → exact dedup →
  * MinHash-LSH near-dup removal → per-source document/token budget.
  * This is the canonical training-data curation pass (the C4/RefinedWeb
  * shape) expressed entirely with this library's operators.
  *
  * Scale shape, stage by stage: quality/lang scoring is map-side HOF
  * compute (zero shuffle); exact dedup is one partial-aggregated shuffle
  * on the normalized text; near-dup candidates are the bucketed LSH
  * exchange (graft.operators.NearDup.minhashLsh — k ints per doc, capped
  * buckets); the final report is one partial-aggregable group-by. No
  * stage is quadratic; every intermediate is (doc_id, small payload).
  *
  * Near-dup resolution policy: drop every doc that appears as the larger
  * id of a verified pair (keep-smallest greedy). One pass, deterministic,
  * oracle-expressible; a full connected-components pass would also drop
  * transitive dups the greedy keeps — acceptable for curation where
  * near-dup edges are already rare after exact dedup, and iterative CC
  * is a different cost class (multi-round shuffles).
  */
object Curation extends QueryModule {

  /** The curation pass as a reusable operator: quality filter → language
    * filter → exact dedup (min-id survivor) → near-dup removal
    * (keep-smallest greedy over MinHash-LSH pairs). Input needs columns
    * (doc_id, source, text); returns the surviving documents with their
    * token arrays attached. */
  def curate(
      docs: org.apache.spark.sql.DataFrame,
      minQuality: Double = 0.25,
      minStopHits: Int = 2,
      scope: graft.CacheScope = new graft.CacheScope): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("source"), col("text"),
        X.tokens(col("text")).as("tk"))
    // quality: the q32 formula, verbatim; lang: the q31 heuristic
    val scored = toks
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("stop_hits",
        size(filter(col("tk"), t => t.isin(X.stopwords: _*))).cast("long"))
      .withColumn("short_hits",
        size(filter(col("tk"), t => length(t) <= 2)).cast("long"))
      .withColumn("quality",
        least(col("n"), lit(200L)).cast("double") / 200.0 * 0.5
          + col("stop_hits").cast("double") / col("n").cast("double") * 0.3
          + (lit(1.0) - col("short_hits").cast("double") / col("n").cast("double")) * 0.2)
      .withColumn("hits",
        size(array_intersect(array_distinct(col("tk")), X.stopwordsArr)))
    // persisted: kept feeds both the exact-dedup group-by and the
    // survivor join; sdocs feeds near-dup candidate generation AND the
    // final anti-join — without these, the tokenize+scoring pipeline
    // re-evaluates up to 4× (the same checkpoint convention as the
    // signature tables in NearDup/Dedup). Cached through `scope` so a
    // long-lived caller can release them after the final action.
    val kept = scored.filter(col("quality") >= minQuality && col("hits") >= minStopHits)
      .transform(scope.cache)
    // exact dedup: keep the min-id doc per normalized text
    val survivors = kept
      .withColumn("norm", concat_ws(" ", col("tk")))
      .groupBy(col("norm")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val sdocs = kept.join(survivors, "doc_id").transform(scope.cache)
    // near-dup removal among survivors (q41 parameters)
    val nearDupPairs = graft.operators.NearDup.minhashLsh(
      sdocs.select(col("doc_id"), col("text")), col("doc_id"), col("text"),
      numHashes = 12, bands = 3, shingleWidth = 3, threshold = 0.5,
      scope = scope)
    val dropped = nearDupPairs.select(col("doc_b").as("doc_id")).distinct()
    sdocs.join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("text"), col("tk"))
  }

  /** Shared q58/q83 prep: md5-residue split assignment (18/20 train,
    * 1/20 val, 1/20 test) and the per-doc distinct 5-shingle hash
    * stream. Returns (docs, split residue column, shingle hashes).
    * `private[graft]` so PartitionedBloomSpec's round-trip test builds
    * its sketch table from the PRODUCTION prep, not a copy. */
  private[graft] def contamPrep(s: SparkSession, dir: String)
      : (DataFrame, Column, DataFrame) = {
    val split = X.hp(col("doc_id").cast("string")) % 20
    val docs = T.documents(s, dir)
    val sh = docs
      .select(col("doc_id"), col("source"),
        when(split <= 17, "train").when(split === 18, "val").otherwise("test")
          .as("split"),
        explode(array_distinct(
          X.shingles(X.tokens(col("text")), 5))).as("sg"))
      .withColumn("h", X.h60(col("sg")))
    (docs, split, sh)
  }

  /** Shared q58/q83 contract fold: per-doc bloom-vs-exact comparison,
    * then the per-source tolerance booleans the oracle pins.
    * `testHits` carries one row per test shingle with its sketch
    * verdict (doc_id, source, h?, hit); `testSh`/`trainH` feed the
    * exact-overlap branch the sketch is audited against. */
  private def bloomContract(docs: DataFrame, split: Column,
      testHits: DataFrame, testSh: DataFrame, trainH: DataFrame,
      fpp: Double): DataFrame = {
    val perDoc = testHits
      .groupBy(col("doc_id"), col("source"))
      .agg(expr("bool_or(hit)").as("bloom_hit"),
        count(lit(1)).as("n_sh")) // per-doc shingle fan-in, for the bound
      .join(testSh.join(trainH, "h").select(col("doc_id")).distinct()
        .withColumn("exact_hit", lit(true)), Seq("doc_id"), "left")
      .withColumn("exact_hit", coalesce(col("exact_hit"), lit(false)))
    val testDocs = docs.filter(split === 19)
      .groupBy(col("source")).agg(count(lit(1)).as("n_test_docs"))
    testDocs
      .join(perDoc.groupBy(col("source")).agg(
        sum(when(col("exact_hit"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("exact_hit") && !col("bloom_hit"), 1L).otherwise(0L))
          .as("nfn"),
        sum(when(col("bloom_hit") && !col("exact_hit"), 1L).otherwise(0L))
          .as("nfp"),
        sum(col("n_sh")).as("tot_sh")), Seq("source"), "left")
      // Tolerance DERIVED from the data, not a fixed doc fraction:
      // a doc false-flags with probability 1-(1-fpp)^n ≤ n·fpp, so
      // E[false-positive docs per source] ≤ fpp · Σ n_i = fpp·tot_sh
      // regardless of how shingles distribute across docs. 5× the
      // expectation + 3 absolute slack is a generous concentration
      // bound that scales with document length — a long-document
      // source raises tot_sh and the bound with it, where a fixed
      // doc-fraction constant silently tightens per shingle.
      .select(col("source"), col("n_test_docs"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("nfn"), lit(0L)).as("n_false_neg"),
        (coalesce(col("nfp"), lit(0L)).cast("double")
          <= lit(5.0 * fpp) * coalesce(col("tot_sh"), lit(0L)).cast("double")
            + lit(3.0))
          .as("fp_within_tolerance"))
      .orderBy(col("source"))
  }

  /** Shard count for the sharded Bloom build, DERIVED from the
    * train-side distinct-shingle count, not hardcoded: one shard's
    * sketch should fit a task comfortably, so target ~8M distinct
    * shingles per shard (~19 MB at fpp=1e-4's ~19 bits/item), floor 8
    * for build parallelism. At 10⁹⁺ train shingles this yields the
    * hundreds of shards the design calls for; at fixture scale the
    * floor keeps the plan shape identical. Correctness is shard-count-
    * independent (membership is exact per shard), so the derivation
    * only moves task sizing. */
  private[graft] def bloomShardCount(nTrain: Long): Int = {
    val targetPerShard = 8L * 1000 * 1000
    // overflow-free ceil-div + clamp so the sizing rule is TOTAL: the
    // +target-1 trick wraps negative near Long.MaxValue, and past
    // ~2^31 shards the long→int cast would wrap too; 2^20 shards
    // ≈ 8.8e12 shingles is already beyond any single build this rule
    // should size
    val ceil = nTrain / targetPerShard + (if (nTrain % targetPerShard > 0) 1L else 0L)
    math.min(1L << 20, math.max(8L, ceil)).toInt
  }

  /** q58/q83 shared oracle: the contract (exact counts + pinned
    * booleans) is sketch-implementation-independent, so both the
    * broadcast and the sharded variant check against the same SQL. */
  private val bloomOracleSql = s"""
        WITH toks AS (SELECT doc_id, source,
                        CASE WHEN ${X.hpSql("CAST(doc_id AS VARCHAR)")} % 20 <= 17 THEN 'train'
                             WHEN ${X.hpSql("CAST(doc_id AS VARCHAR)")} % 20 = 18 THEN 'val'
                             ELSE 'test' END AS split,
                        ${X.tokensSql("text")} AS tk
                      FROM documents),
        sh AS (SELECT doc_id, source, split, ${X.h60Sql("s")} AS h
               FROM (SELECT doc_id, source, split,
                            unnest(list_distinct(${X.shinglesSql("tk", 5)})) AS s
                     FROM toks)),
        train_h AS (SELECT DISTINCT h FROM sh WHERE split = 'train'),
        cont AS (SELECT DISTINCT t.doc_id, t.source
                 FROM sh t JOIN train_h ON t.h = train_h.h
                 WHERE t.split = 'test')
        SELECT td.source, td.n_test_docs,
               COALESCE(c.n_exact, 0) AS n_exact,
               CAST(0 AS BIGINT) AS n_false_neg,
               TRUE AS fp_within_tolerance
        FROM (SELECT source, COUNT(*) AS n_test_docs FROM toks
              WHERE split = 'test' GROUP BY source) td
        LEFT JOIN (SELECT source, COUNT(*) AS n_exact
                   FROM cont GROUP BY source) c USING (source)
        ORDER BY td.source"""

  /** sqrt-smoothed per-source sampling thresholds (the temperature /
    * alpha-sampling move): rate_s ∝ sqrt(n_s)/n_s, realized as
    * floor(10000·sqrt(n_s)/max_s sqrt(n_s)) — exact integers both
    * engines compute identically. ONE definition shared by q49 and the
    * q90 manifest (engine AND oracle sides) so the load-bearing
    * determinism arithmetic can never drift between them. Returns
    * (source, thr); sample membership is then
    * `hp(doc_id) % 10000 < thr`. */
  /** q178/q179's per-(source, power-of-two-length-bucket) doc counts —
    * the drift monitor's LINEAR state: fold epochs by per-key SUM.
    * Bucket = bitlen(n_tokens+1) via length(bin(·)), pure integer. */
  private[graft] def sourceBucketCounts(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        length(bin(size(X.tokens(col("text"))).cast("long") + lit(1L)))
          .cast("long").as("b"))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("cnt"))

  /** Per-key-SUM fold of two (source, b, cnt) count tables — the drift
    * monitor's merge law (linear sketch: the fold IS the union corpus's
    * counts). Shared by q179's catalog fold and the streaming drift
    * sink so batch and stream can never disagree on the algebra. */
  private[graft] def mergeSourceBucketCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))

  /** The drift report over a (source, b, cnt) count table — shared by
    * q178 (in-query counts) and q179 (catalog-served counts), so the
    * served monitor can never drift from the definition. Unordered;
    * callers sort. Everything here runs on the sources × buckets grid
    * (1-row/grid broadcasts + a grid window) — driver-scale. */
  private[graft] def driftReport(sb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = sb.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
    val cb = sb.groupBy(col("b")).agg(sum(col("cnt")).as("cntc"))
    val n1 = sb.agg(sum(col("cnt")).as("n"))
    st.crossJoin(broadcast(cb)).crossJoin(broadcast(n1))
      .join(sb, Seq("source", "b"), "left")
      .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
      .withColumn("diff",
        expr("(cnt0 * 10000) div tot - (cntc * 10000) div n"))
      .withColumn("adiff", abs(col("diff")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("adiff").desc, col("b"))))
      .groupBy(col("source"))
      .agg(max(col("tot")).as("n_docs"),
        sum(col("adiff")).as("l1_bps"),
        max(when(col("rk") === 1, col("b"))).as("top_bucket"),
        max(when(col("rk") === 1, col("diff"))).as("top_diff_bps"))
  }

  /** SQL mirror of [[driftReport]] over a counts CTE (source, b, cnt),
    * tag-namespaced so two count universes compose in one statement
    * (q179 serves two versions). Exposes `${tag}f`(source, n_docs,
    * l1_bps, top_bucket, top_diff_bps). */
  private def driftTailSql(tag: String, counts: String): String = s"""
        ${tag}st AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot FROM $counts GROUP BY 1),
        ${tag}cb AS (SELECT b, CAST(SUM(cnt) AS BIGINT) AS cntc FROM $counts GROUP BY 1),
        ${tag}n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM $counts),
        ${tag}g AS (SELECT s.source, s.tot, c.b, c.cntc, n.n, coalesce(x.cnt, 0) AS cnt
                    FROM ${tag}st s CROSS JOIN ${tag}cb c CROSS JOIN ${tag}n n
                    LEFT JOIN $counts x ON x.source = s.source AND x.b = c.b),
        ${tag}d AS (SELECT source, tot, b,
                           (cnt*10000)//tot - (cntc*10000)//n AS diff
                    FROM ${tag}g),
        ${tag}r AS (SELECT source, tot, b, diff, abs(diff) AS adiff,
                           row_number() OVER (PARTITION BY source
                             ORDER BY abs(diff) DESC, b) AS rk
                    FROM ${tag}d),
        ${tag}f AS (SELECT source, CAST(MAX(tot) AS BIGINT) AS n_docs,
                           CAST(SUM(adiff) AS BIGINT) AS l1_bps,
                           CAST(MAX(CASE WHEN rk = 1 THEN b END) AS BIGINT) AS top_bucket,
                           CAST(MAX(CASE WHEN rk = 1 THEN diff END) AS BIGINT) AS top_diff_bps
                    FROM ${tag}r GROUP BY source)"""

  private def mixtureThresholds(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val mx = counts.agg(max(sqrt(col("n").cast("double"))).as("mx"))
    counts.crossJoin(broadcast(mx))
      .select(col("source"),
        floor(lit(10000.0) * sqrt(col("n").cast("double")) / col("mx"))
          .cast("long").as("thr"))
  }

  /** Sequence-packing tail shared by q47 (whitespace token counts) and
    * q132 (BPE subword counts — the SAME arithmetic, different token
    * unit): docs pack per shard (source) in deterministic doc_id order
    * via a running token cumsum; a doc's bin is where its first token
    * lands. Input needs (doc_id, source, n_tokens). One sort shuffle
    * on (source) + a partial-aggregable group-by; shards stay
    * independent, so no global order ever materializes. */
  private[ext] def packByBudget(counted: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    counted
      .withColumn("cum", sum(col("n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin", ((col("cum") - col("n_tokens")) / budget).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy(col("source"), col("bin"))
  }

  /** SQL mirror of [[packByBudget]] over a CTE named `nt` with columns
    * (doc_id, source, n_tokens) — ONE text shared by the q47 and q132
    * oracles so the packing arithmetic cannot drift between units. */
  private[ext] def packTailSql(budget: Long): String = s"""
        SELECT source, bin, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        FROM (SELECT source,
                     CAST((cum - n_tokens) // $budget AS BIGINT) AS bin,
                     n_tokens
              FROM (SELECT source, doc_id, n_tokens,
                           SUM(n_tokens) OVER (
                             PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                             AS cum
                    FROM nt))
        GROUP BY source, bin ORDER BY source, bin"""

  /** Shard-manifest tail shared by q90 (n_chars payload, whitespace
    * gate) and q133 (BPE token payload): sqrt-smoothed mixture sampling
    * over the SURVIVORS' source counts, deterministic md5-residue shard
    * assignment and within-shard order. Input `quality` needs (doc_id,
    * source, `carry`); persists nothing itself — callers persist their
    * gated frame (it feeds both the threshold aggregate and the join).
    * Two tiny broadcast aggregates + one map-side filter + one rank
    * shuffle ∝ output. */
  private[ext] def shardManifest(quality: DataFrame, carry: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("oh"), col("doc_id"))
    quality.join(broadcast(mixtureThresholds(quality)), "source")
      .filter(X.hp(col("doc_id").cast("string")) % 10000 < col("thr"))
      .withColumn("shard",
        X.hp(concat(lit("shard "), col("doc_id").cast("string"))) % 8)
      .withColumn("oh",
        X.h60(concat(lit("ord "), col("doc_id").cast("string"))))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"),
        col("source"), col(carry))
      .orderBy(col("shard"), col("pos"))
  }

  /** SQL mirror of [[shardManifest]] over a CTE named `q` with columns
    * (doc_id, source, `carry`) — shared by the q90 and q133 oracles. */
  private[ext] def manifestTailSql(carry: String): String = s"""
        ${mixtureThrSqlCtes("q")},
        sm AS (SELECT q.doc_id, q.source, q.$carry FROM q
               JOIN th ON th.source = q.source
               WHERE ${X.hpSql("CAST(q.doc_id AS VARCHAR)")} % 10000 < thr),
        sh AS (SELECT doc_id, source, $carry,
                 ${X.hpSql("'shard ' || CAST(doc_id AS VARCHAR)")} % 8 AS shard,
                 ${X.h60Sql("'ord ' || CAST(doc_id AS VARCHAR)")} AS oh
               FROM sm)
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY oh, doc_id) AS BIGINT) AS pos,
               doc_id, source, $carry
        FROM sh ORDER BY shard, pos"""

  /** SQL mirror of [[mixtureThresholds]]: CTEs `counts`, `m`, `th`
    * computing (source, thr) over `from` rows carrying a source col. */
  private def mixtureThrSqlCtes(from: String): String =
    s"""counts AS (SELECT source, COUNT(*) AS n FROM $from GROUP BY source),
        m AS (SELECT MAX(sqrt(CAST(n AS DOUBLE))) AS mx FROM counts),
        th AS (SELECT source,
                      CAST(floor(10000.0 * sqrt(CAST(n AS DOUBLE)) / mx) AS BIGINT) AS thr
               FROM counts, m)"""

  /** q162/q186's shared PII pass: plant deterministic email/URL/card/
    * phone/IP tokens (fixture has none), whitespace-split preserving
    * raw tokens, classify each token E/U/C/I/P/K — map-side, carrying
    * (doc_id, source, tk, cls). ONE definition so the masker and the
    * exposure report classify identically. The IPv4 class (Dolma-class
    * scrubbing masks IPs alongside emails/phones) tests BEFORE the
    * phone class: a dotted quad is all [0-9.] with ≥ 7 digits, so the
    * phone regex would otherwise swallow it. The CREDIT-CARD class
    * (Dolma masks these too) tests before BOTH: a 13-19 digit run that
    * passes the integer Luhn checksum (doubling every second digit
    * from the right, −9 when > 9, total ≡ 0 mod 10 — pure int
    * arithmetic, identical on both engines) is 'C'; a Luhn-FAILING
    * digit run deliberately falls through to the phone class (it
    * satisfies the phone charset + digit floor — masking it as a
    * phone-like number is the conservative Dolma behavior, and the
    * ordering is the correctness point). Plants: %19 docs gain a VALID
    * card, %23 docs a Luhn-broken sibling — both paths fire. */
  private def piiClassified(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact-"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" http://site-"), col("doc_id").cast("string"),
            lit(".example"))).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" +1-555-0"),
            (lit(100L) + col("doc_id") % 100).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          concat(lit(" 10."), (col("doc_id") % 200).cast("string"),
            lit("."), (col("doc_id") % 250).cast("string"),
            lit("."), (lit(1L) + col("doc_id") % 254).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0, concat(lit(" "),
          expr("""CASE doc_id % 3 WHEN 0 THEN '4111111111111111'
                  WHEN 1 THEN '5500005555555559'
                  ELSE '340000000000009' END""")))
          .otherwise(lit("")),
        when(col("doc_id") % 23 === 0, concat(lit(" "),
          expr("""CASE doc_id % 3 WHEN 0 THEN '4111111111111112'
                  WHEN 1 THEN '5500005555555551'
                  ELSE '340000000000001' END""")))
          .otherwise(lit(""))).as("text"))
      .withColumn("tk", expr("filter(split(text, ' +'), t -> t != '')"))
      .withColumn("cls", expr(s"""transform(tk, t -> CASE
        WHEN t RLIKE '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+$$'
          THEN 'E'
        WHEN t LIKE 'http://%' OR t LIKE 'https://%' OR t LIKE 'www.%'
          THEN 'U'
        WHEN t RLIKE '^[0-9]{13,19}$$'
             AND aggregate(sequence(1, length(t)), CAST(0 AS BIGINT),
               (acc, i) -> acc + CASE
                 WHEN (length(t) - i) % 2 = 1 THEN
                   CASE WHEN 2 * CAST(ascii(substring(t, i, 1)) - 48 AS BIGINT) > 9
                        THEN 2 * CAST(ascii(substring(t, i, 1)) - 48 AS BIGINT) - 9
                        ELSE 2 * CAST(ascii(substring(t, i, 1)) - 48 AS BIGINT) END
                 ELSE CAST(ascii(substring(t, i, 1)) - 48 AS BIGINT) END) % 10 = 0
          THEN 'C'
        WHEN t RLIKE '^[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}$$'
          THEN 'I'
        WHEN t RLIKE '^[0-9+().-]+$$'
             AND length(regexp_replace(t, '[^0-9]', '')) >= 7
          THEN 'P'
        ELSE 'K' END)"""))

  /** SQL mirror of [[piiClassified]] — CTEs planted/tkc/cls, exposing
    * cls(doc_id, source, tk, cl). */
  private val piiClsCtesSql = s"""planted AS (
          SELECT doc_id, source, text
            || CASE WHEN doc_id % 7 = 0
                 THEN ' contact-' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
            || CASE WHEN doc_id % 11 = 0
                 THEN ' http://site-' || CAST(doc_id AS VARCHAR) || '.example'
                 ELSE '' END
            || CASE WHEN doc_id % 13 = 0
                 THEN ' +1-555-0' || CAST(100 + doc_id % 100 AS VARCHAR)
                 ELSE '' END
            || CASE WHEN doc_id % 17 = 0
                 THEN ' 10.' || CAST(doc_id % 200 AS VARCHAR)
                   || '.' || CAST(doc_id % 250 AS VARCHAR)
                   || '.' || CAST(1 + doc_id % 254 AS VARCHAR)
                 ELSE '' END
            || CASE WHEN doc_id % 19 = 0
                 THEN ' ' || CASE doc_id % 3 WHEN 0 THEN '4111111111111111'
                             WHEN 1 THEN '5500005555555559'
                             ELSE '340000000000009' END
                 ELSE '' END
            || CASE WHEN doc_id % 23 = 0
                 THEN ' ' || CASE doc_id % 3 WHEN 0 THEN '4111111111111112'
                             WHEN 1 THEN '5500005555555551'
                             ELSE '340000000000001' END
                 ELSE '' END AS text
          FROM documents),
        tkc AS (SELECT doc_id, source,
                       list_filter(string_split_regex(text, ' +'),
                         t -> t != '') AS tk
                FROM planted),
        cls AS (SELECT doc_id, source, tk,
                       list_transform(tk, t -> CASE
                         WHEN regexp_matches(t,
                           '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+$$')
                           THEN 'E'
                         WHEN t LIKE 'http://%' OR t LIKE 'https://%'
                              OR t LIKE 'www.%' THEN 'U'
                         WHEN regexp_matches(t, '^[0-9]{13,19}$$')
                              AND list_sum(list_transform(
                                range(1, length(t) + 1), i -> CASE
                                  WHEN (length(t) - i) % 2 = 1 THEN
                                    CASE WHEN 2 * CAST(unicode(substring(t, i, 1)) - 48 AS BIGINT) > 9
                                         THEN 2 * CAST(unicode(substring(t, i, 1)) - 48 AS BIGINT) - 9
                                         ELSE 2 * CAST(unicode(substring(t, i, 1)) - 48 AS BIGINT) END
                                  ELSE CAST(unicode(substring(t, i, 1)) - 48 AS BIGINT) END)) % 10 = 0
                           THEN 'C'
                         WHEN regexp_matches(t,
                           '^[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}$$')
                           THEN 'I'
                         WHEN regexp_matches(t, '^[0-9+().-]+$$')
                              AND length(regexp_replace(t, '[^0-9]', '', 'g')) >= 7
                           THEN 'P'
                         ELSE 'K' END) AS cl
                FROM tkc)"""

  /** q225's priority assignment: pri = ⌊hp(doc)·10⁶ / n_chars⌋ —
    * U/w order sampling (sequential Poisson), deterministic via the
    * shared doc hash. private[graft]: the streaming weighted-sample
    * sink scores its batches with the same rule. */
  private[graft] def orderSamplePriorities(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id"), col("n_chars"),
        X.hp(col("doc_id").cast("string")).as("h"))
      // Zero-weight docs are excluded from the draw rather than divided
      // by: Spark's integer div would yield NULL (undefined placement in
      // the top-k struct) while DuckDB's `//` errors — filtering keeps
      // both engines on the same sample for empty documents.
      .where(col("n_chars") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"),
        expr("(h * 1000000) div n_chars").as("pri"))

  /** Per-source k-minimum-priority sample over a (source, doc_id,
    * n_chars, pri) frame, ranked — the q225 tail. Min-k is
    * ASSOCIATIVE over unions (with the doc_id tiebreak every key is
    * distinct), so the streaming sink folds per-batch samples into an
    * exact whole-history sample with k·|sources| bounded state. */
  private[graft] def orderSampleTopK(pri: DataFrame, k: Int = 10): DataFrame =
    pri.groupBy(col("source"))
      .agg(graft.functions.AggFunctions.topK(
        struct((-col("pri")).as("np"), (-col("doc_id")).as("nd"),
          col("doc_id").as("doc_id"), col("n_chars").as("n_chars"),
          col("pri").as("pri")), k).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("col.doc_id").as("doc_id"),
        col("col.n_chars").as("n_chars"), col("col.pri").as("pri"))

  override val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q45_curation_pipeline",
      (s, dir) => {
        curate(T.documents(s, dir).select(col("doc_id"), col("source"), col("text")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(col("tk")).cast("long")).as("total_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, source, ${X.tokensSql("text")} AS tk FROM documents),
        scored AS (
          SELECT doc_id, source, tk,
                 CAST(least(len(tk), 200) AS DOUBLE) / 200.0 * 0.5
                 + CAST(len(list_filter(tk, t -> list_contains(${X.stopwordsSql}, t))) AS DOUBLE)
                   / CAST(len(tk) AS DOUBLE) * 0.3
                 + (1.0 - CAST(len(list_filter(tk, t -> length(t) <= 2)) AS DOUBLE)
                   / CAST(len(tk) AS DOUBLE)) * 0.2 AS quality,
                 len(list_intersect(list_distinct(tk), ${X.stopwordsSql})) AS hits
          FROM toks),
        kept AS (SELECT * FROM scored WHERE quality >= 0.25 AND hits >= 2),
        surv AS (SELECT MIN(doc_id) AS doc_id
                 FROM (SELECT doc_id, array_to_string(tk, ' ') AS norm FROM kept)
                 GROUP BY norm),
        sdocs AS (SELECT k.* FROM kept k JOIN surv USING (doc_id)),
        shg AS (SELECT doc_id,
                  list_distinct(${X.shinglesSql("tk", 3)}) AS sh FROM sdocs),
        hm AS (SELECT doc_id, sh, list_transform(sh, s -> ${X.hpSql("s")}) AS hm FROM shg),
        sig AS (SELECT doc_id, sh, ${X.minhashSigSql("hm", 12)} AS sig
                FROM hm WHERE len(sh) > 0),
        bands AS (SELECT doc_id, bnd, array_to_string(sig[bnd*4+1:bnd*4+4], '-') AS bsig
                  FROM sig, (SELECT unnest(range(0, 3)) AS bnd)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.bnd = b.bnd AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
        pairs AS (
          SELECT doc_a, doc_b
          FROM cand JOIN sig x ON x.doc_id = doc_a JOIN sig y ON y.doc_id = doc_b
          WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                / CAST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                >= 0.5),
        dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
        final AS (SELECT * FROM sdocs
                  WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(tk)) AS BIGINT) AS total_tokens
        FROM final GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // q47: sequence packing — the concat-and-chunk pass that turns a
    // curated corpus into fixed-token-budget training sequences. Docs
    // are packed per SHARD (source) in deterministic doc_id order via a
    // running token cumsum; a doc's bin is where its first token lands.
    // Scale shape: packing is windowed WITHIN each shard (shards are
    // independent — the whole corpus never needs a global order), one
    // sort shuffle on (source), then a partial-aggregable group-by.
    QueryDef(
      "q47_sequence_packing",
      (s, dir) => packByBudget(
        T.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(X.tokens(col("text"))).cast("long").as("n_tokens")),
        budget = 512L),
      Some(s"""
        WITH nt AS (SELECT doc_id, source,
                           CAST(len(${X.tokensSql("text")}) AS BIGINT)
                             AS n_tokens
                    FROM documents)
        ${packTailSql(512L)}""")),

    // ------------------------------------------------------------------
    // q48: deterministic train/val/test split — md5-residue assignment
    // (engine-independent, reproducible, stable under retries and across
    // engines; the 3-way extension of q37's sampling). 90/5/5 by hash
    // residue mod 20; map-side only + one partial-aggregable group-by.
    QueryDef(
      "q48_train_val_test",
      (s, dir) => {
        val r = X.hp(col("doc_id").cast("string")) % 20
        T.documents(s, dir)
          .select(col("source"),
            when(r <= 17, "train").when(r === 18, "val").otherwise("test")
              .as("split"),
            col("n_chars"))
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("split_chars"))
          .orderBy(col("source"), col("split"))
      },
      Some(s"""
        SELECT source,
               CASE WHEN r <= 17 THEN 'train' WHEN r = 18 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS split_chars
        FROM (SELECT source, n_chars,
                     ${X.hpSql("CAST(doc_id AS VARCHAR)")} % 20 AS r
              FROM documents)
        GROUP BY source, split ORDER BY source, split""")),

    // ------------------------------------------------------------------
    // q49: mixture rebalancing — sqrt-smoothed per-source sampling (the
    // temperature/alpha-sampling move that keeps big sources from
    // drowning small ones): rate_s ∝ sqrt(n_s)/n_s, realized as a
    // deterministic md5-residue threshold so the SAMPLE itself (not
    // just the rates) is reproducible. Two passes: a tiny per-source
    // count aggregate (broadcast back), then one map-side filter —
    // the thresholds are floor'd products of exact counts, so both
    // engines compute identical integers.
    QueryDef(
      "q49_mixture_sample",
      (s, dir) => {
        val docs = T.documents(s, dir)
        docs.join(broadcast(mixtureThresholds(docs)), "source")
          .filter(X.hp(col("doc_id").cast("string")) % 10000 < col("thr"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH ${mixtureThrSqlCtes("documents")}
        SELECT d.source, COUNT(*) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        FROM documents d JOIN th ON th.source = d.source
        WHERE ${X.hpSql("CAST(doc_id AS VARCHAR)")} % 10000 < thr
        GROUP BY d.source ORDER BY d.source""")),

    // ------------------------------------------------------------------
    // q177: TOKEN-BUDGET APPORTIONMENT — the data-mixture quota table
    // (GPT-3 Table 2.2 / LLaMA Table 1 publish exactly this): a hard
    // training budget B (20% of the corpus's clean-token mass) split
    // across sources by largest-remainder (Hamilton) apportionment over
    // clean-token weights — quota_s = ⌊B·w_s/W⌋ plus one for the
    // ⌈⌉-largest remainders, so Σ quota = B EXACTLY (rate-based
    // sampling, q49, can't promise that; epoch planners need the hard
    // equality). repeat_centiepochs = how many hundredths of an epoch
    // of source s the budget buys — the "how many epochs of Wikipedia"
    // number. clean = n ≥ 5 tokens ∧ stopword share ≥ 5% (integer
    // gate: sh·20 ≥ n).
    //
    // 100 TB: per-source weights are ONE partial agg over the corpus;
    // the apportionment itself runs on the #sources-row table (1-row
    // broadcasts + a tiny window) — driver-scale by construction. At
    // trillion-token scale B·w_s would overflow int64: apportion in
    // kilotokens (scale weights down by a common factor first) —
    // DuckDB errors loudly on the breach rather than wrapping.
    QueryDef(
      "q177_token_budget_apportionment",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tok = T.documents(s, dir)
          .select(col("source"), X.tokens(col("text")).as("tk"))
          .select(col("source"), size(col("tk")).cast("long").as("n"),
            size(filter(col("tk"), t => t.isin(X.stopwords: _*)))
              .cast("long").as("sh"))
        val per = tok.groupBy(col("source"))
          .agg(sum(col("n")).as("tokens_total"),
            sum(when(col("n") >= 5L && col("sh") * 20L >= col("n"), col("n"))
              .otherwise(0L)).as("clean_tokens"))
        val tot = per.agg(sum(col("clean_tokens")).as("wsum"))
        val based = per.crossJoin(broadcast(tot))
          .withColumn("budget", expr("wsum div 5"))
          .withColumn("base", expr(
            "CASE WHEN wsum = 0 THEN 0L ELSE (budget * clean_tokens) div wsum END"))
          .withColumn("rem", expr(
            "CASE WHEN wsum = 0 THEN 0L ELSE (budget * clean_tokens) % wsum END"))
        val leftover = based.agg(
          (max(col("budget")) - sum(col("base"))).as("leftover"))
        based.crossJoin(broadcast(leftover))
          .withColumn("rk", row_number()
            .over(Window.orderBy(col("rem").desc, col("source"))).cast("long"))
          .withColumn("quota",
            col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .select(col("source"), col("tokens_total"), col("clean_tokens"),
            col("quota"),
            when(col("clean_tokens") === 0L, 0L)
              .otherwise(expr("(quota * 100) div clean_tokens"))
              .as("repeat_centiepochs"),
            when(col("budget") === 0L, 0L)
              .otherwise(expr("(quota * 10000) div budget")).as("share_bps"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH atok AS (SELECT source, ${X.tokensSql("text")} AS tk FROM documents),
        acnt AS (SELECT source, CAST(len(tk) AS BIGINT) AS n,
                        CAST(len(list_filter(tk, t -> list_contains(${X.stopwordsSql}, t))) AS BIGINT) AS sh
                 FROM atok),
        aper AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tokens_total,
                        CAST(SUM(CASE WHEN n >= 5 AND sh * 20 >= n THEN n ELSE 0 END) AS BIGINT) AS clean_tokens
                 FROM acnt GROUP BY source),
        aw AS (SELECT CAST(SUM(clean_tokens) AS BIGINT) AS wsum FROM aper),
        ab AS (SELECT p.source, p.tokens_total, p.clean_tokens,
                      w.wsum // 5 AS budget,
                      CASE WHEN w.wsum = 0 THEN 0 ELSE ((w.wsum // 5) * p.clean_tokens) // w.wsum END AS base,
                      CASE WHEN w.wsum = 0 THEN 0 ELSE ((w.wsum // 5) * p.clean_tokens) % w.wsum END AS rem
               FROM aper p, aw w),
        al AS (SELECT CAST(MAX(budget) - SUM(base) AS BIGINT) AS leftover FROM ab),
        ar AS (SELECT b.*, l.leftover,
                      CAST(row_number() OVER (ORDER BY b.rem DESC, b.source) AS BIGINT) AS rk
               FROM ab b, al l)
        SELECT source, tokens_total, clean_tokens,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota,
               CAST(CASE WHEN clean_tokens = 0 THEN 0
                    ELSE ((base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) * 100) // clean_tokens END AS BIGINT) AS repeat_centiepochs,
               CAST(CASE WHEN budget = 0 THEN 0
                    ELSE ((base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) * 10000) // budget END AS BIGINT) AS share_bps
        FROM ar ORDER BY source""")),

    // ------------------------------------------------------------------
    // q178: SOURCE DISTRIBUTION DRIFT — the per-source outlier monitor
    // every multi-source ingest runs (Dolma/FineWeb publish per-source
    // length histograms for exactly this): each source's token-count
    // distribution compared against the corpus-wide one over
    // power-of-two length buckets, scored by an integer L1 distance in
    // bps (2× total-variation distance) plus the single most-drifted
    // bucket and its signed deviation — the "src16 is 20% over-heavy
    // in 32-63-token docs" pointer that catches a broken extractor or
    // a boilerplate flood before it trains. Buckets are bitlen(n+1) =
    // length(bin(n+1)) — pure integer, exact on both engines (the
    // q121 bits discipline); shares are truncating bps divisions on
    // identical operands.
    //
    // 100 TB: the ONLY corpus-sized work is the map-side bucket
    // derivation + one (source, bucket) partial agg; everything after
    // runs on the sources × ~dozen-buckets grid (1-row broadcasts +
    // a grid window) — driver-scale by construction.
    QueryDef(
      "q178_source_drift",
      (s, dir) =>
        driftReport(sourceBucketCounts(T.documents(s, dir)))
          .orderBy(col("source")),
      Some(s"""
        WITH dtok AS (SELECT source,
                             length(bin(CAST(len(${X.tokensSql("text")})+1 AS BIGINT))) AS b
                      FROM documents),
        dsb AS (SELECT source, b, COUNT(*) AS cnt FROM dtok GROUP BY 1, 2),
        ${driftTailSql("d", "dsb")}
        SELECT source, n_docs, l1_bps, top_bucket, top_diff_bps
        FROM df ORDER BY source""")),

    // ------------------------------------------------------------------
    // q179: DRIFT MONITOR THROUGH THE CATALOG — q178's report as a
    // MAINTAINED index (the q118/q119/q120 serving discipline): the
    // (source, bucket, cnt) table is a LINEAR sketch — epoch tables
    // fold by per-key SUM and the fold IS the union corpus's counts —
    // so each catalog version stores the running counts (v1 = epoch A,
    // v2 = fold(v1, epoch B)) and the SERVED report derives from the
    // count table alone: per version, the full q178 drift report with
    // ZERO corpus re-scans (shared [[driftReport]] code = the
    // non-drift proof). This is how a production ingest watches drift:
    // the monitor folds each batch into bounded state; the corpus is
    // never re-read. The oracle computes both versions' reports
    // directly from the parity partition, bit-for-bit.
    QueryDef(
      "q179_drift_catalog_serving",
      (s, dir) => {
        val work = graft.Scratch.dir("q179")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "source STRING, b BIGINT, cnt BIGINT")
        val docs = T.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text"))
        // bounded state (sources × ~dozen buckets): one file per version
        cat.writeNext("drift",
          sourceBucketCounts(docs.filter(col("doc_id") % 2 === 0))
            .coalesce(1))
        cat.writeNext("drift",
          mergeSourceBucketCounts(
            cat.read("drift", 1, Some(schema)),
            sourceBucketCounts(docs.filter(col("doc_id") % 2 === 1)))
            .coalesce(1))
        (1 to 2).map { v =>
          driftReport(cat.read("drift", v, Some(schema)))
            .select(lit(v.toLong).as("version"), col("source"),
              col("n_docs"), col("l1_bps"), col("top_bucket"),
              col("top_diff_bps"))
        }.reduce(_ unionByName _).orderBy(col("version"), col("source"))
      },
      Some(s"""
        WITH vtok AS (SELECT doc_id % 2 AS par, source,
                             length(bin(CAST(len(${X.tokensSql("text")})+1 AS BIGINT))) AS b
                      FROM documents),
        vcnt AS (SELECT par, source, b, COUNT(*) AS cnt FROM vtok GROUP BY 1, 2, 3),
        v1c AS (SELECT source, b, CAST(SUM(cnt) AS BIGINT) AS cnt
                FROM vcnt WHERE par = 0 GROUP BY 1, 2),
        v2c AS (SELECT source, b, CAST(SUM(cnt) AS BIGINT) AS cnt
                FROM vcnt GROUP BY 1, 2),
        ${driftTailSql("v1", "v1c")},
        ${driftTailSql("v2", "v2c")}
        SELECT CAST(1 AS BIGINT) AS version, source, n_docs, l1_bps, top_bucket, top_diff_bps FROM v1f
        UNION ALL
        SELECT CAST(2 AS BIGINT) AS version, source, n_docs, l1_bps, top_bucket, top_diff_bps FROM v2f
        ORDER BY version, source""")),

    // ------------------------------------------------------------------
    // q182: PACKING EFFICIENCY SWEEP — the context-length tuning table
    // (every training run picks a sequence length; T5/GPT-NeoX docs
    // discuss exactly this fill-factor tradeoff): q47's packing
    // arithmetic evaluated at THREE candidate budgets (256/512/1024) in
    // one statement — bins produced, fill factor in bps of capacity,
    // and bins a straddling doc overflows. Longer contexts pack the
    // tail worse (the last bin per shard underfills); this is the
    // measured curve that decision reads. Tokenize ONCE (checkpointed),
    // three window+agg passes over the counted frame — each is q47's
    // exact shape (shared packByBudget/packTailSql, so the sweep can
    // never drift from the shipped packer).
    QueryDef(
      "q182_packing_efficiency_sweep",
      (s, dir) => {
        val counted = T.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(X.tokens(col("text"))).cast("long").as("n_tokens"))
          .localCheckpoint(eager = false) // three sweep passes read it
        Seq(256L, 512L, 1024L).map { b =>
          packByBudget(counted, b)
            .agg(count(lit(1)).as("n_bins"),
              sum(col("bin_tokens")).as("total_tokens"),
              sum(when(col("bin_tokens") > b, 1L).otherwise(0L))
                .as("overflow_bins"))
            .select(lit(b).as("budget"), col("n_bins"), col("total_tokens"),
              expr(s"(total_tokens * 10000) div (n_bins * $b)").as("fill_bps"),
              col("overflow_bins"))
        }.reduce(_ unionByName _).orderBy(col("budget"))
      },
      Some(s"""
        WITH nt AS (SELECT doc_id, source,
                           CAST(len(${X.tokensSql("text")}) AS BIGINT) AS n_tokens
                    FROM documents),
        pk256 AS (${packTailSql(256)}),
        pk512 AS (${packTailSql(512)}),
        pk1024 AS (${packTailSql(1024)})
        SELECT * FROM (
          ${Seq(256, 512, 1024).map { b =>
            s"""SELECT CAST($b AS BIGINT) AS budget, COUNT(*) AS n_bins,
               CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
               (CAST(SUM(bin_tokens) AS BIGINT) * 10000) // (COUNT(*) * $b) AS fill_bps,
               CAST(SUM(CASE WHEN bin_tokens > $b THEN 1 ELSE 0 END) AS BIGINT) AS overflow_bins
          FROM pk$b"""
          }.mkString("\n          UNION ALL\n          ")})
        ORDER BY budget""")),

    // ------------------------------------------------------------------
    // q56: decontamination — flag test-split documents sharing any
    // 5-gram with ANY train-split document (the q48 hash split). The
    // overlap join runs on 60-bit shingle HASHES, not strings: the
    // shuffle carries 8 bytes per shingle and both engines hash
    // identically, so results stay bit-comparable (a hash collision
    // would affect both sides the same way). Train shingles are
    // distinct-reduced before the join — partial aggregation makes that
    // exchange ∝ unique shingles; at 100 TB the train side would also
    // get a df cap + bloom pre-filter, same machinery as q43.
    QueryDef(
      "q56_decontamination",
      (s, dir) => {
        val split = X.hp(col("doc_id").cast("string")) % 20
        val sh = T.documents(s, dir)
          .select(col("doc_id"), col("source"),
            when(split <= 17, "train").when(split === 18, "val").otherwise("test")
              .as("split"),
            explode(array_distinct(
              X.shingles(X.tokens(col("text")), 5))).as("s"))
          .withColumn("h", X.h60(col("s")))
        val trainSh = sh.filter(col("split") === "train")
          .select(col("h")).distinct()
        val contaminated = sh.filter(col("split") === "test")
          .join(trainSh, "h")
          .select(col("doc_id"), col("source")).distinct()
        val testDocs = T.documents(s, dir)
          .filter(split === 19)
          .groupBy(col("source")).agg(count(lit(1)).as("n_test_docs"))
        testDocs
          .join(contaminated.groupBy(col("source"))
            .agg(count(lit(1)).as("n_contaminated")), Seq("source"), "left")
          .select(col("source"), col("n_test_docs"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, source,
                        CASE WHEN ${X.hpSql("CAST(doc_id AS VARCHAR)")} % 20 <= 17 THEN 'train'
                             WHEN ${X.hpSql("CAST(doc_id AS VARCHAR)")} % 20 = 18 THEN 'val'
                             ELSE 'test' END AS split,
                        ${X.tokensSql("text")} AS tk
                      FROM documents),
        sh AS (SELECT doc_id, source, split, ${X.h60Sql("s")} AS h
               FROM (SELECT doc_id, source, split,
                            unnest(list_distinct(${X.shinglesSql("tk", 5)})) AS s
                     FROM toks)),
        train_h AS (SELECT DISTINCT h FROM sh WHERE split = 'train'),
        cont AS (SELECT DISTINCT t.doc_id, t.source
                 FROM sh t JOIN train_h ON t.h = train_h.h
                 WHERE t.split = 'test')
        SELECT td.source, td.n_test_docs,
               COALESCE(c.n_contaminated, 0) AS n_contaminated
        FROM (SELECT source, COUNT(*) AS n_test_docs FROM toks
              WHERE split = 'test' GROUP BY source) td
        LEFT JOIN (SELECT source, COUNT(*) AS n_contaminated
                   FROM cont GROUP BY source) c USING (source)
        ORDER BY td.source""")),

    // ------------------------------------------------------------------
    // q58: Bloom-filter decontamination — q56's exact overlap join,
    // re-expressed the way it runs at 100 TB: train shingle hashes
    // fold into a driver-built Bloom sketch (distributed treeAggregate,
    // same mechanism as Spark's runtime join pruning), the sketch rides
    // broadcast-style into a compiled membership expression, and the
    // test side streams MAP-SIDE — the big table never shuffles into a
    // join. The oracle checks the sketch's CONTRACT, not its bits:
    // n_false_neg must be exactly 0 (Bloom guarantees no false
    // negatives, so the exact q56 answer is fully recovered) and the
    // doc-level false-positive overshoot must sit inside the
    // 5·fpp·tot_sh + 3 bound derived from the per-shingle fpp=1e-4 and
    // the observed shingle fan-in — both engine-side booleans the
    // oracle pins to their guaranteed values, like q25's HLL contract.
    QueryDef(
      "q58_bloom_decontamination",
      (s, dir) => {
        val (docs, split, sh) = contamPrep(s, dir)
        // persisted: trainH feeds the sizing count, the bloom-build
        // treeAggregate AND the exact-overlap join; testSh feeds both
        // final branches — without these the tokenize+shingle+md5
        // pipeline re-runs up to 4× (the q45/Dedup checkpoint
        // convention; the verify/bench drivers clearCache per query)
        val trainH = sh.filter(col("split") === "train").select(col("h"))
          .distinct().persist()
        val testSh = sh.filter(col("split") === "test").persist()
        // the distinct count sizes the sketch; one cheap extra pass over
        // the (already persisted) train hashes. fpp is per SHINGLE, and
        // a doc flags if ANY of its ~n shingles hits — the doc-level FP
        // rate is 1-(1-fpp)^n, so fpp must price in the per-doc shingle
        // count: 1e-4 keeps ~40-shingle docs at ~0.4% (1e-2 would
        // false-flag a third of them). ~19 bits/item. Driver memory
        // grows with the TRAIN corpus (SCALE.md states the arithmetic);
        // q83 is the sharded form with no such allocation.
        val fpp = 1e-4
        val bloom = trainH.stat.bloomFilter(
          "h", math.max(trainH.count(), 1000L), fpp)
        bloomContract(docs, split,
          testSh.withColumn("hit",
            graft.functions.BloomFunctions.mightContainLong(col("h"), bloom)),
          testSh, trainH, fpp)
      },
      Some(bloomOracleSql)),

    // ------------------------------------------------------------------
    // q83: q58's decontamination with a SHARDED sketch — the 100 TB
    // form for when the TRAIN side is itself corpus-sized and a single
    // driver-built Bloom (~19 bits × distinct shingles) stops fitting.
    // Train hashes shard by pmod(h, P); each shard aggregates its own
    // BloomFilter (BloomBuildAgg, repartitioned first so partial-agg
    // buffers never multiply across tasks), yielding a (shard, sketch)
    // TABLE that could be catalog-persisted like the q82 signature
    // table. Membership is a cogroup on the shard id: each task
    // deserializes only ITS shards' sketches once and streams its test
    // shingles through them — the deliberate trade vs q58 is one
    // test-side shuffle by shard in exchange for zero
    // corpus-proportional driver/broadcast allocation. Same contract,
    // same oracle: zero false negatives, fp inside the fpp-derived
    // bound (per-shingle fp is still one sketch lookup at fpp).
    QueryDef(
      "q83_bloom_decontam_sharded",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val (docs, split, sh) = contamPrep(s, dir)
        val trainH = sh.filter(col("split") === "train").select(col("h"))
          .distinct().persist()
        val testSh = sh.filter(col("split") === "test").persist()
        val fpp = 1e-4
        val nTrain = trainH.count()
        val nShards = bloomShardCount(nTrain)
        val perShard = math.max(nTrain / nShards + 1, 1000L)
        val sketches = trainH
          .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
          .repartition(nShards, col("shard"))
          .groupBy(col("shard"))
          .agg(graft.functions.BloomFunctions
            .bloomBuild(col("h"), perShard, fpp).as("sketch"))
          .as[(Int, Array[Byte])]
        val testKeyed = testSh
          .select(col("doc_id"), col("source"), col("h"),
            pmod(col("h"), lit(nShards.toLong)).cast("int").as("shard"))
          .as[(Long, String, Long, Int)]
        val hits = testKeyed.groupByKey(_._4)
          .cogroup(sketches.groupByKey(_._1)) { (_, tIt, sIt) =>
            // ≤1 sketch row per shard; deserialize once, stream the
            // test side through it. A shard with no train hashes has no
            // sketch row → everything is a miss, which is exact.
            val bloom =
              if (sIt.hasNext) Some(org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(sIt.next()._2)))
              else None
            tIt.map { case (doc, src, h, _) =>
              (doc, src, bloom.exists(_.mightContainLong(h)))
            }
          }
          .toDF("doc_id", "source", "hit")
        bloomContract(docs, split, hits, testSh, trainH, fpp)
      },
      Some(bloomOracleSql)),

    // ------------------------------------------------------------------
    // q90: training-shard MANIFEST — the artifact a curation pipeline
    // actually hands to the trainer: quality gate (map-side) →
    // sqrt-smoothed mixture sampling (the q49 move, rates derived from
    // the SURVIVORS' source counts) → deterministic shard assignment →
    // deterministic within-shard order. Every stage is md5-residue
    // arithmetic, so the manifest — including the exact per-shard
    // ordering, which is what makes a training run reproducible — is
    // bit-identical across engines, reruns, and cluster sizes. Shard
    // and order hashes use distinct prefixes ("shard "/"ord ") so
    // sampling, sharding, and ordering draw independent residue
    // streams. Scale shape: two tiny broadcast aggregates (per-source
    // counts, max) + one map-side filter + one rank shuffle ∝ output.
    QueryDef(
      "q90_training_manifest",
      (s, dir) => {
        // persisted: the tokenize-gated frame feeds the threshold
        // aggregate AND the final join — without it the tokenize kernel
        // runs over the full table twice more (q58's persist convention;
        // the verify/bench drivers clearCache per query)
        val quality = T.documents(s, dir)
          .filter(col("n_chars") >= 100 && size(X.tokens(col("text"))) >= 20)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .persist()
        shardManifest(quality, carry = "n_chars")
      },
      Some(s"""
        WITH q AS (SELECT doc_id, source, n_chars FROM documents
                   WHERE n_chars >= 100 AND len(${X.tokensSql("text")}) >= 20),
        ${manifestTailSql("n_chars")}""")),

    // ------------------------------------------------------------------
    // q125: cross-source CONTAMINATION MATRIX — the audit the
    // decontamination family (q56/q58/q83) presupposes: which source
    // PAIRS overlap, and by how much? Exact distinct-3-shingle overlap
    // per source pair: |A ∩ B|, Jaccard, and containment of the
    // smaller side, all integer arithmetic. The pair expansion rides
    // the SHINGLE side (self-join of the distinct (shingle-hash,
    // source) table on the hash: work ∝ Σ per-shingle
    // sources-containing², bounded by #sources² per shingle — never
    // doc pairs, never the corpus²). The matrix frame is a
    // #sources×#sources cross of the per-source size table, so every
    // pair appears even at zero overlap. 60-bit keys as in q123: both
    // engines collide identically, shuffle rows stay narrow.
    QueryDef(
      "q125_source_overlap_matrix",
      (s, dir) => {
        val ss = T.documents(s, dir)
          .select(col("source"),
            explode(X.shingles(X.tokens(col("text")), 3)).as("sh"))
          .select(col("source"), X.h60(col("sh")).as("k"))
          .distinct()
        val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val common = ss.as("a")
          .join(ss.as("b"),
            col("a.k") === col("b.k") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
          .agg(count(lit(1)).as("n_common"))
        sizes.as("x")
          .join(sizes.as("y"), col("x.source") < col("y.source"))
          .select(col("x.source").as("s1"), col("y.source").as("s2"),
            col("x.n").as("n_sh_1"), col("y.n").as("n_sh_2"))
          .join(common, Seq("s1", "s2"), "left")
          .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
          .select(col("s1"), col("s2"), col("n_sh_1"), col("n_sh_2"),
            col("n_common"),
            expr("(n_common * 100) div (n_sh_1 + n_sh_2 - n_common)")
              .as("jaccard_pct"),
            expr("(n_common * 100) div least(n_sh_1, n_sh_2)")
              .as("containment_pct"))
          .orderBy(col("s1"), col("s2"))
      },
      Some(s"""
        WITH ss AS (SELECT DISTINCT source, ${X.h60Sql("sh")} AS k
                    FROM (SELECT source, unnest(${X.shinglesSql("tk", 3)}) AS sh
                          FROM (SELECT source, ${X.tokensSql("text")} AS tk
                                FROM documents))),
        sizes AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
        common AS (SELECT a.source AS s1, b.source AS s2, COUNT(*) AS n_common
                   FROM ss a JOIN ss b
                     ON a.k = b.k AND a.source < b.source
                   GROUP BY 1, 2)
        SELECT x.source AS s1, y.source AS s2,
               x.n AS n_sh_1, y.n AS n_sh_2,
               coalesce(c.n_common, 0) AS n_common,
               coalesce(c.n_common, 0) * 100
                 // (x.n + y.n - coalesce(c.n_common, 0)) AS jaccard_pct,
               coalesce(c.n_common, 0) * 100
                 // least(x.n, y.n) AS containment_pct
        FROM sizes x JOIN sizes y ON x.source < y.source
        LEFT JOIN common c ON c.s1 = x.source AND c.s2 = y.source
        ORDER BY s1, s2""")),

    // ------------------------------------------------------------------
    // q126: per-source QUALITY REPORT — the dashboard a curation run
    // cuts on, composing four independent signals into one row per
    // source, every number an exact integer so the whole report
    // hash-matches across engines:
    //   dup_doc_pct            exact-duplicate rate (md5(text) count ≥ 2)
    //   span_coverage_pct      corpus-repeated 10-token-span coverage (q123)
    //   lm_centibits_per_bigram  mean add-one-bigram-LM surprise (q121)
    //   lang_entropy_centibits   language-mix diversity as floor-quantized
    //                            Shannon entropy: Σ cnt·⌊log2(total/cnt)⌋·100
    //                            div total — the q121 floor-log2 kernel
    //                            applied to distribution shape (an exact
    //                            LOWER bound on true entropy; 0 ⟺
    //                            monolingual, deterministic on any engine)
    // Every branch is per-source partial-aggregable; the report joins
    // #sources-row frames — at 10⁴ sources this is still driver-trivial.
    QueryDef(
      "q126_source_quality_report",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val src = docs.select(col("doc_id"), col("source"))
        // ONE tokenization pass feeds the LM branch (which reads it three
        // times: bigram counts, vocabulary, scoring) AND the span branch —
        // cached for exactly one downstream action (the q103 discipline;
        // verify/bench drivers clearCache per query). Was 4 full tokenize
        // kernels over the corpus; now 1 + three cache reads.
        val scope = new graft.CacheScope
        graft.CacheScope.releaseAfterNextAction(s, scope)
        val tk = scope.cache(
          docs.select(col("doc_id"), X.tokens(col("text")).as("tk")))
        val lm = LmScore.surpriseScoresTk(tk, tk)
          .join(src, "doc_id")
          .groupBy(col("source"))
          .agg(sum(col("total_bits")).as("sb"), sum(col("n_bigrams")).as("nb"))
          .select(col("source"),
            when(col("nb") === 0L, lit(0L))
              .otherwise(expr("(sb * 100) div nb"))
              .as("lm_centibits_per_bigram"))
        val sp = Dedup.repeatedSpanCoverageTk(tk)
          .join(src, "doc_id")
          .groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("nt"),
            sum(col("covered_tokens")).as("cov"))
          .select(col("source"), col("nt").as("n_tokens"),
            when(col("nt") === 0L, lit(0L))
              .otherwise(expr("(cov * 100) div nt"))
              .as("span_coverage_pct"))
        val withH = docs.select(col("source"), md5(col("text")).as("h"))
        val dupKeys = withH.groupBy(col("h")).agg(count(lit(1)).as("c"))
        val dup = withH.join(dupKeys, "h")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("dd"))
          .select(col("source"), col("n_docs"),
            expr("(dd * 100) div n_docs").as("dup_doc_pct"))
        val lc = docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cnt"))
        val ent = lc
          .join(lc.groupBy(col("source")).agg(sum(col("cnt")).as("total")), "source")
          .select(col("source"), col("total"),
            (col("cnt") * LmScore.floorLog2Ratio(col("total"), col("cnt")) * 100)
              .as("term"))
          .groupBy(col("source"))
          .agg(expr("sum(term) div max(total)").as("lang_entropy_centibits"))
        // lm joins LEFT: a source whose documents all have < 2 tokens
        // produces no bigram rows, and an inner join would silently drop
        // it from the report — every other branch covers all sources by
        // construction (dup/ent scan documents, sp left-joins its
        // coverage). coalesce(0) mirrors the oracle.
        dup.join(sp, "source").join(lm, Seq("source"), "left")
          .join(ent, "source")
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("dup_doc_pct"), col("span_coverage_pct"),
            coalesce(col("lm_centibits_per_bigram"), lit(0L))
              .as("lm_centibits_per_bigram"),
            col("lang_entropy_centibits"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, source, ${X.tokensSql("text")} AS tk
                    FROM documents),
        -- LM branch (q121's construction, per-doc bits -> per-source mean)
        bg AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 2)}) AS bg FROM tk),
        lmb AS (SELECT bg, COUNT(*) AS cb FROM bg GROUP BY bg),
        lmp AS (SELECT split_part(bg, ' ', 1) AS w1,
                       CAST(SUM(cb) AS BIGINT) AS cp
                FROM lmb GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk)),
        scr AS (SELECT b.doc_id, l.cb + 1 AS den, p.cp + vc.v AS num
                FROM bg b
                JOIN lmb l USING (bg)
                JOIN lmp p ON p.w1 = split_part(b.bg, ' ', 1)
                CROSS JOIN vc),
        dbits AS (SELECT doc_id,
                         CAST(SUM(greatest(0, CASE WHEN (den << k) > num
                           THEN k - 1 ELSE k END)) AS BIGINT) AS bits,
                         COUNT(*) AS nb
                  FROM (SELECT doc_id, den, num,
                               length(printf('%b', num))
                                 - length(printf('%b', den)) AS k
                        FROM scr)
                  GROUP BY doc_id),
        lmsrc AS (SELECT t.source,
                         CASE WHEN SUM(d.nb) = 0 THEN 0
                              ELSE CAST(SUM(d.bits) * 100 // SUM(d.nb) AS BIGINT)
                         END AS lm_centibits_per_bigram
                  FROM dbits d JOIN documents t USING (doc_id)
                  GROUP BY t.source),
        -- span branch (q123's construction, per-doc covered -> per-source)
        sl AS (SELECT doc_id, source, len(tk) AS n_tokens,
                      ${X.shinglesSql("tk", 10)} AS sh
               FROM tk),
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
        cov AS (SELECT doc_id,
                       CAST(SUM(greatest(0, pos + 10
                         - greatest(pos, coalesce(prev_end, -1)))) AS BIGINT)
                         AS covered_tokens
                FROM sw GROUP BY doc_id),
        spansrc AS (SELECT s.source,
                           CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens,
                           CASE WHEN SUM(s.n_tokens) = 0 THEN 0
                                ELSE CAST(coalesce(SUM(c.covered_tokens), 0) * 100
                                     // SUM(s.n_tokens) AS BIGINT)
                           END AS span_coverage_pct
                    FROM sl s LEFT JOIN cov c USING (doc_id)
                    GROUP BY s.source),
        -- exact-duplicate branch
        dh AS (SELECT source, md5(text) AS h FROM documents),
        hc AS (SELECT h, COUNT(*) AS c FROM dh GROUP BY h),
        dupsrc AS (SELECT source, COUNT(*) AS n_docs,
                          CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) * 100
                            // COUNT(*) AS BIGINT) AS dup_doc_pct
                   FROM dh JOIN hc USING (h) GROUP BY source),
        -- language-entropy branch (integer floor-log2 terms)
        lcnt AS (SELECT source, lang, COUNT(*) AS cnt FROM documents
                 GROUP BY 1, 2),
        lterm AS (SELECT l.source, l.cnt, t.total,
                         length(printf('%b', t.total))
                           - length(printf('%b', l.cnt)) AS k
                  FROM lcnt l
                  JOIN (SELECT source, CAST(SUM(cnt) AS BIGINT) AS total
                        FROM lcnt GROUP BY source) t USING (source)),
        ent AS (SELECT source,
                       CAST(SUM(cnt * (CASE WHEN (cnt << k) > total THEN k - 1
                                            ELSE k END) * 100)
                         // MAX(total) AS BIGINT) AS lang_entropy_centibits
                FROM lterm GROUP BY source)
        SELECT d.source, d.n_docs, s.n_tokens, d.dup_doc_pct,
               s.span_coverage_pct,
               coalesce(l.lm_centibits_per_bigram, 0)
                 AS lm_centibits_per_bigram,
               e.lang_entropy_centibits
        FROM dupsrc d
        JOIN spansrc s USING (source)
        LEFT JOIN lmsrc l USING (source)
        JOIN ent e USING (source)
        ORDER BY d.source""")),

    // ------------------------------------------------------------------
    // q162: PII MASKING — the scrubbing pass every shipped corpus runs
    // (CCNet/Dolma/RefinedWeb mask emails, URLs, phone numbers before
    // release). Token-level on WHITESPACE splits (X.tokens lowercases
    // and strips punctuation, which would destroy the very tokens this
    // query classifies): email = full-match on a local@domain.tld
    // class regex, URL = http(s)://... or www. prefix, IPv4 = dotted
    // quad of 1-3 digit octets, phone-like = only [0-9+().-] chars
    // with ≥ 7 digits; precedence email > URL > IP > phone (the IP
    // test must precede phone — a dotted quad satisfies the phone
    // class's character set and digit floor). The fixture text is
    // PII-free, so plants derive RELATIONALLY from doc_id in both
    // engines (the dhashCorpus discipline): %7 docs gain an email,
    // %11 a URL, %13 a phone, %17 an IP — every class fires and the
    // masked-text 60-bit hash pins the exact rewrite byte for byte.
    // Regexes avoid backslash escapes entirely
    // ([.] not \\.) — Java and RE2 agree on the character-class subset,
    // and the two engines' string-literal escaping rules never meet a
    // backslash. 100 TB: pure map-side HOFs; only counts + an 8-byte
    // hash leave the scan.
    QueryDef(
      "q162_pii_mask",
      (s, dir) => {
        piiClassified(T.documents(s, dir))
          .withColumn("masked", expr("""array_join(
            zip_with(tk, cls, (t, c) -> CASE c
              WHEN 'E' THEN '<EMAIL>' WHEN 'U' THEN '<URL>'
              WHEN 'C' THEN '<CARD>'
              WHEN 'I' THEN '<IP>' WHEN 'P' THEN '<PHONE>'
              ELSE t END), ' ')"""))
          .select(col("doc_id"),
            size(col("tk")).cast("long").as("n_tokens"),
            expr("CAST(size(filter(cls, c -> c = 'E')) AS BIGINT)").as("n_emails"),
            expr("CAST(size(filter(cls, c -> c = 'U')) AS BIGINT)").as("n_urls"),
            expr("CAST(size(filter(cls, c -> c = 'C')) AS BIGINT)").as("n_cards"),
            expr("CAST(size(filter(cls, c -> c = 'I')) AS BIGINT)").as("n_ips"),
            expr("CAST(size(filter(cls, c -> c = 'P')) AS BIGINT)").as("n_phones"),
            length(col("masked")).cast("long").as("masked_chars"),
            X.h60(col("masked")).as("masked_h60"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $piiClsCtesSql,
        mk AS (SELECT doc_id, tk, cl,
                      array_to_string(list_transform(range(1, len(tk) + 1),
                        i -> CASE cl[i] WHEN 'E' THEN '<EMAIL>'
                             WHEN 'U' THEN '<URL>' WHEN 'C' THEN '<CARD>'
                             WHEN 'I' THEN '<IP>'
                             WHEN 'P' THEN '<PHONE>'
                             ELSE tk[i] END), ' ') AS masked
               FROM cls)
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(cl, c -> c = 'E')) AS BIGINT) AS n_emails,
               CAST(len(list_filter(cl, c -> c = 'U')) AS BIGINT) AS n_urls,
               CAST(len(list_filter(cl, c -> c = 'C')) AS BIGINT) AS n_cards,
               CAST(len(list_filter(cl, c -> c = 'I')) AS BIGINT) AS n_ips,
               CAST(len(list_filter(cl, c -> c = 'P')) AS BIGINT) AS n_phones,
               CAST(length(masked) AS BIGINT) AS masked_chars,
               ${X.h60Sql("masked")} AS masked_h60
        FROM mk ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q186: PII EXPOSURE REPORT — the per-source privacy scorecard a
    // release review reads before shipping a corpus (BigScience/Dolma
    // document per-source PII handling; the masker q162 is the
    // remediation, THIS is the measurement that triggers it): per
    // source — docs, docs carrying any PII token, email/URL/phone token
    // totals, and overall exposure in bps of all tokens. Shares
    // [[piiClassified]]/`piiClsCtesSql` with q162, so the report counts
    // exactly what the masker would mask. Map-side classify + ONE
    // per-source partial agg.
    QueryDef(
      "q186_pii_exposure_report",
      (s, dir) => {
        piiClassified(T.documents(s, dir))
          .select(col("source"),
            size(col("tk")).cast("long").as("n"),
            expr("CAST(size(filter(cls, c -> c = 'E')) AS BIGINT)").as("ne"),
            expr("CAST(size(filter(cls, c -> c = 'U')) AS BIGINT)").as("nu"),
            expr("CAST(size(filter(cls, c -> c = 'C')) AS BIGINT)").as("nc"),
            expr("CAST(size(filter(cls, c -> c = 'I')) AS BIGINT)").as("ni"),
            expr("CAST(size(filter(cls, c -> c = 'P')) AS BIGINT)").as("np"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("ne") + col("nu") + col("nc") + col("ni")
              + col("np") > 0L, 1L).otherwise(0L)).as("docs_with_pii"),
            sum(col("ne")).as("n_emails"),
            sum(col("nu")).as("n_urls"),
            sum(col("nc")).as("n_cards"),
            sum(col("ni")).as("n_ips"),
            sum(col("np")).as("n_phones"),
            sum(col("n")).as("n_tokens"))
          .select(col("source"), col("n_docs"), col("docs_with_pii"),
            col("n_emails"), col("n_urls"), col("n_cards"), col("n_ips"),
            col("n_phones"),
            when(col("n_tokens") === 0L, 0L)
              .otherwise(expr(
                "((n_emails + n_urls + n_cards + n_ips + n_phones) * 10000) div n_tokens"))
              .as("pii_bps"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH $piiClsCtesSql,
        pcnt AS (SELECT source,
                        CAST(len(tk) AS BIGINT) AS n,
                        CAST(len(list_filter(cl, c -> c = 'E')) AS BIGINT) AS ne,
                        CAST(len(list_filter(cl, c -> c = 'U')) AS BIGINT) AS nu,
                        CAST(len(list_filter(cl, c -> c = 'C')) AS BIGINT) AS nc,
                        CAST(len(list_filter(cl, c -> c = 'I')) AS BIGINT) AS ni,
                        CAST(len(list_filter(cl, c -> c = 'P')) AS BIGINT) AS np
                 FROM cls),
        pagg AS (SELECT source, COUNT(*) AS n_docs,
                        CAST(SUM(CASE WHEN ne + nu + nc + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
                        CAST(SUM(ne) AS BIGINT) AS n_emails,
                        CAST(SUM(nu) AS BIGINT) AS n_urls,
                        CAST(SUM(nc) AS BIGINT) AS n_cards,
                        CAST(SUM(ni) AS BIGINT) AS n_ips,
                        CAST(SUM(np) AS BIGINT) AS n_phones,
                        CAST(SUM(n) AS BIGINT) AS n_tokens
                 FROM pcnt GROUP BY source)
        SELECT source, n_docs, docs_with_pii, n_emails, n_urls, n_cards,
               n_ips, n_phones,
               CASE WHEN n_tokens = 0 THEN 0
                    ELSE CAST(((n_emails + n_urls + n_cards + n_ips + n_phones)
                      * 10000) // n_tokens AS BIGINT) END AS pii_bps
        FROM pagg ORDER BY source""")),

    // ------------------------------------------------------------------
    // q225: WEIGHTED ORDER SAMPLING (sequential Poisson, Ohlsson 1998)
    // — exact-k per-source sampling with inclusion probability ∝ doc
    // size, the fixed-BUDGET complement to q49's rate-based mixture
    // sampling: q49 keeps a per-source RATE (output size floats with
    // the corpus); this draws exactly k docs per source, biased toward
    // the weight, without replacement. Priority = ⌊U·10⁶/w⌋ with U the
    // shared 31-bit doc hash and w = n_chars (U/w order sampling — the
    // k smallest priorities are the sample; both operands non-negative,
    // hp·10⁶ < 2^51 so int64-exact, ties broken by doc_id).
    // Deterministic by construction: the "randomness" is the seeded
    // doc hash, so the sample is reproducible and oracle-checkable —
    // the production property (resumable sampling across reruns), not
    // a test concession. Scale: one partial-aggregable bounded-heap
    // top_k per source — k rows per partition ship, never the corpus.
    QueryDef(
      "q225_weighted_order_sample",
      (s, dir) =>
        orderSampleTopK(orderSamplePriorities(T.documents(s, dir)))
          .orderBy(col("source"), col("rank")),
      Some(s"""
        WITH wsp AS (SELECT source, doc_id, n_chars,
               (${X.hpSql("CAST(doc_id AS VARCHAR)")} * 1000000) // n_chars
                 AS pri
             FROM documents WHERE n_chars > 0)
        SELECT source, rank, doc_id, n_chars, pri FROM (
          SELECT source, doc_id, n_chars, pri,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY pri, doc_id) AS BIGINT) AS rank
          FROM wsp) WHERE rank <= 10 ORDER BY source, rank""")),
  )
}

