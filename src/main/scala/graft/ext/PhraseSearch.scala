package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Positional retrieval: exact-phrase search, proximity (NEAR) search,
  * and the delta-compressed posting-list layout — the POSITIONAL half
  * of the inverted-index family ([[Retrieval]] covers the frequency
  * half: BM25 needs (term, doc, tf); phrase and proximity queries need
  * (term, doc, pos)).
  *
  * The reference (arbirk/ETL-template) has no retrieval surface; like
  * BM25/ANN this is north-star LLM-pipeline material (phrase-level
  * decontamination probes, "exact quote" leakage checks, and the RAG
  * serving stack all sit on positional indexes).
  *
  * Definition/serving split (the q59/q169 discipline): the phrase-match
  * DEFINITION is row-local — a phrase's term frequency in a document is
  * the count of word 2-shingles equal to the phrase (q219, map-side,
  * zero shuffle). The SERVED plan (q220) answers the same query from a
  * committed positional-postings catalog version by ADJACENCY JOIN
  * (term₀ postings ⋈ term₁ postings on (doc, pos+1)) and shares q219's
  * oracle text verbatim: the index path is proven against the
  * definition, not a copy of it. The equality is structural —
  * shingles(tk,2)[i] = tk[i] ++ " " ++ tk[i+1], so a shingle hit at i
  * IS a (pos i, pos i+1) adjacency pair.
  *
  * Scale shape (100 TB): the positional index is corpus-linear and
  * written term-clustered ([[graft.catalog.VersionedCatalog
  * .writeNextSorted]]) so a phrase query's scan opens only the files
  * covering its terms (parquet min/max + bloom on `term`); the
  * adjacency join is keyed (doc_id, pos) and bounded by the two
  * posting lists, never the corpus. Proximity pairing (q221) is the
  * standard positional-intersection cost — |postings(a)| × |postings(b)|
  * per document, bounded by per-doc term frequencies, not corpus size.
  * Posting lists compress by delta-encoding doc-id gaps (q222): gaps
  * are small for dense terms, so varint(gap) beats fixed 8-byte ids —
  * the audit measures exactly how much, in exact integers.
  */
object PhraseSearch extends QueryModule {

  /** Query phrases (adjacent fixture-vocabulary word pairs), in output
    * order. */
  private val phrases = Seq("group order", "join window", "spark join")

  /** Distinct phrase words — the served plan's postings filter. */
  private val phraseWords = phrases.flatMap(_.split(" ")).distinct

  /** Proximity query: docs where `ProxA` and `ProxB` occur within
    * [[ProxW]] token positions (unordered — the classic NEAR/W). */
  private val ProxA = "spark"
  private val ProxB = "window"
  private val ProxW = 5L

  private val TopN = 10

  private def tokenized(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir)
      .select(col("doc_id"), X.tokens(col("text")).as("tk"))

  /** Positional postings (term, doc_id, pos) — the one corpus-linear
    * explode of the index build. pos is 0-based (Spark posexplode and
    * the oracle's range(len(tk)) zip agree). private[graft]: the
    * streaming positional-index sink appends per-epoch postings. */
  private[graft] def positionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** Phrase term frequencies by the row-local DEFINITION: tf(phrase) =
    * count of word 2-shingles equal to the phrase. Map-side — the
    * corpus never shuffles to answer "which docs contain this quote".
    * (phrase, doc_id, tf>0). */
  private[graft] def phraseTfShingle(docs: DataFrame): DataFrame = {
    val sh = X.shingles(col("tk"), 2)
    docs.select(col("doc_id") +: phrases.zipWithIndex.map { case (p, i) =>
        size(filter(sh, x => x === lit(p))).cast("long").as(s"tf_$i")
      }: _*)
      .select(col("doc_id"), explode(array(phrases.zipWithIndex.map {
        case (p, i) => struct(lit(p).as("phrase"), col(s"tf_$i").as("tf"))
      }: _*)).as("z"))
      .select(col("z.phrase").as("phrase"), col("doc_id"), col("z.tf").as("tf"))
      .filter(col("tf") > 0L)
  }

  /** Phrase term frequencies SERVED from a positional-postings frame by
    * adjacency join: tf = |{(p₀, p₁) : p₁ = p₀ + 1}| per doc. Only the
    * phrase words' posting lists are read (filter pushes to the
    * clustered scan). */
  private[graft] def phraseTfPostings(post: DataFrame): DataFrame = {
    val p = post.filter(col("term").isin(phraseWords: _*))
    phrases.map { ph =>
      val Array(w0, w1) = ph.split(" ")
      val a = p.filter(col("term") === w0).select(col("doc_id"), col("pos"))
      val b = p.filter(col("term") === w1)
        .select(col("doc_id"), (col("pos") - 1L).as("pos"))
      a.join(b, Seq("doc_id", "pos"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
        .select(lit(ph).as("phrase"), col("doc_id"), col("tf"))
    }.reduce(_.unionByName(_))
  }

  /** Per-phrase top-10 docs by (tf desc, doc_id) via the bounded-heap
    * top_k — k rows per partition ship, never the match set. */
  private def rankTop(tf: DataFrame): DataFrame =
    tf.groupBy(col("phrase"))
      .agg(graft.functions.AggFunctions.topK(
        struct(col("tf").as("s"), (-col("doc_id")).as("nd"),
          col("doc_id").as("doc_id")), TopN).as("top"))
      .select(col("phrase"), posexplode(col("top")))
      .select(col("phrase"), (col("pos") + 1).cast("long").as("rank"),
        col("col.doc_id").as("doc_id"), col("col.s").as("tf"))
      .orderBy(col("phrase"), col("rank"))

  // -------------------------------------------------------------------
  // Oracle side. CTE names are pp-prefixed.

  private val phraseListSql = phrases.mkString("['", "','", "']")

  /** The phrase ranking oracle — shared VERBATIM by q219 (row-local
    * shingle definition) and q220 (catalog-served positional index):
    * the served plan is proven against the definition. */
  private val phraseOracleSql = s"""
        WITH ppdocs AS (SELECT doc_id, ${X.tokensSql("text")} AS tk
                        FROM documents),
        pptf AS (SELECT doc_id, p.phrase,
                        CAST(len(list_filter(${X.shinglesSql("tk", 2)},
                          x -> x = p.phrase)) AS BIGINT) AS tf
                 FROM ppdocs,
                      (SELECT unnest($phraseListSql) AS phrase) p)
        SELECT phrase, rank, doc_id, tf FROM (
          SELECT phrase, doc_id, tf,
                 CAST(row_number() OVER (PARTITION BY phrase
                   ORDER BY tf DESC, doc_id) AS BIGINT) AS rank
          FROM pptf WHERE tf > 0)
        WHERE rank <= $TopN ORDER BY phrase, rank"""

  /** Build-once positional-index store (the round-17 verdict's
    * serve-path item): the term-clustered postings version commits
    * once per sfDir, so q220 benches the SERVE path users pay per
    * query instead of re-writing the index per invocation. Single
    * writeNextSorted ⇒ atomic gate. */
  private object Store {
    private val lock = new Object
    private var roots = Map.empty[String, String]

    def invalidate(dir: String): Unit =
      lock.synchronized { roots -= dir }

    def postings(s: SparkSession, dir: String): DataFrame = {
      val cat = lock.synchronized {
        val root = roots.getOrElse(dir, {
          val r = graft.Scratch.dir("phrase-store")
          roots += dir -> r
          r
        })
        val c = new graft.catalog.VersionedCatalog(s, root,
          format = "parquet")
        if (c.latestVersion("ppost").isEmpty)
          c.writeNextSorted("ppost",
            positionalPostings(tokenized(s, dir)), Seq("term"), 8)
        c
      }
      cat.read("ppost", 1,
        Some(StructType.fromDDL("term STRING, doc_id BIGINT, pos BIGINT")))
    }
  }

  /** Test seam: drop the store binding for `dir` (fixture rewrite). */
  private[graft] def invalidateStore(dir: String): Unit =
    Store.invalidate(dir)

  /** Bench warmup seam: commit the postings version before timed
    * passes (the accessor's ensure is eager; the read is discarded). */
  private[graft] def prebuild(s: SparkSession, dir: String): Unit = {
    Store.postings(s, dir); ()
  }

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q219: EXACT-PHRASE SEARCH — the definition: per-phrase term
    // frequency as a row-local 2-shingle count (zero corpus shuffle),
    // per-phrase top-10 docs via the bounded-heap top_k. The "find this
    // exact quote" primitive behind phrase-level decontamination.
    QueryDef(
      "q219_phrase_search",
      (s, dir) => rankTop(phraseTfShingle(tokenized(s, dir))),
      Some(phraseOracleSql)),

    // ------------------------------------------------------------------
    // q220: CATALOG-SERVED PHRASE SEARCH — construct commits the
    // positional postings as a term-clustered catalog version (range
    // layout + parquet bloom on `term`: a phrase query's scan opens
    // only its terms' files); the served plan answers by ADJACENCY JOIN
    // over the committed posting lists and shares q219's oracle text
    // verbatim — the index path is proven equal to the shingle
    // definition on every run.
    QueryDef(
      "q220_phrase_catalog_served",
      (s, dir) => rankTop(phraseTfPostings(Store.postings(s, dir))),
      Some(phraseOracleSql)),

    // ------------------------------------------------------------------
    // q221: PROXIMITY (NEAR/5) SEARCH — docs where the two terms occur
    // within 5 positions (unordered), with the closest distance and the
    // qualifying pair count. Positional-intersection cost: the pair
    // join is per-doc |postings(a)| × |postings(b)|, bounded by per-doc
    // term frequencies — never corpus-quadratic.
    QueryDef(
      "q221_proximity_search",
      (s, dir) => {
        val pe = positionalPostings(tokenized(s, dir))
        val a = pe.filter(col("term") === ProxA)
          .select(col("doc_id"), col("pos").as("pa"))
        val b = pe.filter(col("term") === ProxB)
          .select(col("doc_id"), col("pos").as("pb"))
        a.join(b, "doc_id")
          .filter(abs(col("pa") - col("pb")) <= ProxW)
          .groupBy(col("doc_id"))
          .agg(min(abs(col("pa") - col("pb"))).as("min_dist"),
            count(lit(1)).as("n_pairs"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ppdocs AS (SELECT doc_id, ${X.tokensSql("text")} AS tk
                        FROM documents),
        pppe AS (SELECT doc_id, unnest(tk) AS term,
                        CAST(unnest(range(len(tk))) AS BIGINT) AS pos
                 FROM ppdocs),
        ppa AS (SELECT doc_id, pos AS pa FROM pppe WHERE term = '$ProxA'),
        ppb AS (SELECT doc_id, pos AS pb FROM pppe WHERE term = '$ProxB')
        SELECT doc_id, CAST(MIN(ABS(pa - pb)) AS BIGINT) AS min_dist,
               COUNT(*) AS n_pairs
        FROM ppa JOIN ppb USING (doc_id)
        WHERE ABS(pa - pb) <= $ProxW
        GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q222: POSTING-LIST DELTA-COMPRESSION AUDIT — per term, the
    // doc-id posting list re-expressed as gaps (doc_id − previous,
    // first against −1 so every gap ≥ 1) and priced at varint width
    // ⌈bit_length(gap)/7⌉ bytes vs the fixed 8-byte id: the exact
    // storage win of the standard Lucene-style layout, in exact
    // integers (bit_length = length(bin(gap)) on gaps ≥ 1, identical
    // cross-engine). One window exchange on term; bytes_bps =
    // varint_bytes·10⁴ / raw_bytes, both operands non-negative.
    QueryDef(
      "q222_postings_delta",
      (s, dir) => {
        val pl = tokenized(s, dir)
          .select(col("doc_id"), explode(array_distinct(col("tk"))).as("term"))
        val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
        pl.select(col("term"),
            (col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w),
              lit(-1L))).as("gap"))
          .groupBy(col("term"))
          .agg(count(lit(1)).as("n_docs"),
            (count(lit(1)) * 8L).as("raw_bytes"),
            sum(expr("(length(bin(gap)) + 6) div 7")).as("varint_bytes"))
          .select(col("term"), col("n_docs"), col("raw_bytes"),
            col("varint_bytes"),
            expr("(varint_bytes * 10000) div raw_bytes").as("bytes_bps"))
          .orderBy(col("term"))
      },
      Some(s"""
        WITH ppdocs AS (SELECT doc_id, ${X.tokensSql("text")} AS tk
                        FROM documents),
        pppl AS (SELECT DISTINCT doc_id, t AS term
                 FROM ppdocs, unnest(tk) AS u(t)),
        ppg AS (SELECT term, doc_id - coalesce(lag(doc_id) OVER (
                  PARTITION BY term ORDER BY doc_id), -1) AS gap
                FROM pppl)
        SELECT term, COUNT(*) AS n_docs,
               CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
               CAST(SUM((length(printf('%b', gap)) + 6) // 7) AS BIGINT)
                 AS varint_bytes,
               CAST((CAST(SUM((length(printf('%b', gap)) + 6) // 7)
                 AS BIGINT) * 10000) // (COUNT(*) * 8) AS BIGINT)
                 AS bytes_bps
        FROM ppg GROUP BY term ORDER BY term"""))
  )
}
