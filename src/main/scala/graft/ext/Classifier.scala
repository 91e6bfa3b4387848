package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Trained quality classifier in EXACT integer arithmetic — the filter
  * class real curation stacks ship (CCNet's fastText LM-vs-web
  * classifier, Wenzek et al. LREC 2020; FineWeb-Edu's quality scorer)
  * that until now this engine only had fixed-rule stand-ins for
  * (q32's thresholds, q57's flags). The model is a BATCH AVERAGED
  * PERCEPTRON (Freund & Schapire, "Large Margin Classification Using
  * the Perceptron Algorithm", ML 1999 — averaging; the batch variant
  * is gradient descent on the perceptron loss with unit step) over the
  * engine's existing integer quality features, weak-labeled by the
  * corpus's own LM-score quartiles (q139's tiers: the mid-quartile
  * band is "normal" text, both tails — boilerplate and noise — are
  * the negative class). Everything is int64: feature extraction,
  * standardization, misclassification sums, weight updates, scores —
  * so two engines reproduce the trained weights bit for bit, the same
  * exactness discipline as the Lloyd fits (q96) and BPE training
  * (q131).
  *
  * Features per document (universe: ≥ 3 tokens, so bigrams and
  * 2-shingles exist):
  *   x1 = centibits_per_bigram (q121's add-one bigram LM surprise)
  *   x2 = min(|x1 − median|, 1000)  — distance from the corpus median
  *        surprise; the interval concept "both tails are bad" becomes
  *        LINEARLY separable with this feature alongside x1
  *   x3 = duplicate-2-gram fraction ×10⁴ (q57's repetition signal)
  *   x4 = top-token fraction ×10⁴ (q57)
  *   x5 = stopword fraction ×10⁴ (q32's density signal)
  * plus a bias. Features are then STANDARDIZED in integers — the lever
  * that makes the fixed-increment perceptron converge (raw scales span
  * 40..10⁴ and the update oscillates; measured in the round-13 notes):
  *   x′ = ((x − lo)·128) div (hi − lo + 1) − ((μ − lo)·128) div (hi − lo + 1)
  * with lo/hi/μ the corpus min/max/integer-mean. Both divisions have
  * NON-NEGATIVE operands, so Spark's truncating `div` and DuckDB's
  * flooring `//` agree (the q127 clamp discipline); the subtraction
  * afterwards is exact. Standardized features live in [−128, 128].
  *
  * TRAIN: R epochs; epoch r computes ONE distributed aggregate over
  * the feature table — Σ y·x over the examples the current weights
  * misclassify (y·(w·x) ≤ 0) — and the driver adds it into the
  * weights (the Lloyd/BPE control-plane shape: R tiny jobs, a 1-row
  * collect each, nothing corpus-sized on the driver). The AVERAGED
  * weights Σ_r w_r (integer sum — same argmax as the mean) are what
  * q142 scores with: averaging smooths the batch perceptron's
  * terminal oscillation exactly as in the online variant.
  *
  * 100 TB shape: feature extraction is the q121 LM plan (one
  * corpus-reduced LM build + one doc-side join) plus map-side q57
  * folds; standardization stats and quartile thresholds are 1-row
  * broadcasts; each epoch is one partial-aggregable scan of the
  * (n_docs × 6)-int feature table; weights are 6 longs on the driver.
  * Overflow margins: |x′| ≤ 128 ⇒ |Δw| ≤ 128n per epoch, |w·x| ≤
  * 6·128²·R·n ≈ 10⁹·n — safe in int64 to n ≈ 10⁹ documents, and
  * DuckDB errors (never wraps) on int64 overflow, so a breach would
  * fail loudly, not drift.
  *
  * The weights-as-data discipline (persist through
  * [[graft.catalog.VersionedCatalog]]) and true neural models stay
  * out of scope here — [[Multimodal]]'s batch seam documents the
  * latter; the spec covers held-out generalization.
  */
object Classifier extends QueryModule {

  /** Training epochs — past the fixture's convergence knee (measured:
    * held-out agreement plateaus ≈ 0.93 by epoch 10) and cheap: each
    * epoch is one scan of the feature table. */
  val Epochs = 10

  /** Standardization scale: features land in [−Scale, Scale]. */
  val Scale = 128

  /** Cap on the |x1 − median| feature (raw centibit deviations are
    * unbounded in a pathological corpus; the cap keeps every later
    * magnitude bound provable). */
  val DevCap = 1000L

  private val FeatCols = (1 to 5).map(j => s"x$j")

  // -------------------------------------------------------------------
  // Engine side.

  /** Per-document tokenized universe: docs with ≥ 3 tokens.
    * private[graft]: the streaming classifier sink builds per-epoch
    * features from it. */
  private[graft] def tk3(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), X.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)

  /** Per-document LM centibits over a pre-tokenized universe — the
    * self-scored x1 feature and the label's raw material. */
  def scoredCb(tk3d: DataFrame): DataFrame =
    LmScore.surpriseScoresTk(tk3d, tk3d)
      .select(col("doc_id"), col("centibits_per_bigram").as("cb"))

  /** q147's TWO LM self-scorings from ONE fit-side derivation (r19,
    * guide §2.3 — do fewer passes): phase A fits on the even-doc_id
    * half, phase B on the full corpus, and bigram counts are exact
    * integers that DECOMPOSE BY DOC PARITY — counts(full) ≡
    * counts(even) ⊕ counts(odd) ([[LmScore.mergeBigramCounts]]' fold
    * law) and the vocabulary unions the same way — so one parity-keyed
    * count table and one parity-keyed distinct-token table serve both
    * fits. Value-identical to `scoredCb(even)` / `scoredCb(full)` by
    * count linearity: the even slice of the parity table IS
    * bigramCountsTk(evenTk), and the parity-summed table IS
    * bigramCountsTk(tkF). Returns (scoredA over even docs, scoredF
    * over the full universe); SCORING passes are unchanged — only the
    * fit side stops deriving the corpus twice. */
  private def parityScoredCb(tkF: DataFrame, scope: graft.CacheScope)
      : (DataFrame, DataFrame) = {
    val bgP = scope.cache(tkF
      .select((col("doc_id") % 2).as("p"),
        explode(X.shingles(col("tk"), 2)).as("bg"))
      .groupBy(col("p"), col("bg")).agg(count(lit(1)).as("cb")))
    val tokP = scope.cache(tkF
      .select((col("doc_id") % 2).as("p"), explode(col("tk")).as("t"))
      .distinct())
    def scored(lmB: DataFrame, vocab: DataFrame, tk: DataFrame) =
      LmScore.scoreAgainstLmTk(lmB, vocab, tk)
        .select(col("doc_id"), col("centibits_per_bigram").as("cb"))
    val scoredA = scored(
      bgP.filter(col("p") === 0).select(col("bg"), col("cb")),
      tokP.filter(col("p") === 0).select(col("t")),
      tkF.filter(col("doc_id") % 2 === 0))
    val scoredF = scored(
      bgP.groupBy(col("bg")).agg(sum(col("cb")).as("cb")),
      tokP.select(col("t")).distinct(),
      tkF)
    (scoredA, scoredF)
  }

  /** Weak-label quartile thresholds (1 row: t1, t2, t3) of a scored
    * (doc_id, cb) frame — the q139 value-domain histogram (the window
    * is over distinct centibit values, domain-bounded). Part of the
    * MODEL ARTIFACT: scoring a later corpus under a persisted model
    * must label with the TRAINING corpus's thresholds (q147). */
  def labelThresholds(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n1 = scored.agg(count(lit(1)).as("n"))
    val cum = scored.groupBy(col("cb")).agg(count(lit(1)).as("c"))
      .withColumn("cc", sum(col("c")).over(
        Window.orderBy(col("cb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.crossJoin(broadcast(n1)).agg(
      min(when(col("cc") >= expr("(1*n+3) div 4"), col("cb"))).as("t1"),
      min(when(col("cc") >= expr("(2*n+3) div 4"), col("cb"))).as("t2"),
      min(when(col("cc") >= expr("(3*n+3) div 4"), col("cb"))).as("t3"))
  }

  /** Raw integer features + weak label (see class doc) over a cached
    * pre-tokenized universe, its LM scores, and a GIVEN 1-row
    * threshold frame (broadcast). */
  def rawFeaturesUnder(tk3d: DataFrame, scored: DataFrame,
      thr: DataFrame): DataFrame = {
    val st = tk3d.select(col("doc_id"),
      size(col("tk")).cast("long").as("n"),
      X.shingles(col("tk"), 2).as("s2"),
      size(filter(col("tk"), t => array_contains(X.stopwordsArr, t)))
        .cast("long").as("nstop"),
      expr("""aggregate(sort_array(tk),
          named_struct('prev', '', 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
          (acc, t) -> named_struct(
            'prev', t,
            'run',  IF(t = acc.prev, acc.run + 1, CAST(1 AS BIGINT)),
            'best', greatest(acc.best, IF(t = acc.prev, acc.run + 1, CAST(1 AS BIGINT)))),
          acc -> acc.best)""").as("top_cnt"))
    st.join(scored, "doc_id").crossJoin(broadcast(thr))
      .select(col("doc_id"),
        when(col("cb") > col("t1") && col("cb") <= col("t3"), 1L)
          .otherwise(-1L).as("y"),
        col("cb").as("x1"),
        least(abs(col("cb") - col("t2")), lit(DevCap)).as("x2"),
        expr("""(CAST(size(s2) - size(array_distinct(s2)) AS BIGINT) * 10000)
            div size(s2)""").as("x3"),
        expr("(top_cnt * 10000) div n").as("x4"),
        expr("(nstop * 10000) div n").as("x5"))
  }

  /** Raw features + label with thresholds derived from the SAME
    * universe (the q141/q142 self-contained instantiation). */
  def rawFeatures(tk3d: DataFrame): DataFrame = {
    val scored = scoredCb(tk3d)
    rawFeaturesUnder(tk3d, scored, labelThresholds(scored))
  }

  /** The standardization statistics (1 row: lo/hi/sum per feature + n)
    * — the second half of the model artifact (q147 persists them with
    * the weights; phase-B features standardize under PHASE-A stats, the
    * training-serving-skew rule). */
  def featureStats(raw: DataFrame): DataFrame = {
    val aggs = FeatCols.flatMap(c => Seq(
      min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c"),
      sum(col(c)).as(s"s_$c"))) :+ count(lit(1)).as("n")
    raw.agg(aggs.head, aggs.tail: _*)
  }

  /** Integer standardization under a GIVEN 1-row stats frame (see
    * class doc): both div operands non-negative, so the engines agree
    * bit for bit. */
  def standardizeUnder(raw: DataFrame, stats: DataFrame): DataFrame = {
    val std = FeatCols.map { c =>
      val den = s"(hi_$c - lo_$c + 1)"
      expr(s"(($c - lo_$c) * $Scale) div $den" +
        s" - (((s_$c div n) - lo_$c) * $Scale) div $den").as(c)
    }
    raw.crossJoin(broadcast(stats))
      .select(col("doc_id") +: col("y") +: std: _*)
  }

  /** Standardization with stats from the same frame. */
  def standardize(raw: DataFrame): DataFrame =
    standardizeUnder(raw, featureStats(raw))

  /** Standardized feature table for a document corpus. The scope
    * caches the tokenized universe (the LM fit reads it three times)
    * and the raw features (standardization's stats pass + the feature
    * scan both read them; uncached, each re-runs the LM fit). */
  def features(docs: DataFrame,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val t = scope.cache(tk3(docs))
    // the LM scores feed BOTH the threshold derivation and the feature
    // join — cached, or the whole LM fit runs twice per materialization
    val scored = scope.cache(scoredCb(t))
    // coalesce the epoch-scanned table to a handful of partitions: it
    // is n_docs × 7 longs (KBs at fixture scale, ~50 GB at 10⁹ docs —
    // still a few hundred right-sized partitions, never 32 near-empty
    // ones whose per-epoch task-scheduling floor dominates R tiny jobs)
    standardize(scope.cache(
      rawFeaturesUnder(t, scored, labelThresholds(scored)))).coalesce(4)
  }

  /** w·x + w0 under literal weights (w(0) = bias). */
  private[ext] def score(w: Array[Long]): Column =
    FeatCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }

  /** R epochs of batch perceptron over a (cached) standardized feature
    * frame. Returns per-epoch post-update weight snapshots and the
    * epoch's misclassified count — R 1-row collects, the Lloyd/BPE
    * control-plane shape. */
  def trainPerceptron(feat: DataFrame, epochs: Int = Epochs)
      : Seq[(Int, Array[Long], Long)] =
    trainPerceptronFrom(feat, epochs, Array.fill(6)(0L))

  /** [[trainPerceptron]] WARM-STARTED from persisted weights — the
    * q147 continuation path: epoch numbering restarts at 1 for the new
    * phase, the weight state carries over. */
  def trainPerceptronFrom(feat: DataFrame, epochs: Int,
      init: Array[Long]): Seq[(Int, Array[Long], Long)] = {
    require(init.length == 6, s"classifier: 6 weights expected, got ${init.length}")
    // AQE OFF inside the epoch loop (r19 — the Bpe/HashedClassifier
    // trainTransientFrom lesson verbatim): every epoch is one global
    // aggregate over the persisted coalesce(4) feature frame, so
    // runtime re-planning buys nothing, but each AQE query stage is
    // its own job barrier and R epochs × sub-second aggs make the
    // barriers the training wall clock. Scoped + restored; planning
    // only, values unchanged.
    val s = feat.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false")
    try trainPerceptronLoop(feat, epochs, init)
    finally s.conf.set(aqeKey, prevAqe)
  }

  private def trainPerceptronLoop(feat: DataFrame, epochs: Int,
      init: Array[Long]): Seq[(Int, Array[Long], Long)] = {
    var w = init.clone()
    val snaps = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Long], Long)]
    for (r <- 1 to epochs) {
      val mis = (col("y") * score(w)) <= 0L
      val aggs = (coalesce(sum(when(mis, col("y"))), lit(0L)).as("d0") +:
        FeatCols.zipWithIndex.map { case (c, j) =>
          coalesce(sum(when(mis, col("y") * col(c))), lit(0L)).as(s"d${j + 1}")
        }) :+ coalesce(sum(when(mis, 1L)), lit(0L)).as("nm")
      val row = feat.agg(aggs.head, aggs.tail: _*).collect()(0)
      w = w.zipWithIndex.map { case (v, j) => v + row.getLong(j) }
      snaps += ((r, w, row.getLong(6)))
    }
    snaps.toSeq
  }

  /** Componentwise sum of the epoch snapshots — the averaged
    * perceptron's weight vector (integer sum: same sign as the mean). */
  def averagedWeights(snaps: Seq[(Int, Array[Long], Long)]): Array[Long] =
    snaps.map(_._2).transpose.map(_.sum).toArray

  // -------------------------------------------------------------------
  // The persisted model artifact's schemas + row forms (q147 and the
  // streaming classifier sink share them).

  val ThrSchemaDdl = "t1 BIGINT, t2 BIGINT, t3 BIGINT"
  val StatsSchemaDdl: String = FeatCols.map(c =>
    s"lo_$c BIGINT, hi_$c BIGINT, s_$c BIGINT").mkString(", ") + ", n BIGINT"
  val WeightsSchemaDdl =
    "epoch BIGINT, w0 BIGINT, w1 BIGINT, w2 BIGINT, w3 BIGINT, w4 BIGINT, " +
      "w5 BIGINT, n_mis BIGINT"

  /** Epoch snapshots as the persistable weight table. */
  def weightsDf(spark: SparkSession,
      snaps: Seq[(Int, Array[Long], Long)]): DataFrame = {
    import spark.implicits._
    snaps.map { case (r, w, nm) =>
      (r.toLong, w(0), w(1), w(2), w(3), w(4), w(5), nm) }
      .toDF("epoch", "w0", "w1", "w2", "w3", "w4", "w5", "n_mis")
  }

  /** The last committed epoch's weight vector from a persisted weight
    * table. */
  def lastWeights(weights: DataFrame): Array[Long] = {
    val last = weights.orderBy(col("epoch").desc).limit(1).collect()(0)
    (1 to 6).map(last.getLong).toArray
  }

  // -------------------------------------------------------------------
  // Oracle side (DuckDB).

  /** CTEs through the standardized feature table `feat$tag` (doc_id,
    * y, x1..x5) over the universe restricted by `where` — MATERIALIZED:
    * every epoch scans it. `thrCte`/`statsCte` override where the
    * label thresholds / standardization stats come FROM: q147's
    * phase-B chain labels and standardizes the full corpus under the
    * PERSISTED phase-A model artifact (training-serving-skew rule);
    * left None, both derive from this chain's own universe. */
  private[ext] def featChainSql(tag: String, where: String,
      thrCte: Option[String] = None, statsCte: Option[String] = None,
      src: String = "documents", cbsSql: Option[String] = None): String = {
    val thrName = thrCte.getOrElse(s"thr$tag")
    val statsName = statsCte.getOrElse(s"fstats$tag")
    val ownThr = if (thrCte.isDefined) "" else s"""
        nn$tag AS (SELECT COUNT(*) AS n FROM cbs$tag),
        hist$tag AS (SELECT cb, COUNT(*) AS c FROM cbs$tag GROUP BY cb),
        cum$tag AS (SELECT cb, SUM(c) OVER (ORDER BY cb) AS cc FROM hist$tag),
        thr$tag AS (SELECT MIN(CASE WHEN cc >= (1*n+3)//4 THEN cb END) AS t1,
                       MIN(CASE WHEN cc >= (2*n+3)//4 THEN cb END) AS t2,
                       MIN(CASE WHEN cc >= (3*n+3)//4 THEN cb END) AS t3
                FROM cum$tag, nn$tag),"""
    val ownStats = if (statsCte.isDefined) "" else s"""
        fstats$tag AS (SELECT ${FeatCols.map(c =>
          s"MIN($c) AS lo_$c, MAX($c) AS hi_$c, CAST(SUM($c) AS BIGINT) AS s_$c")
          .mkString(", ")}, COUNT(*) AS n
                   FROM featraw$tag),"""
    // the centibit source: the universe's own self-scored LM by
    // default, or a caller-supplied scoring text (q153's cross-corpus
    // chain scores tk$tag against the REFERENCE LM instead) — either
    // way it must define cbs$tag (doc_id, cb)
    val cbsBlock = cbsSql.getOrElse(s"""
        ${LmScore.selfScoreBodyCtesSqlTagged(tag)},
        cbs$tag AS (SELECT doc_id,
                        CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT) AS cb
                FROM bits$tag GROUP BY doc_id)""")
    s"""
        tkall$tag AS (SELECT doc_id, ${X.tokensSql("text")} AS tk
                      FROM $src $where),
        tk$tag AS (SELECT doc_id, tk FROM tkall$tag WHERE len(tk) >= 3),
        $cbsBlock,$ownThr
        st$tag AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
                      ${X.shinglesSql("tk", 2)} AS s2,
                      CAST(len(list_filter(tk,
                        t -> list_contains(${X.stopwordsSql}, t))) AS BIGINT)
                        AS nstop,
                      CAST(list_max(list_transform(list_distinct(tk),
                             d -> len(list_filter(tk, x -> x = d)))) AS BIGINT)
                        AS top_cnt
               FROM tk$tag),
        featraw$tag AS (
          SELECT s.doc_id,
                 CASE WHEN c.cb > t.t1 AND c.cb <= t.t3
                      THEN CAST(1 AS BIGINT) ELSE -1 END AS y,
                 c.cb AS x1,
                 least(abs(c.cb - t.t2), $DevCap) AS x2,
                 CAST((len(s.s2) - len(list_distinct(s.s2))) * 10000
                   // len(s.s2) AS BIGINT) AS x3,
                 s.top_cnt * 10000 // s.n AS x4,
                 s.nstop * 10000 // s.n AS x5
          FROM st$tag s JOIN cbs$tag c USING (doc_id) CROSS JOIN $thrName t),$ownStats
        feat$tag AS MATERIALIZED (
          SELECT doc_id, y, ${FeatCols.map { c =>
            val den = s"(hi_$c - lo_$c + 1)"
            s"(($c - lo_$c) * $Scale) // $den" +
              s" - (((s_$c // n) - lo_$c) * $Scale) // $den AS $c"
          }.mkString(", ")}
          FROM featraw$tag, $statsName)"""
  }

  /** The untagged self-contained chain (q141/q142/q148). */
  private def featCtesSql: String = featChainSql("", "")

  /** The averaged-weights + scored-docs oracle fragment over a trained
    * chain with CTE suffix `tag` — "wavg$tag" (a0..a5) and
    * "scored$tag" (doc_id, y, score); the epochs must already be
    * unrolled via [[trainChainSql]]. private[ext]: q152's composition
    * reuses it. */
  private[ext] def scoredCtesSql(tag: String): String = {
    val wavg = (0 to 5).map(j =>
      "(" + (1 to Epochs).map(r => s"w$r.w$j").mkString(" + ") + s") AS a$j")
      .mkString(", ")
    val froms = (1 to Epochs).map(r => s"w$r").mkString(", ")
    val sc = "a.a0 + " + FeatCols.zipWithIndex
      .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")
    s"""
        wavg$tag AS (SELECT $wavg FROM $froms),
        scored$tag AS (SELECT f.doc_id, f.y, $sc AS score
                       FROM feat$tag f, wavg$tag a)"""
  }

  /** y·(w·x) under the CTE `w$r`'s weight row. */
  private def marginSql(w: String): String =
    s"y * ($w.w0 + ${FeatCols.zipWithIndex
      .map { case (c, j) => s"$w.w${j + 1}*$c" }.mkString(" + ")})"

  /** The unrolled train chain for epochs `from..to` over CTE `feat`:
    * e$r (misclassification sums) and w$r (post-update weights + the
    * epoch's misclassified count). Epoch `from` starts from zero
    * weights when from == 1, else from w${from-1} — chains CONCATENATE
    * (q147's warm start trains 6..10 over a different feature table).
    * Every CTE is MATERIALIZED — feat and each w$r feed multiple
    * consumers (the q131 unroll discipline). */
  private[ext] def trainChainSql(from: Int, to: Int, feat: String): String =
    (from to to).map { r =>
      val zeroInit = r == 1
      val cond = if (zeroInit) "TRUE" else s"${marginSql(s"p")} <= 0"
      val from0 = if (zeroInit) feat else s"$feat, w${r - 1} p"
      val sums = (s"CAST(coalesce(SUM(CASE WHEN $cond THEN y END), 0) AS BIGINT) AS d0" +:
        FeatCols.zipWithIndex.map { case (c, j) =>
          s"CAST(coalesce(SUM(CASE WHEN $cond THEN y*$c END), 0) AS BIGINT) AS d${j + 1}"
        }) :+ s"CAST(coalesce(SUM(CASE WHEN $cond THEN 1 END), 0) AS BIGINT) AS nm"
      val prev =
        if (zeroInit) (0 to 5).map(j => s"CAST(0 AS BIGINT) AS w$j")
          .mkString("(SELECT ", ", ", ") p")
        else s"w${r - 1} p"
      s"""
        e$r AS MATERIALIZED (SELECT ${sums.mkString(", ")} FROM $from0),
        w$r AS MATERIALIZED (
          SELECT ${(0 to 5).map(j => s"p.w$j + e.d$j AS w$j").mkString(", ")},
                 e.nm AS nm
          FROM $prev, e$r e)"""
    }.mkString(",")

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q141: the TRAINED WEIGHT TABLE itself (sketch-as-data, the q131
    // merges-table discipline): per epoch, the post-update weight
    // vector and that epoch's misclassified count, hash-checked rank by
    // rank — a drift in ANY epoch's aggregate or tie-handling corrupts
    // every later epoch and fails loudly. Since round 16 the family
    // serves from [[ClassifierStore]]: the first family query builds
    // the feature table + weight table once and commits them; this
    // query reads the committed weight table (construct does the build
    // when it runs first — the catalog-serving accounting).
    QueryDef(
      "q141_quality_classifier_train",
      (s, dir) =>
        ClassifierStore.weightsTable(s, dir).orderBy(col("epoch")),
      Some {
        val union = (1 to Epochs).map(r =>
          s"SELECT CAST($r AS BIGINT) AS epoch, w0, w1, w2, w3, w4, w5, " +
            s"nm AS n_mis FROM w$r").mkString(" UNION ALL ")
        s"""
        WITH $featCtesSql, ${trainChainSql(1, Epochs, "feat")}
        SELECT * FROM ($union) ORDER BY epoch"""
      }),

    // ------------------------------------------------------------------
    // q142: SCORES + KEPT SET under the averaged weights — the applied
    // filter: every universe document's integer score Σ w̄·x and the
    // kept flag (score > 0 = "mid-band quality"). The engine trains at
    // construction (10 tiny jobs) and the returned plan scores with the
    // learned weights as literals; the oracle re-derives the identical
    // weights through the same unrolled chain. The weak label rides
    // along so the result table doubles as the training-agreement
    // audit.
    QueryDef(
      "q142_quality_classifier_apply",
      (s, dir) => {
        // served from the committed store (see q141): the returned plan
        // is one parquet scan scored with literal weights
        val wavg = ClassifierStore.averagedWeights(s, dir)
        ClassifierStore.features(s, dir)
          .select(col("doc_id"), col("y"),
            score(wavg).as("score"))
          .withColumn("kept", col("score") > 0L)
          .orderBy(col("doc_id"))
      },
      Some {
        val wavg = (0 to 5).map(j =>
          "(" + (1 to Epochs).map(r => s"w$r.w$j").mkString(" + ") + s") AS a$j")
          .mkString(", ")
        val froms = (1 to Epochs).map(r => s"w$r").mkString(", ")
        s"""
        WITH $featCtesSql, ${trainChainSql(1, Epochs, "feat")},
        wavg AS (SELECT $wavg FROM $froms)
        SELECT f.doc_id, f.y,
               a.a0 + ${FeatCols.zipWithIndex
          .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")} AS score,
               (a.a0 + ${FeatCols.zipWithIndex
          .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")}) > 0 AS kept
        FROM feat f, wavg a ORDER BY f.doc_id"""
      }),

    // ------------------------------------------------------------------
    // q147: the CLASSIFIER THROUGH THE CATALOG — sixth member of the
    // catalog-serving family, and the first whose state is NOT a
    // linear sketch: perceptron weights don't fold, they WARM-START.
    // The model artifact is three tables (weights + label thresholds +
    // standardization stats — persisting the weights alone would
    // rebuild features under a DIFFERENT normalization and silently
    // skew serving; the thresholds/stats ARE part of the model).
    // Phase A trains 5 epochs on the even-doc_id epoch and commits all
    // three as v1; phase B builds the FULL corpus's features UNDER THE
    // PERSISTED v1 thresholds/stats (training-serving-skew rule),
    // warm-starts from v1's weights, and trains 5 more epochs → v2.
    // Per (version, epoch): post-update weights + misclassified count,
    // all hash-checked — the oracle re-derives both phases through
    // concatenated unrolled chains (e6 reads w5 across the feature-
    // table switch).
    QueryDef(
      "q147_classifier_catalog_warm_start",
      (s, dir) => {
        import s.implicits._
        val work = graft.Scratch.dir("q147")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val T_ = org.apache.spark.sql.types.StructType.fromDDL _
        val thrSchema = T_(ThrSchemaDdl)
        val statsSchema = T_(StatsSchemaDdl)
        val wSchema = T_(WeightsSchemaDdl)
        val docs = T.documents(s, dir)
        val scope = new graft.CacheScope
        try {
          // ONE corpus tokenize (r19; was two): tk3 is per-doc
          // map-side, so the phase-A epoch is a doc_id slice of the
          // cached full table — phase B reuses the same cache. The
          // LM/threshold fits still run per phase on their own slices
          // (slicing happens BELOW the fit, so fitted stats are
          // unchanged). Values identical.
          val tkF = scope.cache(tk3(docs))
          // phase A: even-doc_id epoch, self-contained model
          val tkA = tkF.filter(col("doc_id") % 2 === 0)
          // BOTH phases' LM fits from one parity-keyed derivation
          // (r19; see parityScoredCb — value-identical by count
          // linearity, the fit corpus stops being derived twice)
          val (scoredA0, scoredF) = parityScoredCb(tkF, scope)
          val scoredA = scope.cache(scoredA0)
          cat.writeNext("clf_thr", labelThresholds(scoredA))
          val rawA = scope.cache(rawFeaturesUnder(tkA, scoredA,
            cat.read("clf_thr", 1, Some(thrSchema))))
          cat.writeNext("clf_stats", featureStats(rawA))
          val featA = scope.cache(standardizeUnder(rawA,
            cat.read("clf_stats", 1, Some(statsSchema))).coalesce(4))
          val snapsA = trainPerceptron(featA, Epochs / 2)
          cat.writeNext("clf_w", weightsDf(s, snapsA))
          // phase B: full corpus under the PERSISTED v1 artifact
          val rawF = scope.cache(rawFeaturesUnder(tkF, scoredF,
            cat.read("clf_thr", 1, Some(thrSchema))))
          val featF = scope.cache(standardizeUnder(rawF,
            cat.read("clf_stats", 1, Some(statsSchema))).coalesce(4))
          val init = lastWeights(cat.read("clf_w", 1, Some(wSchema)))
          val snapsB = trainPerceptronFrom(featF, Epochs / 2, init)
          cat.writeNext("clf_w", weightsDf(s, snapsB))
          (snapsA.map { case (r, w, nm) => (1L, r.toLong, w, nm) } ++
            snapsB.map { case (r, w, nm) => (2L, r.toLong, w, nm) })
            .map { case (v, r, w, nm) =>
              (v, r, w(0), w(1), w(2), w(3), w(4), w(5), nm) }
            .toDF("version", "epoch", "w0", "w1", "w2", "w3", "w4", "w5",
              "n_mis")
            .orderBy(col("version"), col("epoch"))
        } finally scope.release()
      },
      Some {
        val half = Epochs / 2
        val union = ((1 to half).map(r =>
          s"SELECT CAST(1 AS BIGINT) AS version, CAST($r AS BIGINT) AS epoch, " +
            s"w0, w1, w2, w3, w4, w5, nm AS n_mis FROM w$r") ++
          (half + 1 to 2 * half).map(r =>
            s"SELECT CAST(2 AS BIGINT), CAST(${r - half} AS BIGINT), " +
              s"w0, w1, w2, w3, w4, w5, nm FROM w$r")).mkString(" UNION ALL ")
        s"""
        WITH ${featChainSql("a", "WHERE doc_id % 2 = 0")},
        ${featChainSql("f", "", thrCte = Some("thra"),
          statsCte = Some("fstatsa"))},
        ${trainChainSql(1, half, "feata")},
        ${trainChainSql(half + 1, 2 * half, "featf")}
        SELECT * FROM ($union) ORDER BY version, epoch"""
      }),

    // ------------------------------------------------------------------
    // q148: CLASSIFIER-GATED per-source CURATION REPORT — the filter
    // applied as a curation pass (the CCNet pipeline shape: LM →
    // classifier → per-source keep rates): the q142 model scores every
    // universe doc and the report reduces per source — docs, positive
    // weak labels, kept docs, label agreement, kept chars. What a data
    // lead reads before shipping the filtered mixture: a source whose
    // keep-rate collapses (or whose agreement diverges from the
    // corpus's) needs its own look before the filter ships. Plan:
    // q142's training (eager construct) + one broadcast-stats score
    // pass + a #sources-row partial-aggregable reduce.
    QueryDef(
      "q148_classifier_source_report",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val wavg = ClassifierStore.averagedWeights(s, dir)
        ClassifierStore.features(s, dir)
          .select(col("doc_id"), col("y"), score(wavg).as("score"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            "doc_id")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos_label"),
            sum(when(col("score") > 0L, 1L).otherwise(0L)).as("n_kept"),
            sum(when((col("score") > 0L) === (col("y") === 1L), 1L)
              .otherwise(0L)).as("n_agree"),
            coalesce(sum(when(col("score") > 0L, col("n_chars"))), lit(0L))
              .as("kept_chars"))
          .withColumn("keep_frac_e4", expr("(n_kept * 10000) div n_docs"))
          .select(col("source"), col("n_docs"), col("n_pos_label"),
            col("n_kept"), col("keep_frac_e4"), col("n_agree"),
            col("kept_chars"))
          .orderBy(col("source"))
      },
      Some {
        val wavg = (0 to 5).map(j =>
          "(" + (1 to Epochs).map(r => s"w$r.w$j").mkString(" + ") + s") AS a$j")
          .mkString(", ")
        val froms = (1 to Epochs).map(r => s"w$r").mkString(", ")
        val sc = "a.a0 + " + FeatCols.zipWithIndex
          .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")
        s"""
        WITH $featCtesSql, ${trainChainSql(1, Epochs, "feat")},
        wavg AS (SELECT $wavg FROM $froms),
        scored_docs AS (SELECT f.doc_id, f.y, $sc AS score
                        FROM feat f, wavg a)
        SELECT d.source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN s.y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_pos_label,
               CAST(SUM(CASE WHEN s.score > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(SUM(CASE WHEN s.score > 0 THEN 1 ELSE 0 END) * 10000
                 // COUNT(*) AS BIGINT) AS keep_frac_e4,
               CAST(SUM(CASE WHEN (s.score > 0) = (s.y = 1) THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_agree,
               CAST(coalesce(SUM(CASE WHEN s.score > 0 THEN d.n_chars END), 0)
                 AS BIGINT) AS kept_chars
        FROM scored_docs s JOIN documents d USING (doc_id)
        GROUP BY d.source ORDER BY d.source"""
      }),

    // ------------------------------------------------------------------
    // q153: CROSS-CORPUS scoring — the actual CCNet deployment shape
    // (Wenzek et al. LREC 2020: the quality model is fit against a
    // REFERENCE corpus, then scores the whole crawl): train on the
    // English slice, score EVERY document under the frozen reference
    // artifact — reference thresholds label, reference stats
    // standardize (the training-serving-skew rule; a crawl doc's
    // features are measured on the reference's scale, so "kept" means
    // "reference-like", not "average for its own corpus"). Completes
    // the serving matrix: self (q142), warm-start continuation (q147),
    // cross-corpus (q153). Engine: one reference feature build + train
    // at construct; the returned plan scores the full corpus's
    // features (built under 1-row broadcast reference artifacts) with
    // literal weights. Oracle: the q147 chain machinery with the
    // reference tag's thresholds/stats re-used by the full chain.
    QueryDef(
      "q153_classifier_cross_corpus",
      (s, dir) => {
        // the reference model (English-slice LM + thresholds + stats +
        // weights) serves from ClassifierStore's committed cross-corpus
        // artifacts — frozen once per corpus, the CCNet deployment
        // shape; the query pays only the full-corpus scoring scan.
        val (lmb, voc, thrR, statsR, wavg) =
          ClassifierStore.crossArtifacts(s, dir)
        val scope = new graft.CacheScope
        // every crawl doc scores under the REFERENCE LM (never its own
        // corpus's — the training/serving feature must be the same
        // measurement) and the frozen reference thresholds/stats
        val tkF = scope.cache(tk3(T.documents(s, dir)))
        val featF = standardizeUnder(
          rawFeaturesUnder(tkF,
            LmScore.scoreAgainstLmTk(lmb, voc, tkF)
              .select(col("doc_id"), col("centibits_per_bigram").as("cb")),
            thrR), statsR)
        featF.select(col("doc_id"), col("y"), score(wavg).as("score"))
          .withColumn("kept", col("score") > 0L)
          .orderBy(col("doc_id"))
      },
      Some {
        // the full corpus's centibits come from scoring its bigrams
        // against the REFERENCE chain's LM CTEs (lmbr/lmpr/vcr) with
        // add-one left joins — the q127 cross-LM discipline
        val crossCbs = s"""
        bgf AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 2)}) AS bg
                FROM tkf),
        scfx AS (SELECT b.doc_id,
                        coalesce(l.cb, 0) + 1 AS den,
                        coalesce(p.cp, 0) + vc.v AS num
                 FROM bgf b
                 LEFT JOIN lmbr l USING (bg)
                 LEFT JOIN lmpr p ON p.w1 = split_part(b.bg, ' ', 1)
                 CROSS JOIN vcr vc),
        bitsfx AS (SELECT doc_id,
                        greatest(0, CASE WHEN (den << k) > num
                                         THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT doc_id, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM scfx)),
        cbsf AS (SELECT doc_id,
                        CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT) AS cb
                 FROM bitsfx GROUP BY doc_id)"""
        s"""
        WITH ${featChainSql("r", "WHERE lang = 'en'")},
        ${featChainSql("f", "", thrCte = Some("thrr"),
          statsCte = Some("fstatsr"), cbsSql = Some(crossCbs))},
        ${trainChainSql(1, Epochs, "featr")},
        ${scoredCtesSql("f")}
        SELECT doc_id, y, score, score > 0 AS kept
        FROM scoredf ORDER BY doc_id"""
      }),

    // ------------------------------------------------------------------
    // q150: the classifier's OPERATING CURVE — the threshold sweep a
    // filter ships with (how aggressive should the cut be?): five
    // thresholds spanning the score range symmetrically
    // (t_k = k·base, k ∈ −2..2, base = Σ|w̄_feat|·Scale div 4 — a
    // deterministic, data-derived grid; |score − w̄₀| is bounded by
    // 4·base so the grid brackets the distribution), and per threshold
    // the kept count, true positives against the weak label, and
    // integer basis-point precision/recall. Divisions guard n_kept = 0
    // with greatest(1,·) — nonneg operands, both engines agree. Plan:
    // q142's training + ONE cached-feature scan crossed with the
    // 5-row literal grid, reduced to 5 rows.
    QueryDef(
      "q150_classifier_threshold_sweep",
      (s, dir) => {
        import s.implicits._
        val feat = ClassifierStore.features(s, dir)
        val wavg = ClassifierStore.averagedWeights(s, dir)
        val base = (1 to 5).map(j => math.abs(wavg(j))).sum * Scale.toLong / 4L
        val thrDf = (-2 to 2).map(k => (k.toLong, k * base))
          .toDF("thr_k", "thr")
        feat.select(col("y"), score(wavg).as("score"))
          .crossJoin(broadcast(thrDf))
          .groupBy(col("thr_k"), col("thr"))
          .agg(
            sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"),
            sum(when(col("score") > col("thr"), 1L).otherwise(0L))
              .as("n_kept"),
            sum(when(col("score") > col("thr") && col("y") === 1L, 1L)
              .otherwise(0L)).as("tp"))
          .select(col("thr_k"), col("thr"), col("n_kept"), col("tp"),
            expr("(tp * 10000) div greatest(CAST(1 AS BIGINT), n_kept)")
              .as("precision_e4"),
            expr("(tp * 10000) div greatest(CAST(1 AS BIGINT), n_pos)")
              .as("recall_e4"))
          .orderBy(col("thr_k"))
      },
      Some {
        val wavg = (0 to 5).map(j =>
          "(" + (1 to Epochs).map(r => s"w$r.w$j").mkString(" + ") + s") AS a$j")
          .mkString(", ")
        val froms = (1 to Epochs).map(r => s"w$r").mkString(", ")
        val sc = "a.a0 + " + FeatCols.zipWithIndex
          .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")
        s"""
        WITH $featCtesSql, ${trainChainSql(1, Epochs, "feat")},
        wavg AS (SELECT $wavg FROM $froms),
        nrm AS (SELECT (abs(a1)+abs(a2)+abs(a3)+abs(a4)+abs(a5)) * $Scale // 4
                         AS base
                FROM wavg),
        grid AS (SELECT CAST(k AS BIGINT) AS thr_k,
                        CAST(k * base AS BIGINT) AS thr
                 FROM (SELECT unnest([-2, -1, 0, 1, 2]) AS k), nrm),
        scored AS (SELECT f.y, $sc AS score FROM feat f, wavg a)
        SELECT g.thr_k, g.thr,
               CAST(SUM(CASE WHEN s.score > g.thr THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN s.score > g.thr AND s.y = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN s.score > g.thr AND s.y = 1
                             THEN 1 ELSE 0 END) * 10000
                 // greatest(1, SUM(CASE WHEN s.score > g.thr
                                        THEN 1 ELSE 0 END)) AS BIGINT)
                 AS precision_e4,
               CAST(SUM(CASE WHEN s.score > g.thr AND s.y = 1
                             THEN 1 ELSE 0 END) * 10000
                 // greatest(1, SUM(CASE WHEN s.y = 1 THEN 1 ELSE 0 END))
                 AS BIGINT) AS recall_e4
        FROM scored s CROSS JOIN grid g
        GROUP BY g.thr_k, g.thr ORDER BY g.thr_k"""
      }),

    // ------------------------------------------------------------------
    // q163: CALIBRATION TABLE — the reliability diagram a shipped
    // filter is audited with (is a higher score actually a higher
    // chance of "reference-like"?): scores bin into 8 equal-width
    // integer bins over the observed [lo, hi] range (1-row broadcast
    // bounds; bin = (score−lo)·8 div (hi−lo+1) — both operands
    // non-negative, the division rule), and each bin reports document
    // count, weak-label positives, and the empirical positive rate in
    // basis points plus its exact score span. A calibrated filter
    // shows pos_rate_e4 rising with bin — on the fixture it does
    // (spec-gated monotone trend), and the full table is hash-checked.
    // Complements q150: the sweep picks an operating point, this
    // validates the score's ORDERING between points. 100 TB: one
    // cached-feature score pass + an 8-row aggregate.
    QueryDef(
      "q163_classifier_calibration",
      (s, dir) => {
        val feat = ClassifierStore.features(s, dir)
        val wavg = ClassifierStore.averagedWeights(s, dir)
        val scored = feat.select(col("y"), score(wavg).as("score"))
        val bounds = scored.agg(min(col("score")).as("lo"),
          max(col("score")).as("hi"))
        scored.crossJoin(broadcast(bounds))
          .withColumn("bin", expr("((score - lo) * 8) div (hi - lo + 1)"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"),
            min(col("score")).as("score_min"),
            max(col("score")).as("score_max"))
          .select(col("bin"), col("n_docs"), col("n_pos"),
            expr("(n_pos * 10000) div n_docs").as("pos_rate_e4"),
            col("score_min"), col("score_max"))
          .orderBy(col("bin"))
      },
      Some {
        val wavg = (0 to 5).map(j =>
          "(" + (1 to Epochs).map(r => s"w$r.w$j").mkString(" + ") + s") AS a$j")
          .mkString(", ")
        val froms = (1 to Epochs).map(r => s"w$r").mkString(", ")
        val sc = "a.a0 + " + FeatCols.zipWithIndex
          .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")
        s"""
        WITH $featCtesSql, ${trainChainSql(1, Epochs, "feat")},
        wavg AS (SELECT $wavg FROM $froms),
        scored AS (SELECT f.y, $sc AS score FROM feat f, wavg a),
        b AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM scored)
        SELECT (s.score - b.lo) * 8 // (b.hi - b.lo + 1) AS bin,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN s.y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_pos,
               CAST(SUM(CASE WHEN s.y = 1 THEN 1 ELSE 0 END) * 10000
                 // COUNT(*) AS BIGINT) AS pos_rate_e4,
               CAST(MIN(s.score) AS BIGINT) AS score_min,
               CAST(MAX(s.score) AS BIGINT) AS score_max
        FROM scored s, b
        GROUP BY 1 ORDER BY 1"""
      }),

    // ------------------------------------------------------------------
    // q171: ACTIVE-LEARNING BATCH SELECTION — the labeling-loop member
    // of the classifier family (train q141 → apply q142 → warm-start
    // q147 → report q148 → curve q150 → cross-corpus q153 →
    // calibration q163 → SELECT WHAT TO LABEL NEXT). Uncertainty
    // sampling (Lewis & Gale, SIGIR 1994) under the integer model: the
    // decision boundary is score = 0 (q142's kept = score > 0), so a
    // doc's uncertainty margin is |score| exactly — no probability
    // calibration needed, and abs on int64 is identical on both
    // engines. Diversity via per-source quotas (the stratification
    // every labeling vendor requires): the 5 lowest-margin docs per
    // source, ties to the lower doc_id; the weak label rides along so
    // an annotator disagreement with it is immediately visible. 100
    // TB: one scored pass (map-side under the cached features) + the
    // bounded-heap top_k aggregate per source (TopKOrdered — the
    // library's own discipline, TopKAgg.scala documents the row_number
    // window as the anti-pattern it replaces): each map task reduces
    // its slice to ≤ 5 rows per source before the exchange, so no
    // corpus-sized sort partition ever exists. Smallest (margin,
    // doc_id) = largest (−margin, −doc_id) lexicographically; the
    // payload columns ride the struct tail and never affect the order
    // (the two leading keys are already a total order — doc_id is
    // unique).
    QueryDef(
      "q171_active_learning_batch",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val wavg = ClassifierStore.averagedWeights(s, dir)
        val scored = ClassifierStore.features(s, dir)
          .select(col("doc_id"), col("y"), score(wavg).as("score"))
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .withColumn("margin", abs(col("score")))
        scored.groupBy(col("source"))
          .agg(graft.functions.AggFunctions.topK(
            struct((-col("margin")).as("nm"), (-col("doc_id")).as("nd"),
              col("score").as("sc"), col("y").as("yy")), 5).as("top"))
          .select(col("source"), posexplode(col("top")))
          .select(col("source"), (col("pos") + 1).cast("long").as("pick"),
            (-col("col.nd")).as("doc_id"), col("col.sc").as("score"),
            (-col("col.nm")).as("margin"), col("col.yy").as("y"))
          .orderBy(col("source"), col("pick"))
      },
      Some {
        val wavg = (0 to 5).map(j =>
          "(" + (1 to Epochs).map(r => s"w$r.w$j").mkString(" + ") + s") AS a$j")
          .mkString(", ")
        val froms = (1 to Epochs).map(r => s"w$r").mkString(", ")
        val sc = "a.a0 + " + FeatCols.zipWithIndex
          .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")
        s"""
        WITH $featCtesSql, ${trainChainSql(1, Epochs, "feat")},
        wavg AS (SELECT $wavg FROM $froms),
        alsc AS (SELECT f.doc_id, f.y, $sc AS score FROM feat f, wavg a),
        almg AS (SELECT s.doc_id, d.source, s.y, s.score,
                      abs(s.score) AS margin
               FROM alsc s JOIN documents d USING (doc_id)),
        alpk AS (SELECT source, doc_id, y, score, margin,
                      row_number() OVER (PARTITION BY source
                        ORDER BY margin, doc_id) AS pick
               FROM almg)
        SELECT source, CAST(pick AS BIGINT) AS pick, doc_id,
               score, margin, y
        FROM alpk WHERE pick <= 5 ORDER BY source, pick"""
      })
  )
}
