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

  /** Per-document tokenized universe: docs with ≥ 3 tokens. */
  private def tk3(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), X.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)

  /** Raw integer features + weak label (see class doc) over a cached
    * pre-tokenized (doc_id, tk) frame. */
  def rawFeatures(tk3d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = LmScore.surpriseScoresTk(tk3d, tk3d)
      .select(col("doc_id"), col("centibits_per_bigram").as("cb"))
    // quartile thresholds via the q139 value-domain histogram (the
    // window is over distinct centibit values — domain-bounded)
    val n1 = scored.agg(count(lit(1)).as("n"))
    val cum = scored.groupBy(col("cb")).agg(count(lit(1)).as("c"))
      .withColumn("cc", sum(col("c")).over(
        Window.orderBy(col("cb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val thr = cum.crossJoin(broadcast(n1)).agg(
      min(when(col("cc") >= expr("(1*n+3) div 4"), col("cb"))).as("t1"),
      min(when(col("cc") >= expr("(2*n+3) div 4"), col("cb"))).as("t2"),
      min(when(col("cc") >= expr("(3*n+3) div 4"), col("cb"))).as("t3"))
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
        expr("((size(s2) - size(array_distinct(s2))) * 10000) div size(s2)")
          .as("x3"),
        expr("(top_cnt * 10000) div n").as("x4"),
        expr("(nstop * 10000) div n").as("x5"))
  }

  /** Integer standardization of [[rawFeatures]] (see class doc): both
    * div operands non-negative, so the engines agree bit for bit. */
  def standardize(raw: DataFrame): DataFrame = {
    val aggs = FeatCols.flatMap(c => Seq(
      min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c"),
      sum(col(c)).as(s"s_$c"))) :+ count(lit(1)).as("n")
    val stats = raw.agg(aggs.head, aggs.tail: _*)
    val std = FeatCols.map { c =>
      val den = s"(hi_$c - lo_$c + 1)"
      expr(s"(($c - lo_$c) * $Scale) div $den" +
        s" - (((s_$c div n) - lo_$c) * $Scale) div $den").as(c)
    }
    raw.crossJoin(broadcast(stats))
      .select(col("doc_id") +: col("y") +: std: _*)
  }

  /** Standardized feature table for a document corpus. The scope
    * caches the tokenized universe (the LM fit reads it three times)
    * and the raw features (standardization's stats pass + the feature
    * scan both read them; uncached, each re-runs the LM fit). */
  def features(docs: DataFrame,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val t = scope.cache(tk3(docs))
    // coalesce the epoch-scanned table to a handful of partitions: it
    // is n_docs × 7 longs (KBs at fixture scale, ~50 GB at 10⁹ docs —
    // still a few hundred right-sized partitions, never 32 near-empty
    // ones whose per-epoch task-scheduling floor dominates R tiny jobs)
    standardize(scope.cache(rawFeatures(t))).coalesce(4)
  }

  /** w·x + w0 under literal weights (w(0) = bias). */
  private def score(w: Array[Long]): Column =
    FeatCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }

  /** R epochs of batch perceptron over a (cached) standardized feature
    * frame. Returns per-epoch post-update weight snapshots and the
    * epoch's misclassified count — R 1-row collects, the Lloyd/BPE
    * control-plane shape. */
  def trainPerceptron(feat: DataFrame, epochs: Int = Epochs)
      : Seq[(Int, Array[Long], Long)] = {
    var w = Array.fill(6)(0L)
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
  // Oracle side (DuckDB).

  /** CTEs through the standardized feature table `feat` (doc_id, y,
    * x1..x5) — MATERIALIZED: every epoch scans it. */
  private def featCtesSql: String = s"""
        tkall AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        tk AS (SELECT doc_id, tk FROM tkall WHERE len(tk) >= 3),
        ${LmScore.selfScoreBodyCtesSql},
        cbs AS (SELECT doc_id, CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT) AS cb
                FROM bits GROUP BY doc_id),
        nn AS (SELECT COUNT(*) AS n FROM cbs),
        hist AS (SELECT cb, COUNT(*) AS c FROM cbs GROUP BY cb),
        cum AS (SELECT cb, SUM(c) OVER (ORDER BY cb) AS cc FROM hist),
        thr AS (SELECT MIN(CASE WHEN cc >= (1*n+3)//4 THEN cb END) AS t1,
                       MIN(CASE WHEN cc >= (2*n+3)//4 THEN cb END) AS t2,
                       MIN(CASE WHEN cc >= (3*n+3)//4 THEN cb END) AS t3
                FROM cum, nn),
        st AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
                      ${X.shinglesSql("tk", 2)} AS s2,
                      CAST(len(list_filter(tk,
                        t -> list_contains(${X.stopwordsSql}, t))) AS BIGINT)
                        AS nstop,
                      CAST(list_max(list_transform(list_distinct(tk),
                             d -> len(list_filter(tk, x -> x = d)))) AS BIGINT)
                        AS top_cnt
               FROM tk),
        featraw AS (
          SELECT s.doc_id,
                 CASE WHEN c.cb > t.t1 AND c.cb <= t.t3
                      THEN CAST(1 AS BIGINT) ELSE -1 END AS y,
                 c.cb AS x1,
                 least(abs(c.cb - t.t2), $DevCap) AS x2,
                 CAST((len(s.s2) - len(list_distinct(s.s2))) * 10000
                   // len(s.s2) AS BIGINT) AS x3,
                 s.top_cnt * 10000 // s.n AS x4,
                 s.nstop * 10000 // s.n AS x5
          FROM st s JOIN cbs c USING (doc_id) CROSS JOIN thr t),
        fstats AS (SELECT ${FeatCols.map(c =>
          s"MIN($c) AS lo_$c, MAX($c) AS hi_$c, CAST(SUM($c) AS BIGINT) AS s_$c")
          .mkString(", ")}, COUNT(*) AS n
                   FROM featraw),
        feat AS MATERIALIZED (
          SELECT doc_id, y, ${FeatCols.map { c =>
            val den = s"(hi_$c - lo_$c + 1)"
            s"(($c - lo_$c) * $Scale) // $den" +
              s" - (((s_$c // n) - lo_$c) * $Scale) // $den AS $c"
          }.mkString(", ")}
          FROM featraw, fstats)"""

  /** y·(w·x) under the CTE `w$r`'s weight row. */
  private def marginSql(w: String): String =
    s"y * ($w.w0 + ${FeatCols.zipWithIndex
      .map { case (c, j) => s"$w.w${j + 1}*$c" }.mkString(" + ")})"

  /** The unrolled R-epoch train chain: e$r (misclassification sums) and
    * w$r (post-update weights + the epoch's misclassified count). Every
    * CTE is MATERIALIZED — feat and each w$r feed multiple consumers
    * (the q131 unroll discipline). */
  private def trainChainSql(epochs: Int): String =
    (1 to epochs).map { r =>
      val cond = if (r == 1) "TRUE" else s"${marginSql(s"p")} <= 0"
      val from = if (r == 1) "feat" else s"feat, w${r - 1} p"
      val sums = (s"CAST(coalesce(SUM(CASE WHEN $cond THEN y END), 0) AS BIGINT) AS d0" +:
        FeatCols.zipWithIndex.map { case (c, j) =>
          s"CAST(coalesce(SUM(CASE WHEN $cond THEN y*$c END), 0) AS BIGINT) AS d${j + 1}"
        }) :+ s"CAST(coalesce(SUM(CASE WHEN $cond THEN 1 END), 0) AS BIGINT) AS nm"
      val prev =
        if (r == 1) (0 to 5).map(j => s"CAST(0 AS BIGINT) AS w$j")
          .mkString("(SELECT ", ", ", ") p")
        else s"w${r - 1} p"
      s"""
        e$r AS MATERIALIZED (SELECT ${sums.mkString(", ")} FROM $from),
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
    // every later epoch and fails loudly.
    QueryDef(
      "q141_quality_classifier_train",
      (s, dir) => {
        import s.implicits._
        val scope = new graft.CacheScope
        val feat = scope.cache(features(T.documents(s, dir), scope))
        try {
          trainPerceptron(feat)
            .map { case (r, w, nm) => (r.toLong, w(0), w(1), w(2), w(3), w(4), w(5), nm) }
            .toDF("epoch", "w0", "w1", "w2", "w3", "w4", "w5", "n_mis")
            .orderBy(col("epoch"))
        } finally scope.release()
      },
      Some {
        val union = (1 to Epochs).map(r =>
          s"SELECT CAST($r AS BIGINT) AS epoch, w0, w1, w2, w3, w4, w5, " +
            s"nm AS n_mis FROM w$r").mkString(" UNION ALL ")
        s"""
        WITH $featCtesSql, ${trainChainSql(Epochs)}
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
        val scope = new graft.CacheScope
        val feat = scope.cache(features(T.documents(s, dir), scope))
        val wavg = averagedWeights(trainPerceptron(feat))
        // cache survives until the returned plan's own materialization
        graft.CacheScope.releaseAfterNextAction(s, scope)
        feat.select(col("doc_id"), col("y"),
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
        WITH $featCtesSql, ${trainChainSql(Epochs)},
        wavg AS (SELECT $wavg FROM $froms)
        SELECT f.doc_id, f.y,
               a.a0 + ${FeatCols.zipWithIndex
          .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")} AS score,
               (a.a0 + ${FeatCols.zipWithIndex
          .map { case (c, j) => s"a.a${j + 1}*f.$c" }.mkString(" + ")}) > 0 AS kept
        FROM feat f, wavg a ORDER BY f.doc_id"""
      })
  )
}
