package graft.operators

import graft.ext.{TextDsl => X}
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Reusable whole-operator APIs — the operator library a user composes
  * instead of hand-writing the patterns. Each is pure DataFrame → Data-
  * Frame (lazy, Catalyst-optimized); the oracle-checked queries in
  * graft.ops / graft.ext are thin instantiations of these.
  *
  * Scale contracts are part of each operator's signature-level design:
  * candidate generation is always bucket-grouped (work ∝ Σ bucket², not
  * n²), argmax is always partial-aggregable max_by (never a sort-based
  * window over the full pair stream), and per-row kernels are compiled
  * expressions (graft.functions).
  */
object Joins {

  /** As-of join: for each left-side group, the single best right match
    * under `ordering` (lexicographic struct compare, max wins) among
    * rows satisfying `joinCond` — e.g. "latest order at event time".
    * Returns `groupCols` + the chosen `payload` as column "asof".
    *
    * Shape: equi+range join, then map-side-reducing argmax — the
    * intermediate match stream never gets sort-shuffled, so the
    * operator scales with matches/executor, not with a global sort. */
  def asOf(
      left: DataFrame, right: DataFrame, joinCond: Column,
      groupCols: Seq[Column], ordering: Seq[Column],
      payload: Column): DataFrame =
    left.join(right, joinCond)
      .groupBy(groupCols: _*)
      .agg(max_by(payload, struct(ordering: _*)).as("asof"))

  /** Scale-safe as-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` for the same key — expressed as union + running
    * `last(_, ignoreNulls)` window instead of an equi+range join.
    *
    * Why this shape: [[asOf]]'s join materializes |left_k| × |earlier
    * right_k| intermediate rows per key before the argmax reduces them —
    * per-key quadratic, so a power user with 10⁴ events and 10³ orders
    * costs 10⁷ rows. Here the cost is ONE sort shuffle of |left|+|right|
    * rows and linear output, regardless of per-key density.
    *
    * Ordering contract: right rows sort before left rows at equal ts
    * (inclusive <=); ties among right rows resolve by `rightOrder`
    * ascending, so the carried value equals the lexicographic max of
    * (rightTs, rightOrder…) — identical to asOf's max_by. Left rows with
    * no preceding right row carry a null `asof`; filter it for inner-join
    * semantics. Caller must align `leftTs`/`rightTs` to one type.
    *
    * Output columns: key, ts, left (the left payload struct), asof. */
  def asOfLast(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      leftPayload: Column, rightPayload: Column,
      rightOrder: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pType = right.select(rightPayload.as("_p")).schema.head.dataType
    val lpType = left.select(leftPayload.as("_lp")).schema.head.dataType
    val ordCol = if (rightOrder.nonEmpty) struct(rightOrder: _*) else lit(0)
    val ordType = right.select(ordCol.as("_o")).schema.head.dataType
    // Null-keyed right rows can never match in join semantics (null ===
    // null is false), but Window.partitionBy groups all nulls into one
    // partition — drop them so a null-keyed left row gets a null asof,
    // exactly like the join formulation, not a phantom match.
    val r = right.select(rightKey.as("_k"), rightTs.as("_ts"),
      lit(0).as("_side"), ordCol.as("_ord"),
      lit(null).cast(lpType).as("_lp"), rightPayload.as("_p"))
      .filter(col("_k").isNotNull)
    val l = left.select(leftKey.as("_k"), leftTs.as("_ts"),
      lit(1).as("_side"), lit(null).cast(ordType).as("_ord"),
      leftPayload.as("_lp"), lit(null).cast(pType).as("_p"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionAll(l)
      .withColumn("asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_k").as("key"), col("_ts").as("ts"),
        col("_lp").as("left"), col("asof"))
  }

  /** Skew-safe equi join: spread each (possibly hot) left key over
    * `salts` sub-keys — salt is a deterministic hash of the whole left
    * row, so retries re-derive it — and replicate the right side once
    * per salt. One hot key then lands on `salts` tasks instead of one.
    * AQE's skew-join split handles sort-merge skew adaptively at
    * runtime; explicit salting is for known-hot keys, broadcast-size
    * right sides, and plans where AQE can't intervene.
    * `key` must name a column present on both sides. */
  def saltedEquiJoin(
      left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}

object NearDup {

  /** Exact dedup by a normalization column: one survivor (min id) per
    * normalized value plus the duplicate count. One shuffle, partial
    * aggregation on the map side. */
  def exact(df: DataFrame, id: Column, norm: Column): DataFrame =
    df.select(id.as("_id"), norm.as("_norm"))
      .groupBy(col("_norm"))
      .agg(min(col("_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
      .select(col("survivor_id"), col("n_copies"))

  /** In-bucket pair expansion: all (a, b), a < b, from a collected and
    * sorted id array — runs inside a row after the bucket group-by, so
    * candidate generation is one aggregation, never a self-join.
    * Compiled kernel (graft.functions.SortedIdPairs): the HOF nested-
    * transform formulation allocated >1M interpreted structs per run. */
  private[graft] def pairsOf(ids: Column): Column =
    graft.functions.HashFunctions.sortedIdPairs(ids)

  /** Bucket-grouped sorted member arrays with a hard bucket-size cap.
    *
    * At real duplicate density one LSH bucket can hold 10⁶ ids: its
    * collect_list row alone is MBs and its pair expansion is n²/2 —
    * one degenerate bucket kills the job. This helper counts bucket
    * sizes FIRST (partial-aggregable, only (keys, count) shuffles) and
    * joins the membership stream back to the surviving keys, so an
    * oversized bucket never materializes an array at all — not merely
    * gets dropped after being built. The join and the following group-by
    * share the bucket-key partitioning, so this costs one extra tiny
    * exchange of bucket counts, not a second full shuffle.
    *
    * Oversized buckets are dropped (a bucket past the cap is a stopword-
    * like degenerate signature carrying ~no pair information — the
    * standard cap move in near-dup at scale); the dropped count is
    * published as an `observe` metric `<metricName>.dropped_buckets`. */
  private[graft] def cappedBuckets(
      keyed: DataFrame, keyCols: Seq[String], member: String,
      maxBucket: Int, metricName: String): DataFrame = {
    val keys = keyCols.map(col)
    val sizes = keyed.groupBy(keys: _*).agg(count(lit(1)).as("_bn"))
      .observe(metricName,
        sum(when(col("_bn") > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"))
    val kept = sizes.filter(col("_bn") > 1 && col("_bn") <= maxBucket).drop("_bn")
    keyed.join(kept, keyCols)
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(col(member))).as("ids"))
  }

  /** MinHash+LSH near-duplicate pairs over a text column: tokenize →
    * distinct word n-gram shingles → k-wide MinHash signature (compiled
    * kernels) → `bands` LSH bands → bucket-grouped candidate pairs →
    * exact Jaccard verify ≥ `threshold`.
    *
    * Only (band, band-signature, id) tuples shuffle for candidate
    * generation — k ints per doc, not shingles. The signature table is
    * persisted because banding and verification share it; at cluster
    * scale that materialization is the standard signature checkpoint. */
  /** Shared signature + banding prefix of the MinHash-LSH passes:
    * tokenize → distinct shingles → k-wide signature → per-band
    * signature strings. Returns (base, banded): base = (doc_id,
    * extra..., sh, sig), cached through `scope` because banding and
    * Jaccard verification share it; banded = (doc_id, extra..., band,
    * bsig). ONE definition so the full and incremental passes can never
    * drift apart on shingling or band-slice arithmetic. */
  private def bandedSignatures(
      docs: DataFrame, id: Column, text: Column, extra: Seq[(String, Column)],
      numHashes: Int, bands: Int, shingleWidth: Int,
      scope: graft.CacheScope): (DataFrame, DataFrame) = {
    val rows = bands match {
      case b if numHashes % b == 0 => numHashes / b
      case _ => throw new IllegalArgumentException(
        s"bands ($bands) must divide numHashes ($numHashes)")
    }
    val extraNames = extra.map(_._1)
    val base = docs
      .select(id.as("doc_id") +: extra.map { case (n, c) => c.as(n) } :+
        X.tokens(text).as("tk"): _*)
      .filter(size(col("tk")) >= shingleWidth)
      .select(col("doc_id") +: extraNames.map(col) :+
        array_distinct(X.shingles(col("tk"), shingleWidth)).as("sh"): _*)
      .withColumn("sig", HashFunctions.minhashSignature(col("sh"), numHashes))
      .transform(scope.cache)
    val banded = base
      .select(col("doc_id") +: extraNames.map(col) :+
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            concat_ws("-", slice(col("sig"), b * rows + 1, lit(rows))).as("bsig"))))
          .as("bd"): _*)
      .select(col("doc_id") +: extraNames.map(col) :+
        col("bd.band").as("band") :+ col("bd.bsig").as("bsig"): _*)
    (base, banded)
  }

  /** {s} ∪ all single-character deletions of s — the FastSS / deletion-
    * neighborhood key set for edit distance ≤ 1. Recall direction
    * (what blocking needs): any two distinct strings within one edit
    * SHARE a key — substitution at i ⇒ both yield del_i;
    * insertion/deletion ⇒ the shorter string IS a deletion variant of
    * the longer. The converse does NOT hold ("abc"/"bcd" share "bc"
    * at distance 2), so candidates from shared keys MUST still pass
    * the exact Levenshtein verify — [[editDistancePairs]] always does.
    * Blocking on these keys is therefore full-recall, not a heuristic,
    * and a key of length L is shared by at most ~|alphabet|·(L+1)
    * strings (everything one insertion away), so bucket sizes are
    * intrinsically bounded — no selectivity bet. */
  def deletionVariants(text: Column): Column =
    array_union(array(text),
      transform(sequence(lit(1), length(text)), i =>
        concat(text.substr(lit(1), i - 1),
          text.substr(i + lit(1), length(text)))))

  /** Fuzzy (edit-distance) near-duplicate pairs — the entity-resolution
    * modality token/shingle dedup misses (single-character typos, OCR
    * noise): each string explodes into caller-chosen blocking keys
    * (pass [[deletionVariants]] for exact full recall at maxDist=1, or
    * any sorted-neighborhood-style key array for heuristic recall at
    * larger distances), candidates share a key, pairs expand in-bucket
    * via [[cappedBuckets]] (work ∝ Σ bucket², an oversized bucket never
    * materializes, drops surface as `edit_dedup_block_cap`), duplicates
    * from multi-key collisions collapse before verification, and
    * survivors verify with exact Levenshtein ≤ `maxDist` — an integer
    * DP, so results are bit-comparable.
    *
    * Unicode contract: the engine side is CODEPOINT-level throughout —
    * Spark's `levenshtein` counts code-point edits (an astral emoji is
    * one edit) and [[deletionVariants]] deletes one code point per key
    * (`length`/`substr` are code-point-indexed), so the recall lemma
    * holds for any input (OperatorsSpec pins this property, astral
    * included). DuckDB's BUILTIN `levenshtein` counts UTF-8 BYTE edits
    * ('café'→'cafe' is 2 there), so the q88 oracle uses it on ASCII
    * input only; the cross-engine parity of the codepoint definition
    * itself is hash-checked by q100, whose oracle implements the
    * codepoint DP directly (recursive CTE over regexp_extract_all
    * codepoints) on astral/combining/multi-codepoint fixtures.
    *
    * Scale contract: run this on DISTINCT strings (resolve exact-copy
    * mass with [[exact]] first — one hash agg, no pairs); the candidate
    * stream then scales with the entity vocabulary, not the corpus. */
  def editDistancePairs(
      docs: DataFrame, id: Column, text: Column, blockKeys: Column,
      maxDist: Int, maxBucket: Int = 65536,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val base = docs
      .select(id.as("doc_id"), text.as("txt"), blockKeys.as("bks"))
      .transform(scope.cache)
    val cand = cappedBuckets(
        base.select(explode(col("bks")).as("blk"), col("doc_id")),
        Seq("blk"), "doc_id", maxBucket, "edit_dedup_block_cap")
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("txt").as("ta")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("txt").as("tb")), "doc_b")
      .withColumn("dist", levenshtein(col("ta"), col("tb")))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** The (base, banded) MinHash index pair as first-class data:
    * base (doc_id, sh, sig) and banded (doc_id, band, bsig) — the two
    * tables a catalog-persisted dedup index stores (q170 writes them
    * as versions; a later batch probes the band version and verifies
    * against the shingle store without ever re-tokenizing the
    * corpus). Same construction [[minhashLsh]]/[[minhashLshIncremental]]
    * use internally, so a served probe and an in-query pass can never
    * disagree on banding. */
  def minhashBandTable(
      docs: DataFrame, id: Column, text: Column,
      numHashes: Int = 12, bands: Int = 3, shingleWidth: Int = 3,
      scope: graft.CacheScope = new graft.CacheScope): (DataFrame, DataFrame) =
    bandedSignatures(docs, id, text, Nil, numHashes, bands, shingleWidth, scope)

  /** The (doc_id, sh, sig) MinHash signature table alone — the
    * index-as-data unit [[minhashLshIncremental]] consumes: persist it
    * through the versioned catalog after each run and the next
    * incremental pass never re-tokenizes the existing corpus. */
  def minhashSignatures(
      docs: DataFrame, id: Column, text: Column,
      numHashes: Int = 12, shingleWidth: Int = 3,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame =
    bandedSignatures(docs, id, text, Nil, numHashes, bands = 1,
      shingleWidth, scope)._1

  def minhashLsh(
      docs: DataFrame, id: Column, text: Column,
      numHashes: Int = 12, bands: Int = 3, shingleWidth: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 1024,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val (base, banded) = bandedSignatures(docs, id, text, Nil,
      numHashes, bands, shingleWidth, scope)
    val cand = cappedBuckets(banded, Seq("band", "bsig"), "doc_id",
        maxBucket, "minhash_lsh_bucket_cap")
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    val inter = size(array_intersect(col("sha"), col("shb")))
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("jac", inter.cast("double") /
        (size(col("sha")) + size(col("shb")) - inter).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /** Incremental MinHash+LSH: the near-dup pairs that INVOLVE a new
    * batch (`isNew`), checked against new ∪ existing. Returns exactly
    * [[minhashLsh]]'s pairs restricted to those with ≥1 new member —
    * the incremental-curation contract: pairs wholly inside the
    * existing corpus were already resolved by the previous run.
    *
    * Scale shape: candidate generation joins only the NEW side's band
    * tuples against shared buckets, so the work is
    * Σ_buckets |new ∩ bucket| · |bucket| instead of Σ |bucket|² — the
    * win when the daily batch is a sliver of the corpus. Buckets with
    * no new member are pruned before any pair forms, and the existing
    * side participates only through (band, bsig, id) tuples + its
    * signature table; in production both come from the catalog
    * (index-as-data, like the IVF centroids) and the old corpus is
    * never re-tokenized. Oversized buckets drop + count
    * (`minhash_lsh_inc_bucket_cap`), as in the full pass. */
  def minhashLshIncremental(
      docs: DataFrame, id: Column, text: Column, isNew: Column,
      numHashes: Int = 12, bands: Int = 3, shingleWidth: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 1024,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val (base, banded) = bandedSignatures(docs, id, text,
      Seq("is_new" -> isNew), numHashes, bands, shingleWidth, scope)
    val sizes = banded.groupBy(col("band"), col("bsig"))
      .agg(count(lit(1)).as("_bn"), max(col("is_new")).as("_has_new"))
      .observe("minhash_lsh_inc_bucket_cap",
        sum(when(col("_bn") > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"))
    val kept = sizes
      .filter(col("_bn") > 1 && col("_bn") <= maxBucket && col("_has_new"))
      .select(col("band"), col("bsig"))
    val newB = banded.filter(col("is_new")).join(kept, Seq("band", "bsig"))
      .select(col("band"), col("bsig"), col("doc_id").as("nid"))
    val allB = banded.join(kept, Seq("band", "bsig"))
      .select(col("band"), col("bsig"), col("doc_id").as("mid"))
    val cand = newB.join(allB, Seq("band", "bsig"))
      .filter(col("nid") =!= col("mid"))
      .select(least(col("nid"), col("mid")).as("doc_a"),
        greatest(col("nid"), col("mid")).as("doc_b"))
      .distinct()
    val inter = size(array_intersect(col("sha"), col("shb")))
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("jac", inter.cast("double") /
        (size(col("sha")) + size(col("shb")) - inter).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }
}

object SimilarityJoin {

  /** Build the IVF index: sampled KMeans fit, returned as the index AS
    * DATA — a tiny (cell, centroid) DataFrame. Persist it through the
    * versioned catalog (`parquet` format) and the serving path never
    * touches an ML library again: build once, probe many times, time-
    * travel old indexes. Fit input is bounded by `fitSampleCap` —
    * centroid quality needs a representative sample, not the corpus; at
    * 100 TB a full-corpus fit is nCells×iters full scans. */
  def ivfBuildIndex(
      vecs: DataFrame, vec: Column, nCells: Int = 16,
      seed: Long = 42L, fitSampleCap: Long = 100000L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val arr = vecs.select(vec.cast("array<double>").as("fa"))
    val nRows = vecs.count() // bare count answers from parquet metadata
    val sampled =
      if (nRows <= fitSampleCap) arr
      else arr.sample(withReplacement = false, fitSampleCap.toDouble / nRows, seed)
    // Pin the fit input to one content-sorted partition: random-init
    // KMeans draws its initial centroids from the RDD's partition
    // structure, so without this an environment change (core count,
    // parquet split size) silently moves the centroids — and any
    // downstream recall contract (q53) with them — with no code change.
    // The sample is ≤ fitSampleCap rows; one sort + single partition is
    // a fixed, build-time-only cost. (When nRows > fitSampleCap the
    // Bernoulli sample itself is still layout-dependent — at that scale
    // there is no pinned contract, only index quality.)
    val fitInput = sampled
      .withColumn("_ok", xxhash64(col("fa").cast("string")))
      .repartition(1).sortWithinPartitions("_ok")
      .select(org.apache.spark.ml.functions.array_to_vector(col("fa"))
        .as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .setMaxIter(8) // index build: cell quality plateaus early, recall
                     // comes from nProbe — don't pay 20 default iters
      .setInitMode("random") // k-means|| init costs ~5 extra distributed
                             // passes; on a representative sample random
                             // init converges to equivalent cell quality
      .fit(fitInput)
    val spark = vecs.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")
  }

  /** IVF (inverted-file) ANN top-k: the index partitions the corpus into
    * cells; each query scores only the `nProbe` cells whose centroids
    * are nearest, then exact integer-scaled cosine re-ranks candidates.
    * The scale path when LSH recall is poor (near-orthogonal vectors).
    *
    * Serving is ML-library-free: cell assignment is a map-side argmin
    * HOF over the centroid array (zero shuffle), probing broadcasts the
    * same nCells rows, and the candidate join shuffles cell ids only.
    *
    * Not oracle-expressible (the KMeans fit) — semantics covered by
    * SimilarityIvfSpec: exact scores, rank monotonicity, recall vs
    * brute force, and index round-trip through the catalog. */
  def ivfTopK(
      vecs: DataFrame, id: Column, vec: Column,
      queryPred: Column, nCells: Int = 16, nProbe: Int = 4,
      k: Int = 3, seed: Long = 42L, fitSampleCap: Long = 100000L): DataFrame =
    ivfTopKServing(vecs, id, vec, queryPred,
      ivfBuildIndex(vecs, vec, nCells, seed, fitSampleCap), nProbe, k)

  /** ORACLE-EXACT distributed IVF/KMeans build — the hash-checkable
    * twin of [[ivfBuildIndex]] (whose MLlib KMeans fit is only
    * recall-contract checkable, q53). The q94 `fitExact` construction
    * applied to the corpus itself:
    *
    *  - vectors quantize to exact ×1e7 int64 ([[TextDsl.scaledVec]] —
    *    the same representation every cosine query shares);
    *  - seeds are the min-id row of each `vec_id % nCells` residue
    *    class (deterministic, one partial-aggregable group-by — no
    *    global sort/rank shuffle);
    *  - each Lloyd sweep assigns through the compiled
    *    [[graft.functions.NearestCentroid]] kernel (map-side, means
    *    held as a reference object) and re-sums centroids as per-dim
    *    int64 SUMs — exact and ORDER-FREE, so a SQL SUM reproduces
    *    them regardless of aggregation order; each mean exists only as
    *    the single division sumInt/(cnt·1e7), identical IEEE on any
    *    engine. Emptied cells keep their previous (sum, cnt) state
    *    (the [[graft.functions.TwoLevelIndex.fitExact]] rule).
    *
    * Scale shape: per sweep ONE compiled scan + one (cell, dim)-keyed
    * partial aggregation whose output is nCells×dim rows — the k×dim
    * driver state is index-as-data-small; the corpus never shuffles
    * (aggregation reduces map-side). A production 100 TB build samples
    * first ([[ivfBuildIndex]]'s fitSampleCap) — this operator is the
    * bit-exact construction for auditable fixture-scale builds and for
    * regression-pinning index builds in CI.
    *
    * Returns the built index exploded per dimension — (cell, d,
    * sum_e7, cnt, mean, n_members) — so every word of driver state is
    * hash-checked (q96), not just a summary. */
  def ivfBuildIndexExact(
      vecs: DataFrame, id: Column, vec: Column,
      nCells: Int = 16, iters: Int = 5,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val base = vecs
      .select(id.as("vec_id"), X.scaledVec(vec).as("iv"))
      .withColumn("fd", transform(col("iv"), x => x.cast("double") / lit(1e7)))
      .transform(scope.cache)
    // seeds: min-id row per residue class — k tiny rows to the driver
    val seedRows = base
      .groupBy((col("vec_id") % nCells).as("cell"))
      .agg(min_by(col("iv"), col("vec_id")).as("iv"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    require(seedRows.length == nCells,
      s"ivfBuildIndexExact: need every vec_id % $nCells residue class " +
        s"non-empty for seeding, got ${seedRows.length} of $nCells")
    val dim = seedRows.head._2.length
    var sums: Array[Array[Long]] = seedRows.map(_._2.clone())
    var cnts: Array[Long] = Array.fill(nCells)(1L)
    def means: Array[Array[Double]] = Array.tabulate(nCells, dim) { (c, d) =>
      sums(c)(d).toDouble / (cnts(c) * 10000000L).toDouble
    }
    def assigned = base.withColumn("cell",
      graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), means))
    var it = 0
    while (it < iters) {
      // one distributed pass: compiled assignment + per-(cell, dim)
      // int64 partial aggregation; nCells×dim rows come back
      val stats = assigned
        .select(col("cell"), posexplode(col("iv")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("nc"))
        .collect()
      val ns = Array.fill(nCells)(new Array[Long](dim))
      val ncnt = new Array[Long](nCells)
      stats.foreach { r =>
        val c = r.getInt(0)
        ns(c)(r.getInt(1)) = r.getLong(2)
        ncnt(c) = r.getLong(3)
      }
      var c = 0
      while (c < nCells) { // empty cell keeps its previous (sum, cnt)
        if (ncnt(c) > 0) { sums(c) = ns(c); cnts(c) = ncnt(c) }
        c += 1
      }
      it += 1
    }
    // final assignment under the converged means: the cell occupancy
    // the serving path will see (the fitExact assignAll step)
    val spark = vecs.sparkSession
    import spark.implicits._
    val memb = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val m = means
    (0 until nCells).flatMap { c =>
      (0 until dim).map { d =>
        (c.toLong, d.toLong, sums(c)(d), cnts(c), m(c)(d),
          memb.getOrElse(c, 0L))
      }
    }.toDF("cell", "d", "sum_e7", "cnt", "mean", "n_members")
  }

  /** The corpus-side ASSIGNMENT TABLE (vec_id, cell) — the persisted
    * half of a serving index (index-as-data: the centroid table and
    * this assignment table version together in the catalog). One
    * compiled map-side kernel pass, zero shuffle; `coarse` opts into
    * the two-level kernel at the ≳10⁴-cell design point. */
  def ivfAssignTable(
      vecs: DataFrame, id: Column, vec: Column, centroidsDf: DataFrame,
      coarse: Option[CoarseProbe] = None): DataFrame = {
    val matrix = centroidMatrix(centroidsDf)
    val assignCol = coarse match {
      case Some(cp) =>
        val (cm, mem) = cp.prefit.getOrElse {
          if (cp.sqlExactFit)
            graft.functions.TwoLevelIndex.fitExact(matrix, cp.nCoarse, cp.fitIters)
          else graft.functions.TwoLevelIndex.fit(matrix, cp.nCoarse, cp.fitIters)
        }
        graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
          col("fd"), cm, mem, matrix, cp.wProbe)
      case None =>
        graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), matrix)
    }
    vecs.select(id.as("vec_id"), vec.cast("array<double>").as("fd"))
      .withColumn("cell", assignCol.cast("long"))
      .select(col("vec_id"), col("cell"))
  }

  /** APPEND WITHOUT REFIT — the maintenance operation every serving
    * index needs daily: assign ONLY the new batch through the compiled
    * kernel against the PERSISTED centroid structure and commit
    * old ∪ new as the next catalog version of the assignment table.
    * The old corpus is never re-scanned and never re-assigned — its
    * rows pass from the previous version verbatim (IvfAppendSpec
    * proves it by appending under a DIFFERENT centroid table: v1
    * assignments survive untouched) — so the cost is ∝ |new batch|,
    * not ∝ corpus. Because the kernel is stateless in the vectors,
    * serving from the appended version is bit-identical to a
    * from-scratch assignment over the union under the same centroids —
    * q115 proves exactly that equivalence under the full oracle.
    * Returns (committed version, rows appended). Refit policy lives
    * with the caller: [[indexOccupancyReport]] over the appended
    * version is the trigger input. */
  def ivfAppendAssign(
      cat: graft.catalog.VersionedCatalog, step: String,
      newVecs: DataFrame, id: Column, vec: Column,
      centroidsDf: DataFrame,
      coarse: Option[CoarseProbe] = None): (Int, Long) = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, cell BIGINT")
    val base = cat.latest(step, Some(schema))
    val fresh = ivfAssignTable(newVecs, id, vec, centroidsDf, coarse)
      .select(col("vec_id").cast("long"), col("cell"))
    // the count pays one extra pass over the NEW batch only (the daily
    // increment, never the corpus) — the price of reporting append size
    // without threading observe-metric listeners through the write
    val appended = fresh.count()
    val v = cat.writeNext(step, base.unionByName(fresh))
    (v, appended)
  }

  /** The occupancy report's CONSUMER — closes the index maintenance
    * loop (build → serve → append → monitor → REFIT): when the share
    * of assignment rows sitting in `needs_refit` cells reaches
    * `staleShareE2` (×100), refit centroids via the caller's `fit`
    * over the corpus and commit a fresh full assignment as the next
    * catalog version; otherwise leave the index alone. Returns
    * (refit fired, flagged share ×100, committed version if any). The
    * decision reads one tiny aggregate over the cell-level report
    * (index-small rows); the corpus is scanned ONLY when refit fires —
    * a daily maintenance job that usually decides "no" costs two
    * cell-count aggregations, not a corpus pass. */
  def ivfRefitIfStale(
      cat: graft.catalog.VersionedCatalog, step: String,
      vecs: DataFrame, id: Column, vec: Column,
      fitCounts: DataFrame,
      fit: DataFrame => DataFrame,
      staleShareE2: Long = 20L,
      staleFactorE2: Long = 150L): (Boolean, Long, Option[Int]) = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, cell BIGINT")
    val rep = indexOccupancyReport(
      cat.latest(step, Some(schema)), fitCounts, staleFactorE2)
    val head = rep.agg(
      coalesce(sum(when(col("needs_refit"), col("n_total")).otherwise(0L)),
        lit(0L)).as("flagged"),
      coalesce(sum(col("n_total")), lit(0L)).as("total")).head()
    val flagged = head.getLong(0)
    val total = head.getLong(1)
    val shareE2 = flagged * 100L / math.max(total, 1L)
    if (shareE2 >= staleShareE2) {
      val cents = fit(vecs)
      val v = cat.writeNext(step,
        ivfAssignTable(vecs, id, vec, cents)
          .select(col("vec_id").cast("long"), col("cell")))
      (true, shareE2, Some(v))
    } else (false, shareE2, None)
  }

  /** Occupancy / staleness report — the REFIT TRIGGER input: per cell,
    * the fit-time member count vs the current assignment-table count
    * and the integer growth ratio (×100). A cell whose population
    * outgrew its fit-time shape (growth ≥ `staleFactorE2`) or that the
    * fit never saw (n_fit = 0) degrades probe quality — when enough
    * mass sits in flagged cells, re-fit and re-assign. Joins two
    * cell-count tables (index-small), never the corpus. */
  def indexOccupancyReport(
      asg: DataFrame, fitCounts: DataFrame,
      staleFactorE2: Long = 150L): DataFrame =
    asg.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_total"))
      .join(fitCounts.select(col("cell"), col("n_fit")), Seq("cell"), "full_outer")
      .select(col("cell").cast("long").as("cell"),
        coalesce(col("n_fit"), lit(0L)).as("n_fit"),
        coalesce(col("n_total"), lit(0L)).as("n_total"))
      .withColumn("n_new", col("n_total") - col("n_fit"))
      .withColumn("growth_e2",
        expr("(n_total * 100L) div greatest(n_fit, 1L)"))
      .withColumn("needs_refit",
        col("growth_e2") >= staleFactorE2 || col("n_fit") === 0L)

  /** The fitted two-level structure as INDEX-AS-DATA: one row per
    * super-cell (j, super_centroid, member_cells) — persist it through
    * the versioned catalog next to the (cell, centroid) table and a
    * serving job reloads BOTH with no re-fit (and can time-travel the
    * pair together). The member lists ride along because they are part
    * of the index contract: a reloaded structure must probe exactly
    * the cells the fit assigned. */
  def twoLevelToDf(spark: org.apache.spark.sql.SparkSession,
      coarse: Array[Array[Double]], members: Array[Array[Int]]): DataFrame = {
    import spark.implicits._
    require(coarse.length == members.length,
      "twoLevelToDf: coarse and members must be parallel arrays")
    coarse.zip(members).zipWithIndex
      .map { case ((c, m), j) => (j, c.toSeq, m.toSeq) }.toSeq
      .toDF("j", "super_centroid", "member_cells")
  }

  /** Reload a [[twoLevelToDf]] table into kernel form. Super ids must
    * be contiguous 0..n-1 (row index IS the super id, the
    * [[centroidMatrix]] rule); doubles round-trip parquet bit-exactly,
    * so a reloaded structure probes identically to the fitted one. */
  def twoLevelFromDf(df: DataFrame): (Array[Array[Double]], Array[Array[Int]]) = {
    val rows = df
      .select(col("j").cast("int"), col("super_centroid"), col("member_cells"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getSeq[Int](2).toArray))
      .sortBy(_._1)
    require(rows.zipWithIndex.forall { case ((j, _, _), i) => j == i },
      "two-level index table must carry contiguous super ids 0..n-1")
    require(rows.nonEmpty, "two-level index table is empty")
    (rows.map(_._2), rows.map(_._3))
  }

  /** [[graft.functions.TwoLevelIndex.fitExact]] AS DISTRIBUTED SWEEPS —
    * the coarse fit for the 10⁶-cell decade. The driver-side fits are
    * O(iters·nCells·nCoarse·dim) single-threaded: ~2×10¹⁰ FLOPs at the
    * 10⁵-cell design point (tens of seconds; `fitSampleStride` covers
    * it) but ~6×10¹¹ at 10⁶ cells with √-scaled nCoarse — a driver
    * stall no stride hides (SCALE.md §Index builds states the decade
    * arithmetic). This variant reuses [[ivfBuildIndexExact]]'s
    * distributed Lloyd shape on the CENTROID TABLE itself: per sweep,
    * ONE compiled [[graft.functions.NearestCentroid]] assignment scan
    * over the (cell, centroid) rows plus a per-(super, dim) int64
    * partial aggregation returning nCoarse×dim rows to the driver —
    * the centroid table never collects, executors do the FLOPs, and
    * driver state stays nCoarse×dim (the index-as-data-small bound).
    *
    * Bit-identical to the driver-side `fitExact` BY CONSTRUCTION
    * (SemanticPqSpec pins it on the shared fixture): same strided
    * seeds, same ×1e4 int64 centroid sums — order-free, so the
    * distributed SUM reproduces the sequential accumulation exactly —
    * same single-division means, same empty-super (sum, cnt)
    * carryover, and the compiled kernel's lowest-index tie rule is
    * `nearestIdx`'s. Same input contract too: centroid values must be
    * exact 1e-4 multiples (md5-derived and catalog-persisted exact
    * tables qualify; float KMeans output is not — production fits at
    * this decade run on the persisted exact table). Returns the
    * (coarse matrix, member cell ids) structure [[CoarseProbe]]
    * consumes via `prefit` and [[twoLevelToDf]] persists.
    *
    * `fitSampleStride` composes the sampling hatch with the
    * distributed sweeps (the 10⁷-cell decade): Lloyd iterates on every
    * stride-th cell row while the final assignment still covers every
    * cell — membership stays a partition of the full table, and every
    * downstream guarantee that holds for any partition is unaffected.
    * Stride 1 (default) is the bit-exact fitExact mirror. */
  def twoLevelFitExactDistributed(
      centroidsDf: DataFrame, nCoarse: Int, iters: Int = 10,
      scope: graft.CacheScope = new graft.CacheScope,
      fitSampleStride: Int = 1)
      : (Array[Array[Double]], Array[Array[Int]]) = {
    // AQE OFF across the Lloyd sweeps (r19 — the Bpe/perceptron train-
    // loop lesson): every sweep is one assignment + k×dim-row partial
    // aggregate over the CACHED cell table, so runtime re-planning buys
    // nothing, but each AQE stage is a job barrier and iters+2 tiny
    // jobs make the barriers the fit's wall clock. Scoped + restored;
    // planning only — the collected sums are order-free int64, so the
    // fit stays bit-identical.
    val sess = centroidsDf.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = sess.conf.get(aqeKey, "true")
    sess.conf.set(aqeKey, "false")
    try twoLevelFitExactDistributedLoop(
      centroidsDf, nCoarse, iters, scope, fitSampleStride)
    finally sess.conf.set(aqeKey, prevAqe)
  }

  private def twoLevelFitExactDistributedLoop(
      centroidsDf: DataFrame, nCoarse: Int, iters: Int,
      scope: graft.CacheScope, fitSampleStride: Int)
      : (Array[Array[Double]], Array[Array[Int]]) = {
    require(fitSampleStride >= 1,
      s"two_level_fit_distributed: fitSampleStride must be >= 1, got $fitSampleStride")
    val base = centroidsDf
      .select(col("cell").cast("long").as("cid"), col("centroid").as("fd"),
        transform(col("centroid"),
          x => round(x * lit(1e4)).cast("long")).as("ci"))
      .transform(scope.cache) // iters+1 scans share one materialization
    // the TwoLevelIndex.fit(fitSampleStride) hatch composed with the
    // distributed sweeps — the 10⁷-cell decade: Lloyd iterates on every
    // stride-th cell row (a filter, pushed into the cached scan) while
    // the FINAL assignment below still covers every cell, so membership
    // stays a partition of the full table
    val sweepBase =
      if (fitSampleStride == 1) base
      else base.filter(col("cid") % fitSampleStride === 0)
    try {
    // one validation pass over the index table: contiguity of cell ids,
    // uniform dimensionality, and the 1e-4 exactness contract
    val chk = base.select(
      count(lit(1)).as("n"),
      countDistinct(col("cid")).as("nd"),
      min(col("cid")).as("lo"), max(col("cid")).as("hi"),
      countDistinct(size(col("fd"))).as("dims"),
      sum(when(forall(zip_with(col("ci"), col("fd"),
        (k, v) => k.cast("double") / lit(1e4) === v), b => b), lit(0))
        .otherwise(lit(1))).as("inexact")).head()
    val n = chk.getLong(0)
    require(n > 0, "two_level_fit_distributed: empty centroid table")
    require(chk.getLong(1) == n && chk.getLong(2) == 0L && chk.getLong(3) == n - 1,
      "centroid table must carry contiguous cell ids 0..n-1")
    require(chk.getLong(4) == 1L,
      "two_level_fit_distributed: mixed centroid dimensionalities")
    require(chk.getLong(5) == 0L,
      "two_level_fit_distributed: centroid values must be exact 1e-4 " +
        "multiples (md5-derived tables are; KMeans output is not — use fit)")
    // m = |sweep set|: ceil(n/stride) by the contiguity just proven —
    // no extra count pass. Seeds follow the fit(fitSampleStride) rule:
    // the (i·m/k)-th SAMPLE row, i.e. cell id (i·m/k)·stride.
    val m = (n + fitSampleStride - 1) / fitSampleStride
    val k = math.max(1, math.min(nCoarse, m.toInt))
    val seedIds = Array.tabulate(k)(i => (i.toLong * m / k) * fitSampleStride)
    val seedRows = base.filter(col("cid").isInCollection(seedIds.toSeq))
      .select(col("cid"), col("ci")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val dim = seedRows.head._2.length
    var sums: Array[Array[Long]] = seedIds.map(seedRows(_).clone())
    var cnts: Array[Long] = Array.fill(k)(1L)
    def means: Array[Array[Double]] = Array.tabulate(k, dim) { (c, d) =>
      sums(c)(d).toDouble / (cnts(c) * 10000L).toDouble
    }
    def assigned(m: Array[Array[Double]]) = base.withColumn("sc",
      graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), m))
    def assignedSweep(mm: Array[Array[Double]]) = sweepBase.withColumn("sc",
      graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), mm))
    var it = 0
    while (it < iters) {
      // one distributed pass: compiled assignment + (super, dim)-keyed
      // int64 partial aggregation; k×dim rows come back
      val stats = assignedSweep(means)
        .select(col("sc"), posexplode(col("ci")).as(Seq("d", "x")))
        .groupBy(col("sc"), col("d"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("nc"))
        .collect()
      val ns = Array.fill(k)(new Array[Long](dim))
      val ncnt = new Array[Long](k)
      stats.foreach { r =>
        val c = r.getInt(0)
        ns(c)(r.getInt(1)) = r.getLong(2)
        ncnt(c) = r.getLong(3)
      }
      var c = 0
      while (c < k) { // empty super keeps its previous (sum, cnt) state
        if (ncnt(c) > 0) { sums(c) = ns(c); cnts(c) = ncnt(c) }
        c += 1
      }
      it += 1
    }
    // final assignment under the converged means — (cell, super) pairs
    // only (no dim factor), so even a 10⁶-row member map collects in
    // tens of MB; the structure must partition ALL cells
    val finalMeans = means
    val asg = assigned(finalMeans).select(col("cid"), col("sc")).collect()
      .map(r => r.getLong(0).toInt -> r.getInt(1))
    val members = {
      val bySuper = Array.fill(k)(scala.collection.mutable.ArrayBuffer.empty[Int])
      asg.sortBy(_._1).foreach { case (cid, sc) => bySuper(sc) += cid }
      bySuper.map(_.toArray)
    }
    (finalMeans, members)
    // finally, not inline: the contract requires above throw on bad
    // input, and a failed validation must not leave the projection
    // pinned in the Spark cache for the rest of the session
    } finally scope.release()
  }

  /** The deterministic md5-derived centroid table shared by q81 / q84 /
    * q87 AND their DuckDB oracles: value(c, d) = ((md5h60("ivf c d")
    * mod 4001) - 2000) / 1e4 — one definition so the engine queries,
    * the spec fixtures, and `Similarity.ivfAssignSqlCtes` (the SQL
    * mirror) can never drift on seed string or scaling constants. A
    * production index would come from [[ivfBuildIndex]] instead; this
    * one exists so serving-path results are oracle-expressible. */
  def md5CentroidTable(
      spark: org.apache.spark.sql.SparkSession,
      nCells: Int = 16, dim: Int = 64): DataFrame = {
    import spark.implicits._
    Seq.tabulate(nCells) { c =>
      (c, Seq.tabulate(dim) { d =>
        ((graft.functions.HashKernels.md5h60(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"ivf $c $d"))
          % 4001L) - 2000L) / 10000.0
      })
    }.toDF("cell", "centroid")
  }

  /** Two-level probe configuration for the serving paths: fit `nCoarse`
    * super-cells over the centroid table ONCE (driver-side, over the
    * driver-small centroid matrix — [[graft.functions.TwoLevelIndex]])
    * and probe `wProbe` of them per query instead of scoring all
    * nCells centroids. wProbe = nCoarse reproduces the flat probe
    * bit-exactly (q97); `sqlExactFit` selects the order-free integer
    * Lloyd fit so even PARTIAL probing is SQL-mirrorable on 1e-4-exact
    * centroid tables (q98, the q94 construction). `prefit` bypasses the
    * driver-side fit entirely with an externally built structure — a
    * [[twoLevelFromDf]] reload (index-as-data: fit once, serve many) or
    * [[SimilarityJoin.twoLevelFitExactDistributed]]'s output, the
    * 10⁶-cell path where even the sampled driver fit stalls; the
    * structure must partition the same centroid table the serving op
    * scans (the kernel requires member lists covering every cell). */
  final case class CoarseProbe(nCoarse: Int, wProbe: Int,
      sqlExactFit: Boolean = false, fitIters: Int = 10,
      prefit: Option[(Array[Array[Double]], Array[Array[Int]])] = None)

  /** The probe stage shared by [[ivfTopKServing]] and [[ivfPqTopK]]:
    * (qid, fd) queries → the `nProbe` nearest (qid, cell) pairs, as
    * ONE compiled kernel call per query row
    * ([[graft.functions.VectorIndex.topCells]]). The previous
    * declarative shape — crossJoin against the broadcast centroid
    * table + an interpreted `zip_with`/`aggregate` HOF fold + a
    * per-query `row_number` window — materialized queries × nCells
    * rows and paid boxed lambdas per centroid element: invisible at 16
    * cells, the scale-killer at 10⁵ cells with a corpus-sized query
    * batch (the same shape the dedup side eliminated with the
    * assignment kernels). The kernel folds distances in the same
    * ascending IEEE order the oracle's list_aggregate uses and breaks
    * ties on the lower cell id, so the emitted probe set is
    * bit-identical to the window formulation's. One definition so the
    * serving paths can never drift on probe semantics; `coarse` opts
    * into the two-level kernel at the ≳10⁴-cell design point
    * (~2√nCells·dim FLOPs per query instead of nCells·dim). */
  private def probeCells(
      queries: DataFrame, matrix: Array[Array[Double]], nProbe: Int,
      coarse: Option[CoarseProbe] = None): DataFrame = {
    val cellsCol = coarse match {
      case Some(cp) =>
        val (cm, mem) = cp.prefit.getOrElse {
          if (cp.sqlExactFit)
            graft.functions.TwoLevelIndex.fitExact(matrix, cp.nCoarse, cp.fitIters)
          else graft.functions.TwoLevelIndex.fit(matrix, cp.nCoarse, cp.fitIters)
        }
        graft.functions.VectorIndexFunctions.topCellsTwoLevel(
          col("fd"), cm, mem, matrix, cp.wProbe, nProbe)
      case None =>
        graft.functions.VectorIndexFunctions.topCells(col("fd"), matrix, nProbe)
    }
    queries.select(col("qid"), explode(cellsCol).as("cell"))
  }

  /** nCells rows — an index table is driver-small by construction;
    * collect once to build the compiled assignment kernel (the same
    * data the probe side broadcasts). */
  private def centroidMatrix(centroidsDf: DataFrame): Array[Array[Double]] = {
    val cents = centroidsDf.select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cents.zipWithIndex.forall { case ((cell, _), i) => cell == i },
      "centroid table must carry contiguous cell ids 0..n-1")
    val matrix = cents.map(_._2.toArray)
    require(matrix.nonEmpty && matrix.forall(_.length == matrix.head.length),
      "centroid table is empty or carries mixed dimensionalities")
    matrix
  }

  /** SemDeDup-style semantic dedup summary (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", 2023): cluster embeddings by nearest centroid,
    * call a vector a semantic duplicate when some LOWER-id vector in
    * the SAME cell has cosine ≥ `threshold` (keep-lowest-id
    * representative — deterministic, no RNG), and report per-cell
    * (n_vecs, n_dups, n_kept).
    *
    * Scale shape: the cells play exactly the LSH-bucket role — cell
    * assignment is one compiled map-side kernel (zero shuffle), pair
    * expansion is within-cell only via [[NearDup.cappedBuckets]] (an
    * oversized cell never materializes its array; drops surface as
    * `semantic_dedup_cell_cap.dropped_buckets`), and the exact-cosine
    * verify joins the k-int scaled vectors back by id. At 100 TB the
    * centroid count grows ∝ corpus (the paper uses ~10⁵ clusters) so
    * mean cell size — and with it Σ cell² — stays bounded; the
    * centroid table itself stays driver-small and comes from a sampled
    * KMeans fit persisted in the catalog ([[ivfBuildIndex]]). Past
    * ~10⁴ cells the flat per-vector argmin scan itself dominates
    * (nCells×dim FLOPs/vector): swap the assignment column for the
    * two-level kernel ([[graft.functions.VectorIndexFunctions
    * .nearestCentroidTwoLevel]], ~2√nCells·dim) — SCALE.md states the
    * arithmetic and crossover. */
  /** The (vec_id, v, n2, cell[, extra…]) cell-assignment prologue shared
    * by [[semanticDedup]] and [[semanticDedupIncremental]] — ONE
    * definition of the scaling + assignment semantics that q81/q84/q89
    * and their oracles must agree on byte-for-byte, so the full and
    * incremental passes can never drift on cell membership. */
  private def assignedVectors(
      vecs: DataFrame, id: Column, vec: Column,
      extra: Seq[(String, Column)], centroidsDf: DataFrame,
      scope: graft.CacheScope,
      assignCol: Array[Array[Double]] => Column =
        m => graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), m))
      : DataFrame = {
    val matrix = centroidMatrix(centroidsDf)
    vecs
      .select(id.as("vec_id") +: X.scaledVec(vec).as("v") +:
        vec.cast("array<double>").as("fd") +:
        extra.map { case (n, c) => c.as(n) }: _*)
      .withColumn("n2", X.norm2Int(col("v")))
      .withColumn("cell", assignCol(matrix))
      .drop("fd")
      .transform(scope.cache) // shared by counts + both pair-verify sides
  }

  def semanticDedup(
      vecs: DataFrame, id: Column, vec: Column,
      centroidsDf: DataFrame, threshold: Double, maxCell: Int = 65536,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame =
    semanticDedupCore(
      assignedVectors(vecs, id, vec, Nil, centroidsDf, scope),
      threshold, maxCell)

  /** [[semanticDedup]] with the two-level coarse-quantized assignment
    * kernel — the ≳10⁴-cell form (SCALE.md states the crossover): the
    * coarse level fits ONCE on the driver over the driver-small
    * centroid matrix, and every vector probes `wProbe` of `nCoarse`
    * super-cells instead of scanning all cells. At wProbe = nCoarse
    * the assignment — and therefore the whole dedup output — is
    * bit-identical to [[semanticDedup]] (q92 runs that end of the dial
    * under the full oracle); partial probing keeps the same output
    * SCHEMA and cap machinery while trading boundary-cell exactness
    * for the ~2√nCells FLOP bound (kernel-level properties pinned in
    * SemanticPqSpec). */
  def semanticDedupTwoLevel(
      vecs: DataFrame, id: Column, vec: Column,
      centroidsDf: DataFrame, threshold: Double,
      nCoarse: Int, wProbe: Int, maxCell: Int = 65536,
      scope: graft.CacheScope = new graft.CacheScope,
      sqlExactFit: Boolean = false, fitIters: Int = 10,
      prefit: Option[(Array[Array[Double]], Array[Array[Int]])] = None): DataFrame =
    semanticDedupCore(
      assignedVectors(vecs, id, vec, Nil, centroidsDf, scope,
        assignCol = twoLevelAssignCol(nCoarse, wProbe, sqlExactFit, fitIters,
          prefit)),
      threshold, maxCell)

  /** The fit-then-assign column both two-level dedup variants inject
    * into [[assignedVectors]] — ONE definition so the full and
    * incremental passes cannot drift on coarse-fit parameters.
    * `sqlExactFit` selects [[graft.functions.TwoLevelIndex.fitExact]]
    * (order-free int64 centroid sums, one division per mean) so the
    * whole fit — and with it PARTIAL-probe assignment — is
    * SQL-mirrorable (q94); the default [[graft.functions.TwoLevelIndex
    * .fit]] accepts any centroid table (KMeans output included) at the
    * cost of unmirrorable double accumulation. */
  private def twoLevelAssignCol(
      nCoarse: Int, wProbe: Int, sqlExactFit: Boolean = false,
      fitIters: Int = 10,
      prefit: Option[(Array[Array[Double]], Array[Array[Int]])] = None)
      : Array[Array[Double]] => Column = { m =>
    val (coarse, members) = prefit.getOrElse {
      if (sqlExactFit) graft.functions.TwoLevelIndex.fitExact(m, nCoarse, fitIters)
      else graft.functions.TwoLevelIndex.fit(m, nCoarse, fitIters)
    }
    graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
      col("fd"), coarse, members, m, wProbe)
  }

  /** The per-cell count / capped pair expansion / exact-cosine verify /
    * keep-drop summary shared by [[semanticDedup]] and
    * [[semanticDedupTwoLevel]] — ONE definition, so the flat and
    * two-level variants can only differ in the assignment column. */
  private def semanticDedupCore(
      assigned: DataFrame, threshold: Double, maxCell: Int): DataFrame = {
    val perCell = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
    val pairs = NearDup.cappedBuckets(
        assigned.select(col("cell"), col("vec_id")), Seq("cell"), "vec_id",
        maxCell, "semantic_dedup_cell_cap")
      .select(col("cell"), explode(NearDup.pairsOf(col("ids"))).as("p"))
      .select(col("cell"), col("p.a").as("ida"), col("p.b").as("idb"))
    val dups = pairs
      .join(assigned.select(col("vec_id").as("ida"), col("v").as("va"),
        col("n2").as("n2a")), "ida")
      .join(assigned.select(col("vec_id").as("idb"), col("v").as("vb"),
        col("n2").as("n2b")), "idb")
      .filter(X.cosineFromInts(X.dotInt(col("va"), col("vb")),
        col("n2a"), col("n2b")) >= threshold)
      // pairsOf emits a < b, so b is always the higher id: the dup
      .select(col("cell"), col("idb")).distinct()
      .groupBy(col("cell")).agg(count(lit(1)).as("n_dups"))
    perCell.join(dups, Seq("cell"), "left")
      .select(col("cell").cast("long").as("cell"), col("n_vecs"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (col("n_vecs") - coalesce(col("n_dups"), lit(0L))).as("n_kept"))
  }

  /** Incremental [[semanticDedup]]: per-cell dedup verdicts for a NEW
    * batch (`isNew`) against new ∪ existing — the embedding-level twin
    * of [[NearDup.minhashLshIncremental]]'s contract: a new vector is a
    * duplicate iff SOME lower-id vector (old or new) in its cell has
    * cosine ≥ `threshold`; old∕old pairs were resolved by the previous
    * run and never form.
    *
    * Scale shape: cell assignment is the same map-side kernel for both
    * sides; only cells CONTAINING a new vector participate (the old
    * corpus joins through those cells alone), and pair generation is a
    * join of the new members against their cells' pools — work ∝
    * Σ_cells |new∩cell|·|cell|, not Σ cell². Cells past `maxCell` total
    * members are dropped whole (their new vectors report n_new_dups=0)
    * with the dropped count published as
    * `semantic_dedup_inc_cell_cap.dropped_buckets` — the same
    * degenerate-density guard as the full pass, so the two can never
    * silently disagree on whether the guard fired. In production the
    * old side's (vec_id, cell, v, n2) table persists in the catalog
    * (index-as-data) and is never re-encoded. */
  def semanticDedupIncremental(
      vecs: DataFrame, id: Column, vec: Column, isNew: Column,
      centroidsDf: DataFrame, threshold: Double, maxCell: Int = 65536,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame =
    semanticDedupIncrementalCore(
      assignedVectors(vecs, id, vec, Seq("is_new" -> isNew),
        centroidsDf, scope),
      threshold, maxCell)

  /** [[semanticDedupIncremental]] with the two-level coarse-quantized
    * assignment kernel — the incremental twin of
    * [[semanticDedupTwoLevel]], same dial: wProbe = nCoarse is
    * bit-identical to the flat pass (q93 runs that end under the full
    * oracle); partial probing buys the ~2√nCells FLOP bound at ≳10⁴
    * cells (SCALE.md). Old and new vectors assign through the SAME
    * kernel, so cell membership cannot drift between the sides. */
  def semanticDedupIncrementalTwoLevel(
      vecs: DataFrame, id: Column, vec: Column, isNew: Column,
      centroidsDf: DataFrame, threshold: Double,
      nCoarse: Int, wProbe: Int, maxCell: Int = 65536,
      scope: graft.CacheScope = new graft.CacheScope,
      sqlExactFit: Boolean = false, fitIters: Int = 10,
      prefit: Option[(Array[Array[Double]], Array[Array[Int]])] = None): DataFrame =
    semanticDedupIncrementalCore(
      assignedVectors(vecs, id, vec, Seq("is_new" -> isNew),
        centroidsDf, scope,
        assignCol = twoLevelAssignCol(nCoarse, wProbe, sqlExactFit, fitIters,
          prefit)),
      threshold, maxCell)

  /** The sized-cells / new-vs-pool pair join / exact-cosine verify /
    * per-cell new-batch summary shared by [[semanticDedupIncremental]]
    * and [[semanticDedupIncrementalTwoLevel]] — ONE definition, so the
    * flat and two-level variants can only differ in the assignment
    * column (the [[semanticDedupCore]] discipline). */
  private def semanticDedupIncrementalCore(
      assigned: DataFrame, threshold: Double, maxCell: Int): DataFrame = {
    // size cells FIRST (tiny partial-agg exchange, the cappedBuckets /
    // minhashLshIncremental move): a degenerate hot cell never feeds
    // the quadratic pair join at all
    val sizes = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("_cn"), max(col("is_new")).as("_has_new"))
      .observe("semantic_dedup_inc_cell_cap",
        sum(when(col("_cn") > maxCell, 1L).otherwise(0L)).as("dropped_buckets"))
    val kept = sizes.filter(col("_cn") <= maxCell && col("_has_new"))
      .select(col("cell"))
    val pool = assigned.join(kept, "cell")
      .select(col("cell"), col("vec_id").as("ida"),
        col("v").as("va"), col("n2").as("n2a"))
    val fresh = assigned.filter(col("is_new"))
      .select(col("cell").as("cb"), col("vec_id").as("idb"),
        col("v").as("vb"), col("n2").as("n2b"))
    val dups = pool
      .join(fresh, col("cell") === col("cb") && col("ida") < col("idb"))
      .filter(X.cosineFromInts(X.dotInt(col("va"), col("vb")),
        col("n2a"), col("n2b")) >= threshold)
      .select(col("cell"), col("idb")).distinct()
      .groupBy(col("cell")).agg(count(lit(1)).as("n_new_dups"))
    assigned.filter(col("is_new"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_new"))
      .join(dups, Seq("cell"), "left")
      .select(col("cell").cast("long").as("cell"), col("n_new"),
        coalesce(col("n_new_dups"), lit(0L)).as("n_new_dups"),
        (col("n_new") - coalesce(col("n_new_dups"), lit(0L))).as("n_new_kept"))
  }

  /** Fixed-centroid batch assignment for the STREAMING semantic-dedup
    * sink ([[graft.streaming.EventPipelines
    * .runCatalogSemanticDedupSink]]): (vec_id, v, n2, cell) rows —
    * [[assignedVectors]]'s exact kernel without the scope cache (an
    * epoch's batch is consumed once, then committed as parquet). */
  def assignVectorsOnce(vecs: DataFrame, id: Column, vec: Column,
      centroidsDf: DataFrame): DataFrame = {
    val matrix = centroidMatrix(centroidsDf)
    vecs
      .select(id.as("vec_id"), X.scaledVec(vec).as("v"),
        vec.cast("array<double>").as("fd"))
      .withColumn("n2", X.norm2Int(col("v")))
      .withColumn("cell",
        graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), matrix))
      .drop("fd")
  }

  /** [[semanticDedupIncremental]] over an ALREADY-ASSIGNED frame
    * (vec_id, v, n2, cell, is_new) — the streaming sink's seam: the
    * pool side comes back from committed parquet with its original
    * assignment, only the batch side runs the kernel. */
  def semanticDedupIncrementalAssigned(assigned: DataFrame,
      threshold: Double, maxCell: Int = 65536): DataFrame =
    semanticDedupIncrementalCore(assigned, threshold, maxCell)

  /** Serve ANN top-k from a persisted (cell, centroid) index table.
    * `probe` opts the probe stage into the two-level coarse quantizer
    * ([[CoarseProbe]]) for ≳10⁴-cell indexes. */
  /** Per-query exact top-`k` over a candidate stream with BOUNDED sort
    * partitions — the hot-cell skew policy for the serving paths. The
    * naive shape is one `row_number` window partitioned by qid: every
    * candidate a query's probed cells contain lands in ONE sort
    * partition, so a mega-cell (the semantic analog of the 5k LSH
    * mega-cluster) makes that query's partition ∝ |cell| — unbounded at
    * 100 TB. With `rankSalt` > 1 the rank runs in two exact stages:
    * stage 1 partitions by (qid, hash(nid) % rankSalt) and keeps k per
    * salt — each sort bounded by ~|candidates|/rankSalt — and stage 2
    * ranks the ≤ k·rankSalt survivors per query. Top-k is associative
    * under a TOTAL order (the `order` columns must tie-break to
    * uniqueness, as all callers' (score, nid) do), so the result is
    * bit-identical to the one-stage rank at any salt — ScaleSmokeSpec
    * pins that on a planted 5k mega-cell. Salt 1 (default) keeps the
    * single-window plan the fixture-scale oracles pin. */
  private def topKPerQuery(
      cand: DataFrame, k: Int, order: Seq[Column], rankSalt: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rankSalt >= 1, s"rankSalt must be >= 1, got $rankSalt")
    val full = Window.partitionBy(col("qid")).orderBy(order: _*)
    val pre =
      if (rankSalt == 1) cand
      else {
        val sw = Window.partitionBy(col("qid"), col("_salt")).orderBy(order: _*)
        cand.withColumn("_salt", pmod(xxhash64(col("nid")), lit(rankSalt.toLong)))
          .withColumn("_r", row_number().over(sw))
          .filter(col("_r") <= k)
          .drop("_salt", "_r")
      }
    pre.withColumn("rank", row_number().over(full).cast("long"))
      .filter(col("rank") <= k)
  }

  def ivfTopKServing(
      vecs: DataFrame, id: Column, vec: Column, queryPred: Column,
      centroidsDf: DataFrame, nProbe: Int = 4, k: Int = 3,
      scope: graft.CacheScope = new graft.CacheScope,
      probe: Option[CoarseProbe] = None, rankSalt: Int = 1): DataFrame = {
    val matrix = centroidMatrix(centroidsDf)
    // map-side argmin as a compiled kernel (row index = cell id); ties
    // resolve to the lowest cell index
    val assignExpr =
      graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), matrix)

    val assigned = vecs
      .select(id.as("doc_id"), X.scaledVec(vec).as("v"),
        vec.cast("array<double>").as("fd"), queryPred.as("is_query"))
      .withColumn("n2", X.norm2Int(col("v")))
      .withColumn("cell", assignExpr)
      .transform(scope.cache)

    val probes = probeCells(
      assigned.filter(col("is_query")).select(col("doc_id").as("qid"), col("fd")),
      matrix, nProbe, probe)

    val queries = assigned.filter(col("is_query"))
      .select(col("doc_id").as("qid"), col("v").as("va"), col("n2").as("n2a"))
    val cand = probes
      .join(assigned.select(col("doc_id").as("nid"), col("v").as("vb"),
        col("n2").as("n2b"), col("cell")), "cell")
      .join(queries, "qid")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), X.cosineFromInts(
        X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")).as("cos"))
    topKPerQuery(cand, k, Seq(col("cos").desc, col("nid")), rankSalt)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  /** IVF-PQ ANN top-k: the full compressed-index serving path — probe
    * the `nProbe` nearest cells per query (nCells-row broadcast, as in
    * [[ivfTopKServing]]), then score ONLY the probed cells' candidates
    * by PQ asymmetric distance: each query precomputes its M×K
    * e9-integer lookup table once (compiled PqLut) and every candidate
    * costs M integer reads on its packed code (PqAdc) — no float math
    * per candidate, and the corpus participates through (cell, 32-bit
    * code) only: 64× smaller than the raw vectors, never shuffled as
    * floats. Returns (qid, rank, nid, dist_e9), ADC-ranked; the
    * production composition that re-ranks the top-k′ survivors with
    * exact distance is [[ivfPqRerankTopK]] (q91) — kept separate here
    * so each stage stays independently oracle-checkable (q81 / q87).
    * Both index tables (centroids, codes) are catalog-persistable
    * index-as-data, like the q82 signature table. */
  def ivfPqTopK(
      vecs: DataFrame, id: Column, vec: Column, queryPred: Column,
      centroidsDf: DataFrame, codebooks: Array[Array[Array[Double]]],
      nProbe: Int = 4, k: Int = 3,
      scope: graft.CacheScope = new graft.CacheScope,
      probe: Option[CoarseProbe] = None, rankSalt: Int = 1): DataFrame = {
    val matrix = centroidMatrix(centroidsDf)
    require(codebooks.nonEmpty && codebooks(0).nonEmpty,
      "ivfPqTopK: empty PQ codebook — the index has no subspaces/codes")
    val m = codebooks.length
    val kk = codebooks(0).length
    val assigned = vecs
      .select(id.as("nid"), vec.cast("array<double>").as("fd"),
        queryPred.as("is_query"))
      .withColumn("cell",
        graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), matrix))
      .withColumn("code", element_at(
        graft.functions.VectorIndexFunctions.pqEncode(col("fd"), codebooks), 1))
      .transform(scope.cache)
    val probes = probeCells(
      assigned.filter(col("is_query")).select(col("nid").as("qid"), col("fd")),
      matrix, nProbe, probe)
    val luts = assigned.filter(col("is_query"))
      .select(col("nid").as("qid"),
        graft.functions.VectorIndexFunctions.pqLut(col("fd"), codebooks).as("lut"))
    val cand = probes
      .join(assigned.select(col("nid"), col("code"), col("cell")), "cell")
      .join(luts, "qid")
      .filter(col("qid") =!= col("nid"))
      .withColumn("dist_e9",
        graft.functions.VectorIndexFunctions.pqAdc(col("lut"), col("code"), m, kk))
    topKPerQuery(cand, k, Seq(col("dist_e9"), col("nid")), rankSalt)
      .select(col("qid"), col("rank"), col("nid"), col("dist_e9"))
  }

  /** The production IVF-PQ serving composition: ADC-rank the probed
    * cells' candidates on their 32-bit codes ([[ivfPqTopK]]) down to a
    * `shortlist` of k′ > k per query, then re-rank ONLY those k′
    * survivors with the exact integer-scaled cosine and keep the top
    * `k` — the standard two-stage trade (Jégou et al. §V): the corpus
    * is scanned compressed (no float math per candidate), and exact
    * distances are paid for k′ rows per query, not per candidate. The
    * exact stage joins the scaled vectors back BY ID for shortlist rows
    * only, so its shuffle is ∝ queries·k′ regardless of corpus size.
    * Returns (qid, rank, nid, cos) — the [[ivfTopKServing]] shape, so
    * a caller can swap precision for cost without changing schema. */
  def ivfPqRerankTopK(
      vecs: DataFrame, id: Column, vec: Column, queryPred: Column,
      centroidsDf: DataFrame, codebooks: Array[Array[Array[Double]]],
      nProbe: Int = 4, shortlist: Int = 10, k: Int = 3,
      scope: graft.CacheScope = new graft.CacheScope,
      probe: Option[CoarseProbe] = None, rankSalt: Int = 1): DataFrame = {
    require(shortlist >= k,
      s"ivfPqRerankTopK: shortlist $shortlist must be >= k $k")
    // the salt matters in the ADC stage (whose candidate stream is
    // probed-cell-sized); the exact stage below ranks ≤ shortlist rows
    // per query, already bounded, so a one-stage window suffices there
    val sl = ivfPqTopK(vecs, id, vec, queryPred, centroidsDf, codebooks,
        nProbe, shortlist, scope, probe, rankSalt)
      .select(col("qid"), col("nid"))
    val base = vecs
      .select(id.as("_id"), X.scaledVec(vec).as("v"))
      .withColumn("n2", X.norm2Int(col("v")))
    val cand = sl.join(base.select(col("_id").as("qid"), col("v").as("va"),
        col("n2").as("n2a")), "qid")
      .join(base.select(col("_id").as("nid"), col("v").as("vb"),
        col("n2").as("n2b")), "nid")
      .select(col("qid"), col("nid"), X.cosineFromInts(
        X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")).as("cos"))
    topKPerQuery(cand, k, Seq(col("cos").desc, col("nid")), rankSalt = 1)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  /** LSH-bucketed cosine near-neighbor pairs over a float-vector
    * column: multi-band sign-bit hyperplane buckets → in-bucket pair
    * expansion → exact integer-scaled cosine ≥ `threshold`.
    *
    * Work ∝ Σ bucket² per band; the full vectors only join back for
    * verified candidates. More bands = recall, more bits = precision. */
  def cosineLsh(
      vecs: DataFrame, id: Column, vec: Column,
      bands: Int = 4, bitsPerBand: Int = 4,
      threshold: Double = 0.4, maxBucket: Int = 1024,
      scope: graft.CacheScope = new graft.CacheScope): DataFrame = {
    val base = vecs
      .select(id.as("doc_id"), X.scaledVec(vec).as("v"))
      .withColumn("n2", X.norm2Int(col("v")))
      .transform(scope.cache)
    val banded = base.select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> struct(b AS band, " +
          s"aggregate(sequence(1, $bitsPerBand), 0L, (acc, i) -> acc + " +
          s"IF(element_at(v, b*$bitsPerBand + i) >= 0, shiftleft(1L, i-1), 0L)) AS bits))"))
        .as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bits").as("bits"))
    val cand = NearDup.cappedBuckets(banded, Seq("band", "bits"), "doc_id",
        maxBucket, "cosine_lsh_bucket_cap")
      .select(explode(NearDup.pairsOf(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("v").as("va"), col("n2").as("n2a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("v").as("vb"), col("n2").as("n2b")), "doc_b")
      .withColumn("cos", X.cosineFromInts(
        X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")))
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("cos"))
  }
}
