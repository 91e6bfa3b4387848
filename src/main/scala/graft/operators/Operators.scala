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
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts.toLong)))
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

  /** MinHash+LSH near-duplicate pairs over a text column: tokenize →
    * distinct word n-gram shingles → k-wide MinHash signature (compiled
    * kernels) → `bands` LSH bands → bucket-grouped candidate pairs →
    * exact Jaccard verify ≥ `threshold`.
    *
    * Only (band, band-signature, id) tuples shuffle for candidate
    * generation — k ints per doc, not shingles. The signature table is
    * persisted because banding and verification share it; at cluster
    * scale that materialization is the standard signature checkpoint. */
  def minhashLsh(
      docs: DataFrame, id: Column, text: Column,
      numHashes: Int = 12, bands: Int = 3, shingleWidth: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val rows = bands match {
      case b if numHashes % b == 0 => numHashes / b
      case _ => throw new IllegalArgumentException(
        s"bands ($bands) must divide numHashes ($numHashes)")
    }
    val base = docs
      .select(id.as("doc_id"), X.tokens(text).as("tk"))
      .filter(size(col("tk")) >= shingleWidth)
      .select(col("doc_id"),
        array_distinct(X.shingles(col("tk"), shingleWidth)).as("sh"))
      .withColumn("sig", HashFunctions.minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"), col("sh"), col("sig"))
      .persist()
    val banded = base.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            concat_ws("-", slice(col("sig"), b * rows + 1, lit(rows))).as("bsig"))))
          .as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bsig").as("bsig"))
    val cand = banded
      .groupBy(col("band"), col("bsig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
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
}

object SimilarityJoin {

  /** IVF (inverted-file) ANN top-k: a KMeans index partitions the
    * corpus into `nCells` cells; each query scores only the `nProbe`
    * cells whose centroids are nearest, then exact integer-scaled
    * cosine re-ranks the candidates. The scale path when LSH recall is
    * poor (e.g. near-orthogonal embeddings): cell assignment is one
    * MLlib fit + one transform, probing is a broadcast of nCells
    * centroids, and the candidate join shuffles only cell ids.
    *
    * Not oracle-expressible (KMeans lives in Spark only) — semantics
    * are covered by SimilarityIvfSpec: exact scores, per-query rank
    * monotonicity, and recall vs the brute-force baseline. */
  def ivfTopK(
      vecs: DataFrame, id: Column, vec: Column,
      queryPred: Column, nCells: Int = 16, nProbe: Int = 4,
      k: Int = 3, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.vector_to_array
    import org.apache.spark.sql.expressions.Window

    val base = vecs
      .select(id.as("doc_id"), X.scaledVec(vec).as("v"),
        org.apache.spark.ml.functions.array_to_vector(
          vec.cast("array<double>")).as("features"),
        queryPred.as("is_query"))
      .withColumn("n2", X.norm2Int(col("v")))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .setMaxIter(8) // index build: cell quality plateaus early, recall
                     // comes from nProbe — don't pay 20 default iters
      .fit(base.select(col("features")))
    val assigned = model.transform(base)
      .select(col("doc_id"), col("v"), col("n2"), col("is_query"),
        vector_to_array(col("features")).as("fd"),
        col("prediction").as("cell"))
      .persist()

    // nCells centroids → a literal probe table: for each query, the
    // nProbe cells with the nearest centroid (squared L2 on doubles).
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }.toSeq
    val spark = vecs.sparkSession
    import spark.implicits._
    val centDf = centroids.toDF("cell_probe", "centroid")
    val probeW = Window.partitionBy(col("doc_id")).orderBy(col("dist"), col("cell_probe"))
    val probes = assigned.filter(col("is_query"))
      .select(col("doc_id"), col("fd"))
      .crossJoin(broadcast(centDf))
      .withColumn("dist", aggregate(
        zip_with(col("fd"), col("centroid"), (a, b) => (a - b) * (a - b)),
        lit(0.0d), (acc, d) => acc + d))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("doc_id").as("qid"), col("cell_probe").as("cell"))

    val queries = assigned.filter(col("is_query"))
      .select(col("doc_id").as("qid"), col("v").as("va"), col("n2").as("n2a"))
    val rankW = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    probes
      .join(assigned.select(col("doc_id").as("nid"), col("v").as("vb"),
        col("n2").as("n2b"), col("cell")), "cell")
      .join(queries, "qid")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), X.cosineFromInts(
        X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")).as("cos"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
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
      threshold: Double = 0.4): DataFrame = {
    val base = vecs
      .select(id.as("doc_id"), X.scaledVec(vec).as("v"))
      .withColumn("n2", X.norm2Int(col("v")))
      .persist()
    val banded = base.select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> struct(b AS band, " +
          s"aggregate(sequence(1, $bitsPerBand), 0L, (acc, i) -> acc + " +
          s"IF(element_at(v, b*$bitsPerBand + i) >= 0, shiftleft(1L, i-1), 0L)) AS bits))"))
        .as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bits").as("bits"))
    val cand = banded
      .groupBy(col("band"), col("bits"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
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
