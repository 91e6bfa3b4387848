package graft.ext

import graft.SparkSpec
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._

class SimilarityIvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val ivf = graft.operators.SimilarityJoin.ivfTopK(
      graft.Tables.embeddings(spark, dir), col("vec_id"), col("embedding"),
      queryPred = col("vec_id") < 50, nCells = 16, nProbe = 4, k = 3)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  private lazy val brute: Map[(Long, Long), Double] = {
    val base = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), X.scaledVec(col("embedding")).as("v"))
      .withColumn("n2", X.norm2Int(col("v")))
    val q = base.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("va"), col("n2").as("n2a"))
    val c = base.select(col("vec_id").as("nid"), col("v").as("vb"), col("n2").as("n2b"))
    q.crossJoin(c).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), X.cosineFromInts(
        X.dotInt(col("va"), col("vb")), col("n2a"), col("n2b")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("each query gets exactly k monotone-ranked neighbors with exact cosines") {
    val byQ = ivf.groupBy(_._1)
    assert(byQ.size == 50)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L))
      // ranks ordered by descending cosine
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted(Ordering[Double].reverse).toSeq)
      // cosines are EXACT: identical to the brute-force scores
      sorted.foreach { case (q, _, n, cos) => assert(brute((q, n)) == cos) }
    }
  }

  test("index round-trips through the versioned catalog; serving is fit-free") {
    val vecs = graft.Tables.embeddings(spark, dir)
    val centroids = graft.operators.SimilarityJoin.ivfBuildIndex(
      vecs, col("embedding"), nCells = 16)
    val dirTmp = java.nio.file.Files.createTempDirectory("graft-ivf-").toString
    val cat = new graft.catalog.VersionedCatalog(spark, dirTmp, format = "parquet")
    cat.writeNext("ivf_index", centroids)
    val reloaded = cat.latest("ivf_index")
    val served = graft.operators.SimilarityJoin.ivfTopKServing(
        vecs, col("vec_id"), col("embedding"),
        queryPred = col("vec_id") < 50, reloaded, nProbe = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(served.sortBy(r => (r._1, r._2)).toSeq ==
      ivf.sortBy(r => (r._1, r._2)).toSeq) // identical to the build+serve path
    spark.catalog.clearCache()
  }

  test("append without refit: only new rows assign; old rows survive verbatim") {
    val vecs = graft.Tables.embeddings(spark, dir)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val dirTmp = java.nio.file.Files.createTempDirectory("graft-append-").toString
    val cat = new graft.catalog.VersionedCatalog(spark, dirTmp, format = "parquet")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // fit-time corpus: even ids, assigned + persisted as v1
    val fitSide = graft.operators.SimilarityJoin.ivfAssignTable(
      vecs.filter(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"), cents)
    cat.writeNext("asg", fitSide.select(col("vec_id").cast("long"), col("cell")))
    val v1 = toMap(cat.latest("asg"))

    // append the odd batch — returns (version, rows appended)
    val newBatch = vecs.filter(col("vec_id") % 2 === 1)
    val (v, n) = graft.operators.SimilarityJoin.ivfAppendAssign(
      cat, "asg", newBatch, col("vec_id"), col("embedding"), cents)
    assert(v == 2 && n == newBatch.count())

    // appended version ≡ from-scratch assignment over the union, and
    // the old half of it is v1 verbatim
    val v2 = toMap(cat.latest("asg"))
    val scratch = toMap(graft.operators.SimilarityJoin.ivfAssignTable(
      vecs, col("vec_id"), col("embedding"), cents))
    assert(v2 == scratch)
    assert(v1.forall { case (id, c) => v2(id) == c })

    // NO-RESCAN proof: append a second batch under a DIFFERENT centroid
    // table — if append re-assigned old rows, their cells would move to
    // the new table's argmin; instead every v2 assignment survives
    // byte-for-byte and only the appended ids follow the new centroids
    val cents16 = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 16)
    // re-use ids ≥ 10⁶ so the second batch is disjoint from the corpus
    val batch2 = vecs.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val (v3, n2) = graft.operators.SimilarityJoin.ivfAppendAssign(
      cat, "asg", batch2, col("vec_id"), col("embedding"), cents16)
    assert(v3 == 3 && n2 == 20L)
    val v3m = toMap(cat.latest("asg"))
    assert(v2.forall { case (id, c) => v3m(id) == c },
      "append re-assigned pre-existing rows")
    val expect2 = toMap(graft.operators.SimilarityJoin.ivfAssignTable(
      batch2, col("vec_id"), col("embedding"), cents16))
    assert(expect2.forall { case (id, c) => v3m(id) == c })

    // occupancy report: drift arithmetic + refit flags
    val fitCounts = cat.read("asg", 1).groupBy(col("cell"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_fit"))
    val rep = graft.operators.SimilarityJoin.indexOccupancyReport(
        cat.latest("asg"), fitCounts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rep.map(_._3).sum == v3m.size.toLong) // totals cover the table
    rep.foreach { case (_, nFit, nTotal, nNew, growth, refit) =>
      assert(nNew == nTotal - nFit)
      assert(growth == nTotal * 100L / math.max(nFit, 1L))
      assert(refit == (growth >= 150L || nFit == 0L))
    }
    // the fixture's parity split roughly doubles every cell: the flag
    // fires somewhere (a planted guarantee that the trigger can fire)
    assert(rep.exists(_._6))
    spark.catalog.clearCache()
  }

  test("refit-if-stale: fresh index declines cheaply, doubled index refits to the new fit") {
    val vecs = graft.Tables.embeddings(spark, dir)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val dirTmp = java.nio.file.Files.createTempDirectory("graft-refit-").toString
    val cat = new graft.catalog.VersionedCatalog(spark, dirTmp, format = "parquet")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val fitSide = graft.operators.SimilarityJoin.ivfAssignTable(
      vecs.filter(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"), cents)
    cat.writeNext("asg", fitSide.select(col("vec_id").cast("long"), col("cell")))
    val fitCounts = cat.latest("asg").groupBy(col("cell"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_fit"))
      .cache()
    fitCounts.count()

    // fresh index: nothing flagged, no refit, no corpus fit ran
    var fitRan = false
    val (fired0, share0, v0) = graft.operators.SimilarityJoin.ivfRefitIfStale(
      cat, "asg", vecs, col("vec_id"), col("embedding"), fitCounts,
      fit = { df => fitRan = true; cents })
    assert(!fired0 && share0 == 0L && v0.isEmpty && !fitRan)
    assert(cat.latestVersion("asg").contains(1))

    // append the odd half: every cell roughly doubles past the 1.5x
    // factor, the flagged share crosses the threshold, refit fires —
    // under a DIFFERENT centroid table so the recommit is observable
    graft.operators.SimilarityJoin.ivfAppendAssign(
      cat, "asg", vecs.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), cents)
    val cents16 = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 16)
    val (fired1, share1, v1) = graft.operators.SimilarityJoin.ivfRefitIfStale(
      cat, "asg", vecs, col("vec_id"), col("embedding"), fitCounts,
      fit = _ => cents16)
    assert(fired1 && share1 >= 20L && v1.contains(3))
    // the committed refit IS the from-scratch assignment under the new fit
    assert(toMap(cat.latest("asg")) == toMap(
      graft.operators.SimilarityJoin.ivfAssignTable(
        vecs, col("vec_id"), col("embedding"), cents16)))
    fitCounts.unpersist()
    spark.catalog.clearCache()
  }

  test("ivfBuildIndexExact: deterministic, partitioning, exact integer state") {
    val vecs = graft.Tables.embeddings(spark, dir)
    val a = graft.operators.SimilarityJoin.ivfBuildIndexExact(
        vecs, col("vec_id"), col("embedding"), nCells = 8, iters = 3)
      .collect().map(_.toSeq)
    spark.catalog.clearCache()
    val b = graft.operators.SimilarityJoin.ivfBuildIndexExact(
        vecs, col("vec_id"), col("embedding"), nCells = 8, iters = 3)
      .collect().map(_.toSeq)
    spark.catalog.clearCache()
    // bit-exact rerun: distributed int64 sums are order-free
    assert(a.nonEmpty && a.sortBy(_.toString).toSeq == b.sortBy(_.toString).toSeq)
    val rows = a.map(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long],
      s(2).asInstanceOf[Long], s(3).asInstanceOf[Long],
      s(4).asInstanceOf[Double], s(5).asInstanceOf[Long]))
    // full 8×64 state; mean is EXACTLY the one division of its ints
    assert(rows.length == 8 * 64)
    rows.foreach { case (_, _, sumE7, cnt, mean, _) =>
      assert(cnt > 0 && mean == sumE7.toDouble / (cnt * 10000000L).toDouble)
    }
    // final occupancy covers the whole corpus exactly once
    val n = vecs.count()
    assert(rows.groupBy(_._1).values.map(_.head._6).sum == n)
    // seeding needs every residue class inhabited
    intercept[IllegalArgumentException] {
      graft.operators.SimilarityJoin.ivfBuildIndexExact(
        vecs.filter(col("vec_id") < 3), col("vec_id"), col("embedding"),
        nCells = 8, iters = 1).collect()
    }
    spark.catalog.clearCache()
  }

  test("CacheScope.release drops serving-path intermediates; dimension guards fail fast") {
    val vecs = graft.Tables.embeddings(spark, dir)
    val centroids = graft.operators.SimilarityJoin.ivfBuildIndex(
      vecs, col("embedding"), nCells = 4)
    spark.catalog.clearCache()
    val scope = new graft.CacheScope
    graft.operators.SimilarityJoin.ivfTopKServing(
        vecs, col("vec_id"), col("embedding"),
        queryPred = col("vec_id") < 10, centroids, nProbe = 2, k = 2,
        scope = scope)
      .count() // final action: the scoped `assigned` frame is now cached
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    scope.release()
    // unpersist is async; the catalog view clears synchronously
    assert(spark.sharedState.cacheManager.isEmpty)

    // dimension-mismatch and empty-matrix guards (was: silent truncation)
    intercept[IllegalArgumentException] {
      graft.functions.VectorIndex.nearestCell(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 2.0)),
        Array(Array(1.0, 2.0, 3.0)))
    }
    intercept[IllegalArgumentException] {
      graft.functions.VectorIndex.nearestCell(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 2.0)),
        Array.empty[Array[Double]])
    }
  }

  test("signed projection: exact kernel, deterministic signs, JL norm preservation") {
    import graft.functions.{SignedProject, VectorFunctions}
    // hand example: v=(1,2), signs rows per input dim
    val out = SignedProject.project(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1L, 2L)),
      Array(Array(1L, -1L), Array(1L, 1L)))
    assert(out.toLongArray().toSeq == Seq(3L, 1L))
    // deterministic md5-derived signs, all ±1
    val s1 = VectorFunctions.rpSigns(8, 4)
    val s2 = VectorFunctions.rpSigns(8, 4)
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
    assert(s1.flatten.forall(v => v == 1L || v == -1L))
    // dimension mismatch fails fast
    intercept[IllegalArgumentException] {
      SignedProject.project(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1L)),
        Array(Array(1L), Array(1L)))
    }
    // squared-norm guard: a projection whose Σ out[j]² overflows int64
    // would let the q76 consumer dot_int64(proj, proj) wrap — fail fast
    // instead. 16 coordinates at 1e9 → Σ = 1.6e19 > 2^63.
    val k16row = Array(Array.fill(16)(1L))
    intercept[ArithmeticException] {
      SignedProject.project(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1000000000L)),
        k16row)
    }
    val bound16 = (math.sqrt(Long.MaxValue.toDouble / 16) - 1).toLong // ≈ 7.59e8
    // at the envelope bound the fast path passes and the squared norm is
    // exactly representable
    val atBound = SignedProject.project(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(bound16)),
      k16row).toLongArray()
    assert(atBound.forall(_ == bound16))
    assert(atBound.map(x => x * x).sum > 0) // 16·bound² < 2^63: no wrap
    // the guard is EXACT, not envelope-conservative: out = (2.5e9, 0)
    // violates the per-coordinate envelope for k=2 (√(2^63/2) ≈ 2.1e9)
    // but its true squared norm 6.25e18 fits int64 → accepted
    val skew = SignedProject.project(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1250000000L, 1250000000L)),
      Array(Array(1L, 1L), Array(1L, -1L))).toLongArray()
    assert(skew.toSeq == Seq(2500000000L, 0L))
    // and the same shape past the exact bound still throws:
    // (3.1e9)² = 9.61e18 > 2^63
    intercept[ArithmeticException] {
      SignedProject.project(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(1550000000L, 1550000000L)),
        Array(Array(1L, 1L), Array(1L, -1L)))
    }
    // JL expectation: E[||p||^2] = k·||v||^2 — corpus-average ratio near k
    val signs = VectorFunctions.rpSigns(64, 16)
    val ratio = graft.Tables.embeddings(spark, dir)
      .select(X.scaledVec(col("embedding")).as("v"))
      .withColumn("p", VectorFunctions.signedProject(col("v"), signs))
      .select((X.dotInt(col("p"), col("p")).cast("double") /
        X.dotInt(col("v"), col("v")).cast("double")).as("r"))
      .agg(avg(col("r"))).head().getDouble(0)
    assert(ratio > 16.0 * 0.7 && ratio < 16.0 * 1.3, s"avg ratio $ratio")
  }

  test("sign-LSH signatures: pack correctness, tag independence, kernel == project-then-pack") {
    import graft.functions.{SignLshSignatures, VectorFunctions}
    import org.apache.spark.sql.catalyst.util.ArrayData
    // hand example: v=(1,2) against 2 tables × 2 bits (4 projected dims)
    // proj = (1·1+2·1, 1·(−1)+2·1, 1·1+2·(−1), 1·(−1)+2·(−1))
    //      = (3, 1, −1, −3) → table 0 bits (≥0,≥0) = 3, table 1 = 0
    val sigs = SignLshSignatures.signatures(
      ArrayData.toArrayData(Array(1L, 2L)),
      Array(Array(1L, -1L, 1L, -1L), Array(1L, 1L, -1L, -1L)), bits = 2)
    assert(sigs.toLongArray().toSeq == Seq(3L, 0L))
    // a zero projection packs as a SET bit (>= 0) — boundary pinned
    val zero = SignLshSignatures.signatures(
      ArrayData.toArrayData(Array(0L)), Array(Array(1L)), bits = 1)
    assert(zero.toLongArray().toSeq == Seq(1L))
    // tagged sign universes are deterministic and mutually independent
    val m1 = VectorFunctions.rpSignsTagged("mlsh", 8, 8)
    val m2 = VectorFunctions.rpSignsTagged("mlsh", 8, 8)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(v => v == 1L || v == -1L))
    assert(m1.map(_.toSeq).toSeq !=
      VectorFunctions.rpSigns(8, 8).map(_.toSeq).toSeq)
    // dims that don't split into tables fail fast
    intercept[IllegalArgumentException] {
      SignLshSignatures.signatures(
        ArrayData.toArrayData(Array(1L)), Array(Array(1L, 1L, 1L)), bits = 2)
    }
    // on the fixture corpus the kernel equals SignedProject + a packing
    // expression over the same signs (one pass vs the two-stage chain)
    val signs = VectorFunctions.rpSignsTagged("mlsh", 64, 112)
    val packed = graft.Tables.embeddings(spark, dir)
      .select(X.scaledVec(col("embedding")).as("v"))
      .withColumn("one", VectorFunctions.signLshSigs(col("v"), signs, 7))
      .withColumn("proj", VectorFunctions.signedProject(col("v"), signs))
      .withColumn("two", expr("transform(sequence(0, 15), t -> " +
        "aggregate(sequence(0, 6), 0L, (acc, j) -> " +
        "acc + IF(element_at(proj, t*7 + j + 1) >= 0, shiftleft(1L, j), 0L)))"))
    assert(packed.filter(col("one") =!= col("two")).count() == 0)
  }

  test("recall@3 vs brute force is substantial even on near-orthogonal vectors") {
    val bruteTop = brute.toSeq.groupBy(_._1._1).map { case (q, entries) =>
      q -> entries.sortBy { case ((_, n), cos) => (-cos, n) }.take(3)
        .map(_._1._2).toSet
    }
    val hits = ivf.groupBy(_._1).map { case (q, rows) =>
      rows.map(_._3).count(bruteTop(q))
    }.sum
    val recall = hits.toDouble / (50 * 3)
    info(f"IVF recall@3 = $recall%.2f")
    assert(recall >= 0.25) // probing 4/16 cells of clusterless vectors
  }
}
