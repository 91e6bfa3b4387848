package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._

/** Semantic dedup (q84) and product-quantization encoding (q85):
  * kernel-level arithmetic plus operator semantics on hand-built
  * fixtures where the expected answer is computable by inspection. */
class SemanticPqSpec extends SparkSpec {

  // ---------------------------------------------------------------- PQ

  test("pq_encode: hand example — per-subspace argmin, packing, e9 error") {
    // 2 subspaces × 2 dims, 2 codes each. Subspace 0: v=(1,0) vs codes
    // (0,0) d=1 and (1,0) d=0 → code 1, err 0. Subspace 1: v=(3,4) vs
    // (3,3) d=1 and (5,4) d=4 → code 0, err 1e9.
    val books = Array(
      Array(Array(0.0, 0.0), Array(1.0, 0.0)),
      Array(Array(3.0, 3.0), Array(5.0, 4.0)))
    val out = graft.functions.PqEncode.encode(
      ArrayData.toArrayData(Array(1.0, 0.0, 3.0, 4.0)), books).toLongArray()
    assert(out(0) == (1L | (0L << 4)), s"packed code ${out(0)}")
    assert(out(1) == 1000000000L, s"err_e9 ${out(1)}")
  }

  test("pq_encode: ties take the lowest code; malformed inputs fail fast") {
    // both codes at distance 2 → lowest code wins
    val tie = graft.functions.PqEncode.encode(
      ArrayData.toArrayData(Array(0.0, 0.0)),
      Array(Array(Array(1.0, 1.0), Array(-1.0, -1.0)))).toLongArray()
    assert(tie(0) == 0L)
    intercept[IllegalArgumentException] { // dim mismatch
      graft.functions.PqEncode.encode(
        ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
        Array(Array(Array(0.0, 0.0))))
    }
    intercept[IllegalArgumentException] { // >16 codes break 4-bit packing
      graft.functions.PqEncode.encode(
        ArrayData.toArrayData(Array(1.0)),
        Array(Array.fill(17)(Array(0.0))))
    }
    intercept[IllegalArgumentException] { // >15 subspaces overflow int64
      graft.functions.PqEncode.encode(
        ArrayData.toArrayData(Array.fill(16)(0.0)),
        Array.fill(16)(Array(Array(0.0))))
    }
    intercept[IllegalArgumentException] { // ragged centroid dims
      graft.functions.PqEncode.encode(
        ArrayData.toArrayData(Array(1.0, 2.0)),
        Array(Array(Array(0.0, 0.0), Array(0.0))))
    }
    intercept[IllegalArgumentException] { // empty sub-codebook
      graft.functions.PqEncode.encode(
        ArrayData.toArrayData(Array(1.0)),
        Array(Array.empty[Array[Double]]))
    }
    intercept[IllegalArgumentException] { // ragged CODE counts fail at
      // encode time, not later at ADC serving via the nibble check
      graft.functions.PqEncode.encode(
        ArrayData.toArrayData(Array(1.0, 2.0)),
        Array(Array(Array(0.0), Array(1.0)), Array(Array(0.0))))
    }
    intercept[IllegalArgumentException] { // empty sub-codebook in lut too
      graft.functions.PqLut.build(
        ArrayData.toArrayData(Array(1.0)),
        Array(Array.empty[Array[Double]]))
    }
    // NaN input: every distance compare is false — must fail fast, not
    // pack a corrupted -1 code
    intercept[ArithmeticException] {
      graft.functions.PqEncode.encode(
        ArrayData.toArrayData(Array(Double.NaN, 0.0)),
        Array(Array(Array(0.0, 0.0), Array(1.0, 0.0))))
    }
    // adc: a code nibble past k reads another subspace's entries — throws
    val lut2 = graft.functions.PqLut.build(
      ArrayData.toArrayData(Array(0.0, 0.0)),
      Array(Array(Array(0.0), Array(1.0)), Array(Array(0.0), Array(1.0))))
    intercept[IllegalArgumentException] {
      graft.functions.PqLut.adc(lut2, 0x31L, 2, 2) // nibble 3 >= k=2
    }
  }

  test("pq codebooks are deterministic and codes reconstruct near the input") {
    val b1 = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
    val b2 = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
    assert(b1.flatten.flatten.toSeq == b2.flatten.flatten.toSeq)
    assert(b1.flatten.flatten.forall(v => v >= -0.2 && v <= 0.2))
    // on the fixture corpus: the packed code is decodable back to the
    // per-subspace argmin and err_e9 equals the recomputed distance sum
    val rows = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("fd"))
      .limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    rows.foreach { case (_, fd) =>
      val out = graft.functions.PqEncode.encode(
        ArrayData.toArrayData(fd), b1).toLongArray()
      var expectErr = 0L
      (0 until 8).foreach { m =>
        val sub = fd.slice(m * 8, m * 8 + 8)
        val dists = b1(m).map(c =>
          sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
        val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(((out(0) >> (4 * m)) & 15L) == best.toLong, s"subspace $m code")
        expectErr += math.floor(dists(best) * 1e9).toLong
      }
      assert(out(1) == expectErr)
    }
  }

  test("pq_lut/pq_adc: ADC distance equals encode-time error on the own code") {
    val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("fd"))
      .limit(20).collect().map(_.getSeq[Double](0).toArray)
      .foreach { fd =>
        val enc = graft.functions.PqEncode.encode(
          ArrayData.toArrayData(fd), books).toLongArray()
        val lut = graft.functions.PqLut.build(
          ArrayData.toArrayData(fd), books)
        // the LUT row minimum IS the chosen code's entry, so scoring a
        // vector against its OWN code reproduces the encode-time err_e9
        assert(graft.functions.PqLut.adc(lut, enc(0), 8, 16) == enc(1))
        // and every other code scores no lower per subspace
        val l = lut.toLongArray()
        (0 until 8).foreach { m =>
          val chosen = ((enc(0) >> (4 * m)) & 15L).toInt
          assert(l.slice(m * 16, m * 16 + 16).min == l(m * 16 + chosen))
        }
      }
  }

  test("pq_lut: dimension mismatch fails fast; hand ADC example") {
    intercept[IllegalArgumentException] {
      graft.functions.PqLut.build(ArrayData.toArrayData(Array(1.0)),
        Array(Array(Array(0.0, 0.0))))
    }
    // 2 subspaces × 2 codes: lut = [e9-floored dists]; code 0b0001_0001
    // would be invalid (2 codes) — use code with nibbles (1, 0)
    val books = Array(
      Array(Array(0.0), Array(1.0)),
      Array(Array(2.0), Array(3.0)))
    val lut = graft.functions.PqLut.build(
      ArrayData.toArrayData(Array(0.5, 2.0)), books)
    // subspace 0: (0.5-0)²=0.25, (0.5-1)²=0.25 → [25e7, 25e7]
    // subspace 1: (2-2)²=0, (2-3)²=1 → [0, 1e9]
    assert(lut.toLongArray().toSeq ==
      Seq(250000000L, 250000000L, 0L, 1000000000L))
    // code nibbles (m0=1, m1=1) → 0x11 = 17: 25e7 + 1e9
    assert(graft.functions.PqLut.adc(lut, 17L, 2, 2) == 1250000000L)
  }

  test("ivfPqTopK: distances agree with a flat ADC scan; ranks are consistent") {
    val spark2 = spark
    import spark2.implicits._
    val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark)
    val res = graft.operators.SimilarityJoin.ivfPqTopK(
        graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
        col("vec_id"), col("embedding"),
        queryPred = col("vec_id") < 50, cents, books, nProbe = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(res.map(_._1).distinct.length == 50)
    // recompute every returned ADC distance with the kernels directly
    val all = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("fd"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val luts = all.view.filterKeys(_ < 50).mapValues(fd =>
      graft.functions.PqLut.build(ArrayData.toArrayData(fd), books)).toMap
    val codes = all.view.mapValues(fd =>
      graft.functions.PqEncode.encode(
        ArrayData.toArrayData(fd), books).toLongArray()(0)).toMap
    res.foreach { case (qid, _, nid, dist) =>
      assert(dist == graft.functions.PqLut.adc(luts(qid), codes(nid), 8, 16),
        s"ADC mismatch for ($qid, $nid)")
    }
    // per query: ranks 1..3, distances ascending with nid tiebreak
    res.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.map(r => (r._4, r._3)).toSeq ==
        sorted.map(r => (r._4, r._3)).sortBy(identity).toSeq)
    }
  }

  test("ivfPqRerankTopK: top-k is exactly the ADC shortlist re-ordered by exact cosine") {
    val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val shortlist = graft.operators.SimilarityJoin.ivfPqTopK(
        emb, col("vec_id"), col("embedding"),
        queryPred = col("vec_id") < 50, cents, books, nProbe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    spark.catalog.clearCache()
    val rr = graft.operators.SimilarityJoin.ivfPqRerankTopK(
        emb, col("vec_id"), col("embedding"),
        queryPred = col("vec_id") < 50, cents, books,
        nProbe = 4, shortlist = 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    // exact integer-scaled cosine, mirrored independently
    val scaled = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray.map(x => math.floor(x * 1e7).toLong)).toMap
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (scaled(a), scaled(b))
      va.zip(vb).map { case (x, y) => x * y }.sum.toDouble /
        (math.sqrt(va.map(x => x * x).sum.toDouble) *
          math.sqrt(vb.map(x => x * x).sum.toDouble))
    }
    val byQ = shortlist.groupBy(_._1)
    assert(rr.map(_._1).distinct.length == 50)
    rr.groupBy(_._1).foreach { case (qid, rows) =>
      // expected: the 10 ADC survivors re-ordered by exact cosine desc,
      // nid-ascending tiebreak, top 3
      val expect = byQ(qid).map(_._2)
        .sortBy(nid => (-cos(qid, nid), nid)).take(3).toSeq
      val got = rows.sortBy(_._2)
      assert(got.map(_._3).toSeq == expect, s"qid $qid rerank mismatch")
      assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L))
      got.foreach { case (q, _, n, c) => assert(c == cos(q, n)) }
    }
  }

  test("PQ code table round-trips through the catalog; ADC serves from the reloaded table") {
    // The q85/q86 claim made demonstrable: the (nid, cell, code) table
    // is index-as-data — persist through the versioned catalog, reload,
    // and the flat-ADC serving path over the RELOADED codes reproduces
    // the q86 query's rows exactly (codes are int64: bit-exact storage).
    import org.apache.spark.sql.expressions.Window
    val books = graft.functions.VectorIndexFunctions.pqCodebooks(8, 16, 8)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val fd = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("fd"))
    val codes = fd.select(col("nid"),
      graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), matrix).as("cell"),
      element_at(graft.functions.VectorIndexFunctions.pqEncode(col("fd"), books), 1)
        .as("code"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-").toString
    val cat = new graft.catalog.VersionedCatalog(spark, tmp, format = "parquet")
    cat.writeNext("pq_codes", codes)
    val reloaded = cat.latest("pq_codes")
    val q = fd.filter(col("nid") < 50)
      .select(col("nid").as("qid"),
        graft.functions.VectorIndexFunctions.pqLut(col("fd"), books).as("lut"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist_e9"), col("nid"))
    val served = reloaded.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dist_e9", graft.functions.VectorIndexFunctions.pqAdc(
        col("lut"), col("code"), 8, 16))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("nid"), col("dist_e9"))
      .collect().map(_.toSeq)
    spark.catalog.clearCache()
    val q86 = graft.SparkEntry.queries("q86_pq_adc_topk")(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq)
    assert(served.sortBy(_.toString).toSeq == q86.sortBy(_.toString).toSeq)
    spark.catalog.clearCache()
  }

  test("semanticDedupIncremental matches a brute-force new-side verdict") {
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val all = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("fd"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // mirror the engine's exact arithmetic: ×1e7-floored int64 vectors
    val scaled = all.map { case (id, fd) =>
      (id, fd.map(x => math.floor(x * 1e7).toLong))
    }.toMap
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (scaled(a), scaled(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(va.map(x => x * x).sum.toDouble) *
        math.sqrt(vb.map(x => x * x).sum.toDouble))
    }
    val cell = all.map { case (id, fd) =>
      id -> graft.functions.VectorIndex.nearestCell(
        ArrayData.toArrayData(fd), matrix)
    }.toMap
    val newIds = all.map(_._1).filter(_ % 2 == 1)
    val dupIds = newIds.filter(b =>
      all.map(_._1).exists(a => a < b && cell(a) == cell(b) && cos(a, b) >= 0.4))
    val expected = newIds.groupBy(cell).map { case (c, ids) =>
      c.toLong -> (ids.size.toLong, ids.count(dupIds.contains).toLong)
    }
    val got = graft.operators.SimilarityJoin.semanticDedupIncremental(
        graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
        col("vec_id"), col("embedding"), isNew = col("vec_id") % 2 === 1,
        cents, threshold = 0.4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  // ---------------------------------------------- two-level assignment

  test("two-level assignment: wProbe = nCoarse reproduces the flat scan exactly") {
    // the ~2√nCells kernel must be EXACTLY the flat argmin (ties and
    // all) when every super-cell is probed — on the real fixture corpus
    // and through the codegen Column path, not just the static method
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val (coarse, members) = graft.functions.TwoLevelIndex.fit(matrix, nCoarse = 4)
    // fit structure: the member lists partition the cell ids
    assert(members.flatten.sorted.toSeq == matrix.indices.toSeq)
    assert(coarse.length == 4 && coarse.forall(_.length == 64))
    val out = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("fd"))
      .select(col("vec_id"),
        graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), matrix)
          .as("flat"),
        graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
          col("fd"), coarse, members, matrix, wProbe = 4).as("two"),
        graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
          col("fd"), coarse, members, matrix, wProbe = 1).as("one"),
        graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
          col("fd"), coarse, members, matrix, wProbe = 2).as("two_probe"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out.nonEmpty)
    out.foreach { case (id, flat, full, one, two) =>
      assert(full == flat, s"vec $id: full-probe two-level $full != flat $flat")
      // partial probes return valid cells; more probes never pick a
      // farther cell (candidate set grows monotonically)
      assert(one >= 0 && one < matrix.length && two >= 0 && two < matrix.length)
    }
    // distance monotonicity in wProbe, per vector
    val fdRows = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(v: Array[Double], c: Array[Double]): Double =
      v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    out.foreach { case (id, flat, _, one, two) =>
      val v = fdRows(id)
      assert(d2(v, matrix(two)) <= d2(v, matrix(one)))
      assert(d2(v, matrix(flat)) <= d2(v, matrix(two)))
    }
  }

  test("incremental two-level dedup at full probe equals the flat incremental pass") {
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val flat = graft.operators.SimilarityJoin.semanticDedupIncremental(
        emb, col("vec_id"), col("embedding"),
        isNew = col("vec_id") % 2 === 1, cents, threshold = 0.4)
      .orderBy(col("cell")).collect().map(_.toSeq)
    spark.catalog.clearCache()
    val two = graft.operators.SimilarityJoin.semanticDedupIncrementalTwoLevel(
        emb, col("vec_id"), col("embedding"),
        isNew = col("vec_id") % 2 === 1, cents, threshold = 0.4,
        nCoarse = 8, wProbe = 8)
      .orderBy(col("cell")).collect().map(_.toSeq)
    spark.catalog.clearCache()
    assert(flat.nonEmpty && flat.toSeq == two.toSeq)
  }

  test("fitExact: members partition, full probe equals flat, guards fire") {
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val (coarse, members) = graft.functions.TwoLevelIndex.fitExact(matrix, nCoarse = 8)
    assert(members.flatten.sorted.toSeq == matrix.indices.toSeq)
    assert(coarse.length == 8 && coarse.forall(_.length == 64))
    // any partition + full probing == the flat scan, fitExact included
    val out = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("fd"))
      .select(
        graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), matrix)
          .as("flat"),
        graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
          col("fd"), coarse, members, matrix, wProbe = 8).as("two"))
      .collect()
    assert(out.nonEmpty && out.forall(r => r.getInt(0) == r.getInt(1)))
    // the exact-fit contract: values must be exact 1e-4 multiples
    // (KMeans output is not — fit() is the variant for that)
    intercept[IllegalArgumentException] {
      graft.functions.TwoLevelIndex.fitExact(Array(Array(1.0 / 3.0)), 1)
    }
  }

  test("distributed coarse fit: bit-identical to the driver fitExact, serves through prefit") {
    // the 10⁶-cell-decade fit (VERDICT r8 #3): Lloyd sweeps as compiled
    // assignment + int64 partial aggregation over the centroid TABLE.
    // Order-free integer sums ⇒ the distributed fit must equal the
    // sequential driver fitExact bit for bit — coarse AND membership.
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val (dc, dm) = graft.functions.TwoLevelIndex.fitExact(matrix, nCoarse = 8)
    val (cc, cm) = graft.operators.SimilarityJoin
      .twoLevelFitExactDistributed(cents, nCoarse = 8)
    assert(cc.length == dc.length)
    cc.zip(dc).zipWithIndex.foreach { case ((a, b), j) =>
      assert(a.sameElements(b),
        s"super $j: distributed coarse centroid differs from driver fitExact") }
    assert(cm.map(_.toSeq).toSeq == dm.map(_.toSeq).toSeq)
    // the structure slots into CoarseProbe.prefit: q81's serving shape
    // under a PARTIAL probe, identical to the in-op sqlExactFit fit
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val inOp = graft.operators.SimilarityJoin.ivfTopKServing(
        emb, col("vec_id"), col("embedding"), col("vec_id") < 20,
        cents, nProbe = 4, k = 3,
        probe = Some(graft.operators.SimilarityJoin.CoarseProbe(
          nCoarse = 8, wProbe = 2, sqlExactFit = true)))
      .collect().map(_.toSeq)
    spark.catalog.clearCache()
    val viaPrefit = graft.operators.SimilarityJoin.ivfTopKServing(
        emb, col("vec_id"), col("embedding"), col("vec_id") < 20,
        cents, nProbe = 4, k = 3,
        probe = Some(graft.operators.SimilarityJoin.CoarseProbe(
          nCoarse = 8, wProbe = 2, prefit = Some((cc, cm)))))
      .collect().map(_.toSeq)
    spark.catalog.clearCache()
    assert(inOp.nonEmpty &&
      inOp.sortBy(_.toString).toSeq == viaPrefit.sortBy(_.toString).toSeq)
    // the stride hatch composes: sweeps on every 4th cell, membership
    // still partitions the FULL table (the sampled-fit contract,
    // distributed)
    val (_, sm) = graft.operators.SimilarityJoin
      .twoLevelFitExactDistributed(cents, nCoarse = 8, fitSampleStride = 4)
    assert(sm.flatten.sorted.toSeq == matrix.indices.toSeq)
    // contract guards fire distributedly: non-1e-4-exact values refuse
    // (the fitExact rule), gapped cell ids refuse (the centroidMatrix rule)
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      graft.operators.SimilarityJoin.twoLevelFitExactDistributed(
        Seq((0L, Seq(1.0 / 3.0))).toDF("cell", "centroid"), 1)
    }
    intercept[IllegalArgumentException] {
      graft.operators.SimilarityJoin.twoLevelFitExactDistributed(
        Seq((0L, Seq(0.5)), (2L, Seq(0.25))).toDF("cell", "centroid"), 1)
    }
  }

  test("two-level assignment: empty super-cells are skipped, NaN fails fast") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    // super 0 lost all members in the fit (stale centroid remains):
    // probing must SKIP it — with the naive selection, wProbe=1 would
    // probe only the empty super and throw despite a valid nearest cell
    val coarse = Array(Array(0.0), Array(100.0))
    val members = Array(Array.empty[Int], Array(0, 1))
    val cents = Array(Array(99.0), Array(101.0))
    val got = graft.functions.TwoLevelIndex.nearestCellTwoLevel(
      ArrayData.toArrayData(Array(0.0)), coarse, members, cents, wProbe = 1)
    assert(got == 0) // nearest real cell, despite super 0 being closer
    // NaN input: fail fast (the flat kernel's guard), not AIOOBE or a
    // phantom cell id
    intercept[ArithmeticException] {
      graft.functions.TwoLevelIndex.nearestCellTwoLevel(
        ArrayData.toArrayData(Array(Double.NaN)), coarse, members, cents, 1)
    }
    intercept[ArithmeticException] {
      graft.functions.VectorIndex.nearestCell(
        ArrayData.toArrayData(Array(Double.NaN)), Array(Array(0.0)))
    }
    intercept[ArithmeticException] { // NaN centroid table at fit time
      graft.functions.TwoLevelIndex.fit(Array(Array(Double.NaN)), 1)
    }
  }

  test("sampled coarse fit: full-cell membership, full probe still flat-exact") {
    // the SCALE.md driver-cost escape hatch: Lloyd sweeps on every
    // 4th cell, final assignment over ALL cells — membership must
    // still partition the whole table and full probing must still be
    // bit-identical to the flat scan (holds for ANY partition)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val (coarse, members) = graft.functions.TwoLevelIndex.fit(
      matrix, nCoarse = 8, fitSampleStride = 4)
    assert(members.flatten.sorted.toSeq == matrix.indices.toSeq)
    val out = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("fd"))
      .select(
        graft.functions.VectorIndexFunctions.nearestCentroid(col("fd"), matrix)
          .as("flat"),
        graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
          col("fd"), coarse, members, matrix, wProbe = 8).as("two"))
      .collect()
    assert(out.nonEmpty && out.forall(r => r.getInt(0) == r.getInt(1)))
    // on the planted-cluster fixture, a stride that still samples every
    // super-cluster keeps wProbe=1 exact
    val planted = (0 until 12).map { c =>
      Array.tabulate(4)(d =>
        if (d == 0) (c / 3) * 100.0 else if (d == 1) (c % 3) * 1.0 else 0.0)
    }.toArray
    val (pc, pm) = graft.functions.TwoLevelIndex.fit(
      planted, nCoarse = 4, fitSampleStride = 3)
    assert(pm.flatten.sorted.toSeq == (0 until 12))
    assert(pm.map(_.map(_ / 3).distinct.length).forall(_ == 1))
    intercept[IllegalArgumentException] {
      graft.functions.TwoLevelIndex.fit(planted, 4, fitSampleStride = 0)
    }
    // stride 1 is the exact fit: identical output to the default path
    val (c1, m1) = graft.functions.TwoLevelIndex.fit(matrix, 8)
    val (c2, m2) = graft.functions.TwoLevelIndex.fit(matrix, 8, fitSampleStride = 1)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
  }

  test("two-level structure round-trips through the catalog; reloaded probe is identical") {
    // index-as-data for the newest index kind: the fitted (coarse,
    // members) pair persists as a (j, super_centroid, member_cells)
    // table and a reloaded structure must assign EXACTLY like the
    // fitted one (doubles round-trip parquet bit-exactly)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val (coarse, members) = graft.functions.TwoLevelIndex.fit(matrix, nCoarse = 8)
    val tmp = java.nio.file.Files.createTempDirectory("graft-2l-").toString
    val cat = new graft.catalog.VersionedCatalog(spark, tmp, format = "parquet")
    cat.writeNext("two_level",
      graft.operators.SimilarityJoin.twoLevelToDf(spark, coarse, members))
    val (c2, m2) = graft.operators.SimilarityJoin.twoLevelFromDf(
      cat.latest("two_level"))
    assert(c2.map(_.toSeq).toSeq == coarse.map(_.toSeq).toSeq)
    assert(m2.map(_.toSeq).toSeq == members.map(_.toSeq).toSeq)
    val out = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("fd"))
      .select(
        graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
          col("fd"), coarse, members, matrix, wProbe = 2).as("orig"),
        graft.functions.VectorIndexFunctions.nearestCentroidTwoLevel(
          col("fd"), c2, m2, matrix, wProbe = 2).as("reloaded"))
      .collect()
    assert(out.nonEmpty && out.forall(r => r.getInt(0) == r.getInt(1)))
    // contract guards: shuffled/gapped super ids refuse to load
    intercept[IllegalArgumentException] {
      graft.operators.SimilarityJoin.twoLevelFromDf(
        cat.latest("two_level").withColumn("j", col("j") + 1))
    }
    spark.catalog.clearCache()
  }

  test("two-level assignment: well-separated super-clusters are exact at wProbe = 1") {
    // 4 super-clusters far apart in dim 0, 3 cells each jittered in dim
    // 1: the coarse fit must recover the grouping and a vector near any
    // cell must assign identically to the flat scan with ONE probe —
    // the regime the kernel exists for (10⁵ cells clustered in space)
    val matrix = (0 until 12).map { c =>
      val sup = c / 3
      Array.tabulate(4)(d =>
        if (d == 0) sup * 100.0 else if (d == 1) (c % 3) * 1.0 else 0.0)
    }.toArray
    val (coarse, members) = graft.functions.TwoLevelIndex.fit(matrix, nCoarse = 4)
    assert(members.flatten.sorted.toSeq == (0 until 12))
    // each member group is one planted super-cluster
    assert(members.map(_.map(_ / 3).distinct.length).forall(_ == 1))
    val g = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val near = g.nextInt(12)
      val v = matrix(near).clone()
      v(1) += g.nextDouble() * 0.4 - 0.2 // stay nearest to `near`'s cluster
      v(2) += g.nextDouble() * 0.4 - 0.2
      val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v)
      val flat = graft.functions.VectorIndex.nearestCell(ad, matrix)
      val two = graft.functions.TwoLevelIndex.nearestCellTwoLevel(
        ad, coarse, members, matrix, wProbe = 1)
      assert(two == flat, s"wProbe=1 mismatch near cell $near: $two != $flat")
    }
  }

  // ------------------------------------------------- compiled probe stage

  test("topCells matches the declarative crossJoin+window probe it replaced") {
    // the round-8 serving probe: one compiled kernel call per query vs
    // the old crossJoin(broadcast(centroids)) + zip_with/aggregate fold
    // + row_number shape — same (dist, cell) ordering, same IEEE fold,
    // so the probe SETS and their rank order must be identical
    import org.apache.spark.sql.expressions.Window
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val queries = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("fd"))
    val kernel = queries
      .select(col("qid"), posexplode(
        graft.functions.VectorIndexFunctions.topCells(col("fd"), matrix, 4)))
      .select(col("qid"), col("pos"), col("col").as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("dist"), col("cell_probe"))
    val window = queries.crossJoin(
        broadcast(cents.select(col("cell").cast("int").as("cell_probe"), col("centroid"))))
      .withColumn("dist", aggregate(
        zip_with(col("fd"), col("centroid"), (a, b) => (a - b) * (a - b)),
        lit(0.0d), (acc, d) => acc + d))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= 4)
      .select(col("qid"), (col("pr") - 1).cast("int").as("pos"), col("cell_probe"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(kernel.nonEmpty && kernel == window)
  }

  test("topCellsTwoLevel at full probe equals the flat probe, rank order included") {
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val matrix = cents.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val (coarse, members) = graft.functions.TwoLevelIndex.fit(matrix, nCoarse = 8)
    val out = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("fd"))
      .select(
        graft.functions.VectorIndexFunctions.topCells(col("fd"), matrix, 4)
          .as("flat"),
        graft.functions.VectorIndexFunctions.topCellsTwoLevel(
          col("fd"), coarse, members, matrix, wProbe = 8, nProbe = 4).as("two"),
        graft.functions.VectorIndexFunctions.topCellsTwoLevel(
          col("fd"), coarse, members, matrix, wProbe = 2, nProbe = 4).as("part"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val flat = r.getSeq[Int](0)
      assert(flat == r.getSeq[Int](1), "full probe must equal the flat scan")
      // partial probe: valid cells, no duplicates, first entry is the
      // two-level ASSIGNMENT cell (nProbe=1 prefix property)
      val part = r.getSeq[Int](2)
      assert(part.length == 4 && part.distinct.length == 4)
      assert(part.forall(c => c >= 0 && c < matrix.length))
    }
  }

  test("topCells: tie rule, nProbe clamp, and fail-fast guards") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    // exact tie: cells 1 and 0 equidistant → lower cell id first
    val m = Array(Array(1.0), Array(-1.0), Array(5.0))
    assert(graft.functions.VectorIndex.topCells(
      ArrayData.toArrayData(Array(0.0)), m, 2).toIntArray().toSeq == Seq(0, 1))
    // nProbe past nCells clamps to all cells, rank-ordered
    assert(graft.functions.VectorIndex.topCells(
      ArrayData.toArrayData(Array(0.9)), m, 99).toIntArray().toSeq == Seq(0, 1, 2))
    intercept[ArithmeticException] { // NaN never emits a phantom cell
      graft.functions.VectorIndex.topCells(
        ArrayData.toArrayData(Array(Double.NaN)), m, 2)
    }
    intercept[IllegalArgumentException] { // nProbe < 1 fails fast: the
      // removed declarative probe emitted zero rows for this config —
      // silently probing one cell instead would change behavior
      graft.functions.VectorIndex.topCells(
        ArrayData.toArrayData(Array(0.0)), m, 0)
    }
    intercept[IllegalArgumentException] { // dim mismatch
      graft.functions.VectorIndex.topCells(
        ArrayData.toArrayData(Array(0.0, 1.0)), m, 2)
    }
    intercept[IllegalArgumentException] { // empty index
      graft.functions.VectorIndex.topCells(
        ArrayData.toArrayData(Array(0.0)), Array.empty[Array[Double]], 2)
    }
    // two-level: memberless supers are skipped; small probed supers
    // emit FEWER than nProbe cells (the partial-probe recall trade)
    val coarse = Array(Array(0.0), Array(100.0))
    val members = Array(Array.empty[Int], Array(0, 1))
    val cents = Array(Array(99.0), Array(101.0))
    assert(graft.functions.TwoLevelIndex.topCellsTwoLevel(
      ArrayData.toArrayData(Array(0.0)), coarse, members, cents,
      wProbe = 1, nProbe = 4).toIntArray().toSeq == Seq(0, 1))
    intercept[ArithmeticException] {
      graft.functions.TwoLevelIndex.topCellsTwoLevel(
        ArrayData.toArrayData(Array(Double.NaN)), coarse, members, cents, 1, 2)
    }
  }

  test("array-holding kernel expressions compare structurally (CSE-friendly)") {
    // case-class equality on Array fields is reference-based; the
    // ArrayParamEquality override makes identically-constructed kernels
    // equal so Catalyst common-subexpression elimination can dedup them
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val m1 = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val m2 = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val child = ColumnBridge.expression(col("fd"))
    assert(graft.functions.NearestCentroid(child, m1) ==
      graft.functions.NearestCentroid(child, m2))
    assert(graft.functions.NearestCentroid(child, m1).hashCode ==
      graft.functions.NearestCentroid(child, m2).hashCode)
    assert(graft.functions.NearestCentroid(child, m1) !=
      graft.functions.NearestCentroid(child, Array(Array(9.0, 2.0), Array(3.0, 4.0))))
    assert(graft.functions.TopCells(child, m1, 2) ==
      graft.functions.TopCells(child, m2, 2))
    assert(graft.functions.TopCells(child, m1, 2) !=
      graft.functions.TopCells(child, m2, 3)) // scalar params count
    val mem1 = Array(Array(0), Array(1))
    assert(graft.functions.NearestCentroidTwoLevel(child, m1, mem1, m1, 1) ==
      graft.functions.NearestCentroidTwoLevel(child, m2, Array(Array(0), Array(1)), m2, 1))
    assert(graft.functions.NearestCentroidTwoLevel(child, m1, mem1, m1, 1) !=
      graft.functions.TopCells(child, m1, 1)) // class mismatch
  }

  // ------------------------------------------------------- semantic dedup

  private def centsDf = {
    val spark2 = spark
    import spark2.implicits._
    // 2 well-separated 4-dim centroids: cell 0 near +x, cell 1 near -x
    Seq((0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(-1.0, 0.0, 0.0, 0.0)))
      .toDF("cell", "centroid")
  }

  private def vecsDf(rows: Seq[(Long, Seq[Double])]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb").cast("array<float>").as("emb"))
  }

  test("semanticDedup: planted near-dups collapse to the lowest id per cell") {
    // cell 0: ids 1,2 nearly parallel (cos≈1 → 2 is a dup of 1), id 3
    // orthogonal-ish in dims 2-4 but still nearest +x? no — keep it
    // clearly in cell 0 with a distinct direction: (0.9, 0.4, 0, 0).
    // cell 1: ids 10, 11 antiparallel to +x; 11 is a dup of 10.
    val out = graft.operators.SimilarityJoin.semanticDedup(
        vecsDf(Seq(
          1L -> Seq(1.0, 0.01, 0.0, 0.0),
          2L -> Seq(0.99, 0.012, 0.0, 0.0),
          3L -> Seq(0.9, -0.9, 0.0, 0.0), // cell 0, cos vs 1/2 ≈ 0.7 < 0.95
          10L -> Seq(-1.0, 0.0, 0.05, 0.0),
          11L -> Seq(-0.98, 0.0, 0.049, 0.0))),
        col("vec_id"), col("emb"), centsDf, threshold = 0.95)
      .orderBy(col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 3L, 1L, 2L), (1L, 2L, 1L, 1L)))
  }

  test("semanticDedupIncremental: oversized cells drop whole, like the full pass") {
    // cell 0 holds 5 vectors (3 new: ids 1, 3, 5) — with maxCell = 4 its
    // pairs never form and all new members report kept; cell 1's new
    // member (11) still resolves against old 10 exactly
    val out = graft.operators.SimilarityJoin.semanticDedupIncremental(
        vecsDf((1L to 5L).map(i => i -> Seq(1.0, i * 1e-6, 0.0, 0.0)) ++
          Seq(10L -> Seq(-1.0, 0.0, 0.0, 0.0), 11L -> Seq(-1.0, 1e-6, 0.0, 0.0))),
        col("vec_id"), col("emb"), isNew = col("vec_id") % 2 === 1,
        centsDf, threshold = 0.95, maxCell = 4)
      .orderBy(col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 3L, 0L, 3L), (1L, 1L, 1L, 0L)))
  }

  test("semanticDedup: oversized cells drop via the cap, dups stay exact elsewhere") {
    // 5 vectors in cell 0 (maxCell = 4 → the whole cell's pairs drop,
    // its n_dups reads 0) while cell 1's pair survives — the
    // cappedBuckets contract: a degenerate cell never materializes.
    val out = graft.operators.SimilarityJoin.semanticDedup(
        vecsDf((1L to 5L).map(i => i -> Seq(1.0, i * 1e-6, 0.0, 0.0)) ++
          Seq(10L -> Seq(-1.0, 0.0, 0.0, 0.0), 11L -> Seq(-1.0, 1e-6, 0.0, 0.0))),
        col("vec_id"), col("emb"), centsDf, threshold = 0.95, maxCell = 4)
      .orderBy(col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 5L, 0L, 5L), (1L, 2L, 1L, 1L)))
  }
}
