package graft.ext

import graft.SparkSpec
import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** Scale-shape smoke: replicate the fixture corpus with id offsets so
  * every document has a known number of exact copies, then check the
  * dedup operators produce exactly the predicted structure at 10-20×
  * the fixture size. This exercises the paths that break under scale —
  * bucket grouping with REAL duplicate density (every bucket holds all
  * copies), pair expansion, candidate dedup — not just timing. */
class ScaleSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def replicated(copies: Int) = {
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    (0 until copies)
      .map(i => docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
  }

  test("exact dedup at 20x: every survivor reports exactly 20 copies") {
    val out = NearDup.exact(replicated(20),
        col("doc_id"), concat_ws(" ", TextDsl.tokens(col("text"))))
      .collect()
    assert(out.length == 500) // distinct normalized texts unchanged
    assert(out.forall(_.getLong(1) == 20L))
    // survivor is always the min id = an original (offset-0) doc id
    assert(out.forall(_.getLong(0) < 1000000L))
  }

  test("minhash LSH at 10x: replicas are found as near-dup pairs (jac = 1)") {
    val copies = 10
    val pairs = NearDup.minhashLsh(replicated(copies),
        col("doc_id"), col("text"), numHashes = 12, bands = 3)
      .collect()
    // every (doc, replica) pair collides in every band and has Jaccard 1:
    // 500 docs × C(10,2) = 22,500 exact-dup pairs, plus the fixture's
    // planted near-dups (28 pairs at sf0.001) in each of 10×10 copy combos
    val exactPairs = pairs.filter(_.getDouble(2) == 1.0d)
    assert(exactPairs.length >= 500 * copies * (copies - 1) / 2)
    // structure: for a sampled doc, all its replicas pair with each other
    val sample = pairs.filter(r => r.getLong(0) % 1000000L == 7L &&
      r.getLong(1) % 1000000L == 7L)
    assert(sample.length == copies * (copies - 1) / 2)
    spark.catalog.clearCache()
  }

  test("IVF serving at 20x replication: probes route every query to its replicas; two-level ≡ flat") {
    // replicated corpus = REAL duplicate density for the serving path:
    // each query's true neighbors are its 19 exact copies, so the probe
    // kernel must route the query into its own cell and the candidate
    // join must surface copies first — and the two-level probe at full
    // width must agree with the flat probe row for row at this scale
    val copies = 20
    val emb = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val rep = (0 until copies)
      .map(i => emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionAll _)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val flat = graft.operators.SimilarityJoin.ivfTopKServing(
        rep, col("vec_id"), col("embedding"), col("vec_id") < 20,
        cents, nProbe = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    val two = graft.operators.SimilarityJoin.ivfTopKServing(
        rep, col("vec_id"), col("embedding"), col("vec_id") < 20,
        cents, nProbe = 4, k = 3,
        probe = Some(graft.operators.SimilarityJoin.CoarseProbe(nCoarse = 8, wProbe = 8)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(flat.sortBy(r => (r._1, r._2)).toSeq == two.sortBy(r => (r._1, r._2)).toSeq)
    assert(flat.map(_._1).distinct.length == 20)
    flat.foreach { case (qid, _, nid, cos) =>
      // every returned neighbor is one of the query's exact replicas
      assert(nid % 1000000L == qid, s"query $qid surfaced non-replica $nid")
      assert(cos > 0.999999, s"replica cosine $cos")
    }
  }

  test("IVF serving survives a planted 5k mega-CELL: salted rank is " +
      "bit-identical and bounds the per-query sort partitions") {
    // the semantic analog of the 5k LSH mega-cluster: 5000 copies of one
    // embedding all land in ONE cell, so any query probing that cell
    // feeds ~5k candidate rows into its per-qid rank window — the one
    // serving-path partition that grows ∝ |cell| at 100 TB. rankSalt
    // splits the rank into (qid, salt) sort partitions and must change
    // NOTHING about the output (top-k under a total order is
    // associative), while the candidate join itself stays broadcast on
    // the probe side (no exchange keys on cell, so the mega-cell can't
    // skew a shuffle).
    val emb = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val mega = emb.filter(col("vec_id") === 7L)
      .crossJoin(spark.range(5000).toDF("i"))
      .select((col("i") + 2000000L).as("vec_id"), col("embedding"))
    val corpus = emb.unionAll(mega)
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    def serve(salt: Int) = {
      val out = graft.operators.SimilarityJoin.ivfTopKServing(
          corpus, col("vec_id"), col("embedding"), col("vec_id") < 20,
          cents, nProbe = 4, k = 3, rankSalt = salt)
      val rows = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(r => (r._1, r._2)).toSeq
      spark.catalog.clearCache()
      (rows, out)
    }
    val (flat, _) = serve(1)
    val (salted, saltedDf) = serve(8)
    assert(flat.nonEmpty && flat == salted)
    // vec 7 IS a query (< 20): its top-3 must be its planted replicas
    // at cosine 1 — the mega-cell's candidates genuinely flowed through
    val q7 = flat.filter(_._1 == 7L)
    assert(q7.length == 3 && q7.forall(r => r._3 >= 2000000L && r._4 > 0.999999))
    // and the salted plan's stage-1 window genuinely partitions by the
    // salt column (the partition-size bound exists in the plan, not
    // just in intent)
    val tree = saltedDf.queryExecution.executedPlan.treeString
    assert(tree.contains("_salt"),
      s"salted rank missing from plan:\n${tree.take(1200)}")
  }

  test("minhash LSH survives a planted 5k mega-cluster: cap drops the " +
      "degenerate buckets, everything else is unchanged") {
    // 5000 identical copies of one document: every band bucket holding it
    // would collect 5001 ids and expand to 12.5M pairs per bucket — the
    // real-duplicate-density shape that OOMs an uncapped LSH job. With the
    // bucket cap those buckets are dropped before any array materializes;
    // pairs NOT involving the mega doc must be exactly the baseline's.
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") === 7L)
      .crossJoin(spark.range(5000).toDF("i"))
      .select((col("i") + 2000000L).as("doc_id"), col("text"))
    val pairs = NearDup.minhashLsh(docs.unionAll(planted),
        col("doc_id"), col("text"), numHashes = 12, bands = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the mega-cluster contributed nothing (its buckets were dropped) …
    assert(!pairs.exists(p => p._1 >= 2000000L || p._2 >= 2000000L))
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L))
    spark.catalog.clearCache()
    // … and every pair not involving doc 7 matches the un-planted baseline
    val baseline = NearDup.minhashLsh(docs, col("doc_id"), col("text"),
        numHashes = 12, bands = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(p => p._1 == 7L || p._2 == 7L)
    assert(pairs.sorted.toSeq == baseline.sorted.toSeq)
    spark.catalog.clearCache()
  }

  test("incremental LSH survives a planted 5k mega-cluster and skips old-old pairs") {
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") === 7L)
      .crossJoin(spark.range(5000).toDF("i"))
      .select((col("i") + 2000000L).as("doc_id"), col("text"))
    // "new" = the planted replicas plus odd fixture ids
    val isNew = col("doc_id") >= 2000000L || col("doc_id") % 2 === 1
    val pairs = NearDup.minhashLshIncremental(docs.unionAll(planted),
        col("doc_id"), col("text"), isNew, numHashes = 12, bands = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // mega buckets dropped before any pair materializes
    assert(!pairs.exists(p => p._1 >= 2000000L || p._2 >= 2000000L))
    spark.catalog.clearCache()
    // remaining pairs = the full baseline restricted to ≥1 new member
    val baseline = NearDup.minhashLsh(docs, col("doc_id"), col("text"),
        numHashes = 12, bands = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(p => p._1 == 7L || p._2 == 7L)
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(pairs.filterNot(p => p._1 == 7L || p._2 == 7L).sorted.toSeq
      == baseline.sorted.toSeq)
    spark.catalog.clearCache()
  }

  test("semantic dedup survives a planted 5k mega-CELL: the cap drops its " +
      "pair expansion before it materializes, every other cell is baseline-exact") {
    // 5000 identical copies of one embedding all assign to one cell:
    // uncapped, that cell's pair expansion is C(5000+,2) ≈ 12.5M pairs —
    // the real-duplicate-density shape the cap exists for. The planted
    // ids sit ABOVE every fixture id, so baseline members' dup verdicts
    // cannot change (a member is a dup iff some LOWER-id neighbor
    // matches), which makes the expected output exact in both runs.
    val vecs = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val planted = vecs.filter(col("vec_id") === 7L)
      .crossJoin(spark.range(5000).toDF("i"))
      .select((col("i") + 2000000L).as("vec_id"), col("embedding"))
    val cents = graft.operators.SimilarityJoin.md5CentroidTable(spark, nCells = 64)
    val megaCell = graft.operators.SimilarityJoin.ivfAssignTable(
        vecs.filter(col("vec_id") === 7L), col("vec_id"), col("embedding"), cents)
      .collect().head.getLong(1)
    def run(input: org.apache.spark.sql.DataFrame, maxCell: Int) =
      graft.operators.SimilarityJoin.semanticDedupTwoLevel(
          input, col("vec_id"), col("embedding"), cents, threshold = 0.4,
          nCoarse = 8, wProbe = 8, maxCell = maxCell)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val baseline = run(vecs, 65536)
    spark.catalog.clearCache()

    // capture the cap's observe metric (async bus → poll, the q52 pattern)
    @volatile var dropped: Option[Long] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.get("semantic_dedup_cell_cap")
          .foreach(r => dropped = Some(r.getLong(0)))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // CAPPED: the mega cell exceeds maxCell=4096 → its bucket is
      // dropped before any member array builds; counts still exact
      val capped = run(vecs.unionAll(planted), 4096)
      val (bv, bd, _) = baseline(megaCell)
      assert(capped(megaCell) == ((bv + 5000L, 0L, bv + 5000L)),
        s"capped mega cell: ${capped(megaCell)}")
      assert((capped - megaCell) == (baseline - megaCell),
        "the cap leaked into an unplanted cell")
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (dropped.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(dropped.contains(1L), s"semantic_dedup_cell_cap.dropped_buckets = $dropped")
      spark.catalog.clearCache()

      // UNCAPPED (cap above the planted size): every planted copy is a
      // dup of lower-id vec 7 — n_dups grows by EXACTLY 5000 and nothing
      // else moves (the q52 oracle-formula discipline)
      val uncapped = run(vecs.unionAll(planted), 8192)
      assert(uncapped(megaCell) == ((bv + 5000L, bd + 5000L, bv - bd)),
        s"uncapped mega cell: ${uncapped(megaCell)}")
      assert((uncapped - megaCell) == (baseline - megaCell))
    } finally spark.listenerManager.unregister(listener)
    spark.catalog.clearCache()
  }

  test("intra-label cosine thins a label past maxPerLabel: pair count is " +
      "capped-quadratic, average finite, observe metric fires") {
    // All 500 fixture vectors under ONE label, cap at 100: the thinning
    // branch (inactive at fixture scale, where labels ≪ 2000) must keep
    // ~1/5 of members BEFORE the pair join — C(~100,2) pairs, not
    // C(500,2) — while a second label under the cap passes through exact.
    val base = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), TextDsl.scaledVec(col("embedding")).as("v"))
      .withColumn("n2", TextDsl.norm2Int(col("v")))
    val mega = base.select(col("vec_id"), lit("mega").as("label"), col("v"), col("n2"))
    val small = base.filter(col("vec_id") < 40)
      .select((col("vec_id") + 1000L).as("vec_id"), lit("small").as("label"),
        col("v"), col("n2"))
    // capture the observe metric via a listener (async bus → poll below)
    @volatile var thinned: Option[Long] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.get("intra_label_cap")
          .foreach(r => thinned = Some(r.getLong(0)))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = Similarity.intraLabelCosine(mega.unionAll(small), maxPerLabel = 100L)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // small label: under the cap → exact all-pairs, untouched by thinning
      assert(out("small")._1 == 40L * 39 / 2)
      // mega label: ceil(500/100)=5 → survivors are EXACTLY the ids with
      // hp(id) % 5 == 0 — the same md5-residue predicate the q52 oracle
      // CTE mirrors. Recompute the thinned all-pairs average independently
      // (same exact-int arithmetic) so the engine's thinning branch is
      // pinned to the oracle formula, not just bracketed.
      val vecs = base.collect().map(r => (r.getLong(0),
        r.getSeq[Long](2).toArray, r.getLong(3)))
      val survivors = vecs.filter { case (id, _, _) =>
        val h = graft.functions.HashKernels.md5h60(
          org.apache.spark.unsafe.types.UTF8String.fromString(id.toString))
        h % TextDsl.P % 5L == 0L
      }.sortBy(_._1)
      val pairCos = for {
        i <- survivors.indices; j <- (i + 1) until survivors.length
      } yield {
        val (_, va, n2a) = survivors(i); val (_, vb, n2b) = survivors(j)
        val dot = va.zip(vb).map { case (x, y) => x * y }.sum
        math.floor(dot.toDouble /
          (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble)) * 1e9).toLong
      }
      assert(out("mega")._1 == pairCos.length.toLong,
        s"mega pairs ${out("mega")._1} != expected ${pairCos.length}")
      assert(out("mega")._2 == pairCos.sum.toDouble / pairCos.length.toDouble)
      // sanity: the thin actually fired (≈1/5 of 500 members survive)
      assert(survivors.length < 150 && survivors.length > 60)
      // the observe metric counted exactly the one oversized label
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (thinned.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(thinned.contains(1L), s"intra_label_cap.thinned_labels = $thinned")
    } finally spark.listenerManager.unregister(listener)
  }

  test("sketches at 20x replication: CMS cells scale by exactly 20, HLL registers are invariant") {
    // the defining contrast of the two sketch families under duplicate
    // density: a counting sketch is LINEAR in the stream (every cell
    // multiplies by the replication factor, exactly — int64 SUMs), a
    // cardinality sketch is a function of the SET (replicas add no new
    // distinct items, so every register is bit-identical). Both
    // reductions stay m-row regardless of the 20x corpus.
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val rep = replicated(20)
    val cmsBase = graft.ext.CountMin.sketchCells(
        graft.ext.CountMin.tokenCountsOf(docs))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cmsRep = graft.ext.CountMin.sketchCells(
        graft.ext.CountMin.tokenCountsOf(rep))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cmsBase.nonEmpty && cmsRep.keySet == cmsBase.keySet)
    cmsBase.foreach { case (cell, v) =>
      assert(cmsRep(cell) == 20L * v, s"CMS cell $cell: ${cmsRep(cell)} != 20*$v")
    }
    val hllBase = graft.ext.Hll.registerTable(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hllRep = graft.ext.Hll.registerTable(rep)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hllRep == hllBase, "HLL registers changed under pure replication")
    spark.catalog.clearCache()
  }

  test("n-gram Jaccard df cap: a stopword-shingle shared by 3k docs is dropped, " +
      "pair work stays bounded") {
    val s = spark
    import s.implicits._
    // every planted doc shares the shingle "the common one" (df = 3000 →
    // 4.5M pairs uncapped) but is otherwise unique; with the df cap the
    // degenerate shingle contributes nothing and the job stays small
    val planted = spark.range(3000)
      .select((col("id") + 5000000L).as("doc_id"),
        concat(lit("the common one unique tail "), col("id").cast("string"),
          lit(" z"), col("id").cast("string"), lit(" w"), col("id").cast("string"))
          .as("text"))
    val base = planted.select(col("doc_id"), TextDsl.tokens(col("text")).as("tk"))
      .select(col("doc_id"), array_distinct(TextDsl.shingles(col("tk"), 3)).as("sh"))
      .persist()
    val pairs = graft.operators.NearDup.cappedBuckets(
        base.select(col("doc_id"), explode(col("sh")).as("s")),
        Seq("s"), "doc_id", maxBucket = 1024, "smoke_df_cap")
      .select(explode(graft.functions.HashFunctions.sortedIdPairs(col("ids"))).as("p"))
      .count()
    // only the capped (df ≤ 1024) shingles expand; "the common one" (df
    // 3000) is dropped, so no quadratic blowup — and since every other
    // shingle is unique to its doc, NO pairs remain at all
    assert(pairs == 0L)
    base.unpersist()
    spark.catalog.clearCache()
  }

  test("repeated-span ops under 5k-doc planted boilerplate: work stays linear " +
      "in occurrences, coverage and removal are exact") {
    val s = spark
    import s.implicits._
    // 5000 docs share an identical 10-token boilerplate header (the
    // web-corpus reality ExactSubstr exists for) + a unique 10-token
    // body. The repeated-key join output is LINEAR in occurrences (one
    // row per span occurrence, never occurrence pairs — the contrast
    // with the pairwise dedup family, where 5000 shared keys would be
    // 12.5M pairs); coverage must flag exactly the header on every doc.
    val header = (0 until 10).map(i => s"boiler$i").mkString(" ")
    val planted = spark.range(5000)
      .select((col("id") + 7000000L).as("doc_id"),
        concat(lit(header + " "),
          concat_ws(" ", (0 until 10).map(j =>
            concat(lit(s"u$j"), col("id").cast("string"))): _*)).as("text"))
    val cov = Dedup.repeatedSpanCoverage(planted)
    // exactly one repeated span per doc (the header; bridging spans mix
    // in the unique body so they never repeat), covering 10 of 20 tokens
    val agg = cov.agg(
        count(lit(1)).as("n"),
        sum(when(col("n_rep_spans") === 1L && col("covered_tokens") === 10L
          && col("coverage_pct") === 50L, 1L).otherwise(0L)).as("ok"))
      .head()
    assert(agg.getLong(0) == 5000L && agg.getLong(1) == 5000L)
    // removal cuts the header everywhere and keeps each unique body
    val rem = Dedup.removeRepeatedSpans(planted)
    val rok = rem.agg(
        sum(when(col("removed_tokens") === 10L && col("kept_tokens") === 10L
          && !col("cleaned_text").contains("boiler"), 1L).otherwise(0L)).as("ok"))
      .head().getLong(0)
    assert(rok == 5000L)
    spark.catalog.clearCache()
  }
}
