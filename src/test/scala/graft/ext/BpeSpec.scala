package graft.ext

import graft.SparkSpec
import graft.functions.{BpeFunctions, BpeTable}
import org.apache.spark.sql.functions._

/** Contract tests for the BPE kernels and trainer.
  *
  * The load-bearing claims, each pinned here:
  *  - one greedy left-to-right pass per merge, in rank order (the exact
  *    semantics the DuckDB replace-fold oracle mirrors);
  *  - for a WELL-FORMED merges table that sequential order equals the
  *    classic lowest-rank-first apply loop (checked against an
  *    independent reference implementation of the classic algorithm);
  *  - the trainer emits a well-formed table with deterministic
  *    tie-breaks;
  *  - encode/count are flatten/size of per-word segmentation.
  */
class BpeSpec extends SparkSpec {

  private def table(ms: (String, String)*): BpeTable =
    new BpeTable(ms.map(_._1).toArray, ms.map(_._2).toArray)

  test("segmentation: greedy single pass per merge, rank order") {
    val t = table(("a", "n"), ("an", "a"), ("b", "ana"))
    // banana: chars -> (a,n) greedy: b an an a -> (an,a): the FIRST
    // (an,a) occurrence merges (left-to-right), leaving b an ana ->
    // (b,ana): no (b,ana) pair present (b is followed by an)
    assert(t.segmentString("banana").toSeq == Seq("b", "an", "ana"))
  }

  test("segmentation: adjacent self-pairs do not overlap") {
    val t = table(("a", "a"))
    assert(t.segmentString("aaaa").toSeq == Seq("aa", "aa"))
    assert(t.segmentString("aaa").toSeq == Seq("aa", "a"))
    assert(t.segmentString("aaaaa").toSeq == Seq("aa", "aa", "a"))
  }

  test("segmentation: empty merges table = code points; surrogates intact") {
    val t = table()
    assert(t.segmentString("abc").toSeq == Seq("a", "b", "c"))
    // a surrogate pair (U+1F600) must stay one symbol, not split chars
    val emoji = new String(Character.toChars(0x1F600))
    assert(t.segmentString("a" + emoji + "b").toSeq == Seq("a", emoji, "b"))
  }

  test("a merged symbol never re-pairs within its own pass") {
    // (a,b) over "abb": merging position 0 yields ab,b — the new (ab,b)
    // pair is NOT (a,b), so the pass must stop there
    val t = table(("a", "b"))
    assert(t.segmentString("abb").toSeq == Seq("ab", "b"))
    assert(t.segmentString("abab").toSeq == Seq("ab", "ab"))
  }

  /** Independent reference: the CLASSIC apply loop — repeatedly find
    * the LOWEST-RANK pair present anywhere in the word and run one
    * greedy pass for it, until no merge applies. */
  private def classicApply(word: String, ms: Seq[(String, String)]): Seq[String] = {
    val rank = ms.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) done = true
      else {
        val (l, r) = present.minBy(_._2)._1
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += (l + r); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  test("rank-order apply equals classic lowest-rank-first on a trained table") {
    val s = spark
    import s.implicits._
    // train on a corpus with real merge structure, then check EVERY
    // vocabulary word both ways
    val docs = Seq(
      (1L, "lower lower lowest newer newest wider widest low new"),
      (2L, "newest newest lowest wider lower new low low low"),
      (3L, "the the the these them theme scheme he she her here")
    ).toDF("doc_id", "text")
    val trained = Bpe.trainMerges(docs, rounds = 10)
    val ms = trained.map { case (_, l, r, _) => (l, r) }
    val t = table(ms: _*)
    val vocab = docs.select(explode(TextDsl.tokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(vocab.nonEmpty)
    vocab.foreach { w =>
      assert(t.segmentString(w).toSeq == classicApply(w, ms),
        s"word '$w' under ${ms.mkString(",")}")
    }
  }

  test("trained table is well-formed: every side is a char or an earlier product") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "lower lower lowest newer newest wider widest"),
      (2L, "newest newest lowest wider lower")
    ).toDF("doc_id", "text")
    val trained = Bpe.trainMerges(docs, rounds = 8)
    val products = scala.collection.mutable.Set.empty[String]
    trained.foreach { case (rank, l, r, cnt) =>
      assert(cnt >= 1, s"rank $rank count")
      for (side <- Seq(l, r))
        assert(side.codePointCount(0, side.length) == 1 || products(side),
          s"rank $rank side '$side' is neither a code point nor an earlier product")
      products += (l + r)
    }
    // deterministic: retraining yields the identical table
    assert(Bpe.trainMerges(docs, rounds = 8) == trained)
  }

  test("property: rank-order ≡ classic apply over random well-formed tables") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val wordGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    // build a random WELL-FORMED merges table: repeatedly segment a
    // random corpus word under the merges so far and promote one of its
    // adjacent symbol pairs — every side is a code point or an earlier
    // product by construction
    for (iter <- 0 until 40) {
      val words = (0 until 8).map(i => sample(wordGen, 100L * iter + i))
      var ms = Seq.empty[(String, String)]
      for (r <- 0 until 6) {
        val t = table(ms: _*)
        val w = words(sample(Gen.choose(0, words.size - 1), 7L * iter + r))
        val syms = t.segmentString(w)
        if (syms.length >= 2) {
          val at = sample(Gen.choose(0, syms.length - 2), 13L * iter + r)
          val cand = (syms(at), syms(at + 1))
          if (!ms.contains(cand)) ms = ms :+ cand
        }
      }
      val t = table(ms: _*)
      words.foreach { w =>
        assert(t.segmentString(w).toSeq == classicApply(w, ms),
          s"'$w' under ${ms.mkString(",")}")
        // segmentation is a PARTITION of the word: concatenation restores it
        assert(t.segmentString(w).mkString == w)
      }
    }
  }

  test("property: batched(k) training ≡ sequential over random corpora and k") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    // small alphabet + repeated words → dense pair-count collisions,
    // so the tie/conflict fallback paths actually fire
    val wordGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (iter <- 0 until 6) {
      val words = (0 until 10).map(i => sample(wordGen, 991L * iter + i))
      val reps = words.zipWithIndex.flatMap { case (w, i) =>
        Seq.fill(1 + (i * 7 + iter) % 4)(w) }
      val docs = Seq((1L, reps.mkString(" "))).toDF("doc_id", "text")
      val wc = Bpe.wordCounts(docs)
      val sequential = Bpe.trainMergesFromCounts(wc, rounds = 7)
      for (k <- Seq(1, 2, 4, 8)) {
        val (batched, sweeps) =
          Bpe.trainMergesBatchedWithSweeps(wc, rounds = 7, batchK = k)
        assert(batched == sequential,
          s"iter $iter k=$k: batched diverged from sequential\n" +
            s"  seq: $sequential\n  bat: $batched")
        assert(sweeps <= 7, s"iter $iter k=$k: more sweeps than rounds")
      }
    }
    // and on a corpus whose top pair counts are DISTINCT and
    // symbol-disjoint (each word its own alphabet, its own frequency),
    // k>1 really batches: sweep 1 lands 4 merges at once
    val big = Seq((1L, (Seq.fill(16)("ab") ++ Seq.fill(13)("cd") ++
      Seq.fill(9)("ef") ++ Seq.fill(5)("gh") ++ Seq.fill(2)("ij"))
        .mkString(" "))).toDF("doc_id", "text")
    val (bat, sw) = Bpe.trainMergesBatchedWithSweeps(
      Bpe.wordCounts(big), rounds = 5, batchK = 4)
    assert(bat == Bpe.trainMergesFromCounts(Bpe.wordCounts(big), rounds = 5))
    assert(sw == 2, s"expected 2 sweeps (4 merges + 1), got $sw")
  }

  test("property: greedy-disjoint sweeps accept disjoint sets with true counts") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val wordGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (iter <- 0 until 4) {
      val words = (0 until 10).map(i => sample(wordGen, 733L * iter + i))
      val reps = words.zipWithIndex.flatMap { case (w, i) =>
        Seq.fill(1 + (i * 5 + iter) % 4)(w) }
      val docs = Seq((1L, reps.mkString(" "))).toDF("doc_id", "text")
      val wc = Bpe.wordCounts(docs)
      val got = Bpe.trainMergesGreedySweeps(wc, sweeps = 3, batchK = 4)
      // within each sweep: accepted symbols pairwise disjoint (incl.
      // concatenations) and each accepted count is the TRUE pair count
      // under the merges accepted in earlier sweeps + earlier in this
      // sweep (disjointness ⇒ unchanged by sweep-mates: re-train
      // sequentially and compare the first accepted merge per sweep)
      got.groupBy(_._1).foreach { case (_, rows) =>
        val used = scala.collection.mutable.Set.empty[String]
        rows.sortBy(_._2).foreach { case (_, _, l, r, _) =>
          assert(!used(l) && !used(r), s"conflict accepted: ($l,$r)")
          used += l; used += r; used += (l + r)
        }
      }
      // determinism
      val again = Bpe.trainMergesGreedySweeps(wc, sweeps = 3, batchK = 4)
      assert(got == again)
      // the first sweep's first acceptance is the sequential argmax
      val seq1 = Bpe.trainMergesFromCounts(wc, rounds = 1).head
      val g1 = got.head
      assert((g1._3, g1._4, g1._5) == ((seq1._2, seq1._3, seq1._4)))
    }
    // greedy-until keeps sweeps ∝ R/k on a DISTINCT-count disjoint
    // corpus (where both modes batch fully)
    val big = Seq((1L, (Seq.fill(16)("ab") ++ Seq.fill(13)("cd") ++
      Seq.fill(9)("ef") ++ Seq.fill(5)("gh") ++ Seq.fill(2)("ij"))
        .mkString(" "))).toDF("doc_id", "text")
    val (gm, gsw) = Bpe.trainMergesGreedyUntil(
      Bpe.wordCounts(big), rounds = 5, batchK = 4)
    assert(gm.length == 5 && gsw == 2, s"expected 5 merges in 2 sweeps, got ${gm.length} in $gsw")
  }

  test("word-count fold law: training on wc(A) ⊕ wc(B) ≡ training on A ∪ B") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "lower lower lowest newer"), (2L, "newest lowest wider"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "newer newer widest lower"), (4L, "low new lowest"))
      .toDF("doc_id", "text")
    val folded = Bpe.mergeWordCounts(Bpe.wordCounts(a), Bpe.wordCounts(b))
    assert(Bpe.trainMergesFromCounts(folded, rounds = 8) ==
      Bpe.trainMerges(a.unionByName(b), rounds = 8))
  }

  test("fixed merges fixture is well-formed") {
    val products = scala.collection.mutable.Set.empty[String]
    Bpe.fixedMerges.foreach { case (l, r) =>
      for (side <- Seq(l, r))
        assert(side.length == 1 || products(side), s"side '$side'")
      products += (l + r)
    }
  }

  test("encodeTokens flattens per-word segmentation; countTokens is its size") {
    val s = spark
    import s.implicits._
    val ms = Bpe.fixedMerges
    val t = table(ms: _*)
    val df = Seq((1L, "the scan joins the line"), (2L, ""), (3L, "key"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextDsl.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        BpeFunctions.encodeTokens(col("tk"), ms).as("syms"),
        BpeFunctions.countTokens(col("tk"), ms).as("n"))
    df.collect().foreach { r =>
      val words = r.getSeq[String](1)
      val syms = r.getSeq[String](2)
      val expected = words.flatMap(w => t.segmentString(w))
      assert(syms == expected, s"doc ${r.getLong(0)}")
      assert(r.getLong(3) == expected.length.toLong)
    }
  }

  test("chunkCounts: greedy fill, oversized single word, budget boundary") {
    val t = table() // no merges: subword count = word length
    def chunks(ws: Seq[String], b: Long): Seq[(Long, Long)] = {
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ws.map(org.apache.spark.unsafe.types.UTF8String.fromString)
          .toArray[AnyRef])
      val out = t.chunkCounts(arr, b)
      (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
    }
    // 3+3 fills a 6-budget exactly; the next word opens chunk 2
    assert(chunks(Seq("abc", "def", "gh"), 6) == Seq((2L, 6L), (1L, 2L)))
    // a word longer than the budget is its own oversized chunk
    assert(chunks(Seq("abcdefgh", "ab"), 4) == Seq((1L, 8L), (1L, 2L)))
    // oversized word mid-stream flushes the open chunk first
    assert(chunks(Seq("ab", "abcdefgh", "cd"), 4) ==
      Seq((1L, 2L), (1L, 8L), (1L, 2L)))
    // empty input → no chunks
    assert(chunks(Seq(), 4) == Seq())
    // invariants on a longer random-ish stream: counts partition the
    // stream; every multi-word chunk respects the budget
    val ws = Seq("a", "bb", "ccc", "dddd", "e", "ff", "ggg", "hh", "i")
    val cs = chunks(ws, 5)
    assert(cs.map(_._1).sum == ws.length)
    assert(cs.map(_._2).sum == ws.map(_.length.toLong).sum)
    cs.foreach { case (nw, nsub) => assert(nw == 1 || nsub <= 5) }
  }

  private def byteTable(ms: (String, String)*): BpeTable =
    new BpeTable(ms.map(_._1).toArray, ms.map(_._2).toArray, byteLevel = true)

  private def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  test("byte-level: base symbols are UTF-8 bytes; astral spans 4, no unknowns") {
    val t = byteTable()
    assert(t.segmentString("ab").toSeq == Seq("61", "62"))
    // é = 2 UTF-8 bytes, U+1F600 = 4 — byte fallback covers both
    assert(t.segmentString("é").toSeq == Seq("C3", "A9"))
    val emoji = new String(Character.toChars(0x1F600))
    assert(t.segmentString(emoji).toSeq == Seq("F0", "9F", "98", "80"))
    assert(t.segmentString("a" + emoji).toSeq ==
      Seq("61", "F0", "9F", "98", "80"))
  }

  test("byte-level: concatenated symbols always restore the word's hex") {
    val t = byteTable(("61", "62"), ("6162", "63"))
    for (w <- Seq("abc", "abcabc", "xabcy", "résumé", "日本語",
        new String(Character.toChars(0x1F600)) * 2))
      assert(t.segmentString(w).mkString == hexOf(w), s"'$w'")
    assert(t.segmentString("abc").toSeq == Seq("616263"))
  }

  test("byte-level fixture merges mirror the char-level segmentation on ASCII") {
    val tc = table(Bpe.fixedMerges: _*)
    val tb = byteTable(Bpe.fixedMergesBytes: _*)
    for (w <- Seq("scan", "order", "the", "line", "agg", "join", "key",
        "scanner", "disordered", "keyline", "x", "aggregate"))
      assert(tb.segmentString(w).toSeq == tc.segmentString(w).toSeq.map(hexOf),
        s"'$w'")
  }

  test("byte-level training: well-formed over byte symbols, deterministic, applies") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "lower lower lowest newer newest wider widest low new"),
      (2L, "newest newest lowest wider lower new low low low")
    ).toDF("doc_id", "text")
    val trained = Bpe.trainMergesBytes(docs, rounds = 8)
    val products = scala.collection.mutable.Set.empty[String]
    trained.foreach { case (rank, l, r, cnt) =>
      assert(cnt >= 1, s"rank $rank count")
      for (side <- Seq(l, r))
        assert(side.length == 2 || products(side),
          s"rank $rank side '$side' is neither one byte nor an earlier product")
      products += (l + r)
    }
    assert(Bpe.trainMergesBytes(docs, rounds = 8) == trained)
    // the trained table drives the byte-level kernel: partition law
    val t = byteTable(trained.map { case (_, l, r, _) => (l, r) }: _*)
    for (w <- Seq("lower", "newest", "low", "unseen"))
      assert(t.segmentString(w).mkString == hexOf(w), s"'$w'")
  }

  test("segmentation survives codegen and interpreted paths identically") {
    val s = spark
    import s.implicits._
    val df = Seq("scanning", "ordered", "the", "aggregate", "x")
      .toDF("w")
    val compiled = df.select(col("w"),
      BpeFunctions.segmentWord(col("w"), Bpe.fixedMerges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val t = table(Bpe.fixedMerges: _*)
    compiled.foreach { case (w, syms) =>
      assert(syms == t.segmentString(w).toSeq, w)
    }
  }
}
