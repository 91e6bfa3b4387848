package graft.ext

import graft.SparkSpec

/** Contract tests for [[Dedup.repeatedSpanCoverage]] (q123): the
  * interval-union sweep, same-document repetition, and the
  * short/empty-document edges. Span length L = 10 tokens. */
class RepeatedSpanSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    Dedup.repeatedSpanCoverage(docs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  private def words(n: Int, tag: String) = (0 until n).map(i => s"$tag$i").mkString(" ")

  test("two identical 10-token docs are fully covered; a unique doc is untouched") {
    val a = words(10, "x")
    val got = run(Seq((1L, a), (2L, a), (3L, words(10, "u"))))
    assert(got.toSeq == Seq(
      (1L, 10L, 1L, 10L, 100L),
      (2L, 10L, 1L, 10L, 100L),
      (3L, 10L, 0L, 0L, 0L)))
  }

  test("overlapping repeated spans union, not sum") {
    // doc 1 and 2 share an identical 12-token prefix -> spans at pos 0,1,2
    // overlap; covered = 12 (the union), not 30
    val shared = words(12, "s")
    val got = run(Seq(
      (1L, shared + " " + words(8, "a")), // 20 tokens
      (2L, shared + " " + words(8, "b"))))
    assert(got.toSeq == Seq(
      (1L, 20L, 3L, 12L, 60L),
      (2L, 20L, 3L, 12L, 60L)))
  }

  test("repetition WITHIN one document counts (same-doc spans repeat)") {
    // one doc, the same 10 tokens twice: shingle at pos 0 == shingle at
    // pos 10; the in-between bridging shingles are unique
    val t = words(10, "r")
    val got = run(Seq((1L, t + " " + t)))
    val (_, nTok, nSpans, covered, pct) = got.head
    assert(nTok == 20L && nSpans == 2L && covered == 20L && pct == 100L)
  }

  test("documents shorter than L tokens and empty documents emit zero coverage") {
    val got = run(Seq((1L, "just a few tokens"), (2L, ""), (3L, words(10, "z"))))
    assert(got.toSeq == Seq(
      (1L, 4L, 0L, 0L, 0L),
      (2L, 0L, 0L, 0L, 0L),
      (3L, 10L, 0L, 0L, 0L)))
  }

  private def runRemoval(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    Dedup.removeRepeatedSpans(docs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
  }

  test("removal cuts exactly the covered tokens and rejoins the rest in order") {
    val shared = words(10, "p")
    val head = words(5, "h"); val tail = words(5, "t")
    val got = runRemoval(Seq(
      (1L, shared),
      (2L, head + " " + shared + " " + tail)))
    // doc 1 fully covered -> empty text, not a dropped row
    assert(got(0) == ((1L, 10L, 0L, 10L, "")))
    // doc 2: the embedded copy cut, head/tail survive in order
    assert(got(1) == ((2L, 20L, 10L, 10L, head + " " + tail)))
  }

  test("removal leaves a repeat-free corpus byte-identical (token-normalized)") {
    val got = runRemoval(Seq((1L, "alpha beta gamma"), (2L, words(10, "u"))))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 0L, "alpha beta gamma"),
      (2L, 10L, 10L, 0L, words(10, "u"))))
  }

  test("spanContamination: only train-present spans count — eval-internal repeats do not") {
    val s = spark
    import s.implicits._
    val trainPara = words(10, "tr")
    val train = Seq((1L, trainPara + " " + words(10, "x"))).toDF("doc_id", "text")
    val evalSelfRep = words(10, "e") // appears TWICE in eval doc 11, never in train
    val eval = Seq(
      (10L, words(5, "h") + " " + trainPara + " " + words(5, "t")), // quotes train
      (11L, evalSelfRep + " " + evalSelfRep), // eval-internal duplicate only
      (12L, words(20, "c")) // clean
    ).toDF("doc_id", "text")
    val got = Dedup.spanContamination(train, eval)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (10L, 20L, 1L, 10L, 50L), // the quoted paragraph, nothing else
      (11L, 20L, 0L, 0L, 0L),   // self-repetition is q123's business, not contamination
      (12L, 20L, 0L, 0L, 0L)))
  }

  test("property: coverage equals the brute-force position-set union on random corpora") {
    val s = spark
    import s.implicits._
    // random docs over a tiny vocabulary force heavy accidental span
    // repetition; the relational sweep must equal a brute-force scalar
    // model (hash every 10-shingle, count corpus-wide, union covered
    // position sets per doc) on every document
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c")
    val docs = (1L to 60L).map { id =>
      val n = 5 + rnd.nextInt(30)
      (id, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // scalar model
    val toks = docs.map { case (id, t) => id -> t.split(" ").toVector }.toMap
    val shingleOf = (tk: Vector[String], i: Int) => tk.slice(i, i + 10).mkString(" ")
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, tk) <- toks; i <- 0 to tk.size - 10) counts(shingleOf(tk, i)) =
      counts.getOrElse(shingleOf(tk, i), 0) + 1
    val expected = toks.map { case (id, tk) =>
      val spans = (0 to tk.size - 10).filter(i => counts(shingleOf(tk, i)) >= 2)
      val covered = spans.flatMap(i => i until i + 10).toSet
      id -> (tk.size.toLong, spans.size.toLong, covered.size.toLong)
    }
    val got = Dedup.repeatedSpanCoverage(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: engine ${got(id)} != scalar model $e")
    }
  }

  test("partial overlap: a doc embedding another doc's text is covered only there") {
    val shared = words(10, "p")
    val got = run(Seq(
      (1L, shared),
      (2L, words(30, "q") + " " + shared))) // 40 tokens, last 10 covered
    assert(got.toSeq == Seq(
      (1L, 10L, 1L, 10L, 100L),
      (2L, 40L, 1L, 10L, 25L)))
  }

  // ------------------------------------------------------------------
  // Multi-L sweep (q206/q207): spans from different lengths UNION.

  private def runMulti(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    Dedup.repeatedSpanCoverageMulti(docs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
  }

  test("multi-L: a 60-token shared block fires all three lengths, covered is the union") {
    val shared = words(60, "m")
    val got = runMulti(Seq(
      (1L, shared + " " + words(10, "a")),
      (2L, shared + " " + words(10, "b"))))
    // per doc: 51 repeated 10-spans, 41 20-spans, 11 50-spans — and the
    // covered tokens are the 60-token UNION, not 51·10 + 41·20 + 11·50
    got.foreach { case (_, nTok, nSpans, l10, l20, l50, covered) =>
      assert(nTok == 70L)
      assert((l10, l20, l50) == ((51L, 41L, 11L)), s"per-L counts ($l10,$l20,$l50)")
      assert(nSpans == 103L && covered == 60L)
    }
  }

  test("multi-L: a block only L=10 can see still flows through the union sweep") {
    // 12 shared tokens: L=10 fires (3 spans), L=20/50 cannot exist
    val shared = words(12, "s")
    val got = runMulti(Seq(
      (1L, shared + " " + words(8, "a")),
      (2L, shared + " " + words(8, "b"))))
    got.foreach { case (_, nTok, nSpans, l10, l20, l50, covered) =>
      assert(nTok == 20L && nSpans == 3L)
      assert((l10, l20, l50) == ((3L, 0L, 0L)))
      assert(covered == 12L)
    }
  }

  test("multi-L removal cuts the cross-length union of covered positions") {
    val s = spark
    import s.implicits._
    val shared = words(60, "m")
    val docs = Seq(
      (1L, shared + " " + words(10, "a")),
      (2L, shared + " " + words(10, "b"))).toDF("doc_id", "text")
    val got = Dedup.removeRepeatedSpansMulti(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    got.zip(Seq("a", "b")).foreach { case ((_, nTok, kept, removed, text), tag) =>
      assert(nTok == 70L && kept == 10L && removed == 60L)
      assert(text == words(10, tag))
    }
  }
}
