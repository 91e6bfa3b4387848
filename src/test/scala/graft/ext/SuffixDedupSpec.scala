package graft.ext

import graft.SparkSpec

/** Law tests for [[SuffixDedup]] (q230/q231): the distributed
  * suffix-rank construction must equal BRUTE-FORCE repeated-substring
  * analysis — for every position of every planted corpus, the maximal
  * repeated-match length ℓ(p) from the doubling build + adjacency LCP
  * equals max over ALL other positions of the direct token LCP. The
  * planted corpora exercise the shapes that break naive suffix logic:
  * containment (one doc inside another), same-document periodicity,
  * shared blocks at different offsets, suffixes equal to doc ends
  * (rank ties), and a seeded random corpus over a small vocabulary
  * (dense accidental repeats). */
class SuffixDedupSpec extends SparkSpec {

  /** Whitespace tokens — fixtures use plain lowercase words, so this
    * matches the engine's tokenize kernel on these inputs. */
  private def toks(t: String): Vector[String] =
    t.split(" ").filter(_.nonEmpty).toVector

  /** Brute-force ℓ(p): max direct LCP against every other position. */
  private def bruteLens(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sufs = for {
      (id, t) <- docs
      tk = toks(t)
      p <- tk.indices
    } yield (id, p.toLong, tk.drop(p))
    def lcp(a: Vector[String], b: Vector[String]): Long =
      a.iterator.zip(b.iterator).takeWhile { case (x, y) => x == y }
        .size.toLong
    sufs.map { case (id, p, suf) =>
      val best = sufs.iterator
        .filter { case (id2, p2, _) => (id2, p2) != (id, p) }
        .map { case (_, _, suf2) => lcp(suf, suf2) }
        .max
      (id, p) -> best
    }.toMap
  }

  private def engineLens(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val s = spark
    import s.implicits._
    SuffixDedup.maxRepeatLens(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
  }

  private def assertLaw(docs: Seq[(Long, String)]): Unit = {
    val brute = bruteLens(docs)
    val got = engineLens(docs)
    assert(got.keySet == brute.keySet,
      s"position sets differ: missing=${brute.keySet -- got.keySet} " +
        s"extra=${got.keySet -- brute.keySet}")
    val diffs = brute.collect {
      case (k, v) if got(k) != v => (k, v, got(k))
    }
    assert(diffs.isEmpty, s"ℓ(p) mismatches (pos, brute, engine): " +
      diffs.take(10).mkString(", "))
  }

  private def words(n: Int, tag: String) =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("containment: a doc fully inside another matches to its end at every position") {
    val inner = words(25, "c")
    val docs = Seq(
      (1L, inner),
      (2L, words(5, "pre") + " " + inner + " " + words(4, "post")),
      (3L, words(20, "u")))
    assertLaw(docs)
  }

  test("shared block at different offsets, plus suffix-equal doc ends (rank ties)") {
    val block = words(30, "b")
    val docs = Seq(
      (1L, words(7, "a") + " " + block),          // block at offset 7, to end
      (2L, block + " " + words(9, "z")),          // block at offset 0
      (3L, words(6, "q") + " " + block))          // same END as doc 1's tail
    assertLaw(docs)
  }

  test("same-document periodicity: repeats within one doc count") {
    val unit = words(9, "p")
    val docs = Seq(
      (1L, Seq.fill(4)(unit).mkString(" ")),      // period 9, 36 tokens
      (2L, words(15, "w")))
    assertLaw(docs)
  }

  test("seeded random corpus over a tiny vocabulary equals brute force everywhere") {
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    val docs = (0L until 24L).map { id =>
      val n = 12 + rnd.nextInt(30)
      id -> (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assertLaw(docs)
  }

  test("coverage and removal agree with the span set on a planted corpus") {
    val s = spark
    import s.implicits._
    // doc 1 and 2 share a 22-token block (>= MinL 20); doc 3 is clean
    val block = words(22, "s")
    val docs = Seq(
      (1L, words(4, "a") + " " + block + " " + words(5, "e")), // 31 toks
      (2L, block + " " + words(6, "f")),                       // 28 toks
      (3L, words(25, "u"))).toDF("doc_id", "text")
    val cov = SuffixDedup.suffixRepeatCoverage(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // doc 1: positions 4..6 carry lcp 22,21,20 -> union [4, 26) = 22
    // covered, max 22; doc 2: positions 0..2 likewise; doc 3: nothing
    assert(cov.toSeq == Seq(
      (1L, 31L, 22L, 70L, 22L),
      (2L, 28L, 22L, 78L, 22L),
      (3L, 25L, 0L, 0L, 0L)))
    val rem = SuffixDedup.removeSuffixRepeats(docs,
        SuffixDedup.repeatSpans(docs))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rem.toSeq == Seq(
      (1L, 31L, 9L, 22L),
      (2L, 28L, 6L, 22L),
      (3L, 25L, 25L, 0L)))
  }
}
