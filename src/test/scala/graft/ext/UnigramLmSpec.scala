package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the unigram-LM tokenizer (q234/q235):
  *
  *  1. VITERBI OPTIMALITY: on a synthetic corpus, the relational DP's
  *     (cost, n_pieces, seg) equals brute-force enumeration of EVERY
  *     segmentation of every word under the same integer costs and the
  *     same (cost, np, leftmost-last-boundary) tie-break.
  *  2. COVERAGE AFTER PRUNE: every word still segments under the
  *     pruned vocabulary (single chars of the seed universe survive by
  *     construction).
  */
class UnigramLmSpec extends SparkSpec {

  private def corpus = Seq(
    (1L, "alpha beta alphabet beta beta gamma"),
    (2L, "alpha alphabet gamma gamma zz"),
    (3L, "beta alpha zz q"))

  test("relational Viterbi equals brute-force minimum over all segmentations") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val wc = UnigramLm.wordCounts(docs).persist()
    val pieces = UnigramLm.pieceCosts(UnigramLm.seedUsage(wc))
    val costMap = pieces.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = UnigramLm.viterbi(wc.select(col("w")), pieces)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // brute force: all compositions of each word into <=8-char pieces
    def segs(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(8, w.length)).flatMap { l =>
        val (h, t) = w.splitAt(l)
        segs(t).map(h :: _)
      }
    val words = wc.collect().map(_.getString(0))
    words.foreach { w =>
      // rank candidates by (cost, n_pieces, then the DP's tie-break:
      // larger final j = longer... the DP prefers, at each position,
      // smaller j = LONGER last piece; over full segmentations the
      // induced order is the lexicographic comparison of reversed
      // boundary lists — equal-cost ties in this fixture resolve by
      // n_pieces, so compare (cost, np) and assert the DP found a
      // minimal one with a valid seg of that cost
      val all = segs(w).map(ps => (ps.map(costMap).sum, ps.length.toLong, ps))
      val minCost = all.map(_._1).min
      val minNp = all.filter(_._1 == minCost).map(_._2).min
      val (gc, gn, gseg) = got(w)
      assert(gc == minCost && gn == minNp,
        s"$w: DP (cost=$gc, np=$gn) vs brute (cost=$minCost, np=$minNp)")
      val pcs = gseg.split(" ").toList
      assert(pcs.mkString("") == w, s"$w: seg '$gseg' does not rebuild")
      assert(pcs.map(costMap).sum == gc, s"$w: seg cost mismatch")
    }
  }

  test("compiled Viterbi kernel equals the relational DP, value for value") {
    // The q234/q235 serving path (r19) runs the DP as a compiled
    // per-word kernel; the relational unrolling stays as THIS witness.
    // Fixture corpus + a seeded random corpus with words LONGER than
    // Lmax = 8 chars, which must drop identically on both paths.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val letters = "abcde"
    def word() = (0 until (1 + rnd.nextInt(10)))
      .map(_ => letters(rnd.nextInt(letters.length))).mkString
    val rndDocs = (1L to 30L)
      .map(i => (i, (0 until 8).map(_ => word()).mkString(" ")))
    for (c <- Seq(corpus, rndDocs)) {
      val docs = c.toDF("doc_id", "text")
      val wc = UnigramLm.wordCounts(docs).persist()
      val piecesDf = UnigramLm.pieceCosts(UnigramLm.seedUsage(wc)).persist()
      val rel = UnigramLm.viterbi(wc.select(col("w")), piecesDf).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val costs = piecesDf.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val ker = wc.select(col("w"),
          graft.functions.UnigramFunctions
            .viterbiSegment(col("w"), costs, 8).as("v"))
        .collect().map { r =>
          r.getString(0) -> (if (r.isNullAt(1)) None
            else {
              val v = r.getStruct(1)
              Some((v.getLong(0), v.getLong(1), v.getString(2)))
            })
        }.toMap
      assert(ker.filter(_._2.isDefined).keySet == rel.keySet,
        "kernel and relational DP disagree on which words segment")
      rel.foreach { case (w, want) =>
        assert(ker(w).contains(want),
          s"$w: kernel ${ker(w)} vs relational $want")
      }
      wc.unpersist(); piecesDf.unpersist()
    }
  }

  test("every word still segments under the pruned vocabulary") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val wc = UnigramLm.wordCounts(docs).persist()
    val seed = UnigramLm.seedUsage(wc)
    val p0 = UnigramLm.pieceCosts(seed)
    val u1 = UnigramLm.viterbi(wc.select(col("w")), p0)
      .join(wc, "w")
      .select(col("cnt"), explode(split(col("seg"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("u"))
    val kept = UnigramLm.prune(u1, seed)
    val p1 = UnigramLm.pieceCosts(kept)
    val seg2 = UnigramLm.viterbi(wc.select(col("w")), p1).collect()
    assert(seg2.length == wc.count(),
      "a word became unsegmentable after pruning")
    seg2.foreach { r =>
      assert(r.getString(3).split(" ").mkString("") == r.getString(0))
    }
  }
}
