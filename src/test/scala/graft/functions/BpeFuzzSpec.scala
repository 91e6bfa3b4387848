package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz suite for the BPE kernels — the CodecFuzzSpec discipline
  * applied to [[BpeTable]]: random unicode words (ASCII, multi-byte,
  * astral, combining marks) under random merges tables, both
  * char-level and byte-level, must either segment into a PARTITION of
  * the word (concatenation restores it — the round-trip law the
  * oracle's replace-fold shares) or fail fast at construction with a
  * named error. Malformed tables (empty symbols, length mismatch)
  * must never mis-segment silently. */
class BpeFuzzSpec extends AnyFunSuite {

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val codePointGen: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf('a', 'b', 'c', 'd', 'e', 'z', '0', '9').map(_.toString),
    2 -> Gen.oneOf("é", "ß", "日", "本", "語", "ü"),
    1 -> Gen.oneOf(0x1F600, 0x1F4A9, 0x10348).map(cp =>
      new String(Character.toChars(cp))),
    1 -> Gen.const("é")) // combining acute: two code points

  private val wordGen: Gen[String] =
    Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, codePointGen).map(_.mkString))

  private def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  /** Random merges over random (possibly nonsense) non-empty symbols —
    * NOT necessarily well-formed: duplicate ranks, unreachable sides,
    * later-rank products reused earlier, self-pairs. The kernel's
    * greedy semantics are total over these; only EMPTY symbols are
    * rejected. */
  private def randomTable(seed: Long, byteLevel: Boolean): BpeTable = {
    val symGen =
      if (byteLevel)
        Gen.choose(1, 3).flatMap(n => Gen.listOfN(n,
          Gen.oneOf("61", "62", "63", "C3A9", "F09F9880")).map(_.mkString))
      else
        Gen.choose(1, 3).flatMap(n => Gen.listOfN(n,
          Gen.oneOf("a", "b", "c", "é", "日")).map(_.mkString))
    val n = sample(Gen.choose(0, 8), seed)
    val pairs = (0 until n).map(i =>
      (sample(symGen, seed * 31 + i), sample(symGen, seed * 37 + i)))
    new BpeTable(pairs.map(_._1).toArray, pairs.map(_._2).toArray, byteLevel)
  }

  test("char-level: segmentation is always a partition of the word") {
    for (iter <- 0 until 200) {
      val t = randomTable(1000L + iter, byteLevel = false)
      for (k <- 0 until 5) {
        val w = sample(wordGen, 5000L + 10 * iter + k)
        val syms = t.segmentString(w)
        assert(syms.mkString == w, s"'$w' under table $iter")
        assert(syms.forall(_.nonEmpty))
      }
    }
  }

  test("byte-level: segmentation always partitions the word's UTF-8 hex") {
    for (iter <- 0 until 200) {
      val t = randomTable(2000L + iter, byteLevel = true)
      for (k <- 0 until 5) {
        val w = sample(wordGen, 7000L + 10 * iter + k)
        val syms = t.segmentString(w)
        assert(syms.mkString == hexOf(w), s"'$w' under table $iter")
        // every symbol is whole bytes: even length, hex alphabet
        assert(syms.forall(s => s.length % 2 == 0 &&
          s.forall(c => c.isDigit || (c >= 'A' && c <= 'F'))))
      }
    }
  }

  test("segmentation is deterministic and cache-consistent") {
    for (iter <- 0 until 50) {
      val t = randomTable(3000L + iter, byteLevel = iter % 2 == 0)
      val w = sample(wordGen, 9000L + iter)
      val first = t.segmentString(w).toSeq
      // second call hits the per-task cache; a fresh table recomputes
      assert(t.segmentString(w).toSeq == first)
      val fresh = new BpeTable(t.lefts, t.rights, t.byteLevel)
      assert(fresh.segmentString(w).toSeq == first)
    }
  }

  test("malformed tables fail fast with named errors, never mis-segment") {
    val e1 = intercept[IllegalArgumentException](
      new BpeTable(Array("a", ""), Array("b", "c")))
    assert(e1.getMessage.contains("empty merge symbol at rank 2"))
    val e2 = intercept[IllegalArgumentException](
      new BpeTable(Array("a", null), Array("b", "c")))
    assert(e2.getMessage.contains("empty merge symbol"))
    val e3 = intercept[IllegalArgumentException](
      new BpeTable(Array("a", "b"), Array("c")))
    assert(e3.getMessage.contains("lefts"))
  }

  test("degenerate-but-legal tables: duplicate ranks, cycles, self-pairs") {
    // duplicate rank: second application is a no-op unless later merges
    // recreated the pair — either way the partition law must hold
    val dup = new BpeTable(Array("a", "a"), Array("b", "b"))
    assert(dup.segmentString("abab").mkString == "abab")
    // self-pair chain ("aa"+"aa") — exercises non-overlap within a pass
    val self = new BpeTable(Array("a", "aa"), Array("a", "aa"))
    assert(self.segmentString("a" * 9).mkString == "a" * 9)
    // "cycle": (a,b) then (ab,ab) then a pair naming the product again
    val cyc = new BpeTable(Array("a", "ab", "abab"), Array("b", "ab", "abab"))
    for (n <- 1 to 6)
      assert(cyc.segmentString("ab" * n).mkString == "ab" * n)
  }
}
