package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {

  test("saltedEquiJoin == plain join on a skewed key distribution") {
    val s = spark
    import s.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong else 7L, s"l$i")).toDF("k", "lv")
    val right = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty"), (999L, "none-matching-left"))
      .toDF("k", "rv")
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    val salted = Joins.saltedEquiJoin(left, right, "k", salts = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("asOf picks the single latest match per group with tie-breaks") {
    val s = spark
    import s.implicits._
    val events = Seq((1L, 100L), (2L, 50L)).toDF("eid", "t")
    val facts = Seq(
      (1L, 90L, "a"), (1L, 95L, "b"), (1L, 95L, "c"), (1L, 101L, "late"),
      (2L, 10L, "x")).toDF("fid", "ft", "v")
    val out = Joins.asOf(events, facts,
        col("eid") === col("fid") && col("ft") <= col("t"),
        groupCols = Seq(col("eid")),
        ordering = Seq(col("ft"), col("v")),
        payload = struct(col("ft"), col("v")))
      .select(col("eid"), col("asof.ft"), col("asof.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    // eid 1: ft=95 wins (101 excluded), tie v='c' > 'b'; eid 2: the only row
    assert(out.toSeq == Seq((1L, 95L, "c"), (2L, 10L, "x")))
  }

  test("asOfLast == asOf: same answer from the linear windowed plan") {
    val s = spark
    import s.implicits._
    // includes: ties at the as-of instant (inclusive <=), multiple right
    // rows at the same ts (tie-break by v), a left row with no match,
    // and a key missing from the right side entirely
    val events = Seq((1L, 100L, "e1"), (1L, 95L, "e2"), (2L, 50L, "e3"),
      (2L, 5L, "e4"), (3L, 77L, "e5")).toDF("eid", "t", "tag")
    val facts = Seq(
      (1L, 90L, "a"), (1L, 95L, "b"), (1L, 95L, "c"), (1L, 101L, "late"),
      (2L, 10L, "x")).toDF("fid", "ft", "v")
    val viaJoin = Joins.asOf(events, facts,
        col("eid") === col("fid") && col("ft") <= col("t"),
        groupCols = Seq(col("eid"), col("t")),
        ordering = Seq(col("ft"), col("v")),
        payload = struct(col("ft"), col("v")))
      .select(col("eid"), col("t"), col("asof.ft"), col("asof.v"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val viaWindow = Joins.asOfLast(events, facts,
        leftKey = col("eid"), rightKey = col("fid"),
        leftTs = col("t"), rightTs = col("ft"),
        leftPayload = struct(col("tag")),
        rightPayload = struct(col("ft"), col("v")),
        rightOrder = Seq(col("v")))
      .filter(col("asof").isNotNull) // asOf's join is inner
      .select(col("key"), col("ts"), col("asof.ft"), col("asof.v"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaWindow.toSeq == viaJoin.toSeq)
    assert(viaJoin.length == 3) // e4 (t=5 < first fact) and eid 3 drop out
  }

  test("asOfLast keeps unmatched left rows as null asof") {
    val s = spark
    import s.implicits._
    val events = Seq((9L, 10L, "lonely")).toDF("eid", "t", "tag")
    val facts = Seq((9L, 20L, "later")).toDF("fid", "ft", "v")
    val out = Joins.asOfLast(events, facts,
      col("eid"), col("fid"), col("t"), col("ft"),
      struct(col("tag")), struct(col("v"))).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("asOfLast: null keys never match (join semantics, not window-null grouping)") {
    val s = spark
    import s.implicits._
    val events = Seq((Option.empty[Long], 10L, "nk")).toDF("eid", "t", "tag")
    val facts = Seq((Option.empty[Long], 5L, "phantom")).toDF("fid", "ft", "v")
    val out = Joins.asOfLast(events, facts,
      col("eid"), col("fid"), col("t"), col("ft"),
      struct(col("tag")), struct(col("v"))).collect()
    // null === null is false in a join: the null-keyed left row must NOT
    // pick up the null-keyed right row
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("NearDup.exact keeps min-id survivor with copy counts") {
    val s = spark
    import s.implicits._
    val df = Seq((5L, "x"), (3L, "x"), (9L, "y"), (1L, "x")).toDF("id", "norm")
    val out = NearDup.exact(df, col("id"), col("norm"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((1L, 3L), (9L, 1L)))
  }

  test("editDistancePairs + deletionVariants: full dist-1 recall, exact verify, caps drop") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "red bolt"),   // substitution pair with 2
      (2L, "rad bolt"),
      (3L, "red gear"),   // dist 3 from "red bolt": no pair
      (4L, "redd bolt"),  // insertion pair with 1 (cross-length!)
      (5L, "blu bolt")    // dist 2 from "red bolt": candidate via shared
                          // variant? no — differs in 2 chars, no shared key
    ).toDF("id", "name")
    val out = NearDup.editDistancePairs(df, col("id"), col("name"),
        NearDup.deletionVariants(col("name")), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // substitution (1,2) and cross-length insertion (1,4); nothing else
    assert(out == Set((1L, 2L, 1), (1L, 4L, 1)))
    // and the full set equals an all-pairs brute force
    val names = df.collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib, lev(na, nb))).toSet
    assert(out == brute, s"engine $out vs brute $brute")
    // cap: with maxBucket=1 every multi-member variant bucket drops
    val capped = NearDup.editDistancePairs(df, col("id"), col("name"),
      NearDup.deletionVariants(col("name")), maxDist = 1, maxBucket = 1)
    assert(capped.count() == 0)
  }

  test("editDistancePairs unicode: engine semantics are codepoint-level, incl. astral") {
    // Pins the ENGINE-side definition q88's doc states: Spark's
    // levenshtein and deletionVariants (length/substr) operate on
    // Unicode CODE POINTS — an astral emoji counts once — so the
    // deletion-key recall lemma holds for non-ASCII input too. (DuckDB's
    // levenshtein counts UTF-8 BYTES — 'café'→'cafe' is 2 there — so the
    // cross-engine q88 oracle is an ASCII-input contract; see the
    // editDistancePairs doc.)
    val s = spark
    import s.implicits._
    def levCp(a: String, b: String): Int = {
      val x = a.codePoints().toArray; val y = b.codePoints().toArray
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val cps = "aé日😀β".codePoints().toArray // 1-, 2-, 3-, 4-byte UTF-8
    val g = new scala.util.Random(11)
    def rand(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(cps(g.nextInt(cps.length))))).mkString
    val pairs = (0 until 60).map(_ => (rand(1 + g.nextInt(5)), rand(1 + g.nextInt(5)))) ++
      Seq(("café", "cafe"), ("日本語", "日本"), ("a😀b", "ab"), ("😀", "😁"))
    val got = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).collect().map(_.getInt(0))
    pairs.zip(got).foreach { case ((a, b), d) =>
      assert(d == levCp(a, b), s"levenshtein('$a','$b'): engine $d != codepoint DP ${levCp(a, b)}")
    }
    // deletionVariants removes one CODE POINT per variant (astral intact)
    val vs = Seq(Tuple1("a😀b")).toDF("t")
      .select(NearDup.deletionVariants(col("t")).as("v"))
      .head().getSeq[String](0).toSet
    assert(vs == Set("a😀b", "😀b", "ab", "a😀"))
    // recall lemma in codepoint space: any dist-≤1 pair shares a key
    val bases = (0 until 30).map(_ => rand(2 + g.nextInt(4)))
    val edited = bases.map { b =>
      val arr = b.codePoints().toArray
      val i = g.nextInt(arr.length)
      g.nextInt(3) match {
        case 0 => new String(arr.updated(i, cps(g.nextInt(cps.length))), 0, arr.length)
        case 1 => new String(arr.patch(i, Nil, 1), 0, arr.length - 1)
        case _ => new String(arr.patch(i, Seq(cps(g.nextInt(cps.length))), 0), 0, arr.length + 1)
      }
    }
    val keyRows = (bases ++ edited).toDF("t")
      .select(col("t"), NearDup.deletionVariants(col("t")).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    bases.zip(edited).foreach { case (b, e) =>
      if (b != e)
        assert((keyRows(b) & keyRows(e)).nonEmpty, s"no shared key: '$b' vs '$e'")
    }
  }

  test("deletionVariants: the key set is {s} ∪ single-deletions") {
    val s = spark
    import s.implicits._
    val vs = Seq(Tuple1("abc")).toDF("t")
      .select(NearDup.deletionVariants(col("t")).as("v"))
      .head().getSeq[String](0).toSet
    assert(vs == Set("abc", "bc", "ac", "ab"))
    // property: any two strings at edit distance 1 share a key
    val g = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val base = (0 until (3 + g.nextInt(6))).map(_ => ('a' + g.nextInt(3)).toChar).mkString
      val edited = g.nextInt(3) match {
        case 0 => // substitution
          val i = g.nextInt(base.length)
          base.updated(i, ('a' + g.nextInt(3)).toChar)
        case 1 => // deletion
          val i = g.nextInt(base.length)
          base.substring(0, i) + base.substring(i + 1)
        case _ => // insertion
          val i = g.nextInt(base.length + 1)
          base.substring(0, i) + ('a' + g.nextInt(3)).toChar + base.substring(i)
      }
      def keys(x: String): Set[String] =
        Set(x) ++ x.indices.map(i => x.substring(0, i) + x.substring(i + 1))
      assert(keys(base).intersect(keys(edited)).nonEmpty,
        s"no shared key for '$base' ~ '$edited'")
    }
  }

  test("minhashLshIncremental == full pass filtered to pairs with a new member") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(NearDup.minhashLsh(docs, col("doc_id"), col("text")))
    val inc = pairs(NearDup.minhashLshIncremental(docs,
      col("doc_id"), col("text"), col("doc_id") % 2 === 1))
    assert(inc == full.filter { case (a, b, _) => a % 2 == 1 || b % 2 == 1 })
    // sanity: the fixture actually exercises both kept and dropped pairs
    assert(inc.nonEmpty && inc.size < full.size)
    spark.catalog.clearCache()
  }
}
