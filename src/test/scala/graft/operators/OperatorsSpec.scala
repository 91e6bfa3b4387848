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

  test("editDistancePairs: typo pairs found in-block, blocks never cross, caps drop") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "red bolt"), (2L, "rad bolt"),   // dist 1, same block
      (3L, "red gear"),                     // other block
      (4L, "redd bolt"),                    // dist 1 from "red bolt" but
                                            // different length → other block
      (5L, "blu bolt")                      // dist 2 from "red bolt": filtered
    ).toDF("id", "name")
    val blk = concat(element_at(split(col("name"), " "), 2),
      lit("#"), length(col("name")).cast("string"))
    val out = NearDup.editDistancePairs(df, col("id"), col("name"), blk, maxDist = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(out == Set((1L, 2L, 1)))
    // cap: the bolt#8 block (ids 1, 2, 5) exceeds maxBucket=2 and is
    // dropped whole — no pairs remain (the other blocks are singletons)
    val capped = NearDup.editDistancePairs(df, col("id"), col("name"), blk,
      maxDist = 1, maxBucket = 2)
    assert(capped.count() == 0)
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
