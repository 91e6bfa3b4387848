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

  test("NearDup.exact keeps min-id survivor with copy counts") {
    val s = spark
    import s.implicits._
    val df = Seq((5L, "x"), (3L, "x"), (9L, "y"), (1L, "x")).toDF("id", "norm")
    val out = NearDup.exact(df, col("id"), col("norm"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((1L, 3L), (9L, 1L)))
  }
}
