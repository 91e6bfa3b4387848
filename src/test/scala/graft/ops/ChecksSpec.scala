package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {

  test("checks report violation counts; empty tables pass everything") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, null: String)).toDF("id", "name")
    val unique = Checks.uniqueness(df, "t", Seq("id")).head()
    assert(unique.getLong(2) == 1L && !unique.getBoolean(3))
    val nn = Checks.notNull(df, "t", "name").head()
    assert(nn.getLong(2) == 1L && !nn.getBoolean(3))
    val sat = Checks.satisfies(df, "t", "pos_id", col("id") > 0).head()
    assert(sat.getLong(2) == 0L && sat.getBoolean(3))
    // empty input: zero violations and a definite pass, never NULL
    val empty = df.filter(col("id") > 100)
    val satEmpty = Checks.satisfies(empty, "t", "pos_id", col("id") > 0).head()
    assert(!satEmpty.isNullAt(2) && satEmpty.getLong(2) == 0L && satEmpty.getBoolean(3))
  }

  test("referential check counts orphans") {
    val s = spark
    import s.implicits._
    val child = Seq(1L, 2L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Checks.referential(child, "fk", parent, "pk", "child").head()
    assert(r.getLong(2) == 1L && !r.getBoolean(3))
  }
}
