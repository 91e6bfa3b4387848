package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {

  test("top_k == row_number window across a many-partition merge path") {
    val s = spark
    import s.implicits._
    // 40 groups × 250 rows over 16 partitions forces partial buffers to
    // serialize + merge; ties on v exercise the compound-struct ordering
    val df = spark.range(10000)
      .select((col("id") % 40).as("g"), (col("id") % 17).as("v"), col("id"))
      .repartition(16)
    val viaAgg = df.groupBy(col("g"))
      .agg(AggFunctions.topK(struct(col("v"), col("id")), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.v").as("v"), col("col.id").as("id"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").desc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("g", "rank", "v", "id")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaAgg.toSeq == viaWindow.toSeq)
    assert(viaAgg.length == 40 * 5)
  }

  test("top_k with k larger than the group returns the whole group, sorted desc") {
    val s = spark
    import s.implicits._
    val out = Seq((1L, 5L), (1L, 9L), (1L, 7L)).toDF("g", "v")
      .groupBy("g").agg(AggFunctions.topK(col("v"), 10).as("top"))
      .select(col("top")).head().getSeq[Long](0)
    assert(out == Seq(9L, 7L, 5L))
  }

  test("top_k skips nulls and works on string ordering") {
    val s = spark
    import s.implicits._
    val out = Seq(Some("b"), None, Some("z"), Some("a")).toDF("v")
      .agg(AggFunctions.topK(col("v"), 2).as("top"))
      .head().getSeq[String](0)
    assert(out == Seq("z", "b"))
  }
}
