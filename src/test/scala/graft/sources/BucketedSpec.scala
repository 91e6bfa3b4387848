package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class BucketedSpec extends SparkSpec {

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectAll(q.plan) // a shuffle hidden in a stage must still fail
      case _ => Seq(p)
    }
    here ++ p.children.flatMap(collectAll)
  }

  test("co-bucketed join: sort-merge with ZERO shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = graft.Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    Bucketed.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketed.writeBucketed(cust, "b_cust", "o_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-or-not decision to matter (no broadcast escape)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val joined = Bucketed.cobucketedJoin(spark, "b_orders", "b_cust", "o_custkey")
      assert(joined.collect().nonEmpty)
      val shuffles = collectAll(joined.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan.treeString.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }
}
