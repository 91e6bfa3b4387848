package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan traversal shared by PlanAuditSpec and the budget dump
  * tool: AQE hides materialized stages behind childless wrapper nodes,
  * so a naive `children` walk undercounts — unwrap them, and include
  * subquery plans (scalar subqueries carry their own exchanges). */
object PlanWalk {
  def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case q: QueryStageExec => collectAll(q.plan)
      case _ => Seq(p)
    }
    here ++ p.children.flatMap(collectAll) ++
      p.subqueries.flatMap(collectAll)
  }

  def shuffleCount(p: SparkPlan): Int =
    collectAll(p).count(_.isInstanceOf[ShuffleExchangeExec])
}

/** Dev tool: print every declared query's AQE-final shuffle-exchange
  * count at the given SF dir — the data PlanAuditSpec's budget map is
  * generated from. Re-run after an INTENTIONAL plan change and update
  * the budget entry with a justification; the spec failing on growth
  * is the point.
  *
  * Usage: scripts/run_main.sh graft.tools.ShuffleCounts [sfDir]
  */
object ShuffleCounts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // MUST match SparkSpec's session config: AQE finalizes plans
    // differently at different partition counts, and the budgets are
    // asserted in the test environment
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      df.collect() // finalize AQE
      println(s"SHUFFLES $name ${PlanWalk.shuffleCount(df.queryExecution.executedPlan)}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
