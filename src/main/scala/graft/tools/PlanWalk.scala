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

/** Dev tool: measure every declared query's AQE-final shuffle-exchange
  * count under the FULL environment matrix (local[4]/4 partitions —
  * SparkSpec's config — and local[8]/8, where AQE finalization is known
  * to differ on a handful of queries) and write the matrix as
  * `PLAN_BUDGETS.json`, committed per round. The artifact closes the
  * slack-comment loophole: PlanAuditSpec asserts every hand-maintained
  * budget is measured-max plus AT MOST one justified AQE-slack
  * exchange, so a budget can only drift from reality by regenerating
  * this file — and the regeneration shows as a reviewable git diff, a
  * real +1 exchange can never hide behind a stale "+1 slack" comment.
  *
  * Re-run after an INTENTIONAL plan change, commit the diff, and update
  * the budget entry with a justification; the spec failing on growth
  * is the point.
  *
  * Usage: scripts/run_main.sh graft.tools.ShuffleCounts [sfDir] [outJson]
  */
object ShuffleCounts {
  /** The environment matrix: AQE-final exchange counts depend on
    * parallelism (partition-count heuristics fold small exchanges
    * differently), so budgets must cover every config the suite or a
    * dev shell might execute under. */
  private val envs = Seq("local4" -> (4, 4), "local8" -> (8, 8))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLAN_BUDGETS.json")
    val matrix = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, Int]]
    envs.foreach { case (env, (threads, parts)) =>
      val spark = SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val df = fn(spark, dir)
        df.collect() // finalize AQE
        val n = PlanWalk.shuffleCount(df.queryExecution.executedPlan)
        println(s"SHUFFLES $env $name $n")
        matrix.getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap.empty) += (env -> n)
        spark.catalog.clearCache()
      }
      // a fresh context per environment: master/parallelism are fixed
      // at context creation
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    val json = matrix.toSeq.sortBy(_._1).map { case (name, byEnv) =>
      val cells = byEnv.map { case (e, n) => s""""$e": $n""" }.mkString(", ")
      s"""  "$name": {$cells}"""
    }.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"== wrote ${matrix.size} queries x ${envs.size} envs -> $out")
  }
}
