package graft.pipeline

import graft.SparkSpec

class ConsoleProgressSpec extends SparkSpec {

  test("progress listener observes tasks of the wrapped action (O8)") {
    val (sum, tasks) = ConsoleProgress.withProgress(spark, "test-step") {
      spark.range(0, 1000000, 1, 8).selectExpr("sum(id)").head().getLong(0)
    }
    assert(sum == 499999500000L)
    assert(tasks >= 8) // at least one task per input partition
  }

  test("listener detaches after the scope (no leakage into later jobs)") {
    val (_, t1) = ConsoleProgress.withProgress(spark, "a") {
      spark.range(0, 1000, 1, 2).count()
    }
    assert(t1 >= 2)
    // a job OUTSIDE the scope must not change the detached listener
    spark.range(0, 1000, 1, 2).count()
    assert(t1 >= 2)
  }
}
