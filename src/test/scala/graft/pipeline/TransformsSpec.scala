package graft.pipeline

import graft.SparkSpec
import graft.pipeline.Transforms.RetryConfig

import java.util.concurrent.atomic.AtomicInteger

class TransformsSpec extends SparkSpec {

  test("retry: zero-value config means no retries (tools.go:684-687)") {
    val calls = new AtomicInteger
    intercept[RuntimeException] {
      Transforms.retry(RetryConfig()) {
        calls.incrementAndGet(); throw new RuntimeException("x")
      }
    }
    assert(calls.get == 1)
  }

  test("retry: succeeds on a later attempt within maxRetries (tools.go:733-761)") {
    val calls = new AtomicInteger
    val out = Transforms.retry(RetryConfig(maxRetries = 3)) {
      if (calls.incrementAndGet() < 3) throw new RuntimeException("flaky") else "ok"
    }
    assert(out == "ok")
    assert(calls.get == 3)
  }

  test("retry: exhaustion rethrows the last error") {
    val calls = new AtomicInteger
    val e = intercept[RuntimeException] {
      Transforms.retry(RetryConfig(maxRetries = 2)) {
        throw new RuntimeException(s"attempt-${calls.incrementAndGet()}")
      }
    }
    assert(calls.get == 3) // 1 try + 2 retries
    assert(e.getMessage == "attempt-3")
  }

  test("typed transform maps records with Encoders (T1/T2)") {
    val s = spark
    import s.implicits._
    val in = Seq(ExamplePipeline.UserData("1", "Alice")).toDS()
    val out = Transforms.transform(in)(u =>
      ExamplePipeline.TransformedUserData(u.id, s"Processed_${u.name}_Individually", "t"))
    assert(out.collect().toSeq ==
      Seq(ExamplePipeline.TransformedUserData("1", "Processed_Alice_Individually", "t")))
  }

  test("load runs the per-record loader on executors with per-record retry (K4/ST3)") {
    val s = spark
    import s.implicits._
    // Accumulator: the loader runs in executor threads (local mode shares
    // the JVM, but the code path is foreachPartition, not driver collect).
    val acc = spark.sparkContext.longAccumulator("loaded")
    Transforms.load(Seq(1, 2, 3, 4).toDS(), RetryConfig(maxRetries = 1)) { _ =>
      acc.add(1)
    }
    assert(acc.value == 4)
  }
}
