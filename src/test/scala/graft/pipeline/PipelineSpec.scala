package graft.pipeline

import graft.SparkSpec

import java.time.Instant

/** Step-runner lifecycle per tools/tools.go:84-272: status transitions,
  * fail-fast with persisted Failed manifest, step reset on re-run,
  * knoll/stow, run-id format. */
class PipelineSpec extends SparkSpec {

  private def fixedClock(start: Long = 1700000000000L, stepMs: Long = 250L): () => Instant = {
    var t = start - stepMs
    () => { t += stepMs; Instant.ofEpochMilli(t) }
  }

  test("happy path: Pending -> Running -> Completed per step; stow completes run") {
    withTempDir { dir =>
      val run = new PipelineRun(spark, s"$dir/status.json", s"$dir/temp", fixedClock())
      run.knoll()
      assert(run.status == Status.Pending)
      run.executeStep("a") { 1 + 1 }
      run.executeStep("b") { "ok" }
      assert(run.stepStatuses.map(_.status).forall(_ == Status.Completed))
      assert(run.stepStatuses.forall(_.durationMillis > 0))
      run.stow()
      assert(run.status == Status.Completed)
      val manifest = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/status.json")), "UTF-8")
      assert(manifest.contains("\"Completed\""))
      assert(manifest.contains("\"runId\": \"run_"))
    }
  }

  test("fail-fast: step failure persists Failed manifest and rethrows (tools.go:97-116)") {
    withTempDir { dir =>
      val run = new PipelineRun(spark, s"$dir/status.json", s"$dir/temp", fixedClock())
      run.executeStep("ok") { () }
      val e = intercept[IllegalStateException] {
        run.executeStep("boom") { throw new IllegalStateException("injected") }
      }
      assert(e.getMessage == "injected")
      assert(run.status == Status.Failed)
      val manifest = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/status.json")), "UTF-8")
      assert(manifest.contains("\"Failed\""))
      assert(manifest.contains("injected"))
      // stow after a failure must NOT flip the run to Completed
      run.stow()
      assert(run.status == Status.Failed)
    }
  }

  test("re-running a step resets its bookkeeping (retry-aware, tools.go:126-132)") {
    withTempDir { dir =>
      val run = new PipelineRun(spark, s"$dir/status.json", s"$dir/temp", fixedClock())
      intercept[RuntimeException] {
        run.executeStep("flaky") { throw new RuntimeException("first") }
      }
      assert(run.stepStatuses.find(_.name == "flaky").get.status == Status.Failed)
      run.executeStep("flaky") { () } // second attempt succeeds
      val st = run.stepStatuses.find(_.name == "flaky").get
      assert(st.status == Status.Completed)
      assert(st.message.isEmpty)
      assert(run.stepStatuses.count(_.name == "flaky") == 1)
    }
  }

  test("knoll ensures + wipes the staging dir (tools.go:254-263)") {
    withTempDir { dir =>
      val temp = s"$dir/temp"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$temp/old"))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$temp/old/junk.txt"), "x".getBytes)
      val run = new PipelineRun(spark, s"$dir/status.json", temp, fixedClock())
      run.knoll()
      val t = new java.io.File(temp)
      assert(t.exists() && t.isDirectory)
      assert(t.listFiles().isEmpty)
    }
  }

  test("runId carries the wall-clock format run_yyyyMMdd_HHmmss.SSS (tools.go:86)") {
    withTempDir { dir =>
      val run = new PipelineRun(spark, s"$dir/status.json", s"$dir/temp",
        () => Instant.parse("2024-03-05T06:07:08.123Z"))
      assert(run.runId == "run_20240305_060708.123")
    }
  }
}
