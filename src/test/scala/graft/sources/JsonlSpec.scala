package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

class JsonlSpec extends SparkSpec {

  private val schema = StructType.fromDDL("id STRING, name STRING")

  test("round-trip: write then read preserves records") {
    withTempDir { dir =>
      val s = spark
      import s.implicits._
      val df = Seq(("1", "Alice"), ("2", "Bob")).toDF("id", "name")
      Jsonl.write(df, s"$dir/out")
      val back = Jsonl.read(spark, s"$dir/out", schema)
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(back.toSeq == Seq(("1", "Alice"), ("2", "Bob")))
    }
  }

  test("blank and whitespace-only lines are skipped (tools.go:533-535)") {
    withTempDir { dir =>
      val f = dir.resolve("data.jsonl")
      java.nio.file.Files.write(f,
        "{\"id\":\"1\",\"name\":\"A\"}\n\n   \n{\"id\":\"2\",\"name\":\"B\"}\n".getBytes)
      val rows = Jsonl.read(spark, f.toString, schema).collect()
      assert(rows.length == 2)
    }
  }

  test("whole-file multiLine JSON read parses a pretty-printed manifest (S6)") {
    withTempDir { dir =>
      val run = new graft.pipeline.PipelineRun(spark, s"$dir/status.json", s"$dir/tmp")
      run.executeStep("a") { () }
      run.stow()
      val manifest = Jsonl.readWholeFile(spark, s"$dir/status.json",
        StructType.fromDDL("runId STRING, status STRING, startTime STRING"))
        .head()
      assert(manifest.getString(0).startsWith("run_"))
      assert(manifest.getString(1) == "Completed")
    }
  }

  test("malformed line fails fast (tools.go:540-542 FAILFAST semantics)") {
    withTempDir { dir =>
      val f = dir.resolve("bad.jsonl")
      java.nio.file.Files.write(f,
        "{\"id\":\"1\",\"name\":\"A\"}\nnot json at all\n".getBytes)
      val e = intercept[Exception] {
        Jsonl.read(spark, f.toString, schema).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(m =>
        m.contains("FAILFAST") || m.contains("Malformed") || m.contains("malformed")))
    }
  }
}
