package graft.pipeline

import graft.catalog.VersionedCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The reference's 3-step example pipeline (arbirk/ETL-template
  * etl.go:26-159), as a Dataset pipeline over the versioned catalog:
  *
  *   ExtractUsers: 6 literal rows → catalog version       (etl.go:26-51)
  *   MainLoop:     transform → staging JSONL              (etl.go:72-99)
  *   LoadOutput:   promote staging → catalog version      (etl.go:102-144)
  *
  * The transform (etl.go:54-60): rename ID→userId, wrap the name in
  * "Processed_<name>_Individually", stamp a timestamp. The reference
  * stamps per-record wall clock (time.Now per record); Spark's
  * current_timestamp() is query-constant — we take an injectable
  * timestamp, the documented deviation (SURVEY.md §7.4/F2).
  *
  * The two sentinel rows (ID 10/11, etl.go:39-41) are seeded for
  * failure-path testing; like the reference, nothing fails on them by
  * default — tests inject a failing transform to exercise the paths the
  * reference left vestigial (SURVEY.md §5.1).
  */
object ExamplePipeline {

  final case class UserData(id: String, name: String) // etl.go:13-16
  final case class TransformedUserData( // etl.go:19-23
      userId: String, processedName: String, timestamp: String)

  /** etl.go:36-43 literal seed, including the two sentinel rows. */
  val seedUsers: Seq[UserData] = Seq(
    UserData("1", "Alice"),
    UserData("2", "Bob"),
    UserData("3", "Charlie"),
    UserData("10", "Bad User Transform"),
    UserData("4", "Diana"),
    UserData("11", "Bad User Load"))

  /** The example transform, parameterized by the timestamp literal. */
  def transformUsers(users: Dataset[UserData], ts: String): DataFrame =
    users.select(
      col("id").as("userId"),
      format_string("Processed_%s_Individually", col("name")).as("processedName"),
      lit(ts).as("timestamp"))

  /** Run the full 3-step pipeline; returns the LoadOutput version. */
  def run(
      spark: SparkSession,
      outputDir: String,
      tempDir: String,
      ts: String = java.time.Instant.now().toString,
      failOn: Option[String] = None): Int = {
    import spark.implicits._
    val catalog = new VersionedCatalog(spark, outputDir)
    val run = new PipelineRun(spark, s"$outputDir/status/etl_run_status.json", tempDir)
    run.knoll()

    run.executeStep("ExtractUsers") {
      catalog.writeNext("ExtractUsers", seedUsers.toDS().toDF())
    }

    run.executeStep("MainLoop") {
      val users = catalog.latest("ExtractUsers",
        Some(implicitly[org.apache.spark.sql.Encoder[UserData]].schema)).as[UserData]
      // Test hook completing the reference's vestigial sentinel intent:
      // fail the transform on a specific id to exercise failure paths.
      val checked = failOn.fold(users)(bad =>
        users.map { u =>
          if (u.id == bad) throw new IllegalStateException(s"transform failed for id=$bad")
          u
        })
      transformUsers(checked, ts).write.mode("overwrite").json(s"$tempDir/MainLoop/loaded_records")
    }

    val v = run.executeStep("LoadOutput") {
      val staged = spark.read.schema(
        "userId STRING, processedName STRING, timestamp STRING")
        .option("mode", "FAILFAST").json(s"$tempDir/MainLoop/loaded_records")
      catalog.writeNext("LoadOutput", staged)
    }

    run.stow()
    run.logStatus()
    v
  }
}
