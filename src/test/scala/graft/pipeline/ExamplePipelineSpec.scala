package graft.pipeline

import graft.SparkSpec
import graft.catalog.VersionedCatalog
import org.apache.spark.sql.types.StructType

/** End-to-end parity with the reference's 3-step example (etl.go),
  * including the failure paths the reference seeded sentinels for but
  * never exercised (SURVEY.md §5.1): transform failure → step Failed +
  * no committed output; rerun → new immutable version. */
class ExamplePipelineSpec extends SparkSpec {

  private val outSchema =
    StructType.fromDDL("userId STRING, processedName STRING, timestamp STRING")

  test("golden output: 6 users extracted, transformed, promoted") {
    withTempDir { dir =>
      val v = ExamplePipeline.run(spark, s"$dir/output", s"$dir/temp",
        ts = "2024-01-01T00:00:00Z")
      assert(v == 1)
      val cat = new VersionedCatalog(spark, s"$dir/output")
      val rows = cat.latest("LoadOutput", Some(outSchema))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .sortBy(t => t._1.toInt)
      assert(rows.toSeq == Seq(
        ("1", "Processed_Alice_Individually", "2024-01-01T00:00:00Z"),
        ("2", "Processed_Bob_Individually", "2024-01-01T00:00:00Z"),
        ("3", "Processed_Charlie_Individually", "2024-01-01T00:00:00Z"),
        ("4", "Processed_Diana_Individually", "2024-01-01T00:00:00Z"),
        ("10", "Processed_Bad User Transform_Individually", "2024-01-01T00:00:00Z"),
        ("11", "Processed_Bad User Load_Individually", "2024-01-01T00:00:00Z")))
      // status manifest committed
      assert(new java.io.File(s"$dir/output/status/etl_run_status.json").exists())
    }
  }

  test("transform failure on sentinel row: step fails, nothing committed") {
    withTempDir { dir =>
      intercept[Exception] {
        ExamplePipeline.run(spark, s"$dir/output", s"$dir/temp",
          ts = "2024-01-01T00:00:00Z", failOn = Some("10"))
      }
      val cat = new VersionedCatalog(spark, s"$dir/output")
      // ExtractUsers committed (step 1 succeeded), LoadOutput did not
      assert(cat.latestVersion("ExtractUsers").contains(1))
      assert(cat.latestVersion("LoadOutput").isEmpty)
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/output/status/etl_run_status.json")), "UTF-8")
      assert(manifest.contains("\"Failed\""))
    }
  }

  test("rerun after failure: prior versions immutable, new version committed") {
    withTempDir { dir =>
      intercept[Exception] {
        ExamplePipeline.run(spark, s"$dir/output", s"$dir/temp",
          ts = "2024-01-01T00:00:00Z", failOn = Some("10"))
      }
      val v = ExamplePipeline.run(spark, s"$dir/output", s"$dir/temp",
        ts = "2024-01-02T00:00:00Z")
      assert(v == 1) // first committed LoadOutput version
      val cat = new VersionedCatalog(spark, s"$dir/output")
      // extract ran twice → two immutable versions
      assert(cat.versions("ExtractUsers") == Seq(1, 2))
      assert(cat.latest("LoadOutput", Some(outSchema)).count() == 6)
    }
  }
}
