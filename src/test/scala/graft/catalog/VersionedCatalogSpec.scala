package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

/** Catalog semantics per arbirk/ETL-template tools/tools.go:343-444:
  * next = max+1, latest = max, specific-version time travel, error on
  * missing step/version, immutability of committed versions. */
class VersionedCatalogSpec extends SparkSpec {

  private def df(ids: Int*) = {
    val s = spark
    import s.implicits._
    ids.toDF("id")
  }

  private val schema = StructType.fromDDL("id INT")

  test("versions start at 1 and increment (max+1)") {
    withTempDir { dir =>
      val cat = new VersionedCatalog(spark, dir.toString)
      assert(cat.nextVersion("step") == 1)
      assert(cat.writeNext("step", df(1, 2)) == 1)
      assert(cat.writeNext("step", df(3)) == 2)
      assert(cat.nextVersion("step") == 3)
      assert(cat.versions("step") == Seq(1, 2))
    }
  }

  test("latest resolves the highest version") {
    withTempDir { dir =>
      val cat = new VersionedCatalog(spark, dir.toString)
      cat.writeNext("step", df(1))
      cat.writeNext("step", df(10, 20))
      val rows = cat.latest("step", Some(schema)).collect().map(_.getInt(0)).sorted
      assert(rows.toSeq == Seq(10, 20))
      assert(cat.latestVersion("step").contains(2))
    }
  }

  test("specific-version read is time travel; committed versions are immutable") {
    withTempDir { dir =>
      val cat = new VersionedCatalog(spark, dir.toString)
      cat.writeNext("step", df(1))
      cat.writeNext("step", df(2))
      cat.writeNext("step", df(3))
      assert(cat.read("step", 1, Some(schema)).collect().map(_.getInt(0)).toSeq == Seq(1))
      assert(cat.read("step", 2, Some(schema)).collect().map(_.getInt(0)).toSeq == Seq(2))
    }
  }

  test("missing step and missing version raise (tools.go:399-404,424-426)") {
    withTempDir { dir =>
      val cat = new VersionedCatalog(spark, dir.toString)
      intercept[NoSuchElementException](cat.latest("nope"))
      cat.writeNext("step", df(1))
      intercept[NoSuchElementException](cat.read("step", 99))
    }
  }

  test("writes stage then promote: no .staging leftovers after commit") {
    withTempDir { dir =>
      val cat = new VersionedCatalog(spark, dir.toString)
      cat.writeNext("step", df(1, 2, 3))
      val staging = new java.io.File(s"$dir/.staging")
      assert(!staging.exists() || staging.listFiles().isEmpty)
    }
  }

  test("parquet-format catalog round-trips too") {
    withTempDir { dir =>
      val cat = new VersionedCatalog(spark, dir.toString, format = "parquet")
      cat.writeNext("step", df(7, 8))
      assert(cat.latest("step").collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8))
    }
  }
}
