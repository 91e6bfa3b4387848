package graft.ops

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q25 approx_count_distinct stays within its relative-error contract") {
    // the tolerance check is now IN the query (within_tol column), which
    // is what the DuckDB oracle asserts too — here we just pin the shape
    val rows = graft.SparkEntry.queries("q25_approx_distinct")(
        spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1),
        s"${r.getString(0)}: approx drifted >5% from exact ${r.getLong(2)}")
    }
  }

  test("every declared oracle references only fixture tables") {
    val tables = graft.Tables.names.toSet
    graft.SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      // q60's VALUES oracle doesn't touch tables; all others must
      // reference at least one known fixture view
      if (!sql.contains("VALUES"))
        assert(tables.exists(t => sql.contains(t)), s"$name references no fixture table")
    }
  }

  test("driver contract: every query runs; flagship yields rows on the smoke fixture") {
    val skipSlow = Set("q43_dedup_ngram_jaccard") // quadratic baseline, covered by t2
    // set-difference / threshold filters over the tiny fixture are
    // legitimately empty (both yield rows at sf0.01 in the t2 gate)
    val mayBeEmpty = Set("q17_segment_setops", "q19_above_avg_parts")
    graft.SparkEntry.queries
      .filterNot { case (n, _) => skipSlow(n) }
      .foreach { case (name, fn) =>
        val n = fn(spark, "/root/testdata/sf0.001").count()
        if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows at sf0.001")
        spark.catalog.clearCache()
      }
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
