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

  test("q226 retention: planted multi-cohort events yield the exact triangle") {
    val s = spark
    import s.implicits._
    withTempDir { tmp =>
      val rows = Seq(
        // (user, day): u1 cohort wk0 active wk0/1/2; u2 cohort wk0
        // twice in wk0 (distinct collapses); u3 cohort wk1 (day 8),
        // active offsets 0 and 1 (day 21 = +13 days); u4 cohort wk2
        (1L, 0), (1L, 7), (1L, 14),
        (2L, 0), (2L, 1),
        (3L, 8), (3L, 21),
        (4L, 16))
      rows.zipWithIndex.map { case ((u, day), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2024, 1, 1, 12, 0).plusDays(day)),
          u, "click", 1.0d, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val got = graft.SparkEntry.queries("q226_retention_cohorts")(
          spark, tmp.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got == Seq(
        (0L, 0L, 2L, 2L, 10000L),
        (0L, 1L, 1L, 2L, 5000L),
        (0L, 2L, 1L, 2L, 5000L),
        (1L, 0L, 1L, 1L, 10000L),
        (1L, 1L, 1L, 1L, 10000L),
        (2L, 0L, 1L, 1L, 10000L)))
    }
  }

  test("q229 anomalies: a planted spike beyond 2 sigma is flagged, steady days are not") {
    val s = spark
    import s.implicits._
    withTempDir { tmp =>
      // days 0-6 noisy-steady baseline (one 16 keeps varn > 0), day 7
      // spikes to 30 (z ≈ 9σ), day 8 returns to 10 (z within bounds)
      val perDay = Seq(10, 10, 10, 10, 10, 10, 16, 30, 10)
      val rows = perDay.zipWithIndex.flatMap { case (n, day) =>
        (0 until n).map(i => (day.toLong * 100 + i,
          java.sql.Timestamp.valueOf(
            java.time.LocalDateTime.of(2024, 3, 1, 8, 0).plusDays(day)),
          i.toLong, "click", 1.0d, "{}"))
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val got = graft.SparkEntry.queries("q229_event_anomalies")(
        spark, tmp.toString).collect()
      assert(got.length == 1, got.mkString(";"))
      assert(got(0).getAs[String]("event_type") == "click")
      assert(got(0).getAs[Long]("di") == 7L)
      assert(got(0).getAs[Long]("n") == 30L)
      assert(got(0).getAs[Long]("z_e4") > 20000L)
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
