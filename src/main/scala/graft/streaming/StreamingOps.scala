package graft.streaming

import graft.{Dsl, QueryDef, QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** Driver-visible batch runs of the streaming transforms — Spark's
  * unified batch/streaming contract means `window()` and
  * `session_window()` aggregations produce identical results on a
  * batch source, which makes them oracle-checkable in DuckDB.
  * The streaming-only semantics (watermarks, incremental state,
  * checkpoint resume) are covered by EventPipelinesSpec.
  */
object StreamingOps extends QueryModule {

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q62: 10-minute tumbling windows per event type (batch run of
    // EventPipelines.tumblingCounts' shape). Spark's window() aligns to
    // the epoch, as does DuckDB's time_bucket for divisor intervals.
    QueryDef(
      "q62_tumbling_windows",
      (s, dir) => {
        T.events(s, dir)
          .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), Dsl.dsum(col("value")).as("total_value"))
          .select(col("window.start").as("window_start"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some(s"""
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               event_type, COUNT(*) AS n,
               ${Dsl.dsumSql("value")} AS total_value
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type""")),

    // ------------------------------------------------------------------
    // q63: session windows (30-minute inactivity gap) per user — the
    // session_window() operator batch-run; the oracle derives the same
    // sessions with a gaps-and-islands construction.
    QueryDef(
      "q63_session_windows",
      (s, dir) => {
        T.events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("n_events"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        >= INTERVAL '30 minutes' OR
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        grp AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
          FROM marked)
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM grp GROUP BY user_id, session_no
        ORDER BY user_id, session_start""")),

    // ------------------------------------------------------------------
    // q64: sliding windows — 10-minute windows every 5 minutes, the
    // EventPipelines.slidingCounts shape batch-run. With length = 2 ×
    // slide, every event lands in exactly two windows, so the oracle
    // unnests the two epoch-aligned starts per event and aggregates.
    QueryDef(
      "q64_sliding_windows",
      (s, dir) => {
        T.events(s, dir)
          .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), Dsl.dsum(col("value")).as("total_value"))
          .select(col("window.start").as("window_start"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some(s"""
        SELECT window_start, event_type, COUNT(*) AS n,
               ${Dsl.dsumSql("value")} AS total_value
        FROM (SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                             time_bucket(INTERVAL '5 minutes', ts)
                               - INTERVAL '5 minutes']) AS window_start,
                     event_type, value
              FROM events)
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type""")),

    // ------------------------------------------------------------------
    // q65: stream-stream interval join, batch twin — the EXACT
    // clickToPurchase code (watermarks are a no-op on a batch source:
    // Spark's unified contract), producing purchases within an hour of
    // each same-user click. Oracle is the interval self-join.
    QueryDef(
      "q65_interval_join",
      (s, dir) => {
        EventPipelines.clickToPurchase(T.events(s, dir))
          .select(col("click_id"), col("purchase_id"),
            col("c_user").as("user_id"), col("value"))
          .orderBy(col("click_id"), col("purchase_id"))
      },
      Some("""
        SELECT c.event_id AS click_id, p.event_id AS purchase_id,
               c.user_id, p.value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
        ORDER BY click_id, purchase_id"""))
  )
}
