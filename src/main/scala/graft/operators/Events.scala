package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Time-window aggregation and sessionization over the `events` table.
  *
  * The reference has no stream engine (SURVEY.md §2.9) — these are batch
  * expressions of the standard event-time operations: tumbling and
  * sliding windows via Spark's `window()` grouping expression,
  * gap-based sessionization via `session_window()` and via the portable
  * lag/cumsum SQL idiom (which doubles as the DuckDB oracle shape). The
  * same expressions run unchanged under Structured Streaming
  * (`readStream` + `withWatermark`) when a real stream source exists.
  *
  * All group keys are (window, user) — shuffles partition by key and
  * scale linearly; no per-user driver-side state.
  */
object Events {

  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "events_tumbling_window" -> Tables.sql("""
      SELECT window.start AS w_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY WINDOW(ts, '1 hour'), event_type
      ORDER BY w_start, event_type"""),

    "events_sliding_window" -> Tables.sql("""
      SELECT window.start AS w_start,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY WINDOW(ts, '1 hour', '30 minutes')
      ORDER BY w_start"""),

    // Gap-based sessions (30 min), portable lag/cumsum formulation.
    "events_sessionize" -> Tables.sql("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        FROM flagged
      )
      SELECT user_id, sess_id,
             COUNT(*) AS n_events,
             MIN(ts) AS sess_start,
             (UNIX_MICROS(MAX(ts)) - UNIX_MICROS(MIN(ts))) AS duration_us,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM numbered
      GROUP BY user_id, sess_id
      ORDER BY user_id, sess_id"""),

    // As-of lookup: for every event, the most recent PRIOR 'view' event
    // by the same user — LAST_VALUE ... IGNORE NULLS over a trailing
    // frame (Hive's last_value(col, true); an as-of join expressed as a
    // window, so it shuffles once on user_id instead of range-joining).
    "events_asof_prior_view" -> Tables.sql("""
      SELECT event_id, user_id, event_type,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END) IGNORE NULLS
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_id
      FROM events
      WHERE user_id <= 30
      ORDER BY user_id, event_id"""),

    // Native session_window() operator — must agree with the lag/cumsum
    // oracle on session boundaries.
    "events_session_window" -> Tables.sql("""
      SELECT user_id,
             session_window.start AS sess_start,
             COUNT(*) AS n_events
      FROM events
      GROUP BY SESSION_WINDOW(ts, '30 minutes'), user_id
      ORDER BY user_id, sess_start""")
  )

  val oracle: Map[String, String] = Map(
    "events_tumbling_window" -> """
      SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) AS w_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY w_start, event_type""",

    "events_sliding_window" -> """
      SELECT w_start, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM (
        SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) AS w_start, value FROM events
        UNION ALL
        SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts, INTERVAL 30 MINUTES) AS w_start, value FROM events
      ) u
      GROUP BY w_start
      ORDER BY w_start""",

    "events_sessionize" -> """
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        FROM flagged
      )
      SELECT user_id, sess_id,
             COUNT(*) AS n_events,
             MIN(ts) AS sess_start,
             CAST(EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS BIGINT) AS duration_us,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM numbered
      GROUP BY user_id, sess_id
      ORDER BY user_id, sess_id""",

    "events_asof_prior_view" -> """
      SELECT event_id, user_id, event_type,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_id
      FROM events
      WHERE user_id <= 30
      ORDER BY user_id, event_id""",

    "events_session_window" -> """
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
      )
      SELECT user_id,
             MIN(ts) AS sess_start,
             COUNT(*) AS n_events
      FROM numbered
      GROUP BY user_id, sess_id
      ORDER BY user_id, sess_start"""
  )
}
