package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Hive's `matchpath()` PTF (QL/udf/ptf/MatchPath.java — regex-like
  * row-sequence matching over an ordered partition; SURVEY.md §2.1 #13)
  * re-expressed two ways:
  *
  *  1. `MatchPath.matches` — a typed `flatMapGroups` operator: per key,
  *     order the rows, translate each to a symbol, run a compiled
  *     java.util.regex over the symbol string, emit one row per match
  *     with its start position and length. This is the general PTF shape
  *     (table-in/table-out over ordered partitions); state per group is
  *     one event list — bounded by the per-user session size, and groups
  *     are distributed by key, so it scales like any groupBy.
  *
  *  2. `events_seq_match` — the SQL-expressible projection of the same
  *     idea (symbol-string aggregation + regexp), which a DuckDB oracle
  *     can replicate exactly.
  */
object MatchPath {

  case class PathMatch(user_id: Long, start_event_id: Long, match_len: Int)

  /** Symbols: one char per event_type (v=view, c=click, p=purchase,
    * s=signup, e=error). */
  val symbolOf: Map[String, String] = Map(
    "view" -> "v", "click" -> "c", "purchase" -> "p",
    "signup" -> "s", "error" -> "e")

  /** All non-overlapping matches of `pattern` (over the symbol alphabet)
    * in each user's time-ordered event sequence.
    *
    * Regex matching requires the whole per-key sequence in memory (Hive's
    * PTF buffers partitions the same way), which is fine for bounded
    * per-user activity but would OOM the task on one hot key — a bot user
    * with 10^8 events. `maxEventsPerKey` (generous default) fails loudly
    * with the offending key BEFORE the buffer grows past the cap, instead
    * of a silent executor OOM; callers with legitimate hot keys raise it
    * or pre-filter. */
  def matches(spark: SparkSession, sfDir: String, pattern: String,
              maxEventsPerKey: Int = 4 << 20): DataFrame = {
    Tables.register(spark, sfDir)
    import spark.implicits._
    val events = spark.table("events")
      .selectExpr("user_id", "event_id", "event_type", "ts")
      .as[(Long, Long, String, java.sql.Timestamp)]
    val bSym = symbolOf // serialized into the closure
    events.groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, String, java.sql.Timestamp)]
        while (it.hasNext) {
          buf += it.next()
          if (buf.length > maxEventsPerKey) throw new IllegalStateException(
            s"matchpath: key $uid exceeds $maxEventsPerKey buffered events — " +
              "hot key; raise maxEventsPerKey or pre-filter it")
        }
        // getTime is millisecond-truncated; getNanos breaks same-ms ties
        // at full precision so ordering agrees with the oracle's
        // microsecond ORDER BY ts (events carry sub-ms components)
        val evs = buf.toArray.sortBy(e => (e._4.getTime, e._4.getNanos, e._2))
        val syms = new StringBuilder
        evs.foreach(e => syms.append(bSym.getOrElse(e._3, "?")))
        val m = java.util.regex.Pattern.compile(pattern).matcher(syms)
        val out = scala.collection.mutable.ArrayBuffer.empty[PathMatch]
        while (m.find()) {
          out += PathMatch(uid, evs(m.start())._2, m.end() - m.start())
        }
        out.iterator
      }
      .toDF()
      .orderBy("user_id", "start_event_id")
  }

  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // flatMapGroups PTF: "one or more views then a purchase".
    "matchpath_view_purchase" -> ((spark, sfDir) =>
      matches(spark, sfDir, "v+p")),

    // second pattern over the same PTF ("one or more clicks then a
    // purchase") — pins that the operator is generic in the pattern, not
    // a single-pattern proof; same windowed-greedy oracle construction
    // with the run symbol swapped.
    "matchpath_click_purchase" -> ((spark, sfDir) =>
      matches(spark, sfDir, "c+p")),

    // SQL projection with exact DuckDB oracle: per-user symbol string +
    // match count of the same pattern.
    "events_seq_match" -> Tables.sql("""
      WITH seq AS (
        SELECT user_id,
               ARRAY_JOIN(TRANSFORM(
                 ARRAY_SORT(COLLECT_LIST(STRUCT(ts, event_id, event_type))),
                 e -> CASE e.event_type
                        WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                        ELSE 'e' END), '') AS syms
        FROM events
        GROUP BY user_id
      )
      SELECT user_id,
             LENGTH(syms) AS n_events,
             LENGTH(REGEXP_REPLACE(syms, 'v+p', '|'))
               - LENGTH(REGEXP_REPLACE(syms, 'v+p', '')) AS n_matches
      FROM seq
      ORDER BY user_id""")
  )

  val oracle: Map[String, String] = Map(
    // windowed reformulation of greedy non-overlapping `v+p` matching:
    // a match ends at each 'p' whose immediate predecessor run is ≥1
    // consecutive 'v'; the run start is the position after the last
    // non-view symbol (which includes any previously consumed 'p', so
    // matches never overlap — exactly java.util.regex find() semantics
    // for this pattern). Valid for the fixed v+p pattern of the query.
    "matchpath_view_purchase" -> """
      WITH ev AS (
        SELECT user_id, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END AS sym,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
      ), marked AS (
        SELECT *, MAX(CASE WHEN sym <> 'v' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_non_v
        FROM ev
      )
      SELECT m.user_id, s.event_id AS start_event_id,
             CAST(m.rn - COALESCE(m.last_non_v, 0) AS INT) AS match_len
      FROM marked m JOIN ev s
        ON s.user_id = m.user_id AND s.rn = COALESCE(m.last_non_v, 0) + 1
      WHERE m.sym = 'p' AND m.rn - COALESCE(m.last_non_v, 0) >= 2
      ORDER BY m.user_id, start_event_id""",

    // same construction as matchpath_view_purchase with the run symbol
    // swapped to 'c' — valid for any fixed x+y pattern by the same
    // argument (a previously consumed 'p' is itself a non-'c' symbol, so
    // matches never overlap, exactly java.util.regex find() semantics)
    "matchpath_click_purchase" -> """
      WITH ev AS (
        SELECT user_id, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END AS sym,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
      ), marked AS (
        SELECT *, MAX(CASE WHEN sym <> 'c' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_non_c
        FROM ev
      )
      SELECT m.user_id, s.event_id AS start_event_id,
             CAST(m.rn - COALESCE(m.last_non_c, 0) AS INT) AS match_len
      FROM marked m JOIN ev s
        ON s.user_id = m.user_id AND s.rn = COALESCE(m.last_non_c, 0) + 1
      WHERE m.sym = 'p' AND m.rn - COALESCE(m.last_non_c, 0) >= 2
      ORDER BY m.user_id, start_event_id""",

    "events_seq_match" -> """
      WITH seq AS (
        SELECT user_id,
               STRING_AGG(CASE event_type
                            WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                            WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                            ELSE 'e' END, '' ORDER BY ts, event_id) AS syms
        FROM events
        GROUP BY user_id
      )
      SELECT user_id,
             LENGTH(syms) AS n_events,
             LENGTH(REGEXP_REPLACE(syms, 'v+p', '|', 'g'))
               - LENGTH(REGEXP_REPLACE(syms, 'v+p', '', 'g')) AS n_matches
      FROM seq
      ORDER BY user_id"""
  )
}
