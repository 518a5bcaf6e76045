package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Point-in-interval range join — the other non-equi join (besides
  * as-of) that a relational engine is routinely asked for and Catalyst
  * can only execute as a broadcast-nested-loop.
  *
  * Spark-first plan: BIN the domain. Every point maps to one bin of
  * width `binWidth`; every interval explodes to the bins it overlaps;
  * the join is then a plain equi-join on (keys..., bin) with the exact
  * `lo <= pt <= hi` predicate as a post-filter. Shuffle volume is
  * |points| + Σ(interval_len / binWidth + 1) rows — linear, partitioned
  * by key+bin, skew-safe under AQE — instead of |points| × |intervals|
  * pairs. Choosing binWidth ≈ median interval length keeps the
  * per-interval explosion a small constant. A point on a bin boundary
  * is in exactly one bin; an interval explodes into every bin its
  * closed range touches, so no (point, interval) pair is lost and the
  * post-filter makes the join exact. */
object RangeJoin {

  private type Q = (SparkSession, String) => DataFrame

  /** `points` enriched with the matching `intervals` rows where
    * lo <= pt <= hi (all numeric, same unit), equi-joined on `keys` and
    * the bin. Interval columns must not collide with point columns.
    *
    * Explosion cap: one pathological interval spanning the whole domain
    * would otherwise explode into `len / binWidth` bin rows (at 100 TB,
    * millions of rows from a single input row, and `sequence()` itself
    * throws past 2^31 elements). Intervals wider than
    * `maxBinsPerInterval` bins are split off into a BROADCAST branch
    * joined on keys with the exact range predicate, while the common
    * short intervals keep the linear equi-join plan. Both branches apply
    * the same exact post-filter; a point matches exactly one branch per
    * interval, so the union is exact.
    *
    * Sizing assumption, stated honestly: the broadcast branch holds ALL
    * long intervals, bounded per key by domain/(maxBins·binWidth) — fine
    * when wide intervals are pathological outliers (the intended case),
    * but a workload where MOST keys own wide intervals would overflow
    * the broadcast. The fixes there are a larger binWidth /
    * maxBinsPerInterval (so "wide" stays rare) or a multi-resolution
    * binning scheme; this operator deliberately keeps the two-branch
    * form and documents the boundary rather than silently planning an
    * unbounded broadcast-nested-loop as Catalyst would. */
  def rangeJoin(points: DataFrame, ptCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                keys: Seq[String], binWidth: Long,
                maxBinsPerInterval: Int = 64): DataFrame = {
    require(binWidth > 0)
    require(maxBinsPerInterval > 0)
    val rangePred = col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol)
    val p = points.withColumn("__bin", floor(col(ptCol) / binWidth))
    if (maxBinsPerInterval == Int.MaxValue) {
      // guard disabled: single-branch plan, intervals evaluated once.
      // Callers who can bound interval length by construction use this
      // to skip the guarded form's cost (see below).
      val i = intervals.withColumn("__bin",
        explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
      p.join(i, keys :+ "__bin").where(rangePred).drop("__bin")
    } else {
      // guarded form: the intervals subplan is referenced by BOTH
      // branches (complementary filters), so the part of it above its
      // last exchange is evaluated twice even when no interval is long —
      // the price of not knowing interval lengths until runtime. Pass a
      // pre-materialized (cached/checkpointed) intervals input if that
      // subplan is expensive.
      val nBins = floor(col(hiCol) / binWidth) - floor(col(loCol) / binWidth) + 1
      val i = intervals.where(nBins <= maxBinsPerInterval).withColumn("__bin",
        explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
      val short = p.join(i, keys :+ "__bin").where(rangePred).drop("__bin")
      val longIv = intervals.where(nBins > maxBinsPerInterval)
      val long =
        (if (keys.nonEmpty) points.join(broadcast(longIv), keys)
         else points.crossJoin(broadcast(longIv))).where(rangePred)
      short.unionByName(long)
    }
  }

  val queries: Map[String, Q] = Map(
    // every event located inside its user's session interval (sessions =
    // the 30-min-gap sessionization; intervals of one user never overlap,
    // so each event matches exactly its own session) — a range join that
    // must plan as an equi-join on (user_id, bin), never a nested loop
    "events_range_join_sessions" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      // persist: the guarded rangeJoin references the intervals plan from
      // both branches, and the sessionization (two window passes + agg)
      // is the expensive part — cache it once instead of evaluating it
      // per branch. Plain persist keeps lineage, so cache loss recomputes.
      val sess = spark.sql("""
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
        SELECT user_id, UNIX_MICROS(MIN(ts)) AS lo, UNIX_MICROS(MAX(ts)) AS hi
        FROM numbered GROUP BY user_id, sess_id""").persist()
      val points = spark.table("events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("pt"))
      rangeJoin(points, "pt", sess, "lo", "hi",
          keys = Seq("user_id"), binWidth = 30L * 60 * 1000000)
        .select(col("event_id"), col("user_id"), col("lo").as("sess_lo"))
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // the same containment join spelled as a plain BETWEEN theta-join
    "events_range_join_sessions" -> """
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
      ), sess AS (
        SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi
        FROM numbered GROUP BY user_id, sess_id
      )
      SELECT e.event_id, e.user_id, CAST(EPOCH_US(s.lo) AS BIGINT) AS sess_lo
      FROM events e JOIN sess s
        ON e.user_id = s.user_id AND e.ts BETWEEN s.lo AND s.hi
      ORDER BY e.event_id"""
  )
}
