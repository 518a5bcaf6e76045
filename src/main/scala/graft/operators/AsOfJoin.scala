package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Backward as-of join — "for each left row, the latest right row at or
  * before its timestamp, per key" — the canonical event-enrichment
  * operation (trade↔quote, purchase↔view).
  *
  * Spark-first plan: instead of a range/theta join (which Catalyst can
  * only execute as a broadcast-nested-loop or an exploded range-bin
  * equi-join), the two inputs are UNIONed with a side tag and processed
  * with one window pass: partition by key, order by (ts, side), carry
  * the last non-null right payload forward, keep left rows. Cost is ONE
  * shuffle of |L|+|R| rows on the key plus a per-key sort — at 100 TB
  * that beats any pairwise formulation, and ties on ts resolve
  * deterministically (right rows sort before left rows at equal ts, so
  * an equal-timestamp right row IS visible to the left row, matching
  * DuckDB/pandas ASOF `>=` semantics; the right input must be unique
  * per (key, ts) — pre-aggregate it if not).
  */
object AsOfJoin {

  private type Q = (SparkSession, String) => DataFrame

  /** leftDf enriched with `rightPayload` from the latest right row with
    * rightTs <= leftTs on the same key; null when no such row.
    *
    * NULL semantics match SQL ASOF exactly: right rows with a NULL key
    * or NULL timestamp never match anything (filtered out), and a
    * matched right row whose PAYLOAD is NULL yields NULL — the payload
    * rides inside a struct through the window, so `last(..., ignoreNulls)`
    * tracks "latest right ROW", never "latest non-null payload". */
  def asofBackward(leftDf: DataFrame, rightDf: DataFrame,
                   key: String, leftTs: String, rightTs: String,
                   rightPayload: String): DataFrame =
    asofImpl(leftDf, rightDf, key, leftTs, rightTs, rightPayload, forward = false)

  /** The forward mirror: the EARLIEST right row with rightTs >= leftTs
    * per key ("next action after the impression"). Same single-shuffle
    * union+window plan, run over the REVERSED sort so the running frame
    * stays incremental; right rows carry a higher side tag, so at equal
    * ts they sort before left rows in the descending order and an
    * equal-timestamp right row is visible — `<=` semantics, mirroring
    * backward's `>=`. */
  def asofForward(leftDf: DataFrame, rightDf: DataFrame,
                  key: String, leftTs: String, rightTs: String,
                  rightPayload: String): DataFrame =
    asofImpl(leftDf, rightDf, key, leftTs, rightTs, rightPayload, forward = true)

  private def asofImpl(leftDf: DataFrame, rightDf: DataFrame,
                       key: String, leftTs: String, rightTs: String,
                       rightPayload: String, forward: Boolean): DataFrame = {
    val leftCols = leftDf.columns.toSeq
    // the helper columns are plain names (withColumn would silently
    // REPLACE a caller column of the same name and mis-resolve the join);
    // same for the asof_ output colliding with an existing left column
    val reserved = Seq("__side", "__ts", "__payload", "__match")
    val clashes = leftCols.filter(c => reserved.contains(c) || c == s"asof_$rightPayload")
    require(clashes.isEmpty,
      s"asof join: left input columns ${clashes.mkString(", ")} collide " +
        s"with reserved helper names (${reserved.mkString(", ")}) or the " +
        s"asof_$rightPayload output — rename them first")
    require(!reserved.contains(key) && !reserved.contains(rightTs) &&
        !reserved.contains(rightPayload),
      "asof join: key/ts/payload parameters must not use reserved __ names")
    val payloadType = new org.apache.spark.sql.types.StructType()
      .add(rightPayload, rightDf.schema(rightPayload).dataType)
    // equal-ts visibility in BOTH directions: right sorts before left
    // (side 0) for backward, after left (side 2) for forward
    val rSide = if (forward) 2 else 0
    val l = leftDf.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = rightDf
      .where(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key), lit(rSide).as("__side"), col(rightTs).as("__ts"),
        struct(col(rightPayload)).as("__payload"))
    val unioned = l.select(
      (leftCols.map(col) :+ col("__side") :+ col("__ts") :+ col("__payload")): _*)
      .unionByName(r, allowMissingColumns = true)
    // BOTH directions use the incremental running frame
    // (unboundedPreceding, currentRow) — Spark evaluates it in O(n) per
    // key. The forward direction just reverses the sort (ts DESC, side
    // DESC: right side=2 still precedes left side=1 at equal ts), so the
    // running `last` right row is the EARLIEST rightTs >= leftTs. The
    // mirror frame (currentRow, unboundedFollowing) re-scans to the
    // partition end for EVERY row — O(n²) on a hot key.
    val w0 =
      if (forward)
        Window.partitionBy(col(key)).orderBy(col("__ts").desc, col("__side").desc)
      else
        Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
    val matched = last(col("__payload"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    unioned
      .withColumn("__match", matched)
      .where(col("__side") === 1)
      .select((leftCols.map(col)
        :+ col("__match").getField(rightPayload).as(s"asof_$rightPayload")): _*)
  }

  /** The shared inputs of every events_asof_* query: purchases
    * (event_id, user_id, ts) and views deduped to one per (user, ts) —
    * the tie contract DuckDB ASOF assumes. ONE definition, four
    * queries: a change here (e.g. the MAX view_id tie-break) lands in
    * every direction at once. With `withPayloadStruct` the view's own
    * timestamp rides in a `vp` struct so nearest/tolerance can compare
    * distances after the window without another join. */
  private def purchasesViews(spark: SparkSession, sfDir: String,
                             withPayloadStruct: Boolean = false)
      : (DataFrame, DataFrame) = {
    Tables.register(spark, sfDir)
    val purchases = spark.table("events")
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v0 = spark.table("events")
      .where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    val views =
      if (withPayloadStruct)
        v0.withColumn("vp", struct(col("ts").as("vts"), col("view_id")))
          .select(col("user_id"), col("ts"), col("vp"))
      else v0
    (purchases, views)
  }

  /** Oracle twin of purchasesViews — shared by all four oracles. */
  private val PvCtes = """
      purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      ), views AS (
        SELECT user_id, ts, MAX(event_id) AS view_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
      )"""

  val queries: Map[String, Q] = Map(
    // purchases enriched with the latest prior-or-simultaneous view of
    // the same user
    "events_asof_join" -> ((spark, sfDir) => {
      val (purchases, views) = purchasesViews(spark, sfDir)
      asofBackward(purchases, views, "user_id", "ts", "ts", "view_id")
        .select(col("event_id"), col("user_id"),
          col("asof_view_id").as("view_id"))
        .orderBy(col("event_id"))
    }),

    // the forward direction: each purchase matched to the EARLIEST
    // following-or-simultaneous view of the same user (next-action
    // attribution)
    "events_asof_forward" -> ((spark, sfDir) => {
      val (purchases, views) = purchasesViews(spark, sfDir)
      asofForward(purchases, views, "user_id", "ts", "ts", "view_id")
        .select(col("event_id"), col("user_id"),
          col("asof_view_id").as("view_id"))
        .orderBy(col("event_id"))
    }),

    // Tolerance-bounded as-of (the pandas merge_asof `tolerance` /
    // QuestDB WITHIN form): the backward match counts only when the
    // matched view is at most 10 minutes old — stale context is worse
    // than no context for attribution. Same single-shuffle union+window
    // plan; the tolerance is a post-window projection, so the bound
    // adds zero shuffle.
    "events_asof_tolerance" -> ((spark, sfDir) => {
      val tolUs = 600000000L // 10 min
      val (purchases, views) = purchasesViews(spark, sfDir, withPayloadStruct = true)
      val back = asofBackward(purchases, views, "user_id", "ts", "ts", "vp")
        .withColumnRenamed("asof_vp", "bvp")
      val dt = unix_micros(col("ts")) - unix_micros(col("bvp.vts"))
      val inTol = col("bvp").isNotNull && dt <= lit(tolUs)
      back.select(col("event_id"), col("user_id"),
          when(inTol, col("bvp.view_id")).as("view_id"),
          when(inTol, dt).as("dt_us"))
        .orderBy(col("event_id"))
    }),

    // NEAREST-event join: each purchase matched to the view of the same
    // user with the smallest |Δt| in EITHER direction (ties prefer the
    // earlier view) — the sensor-alignment flavor of as-of. Composed
    // from both directional passes: the view's own timestamp rides in
    // the payload struct, so the driver-side CASE compares the two
    // candidate distances without another join. Still two key shuffles
    // of |L|+|R| rows total, never a pairwise product (the ORACLE does
    // the full |L|×|R|-per-user join — that is what being the oracle
    // is for).
    "events_asof_nearest" -> ((spark, sfDir) => {
      val (purchases, views) = purchasesViews(spark, sfDir, withPayloadStruct = true)
      val back = asofBackward(purchases, views, "user_id", "ts", "ts", "vp")
        .withColumnRenamed("asof_vp", "bvp")
      val both = asofForward(back, views, "user_id", "ts", "ts", "vp")
        .withColumnRenamed("asof_vp", "fvp")
      val db = unix_micros(col("ts")) - unix_micros(col("bvp.vts"))
      val df = unix_micros(col("fvp.vts")) - unix_micros(col("ts"))
      both
        .withColumn("nvp",
          when(col("bvp").isNotNull && (col("fvp").isNull || db <= df),
            col("bvp")).otherwise(col("fvp")))
        .select(col("event_id"), col("user_id"),
          col("nvp.view_id").as("nearest_view_id"),
          (unix_micros(col("nvp.vts")) - unix_micros(col("ts"))).as("dt_us"))
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // DuckDB's native ASOF LEFT JOIN as an independent implementation
    "events_asof_join" -> s"""
      WITH $PvCtes
      SELECT p.event_id, p.user_id, v.view_id
      FROM purchases p
      ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.event_id""",

    // DuckDB ASOF with the <= inequality — the forward direction
    "events_asof_forward" -> s"""
      WITH $PvCtes
      SELECT p.event_id, p.user_id, v.view_id
      FROM purchases p
      ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts <= v.ts
      ORDER BY p.event_id""",

    // DuckDB ASOF (no native tolerance) + the same post-match bound
    "events_asof_tolerance" -> s"""
      WITH $PvCtes
      SELECT p.event_id, p.user_id,
             CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 600000000
                  THEN v.view_id END AS view_id,
             CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 600000000
                  THEN epoch_us(p.ts) - epoch_us(v.ts) END AS dt_us
      FROM purchases p
      ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.event_id""",

    // independent formulation: full per-user candidate join ranked by
    // (|Δt|, Δt) — the secondary Δt key realizes the earlier-view tie
    // preference (negative sorts first); LEFT JOIN keeps purchases of
    // users with no views at all
    "events_asof_nearest" -> s"""
      WITH $PvCtes, cand AS (
        SELECT p.event_id, v.view_id,
               epoch_us(v.ts) - epoch_us(p.ts) AS sdist
        FROM purchases p JOIN views v USING (user_id)
      ), best AS (
        SELECT event_id, view_id, sdist,
               ROW_NUMBER() OVER (PARTITION BY event_id
                                  ORDER BY ABS(sdist), sdist) AS rn
        FROM cand
      )
      SELECT p.event_id, p.user_id,
             b.view_id AS nearest_view_id, b.sdist AS dt_us
      FROM purchases p
      LEFT JOIN best b ON b.event_id = p.event_id AND b.rn = 1
      ORDER BY p.event_id"""
  )
}
