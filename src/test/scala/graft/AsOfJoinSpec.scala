package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Crafted-row edge cases for the as-of family — the oracle compares
  * pin the testdata; these pin the SEMANTICS on rows built to sit
  * exactly on the boundaries: equal timestamps, equidistant ties,
  * keys with no match, null right keys/timestamps. */
class AsOfJoinSpec extends AnyFunSuite with Matchers {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(ms)

  // left: (id, key, ts); right: (key, ts, payload)
  private def left(rows: (Long, Long, Long)*) =
    rows.toSeq.map { case (id, k, ts0) => (id, k, t(ts0)) }
      .toDF("event_id", "user_id", "ts")
  private def right(rows: (Long, Long, Long)*) =
    rows.toSeq.map { case (k, ts0, p) => (k, t(ts0), p) }
      .toDF("user_id", "ts", "view_id")

  test("backward: equal-ts right row IS visible; strictly-later is not") {
    val l = left((1L, 10L, 1000L), (2L, 10L, 999L))
    val r = right((10L, 1000L, 77L))
    val out = AsOfJoin.asofBackward(l, r, "user_id", "ts", "ts", "view_id")
      .orderBy($"event_id").collect()
    out(0).getAs[Any]("asof_view_id") shouldBe 77L   // ts == — visible
    out(1).getAs[AnyRef]("asof_view_id") shouldBe null  // right is later
  }

  test("forward: equal-ts visible, earlier invisible, earliest-following wins") {
    val l = left((1L, 10L, 1000L))
    val r = right((10L, 900L, 1L), (10L, 1000L, 2L), (10L, 1100L, 3L))
    val out = AsOfJoin.asofForward(l, r, "user_id", "ts", "ts", "view_id").collect()
    out(0).getAs[Any]("asof_view_id") shouldBe 2L    // == ts beats later
    val l2 = left((1L, 10L, 1001L))
    val out2 = AsOfJoin.asofForward(l2, r, "user_id", "ts", "ts", "view_id").collect()
    out2(0).getAs[Any]("asof_view_id") shouldBe 3L   // earliest following
  }

  test("nearest: equidistant tie prefers the earlier (backward) side") {
    Tables.register(spark, LocalSpark.sf)
    // purchase at 1000; views at 900 and 1100 — both |dt| = 100
    val events = Seq(
      (1L, 10L, t(1000L), "purchase"),
      (2L, 10L, t(900L), "view"),
      (3L, 10L, t(1100L), "view"),
      // user with a purchase and NO views at all
      (4L, 20L, t(500L), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    events.createOrReplaceTempView("events")
    try {
      val out = SparkEntry.queries("events_asof_nearest")(spark, LocalSpark.sf)
        .collect().sortBy(_.getLong(0))
      out(0).getAs[Any]("nearest_view_id") shouldBe 2L   // tie → earlier view
      out(0).getAs[Any]("dt_us") shouldBe -100000L       // signed, backward
      out(1).getAs[AnyRef]("nearest_view_id") shouldBe null // no views: null row
      out(1).getAs[AnyRef]("dt_us") shouldBe null
    } finally {
      Tables.invalidate(spark)
      Tables.register(spark, LocalSpark.sf)
    }
  }

  test("tolerance: in-bound match kept, stale match voided (not dropped)") {
    Tables.register(spark, LocalSpark.sf)
    val tol = 600000000L // the query's 10 min in µs
    val events = Seq(
      (1L, 10L, t(1000000L), "purchase"),          // view 1 s before: in tolerance
      (2L, 10L, t(999000L), "view"),
      (3L, 30L, t(700000000L), "purchase"),        // view ~11.6 min before: stale
      (4L, 30L, t(0L), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    events.createOrReplaceTempView("events")
    try {
      val out = SparkEntry.queries("events_asof_tolerance")(spark, LocalSpark.sf)
        .collect().sortBy(_.getLong(0))
      out.length shouldBe 2                              // both purchases kept
      out(0).getAs[Any]("view_id") shouldBe 2L
      out(0).getAs[Any]("dt_us") shouldBe 1000000L
      out(1).getAs[AnyRef]("view_id") shouldBe null         // voided, not dropped
      out(1).getAs[AnyRef]("dt_us") shouldBe null
      assert(700000000L - 0L > tol)                      // the case really is stale
    } finally {
      Tables.invalidate(spark)
      Tables.register(spark, LocalSpark.sf)
    }
  }

  test("right rows with null key or null ts never match; null payload rides through") {
    val l = left((1L, 10L, 1000L))
    val r = Seq(
      (Option(10L), Option(t(900L)), Option.empty[Long]), // matched row, NULL payload
      (Option.empty[Long], Option(t(950L)), Option(5L)),  // null key: ignored
      (Option(10L), Option.empty[Timestamp], Option(6L))) // null ts: ignored
      .toDF("user_id", "ts", "view_id")
    val out = AsOfJoin.asofBackward(l, r, "user_id", "ts", "ts", "view_id").collect()
    // the latest VALID right row is the null-payload one — the match is
    // by ROW, so the payload must surface as null (not fall back to an
    // older non-null payload)
    out(0).getAs[AnyRef]("asof_view_id") shouldBe null
  }
}
