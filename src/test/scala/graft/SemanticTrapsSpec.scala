package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SURVEY.md §7.3 semantic traps, pinned as goldens so a Hive-1.2 user
  * switching to this engine knows exactly where behavior differs and
  * where it matches. */
class SemanticTrapsSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def one(sql: String) = spark.sql(s"SELECT $sql").collect()(0)

  test("asofBackward: equal-ts right row matches, no-prior-row yields null, keys isolate") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10: ts 100 — right rows at 50 and 100 exist
      (2L, 10L, 60L),  // key 10: ts 60 — only the 50 row is visible
      (3L, 10L, 40L),  // key 10: ts 40 — nothing at or before -> null
      (4L, 20L, 500L)  // key 20: other key's rows must not leak
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, 50L, 777L), (10L, 100L, 888L), (20L, 1L, 999L)
    ).toDF("k", "ts", "payload")
    val got = graft.operators.AsOfJoin
      .asofBackward(left, right, "k", "ts", "ts", "payload")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq == Seq((1L, 888L), (2L, 777L), (3L, -1L), (4L, 999L)))
  }

  test("asofForward: equal-ts right row matches, no-following-row yields null, keys isolate") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10: ts 100 — a right row AT 100 exists (tie)
      (2L, 10L, 60L),  // key 10: ts 60 — the next row is at 100
      (3L, 10L, 140L), // key 10: ts 140 — nothing at or after -> null
      (4L, 20L, 0L)    // key 20: other key's rows must not leak
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, 50L, 777L), (10L, 100L, 888L), (20L, 1L, 999L)
    ).toDF("k", "ts", "payload")
    val got = graft.operators.AsOfJoin
      .asofForward(left, right, "k", "ts", "ts", "payload")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq == Seq((1L, 888L), (2L, 888L), (3L, -1L), (4L, 999L)))
  }

  test("rangeJoin equals brute-force containment for random intervals incl. boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ptsLocal = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val ivsLocal = (1 to 60).map { i =>
      val lo = rnd.nextInt(950).toLong; (i.toLong, lo, lo + rnd.nextInt(120).toLong)
    }
    val pts = ptsLocal.toDF("pid", "pt").withColumn("k", lit(1))
    val ivs = ivsLocal.toDF("iid", "lo", "hi").withColumn("k", lit(1))
    // binWidth 37 divides nothing — every bin-boundary edge case in play
    val got = graft.operators.RangeJoin
      .rangeJoin(pts, "pt", ivs, "lo", "hi", Seq("k"), 37L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (pid, pt) <- ptsLocal
      (iid, lo, hi) <- ivsLocal
      if lo <= pt && pt <= hi
    } yield (pid, iid)).toSet
    assert(got == expect, s"missing=${expect.diff(got).take(5)} extra=${got.diff(expect).take(5)}")
  }

  test("rangeJoin: domain-spanning interval takes the bounded broadcast branch") {
    import spark.implicits._
    val pts = (0L until 100L).map(i => (i, i * 1000L)).toDF("pid", "pt")
      .withColumn("k", lit(1))
    // one pathological interval covering 3e9 bins at binWidth=1: the
    // unbounded explode would need a 3-billion-element sequence()
    // (throws past 2^31, and would be a multi-million-row blowup long
    // before that); the cap must route it to the broadcast branch
    val ivs = Seq(
      (900L, 1L, 2000L, 2050L),          // genuinely short: 51 bins <= 64
      (901L, 1L, -1000000000L, 2000000000L) // spans ~3e9 bins
    ).toDF("iid", "k", "lo", "hi")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // AQE off so the concrete plan tree (and its metrics) is inspectable
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = graft.operators.RangeJoin
        .rangeJoin(pts, "pt", ivs, "lo", "hi", Seq("k"), 1L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"long-interval branch should broadcast:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), "must stay an equi-join")
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // one interval routes through EACH branch, so the union path itself
      // is validated (both-long would vacuously pass a broken short branch)
      val expect = (for {
        i <- 0L until 100L; (iid, lo, hi) <- Seq((900L, 2000L, 2050L), (901L, -1000000000L, 2000000000L))
        if lo <= i * 1000 && i * 1000 <= hi
      } yield (i, iid)).toSet
      assert(got == expect)
      assert(got.exists(_._2 == 900L) && got.exists(_._2 == 901L),
        "both branches must contribute matches")
      // ROUTING pin via exchange metrics: the long-interval branch must
      // carry exactly 1 row (only interval 901) and the short branch's
      // exploded side exactly 51 bin rows (interval 900's 51 bins, which
      // the planner happens to broadcast too at this size). A regression
      // shipping short intervals to the long branch would read (0, 2);
      // shipping long ones to the explode branch throws in sequence().
      joined.collect()
      val bcastRows = joined.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          b.metrics("numOutputRows").value
      }.sorted
      assert(bcastRows == Seq(1L, 51L),
        s"expected long-branch=1 row and short-explode=51 rows, got $bcastRows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("matchpath: hot key trips the buffer cap loudly instead of OOM") {
    Tables.register(spark, LocalSpark.sf)
    val ex = intercept[Exception] {
      graft.operators.MatchPath
        .matches(spark, LocalSpark.sf, "v+p", maxEventsPerKey = 5)
        .collect()
    }
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => s"${x.getClass.getName}: ${x.getMessage}").toSeq
    assert(rootChain(ex).exists(_.contains("exceeds 5 buffered events")),
      s"unexpected failure chain: ${rootChain(ex)}")
  }

  test("asofBackward NULL semantics: null payload is returned, null-ts/key right rows never match") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("id", "k", "ts")
    // matched row (ts=50) carries a NULL payload: SQL ASOF returns NULL,
    // not the earlier non-null payload at ts=30
    val right = Seq(
      (Some(10L), Some(30L), Some(7L)),
      (Some(10L), Some(50L), None),
      (Some(10L), None, Some(9L)),  // null ts: matches nothing
      (None, Some(60L), Some(8L))   // null key: matches nothing
    ).toDF("k", "ts", "payload")
    val got = graft.operators.AsOfJoin
      .asofBackward(left, right, "k", "ts", "ts", "payload").collect()
    assert(got.length == 1 && got(0).isNullAt(3),
      s"matched NULL payload must surface as NULL: ${got.toSeq}")
  }

  test("division: / is double, DIV is integer (same as Hive)") {
    assert(one("7 / 2").getDouble(0) == 3.5)
    assert(one("7 DIV 2").getLong(0) == 3L)
    assert(one("-7 DIV 2").getLong(0) == -3L) // truncation toward zero
    assert(one("PMOD(-7, 3)").getInt(0) == 2) // pmod is non-negative
    assert(one("-7 % 3").getInt(0) == -1)     // % keeps dividend sign
  }

  test("null ordering defaults: ASC→NULLS FIRST, DESC→NULLS LAST (same as Hive)") {
    val asc = Seq(Some(2), None, Some(1)).toDF("x").orderBy($"x".asc)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(asc.toSeq == Seq(None, Some(1), Some(2)))
    val desc = Seq(Some(2), None, Some(1)).toDF("x").orderBy($"x".desc)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(desc.toSeq == Seq(Some(2), Some(1), None))
  }

  test("string↔numeric implicit casts in arithmetic and comparison") {
    // DIFFERENCE from Hive 1.2: Hive widens string+int to DOUBLE (15.0);
    // Spark 4 ANSI coerces the string to the numeric side → BIGINT 15.
    assert(one("'10' + 5").getLong(0) == 15L)
    assert(one("'10' + 5.5").getDouble(0) == 15.5)
    assert(one("'10' = 10").getBoolean(0))
    assert(one("CONCAT('v', 1)").getString(0) == "v1")
  }

  test("timestamps: µs precision survives the events ns→µs conversion") {
    Tables.register(spark, LocalSpark.sf)
    val withMicros = spark.table("events")
      .where(expr("UNIX_MICROS(ts) % 1000 <> 0")).count()
    // ns source has sub-millisecond parts; conversion must keep them
    assert(withMicros > 0)
    val schema = spark.table("events").schema("ts").dataType.typeName
    assert(schema == "timestamp")
  }

  test("histogram_numeric: bins bounded by data range, weights sum to count") {
    Tables.register(spark, LocalSpark.sf)
    val rows = spark.sql("""
      SELECT HISTOGRAM_NUMERIC(l_quantity, 5) AS h,
             COUNT(*) AS n, MIN(l_quantity) AS lo, MAX(l_quantity) AS hi
      FROM lineitem""").collect()(0)
    val bins = rows.getSeq[org.apache.spark.sql.Row](0)
    assert(bins.length == 5)
    val (n, lo, hi) = (rows.getLong(1), rows.getDouble(2), rows.getDouble(3))
    assert(bins.forall { b => val x = b.getDouble(0); x >= lo && x <= hi })
    val wsum = bins.map(_.getDouble(1)).sum
    assert(math.abs(wsum - n) < 1e-6, s"weights $wsum vs count $n")
  }

  test("decimal sum determinism: the money-aggregation convention is exact") {
    Tables.register(spark, LocalSpark.sf)
    // same aggregate under different partitionings must be bit-identical
    val a = spark.table("lineitem")
      .agg(sum($"l_extendedprice".cast("decimal(18,4)"))).collect()(0).getDecimal(0)
    val b = spark.table("lineitem").repartition(17, $"l_suppkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,4)"))).collect()(0).getDecimal(0)
    assert(a == b)
  }

  test("skyline_orders equals brute-force NOT EXISTS dominance") {
    // the bucketed two-level prefix-max reduction must produce exactly
    // the quadratic definition's point set (strict dominance — exact
    // duplicates survive); quadratic is affordable at test scale only
    Tables.register(spark, LocalSpark.sf)
    val fast = SparkEntry.queries("skyline_orders")(spark, LocalSpark.sf)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val brute = spark.sql("""
      SELECT p.o_orderkey FROM orders p
      WHERE NOT EXISTS (
        SELECT 1 FROM orders q
        WHERE q.o_totalprice >= p.o_totalprice AND q.o_orderdate >= p.o_orderdate
          AND (q.o_totalprice > p.o_totalprice OR q.o_orderdate > p.o_orderdate))
      """).collect().map(_.getLong(0)).sorted.toSeq
    assert(fast == brute, s"fast=$fast brute=$brute")
    assert(fast.nonEmpty)
  }
}
