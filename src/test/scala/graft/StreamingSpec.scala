package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming plumbing (build brief; the Hive reference has no
  * stream engine — SURVEY.md §2.9). Demonstrates that the same
  * event-table expressions used in graft.operators.Events run as
  * streaming plans: watermarked tumbling-window aggregation and custom
  * per-key session state via flatMapGroupsWithState. */
case class Ev(ts: Timestamp, user_id: Long, value: Double)
case class Sess(user_id: Long, n: Long)
case class Doc(ts: Timestamp, doc_id: Long, text: String)
case class Vec(vec_id: Long, embedding: Array[Float])
case class EvS(ts: Timestamp, user_id: Long, event_type: String)
case class FunnelSt(t1: Option[Long], t2: Option[Long], t3: Option[Long])

class StreamingSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60L).toEpochMilli)

  test("watermarked tumbling window aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_v"))
      .select($"window.start".as("w_start"), $"user_id", $"n", $"sum_v")
    val q = agg.writeStream.format("memory").queryName("ev_agg")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Ev(ts(5), 1, 1.0), Ev(ts(20), 1, 2.0), Ev(ts(65), 2, 5.0))
      q.processAllAvailable()
      val rows = spark.table("ev_agg").collect()
      assert(rows.nonEmpty)
      val u1 = rows.filter(r => r.getLong(1) == 1L && r.getTimestamp(0) == ts(0))
      assert(u1.exists(_.getLong(2) == 2L), rows.mkString("\n"))
    } finally q.stop()
  }

  test("streaming frequent items: approx_topk over a stream equals the batch sketch") {
    // the bounded mergeable MG buffer is exactly what lets the same
    // aggregate run under streaming complete mode — partials merge
    // across micro-batches like they merge across partitions
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[Ev]
    val topk = input.toDF()
      .selectExpr("CAST(user_id AS STRING) AS item")
      .groupBy()
      .agg(expr("approx_topk(item, 3, 16)").as("top"))
    val q = topk.writeStream.format("memory").queryName("stream_topk")
      .outputMode(OutputMode.Complete()).start()
    try {
      val evs = (1 to 40).map(i => Ev(ts(i), (i % 5).toLong, 0.0)) ++
        (1 to 10).map(i => Ev(ts(40 + i), 7L, 0.0))
      input.addData(evs.take(25))
      q.processAllAvailable()
      input.addData(evs.drop(25))
      q.processAllAvailable()
      val streamed = spark.table("stream_topk").collect().head
        .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
      val batch = evs.toDF().selectExpr("CAST(user_id AS STRING) AS item")
        .groupBy().agg(expr("approx_topk(item, 3, 16)").as("top"))
        .collect().head
        .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
      // exact regime (6 distinct <= buf 16): both equal true counts
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed.head == ("7", 10L) || streamed.head._2 == 10L, streamed.toString)
    } finally q.stop()
  }

  test("file-source stream: events parquet dir as a micro-batch stream") {
    // the same batch expressions run over readStream; Trigger.AvailableNow
    // drains the existing files then stops — no always-on query in tests
    LocalSpark.spark // init
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    Tables.register(spark, LocalSpark.sf)
    spark.table("events").limit(600).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val counts = spark.readStream.schema(schema).parquet(dir)
      .groupBy($"event_type").count()
    val q = counts.writeStream.format("memory").queryName("ev_file_agg")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val got = spark.table("ev_file_agg").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = spark.read.parquet(dir).groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark on content digest") {
    // the streaming twin of the batch dedup_exact operator: same digest
    // key, bounded state via the watermark interval
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val dedup = input.toDF()
      .withColumn("digest", md5($"text".cast("binary")))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("digest")
    val q = dedup.writeStream.format("memory").queryName("doc_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(ts(1), 1, "alpha"), Doc(ts(2), 2, "alpha"), Doc(ts(3), 3, "beta"))
      q.processAllAvailable()
      // a later batch inside the watermark: repeat content stays dropped
      input.addData(Doc(ts(10), 4, "alpha"), Doc(ts(11), 5, "gamma"))
      q.processAllAvailable()
      val ids = spark.table("doc_dedup").collect().map(_.getLong(1)).toSet
      assert(ids == Set(1L, 3L, 5L), ids.toString)
    } finally q.stop()
  }

  test("stream-static join: doc stream deduped against the static corpus digest index") {
    // the streaming twin of dedup_incremental's exact stage: a NEW-doc
    // stream left-joins the precomputed corpus digest index (static
    // side). In production the index is the 100 TB corpus's digest
    // table; each micro-batch joins against it without rescanning the
    // stream side — the canonical continuous-ingestion dedup shape.
    implicit val sqlCtx = spark.sqlContext
    Tables.register(spark, LocalSpark.sf)
    val index = spark.table("documents")
      .select(md5($"text".cast("binary")).as("digest")).distinct()
      .withColumn("known", lit(true))
    val input = MemoryStream[Doc]
    val flagged = input.toDF()
      .withColumn("digest", md5($"text".cast("binary")))
      .join(index, Seq("digest"), "left")
      .select($"doc_id", coalesce($"known", lit(false)).as("is_dup"))
    val q = flagged.writeStream.format("memory").queryName("inc_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      val corpusText = spark.table("documents")
        .where($"doc_id" === 0L).select($"text").head.getString(0)
      input.addData(Doc(ts(1), 100, corpusText), Doc(ts(2), 101, "novel zz text"))
      q.processAllAvailable()
      val got = spark.table("inc_dedup").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got == Map(100L -> true, 101L -> false), got.toString)
    } finally q.stop()
  }

  test("stream-static semantic dedup: embedding stream assigned under frozen centroids") {
    // the streaming twin of dedup_incremental_semantic: new embeddings
    // arrive as a stream, are assigned to a cluster by the NARROW
    // frozen-centroid projection (no state, no shuffle on the stream
    // side), and matched against the precomputed corpus assignment
    // within their cluster only. In production the static side is the
    // 100 TB corpus's (vec_id, cluster, ve) table.
    implicit val sqlCtx = spark.sqlContext
    Tables.register(spark, LocalSpark.sf)
    val cents = Clustering.kmeansCentroids(spark, LocalSpark.sf)
    val corpus = Clustering
      .assignUnderCentroids(spark.table("embeddings"), cents)
      .select($"vec_id".as("corp_id"), $"cluster", $"ve".as("vc"))
    val input = MemoryStream[Vec]
    val matches = Clustering.assignUnderCentroids(input.toDF(), cents)
      .select($"vec_id", $"cluster", $"ve".as("vb"))
      .join(corpus, "cluster")
      .where(graft.functions.GraftFunctions.cosine_sim_d($"vb", $"vc") >= 0.35)
      .select($"vec_id", $"corp_id")
    val q = matches.writeStream.format("memory").queryName("sem_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      val v0 = spark.table("embeddings").where($"vec_id" === 0L)
        .select($"embedding").head.getSeq[Float](0).toArray
      // vec 100 = exact copy of corpus vec 0 (must match it);
      // vec 101 = zero vector (cosine guard -2.0 → can match nothing)
      input.addData(Vec(100L, v0), Vec(101L, Array.fill(64)(0.0f)))
      q.processAllAvailable()
      val got = spark.table("sem_dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.exists(p => p._1 == 100L && p._2 == 0L),
        s"copy of corpus vec 0 must match it: ${got.toSeq}")
      assert(!got.exists(_._1 == 101L), s"zero vector must match nothing: ${got.toSeq}")
    } finally q.stop()
  }

  test("streaming MinHash-LSH near-dup: band-bucket state emits candidate pairs across batches") {
    // the streaming twin of dedup_minhash_lsh: each arriving doc's
    // 64-hash signature bands into 16 bucket keys (the SAME kernels as
    // the batch operator), and per-bucket flatMapGroupsWithState keeps
    // the doc ids seen in that bucket — a new arrival pairs with every
    // resident. State is bounded by the batch operator's hot-bucket
    // discipline (64 ids per bucket); at scale the bucket key is the
    // shuffle key exactly as in the batch band join.
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[Doc]
    val bands = input.toDF()
      .select($"doc_id",
        expr("MINHASH_SIG(SHINGLE_SET(text, 3), 64)").as("sig"))
      .where(size($"sig") > 0)
      .select($"doc_id", explode(expr(
        "TRANSFORM(SEQUENCE(0, 15), b -> STRUCT(b AS band, HASH(SLICE(sig, b * 4 + 1, 4)) AS bandhash))")).as("e"))
      .select($"e.band".as("band"), $"e.bandhash".as("bandhash"), $"doc_id")
      .as[(Int, Long, Long)]
    val pairs = bands
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[List[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long)], state: GroupState[List[Long]]) =>
          val seen = state.getOption.getOrElse(Nil)
          val arrivals = rows.map(_._3).toList.distinct.filterNot(seen.contains)
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
          var residents = seen
          arrivals.foreach { n =>
            residents.foreach(s => out += ((math.min(s, n), math.max(s, n))))
            residents = n :: residents
          }
          state.update(residents.take(64)) // hot-bucket cap, as in batch
          out.distinct.iterator
      }
    val q = pairs.writeStream.format("memory").queryName("lsh_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = (1 to 60).map(i => s"tok$i").mkString(" ")
      input.addData(Doc(ts(1), 1, base))
      q.processAllAvailable()
      // batch 2: a near-dup of doc 1 (one word changed → shingle
      // Jaccard ≈ 0.95, P(band collision) ≈ 1) and an unrelated doc
      input.addData(
        Doc(ts(2), 2, base.replace("tok60", "changed")),
        Doc(ts(3), 3, (1 to 60).map(i => s"other$i").mkString(" ")))
      q.processAllAvailable()
      val got = spark.table("lsh_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 2L)), s"near-dup pair must surface: $got")
      assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
        s"unrelated doc must pair with nothing: $got")
    } finally q.stop()
  }

  test("custom sessionization with flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = input.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Sess](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val total = prev + evs.size
          state.update(total)
          Iterator(Sess(uid, total))
      }
    val q = sessions.writeStream.format("memory").queryName("ev_sess")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Ev(ts(1), 7, 1.0), Ev(ts(2), 7, 1.0), Ev(ts(3), 8, 1.0))
      q.processAllAvailable()
      input.addData(Ev(ts(4), 7, 1.0))
      q.processAllAvailable()
      val byUser = spark.table("ev_sess").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).max).toMap
      assert(byUser(7L) == 3L, byUser.toString)
      assert(byUser(8L) == 1L)
    } finally q.stop()
  }

  test("streaming funnel: per-user stage state across micro-batches matches batch semantics") {
    // the events_funnel operator's streaming twin: a monotone
    // view→click→purchase state machine in mapGroupsWithState — the
    // first click must follow the first view, the first purchase the
    // first click, exactly the batch query's chained-MIN semantics when
    // events arrive in event-time order
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvS]
    def stage(s: FunnelSt): Int =
      if (s.t3.nonEmpty) 3 else if (s.t2.nonEmpty) 2 else if (s.t1.nonEmpty) 1 else 0
    val staged = input.toDS()
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[EvS], st: GroupState[FunnelSt]) =>
          var s = st.getOption.getOrElse(FunnelSt(None, None, None))
          evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "view" if s.t1.isEmpty => s = s.copy(t1 = Some(t))
              case "click" if s.t1.nonEmpty && s.t2.isEmpty && t > s.t1.get =>
                s = s.copy(t2 = Some(t))
              case "purchase" if s.t2.nonEmpty && s.t3.isEmpty && t > s.t2.get =>
                s = s.copy(t3 = Some(t))
              case _ =>
            }
          }
          st.update(s)
          Sess(uid, stage(s).toLong)
      }
    val q = staged.writeStream.format("memory").queryName("ev_funnel")
      .outputMode(OutputMode.Update()).start()
    try {
      // user 1 converts fully; user 2 clicks with no prior view (stage
      // 0 — order matters, not mere presence); user 3 views only
      input.addData(
        EvS(ts(1), 1, "view"), EvS(ts(2), 2, "click"), EvS(ts(3), 3, "view"))
      q.processAllAvailable()
      input.addData(
        EvS(ts(4), 1, "click"), EvS(ts(5), 2, "view"), EvS(ts(6), 1, "purchase"))
      q.processAllAvailable()
      val st = spark.table("ev_funnel").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).max).toMap
      assert(st(1L) == 3L, st.toString) // view → click → purchase
      assert(st(2L) == 1L, st.toString) // click preceded the view: only stage 1
      assert(st(3L) == 1L, st.toString)
    } finally q.stop()
  }

  test("streaming rate anomaly: hourly windowed counts flag the burst hour") {
    // the events_rate_anomaly shape under a stream: watermarked hourly
    // counts per user; the burst hour surfaces with a count far above
    // the user's other hours (the batch query's z-score numerator)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val counts = input.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("h"), $"user_id", $"n")
    val q = counts.writeStream.format("memory").queryName("ev_rate")
      .outputMode(OutputMode.Update()).start()
    try {
      // user 5: one event per hour for 4 hours, then a 6-event burst
      val calm = (0 until 4).map(h => Ev(ts(h * 60), 5, 1.0))
      val burst = (0 until 6).map(i => Ev(ts(4 * 60 + i), 5, 1.0))
      input.addData(calm ++ burst: _*)
      q.processAllAvailable()
      val byHour = spark.table("ev_rate").collect()
        .map(r => (r.getTimestamp(0), r.getLong(2))).toMap
      assert(byHour(ts(240)) == 6L, byHour.toString)
      assert(byHour.count(_._2 == 1L) == 4, byHour.toString)
      // the burst is separable exactly the way the batch z-score
      // separates it: max count >> every calm hour
      assert(byHour.values.max >= 3 * byHour.values.filter(_ != 6L).max)
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attribute to touches within the band") {
    // the events_attribution join under two live streams: Structured
    // Streaming's watermarked interval join — each side buffers only
    // the band the watermark still allows, so state is bounded
    implicit val sqlCtx = spark.sqlContext
    val touches = MemoryStream[EvS]
    val purchases = MemoryStream[Ev]
    val t = touches.toDF().withWatermark("ts", "1 hour").as("t")
    val p = purchases.toDF().withWatermark("ts", "1 hour").as("p")
    val joined = p.join(t,
      expr("""t.user_id = p.user_id
              AND t.ts < p.ts
              AND t.ts >= p.ts - INTERVAL 2 HOURS"""))
      .select($"p.user_id".as("uid"), $"t.event_type".as("channel"),
        $"p.value".as("v"))
    val q = joined.writeStream.format("memory").queryName("attr_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      touches.addData(EvS(ts(0), 1, "click"), EvS(ts(30), 1, "view"),
        EvS(ts(0), 2, "click"),   // user 2 never purchases
        EvS(ts(90), 1, "click"))  // AFTER user 1's purchase — excluded
      purchases.addData(Ev(ts(60), 1, 10.0))
      q.processAllAvailable()
      // advance both watermarks so the join region closes
      touches.addData(EvS(ts(600), 9, "click"))
      purchases.addData(Ev(ts(600), 9, 0.0))
      q.processAllAvailable()
      val out = spark.table("attr_stream").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(out.count(_._1 == 1L) == 2, out.mkString(","))
      assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq("click", "view"))
      assert(!out.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("streaming ACID ingest: foreachBatch + MERGE stays exactly-once across retries") {
    // Hive's hcatalog/streaming TransactionBatch contract (SURVEY
    // §1.1/§2.9 — the reference's only real streaming surface): a
    // writer appends micro-batches transactionally, and a batch whose
    // commit failed is REPLAYED by the client — visibility must still
    // be exactly-once. Spark-first twin: foreachBatch + Acid.merge
    // keyed on the record id. The merge upsert makes replay idempotent
    // — the retried batch updates the same keys to the same values
    // instead of double-appending, which a plain append sink would do.
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.acid_stream")
    Seq.empty[(Long, Long, Double)].toDF("event_id", "user_id", "value")
      .write.saveAsTable("graft_db.acid_stream")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    def ingest(batch: org.apache.spark.sql.DataFrame): Unit =
      graft.operators.Acid.merge(spark, "graft_db.acid_stream",
        batch, Seq("event_id"))
    val q = input.toDF()
      // event_id = minute offset from the fixed test epoch (ts(m) -> m)
      .select(((unix_timestamp($"ts") - lit(1704067200L)) / 60)
        .cast("long").as("event_id"), $"user_id", $"value")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        ingest(b.toDF()); ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Ev(ts(1), 1, 10.0), Ev(ts(2), 1, 5.0), Ev(ts(3), 2, 7.0))
      q.processAllAvailable()
      // simulated failed-commit retry: the same micro-batch applied
      // again OUT OF BAND (as a restarted query would replay it), then
      // redelivered through the running stream as well
      val batch2 = Seq((4L, 2L, 1.0), (5L, 3L, 2.5))
        .toDF("event_id", "user_id", "value")
      ingest(batch2)
      ingest(batch2) // the replay — must be a no-op upsert
      input.addData(Ev(ts(4), 2, 1.0), Ev(ts(5), 3, 2.5))
      q.processAllAvailable()
      val rows = spark.table("graft_db.acid_stream").orderBy($"event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq((1L, 1L, 10.0), (2L, 1L, 5.0), (3L, 2L, 7.0),
        (4L, 2L, 1.0), (5L, 3L, 2.5)),
        s"exactly-once violated:\n${rows.mkString("\n")}")
      // reconciliation: per-user totals in the ACID table equal the
      // direct aggregate over the unique source events
      val got = spark.table("graft_db.acid_stream").groupBy($"user_id")
        .agg(count(lit(1)).as("n"), sum($"value").as("v"))
        .orderBy($"user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == Seq((1L, 2L, 15.0), (2L, 2L, 8.0), (3L, 1L, 2.5)), got)
    } finally q.stop()
  }

  test("streaming MV maintenance: per-batch partial merge equals full recompute") {
    // the agg_mv_incremental kernel as a stream: foreachBatch folds each
    // micro-batch's partial aggregates into the maintained MV (SUM+SUM,
    // cnt+cnt, MIN/MIN, MAX/MAX on the group key) — the refresh touches
    // the batch plus the MV, never the history. DECIMAL sums keep the
    // merge exact, so after any number of batches the MV must equal the
    // direct aggregate over everything ingested.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    def partials(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"user_id")
        .agg(sum($"value".cast("decimal(18,4)")).as("sum_v"),
          count(lit(1)).as("cnt"),
          min($"value").as("min_v"), max($"value").as("max_v"))
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"sum_v".cast("decimal(18,4)").as("sum_v"),
        $"cnt".cast("long").as("cnt"), $"min_v", $"max_v")
    var mv = normalize(partials(Seq.empty[Ev].toDF()))
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val merged = mv.unionByName(normalize(partials(batch)))
          .groupBy($"user_id")
          .agg(sum($"sum_v").as("sum_v"), sum($"cnt").as("cnt"),
            min($"min_v").as("min_v"), max($"max_v").as("max_v"))
        // a production refresh writes the MV table; localCheckpoint is
        // the in-test stand-in that likewise truncates lineage
        mv = normalize(merged).localCheckpoint(true)
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      val all = Seq(
        Ev(ts(1), 1, 2.5), Ev(ts(2), 2, 4.0), Ev(ts(3), 1, 1.25),
        Ev(ts(4), 3, 9.0), Ev(ts(5), 2, 0.5), Ev(ts(6), 1, 7.75))
      input.addData(all.take(3): _*)
      q.processAllAvailable()
      input.addData(all.drop(3): _*)
      q.processAllAvailable()
      val got = mv.orderBy($"user_id").collect()
        .map(r => (r.getLong(0), r.getDecimal(1).toPlainString, r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
      val want = normalize(partials(all.toDF())).orderBy($"user_id").collect()
        .map(r => (r.getLong(0), r.getDecimal(1).toPlainString, r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
      assert(got.toSeq == want.toSeq,
        s"merged MV diverged from recompute:\n${got.mkString("\n")}\nvs\n${want.mkString("\n")}")
    } finally q.stop()
  }

  test("streaming interval coverage: merged-interval state matches the batch sweep") {
    // events_interval_coverage's streaming twin: per-user state is the
    // MERGED interval list (the canonical form — bounded by coverage
    // structure, not event count), each arrival [t, t+5min] unions in,
    // and the emitted covered_us must equal the batch sweep-line union
    // over everything seen so far.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val win = 5 * 60 * 1000000L // 5 min in µs
    def merge(iv: List[(Long, Long)]): List[(Long, Long)] = {
      val sorted = iv.sortBy(_._1)
      sorted.drop(1).foldLeft(List(sorted.head)) { (acc, i) =>
        val h = acc.head
        if (i._1 <= h._2) (h._1, math.max(h._2, i._2)) :: acc.tail
        else i :: acc
      }.reverse
    }
    val covered = input.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[List[(Long, Long)]]) =>
          val arrivals = evs.map { e =>
            val t = e.ts.getTime * 1000L
            (t, t + win)
          }.toList
          val merged = merge(state.getOption.getOrElse(Nil) ++ arrivals)
          state.update(merged)
          Iterator((uid, merged.map(i => i._2 - i._1).sum))
      }
    val q = covered.writeStream.format("memory").queryName("iv_cov")
      .outputMode(OutputMode.Update()).start()
    try {
      // user 7: overlapping [0,5], [3,8]; user 8: disjoint [0,5], [20,25]
      input.addData(Ev(ts(0), 7, 1.0), Ev(ts(3), 7, 1.0), Ev(ts(0), 8, 1.0))
      q.processAllAvailable()
      // late second batch extends 7 ([7,12] bridges) and adds 8's island
      input.addData(Ev(ts(7), 7, 1.0), Ev(ts(20), 8, 1.0))
      q.processAllAvailable()
      val got = spark.table("iv_cov").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).max).toMap
      // batch truth: 7 covers [0,12]+5min = 12 min; 8 covers 2 islands
      assert(got(7L) == 12L * 60 * 1000000, got.toString)
      assert(got(8L) == 10L * 60 * 1000000, got.toString)
      // cross-check against the BATCH union on the same points
      def batchUnion(starts: Seq[Int]) =
        merge(starts.map(m => (m * 60000000L, m * 60000000L + win)).toList)
          .map(i => i._2 - i._1).sum
      assert(got(7L) == batchUnion(Seq(0, 3, 7)))
      assert(got(8L) == batchUnion(Seq(0, 20)))
    } finally q.stop()
  }
}
