package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Acid, Compactor}

/** Initiator/Worker/Cleaner compaction tick (Compactor.scala header). */
class CompactorSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def dataFiles(dir: Path): Array[Path] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath)
  }

  test("initiator flags only fragmented partitions; worker converges them") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.cmp_part")
    Tables.register(spark, LocalSpark.sf)
    // partition R fragmented into many files, partitions A/N healthy:
    // write healthy first, then append a fragmented slice of R only
    val li = spark.table("lineitem")
    li.where($"l_returnflag" =!= "R").coalesce(1)
      .write.partitionBy("l_returnflag").format("parquet")
      .saveAsTable("graft_db.cmp_part")
    li.where($"l_returnflag" === "R").repartition(12, $"l_orderkey")
      .write.mode("append").partitionBy("l_returnflag").format("parquet")
      .saveAsTable("graft_db.cmp_part")

    val before = spark.table("graft_db.cmp_part").count()
    val reqs = Compactor.inspect(spark, "graft_db.cmp_part",
      targetFileBytes = 256L << 20, surplusFiles = 8)
    assert(reqs.map(_.specString) == Seq("l_returnflag=R"), reqs)
    assert(reqs.head.files >= 12 && reqs.head.targetFiles == 1)

    val report = Compactor.tick(spark, Seq("graft_db.cmp_part"),
      targetFileBytes = 256L << 20, surplusFiles = 8)
    assert(report.compacted.size == 1)
    // converged: the R partition is now at its rewrite floor
    assert(Compactor.inspect(spark, "graft_db.cmp_part",
      targetFileBytes = 256L << 20, surplusFiles = 8).isEmpty)
    val loc = new Path(spark.sql("DESCRIBE FORMATTED graft_db.cmp_part")
      .collect()
      .dropWhile(!_.getString(0).trim.startsWith("# Detailed Table Information"))
      .find(_.getString(0).trim == "Location").get.getString(1).trim)
    assert(dataFiles(new Path(loc, "l_returnflag=R")).length == 1)
    // data preserved exactly
    assert(spark.table("graft_db.cmp_part").count() == before)
    val a = spark.table("graft_db.cmp_part")
      .agg(sum(round($"l_extendedprice" * 100).cast("bigint"))).first().getLong(0)
    val b = li.agg(sum(round($"l_extendedprice" * 100).cast("bigint")))
      .first().getLong(0)
    assert(a == b)
    // healthy tick is a no-op
    val again = Compactor.tick(spark, Seq("graft_db.cmp_part"),
      targetFileBytes = 256L << 20, surplusFiles = 8)
    assert(again.requests.isEmpty && again.compacted.isEmpty)
  }

  test("unpartitioned table: surplus-ratio trigger and rewrite floor") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.cmp_flat")
    Tables.register(spark, LocalSpark.sf)
    spark.table("orders").repartition(9, $"o_orderkey")
      .write.format("parquet").saveAsTable("graft_db.cmp_flat")
    // 9 files vs floor 1: below surplusFiles=10 but over ratio 2×
    val reqs = Compactor.inspect(spark, "graft_db.cmp_flat",
      targetFileBytes = 256L << 20, surplusFiles = 10, surplusRatio = 2.0)
    assert(reqs.map(_.spec) == Seq(Nil))
    val n = spark.table("graft_db.cmp_flat").count()
    Compactor.tick(spark, Seq("graft_db.cmp_flat"),
      targetFileBytes = 256L << 20, surplusFiles = 10)
    assert(spark.table("graft_db.cmp_flat").count() == n)
    assert(Compactor.inspect(spark, "graft_db.cmp_flat",
      targetFileBytes = 256L << 20, surplusFiles = 10).isEmpty)
  }

  test("cleaner: stale staging residue swept, fresh residue kept") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.cmp_clean")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("parquet").saveAsTable("graft_db.cmp_clean")
    val loc = new Path(spark.sql("DESCRIBE FORMATTED graft_db.cmp_clean")
      .collect()
      .dropWhile(!_.getString(0).trim.startsWith("# Detailed Table Information"))
      .find(_.getString(0).trim == "Location").get.getString(1).trim)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new Path(loc.getParent, s"_graft_staging_${loc.getName}_dead1234")
    val fresh = new Path(loc.getParent, s"_graft_staging_${loc.getName}_live5678")
    fs.mkdirs(stale); fs.mkdirs(fresh)
    fs.setTimes(stale, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    val cleaned = Compactor.cleanStaleStaging(spark, "graft_db.cmp_clean",
      ttlMs = 24L * 3600 * 1000)
    assert(cleaned.size == 1 && cleaned.head.endsWith("dead1234"), cleaned)
    assert(!fs.exists(stale) && fs.exists(fresh))
    fs.delete(fresh, true)
  }

  test("driver query: fragmented copy compacts and matches source aggregate") {
    val out = graft.operators.Compactor.queries("acid_auto_compact")(
      spark, LocalSpark.sf)
    val rows = out.collect()
    assert(rows.length == 3) // A, N, R
    val src = Tables.sql("""
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
      FROM lineitem WHERE l_orderkey % 4 = 0
      GROUP BY l_returnflag ORDER BY l_returnflag""")(
      spark, LocalSpark.sf).collect()
    assert(rows.map(_.toSeq).toSeq == src.map(_.toSeq).toSeq)
  }

  test("bucket-layout tombstone fold: delete-delta file discipline on a generic table") {
    // the HiveBucketedIO delete-maintenance path on a NON-LSH layout
    // with a string identity column — the fold's UnsafeProjection
    // byte-equality must hold beyond the long/long index case
    import org.apache.spark.sql.functions.col
    import graft.sources.HiveBucketedIO
    val dir = spark.conf.get("spark.sql.warehouse.dir") +
      "/_graft_fixtures/compactor_tomb_fold"
    import spark.implicits._
    val base = (0 until 200).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
      .sortWithinPartitions("id")
    HiveBucketedIO.writeBucketed(base, dir, 8, Seq(col("id")), col("id"))
    // an appended generation makes the fold's scan a CONCATENATION of
    // separately-sorted runs — exactly the case where `sortWithin`
    // must restore the layout's within-file sort contract
    val delta = (200 until 240).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
    HiveBucketedIO.appendBucketed(delta, dir, 8, Seq(col("id")), col("id"))
    // delete every row whose id % 9 == 0, identified by (id, name)
    val dels = (0 until 240).filter(_ % 9 == 0)
      .map(i => (i.toLong, s"name_$i")).toDF("id", "name")
    HiveBucketedIO.deleteBucketed(dels, dir, 8, col("id"))
    assert(HiveBucketedIO.hasTombstones(spark, dir))
    // a reader that honors tombstones sees 240 - 27 live rows
    assert(HiveBucketedIO.foldTombstones(spark, dir, 8, ratio = 1e-9,
      sortWithin = Seq(col("id"))))
    assert(!HiveBucketedIO.hasTombstones(spark, dir))
    val folded = HiveBucketedIO.readAll(spark, dir, 8)
    assert(folded.count() == 240 - dels.count())
    assert(folded.where(col("id") % 9 === 0).count() == 0,
      "a tombstoned row survived the fold")
    // untouched rows keep all their columns intact
    assert(folded.where(col("id") === 1).collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, "name_1", 1)))
    // the fold folded the delta generation in AND restored the sort:
    // each bucket file is one generation, internally id-sorted
    for (n <- 0 until 8) {
      val names = HiveBucketedIO.bucketGenFiles(spark, dir, n)
      assert(names.length == 1, s"bucket $n kept ${names.length} generations")
      val ids = spark.read.parquet(names.head)
        .select("id").collect().map(_.getLong(0))
      assert(ids.zip(ids.tail).forall { case (a, b) => a <= b },
        s"bucket $n lost its within-file sort across the fold")
    }
  }
}
