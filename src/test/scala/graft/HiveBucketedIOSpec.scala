package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{HiveHash, Literal}
import graft.sources.HiveBucketedIO

/** Hive bucket-layout read path (SURVEY §7.3#3): the file→bucket
  * contract, pruned point lookups, and the HiveHash semantics the
  * pruning decision depends on. */
class HiveBucketedIOSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-hivebucket").toString + "/tbl"

  test("HiveHash matches Hive's per-type hash contract") {
    // Hive ObjectInspectorUtils.hashCode: int -> value; long ->
    // (int)(v ^ (v >>> 32)); string -> Java String.hashCode
    assert(HiveHash(Seq(Literal(42))).eval(null) == 42)
    assert(HiveHash(Seq(Literal(42L))).eval(null) == 42)
    val v = 0x1234567890abcdefL
    assert(HiveHash(Seq(Literal(v))).eval(null) == (v ^ (v >>> 32)).toInt)
    assert(HiveHash(Seq(Literal("abc"))).eval(null) == "abc".hashCode)
    // bucket id applies Hive's (h & MAX_VALUE) % n — NOT pmod: a
    // negative hash maps via the masked positive value
    val neg = HiveHash(Seq(Literal("abcd"))).eval(null).asInstanceOf[Int]
    assert(HiveBucketedIO.bucketIdOf(8, "abcd") == ((neg & Int.MaxValue) % 8))
  }

  test("every row lands in the bucket file its key hashes to") {
    Tables.register(spark, LocalSpark.sf)
    val dir = tmp()
    HiveBucketedIO.writeBucketed(
      spark.table("supplier"), dir, 4, col("s_suppkey").cast("bigint"))
    var total = 0L
    for (n <- 0 until 4) {
      val bucket = HiveBucketedIO.readBucketFile(spark, dir, n)
      val misrouted = bucket.where(
        HiveBucketedIO.bucketIdColumn(4, col("s_suppkey").cast("bigint")) =!= n)
      assert(misrouted.count() == 0, s"misrouted rows in bucket $n")
      total += bucket.count()
    }
    assert(total == spark.table("supplier").count(), "buckets partition the table")
  }

  test("point lookup reads exactly one bucket file and the right rows") {
    Tables.register(spark, LocalSpark.sf)
    val dir = tmp()
    HiveBucketedIO.writeBucketed(
      spark.table("customer"), dir, 8, col("c_custkey").cast("bigint"))
    val keys = spark.table("customer").select(col("c_custkey"))
      .orderBy(col("c_custkey")).limit(5).collect().map(_.getLong(0))
    for (k <- keys) {
      val looked = HiveBucketedIO.lookup(spark, dir, 8, "c_custkey", k)
      // the pruned-scan gate: ONE file of the eight
      assert(looked.inputFiles.length == 1, s"lookup $k scanned >1 file")
      val expect = spark.table("customer").where(col("c_custkey") === k)
        .select(looked.columns.map(col).toIndexedSeq: _*)
      assert(looked.collect().toSeq == expect.collect().toSeq)
    }
    // full-table read sees all 8 files and every row
    val all = HiveBucketedIO.readAll(spark, dir, 8)
    assert(all.inputFiles.length == 8)
    assert(all.count() == spark.table("customer").count())
  }

  test("co-located bucket join: shuffle-free and equal to the SQL join") {
    Tables.register(spark, LocalSpark.sf)
    val dirC = HiveBucketedIO.tableFixture(spark, LocalSpark.sf, "customer", "c_custkey")
    val dirO = HiveBucketedIO.tableFixture(spark, LocalSpark.sf, "orders", "o_custkey")
    val joined = HiveBucketedIO.bucketedJoin(
      spark, dirO, dirC, 8, "o_custkey", "c_custkey")
    // one partition per bucket pair, and NO shuffle anywhere in the
    // join lineage (zipPartitions over aligned narrow reads)
    assert(joined.rdd.getNumPartitions == 8)
    assert(!joined.rdd.toDebugString.contains("ShuffledRDD"),
      "bucket join lineage contains a shuffle")
    val got = joined.groupBy($"c_mktsegment").count()
      .orderBy($"c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = spark.table("orders")
      .join(spark.table("customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").count()
      .orderBy($"c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"bucket join diverged:\n$got\nvs\n$want")
  }

  test("driver query scans only the pruned files (3 of 8)") {
    val df = SparkEntry.queries("source_hive_bucket_lookup")(spark, LocalSpark.sf)
    assert(df.inputFiles.length <= 3,
      s"expected <=3 pruned bucket files, scanned ${df.inputFiles.length}")
    assert(df.count() == 3)
  }
}
