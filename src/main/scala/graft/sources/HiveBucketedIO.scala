package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{HiveHash, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.Tables

/** Hive-compatible bucketed-table layout: read path with bucket pruning
  * (SURVEY.md §7.3#3 — the `BucketMapJoinOptimizer`-era contract;
  * Hive `serde2/objectinspector/ObjectInspectorUtils.getBucketNumber`:
  * `(hashCode & Integer.MAX_VALUE) % numberOfBuckets`, with
  * `getBucketHashCode` the per-type hash Spark ships verbatim as
  * `catalyst.expressions.HiveHash`; bucket files are `%06d_0` in the
  * table directory, Hive `ql/exec/Utilities` naming).
  *
  * Why it matters: Spark's own `bucketBy` uses Murmur3, so a table
  * written by Hive CANNOT be bucket-pruned (or SMB-joined) by Spark's
  * native bucketing — a migrating user's existing bucketed warehouse
  * would silently fall back to full scans. This module maps Hive's
  * file→bucket contract directly: a point lookup on the bucket key
  * hashes the literal ONCE on the driver and reads exactly one of the
  * N bucket files — 1/N of the table's bytes at any scale, no filter
  * pass over the other buckets. That is the same I/O shape Hive's
  * bucket pruning produced, recovered under Spark.
  *
  * Keys hash as BIGINT on both write and read (Hive's long hash
  * `(int)(v ^ (v >>> 32))` equals the int hash for all values < 2^31,
  * and casting both sides makes the contract exact for ANY key
  * domain). The writer routes rows in ONE shuffle (repartition on the
  * bucket id, dynamic-partition write, N driver-side renames), so
  * producing Hive-layout data is a single data pass at any scale —
  * though in the migration story the bucketed data usually already
  * exists (Hive wrote it), and the product surface is the read path.
  */
object HiveBucketedIO {

  /** Hive bucket id of (possibly compound) key columns. */
  def bucketIdColumn(numBuckets: Int, keys: Column*): Column =
    Bridge.column(HiveHash(keys.map(Bridge.expression)))
      .bitwiseAND(lit(Int.MaxValue)) % lit(numBuckets)

  /** Driver-side bucket id of a literal key — the pruning decision. */
  def bucketIdOf(numBuckets: Int, key: Any): Int = {
    val h = HiveHash(Seq(Literal(key))).eval(null).asInstanceOf[Int]
    (h & Int.MaxValue) % numBuckets
  }

  /** Hive's bucket-file name for bucket n (first copy). */
  def bucketFileName(n: Int): String = f"$n%06d_0"

  /** Writes `df` into Hive bucket-file layout under `dir` (parquet
    * content, Hive file naming/routing). Fixture-scale: one filtered
    * pass: see below. */
  def writeBucketed(df: DataFrame, dir: String, numBuckets: Int,
                    keys: Column*): Unit = {
    val spark = df.sparkSession
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    if (fs.exists(out)) fs.delete(out, true)
    // ONE shuffle at any scale: repartition on the bucket id so each
    // bucket's rows land in a single task, then a dynamic-partition
    // write emits exactly one file per __bucket=N directory (one task
    // owns each directory). The driver then renames each directory's
    // part file to Hive's flat %06d_0 layout — N cheap FS renames, no
    // second data pass. (A task may own several buckets; it still
    // writes one file per directory.)
    val staging = new Path(dir + "_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    df.withColumn("__bucket", bucketIdColumn(numBuckets, keys: _*))
      .repartition(numBuckets, col("__bucket"))
      .write.partitionBy("__bucket").parquet(staging.toString)
    fs.mkdirs(out)
    try {
      for (n <- 0 until numBuckets) {
        val bucketDir = new Path(staging, s"__bucket=$n")
        val target = new Path(out, bucketFileName(n))
        val parts =
          if (fs.exists(bucketDir))
            fs.listStatus(bucketDir).map(_.getPath)
              .filter(_.getName.startsWith("part-"))
          else Array.empty[Path]
        parts match {
          case Array(single) => fs.rename(single, target)
          case Array() => // empty bucket: a schema-only parquet file
            df.limit(0).write.parquet((target + "_tmp"))
            val p = fs.listStatus(new Path(target + "_tmp")).map(_.getPath)
              .find(_.getName.startsWith("part-")).get
            fs.rename(p, target)
            fs.delete(new Path(target + "_tmp"), true)
          case many => sys.error(
            s"bucket $n produced ${many.length} files — repartition contract broken")
        }
      }
    } finally fs.delete(staging, true)
    // marker written LAST: its presence certifies a complete layout
    fs.create(new Path(out, "_BUCKETS_OK")).close()
  }

  /** Reads one bucket file (1/numBuckets of the table's bytes). */
  def readBucketFile(spark: SparkSession, dir: String, n: Int): DataFrame =
    spark.read.parquet(new Path(dir, bucketFileName(n)).toString)

  /** Reads the whole bucketed table (all bucket files). */
  def readAll(spark: SparkSession, dir: String, numBuckets: Int): DataFrame =
    spark.read.parquet(
      (0 until numBuckets).map(n => new Path(dir, bucketFileName(n)).toString): _*)

  /** Bucket-pruned point lookup: hashes the literal on the driver,
    * scans only that bucket's file, applies the key equality as the
    * residual filter. The key column must be the table's (single)
    * bucket key, hashed as BIGINT at write time. */
  def lookup(spark: SparkSession, dir: String, numBuckets: Int,
             keyCol: String, value: Long): DataFrame =
    readBucketFile(spark, dir, bucketIdOf(numBuckets, value))
      .where(col(keyCol) === lit(value))

  // ------------------------------------------------------------------
  // driver-contract query: customer bucketed by c_custkey into 8 Hive
  // buckets, point lookups pruned to one file each
  // ------------------------------------------------------------------

  private val NumBuckets = 8
  private val fixtureLock = new Object

  /** Hive-bucket-layout copy of `customer` for `sfDir`, built once per
    * warehouse (marker-gated; rebuilt only if absent/incomplete). */
  def customerFixture(spark: SparkSession, sfDir: String): String =
    fixtureLock.synchronized {
      val base = spark.conf.get("spark.sql.warehouse.dir") + "/_graft_fixtures"
      val dir = s"$base/hive_bucketed_customer${NumBuckets}_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(dir, "_BUCKETS_OK"))) {
        Tables.register(spark, sfDir)
        writeBucketed(spark.table("customer"), dir, NumBuckets,
          col("c_custkey").cast("bigint"))
      }
      dir
    }

  private type Q = (SparkSession, String) => DataFrame

  private val LookupKeys = Seq(1L, 19L, 42L)

  val queries: Map[String, Q] = Map(
    "source_hive_bucket_lookup" -> ((spark, sfDir) => {
      val dir = customerFixture(spark, sfDir)
      LookupKeys
        .map(k => lookup(spark, dir, NumBuckets, "c_custkey", k))
        .reduce(_ union _)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal"))
        .orderBy(col("c_custkey"))
    })
  )

  // the oracle reads the SOURCE table: the bucket-pruned read of the
  // fixture must return exactly the rows a plain key filter returns
  val oracle: Map[String, String] = Map(
    "source_hive_bucket_lookup" -> s"""
      SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      FROM customer WHERE c_custkey IN (${LookupKeys.mkString(", ")})
      ORDER BY c_custkey"""
  )
}
