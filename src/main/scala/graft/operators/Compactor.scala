package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Automatic compaction — Hive's background compactor service
  * (ql/txn/compactor/{Initiator,Worker,Cleaner}.java, SURVEY.md §2.2
  * ACID tail) re-expressed as one idempotent batch `tick` instead of
  * resident daemon threads. The service loop (metastore-leased threads
  * polling on an interval) is deployment infrastructure; the engine
  * capability is the three decisions the loop makes, and those are
  * what this module implements:
  *
  *  - '''Initiator''' (`inspect`): decide WHICH partitions need
  *    compaction from storage METADATA ONLY — one `listStatus` per
  *    partition directory, never a data scan, exactly like Hive's
  *    initiator reading delta-directory listings from the metastore.
  *    Hive fires when a partition accumulates ≥
  *    `hive.compactor.delta.num.threshold` (default 10) delta files;
  *    in graft's rewrite-based ACID model (no deltas — see
  *    `Acid.scala` header) every UPDATE/DELETE/MERGE/streaming-append
  *    leaves whole small files, so the analog trigger is FILE SURPLUS:
  *    a partition holding `surplusFiles` more files than the rewrite
  *    floor `ceil(bytes / targetFileBytes)`, or `surplusRatio`× that
  *    floor, is flagged.
  *  - '''Worker''' (`compact`): execute each request as an
  *    [[Acid.concatenate]] scoped to that one partition — a
  *    partition-pruned read, per-directory-sized salted repartition,
  *    staged overwrite on the table's own filesystem. `concatenate`
  *    re-derives the exact no-op floor (including the zero-row-residue
  *    rule) before touching anything, so a request that metadata-only
  *    inspection over-flagged is a safe no-op, and a crashed tick can
  *    simply be re-run — idempotence replaces Hive's metastore
  *    compaction queue ("initiated"/"working"/"ready for cleaning"
  *    states) as the crash-consistency story.
  *  - '''Cleaner''' (`cleanStaleStaging`): remove obsolete post-compaction
  *    artifacts. Hive's cleaner deletes replaced delta/base dirs once
  *    readers drain; here the only residue class is a
  *    `_graft_staging_<table>_*` sibling directory that a crashed
  *    overwrite kept as its recovery copy (`Acid.overwrite` contract).
  *    Deletion is TTL-gated so an IN-FLIGHT staging dir of a concurrent
  *    writer — or a fresh crash residue an operator may still want for
  *    recovery — is never swept; only residue older than `stagingTtlMs`
  *    goes.
  *
  * Scale: a tick over a 100 TB warehouse costs one FS listing per
  * partition plus rewrites proportional to the FLAGGED partitions'
  * bytes only — the healthy tail of the table is never read (the same
  * cost envelope Hive's compactor targets). Run it from any scheduler;
  * ticks are serializable and idempotent.
  */
object Compactor {

  /** One compaction request: a partition (empty spec = unpartitioned
    * table) holding `files` files whose rewrite floor is `targetFiles`. */
  final case class Request(table: String, spec: Seq[(String, String)],
                           files: Int, bytes: Long, targetFiles: Int) {
    def scope: Option[Column] =
      if (spec.isEmpty) None
      else Some(spec.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _))
    def specString: String =
      if (spec.isEmpty) "<table>"
      else spec.map { case (c, v) => s"$c=$v" }.mkString("/")
  }

  /** Outcome of one tick. `compacted` pairs each executed request with
    * concatenate's (filesBefore, filesAfterFloor). */
  final case class Report(requests: Seq[Request],
                          compacted: Seq[(Request, (Int, Int))],
                          cleanedStaging: Seq[String])

  /** Initiator: metadata-only fragmentation scan. Flags a partition
    * when its file count exceeds the rewrite floor by `surplusFiles`
    * files or `surplusRatio`× — Hive's delta.num.threshold analog (see
    * header). Partition directories are resolved as
    * `<tableLocation>/<escaped spec path>`, the layout Spark's own
    * writers produce (a partition relocated with ALTER ... SET LOCATION
    * is out of this fixture-scale resolver's scope; Hive's initiator
    * reads the same locations from the metastore). */
  def inspect(spark: SparkSession, table: String,
              targetFileBytes: Long = 128L << 20,
              surplusFiles: Int = 10,
              surplusRatio: Double = 2.0): Seq[Request] = {
    require(targetFileBytes > 0 && surplusFiles >= 1 && surplusRatio > 1.0)
    val loc = Acid.tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs: Seq[(Seq[(String, String)], Path)] =
      partitionSpecs(spark, table) match {
        case Nil => Seq(Nil -> loc)
        case specs => specs.map { spec =>
          spec -> spec.foldLeft(loc) { case (p, (c, v)) =>
            new Path(p, s"$c=${escapePathValue(v)}")
          }
        }
      }
    partDirs.flatMap { case (spec, dir) =>
      if (!fs.exists(dir)) None
      else {
        val files = fs.listStatus(dir).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        val bytes = files.map(_.getLen).sum
        val floor = math.max(1L,
          math.ceil(bytes.toDouble / targetFileBytes).toLong).toInt
        val flagged = files.length > floor &&
          (files.length - floor >= surplusFiles ||
            files.length >= math.ceil(surplusRatio * floor))
        if (flagged) Some(Request(table, spec, files.length, bytes, floor))
        else None
      }
    }
  }

  /** Worker: execute one request (see header for why failures are safe
    * to retry). */
  def compact(spark: SparkSession, req: Request,
              targetFileBytes: Long = 128L << 20): (Int, Int) =
    Acid.concatenate(spark, req.table, targetFileBytes, req.scope)

  /** Cleaner: delete `_graft_staging_<table>_*` crash residue older
    * than `ttlMs`. Returns the deleted paths. */
  def cleanStaleStaging(spark: SparkSession, table: String,
                        ttlMs: Long): Seq[String] = {
    val tableDir = Acid.tableLocation(spark, table)
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = tableDir.getParent
    if (parent == null || !fs.exists(parent)) return Nil
    val cutoff = System.currentTimeMillis() - ttlMs
    fs.listStatus(parent).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"_graft_staging_${tableDir.getName}_") &&
        st.getModificationTime < cutoff)
      .map { st => fs.delete(st.getPath, true); st.getPath.toString }
  }

  /** One full Initiator→Worker→Cleaner pass over `tables`. */
  def tick(spark: SparkSession, tables: Seq[String],
           targetFileBytes: Long = 128L << 20,
           surplusFiles: Int = 10,
           surplusRatio: Double = 2.0,
           stagingTtlMs: Long = 24L * 3600 * 1000): Report = {
    val cleaned = tables.flatMap(cleanStaleStaging(spark, _, stagingTtlMs))
    val requests = tables.flatMap(
      inspect(spark, _, targetFileBytes, surplusFiles, surplusRatio))
    val compacted = requests.map(r => r -> compact(spark, r, targetFileBytes))
    Report(requests, compacted, cleaned)
  }

  /** SHOW PARTITIONS → typed-as-written spec value strings. */
  private def partitionSpecs(spark: SparkSession,
                             table: String): Seq[Seq[(String, String)]] = {
    val partCols = spark.catalog.listColumns(table)
      .collect().filter(_.isPartition).map(_.name).toSeq
    if (partCols.isEmpty) Nil
    else spark.sql(s"SHOW PARTITIONS $table").collect().toSeq.map { row =>
      row.getString(0).split('/').toSeq.map { kv =>
        val i = kv.indexOf('=')
        kv.take(i) -> unescapePathValue(kv.drop(i + 1))
      }
    }
  }

  // Hive path escaping (ql/metadata — FileUtils.escapePathName, public
  // layout contract; Spark writes the identical encoding): %-hex for
  // the reserved set. Round-tripped here so SHOW PARTITIONS values map
  // back onto directory names.
  private def escapePathValue(v: String): String = v.flatMap { ch =>
    if (ch < ' ' || "\"#%'*/:=?\\{[]^".contains(ch)) f"%%${ch.toInt}%02X"
    else ch.toString
  }

  private def unescapePathValue(v: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      if (v(i) == '%' && i + 3 <= v.length) {
        sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(v(i)); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------------
  // driver-contract query: fragment a partitioned copy of lineitem the
  // way incremental ACID writers do, run one tick, prove the compacted
  // table is byte-for-byte the source data (the oracle never sees the
  // fragmented copy). Self-contained per run — rebuilding the fixture
  // exercises Initiator+Worker+Cleaner every time at trivial cost.
  // ------------------------------------------------------------------

  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "acid_auto_compact" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
      val t = "graft_db.compactor_li"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // 13 files per l_returnflag partition — an incremental writer's
      // small-file debris (13 > floor 1 + surplus 8 ⇒ all flagged).
      // A deterministic quarter of lineitem: the fixture is rebuilt,
      // fragmented, compacted, and re-read EVERY run, and a full-table
      // copy made this the bench's top heavy (6.6 s at sf0.1) while
      // proving nothing extra — the oracle applies the same filter.
      spark.table("lineitem")
        .where(col("l_orderkey") % 4 === 0)
        .repartition(13, col("l_orderkey"))
        .write.partitionBy("l_returnflag").format("parquet").saveAsTable(t)
      val report = tick(spark, Seq(t),
        targetFileBytes = 256L << 20, surplusFiles = 8)
      require(report.requests.nonEmpty, "initiator flagged nothing")
      // second tick must converge: re-inspection finds healthy partitions
      require(inspect(spark, t, 256L << 20, surplusFiles = 8).isEmpty,
        "compaction did not converge")
      spark.table(t)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("bigint").as("n_rows"),
          sum(round(col("l_quantity") * 100).cast("bigint")).cast("bigint")
            .as("qty_cents"),
          sum(round(col("l_extendedprice") * 100).cast("bigint")).cast("bigint")
            .as("price_cents"))
        .orderBy(col("l_returnflag"))
    })
  )

  // data preservation is the whole contract: the compacted table must
  // aggregate identically to the untouched source parquet
  val oracle: Map[String, String] = Map(
    "acid_auto_compact" -> """
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
      FROM lineitem
      WHERE l_orderkey % 4 = 0
      GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
