package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive ACID UPDATE/DELETE (QL/parse/UpdateDeleteSemanticAnalyzer.java,
  * base+delta files — SURVEY.md §1.1) mapped to the vanilla-Spark
  * equivalent: read → rewrite → overwrite. No delta files or compactor
  * are needed because the rewrite IS the compaction.
  *
  * Scale behavior: an unscoped UPDATE/DELETE rewrites the whole table —
  * unavoidable without a delta format. Passing `partitionScope` (a
  * predicate over the table's partition columns) confines BOTH the read
  * and the rewrite to matching partitions under dynamic partition
  * overwrite, so at 100 TB the cost is proportional to touched
  * partitions, not table size. Rows outside the scope are untouched on
  * disk, not rewritten. Exception: an UPDATE whose assignment targets a
  * partition column can MOVE rows into partitions outside the scope —
  * dynamic overwrite would then replace those target partitions with
  * only the moved rows. That case falls back to a full static rewrite
  * (correct for any movement pattern; costs a table scan, like Hive's
  * own rewrite of a bucketed/partitioned update).
  *
  * Durability: the staged copy lives on the TABLE's own filesystem (a
  * `_graft_staging_*` sibling of the table directory), so on a real
  * cluster every executor writes to the shared FS — never to
  * driver-local temp (round-1 flaw). The final overwrite inherits
  * Spark's INSERT OVERWRITE commit protocol (job-commit rename); the
  * staged copy is kept until that commit returns, so a crash
  * mid-overwrite still leaves a complete staged copy on the table FS
  * for manual recovery.
  */
object Acid {

  /** UPDATE table SET assignments WHERE cond [scoped to partitions].
    * All assignment values and the condition are evaluated against the
    * ORIGINAL row (SQL UPDATE semantics) — a single projection, not
    * sequential withColumn rewrites where later assignments would see
    * earlier ones' results. */
  def updateTable(spark: SparkSession, table: String,
                  cond: Column, assignments: Map[String, Column],
                  partitionScope: Option[Column] = None): Unit = {
    val movesAcrossPartitions =
      partitionColumns(spark, table).exists(assignments.contains)
    (partitionScope, movesAcrossPartitions) match {
      case (Some(scope), true) =>
        // rows may leave the scoped partitions: rewrite the whole table
        // statically (see header) with the scope folded into the
        // update condition so out-of-scope rows pass through unchanged
        val base = spark.table(table)
        overwrite(spark, table,
          project(base, cond && scope, assignments), dynamicPartitions = false)
      case _ =>
        val base = scoped(spark, table, partitionScope)
        // UPDATE preserves per-partition row counts here (no partition
        // column changes), so every scoped partition reappears in the
        // staged output and dynamic overwrite covers all of them
        overwrite(spark, table,
          project(base, cond, assignments), partitionScope.isDefined)
    }
  }

  /** DELETE FROM table WHERE cond [scoped to partitions]. */
  def deleteFrom(spark: SparkSession, table: String, cond: Column,
                 partitionScope: Option[Column] = None): Unit = {
    val remaining = scoped(spark, table, partitionScope)
      .where(!coalesce(cond, lit(false)))
    partitionScope match {
      case None =>
        overwrite(spark, table, remaining, dynamicPartitions = false)
      case Some(scope) =>
        // dynamic overwrite only rewrites partitions PRESENT in the
        // staged data — a scoped partition whose every row is deleted
        // would silently survive. Record the scoped partitions first and
        // drop the ones the rewrite emptied.
        val partCols = partitionColumns(spark, table)
        require(partCols.nonEmpty, "partitionScope given but table is unpartitioned")
        val scopedParts = spark.table(table).where(scope)
          .select(partCols.map(col).toIndexedSeq: _*).distinct().collect()
        // partitions surviving the delete = partitions present in the
        // STAGED output (collected before the overwrite — afterwards the
        // untouched-by-dynamic-overwrite partitions would look "kept")
        val stagedParts = remaining
          .select(partCols.map(col).toIndexedSeq: _*).distinct().collect()
          .map(_.toSeq).toSet
        overwrite(spark, table, remaining, dynamicPartitions = true)
        scopedParts.filterNot(r => stagedParts.contains(r.toSeq)).foreach { r =>
          val spec = partCols.zip(r.toSeq).map { case (c, v) =>
            s"$c = '${String.valueOf(v).replace("'", "''")}'"
          }.mkString(", ")
          spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION ($spec)")
        }
    }
  }

  /** Hive `ALTER TABLE ... [PARTITION ...] CONCATENATE`
    * (QL/parse/DDLSemanticAnalyzer, merge task — SURVEY.md §2.1 #19):
    * merge small files without changing data. Spark-first form: a
    * partition-pruned read, a repartition sized from the ACTUAL on-disk
    * bytes (ceil(scopedBytes / targetFileBytes) output files; for a
    * partitioned table the shuffle keys on the partition columns so each
    * partition compacts to one file per holding task), then the same
    * staged overwrite as UPDATE/DELETE — table-FS staging, dynamic
    * overwrite confined to the scoped partitions, crash-safe. A no-op
    * when the scope is already compact (file count ≤ target), so cron-ed
    * compaction does not rewrite healthy tables.
    *
    * @return (filesBefore, targetFiles) — equal when nothing was done
    */
  def concatenate(spark: SparkSession, table: String,
                  targetFileBytes: Long = 128L << 20,
                  partitionScope: Option[Column] = None): (Int, Int) = {
    require(targetFileBytes > 0)
    val partCols = partitionColumns(spark, table)
    if (partitionScope.isDefined)
      require(partCols.nonEmpty, "partitionScope given but table is unpartitioned")
    val base = scoped(spark, table, partitionScope)
    val files = base.inputFiles // partition-pruned under a scope
    val fs = tableLocation(spark, table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = files.map(f =>
      fs.getFileStatus(new Path(new java.net.URI(f))).getLen).sum
    val target = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (files.length > target) {
      val compacted =
        if (partCols.isEmpty) base.repartition(target)
        else base.repartition(target, partCols.map(col): _*)
      overwrite(spark, table, compacted, dynamicPartitions = partitionScope.isDefined)
      (files.length, target)
    } else (files.length, files.length)
  }

  private def project(base: DataFrame, cond: Column,
                      assignments: Map[String, Column]): DataFrame =
    base.select(base.columns.map { c =>
      assignments.get(c) match {
        case Some(v) => when(cond, v).otherwise(base(c)).as(c)
        case None => base(c)
      }
    }.toIndexedSeq: _*)

  private def partitionColumns(spark: SparkSession, table: String): Seq[String] =
    spark.catalog.listColumns(table)
      .collect().filter(_.isPartition).map(_.name).toSeq

  private def scoped(spark: SparkSession, table: String,
                     partitionScope: Option[Column]): DataFrame = {
    val df = spark.table(table)
    partitionScope.fold(df)(df.where) // partition predicate → pruned scan
  }

  /** The table's storage location (works for managed and external
    * datasource tables; DESCRIBE FORMATTED is the public API for it).
    * Only the detailed-information section is scanned — a user COLUMN
    * named "Location" would otherwise shadow the real row. */
  private[operators] def tableLocation(spark: SparkSession, table: String): Path =
    new Path(
      spark.sql(s"DESCRIBE FORMATTED $table").collect()
        .dropWhile(!_.getString(0).trim.startsWith("# Detailed Table Information"))
        .find(_.getString(0).trim == "Location")
        .map(_.getString(1).trim)
        .getOrElse(throw new IllegalStateException(s"no Location for $table")))

  private def overwrite(spark: SparkSession, table: String, data: DataFrame,
                        dynamicPartitions: Boolean): Unit = {
    // stage to a scratch directory ON THE TABLE'S FILESYSTEM (a
    // distributed write — never a driver-side collect or driver-local
    // temp dir), because overwriting a table from a plan that reads the
    // same table would truncate the source mid-read
    val tableDir = tableLocation(spark, table)
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(tableDir.getParent,
      s"_graft_staging_${tableDir.getName}_${java.util.UUID.randomUUID().toString.take(8)}")
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      data.write.mode("overwrite").parquet(staging.toString)
      if (dynamicPartitions) {
        // rewrite ONLY the partitions present in the staged data
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      }
      try spark.read.parquet(staging.toString).write.mode("overwrite").insertInto(table)
      catch { case e: Throwable =>
        // overwrite failed mid-commit: the staged copy is now the only
        // complete version of the data — KEEP it (the header's recovery
        // guarantee) and tell the operator where it is
        throw new IllegalStateException(
          s"overwrite of $table failed; complete staged copy kept at $staging", e)
      }
      // success: the staged copy is table-sized — never leak it
      fs.delete(staging, true)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
