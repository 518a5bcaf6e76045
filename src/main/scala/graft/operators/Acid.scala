package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive ACID UPDATE/DELETE (QL/parse/UpdateDeleteSemanticAnalyzer.java,
  * base+delta files — SURVEY.md §1.1) mapped to the vanilla-Spark
  * equivalent: read → rewrite → atomic overwrite. No delta files or
  * compactor are needed because the rewrite IS the compaction.
  *
  * Scale behavior: an unscoped UPDATE/DELETE rewrites the whole table —
  * unavoidable without a delta format. Passing `partitionScope` (a
  * predicate over the table's partition columns) confines BOTH the read
  * and the rewrite to matching partitions under dynamic partition
  * overwrite, so at 100 TB the cost is proportional to touched
  * partitions, not table size. Rows outside the scope are untouched on
  * disk, not rewritten.
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
    val base = scoped(spark, table, partitionScope)
    val updated = base.select(base.columns.map { c =>
      assignments.get(c) match {
        case Some(v) => when(cond, v).otherwise(base(c)).as(c)
        case None => base(c)
      }
    }.toIndexedSeq: _*)
    // UPDATE preserves row counts, so every scoped partition reappears
    // in the staged output and dynamic overwrite covers all of them
    overwrite(spark, table, updated, partitionScope.isDefined)
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
        val partCols = spark.catalog.listColumns(table)
          .collect().filter(_.isPartition).map(_.name).toSeq
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

  private def scoped(spark: SparkSession, table: String,
                     partitionScope: Option[Column]): DataFrame = {
    val df = spark.table(table)
    partitionScope.fold(df)(df.where) // partition predicate → pruned scan
  }

  private def overwrite(spark: SparkSession, table: String, data: DataFrame,
                        dynamicPartitions: Boolean): Unit = {
    // stage to a scratch location first (a distributed write — never a
    // driver-side collect), because overwriting a table from a plan that
    // reads the same table would truncate the source mid-read
    val tmp = java.nio.file.Files.createTempDirectory("graft-acid-stage")
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      data.write.mode("overwrite").parquet(tmp.toString)
      if (dynamicPartitions) {
        // rewrite ONLY the partitions present in the staged data
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      }
      spark.read.parquet(tmp.toString).write.mode("overwrite").insertInto(table)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // the staged copy is table-sized — never leak it
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach((p: Path) => Files.deleteIfExists(p))
    }
  }
}
