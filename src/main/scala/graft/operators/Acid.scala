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

  /** UPDATE table SET assignments WHERE cond [scoped to partitions]. */
  def updateTable(spark: SparkSession, table: String,
                  cond: Column, assignments: Map[String, Column],
                  partitionScope: Option[Column] = None): Unit = {
    val base = scoped(spark, table, partitionScope)
    val updated = assignments.foldLeft(base) { case (d, (col0, value)) =>
      d.withColumn(col0, when(cond, value).otherwise(d(col0)))
    }
    overwrite(spark, table, updated, partitionScope.isDefined)
  }

  /** DELETE FROM table WHERE cond [scoped to partitions]. */
  def deleteFrom(spark: SparkSession, table: String, cond: Column,
                 partitionScope: Option[Column] = None): Unit =
    overwrite(spark, table,
      scoped(spark, table, partitionScope).where(!coalesce(cond, lit(false))),
      partitionScope.isDefined)

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
    val tmp = java.nio.file.Files.createTempDirectory("graft-acid-stage").toString
    data.write.mode("overwrite").parquet(tmp)
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      if (dynamicPartitions) {
        // rewrite ONLY the partitions present in the staged data
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      }
      spark.read.parquet(tmp).write.mode("overwrite").insertInto(table)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
