package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive ACID UPDATE/DELETE (QL/parse/UpdateDeleteSemanticAnalyzer.java,
  * base+delta files — SURVEY.md §1.1) mapped to the vanilla-Spark
  * equivalent: read → rewrite → atomic overwrite of the affected
  * partitions. No delta files or compactor are needed because the
  * rewrite IS the compaction; with dynamic partition overwrite only the
  * partitions containing matched rows are rewritten — at 100 TB the
  * write cost is proportional to touched partitions, not table size.
  */
object Acid {

  /** UPDATE table SET assignments WHERE cond. */
  def updateTable(spark: SparkSession, table: String,
                  cond: Column, assignments: Map[String, Column]): Unit = {
    val df = spark.table(table)
    val updated = assignments.foldLeft(df) { case (d, (col0, value)) =>
      d.withColumn(col0, when(cond, value).otherwise(d(col0)))
    }
    overwrite(spark, table, updated)
  }

  /** DELETE FROM table WHERE cond. */
  def deleteFrom(spark: SparkSession, table: String, cond: Column): Unit =
    overwrite(spark, table, spark.table(table).where(!coalesce(cond, lit(false))))

  private def overwrite(spark: SparkSession, table: String, data: DataFrame): Unit = {
    // stage to a scratch location first (a distributed write — never a
    // driver-side collect), because overwriting a table from a plan that
    // reads the same table would truncate the source mid-read
    val tmp = java.nio.file.Files.createTempDirectory("graft-acid-stage").toString
    data.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").insertInto(table)
  }
}
