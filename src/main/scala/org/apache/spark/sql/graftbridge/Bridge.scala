package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Spark 4 made these converters
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so this
  * one-file shim lives inside the sql package namespace to re-export them
  * for graft's custom expressions. No Spark internals are modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** ExpectsInputTypes facade: `inputTypes` returns
    * `Seq[AbstractDataType]`, and AbstractDataType is `private[sql]` in
    * Spark 4 — implementors outside the sql package can't even write the
    * override's signature. This subpackage can, so graft expressions mix
    * this in and implement `graftInputTypes` with concrete (public)
    * DataTypes instead. */
  trait GraftExpectsInputTypes
      extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    def graftInputTypes: Seq[org.apache.spark.sql.types.DataType]
    override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
      graftInputTypes
  }

  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wraps an InternalRow RDD as a DataFrame without a row-format
    * round-trip (`internalCreateDataFrame` is `private[sql]` in
    * Spark 4). Used by the zero-shuffle bucket rewrite, where an
    * RDD-level union is the only way to keep per-branch partition
    * identity — the optimizer's CollapseRepartition pulls a
    * DataFrame-level `coalesce(1)` THROUGH a union, collapsing all
    * branches into one partition. */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
