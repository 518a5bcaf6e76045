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
}
