package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession, classic}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's private[sql] Column ↔ Expression converters (the
  * Spark 4 Column API wraps ColumnNodes, not Expressions). Lives in an
  * org.apache.spark.sql subpackage purely for access; no Spark internals
  * are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame over an RDD of InternalRow — the Tungsten-native sibling of
    * createDataFrame(RDD[Row]) that skips external-Row re-encoding. */
  def ofInternalRows(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
