package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Column↔Expression plumbing (Spark 4
  * moved the classic converters behind package privacy). This is the only
  * file that lives inside Spark's namespace; everything graft-specific
  * stays in `graft.*`. */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a (possibly custom) logical plan — the `Dataset.ofRows`
    * constructor Spark 4 hides behind classic-package privacy. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The executed plan's InternalRow RDD — lets an operator consume a
    * DataFrame's rows WITHOUT the external-Row conversion `df.rdd` pays
    * (boxing + Java-serializable GenericRow per row). Rows are reused
    * UnsafeRow buffers: callers MUST `.copy()` before buffering. */
  def internalRdd(df: DataFrame): org.apache.spark.rdd.RDD[
      org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** Drain the context's listener bus (private[spark]) — lets a spec
    * assert "this call launched no job" deterministically instead of
    * sleeping for event delivery. */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** DataFrame over an InternalRow RDD — the `internalCreateDataFrame`
    * constructor (private[sql]); the inverse of [[internalRdd]]. */
  def internalDF(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
