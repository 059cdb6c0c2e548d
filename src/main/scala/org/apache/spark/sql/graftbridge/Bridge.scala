package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression and DataFrame ⇄ LogicalPlan bridge for graft's
  * native expressions and plan nodes. Lives under org.apache.spark.sql
  * because the classic converters are private[sql] in Spark 4 — the
  * canonical pattern for third-party Catalyst extension libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-wrap a batch DataFrame's physical rows as a STREAMING frame —
    * what a v1 streaming `Source.getBatch` must return
    * (`isStreaming = true`; the constructor is private[sql], hence
    * the bridge). The inner plan executes lazily, once, when the
    * micro-batch runs. */
  def internalStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The physical rows of a DataFrame WITHOUT the Row deserialization
    * `df.rdd` pays (every field boxed into a GenericRow — measured
    * ~30 µs/row in the RankOps passes). Rows are typically UnsafeRows
    * whose backing buffers the producing operator may reuse: callers
    * must `copy()` any row (or any non-primitive field) they hold
    * past the current iterator step. */
  def internalRows(df: DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** Wrap an InternalRow RDD back into a batch DataFrame (the inverse
    * of [[internalRows]]; `internalCreateDataFrame` is private[sql]). */
  def fromInternalRows(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** The inverse seam, for a v1 streaming `Sink.addBatch`: the
    * incoming micro-batch Dataset is still streaming-marked (batch
    * verbs like `write`/`count` refuse it), so re-wrap its physical
    * rows as a BATCH frame — the same move Spark's own
    * ForeachBatchSink makes. Lazy: the incremental plan executes when
    * the batch frame is consumed (deterministic within the trigger,
    * the contract foreachBatch consumers already rely on). */
  def internalBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
