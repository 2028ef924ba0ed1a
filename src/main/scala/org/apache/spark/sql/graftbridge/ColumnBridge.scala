package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the Column/Expression
  * conversion `private[sql]` (columns are backed by ColumnNodes); custom
  * Catalyst expressions still need it, so this shim lives under
  * org.apache.spark.sql — the standard extension-library pattern for
  * reaching the classic converter.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager conversion: `expression` wraps the column's node lazily
    * (ColumnNodeExpression), which stays VOID-typed through analysis
    * rules that need a dataType (e.g. struct-field extraction on a SQL
    * function's result). This converts the node to a concrete Catalyst
    * expression tree immediately.
    */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}

/** DataFrame <-> LogicalPlan bridge for custom logical operators
  * (`Dataset.ofRows` is private[sql]; a library injecting its own
  * LogicalPlan nodes needs it — the same extension-library pattern as
  * [[ColumnBridge]]).
  */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Batch→streaming DataFrame bridge for DSv1 streaming sources: the
  * micro-batch a `Source.getBatch` returns must carry
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor that sets the flag — `internalCreateDataFrame` — is
  * `private[sql]`. Same extension-library pattern as [[ColumnBridge]].
  */
object StreamingBridge {
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The reverse direction, for custom v1 SINKS: re-root the
    * micro-batch a `Sink.addBatch` receives (whose plan is streaming-
    * bound) as a standalone BATCH frame over the same RDD — what
    * ForeachBatchSink does before handing user code the batch.
    */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
