package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 wraps Column around ColumnNode; the Expression↔Column bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is private[sql], so
  * this accessor lives under the sql package namespace — the idiomatic
  * extension-library workaround for exposing custom Catalyst
  * expressions as Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert the Column's node tree to a Catalyst expression
    * (ExpressionUtils.expression wraps it in a lazy ColumnNodeExpression
    * placeholder, which only classic plan construction unwraps — inside
    * a custom logical node the analyzer would leave it Unevaluable).
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** DataFrame from a LogicalPlan (classic Dataset.ofRows is
    * private[sql]) — needed to inject custom logical operators.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The checkpointed RDD behind a `localCheckpoint`'d DataFrame
    * (its analyzed plan is one LogicalRDD) — `Dataset.unpersist`
    * cannot release checkpoint blocks (they are not CacheManager
    * entries), so explicit lifecycle management needs the RDD itself.
    * None if the frame is not a bare checkpoint.
    */
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Drain the async listener bus (private[spark]) — job-count spec
    * hooks must observe every posted event before sampling a counter.
    */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** The session's Hadoop configuration in executor-shippable form
    * (`SerializableConfiguration` is private[spark]). Settings applied
    * PROGRAMMATICALLY to `sparkContext.hadoopConfiguration` — a common
    * way object-store credentials arrive — don't appear as
    * `spark.hadoop.*` session conf entries, so distributed FS work must
    * ship the real Configuration object, not a rebuilt one.
    */
  def shippableHadoopConf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())

  /** A STREAMING DataFrame over already-computed InternalRows — what a
    * V1 `Source.getBatch` must return (the engine rejects plain batch
    * frames). `internalCreateDataFrame` is private[sql]; every file
    * source builds its micro-batches through it.
    */
  def streamingDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
