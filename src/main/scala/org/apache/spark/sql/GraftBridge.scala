package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native expressions.
  * Spark 4 made these converters `private[sql]`; third-party
  * extensions conventionally expose them through a bridge in this
  * package (the converters are stable public bytecode).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** the analyzer-facing wrong-arity error (AnalysisException with the
    * standard WRONG_NUM_ARGS class), so SQL users of graft's functions
    * get the same error shape as builtins instead of a raw
    * IllegalArgumentException escaping the FunctionBuilder */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Nothing =
    throw org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected.toString), actual)

  /** DataFrame over a custom LogicalPlan (graft's whole-operator
    * nodes, e.g. TopKPerKeyPlan) — `Dataset.ofRows` moved to the
    * `classic` implementation package in Spark 4. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** resolved output attributes of a DataFrame's analyzed plan, for
    * constructing custom plan nodes against existing frames */
  def analyzed(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** block until the async listener bus has delivered every queued
    * event (`listenerBus` is private[spark]) — graft.Bench snapshots
    * task-metric counters per query and needs exact attribution, not
    * whatever happens to have drained */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** The files each FileSourceScanExec in a plan will ACTUALLY read
    * after static partition pruning (`selectedPartitions` is
    * private[sql]) — `df.inputFiles` lists the whole FileIndex and so
    * cannot prove a pruning claim; specs that pin PartitionFilters
    * behavior (s15's cell prune, p27c's band-group prune) need the
    * post-prune listing. */
  def prunedInputFiles(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.toPartitionArray
          .map(_.urlEncodedPath).toSeq
    }.flatten
}
