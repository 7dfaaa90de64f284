package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces `Dataset.observe` metrics (e.g. LSH skew-guard dropped
  * bucket counts) to stderr after each action — the "counters visible
  * in logs" requirement, with zero extra jobs.
  */
object Metrics {
  final class LogListener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        System.err.println(s"[graft-metrics] $name: $row")
      }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Idempotent-enough for our single-session mains/tests. */
  def register(spark: SparkSession): Unit =
    spark.listenerManager.register(new LogListener)
}
