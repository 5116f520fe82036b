package graft.metrics

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-cost pipeline observability via `Dataset.observe` +
  * `QueryExecutionListener` (north rule "metrics"): named aggregates
  * (row counts, distinct convs, stage mix) are computed INSIDE the
  * job — no extra pass — and surfaced here after each action.
  * Complements the resume manifest's per-stage rows/partitions
  * (graft.resume.StageManifest).
  */
final class PipelineMetrics(spark: SparkSession) {

  private val results = TrieMap.empty[String, Map[String, Any]]

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      qe.observedMetrics.foreach { case (name, row) =>
        results.put(name,
          row.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> row.get(i) }.toMap)
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }
  spark.listenerManager.register(listener)

  /** Latest observed metric rows keyed by observation name. */
  def snapshot: Map[String, Map[String, Any]] = results.toMap

  def unregister(): Unit = spark.listenerManager.unregister(listener)
}
