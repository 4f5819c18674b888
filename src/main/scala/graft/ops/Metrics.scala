package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** A4 — per-query elapsed-time metrics (SURVEY §2.5 A4): the reference
  * wall-clocks each run in the driver (fda_watcher.py:438,504); the engine
  * form is a `QueryExecutionListener` so every action is measured at the
  * source, with the executed plan available for attribution. */
object Metrics {

  case class QueryMetric(action: String, durationNs: Long, failed: Boolean)

  /** A recording listener; attach with `spark.listenerManager.register`,
    * read `metrics`, detach with `unregister`. */
  final class Recorder extends QueryExecutionListener {
    val metrics = new ConcurrentLinkedQueue[QueryMetric]()
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      metrics.add(QueryMetric(funcName, durationNs, failed = false))
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      metrics.add(QueryMetric(funcName, -1L, failed = true))
  }

  /** Run `body` with a recorder attached; returns (result, metrics). */
  def recorded[T](spark: SparkSession)(body: => T): (T, Seq[QueryMetric]) = {
    val rec = new Recorder
    spark.listenerManager.register(rec)
    try {
      val out = body
      // listener events arrive asynchronously, one per action — a body
      // with several actions delivers them over time, so polling until
      // the FIRST event would truncate the list. Poll until the count
      // has been stable for a quiet period (or the deadline passes).
      val deadline = System.nanoTime() + 10e9.toLong
      val quietNs = 200e6.toLong
      var last = -1
      var lastChange = System.nanoTime()
      while (System.nanoTime() < deadline &&
          (rec.metrics.isEmpty || System.nanoTime() - lastChange < quietNs)) {
        Thread.sleep(25)
        val n = rec.metrics.size
        if (n != last) { last = n; lastChange = System.nanoTime() }
      }
      (out, rec.metrics.toArray(Array.empty[QueryMetric]).toSeq)
    } finally spark.listenerManager.unregister(rec)
  }
}
