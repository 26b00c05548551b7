package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import scala.jdk.CollectionConverters._

/** Per-query execution accounting — the Spark-native form of the
  * reference's run reporting (LogReporter.scala aggregates per-run
  * element/row counts; ClusterMetricsListener.scala samples load): a
  * [[QueryExecutionListener]] that captures, for every completed action,
  * the action name, wall duration, rows read at the leaves and rows
  * produced at the root, straight from the executed plan's SQL metrics.
  *
  * Passive observability: listeners run on the listener bus AFTER the
  * action completes, add nothing to the query path, and hold a bounded
  * in-memory report queue (oldest dropped past `capacity`) — safe to leave
  * registered on a long-lived session feeding a metrics scraper.
  */
object Metrics {

  final case class QueryReport(action: String, durationMs: Long,
                               rowsRead: Long, outputRows: Long,
                               failed: Boolean)

  final class Reporter(capacity: Int = 1000) extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[QueryReport]()
    // ConcurrentLinkedQueue.size() is O(n); track it alongside so eviction
    // on the listener bus stays O(1) per completed query.
    private val bufSize = new java.util.concurrent.atomic.AtomicInteger(0)

    private def record(r: QueryReport): Unit = {
      buf.add(r)
      bufSize.incrementAndGet()
      while (bufSize.get > capacity) {
        if (buf.poll() != null) bufSize.decrementAndGet()
        else return // racing evictor emptied it; counter resyncs on next add
      }
    }

    /** True leaves of an adaptively-executed plan: AQE's plan wrapper and
      * its materialized query stages both hide their subtrees from
      * collect/collectLeaves, so descend through them explicitly.
      */
    private def deepLeaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deepLeaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deepLeaves(q.plan)
      case leaf if leaf.children.isEmpty => Seq(leaf)
      case other => other.children.flatMap(deepLeaves)
    }

    private def rowsAt(qe: QueryExecution): (Long, Long) = {
      val read = deepLeaves(qe.executedPlan)
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      // the ROOT needs the same AQE unwrap the leaves get: under adaptive
      // execution (default on) executedPlan is AdaptiveSparkPlanExec,
      // which carries no numOutputRows of its own — without the unwrap
      // every report's output count read -1
      val root = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      val out = root.metrics.get("numOutputRows")
        .map(_.value).getOrElse(-1L)
      (read, out)
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      val (read, out) = rowsAt(qe)
      record(QueryReport(funcName, durationNs / 1000000L, read, out,
        failed = false))
    }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      record(QueryReport(funcName, -1L, -1L, -1L, failed = true))

    /** Snapshot of captured reports, oldest first. */
    def reports: Seq[QueryReport] = buf.iterator().asScala.toSeq

    def clear(): Unit = {
      buf.clear()
      // reset the counter WITH the queue: a stale count at capacity would
      // make every later record() evict the element it just added, and
      // reports would stay empty forever
      bufSize.set(0)
    }
  }

  /** Register a reporter on the session and return it. */
  def attach(spark: SparkSession, capacity: Int = 1000): Reporter = {
    val r = new Reporter(capacity)
    spark.listenerManager.register(r)
    r
  }
}
