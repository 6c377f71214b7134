package graft.io

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Failure notification channel — the Spark-native analog of the
  * reference's SNS error topic (S9, `src/lms_to_s3_lambda.py:177-189`,
  * `src/s3_to_rds_lambda.py:88-100`): both lambdas wrap their handler in
  * try/except and publish the exception before re-raising.
  *
  * Here a `QueryExecutionListener` observes every action on the session;
  * failures are recorded and forwarded to a pluggable sink (production:
  * an SNS/webhook publisher; harness: an in-memory queue the tests
  * inspect). Driver-side only — executor failures surface through the
  * failed action, exactly like the reference's process-level catch.
  */
class ErrorChannel(notify: ErrorChannel.Failure => Unit) extends QueryExecutionListener {

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = ()

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    notify(ErrorChannel.Failure(funcName, exception.getClass.getName,
      String.valueOf(exception.getMessage)))
}

object ErrorChannel {
  final case class Failure(action: String, errorClass: String, message: String)

  /** Attach a recording channel to the session; returns the queue of
    * observed failures (the "topic"). */
  def attach(spark: SparkSession): ConcurrentLinkedQueue[Failure] = {
    val q = new ConcurrentLinkedQueue[Failure]()
    spark.listenerManager.register(new ErrorChannel(f => { q.add(f); () }))
    q
  }
}

/** The STREAMING half of the S9 notification surface: a
  * `StreamingQueryListener` forwarding per-micro-batch progress (rows
  * read, batch duration) and terminations — including failures, the
  * streaming analog of the reference's SNS publish — to a pluggable
  * sink. Where [[ErrorChannel]] observes batch ACTIONS, this observes
  * long-running QUERIES: at scale it is the hook that feeds lag/
  * throughput dashboards and dead-letter alerting without touching the
  * query itself. */
class StreamMetrics(notify: StreamMetrics.Event => Unit)
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    notify(StreamMetrics.Event("started", e.name, 0L, 0L, None))

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    notify(StreamMetrics.Event("progress", e.progress.name,
      e.progress.numInputRows, e.progress.batchDuration, None))

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    notify(StreamMetrics.Event("terminated", null, 0L, 0L, e.exception))
}

object StreamMetrics {
  /** One observed lifecycle event. `rows`/`batchMs` are zero except for
    * progress events; `error` is set only for failed terminations. */
  final case class Event(kind: String, queryName: String,
      rows: Long, batchMs: Long, error: Option[String])

  /** Attach a recording listener; returns the event queue. Callers that
    * attach per-drain should `remove` after ([[detach]]) — listeners
    * are session-global. */
  def attach(spark: SparkSession): (StreamMetrics, ConcurrentLinkedQueue[Event]) = {
    val q = new ConcurrentLinkedQueue[Event]()
    val l = new StreamMetrics(e => { q.add(e); () })
    spark.streams.addListener(l)
    (l, q)
  }

  def detach(spark: SparkSession, l: StreamMetrics): Unit =
    spark.streams.removeListener(l)
}
