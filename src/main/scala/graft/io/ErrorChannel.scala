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
