package graft.io

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight pipeline metrics via `Dataset.observe` — the third leg of
  * the S9 notification surface ([[ErrorChannel]] observes batch
  * failures, [[StreamMetrics]] observes streaming progress; this
  * observes DATA counters inside a successful batch pass).
  *
  * The reference logs row counts around its load stage; the X12 audit
  * op answers the same questions with a dedicated aggregation query. At
  * 100 TB that second scan is a full extra read of the corpus —
  * `observe` instead attaches accumulator-backed aggregates to the
  * existing plan: one expression eval per row during whatever action
  * already runs (typically the sink write), zero extra scans, result on
  * the driver when the action completes. Constraints inherited from
  * Spark: aggregates must flow through accumulators (count/sum/min/max/
  * count_if — no distinct, no percentiles), `Observation.get` blocks
  * until the first action finishes, and an Observation instance is
  * observable once per plan.
  */
object InlineMetrics {

  /** Standard ingest audit riding the caller's next action: total rows,
    * per-column null counts (the coercion-failure signal — P6-P11 map
    * malformed input to NULL, so nulls-after-coerce IS the reject
    * counter), and min/max of one range column (e.g. event time, for
    * freshness alerting). Returns the instrumented frame — compose and
    * run an action on THAT — plus the Observation to read afterwards. */
  def auditObservation(df: DataFrame, nullCols: Seq[String], rangeCol: String)
      : (DataFrame, Observation) = {
    val obs = Observation()
    val aggs = count(lit(1)).as("n_rows") +:
      (nullCols.map(c => count_if(col(c).isNull).as(s"${c}_nulls")) :+
        min(col(rangeCol)).as(s"${rangeCol}_min") :+
        max(col(rangeCol)).as(s"${rangeCol}_max"))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
