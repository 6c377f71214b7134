package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partial-aggregate maintenance — the "pre-aggregate, then combine"
  * pattern that makes 100 TB rollups incremental: keep per-fine-bucket
  * partials (count/sum/min/max, all reaggregable), then MERGE partials
  * into coarser buckets instead of rescanning raw facts. Merging is
  * sum-of-counts / sum-of-sums / min-of-mins / max-of-maxs; derived
  * measures (avg) are computed only at the final grain from merged
  * sum÷count — never averaged across partials (avg-of-avgs is wrong
  * under unequal bucket sizes, SURVEY §4.3-style trap).
  *
  * At scale the partial table is the thing that persists (it is ~|keys|
  * rows, not |facts|); daily jobs append partials and downstream grains
  * fold them. The reference recomputes everything per run
  * (`/root/reference/src/lms_to_s3_lambda.py:192-225` re-extracts the
  * full user list each day); this is the incremental re-expression.
  */
object Reagg {

  /** Fine-grain partials for a measure: count/sum/min/max per
    * (keys..., bucket). Sum in DECIMAL so later merges are exact and
    * partition-order-independent. */
  def partials(df: DataFrame, keys: Seq[String], bucket: Column,
      measure: Column): DataFrame = {
    df.groupBy((bucket.as("bucket") +: keys.map(col)): _*)
      .agg(
        count(measure).as("p_count"),
        sum(measure.cast("decimal(18,2)")).as("p_sum"),
        min(measure).as("p_min"),
        max(measure).as("p_max"))
  }

  /** Fold partials into a coarser bucket (e.g. day → month). The input
    * never touches raw facts; only reaggregable components are merged,
    * and avg is derived from the merged components at the end. */
  def mergeToCoarser(partials: DataFrame, keys: Seq[String],
      coarser: Column): DataFrame = {
    partials
      .groupBy((coarser.as("bucket") +: keys.map(col)): _*)
      .agg(
        sum(col("p_count")).as("n"),
        sum(col("p_sum")).as("total"),
        min(col("p_min")).as("mn"),
        max(col("p_max")).as("mx"))
      .withColumn("avg_v",
        (col("total") / col("n")).cast("decimal(18,6)"))
  }
}
