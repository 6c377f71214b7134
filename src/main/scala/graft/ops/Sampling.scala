package graft.ops

import org.apache.spark.sql.DataFrame

/** Stratified sampling — a first-class training-data-pipeline op (down-
  * weight over-represented languages/sources before training). Absent
  * from the reference (its extract takes everything one department at a
  * time, `src/lms_to_s3_lambda.py:196-200`); at 100 TB sampling is how a
  * corpus becomes a dataset.
  */
object Sampling {

  /** Per-stratum Bernoulli sample: each row kept independently with its
    * stratum's fraction — one scan, no shuffle, no per-key state; the
    * seed makes it reproducible across retries within one Spark build
    * (cross-engine the draw is RNG-defined, hence rows-only gating).
    */
  def stratified(df: DataFrame, strata: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strata, fractions, seed)
}
