package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969) — the entity-
  * resolution workhorse: generate candidate pairs by BLOCKING (never
  * all-pairs), score each pair by summed per-field agreement weights
  * (the caller's weights are the ln(m/u) log-odds of the F-S model,
  * quantized to integer micros so scores sum exactly), and classify by
  * two thresholds into link / possible / non-link.
  *
  * == Scale shape ==
  * The cross product never exists: candidates come from an equi-join on
  * the blocking key, so the fan-out is Σ|block_a|·|block_b| — quadratic
  * only within a block, and [[blockedPairs]] enforces a hard per-block
  * cap on BOTH sides (a degenerate key — empty zip code, 'UNKNOWN'
  * city — would otherwise quietly rebuild the cross join; capped blocks
  * are DROPPED, the documented recall cost of blocking, and a real
  * pipeline re-blocks them on a secondary key). Scoring is per-row
  * expression work; classification is a when-chain. Nothing shuffles
  * except the block-key join.
  *
  * == Exactness ==
  * Weights are caller-supplied integer micros; the score is their exact
  * BIGINT sum; thresholds compare integers. Field comparators built
  * from `levenshtein` / equality / banded-difference are deterministic
  * in any engine, so per-pair scores replay cell-for-cell.
  */
object Linkage {

  /** Candidate pairs by blocking: inner-join `a` and `b` on
    * `blockCols`, after dropping any block whose side exceeds
    * `maxBlock` rows (skew guard — see class doc; both frames must
    * otherwise have disjoint column names). */
  def blockedPairs(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      maxBlock: Int = 10000): DataFrame = {
    require(maxBlock >= 1, s"maxBlock must be >= 1, got $maxBlock")
    def capped(df: DataFrame): DataFrame = {
      val sizes = df.groupBy(blockCols.map(col): _*)
        .agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") <= maxBlock)
        .drop("_bn")
      df.join(sizes, blockCols, "left_semi")
    }
    capped(a).join(capped(b), blockCols)
  }

  /** Sum per-field agreement weights (each an integer-micro Column —
    * e.g. `when(lev <= 2, 2500000L).otherwise(-1000000L)`) into
    * `score_micro` and classify: `decision` = link (≥ `linkAt`) /
    * possible (≥ `possibleAt`) / nonlink. */
  def scoreAndClassify(pairs: DataFrame, weights: Seq[Column],
      linkAt: Long, possibleAt: Long): DataFrame = {
    require(weights.nonEmpty, "need at least one field comparator")
    require(possibleAt <= linkAt,
      s"possibleAt ($possibleAt) must be <= linkAt ($linkAt)")
    pairs
      .withColumn("score_micro",
        weights.map(_.cast("long")).reduce(_ + _))
      .withColumn("decision",
        when(col("score_micro") >= linkAt, lit("link"))
          .when(col("score_micro") >= possibleAt, lit("possible"))
          .otherwise(lit("nonlink")))
  }
}
