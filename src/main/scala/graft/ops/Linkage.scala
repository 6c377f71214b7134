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

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo
    * 1995) — the complement to [[blockedPairs]]: rank all records by a
    * discriminating sort key and pair every record with its ≤ `w`
    * nearest neighbors in that order. Where blocking loses matches
    * that disagree on the block key, sorted-neighborhood loses matches
    * that sort far apart — production linkage runs BOTH and unions the
    * candidate sets (multi-pass SNM).
    *
    * Scale shape: the global rank is the weight-1 two-phase prefix sum
    * (one range exchange — the row-number window that a naive SNM
    * plans is a single reducer at scale); neighbor pairing is a self-
    * join on `band = (rank−1) div w` with the right side duplicated
    * into its predecessor band, so each candidate pair materializes
    * EXACTLY once (proved in spec) and the fan-out is ≤ 2 rows per
    * record, output ≤ n·w pairs by construction.
    *
    * `order` must be total (tie-break with the id). Output:
    * (id_a, id_b, rank_a, rank_b) with rank_a < rank_b ≤ rank_a + w;
    * join attributes back by id for scoring. */
  def sortedNeighborhood(df: DataFrame, order: Seq[Column], id: String,
      w: Int): DataFrame = {
    require(w >= 1 && w <= 1000, s"window must be in [1,1000], got $w")
    val ranked = Packing.assignShardsOrdered(
        df.withColumn("_one", lit(1L)), order, "_one", budget = Long.MaxValue)
      .select(col(id), col("cum_w").as("_rank"),
        expr(s"(cum_w - 1L) div ${w}L").as("_band"))
    val left = ranked.select(col(id).as("id_a"), col("_rank").as("rank_a"),
      col("_band"))
    val right0 = ranked.select(col(id).as("id_b"), col("_rank").as("rank_b"),
      col("_band"))
    val right = right0.unionByName(
      right0.withColumn("_band", col("_band") - 1L))
    left.join(right, Seq("_band"))
      .filter(col("rank_b") > col("rank_a") &&
        col("rank_b") - col("rank_a") <= w)
      .select(col("id_a"), col("id_b"), col("rank_a"), col("rank_b"))
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
