package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/filter evaluation over corpus-scale scored data (EXT —
  * model-eval family). A training-data pipeline lives and dies by its
  * quality filters (Gopher gates, CCNet perplexity buckets, linear
  * classifiers — see [[TextAnalysis]]): before a filter is allowed to
  * drop half the corpus, its score column has to be EVALUATED against
  * labels, at the corpus scale where the labels live. These operators
  * compute the standard evaluation artifacts — ROC-AUC, the
  * precision/recall curve, calibration (reliability) bins — exactly,
  * in integer arithmetic, with no corpus-cardinality ordered pass.
  *
  * Scale design shared by all three:
  *  - ONE hash aggregation groups the corpus by (score) or (bin) —
  *    map-side partial agg folds rows before the shuffle, so the
  *    exchange carries at most |distinct scores| rows per partition;
  *  - every ordered/window pass runs at DISTINCT-SCORE cardinality
  *    (the score-frequency table), never at corpus cardinality — the
  *    rank-sum identity in [[rocAuc]] is what buys this;
  *  - every emitted column is a BIGINT (counts and floor-micros
  *    fractions): partial-agg merge order cannot move a hash, and no
  *    precision>18 decimal ever reaches parquet (the INT64/FIXED_LEN
  *    portability line documented at the mix_interleave gate).
  *
  * Integer-score contract: scores must be integral (LongType). Real
  * models emit doubles — quantize with a documented scale first
  * (e.g. `floor(p * 1e6)`); grouping raw doubles would make tie
  * structure engine-dependent and the shuffle key non-portable.
  */
object Eval {

  private val Big = "decimal(38,0)"

  /** Exact floor-micros fraction `floor(num·1e6 / den)` as BIGINT.
    * Operands go through DECIMAL(38,0) and SQL `div` (integral
    * division — floor for the non-negative numerators used here):
    * long `/` in Spark returns DOUBLE, which silently loses exactness
    * past 2^53, and an evaluation metric must not wobble at scale. */
  private def microsDiv(num: Column, den: Column): Column =
    call_function("div", num.cast(Big) * 1000000L, den.cast(Big)).cast("long")

  /** Exact ROC-AUC via the Mann–Whitney rank-sum identity:
    *
    *   AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻)
    *
    * where R⁺ is the sum of the positives' ranks under ascending score
    * with ties taking the AVERAGE rank. A tied group of n_s rows
    * following c_s smaller rows spans ranks c_s+1 … c_s+n_s, so each
    * member's average rank is c_s + (n_s+1)/2 — which means R⁺ needs
    * only the per-score counts (n_s, p_s) and the running count c_s:
    * the whole statistic computes from the score-frequency table. To
    * stay in integers, everything is doubled: 2R⁺ = Σ_s p_s(2c_s+n_s+1)
    * and
    *
    *   auc_num = 2R⁺ − n⁺(n⁺+1),  auc_den = 2 n⁺ n⁻,  AUC = num/den
    *
    * exactly. Output is ONE row: n_pos, n_neg (BIGINT) and auc_micros
    * = floor(num·1e6/den) (BIGINT; floor not round — half-up rounding
    * of engine-side decimals is convention-dependent, floor is not).
    * Empty classes (n⁺=0 or n⁻=0) yield NULL auc_micros rather than a
    * misleading 0 or 1.
    *
    * The window over the score-frequency table is a single-partition
    * sort at |distinct scores| cardinality — for integer heuristic
    * scores that is hundreds of rows at any corpus size; a caller with
    * genuinely corpus-cardinality distinct scores should quantize
    * (the integer-score contract above) or route the running count
    * through the [[Packing]] prefix-sum machinery. Internal products
    * run in DECIMAL(38,0): n⁺n⁻ overflows BIGINT past ~3e9 rows, and
    * silent wraparound is not an acceptable failure mode for an
    * evaluation metric. */
  def rocAuc(df: DataFrame, label: Column, score: Column): DataFrame = {
    val g = df
      .select(when(label, 1L).otherwise(0L).as("_y"), score.cast("long").as("_s"))
      .groupBy(col("_s"))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_p"))
    val w = Window.orderBy(col("_s").asc).rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("_c", coalesce(sum(col("_n")).over(w), lit(0L)))
      .agg(
        sum(col("_p")).as("n_pos"),
        sum(col("_n") - col("_p")).as("n_neg"),
        sum((col("_p").cast(Big) * (col("_c") * 2 + col("_n") + 1).cast(Big))).as("_r2p"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          microsDiv(
            col("_r2p").cast(Big) - col("n_pos").cast(Big) * (col("n_pos") + 1).cast(Big),
            col("n_pos").cast(Big) * col("n_neg").cast(Big) * 2))
          .as("auc_micros"))
  }

  /** Exact precision/recall curve: one row per DISTINCT score s with
    * the confusion counts of the classifier "predict positive iff
    * score ≥ s" — tp, fp, fn (BIGINT) plus floor-micros precision and
    * recall. The descending cumulative sums run over the score-
    * frequency table (same cardinality argument as [[rocAuc]]); the
    * corpus is touched once. The sweep covers every operating point
    * the score can express — the artifact a filter-tuning pass
    * actually reads to pick its threshold. */
  def prCurve(df: DataFrame, label: Column, score: Column): DataFrame = {
    val g = df
      .select(when(label, 1L).otherwise(0L).as("_y"), score.cast("long").as("_s"))
      .groupBy(col("_s"))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_p"))
    val wDesc = Window.orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    g.withColumn("tp", sum(col("_p")).over(wDesc))
      .withColumn("fp", sum(col("_n") - col("_p")).over(wDesc))
      .withColumn("fn", sum(col("_p")).over(wAll) - col("tp"))
      .select(col("_s").as("score"), col("tp"), col("fp"), col("fn"),
        microsDiv(col("tp"), col("tp") + col("fp")).as("prec_micros"),
        when(col("tp") + col("fn") > 0, microsDiv(col("tp"), col("tp") + col("fn")))
          .as("rec_micros"))
  }

  /** Chi-square feature selection: for every term (distinct-per-doc,
    * so presence not frequency), the 2×2 contingency against a boolean
    * doc label and the exact χ² statistic
    *
    *   χ² = n·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * where a/b = labeled/unlabeled docs containing the term and c/d
    * the complements. The ranking a classifier-feature pass reads —
    * which vocabulary actually separates the classes.
    *
    * Scale shape: explode distinct terms → ONE hash agg keyed by term
    * (vocabulary-scale output); the corpus-level (n, n_pos) ride in as
    * a broadcast single row. Emits the raw contingency (a, df=a+b) as
    * BIGINT — exact at ANY corpus size — plus chi2_micros, whose
    * DECIMAL(38,0) numerator n·(ad−bc)²·1e6 caps the exact path at
    * ~1e6 docs per evaluation; past that, the counts stay exact and
    * overflow ABORTS (raise_error), the caller re-derives χ² from the
    * emitted contingency at whatever precision it wants. `minDf`
    * bounds the output to terms with evidence. */
  def chiSquareTerms(df: DataFrame, label: Column, terms: Column,
      minDf: Long = 1L): DataFrame = {
    val base = df.select(when(label, 1L).otherwise(0L).as("_y"),
      array_distinct(terms).as("_ts"))
    val tot = base.agg(count(lit(1)).as("_n"), sum(col("_y")).as("_np"))
    val perTerm = base
      .select(col("_y"), explode(col("_ts")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("term_df"), sum(col("_y")).as("term_pos"))
      .filter(col("term_df") >= minDf)
    val j = perTerm.join(broadcast(tot), expr("true"))
    val (a, b) = (col("term_pos").cast(Big), (col("term_df") - col("term_pos")).cast(Big))
    val (c, d) = (col("_np").cast(Big) - a, (col("_n") - col("_np")).cast(Big) - b)
    val diff = a * d - b * c
    val num = col("_n").cast(Big) * diff * diff
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    val quotient = microsDiv(num, den)
    // overflow at ANY stage (num, its ×1e6 scaling, den) surfaces as a
    // NULL quotient on a non-degenerate denominator — abort, don't emit
    val chi = when(den === 0, lit(null).cast("long"))
      .when(quotient.isNull,
        raise_error(lit("chiSquareTerms: decimal(38,0) overflow — corpus too " +
          "large for the exact chi2 path; derive from the emitted contingency"))
          .cast("long"))
      .otherwise(quotient)
    j.select(col("term"), col("term_df"), col("term_pos"), chi.as("chi2_micros"))
  }

  /** Calibration (reliability-diagram) bins: scores bucketed into
    * fixed-width integer bins, each bin reporting how often the label
    * actually fired — the artifact that says whether a high score
    * MEANS anything. One hash agg at bin cardinality; n, n_pos,
    * sum_score are exact BIGINTs; pos_rate_micros and mean_score_floor
    * derive by integral division, so every cell is engine-portable.
    * Bins clamp to [0, nBins-1]: scores past the nominal range land in
    * the edge bins rather than inventing unbounded new groups. */
  def calibrationBins(df: DataFrame, label: Column, score: Column,
      binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 0, "binWidth and nBins must be positive")
    val s = score.cast("long")
    val bin = least(greatest(call_function("div", s, lit(binWidth)), lit(0L)),
      lit(nBins - 1L))
    df.select(bin.as("bin"), when(label, 1L).otherwise(0L).as("_y"), s.as("_s"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"), sum(col("_s")).as("sum_score"))
      .select(col("bin"), col("n"), col("n_pos"), col("sum_score"),
        microsDiv(col("n_pos"), col("n")).as("pos_rate_micros"),
        call_function("div", col("sum_score"), col("n")).as("mean_score_floor"))
  }

  /** Per-group categorical diversity — Shannon entropy and Gini
    * impurity of the category distribution within each group, the
    * feature-selection / dataset-balance statistics (a source whose
    * language entropy collapsed is a curation bug; a split whose Gini
    * stays high hasn't separated anything).
    *
    * Exactness: Gini is an exact rational — 1e6·(n²−Σc²) div n², pure
    * integers (DECIMAL(38,0) internally, so n² never overflows).
    * Entropy has one transcendental per (group, category): each term
    * −1e6·(c/n)·ln(c/n) is floored to micros BEFORE the per-group
    * integer sum (the PMI/Adamic-Adar quantize-then-sum discipline —
    * summing raw doubles would be partial-agg-order-dependent), with
    * the division/multiplication shape shared with the oracle.
    * Single-category groups emit exactly 0 for both.
    *
    * Scale shape: one (group, category) hash agg, one group-grain
    * rollup, one key join at category-grain — map-side partials
    * everywhere, no windows. Output: (group, n, n_cats,
    * entropy_micro, gini_micro). */
  def categoricalDiversity(df: DataFrame, group: String, category: String)
      : DataFrame = {
    val big = "decimal(38,0)"
    val counts = df.groupBy(col(group), col(category))
      .agg(count(lit(1)).as("_c"))
    val totals = counts.groupBy(col(group))
      .agg(sum(col("_c")).as("_n"), count(lit(1)).as("n_cats"),
        sum(col("_c").cast(big) * col("_c")).as("_ss"))
    val p = col("_c").cast("double") / col("_n").cast("double")
    counts.join(totals, Seq(group))
      .withColumn("_term",
        floor(lit(-1000000.0) * p * log(p)).cast("long"))
      .groupBy(col(group))
      .agg(min(col("_n")).as("n"), min(col("n_cats")).as("n_cats"),
        sum(col("_term")).as("entropy_micro"),
        call_function("div",
          (min(col("_n")).cast(big) * min(col("_n")) - min(col("_ss"))) *
            1000000L,
          min(col("_n")).cast(big) * min(col("_n"))).cast("long")
          .as("gini_micro"))
  }

  /** Two-proportion z-test (pooled), decided EXACTLY — the A/B
    * significance call behind every filter-rollout experiment
    * ("did the new quality gate change the purchase rate?"), computed
    * with zero floating point: the rejection condition z² > z²crit is
    * cross-multiplied into the integer inequality
    *
    *   10⁶ · (x₁n₂ − x₂n₁)² · (n₁+n₂)  >  z²crit_micro · n₁n₂ · x(n−x)
    *
    * (x = x₁+x₂, n = n₁+n₂), evaluated in DECIMAL(38,0) internally —
    * worst case ~10³¹ at n = 10⁵ per cell, far under 38 digits; DuckDB
    * replays it in HUGEINT. No decimal reaches the output: emitted
    * columns are BIGINT counts, trunc-micro rates, and the boolean.
    * A cohort with zero observations cannot be significant (pinned
    * FALSE — the inequality would degenerate 0 > 0 and strictness
    * already handles it, but the guard documents intent). Strict `>`
    * means a statistic landing exactly ON the threshold does not
    * reject — the conservative reading.
    *
    * `zCritMicro`: z²crit × 10⁶ — pass 3_841_459 for α = 0.05
    * (χ²₁ 95% = 3.841459), 6_634_897 for α = 0.01.
    *
    * Scale shape: ONE hash aggregation at group grain (conditional
    * counts fold map-side), then per-row integer arithmetic — no
    * second pass, no window, no driver state. Output: (groupCols...,
    * n_a, x_a, n_b, x_b, p_a_micro, p_b_micro, significant). */
  def twoProportionTest(df: DataFrame, groupCols: Seq[String],
      inCohortA: Column, success: Column,
      zCritMicro: Long = 3841459L): DataFrame = {
    require(zCritMicro > 0, s"zCritMicro must be positive, got $zCritMicro")
    val big = "decimal(38,0)"
    val gc = groupCols.map(col)
    val agg = df
      .select(gc :+ inCohortA.as("_a") :+ success.as("_s"): _*)
      .groupBy(gc: _*)
      .agg(
        sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("_a") && col("_s"), 1L).otherwise(0L)).as("x_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("_a") && col("_s"), 1L).otherwise(0L)).as("x_b"))
    val d = (c: Column) => c.cast(big)
    val diff = d(col("x_a")) * col("n_b") - d(col("x_b")) * col("n_a")
    val n = d(col("n_a")) + col("n_b")
    val x = d(col("x_a")) + col("x_b")
    // LHS bounds the safe range: diff² ≤ (n_a·n_b)² ≤ n⁴/16, so
    // 10⁶·diff²·n ≤ 10⁶·n⁵/16 — under DECIMAL(38,0) while n = n_a+n_b
    // stays ≲ 4×10⁶ per group. Past that, non-ANSI Spark nulls the
    // product silently; surface it as a job abort (the chiSquareTerms
    // discipline) instead of a silently-NULL `significant`. DuckDB's
    // HUGEINT replay errors loudly at the same scale, so the two
    // engines agree on the failure mode too.
    val lhs = lit(1000000L) * diff * diff * n
    val rhs = lit(zCritMicro) * d(col("n_a")) * col("n_b") * x * (n - x)
    val sig = when(col("n_a") === 0 || col("n_b") === 0, lit(false))
      .when(lhs.isNull || rhs.isNull,
        raise_error(lit("twoProportionTest: decimal(38,0) overflow — " +
          "group exceeds the ~4e6-observation exact-path ceiling; " +
          "pre-aggregate or subsample the cohort"))
          .cast("boolean"))
      .otherwise(lhs > rhs)
    agg.select(
      gc ++ Seq(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        expr("(x_a * 1000000) div greatest(n_a, 1)").as("p_a_micro"),
        expr("(x_b * 1000000) div greatest(n_b, 1)").as("p_b_micro"),
        sig.as("significant")): _*)
  }
}
