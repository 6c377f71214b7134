package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the engine-side generalization of the
  * reference's implicit contracts: a unique upsert key
  * (`src/s3_to_rds_lambda.py:74-79`), NOT-NULL-ish coercion targets
  * (`:48-61`), and the FK-like department filter
  * (`src/lms_to_s3_lambda.py:196-200`). At 100 TB you audit these as
  * queries, not as per-row exceptions.
  */
object DataQuality {

  /** Rule audit in long form: one (check_name, n) row per rule.
    *
    * All non-FK rules fold into a SINGLE aggregate pass over the table
    * (count/countDistinct/conditional counts in one hash agg); the tiny
    * one-row wide result is exploded to long form driver-free. The FK
    * orphan check is a separate anti-join (broadcast when the dim is
    * small) because it genuinely needs the second table.
    */
  def audit(df: DataFrame, key: String, notNull: Seq[String],
      nonNegative: Seq[String] = Seq.empty,
      fk: Option[(String, DataFrame, String)] = None): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("row_count"),
        (count(lit(1)) - countDistinct(col(key))).as(s"dup_$key")) ++
      notNull.map(c => count(when(col(c).isNull, 1)).as(s"null_$c")) ++
      nonNegative.map(c => count(when(col(c) < 0, 1)).as(s"neg_$c"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val long = wide.select(explode(map(
      wide.columns.flatMap(c => Seq(lit(c), col(c))): _*)).as(Seq("check_name", "n")))
    fk match {
      case Some((fkCol, dim, dimKey)) =>
        // no broadcast hint: the FK target can be entity-scale (users,
        // documents) — let AQE pick broadcast only when it's actually
        // small; the anti-join otherwise shuffles both sides on the key
        val orphans = df.join(dim.select(col(dimKey)),
            col(fkCol) === col(dimKey), "left_anti")
          .agg(count(lit(1)).as("n"))
          .select(lit(s"orphan_$fkCol").as("check_name"), col("n"))
        long.unionByName(orphans)
      case None => long
    }
  }

  /** Distribution drift of a categorical column between a baseline and
    * a current snapshot — the monitoring op that catches a silently
    * shifted source mix before it poisons a training run. Per category:
    * both counts, both shares, and the PSI contribution
    * (p−q)·ln((p+ε)/(q+ε)); sum the column for the headline PSI
    * (common gates: <0.1 stable, >0.25 drifted). Two hash aggs (state =
    * |categories|) + a full outer join on category — the snapshots are
    * each scanned once and never co-shuffled row-wise. Shares divide
    * exact counts, so the only float op is the final ln. */
  def categoricalDrift(base: DataFrame, cur: DataFrame, category: String,
      eps: Double = 1e-6): DataFrame = {
    val bCounts = base.groupBy(col(category)).agg(count(lit(1)).as("n_base"))
    val cCounts = cur.groupBy(col(category)).agg(count(lit(1)).as("n_cur"))
      .withColumnRenamed(category, "_cur_cat")
    // one (tb, tc) row broadcast onto the joined category table
    val totals = broadcast(
      bCounts.agg(sum(col("n_base")).cast("double").as("_tb"))
        .crossJoin(cCounts.agg(sum(col("n_cur")).cast("double").as("_tc"))))
    val p = coalesce(col("n_base"), lit(0L)) / col("_tb")
    val q = coalesce(col("n_cur"), lit(0L)) / col("_tc")
    bCounts.join(cCounts, col(category) === col("_cur_cat"), "full_outer")
      .crossJoin(totals)
      .select(
        coalesce(col(category), col("_cur_cat")).as(category),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        round((p - q) * log((p + eps) / (q + eps)), 6).as("psi"))
  }

  /** Per-group z-score outlier census with EXACT arithmetic: a value is
    * an outlier iff (v − mean)² > z²·var (population variance), but
    * evaluated in the cross-multiplied integer form
    *
    *   (v_c·n − s)² > z² · (n·ss − s²)
    *
    * on value CENTS (v_c = round(100·v), s = Σv_c, ss = Σv_c²) — no
    * double mean or variance ever materializes, so the verdict cannot
    * flap with partial-agg merge order, partitioning, or engine. The
    * decimal(38,0) headroom holds to ~1e12 rows × ~1e5-cent values per
    * group ((v_c·n)² ≲ 1e34); beyond that, pre-aggregate or bucket.
    *
    * Plan: one hash agg for (n, s, ss) per group, joined back (group
    * cardinality is usually tiny — the optimizer broadcasts), a narrow
    * flag, and a census agg — two group-keyed shuffles total. Returns
    * (group, n, n_outliers, outlier_cents). */
  def outliersZScore(df: DataFrame, group: String,
      value: org.apache.spark.sql.Column, z: Int = 3): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val base = df.select(col(group), round(value * 100).cast("decimal(38,0)").as("_vc"))
    val stats = base.groupBy(col(group)).agg(
      count(lit(1)).cast("decimal(38,0)").as("_n"),
      sum(col("_vc")).as("_s"),
      sum(col("_vc") * col("_vc")).as("_ss"))
    val dev = col("_vc") * col("_n") - col("_s")
    val lhs = dev * dev
    val rhs = lit(z.toLong * z) * (col("_n") * col("_ss") - col("_s") * col("_s"))
    // Past the documented ~1e34 headroom, decimal(38,0) products go NULL
    // under non-ANSI semantics — which would silently UNFLAG the most
    // extreme outliers (NULL reads as not-outlier). Overflow must abort
    // the job, not launder the verdict: a NULL product on a non-NULL
    // input value can only be overflow, so raise there.
    val flagged = base.join(stats, Seq(group))
      .withColumn("_isout",
        when(col("_vc").isNull, lit(false))
          .when(lhs.isNull || rhs.isNull,
            raise_error(concat(
              lit("outliersZScore: decimal(38,0) overflow in group '"),
              col(group).cast("string"),
              lit("' — pre-aggregate or bucket the group"))).cast("boolean"))
          .otherwise(lhs > rhs))
    flagged.groupBy(col(group)).agg(
      count(lit(1)).as("n"),
      sum(when(col("_isout"), 1L).otherwise(0L)).as("n_outliers"),
      coalesce(sum(when(col("_isout"), col("_vc"))), lit(0L).cast("decimal(38,0)"))
        .cast("long").as("outlier_cents"))
  }

  /** Robust outlier census per group: flag iff |v − median| > k·MAD —
    * the median-absolute-deviation rule, immune to the outliers
    * themselves inflating the spread (a single 1e9 spike moves a mean/
    * stddev gate's threshold but not this one's). Exactness contract:
    * values go to integer cents, so every median is an integer or an
    * exact .5 (IEEE-exact), |v − m| and k·MAD stay exact in double, and
    * the comparison cannot flap with merge order or engine.
    *
    * Scale contract: exact grouped medians are sort-based with O(group)
    * per-key state — right for DIMENSION-cardinality groups (event
    * types, regions; the same contract as groupwiseRank's driver map).
    * For corpus-cardinality groups use the prefix-sum ntile path
    * (`Packing.ntileOrdered`) to rank once and derive both medians. */
  def outliersMad(df: DataFrame, group: String,
      value: org.apache.spark.sql.Column, k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(col(group), round(value * 100).cast("long").as("_vc"))
    val med = base.groupBy(col(group)).agg(median(col("_vc")).as("_med"))
    val dev = base.join(broadcast(med), Seq(group))
      .withColumn("_d", abs(col("_vc").cast("double") - col("_med")))
    val mad = dev.groupBy(col(group)).agg(median(col("_d")).as("_mad"))
    dev.join(broadcast(mad), Seq(group))
      .withColumn("_isout", when(col("_d").isNull, lit(false))
        .otherwise(col("_d") > lit(k.toDouble) * col("_mad")))
      .groupBy(col(group)).agg(
        count(lit(1)).as("n"),
        max(col("_med")).as("median_cents"),
        max(col("_mad")).as("mad_cents"),
        sum(when(col("_isout"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Benford first-digit expectations, parts-per-million:
    * round(1e6·log₁₀(1 + 1/d)) — pinned as integer literals so both
    * engines compare against the SAME constants (no cross-engine
    * transcendental). */
  val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford's-law audit — the classic fraud/anomaly screen for
    * naturally-spread magnitude data (amounts, populations, file
    * sizes): the leading digit's frequency should track
    * log₁₀(1 + 1/d). One hash agg at NINE-row output cardinality; the
    * first digit comes from the integer value's STRING head — exact
    * and portable, where a log₁₀/power formulation would hand the
    * verdict to float rounding at bucket boundaries. Emits per digit:
    * observed count, observed ppm (trunc), expected ppm, and the
    * signed deviation — the reviewer's table. Non-positive values are
    * silently excluded (they have no Benford digit); a caller that
    * wants an excluded-row count must compute it separately. The value
    * contract is positive integers (cents, counts). */
  def benfordAudit(df: DataFrame, value: org.apache.spark.sql.Column): DataFrame = {
    val v = value.cast("long")
    val digit = substring(v.cast("string"), 1, 1).cast("int")
    val counts = df.filter(v > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_d"))
    val expected = counts.sparkSession
      .createDataFrame(benfordPpm.map(p => (p._1, p._2)))
      .toDF("digit", "exp_ppm")
    val tot = counts.agg(sum(col("n_d")).as("_n"))
    expected
      .join(counts, Seq("digit"), "left")
      .join(broadcast(tot), expr("true"))
      .select(col("digit").cast("long").as("digit"),
        coalesce(col("n_d"), lit(0L)).as("n_d"),
        call_function("div", coalesce(col("n_d"), lit(0L)) * 1000000L, col("_n"))
          .as("obs_ppm"),
        col("exp_ppm"),
        (call_function("div", coalesce(col("n_d"), lit(0L)) * 1000000L, col("_n"))
          - col("exp_ppm")).as("dev_ppm"))
  }

  private val ChecksumMod = 1000000007L // 1e9+7, the classic prime

  /** Order-independent bucketed TABLE CHECKSUM — verify a sink matches
    * its source (post-upsert JDBC vs the frame that fed it, replicas,
    * a re-run) WITHOUT moving either table: both sides compute B
    * small rows and compare. Per row, a fingerprint
    *
    *   fp = (Σ_i col_i · m_i) mod p   (distinct odd multipliers m_i,
    *                                   p = 1e9+7)
    *
    * then per bucket (= fp mod B): row count, Σfp mod p, Σfp² mod p.
    * Sums of commutative values — partition/merge order free — and a
    * changed, dropped, or duplicated row moves (n, s1, s2) in its
    * bucket with collision probability ~1/p per bucket pair. The
    * second moment catches compensating edits that keep Σfp fixed.
    *
    * PORTABLE by construction: integer arithmetic only, no engine hash
    * function — the same formula runs in SQL on Postgres/DuckDB/
    * anything, which is the entire point (a Spark-only hash cannot
    * checksum the JDBC side). Contract: `cols` must be integral
    * Columns (cast timestamps via unix_micros, decimals via scaled
    * longs, strings via length/codepoints — caller's documented
    * choice); NULL contributes 0 to the weighted sum but flips the
    * dedicated null-position term (i+1)·p₀ so NULL ≠ 0. Internals in
    * DECIMAL(38,0); Σfp ≤ n·1e9 holds to ~1e28 rows. */
  def checksumBuckets(df: DataFrame, cols: Seq[org.apache.spark.sql.Column],
      buckets: Int): DataFrame = {
    require(cols.nonEmpty && buckets > 0, "need ≥1 column and ≥1 bucket")
    val big = "decimal(38,0)"
    val mults = Iterator.iterate(1000003L)(m => (m * 31 + 17) % ChecksumMod)
      .take(cols.size).toSeq
    val weighted = cols.zip(mults).zipWithIndex.map { case ((c, m), i) =>
      val v = c.cast("long")
      val term = (pmod(v, lit(ChecksumMod)).cast(big) * m) % ChecksumMod
      when(v.isNull, lit((i + 1) * 999983L % ChecksumMod).cast(big)).otherwise(term)
    }
    val fp = pmod(weighted.reduce(_ + _) % ChecksumMod, lit(ChecksumMod).cast(big))
      .cast("long")
    df.select(fp.as("_fp"))
      .groupBy(pmod(col("_fp"), lit(buckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(col("_fp").cast(big)) % ChecksumMod).cast("long").as("s1"),
        (sum((col("_fp").cast(big) * col("_fp"))) % ChecksumMod).cast("long").as("s2"))
  }

  /** Exact percentile thresholds by the DISC rule — the smallest value
    * whose cumulative count reaches p% of n (`100·cum ≥ p·n`, pure
    * integer comparison, no interpolation and no doubles) — computed at
    * VALUE grain: one hash agg to (value, count), a range-exchange
    * prefix sum over the distinct values ([[Packing.assignShardsOrdered]]
    * — no global Window), and a one-row min-filter per threshold. The
    * row-level sort that `percentile_disc` would plan never exists; the
    * ranked frame is DISTINCT-VALUE cardinality, not row cardinality.
    * Returns a one-row frame (lo, hi). */
  def percentileDiscThresholds(df: DataFrame,
      value: org.apache.spark.sql.Column, pLowPct: Int, pHighPct: Int)
      : DataFrame = {
    require(pLowPct >= 0 && pLowPct <= pHighPct && pHighPct <= 100,
      s"need 0 <= pLow <= pHigh <= 100, got $pLowPct/$pHighPct")
    val grain = df.select(value.as("_v")).filter(col("_v").isNotNull)
      .groupBy(col("_v")).agg(count(lit(1)).as("_cnt"))
    val ranked = Packing.assignShardsOrdered(grain, Seq(col("_v").asc),
      "_cnt", budget = Long.MaxValue)
    val n = grain.agg(sum(col("_cnt")).as("_n"))
    ranked.crossJoin(broadcast(n))
      .agg(
        min(when(col("cum_w") * 100 >= col("_n") * pLowPct, col("_v"))).as("lo"),
        min(when(col("cum_w") * 100 >= col("_n") * pHighPct, col("_v"))).as("hi"))
  }

  /** Winsorization: clamp `value` into its own exact [pLow, pHigh]
    * percentile-disc band — the robust-stats preprocessing that tames
    * heavy tails before moment-based work (a mean over winsorized cents
    * is skew-proof; the raw mean is one fat-finger order away from
    * garbage). Thresholds ride a one-row broadcast; the clamp is a
    * per-row expression. Adds `<value>_w` (clamped) and `clip_dir`
    * (-1 below / 0 inside / 1 above). Integer values in, integer
    * values out — exact in any engine. */
  def winsorize(df: DataFrame, value: String, pLowPct: Int, pHighPct: Int)
      : DataFrame = {
    val thr = percentileDiscThresholds(df, col(value), pLowPct, pHighPct)
    df.crossJoin(broadcast(thr))
      .withColumn(s"${value}_w",
        when(col(value) < col("lo"), col("lo"))
          .when(col(value) > col("hi"), col("hi"))
          .otherwise(col(value)))
      .withColumn("clip_dir",
        when(col(value) < col("lo"), lit(-1L))
          .when(col(value) > col("hi"), lit(1L)).otherwise(lit(0L)))
  }

  /** WEIGHTED percentile-disc per group — "the doc length at which
    * half the TOKEN MASS sits", not half the documents: the statistic
    * curation decisions actually need when rows carry unequal weight
    * (tokens, bytes, revenue). Same exact integer rule as the unweighted
    * [[percentileDiscThresholds]]: threshold = smallest v with
    * `100·cumW ≥ p·W` over the VALUE-GRAIN cumulative weight.
    *
    * Scale shape: the heavy input collapses to (group, value) grain in
    * one hash agg first; the cumulative window then runs partitioned
    * BY GROUP over that collapsed frame — distinct-value cardinality
    * per group, never row cardinality, so no single-reducer sort
    * exists at any corpus size. NULL values and NULL/≤0 weights are
    * excluded (documented). One output row per group:
    * (group, total_weight, p<i>_value per requested percentile). */
  def weightedPercentiles(df: DataFrame, group: String,
      value: org.apache.spark.sql.Column,
      weight: org.apache.spark.sql.Column, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 100),
      s"percentiles must be in [0,100], got $ps")
    import org.apache.spark.sql.expressions.Window
    val grain = df.select(col(group), value.as("_v"),
        weight.cast("long").as("_w"))
      .filter(col("_v").isNotNull && col("_w").isNotNull && col("_w") > 0L)
      .groupBy(col(group), col("_v")).agg(sum(col("_w")).as("_gw"))
    val win = Window.partitionBy(col(group)).orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grain.withColumn("_cumw", sum(col("_gw")).over(win))
      .join(grain.groupBy(col(group)).agg(sum(col("_gw")).as("_tw")), group)
    cum.groupBy(col(group))
      .agg(min(col("_tw")).as("total_weight"),
        ps.map(p => min(when(col("_cumw") * 100 >= col("_tw") * p, col("_v")))
          .as(s"p${p}_value")): _*)
  }

  /** Missing-id (sequence gap) detection over an integer key — "which
    * invoice numbers never arrived" — WITHOUT a global sort: the naive
    * form is `lead(k) OVER (ORDER BY k)`, a single reducer at any real
    * scale. Here the keyspace buckets by `k div bucketSize`:
    *   1. intra-bucket gaps from a BUCKET-partitioned lead (keyed
    *      window, scales with the widest bucket only);
    *   2. cross-boundary gaps from the bucket-grain (min, max) stats
    *      frame — n/bucketSize rows of metadata, where the one ordered
    *      window is the collapsed-frame pattern (zone-map scale, not
    *      row scale). A bucket with no rows at all never appears in
    *      the stats frame, so fully-missing buckets surface as one
    *      boundary gap spanning them — no generate_series over the
    *      keyspace ever materializes.
    * Duplicates collapse first (a gap census is about PRESENCE).
    * Returns (gap_start, gap_end, gap_len) for interior gaps only —
    * before-first/after-last are unknowable without an external range
    * contract. */
  def sequenceGaps(df: DataFrame, key: String,
      bucketSize: Long = 1000000L): DataFrame = {
    require(bucketSize >= 2, s"bucketSize must be >= 2, got $bucketSize")
    import org.apache.spark.sql.expressions.Window
    val ks = df.select(col(key).cast("long").as("_k"))
      .filter(col("_k").isNotNull).distinct()
      .withColumn("_b", expr(s"_k div $bucketSize"))
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_k").asc)
    val intra = ks.withColumn("_next", lead(col("_k"), 1).over(wIn))
      .filter(col("_next") > col("_k") + 1L)
      .select((col("_k") + 1L).as("gap_start"), (col("_next") - 1L).as("gap_end"))
    val stats = ks.groupBy(col("_b"))
      .agg(min(col("_k")).as("_min"), max(col("_k")).as("_max"))
    val wB = Window.orderBy(col("_b").asc)
    val boundary = stats.withColumn("_nextMin", lead(col("_min"), 1).over(wB))
      .filter(col("_nextMin") > col("_max") + 1L)
      .select((col("_max") + 1L).as("gap_start"), (col("_nextMin") - 1L).as("gap_end"))
    intra.unionByName(boundary)
      .withColumn("gap_len", col("gap_end") - col("gap_start") + 1L)
  }

  /** k-anonymity / l-diversity census over quasi-identifier columns —
    * the release-gate question for any dataset leaving its enclave:
    * how many rows sit in a QI group smaller than k (re-identifiable
    * by joining public attributes), and how many groups expose a
    * sensitive attribute with fewer than l distinct values (homogeneity
    * attack: group membership alone reveals the secret — a group can
    * be large AND still leak). Two grain-collapsing hash aggs
    * ((QI, sensitive) then QI), one census row out; map-side partials
    * everywhere, no windows. NULL sensitive counts as a value (a
    * group that is all-NULL is perfectly homogeneous — that IS the
    * leak). Returns one row: (n_rows, n_groups, min_group_size,
    * n_small_groups, rows_at_risk, n_low_diversity_groups,
    * rows_in_low_diversity). */
  def kAnonymityCensus(df: DataFrame, qiCols: Seq[String],
      sensitive: String, k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2 && l >= 2,
      s"need QI cols, k >= 2, l >= 2; got $qiCols/$k/$l")
    val gs = qiCols.map(col)
    val fine = df.groupBy(gs :+ col(sensitive): _*)
      .agg(count(lit(1)).as("_n"))
    val groups = fine.groupBy(gs: _*)
      .agg(sum(col("_n")).as("_size"), count(lit(1)).as("_nsens"))
    groups.agg(
      sum(col("_size")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("_size")).as("min_group_size"),
      sum(when(col("_size") < k.toLong, 1L).otherwise(0L)).as("n_small_groups"),
      sum(when(col("_size") < k.toLong, col("_size")).otherwise(0L))
        .as("rows_at_risk"),
      sum(when(col("_nsens") < l.toLong, 1L).otherwise(0L))
        .as("n_low_diversity_groups"),
      sum(when(col("_nsens") < l.toLong, col("_size")).otherwise(0L))
        .as("rows_in_low_diversity"))
  }

  /** Differentially-private group counts via the Laplace mechanism —
    * the release step a curation pipeline needs before publishing
    * corpus statistics (per-source/language/domain counts are exactly
    * the quasi-identifier censuses k-anonymity flags). Count queries
    * have sensitivity 1, so noise ~ Laplace(1/epsilon) gives
    * epsilon-DP: noise = -(1/eps)·sign(u-½)·ln(1-2|u-½|) (inverse-CDF
    * sampling) from a uniform draw u ∈ (0,1).
    *
    * THE DRAW IS A SEAM (`uniform`), and the privacy claim lives or
    * dies on it:
    *   - the DEFAULT is a deterministic draw from the group key through
    *     the engine-portable multiplicative hash family the sampling
    *     ops pin (not xxhash64 — DuckDB lacks it). It exists ONLY to
    *     make the gate/oracle replayable. A deterministic draw keyed on
    *     the public group key provides ZERO privacy if the release is
    *     ever repeated — even with a secret seed, re-releasing lets an
    *     observer difference the (identical) noise out. It is a test
    *     fixture, not a mechanism.
    *   - a PRODUCTION release must pass fresh randomness drawn once per
    *     release, e.g. `uniform = Some(_ => rand())` — never reused,
    *     never derived from released values. The epsilon calibration is
    *     identical either way; only the draw changes. NOTE that
    *     `rand()` is a PLAN-level expression: every evaluation of the
    *     returned frame (a second action, a shuffle-retry recompute)
    *     re-draws the noise, silently composing epsilon across
    *     evaluations. Materialize the noised release EXACTLY ONCE —
    *     write it to storage (or checkpoint/collect) immediately and
    *     publish only the materialized rows — and account every
    *     re-evaluation as a fresh epsilon spend.
    * Noised counts are rounded to 6 decimals; group keys with true
    * count 0 are absent (this is the known "presence leaks" caveat of
    * histogram DP — documented, not hidden). */
  def dpNoisedCounts(df: DataFrame, group: String, groupKey: Column,
      epsilonMicro: Long, seed: Long = 42L,
      uniform: Option[Column => Column] = None): DataFrame = {
    require(epsilonMicro > 0, "dp: epsilon must be positive")
    val eps = epsilonMicro.toDouble / 1e6
    // groupKey must be an integer-valued function of the group column
    // (the caller derives it)
    val counts = df.groupBy(col(group), groupKey.as("_gk"))
      .agg(count(lit(1)).as("n_true"))
    val u = uniform.map(f => f(col("_gk"))).getOrElse {
      val h = ((col("_gk") % 1000003L + seed) * 2654435761L) % 2147483647L % 1000000L
      (h.cast("double") + lit(0.5)) / lit(1000000.0) // in (0,1)
    }
    val centered = u - lit(0.5)
    val noise = -signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered)) / lit(eps)
    counts
      .withColumn("n_noised", round(col("n_true") + noise, 6))
      .select(col(group), col("n_true"), col("n_noised"))
  }
}
