package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the fixed-size
  * frequency summary for key domains too large to count exactly. The
  * exact Misra-Gries heavy-hitter op ([[Skew.heavyHitters]]) answers
  * "which keys are heavy"; Count-Min answers point queries
  * "approximately how often did THIS key occur" with one-sided error:
  * estimates never undercount, and overcount by more than ε·N with
  * probability ≤ δ at d = ⌈ln 1/δ⌉ rows × w = ⌈e/ε⌉ columns.
  *
  * == Scale shape ==
  * Building the sketch is ONE hash aggregation whose output is capped
  * at d·w rows no matter the input size — the d per-key cell updates
  * are partial-aggregated map-side, so the shuffle carries ≤ d·w rows
  * per map partition, and the finished sketch is small enough to
  * broadcast, persist as a table, or feed a next batch. Everything is
  * deterministic: hash row i keys on `xxhash64(key, i)`, so two
  * sketches of the same data built on different clusters or partition
  * layouts are cell-for-cell identical, and sketches of DIFFERENT
  * batches merge by cell-wise sum ([[Sketch.cmsMerge]]) — the property
  * that makes the sketch usable incrementally (per-day sketches roll
  * up to a month without re-reading the corpus).
  *
  * Exactness contract: counts are BIGINT throughout — estimates are
  * exact integers, so gates hash cell-for-cell and merge order can
  * never move a value.
  */
object Sketch {

  private def checkDims(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
  }

  /** Build a d×w Count-Min sketch over `key`, weighting each row by
    * `weight` (default 1 — plain counts; pass a column for weighted
    * frequency). Returns touched cells only: `(r, c, cnt)`, ≤ d·w rows
    * total; untouched cells are implicitly 0. */
  def countMin(df: DataFrame, key: String, depth: Int, width: Int,
      weight: Column = lit(1L)): DataFrame = {
    checkDims(depth, width)
    df.select(col(key).as("_k"), weight.cast("long").as("_w"))
      .select(col("_k"), col("_w"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), pmod(xxhash64(col("_k"), col("r")), lit(width.toLong)).as("c"),
        col("_w"))
      .groupBy("r", "c").agg(sum("_w").as("cnt"))
  }

  /** Merge two sketches of the SAME (depth, width): cell-wise sum.
    * cms(A ∪ B) == cmsMerge(cms(A), cms(B)) exactly — the linearity
    * that makes per-batch sketches roll up. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "c").agg(sum("cnt").as("cnt"))

  // ------------------------------------------------------------------
  // KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002 /
  // Beyer et al. 2007. Count-Min summarizes FREQUENCIES; HLL estimates
  // one cardinality; KMV is the distinct sketch that also supports SET
  // ALGEBRA: the k smallest hashes of A ∪ B are computable from the two
  // sketches alone (merge, dedup, trim — exact, not approximate, as a
  // sketch-of-the-union), and the fraction of that combined sketch
  // present in BOTH inputs estimates Jaccard directly — the estimator
  // MinHash banding uses pairwise, here as a mergeable per-group
  // aggregate. Intersection cardinality ≈ J · |A ∪ B| follows.
  //
  // Scale shape: one hash aggregation with an O(k) buffer
  // ([[MinKDistinctLongAggregator]] — distinctness enforced inside the
  // buffer, so the full distinct domain never shuffles; partials carry
  // ≤ k longs per group per map partition). A finished sketch is k·8
  // bytes — thousands of them broadcast; per-day sketches roll up to
  // months without re-reading the corpus (mergeability proven in spec).
  //
  // Estimator: with U = hash values mapped to unit fractions, the kth
  // smallest order statistic u_k gives est = (k-1)/u_k (unbiased); a
  // sketch holding FEWER than k values saw the whole domain and is
  // EXACT — gates pin that branch at small scale and the estimator
  // branch at large scale. Estimates are doubles by nature; gates carry
  // them as pinned verdict booleans beside exact BIGINT truth columns.
  // ------------------------------------------------------------------

  /** Per-group KMV sketch over `elem`: (group, kh array<bigint> sorted
    * asc, ≤ k distinct xxhash64 values). */
  def kmv(df: DataFrame, group: String, elem: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(col(group))
      .agg(TopK.minKDistinctLong(k)(xxhash64(elem)).as("kh"))
  }

  /** Merge sketch rows (same k) down to one sketch per `group` of a
    * coarser grain: kmv(A ∪ B) == kmvMerge(kmv(A), kmv(B)) exactly. */
  def kmvMerge(sketches: DataFrame, group: String, k: Int): DataFrame =
    sketches.groupBy(col(group))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("kh"))))),
        1, k).as("kh"))

  /** Distinct-count estimate from a sketch column: exact size when the
    * buffer never filled, else (k-1)/u_k with u_k the kth hash as an
    * unsigned unit fraction. Returns DOUBLE (estimate — gate via
    * verdict bounds, never hash-compare). */
  def kmvEstimate(kh: Column, k: Int): Column = {
    // signed long → unit fraction in (0,1): (h + 2^63) / 2^64
    val uk = (element_at(kh, k).cast("double") + lit(9.223372036854776e18)) /
      lit(1.8446744073709552e19)
    when(size(kh) < k, size(kh).cast("double"))
      .otherwise(lit((k - 1).toDouble) / uk)
  }

  /** Pairwise set algebra from two sketch columns `ka`, `kb` (same k):
    * combined union sketch, Jaccard estimate ρ = |comb ∩ A ∩ B|/|comb|,
    * union estimate from the combined sketch, intersection ≈ ρ·|A∪B|.
    * Emits `_comb`, `j_est`, `union_est`, `inter_est` columns. */
  def kmvSetOps(pairs: DataFrame, ka: String, kb: String, k: Int): DataFrame = {
    val comb = slice(array_sort(array_distinct(
      concat(col(ka), col(kb)))), 1, k)
    pairs.withColumn("_comb", comb)
      .withColumn("j_est",
        size(array_intersect(array_intersect(col("_comb"), col(ka)), col(kb)))
          .cast("double") / size(col("_comb")).cast("double"))
      .withColumn("union_est", kmvEstimate(col("_comb"), k))
      .withColumn("inter_est", col("j_est") * col("union_est"))
  }

  /** Point-estimate the frequency of each key in `probes` (one row per
    * distinct probe key): est(k) = min over rows i of cell
    * (i, h_i(k)), never-touched cells read as 0 — so estimates are
    * exact 0 for keys hashing clear of all traffic, and ≥ the true
    * count always (the one-sided CMS guarantee). The probe side is
    * typically tiny (a watchlist); the sketch side is ≤ d·w rows, so
    * AQE broadcasts whichever is smaller. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, key: String,
      depth: Int, width: Int): DataFrame = {
    checkDims(depth, width)
    val cells = probes.select(col(key))
      .select(col(key), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c", pmod(xxhash64(col(key), col("r")), lit(width.toLong)))
    cells.join(sketch, Seq("r", "c"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ------------------------------------------------------------------
  // AMS / tug-of-war F2 sketch (Alon, Matias & Szegedy 1996, bucketed
  // "fast AMS" form = the Count-Sketch of Charikar et al. 2002).
  // Count-Min answers point frequencies; F2 = Σ_k count(k)² is the
  // SECOND MOMENT — self-join size, repeated-key skew, collision mass —
  // and the quantity a planner wants BEFORE running the join that F2
  // predicts. The sketch is d rows × w buckets of SIGNED counter sums:
  // cell(r, c) = Σ_{k: h_r(k)=c} ε_r(k)·count(k) with ε ∈ {−1, +1};
  // per-row estimate Σ_c cell² is an unbiased F2 estimator with
  // variance 2·F2²/w, and the MEDIAN over d rows concentrates it.
  //
  // Same contracts as Count-Min: one capped hash aggregation (≤ d·w
  // cells, partial-aggregated map-side), deterministic xxhash rows —
  // bucket from seed r, SIGN from the xxhash bit 1 of an offset seed
  // stream (r + 64; independent of the bucket bits) — so sketches are
  // cell-identical across clusters/layouts, and cell-wise ADDITION
  // merges batch sketches exactly (signed linearity, the property
  // Count-Min's min-estimate lacks — proven in spec).
  // ------------------------------------------------------------------

  /** Build the d×w signed AMS sketch over `key` within each group of
    * `groupCols` (empty = one global sketch), weighting rows by
    * `weight`. Returns touched cells only: (groupCols..., r, c, cell).
    */
  def amsSketch(df: DataFrame, key: String, depth: Int, width: Int,
      groupCols: Seq[String] = Nil, weight: Column = lit(1L)): DataFrame = {
    checkDims(depth, width)
    val gc = groupCols.map(col)
    df.select(gc :+ col(key).as("_k") :+ weight.cast("long").as("_w"): _*)
      .select(gc :+ col("_k") :+ col("_w") :+
        explode(sequence(lit(0), lit(depth - 1))).as("r"): _*)
      .select(gc :+ col("r") :+
        pmod(xxhash64(col("_k"), col("r")), lit(width.toLong)).as("c") :+
        (col("_w") * (lit(1L) - lit(2L) *
          pmod(xxhash64(col("_k"), col("r") + lit(64)), lit(2L)))).as("_s"): _*)
      .groupBy(((groupCols :+ "r") :+ "c").map(col): _*)
      .agg(sum(col("_s")).as("cell"))
  }

  /** Equi-join cardinality estimate from two Count-Min sketches of the
    * SAME (depth, width): |A ⋈ₖ B| = Σ_k f_A(k)·f_B(k), estimated as
    * min over rows of the cell-wise inner product Σ_c cellA·cellB —
    * the planner question ("how big is this join going to be?")
    * answered from two O(d·w) summaries without touching either table.
    * One-sided like the point estimate: hash collisions only ADD mass,
    * so est ≥ truth always, with expected excess ≤ N_A·N_B/w per row
    * (Cormode & Muthukrishnan §4.2) and the min concentrating it. A
    * sketch row with no overlapping touched cells contributes inner
    * product 0 (the estimate is then exactly 0 — anchored on the full
    * row range, not just present rows). Returns one row:
    * (join_size_est). */
  def cmsJoinSizeEstimate(skA: DataFrame, skB: DataFrame,
      depth: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val ip = skA.select(col("r"), col("c"), col("cnt").as("_ca"))
      .join(skB.select(col("r"), col("c"), col("cnt").as("_cb")),
        Seq("r", "c"))
      .groupBy("r").agg(sum(col("_ca") * col("_cb")).as("_ip"))
    skA.sparkSession.range(depth).select(col("id").cast("int").as("r"))
      .join(ip, Seq("r"), "left")
      .agg(min(coalesce(col("_ip"), lit(0L))).as("join_size_est"))
  }

  /** Median-of-rows F2 estimate from an [[amsSketch]] frame: per
    * (group, r) the row estimate Σ_c cell², then the lower median over
    * the d rows — all BIGINT, so the estimate is deterministic and
    * engine-portable. Rows whose every key cancelled still exist as
    * estimate 0 only if some cell was touched; callers keep d odd for
    * a true middle element. Returns (groupCols..., f2_est). */
  def amsF2Estimate(sketch: DataFrame, depth: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(depth >= 1 && depth % 2 == 1, s"depth must be odd, got $depth")
    val gc = groupCols.map(col)
    sketch
      .groupBy((groupCols :+ "r").map(col): _*)
      .agg(sum(col("cell") * col("cell")).as("_est"))
      .groupBy(gc: _*)
      .agg(element_at(array_sort(collect_list(col("_est"))),
        (depth + 1) / 2).as("f2_est"))
  }

  /** Misra–Gries frequent-items summary (see
    * [[graft.ops.MisraGriesLongAggregator]]): ≤ k (key, est) counters
    * with the n/(k+1) error guarantee — the DETERMINISTIC complement
    * to Count-Min (no hash collisions, under- instead of
    * over-estimates, and the candidate set comes out of the sketch
    * itself instead of needing a probe list). Returns (key, est). */
  def misraGries(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(key.cast("long").as("_k"))
      .agg(graft.ops.TopK.misraGriesLong(k)(col("_k")).as("_mg"))
      .select(explode(col("_mg")).as("_e"))
      .select(col("_e._1").as("key"), col("_e._2").as("est"))
  }
}
