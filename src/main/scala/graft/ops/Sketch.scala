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
}
