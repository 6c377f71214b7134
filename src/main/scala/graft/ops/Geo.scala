package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial self-join — "all point pairs within radius r" — via grid
  * bucketing, the scale path every spatial engine (PostGIS ST_DWithin
  * over GiST, Sedona's partitioned join, H3/S2 cell joins) reduces to.
  * The reference has no spatial surface; this exists because location
  * dedup ("two listings at the same address"), neighbor features, and
  * geo-clustering are standard enrichment steps, and the naive form is
  * the classic accidental cross join.
  *
  * == Coordinates are INTEGERS by contract ==
  * Callers supply planar integer coordinates (micro-degrees after an
  * equirectangular projection, meters in a local grid, or any fixed-
  * point encoding). Distance is exact squared Euclidean in that unit —
  * `(Δx)² + (Δy)² ≤ r²` in BIGINT, no sqrt, no doubles — so results
  * hash-match any engine. True great-circle semantics are the caller's
  * projection choice, not smuggled trigonometry (haversine's
  * transcendentals are exactly what an oracle cannot replay
  * bit-for-bit; project first, then this join is exact).
  *
  * == Scale shape ==
  * Cell size = r: any pair within r lies in the same or an adjacent
  * cell, so ONE side replicates to its 3×3 cell neighborhood (9×
  * map-side fan-out, no shuffle amplification beyond it) and the join
  * is a plain hash join on cell id. Candidate work is Σ_cell 9·|cell|²
  * — density-bounded, never n²; a uniformly loaded grid at 100 TB
  * shuffles each point 10× and nothing more. De-dup is positional,
  * not a distinct: a pair (a, b) is kept only from the (replica=a,
  * home=b) match with `a.id < b.id`, which the mirrored
  * (replica=b, home=a) match cannot satisfy — each pair exactly once
  * with no post-join dedup shuffle. Hot cells (a city-center cell at
  * planet scale) are a data property: shrink r or pre-split dense
  * cells upstream; the join itself stays keyed and partial-agg free.
  */
object Geo {

  /** All unordered point pairs within `radius` (inclusive) in exact
    * squared-integer distance. `df` must carry one row per point with
    * a unique integral `id`; returns (id_a, id_b, dist2) with
    * id_a < id_b. */
  def radiusJoin(df: DataFrame, id: String, x: Column, y: Column,
      radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val pts = df.select(col(id).cast("long").as("_id"),
      x.cast("long").as("_x"), y.cast("long").as("_y"))
    val r = lit(radius)
    // exact integer floor division (c − pmod is the largest multiple of
    // radius ≤ c, also for negatives) — a double intermediate would
    // round coordinates near 2^53 and misassign boundary cells
    def cellOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(radius)), lit(radius))
    val home = pts
      .withColumn("_cx", cellOf(col("_x")))
      .withColumn("_cy", cellOf(col("_y")))
    // replicate one side to the 3×3 neighborhood
    val rep = home
      .withColumn("_dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("_id").as("id_a"), col("_x").as("xa"), col("_y").as("ya"),
        (col("_cx") + col("_dx")).as("_cx"), (col("_cy") + col("_dy")).as("_cy"))
    val hb = home.select(col("_id").as("id_b"), col("_x").as("xb"),
      col("_y").as("yb"), col("_cx"), col("_cy"))
    rep.join(hb, Seq("_cx", "_cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r * r)
      .select(col("id_a"), col("id_b"), col("dist2"))
  }

  /** Per-cell density census over the same grid: (cell_x, cell_y,
    * n_points) — the occupancy histogram that sizes the join above
    * (max cell population bounds the per-key fan-out) and the input
    * to hot-cell pre-splitting decisions. One hash agg at cell grain.
    */
  def cellCensus(df: DataFrame, x: Column, y: Column,
      cellSize: Long): DataFrame = {
    require(cellSize >= 1, s"cellSize must be >= 1, got $cellSize")
    // same exact floor-div as radiusJoin — no float surface
    def cellOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(cellSize)), lit(cellSize))
    df.select(cellOf(x.cast("long")).as("cell_x"),
        cellOf(y.cast("long")).as("cell_y"))
      .groupBy("cell_x", "cell_y")
      .agg(count(lit(1)).as("n_points"))
  }
}
