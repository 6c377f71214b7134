package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of and range joins over event-time keys — operators the reference
  * lacks entirely (SURVEY §2.3) but any event pipeline needs (attribution,
  * sessional context, temporal correlation).
  *
  * Implementation choice (preference order (a): compose built-ins): an
  * as-of join is an equi-join on the key + time inequality, reduced to
  * the latest matching right row via `max_by` aggregation. Catalyst plans
  * the equi-part as a hash join (broadcast or shuffle), the inequality as
  * a post-join filter, and the reduction as a partial-agg'd hash
  * aggregate — every stage map-side combines, so the shape survives
  * scale-up as long as per-key match fan-out is bounded (true for
  * bounded event windows; for unbounded histories, pre-bucket the time
  * axis — see [[rangeJoin]]'s note).
  */
object AsOf {

  /** As-of join: for each left row, the single right row with the same
    * `key` and the greatest `rightTs` ≤ `leftTs` (ties broken by
    * `rightTieBreak` desc). Inner semantics: left rows with no match drop.
    *
    * Output: all left columns (prefixed `left_` only on collision with
    * an `asof_*` output or the internal `_m` alias) plus the matched
    * right columns prefixed with `asof_`.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      leftId: String,
      rightTieBreak: Seq[String] = Nil): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, leftId, rightTieBreak, forward = false)

  /** Forward as-of join: for each left row, the single right row with
    * the same `key` and the SMALLEST `rightTs` ≥ `leftTs` (ties by
    * `rightTieBreak` asc) — "the next event after". Same shape as
    * [[joinAsOf]] with the inequality and reduction flipped: equi-join
    * + min_by hash aggregate, map-side combining throughout. */
  def joinAsOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      leftId: String,
      rightTieBreak: Seq[String] = Nil): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, leftId, rightTieBreak, forward = true)

  /** Shared body of both as-of directions — one implementation so fixes
    * can't silently diverge. `forward` flips the time inequality and
    * the max_by/min_by reduction; everything else is identical. */
  private def asOfImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      leftId: String,
      rightTieBreak: Seq[String],
      forward: Boolean): DataFrame = {
    require(left.columns.contains(leftId), s"leftId $leftId must be a left column")
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"asof_$c"))
    // left columns colliding with an asof_* output (e.g. a previous
    // as-of result fed back in) or the internal _m alias get the
    // documented left_ prefix — otherwise the output would carry
    // ambiguous duplicate names
    val reserved = r.columns.toSet + "_m"
    def leftName(c: String) = if (reserved(c)) s"left_$c" else c
    val l = left.columns.foldLeft(left)((df, c) =>
      if (reserved(c)) df.withColumnRenamed(c, leftName(c)) else df)
    val (keyC, leftTsC, leftIdC) = (leftName(key), leftName(leftTs), leftName(leftId))
    val cond = col(keyC) === col(s"asof_$key") &&
      (if (forward) col(s"asof_$rightTs") >= col(leftTsC)
       else col(s"asof_$rightTs") <= col(leftTsC))
    val joined = l.join(r, cond)
    val ord = struct((Seq(s"asof_$rightTs") ++ rightTieBreak.map("asof_" + _)).map(col): _*)
    val rightCols = r.columns.toSeq.filterNot(_ == s"asof_$key")
    // leftId is unique per left row, so the other left columns are
    // group-constant and ride along via first()
    val otherLeft = l.columns.toSeq.filterNot(_ == leftIdC)
    val carried = otherLeft.map(c => first(col(c)).as(c))
    val reducer = if (forward) min_by _ else max_by _
    val aggs = carried :+ reducer(struct(rightCols.map(col): _*), ord).as("_m")
    joined
      .groupBy(col(leftIdC))
      .agg(aggs.head, aggs.tail: _*)
      .select((col(leftIdC) +: otherLeft.map(col)) ++
        rightCols.map(c => col(s"_m.$c")): _*)
  }

  /** Range join: pairs (left, right) sharing `key` with `rightTs` in
    * [leftTs, leftTs + window]. At 100 TB the guard against quadratic
    * blow-up is the bounded window itself; for heavy-hitter keys, salt
    * the key or bucket both sides by floor(ts/window) and join on
    * (key, bucket) ∪ (key, bucket+1) to keep the match set per task
    * bounded. */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      window: Column): DataFrame = {
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
    left.join(r,
      col(key) === col(s"r_$key") &&
        col(s"r_$rightTs") >= col(leftTs) &&
        col(s"r_$rightTs") <= col(leftTs) + window)
      .drop(s"r_$key")
  }

  /** Interval-overlap join: pairs of (left, right) intervals on the same
    * `key` that OVERLAP (lStart ≤ rEnd ∧ rStart ≤ lEnd) — the two-sided
    * generalization of [[rangeJoin]]. A naive theta-join on the overlap
    * condition degenerates to per-key nested loops; this is the
    * bucketized form that scales: each interval explodes to the fixed-
    * width time buckets it covers, the join is an EQUI-join on
    * (key, bucket), and the exact overlap test filters the candidates.
    * An overlapping pair shares every bucket the overlap region covers —
    * the pair is emitted only from the overlap's FIRST bucket
    * (`bucket == floor(max(lStart, rStart) / W)`), so no `distinct()`
    * pass exists at any scale. Per-task match sets stay bounded by
    * (intervals alive per bucket)², tunable via `bucketWidth`; interval
    * length / W bounds the explode fan-out.
    *
    * Start/end columns are event-time numbers (e.g. epoch micros);
    * intervals are closed, with end ≥ start. Output: all left columns +
    * right columns prefixed `r_` (key unduplicated). */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    def withBuckets(df: DataFrame, s: String, e: String, name: String): DataFrame =
      df.withColumn(name,
        explode(sequence(floor(col(s) / w).cast("long"), floor(col(e) / w).cast("long"))))
    val l = withBuckets(left, lStart, lEnd, "_bkt")
    val r = withBuckets(
      right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c")),
      s"r_$rStart", s"r_$rEnd", "r__bkt")
    l.join(r, col("_bkt") === col("r__bkt") && col(key) === col(s"r_$key"))
      .filter(col(lStart) <= col(s"r_$rEnd") && col(s"r_$rStart") <= col(lEnd))
      // emit from the overlap's first bucket only — duplicate-free by
      // construction, no distinct/shuffle needed
      .filter(col("_bkt") ===
        floor(greatest(col(lStart), col(s"r_$rStart")) / w).cast("long"))
      .drop("_bkt", "r__bkt", s"r_$key")
  }
}
