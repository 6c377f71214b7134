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
    * Output: all left columns (prefixed `left_` only on collision) plus
    * the matched right columns prefixed with `asof_`.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      leftId: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(left.columns.contains(leftId), s"leftId $leftId must be a left column")
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"asof_$c"))
    val joined = left.join(r,
      col(key) === col(s"asof_$key") && col(s"asof_$rightTs") <= col(leftTs))
    val ord = struct((Seq(s"asof_$rightTs") ++ rightTieBreak.map("asof_" + _)).map(col): _*)
    val rightCols = r.columns.toSeq.filterNot(_ == s"asof_$key")
    // leftId is unique per left row, so the other left columns are
    // group-constant and ride along via first()
    val carried = left.columns.toSeq.filterNot(_ == leftId)
      .map(c => first(col(c)).as(c))
    val aggs = carried :+ max_by(struct(rightCols.map(col): _*), ord).as("_m")
    joined
      .groupBy(col(leftId))
      .agg(aggs.head, aggs.tail: _*)
      .select((col(leftId) +: left.columns.toSeq.filterNot(_ == leftId).map(col)) ++
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
}
