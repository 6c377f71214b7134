package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the "know your data" op every large-scale pipeline
  * runs before/after transformations (null-rate regressions, cardinality
  * explosions, range drift). Single pass: one aggregate row carrying all
  * per-column stats, then unpivoted to one row per column. Distinct
  * counts are exact here (expand-based, one shuffle); at 100 TB swap
  * `countDistinct` for `approx_count_distinct` (HLL, no expand) — same
  * output shape, documented trade.
  */
object Profiling {

  /** Stats per requested column: row count, nulls, exact distinct, and
    * min/max rendered as strings so heterogeneous column types unify. */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
        countDistinct(col(c)).as(s"_dist_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("_n").as("n_rows"),
        col(s"_null_$c").cast("long").as("n_null"),
        col(s"_dist_$c").cast("long").as("n_distinct"),
        col(s"_min_$c").as("min_str"), col(s"_max_$c").as("max_str"))
    }
    one.select(explode(array(stacked: _*)).as("_s")).select(col("_s.*"))
  }
}
