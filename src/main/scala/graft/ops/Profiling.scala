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

  /** Most-common-values histogram — the other half of ANALYZE-style
    * optimizer statistics ([[summarize]] gives n/nulls/ndv/range; a
    * cost model also wants the top-k value frequencies to estimate
    * selectivity on skewed columns). Per column: one VALUE-grain hash
    * agg (map-side partials — the shuffle carries at most one row per
    * distinct value per map partition) feeding the O(k)-buffer bounded
    * top-k aggregator, so no per-column sort and no full value ranking
    * ever materializes. Each column's branch scans ONLY that column
    * (parquet pruning) — the ANALYZE access pattern.
    *
    * Values are string-rendered AFTER the native-type aggregation
    * (numeric grouping, numeric counts; only the output unifies as
    * string), ranked (count desc, value_str asc) — deterministic under
    * ties. NULLs are excluded from the histogram; [[summarize]] carries
    * the null count. Output: (col_name, rank, value_str, cnt). */
  def mostCommonValues(df: DataFrame, cols: Seq[String], k: Int = 5)
      : DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    cols.map { c =>
      df.filter(col(c).isNotNull)
        .groupBy(col(c).as("_v")).agg(count(lit(1)).as("_cnt"))
        .agg(TopK.topKByCount(k)(col("_cnt"), col("_v").cast("string"))
          .as("_m"))
        .select(lit(c).as("col_name"),
          posexplode(col("_m")).as(Seq("_i", "_e")))
        .select(col("col_name"), (col("_i") + 1).cast("long").as("rank"),
          col("_e._2").as("value_str"), col("_e._1").as("cnt"))
    }.reduce(_.unionByName(_))
  }

  /** Functional-dependency census — does `lhs → rhs` hold, and how
    * badly does it fail? The dependency-discovery primitive behind key
    * detection, normalization advice, and "this column is derivable —
    * stop storing it" findings; also the cheapest data-quality tripwire
    * for denormalized feeds (a customer key mapping to two nations is
    * an upstream join bug, surfaced here as one violating key). Exact:
    * one (lhs, rhs)-grain hash agg collapses duplicates, one lhs-grain
    * rollup counts images — both map-side-partial friendly; NULL rhs
    * values count as one image value (null-safe grouping), so a
    * sometimes-null dependent violates. Returns one row:
    * (n_keys, n_violating_keys, max_images, fd_holds). */
  def fdCensus(df: DataFrame, lhs: String, rhs: String): DataFrame =
    df.select(col(lhs).as("_l"), col(rhs).as("_r"))
      .groupBy("_l", "_r").agg(count(lit(1)).as("_n"))
      .groupBy("_l").agg(count(lit(1)).as("_images"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("_images") > 1L, 1L).otherwise(0L))
          .as("n_violating_keys"),
        max(col("_images")).as("max_images"))
      .withColumn("fd_holds", col("n_violating_keys") === 0L)
}
