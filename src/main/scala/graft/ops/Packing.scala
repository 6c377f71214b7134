package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shard packing for training-data pipelines: assign each document to a
  * fixed-weight-budget shard by running (prefix) sum of a weight column
  * (token count) in a stable key order — the step that turns a filtered
  * corpus into evenly-sized training shards.
  *
  * The naive formulation is `sum(w) OVER (ORDER BY key)` — a GLOBAL
  * window, which Spark executes in ONE partition: correct at test scale,
  * dead at 100 TB. This implements the classic two-phase distributed
  * prefix sum instead:
  *
  *   1. range-repartition by key (so partition p holds a contiguous key
  *      range, and partition order == key order);
  *   2. one tiny per-partition total per partition (P rows — thousands,
  *      not billions) is collected and prefix-summed on the driver;
  *   3. offsets broadcast-join back; each partition computes its local
  *      running sum with a window PARTITIONED BY partition id — state
  *      per window is one partition's rows, never the corpus.
  *
  * The result is byte-identical to the global window (prefix sums don't
  * depend on where partition boundaries fall), which is exactly what the
  * DuckDB oracle checks.
  */
object Packing {

  /** Adds `cum_w` (inclusive running sum of `weight` in `key` order) and
    * `shard` = floor((cum_w - w) / budget) — i.e. a document lands in the
    * shard where it STARTS, so every shard's content begins within
    * budget. Output keeps one row per input row. */
  def assignShards(df: DataFrame, key: String, weight: String, budget: Long,
      numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, col(key))
      .withColumn("_pid", spark_partition_id())
    // Phase 1+2: per-partition totals (P rows) -> driver prefix sum.
    // Collecting P rows is not a driver-side data materialization: P is
    // the partition count, invariant of row count.
    val totals = ranged.groupBy(col("_pid"))
      .agg(sum(col(weight)).as("_psum"), min(col(key)).as("_lo"))
      .orderBy(col("_lo"))
      .select(col("_pid"), col("_psum"))
      .collect()
    var acc = 0L
    val offsets = totals.map { r =>
      val off = acc
      acc += r.getLong(1)
      (r.getInt(0), off)
    }.toSeq
    val offsetDf = df.sparkSession.createDataFrame(offsets).toDF("_pid", "_offset")
    // Phase 3: local running sum per partition + broadcast offset.
    val w = Window.partitionBy(col("_pid")).orderBy(col(key))
    ranged.join(broadcast(offsetDf), Seq("_pid"))
      .withColumn("cum_w", sum(col(weight)).over(w) + col("_offset"))
      .withColumn("shard", floor((col("cum_w") - col(weight)) / lit(budget)))
      .drop("_pid", "_offset")
  }
}
