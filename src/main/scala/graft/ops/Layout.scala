package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for scan pruning. Sorting a table by the bit-interleaved z-value of
  * two or three dimensions makes every file/row-group cover a small
  * HYPER-RECTANGLE of the key space instead of a thin slab of one
  * column, so min/max footer stats prune scans that filter on ANY of
  * the interleaved dimensions — the layout trick behind
  * `OPTIMIZE ... ZORDER BY` in lakehouse engines, built here from
  * stock expressions (shifts/masks are whole-stage-codegen'd; no UDF).
  *
  * At 100 TB the layout job is a single `repartitionByRange` on the
  * z-value (range exchange = sample + split, no global sort barrier)
  * followed by a within-partition sort at write time; reads need no
  * cooperation — pruning falls out of ordinary parquet stats.
  *
  * Inputs must be NON-NEGATIVE integers (ranks, ids, or bucketed
  * values); callers bucket raw doubles/timestamps first (e.g. via
  * `width_bucket` or epoch-day). Values are masked to the low 32 bits
  * (2 dims) / 21 bits (3 dims) so the interleave fits a long.
  */
object Layout {

  /** Spread the low 32 bits of `x` so consecutive bits land 2 apart
    * (the classic mask cascade, 64-bit form). */
  private def spread2(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
    v
  }

  /** Spread the low 21 bits of `x` so consecutive bits land 3 apart. */
  private def spread3(x: Column): Column = {
    var v = x.bitwiseAND(lit(0x1FFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 32))).bitwiseAND(lit(0x1F00000000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x1F0000FF0000FFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x100F00F00F00F00FL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x10C30C30C30C30C3L))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x1249249249249249L))
    v
  }

  /** 64-bit Morton code of two 32-bit dimensions (x gets even bits). */
  def zValue2(x: Column, y: Column): Column =
    spread2(x.cast("long")).bitwiseOR(shiftleft(spread2(y.cast("long")), 1))

  /** 63-bit Morton code of three 21-bit dimensions. */
  def zValue3(x: Column, y: Column, z: Column): Column =
    spread3(x.cast("long"))
      .bitwiseOR(shiftleft(spread3(y.cast("long")), 1))
      .bitwiseOR(shiftleft(spread3(z.cast("long")), 2))

  /** Lay `df` out in z-order across `numPartitions` output units:
    * range-exchange on the z-value (sampled split points — no global
    * sort), then sort within each partition so row groups inside a file
    * are also clustered. Drop the helper column before writing. */
  def zOrder2(df: DataFrame, x: Column, y: Column, numPartitions: Int): DataFrame = {
    df.withColumn("_z", zValue2(x, y))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
