package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops.Layout: Morton interleave correctness against a bit-loop
  * reference, order preservation per dimension, and the point of it
  * all — z-ordered files cover small bounding boxes, so a filter on
  * EITHER dimension prunes most files (a linear layout only prunes on
  * the sort column). */
class LayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def refZ2(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private def refZ3(x: Long, y: Long, z0: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((x >> i) & 1L) << (3 * i)
      z |= ((y >> i) & 1L) << (3 * i + 1)
      z |= ((z0 >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }

  test("zValue2/zValue3 match the bit-loop reference (boundaries + pseudorandom)") {
    val edge = Seq(0L, 1L, 2L, 255L, 256L, 65535L, 65536L, 0xFFFFFFFFL)
    val rnd = (1 to 200).map(i => math.abs(i * 2654435761L) % 0xFFFFFFFFL)
    val xs = (edge ++ rnd).zipWithIndex.map { case (v, i) =>
      (v, (edge ++ rnd)((i + 7) % (edge.size + rnd.size)))
    }
    val out = xs.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.ops.Layout.zValue2(col("x"), col("y")).as("z2"),
        graft.ops.Layout.zValue3(col("x").bitwiseAND(lit(0x1FFFFFL)),
          col("y").bitwiseAND(lit(0x1FFFFFL)), lit(777L)).as("z3"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == refZ2(r.getLong(0), r.getLong(1)))
      assert(r.getLong(3) == refZ3(r.getLong(0) & 0x1FFFFF, r.getLong(1) & 0x1FFFFF, 777L))
    }
  }

  test("z-value is order-preserving in each dimension (other held fixed)") {
    val vals = (0L until 1024L by 7L).toSeq
    val df = vals.toDF("x")
      .select(graft.ops.Layout.zValue2(col("x"), lit(123L)).as("zx"),
        graft.ops.Layout.zValue2(lit(123L), col("x")).as("zy"))
      .collect()
    val zx = df.map(_.getLong(0)).toSeq
    val zy = df.map(_.getLong(1)).toSeq
    assert(zx == zx.sorted && zy == zy.sorted)
  }

  test("z-ordered files prune on BOTH dimensions; x-sorted files only on x") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = for { x <- 0 until 128; y <- 0 until 128 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")

    graft.ops.Layout.zOrder2(df, col("x"), col("y"), 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")

    // per-file bounding boxes; a filter y < 16 can skip files whose
    // y-min exceeds 15 (what parquet footer stats give a reader)
    def filesMatching(path: String): (Long, Long) = {
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("y")).as("ymin"), max(col("y")).as("ymax"))
      (boxes.filter(col("ymin") <= 15).count(), boxes.count())
    }
    val (zTouched, zTotal) = filesMatching(s"$dir/z")
    val (linTouched, linTotal) = filesMatching(s"$dir/linear")
    assert(zTotal >= 8 && linTotal >= 8)
    // linear-on-x: every file spans the full y range — zero pruning
    assert(linTouched == linTotal)
    // z-order: only files whose box meets y<16 — most are pruned
    assert(zTouched <= zTotal / 2)
  }
}
