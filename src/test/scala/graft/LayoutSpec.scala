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

  private def refHilbert(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertIndexed2 matches the bit-loop reference (boundaries + pseudorandom)") {
    val edge = Seq(0L, 1L, 255L, 256L, 65535L)
    val rnd = (1 to 150).map(i => math.abs(i * 2654435761L) % 65536L)
    val pts = (edge ++ rnd).zip((edge ++ rnd).reverse).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
    val df = pts.toDF("id", "x", "y")
    val got = graft.ops.Layout.hilbertIndexed2(df, col("x"), col("y"), "h", bits = 16)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    pts.foreach { case (i, x, y) =>
      assert(got(i) == refHilbert(x, y, 16), s"($x,$y)")
    }
  }

  test("hilbert is a bijection on the 8x8 grid AND consecutive codes are grid-adjacent") {
    // the property that makes Hilbert better than Morton for layout:
    // walking the curve never jumps — every consecutive pair of codes
    // is one grid step apart (Z-order violates this at every
    // power-of-two boundary)
    val pts = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val df = pts.toDF("x", "y")
    val rows = graft.ops.Layout.hilbertIndexed2(df, col("x"), col("y"), "h", bits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).toSet == (0L until 64L).toSet, "bijective onto 0..63")
    val walk = rows.sortBy(_._3)
    walk.sliding(2).foreach { case Array((x1, y1, d1), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d1: ($x1,$y1)->($x2,$y2)")
    }
    // contrast: the Z-curve DOES jump (documents why this op exists)
    val zWalk = pts.map { case (x, y) => (x, y) }
      .sortBy { case (x, y) =>
        // inline 3-bit morton
        (0 until 3).map(b => (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))).sum
      }
    val zJumps = zWalk.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "morton walk should jump somewhere on 8x8")
  }

  test("zoneMap + pruneRange: boundary inclusivity, NULL-only files, nulls in stats") {
    import spark.implicits._
    // file 0: values 5..9 (f_max == lo boundary); file 1: 20..24 (left
    // of nothing — inside range); file 2: 40..44 (right of hi);
    // file 3: all NULL; file 4: NULL mixed with in-range 21
    val rows: Seq[(Long, Option[Long])] =
      (5L to 9L).map(v => (0L, Some(v))) ++
      (20L to 24L).map(v => (1L, Some(v))) ++
      (40L to 44L).map(v => (2L, Some(v))) ++
      Seq((3L, None), (3L, None), (4L, None), (4L, Some(21L)))
    val stats = graft.ops.Layout.pruneRange(
      graft.ops.Layout.zoneMap(rows.toDF("f", "v"), col("f"), col("v")),
      lit(9L), lit(30L))
    val got = stats.select("file_id", "n_rows", "n_nulls", "pruned")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(0L) == ((5L, 0L, false)), "f_max == lo must NOT prune (BETWEEN is inclusive)")
    assert(got(1L) == ((5L, 0L, false)))
    assert(got(2L) == ((5L, 0L, true)), "fully right of hi prunes")
    assert(got(3L) == ((2L, 2L, true)), "NULL-only file prunes for any range")
    assert(got(4L) == ((2L, 1L, false)), "mixed file with an in-range value must scan")
  }

  test("encodingAdvisor: cost model by hand — rle/dict/plain each win somewhere") {
    import spark.implicits._
    // file 0: 100 values in 2 long runs (sorted) → rle wins
    //   (runs = 2 → rle = 10; dict = 2 + ceil(100·1/8) = 15; plain 100)
    // file 1: 100 values over 4 distinct, alternating → dict wins
    //   (runs = 100 → rle = 500; dict = 4 + ceil(100·2/8) = 29; plain 100)
    // file 2: 8 values all distinct → plain wins
    //   (dict = 8 + ceil(8·3/8) = 11; rle = 8·5 = 40; plain 8)
    val rows =
      (0 until 50).map(i => (0L, "a", i)) ++
      (0 until 50).map(i => (0L, "b", 50 + i)) ++
      (0 until 100).map(i => (1L, s"v${i % 4}", i)) ++
      (0 until 8).map(i => (2L, s"u$i", i))
    val got = graft.ops.Layout.encodingAdvisor(
        rows.toDF("f", "v", "pos"), col("f"), col("v"),
        Seq(col("pos")), plainBytes = 1)
      .select("file_id", "n_runs", "est_plain", "est_dict", "est_rle",
        "best_encoding")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    assert(got(0L) == ((0L, 2L, 100L, 15L, 10L, "rle")))
    assert(got(1L) == ((1L, 100L, 100L, 29L, 500L, "dict")))
    assert(got(2L) == ((2L, 8L, 8L, 11L, 40L, "plain")))
    // single-distinct file: bits floor at 1, runs = 1
    val one = graft.ops.Layout.encodingAdvisor(
        (0 until 16).map(i => (9L, "x", i)).toDF("f", "v", "pos"),
        col("f"), col("v"), Seq(col("pos")), plainBytes = 1)
      .select("n_distinct", "n_runs", "est_dict", "best_encoding")
      .as[(Long, Long, Long, String)].head()
    // dict = 1 + ceil(16·1/8) = 3 beats rle = 1·5 = 5 and plain = 16
    assert(one == ((1L, 1L, 3L, "dict")))
  }
}
