package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Geo

class GeoSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], r: Long) =
    (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet

  private def run(pts: Seq[(Long, Long, Long)], r: Long, parts: Int = 4) =
    Geo.radiusJoin(pts.toDF("id", "x", "y").repartition(parts),
        "id", col("x"), col("y"), r)
      .as[(Long, Long, Long)].collect().toSet

  test("radiusJoin == brute force on random points, incl. negative coordinates") {
    val rng = new scala.util.Random(5)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, rng.nextLong(2000) - 1000, rng.nextLong(2000) - 1000))
    val r = 120L
    val got = run(pts, r)
    assert(got == brute(pts, r) && got.nonEmpty)
    // partition invariance
    assert(run(pts, r, parts = 1) == got)
  }

  test("radiusJoin: inclusive boundary (dist2 == r*r), each pair exactly once") {
    // (0,0) and (3,4): dist2 = 25 — exactly r² at r=5; plus a same-cell
    // pair and an out-of-range pair
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 1L, 0L), (4L, 100L, 100L))
    val got = Geo.radiusJoin(pts.toDF("id", "x", "y"), "id",
        col("x"), col("y"), 5L)
      .collect()
    // no duplicate (a, b) rows — positional de-dup, not distinct
    assert(got.length == got.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
    val set = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(set == Set((1L, 2L, 25L), (1L, 3L, 1L), (2L, 3L, 20L)))
  }

  test("cellCensus: floor cells for negatives; totals conserve") {
    val pts = Seq((-1L, -1L), (0L, 0L), (9L, 9L), (10L, 0L), (-10L, 5L))
      .toDF("x", "y")
    val got = Geo.cellCensus(pts, col("x"), col("y"), 10L)
      .as[(Long, Long, Long)].collect().toSet
    // -1 → cell -1 (floor), not 0 (truncation)
    assert(got == Set((-1L, -1L, 1L), (0L, 0L, 2L), (1L, 0L, 1L), (-1L, 0L, 1L)))
  }
}
