package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops.Regress: exact sufficient-statistics OLS. Planted linear data
  * must come back with EXACT coefficient micros (the whole point of
  * the integer Cramer path), singular designs must yield NULL not a
  * crash or garbage, and negative rationals must truncate toward zero
  * on both engines' convention. */
class RegressSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("olsFit1 recovers a planted y = 1 + 2x exactly") {
    val df = Seq((1L, 3L), (2L, 5L), (3L, 7L), (10L, 21L)).toDF("x", "y")
    val r = graft.ops.Regress.olsFit1(df, col("y"), col("x")).collect()(0)
    assert(r.getLong(0) == 4)
    assert(r.getLong(1) == 1000000L && r.getLong(2) == 2000000L)
  }

  test("olsFit1: negative fractional slope truncates toward zero (−1/3 → −333333)") {
    val df = Seq((0L, 0L), (3L, -1L)).toDF("x", "y")
    val r = graft.ops.Regress.olsFit1(df, col("y"), col("x")).collect()(0)
    assert(r.getLong(2) == -333333L, s"got ${r.getLong(2)}")
    assert(r.getLong(1) == 0L)
  }

  test("olsFit1: constant x is singular → NULL coefficients, n still reported") {
    val df = Seq((5L, 1L), (5L, 2L), (5L, 9L)).toDF("x", "y")
    val r = graft.ops.Regress.olsFit1(df, col("y"), col("x")).collect()(0)
    assert(r.getLong(0) == 3 && r.isNullAt(1) && r.isNullAt(2))
  }

  test("olsFit2 recovers a planted y = 2 + 3·x1 − x2 exactly") {
    val pts = for (a <- 1L to 6L; b <- 0L to 2L) yield (a, b, 2L + 3 * a - b)
    val df = pts.toDF("x1", "x2", "y")
    val r = graft.ops.Regress.olsFit2(df, col("y"), col("x1"), col("x2")).collect()(0)
    assert(r.getLong(0) == 18)
    assert(r.getLong(1) == 2000000L, s"b0 ${r.getLong(1)}")
    assert(r.getLong(2) == 3000000L, s"b1 ${r.getLong(2)}")
    assert(r.getLong(3) == -1000000L, s"b2 ${r.getLong(3)}")
  }

  test("olsFit2: collinear regressors (x2 = 2·x1) are singular → NULLs") {
    val pts = (1L to 8L).map(a => (a, 2 * a, 5 * a + 1))
    val df = pts.toDF("x1", "x2", "y")
    val r = graft.ops.Regress.olsFit2(df, col("y"), col("x1"), col("x2")).collect()(0)
    assert(r.getLong(0) == 8 && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("olsFit2 is partition-order invariant") {
    val pts = (1 to 500).map(i => ((i % 37).toLong, (i % 11).toLong,
      (i % 37) * 7L - (i % 11) * 3L + (i % 5)))
    val a = graft.ops.Regress.olsFit2(pts.toDF("x1", "x2", "y").repartition(1),
      col("y"), col("x1"), col("x2")).collect()(0)
    val b = graft.ops.Regress.olsFit2(pts.reverse.toDF("x1", "x2", "y").repartition(17),
      col("y"), col("x1"), col("x2")).collect()(0)
    assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2)
      && a.getLong(3) == b.getLong(3))
  }

  test("olsFit1Grouped recovers per-group planted slopes; singular group NULLs alone") {
    val ga = (1L to 10L).map(x => ("a", x, 5 * x + 2))        // slope 5, intercept 2
    val gb = (1L to 10L).map(x => ("b", x, -3 * x + 40))      // slope −3, intercept 40
    val gc = (1L to 5L).map(_ => ("c", 7L, 9L))               // constant x → singular
    val df = (ga ++ gb ++ gc).toDF("g", "x", "y")
    val r = graft.ops.Regress.olsFit1Grouped(df, "g", col("y"), col("x"))
      .orderBy("g").collect()
    assert(r(0).getLong(2) == 2000000L && r(0).getLong(3) == 5000000L)
    assert(r(1).getLong(2) == 40000000L && r(1).getLong(3) == -3000000L)
    assert(r(2).isNullAt(2) && r(2).isNullAt(3))
  }
}
