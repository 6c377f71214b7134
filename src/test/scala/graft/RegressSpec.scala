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

  private def spearmanRow(rows: Seq[(Long, Long)]): org.apache.spark.sql.Row = {
    import spark.implicits._
    graft.ops.Regress.spearman(rows.toDF("x", "y"), "x", "y").head()
  }

  test("spearman: ±1 on monotone data (any monotone transform), exact rank invariant") {
    // y = x² is nonlinear but monotone → Spearman exactly 1
    val up = spearmanRow((1L to 9L).map(x => (x, x * x)))
    assert(up.getLong(6) == 1000000L && up.getLong(0) == 9L)
    // Σrank2 = n(n+1) on both axes
    assert(up.getLong(1) == 9L * 10L && up.getLong(2) == 9L * 10L)
    val down = spearmanRow((1L to 9L).map(x => (x, -3L * x)))
    assert(down.getLong(6) == -1000000L)
  }

  test("spearman: average tie ranks (half-rank integers), hand case") {
    // x = [1,2,2,3] → avg ranks 1, 2.5, 2.5, 4 → rank2 2,5,5,8;
    // y ties identically → r = 1 exactly even through the tie mass
    val r = spearmanRow(Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 30L)))
    assert(r.getLong(1) == 20L && r.getLong(6) == 1000000L)
    // hand-check the tie-corrected moments: rank2 = [2,5,5,8] →
    // d1 = n·Σa²−(Σa)² = 4·118−400 = 72
    assert(r.getLong(4) == 72L && r.getLong(5) == 72L)
  }

  test("spearman: NULL on a constant margin; partition-invariant") {
    import spark.implicits._
    val const = spearmanRow(Seq((5L, 1L), (5L, 2L), (5L, 3L)))
    assert(const.isNullAt(6) && const.getLong(4) == 0L)
    val rng = new scala.util.Random(13)
    val data = Seq.fill(200)((rng.nextInt(20).toLong, rng.nextInt(500).toLong))
    val a = graft.ops.Regress.spearman(data.toDF("x", "y").repartition(1), "x", "y").head()
    val b = graft.ops.Regress.spearman(data.toDF("x", "y").repartition(7), "x", "y").head()
    assert(a == b)
  }

  test("pearsonR2: exact endpoints and the documented two-step truncation") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long)]) =
      graft.ops.Regress.pearsonR2(rows.toDF("x", "y"), col("x"), col("y"))
        .as[(Long, Long, Long)].head()
    // perfect linear y = 2x: num² == d1·d2 exactly → r² = 1e6 EXACTLY
    assert(run(Seq((1L, 2L), (2L, 4L), (3L, 6L))) == ((3L, 1L, 1000000L)))
    // perfect anti-correlation: sign −1, r² still exactly 1e6
    assert(run(Seq((1L, -2L), (2L, -4L), (3L, -6L))) == ((3L, -1L, 1000000L)))
    // constant column: degenerate variance pins (sign 0, r² 0)
    assert(run(Seq((1L, 5L), (2L, 5L), (3L, 5L))) == ((3L, 0L, 0L)))
    // hand case x=[1,2,3], y=[1,2,4]: num=9, d1=6, d2=14 → two-step
    // trunc: (81 div 14)·1e6 div 6 = 5e6 div 6 = 833333 (the DOCUMENTED
    // composition — true r²≈0.9643e6; tiny-n truncation is the price
    // of exactness and the oracle replays the identical steps)
    assert(run(Seq((1L, 1L), (2L, 2L), (3L, 4L))) == ((3L, 1L, 833333L)))
    // partition invariance on a random frame
    val rng = new scala.util.Random(3)
    val data = Seq.fill(500)((rng.nextInt(100).toLong, rng.nextInt(100).toLong))
    val r1 = graft.ops.Regress.pearsonR2(
      data.toDF("x", "y").repartition(1), col("x"), col("y")).head()
    val r7 = graft.ops.Regress.pearsonR2(
      data.toDF("x", "y").repartition(7), col("x"), col("y")).head()
    assert(r1 == r7)
  }

  test("logisticGdFixedPoint: integer GD matches an independent replay " +
      "and learns the separating direction") {
    val rows = (0 until 200).map { i =>
      val x = (i % 21).toLong - 10           // feature in [-10, 10]
      val y = if (x > 0) 1L else 0L          // perfectly separable on x
      (x, y)
    }
    val df = rows.toDF("x", "y")
    val got = graft.ops.Regress.logisticGdFixedPoint(df,
        Seq(lit(1L), col("x")), col("y"), iters = 3)
      .collect().head
    // independent replay of the same arithmetic (plain Scala longs)
    var w0 = 0L; var w1 = 0L
    (0 until 3).foreach { _ =>
      var g0 = 0L; var g1 = 0L
      rows.foreach { case (x, y) =>
        val z = w0 + w1 * x
        val sm = 500000L + (z * 500000L) / (1000000L + math.abs(z))
        val r = y * 1000000L - sm
        g0 += r; g1 += r * x
      }
      w0 += g0 / (rows.length * 2L)
      w1 += g1 / (rows.length * 2L)
    }
    assert(got.getLong(0) == rows.length)
    assert(got.getLong(1) == w0, s"w0 ${got.getLong(1)} != $w0")
    assert(got.getLong(2) == w1, s"w1 ${got.getLong(2)} != $w1")
    assert(w1 > 0) // positive weight on the separating feature
  }
}
