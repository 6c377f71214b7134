package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketch

class SketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def estimates(data: Seq[String], probes: Seq[String], d: Int,
      w: Int, parts: Int = 4): Map[String, Long] = {
    val df = data.toDF("k").repartition(parts)
    val sk = Sketch.countMin(df, "k", d, w)
    Sketch.cmsEstimate(sk, probes.toDF("k"), "k", d, w)
      .as[(String, Long)].collect().toMap
  }

  test("one-sided error: est >= true count for EVERY key, even under forced collisions") {
    val rng = new scala.util.Random(11)
    val data = Seq.fill(2000)(s"k${rng.nextInt(50)}")
    val truth = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    // width 8 << 50 keys: collisions guaranteed; the guarantee must hold anyway
    val est = estimates(data, truth.keys.toSeq, d = 4, w = 8)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"CMS undercounted $k: est=${est(k)} true=$t")
    }
    // total overcount is bounded by depth-choice: the min row is never
    // worse than the single worst row
    assert(est.values.sum >= truth.values.sum)
  }

  test("ample width: estimates exact, absent keys estimate 0") {
    val data = Seq.fill(300)("a") ++ Seq.fill(20)("b") ++ Seq("c")
    val est = estimates(data, Seq("a", "b", "c", "nope1", "nope2"), d = 4, w = 1024)
    assert(est == Map("a" -> 300L, "b" -> 20L, "c" -> 1L, "nope1" -> 0L, "nope2" -> 0L))
  }

  test("determinism + linearity: partition-invariant cells; cms(A∪B) == merge(cms(A), cms(B))") {
    val a = Seq.fill(100)("x") ++ Seq.fill(60)("y") ++ Seq.fill(7)("z")
    val b = Seq.fill(40)("y") ++ Seq.fill(13)("w")
    def cells(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long)] =
      df.select(col("r").cast("int"), col("c"), col("cnt"))
        .as[(Int, Long, Long)].collect().toSet
    val whole = cells(Sketch.countMin((a ++ b).toDF("k").repartition(7), "k", 3, 64))
    val merged = cells(Sketch.cmsMerge(
      Sketch.countMin(a.toDF("k").repartition(2), "k", 3, 64),
      Sketch.countMin(b.toDF("k").repartition(5), "k", 3, 64)))
    assert(whole == merged && whole.nonEmpty)
    // partition invariance of the build itself
    val p1 = cells(Sketch.countMin((a ++ b).toDF("k").repartition(1), "k", 3, 64))
    assert(p1 == whole)
  }

  test("weighted build: counts scale by the weight column") {
    val df = Seq(("a", 5L), ("a", 2L), ("b", 10L)).toDF("k", "wt")
    val sk = Sketch.countMin(df, "k", 4, 256, weight = col("wt"))
    val est = Sketch.cmsEstimate(sk, Seq("a", "b").toDF("k"), "k", 4, 256)
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 7L, "b" -> 10L))
  }

  test("sketch size is capped at d*w cells regardless of input") {
    val data = (0 until 5000).map(i => s"key$i")
    val n = Sketch.countMin(data.toDF("k"), "k", 4, 32).count()
    assert(n <= 4L * 32L)
  }
}
