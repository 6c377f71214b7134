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

  // ---------------------------------------------------------------- KMV

  /** Reference KMV: k smallest distinct xxhash64 values, via the full
    * distinct set (the thing the aggregator must equal without ever
    * materializing it). */
  private def refKmv(df: org.apache.spark.sql.DataFrame, group: String,
      elem: String, k: Int): Map[String, Seq[Long]] =
    df.select(col(group), xxhash64(col(elem)).as("h")).distinct()
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, xs) => (g, xs.map(_._2).distinct.sorted.take(k).toSeq) }

  test("kmv equals the k smallest distinct hashes, partition-invariant, dups free") {
    val rng = new scala.util.Random(7)
    // heavy duplication: 3000 rows over ~120 distinct elems in 2 groups
    val rows = Seq.fill(3000)((if (rng.nextBoolean()) "g1" else "g2",
      s"e${rng.nextInt(120)}"))
    val df = rows.toDF("g", "e")
    val expect = refKmv(df, "g", "e", 32)
    for (parts <- Seq(1, 7)) {
      val got = Sketch.kmv(df.repartition(parts), "g", col("e"), 32)
        .as[(String, Seq[Long])].collect().toMap
      assert(got == expect)
      got.values.foreach(v => assert(v == v.distinct.sorted && v.size <= 32))
    }
  }

  test("kmv mergeability: kmv(A ∪ B) == kmvMerge(kmv(A) ++ kmv(B)) exactly") {
    val a = (0 until 400).map(i => ("g", s"a$i"))
    val b = (200 until 700).map(i => ("g", if (i < 400) s"a$i" else s"b$i"))
    val whole = Sketch.kmv((a ++ b).toDF("g", "e"), "g", col("e"), 64)
      .as[(String, Seq[Long])].collect().toMap
    val merged = Sketch.kmvMerge(
      Sketch.kmv(a.toDF("g", "e"), "g", col("e"), 64)
        .unionByName(Sketch.kmv(b.toDF("g", "e"), "g", col("e"), 64)),
      "g", 64).as[(String, Seq[Long])].collect().toMap
    assert(whole == merged && whole("g").size == 64)
  }

  test("kmv estimate: exact below k, within 3/sqrt(k) relative above") {
    val small = (0 until 40).map(i => ("s", s"x$i")).toDF("g", "e")
    val exactEst = Sketch.kmv(small, "g", col("e"), 256)
      .select(Sketch.kmvEstimate(col("kh"), 256)).as[Double].head()
    assert(exactEst == 40.0)
    val big = (0 until 20000).map(i => ("b", s"y$i")).toDF("g", "e")
    val est = Sketch.kmv(big, "g", col("e"), 256)
      .select(Sketch.kmvEstimate(col("kh"), 256)).as[Double].head()
    assert(math.abs(est - 20000.0) / 20000.0 <= 3.0 / math.sqrt(256.0),
      s"est=$est")
  }

  test("kmv set ops: J/∩/∪ estimates near truth on planted 50% overlap") {
    // A = 0..5999, B = 3000..8999 → |∩|=3000, |∪|=9000, J=1/3
    val a = (0 until 6000).map(i => ("p", s"e$i")).toDF("g", "e")
    val b = (3000 until 9000).map(i => ("p", s"e$i")).toDF("g", "e")
    val pairs = Sketch.kmv(a, "g", col("e"), 256).withColumnRenamed("kh", "ka")
      .join(Sketch.kmv(b, "g", col("e"), 256).withColumnRenamed("kh", "kb"), "g")
    val r = Sketch.kmvSetOps(pairs, "ka", "kb", 256)
      .select(col("j_est"), col("union_est"), col("inter_est"))
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - 1.0 / 3.0) <= 0.1, s"j_est=${r._1}")
    assert(math.abs(r._2 - 9000.0) / 9000.0 <= 0.2, s"union_est=${r._2}")
    assert(math.abs(r._3 - 3000.0) / 3000.0 <= 0.3, s"inter_est=${r._3}")
  }

  test("kmv set ops: disjoint sets estimate J = 0 exactly") {
    val a = (0 until 3000).map(i => ("p", s"L$i")).toDF("g", "e")
    val b = (0 until 3000).map(i => ("p", s"R$i")).toDF("g", "e")
    val pairs = Sketch.kmv(a, "g", col("e"), 128).withColumnRenamed("kh", "ka")
      .join(Sketch.kmv(b, "g", col("e"), 128).withColumnRenamed("kh", "kb"), "g")
    val r = Sketch.kmvSetOps(pairs, "ka", "kb", 128)
      .select(col("j_est"), col("inter_est")).as[(Double, Double)].head()
    assert(r._1 == 0.0 && r._2 == 0.0)
  }

  test("amsSketch: partition-invariant cells; signed linearity under cell-wise sum") {
    val rng = new scala.util.Random(7)
    val data = Seq.tabulate(3000)(i => (s"k${rng.nextInt(80)}", i.toLong))
    val df = data.toDF("k", "i")
    val full = Sketch.amsSketch(df.repartition(7), "k", 5, 64)
      .select(col("r"), col("c"), col("cell"))
      .as[(Int, Long, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    val full1 = Sketch.amsSketch(df.repartition(1), "k", 5, 64)
      .select(col("r"), col("c"), col("cell"))
      .as[(Int, Long, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    assert(full == full1, "cells must be partition-invariant")
    // linearity: sketch(A) + sketch(B) == sketch(A ∪ B), cell-wise —
    // signed counters ADD (Count-Min's min-estimate has no analog)
    val a = Sketch.amsSketch(df.filter(col("i") % 2 === 0), "k", 5, 64)
      .select(col("r"), col("c"), col("cell"))
      .as[(Int, Long, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    val b = Sketch.amsSketch(df.filter(col("i") % 2 === 1), "k", 5, 64)
      .select(col("r"), col("c"), col("cell"))
      .as[(Int, Long, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged.filter(_._2 != 0L) == full.filter(_._2 != 0L))
  }

  test("cmsJoinSizeEstimate: exact at ample width, 0 for disjoint keys, one-sided under collisions") {
    val a = Seq("x", "x", "x", "y", "z").toDF("k")
    val b = Seq("x", "y", "y", "w").toDF("k")
    // exact inner product: x 3·1 + y 1·2 = 5
    def est(bdf: org.apache.spark.sql.DataFrame, w: Int) =
      Sketch.cmsJoinSizeEstimate(
        Sketch.countMin(a, "k", 5, w), Sketch.countMin(bdf, "k", 5, w), 5)
        .as[Long].head()
    assert(est(b, 4096) == 5L, "ample width: no collisions, est exact")
    val disjoint = Seq("p", "q").toDF("k")
    assert(est(disjoint, 4096) == 0L,
      "disjoint keys: inner product 0 (row anchoring, not missing-row min)")
    // forced collisions (width 2): estimate may only move UP
    assert(est(b, 2) >= 5L)
  }

  test("amsF2Estimate: within 30% of exact F2 on a fixed skewed stream; even depth rejected") {
    // zipf-ish: key j appears ~1000/j times — heavy skew is where F2
    // matters (self-join size dominated by the head)
    val data = (1 to 40).flatMap(j => Seq.fill(1000 / j)(s"k$j"))
    val exact = data.groupBy(identity).map { case (_, v) =>
      v.size.toLong * v.size }.sum
    val est = Sketch.amsF2Estimate(
        Sketch.amsSketch(data.toDF("k"), "k", 5, 256), 5)
      .as[Long].head()
    assert(math.abs(est - exact) * 100 <= exact * 30,
      s"est $est vs exact $exact")
    intercept[IllegalArgumentException] {
      Sketch.amsF2Estimate(Sketch.amsSketch(data.toDF("k"), "k", 4, 64), 4)
    }
  }

  test("misra-gries: heavy keys always survive with in-bound estimates; " +
      "ample k is exact; guarantees hold under repartitioning") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // 1000 total: key 1 ×400, key 2 ×300, tail 100 distinct keys ×3
    val rows = Seq.fill(400)(1L) ++ Seq.fill(300)(2L) ++
      (10L until 110L).flatMap(k => Seq(k, k, k))
    val df = rows.toDF("k")
    val n = rows.size
    def check(frame: org.apache.spark.sql.DataFrame, k: Int): Unit = {
      val got = Sketch.misraGries(frame, col("k"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // every key with c > n/(k+1) present, estimate within [c−n/(k+1), c]
      exact.foreach { case (key, c) =>
        if (c * (k + 1) > n) {
          assert(got.contains(key), s"heavy key $key missing (k=$k)")
        }
      }
      got.foreach { case (key, est) =>
        val c = exact(key)
        assert(est <= c && (c - est) * (k + 1) <= n,
          s"estimate $est for $key out of [${c - n / (k + 1)}, $c]")
      }
    }
    check(df, 4)
    check(df.repartition(7), 4)   // merge path, different layout
    check(df.repartition(1), 4)   // single-partition pure-reduce path
    // ample k: every count exact
    val all = Sketch.misraGries(df, col("k"), 200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all(1L) == 400L && all(2L) == 300L && all(10L) == 3L)
    assert(all.size == 102)
  }
}
