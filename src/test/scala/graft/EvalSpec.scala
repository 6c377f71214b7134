package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops.Eval: the classifier-evaluation family. Hand-computed AUC
  * including tie handling (the average-rank identity is the part a
  * subtle bug would corrupt silently), degenerate single-class inputs,
  * PR-curve confusion-count arithmetic at every threshold, and
  * calibration-bin clamping. */
class EvalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (label, score): scores 1,2,2,3 with labels 0,0,1,1.
  // Ascending ranks: 1→1; the two 2s tie at avg rank 2.5; 3→4.
  // R+ = 2.5 + 4 = 6.5, n+=2, n-=2
  // AUC = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
  test("rocAuc: hand-computed with ties") {
    val df = Seq((false, 1L), (false, 2L), (true, 2L), (true, 3L))
      .toDF("y", "s")
    val r = graft.ops.Eval.rocAuc(df, col("y"), col("s")).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getLong(2) == 875000L)
  }

  test("rocAuc: perfect separation = 1.0, reversed = 0.0, all-tied = 0.5") {
    val perfect = Seq((false, 1L), (false, 2L), (true, 3L), (true, 4L)).toDF("y", "s")
    assert(graft.ops.Eval.rocAuc(perfect, col("y"), col("s"))
      .collect()(0).getLong(2) == 1000000L)
    val reversed = Seq((true, 1L), (true, 2L), (false, 3L), (false, 4L)).toDF("y", "s")
    assert(graft.ops.Eval.rocAuc(reversed, col("y"), col("s"))
      .collect()(0).getLong(2) == 0L)
    val tied = Seq((true, 7L), (false, 7L), (true, 7L), (false, 7L)).toDF("y", "s")
    assert(graft.ops.Eval.rocAuc(tied, col("y"), col("s"))
      .collect()(0).getLong(2) == 500000L)
  }

  test("rocAuc: single-class input yields NULL auc, not a fake 0/1") {
    val allPos = Seq((true, 1L), (true, 2L)).toDF("y", "s")
    val r = graft.ops.Eval.rocAuc(allPos, col("y"), col("s")).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 0 && r.isNullAt(2))
  }

  test("prCurve: confusion counts at every distinct threshold") {
    // scores desc: 3(+), 2(+), 2(-), 1(-)
    val df = Seq((false, 1L), (false, 2L), (true, 2L), (true, 3L)).toDF("y", "s")
    val rows = graft.ops.Eval.prCurve(df, col("y"), col("s"))
      .orderBy(col("score").desc).collect()
    // threshold ≥3: tp=1 fp=0 fn=1 ; ≥2: tp=2 fp=1 fn=0 ; ≥1: tp=2 fp=2 fn=0
    val expect = Seq((3L, 1L, 0L, 1L, 1000000L, 500000L),
      (2L, 2L, 1L, 0L, 666666L, 1000000L),
      (1L, 2L, 2L, 0L, 500000L, 1000000L))
    assert(rows.length == 3)
    rows.zip(expect).foreach { case (r, (s, tp, fp, fn, pm, rm)) =>
      assert(r.getLong(0) == s && r.getLong(1) == tp && r.getLong(2) == fp
        && r.getLong(3) == fn, s"threshold $s counts")
      assert(r.getLong(4) == pm && r.getLong(5) == rm, s"threshold $s micros")
    }
  }

  test("calibrationBins: clamping, exact counts, floor rates") {
    // width 10, 3 bins: scores −5 → bin 0, 35 and 99 → bin 2 (clamped)
    val df = Seq((true, -5L), (false, 4L), (true, 15L), (false, 35L), (true, 99L))
      .toDF("y", "s")
    val rows = graft.ops.Eval.calibrationBins(df, col("y"), col("s"), 10L, 3)
      .orderBy("bin").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val bin0 = rows(0) // scores −5, 4: n=2, pos=1, sum=−1
    assert(bin0.getLong(1) == 2 && bin0.getLong(2) == 1 && bin0.getLong(3) == -1)
    assert(bin0.getLong(4) == 500000L)
    val bin2 = rows(2) // scores 35, 99: n=2, pos=1, sum=134, mean floor 67
    assert(bin2.getLong(1) == 2 && bin2.getLong(2) == 1 && bin2.getLong(3) == 134)
    assert(bin2.getLong(5) == 67L)
  }

  test("rocAuc is partition-order invariant (hash stability at scale)") {
    val base = (1 to 400).map(i => (i % 3 == 0, (i * 7 % 50).toLong))
    val a = graft.ops.Eval.rocAuc(base.toDF("y", "s").repartition(1), col("y"), col("s")).collect()(0)
    val b = graft.ops.Eval.rocAuc(base.reverse.toDF("y", "s").repartition(13), col("y"), col("s")).collect()(0)
    assert(a.getLong(2) == b.getLong(2) && a.getLong(0) == b.getLong(0))
  }

  test("chiSquareTerms: hand-computed 2x2 (perfect association chi2 = n)") {
    // 4 docs: "apple" in exactly the 2 positives -> a=2 b=0 c=0 d=2
    // chi2 = 4*(2*2-0)^2 / (2*2*2*2) = 64/16 = 4.0
    val df = Seq((true, "apple pie"), (true, "apple tart"),
      (false, "banana bread"), (false, "banana split")).toDF("y", "txt")
    val r = graft.ops.Eval.chiSquareTerms(df, col("y"),
      split(col("txt"), " "), minDf = 1L).orderBy("term").collect()
    val apple = r.find(_.getString(0) == "apple").get
    assert(apple.getLong(1) == 2 && apple.getLong(2) == 2)
    assert(apple.getLong(3) == 4000000L)
    // "pie" appears once in a positive: a=1 b=0 c=1 d=2
    // chi2 = 4*(1*2-0*1)^2/(1*3*2*2) = 16/12 = 1.333333
    val pie = r.find(_.getString(0) == "pie").get
    assert(pie.getLong(3) == 1333333L)
  }

  test("chiSquareTerms: a term in every doc is degenerate -> NULL chi2") {
    val df = Seq((true, "common a"), (false, "common b")).toDF("y", "txt")
    val r = graft.ops.Eval.chiSquareTerms(df, col("y"),
      split(col("txt"), " "), minDf = 1L).collect()
    val c = r.find(_.getString(0) == "common").get
    assert(c.isNullAt(3))
  }

  test("categoricalDiversity: exact Gini rationals, quantized entropy, degenerate group") {
    import spark.implicits._
    def term(c: Long, n: Long): Long = {
      val p = c.toDouble / n.toDouble
      math.floor(-1000000.0 * p * math.log(p)).toLong
    }
    val rows = Seq.fill(2)("g1" -> "a") ++ Seq.fill(2)("g1" -> "b") ++
      Seq.fill(2)("g1" -> "c") ++ Seq.fill(2)("g1" -> "d") ++ // uniform k=4
      Seq.fill(3)("g2" -> "a") ++ Seq("g2" -> "b") ++         // skewed 3:1
      Seq.fill(5)("g3" -> "only")                             // single category
    val got = graft.ops.Eval.categoricalDiversity(
        rows.toDF("g", "cat").repartition(5), "g", "cat")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // g1: gini = 1e6·(64−4·4) div 64 = 750000 exact; entropy = 4 equal terms
    assert(got("g1") == ((8L, 4L, 4 * term(2, 8), 750000L)))
    // uniform entropy ≈ ln(4)·1e6, off by < k micros from per-term floors
    assert(math.abs(got("g1")._3 - (math.log(4.0) * 1e6).round) < 4)
    // g2: gini = 1e6·(16−10) div 16 = 375000 exact
    assert(got("g2") == ((4L, 2L, term(3, 4) + term(1, 4), 375000L)))
    // g3: single category ⇒ both exactly zero
    assert(got("g3") == ((5L, 1L, 0L, 0L)))
  }

  test("twoProportionTest: textbook decision both ways, empty cohort, rates") {
    // Strong effect: 80/100 vs 40/100 → z² ≈ 32.9 >> 3.84 → reject.
    // Null effect: 50/100 vs 52/100 → z² ≈ 0.08 → keep.
    def rows(tag: String, xa: Int, xb: Int): Seq[(String, Boolean, Boolean)] =
      (0 until 100).map(i => (tag, true, i < xa)) ++
        (0 until 100).map(i => (tag, false, i < xb))
    val df = (rows("strong", 80, 40) ++ rows("null", 50, 52))
      .toDF("g", "a", "s")
    val got = graft.ops.Eval.twoProportionTest(df, Seq("g"), col("a"), col("s"))
      .select("g", "n_a", "x_a", "p_a_micro", "p_b_micro", "significant")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(got("strong") == (("strong", 100L, 80L, 800000L, 400000L, true)))
    assert(got("null") == (("null", 100L, 50L, 500000L, 520000L, false)))
    // one empty cohort can never be significant (and must not crash)
    val solo = Seq(("g", true, true), ("g", true, false)).toDF("g", "a", "s")
    val r = graft.ops.Eval.twoProportionTest(solo, Seq("g"), col("a"), col("s"))
      .select("n_b", "significant").as[(Long, Boolean)].head()
    assert(r == ((0L, false)))
  }

  test("twoProportionTest: statistic exactly ON the threshold keeps (strict >)") {
    // Construct equality: with n1=n2=m, x1=x, x2=0: z² = x·2m/(... )
    // Easier to certify strictness directly: zCritMicro set EXACTLY to
    // the statistic's value → not significant; one micro below → flips.
    // 10/20 vs 0/20: diff=10·20=200, n=40, x=10, n−x=30:
    // z²·1e6 = 1e6·200²·40 / (20·20·10·30) = 1 600 000 000 000/120 000
    // = 13 333 333.33… → with integer cross-multiply, LHS=1.6e12,
    // RHS(c) = c·120000. c=13333333 → RHS=1.59999996e12 < LHS: reject.
    // c=13333334 → RHS=1.60000008e12 > LHS: keep.
    val df = ((0 until 20).map(i => (true, i < 10)) ++
      (0 until 20).map(_ => (false, false))).map { case (a, s) => ("g", a, s) }
      .toDF("g", "a", "s")
    def sig(c: Long) = graft.ops.Eval
      .twoProportionTest(df, Seq("g"), col("a"), col("s"), zCritMicro = c)
      .select("significant").as[Boolean].head()
    assert(sig(13333333L) && !sig(13333334L))
  }
}
