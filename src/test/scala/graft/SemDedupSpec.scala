package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops.Similarity.semDedup: planted geometry — within-cluster near-dups
  * must drop (keeping the smallest id), cross-cluster near-dups must
  * SURVIVE (the documented granularity trade), and the verdict must not
  * depend on partitioning. */
class SemDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // two orthogonal cluster directions in 4-d
  private val e1 = Seq(1f, 0f, 0f, 0f)
  private val e2 = Seq(0f, 1f, 0f, 0f)

  private def mix(a: Seq[Float], b: Seq[Float], t: Float): Seq[Float] =
    a.zip(b).map { case (x, y) => x * (1 - t) + y * t }

  test("within-cluster near-dups drop (smallest id kept); distinct directions survive") {
    val vecs = Seq(
      (10L, e1),                    // cluster e1 — survivor (smallest id)
      (11L, mix(e1, e2, 0.05f)),    // ~e1, cos≈0.999 → dropped
      (12L, mix(e1, e2, 0.08f)),    // ~e1 → dropped
      (20L, e2),                    // cluster e2 — survivor
      (21L, mix(e2, e1, 0.06f)),    // ~e2 → dropped
      (30L, Seq(0f, 0f, 1f, 0f))    // assigned somewhere, similar to nothing → kept
    ).toDF("vid", "emb")
    val cents = Seq((0L, e1), (1L, e2)).toDF("cid", "cemb")
    val r = graft.ops.Similarity.semDedup(vecs, "vid", "emb", cents, "cid", "cemb", 0.95)
      .orderBy("vid").collect()
    val kept = r.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept == Set(10L, 20L, 30L), s"kept $kept")
    // assignment sanity: the e1-ish vectors landed in centroid 0
    val byId = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(byId(10L) == 0L && byId(11L) == 0L && byId(12L) == 0L)
    assert(byId(20L) == 1L && byId(21L) == 1L)
  }

  test("cross-cluster near-dups are NOT dropped — the granularity trade, pinned") {
    // two nearly identical vectors placed on opposite sides of the
    // decision boundary between e1 and e2: same direction, different
    // clusters, so semDedup must keep both (a global exact pass —
    // exactNearDupPairs — is the op that would catch them).
    val vecs = Seq(
      (1L, mix(e1, e2, 0.49f)),  // argmax → e1 side
      (2L, mix(e1, e2, 0.51f))   // argmax → e2 side; cos(1,2) ≈ 0.999
    ).toDF("vid", "emb")
    val cents = Seq((0L, e1), (1L, e2)).toDF("cid", "cemb")
    val r = graft.ops.Similarity.semDedup(vecs, "vid", "emb", cents, "cid", "cemb", 0.9)
      .orderBy("vid").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 1L), "boundary split as planted")
    assert(r.forall(_.getBoolean(2)), "both kept despite near-identity")
  }

  test("verdicts are partition-order invariant") {
    val vecs = (1 to 120).map { i =>
      val t = (i % 7).toFloat / 10f
      (i.toLong, mix(e1, e2, t))
    }
    val cents = Seq((0L, e1), (1L, e2)).toDF("cid", "cemb")
    val r1 = graft.ops.Similarity.semDedup(vecs.toDF("vid", "emb").repartition(1),
      "vid", "emb", cents, "cid", "cemb", 0.98).orderBy("vid").collect().toSeq
    val r2 = graft.ops.Similarity.semDedup(vecs.reverse.toDF("vid", "emb").repartition(13),
      "vid", "emb", cents, "cid", "cemb", 0.98).orderBy("vid").collect().toSeq
    assert(r1 == r2)
  }

  test("sparseRandomProjection matches a reference loop and preserves distance ordering") {
    def sign(i: Int, j: Int): Double = (((i * 7) + (j * 13)) % 6) match {
      case 0 => 1.0; case 1 => -1.0; case _ => 0.0
    }
    val dim = 32; val outDim = 8
    // hash-mixed components: a low-period formula here aliases with the
    // projection's mod-6 sign pattern and collapses the JL correlation
    def mix(v: Int, i: Int): Float = {
      var h = v * 2654435761L + i * 0x9E3779B97F4A7C15L
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      ((h % 1000 + 1000) % 1000).toFloat / 250f - 2f
    }
    val vecs = (0 until 40).map { v =>
      (v.toLong, (0 until dim).map(i => mix(v, i)))
    }
    val df = vecs.toDF("vid", "emb")
    val got = graft.ops.Similarity.sparseRandomProjection(df, "vid", "emb", outDim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // reference projection
    val ref = vecs.map { case (v, e) =>
      v -> (0 until outDim).map(j =>
        e.indices.map(i => e(i).toDouble * sign(i, j)).sum)
    }.toMap
    vecs.foreach { case (v, _) =>
      (0 until outDim).foreach { j =>
        val r = BigDecimal(ref(v)(j)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got((v, j.toLong)) - r) < 1e-9, s"vec $v comp $j")
      }
    }
    // JL sanity: squared distances before/after correlate strongly
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val pairs = for (a <- 0 until 40; b <- a + 1 until 40 if (a + b) % 7 == 0) yield (a, b)
    val orig = pairs.map { case (a, b) =>
      d2(vecs(a)._2.map(_.toDouble), vecs(b)._2.map(_.toDouble)) }
    val proj = pairs.map { case (a, b) =>
      d2((0 until outDim).map(j => got((a.toLong, j.toLong))),
         (0 until outDim).map(j => got((b.toLong, j.toLong)))) }
    // the JL statement is per-pair: E[proj d²]·3/outDim = orig d²
    // (entry variance 1/3), each pair within (1±ε) w.h.p. — for iid
    // test vectors all ORIGINAL distances concentrate near one value,
    // so a correlation test is meaningless; assert the calibrated
    // ratio instead
    val ratios = orig.zip(proj).map { case (o, p) => p * 3.0 / outDim / o }
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.size / 2)
    assert(median > 0.5 && median < 2.0, s"median d² ratio off: $median")
    assert(ratios.forall(r => r > 0.05 && r < 6.0),
      s"some pair's distance collapsed/exploded: ${ratios.min} .. ${ratios.max}")
  }

  test("SparseProjectF kernel is bit-equal to the interpreted HOF fold") {
    val vecs = (0 until 30).map { v =>
      (v.toLong, (0 until 48).map { i =>
        var h = v * 2654435761L + i * 0x9E3779B97F4A7C15L
        h ^= h >>> 33
        ((h % 997 + 997) % 997).toFloat / 100f - 5f
      })
    }
    val df = vecs.toDF("vid", "emb")
    val both = df.select(col("vid"),
        graft.ops.Similarity.projectArray(col("emb"), 8).as("k"),
        graft.ops.Similarity.projectArrayHof(col("emb"), 8).as("h"))
      .collect()
    both.foreach { r =>
      val k = r.getSeq[Double](1)
      val h = r.getSeq[Double](2)
      assert(k.size == 8 && k == h,
        s"vec ${r.getLong(0)}: kernel and HOF diverge\n$k\n$h")
    }
  }
}
