package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the ops whose driver queries are rows-only checked
  * (sketches, seeded sampling) plus the data-quality audit — the
  * properties the DuckDB oracle can't express live here.
  */
class QualitySamplingSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("stratified sample hits per-stratum fractions within tolerance") {
    import spark.implicits._
    val n = 20000
    val df = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val fractions = Map("en" -> 0.5, "de" -> 0.1)
    val sampled = graft.ops.Sampling.stratified(df, "lang", fractions, seed = 7L)
    val got = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, frac) <- fractions) {
      val expected = (n / 2) * frac
      val actual = got.getOrElse(lang, 0L).toDouble
      // Bernoulli draw: 5 sigma ≈ 5*sqrt(n*p*(1-p)) on 10k rows
      val tol = 5 * math.sqrt((n / 2) * frac * (1 - frac))
      assert(math.abs(actual - expected) <= tol,
        s"$lang: got $actual, expected $expected ± $tol")
    }
  }

  test("hash-keyed stratified sample: fractions, repartition-invariance, seed sensitivity") {
    import spark.implicits._
    val n = 20000
    val df = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val fractions = Map("en" -> 0.5, "de" -> 0.1)
    val sampled = graft.ops.Sampling.stratifiedByHash(df, "lang", "id", fractions, seed = 7L)
    val got = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, frac) <- fractions) {
      val expected = (n / 2) * frac
      val tol = 5 * math.sqrt((n / 2) * frac * (1 - frac))
      assert(math.abs(got.getOrElse(lang, 0L).toDouble - expected) <= tol)
    }
    // the property rand(seed) does NOT have: the kept set survives a
    // repartition unchanged, because the draw depends only on the key
    val a = sampled.select("id").as[Long].collect().sorted.toSeq
    val b = graft.ops.Sampling.stratifiedByHash(df.repartition(13), "lang", "id",
      fractions, seed = 7L).select("id").as[Long].collect().sorted.toSeq
    assert(a == b, "hash sample must be invariant to partitioning")
    // an unmatched stratum is never kept
    assert(!graft.ops.Sampling.stratifiedByHash(df, "lang", "id",
      Map("en" -> 0.5), seed = 7L).filter($"lang" === "de").head(1).nonEmpty)
    // and the seed actually matters
    val c = graft.ops.Sampling.stratifiedByHash(df, "lang", "id", fractions, seed = 8L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a != c, "different seeds must draw different samples")
  }

  test("weightedPriority: weight bias, exact size, repartition-invariance, seed sensitivity") {
    import spark.implicits._
    val n = 20000
    // half the rows weigh 9x the other half
    val df = (0 until n).map(i => (i.toLong, if (i % 2 == 0) 9.0 else 1.0))
      .toDF("id", "w")
    val k = 2000
    val picked = graft.ops.Sampling.weightedPriority(df, "id", col("w"), k, seed = 7L)
    val rows = picked.select("id").as[Long].collect()
    assert(rows.length == k, "fixed-size sample")
    // priority sampling inclusion ~ proportional to weight: the heavy
    // class should take ~90% of the sample; allow a generous band
    val heavy = rows.count(_ % 2 == 0).toDouble / k
    assert(heavy > 0.8 && heavy < 0.97, s"heavy-class share $heavy not weight-biased")
    // draw depends only on the row -> kept set survives repartitioning
    val again = graft.ops.Sampling.weightedPriority(df.repartition(13), "id", col("w"), k, seed = 7L)
      .select("id").as[Long].collect()
    assert(rows.sorted.toSeq == again.sorted.toSeq, "must be partitioning-invariant")
    // and the seed matters
    val other = graft.ops.Sampling.weightedPriority(df, "id", col("w"), k, seed = 8L)
      .select("id").as[Long].collect()
    assert(rows.sorted.toSeq != other.sorted.toSeq, "different seeds, different samples")
  }

  test("perGroupSample: exactly k per big group, small groups whole, partitioning-invariant") {
    import spark.implicits._
    val df = ((0 until 1000).map(i => (i.toLong, "big")) ++
      (1000 until 1003).map(i => (i.toLong, "tiny"))).toDF("id", "g")
    val got = graft.ops.Sampling.perGroupSample(df, "g", "id", k = 10, seed = 11L)
    val byG = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG == Map("big" -> 10L, "tiny" -> 3L))
    val a = got.select("id").as[Long].collect().sorted.toSeq
    val b = graft.ops.Sampling.perGroupSample(df.repartition(7), "g", "id", k = 10, seed = 11L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b, "sample must be partitioning-invariant")
  }

  test("hashSplit: exhaustive+disjoint, fractions hit, appends never flip a label") {
    import spark.implicits._
    val n = 20000
    val df = (0 until n).map(_.toLong).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = graft.ops.Sampling.hashSplit(df, "id", splits, seed = 5L)
    val counts = labeled.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"), "every row gets exactly one label")
    assert(counts.values.sum == n)
    for ((name, frac) <- splits) {
      val tol = 5 * math.sqrt(n * frac * (1 - frac))
      assert(math.abs(counts(name).toDouble - n * frac) <= tol, s"$name off-fraction")
    }
    // the property randomSplit lacks: a row's label is a pure function
    // of its key, so labels assigned within a subset match the full set
    val subset = graft.ops.Sampling.hashSplit(df.filter($"id" < 1000), "id", splits, seed = 5L)
      .as[(Long, String)].collect().toMap
    val full = labeled.filter($"id" < 1000).as[(Long, String)].collect().toMap
    assert(subset == full, "appending data must never reassign existing rows")
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4), seed = 1L)
    }
  }

  test("deterministicShuffle: total reproducible order, seed-sensitive, append-stable") {
    import spark.implicits._
    val df = (0 until 5000).map(_.toLong).toDF("id")
    def order(frame: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      graft.ops.Sampling.deterministicShuffle(frame, "id", seed)
        .as[Long].collect().toSeq
    val a = order(df, 13L)
    assert(a == order(df, 13L), "same seed must reproduce the exact order")
    assert(a.sorted == (0L until 5000L), "shuffle is a permutation")
    assert(a != order(df, 14L), "different seed must give a different order")
    assert(a != a.sorted, "the shuffled order is not the key order")
    // append stability: new rows interleave, but existing rows keep
    // their RELATIVE order (their draws don't change)
    val appended = order((0 until 6000).map(_.toLong).toDF("id"), 13L)
    assert(appended.filter(_ < 5000L) == a,
      "appending rows must not perturb the relative order of existing rows")
  }

  test("stratified sample is deterministic for a fixed seed") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i.toLong, "en")).toDF("id", "lang")
    val a = graft.ops.Sampling.stratified(df, "lang", Map("en" -> 0.3), 42L)
      .select("id").as[Long].collect().sorted.toSeq
    val b = graft.ops.Sampling.stratified(df, "lang", Map("en" -> 0.3), 42L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("approx_count_distinct is within documented rsd of exact") {
    val events = graft.io.Tables.events(spark, sfDir)
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    // rsd 0.02 → allow 4x slack for small-cardinality edge behavior
    assert(math.abs(approx - exact) / exact <= 0.08,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile(0.5) brackets the exact median") {
    val events = graft.io.Tables.events(spark, sfDir)
    val approx = events.agg(expr("approx_percentile(value, 0.5, 1000)")).head().getDouble(0)
    val bounds = events.agg(
      expr("percentile(value, 0.45)"), expr("percentile(value, 0.55)")).head()
    assert(approx >= bounds.getDouble(0) && approx <= bounds.getDouble(1),
      s"approx median $approx outside [${bounds.getDouble(0)}, ${bounds.getDouble(1)}]")
  }

  test("data-quality audit flags planted violations exactly") {
    import spark.implicits._
    val facts = Seq(
      (1L, Option(10L), Option(5.0)),   // clean
      (1L, Option(10L), Option(5.0)),   // dup key
      (2L, None, Option(-1.0)),         // null fk + negative
      (3L, Option(99L), Option(2.0))    // orphan fk
    ).toDF("k", "fk", "v")
    val dim = Seq(10L).toDF("dk")
    val got = graft.ops.DataQuality.audit(facts, key = "k",
        notNull = Seq("fk"), nonNegative = Seq("v"),
        fk = Some(("fk", dim, "dk")))
      .as[(String, Long)].collect().toMap
    assert(got("row_count") == 4L)
    assert(got("dup_k") == 1L)
    assert(got("null_fk") == 1L)
    assert(got("neg_v") == 1L)
    // anti-join: null fk does not match → counted orphan along with 99
    assert(got("orphan_fk") == 2L)
  }

  test("tfidf top-terms: rank bounded by k, tfidf consistent with tf/df") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 20)
    val out = graft.ops.TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("rk") >= 1 && r.getAs[Long]("rk") <= 3))
    val nDocs = docs.count().toDouble
    rows.foreach { r =>
      val expect = BigDecimal(r.getAs[Long]("tf") * math.log(nDocs / r.getAs[Long]("df")))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("tfidf") - expect) < 1e-9)
    }
  }

  test("label centroid sums: n equals label cardinality, dims complete") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val out = graft.ops.Similarity.labelCentroidSums(emb, "label", "embedding")
    val perLabel = out.groupBy("label").agg(
      countDistinct(col("pos")).as("dims"), max(col("n")).as("n"), min(col("n")).as("nmin"))
    val labelCounts = emb.groupBy("label").count()
    val joined = perLabel.join(labelCounts, "label").collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("dims") == dim.toLong)
      assert(r.getAs[Long]("n") == r.getAs[Long]("count"))
      assert(r.getAs[Long]("nmin") == r.getAs[Long]("count"))
    }
  }

  test("replicateEpochs: uniform draws realize the factor EXACTLY; per-row copies in {floor, floor+1}") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 100 rows with draws 0..99: factor 2.37 (basis 237) must produce
    // exactly 237 copies — 2 each plus one extra for the 37 draws < 37
    val rows = (0L until 100L).toDF("id")
    val out = graft.ops.Sampling.replicateEpochs(rows, lit(237), col("id") % 100, 100)
    assert(out.count() == 237L)
    val perRow = out.groupBy("id").count().select("count").as[Long].collect()
    assert(perRow.forall(c => c == 2L || c == 3L))
    // factor below 1: only the fractional draw keeps a row at all
    val thin = graft.ops.Sampling.replicateEpochs(rows, lit(40), col("id") % 100, 100)
    assert(thin.count() == 40L)
    assert(thin.select("copy_idx").distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("categoricalDrift: identical snapshots give PSI 0; vanished category contributes positive PSI") {
    import spark.implicits._
    val base = Seq("a", "a", "a", "b", "b", "c").toDF("cat")
    val same = graft.ops.DataQuality.categoricalDrift(base, base, "cat").collect()
    assert(same.forall(_.getDouble(3) == 0.0))
    // current snapshot lost category c entirely
    val cur = Seq("a", "a", "a", "b", "b").toDF("cat")
    val out = graft.ops.DataQuality.categoricalDrift(base, cur, "cat")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("c").getLong(2) == 0L)       // n_cur = 0
    assert(out("c").getDouble(3) > 0.5)     // vanished mass drives PSI up
    assert(out.values.map(_.getDouble(3)).sum > 0.0)
  }

  test("outliersZScore == exact BigInt reference; spike flags, uniform group clean") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val data = (1 to 300).map(i => ("g" + (i % 3), rng.nextInt(1000) / 100.0)) ++
      Seq(("g0", 5000.0), ("g1", -4000.0)) // planted spikes
    val df = data.toDF("g", "v")
    // exact reference: same cross-multiplied form in BigInt
    val byG = data.groupBy(_._1)
    val expect = byG.map { case (g, rows) =>
      val cents = rows.map { case (_, v) => BigInt(math.round(v * 100)) }
      val (n, s) = (BigInt(cents.size), cents.sum)
      val ss = cents.map(c => c * c).sum
      val outs = cents.filter(c => (c * n - s).pow(2) > 4 * (n * ss - s * s))
      g -> ((cents.size.toLong, outs.size.toLong, outs.sum.toLong))
    }
    val got = graft.ops.DataQuality.outliersZScore(df, "g", col("v"), z = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    // the spikes are among the flags
    assert(got("g0")._2 >= 1L && got("g1")._2 >= 1L)
    // a constant group flags nothing (variance 0, strict >)
    val const = (1 to 50).map(i => ("c", 7.25)).toDF("g", "v")
    val cg = graft.ops.DataQuality.outliersZScore(const, "g", col("v")).collect().head
    assert(cg.getLong(2) == 0L)
  }

  test("outliersMad == scala reference; threshold robust to the spike itself") {
    import spark.implicits._
    val rng = new scala.util.Random(43)
    // g0: tight cluster + moderate outliers + one extreme spike; the
    // spike inflates a stddev gate's threshold past the moderates but
    // cannot move the median/MAD. g1/g2: uniform noise.
    val data = (1 to 300).map(i => ("g" + (1 + i % 2), rng.nextInt(1000) / 100.0)) ++
      (1 to 200).map(i => ("g0", 10.0 + (i % 11 - 5) / 10.0)) ++
      Seq.fill(5)(("g0", 50.0)) ++ Seq(("g0", 100000.0))
    val df = data.toDF("g", "v")
    // exact reference: medians over sorted cents (integer or exact .5)
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val expect = data.groupBy(_._1).map { case (g, rows) =>
      val cents = rows.map { case (_, v) => math.round(v * 100).toDouble }
      val m = medOf(cents)
      val dd = cents.map(c => math.abs(c - m))
      val mad = medOf(dd)
      g -> ((cents.size.toLong, m, mad, dd.count(_ > 2 * mad).toLong))
    }
    val got = graft.ops.DataQuality.outliersMad(df, "g", col("v"), k = 2)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == expect)
    assert(got("g0")._4 >= 1L) // the spike is flagged
    // robustness — the property MAD exists for: the spike does NOT
    // inflate its own group's threshold (median/MAD barely move), where
    // the z=2 stddev gate's threshold balloons and flags ONLY the spike
    val zs = graft.ops.DataQuality.outliersZScore(df, "g", col("v"), z = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("g0")._4 > zs("g0"),
      s"MAD should flag tail values the spike-inflated z-gate misses " +
        s"(mad=${got("g0")._4}, z=${zs("g0")})")
    // constant group: MAD 0, strict > flags nothing
    val cg = graft.ops.DataQuality.outliersMad(
        (1 to 50).map(_ => ("c", 7.25)).toDF("g", "v"), "g", col("v"))
      .collect().head
    assert(cg.getDouble(3) == 0.0 && cg.getLong(4) == 0L)
  }

  test("checksumBuckets: any single-row edit, drop, or duplicate moves its bucket") {
    import spark.implicits._
    val base = (1L to 300L).map(i => (i, i * 13 % 97, i * 7 % 1000)).toDF("a", "b", "c")
    def sums(df: org.apache.spark.sql.DataFrame) =
      graft.ops.DataQuality.checksumBuckets(df, Seq(col("a"), col("b"), col("c")), 8)
        .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ref = sums(base)
    // identical content, different order/partitioning → identical checksum
    val shuffled = (1L to 300L).reverse.map(i => (i, i * 13 % 97, i * 7 % 1000))
      .toDF("a", "b", "c").repartition(11)
    assert(sums(shuffled) == ref, "order/partition independence")
    // one cell changed
    val edited = base.withColumn("c", when(col("a") === 123L, col("c") + 1).otherwise(col("c")))
    assert(sums(edited) != ref, "a one-cell edit must move the checksum")
    // one row dropped
    assert(sums(base.filter(col("a") =!= 200L)) != ref, "a dropped row must move it")
    // one row duplicated (s1/s2 catch it even though fp set is equal)
    assert(sums(base.union(base.filter(col("a") === 7L))) != ref, "a duplicated row must move it")
  }

  test("checksumBuckets: NULL is not zero") {
    import spark.implicits._
    val withNull = Seq((Some(1L), 5L), (None, 5L)).toDF("a", "b")
    val withZero = Seq((Some(1L), 5L), (Some(0L), 5L)).toDF("a", "b")
    val r1 = graft.ops.DataQuality.checksumBuckets(withNull, Seq(col("a"), col("b")), 1).collect()(0)
    val r2 = graft.ops.DataQuality.checksumBuckets(withZero, Seq(col("a"), col("b")), 1).collect()(0)
    assert(r1.getLong(2) != r2.getLong(2), "NULL fingerprint must differ from 0")
  }

  test("benfordAudit: geometric data tracks the law, uniform-magnitude data screams") {
    import spark.implicits._
    // geometric series 1.5^k spans magnitudes evenly in log space —
    // near-Benford; all-5xxx values put ~1e6 ppm on digit 5
    val geo = (0 until 400).map(k => math.pow(1.5, k % 50).toLong + 1).toDF("v")
    val g = graft.ops.DataQuality.benfordAudit(geo, col("v")).orderBy("digit").collect()
    assert(g.length == 9 && g.map(_.getLong(0)).toSeq == (1L to 9L))
    val d1 = g(0)
    assert(math.abs(d1.getLong(2) - 301030L) < 120000L,
      s"digit-1 share ${d1.getLong(2)} ppm too far from Benford")
    val uni = (5000L until 5400L).toDF("v")
    val u = graft.ops.DataQuality.benfordAudit(uni, col("v")).orderBy("digit").collect()
    assert(u(4).getLong(2) == 1000000L, "all mass on digit 5")
    assert(u(0).getLong(1) == 0L && u(0).getLong(2) == 0L, "digit 1 absent but row present")
    // boundary digits
    val edges = Seq(1L, 9L, 10L, 99L, 100L, -7L, 0L).toDF("v")
    val e = graft.ops.DataQuality.benfordAudit(edges, col("v")).orderBy("digit").collect()
    assert(e.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 3L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L, 6L -> 0L, 7L -> 0L,
          8L -> 0L, 9L -> 2L), "non-positive excluded; 10/100 lead with 1")
  }

  test("percentileDiscThresholds: disc rule hits exact boundaries; winsorize clamps") {
    import spark.implicits._
    // 10 values 1..10: p=20 → cum·100 ≥ n·20 first at value 2 (cum 2·100
    // = 200 == 10·20 exactly — inclusive); p=90 → value 9; p=100 → max
    val df = (1L to 10L).toDF("v")
    val thr = graft.ops.DataQuality.percentileDiscThresholds(df, col("v"), 20, 90)
      .as[(Long, Long)].head()
    assert(thr == ((2L, 9L)))
    val full = graft.ops.DataQuality.percentileDiscThresholds(df, col("v"), 0, 100)
      .as[(Long, Long)].head()
    assert(full == ((1L, 10L)), "p=0 → min (cum≥0 always), p=100 → max")
    // duplicated mass: {1,1,1,1,9} p=50 lands on 1 (cum 4·100 ≥ 5·50)
    val dup = Seq(1L, 1L, 1L, 1L, 9L).toDF("v")
    val t2 = graft.ops.DataQuality.percentileDiscThresholds(dup, col("v"), 50, 50)
      .as[(Long, Long)].head()
    assert(t2 == ((1L, 1L)))
    // clamp + clip_dir
    val w = graft.ops.DataQuality.winsorize(df, "v", 20, 90)
      .select(col("v"), col("v_w"), col("clip_dir"))
      .as[(Long, Long, Long)].collect().toSet
    assert(w.contains((1L, 2L, -1L)) && w.contains((10L, 9L, 1L)) &&
      w.contains((5L, 5L, 0L)))
    assert(w.count(_._3 == 0L) == 8)
  }

  test("negativeSample: never a positive, exactly k per key, deterministic, budget exhaustion honest") {
    import spark.implicits._
    val pos = Seq((1L, 3L), (1L, 7L), (2L, 0L), (2L, 1L), (2L, 2L))
      .toDF("u", "it")
    def run(k: Int, itemCount: Long, overgen: Int = 4) =
      graft.ops.Sampling.negativeSample(pos, "u", "it", itemCount, k,
          overgen = overgen)
        .as[(Long, Long, Long)].collect().toSeq
    val got = run(3, 100L)
    val posSet = Set((1L, 3L), (1L, 7L), (2L, 0L), (2L, 1L), (2L, 2L))
    assert(got.forall { case (u, it, _) => !posSet((u, it)) },
      "a negative must never be a positive")
    assert(got.groupBy(_._1).forall(_._2.map(_._3).sorted == Seq(1L, 2L, 3L)),
      "exactly k ranked draws per key")
    assert(got.forall { case (_, it, _) => it >= 0 && it < 100 })
    // deterministic: second run identical
    assert(run(3, 100L) == got)
    // tiny catalog: key 2 holds 3 of 4 items — at most 1 negative
    // exists; the op emits what's real, never a positive to fill k
    val tight = run(3, 4L).filter(_._1 == 2L)
    assert(tight.size <= 1 && tight.forall(t => t._2 == 3L))
  }

  test("weightedPercentiles: weight shifts the median; boundary-exact; bad weights excluded") {
    import spark.implicits._
    // values 1..4 with weight 1 each → p50 = 2 (cum 2·100 ≥ 4·50).
    // Same values but value 4 carries weight 6 → total 9, p50 = 4
    // (cum at 3 is 3·100 < 9·50; at 4 cum 9).
    val flat = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 1L))
    val skew = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 6L))
    def p50(rows: Seq[(String, Long, Long)]) =
      graft.ops.DataQuality.weightedPercentiles(
          rows.toDF("g", "v", "w"), "g", col("v"), col("w"), Seq(50))
        .select("total_weight", "p50_value").as[(Long, Long)].head()
    assert(p50(flat) == ((4L, 2L)))
    assert(p50(skew) == ((9L, 4L)))
    // zero/negative/null weights are excluded from mass entirely
    val dirty = Seq(("g", 1L, 5L), ("g", 9L, 0L), ("g", 8L, -3L))
    assert(p50(dirty) == ((5L, 1L)))
  }

  test("sequenceGaps: intra-bucket, boundary-crossing, whole-bucket-missing, dups") {
    import spark.implicits._
    // bucketSize 10. present: 1..4, 7..9 (intra gap 5-6), 10..12
    // (no gap at the 9→10 boundary), 28 (boundary gap 13-27 spans the
    // ENTIRE missing bucket [20,29) partly), duplicates of 3.
    val ks = (Seq(1L, 2L, 3L, 3L, 4L, 7L, 8L, 9L, 10L, 11L, 12L, 28L))
      .toDF("k")
    for (parts <- Seq(1, 4)) {
      val got = graft.ops.DataQuality.sequenceGaps(
          ks.repartition(parts), "k", bucketSize = 10L)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((5L, 6L, 2L), (13L, 27L, 15L)))
    }
    // contiguous input: no gaps
    assert(graft.ops.DataQuality.sequenceGaps(
      (1L to 50L).toDF("k"), "k", 7L).count() == 0L)
  }

  test("kAnonymityCensus: sub-k risk, large-but-homogeneous leak, NULL sensitive") {
    import spark.implicits._
    // group A: 6 rows, 3 distinct sensitive → safe on both axes
    // group B: 2 rows (< k=5) → at risk
    // group C: 6 rows but ONE sensitive value → l-diversity leak
    // group D: 5 rows all NULL sensitive → homogeneous (NULL is a value)
    val rows =
      Seq("s1", "s1", "s2", "s2", "s3", "s3").map(s => ("A", Option(s))) ++
      Seq(("B", Option("s1")), ("B", Option("s2"))) ++
      Seq.fill(6)(("C", Option("s9"))) ++
      Seq.fill(5)(("D", Option.empty[String]))
    val got = graft.ops.DataQuality.kAnonymityCensus(
        rows.toDF("qi", "sens"), Seq("qi"), "sens", k = 5, l = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // (n_rows, n_groups, min_size, n_small, rows_at_risk, n_lowdiv, rows_lowdiv)
    assert(got == ((19L, 4L, 2L, 1L, 2L, 3L, 13L)))
  }

  test("dpNoisedCounts: the uniform draw is a pluggable seam — a custom " +
      "draw changes ONLY the noise, with the same Laplace calibration") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 100).map(i => (i.toLong, if (i % 4 == 0) "a" else "b"))
      .toDF("id", "g")
    // u = 0.75 everywhere → noise = -ln(1 - 2·0.25)/eps = ln(2)/eps, a
    // closed form the seam must reproduce exactly
    val eps = 0.5
    val got = graft.ops.DataQuality.dpNoisedCounts(df, "g",
        when(col("g") === "a", 0L).otherwise(1L), epsilonMicro = 500000L,
        uniform = Some(_ => lit(0.75)))
      .orderBy("g").as[(String, Long, Double)].collect()
    val want = math.log(2.0) / eps
    assert(got.length == 2)
    assert(got.map(_._2).toSeq == Seq(25L, 75L))
    got.foreach { case (_, n, noised) =>
      assert(math.abs(noised - (n + want)) < 1e-6, s"noised=$noised n=$n")
    }
    // the production draw (fresh randomness) keeps schema + calibration;
    // determinism is deliberately absent there, so assert shape only
    val fresh = graft.ops.DataQuality.dpNoisedCounts(df, "g",
        when(col("g") === "a", 0L).otherwise(1L), epsilonMicro = 500000L,
        uniform = Some(_ => rand(7L)))
      .collect()
    assert(fresh.length == 2)
  }

  test("fdCensus: holds / violated / null image counted") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (1L, Some("a")), (2L, Some("b")),
      (3L, Some("c")), (3L, Some("d")), (3L, None)).toDF("l", "r")
    val got = graft.ops.Profiling.fdCensus(df, "l", "r")
      .as[(Long, Long, Long, Boolean)].head()
    // key 3 has images {c, d, NULL} = 3 (NULL is an image value —
    // a sometimes-null dependent violates); keys 1, 2 clean
    assert(got == ((3L, 1L, 3L, false)))
    val clean = graft.ops.Profiling.fdCensus(
      Seq((1L, "x"), (2L, "y"), (2L, "y")).toDF("l", "r"), "l", "r")
      .as[(Long, Long, Long, Boolean)].head()
    assert(clean == ((2L, 0L, 1L, true)))
  }
}
