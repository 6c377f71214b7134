package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model TRAINING via sufficient statistics (EXT — the
  * learn-from-the-corpus counterpart of [[TextAnalysis.linearScore]]'s
  * apply step). An OLS linear fit needs only the moment sums
  * (n, Σx, Σx², Σxy, …): ONE corpus scan folding into one hash-agg
  * row, then a closed-form solve — the canonical shape for fitting at
  * 100 TB, where anything iterative pays a scan per step. The solve is
  * Cramer's rule on the 3×3 normal equations, evaluated as integer
  * polynomial expressions IN THE QUERY (no driver math, no float):
  * with integer-quantized inputs every determinant is an exact
  * integer, so the fitted coefficients are exact rationals num/det and
  * the emitted trunc-micros are engine-portable by construction.
  *
  * Integer-input contract: y, x1, x2 must be integral (quantize with a
  * documented scale — cents, basis points — before calling; same
  * contract as [[Eval]]). Internals run in DECIMAL(38,0): with
  * per-row magnitudes y ≤ Y, x ≤ X, the worst Cramer term is
  * ~n³·X⁴·Y, so the ~1e38 ceiling holds to roughly n·X^(4/3)·Y^(1/3)
  * ≈ 1e9 rows at cents/quantity scales; past it, products overflow to
  * NULL under non-ANSI semantics and — same discipline as
  * `outliersZScore` — a NULL determinant on non-degenerate input
  * ABORTS via raise_error rather than silently emitting a null fit.
  */
object Regress {

  private val Big = "decimal(38,0)"

  /** Exact trunc(num·1e6/den) for SIGNED num: SQL `div` truncates
    * toward zero, and so does DuckDB's `//` (verified: −7//2 = −3) —
    * so plain integral division is already the portable choice for
    * signed coefficients; a floor-adjusted variant would disagree by
    * one micro on every negative fit. */
  private def truncMicros(num: Column, den: Column): Column =
    call_function("div", num.cast(Big) * 1000000L, den.cast(Big)).cast("long")

  /** OLS fit of y ~ b0 + b1·x1 + b2·x2. Output: ONE row —
    * n (BIGINT) and b0/b1/b2 as exact trunc-micros (BIGINT; NULL when
    * the design matrix is singular, e.g. a constant x column). */
  def olsFit2(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val base = df.select(y.cast("long").as("_y"),
      x1.cast("long").as("_x1"), x2.cast("long").as("_x2"))
    val s = base.agg(
      count(lit(1)).as("n"),
      sum(col("_x1").cast(Big)).as("s1"),
      sum(col("_x2").cast(Big)).as("s2"),
      sum((col("_x1").cast(Big) * col("_x1"))).as("s11"),
      sum((col("_x2").cast(Big) * col("_x2"))).as("s22"),
      sum((col("_x1").cast(Big) * col("_x2"))).as("s12"),
      sum(col("_y").cast(Big)).as("sy"),
      sum((col("_x1").cast(Big) * col("_y"))).as("s1y"),
      sum((col("_x2").cast(Big) * col("_y"))).as("s2y"))
    // det3 of [[a,b,c],[d,e,f],[g,h,i]] — expression-level Cramer
    def det3(a: Column, b: Column, c: Column, d: Column, e: Column,
        f: Column, g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val n = col("n").cast(Big)
    val (s1, s2, s11, s22, s12) = (col("s1"), col("s2"), col("s11"), col("s22"), col("s12"))
    val (sy, s1y, s2y) = (col("sy"), col("s1y"), col("s2y"))
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val b0n = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val b1n = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val b2n = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    val guarded = when(col("n") > 0 && det.isNull,
      raise_error(lit("olsFit2: decimal(38,0) overflow in normal-equation " +
        "determinant — rescale the inputs or pre-aggregate")).cast(Big))
      .otherwise(det)
    s.select(col("n"),
      when(guarded =!= 0, truncMicros(b0n, guarded)).as("b0_micros"),
      when(guarded =!= 0, truncMicros(b1n, guarded)).as("b1_micros"),
      when(guarded =!= 0, truncMicros(b2n, guarded)).as("b2_micros"))
  }

  /** Per-GROUP simple OLS — [[olsFit1]]'s sums keyed by a group column:
    * one hash aggregation at group cardinality instead of one row, so
    * fitting a separate trend per segment/tenant/source costs exactly
    * one corpus scan regardless of group count (the grouped twin of the
    * outliersZScore/MAD census shape). Same integer contract and
    * trunc-micros output; singular groups (constant x within the
    * group) yield NULL coefficients for that group only. */
  def olsFit1Grouped(df: DataFrame, group: String, y: Column, x: Column): DataFrame = {
    val base = df.select(col(group), y.cast("long").as("_y"), x.cast("long").as("_x"))
    val s = base.groupBy(col(group)).agg(
      count(lit(1)).as("n"),
      sum(col("_x").cast(Big)).as("sx"),
      sum(col("_y").cast(Big)).as("sy"),
      sum((col("_x").cast(Big) * col("_x"))).as("sxx"),
      sum((col("_x").cast(Big) * col("_y"))).as("sxy"))
    val n = col("n").cast(Big)
    val den = n * col("sxx") - col("sx") * col("sx")
    val num = n * col("sxy") - col("sx") * col("sy")
    val guarded = when(col("n") > 0 && den.isNull,
      raise_error(concat(lit("olsFit1Grouped: decimal(38,0) overflow in group '"),
        col(group).cast("string"), lit("' — rescale the inputs"))).cast(Big))
      .otherwise(den)
    s.select(col(group), col("n"),
      when(guarded =!= 0, truncMicros(col("sy") * guarded - num * col("sx"), n * guarded))
        .as("b0_micros"),
      when(guarded =!= 0, truncMicros(num, guarded)).as("b1_micros"))
  }

  /** Simple (one-regressor) OLS — same contract, 2×2 system:
    * b1 = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²), b0 = (Sy − b1·Sx)/n, both
    * emitted as exact trunc-micros of the shared-denominator rationals
    * (b0's exact form is (Sy·den − num·Sx)/(n·den)). */
  def olsFit1(df: DataFrame, y: Column, x: Column): DataFrame = {
    val base = df.select(y.cast("long").as("_y"), x.cast("long").as("_x"))
    val s = base.agg(
      count(lit(1)).as("n"),
      sum(col("_x").cast(Big)).as("sx"),
      sum(col("_y").cast(Big)).as("sy"),
      sum((col("_x").cast(Big) * col("_x"))).as("sxx"),
      sum((col("_x").cast(Big) * col("_y"))).as("sxy"))
    val n = col("n").cast(Big)
    val den = n * col("sxx") - col("sx") * col("sx")
    val num = n * col("sxy") - col("sx") * col("sy")
    val guarded = when(col("n") > 0 && den.isNull,
      raise_error(lit("olsFit1: decimal(38,0) overflow — rescale the inputs"))
        .cast(Big)).otherwise(den)
    s.select(col("n"),
      when(guarded =!= 0, truncMicros(col("sy") * guarded - num * col("sx"), n * guarded))
        .as("b0_micros"),
      when(guarded =!= 0, truncMicros(num, guarded)).as("b1_micros"))
  }

  /** Spearman rank correlation of two INTEGER columns — the robust
    * (monotone-invariant) sibling of Pearson `corr`, with standard
    * AVERAGE tie ranks. Exactness: average ranks are ½-quantized, so
    * everything runs in HALF-RANK units — for a value with `b` rows
    * strictly below it and `c` ties, rank2 = 2b + c + 1, an exact
    * integer — and every moment sum is DECIMAL(38,0). The one inexact
    * step is the final `1e6·num/√(d1·d2)` (num, d1, d2 are exact
    * integers both engines agree on; the double conversion, multiply,
    * sqrt, divide, floor chain has one IEEE-defined result). NULL when
    * either margin is constant (d=0 — correlation undefined).
    *
    * Scale shape: two VALUE-grain prefix sums (one hash agg + one
    * range exchange each — the row-level rank window never exists),
    * two value joins back, one moment hash-agg row. The rank-sum
    * invariant Σrank2 = n(n+1) per axis is emitted so the oracle
    * cross-checks the ranking itself, not just the final ratio.
    *
    * Output: one row (n, sum_rank2_x, sum_rank2_y, num, d1, d2
    * [BIGINT — caller keeps n within ~1e6 for half-rank moment sums to
    * fit; past that, emit the decimals directly], r_micro). */
  def spearman(df: DataFrame, x: String, y: String): DataFrame = {
    def rank2(colName: String, out: String): DataFrame = {
      val grain = df.groupBy(col(colName).as("_v"))
        .agg(count(lit(1)).as("_cnt"))
      Packing.assignShardsOrdered(grain, Seq(col("_v").asc), "_cnt",
          budget = Long.MaxValue)
        .select(col("_v").as(colName),
          (lit(2L) * (col("cum_w") - col("_cnt")) + col("_cnt") + 1L).as(out))
    }
    val j = df.select(col(x), col(y))
      .join(rank2(x, "_ra"), Seq(x)).join(rank2(y, "_rb"), Seq(y))
    val s = j.agg(count(lit(1)).cast(Big).as("n"),
      sum(col("_ra")).as("sum_rank2_x"), sum(col("_rb")).as("sum_rank2_y"),
      sum(col("_ra").cast(Big) * col("_rb")).as("_sab"),
      sum(col("_ra").cast(Big) * col("_ra")).as("_saa"),
      sum(col("_rb").cast(Big) * col("_rb")).as("_sbb"))
    val num = col("n") * col("_sab") -
      col("sum_rank2_x").cast(Big) * col("sum_rank2_y")
    val d1 = col("n") * col("_saa") -
      col("sum_rank2_x").cast(Big) * col("sum_rank2_x")
    val d2 = col("n") * col("_sbb") -
      col("sum_rank2_y").cast(Big) * col("sum_rank2_y")
    s.select(col("n").cast("long").as("n"),
        col("sum_rank2_x").cast("long").as("sum_rank2_x"),
        col("sum_rank2_y").cast("long").as("sum_rank2_y"),
        num.cast("long").as("num"), d1.cast("long").as("d1"),
        d2.cast("long").as("d2"))
      .withColumn("r_micro",
        when(col("d1") > 0L && col("d2") > 0L,
          floor(lit(1000000.0) * col("num").cast("double") /
            sqrt(col("d1").cast("double") * col("d2").cast("double")))
            .cast("long")))
  }

  /** Pearson correlation decided EXACTLY: r² in trunc-micros plus the
    * covariance sign, from one pass of integer sufficient statistics —
    * no sqrt, no double, unlike r itself (whose square root is the one
    * thing integers cannot express; r = sign·√(r²) is the caller's
    * display step). Inputs must be integral (quantize upstream — the
    * [[olsFit]] contract).
    *
    * `r²·10⁶ = 10⁶·num² / (d1·d2)` with num = nΣxy−ΣxΣy,
    * d1 = nΣx²−(Σx)², d2 = nΣy²−(Σy)², computed in DECIMAL(38,0) as
    * the two-step trunc-div `((num² div max(d1,d2))·10⁶) div
    * min(d1,d2)` — dividing by the LARGER variance first keeps every
    * intermediate under 38 digits (num² ≤ d1·d2 by Cauchy–Schwarz, so
    * step one is ≤ the smaller variance), and the max/min choice makes
    * the truncation composition engine-neutral (the oracle replays the
    * same two steps in HUGEINT). Degenerate variance (a constant
    * column) pins r² = 0 and sign 0. Output one row:
    * (n, r_sign, r2_micro) — BIGINTs only. */
  def pearsonR2(df: DataFrame, x: Column, y: Column): DataFrame = {
    val Big = "decimal(38,0)"
    val s = df.select(x.cast("long").as("_x"), y.cast("long").as("_y"))
      .agg(count(lit(1)).cast(Big).as("_n"),
        sum(col("_x").cast(Big)).as("_sx"), sum(col("_y").cast(Big)).as("_sy"),
        sum(col("_x").cast(Big) * col("_x")).as("_sxx"),
        sum(col("_y").cast(Big) * col("_y")).as("_syy"),
        sum(col("_x").cast(Big) * col("_y")).as("_sxy"))
    val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val d1 = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val d2 = col("_n") * col("_syy") - col("_sy") * col("_sy")
    s.select(col("_n").cast("long").as("n"),
      when(num > 0, 1L).when(num < 0, -1L).otherwise(0L).as("r_sign"),
      when(d1 > 0 && d2 > 0,
        call_function("div",
          // step 1 result ≤ min(d1, d2) (Cauchy–Schwarz) — the op's
          // contract requires the SMALLER variance to fit BIGINT
          // (quantize the finer-grained variable upstream); step 2's
          // dividend re-enters decimal before the ×10⁶
          call_function("div", num * num, greatest(d1, d2))
            .cast(Big) * 1000000L,
          least(d1, d2)))
        .otherwise(lit(0L)).cast("long").as("r2_micro"))
  }

  /** Full-batch gradient-descent LOGISTIC-FAMILY classifier training in
    * EXACT fixed point — the quality-classifier training step of a
    * curation pipeline, in the engine's integer-contract discipline so
    * the oracle can replay every iteration bit-for-bit (no exp(), no
    * float accumulation: partial-agg merge order cannot move a hash).
    *
    * Link: the algebraic fast sigmoid s(z) = ½ + z / (2·(1+|z|)),
    * computed in micros as 500000 + z·500000 div (1000000 + |z|) — same
    * S-shape and gradient sign structure as the exp logistic, exactly
    * representable in integer arithmetic (the exp form differs only in
    * tail sharpness and is NOT reproducible across engines bit-exactly).
    *
    * Shape per iteration: ONE hash aggregate over the data (map-side
    * partials, DECIMAL(38,0) sums — no overflow at any corpus size),
    * O(dim) driver rows for the weight update. `features` must be
    * integer-valued columns (quantize upstream; include a lit(1) bias);
    * `label` 0/1. Weights are micros; truncating division matches
    * DuckDB `//` (pinned by sql_intdiv_semantics). Returns one row:
    * (n_rows, w0_micro, …, w{d-1}_micro). */
  def logisticGdFixedPoint(df: DataFrame, features: Seq[Column],
      label: Column, iters: Int, lrNum: Long = 1L, lrDen: Long = 2L): DataFrame = {
    require(features.nonEmpty && iters >= 0 && lrNum > 0 && lrDen > 0,
      "logisticGd: need features, iters >= 0, positive learning rate")
    val dim = features.length
    val base = df.select((features.zipWithIndex.map { case (c, j) =>
      c.cast("long").as(s"_x$j") } :+ label.cast("long").as("_y")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    require(n > 0, "logisticGd: empty input")
    val w = Array.fill(dim)(BigInt(0)) // micros
    var it = 0
    while (it < iters) {
      val z = (0 until dim).map(j => lit(w(j).toLong) * col(s"_x$j"))
        .reduce(_ + _) // micros (weights micros x unit-scale features)
      val sMicro = lit(500000L) +
        call_function("div", z * 500000L, lit(1000000L) + abs(z))
      val r = col("_y") * 1000000L - sMicro // residual in micros
      val grads = base.agg(
        sum((r * col("_x0")).cast("decimal(38,0)")).as("_g0"),
        (1 until dim).map(j =>
          sum((r * col(s"_x$j")).cast("decimal(38,0)")).as(s"_g$j")): _*)
        .head()
      var j = 0
      while (j < dim) {
        val g = BigInt(grads.getDecimal(j).toBigInteger)
        w(j) += (g * lrNum) / (BigInt(n) * lrDen) // BigInt / truncates: matches DIV
        j += 1
      }
      it += 1
    }
    base.unpersist()
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, w.map(_.toLong).toSeq)).toDF("n_rows", "_w")
      .select((col("n_rows") +: (0 until dim).map(j =>
        element_at(col("_w"), j + 1).as(s"w${j}_micro"))): _*)
  }
}
