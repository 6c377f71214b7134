package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stratified sampling — a first-class training-data-pipeline op (down-
  * weight over-represented languages/sources before training). Absent
  * from the reference (its extract takes everything one department at a
  * time, `src/lms_to_s3_lambda.py:196-200`); at 100 TB sampling is how a
  * corpus becomes a dataset.
  */
object Sampling {

  /** The engine-portable key draw every deterministic op here shares:
    * Knuth multiplicative hash on the key, bounded before the multiply
    * (`key mod 1000003`, a prime) so the product never overflows Long
    * for any 64-bit id; the seed is added BEFORE the multiplier (after
    * would only shift every draw by a constant); reduce mod a Mersenne
    * prime, then mod `basis`. Depends only on the row's own key ⇒
    * invariant under retries, repartitioning, AQE re-plans and appends,
    * and reproducible in any engine with mod arithmetic (the oracles
    * run the same formula in DuckDB). Not cryptographic — fine for
    * mixture/order control, not for adversarially-chosen ids.
    *
    * NULL keys yield NULL draws, and the consumers diverge on them:
    * filter-style ops (stratifiedByHash) DROP such rows, hashSplit's
    * CASE routes them all to the LAST split, orderBy sorts them first.
    * A sampling key must be a non-null stable id — validate upstream. */
  def keyDraw(key: Column, seed: Long, basis: Long = 1000000L): Column = {
    val seedMod = ((seed % 1000003L) + 1000003L) % 1000003L
    pmod((pmod(key, lit(1000003L)) + lit(seedMod))
      * lit(2654435761L), lit(2147483647L)) % lit(basis)
  }

  /** Per-stratum Bernoulli sample: each row kept independently with its
    * stratum's fraction — one scan, no shuffle, no per-key state; the
    * seed makes it reproducible across retries within one Spark build
    * (cross-engine the draw is RNG-defined, hence rows-only gating).
    */
  def stratified(df: DataFrame, strata: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strata, fractions, seed)

  /** Deterministic per-stratum sample keyed on a stable id — the
    * production-robust form of [[stratified]]. `rand(seed)` draws are
    * seeded PER PARTITION INDEX, so a repartition, an AQE re-plan, or a
    * task retry on a different split changes WHICH rows survive; a draw
    * computed from the row's own key is invariant to all of that, and
    * portable across engines (the gate hash-matches DuckDB running the
    * same arithmetic — no RNG-definition exemption needed).
    *
    * Draw: Knuth multiplicative hash on the key, bounded before the
    * multiply (`key mod 1000003`, a prime) so the product never
    * overflows Long for any 64-bit id. The seed is added BEFORE the
    * multiplier (adding it after would only shift every draw by a
    * constant — same kept set for every seed); the multiply diffuses
    * it, then the draw reduces mod a Mersenne prime and mod `basis`.
    * Not cryptographic — adjacent ids land on a full-period progression
    * mod `basis` (multiplier is coprime to it), which is equidistributed
    * but predictable; fine for mixture control, not for sampling
    * adversarial data someone can pick ids for. Keep-thresholds are
    * exact integers (`frac*basis` rounded), so the boundary comparison
    * never hits float edges. One scan, no shuffle, no state. */
  def stratifiedByHash(df: DataFrame, strata: String, key: String,
      fractions: Map[String, Double], seed: Long,
      basis: Long = 1000000L): DataFrame = {
    val draw = keyDraw(col(key), seed, basis)
    val threshold = fractions.foldLeft(lit(0L)) { case (acc, (k, f)) =>
      when(col(strata) === k, lit(math.round(f * basis))).otherwise(acc)
    }
    df.filter(draw < threshold)
  }

  /** Temperature-scaled mixture weights per source: p_g ∝ n_g^(1/τ),
    * normalized. τ=1 reproduces natural proportions; τ→∞ flattens to
    * uniform — the standard rebalancing step for multi-source training
    * mixes. One hash agg (G rows of state, G = #sources) + a one-row
    * broadcast for the normalizer; the corpus itself is touched once.
    * Output: (group, n, weight) — weight rounded to 9 dp so the oracle
    * hash-matches across engines. */
  def temperatureWeights(df: DataFrame, group: String, tau: Double): DataFrame = {
    val counts = df.groupBy(col(group)).agg(count(lit(1)).as("n"))
    val scaled = counts.withColumn("_s", pow(col("n").cast("double"), 1.0 / tau))
    val z = scaled.agg(sum(col("_s")).as("_z"))
    scaled.crossJoin(broadcast(z))
      .select(col(group), col("n"), round(col("_s") / col("_z"), 9).as("weight"))
  }

  /** Fractional-epoch replication: emit `factor` copies of each row,
    * where factor can be non-integral ("2.3 epochs of wiki, 0.4 of
    * web" — the standard way a training mixture realizes source
    * weights). A row gets floor(factor) copies plus one more iff its
    * deterministic uniform draw falls below the fractional part.
    *
    * Both factor and the draw are INTEGERS on a shared `basis`
    * (factor 2.3 at basis 100 = 230; draw ∈ [0, basis)) so the
    * boundary comparison is exact — no float-threshold flakes across
    * engines, retries, or partitionings. The expansion is a narrow
    * sequence+explode (no shuffle); output skew is bounded by
    * max(factor), not data volume. Adds `copy_idx` (0-based). */
  def replicateEpochs(df: DataFrame, factorBasis: org.apache.spark.sql.Column,
      drawBasis: org.apache.spark.sql.Column, basis: Int = 100): DataFrame = {
    val copies = (factorBasis.cast("long") / basis).cast("long") +
      when(drawBasis.cast("long") < factorBasis.cast("long") % basis, 1L).otherwise(0L)
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Weight-biased fixed-size sample via priority sampling (Duffield,
    * Lund & Thorup, JACM 54(6) 2007): each row draws a uniform u from
    * its OWN key (the same Knuth multiplicative hash as
    * `stratifiedByHash`) and gets priority u/weight; the sample is the
    * k smallest priorities, so heavier rows win proportionally more
    * often. Classic exponential-key A-ES (u^(1/w)) ranks identically
    * but needs pow/log — libm calls whose last-bit behavior varies
    * across engines and would break cross-engine reproducibility; the
    * priority form is one IEEE division, bit-identical everywhere.
    *
    * Deterministic under retries and repartitioning (the draw depends
    * only on the row), and the top-k plans as TakeOrderedAndProject:
    * per-partition bounded heaps, the driver merges P·k candidate
    * rows — no global sort exists at any scale. Adds `_priority`. */
  def weightedPriority(df: DataFrame, key: String,
      weight: org.apache.spark.sql.Column, k: Int, seed: Long,
      basis: Long = 1000000L): DataFrame = {
    val draw = keyDraw(col(key), seed, basis)
    // u in (0, 1] — zero excluded so zero-weight-free priorities stay
    // finite; weight must be strictly positive
    val u = (draw + lit(1L)).cast("double") / lit(basis.toDouble)
    df.withColumn("_priority", u / weight)
      .orderBy(col("_priority").asc, col(key).asc)
      .limit(k)
  }

  /** Deterministic train/val/test split: each row's split label comes
    * from its OWN key hash against cumulative integer thresholds —
    * exact boundaries (no float compares), invariant under
    * retries/repartitioning/appends (a row keeps its split forever, so
    * later corpus additions can never leak val rows into train), and
    * reproducible in any engine with mod arithmetic. `randomSplit`
    * guarantees none of this: its per-partition RNG reshuffles labels
    * whenever partitioning changes. Fractions must sum to 1 (±1e-9);
    * the last split absorbs integer-rounding remainder. Adds `split`. */
  def hashSplit(df: DataFrame, key: String, splits: Seq[(String, Double)],
      seed: Long, basis: Long = 1000000L): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val draw = keyDraw(col(key), seed, basis)
    val cuts = splits.init.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * basis)
    }.tail
    val label = splits.init.zip(cuts).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(draw < cut, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Exactly-k-per-group sample ("show me k examples per source"):
    * rank rows within each group by the same key-derived hash draw as
    * `stratifiedByHash` and keep the k smallest — uniform-ish within
    * the group, deterministic under retries/repartitioning, and
    * reproducible in any engine with mod arithmetic. Keyed window:
    * each partition sorts only its own group's rows, so cost scales
    * with group size, never corpus size; groups smaller than k pass
    * through whole. */
  def perGroupSample(df: DataFrame, group: String, key: String, k: Int,
      seed: Long, basis: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val draw = keyDraw(col(key), seed, basis)
    val w = Window.partitionBy(col(group)).orderBy(draw.asc, col(key).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  /** Deterministic corpus shuffle — reproducible TRAINING ORDER: sort by
    * the row's own [[keyDraw]] (key tie-break, so the order is total and
    * never partition-dependent). The property randomSplit-style RNG
    * shuffles can't give: the same seed reproduces the same order on any
    * cluster, any partitioning, any retry — and in any engine, so the
    * order itself is oracle-checkable. Different seeds give uncorrelated
    * orders (the seed rides inside the multiplicative hash).
    *
    * Plans as a sampled RANGE exchange + per-partition sort (Spark's
    * distributed orderBy) — no single-reducer global sort at any scale;
    * writing the result partition-by-partition yields shuffled training
    * shards whose concatenation is the shuffled corpus. Adds nothing:
    * the draw stays internal to the sort. */
  def deterministicShuffle(df: DataFrame, key: String, seed: Long,
      basis: Long = 1000000L): DataFrame =
    df.orderBy(keyDraw(col(key), seed, basis).asc, col(key).asc)

  /** Deterministic negative sampling — the contrastive-pair prep step
    * (recsys two-tower training, embedding hard-negative mining, link-
    * prediction class balance): for every key holding positives, `k`
    * items it did NOT interact with, drawn reproducibly. "Random"
    * negatives come from a quadratic-mix formula over (key, j) — the
    * same stream on any cluster, any retry, any engine — so the output
    * is oracle-checkable and training runs are repeatable; the candidate
    * stream OVERGENERATES (`overgen × k` draws) then anti-joins the
    * positive set and keeps the first k survivors in draw order
    * (collisions with positives or duplicate draws consume a slot from
    * the overgen budget, not from k — the op emits FEWER than k only if
    * the budget exhausts, which the `n_negatives` census downstream
    * should watch; raise `overgen` for keys that touch most of the
    * catalog).
    *
    * Scale shape: distinct-keys frame × overgen·k map-side explode
    * (bounded fan-out, no shuffle amplification), one anti-join on
    * (key, item) against the positive set, one keyed dedup agg, one
    * KEY-partitioned rank window — never a global sort. Items live in
    * `[itemBase, itemBase + itemCount)`. Returns (key, item, draw_rank
    * ∈ [1..k]). */
  def negativeSample(positives: DataFrame, key: String, item: String,
      itemCount: Long, k: Int, itemBase: Long = 0L,
      overgen: Int = 4): DataFrame = {
    require(itemCount >= 1 && k >= 1 && overgen >= 2,
      s"need itemCount >= 1, k >= 1, overgen >= 2; got $itemCount/$k/$overgen")
    import org.apache.spark.sql.expressions.Window
    val pos = positives.select(col(key).cast("long").as("_k"),
      col(item).cast("long").as("_i")).distinct()
    // the key enters the mix pre-reduced mod 2²² so k²·7919 can never
    // overflow a Long (ANSI Spark would abort the job on a raw 1e9-scale
    // id); two keys aliasing mod 2²² merely share a candidate STREAM —
    // each still anti-joins its own positives, so correctness is
    // untouched and the draw stays deterministic
    val kMix = pmod(col("_k"), lit(4194304L))
    val cands = pos.select(col("_k")).distinct()
      .withColumn("_j", explode(sequence(lit(0), lit(overgen * k - 1))))
      .withColumn("_i",
        pmod(kMix * kMix * 7919L + col("_j") * col("_j") * 104729L +
          kMix * col("_j") * 31L + col("_j"), lit(itemCount)) +
          lit(itemBase))
    val fresh = cands.join(pos, Seq("_k", "_i"), "left_anti")
      .groupBy(col("_k"), col("_i")).agg(min(col("_j")).as("_j"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_j").asc, col("_i").asc)
    fresh.withColumn("draw_rank", row_number().over(w).cast("long"))
      .filter(col("draw_rank") <= k)
      .select(col("_k").as(key), col("_i").as(item), col("draw_rank"))
  }
}
