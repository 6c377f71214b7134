package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (SURVEY §7.4.4 / the 100 TB
  * design rules). AQE's skew-join split handles sort-merge cases at
  * runtime; explicit salting is the deterministic fallback when a
  * shuffled join must survive a pathological key (e.g. the null-ish
  * "unknown user" owning 1% of a 100 TB fact table).
  *
  * Shape: the fact side gets a random-but-deterministic salt in
  * [0, factor); the dim side is exploded ×factor so every salted key
  * still finds its row. Dim inflation ×factor is the price — use only on
  * genuinely skewed keys (detect first via approx frequency) and keep
  * factor small (8-32).
  */
object Skew {

  /** Deterministic per-row salt derived from the row's content hash —
    * stable across retries (no rand(), which would break task replays;
    * no partition-dependent ids, which a retry on a different split
    * would change). MapType columns are skipped (xxhash64 rejects
    * maps); nested maps inside structs/arrays likewise.
    *
    * Degeneracy caveat: content-identical rows of a hot key all hash to
    * ONE salt — the spread silently vanishes. If the fact frame was
    * projected down to the key alone, or hot rows are duplicated
    * sentinels, include a unique id column in the frame before salting;
    * content hashing cannot spread what it cannot distinguish. */
  private def salt(df: DataFrame, factor: Int): Column = {
    def hashSafe(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashSafe(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashSafe(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashSafe(f.dataType)).map(f => col(f.name))
    require(cols.nonEmpty, "no hashable (non-map) columns to derive a salt from")
    pmod(xxhash64(cols.toSeq: _*), lit(factor)).cast("int")
  }

  /** Salted inner equi-join of a skewed `fact` against `dim` on `key`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val saltedFact = fact.withColumn("_salt", salt(fact, factor))
    val explodedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Misra-Gries heavy-hitter sketch over long keys: `counters`-bounded
    * frequency map with total-count tracking. Mergeable (Agarwal et al.,
    * "Mergeable Summaries"): per-partition partial sketches combine
    * associatively, so the full pass is one narrow-partition scan whose
    * state is O(counters) regardless of data size — the detection pass
    * that decides WHICH keys need [[saltedJoin]] before a 100 TB
    * shuffle. Runs as a mutable per-partition fold (one java.util
    * HashMap per task): the earlier typed-Aggregator form rebuilt an
    * immutable Map PER ROW, and on high-cardinality inputs — where the
    * full-decrement branch fires constantly — the allocation storm made
    * census cost swing 5-25 s on a 30 M-row probe; this form holds
    * steady. Decrement events stay amortized O(1)/row (each full
    * decrement pays O(counters) but fires ≤ n/(counters+1) times).
    *
    * Guarantee: every key whose true count exceeds n/(counters+1)
    * survives the partial sketches AND the merge (undercounted, never
    * missed). Returns (merged key→count map, total row count). */
  def misraGriesSketch(keyed: DataFrame, counters: Int): (Map[Long, Long], Long) = {
    import keyed.sparkSession.implicits._
    val partials: Array[(Map[Long, Long], Long)] =
      keyed.as[Long].mapPartitions { it =>
        val m = new java.util.HashMap[java.lang.Long, java.lang.Long](counters * 2)
        var n = 0L
        while (it.hasNext) {
          val k: java.lang.Long = it.next()
          n += 1
          val c = m.get(k)
          if (c != null) m.put(k, c + 1L)
          else if (m.size < counters) m.put(k, 1L)
          else {
            val iter = m.entrySet().iterator()
            while (iter.hasNext) {
              val e = iter.next()
              if (e.getValue <= 1L) iter.remove()
              else e.setValue(e.getValue - 1L)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        Iterator.single((m.asScala.map { case (k, v) => (k.longValue, v.longValue) }.toMap, n))
      }.collect()
    // driver merge of ≤ numPartitions sketches (bounded: P × counters
    // entries): sum counts, then subtract the (counters+1)-th largest and
    // keep positives — the standard MG merge that preserves the bound
    partials.foldLeft((Map.empty[Long, Long], 0L)) { case ((am, an), (bm, bn)) =>
      val combined = (am.keySet ++ bm.keySet).iterator
        .map(k => k -> (am.getOrElse(k, 0L) + bm.getOrElse(k, 0L))).toMap
      val trimmed =
        if (combined.size <= counters) combined
        else {
          val s = combined.values.toSeq.sortBy(-_)(Ordering.Long)(counters)
          combined.flatMap { case (k, c) => if (c > s) Some(k -> (c - s)) else None }
        }
      (trimmed, an + bn)
    }
  }

  /** EXACT heavy hitters via sketch + verify — the two-pass production
    * pattern: pass 1 runs the bounded-state Misra-Gries sketch to get a
    * candidate superset (provably no true heavy hitter is missed when
    * `counters + 1 > 1000 / perMille`); pass 2 exact-counts ONLY the
    * ≤`counters` candidates via a broadcast semi-join (the corpus never
    * shuffles) and keeps keys with `count * 1000 > n * perMille`.
    * Integer threshold arithmetic ⇒ deterministic and oracle-exact. */
  def heavyHitters(df: DataFrame, key: String, perMille: Int = 1,
      counters: Int = 2048): DataFrame = {
    // missed keys have count ≤ n/(counters+1); a heavy hitter has count
    // > n·perMille/1000 — no miss possible iff perMille·(counters+1) ≥ 1000
    require(perMille.toLong * (counters + 1) >= 1000L,
      s"counters=$counters too small for perMille=$perMille: sketch could miss true heavy hitters")
    // NULL keys (and keys that don't cast to long) are excluded: the
    // typed Aggregator's primitive-Long encoder rejects nulls outright,
    // and a SQL NULL never equi-joins anyway — a null-heavy table is the
    // dim-side "unknown member" problem, detected by a plain
    // count(key IS NULL), not by key-frequency sketching
    val keyed = df.select(col(key).cast("long").as("_ck")).filter(col("_ck").isNotNull)
    val (sketch, n) = misraGriesSketch(keyed, counters)
    import keyed.sparkSession.implicits._
    val candidates = sketch.keys.toSeq.toDF("_ck")
    keyed
      .join(broadcast(candidates), Seq("_ck"))
      .groupBy(col("_ck"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") * 1000 > lit(n) * perMille)
      .select(col("_ck").as(key), col("n_rows"))
  }

  /** EXACT keys over an ABSOLUTE row-count threshold — the census
    * [[autoSaltedJoin]] needs. Same two-pass shape as [[heavyHitters]]
    * (Misra-Gries candidate superset, then exact counts for ≤`counters`
    * candidates via a broadcast semi-join), but the verify pass keeps
    * `count > threshold` DIRECTLY — no relative per-mille routing, so a
    * key just over the threshold survives even when it is far below
    * 0.1% of n (the gap [[heavyHitters]]-based detection silently
    * dropped: at n ≈ 4 B and a 2 M threshold, keys with 2–4 M rows are
    * heavy enough to spill a task yet under the per-mille cut).
    *
    * Detection bound, stated honestly: the sketch only guarantees a
    * candidate for keys with count > n/(counters+1), so the census is
    * COMPLETE iff `(counters+1)·threshold ≥ n`. The sketch pass returns
    * n, so the bound is CHECKED, not assumed: when it fails the sketch
    * is RE-RUN with the counters the bound demands (one extra pass over
    * `df`; driver state stays one map of `counters` entries), capped at
    * `maxCounters`. If even the cap cannot meet the bound (n >
    * (maxCounters+1)·threshold — 1e14-row corpora with small
    * thresholds, where ANY one-pass deterministic sketch needs
    * n/threshold counters), detection degrades gracefully to keys with
    * count > n/(maxCounters+1) and the returned keys are still exact —
    * the caller's output stays correct; only borderline-hot keys may go
    * uncensused, and the effective bound is in this doc, not hidden. */
  def heavyKeysOver(df: DataFrame, key: String, threshold: Long,
      counters: Int = 2048, maxCounters: Int = 1 << 20): DataFrame = {
    require(threshold > 0, "heavyKeysOver: threshold must be positive")
    val keyed = df.select(col(key).cast("long").as("_ck")).filter(col("_ck").isNotNull)
    val (sketch0, n) = misraGriesSketch(keyed, counters)
    val sketch =
      if ((counters + 1).toLong * threshold >= n) sketch0
      else {
        // bound failed: one re-run at the size that restores it (capped)
        val need = math.min(maxCounters.toLong, n / threshold + 1).toInt
        if (need <= counters) sketch0 else misraGriesSketch(keyed, need)._1
      }
    import keyed.sparkSession.implicits._
    val candidates = sketch.keys.toSeq.toDF("_ck")
    keyed
      .join(broadcast(candidates), Seq("_ck"))
      .groupBy(col("_ck"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > threshold)
      .select(col("_ck").as(key), col("n_rows"))
  }

  /** Census-driven salted join — the production form of [[saltedJoin]]
    * that closes its two scale flaws: a FIXED factor (too small spills,
    * too big inflates) and a WHOLE-dim explosion (×factor rows for
    * every key, hot or not). One Misra-Gries pass (bounded state,
    * O(counters) driver rows) finds the keys whose row count exceeds
    * `targetRowsPerTask` — the per-task budget a single reducer
    * partition should hold without spilling. Only those HOT keys take
    * the salted path, with the factor sized from the census:
    * `ceil(maxHotCount / targetRowsPerTask)` — so the largest salted
    * partition fits the budget by construction. Everything else joins
    * plain. No skew → exactly a plain join: zero inflation, zero
    * extra shuffle, output identical either way (inner equi-join is
    * partition-agnostic).
    *
    * Sizing at 100 TB: detection runs through [[heavyKeysOver]], which
    * verifies sketch candidates DIRECTLY against `targetRowsPerTask`
    * (no relative per-mille cut — the old heavyHitters routing silently
    * dropped keys between the task budget and 0.1% of n). The complete
    * no-miss guarantee is `(counters+1)·targetRowsPerTask ≥ n`; the
    * census checks that bound against the sketch's own n and auto-grows
    * the sketch to meet it (capped — see [[heavyKeysOver]] for the
    * degraded bound past the cap). Keys that cannot cast to long (and
    * NULLs, which never equi-join) always take the plain path. */
  def autoSaltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      targetRowsPerTask: Long = 2L << 20, maxFactor: Int = 256,
      counters: Int = 2048): DataFrame = {
    require(targetRowsPerTask > 0, "targetRowsPerTask must be positive")
    // census: exact counts for the sketch's candidate superset; keep
    // keys over the per-task budget (driver receives ≤ counters rows)
    val hot = heavyKeysOver(fact, key, targetRowsPerTask, counters)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    if (hot.isEmpty) fact.join(dim, Seq(key))
    else {
      val factor = math.min(maxFactor.toLong,
        (hot.map(_._2).max + targetRowsPerTask - 1) / targetRowsPerTask).toInt
      val hotKeys = hot.map(_._1)
      val isHot = col(key).cast("long").isin(hotKeys.toIndexedSeq: _*)
      val salted = saltedJoin(fact.filter(isHot), dim.filter(isHot),
        key, math.max(2, factor))
      // cold fact rows (incl. non-castable keys: isHot is null-safe
      // false for them) join the UNINFLATED dim
      salted.unionByName(fact.filter(!coalesce(isHot, lit(false)))
        .join(dim, Seq(key))
        .select(salted.columns.map(col).toIndexedSeq: _*))
    }
  }

  /** Two-phase (partial → final) aggregation for skewed group-by keys:
    * count/sum-like aggregates per (key, salt) first, then re-aggregate
    * per key. Spark's hash aggregate already partial-aggregates map-side,
    * so this is only worth it when a single key overwhelms even one
    * reducer partition — i.e. the salt spreads ONE key over `factor`
    * reducers. */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    df.withColumn("_salt", salt(df, factor))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).cast("long").as("n"))
  }
}
