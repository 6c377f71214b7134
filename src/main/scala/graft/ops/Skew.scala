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

  /** Deterministic per-row salt derived from the whole row's hash —
    * stable across retries (no rand(), which would break task replays). */
  private def salt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(factor)).cast("int")

  /** Salted inner equi-join of a skewed `fact` against `dim` on `key`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factor: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(fact, factor))
    val explodedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group-by keys:
    * count/sum-like aggregates per (key, salt) first, then re-aggregate
    * per key. Spark's hash aggregate already partial-aggregates map-side,
    * so this is only worth it when a single key overwhelms even one
    * reducer partition — i.e. the salt spreads ONE key over `factor`
    * reducers. */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame =
    df.withColumn("_salt", salt(df, factor))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).cast("long").as("n"))
}
