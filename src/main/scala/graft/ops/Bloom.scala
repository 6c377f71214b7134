package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pre-filtering — the scale pattern for "big
  * fact ∈ medium key set" when the key set is too large to broadcast
  * as a hash relation but its BITS fit anywhere: the filter side folds
  * to a fixed-size bit array (distributed bit_or, collected once at
  * O(bits), never O(keys)), rides to every scan task, and discards
  * non-matching fact rows BEFORE the shuffle the exact semi-join would
  * otherwise pay on the full fact table. Spark's AQE injects the same
  * trick as runtime filters; this is the explicit, composable form.
  *
  * Everything is native expressions (xxhash64 probes + shift/mask bit
  * tests — whole-stage codegen'd; no UDF, no driver-side hashing of
  * fact rows). No false negatives ever; false positives only cost
  * wasted rows in the exact join that follows, so composed results are
  * EXACT (gated against the plain semi-join oracle).
  */
object Bloom {

  /** One-row DataFrame holding the filter's bit words (`_bloom_bits`:
    * array<long> of `numWords`). k probe positions per key via seeded
    * xxhash64; words folded with bit_or — associative, so the build is
    * one hash-agg over (word index) with map-side combine. */
  def buildBits(keys: DataFrame, key: String, numWords: Int,
      numHashes: Int): DataFrame = {
    val spark = keys.sparkSession
    val m = numWords.toLong * 64L
    val probes = (0 until numHashes).map(i =>
      pmod(xxhash64(col(key), lit(i)), lit(m)))
    val words = keys
      // NULL keys never match a semi-join (SQL IN semantics) — and a
      // null probe position would NPE the word assembly below
      .filter(col(key).isNotNull)
      .select(explode(array(probes: _*)).as("_p"))
      .select((col("_p") / 64).cast("int").as("_w"),
        call_function("shiftleft", lit(1L), (col("_p") % 64).cast("int")).as("_b"))
      .groupBy(col("_w")).agg(bit_or(col("_b")).as("_word"))
      .collect()
    val bits = new Array[Long](numWords)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    import spark.implicits._
    Seq(Tuple1(bits.toSeq)).toDF("_bloom_bits")
  }

  /** Membership test against a `_bloom_bits` column (array<long>): all
    * k probe bits set. Pure codegen'd expressions. */
  def mightContain(key: Column, bits: Column, numWords: Int,
      numHashes: Int): Column = {
    val m = numWords.toLong * 64L
    (0 until numHashes).map { i =>
      val h = pmod(xxhash64(key, lit(i)), lit(m))
      val word = call_function("element_at", bits, (h / 64).cast("int") + 1)
      call_function("shiftright", word, (h % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Exact semi-join with a Bloom pre-filter: `large` rows whose
    * `largeKey` appears in `small`'s `smallKey` set. The pre-filter
    * prunes fact rows scan-side; the exact semi-join on the survivors
    * removes Bloom false positives, so the result equals the plain
    * semi-join row-for-row. */
  def bloomSemiJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      numWords: Int = 1 << 14, numHashes: Int = 5): DataFrame = {
    // xxhash64 hashes by PHYSICAL type (int 5 and bigint 5 hash
    // differently), so build and probe must hash the same type or the
    // prefilter false-negatives its way to a silently near-empty
    // result. Same type: hash as-is. Both integral: widen both to long
    // (lossless). Anything else mixed: refuse — a silent fix isn't
    // possible without knowing the caller's coercion intent.
    import org.apache.spark.sql.types._
    val lt = large.schema(largeKey).dataType
    val st = small.schema(smallKey).dataType
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val (probeKey, buildKey): (Column, Column) =
      if (lt == st) (col(largeKey), col(smallKey))
      else if (integral(lt) && integral(st))
        (col(largeKey).cast("long"), col(smallKey).cast("long"))
      else throw new IllegalArgumentException(
        s"bloomSemiJoin key types differ and are not both integral: $lt vs $st")
    val bitsDf = buildBits(small.select(buildKey.as(smallKey)), smallKey, numWords, numHashes)
    val prefiltered = large
      .crossJoin(broadcast(bitsDf))
      .filter(mightContain(probeKey, col("_bloom_bits"), numWords, numHashes))
      .drop("_bloom_bits")
    // no distinct() on the build side: left_semi semantics are identical
    // with duplicate keys, and the dedup would cost an extra exchange;
    // mixed integral types coerce via the join's own widening
    prefiltered.join(
      small.select(col(smallKey).as(largeKey)),
      Seq(largeKey), "left_semi")
  }
}
