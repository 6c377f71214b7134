package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops.Bloom: no false negatives ever, false-positive rate near the
  * design point, and the composed semi-join exactly equals the plain
  * semi-join. */
class BloomSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val numWords = 256 // 16384 bits
  private val k = 5

  test("membership: zero false negatives; FP rate near theory") {
    val members = (0L until 1000L).map(i => i * 7919L)
    val bits = graft.ops.Bloom.buildBits(members.toDF("key"), "key", numWords, k)
    def hitCount(keys: Seq[Long]): Long =
      keys.toDF("key").crossJoin(broadcast(bits))
        .filter(graft.ops.Bloom.mightContain(col("key"), col("_bloom_bits"), numWords, k))
        .count()
    assert(hitCount(members) == members.size) // no false negatives, ever
    // disjoint probe set: n=1000, m=16384, k=5 → theoretical FP ≈ 1.6%
    val probes = (0L until 4000L).map(i => i * 7919L + 3L)
    val fp = hitCount(probes).toDouble / probes.size
    assert(fp < 0.05, s"false-positive rate $fp")
  }

  test("bloomSemiJoin == plain left_semi join") {
    val large = (0L until 5000L).map(i => (i, i % 97L)).toDF("row_id", "fk")
    val small = Seq(3L, 11L, 42L, 96L, 1000L).toDF("pk")
    val got = graft.ops.Bloom.bloomSemiJoin(large, small, "fk", "pk", numWords, k)
      .select("row_id").as[Long].collect().sorted.toSeq
    val expect = large.join(small.withColumnRenamed("pk", "fk"), Seq("fk"), "left_semi")
      .select("row_id").as[Long].collect().sorted.toSeq
    assert(got == expect)
  }

  test("bloomSemiJoin with mixed integral key types: no false negatives") {
    // xxhash64 hashes int and long DIFFERENTLY for the same value — the
    // op must widen both sides before hashing, or the prefilter drops
    // nearly every true match
    val large = (0L until 2000L).map(i => (i, i % 97L)).toDF("row_id", "fk") // fk: BIGINT
    val small = Seq(3, 11, 42, 96).toDF("pk") // pk: INT
    val got = graft.ops.Bloom.bloomSemiJoin(large, small, "fk", "pk", numWords, k)
      .count()
    val expect = large.filter(col("fk").isin(3, 11, 42, 96)).count()
    assert(got == expect && expect > 0)
    // non-coercible mix refuses instead of silently false-negativing
    val bad = Seq("3", "11").toDF("pk")
    intercept[IllegalArgumentException] {
      graft.ops.Bloom.bloomSemiJoin(large, bad, "fk", "pk", numWords, k)
    }
  }
}
