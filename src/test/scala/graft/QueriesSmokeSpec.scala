package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression net: every registered query runs on sf0.001 and returns
  * rows; every query has either an oracle or a documented exemption;
  * flagship entry is non-empty (the driver's t1 smoke, locally). */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  // Ops whose results are sketch/recall-dependent and deliberately have
  // no SQL oracle (SURVEY §5.1) — keep this list justified and short.
  // (The ANN family and the BPE merge loop left this list in round 5:
  // ANN queries gate through Similarity.annVerdict — hash-matched
  // property verdicts vs the in-query exact top-k — quantized ANN
  // inherits the exact twin outright, and the BPE loop oracles via the
  // double-space replace() encoding of leftmost-greedy.)
  private val noOracleAllowed = Set(
    "x3_minhash_neardup", "x3_simhash_neardup",
    "x1_embedding_neardup",
    // approx sketch values are impl-defined (HLL++/GK); bounds unit-tested
    "sketch_approx_events",
    // seeded RNG draw is engine-defined; fractions unit-tested
    "x1_stratified_sample")

  test("every query has an oracle or a documented exemption") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleAllowed
    assert(missing.isEmpty, s"queries missing oracle SQL: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracle SQL without query: $stale")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs and returns rows on sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
