package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Linkage

class LinkageSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("blockedPairs: within-block cross product only; oversized blocks dropped") {
    val a = Seq((1L, "b1"), (2L, "b1"), (3L, "b2"),
        (10L, "hot"), (11L, "hot"), (12L, "hot"))
      .toDF("l_id", "blk")
    val b = Seq((21L, "b1"), (22L, "b2"), (23L, "b2"), (30L, "hot"))
      .toDF("r_id", "blk")
    val got = Linkage.blockedPairs(a, b, Seq("blk"), maxBlock = 2)
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet
    // b1: 2×1 pairs; b2: 1×2; hot: 3 rows on the left > cap → dropped
    // entirely even though the right side is small
    assert(got == Set((1L, 21L), (2L, 21L), (3L, 22L), (3L, 23L)))
  }

  test("scoreAndClassify: exact integer sum, inclusive thresholds") {
    val pairs = Seq((1L, true, true), (2L, true, false), (3L, false, false))
      .toDF("id", "f1", "f2")
    val got = Linkage.scoreAndClassify(pairs,
        Seq(when(col("f1"), 3000000L).otherwise(-1000000L),
          when(col("f2"), 1000000L).otherwise(-1000000L)),
        linkAt = 4000000L, possibleAt = 2000000L)
      .select(col("id"), col("score_micro"), col("decision"))
      .as[(Long, Long, String)].collect().toSet
    // id 1: 4.0M == linkAt exactly → link (inclusive);
    // id 2: 2.0M == possibleAt exactly → possible; id 3: -2M → nonlink
    assert(got == Set((1L, 4000000L, "link"), (2L, 2000000L, "possible"),
      (3L, -2000000L, "nonlink")))
  }

  test("guards: empty comparator list and inverted thresholds reject loudly") {
    val df = Seq((1L, 1L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Linkage.scoreAndClassify(df, Seq.empty, 1L, 0L)
    }
    intercept[IllegalArgumentException] {
      Linkage.scoreAndClassify(df, Seq(lit(1L)), linkAt = 0L, possibleAt = 1L)
    }
    intercept[IllegalArgumentException] {
      Linkage.blockedPairs(df, df, Seq("a"), maxBlock = 0)
    }
  }
}
