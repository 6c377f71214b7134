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

  test("sortedNeighborhood: every ≤w-apart pair exactly once, == brute force") {
    val rng = new scala.util.Random(17)
    val rows = (0L until 120L).map(i => (i, rng.nextInt(40).toLong))
    val df = rows.toDF("id", "v").repartition(7)
    val got = Linkage.sortedNeighborhood(df,
        Seq(col("v").asc, col("id").asc), "id", w = 4)
      .select(col("id_a"), col("id_b"), col("rank_a"), col("rank_b"))
      .as[(Long, Long, Long, Long)].collect()
    // brute force over the explicitly sorted order
    val sorted = rows.sortBy { case (id, v) => (v, id) }.map(_._1)
    val ref = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + 5, sorted.size)
    } yield (sorted(i), sorted(j), i + 1L, j + 1L)).toSet
    assert(got.length == got.toSet.size, "a pair materialized twice")
    assert(got.toSet == ref)
  }

  test("prefix-sum union safety: result unioned with itself keeps correct ranks") {
    // regression for the TaskContext.getPartitionId() bug: a narrow
    // self-union renumbers stage tasks P..2P−1; ranks must not shift
    val df = (1L to 50L).toDF("id").repartition(5)
    val ranked = graft.ops.Packing.assignShardsOrdered(
      df.withColumn("_one", lit(1L)), Seq(col("id").asc), "_one",
      budget = Long.MaxValue)
    val unioned = ranked.unionByName(ranked)
      .select(col("id"), col("cum_w")).as[(Long, Long)].collect()
    assert(unioned.length == 100 && unioned.forall { case (id, r) => r == id })
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
