package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixingSpec extends AnyFunSuite with SparkTestBase {

  test("groupwiseRank == per-group window row_number across partition counts") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val df = (1 to 600)
      .map(i => (i.toLong, s"g${rng.nextInt(7)}"))
      .toDF("id", "g")
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    val expect = df.withColumn("grp_rank", row_number().over(w).cast("long"))
      .select("id", "g", "grp_rank").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 4, 9)) {
      val got = graft.ops.Mixing.groupwiseRank(df, "g", Seq(col("id")), numPartitions = parts)
        .select("id", "g", "grp_rank").as[(Long, String, Long)]
        .collect().sortBy(_._1).toSeq
      assert(got == expect, s"mismatch at numPartitions=$parts")
    }
  }

  test("interleaveBySource: stride order weaves sources at their rates") {
    import spark.implicits._
    // a: inv 1.0 (base rate), b: inv 0.5 (twice as often)
    val docs = ((1 to 4).map(i => (i.toLong, "a")) ++
      (11 to 18).map(i => (i.toLong, "b"))).toDF("id", "src")
    val inv = Seq(("a", "1.0"), ("b", "0.5")).toDF("src", "inv_w")
    val got = graft.ops.Mixing.interleaveBySource(docs, "src", Seq(col("id")), inv)
      .orderBy(col("mix_pos_micro"), col("src"), col("grp_rank"))
      .select("src", "grp_rank").as[(String, Long)].collect().toSeq
    // positions: b1@0.5, a1@1.0, b2@1.0 (tie → a first), b3@1.5, a2@2.0,
    // b4@2.0, b5@2.5, a3@3.0, b6@3.0, b7@3.5, a4@4.0, b8@4.0
    assert(got == Seq(("b", 1L), ("a", 1L), ("b", 2L), ("b", 3L), ("a", 2L),
      ("b", 4L), ("b", 5L), ("a", 3L), ("b", 6L), ("b", 7L), ("a", 4L), ("b", 8L)))
    // rate check: in any prefix between integer positions, b appears ~2× a
    assert(got.take(6).count(_._1 == "b") == 4)
  }

  test("interleaveBySource: sources absent from the weight table are dropped") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "zzz")).toDF("id", "src")
    val inv = Seq(("a", "1.0")).toDF("src", "inv_w")
    val got = graft.ops.Mixing.interleaveBySource(docs, "src", Seq(col("id")), inv)
    assert(got.select("src").as[String].collect().toSeq == Seq("a"))
  }
}
