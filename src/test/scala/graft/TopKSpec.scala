package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TopK

/** Bounded top-k Aggregator: must agree with the window+rank form,
  * including tie-breaks, and stay O(k) per group. */
class TopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("TopK aggregator == window row_number top-k, with ties") {
    val df = Seq(
      ("g1", 0.9, 1L), ("g1", 0.8, 2L), ("g1", 0.9, 3L), ("g1", 0.1, 4L),
      ("g2", 0.5, 5L), ("g2", 0.5, 6L), ("g2", 0.5, 7L)
    ).toDF("g", "score", "id")

    val viaAgg = df.groupBy(col("g"))
      .agg(TopK.topK(2)(col("score"), col("id")).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t._1").as("score"), col("t._2").as("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .select(col("g"), col("score"), col("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    assert(viaAgg == viaWindow)
    assert(viaAgg == Set(("g1", 0.9, 1L), ("g1", 0.9, 3L), ("g2", 0.5, 5L), ("g2", 0.5, 6L)))
  }

  test("TopK with fewer rows than k returns all, sorted") {
    val df = Seq(("g", 0.1, 9L), ("g", 0.7, 8L)).toDF("g", "score", "id")
    val out = df.groupBy(col("g")).agg(TopK.topK(5)(col("score"), col("id")).as("top"))
      .select(col("top")).as[Seq[(Double, Long)]].collect().head
    assert(out == Seq((0.7, 8L), (0.1, 9L)))
  }

  test("string TopK == window (count desc, term asc), ties broken lexically, partition-invariant") {
    val rows = Seq(("g1", 5L, "zeta"), ("g1", 5L, "alpha"), ("g1", 9L, "mid"),
      ("g1", 1L, "low"), ("g2", 2L, "only"))
    for (parts <- Seq(1, 4)) {
      val df = rows.toDF("g", "c", "w").repartition(parts)
      val viaAgg = df.groupBy(col("g"))
        .agg(TopK.topKByCount(2)(col("c"), col("w")).as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t._1").as("c"), col("t._2").as("w"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      // tie at 5: 'alpha' beats 'zeta' lexically
      assert(viaAgg == Set(("g1", 9L, "mid"), ("g1", 5L, "alpha"), ("g2", 2L, "only")),
        s"parts=$parts")
    }
  }
}
