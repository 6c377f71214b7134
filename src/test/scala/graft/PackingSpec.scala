package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed two-phase prefix sum must be byte-identical to the
  * naive global window, for any partition count. */
class PackingSpec extends AnyFunSuite with SparkTestBase {

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_w", sum(col("w")).over(w))
      .withColumn("shard", floor((col("cum_w") - col("w")) / lit(100L)))
  }

  test("assignShards == global-window prefix sum across partition counts") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val df = (1 to 500).map(i => (i.toLong, (rng.nextInt(40) + 1).toLong)).toDF("k", "w")
    val expect = naive(df).select("k", "cum_w", "shard").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 3, 8)) {
      val got = graft.ops.Packing.assignShards(df, "k", "w", 100L, numPartitions = parts)
        .select("k", "cum_w", "shard").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      assert(got == expect, s"mismatch at numPartitions=$parts")
    }
  }

  test("every shard starts within budget (first doc offset < budget boundary)") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, 37L)).toDF("k", "w")
    val out = graft.ops.Packing.assignShards(df, "k", "w", 100L, numPartitions = 4)
    // doc starts at cum_w - w; its shard must be (cum_w - w) / 100
    val bad = out.filter(col("shard") =!= floor((col("cum_w") - col("w")) / lit(100L))).count()
    assert(bad == 0L)
  }
}
