package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops.Reagg: folding fine-grain partials into a coarser grain must
  * equal aggregating the raw facts directly at that grain — including
  * the avg, which must come from merged sum÷count (avg-of-avgs breaks
  * under unequal bucket sizes, as the second test proves). */
class ReaggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val facts = Seq(
    // (key, day, value) — deliberately unequal bucket sizes
    ("a", "2024-01-01", 10.0), ("a", "2024-01-01", 20.0), ("a", "2024-01-01", 30.0),
    ("a", "2024-01-02", 100.0),
    ("b", "2024-01-01", 1.0), ("b", "2024-02-03", 2.0), ("b", "2024-02-04", 4.0)
  ).toDF("k", "day_s", "v").select(col("k"), to_date(col("day_s")).as("d"), col("v"))

  test("daily partials folded to month == direct monthly aggregation") {
    val daily = graft.ops.Reagg.partials(facts, Seq("k"), col("d"), col("v"))
    val monthly = graft.ops.Reagg.mergeToCoarser(daily, Seq("k"),
        date_trunc("month", col("bucket")))
      .select(col("bucket"), col("k"), col("n"),
        col("total").cast("double").as("total"), col("mn"), col("mx"),
        col("avg_v").cast("double").as("avg_v"))
      .orderBy("bucket", "k")
    val direct = facts
      .groupBy(date_trunc("month", col("d")).as("bucket"), col("k"))
      .agg(count(col("v")).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("total"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn("avg_v",
        (col("total").cast("decimal(18,2)") / col("n")).cast("decimal(18,6)").cast("double"))
      .orderBy("bucket", "k")
    assert(monthly.collect().toSeq == direct.collect().toSeq)
  }

  test("avg-of-avgs is NOT the merged avg under unequal buckets (the trap the op avoids)") {
    val daily = graft.ops.Reagg.partials(facts, Seq("k"), col("d"), col("v"))
    val avgOfAvgs = daily
      .withColumn("day_avg", col("p_sum") / col("p_count"))
      .groupBy(date_trunc("month", col("bucket")).as("bucket"), col("k"))
      .agg(avg(col("day_avg")).as("bad_avg"))
      .filter(col("k") === "a")
      .select(round(col("bad_avg").cast("double"), 6)).as[Double].head()
    val merged = graft.ops.Reagg.mergeToCoarser(daily, Seq("k"),
        date_trunc("month", col("bucket")))
      .filter(col("k") === "a")
      .select(col("avg_v").cast("double")).as[Double].head()
    // a: Jan values 10,20,30,100 → true avg 40; avg-of-avgs (20+100)/2 = 60
    assert(merged == 40.0)
    assert(avgOfAvgs == 60.0)
  }
}
