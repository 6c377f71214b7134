package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Profiling

class ProfilingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("mostCommonValues: ranked by count desc then value asc; nulls excluded; k caps") {
    val df = Seq("b", "b", "b", "a", "a", "c", "a", null, null)
      .toDF("x").withColumn("y", lit(1L))
    val got = Profiling.mostCommonValues(df, Seq("x"), k = 2)
      .as[(String, Long, String, Long)].collect().toSeq.sorted
    // a and b tie at 3 → 'a' first (string asc); c cut by k=2; nulls gone
    assert(got == Seq(("x", 1L, "a", 3L), ("x", 2L, "b", 3L)))
  }

  test("mostCommonValues: numeric columns group natively, render as strings") {
    // 10 vs 9: numeric grouping must not merge or misorder them; with
    // equal counts the STRING tie-break puts "10" before "9"
    val df = Seq(10L, 9L, 10L, 9L).toDF("v")
    val got = Profiling.mostCommonValues(df, Seq("v"), k = 5)
      .as[(String, Long, String, Long)].collect().toSeq.sorted
    assert(got == Seq(("v", 1L, "10", 2L), ("v", 2L, "9", 2L)))
  }

  test("mostCommonValues == window-rank reference on random data, any partitioning") {
    val rng = new scala.util.Random(5)
    val data = Seq.fill(500)(s"k${rng.nextInt(40)}")
    val df = data.toDF("c").repartition(7)
    val got = Profiling.mostCommonValues(df, Seq("c"), k = 6)
      .as[(String, Long, String, Long)].collect().toSet
    val ref = data.groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
      .toSeq.sortBy { case (v, n) => (-n, v) }.take(6).zipWithIndex
      .map { case ((v, n), i) => ("c", i + 1L, v, n) }.toSet
    assert(got == ref)
  }
}
