package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gates for the round-4 queries: the optimizations
  * the suite's docs claim (scan pushdown, rank-limit pushdown, broadcast
  * dims) must be visible in the physical plan, not just assumed. String
  * matching on executedPlan is crude but catches silent regressions
  * (e.g. a cast added before a filter column kills parquet pushdown). */
class PlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q6: every predicate reaches the parquet scan") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters"))
    assert(p.contains("l_shipdate") && p.contains("l_discount") && p.contains("l_quantity"))
    // filter pushdown present for the date bounds specifically
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("GreaterThanOrEqual(l_shipdate,"))
  }

  test("quantized ANN: both rank stages push the group limit") {
    val p = plan("x2_ann_quantized")
    // proxy shortlist + exact rerank each get a WindowGroupLimit
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.linesIterator.take(30).mkString("\n"))
  }

  test("q10: top-20 plans as TakeOrderedAndProject, dims broadcast") {
    val p = plan("q10_returned_customers")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("window_range_rolling: value-based RANGE frame, not ROWS") {
    val p = plan("window_range_rolling")
    assert(p.contains("RANGE BETWEEN") || p.contains("specifiedwindowframe(RangeFrame"))
    assert(!p.contains("ROWS BETWEEN"))
  }
}
