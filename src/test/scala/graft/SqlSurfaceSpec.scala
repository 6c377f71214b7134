package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.InlineMetrics

/** Spark 4 SQL/API surfaces beyond the gated queries: in-flight
  * observe metrics (the batch third of the S9 notification story),
  * named-parameter SQL (injection-safe parameterization), and
  * approx_top_k (heavy-hitter sketch beside the exact Misra-Gries op).
  * The recursive-CTE and listagg surfaces are oracle-gated
  * (`sql_recursive_tree`, `sql_listagg_nations`) and not re-tested
  * here. */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("InlineMetrics.auditObservation: counters ride the action, rows unchanged") {
    val df = Seq(
      (1L, Some("a"), 10L), (2L, None, 30L), (3L, Some("c"), 20L), (4L, None, 5L)
    ).toDF("id", "name", "ts")
    val (observed, obs) = InlineMetrics.auditObservation(df, Seq("name"), "ts")
    // downstream transforms compose on the instrumented frame; the
    // metrics are collected by THIS action, not a second scan
    val out = observed.filter($"id" =!= 999L).collect()
    assert(out.length == 4)
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("name_nulls") == 2L)
    assert(m("ts_min") == 5L && m("ts_max") == 30L)
  }

  test("named-parameter SQL: bound args equal inlined literals") {
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "g").createOrReplaceTempView("nps")
    val bound = spark.sql(
      "SELECT g, count(*) AS n FROM nps WHERE k <= :kmax GROUP BY g ORDER BY g",
      Map("kmax" -> 2)).collect().toSeq
    val literal = spark.sql(
      "SELECT g, count(*) AS n FROM nps WHERE k <= 2 GROUP BY g ORDER BY g")
      .collect().toSeq
    assert(bound == literal)
  }

  test("approx_top_k: exact on small cardinality, agrees with GROUP BY") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(1)("z"))
      .toDF("v")
    val got = df.selectExpr("approx_top_k(v, 2) AS t")
      .selectExpr("explode(t) AS e").selectExpr("e.item", "e.count")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 5L), ("y", 3L)))
  }
}
