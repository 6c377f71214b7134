package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so the
  * scan pushdown / broadcast / codegen shape can be reviewed per round. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary", "q3_top_revenue_orders", "q5_local_volume",
      "w4_lww_latest", "x1_dedup_exact", "x2_topk_cosine", "x6_json_filter_agg",
      "skew_salted_join", "storage_bucketed_join", "w5_scd2_history",
      "w6_cdc_apply", "x1_embedding_neardup_exact",
      "sql_q21_sole_blame", "sql_lateral_topn", "agg_reaggregate_monthly",
      "layout_zorder_values", "mix_epoch_replicate")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra confs via QTIME_CONF="key=val,..." (QTime's A/B convention)
    // so before/after plan dumps can pin a kill-switch arm
    sys.env.get("QTIME_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
