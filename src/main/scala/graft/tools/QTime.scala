package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run named queries from SparkEntry.queries N times each in a
  * fresh session and print per-run timings — separates first-run
  * (codegen/scan warm-up) cost from steady state for ONE query without
  * the full-suite noise. Usage: QTime <sfDir> <q1,q2,...> [reps]. */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    // core count from SPARK_GRAFT_CPUS (default 32) so the driver's
    // low-core scaling sweep is reproducible query-by-query
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra confs via QTIME_CONF="key=val,key=val" for A/B experiments
    sys.env.get("QTIME_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        println(f"[qtime] $n%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
