package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query timings after a warm-up pass, to separate one-time
  * JVM/codegen costs from steady-state query cost (Bench.main measures
  * cold-first which attributes session warm-up to whichever query runs
  * first). */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: touch every table + codegen paths
    graft.SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => }
    }
    val results = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    results.sortBy(-_._2).foreach { case (n, t) => println(f"[warm] $t%8.2f  $n") }
    println(f"[warm] total ${results.map(_._2).sum}%.2f s")
    spark.stop()
  }
}
