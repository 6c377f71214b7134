package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: drives the flagship `SparkEntry.entry` exactly the
  * way the driver's t1 smoke does (rows>0 on sf0.001) and prints the
  * result head, so a round's entry chain is exercised end-to-end before
  * committing. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.printSchema()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
