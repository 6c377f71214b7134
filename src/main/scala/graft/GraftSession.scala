package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for the engine — one place encoding
  * the scale decisions instead of scattering conf strings:
  *
  *  - AQE on (runtime re-plan: coalesce post-shuffle partitions,
  *    skew-join split, dynamic broadcast)
  *  - shuffle partitions sized to the cluster (local: cores; cluster:
  *    2-3× total executor cores — AQE coalesces the excess)
  *  - 256 MiB scan partitions (fewer, fuller tasks against 100 TB of
  *    parquet; the 128 MiB default doubles task count for no benefit on
  *    large scans)
  *  - UTC session timezone (oracle parity + the reference's tz_localize)
  *  - nanos-as-long parquet reads (the events fixture; harmless elsewhere)
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(Runtime.getRuntime.availableProcessors())
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
  }
}
