package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming re-expression of the reference's incremental
  * trigger model (SURVEY §1.1, §2.3): the reference couples its two
  * stages with an S3 `ObjectCreated` event (README.md:89-91) — "run the
  * load when a new file lands". The Spark-native analog is a file-source
  * stream with `Trigger.AvailableNow`: each run drains whatever landed,
  * checkpointed, then stops — batch-testable, cluster-incremental.
  */
object Streams {

  /** The events fixture schema as the file stream sees it (ts arrives as
    * nanos — parquet TIMESTAMP(NANOS) read under nanosAsLong). */
  private val eventsNanosSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over the events parquet (file source, AvailableNow
    * drain). Spark's file stream wants a landing *directory* (the
    * production shape: receivers append files, the stream drains them),
    * so the fixture file is staged into a per-sf temp dir once. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val landing = stageLandingDir(sfDir)
    spark.readStream
      .schema(eventsNanosSchema)
      .parquet(landing)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def stageLandingDir(sfDir: String): String = {
    import java.nio.file._
    val src = Paths.get(sfDir, "events.parquet")
    val dst = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_events_landing_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}")
    Files.createDirectories(dst)
    val tgt = dst.resolve("events.parquet")
    if (!Files.exists(tgt)) Files.copy(src, tgt, StandardCopyOption.REPLACE_EXISTING)
    dst.toString
  }

  /** Tumbling-window aggregation (1h) over the event stream, drained with
    * AvailableNow into a memory sink and returned as a batch DataFrame.
    * Complete output mode: the drain is a single availability window, so
    * state stays bounded by (windows × event types). Decimal sum for
    * cross-engine exactness. */
  def tumblingHourlyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"stream_tumbling_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val agg = eventsStream(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_v"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_v"))
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("window_start", "event_type")
  }

  /** Sessionization per user with a 30-minute inactivity gap — session
    * windows are the stateful-streaming op the events table exists to
    * exercise (SURVEY §2.3). Same AvailableNow drain. */
  def sessionizeByGap(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"stream_sessions_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val agg = eventsStream(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_v"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_v"))
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("user_id", "session_start")
  }
}
