package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Dev tool (r13 ask #6): prove the stream-stream interval joins'
  * state store actually EVICTS as the watermark advances, instead of
  * accumulating every drained row — the claim behind "watermarks bound
  * state" that the oracle gates (fixture-scale, few triggers) never
  * demonstrate. Protocol: stage the events table as T time-ordered
  * chunk files, drain the click↔view 1-hour interval join with
  * maxFilesPerTrigger=1 so the watermark advances chunk by chunk, and
  * capture per-batch state-operator metrics (numRowsTotal,
  * memoryUsedBytes) from the progress JSON via a
  * StreamingQueryListener. Eviction works ⇔ per-batch state rows rise
  * to a plateau (≈ the rows inside the 1 h watermark window) and stay
  * there while total drained input grows ×T — and the plateau scales
  * with RATE (events per hour, the ×f axis) not with total volume.
  * Sweep ×{1,2,4,8} event counts, inflated inline in `users` mode
  * (user_id·f + rep: f× more users, same time range → f× the rate at
  * a FIXED 1 h watermark, the exact regime the ask names).
  * Usage: `runMain graft.tools.StreamStateProbe [f1 f2 ...]`
  * (`SPARK_GRAFT_SF_DIR` sets the base fixture, default sf0.1). */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val chunks = sys.env.get("STATE_CHUNKS").map(_.toInt).getOrElse(16)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file._

    // per-batch state metrics via the progress stream (the production
    // monitoring surface — same JSON a cluster's metrics sink reads)
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val rows = p.stateOperators.map(_.numRowsTotal).sum
        val mem = p.stateOperators.map(_.memoryUsedBytes).sum
        batches.add((p.batchId, p.numInputRows, rows, mem)): Unit
      }
    })

    factors.foreach { f =>
      // users-mode inflation: f× more users, same time range → f× rate
      val ev = graft.io.Tables.events(spark, srcDir)
        .crossJoin(spark.range(f).toDF("rep"))
        .select((col("event_id") * f + col("rep")).as("event_id"),
          col("ts"), (col("user_id") * f + col("rep")).as("user_id"),
          col("event_type"))
      val (tsMin, tsMax) = {
        val r = ev.agg(min(unix_micros(col("ts"))),
          max(unix_micros(col("ts")))).head()
        (r.getLong(0), r.getLong(1))
      }
      val span = (tsMax - tsMin) / chunks + 1
      val root = Files.createTempDirectory("statepr")
      val landing = root.resolve("landing"); Files.createDirectories(landing)
      (0 until chunks).foreach { c =>
        val stage = root.resolve(s"stage_$c")
        ev.filter((unix_micros(col("ts")) - tsMin).divide(span)
            .cast("long") === c)
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = Files.list(stage).iterator()
        var found: Path = null
        while (part.hasNext) {
          val p = part.next()
          if (p.getFileName.toString.endsWith(".parquet")) found = p
        }
        val tgt = landing.resolve(f"chunk$c%04d.parquet")
        Files.move(found, tgt, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(tgt,
          attribute.FileTime.fromMillis(1000000000000L + c * 60000L)): Unit
      }
      val schema = spark.read.parquet(landing.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val views = src.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("_vu"),
          col("ts").as("view_ts"))
        .withWatermark("view_ts", "1 hour")
      val joined = clicks.join(views,
        col("user_id") === col("_vu") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
          col("view_ts") <= col("click_ts"))
      batches.clear()
      val q = joined.writeStream.format("noop")
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val n = ev.count()
      var cumIn = 0L
      val bs = batches.toArray(Array.empty[(Long, Long, Long, Long)])
        .sortBy(_._1)
      bs.foreach { case (b, in, rows, mem) =>
        cumIn += in
        println(f"[statepr] f=$f%-2d batch$b%3d in=$in%8d cum=$cumIn%9d " +
          f"stateRows=$rows%8d stateMem=${mem / 1024}%7d KiB")
      }
      val peak = bs.map(_._3).max
      println(f"[statepr] f=$f%-2d TOTAL events=$n%9d peakStateRows=$peak%8d " +
        f"(peak/total = ${peak.toDouble / n}%.3f)")
      // scrub the scratch
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
    spark.stop()
  }
}
