package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: does append-mode session_window EMISSION depend on the
  * state-store width? (Round-9 stream probe saw differing drained row
  * counts at w4 vs w32 on the ×50 fixture.) Runs each width twice at
  * each dir and prints counts — determinism per width, and equality
  * across widths, are separate questions. */
object SwWidthProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      Seq(4, 32).foreach { w =>
        def once(): (Long, Double) = {
          val t0 = System.nanoTime()
          val c = graft.streaming.Streams.sessionWindowStream(spark, dir,
            statePartitions = w).count()
          (c, (System.nanoTime() - t0) / 1e9)
        }
        val (c1, t1) = once(); val (c2, t2) = once()
        println(f"[swwidth] $dir w=$w run1=$c1 (${t1}%.2f s) run2=$c2 (${t2}%.2f s)")
      }
      // PRODUCTION-shape drain: parquet sink instead of the gate
      // harness's memory sink (whose retained blocks dominate wall and
      // variance once outputs reach millions of rows)
      Seq(4, 32).foreach { w =>
        def once(tag: String): Unit = {
          import org.apache.spark.sql.functions._
          val ss = spark.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", w.toString)
          val agg = graft.streaming.Streams.eventsStream(ss, dir)
            .withWatermark("ts", "10 minutes")
            .groupBy(col("user_id"),
              session_window(col("ts"), "30 minutes").as("_sw"))
            .agg(count(lit(1)).as("n_events"))
          val out = java.nio.file.Files.createTempDirectory("swpq").toString
          val ck = java.nio.file.Files.createTempDirectory("swck").toString
          val t0 = System.nanoTime()
          val q = agg.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val wall = (System.nanoTime() - t0) / 1e9
          val n = spark.read.parquet(out).count()
          println(f"[swwidth-pq] $dir w=$w $tag $n rows (${wall}%.2f s)")
          System.gc()
        }
        once("run1"); once("run2")
      }
    }
    spark.stop()
  }
}
