package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: ×N drain probe for the STREAMING family — the last board
  * family without ×N evidence. Drives the actual streaming gates
  * (AvailableNow drains through Structured Streaming's state store)
  * over the TsScaleProbe `users`-mode inflated event dirs, so the
  * state-store row count grows f× with the data. Reports wall and
  * drained events/second; the floor at f=1 is the micro-batch harness
  * itself, so the interesting number is how little the wall moves as
  * events go 100k → 5M. Run `TsScaleProbe 1 10 50` first (it
  * materializes tmp/tsscale/users{1,10,50}).
  * Usage: `runMain graft.tools.StreamScaleProbe [f1 f2 ...]`. */
object StreamScaleProbe {
  val probeQueries: Seq[String] = Seq(
    "stream_tumbling_agg", "stream_hopping_agg", "stream_dedup_counts",
    "stream_sessionize", "stream_session_window", "stream_user_state",
    "stream_static_enrich")

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 50)
    val scratch = new java.io.File(
      sys.env.getOrElse("SCALE_SCRATCH", "tmp/tsscale")).getAbsolutePath
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warm-up at the smallest factor
    locally {
      val dir0 = s"$scratch/users${factors.min}"
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(dir0)),
        s"run TsScaleProbe first to materialize $dir0")
      probeQueries.foreach(q => graft.SparkEntry.queries(q)(spark, dir0).count(): Unit)
      spark.catalog.clearCache(); System.gc()
    }
    factors.foreach { f =>
      val dir = s"$scratch/users$f"
      val nEvents = graft.io.Tables.events(spark, dir).count()
      def time(name: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        println(f"[streamscale] f=$f%-3d $name%-28s ${wall}%7.2f s  " +
          f"${nEvents / wall / 1000}%8.1fk ev/s  ($rows rows)")
      }
      probeQueries.foreach { q =>
        time(q)(graft.SparkEntry.queries(q)(spark, dir).count())
      }
      // the sessionizers' state width knob: manual wide vs the census-
      // derived AUTO width (statePartitions = 0 → autoStatePartitions),
      // which must reproduce the measured-best manual number
      val wide = math.min(32, 4 * f)
      time(s"stream_sessionize@w$wide")(
        graft.streaming.Streams.sessionizeByGap(spark, dir,
          statePartitions = wide).count())
      time(s"stream_session_window@w$wide")(
        graft.streaming.Streams.sessionWindowStream(spark, dir,
          statePartitions = wide).count())
      val auto = graft.streaming.Streams.autoStatePartitions(spark, dir)
      time(s"stream_sessionize@auto$auto")(
        graft.streaming.Streams.sessionizeByGap(spark, dir).count())
      time(s"stream_session_window@auto$auto")(
        graft.streaming.Streams.sessionWindowStream(spark, dir).count())
    }
    spark.stop()
  }
}
