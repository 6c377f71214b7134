package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: ×N scale probe for the TIME-SERIES / events family — the
  * keyed-window half of the board (sessionization, OHLC, gap-fill,
  * interpolation, rolling windows, funnels, retention). Two scale AXES,
  * because they stress different things:
  *   - `users` mode: user_id → user_id·f + rep — f× MORE USERS with the
  *     same per-user history. Keyed windows parallelize perfectly here;
  *     wall should track data ÷ cores (the "more members" production
  *     scale-up).
  *   - `history` mode: ts → ts + rep·span — the SAME users with f×
  *     LONGER histories. Per-key window sorts grow f×; this is the axis
  *     that exposes any per-key superlinearity (per-key cost is
  *     O(h log h) sort + O(h·w) for count-bounded frames).
  * Each query runs cold+warm per factor with a CPU control, mirroring
  * RelScaleProbe. Usage: `runMain graft.tools.TsScaleProbe [f1 f2 ...]`
  * (default 1 10 50); `TS_MODE=users|history` (default users).
  */
object TsScaleProbe {
  val probeQueries: Seq[String] = Seq(
    "batch_sessionize", "batch_session_window", "ts_ohlc_hourly",
    "ts_forward_fill", "ts_interpolate", "ts_daily_gapfill",
    "ts_ewma_gaps", "ts_cusum_changepoints", "window_rolling_variance",
    "events_rolling_wau", "events_funnel_windowed", "events_funnel_relational",
    "events_cohort_retention", "events_seq_patterns")

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 50)
    val mode = sys.env.getOrElse("TS_MODE", "users")
    require(mode == "users" || mode == "history", s"bad TS_MODE $mode")
    val scratch = new java.io.File(
      sys.env.getOrElse("SCALE_SCRATCH", "tmp/tsscale")).getAbsolutePath
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def control(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32).selectExpr("sum(id % 7) AS s").collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }

    def materialize(dir: String, f: Int): Unit = {
      if (Files.exists(Paths.get(dir, "_GRAFT_OK3"))) return
      Files.createDirectories(Paths.get(dir))
      val ev = graft.io.Tables.events(spark, srcDir)
      val nEv = ev.agg(max(col("event_id"))).head().getLong(0) + 1
      val rep = spark.range(f.toLong).toDF("rep")
      val big =
        if (mode == "users")
          ev.crossJoin(rep).select(
            (col("event_id") * f + col("rep")).as("event_id"),
            (col("user_id") * f + col("rep")).as("user_id"),
            col("event_type"), col("value"), col("ts"), col("props"))
        else {
          // span: whole fixture range + 1 day so replica histories
          // append cleanly instead of interleaving at equal ts
          val (tsMin, tsMax) = {
            val r = ev.agg(min(col("ts")), max(col("ts"))).head()
            (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
          }
          val spanSec = (tsMax - tsMin) / 1000 + 86400
          ev.crossJoin(rep).select(
            (col("event_id") + col("rep") * nEv).as("event_id"),
            col("user_id"), col("event_type"), col("value"),
            (col("ts") + expr(s"make_interval(0,0,0,0,0,0, rep * $spanSec)"))
              .as("ts"), col("props"))
        }
      // 32-FILE directory layout (the staging now mirrors directories):
      // the old single-file layout capped every batch scan of the
      // fixture at parquet row-group parallelism — BENCH_NOTES measured
      // the OHLC drain 4.3 s single-file vs 0.8 s multi-file at f=50
      val tgt = Paths.get(dir, "events.parquet")
      if (Files.exists(tgt) && !Files.isDirectory(tgt)) Files.delete(tgt)
      big.repartition(32).write.mode("overwrite").parquet(tgt.toString)
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
        val link = Paths.get(dir, s"$t.parquet")
        val target = Paths.get(srcDir, s"$t.parquet")
        if (!Files.exists(link) && Files.exists(target))
          Files.createSymbolicLink(link, target): Unit
      }
      Files.createFile(Paths.get(dir, "_GRAFT_OK3")): Unit
    }

    // warm-up at the smallest factor (same rationale as RelScaleProbe)
    locally {
      val dir0 = s"$scratch/$mode${factors.min}"
      materialize(dir0, factors.min)
      probeQueries.foreach(q => graft.SparkEntry.queries(q)(spark, dir0).count(): Unit)
      spark.catalog.clearCache()
    }
    factors.foreach { f =>
      val dir = s"$scratch/$mode$f"
      materialize(dir, f)
      println(f"[tsscale] mode=$mode f=$f%-3d control ${control()}%7.3f s")
      probeQueries.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        spark.catalog.clearCache()
        System.gc() // old-gen debt otherwise lands on later queries
        println(f"[tsscale] mode=$mode f=$f%-3d $q%-26s cold ${runs(0)._1}%7.2f s  " +
          f"warm ${runs(1)._1}%7.2f s  (${runs(1)._2} rows)")
      }
    }
    spark.stop()
  }
}
