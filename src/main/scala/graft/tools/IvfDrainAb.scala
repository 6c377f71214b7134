package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: A/B the streaming-IVF drain modes (r11 ask #6) at sf0.1 —
  * multi-trigger (maxFilesPerTrigger=1, one micro-batch per staged
  * file) vs single-trigger (whole landing dir in one AvailableNow
  * batch). The outputs are row-identical (StreamingSpec pins it); this
  * measures what the per-trigger floor actually costs relative to the
  * per-logical-batch index-maintenance work that both modes pay.
  * Usage: `runMain graft.tools.IvfDrainAb [sfDir] [reps]`. */
object IvfDrainAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (session + codegen), untimed
    graft.streaming.Streams.streamIvfIngestSelfHealing(spark, dir).count(): Unit
    (1 to reps).foreach { r =>
      Seq(false, true).foreach { single =>
        val t0 = System.nanoTime()
        val n = graft.streaming.Streams
          .streamIvfIngestSelfHealing(spark, dir, singleTrigger = single)
          .count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        println(f"[ivfab] rep$r singleTrigger=$single%-5s ${wall}%6.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
