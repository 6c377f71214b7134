package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the round-4 ops: events inflated N× (replica rows get
  * distinct ids/timestamps so keys stay honest), then each op runs over
  * the inflated frame. Prints wall-clock per op. Usage:
  *   runMain graft.tools.R4Probe [factor]
  */
object R4Probe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 20
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = graft.io.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts")
    val n = ev.count()
    // inflate: copy c shifts ids beyond the original range and nudges ts
    // by c seconds so per-user histories interleave instead of stacking
    val big = ev.withColumn("c", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        (col("event_id") + col("c").cast("long") * (n + 1)).as("event_id"),
        col("user_id"), col("event_type"), col("value"),
        (col("ts") + expr("make_interval(0, 0, 0, 0, 0, 0, c)")).as("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = big.count()
    println(s"[r4probe] events x$factor = $total rows")

    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = f.count()
      println(f"[r4probe] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $name ($rows rows)")
    }

    time("interpolateLinear (keyed window)") {
      val masked = big.withColumn("value",
        when(col("event_type") === "click", lit(null).cast("double"))
          .otherwise(col("value")))
      // aggregate the filled column so count() can't prune the window
      graft.ops.TimeSeries.interpolateLinear(masked, "user_id", "ts", "value", "event_id")
        .agg(sum("value_interp"))
    }
    time("snapshotDiff (full-outer census)") {
      val prev = big.filter(col("event_id") % 10 < 9)
      val next = big.filter(col("event_id") % 10 > 0)
        .withColumn("value",
          when(col("event_id") % 3 === 0, col("value") * 2).otherwise(col("value")))
      graft.ops.Merge.snapshotDiff(prev, next, Seq("event_id"))
        .groupBy("change").count()
    }
    time("weightedPriority k=1000 (TakeOrdered)") {
      graft.ops.Sampling.weightedPriority(big, "event_id",
        col("value") + lit(1.0), k = 1000, seed = 7L)
    }
    time("hashSplit (narrow)") {
      graft.ops.Sampling.hashSplit(big, "event_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 5L)
        .groupBy("split").count()
    }
    time("perGroupSample k=100 per event_type") {
      graft.ops.Sampling.perGroupSample(big, "event_type", "event_id", 100, seed = 11L)
    }
    time("dedupAgainstSeen (digest anti-join)") {
      val docs = big.select(col("event_id").as("doc_id"),
        concat_ws(" ", col("event_type"), col("value").cast("string")).as("text"))
      val seen = docs.filter(col("doc_id") % 2 === 0)
        .select(graft.ops.Dedup.contentHash(col("text")).as("content_hash")).distinct()
      graft.ops.Dedup.dedupAgainstSeen(docs.filter(col("doc_id") % 2 === 1), seen,
        "text", "doc_id")
    }
    time("survivorsByContent (one-scan min_by dedup)") {
      // ~50% duplicate content (type+rounded value collide across copies)
      val docs = big.select(col("event_id").as("doc_id"),
        concat_ws(" ", col("event_type"),
          round(col("value"), 0).cast("string")).as("text"),
        col("value"))
      graft.ops.Dedup.survivorsByContent(docs, "text", "doc_id", Seq("value"))
    }
    spark.stop()
  }
}
