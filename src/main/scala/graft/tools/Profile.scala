package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev profiler: stage-wise timings of the near-dup pipelines. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, dir)
    docs.count()

    val shingled = docs.select(col("doc_id").as("_id"), Dedup.wordShingles(col("text"), 3).as("_sh"))
    time("shingle")(shingled.count())
    val sh2 = shingled.persist()
    time("shingle persist")(sh2.count())
    val hashes = sh2.select(col("_id"), explode(col("_sh")).as("_s"))
      .select(col("_id"), xxhash64(col("_s")).as("_h"))
    time("explode+hash")(hashes.count())
    val minAggs = (0 until 32).map(i => min(graft.ops.Dedup.permutedHash(i, col("_h"))).as(s"_m$i"))
    val sig = hashes.groupBy(col("_id")).agg(minAggs.head, minAggs.tail: _*)
    time("sig agg")(sig.count())
    val full = Dedup.minHashNearDups(docs, "doc_id", "text", 3, 8, 4, 0.3)
    time("full minhash")(full.count())
    println(s"[profile] pairs = ${full.count()}")

    val banded0 = Dedup.minHashNearDups(docs, "doc_id", "text", 3, 8, 4, -1.0)
    time("no-thresh pairs")(println(s"[profile] candidates = ${banded0.count()}"))
    spark.stop()
  }
}
