package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r13 ask #2): isolate the CENSUS cost of the streaming-IVF
  * maintain loop and compare the two forms as the ingest history grows —
  * the full stats-table recompute ([[graft.ops.Similarity.ivfIndexCensus]],
  * which re-reads O(lists + one stats file per past append) every call)
  * vs the running census ([[graft.ops.Similarity.updateIvfCensusRunning]],
  * O(touched lists + 1) per batch regardless of history).
  *
  * The IvfDrainAb wall numbers can't see this at the gate's k=16 / 10
  * batches (census is ~0.2 s either way, under the per-batch append +
  * result-write cost); this probe runs MANY small appends at a larger k
  * and times each census form per batch, printing the trend. The
  * 100 TB claim under test: recompute cost grows with ingest history
  * (stats accumulates one file per append; lists ≫ batch makes the
  * re-read dominant), running cost stays flat.
  *
  * Usage: `runMain graft.tools.IvfCensusProbe [sfDir] [k] [nBatches]`. */
object IvfCensusProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sim = graft.ops.Similarity
    val e = graft.io.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    // batch 0 trains + builds on the first half; the rest is cut into
    // nBatches equal appends
    val half = maxId / 2
    val span = math.max(1L, (maxId - half) / nBatches)
    val build = e.filter(col("vec_id") <= half).localCheckpoint(true)
    val path = java.nio.file.Files.createTempDirectory("ivfcp").toString
    val cents = sim.trainKMeans(build, "vec_id", "embedding", k, iters = 2)
    sim.writeIvfIndex(build, "vec_id", "embedding", cents, path)
    sim.initIvfCensusRunning(spark, path)
    println(s"[censusprobe] k=$k build=${build.count()} " +
      s"appends=$nBatches span=$span")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths untimed (codegen)
    sim.ivfIndexCensus(spark, path).collect(): Unit
    sim.readIvfCensusRunning(spark, path).collect(): Unit
    var recompCum = 0.0; var runCum = 0.0
    (1 to nBatches).foreach { b =>
      val lo = half + (b - 1) * span
      val hi = if (b == nBatches) maxId + 1 else half + b * span
      val batch = e.filter(col("vec_id") > lo && col("vec_id") <= hi)
      val bstats = sim.appendToIvfIndex(
        spark, batch, "vec_id", "embedding", path)
      val (run, tRun) = time(
        sim.updateIvfCensusRunning(spark, path, bstats).collect()(0))
      val (rec, tRec) = time(sim.ivfIndexCensus(spark, path).collect()(0))
      require(run.toSeq == rec.toSeq,
        s"census forms diverged at batch $b: $run vs $rec")
      recompCum += tRec; runCum += tRun
      if (b <= 4 || b % 8 == 0 || b == nBatches)
        println(f"[censusprobe] batch$b%3d recompute=$tRec%6.3f s " +
          f"running=$tRun%6.3f s  (cum $recompCum%6.1f vs $runCum%6.1f)")
    }
    println(f"[censusprobe] TOTAL recompute=$recompCum%6.1f s " +
      f"running=$runCum%6.1f s over $nBatches batches")
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    finally walk.close()
    spark.stop()
  }
}
