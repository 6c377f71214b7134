package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: A/B the MinHash verify path in a DENSE candidate regime
  * (shared boilerplate → band collisions between non-dup docs) —
  * estPrefilter = 0 (exact verify on every banding candidate) vs the
  * AUTO default (signature-estimate prune at minJaccard − 3σ). Checks
  * the two runs return the SAME pair set (recall contract) and prints
  * wall-clock + candidate census for BENCH_NOTES.
  *
  * Usage: runMain graft.tools.MinhashAbProbe [nDocs]
  */
object MinhashAbProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 20000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Dense-FALSE-candidate corpus: 2000-doc groups, each group
    // sharing a 100-token group boilerplate (site-footer scenario)
    // plus 400 doc-UNIQUE tokens → within-group cross-pair Jaccard ≈
    // 98/898 ≈ 0.11: the realistic boilerplate-overlap level, far
    // below both the 0.5 gate and the AUTO cutoff ≈ 0.23, yet with
    // 3-row bands it collides for ~1.3% of the 2000²/2-per-group
    // pairs — a flood of ~500-shingle-array candidates that exact
    // verify must shuffle and reject, exactly the 9-GB-lesson regime
    // the prefilter exists for (est ≈ 0.11 prunes ~98% of them on
    // 30-long signatures first). Every 40th doc is a planted
    // near-copy of its predecessor (one token changed → J ≈ 0.97).
    val docs = spark.range(nDocs.toLong).select(col("id"),
      concat_ws(" ", flatten(array(
        transform(sequence(lit(0), lit(99)), i =>
          concat(lit("b"), i, lit("_g"),
            floor(col("id") / 2000).cast("long"))),
        transform(sequence(lit(0), lit(399)), j =>
          concat(lit("tok"), j, lit("_"),
            when(col("id") % 40 === 1 && j < 399, col("id") - 1)
              .otherwise(col("id"))))))).as("text"))

    // Candidate census (statistically the op's banding — same shingle
    // kernel, same band shape): how many pairs does exact verify chew?
    locally {
      val sh = docs.select(col("id"),
        graft.ops.Dedup.minHashSignature(
          graft.expr.WordShingleHashes(col("text"), 3, distinct = true),
          30).as("sig"))
      val banded = sh.select(col("id"),
        explode(graft.ops.Dedup.lshBands(col("sig"), 15, 2)).as("b"))
        .select(col("b.band_id"), col("b.band_hash"))
      val census = banded.groupBy("band_id", "band_hash")
        .agg(count(lit(1)).as("m")).filter(col("m") > 1)
        .agg(sum(col("m") * (col("m") - 1)).as("p2"), count(lit(1)).as("nb"),
          max(col("m")).as("mx"))
        .first()
      println(s"[mhab] census: candidate pairs ~${census.getLong(0) / 2} " +
        s"in ${census.getLong(1)} buckets (max bucket ${census.getLong(2)})")
    }

    // Shuffle-byte accounting: on local[32] the shuffle is memory-speed
    // so payload savings barely move wall-clock — BYTES are the scale
    // currency (a 1000-executor cluster pays network for every one).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
        }
      })

    def run(pref: Double): (Double, Set[(Long, Long)], Long, Long) = {
      shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.minHashNearDups(docs.toDF(), "id", "text",
          bands = 15, rows = 2, maxBucket = 512, estPrefilter = pref)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let straggler stage-completed events drain
      (wall, out, out.size.toLong, shuffleBytes.get)
    }
    // warm-up (session/codegen) then timed runs
    run(0.0)
    val (wallA, pairsA, nA, bytesA) = run(0.0)
    val (wallB, pairsB, nB, bytesB) = run(-1.0)
    println(f"[mhab] docs $nDocs  exact-verify ${wallA}%6.2f s " +
      f"${bytesA / 1e6}%8.1f MB shuffled ($nA pairs)  " +
      f"auto ${wallB}%6.2f s ${bytesB / 1e6}%8.1f MB ($nB pairs)")
    val missing = pairsA -- pairsB
    val extra = pairsB -- pairsA
    println(s"[mhab] recall contract: missing ${missing.size} " +
      s"extra ${extra.size} (both must be 0)")
    spark.stop()
    if (missing.nonEmpty || extra.nonEmpty) sys.exit(1)
  }
}
