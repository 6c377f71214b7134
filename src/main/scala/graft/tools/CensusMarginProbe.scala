package graft.tools

import org.apache.spark.sql.functions._

/** r14 probe: the census fire margins behind stream_ivf_heal at each
  * scale — build fit, cumulative append fit, LAST-batch fit, and skew,
  * for the same-distribution batches and the final zero-poisoned one.
  * Decides how to scale-parameterize the heal trigger (judge ask #1a).
  */
object CensusMarginProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/testdata-sf1/sf1.0")
    dirs.foreach { dir =>
      val e = graft.io.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val span = math.max(200L, n / 10L)
      val nB = (e.agg(max(col("vec_id"))).head().getLong(0) / span).toInt + 1
      val b0 = e.filter(call_function("div", col("vec_id"), lit(span)) === 0)
      val cents = graft.ops.Similarity.trainKMeans(
        b0, "vec_id", "embedding", 16, iters = 3)
      val idx = java.nio.file.Files.createTempDirectory("cmp").toString
      graft.ops.Similarity.writeIvfIndex(b0, "vec_id", "embedding", cents, idx)
      val c0 = graft.ops.Similarity.ivfIndexCensus(spark, idx).collect()(0)
      println(s"[probe] $dir n=$n span=$span build_fit=" +
        c0.getAs[Long]("build_fit_micro"))
      (1 until nB).foreach { b =>
        val raw = e.filter(call_function("div", col("vec_id"), lit(span)) === b)
        val batch = if (b == nB - 1)
          raw.select(col("vec_id"),
            transform(col("embedding"), _ => lit(0.0f)).as("embedding"))
        else raw
        val st = graft.ops.Similarity.appendToIvfIndex(
          spark, batch, "vec_id", "embedding", idx)
        val bFit = st.agg((sum(col("sum_sim_micro")) / sum(col("n")))
          .cast("long")).head().getLong(0)
        val c = graft.ops.Similarity.ivfIndexCensus(spark, idx).collect()(0)
        println(s"[probe]   batch=$b poisoned=${b == nB - 1} " +
          s"batch_fit=$bFit cum_append_fit=" +
          c.getAs[Long]("append_fit_micro") + " fit_drop=" +
          c.getAs[Long]("fit_drop_micro") + " skew=" +
          c.getAs[Long]("skew_micro") + " fired=" +
          c.getAs[Boolean]("needs_retrain"))
      }
    }
    spark.stop()
  }
}
