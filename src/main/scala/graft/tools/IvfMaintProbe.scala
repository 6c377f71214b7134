package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Measures the persisted-IVF staleness census on the real fixtures at
  * each SF — build on A (vec_id % 3 != 0), append B (% 3 == 0) — so the
  * x2_ann_ivf_append gate's `no_retrain_needed` verdict is pinned from
  * MEASURED skew/fit numbers, not guessed thresholds (the ANN-recall-
  * floor discipline). Also measures a deliberately-drifted append
  * (clusteredVariant batch against a random-trained index) to confirm
  * the fit trigger actually fires when it should. */
object IvfMaintProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = graft.io.Tables.embeddings(spark, dir)
      val a = e.filter(col("vec_id") % 3 =!= 0)
      val b = e.filter(col("vec_id") % 3 === 0)
      val path = java.nio.file.Files.createTempDirectory("ivfprobe").toString
      val cents = Similarity.trainKMeans(a, "vec_id", "embedding", k = 16, iters = 3)
      Similarity.writeIvfIndex(a, "vec_id", "embedding", cents, path)
      Similarity.appendToIvfIndex(spark, b, "vec_id", "embedding", path)
      val c = Similarity.ivfIndexCensus(spark, path).collect()(0)
      println(s"[ivfmaint] $sf same-dist: " + c.schema.fieldNames.zip(c.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(" "))
      // CONCENTRATION drift: a novel mode — every appended vector rides
      // one fixed direction (+ tiny id jitter), so the whole batch lands
      // in one inverted list and the SKEW trigger must fire
      val conc = b.select(col("vec_id"),
        transform(col("embedding"),
          (_, i) => when(i === 0, lit(10.0))
            .otherwise((col("vec_id") % 7).cast("double") / 100.0)
            .cast("float"))
          .as("embedding"))
      val path2 = java.nio.file.Files.createTempDirectory("ivfprobe2").toString
      Similarity.writeIvfIndex(a, "vec_id", "embedding", cents, path2)
      Similarity.appendToIvfIndex(spark, conc, "vec_id", "embedding", path2)
      val c2 = Similarity.ivfIndexCensus(spark, path2).collect()(0)
      println(s"[ivfmaint] $sf concent : " + c2.schema.fieldNames.zip(c2.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(" "))
      // DEGENERATE batch: all-zero embeddings (the upstream-model-bug
      // signature) — append fit collapses to 0, the FIT trigger must fire
      val degen = b.select(col("vec_id"),
        transform(col("embedding"), _ => lit(0.0f)).as("embedding"))
      val path3 = java.nio.file.Files.createTempDirectory("ivfprobe3").toString
      Similarity.writeIvfIndex(a, "vec_id", "embedding", cents, path3)
      Similarity.appendToIvfIndex(spark, degen, "vec_id", "embedding", path3)
      val c3 = Similarity.ivfIndexCensus(spark, path3).collect()(0)
      println(s"[ivfmaint] $sf degen   : " + c3.schema.fieldNames.zip(c3.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(" "))
      // NEGATED batch (the fit-drift regime SimilaritySpec measures:
      // antipodal cloud, fit goes negative) — then RETRAIN over the
      // lists and re-census: the x2_ann_ivf_retrain gate pins
      // fires → retrain → clears, so the clear must be MEASURED here
      // before the gate pins it
      val neg = b.select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
      val path4 = java.nio.file.Files.createTempDirectory("ivfprobe4").toString
      Similarity.writeIvfIndex(a, "vec_id", "embedding", cents, path4)
      Similarity.appendToIvfIndex(spark, neg, "vec_id", "embedding", path4)
      val c4 = Similarity.ivfIndexCensus(spark, path4).collect()(0)
      println(s"[ivfmaint] $sf negated : " + c4.schema.fieldNames.zip(c4.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(" "))
      Similarity.retrainIvfIndex(spark, path4, k = 16, iters = 3)
      val c5 = Similarity.ivfIndexCensus(spark, path4).collect()(0)
      println(s"[ivfmaint] $sf retrainN: " + c5.schema.fieldNames.zip(c5.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(" "))
      // does a retrain also clear the CONCENTRATION drift? (a genuinely
      // concentrated data distribution may stay skewed — measure, don't
      // assume, before choosing the gate's drift regime)
      Similarity.retrainIvfIndex(spark, path2, k = 16, iters = 3)
      val c6 = Similarity.ivfIndexCensus(spark, path2).collect()(0)
      println(s"[ivfmaint] $sf retrainC: " + c6.schema.fieldNames.zip(c6.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(" "))
      for (p <- Seq(path, path2, path3, path4)) {
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.delete(q))
        finally walk.close()
      }
    }
    spark.stop()
  }
}
