package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measure ANN recall@k so gate floors are pinned from data,
  * not hope. Two fixtures per SF:
  *   - RANDOM: the embeddings table as-is — the adversarial case (iid
  *     vectors have no neighbor structure; sign-LSH/JL recall is
  *     legitimately low and the 5% floors reflect that);
  *   - CLUSTERED: the realistic case real corpora look like — each
  *     vector pulled 95% toward its block's center (blocks of 25 ids),
  *     so true neighbors are same-cluster members.
  * Sweeps planes (LSH), nprobe (IVF over trained k-means), and
  * shortlistFactor (JL-projected rerank), printing the global overlap
  * percentage annVerdict gates on. Usage:
  * `runMain graft.tools.AnnRecallProbe [sfDir ...]`. */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Similarity

    def recallPct(queries: DataFrame, corpus: DataFrame, ann: DataFrame, k: Int): Long = {
      val exact = Similarity.topKBruteForce(queries, corpus, "vec_id", "embedding", k)
        .select(col("qid"), col("cid"))
      val nx = exact.count()
      val ov = exact.join(ann.select(col("qid"), col("cid")), Seq("qid", "cid"), "left_semi").count()
      if (nx == 0) 100L else ov * 100 / nx
    }

    dirs.foreach { dir =>
      val e = graft.io.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding")).persist()
      val clustered = graft.ops.Similarity.clusteredVariant(e, "vec_id", "embedding", 25)
        .persist()
      // the regime BETWEEN the extremes: real cluster structure (the
      // coarse quantizer explains true variance, so residual codes have
      // room to win) but not so tight that every config saturates 100%
      val mild = graft.ops.Similarity.clusteredVariant(e, "vec_id", "embedding", 25,
        pull = 0.5).persist()
      Seq(("random", e), ("clustered", clustered), ("mild", mild)).foreach { case (fx, corpus) =>
        val q = corpus.filter(col("vec_id") % 100 === 0)
        Seq(4, 6, 8).foreach { p =>
          val r = recallPct(q, corpus,
            Similarity.lshBucketTopK(q, corpus, "vec_id", "embedding", 5, planes = p), 5)
          println(s"[annrecall] $dir $fx lsh planes=$p recall=$r%")
        }
        val cents = Similarity.trainKMeans(corpus, "vec_id", "embedding", k = 16, iters = 3)
        Seq(1, 2, 3, 6).foreach { np =>
          val r = recallPct(q, corpus,
            Similarity.ivfTopKWith(q, corpus, "vec_id", "embedding", 5, cents, nprobe = np), 5)
          println(s"[annrecall] $dir $fx ivf_kmeans nprobe=$np recall=$r%")
        }
        Seq(4, 8, 16).foreach { sf =>
          val r = recallPct(q, corpus,
            Similarity.projectedTopK(q, corpus, "vec_id", "embedding", 5,
              outDim = 8, shortlistFactor = sf), 5)
          println(s"[annrecall] $dir $fx projected slf=$sf recall=$r%")
        }
        // IVF-PQ composite: pruning recall × ADC-shortlist recall — the
        // x2_ann_ivfpq floor is pinned from these numbers
        val path = java.nio.file.Files.createTempDirectory("ivfpqpr").toString
        Similarity.writeIvfIndex(corpus, "vec_id", "embedding", cents, path)
        // residual-vs-raw geometry diagnostic: when the coarse centroids
        // are tiny relative to the vectors (iid random data), residual ≈
        // raw and the IVFADC residual win CANNOT appear
        val cn = spark.read.parquet(s"$path/centroids")
          .agg(avg(sqrt(aggregate(col("cent_vec"),
            lit(0.0), (a, x) => a + x.cast("double") * x))))
          .head().getDouble(0)
        val vn = corpus.agg(avg(sqrt(aggregate(col("embedding"),
            lit(0.0), (a, x) => a + x.cast("double") * x))))
          .head().getDouble(0)
        println(f"[annrecall] $dir $fx geometry centroid_norm=$cn%.3f " +
          f"vector_norm=$vn%.3f ratio=${cn / vn}%.3f")
        for (m <- Seq(4, 8); rr <- Seq(8, 16); res <- Seq(false, true)) {
          Similarity.writeIvfPqCodes(spark, path, m = m, kCodes = 16,
            residual = res)
          val r = recallPct(q, corpus,
            Similarity.ivfPqTopKPersisted(spark, path, q, "vec_id", "embedding",
              5, nprobe = 6, rerank = rr), 5)
          val form = if (res) "residual" else "raw"
          println(s"[annrecall] $dir $fx ivfpq m=$m rerank=$rr $form recall=$r%")
        }
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p2 => java.nio.file.Files.delete(p2))
        finally walk.close()
      }
      e.unpersist(); clustered.unpersist(); mild.unpersist()
    }
    spark.stop()
  }
}
