package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measured PQ shortlist recall vs exact top-k, per SF —
  * the evidence behind the x2_ann_pq gate's pinned floor. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val e = graft.io.Tables.embeddings(spark, s"/root/testdata/sf$sf")
      val q = e.filter(col("vec_id") % 100 === 0)
      val ann = graft.ops.Similarity.pqTopK(q, e, "vec_id", "embedding", 5,
        m = 4, kCodes = 16, trainIters = 5, rerank = 8)
        .select(col("qid"), col("cid"))
      val exact = graft.ops.Similarity
        .topKBruteForce(q, e, "vec_id", "embedding", 5)
        .select(col("qid"), col("cid"))
      val ov = exact.join(ann, Seq("qid", "cid"), "left_semi").count()
      val nx = exact.count()
      println(f"[pq] sf=$sf overlap=$ov/$nx (${100.0 * ov / nx}%.1f%%)")
    }
    spark.stop()
  }
}
