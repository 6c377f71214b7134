package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.functions._
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.io.Tables.documents(spark, dir)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    t("warmup count")(d.count())
    val a = d.select(col("doc_id").as("id_a"),
      graft.expr.WordShingleHashes(col("text"), 3, distinct = true).as("_sa"))
    val b = d.select(col("doc_id").as("id_b"),
      graft.expr.WordShingleHashes(col("text"), 3, distinct = true).as("_sb"))
    val pairs = a.join(b, col("id_a") + 1 === col("id_b"))
      .filter(graft.ops.Dedup.jaccard(col("_sa"), col("_sb")) >= 0.01)
      .select(col("id_a"), col("id_b"))
    val n = t("pairs compute+count")(pairs.count())
    println(s"[probe] n_pairs=$n")
    val pc = pairs.cache(); pc.count()
    t("clusterPairs on cached pairs")(graft.ops.Dedup.clusterPairs(pc).count())
    t("full survivors query")(graft.ops.Dedup.survivorsAfterNearDedup(d, "doc_id", pairs).count())
    spark.stop()
  }
}
