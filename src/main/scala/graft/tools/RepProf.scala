package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for x4_repetition_stats' cold-run anomaly. */
object RepProf {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[repprof] $l%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, dir).filter(col("doc_id") < 200)
    t("scan")(docs.count())
    val toks = docs.select(col("doc_id"),
      posexplode(graft.ops.TextAnalysis.tokens(lower(col("text")))).as(Seq("pos", "w")))
    t("toks")(toks.count())
    val wc = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    t("wordCounts")(wc.count())
    val ws = wc.groupBy(col("doc_id")).agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_word_n"))
    t("wordStats")(ws.count())
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = toks.withColumn("w2", lead(col("w"), 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w2")).as("bg"))
    t("bigrams")(bigrams.count())
    val bs = bigrams.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), (sum(col("c")) - count(lit(1))).as("dup_bigram_n"))
    t("bigramStats")(bs.count())
    t("full-join")(ws.join(bs, "doc_id").count())
    t("full-second")(graft.SparkEntry.queries("x4_repetition_stats")(spark, dir).count())
    spark.stop()
  }
}
