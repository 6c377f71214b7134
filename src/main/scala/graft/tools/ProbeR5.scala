package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Dedup, Sampling, Similarity}

/** Dev probe (round 5): measures the deterministic quantities behind the
  * verdict-gate floors for the remaining rows-only queries — minhash /
  * simhash / embedding near-dup recall vs exact truth, stratified-sample
  * fractions, sketch errors — at a given SF dir. Not part of the
  * deliverable surface; numbers land in the gate docstrings. */
object ProbeR5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- minhash vs exact truth on doc subset
    val d = Tables.documents(spark, sfDir).filter(col("doc_id") < 400)
    val sh = d.select(col("doc_id"), Dedup.wordShingles(lower(col("text")), 3).as("_s"))
    val truth = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        Dedup.jaccard(col("a._s"), col("b._s")).as("j"))
      .filter(col("j") >= 0.3)
      .select("id_a", "id_b").cache()
    val nTrue = truth.count()
    val mh = Dedup.minHashNearDups(d, "doc_id", "text",
        shingleK = 3, bands = 8, rows = 4, minJaccard = 0.3)
      .select("id_a", "id_b").cache()
    val nMh = mh.count()
    val mhHit = truth.join(mh, Seq("id_a", "id_b"), "left_semi").count()
    val mhFalse = mh.join(truth, Seq("id_a", "id_b"), "left_anti").count()
    println(s"[probe] minhash: true=$nTrue emitted=$nMh hit=$mhHit false=$mhFalse")

    // --- simhash shape on same subset
    val sim = Dedup.simHashNearDups(d, "doc_id", "text", maxHamming = 8).cache()
    val nSim = sim.count()
    val simInTruth = sim.select("id_a", "id_b").join(truth, Seq("id_a", "id_b"), "left_semi").count()
    println(s"[probe] simhash: emitted=$nSim inJaccardTruth=$simInTruth")

    // --- embedding near-dup vs exact on vec subset
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 1000)
    val ex = Similarity.exactNearDupPairs(e, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").cache()
    val nEx = ex.count()
    val em = Similarity.embeddingNearDups(e, "vec_id", "embedding", minCosine = 0.3, planes = 4)
      .select("id_a", "id_b").cache()
    val nEm = em.count()
    val emHit = ex.join(em, Seq("id_a", "id_b"), "left_semi").count()
    val emFalse = em.join(ex, Seq("id_a", "id_b"), "left_anti").count()
    println(s"[probe] embed: true=$nEx emitted=$nEm hit=$emHit false=$emFalse")

    // --- stratified sample fractions + rerun determinism
    val docs = Tables.documents(spark, sfDir)
    val fr = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25)
    val s1 = Sampling.stratified(docs, "lang", fr, seed = 42L).select("doc_id", "lang").cache()
    val s2 = Sampling.stratified(docs, "lang", fr, seed = 42L).select("doc_id", "lang")
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fr.keys.toSeq.sorted.foreach { l =>
      val n = totals.getOrElse(l, 0L); val k = kept.getOrElse(l, 0L)
      val f = fr(l)
      val sd = math.sqrt(n * f * (1 - f))
      println(f"[probe] strat $l: n=$n kept=$k target=${n * f}%.1f dev=${math.abs(k - n * f) / math.max(sd, 1e-9)}%.2f sigma")
    }
    val diff = s1.union(s2).except(s1.intersect(s2)).count()
    println(s"[probe] strat rerun symmetric-diff=$diff")

    // --- sketch errors
    val ev = Tables.events(spark, sfDir)
    val sk = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("x"),
        expr("approx_percentile(value, 0.5, 1000)").as("am"),
        count(lit(1)).as("n"))
      .collect()
    sk.sortBy(_.getString(0)).foreach { r =>
      val (t, a, x) = (r.getString(0), r.getLong(1), r.getLong(2))
      println(f"[probe] sketch $t: approx=$a exact=$x relerr=${math.abs(a - x).toDouble / x}%.4f n=${r.getLong(4)}")
    }
    // rank position of approx median
    val med = sk.map(r => r.getString(0) -> r.getDouble(3)).toMap
    med.toSeq.sortBy(_._1).foreach { case (t, m) =>
      val below = ev.filter(col("event_type") === t && col("value") <= m).count()
      val n = ev.filter(col("event_type") === t).count()
      println(f"[probe] median $t: approx=$m%.3f rankfrac=${below.toDouble / n}%.4f")
    }
    spark.stop()
  }
}
