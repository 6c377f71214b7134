package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: ×N scale probe for the GRAPH family — the one family the
  * round-8 review noted had no empirical ×N evidence. Regenerates the
  * gates' planted graphs (identical edge formulas, node count scaled
  * f×) and times the underlying ops at each factor, so the verdict is
  * about the OPERATORS' scaling, not fixture IO.
  *
  * Two claims are checked:
  *  - per-round cost tracks edge volume (pagerank/k-core/label-prop run
  *    a FIXED round count — wall should grow ≈ f, modulo constant
  *    per-round scheduling floors that dominate at small f);
  *  - pointer-jumping connected components converges in O(log diameter)
  *    rounds, NOT O(n): the chain fixture keeps component diameter
  *    constant as n grows (rounds must stay flat), while the adversarial
  *    single-ring fixture grows diameter linearly with n (rounds must
  *    grow ~log₂ n — the probe prints both so the contrast is visible).
  *
  * Usage: `runMain graft.tools.GraphScaleProbe [f1 f2 ...]`
  * (default 1 10 50); base node count via GRAPH_BASE_N (default 5000 —
  * the sf0.1 documents cardinality the gates see).
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 50)
    val baseN = sys.env.getOrElse("GRAPH_BASE_N", "5000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def control(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32).selectExpr("sum(id % 7) AS s").collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }

    // planted-graph generators — same formulas as the SparkEntry gates,
    // n as a literal (the gates derive it from the fixture's row count)
    def nodes(n: Long): DataFrame =
      spark.range(n).toDF("doc_id").repartition(32)
    def denseEdges(n: Long): DataFrame = // triangle/k-core-style, 3 per node
      nodes(n).select(col("doc_id").as("src"),
        explode(array(
          expr(s"(doc_id + 1) % $n"), expr(s"(doc_id + 2) % $n"),
          expr(s"(doc_id * 31 + 7) % $n"))).as("dst"))
    def prEdges(n: Long): DataFrame = // pagerank gate: 2 hash chords
      nodes(n).select(col("doc_id").as("src"),
        explode(array(
          expr(s"(doc_id * 31 + 7) % $n"),
          expr(s"(doc_id * 17 + 3) % $n"))).as("dst"))
    def sparseEdges(n: Long): DataFrame = // bfs/label-prop gate: 1 chord
      nodes(n).select(col("doc_id").as("src"),
        expr(s"(doc_id * 31 + 7) % $n").as("dst"))
    // cc gate recipe: length-≤10 chains + sparse cross links — component
    // diameter is CONSTANT in n, so rounds must not grow with f
    def chainPairs(n: Long): DataFrame = {
      val ns = nodes(n).withColumnRenamed("doc_id", "k")
      val e1 = ns.filter(col("k") % 10 =!= 9)
        .select(col("k").as("id_a"), (col("k") + 1).as("id_b"))
      val e2 = ns.filter(col("k") % 97 === 0)
        .select(col("k").as("id_a"), (col("k") + 100).as("id_b"))
      e1.unionByName(e2)
        .join(ns.withColumnRenamed("k", "id_b"), Seq("id_b"), "left_semi")
    }
    // adversarial: ONE ring of n nodes — diameter n/2, the worst case
    // for min-label propagation; rounds must grow ~log₂ n, never ~n
    def ringPairs(n: Long): DataFrame =
      nodes(n).select(col("doc_id").as("id_a"),
        ((col("doc_id") + 1) % n).as("id_b"))

    case class Probe(name: String, run: Long => () => Long, rounds: Boolean = false)
    val probes = Seq(
      Probe("cc_chain", n => () => graft.ops.Dedup.clusterPairs(chainPairs(n)).count(), rounds = true),
      Probe("cc_ring", n => () => graft.ops.Dedup.clusterPairs(ringPairs(n)).count(), rounds = true),
      Probe("pagerank_5it", n => () =>
        graft.ops.Graph.pagerank(prEdges(n), "src", "dst", nodes(n), "doc_id", iters = 5).count()),
      Probe("kcore_k5_r3", n => () =>
        graft.ops.Graph.kCorePeel(denseEdges(n), "src", "dst", nodes(n), "doc_id", k = 5, rounds = 3).count()),
      Probe("labelprop_r3", n => () =>
        graft.ops.Graph.labelPropagation(sparseEdges(n), "src", "dst", nodes(n), "doc_id", rounds = 3).count()),
      Probe("triangles", n => () =>
        graft.ops.Graph.triangleCounts(denseEdges(n), "src", "dst", nodes(n), "doc_id").count()))

    // untimed warm-up at the smallest factor (same rationale as
    // RelScaleProbe: without it every f=1 ratio measures JVM warm-up)
    probes.foreach { p => p.run(baseN * factors.min)(): Unit }
    spark.catalog.clearCache()

    factors.foreach { f =>
      val n = baseN * f
      println(f"[graphscale] f=$f%-3d n=$n%-8d control ${control()}%7.3f s")
      probes.foreach { p =>
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val out = p.run(n)()
          ((System.nanoTime() - t0) / 1e9, out)
        }
        spark.catalog.clearCache()
        System.gc() // old-gen debt otherwise lands on later queries
        val roundsNote =
          if (p.rounds) f"  rounds=${graft.ops.Dedup.lastClusterRounds}%-3d" else ""
        println(f"[graphscale] f=$f%-3d ${p.name}%-14s cold ${runs(0)._1}%7.2f s  " +
          f"warm ${runs(1)._1}%7.2f s$roundsNote  (${runs(1)._2} rows)")
      }
    }
    spark.stop()
  }
}
