package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling probe for the ops whose 100 TB story
  * matters most — inflate the documents corpus N× (distinct synthetic
  * doc ids, perturbed text so dedup stays non-degenerate) and measure
  * near-dup + dedup + text-analysis runtime vs corpus size. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 5, 20)
    // comma-separated op-label filter (default: all)
    val only: Set[String] = sys.env.get("SCALE_OPS")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.io.Tables.documents(spark, dir)

    factors.foreach { f =>
      val docs = base
        .crossJoin(spark.range(f).toDF("rep"))
        .select((col("doc_id") * f + col("rep")).as("doc_id"),
          // perturb: prefix replicas with a replica tag so exact dedup
          // keeps one copy per text and minhash sees near- not exact-dups
          when(col("rep") === 0, col("text"))
            .otherwise(concat(lit("rep"), col("rep"), lit(" "), col("text"))).as("text"),
          col("lang"))
        .repartition(32)
        .persist()
      val n = docs.count()

      def time(label: String)(body: => Long): Unit =
        if (only.isEmpty || only(label)) {
          val t0 = System.nanoTime()
          val rows = body
          println(f"[scale] f=$f%-3d n=$n%-7d $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
        }

      time("minhash_neardup") {
        graft.ops.Dedup.minHashNearDups(docs, "doc_id", "text", minJaccard = 0.5).count()
      }
      time("simhash_neardup") {
        graft.ops.Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 3).count()
      }
      time("exact_dedup") {
        graft.ops.Dedup.exactByContent(docs, "text", "doc_id").count()
      }
      time("quality_score") {
        val nt = graft.ops.TextAnalysis.tokenCount(col("text"))
        docs.select(graft.ops.TextAnalysis.qualityGate(nt,
          length(col("text")).cast("long"),
          graft.ops.TextAnalysis.wordOccurrences(lower(col("text")),
            graft.ops.TextAnalysis.englishStopwords)).as("q")).filter(col("q")).count()
      }
      time("decontaminate") {
        graft.ops.Dedup.decontaminationOverlap(docs, "doc_id", "text",
          base.filter(col("doc_id") % 20 === 0), "text", k = 5).count()
      }
      time("repetition_stats") {
        graft.ops.TextAnalysis.repetitionStats(docs, "doc_id", "text").count()
      }
      time("pack_shards") {
        graft.ops.Packing.assignShards(
          docs.select(col("doc_id"),
            graft.ops.TextAnalysis.tokenCount(col("text")).as("w")),
          "doc_id", "w", 5000L).count()
      }
      time("zorder_layout") {
        graft.ops.Layout.zOrder2(
          docs.select(col("doc_id"), xxhash64(col("text"))
              .bitwiseAND(lit(0xFFFFFFFFL)).as("h")),
          col("doc_id"), col("h"), 32).count()
      }
      time("chunk_tokens") {
        graft.ops.TextAnalysis.chunkByTokens(docs, "doc_id", "text", 64, 16).count()
      }
      // short-field linkage probe frame: 24-byte text prefix as the
      // noisy field, lang as the (coarse) blocking key — adversarial
      // for blocked matching: high distinct cardinality per block
      lazy val shortFields = docs.select(col("doc_id"),
        substring(col("text"), 0, 24).as("name"), col("lang"))
      time("fuzzy_match") {
        graft.ops.Dedup.editDistancePairs(shortFields, "doc_id", "name",
          Seq("lang"), maxDist = 2).count()
      }
      time("fuzzy_deletes") {
        graft.ops.Dedup.editDistancePairsDeletes(shortFields, "doc_id", "name",
          Seq("lang"), maxDist = 2).count()
      }
      time("span_scrub") {
        graft.ops.Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", n = 5).count()
      }
      time("pack_sequences") {
        graft.ops.Packing.packSequences(
          docs.select(col("doc_id"),
            graft.ops.TextAnalysis.tokenCount(col("text")).as("w")),
          "doc_id", "w", 256L).count()
      }
      time("budget_select") {
        val scored = docs.select(col("doc_id"),
            graft.ops.TextAnalysis.tokenCount(col("text")).as("w"))
          .withColumn("score", col("w") % 97)
        graft.ops.Packing.selectByTokenBudget(scored,
          Seq(col("score").desc, col("doc_id").asc), "w", n * 30L).count()
      }
      time("mix_interleave") {
        val inv = docs.select(col("lang")).distinct()
          .withColumn("inv_w", lit(new java.math.BigDecimal("0.500000")))
        graft.ops.Mixing.interleaveBySource(
          docs.select(col("doc_id"), col("lang")), "lang",
          Seq(col("doc_id")), inv).count()
      }
      time("ntile_distributed") {
        graft.ops.Packing.ntileOrdered(
          docs.select(col("doc_id"), xxhash64(col("text")).as("h")),
          Seq(col("h").asc, col("doc_id").asc), 100).count()
      }
      time("bpe_merges_3") {
        graft.ops.TextAnalysis.trainBpeMerges(docs, "text", 3).size.toLong
      }
      time("bpe_encode") {
        val m = graft.ops.TextAnalysis.trainBpeMerges(
          docs.filter(col("doc_id") % 97 === 0), "text", 3).map(t => (t._2, t._3))
        graft.ops.TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text", m).count()
      }
      time("lm_nll") {
        val lm = graft.ops.TextAnalysis.unigramLm(
          docs.filter(col("lang") === "en"), "text")
        graft.ops.TextAnalysis.unigramNll(docs, "doc_id", "text", lm).count()
      }
      time("model_score") {
        val model = docs
          .select(explode(graft.ops.TextAnalysis.tokens(lower(col("text")))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term").asc).limit(100)
          .select(col("term"), (col("cnt") % 10).cast("decimal(18,6)").as("weight"))
        graft.ops.TextAnalysis.linearScore(docs, "doc_id", "text", model).count()
      }
      time("cluster_survivors") {
        val a = docs.select(col("doc_id").as("id_a"),
          graft.expr.WordShingleHashes(col("text"), 3, distinct = true).as("_sa"))
        val b = docs.select(col("doc_id").as("id_b"),
          graft.expr.WordShingleHashes(col("text"), 3, distinct = true).as("_sb"))
        val pairs = a.join(b, col("id_a") + 1 === col("id_b"))
          .filter(graft.ops.Dedup.jaccard(col("_sa"), col("_sb")) >= 0.01)
          .select(col("id_a"), col("id_b"))
        graft.ops.Dedup.survivorsAfterNearDedup(docs, "doc_id", pairs).count()
      }
      time("prefix_filter_join") {
        graft.ops.Dedup.prefixFilterJoin(docs, "doc_id", "text",
          k = 5, thresholdPct = 50).count()
      }
      time("eval_auc") {
        val nt = graft.ops.TextAnalysis.tokenCount(col("text"))
        val stops = graft.ops.TextAnalysis.wordOccurrences(lower(col("text")),
          graft.ops.TextAnalysis.englishStopwords)
        graft.ops.Eval.rocAuc(docs,
          graft.ops.TextAnalysis.qualityGate(nt, length(col("text")).cast("long"), stops),
          stops).count()
      }
      time("chi2_terms") {
        val nt = graft.ops.TextAnalysis.tokenCount(col("text"))
        val stops = graft.ops.TextAnalysis.wordOccurrences(lower(col("text")),
          graft.ops.TextAnalysis.englishStopwords)
        graft.ops.Eval.chiSquareTerms(docs,
          graft.ops.TextAnalysis.qualityGate(nt, length(col("text")).cast("long"), stops),
          filter(graft.ops.TextAnalysis.tokens(lower(col("text"))), t => length(t) >= 4),
          minDf = 20L).count()
      }
      time("pmi_bigrams") {
        graft.ops.TextAnalysis.pmiBigrams(docs, "text", minCount = 10L).count()
      }
      time("ols_fit") {
        graft.ops.Regress.olsFit1(docs,
          length(col("text")).cast("long"),
          graft.ops.TextAnalysis.tokenCount(col("text"))).count()
      }
      time("boilerplate_scrub") {
        val lined = docs.select(col("doc_id"), col("lang"),
          concat_ws("\n", concat(lit("hdr "), col("lang")),
            substring(col("text"), 1, 60),
            substring(col("text"), 61, 60)).as("text"))
        graft.ops.Dedup.boilerplateScrub(lined, "doc_id", "text", "lang", 5).count()
      }
      time("inverted_index") {
        graft.ops.TextAnalysis.invertedIndex(docs, "doc_id", "text", 5, 8).count()
      }
      time("bigram_nll") {
        graft.ops.TextAnalysis.bigramNll(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 0)).count()
      }
      time("countmin") {
        val sk = graft.ops.Sketch.countMin(docs.select(col("lang")), "lang", 4, 1024)
        graft.ops.Sketch.cmsEstimate(sk,
          docs.select(col("lang")).distinct(), "lang", 4, 1024).count()
      }
      lazy val nodeU = docs.select(col("doc_id"))
      lazy val nodeCnt = nodeU.agg(count(lit(1)).as("n_nodes"))
      def plantedEdges(third: String) =
        nodeU.crossJoin(broadcast(nodeCnt)).select(
          col("doc_id").as("src"),
          explode(array(expr("(doc_id + 1) % n_nodes"),
            expr("(doc_id + 2) % n_nodes"), expr(third))).as("dst"))
      time("triangles") {
        graft.ops.Graph.triangleCounts(
          plantedEdges("(doc_id * 31 + 7) % n_nodes"), "src", "dst",
          nodeU, "doc_id").count()
      }
      time("kcore") {
        graft.ops.Graph.kCorePeel(
          plantedEdges("(doc_id * 2 + 1) % n_nodes"), "src", "dst",
          nodeU, "doc_id", k = 5, rounds = 3).count()
      }
      time("holt_trend") {
        graft.ops.TimeSeries.holtTrend(
          docs.select((col("doc_id") % 997L).as("k"),
            timestamp_micros(col("doc_id") * 1000L).as("ts"),
            col("doc_id").as("id"),
            length(col("text")).cast("long").as("v")),
          "k", "ts", "id", col("v") * lit(1000000L)).count()
      }
      time("bfs_layers") {
        val ids = docs.select(col("doc_id"))
        val cnt = ids.agg(count(lit(1)).as("nn"))
        val edges = ids.crossJoin(broadcast(cnt)).select(
          col("doc_id").as("src"), expr("(doc_id * 31 + 7) % nn").as("dst"))
        graft.ops.Graph.bfsLayers(edges, "src", "dst", ids, "doc_id",
          ids.filter(col("doc_id") % 97 === 0), "doc_id", 4).count()
      }
      time("label_prop") {
        val ids = docs.select(col("doc_id"))
        val cnt = ids.agg(count(lit(1)).as("nn"))
        val edges = ids.crossJoin(broadcast(cnt)).select(
          col("doc_id").as("src"), expr("(doc_id * 31 + 7) % nn").as("dst"))
        graft.ops.Graph.labelPropagation(edges, "src", "dst", ids,
          "doc_id", 3).count()
      }
      time("geo_radius_join") {
        // point count scales with the corpus; density (pairs/point)
        // held constant by shrinking the radius with √f — the
        // honest fixed-workload-per-point scaling a grid join promises
        val pts = docs.select(col("doc_id"),
          expr("(doc_id * doc_id * 7919 + doc_id * 104729) % 1000000").as("px"),
          expr("(doc_id * doc_id * 104729 + doc_id * 7919) % 1000000").as("py"))
        val r = math.max(1L, (20000L / math.sqrt(f.toDouble)).toLong)
        graft.ops.Geo.radiusJoin(pts, "doc_id", col("px"), col("py"), r).count()
      }
      time("cusum") {
        graft.ops.TimeSeries.cusum(
          docs.select((col("doc_id") % 997L).as("k"),
            expr("doc_id div 997").as("o"),
            length(col("text")).cast("long").as("x"))
            .withColumn("mu", lit(100L)).withColumn("kp", lit(10L))
            .withColumn("h", lit(500L)),
          "k", "o", col("x"), col("mu"), col("kp"), col("h")).count()
      }
      time("negative_sample") {
        graft.ops.Sampling.negativeSample(
          docs.select((col("doc_id") % 5000L).as("k"),
            (col("doc_id") % 997L).as("it")),
          "k", "it", itemCount = 997L, k = 3).count()
      }
      time("sequence_gaps") {
        graft.ops.DataQuality.sequenceGaps(
          docs.select(col("doc_id")).filter(col("doc_id") % 97 >= 3),
          "doc_id", bucketSize = 1000L).count()
      }
      time("textrank") {
        import org.apache.spark.sql.expressions.Window
        val toks = docs.filter(col("lang") === "en")
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "w")))
          .filter(length(col("w")) >= 4)
        val vocab = toks.select("doc_id", "w").distinct()
          .groupBy("w").agg(count(lit(1)).as("_df"))
          .filter(col("_df") >= 5).select("w")
        val sq = toks.join(vocab, "w")
          .withColumn("rn",
            row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
          .select(col("doc_id"), col("rn"), col("w"))
        val pairs = sq.join(sq.select(col("doc_id"),
            (col("rn") - 1).as("rn"), col("w").as("w2")), Seq("doc_id", "rn"))
          .select(col("w").as("src"), col("w2").as("dst"))
        graft.ops.Graph.pagerankKeyed(
          pairs.unionByName(pairs.select(col("dst").as("src"),
            col("src").as("dst"))),
          "src", "dst", vocab, "w", iters = 5).count()
      }
      time("connected_components") {
        // the gate's planted topology (chains of 10 + %97 long links)
        // over the SCALED id range: component count grows with f while
        // diameter stays fixed — pointer jumping's round count should
        // hold flat and wall-clock should track data, not diameter
        val nodes = docs.select(col("doc_id").as("k"))
        val e1 = nodes.filter(col("k") % 10 =!= 9)
          .select(col("k").as("id_a"), (col("k") + 1).as("id_b"))
        val e2 = nodes.filter(col("k") % 97 === 0)
          .select(col("k").as("id_a"), (col("k") + 100).as("id_b"))
        val edges = e1.unionByName(e2)
          .join(nodes.withColumnRenamed("k", "id_b"), Seq("id_b"), "left_semi")
        graft.ops.Dedup.clusterPairs(edges).count()
      }
      time("basket_lift") {
        // basket count scales with f at FIXED basket size (8 items,
        // ≤50 distinct brands): the self-join fan-out is bounded per
        // basket, so pair volume grows linearly with baskets
        val baskets = docs.select(
          (col("doc_id") / 8).cast("long").as("bk"),
          pmod(xxhash64(col("text")), lit(50L)).as("it"))
        graft.ops.Reagg.basketLift(baskets, "bk", "it", minSupport = 5).count()
      }
      time("codec_jpeg") {
        // encode+decode per doc: the batched mapPartitions decode
        // boundary at corpus scale — wall-clock should track docs/cores
        import spark.implicits._
        val st = graft.ops.Multimodal.decodeJpegStats(
          docs.select(col("doc_id")).as[Long].map { id =>
            val w = (8 * (2 + id % 6)).toInt; val h = (8 * (2 + id % 4)).toInt
            graft.ops.Multimodal.MediaRecord(id,
              graft.ops.Multimodal.encodeJpeg(w, h,
                i => ((id * 31 + i * 7) % 256).toInt), "image/jpeg", "xx")
          })
        st.agg(sum(col("px_sum"))).head()
        st.count()
      }
      time("codec_gif_anim") {
        import spark.implicits._
        graft.ops.Multimodal.gifFrameStats(
          docs.select(col("doc_id")).as[Long].map { id =>
            val frames = (0 until 4).map(j =>
              (0, 0, 32, 24, 10, (i: Int) => ((id + j * 7 + i) % 16).toInt))
            graft.ops.Multimodal.MediaRecord(id,
              graft.ops.Multimodal.encodeGifAnimated(32, 24, 4, frames),
              "image/gif", "xx")
          }).count()
      }
      docs.unpersist()
    }
    // streaming admission vs historical-corpus size (maxId sweep on the
    // fixture — hist index and incoming batch both scale with it):
    // per-batch cost should track index size, not explode
    if (only.isEmpty || only("stream_admission")) {
      Seq(400L, 2000L, 8000L).foreach { maxId =>
        val t0 = System.nanoTime()
        val n = graft.streaming.Streams.streamMinhashNearDup(
          spark, dir, maxId = maxId).count()
        println(f"[scale] maxId=$maxId%-6d stream_admission  ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n pairs)")
      }
    }
    spark.stop()
  }
}
