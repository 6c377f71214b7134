package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes — the per-class rung of the unigram-LM
  * ladder ([[TextAnalysis.unigramLm]] trains ONE reference
  * distribution; NB trains one per label and classifies by argmax of
  * log-prior + Σ log P(word|class)). This is the classifier shape the
  * LLM-curation literature actually ships at corpus scale (fastText-
  * style quality/language classifiers are linear models over token
  * counts — exactly this apply step): train once on a labeled slice,
  * score 100 TB by one broadcast join.
  *
  * == Exactness contract (the [[TextAnalysis.unigramNll]] one) ==
  * One `ln` per distinct (class, word) + one per class prior is the
  * only floating-point work, each computed with the same expression
  * shape the DuckDB twin uses (IEEE-identical), then floored to BIGINT
  * micros — everything that SUMS across rows is integer, so partial-agg
  * merge order can never move a score, and argmax ties break
  * deterministically (lowest label wins — pinned in spec).
  *
  * == Scale shape ==
  * Training: two hash aggs over the exploded token stream (class-word
  * counts, class totals) + O(classes) broadcasts. The model is
  * vocabulary × classes rows — broadcast it. Scoring: corpus explodes
  * to (id, word) ONCE, fans out ×C against the C-row class table
  * (C = |labels|, single digits in practice — the fan-out is the
  * documented cost of scoring every class), broadcast-joins the model,
  * and hash-aggregates integer partial sums back to (id, class) grain.
  * The corpus never shuffles wider than (id, class, partial-sum).
  */
object NaiveBayes {

  /** Marker row key carrying each class's ln-prior in the model frame —
    * contains a space like [[UnigramLm.OovWord]], so no whitespace-split
    * token can collide with it. */
  val PriorWord = "<prior >"

  private def lpMicro(c: Column, n: Column, v: Column): Column =
    floor(log((c + lit(1.0)) / (n + v).cast("double")) * 1e6 + lit(0.5))
      .cast("long")

  /** Train from a labeled corpus: add-one smoothing over the GLOBAL
    * vocabulary (V = distinct words across all classes — the standard
    * multinomial estimator, so classes never disagree on the smoothing
    * denominator's V term). Emits (label, word, lp_micro) where word is
    * a real token, [[UnigramLm.OovWord]] (that class's unseen-word
    * mass, lp = ln(1/(N_c+V))) or [[PriorWord]] (ln(D_c/D)). */
  def train(ref: DataFrame, label: String, text: String): DataFrame = {
    val words = ref.select(col(label).as("label"),
        explode(TextAnalysis.tokens(lower(col(text)))).as("word"))
      .filter(col("word") =!= "")
    val counts = words.groupBy(col("label"), col("word"))
      .agg(count(lit(1)).as("_c"))
    val classTotals = counts.groupBy(col("label")).agg(sum(col("_c")).as("_n"))
    val vocab = counts.select(col("word")).distinct().agg(count(lit(1)).as("_v"))
    val docsPerClass = ref.groupBy(col(label).as("label"))
      .agg(count(lit(1)).as("_d"))
    val totalDocs = docsPerClass.agg(sum(col("_d")).as("_dt"))
    counts.join(classTotals, Seq("label")).crossJoin(broadcast(vocab))
      .select(col("label"), col("word"),
        lpMicro(col("_c"), col("_n"), col("_v")).as("lp_micro"))
      .unionAll(classTotals.crossJoin(broadcast(vocab))
        .select(col("label"), lit(UnigramLm.OovWord).as("word"),
          lpMicro(lit(0L), col("_n"), col("_v")).as("lp_micro")))
      .unionAll(docsPerClass.crossJoin(broadcast(totalDocs))
        .select(col("label"), lit(PriorWord).as("word"),
          floor(log(col("_d").cast("double") / col("_dt")) * 1e6 + lit(0.5))
            .cast("long").as("lp_micro")))
  }

  /** Score every document against every class:
    * (id, label, n_tokens, ll_micro = prior + Σ lp). Documents with
    * zero non-empty tokens produce no rows (nothing to score — filter
    * upstream if empty docs must classify as prior-argmax). */
  def score(df: DataFrame, id: String, text: String, model: DataFrame)
      : DataFrame = {
    val classes = model.filter(col("word") === UnigramLm.OovWord)
      .select(col("label"), col("lp_micro").as("_oov"))
      .join(model.filter(col("word") === PriorWord)
        .select(col("label"), col("lp_micro").as("_prior")), Seq("label"))
    val real = model.filter(col("word") =!= UnigramLm.OovWord &&
      col("word") =!= PriorWord)
    df.select(col(id), explode(TextAnalysis.tokens(lower(col(text)))).as("word"))
      .filter(col("word") =!= "")
      .crossJoin(broadcast(classes))
      .join(broadcast(real), Seq("word", "label"), "left")
      .groupBy(col(id), col("label"))
      .agg(count(lit(1)).as("n_tokens"),
        (max(col("_prior")) + sum(coalesce(col("lp_micro"), col("_oov"))))
          .as("ll_micro"))
  }

  /** Argmax over a [[score]] frame: (id, pred_label, best_ll_micro),
    * exact-integer comparison, ties to the LOWEST label (deterministic
    * under any partitioning — no window, two hash aggs + a self-join on
    * the id key). */
  def classify(scored: DataFrame, id: String): DataFrame = {
    val best = scored.groupBy(col(id)).agg(max(col("ll_micro")).as("_best"))
    scored.join(best, Seq(id))
      .filter(col("ll_micro") === col("_best"))
      .groupBy(col(id))
      .agg(min(col("label")).as("pred_label"),
        max(col("ll_micro")).as("best_ll_micro"))
  }
}
