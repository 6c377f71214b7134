package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential-pattern analysis over per-key event streams — the
  * MATCH_RECOGNIZE-shaped family (detect "signup, then click, then
  * purchase, in that order" and count motif occurrences) that neither
  * Spark nor most engines expose as a native operator. The funnel op
  * answers ONE fixed three-stage question; this generalizes: each key's
  * history becomes a compact symbol string, and pattern questions
  * become string questions — exact, engine-portable, and cheap to ask
  * many times over one materialization.
  *
  * == Scale shape ==
  * One shuffle on the key, one in-memory sort per key bounded by that
  * key's own event count (the sessionize/funnel bound — pre-split
  * pathological keys upstream if one key's history outgrows an
  * executor). The symbol string is ~1 byte per event — a 10k-event user
  * is a 10 KB string, and every downstream pattern question is a narrow
  * per-row scan with no further shuffle. Ordering is TOTAL
  * (caller-supplied order columns must include a unique tie-break) so
  * the string — and everything derived from it — is identical under any
  * partitioning.
  *
  * == Exactness ==
  * Motif counting uses replace-length arithmetic (non-overlapping,
  * leftmost — `(len(s) - len(replace(s, m, ''))) / len(m)`), not regex,
  * so there is no engine regex-dialect surface at all; subsequence
  * detection builds `a.*b.*c` regexes where greedy/lazy semantics
  * cannot disagree (only reachability matters).
  */
object SeqPattern {

  /** Per-key time-ordered symbol string: one row per key, `seq` =
    * concatenation of `sym` (a single char or short token per event) in
    * `order`. The order struct sorts lexicographically field-by-field —
    * pass a unique last column (event_id) for a total order. */
  def sequenceStrings(df: DataFrame, key: String, order: Seq[Column],
      sym: Column): DataFrame =
    df.select(col(key), struct(order :+ sym.as("_sym"): _*).as("_e"))
      .groupBy(col(key))
      .agg(array_join(transform(array_sort(collect_list(col("_e"))),
        e => e("_sym")), "").as("seq"))

  /** Exact count of non-overlapping, leftmost occurrences of literal
    * `motif` — pure length arithmetic over a LITERAL replace, no regex
    * anywhere. */
  def motifCount(seq: Column, motif: String): Column = {
    require(motif.nonEmpty, "motif must be non-empty")
    ((length(seq) - length(replace(seq, lit(motif), lit(""))))
      / lit(motif.length)).cast("long")
  }

  /** TRUE iff the symbols of `subseq` occur in order (gaps allowed) —
    * the `a.*b.*c` reachability test. Symbols are regex-escaped. */
  def containsSubsequence(seq: Column, subseq: String): Column = {
    require(subseq.nonEmpty, "subsequence must be non-empty")
    seq.rlike(subseq.map(c => java.util.regex.Pattern.quote(c.toString))
      .mkString(".*"))
  }

  /** First-order Markov transition matrix over per-key event streams:
    * for every observed `(from_state, to_state)` adjacent pair (in
    * per-key `(orderCols)` order — pass a unique tie-break column last
    * for a total order), the count and the row-conditional probability
    * P(to | from) as exact trunc-micros (`n·10⁶ div row_total` — both
    * engines truncate toward zero on non-negative BIGINTs). The matrix
    * is the empirical behavior model behind next-action prediction,
    * anomaly scoring (improbable transitions), and absorbing-state
    * funnel analysis; rows sum to ≤ 10⁶ with the deficit being pure
    * truncation dust (≤ #cols−1 micros — a documented property, not an
    * error).
    *
    * == Scale shape ==
    * One window keyed BY THE STREAM KEY (`lead` over
    * partitionBy(key) — never an unpartitioned sort), then one hash
    * aggregation at state-pair cardinality (|states|² rows at most, a
    * broadcastable frame for any real event taxonomy) and a
    * state-cardinality row-total join back. Each key's LAST event has
    * no successor and contributes no pair — per-key streams never
    * bleed into each other (pinned in spec). */
  def markovTransitions(df: DataFrame, key: String, orderCols: Seq[Column],
      state: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
    val pairs = df
      .select(col(key), state.as("from_state"),
        lead(state, 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("row_total"))
    pairs.join(totals, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        expr("(n * 1000000) div row_total").as("p_micro"))
  }
}
