package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed `Aggregator` (SURVEY §7.3's optional
  * "bounded top-k heap"): an alternative to window+rank for X2-style
  * per-group neighbor selection.
  *
  * Why it matters at scale: a window top-k sorts each partition (Spark's
  * WindowGroupLimit prunes, but still buffers per group), while an
  * aggregator's buffer is O(k) and partial-aggregates map-side — the
  * shuffle carries at most k rows per group per map partition. The
  * ordering contract matches the window form: score desc, id asc on ties.
  *
  * Buffer is a sorted Vector (k is small); a production variant for
  * large k would use a primitive-array heap, same interface.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord(t: (Double, Long)): (Double, Long) = (-t._1, t._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) (buf :+ x).sortBy(ord)
    else if (ord(x)._1 < ord(buf.last)._1 || (ord(x)._1 == ord(buf.last)._1 && x._2 < buf.last._2))
      (buf.init :+ x).sortBy(ord)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortBy(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopKAggregator]]'s sibling for STRING-identified items ranked by an
  * integer count — (count desc, id asc) ordering, the shape of "top
  * terms per group". Same O(k) buffer / map-side partial contract. */
class TopKStringAggregator(k: Int)
    extends Aggregator[(Long, String), Seq[(Long, String)], Seq[(Long, String)]] {

  private def ord(t: (Long, String)): (Long, String) = (-t._1, t._2)
  private implicit val o: Ordering[(Long, String)] =
    Ordering.Tuple2(Ordering.Long, Ordering.String)

  override def zero: Seq[(Long, String)] = Vector.empty

  override def reduce(buf: Seq[(Long, String)], x: (Long, String)): Seq[(Long, String)] =
    if (buf.size < k) (buf :+ x).sortBy(ord)
    else if (o.lt(ord(x), ord(buf.last))) (buf.init :+ x).sortBy(ord)
    else buf

  override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
    (a ++ b).sortBy(ord).take(k)

  override def finish(buf: Seq[(Long, String)]): Seq[(Long, String)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()

  override def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()
}

/** Bounded min-k of DISTINCT longs — the KMV sketch buffer ([[Sketch]]):
  * keeps the k smallest distinct hash values seen, O(k) state, map-side
  * partials. Distinctness lives IN the buffer (binary-search insert), so
  * a key occurring a billion times costs the same as once — the property
  * that makes KMV a one-pass sketch rather than a distinct-then-limit
  * (which would shuffle the full distinct domain). Output: sorted asc. */
class MinKDistinctLongAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    val i = buf.search(h)(Ordering.Long)
    i match {
      case scala.collection.Searching.Found(_) => buf
      case scala.collection.Searching.InsertionPoint(p) =>
        if (buf.size < k) (buf.take(p) :+ h) ++ buf.drop(p)
        else if (p < k) ((buf.take(p) :+ h) ++ buf.drop(p)).init
        else buf
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Misra–Gries heavy-hitters summary as a typed `Aggregator` — the
  * DETERMINISTIC frequent-items sketch (no hashing, no RNG): at most
  * `k` counters; a full buffer decrements every counter instead of
  * inserting (the classic cancellation argument), and partials merge
  * by summing then subtracting the (k+1)-th largest count (Agarwal et
  * al.'s mergeable-summaries rule). Guarantees, independent of
  * partitioning: every key with true count > n/(k+1) survives, and
  * each surviving estimate is within [c − n/(k+1), c]. The surviving
  * SET below the heavy threshold is partition-layout-dependent — so
  * gates pin the guarantees, never the raw counter set.
  *
  * Buffer is O(k); partial aggregation is map-side like every sketch
  * here — n/(k+1)-error frequency summaries at 100 TB without
  * shuffling the key domain. */
class MisraGriesLongAggregator(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None => // decrement-all; the incoming item cancels with it
        buf.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val combined = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everything: at most k
      // entries stay positive, and the subtraction composes the error
      // bound exactly like reduce's decrement does
      val d = combined.values.toSeq.sorted(Ordering.Long.reverse)(k)
      combined.flatMap { case (key, c) =>
        if (c - d > 0) Some(key -> (c - d)) else None
      }
    }
  }

  override def finish(buf: Map[Long, Long]): Seq[(Long, Long)] =
    buf.toSeq.sortBy { case (key, c) => (-c, key) }

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopK {
  /** Untyped-column form usable in `df.groupBy(...).agg(...)`:
    * `top_k(score, id)` → array<struct<_1: double, _2: bigint>>. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k)).apply(score, id)

  /** Misra–Gries buffer: ≤ k (key, estimate) counters, count desc /
    * key asc → array<struct<_1: bigint, _2: bigint>>. */
  def misraGriesLong(k: Int)(key: Column): Column =
    udaf(new MisraGriesLongAggregator(k)).apply(key)

  /** KMV buffer: k smallest distinct longs, sorted asc → array<bigint>. */
  def minKDistinctLong(k: Int)(hash: Column): Column =
    udaf(new MinKDistinctLongAggregator(k)).apply(hash)

  /** String-id variant ranked by count desc, id asc:
    * → array<struct<_1: bigint, _2: string>>. */
  def topKByCount(k: Int)(count: Column, id: Column): Column =
    udaf(new TopKStringAggregator(k)).apply(count, id)
}
