package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.{Coerce, Dedup, Merge}

/** ScalaCheck properties (SURVEY §5.3): upsert idempotence/LWW, dedup
  * key-distinctness and subset-ness, coercion totality under ANSI mode.
  * Generators are kept small — each property materializes Spark jobs. */
object PropertiesSpec extends Properties("graft") {

  private lazy val spark = SparkTestBase.session
  import org.apache.spark.sql.functions.col

  private val keyVal: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(0L, 5L)
      v <- Gen.alphaStr.map(_.take(6))
      ver <- Gen.choose(0L, 9L)
    } yield (k, v, ver))

  property("upsert idempotent: merge(merge(t,b),b) == merge(t,b)") =
    forAll(keyVal, keyVal) { (t, b) =>
      import spark.implicits._
      // make versions a total order per (key, ver) by disambiguating with
      // the value — upsert determinism needs a total order (SURVEY §7.4.2)
      val tDf = t.toDF("k", "v", "ver")
      val bDf = b.toDF("k", "v", "ver")
      val once = Merge.upsertLww(tDf, bDf, Seq("k"), Seq("ver"), Seq("v"))
      val twice = Merge.upsertLww(once, bDf, Seq("k"), Seq("ver"), Seq("v"))
      val a = once.collect().map(_.toSeq).toSet
      val c = twice.collect().map(_.toSeq).toSet
      a == c
    }

  property("upsert keys = union of input keys, one row per key") =
    forAll(keyVal, keyVal) { (t, b) =>
      import spark.implicits._
      val out = Merge.upsertLww(t.toDF("k", "v", "ver"), b.toDF("k", "v", "ver"),
        Seq("k"), Seq("ver"), Seq("v")).collect()
      val keys = out.map(_.getLong(0)).toSeq
      keys.distinct.sorted == (t.map(_._1) ++ b.map(_._1)).distinct.sorted &&
        keys.length == keys.distinct.length
    }

  property("firstPerKey: distinct keys, rows are a subset of input") =
    forAll(keyVal) { rows =>
      import spark.implicits._
      val df = rows.toDF("k", "v", "ver")
      val out = Dedup.firstPerKey(df, Seq("k"), Seq("ver", "v")).collect()
      val inSet = rows.toSet
      out.map(_.getLong(0)).distinct.length == out.length &&
        out.forall(r => inSet.contains((r.getLong(0), r.getString(1), r.getLong(2))))
    }

  property("redactPii is idempotent: redact(redact(x)) == redact(x)") =
    forAll(Gen.listOfN(6, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.const("mail me a.b@c.example.org now"),
      Gen.const("call +1 415 555 0199 today"),
      Gen.choose(100000L, 99999999L).map(n => s"acct $n pending"),
      Gen.const("")))) { texts =>
      import spark.implicits._
      import graft.ops.TextAnalysis.redactPii
      val df = texts.toDF("t")
      val once = df.select(redactPii(col("t")).as("r")).collect().map(_.getString(0)).toSeq
      val twice = df.select(redactPii(redactPii(col("t"))).as("r"))
        .collect().map(_.getString(0)).toSeq
      once == twice
    }

  property("temperatureWeights: weights normalize to 1, tau=1 is natural mix") =
    forAll(Gen.listOfN(30, Gen.choose(0L, 4L).map(g => s"g$g"))) { groups =>
      Prop.propBoolean(groups.nonEmpty) ==> {
        import spark.implicits._
        val df = groups.toDF("g")
        val w1 = graft.ops.Sampling.temperatureWeights(df, "g", 1.0)
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
        val total = groups.size.toDouble
        val sumsTo1 = math.abs(w1.values.map(_._2).sum - 1.0) < 1e-6
        val natural = w1.forall { case (_, (n, w)) => math.abs(w - n / total) < 1e-6 }
        sumsTo1 && natural
      }
    }

  property("assignShards == naive global prefix sum for arbitrary weights") =
    forAll(Gen.listOfN(40, Gen.choose(1L, 50L)), Gen.choose(1, 6)) { (ws, parts) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("k", "w")
      val win = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = df.withColumn("cum_w", sum(col("w")).over(win))
        .withColumn("shard", floor((col("cum_w") - col("w")) / lit(60L)))
        .select("k", "cum_w", "shard").collect().map(_.toSeq).toSet
      val dist = graft.ops.Packing.assignShards(df, "k", "w", 60L, numPartitions = parts)
        .select("k", "cum_w", "shard").collect().map(_.toSeq).toSet
      naive == dist
    }

  property("scd2History: open interval per key == latestByKey; intervals tile the log") =
    forAll(Gen.listOfN(14, for {
      k <- Gen.choose(0L, 3L)
      ts <- Gen.choose(0L, 20L)
      a <- Gen.oneOf("a", "b", "c")
    } yield (k, ts, a))) { rowsRaw =>
      import spark.implicits._
      // one row per (key, ts): scd2 requires a total order per key
      val rows = rowsRaw.groupBy(r => (r._1, r._2)).map(_._2.min).toList
      val df = rows.toDF("k", "ts", "attr")
      val hist = Merge.scd2History(df, "k", "attr", "ts").collect()
      val current = hist.filter(_.getBoolean(4)).map(r => r.getLong(0) -> r.getString(1)).toMap
      val latest = Merge.latestByKey(df, Seq("k"), Seq("ts")).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      // exactly one open interval per key, and it carries the latest value
      val oneOpenEach = hist.groupBy(_.getLong(0)).forall(_._2.count(_.getBoolean(4)) == 1)
      // intervals tile: each non-current valid_to equals the next valid_from
      val tiles = hist.groupBy(_.getLong(0)).values.forall { ivs =>
        val sorted = ivs.sortBy(_.getLong(2))
        sorted.zip(sorted.drop(1)).forall { case (cur, nxt) =>
          !cur.isNullAt(3) && cur.getLong(3) == nxt.getLong(2)
        }
      }
      current == latest && oneOpenEach && tiles
    }

  private val intervals: Gen[List[(Long, Long, Long, Long)]] =
    Gen.listOfN(10, for {
      id <- Gen.choose(0L, 1000L)
      key <- Gen.choose(0L, 2L)
      // negative starts included: bucket floors must agree below zero
      s <- Gen.choose(-300L, 500L)
      len <- Gen.choose(0L, 120L)
    } yield (id, key, s, s + len))

  property("intervalOverlapJoin == theta join, duplicate-free, any bucket width") =
    forAll(intervals, intervals, Gen.oneOf(7L, 50L, 1000L)) { (ls, rs, w) =>
      import spark.implicits._
      val l = ls.zipWithIndex.map { case ((_, k, s, e), i) => (i.toLong, k, s, e) }
        .toDF("lid", "k", "s", "e")
      val r = rs.zipWithIndex.map { case ((_, k, s, e), i) => (i.toLong, k, s, e) }
        .toDF("rid", "k", "s", "e")
      val got = graft.ops.AsOf.intervalOverlapJoin(l, r, "k", "s", "e", "s", "e", w)
        .select("lid", "r_rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      val expect = (for {
        (li, lk, lsv, lev) <- ls.zipWithIndex.map { case ((_, k, s, e), i) => (i.toLong, k, s, e) }
        (ri, rk, rsv, rev) <- rs.zipWithIndex.map { case ((_, k, s, e), i) => (i.toLong, k, s, e) }
        if lk == rk && lsv <= rev && rsv <= lev
      } yield (li, ri)).toSet
      got.toSet == expect && got.size == expect.size
    }

  property("chunkByTokens lossless: chunk 0 ++ overlap-stripped tails == tokens") =
    forAll(for {
      nTok <- Gen.choose(1, 40)
      size <- Gen.choose(2, 8)
      overlap <- Gen.choose(0, size - 1)
    } yield (nTok, size, overlap)) { case (nTok, size, overlap) =>
      import spark.implicits._
      val toks = (1 to nTok).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
      val chunks = graft.ops.TextAnalysis.chunkByTokens(df, "id", "text", size, overlap)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getString(3).split(" ").toSeq))
      val rebuilt = chunks.flatMap { case (cid, c) =>
        if (cid == 0L) c else c.drop(overlap) }
      // every window ≤ size, and the overlap-stripped concatenation
      // reproduces the token stream exactly (no gap, no duplication —
      // holds even when a short tail follows a short predecessor)
      chunks.forall(_._2.size <= size) && rebuilt.toSeq == toks
    }

  property("interpolateLinear: observations pass through, fills bounded by neighbors, edges null") =
    forAll(Gen.listOfN(10, for {
      gap <- Gen.choose(1L, 100L)
      v <- Gen.option(Gen.choose(-100.0, 100.0))
    } yield (gap, v))) { rows =>
      import spark.implicits._
      // strictly increasing timestamps: the neighbor the property picks
      // below must be exactly the op's (ties are covered by the unit test)
      val withTs = rows.scanLeft((0L, Option.empty[Double])) {
        case ((t, _), (gap, v)) => (t + gap, v)
      }.drop(1)
      val df = withTs.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, 1L, new java.sql.Timestamp(t * 1000), v)
      }.toDF("event_id", "user_id", "ts", "value")
      val out = graft.ops.TimeSeries
        .interpolateLinear(df, "user_id", "ts", "value", "event_id")
        .orderBy("ts", "event_id")
        .collect()
        .map(r => (r.getTimestamp(2).getTime, Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      val obs = out.filter(_._2.isDefined)
      out.forall { case (t, v, interp) =>
        v match {
          case Some(x) => interp.contains(x) // observed rows unchanged
          case None =>
            val before = obs.filter(_._1 <= t).map(_._2.get)
            val after = obs.filter(_._1 >= t).map(_._2.get)
            if (before.isEmpty || after.isEmpty) interp.isEmpty // edge gap
            else {
              // bounded by SOME neighboring pair (1e-9 for float slack)
              val lo = math.min(before.last, after.head) - 1e-9
              val hi = math.max(before.last, after.head) + 1e-9
              interp.exists(x => x >= lo && x <= hi)
            }
        }
      }
    }

  property("toLongCoerce total under ANSI: parses clean ints, nulls garbage") =
    forAll(Gen.listOfN(8, Gen.oneOf(
      Gen.choose(-1000000L, 1000000L).map(_.toString),
      Gen.choose(-1000L, 1000L).map(n => s"$n.0"),
      Gen.alphaStr.map(_.take(8))))) { vals =>
      import spark.implicits._
      val out = vals.toDF("v").select(Coerce.toLongCoerce(col("v")).as("v")).collect()
      out.zip(vals).forall { case (r, in) =>
        val expected = scala.util.Try(in.trim.toDouble).toOption.map(_.toLong)
        if (r.isNullAt(0)) expected.isEmpty || in.isEmpty
        else expected.contains(r.getLong(0))
      }
    }

  // AllPairs prefix filtering is claimed LOSSLESS for any corpus and
  // any threshold — the property that matters is exact-set equality
  // with brute force on corpora the generator deliberately salts with
  // duplicates and shared phrases (a uniform-random corpus would have
  // no qualifying pairs and prove nothing).
  private val phraseGen: Gen[String] = for {
    base <- Gen.choose(0, 4)
    len <- Gen.choose(3, 9)
  } yield (0 until len).map(i => s"w${(base * 7 + i * 3) % 13}").mkString(" ")

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(6, 16)
    texts <- Gen.listOfN(n, for {
      a <- phraseGen
      dup <- Gen.oneOf(true, false, false)
      tail <- Gen.choose(0, 99)
    } yield if (dup) a else s"$a extra$tail")
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("prefixFilterJoin == brute force for random salted corpora and thresholds") =
    forAll(corpusGen, Gen.oneOf(30, 50, 70, 100)) { (docs, pct) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = docs.toDF("id", "txt")
      val sets = df.select(col("id").as("_i"),
        graft.expr.WordShingleHashes(col("txt"), 3, distinct = true).as("_s"))
      val brute = sets.as("a").join(sets.as("b"), col("a._i") < col("b._i"))
        .select(col("a._i").as("id_a"), col("b._i").as("id_b"),
          size(array_intersect(col("a._s"), col("b._s"))).cast("long").as("ni"),
          (size(col("a._s")) + size(col("b._s"))
            - size(array_intersect(col("a._s"), col("b._s")))).cast("long").as("nu"))
        .filter(col("ni") * 100 >= col("nu") * pct)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val fast = Dedup.prefixFilterJoin(df, "id", "txt", 3, pct)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      Prop(fast == brute) :| s"pct=$pct fast=${fast.size} brute=${brute.size}"
    }

  // The Mann–Whitney rank-sum identity vs the DEFINITION: AUC is the
  // probability a random positive outranks a random negative (ties ½).
  // The grouped rank-sum must equal the O(n²) pair count exactly, in
  // integer micros, for every random labeled sample — this is the
  // cross-check that the tie-averaging arithmetic is right, not just
  // self-consistent.
  private val scoredGen: Gen[List[(Boolean, Long)]] = for {
    n <- Gen.choose(4, 60)
    rows <- Gen.listOfN(n, for {
      y <- Gen.oneOf(true, false)
      s <- Gen.choose(0L, 12L) // small range forces heavy ties
    } yield (y, s))
  } yield rows

  property("rocAuc rank-sum == pairwise-comparison definition (ties = 1/2)") =
    forAll(scoredGen) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val r = graft.ops.Eval.rocAuc(rows.toDF("y", "s"), col("y"), col("s")).collect()(0)
      val pos = rows.filter(_._1).map(_._2)
      val neg = rows.filterNot(_._1).map(_._2)
      if (pos.isEmpty || neg.isEmpty) Prop(r.isNullAt(2))
      else {
        val favorable2 = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        val expect = (BigInt(favorable2) * 1000000 /
          (BigInt(pos.size) * neg.size * 2)).toLong
        Prop(r.getLong(2) == expect) :| s"got ${r.getLong(2)} want $expect"
      }
    }

  // Three sessionizer forms, one truth: the engine-native
  // session_window aggregation must equal the gaps-and-islands form on
  // arbitrary event streams (the gate proves it on the fixture; this
  // proves it on adversarial ones — bursts, exact-gap boundaries,
  // single events).
  private val eventsGen: Gen[List[(Long, Long)]] = for {
    nUsers <- Gen.choose(1, 4)
    events <- Gen.listOfN(24, for {
      u <- Gen.choose(1L, nUsers.toLong)
      // all offsets are multiples of 7, so every inter-event diff is
      // too — and 30 is not, so the diff == gap boundary (where the
      // native form merges but the islands form splits — the documented
      // convention difference, pinned in TimeSeriesSpec) can never
      // arise; equality must hold everywhere else
      m <- Gen.choose(0L, 45L).map(_ * 7L)
    } yield (u, m)).map(_.distinct)
  } yield events

  property("session_window == gaps-and-islands on adversarial streams") =
    forAll(eventsGen) { evs0 =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val evs = evs0.zipWithIndex.map { case ((u, m), i) =>
        (u, java.sql.Timestamp.valueOf(java.time.LocalDateTime
          .of(2024, 1, 1, 0, 0).plusMinutes(m)), 1.0, i.toLong)
      }
      if (evs.isEmpty) Prop(true)
      else {
        val df = evs.toDF("user_id", "ts", "value", "event_id")
        val native = graft.ops.TimeSeries.sessionWindowAgg(df, "user_id", "ts", "value", 30)
          .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
          .orderBy("user_id", "session_start").collect().toSeq
        val islands = graft.ops.TimeSeries.sessionize(df, "user_id", "ts", 1800L, Seq("event_id"))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("ts")).as("session_start"),
            (max(col("ts")) + expr("INTERVAL 30 MINUTE")).as("session_end"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
          .orderBy("user_id", "session_start").collect().toSeq
        Prop(native == islands) :| s"native=${native.size} islands=${islands.size}"
      }
    }

  property("sequenceGaps: gaps are exactly the complement of the present set") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 200L)),
        Gen.choose(2L, 40L)) { (ks, bucket) =>
      import spark.implicits._
      val gaps = graft.ops.DataQuality.sequenceGaps(
          ks.toDF("k"), "k", bucketSize = bucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val present = ks.toSet
      val (lo, hi) = (ks.min, ks.max)
      val refMissing = (lo to hi).filterNot(present).toSet
      val gapUnion = gaps.flatMap { case (a, b) => a to b }.toSet
      val wellFormed = gaps.forall { case (a, b) =>
        a <= b && a > lo && b < hi }
      Prop(gapUnion == refMissing && wellFormed &&
        gaps.flatMap { case (a, b) => a to b }.size == gapUnion.size) :|
        s"gaps=$gaps missing=$refMissing"
    }

  property("businessDaysBetween is additive: g(a,c) == g(a,b) + g(b,c)") =
    forAll(Gen.choose(0L, 20000L), Gen.choose(0L, 40L),
        Gen.choose(0L, 40L)) { (a, w1, w2) =>
      import spark.implicits._
      val (b, c) = (a + w1, a + w1 + w2)
      val got = Seq((a, b, c)).toDF("a", "b", "c")
        .select(
          graft.ops.TimeSeries.businessDaysBetween(col("a"), col("c")).as("ac"),
          graft.ops.TimeSeries.businessDaysBetween(col("a"), col("b")).as("ab"),
          graft.ops.TimeSeries.businessDaysBetween(col("b"), col("c")).as("bc"))
        .as[(Long, Long, Long)].head()
      Prop(got._1 == got._2 + got._3) :| s"$got"
    }

  property("markovTransitions: row probabilities sum within truncation dust of 1e6") =
    forAll(Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 50L)
      s <- Gen.oneOf("a", "b", "c")
    } yield (k, t, s))) { rows0 =>
      import spark.implicits._
      // unique (k, t) per row for a total order: disambiguate by index
      val rows = rows0.zipWithIndex.map { case ((k, t, s), i) =>
        (k, t * 1000 + i, s) }
      val out = graft.ops.SeqPattern.markovTransitions(
          rows.toDF("k", "o", "s"), "k",
          Seq(col("o")), col("s"))
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      val byFrom = out.groupBy(_._1)
      Prop(byFrom.forall { case (_, xs) =>
        val total = xs.map(_._3).sum
        total <= 1000000L && total > 1000000L - xs.length
      }) :| out.mkString(",")
    }

  property("cdcCompact: replaying net ops onto the pre-batch state == replaying the full batch") =
    forAll(Gen.listOfN(14, for {
      k <- Gen.choose(0L, 4L)
      op <- Gen.oneOf("I", "U", "D")
      p <- Gen.choose(0L, 99L)
    } yield (k, op, p))) { evs0 =>
      import spark.implicits._
      if (evs0.isEmpty) Prop(true)
      else {
        val evs = evs0.zipWithIndex.map { case ((k, op, p), i) =>
          (k, op, i.toLong, p.toString) }
        // full replay: final state per key = last op != D ? last payload
        val byKey = evs.groupBy(_._1)
        val fullState = byKey.flatMap { case (k, xs) =>
          val last = xs.maxBy(_._3)
          if (last._2 == "D") None else Some(k -> last._4)
        }
        // net replay: apply compacted ops to keys-before-batch = ∅
        val net = graft.ops.Merge.cdcCompact(
            evs.toDF("k", "op", "ts", "p"), "k", "op", "ts", "p")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        val netState = net.collect {
          case (k, op, p) if op != "D" => k -> p }.toMap
        // starting from empty, a net D must correspond to a key absent
        // from fullState; net I/U carry the same final payload
        Prop(netState == fullState &&
          net.collect { case (k, "D", _) => k }
            .forall(k => !fullState.contains(k))) :|
          s"net=${net.toSeq} full=$fullState"
      }
    }

  // --- round 9: PSL registered domains vs a direct reference replay ---

  private val pslHost: Gen[String] = for {
    n <- Gen.choose(1, 4)
    labels <- Gen.listOfN(n, Gen.oneOf(
      "www", "a", "bb", "shop", "city", "foo", "example", "bbc",
      "github", "kawasaki", "sch", "co", "uk", "jp", "ck", "io", "com"))
  } yield labels.mkString(".")

  /** reference implementation: direct PSL matching over the builtin
    * rules in plain Scala (no Spark) — the independent twin. */
  private def pslReference(host: String): Option[String] = {
    val labs = host.split("\\.").toList
    val n = labs.length
    val parsed = graft.ops.PublicSuffix.parseRules(
      graft.ops.PublicSuffix.builtinRules)
    val matches = for {
      (key, typ, eff) <- parsed
      kLabs = key.split("\\.").toList
      k = kLabs.length
      if k <= n
      tail = labs.takeRight(k)
      ok = typ match {
        case "w" => kLabs.head == "*" && tail.tail == kLabs.tail
        case _ => tail == kLabs
      }
      if ok
    } yield (typ == "e", eff)
    val psl =
      if (matches.isEmpty) 1
      else if (matches.exists(_._1)) matches.filter(_._1).map(_._2).max
      else matches.map(_._2).max
    if (n > psl) Some(labs.takeRight(psl + 1).mkString(".")) else None
  }

  property("PSL registered domain == direct reference replay") =
    forAll(Gen.listOfN(8, pslHost)) { hosts =>
      import spark.implicits._
      val got = graft.ops.PublicSuffix.withRegisteredDomain(
          hosts.distinct.toDF("host"), "host", "dom")
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      hosts.distinct.forall(h => got(h) == pslReference(h))
    }

  // --- round 9: hammingPairs pigeonhole recall guarantee ---

  property("hammingPairs: every pair within nBlocks-1 is found; none past maxHamming") =
    forAll(Gen.listOfN(6, Gen.choose(Long.MinValue, Long.MaxValue)),
      Gen.choose(2, 9)) { (fps, nb) =>
      import spark.implicits._
      val rows = fps.distinct.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      val radius = nb - 1
      val got = Dedup.hammingPairs(rows.toDF("id", "fp"), "id", "fp",
          maxHamming = radius, nBlocks = nb)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        x <- rows; y <- rows if x._1 < y._1
        if java.lang.Long.bitCount(x._2 ^ y._2) <= radius
      } yield (x._1, y._1)).toSet
      got == want
    }

  // --- round 9: relational funnel twin == sequential reference ---

  private val funnelEvents: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(40, for {
      u <- Gen.choose(0L, 5L)
      st <- Gen.oneOf("view", "click", "purchase", "noise")
      t <- Gen.choose(0L, 200000L) // seconds; window is 1 day = 86400
    } yield (u, st, t))

  property("funnelMinChain == greedy sequential reference on random streams") =
    forAll(funnelEvents) { evs =>
      import spark.implicits._
      val df = evs.zipWithIndex.map { case ((u, st, t), i) =>
        (u, st, new java.sql.Timestamp(t * 1000), i.toLong)
      }.toDF("user_id", "event_type", "ts", "event_id")
      val got = graft.ops.Reagg.funnelMinChain(df, "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"),
          org.apache.spark.sql.functions.expr("INTERVAL 1 DAY"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // reference: per user, first view; first click in (tv, tv+1d];
      // first purchase in (tc, tc+1d] — plain Scala
      val byUser = evs.groupBy(_._1)
      val w = 86400L
      var nv = 0L; var nc = 0L; var np = 0L
      byUser.values.foreach { rows =>
        val tv = rows.filter(_._2 == "view").map(_._3).minOption
        tv.foreach { v =>
          nv += 1
          val tc = rows.filter(r => r._2 == "click" && r._3 > v && r._3 <= v + w)
            .map(_._3).minOption
          tc.foreach { c =>
            nc += 1
            val tp = rows.filter(r => r._2 == "purchase" && r._3 > c && r._3 <= c + w)
              .map(_._3).minOption
            tp.foreach(_ => np += 1)
          }
        }
      }
      got == Map("step1_view" -> nv, "step2_click" -> nc, "step3_purchase" -> np)
    }
}
