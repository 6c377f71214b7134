package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeSeries

/** Unit gates for the time-series ops whose edge behavior the DuckDB
  * oracles exercise only incidentally (leading nulls, same-timestamp
  * ties, single-row keys). */
class TimeSeriesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("forwardFill: carries last observation, leading nulls stay null, keys isolated") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), Option.empty[Double]), // leading null
      (2L, 1L, ts("2024-01-01 00:01:00"), Some(10.0)),
      (3L, 1L, ts("2024-01-01 00:02:00"), Option.empty[Double]), // -> 10.0
      (4L, 1L, ts("2024-01-01 00:03:00"), Option.empty[Double]), // -> 10.0 (multi-gap)
      (5L, 1L, ts("2024-01-01 00:04:00"), Some(20.0)),
      (6L, 2L, ts("2024-01-01 00:05:00"), Option.empty[Double]) // other key: no bleed
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.forwardFill(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(1L).isEmpty, "leading null has nothing to carry")
    assert(got(2L).contains(10.0))
    assert(got(3L).contains(10.0))
    assert(got(4L).contains(10.0))
    assert(got(5L).contains(20.0))
    assert(got(6L).isEmpty, "fill must not cross keys")
  }

  test("interpolateLinear: time-proportional blend, edges stay null, keys isolated") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), Option.empty[Double]), // leading edge -> null
      (2L, 1L, ts("2024-01-01 00:01:00"), Some(10.0)),
      (3L, 1L, ts("2024-01-01 00:02:00"), Option.empty[Double]), // 1/3 of the way 10->40
      (4L, 1L, ts("2024-01-01 00:03:00"), Option.empty[Double]), // 2/3 of the way
      (5L, 1L, ts("2024-01-01 00:04:00"), Some(40.0)),
      (6L, 1L, ts("2024-01-01 00:06:00"), Option.empty[Double]), // trailing edge -> null
      (7L, 2L, ts("2024-01-01 00:02:30"), Option.empty[Double]) // other key: no bleed
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.interpolateLinear(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(1L).isEmpty, "no observation before the gap")
    assert(got(2L).contains(10.0), "observed rows pass through")
    assert(got(3L).contains(20.0))
    assert(got(4L).contains(30.0))
    assert(got(5L).contains(40.0))
    assert(got(6L).isEmpty, "no observation after the gap")
    assert(got(7L).isEmpty, "interpolation must not cross keys")
  }

  test("interpolateLinear: non-uniform spacing weights by time, not row position") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), Some(0.0)),
      (2L, 1L, ts("2024-01-01 00:00:10"), Option.empty[Double]), // 10/60 of 0->60
      (3L, 1L, ts("2024-01-01 00:01:00"), Some(60.0))
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.interpolateLinear(df, "user_id", "ts", "value", "event_id")
      .filter(col("event_id") === 2L).select("value_interp").head().getDouble(0)
    assert(got === 10.0)
  }

  test("interpolateLinear: same-timestamp observation pair degenerates to backward neighbor") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), Some(5.0)),
      (2L, 1L, ts("2024-01-01 00:00:00"), Option.empty[Double]),
      (3L, 1L, ts("2024-01-01 00:00:00"), Some(9.0))
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.interpolateLinear(df, "user_id", "ts", "value", "event_id")
      .filter(col("event_id") === 2L).select("value_interp").head().getDouble(0)
    assert(got === 5.0, "0/0 frame must not produce NaN")
  }

  test("joinAsOf: colliding left columns get the documented left_ prefix") {
    // feed an as-of OUTPUT shape back in: left already has asof_event_id
    val left = Seq((10L, 1L, ts("2024-01-01 00:05:00"), 77L))
      .toDF("pid", "user_id", "ts", "asof_event_id")
    val right = Seq((5L, 1L, ts("2024-01-01 00:01:00")))
      .toDF("event_id", "user_id", "ts")
    val out = graft.ops.AsOf.joinAsOf(left, right, "user_id", "ts", "ts", leftId = "pid")
    // exactly one column of each name — no ambiguous duplicates
    assert(out.columns.count(_ == "asof_event_id") == 1)
    assert(out.columns.contains("left_asof_event_id"))
    val row = out.select("pid", "left_asof_event_id", "asof_event_id").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((10L, 77L, 5L)))
  }

  test("forwardFill: same-timestamp tie resolved by the tie-break column") {
    val t = ts("2024-01-01 00:00:00")
    val df = Seq(
      (1L, 7L, t, Some(1.0)),
      (2L, 7L, t, Option.empty[Double]), // same ts as the observation
      (3L, 7L, t, Some(3.0))
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.forwardFill(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // event 2 sees event 1 (tie-break orders 1 < 2 < 3), not event 3
    assert(got(2L) == 1.0)
    assert(got(3L) == 3.0)
  }

  test("ohlcResample: open/close by (ts, id) with same-timestamp ties broken by id") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      (1L, ts(5), 30.0, 100L),  // first by time → open
      (1L, ts(10), 99.0, 101L), // high
      (1L, ts(50), 7.0, 102L),  // low
      (1L, ts(59), 40.0, 103L), // tie on ts with 104 — id 103 < 104
      (1L, ts(59), 41.0, 104L)  // → close is 41.0 (max_by picks larger (ts,id))
    )
    val df = rows.toDF("k", "t", "v", "eid")
    val r = graft.ops.TimeSeries.ohlcResample(df, "k", "t", "v", "eid", "hour")
      .collect()(0)
    assert(r.getDouble(2) == 30.0, "open")
    assert(r.getDouble(3) == 99.0, "high")
    assert(r.getDouble(4) == 7.0, "low")
    assert(r.getDouble(5) == 41.0, "close ties to larger event id")
    assert(r.getLong(6) == 5)
  }

  test("sessionWindowAgg vs sessionize: the exact-gap boundary convention difference, pinned") {
    import java.sql.Timestamp
    def ts(m: Long) = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(m).toString.replace("T", " ") + ":00")
    // events at 0 and exactly 30 min (= the gap): measured engine
    // behavior is MERGE (diff <= gap extends), while the islands form
    // splits at diff >= gap — the one stream where the forms disagree
    val df = Seq((1L, ts(0), 1.0, 1L), (1L, ts(30), 1.0, 2L))
      .toDF("user_id", "ts", "value", "event_id")
    val native = graft.ops.TimeSeries.sessionWindowAgg(df, "user_id", "ts", "value", 30)
      .collect()
    assert(native.length == 1 && native(0).getLong(3) == 2,
      "session_window merges the exact-boundary event")
    val islands = graft.ops.TimeSeries.sessionize(df, "user_id", "ts", 1800L, Seq("event_id"))
      .select("session_id").distinct().count()
    assert(islands == 2, "gaps-and-islands splits at diff >= gap")
  }

  test("ewmaGaps: hand-computed leaky-integrator recurrence, strict flag boundary, single-event key silent") {
    def ts(us: Long) = new Timestamp(us / 1000) // micros → Timestamp(ms)
    // key 1 at t = 0, 10ms, 20ms, 61ms, 63ms (gaps 10k/10k/41k/2k µs):
    //   e1 = 10000 (seed, never flagged)
    //   gap 10000:  10000 > 4·10000? no;  e = (10000+7·10000)/8 = 10000
    //   gap 41000:  41000 > 4·10000 = 40000? YES (strict >);
    //               e = (41000+70000)/8 = 13875
    //   gap  2000:  2000 > 4·13875? no;   e = (2000+7·13875)/8 = 12390 (trunc)
    val rows = Seq((1L, ts(0), 1L), (1L, ts(10000), 2L), (1L, ts(20000), 3L),
      (1L, ts(61000), 4L), (1L, ts(63000), 5L),
      (9L, ts(500), 99L)) // single event → no gap → no output
      .toDF("user_id", "ts", "event_id")
    val got = TimeSeries.ewmaGaps(rows, "user_id", "ts", "event_id")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (2L, 10000L, 10000L, false),
      (3L, 10000L, 10000L, false),
      (4L, 41000L, 13875L, true),
      (5L, 2000L, 12390L, false)))
    // exactly-4x gap is NOT flagged (strict >): 0,10ms,50ms → gap 40000
    val boundary = Seq((1L, ts(0), 1L), (1L, ts(10000), 2L), (1L, ts(50000), 3L))
      .toDF("user_id", "ts", "event_id")
    val b = TimeSeries.ewmaGaps(boundary, "user_id", "ts", "event_id")
      .filter(col("event_id") === 3L).collect().head
    assert(b.getLong(2) == 40000L && !b.getBoolean(4))
  }

  /** Driver-side Holt reference — Scala `/` truncates toward zero,
    * the sign convention the op promises (== Spark div == DuckDB //). */
  private def refHolt(xs: Seq[Long], ka: Int, kb: Int): Seq[(Long, Long, Long)] = {
    var l = xs.head; var b = 0L
    xs.tail.map { x =>
      val f = l + b
      val lNew = (x + (ka - 1) * f) / ka
      val bNew = ((lNew - l) + (kb - 1) * b) / kb
      l = lNew; b = bNew
      (f, lNew, bNew)
    }
  }

  test("holtTrend: trunc-div reference on ramping AND decaying (negative-trend) series") {
    def ts(us: Long) = new Timestamp(us / 1000)
    // key 1 ramps (positive trend), key 2 decays steeply (trend goes
    // negative — the sign where trunc-div and floor-div diverge)
    val ramp = Seq(100L, 200L, 310L, 450L, 600L)
    val decay = Seq(1000L, 700L, 350L, 100L, 5L)
    val rows =
      ramp.zipWithIndex.map { case (x, i) => (1L, ts(i * 1000L), i.toLong, x) } ++
      decay.zipWithIndex.map { case (x, i) => (2L, ts(i * 1000L), 10L + i, x) }
    val df = rows.toDF("user_id", "ts", "event_id", "v")
    val got = TimeSeries.holtTrend(df, "user_id", "ts", "event_id", col("v"))
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    val want = refHolt(ramp, 4, 8).map { case (f, l, b) => (1L, f, l, b) } ++
      refHolt(decay, 4, 8).map { case (f, l, b) => (2L, f, l, b) }
    assert(got.toSeq == want)
    // decay really drives the trend negative — the test is vacuous otherwise
    assert(want.exists { case (k, _, _, b) => k == 2L && b < 0L })
    // single-event keys emit nothing
    val single = TimeSeries.holtTrend(
      Seq((9L, ts(0), 1L, 5L)).toDF("user_id", "ts", "event_id", "v"),
      "user_id", "ts", "event_id", col("v"))
    assert(single.count() == 0)
  }

  test("seasonalDecompose: reference decomposition, NULL edges, trunc on negatives") {
    // pure additive construction: v(d) = 100·d (linear trend) + phase
    // bump s(d%3) ∈ {+30, 0, -30}; period 3 ⇒ centered MA of a linear
    // series recovers it exactly where the window is full
    val bump = Map(0L -> 30L, 1L -> 0L, 2L -> -30L)
    val days = (0L until 12L)
    val daily = days.map(d => ("k", d, 100L * d + bump(d % 3)))
      .toDF("key", "day_num", "v")
    val got = TimeSeries.seasonalDecompose(daily, "key", "day_num", "v",
        period = 3)
      .orderBy("day_num")
      .collect()
      .map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long])))
    // reference: trend(d) = avg(v(d-1..d+1)) = 100·d exactly (bumps sum
    // to 0 over any full period window); det = 3v - 3·trend = 3·bump;
    // seasonal = (1e6·Σ3bump) div (3·n) = 1e6·bump exactly
    got.foreach { case (d, tr, se, re) =>
      assert(se == bump(d % 3) * 1000000L, s"seasonal at $d")
      if (d == 0 || d == 11) assert(tr.isEmpty && re.isEmpty, s"edge $d")
      else {
        assert(tr.contains(100L * d * 1000000L), s"trend at $d: $tr")
        assert(re.contains(0L), s"residual at $d: $re")
      }
    }
    // trunc-toward-zero on a NEGATIVE seasonal numerator: single key,
    // det sums to -1 over 1 obs → (1e6·-1) div 3 = -333333 (not -333334)
    val tiny = Seq(("t", 0L, 0L), ("t", 1L, 1L), ("t", 2L, 0L),
      ("t", 3L, 1L)).toDF("key", "day_num", "v")
    val se1 = TimeSeries.seasonalDecompose(tiny, "key", "day_num", "v", 3)
      .filter(col("day_num") === 2L).select(col("seasonal_micro"))
      .as[Long].head()
    // day1: window {0,1,0} t=1, det=3·1-1=2; day2: window {1,0,1} t=2,
    // det=-2; phase of day2 = 2 → seasonal = (1e6·-2) div (3·1)
    assert(se1 == -666666L)
  }

  test("cusum: hand-pinned recurrence — strict alarm boundary, reset, two-sided") {
    // target 100, kappa 10, h 50. Series drives s_pos to EXACTLY h
    // (no alarm — strict >), past h (alarm + reset), then a plunge
    // trips the downward side.
    // x:    150  110  160   20   20
    // s+:    40   40   90    0    0   (90 > 50 → alarm_up, reset)
    // s-:     0    0    0   70   70   (70 > 50 both times: alarm_down,
    //                                  reset, re-trip from 0)
    val rows = Seq(("k", 1L, 150L), ("k", 2L, 110L), ("k", 3L, 160L),
      ("k", 4L, 20L), ("k", 5L, 20L)).toDF("key", "o", "x")
      .withColumn("mu", lit(100L)).withColumn("kp", lit(10L))
      .withColumn("h", lit(50L))
    for (parts <- Seq(1, 3)) {
      val got = TimeSeries.cusum(rows.repartition(parts.toInt), "key", "o",
          col("x"), col("mu"), col("kp"), col("h"))
        .orderBy("o")
        .select("o", "s_pos", "s_neg", "alarm_up", "alarm_down")
        .as[(Long, Long, Long, Boolean, Boolean)].collect().toSeq
      assert(got == Seq(
        (1L, 40L, 0L, false, false),
        (2L, 40L, 0L, false, false),   // s+ = 40+110-110 = 40
        (3L, 90L, 0L, true, false),    // crosses h, resets to 0
        (4L, 0L, 70L, false, true),    // s+ restarts at 0; s- trips
        (5L, 0L, 70L, false, true)))   // s- reset then trips again
      }
  }

  test("rollingMoments: hand variance numerator; RANGE frame skips gap days") {
    // key k days 0,1,2 values 2,4,6 — at day 2 (window 3 wide):
    // n=3, s=12, ss=56, var_num = 3·56−144 = 24.
    // key g days 0 and 10 (gap > window): day 10 sees ONLY itself —
    // a ROWS frame would wrongly include day 0.
    val rows = Seq(("k", 0L, 2L), ("k", 1L, 4L), ("k", 2L, 6L),
      ("g", 0L, 5L), ("g", 10L, 7L)).toDF("key", "day_num", "x")
    val got = TimeSeries.rollingMoments(rows, "key", "day_num", "x", 3)
      .select("key", "day_num", "n_w", "sum_w", "var_num")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(got(("k", 2L)) == ((3L, 12L, 24L)))
    assert(got(("k", 0L)) == ((1L, 2L, 0L)), "single obs: var_num 0")
    assert(got(("g", 10L)) == ((1L, 7L, 0L)), "gap beyond window excluded")
  }

  test("businessDaysBetween: JDK-calendar reference over exhaustive windows") {
    // independent truth: java.time weekday walk, vs the closed form,
    // over every [a, b) with a in a two-week span and widths 0..21
    val epoch = java.time.LocalDate.of(1970, 1, 1)
    def ref(a: Long, b: Long): Long =
      (a until b).count { d =>
        val dow = epoch.plusDays(d).getDayOfWeek.getValue // Mon=1..Sun=7
        dow <= 5
      }.toLong
    val cases = for (a <- 9800L to 9813L; w <- 0L to 21L) yield (a, a + w)
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        TimeSeries.businessDaysBetween(col("a"), col("b")).as("bd"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, bd) =>
      assert(bd == ref(a, b), s"[$a, $b): got $bd want ${ref(a, b)}")
    }
    // anchor: 1970-01-01 (Thu) + [0, 7) = Thu Fri Sat Sun Mon Tue Wed
    // → 5 business days; [0, 2) = Thu Fri → 2; [2, 4) = Sat Sun → 0
    assert(ref(0L, 7L) == 5L && ref(0L, 2L) == 2L && ref(2L, 4L) == 0L)
  }

  test("cusum: value exactly at h does not alarm (strict >)") {
    // single step to s_pos == h exactly
    val rows = Seq(("k", 1L, 160L)).toDF("key", "o", "x")
      .withColumn("mu", lit(100L)).withColumn("kp", lit(10L))
      .withColumn("h", lit(50L))
    val got = TimeSeries.cusum(rows, "key", "o", col("x"),
        col("mu"), col("kp"), col("h"))
      .select("s_pos", "alarm_up").as[(Long, Boolean)].head()
    assert(got == ((50L, false)))
  }
}
