package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class TemporalSpec extends SparkSpec {

  test("asofJoin matches the naive inequality-join reference on random data") {
    val s = spark; import s.implicits._
    val rnd = new Random(42)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextInt(100)))
    val got = Temporal.asofJoin(
        left.toDF("k", "lts", "lid"), right.toDF("k", "rts", "rid", "payload"),
        Seq("k"), "lts", "rts", Seq("rid"), Seq("rid", "rts", "payload"))
      .select("k", "lts", "lid", "rid", "rts", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSet
    val expected = left.map { case (k, lts, lid) =>
      val best = right.filter(t => t._1 == k && t._2 <= lts)
        .sortBy(t => (t._2, t._3)).lastOption
      (k, lts, lid, best.map(_._3: Any), best.map(_._2: Any), best.map(_._4: Any))
    }.toSet
    assert(got == expected)
  }

  test("asofJoin includes a right row at exactly the left ts; greatest id wins ties") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 9L, 101L)).toDF("k", "lts", "lid")
    val r = Seq((1L, 10L, 1L), (1L, 10L, 2L)).toDF("k", "rts", "rid")
    val out = Temporal.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid"), Seq("rid"))
      .collect().map(x => x.getLong(2) -> Option(x.get(3))).toMap
    assert(out == Map(100L -> Some(2L), 101L -> None))
  }

  test("asofJoin drops null-timestamp right rows (SQL as-of semantics)") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("k", "lts", "lid")
    val r = Seq((1L, Some(5L), 1L), (1L, None, 2L)).toDF("k", "rts", "rid")
    val out = Temporal.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid"), Seq("rid"))
      .collect().map(x => x.getLong(2) -> Option(x.get(3))).toMap
    // the null-ts row must never be a candidate, even though it would sort
    // first (ascending, nulls first) and id 2 would win the tiebreak
    assert(out == Map(100L -> Some(1L)))
  }

  test("asofJoin gives null-timestamp LEFT rows null matches in every direction") {
    val s = spark; import s.implicits._
    // SQL's >=/<= comparisons are false on NULL, so a null-ts left row
    // must match nothing. Regression (ADVICE r7): plain desc in the
    // forward scan is NULLS LAST, which sorted the null-ts left row after
    // every right row and handed it the minimal right row.
    val l = Seq((1L, Some(10L), 100L), (1L, None, 101L)).toDF("k", "lts", "lid")
    val r = Seq((1L, 5L, 1L), (1L, 20L, 2L)).toDF("k", "rts", "rid")
    for ((dir, expect100) <- Seq("backward" -> 1L, "forward" -> 2L, "nearest" -> 1L)) {
      val out = Temporal.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid"),
          Seq("rid"), direction = dir)
        .collect().map(x => x.getLong(2) -> Option(x.get(3))).toMap
      assert(out == Map(100L -> Some(expect100), 101L -> None),
        s"direction=$dir got $out")
    }
  }

  test("asofJoin plans as exactly one shuffle") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("k", "lts", "lid")
    val r = Seq((1L, 5L, 1L)).toDF("k", "rts", "rid")
    val plan = Temporal.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid"), Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(plan.split("\n").count(_.contains("Exchange")) == 1,
      s"asofJoin must shuffle exactly once:\n$plan")
  }

  test("asofJoin forward/nearest match the naive references on random data") {
    val s = spark; import s.implicits._
    val rnd = new Random(77)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    def run(direction: String) = Temporal.asofJoin(
        left.toDF("k", "lts", "lid"), right.toDF("k", "rts", "rid"),
        Seq("k"), "lts", "rts", Seq("rid"), Seq("rid", "rts"),
        direction = direction)
      .collect().map(r => r.getLong(2) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    def back(k: Long, lts: Long) = right
      .filter(t => t._1 == k && t._2 <= lts).sortBy(t => (t._2, t._3)).lastOption
    def fwd(k: Long, lts: Long) = right
      .filter(t => t._1 == k && t._2 >= lts).sortBy(t => (t._2, t._3)).headOption
    val gotF = run("forward")
    val expF = left.map { case (k, lts, lid) =>
      val m = fwd(k, lts); lid -> ((m.map(_._3: Any), m.map(_._2: Any)))
    }.toMap
    assert(gotF == expF)
    val gotN = run("nearest")
    val expN = left.map { case (k, lts, lid) =>
      val b = back(k, lts); val f = fwd(k, lts)
      val m = (b, f) match {
        case (Some(bb), Some(ff)) =>
          if (lts - bb._2 <= ff._2 - lts) Some(bb) else Some(ff)
        case (bb, ff) => bb.orElse(ff)
      }
      lid -> ((m.map(_._3: Any), m.map(_._2: Any)))
    }.toMap
    assert(gotN == expN)
  }

  test("asofJoin nearest: both direction passes share one exchange") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("k", "lts", "lid")
    val r = Seq((1L, 5L, 1L)).toDF("k", "rts", "rid")
    val plan = Temporal.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid"),
        Seq("rid"), direction = "nearest")
      .queryExecution.executedPlan.toString
    val exchanges = "(?<!Reused)Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("sessionize splits on gap > threshold (a gap of exactly the threshold does not)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 1010L), (1L, 4L, 2011L),
      (2L, 5L, 0L)).toDF("user_id", "event_id", "ts")
    val out = Temporal.sessionize(df, Seq("user_id"), "ts", Seq("event_id"), 1000L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // 10→1010 is exactly the 1000 gap (same session); 1010→2011 is 1001 (new)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize plans as exactly one shuffle (lag + running sum share the sort)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1L, 0L)).toDF("user_id", "event_id", "ts")
    val plan = Temporal.sessionize(df, Seq("user_id"), "ts", Seq("event_id"), 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.split("\n").count(_.contains("Exchange")) == 1,
      s"sessionize must shuffle exactly once:\n$plan")
  }

  test("sessionizeAgg matches Spark's native session_window rollup") {
    val s = spark; import s.implicits._
    // ts values are multiples of 7 and the gap (1000) is not, so no event
    // pair sits exactly on the gap boundary — the one place the two APIs
    // differ by design (sessionize keeps `diff == gap` together;
    // session_window splits there).
    val rnd = new Random(5)
    val rows = for (u <- 1L to 5L) yield {
      var t = 0L
      (1 to 200).map { i =>
        t += 7L * (1 + rnd.nextInt(300)); (u, u * 1000 + i, t)
      }
    }
    val df = rows.flatten.toDF("user_id", "event_id", "ts")
    val ours = Temporal.sessionizeAgg(df, Seq("user_id"), "ts", Seq("event_id"), 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5)))
      .toSet
    val native = df
      .groupBy(col("user_id"),
        session_window(timestamp_micros(col("ts")), "0.001 seconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(ours == native,
      "gap sessionization must agree with Spark's native session_window")
  }

  test("sessionizeAgg rolls sessions up without a second shuffle") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 2000L), (2L, 4L, 5L))
      .toDF("user_id", "event_id", "ts")
    val out = Temporal.sessionizeAgg(df, Seq("user_id"), "ts", Seq("event_id"), 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      (1L, 1L) -> ((0L, 10L, 10L, 2L)),
      (1L, 2L) -> ((2000L, 2000L, 0L, 1L)),
      (2L, 1L) -> ((5L, 5L, 0L, 1L))))
    val plan = Temporal.sessionizeAgg(df, Seq("user_id"), "ts", Seq("event_id"), 1000L)
      .queryExecution.executedPlan.toString
    // the rollup keys extend the window partition keys, so the groupBy
    // reuses the sessionization exchange
    assert(plan.split("\n").count(_.contains("Exchange")) == 1,
      s"sessionizeAgg must reuse the sessionize shuffle:\n$plan")
  }

  test("asofJoin tolerance: beyond-window matches become nulls, all directions") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 1000L, 10L), (1L, 5000L, 11L))
      .toDF("k", "lts", "lid")
    val right = Seq((1L, 900L, 20L), (1L, 5600L, 21L))
      .toDF("k", "rts", "rid")
    def run(dir: String, tol: Option[Long]) =
      Temporal.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("rid"),
          Seq("rid"), dir, tol)
        .collect().map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // backward: lts 1000 ← rts 900 (gap 100); lts 5000 ← rts 900 (gap 4100)
    assert(run("backward", None) == Map(10L -> 20L, 11L -> 20L))
    assert(run("backward", Some(500L)) == Map(10L -> 20L, 11L -> -1L))
    // forward: lts 5000 → 5600 (gap 600) survives tol 600, dies at 599
    assert(run("forward", Some(600L)) == Map(10L -> -1L, 11L -> 21L))
    assert(run("forward", Some(599L)) == Map(10L -> -1L, 11L -> -1L))
    // nearest: lts 5000 nearest is 5600 (600) vs 900 (4100) → tolerance
    // applies to the CHOSEN match, no fallback to the farther side
    assert(run("nearest", Some(500L)) == Map(10L -> 20L, 11L -> -1L))
    intercept[IllegalArgumentException](run("backward", Some(-1L)))
  }

  test("resampleFfill: gaps carry the last observation; bucket edges are exact") {
    val s = spark; import s.implicits._
    // user 1: buckets 10 and 13 observed → 11, 12 filled from bucket 10;
    // two observations in bucket 10 → (ts, id)-max wins; an observation
    // exactly ON the bucket edge (ts = 13·100) belongs to bucket 13.
    val df = Seq(
      (1L, 1005L, 1L, 5.0), (1L, 1060L, 2L, 7.0), (1L, 1300L, 3L, 9.0),
      (2L, 400L, 4L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Temporal.resampleFfill(df, Seq("user_id"), "ts",
        Seq("event_id"), "value", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(got == Set(
      (1L, 10L, 7.0, true),   // in-bucket last = (1060, id 2)
      (1L, 11L, 7.0, false),  // gap: carried forward
      (1L, 12L, 7.0, false),
      (1L, 13L, 9.0, true),   // edge observation opens its own bucket
      (2L, 4L, 1.0, true)))
    // epoch-µs magnitude: integer div must keep adjacent µs in adjacent
    // buckets where a double division's ulp (≈0.25 at 1.7e15) would not
    val big = Seq((1L, 1704067199999999L, 1L, 1.0),
      (1L, 1704067200000000L, 2L, 2.0)).toDF("user_id", "ts", "event_id", "value")
    val buckets = Temporal.resampleFfill(big, Seq("user_id"), "ts",
        Seq("event_id"), "value", 1000000L)
      .filter(col("observed")).collect().map(_.getLong(1)).toSet
    assert(buckets == Set(1704067199L, 1704067200L))
  }

  test("resampleFfill: two exchanges, no join; partitioning-independent") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1005L, 1L, 5.0), (1L, 1300L, 3L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Temporal.resampleFfill(df, Seq("user_id"), "ts",
      Seq("event_id"), "value", 100L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.split("\n").count(_.contains("Exchange")) == 2,
      s"resampleFfill = one (key,bucket) agg + one key window:\n$plan")
    assert(!plan.contains("Join"), s"gap generation must not join:\n$plan")
    val a = out.collect().map(_.toSeq).toSet
    val b = Temporal.resampleFfill(df.repartition(5), Seq("user_id"), "ts",
      Seq("event_id"), "value", 100L).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("touchAttribution: window bounds, no-touch nulls, first≠last") {
    val s = spark; import s.implicits._
    // conversion at ts 1000, window 500 → touches in [500, 1000]:
    //   ts 400 excluded (too old), ts 500 included (inclusive lower edge),
    //   ts 900 included, ts 1000 included (same-µs peer, RANGE frame)
    val df = Seq(
      (1L, 400L, 1L, "click"), (1L, 500L, 2L, "view"),
      (1L, 900L, 3L, "click"), (1L, 1000L, 4L, "view"),
      (1L, 1000L, 5L, "purchase"),
      (2L, 100L, 6L, "purchase"), // no touch at all → nulls
      (3L, 700L, 7L, "click"), (3L, 710L, 8L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.touchAttribution(df, "user_id", "ts", "event_id",
        "event_type", Seq("click", "view"), "purchase", 500L)
      .collect().map(r => (r.getLong(0),
        (if (r.isNullAt(3)) -1L else r.getLong(3)),
        (if (r.isNullAt(6)) -1L else r.getLong(6)))).toSet
    assert(got == Set(
      (1L, 2L, 4L),   // first = view@500 (edge in), last = view@1000 (peer)
      (2L, -1L, -1L), // no in-window touch
      (3L, 7L, 7L)))  // single touch: first == last
    val plan = Temporal.touchAttribution(df, "user_id", "ts", "event_id",
        "event_type", Seq("click", "view"), "purchase", 500L)
      .queryExecution.executedPlan.toString
    assert(plan.split("\n").count(_.contains("Exchange")) == 1 &&
      !plan.contains("Join"),
      s"attribution must be one key shuffle, no self-join:\n$plan")
  }

  test("ewmaTrailing: exact dyadic weights over a gappy series") {
    val s = spark; import s.implicits._
    // series "a": days 0, 1, 3 (day 2 missing) with H=4 → weights 8,4,2,1
    val df = Seq(("a", 0L, 10L), ("a", 1L, 20L), ("a", 3L, 40L))
      .toDF("series", "day", "y_fp")
    val got = Temporal.ewmaTrailing(df, Seq("series"), "day", "y_fp",
        horizon = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // day0: 10·8                         = 80
    // day1: 20·8 + 10·4                  = 200
    // day2: (spine fills)  20·4 + 10·2   = 100
    // day3: 40·8 + 20·2 + 10·1           = 370
    assert(got == Map(0L -> 80L, 1L -> 200L, 2L -> 100L, 3L -> 370L))
  }

  test("ewmaTrailing matches a driver-side reference per key on a dense panel") {
    val s = spark; import s.implicits._
    val rows = for (k <- Seq("x", "y"); d <- 0L until 40L)
      yield (k, d, (d * 37 % 101 + (if (k == "x") 7 else 0)))
    val got = Temporal.ewmaTrailing(rows.toDF("series", "day", "y_fp"),
        Seq("series"), "day", "y_fp")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byKey = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(r => r._2 -> r._3).toMap
    }
    for (k <- Seq("x", "y"); t <- 0L until 40L) {
      val want = (0 until 16).map(j =>
        byKey(k).getOrElse(t - j, 0L) * (1L << (15 - j))).sum
      assert(got((k, t)) == want, s"($k, $t)")
    }
    assert(got.size == 80)
  }

  test("timeWeightedAvg: held durations weight the mean; last state open") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, 10L, 0L, 100L),   // holds 10us at 100c
      (1L, 11L, 10L, 200L),  // holds 20us at 200c
      (1L, 12L, 30L, 999L),  // open-ended -> excluded
      (2L, 20L, 5L, 50L))    // single state -> no interval -> dropped
      .toDF("user_id", "event_id", "event_ts_us", "cents")
    val got = Temporal.timeWeightedAvg(df, Seq("user_id"), "event_ts_us",
        "event_id", "cents")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // (100·10 + 200·20) / 30 = 5000/30 = 166 (floor)
    assert(got == Map(1L -> ((2L, 30L, 166L))))
  }


  test("interpolateLinear: exact line through gaps, edges intact") {
    val s = spark; import s.implicits._
    // days 0, 3 known (100 -> 400): days 1, 2 interpolate to 200, 300;
    // second key has a single point (its spine is itself)
    val df = Seq(("a", 0L, 100L), ("a", 3L, 400L), ("b", 7L, 50L))
      .toDF("k", "day", "y_fp")
    val got = Temporal.interpolateLinear(df, Seq("k"), "day", "y_fp")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      ("a", 0L) -> ((100L, false)), ("a", 1L) -> ((200L, true)),
      ("a", 2L) -> ((300L, true)), ("a", 3L) -> ((400L, false)),
      ("b", 7L) -> ((50L, false))))
  }

  test("interpolateLinear: non-divisible gaps truncate deterministically") {
    val s = spark; import s.implicits._
    // 0 -> 10 over 3 days: day1 = (10*2+... (0*2 + 10*1)/3 = 3, day2 = 6
    val df = Seq(("a", 0L, 0L), ("a", 3L, 10L)).toDF("k", "day", "y_fp")
    val got = Temporal.interpolateLinear(df, Seq("k"), "day", "y_fp")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 0L, 1L -> 3L, 2L -> 6L, 3L -> 10L))
  }


  test("latenessAudit: running-max lateness in arrival order") {
    val s = spark; import s.implicits._
    // arrival order: ts 100, 300, 200 (100 late), 400 -> max late 100
    val df = Seq(("a", 1L, 100L), ("a", 2L, 300L), ("a", 3L, 200L),
      ("a", 4L, 400L), ("b", 5L, 10L)).toDF("stream", "arr", "ts")
    val got = Temporal.latenessAudit(df, "stream", Seq("arr"), "ts",
        thresholdUs = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((4L, 1L, 100L, 250000L)))
    assert(got("b") == ((1L, 0L, 0L, 0L)))
  }

  test("seasonalNaiveError: hand-computed MASE, degenerate series NULL") {
    val s = spark; import s.implicits._
    // season 2 over values 10, 20, 12, 24, 14: seasonal errors |12-10|,
    // |24-20|, |14-12| = 8 over 3; naive errors 10, 8, 12, 10 = 40 over 4
    val df = Seq(10L, 20L, 12L, 24L, 14L).zipWithIndex
      .map { case (y, i) => ("s", i.toLong, y) }.toDF("series", "idx", "y")
    val r = Temporal.seasonalNaiveError(df, Seq("series"), "idx", "y",
      season = 2).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 3L, 8L, 40L)))
    // mase = (8/3)/(40/4) = 0.2667 → (8*4*1e6) div (40*3)
    assert(r.getLong(5) == 8L * 4 * 1000000 / (40 * 3))
    // constant series: naive denominator 0 → NULL
    val const = Seq.fill(5)(7L).zipWithIndex
      .map { case (y, i) => ("c", i.toLong, y) }.toDF("series", "idx", "y")
    assert(Temporal.seasonalNaiveError(const, Seq("series"), "idx", "y", 2)
      .head().isNullAt(5))
  }

  test("cusumChangePoints: closed form equals the max(0, S+y) recursion") {
    val s = spark; import s.implicits._
    // values around target 10 with a persistent +5 shift from idx 5
    val vals = Seq(11L, 9L, 10L, 8L, 12L, 15L, 16L, 15L, 14L, 16L)
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
      .toDF("series", "idx", "y")
    val got = Temporal.cusumChangePoints(df, Seq("series"), "idx", "y",
        targetFp = 10L, slackFp = 1L, thresholdFp = 8L)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getBoolean(6)))
    // reference recursion
    var su = 0L; var sd = 0L
    vals.zip(got).foreach { case (v, (y, cu, cd, au, ad)) =>
      su = math.max(0L, su + (v - 10 - 1))
      sd = math.max(0L, sd - (v - 10 + 1))
      assert(y == v)
      assert(cu == su, s"up: got $cu want $su at v=$v")
      assert(cd == sd, s"down: got $cd want $sd at v=$v")
      assert(au == (su > 8) && ad == (sd > 8))
    }
    // the shift alarms the up side and never the down side
    assert(got.exists(_._4) && !got.exists(_._5))
  }

  test("latenessSweep: per-threshold drop rates from one lateness pass") {
    val s = spark; import s.implicits._
    // arrival order 1..4 with event times 10, 30, 20, 5 (us):
    // lateness = 0, 0, 10, 25
    val df = Seq(("s", 1L, 10L), ("s", 2L, 30L), ("s", 3L, 20L),
      ("s", 4L, 5L)).toDF("stream", "arr", "ts")
    val got = Temporal.latenessSweep(df, "stream", Seq("arr"), "ts",
        Seq(0L, 15L, 30L))
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0L) == ((4L, 2L)))  // late > 0: the 10 and 25
    assert(got(15L) == ((4L, 1L))) // only the 25
    assert(got(30L) == ((4L, 0L)))
  }

  test("kaplanMeier: textbook risk sets, censoring, and total collapse") {
    val s = spark; import s.implicits._
    // durations: t=1 event, t=2 censored, t=3 event, t=3 event
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, true))
      .toDF("d", "e")
    val got = Temporal.kaplanMeier(df, "d", col("e"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // t=1: n=4, d=1 → S = 3/4; t=2: n=3 censored only, S unchanged;
    // t=3: n=2, d=2 → everyone dies, S = 0
    val r1 = got(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((4L, 1L, 0L)))
    assert(math.abs(r1.getLong(5) - 750000L) <= 2, s"S(1)=${r1.getLong(5)}")
    val r2 = got(2L)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((3L, 0L, 1L)))
    assert(r2.getLong(5) == r1.getLong(5), "censoring must not move S")
    val r3 = got(3L)
    assert((r3.getLong(1), r3.getLong(2)) == ((2L, 2L)))
    assert(r3.isNullAt(4) && r3.getLong(5) == 0L)
  }

  test("rollingZOutliers: flat series spike flagged, warmup stays NULL") {
    val s = spark; import s.implicits._
    // series: 10,10,10,12,10, 100(spike), 10
    val df = Seq(10L, 10L, 10L, 12L, 10L, 100L, 10L).zipWithIndex
      .map { case (y, i) => ("s", i.toLong, y) }
      .toDF("series", "day", "y_fp")
    val got = Temporal.rollingZOutliers(df, Seq("series"), "day", "y_fp",
        window = 5, z = 2, minPoints = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getBoolean(5))))).toMap
    // days 0-2: fewer than 3 predecessors -> NULL verdict
    assert(got(0L)._3.isEmpty && got(1L)._3.isEmpty && got(2L)._3.isEmpty)
    assert(got(0L)._1 == 0L && got(2L)._1 == 2L)
    // day 3 (value 12 vs [10,10,10]): sigma 0, any deviation flags
    assert(got(3L) == ((3L, 30L, Some(true))))
    // day 4 (10 vs [10,10,10,12]): (4*10-42)^2=4 vs 4*(4*444-1764)=48 -> false
    assert(got(4L) == ((4L, 42L, Some(false))))
    // day 5 (100 vs [10,10,10,12,10]): big spike -> true
    assert(got(5L)._3.contains(true))
    // day 6 (10 vs window containing the spike [10,10,12,10,100]):
    // n=5 s1=142 s2=10504: (50-142)^2=8464 vs 4*(52520-20164)=129424 -> false
    assert(got(6L) == ((5L, 142L, Some(false))))
  }

}
