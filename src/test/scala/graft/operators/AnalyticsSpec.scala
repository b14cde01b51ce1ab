package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Relational-operator checks on the sf0.001 star schema. */
class AnalyticsSpec extends SparkSpec {

  test("pricingSummary groups to the 6 flag/status combinations") {
    val p = Analytics.pricingSummary(Tables.lineitem(spark, sfDir))
    assert(p.count() <= 9 && p.count() >= 1)
    assert(p.filter(col("sum_qty") <= 0 || col("count_order") <= 0).count() == 0)
  }

  test("revenueByRegion covers every region and totals match ungrouped sum") {
    val r = Analytics.revenueByRegion(
      Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir))
    assert(r.count() == 5)
    val total = r.agg(sum("n_items")).head.getLong(0)
    assert(total == Tables.lineitem(spark, sfDir).count())
  }

  test("revenueByRegion plan broadcasts the dimension side") {
    val r = Analytics.revenueByRegion(
      Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir))
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("q14/q15: customer is never hint-broadcast (only tiny dims are)") {
    // With auto-broadcast disabled, only the explicit region/nation hint
    // may broadcast; the customer join must degrade to a shuffle join —
    // the plan shape that survives a 100× customer table.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val r14 = Analytics.revenueByRegion(
        Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
        Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
        Tables.lineitem(spark, sfDir)).queryExecution.executedPlan.toString
      assert(r14.contains("BroadcastHashJoin"), s"dims not broadcast:\n$r14")
      assert(r14.contains("SortMergeJoin") || r14.contains("ShuffledHashJoin"),
        s"customer join should shuffle when broadcast is off:\n$r14")
      val r15 = Analytics.topCustomers(Tables.customer(spark, sfDir),
        Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir), 10)
        .queryExecution.executedPlan.toString
      assert(!r15.contains("BroadcastHashJoin"),
        s"q15 has no tiny dim — nothing should broadcast when auto is off:\n$r15")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("statusCustkeyDiff single-pass plan equals the EXCEPT formulation") {
    val o = Tables.orders(spark, sfDir)
    val fast = Analytics.statusCustkeyDiff(o).collect().map(_.getLong(0)).toSet
    val open = o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey")).distinct()
    val fin = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey")).distinct()
    val viaExcept = Analytics.symmetricDiff(open, fin)
      .collect().map(_.getLong(0)).toSet
    assert(fast == viaExcept)
  }

  test("topCustomers is deterministic and ordered") {
    val t = Analytics.topCustomers(Tables.customer(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir), 10).collect()
    assert(t.length == 10)
    val rev = t.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("runningSpend is monotone within a user") {
    val rs = Analytics.runningSpend(Tables.events(spark, sfDir))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_ts_us", "event_id")
    val bad = rs.withColumn("prev", lag("run_spend", 1).over(w))
      .filter(col("prev").isNotNull && col("run_spend") < col("prev"))
    assert(bad.count() == 0)
  }

  test("statusCustkeyDiff is the symmetric difference") {
    val d = Analytics.statusCustkeyDiff(Tables.orders(spark, sfDir))
    val o = Tables.orders(spark, sfDir)
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val fin = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(d.collect().map(_.getLong(0)).toSet == ((open diff fin) union (fin diff open)))
  }

  test("eventPivot row per user, pivoted columns named by type") {
    val ev = Tables.events(spark, sfDir)
    val p = Analytics.eventPivot(ev, Seq("click", "error", "purchase", "signup", "view"))
    assert(p.columns.toSeq == Seq("user_id", "click", "error", "purchase", "signup", "view"))
    assert(p.count() == ev.select("user_id").distinct().count())
  }

  test("lineitemUnpivot doubles the row count") {
    val li = Tables.lineitem(spark, sfDir)
    assert(Analytics.lineitemUnpivot(li).count() == 2 * li.count())
  }

  test("minuteSpine is dense: one row per minute, no gaps") {
    val s = Analytics.minuteSpine(Tables.events(spark, sfDir))
    val n = s.count()
    val bounds = s.agg(min("minute_bucket_us"), max("minute_bucket_us")).head
    assert(n == (bounds.getLong(1) - bounds.getLong(0)) / 60000000L + 1)
  }

  test("groupPercentilesDisc picks the exact sorted element per group") {
    val s = spark; import s.implicits._
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 4).map(i => ("b", i * 10.0))).toDF("g", "v")
    val q = Analytics.groupPercentilesDisc(df, Seq("g"), "v", Seq(25, 50, 90))
    val out = q.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // n=10: positions ceil(2.5)=3, ceil(5)=5, ceil(9)=9; n=4: 1, 2, 4
    assert(out == Map("a" -> ((3.0, 5.0, 9.0)), "b" -> ((10.0, 20.0, 40.0))))
  }

  test("groupPercentilesDisc handles duplicates, degenerate and tiny buckets") {
    val s = spark; import s.implicits._
    // duplicates straddling positions; a single-value group; a group
    // smaller than the bucket count
    val df = (Seq.fill(7)(("dup", 1.0)) ++ Seq.fill(3)(("dup", 2.0)) ++
      Seq.fill(5)(("const", 42.0)) ++ Seq(("tiny", 5.0), ("tiny", 7.0)))
      .toDF("g", "v")
    val out = Analytics.groupPercentilesDisc(df, Seq("g"), "v", Seq(50, 100),
        buckets = 4)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // dup n=10: p50 → pos 5 → 1.0, p100 → pos 10 → 2.0
    assert(out == Map("dup" -> ((1.0, 2.0)), "const" -> ((42.0, 42.0)),
      "tiny" -> ((5.0, 7.0))))
  }

  test("groupPercentilesDisc never sorts a whole group in one task") {
    val s = spark; import s.implicits._
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val q = Analytics.groupPercentilesDisc(df, Seq("g"), "v", Seq(50))
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = q.queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty, s"expected histogram windows in:\n$lp")
    // every window must consume a pre-aggregated (bounded) input, never the
    // raw rows of a group — the single-task-sort-per-group plan the 100 TB
    // posture forbids
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"window over non-aggregated input (single-task per-group sort):\n$lp")
    }
    intercept[IllegalArgumentException] {
      Analytics.groupPercentilesDisc(df, Seq("g"), "v", Seq(50, 50))
    }
  }

  test("groupPercentilesCont matches Spark's native percentile interpolation") {
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
    val got = Analytics.groupPercentilesCont(
        ev, Seq("event_type"), "value", "event_id", Seq(25, 50, 90))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val native = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == native.keySet)
    got.foreach { case (k, (a, b, c)) =>
      val (na, nb, nc) = native(k)
      assert(math.abs(a - na) < 1e-9 && math.abs(b - nb) < 1e-9 &&
        math.abs(c - nc) < 1e-9, s"$k: ($a,$b,$c) vs ($na,$nb,$nc)")
    }
  }

  test("denseEventGrid zero-fills absent cells over the full spine") {
    val s = spark; import s.implicits._
    val m = 60000000L
    val ev = Seq((1L, "a", 0L), (2L, "a", 2 * m), (3L, "b", 2 * m + 5))
      .toDF("event_id", "event_type", "event_ts_us")
    val out = Analytics.denseEventGrid(ev, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // spine: minutes 0,1,2 × types a,b = 6 cells
    assert(out.size == 6)
    assert(out((0L, "a")) == 1 && out((0L, "b")) == 0 &&
      out((m, "a")) == 0 && out((m, "b")) == 0 &&
      out((2 * m, "a")) == 1 && out((2 * m, "b")) == 1)
  }

  test("minute/week bucketing floors pre-1970 timestamps (DuckDB // semantics)") {
    val s = spark; import s.implicits._
    val m = 60000000L
    // -1 µs is in minute -1 under floor division; truncating div would put
    // it in minute 0 and diverge from the DuckDB oracle's `//`.
    val ev = Seq((1L, "a", -1L), (2L, "a", 0L))
      .toDF("event_id", "event_type", "event_ts_us")
    val grid = Analytics.denseEventGrid(ev, Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(grid == Map(-m -> 1L, 0L -> 1L), s"$grid")
    val wk = 604800000000L
    val coh = Analytics.cohortRetention(
        Seq((1L, -1L), (1L, 0L)).toDF("user_id", "event_ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // first activity is week -1; the week-0 event is weeks_since = 1
    assert(coh == Map((-1L, 0L) -> 1L, (-1L, 1L) -> 1L), s"$coh")
  }

  test("userValueBounds: first/last/second values under the total order") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, 10L, "purchase", 5.0, 100L), (2L, 10L, "purchase", 7.0, 200L),
      (3L, 10L, "purchase", 9.0, 300L), (4L, 20L, "purchase", 1.0, 50L))
      .toDF("event_id", "user_id", "event_type", "value", "event_ts_us")
    val out = Analytics.userValueBounds(ev)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), Option(r.get(5))))).toMap
    assert(out(1L) == ((5.0, 9.0, Some(7.0))))
    assert(out(3L) == ((5.0, 9.0, Some(7.0))))
    assert(out(4L) == ((1.0, 1.0, None))) // single row: no second value
  }

  test("customerValueTiles: deciles balanced within 1, ranks in [0,1]") {
    val out = Analytics.customerValueTiles(Tables.customer(spark, sfDir))
    assert(out.filter(col("pct_rank") < 0 || col("pct_rank") > 1 ||
      col("cume") <= 0 || col("cume") > 1 ||
      col("decile") < 1 || col("decile") > 10).count() == 0)
    val sizes = out.groupBy(col("c_mktsegment"), col("decile")).count()
      .groupBy(col("c_mktsegment"))
      .agg((max(col("count")) - min(col("count"))).as("spread"))
      .filter(col("spread") > 1).count()
    assert(sizes == 0, "ntile split unbalanced beyond 1")
  }

  test("salesHopping assigns every purchase to exactly two windows") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase" &&
      col("event_ts_us").isNotNull).count()
    val windowed = graft.pipeline.Medallion.salesHopping(ev)
      .agg(sum(col("paid_orders"))).head.getLong(0)
    assert(windowed == 2 * purchases, s"$windowed vs 2x$purchases")
  }

  test("funnelCounts: order and horizon are enforced per user") {
    val s = spark; import s.implicits._
    val h = 1000L
    val ev = Seq(
      // user 1: full ordered funnel inside the horizon
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: only click is BEFORE the first view — stage 2 must not
      // count it (the purchase can then never qualify either)
      (2L, "click", 50L), (2L, "view", 100L), (2L, "purchase", 120L),
      // user 3: click outside the stage-1 horizon
      (3L, "view", 100L), (3L, "click", 1200L),
      // user 4: purchase before click — stages 1-2 only
      (4L, "view", 10L), (4L, "purchase", 20L), (4L, "click", 30L),
      // null user: ignored entirely
      (-1L, "view", 5L))
      .map { case (u, t, ts) => (if (u < 0) None else Some(u), t, ts) }
      .toDF("user_id", "event_type", "event_ts_us")
    val out = Analytics.funnelCounts(ev, Seq("view", "click", "purchase"), h)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // views: users 1,2,3,4; clicks after view in horizon: 1,4 (2 has no
    // click >= its view, 3 is out of horizon); purchases after that: 1
    assert(out == Map("view" -> 4L, "click" -> 2L, "purchase" -> 1L), s"$out")
  }

  test("cohortRetention: first-activity week anchors the triangle") {
    val s = spark; import s.implicits._
    val wk = 604800000000L
    val ev = Seq(
      (1L, 0L), (1L, wk), (1L, 2 * wk),      // cohort 0, weeks 0,1,2
      (2L, 0L), (2L, 2 * wk),                // cohort 0, weeks 0,2
      (3L, wk), (3L, wk + 1))                // cohort 1, week 0 (twice)
      .toDF("user_id", "event_ts_us")
    val out = Analytics.cohortRetention(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L, (1L, 0L) -> 1L), s"$out")
  }

  test("customerOrderFullJoin produces matched, left-only and right-only rows") {
    val out = Analytics.customerOrderFullJoin(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir))
    assert(out.filter(col("c_custkey").isNotNull && col("o_custkey").isNotNull)
      .count() > 0, "no matched rows")
    assert(out.filter(col("o_custkey").isNull).count() > 0, "no left-only rows")
    assert(out.filter(col("c_custkey").isNull).count() > 0, "no right-only rows")
  }

  test("orderStatusCube: four grouping sets, gid flags the subtotal NULLs") {
    val out = Analytics.orderStatusCube(Tables.orders(spark, sfDir)).collect()
    val gids = out.map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
    out.foreach { r =>
      val (st, pr, gid) = (r.get(0), r.get(1), r.getAs[Long]("gid"))
      assert((st == null) == ((gid & 2L) != 0), s"gid bit 1 vs status: $r")
      assert((pr == null) == ((gid & 1L) != 0), s"gid bit 0 vs priority: $r")
    }
    // grand total row counts everything
    val total = out.filter(_.getAs[Long]("gid") == 3L).map(_.getAs[Long]("n_orders")).sum
    assert(total == Tables.orders(spark, sfDir).count())
  }

  test("sketch family: HLL distinct and approx percentile bounded by exact") {
    // Sketches are estimation contracts, not value contracts — no DuckDB
    // hash gate is possible by design (different sketch impls), so the
    // gate is the error bound against the exact operators.
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d_exact"),
        expr("percentile(value, 0.5)").as("p50_exact"))
    val approx = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.05).as("d_approx"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"))
    val joined = exact.join(approx, Seq("event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (d, da) = (r.getAs[Long]("d_exact"), r.getAs[Long]("d_approx"))
      assert(math.abs(da - d) <= math.max(1, (3 * 0.05 * d).toLong),
        s"${r.get(0)}: HLL estimate $da vs exact $d outside 3*rsd")
      val (p, pa) = (r.getAs[Double]("p50_exact"), r.getAs[Double]("p50_approx"))
      assert(math.abs(pa - p) <= math.abs(p) * 0.05 + 1e-9,
        s"${r.get(0)}: approx p50 $pa vs exact $p")
    }
  }

  test("trailingSpend: RANGE frame includes same-day peers, excludes past-horizon") {
    val s = spark; import s.implicits._
    val orders = Seq(
      // cust 1: two same-day orders (peers), one 30 days later (inside),
      // one 31 days after THAT (outside its window)
      (1L, 1L, "O", 10.0, "2024-01-01 00:00:00"),
      (2L, 1L, "O", 5.0, "2024-01-01 12:00:00"), // same epoch-day as #1
      (3L, 1L, "O", 7.0, "2024-01-31 00:00:00"), // day 30 after day 0
      (4L, 1L, "O", 2.0, "2024-03-02 00:00:00"), // 31 days after #3
      (5L, 2L, "O", 9.0, "2024-01-15 00:00:00"))
      .map { case (k, c, st, p, d) =>
        (k, c, st, p, java.time.LocalDateTime.parse(d.replace(" ", "T")))
      }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
    val out = Analytics.trailingSpend(orders, 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // RANGE peers: orders 1 and 2 share a day, both see 10+5
    assert(out == Map(1L -> 15.0, 2L -> 15.0, 3L -> 22.0, 4L -> 2.0, 5L -> 9.0),
      s"got $out")
  }

  test("acctbalHistogram buckets are within [1,20] and count all customers") {
    val h = Analytics.acctbalHistogram(Tables.customer(spark, sfDir))
    assert(h.filter(col("bucket") < 1 || col("bucket") > 20).count() == 0)
    assert(h.agg(sum("n")).head.getLong(0) == Tables.customer(spark, sfDir).count())
  }

  test("eventTransitions: per-user bigram counts, outflow, probability") {
    val s = spark; import s.implicits._
    // user 1: A→B→A; user 2: B→B; null user dropped
    val df = Seq(
      (Some(1L), "A", 1L, 1L), (Some(1L), "B", 2L, 2L), (Some(1L), "A", 3L, 3L),
      (Some(2L), "B", 5L, 4L), (Some(2L), "B", 6L, 5L),
      (None, "A", 7L, 6L))
      .toDF("user_id", "event_type", "event_ts_us", "event_id")
    val got = Analytics.eventTransitions(df).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      ("A", "B") -> ((1L, 1L, 1.0)),
      ("B", "A") -> ((1L, 2L, 0.5)),
      ("B", "B") -> ((1L, 2L, 0.5))))
    // probabilities out of each origin sum to 1
    val sums = Analytics.eventTransitions(df)
      .groupBy(col("from_type")).agg(sum(col("p")).as("sp"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(x => math.abs(x - 1.0) < 1e-12))
  }

  test("madOutliers: robust where the mean is dragged; exact median replay") {
    val s = spark; import s.implicits._
    // group "a": values 1..9 plus a 1000 outlier. med(q) = 5000 (lower
    // median of 10), deviations {1000·|i−5|} ∪ {995000} → mad = 2000.
    // Only the outlier exceeds 3·mad. A z-score on the same data is
    // dragged: σ ≈ 315 → z(1000) ≈ 2.85 but z(9) ≈ −0.3 — both ends
    // survive under MAD's tighter spread too; the point is med/mad are
    // outlier-insensitive (breakdown), asserted by the exact values.
    val df = ((1L to 9L).map(i => ("a", i, i.toDouble)) :+ ("a", 10L, 1000.0))
      .toDF("g", "id", "value")
    val got = Analytics.madOutliers(df, Seq("g"), "value", Seq("id"), 3.0)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq((10L, 1000.0, 995000L, 2000L)), s"got ${got.toSeq}")
    // constant group: mad = 0, no deviation > 0 → nothing flagged
    val const = Seq(("c", 1L, 5.0), ("c", 2L, 5.0)).toDF("g", "id", "value")
    assert(Analytics.madOutliers(const, Seq("g"), "value", Seq("id"), 3.0)
      .count() == 0)
    // >50% one value: mad = 0 → EVERY other value flagged at any k
    val half = Seq(("h", 1L, 5.0), ("h", 2L, 5.0), ("h", 3L, 5.0),
      ("h", 4L, 7.0)).toDF("g", "id", "value")
    assert(Analytics.madOutliers(half, Seq("g"), "value", Seq("id"), 100.0)
      .collect().map(_.getLong(1)).toSeq == Seq(4L))
  }

  test("categoryDrift: hand-computed smoothed KL terms; identity gives zero") {
    val s = spark; import s.implicits._
    // P side: a,a,a,b ; Q side: a,b,b,b → symmetric drift
    val df = Seq(("a", true), ("a", true), ("a", true), ("b", true),
      ("a", false), ("b", false), ("b", false), ("b", false))
      .toDF("cat", "is_p")
    val got = Analytics.categoryDrift(df, "cat", col("is_p"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    def term(np: Long, nq: Long): Long = {
      val p = (np + 1.0) / (4.0 + 2.0); val q = (nq + 1.0) / (4.0 + 2.0)
      math.floor(p * math.log(p / q) * 1e9).toLong
    }
    assert(got == Map("a" -> ((3L, 1L, term(3, 1))),
      "b" -> ((1L, 3L, term(1, 3)))), s"got $got")
    // identical slices → every term is exactly floor(0) = 0
    val same = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("cat", "is_p")
    assert(Analytics.categoryDrift(same, "cat", col("is_p"))
      .filter(col("kl_fp") =!= 0L).count() == 0)
  }

  test("sessionPaths: ordered rendering, counts, top-k tiebreak") {
    val s = spark; import s.implicits._
    // u1 s1: A>B, u1 s2: A>B, u2 s1: B>A, u3 s1: C — order within the
    // session comes from (ts, event_id), including a same-ts tie
    val df = Seq(
      (1L, 1L, "A", 0L), (1L, 2L, "B", 10L),
      (1L, 3L, "A", 500L), (1L, 4L, "B", 505L),
      (2L, 5L, "B", 0L), (2L, 6L, "A", 0L), // same ts: id 5 before id 6
      (3L, 7L, "C", 0L))
      .toDF("user_id", "event_id", "event_type", "event_ts_us")
    val got = Analytics.sessionPaths(df, 100L, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("A>B", 2L), ("B>A", 1L), ("C", 1L)),
      s"got $got") // count desc, then path asc breaks the 1-1 tie
    // k truncates
    assert(Analytics.sessionPaths(df, 100L, 1)
      .collect().map(_.getString(0)).toSeq == Seq("A>B"))
  }

  test("sessionPmi: hand-computed association on a three-session stream") {
    val s = spark; import s.implicits._
    // gap 100 → sessions: u1[s1]: {A,B}, u1[s2]: {A}, u2[s1]: {A,B}
    // N = 3, n_A = 3, n_B = 2, n_AB = 2
    val df = Seq(
      (1L, 1L, "A", 0L), (1L, 2L, "B", 10L),   // u1 session 1
      (1L, 3L, "A", 500L),                     // u1 session 2
      (2L, 4L, "A", 0L), (2L, 5L, "B", 50L))   // u2 session 1
      .toDF("user_id", "event_id", "event_type", "event_ts_us")
    val got = Analytics.sessionPmi(df, 100L).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ("A", "B", 2L, 3L, 2L))
    assert(r.getLong(5) ==
      math.floor(math.log(2.0 * 3.0 / (3.0 * 2.0)) * 1e6).toLong) // ln 1 = 0
    // independent types in every session → PMI 0; co-occurring beyond
    // independence → positive
    val pos = Seq((1L, 1L, "X", 0L), (1L, 2L, "Y", 1L),
      (2L, 3L, "X", 0L), (2L, 4L, "Y", 1L))
      .toDF("user_id", "event_id", "event_type", "event_ts_us")
    val p = Analytics.sessionPmi(pos, 100L).collect()(0)
    assert(p.getLong(5) == math.floor(math.log(2.0 * 2.0 / (2.0 * 2.0)) * 1e6)
      .toLong)
  }

  test("groupZScores: hand-computed z, degenerate groups dropped") {
    val s = spark; import s.implicits._
    // group "a": nine 0.0 and one 100.0 → only the 100 has |z| >= 2
    // group "b": constant → zero variance, dropped
    // group "c": single row, dropped; null value ignored
    val rows = (1L to 9L).map(i => ("a", i, 0.0)) ++ Seq(("a", 10L, 100.0),
      ("b", 11L, 5.0), ("b", 12L, 5.0), ("c", 13L, 3.0))
    val df = rows.toDF("g", "id", "value")
      .unionByName(Seq(("a", 14L, Option.empty[Double])).toDF("g", "id", "value"))
    val got = Analytics.groupZScores(df, Seq("g"), "value", Seq("id"), 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    // replicate the pinned double recipe: q = floor(v·1000)
    val sx = 100000.0; val sxx = 1e10; val n = 10.0
    val mean = sx / n
    val vr = (n * sxx - sx * sx) / (n * (n - 1.0))
    val zExp = (100000.0 - mean) / math.sqrt(vr)
    assert(got.toSeq == Seq(("a", 10L, zExp)), s"got ${got.toSeq}")
    // zMin = 0 returns every well-defined row (10 in group a; b, c dropped)
    assert(Analytics.groupZScores(df, Seq("g"), "value", Seq("id"), 0.0)
      .count() == 10)
  }

  test("basketLift: hand-computed lift, support bar, duplicate lines collapse") {
    val s = spark; import s.implicits._
    // baskets: {p,q} ×2, {p,q,r}, {r} → N=4; pq in 3, pr/qr in 1
    val items = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L), (2L, 20L), // duplicate line — distinct collapses
      (3L, 10L), (3L, 20L), (3L, 30L),
      (4L, 30L)).toDF("o", "p")
    val got = Analytics.basketLift(items, "o", "p", minSupport = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // lift(10,20) = (3·4)/(3·3) = 4/3 → 1333333; pairs with r fail support
    assert(got == Set((10L, 20L, 3L, 3L, 3L,
      math.floor(3.0 * 4.0 * 1e6 / 9.0).toLong)), s"got $got")
  }

  test("olsFit: exact closed form on a perfect line; degenerate groups dropped") {
    val s = spark; import s.implicits._
    val pts = Seq(
      ("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L),   // y = 2x + 1 exactly
      ("b", 5L, 7L),                                  // single point → dropped
      ("c", 4L, 9L), ("c", 4L, 11L))                  // zero x-variance → dropped
      .toDF("g", "x_fp", "y_fp")
    val got = Analytics.olsFit(pts, Seq("g"), "x_fp", "y_fp")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == Set("a"))
    // integer closed form divides exactly → doubles are exact
    assert(got("a") == ((3L, 2.0, 1.0)))
  }

  test("olsFit matches a driver-side reference on noisy integer points") {
    val s = spark; import s.implicits._
    val raw = (0 until 40).map(i =>
      ("g", i.toLong, (3 * i + 7 + (i * i * 31 % 11) - 5).toLong))
    val got = Analytics.olsFit(raw.toDF("g", "x_fp", "y_fp"),
      Seq("g"), "x_fp", "y_fp").head()
    val n = BigInt(raw.size)
    val sx = raw.map(p => BigInt(p._2)).sum
    val sy = raw.map(p => BigInt(p._3)).sum
    val sxy = raw.map(p => BigInt(p._2) * BigInt(p._3)).sum
    val sxx = raw.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    assert(got.getDouble(2) == slope && got.getDouble(3) == intercept)
  }

  test("trendSlopes: perfect daily line gives the exact cents/day slope") {
    val s = spark; import s.implicits._
    val day = 86400000000L
    val events = Seq(
      ("purchase", 0L * day + 5L, 0.40), ("purchase", 0L * day + 9L, 0.60),
      ("purchase", 1L * day + 1L, 2.00),
      ("purchase", 2L * day + 3L, 3.00),
      ("click", 1L * day, 1.00)) // single day → dropped
      .toDF("event_type", "event_ts_us", "value")
    val got = Analytics.trendSlopes(events, "event_type", "event_ts_us", "value")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // daily cents: (0,100), (1,200), (2,300) → slope 100 cents/day, α=100
    assert(got == Map("purchase" -> ((3L, 100.0, 100.0))))
  }

  test("corrPairs: perfect ±1 correlations, zero-variance pairs dropped") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("up", 0L, 1L), ("up", 1L, 2L), ("up", 2L, 3L),
      ("dn", 0L, 9L), ("dn", 1L, 6L), ("dn", 2L, 3L),
      ("fl", 0L, 5L), ("fl", 1L, 5L), ("fl", 2L, 5L))
      .toDF("series", "day", "y_fp")
    val got = Analytics.corrPairs(df, "day", "series", "y_fp")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // (dn,up) anticorrelated; every pair with "fl" is dropped. The exact
    // closed form is -18/(√54·√6): compare with the operator's own
    // expression shape (√54·√6 is one ulp off 18 in doubles).
    val want = -18.0 / (math.sqrt(54.0) * math.sqrt(6.0))
    assert(got.keySet == Set(("dn", "up")))
    assert(got(("dn", "up"))._1 == 3L)
    assert(got(("dn", "up"))._2 == want && math.abs(want + 1.0) < 1e-12)
  }

  test("corrPairs matches a BigInt driver-side reference on noisy series") {
    val s = spark; import s.implicits._
    val xs = (0 until 30).map(i => i.toLong -> ((i * i * 13 % 97) + 3).toLong)
    val ys = (0 until 30).map(i => i.toLong -> ((i * 29 % 83) - 7).toLong)
    val df = (xs.map { case (d, v) => ("mx", d, v) } ++
      ys.map { case (d, v) => ("my", d, v) }).toDF("series", "day", "y_fp")
    val r = Analytics.corrPairs(df, "day", "series", "y_fp").head()
    val n = BigInt(30)
    val sx = xs.map(p => BigInt(p._2)).sum
    val sy = ys.map(p => BigInt(p._2)).sum
    val sxy = xs.zip(ys).map { case ((_, a), (_, b)) => BigInt(a) * b }.sum
    val sxx = xs.map(p => BigInt(p._2) * p._2).sum
    val syy = ys.map(p => BigInt(p._2) * p._2).sum
    val want = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("mx", "my", 30L)))
    assert(r.getDouble(3) == want)
  }

  test("rfmSegments: hand-computed quintiles with unique-tiebreak ranks") {
    val s = spark; import s.implicits._
    // 5 customers, one order each except cust 1 (two orders): strictly
    // ordered metrics → each lands in its own quintile; monetary tie
    // between 4 and 5 resolves by custkey.
    val ts = java.sql.Timestamp.valueOf(_: String)
    val orders = Seq(
      (1L, ts("2024-01-10 00:00:00"), 100.0),
      (1L, ts("2024-01-20 00:00:00"), 50.0),
      (2L, ts("2024-01-02 00:00:00"), 400.0),
      (3L, ts("2024-01-03 00:00:00"), 300.0),
      (4L, ts("2024-01-04 00:00:00"), 200.0),
      (5L, ts("2024-01-05 00:00:00"), 200.0))
      .toDF("cust", "dt", "amt")
    val got = Analytics.rfmSegments(orders, "cust", "dt", "amt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toMap
    // recency asc: 2,3,4,5,1 → r_scores 1,2,3,4,5 (cust1 most recent)
    // frequency asc: (1-each: 2,3,4,5 by custkey), then cust1 → f: cust1=5
    // monetary asc: 1(150),4(200),5(200 ties, custkey),3(300),2(400)
    assert(got(1L)._4 == 5 && got(2L)._4 == 1 && got(1L)._7.startsWith("55"))
    assert(got(1L)._5 == 5) // only multi-order customer tops frequency
    assert(Seq(got(2L)._5, got(3L)._5, got(4L)._5, got(5L)._5).sorted ==
      Seq(1L, 2L, 3L, 4L)) // custkey tiebreak on all-tied frequency
    assert(got(1L)._6 == 1 && got(4L)._6 == 2 && got(5L)._6 == 3 &&
      got(3L)._6 == 4 && got(2L)._6 == 5)
    assert(got(1L)._3 == 150.0 && got(1L)._2 == 2)
    assert(got(2L)._7 == "115") // oldest order, one order, highest spend
  }

  test("keySkewProfile: shares, cumulative shares and x-mean are exact ppm") {
    val s = spark; import s.implicits._
    // key a: 6 rows, b: 3, c: 1 → total 10, 3 keys, mean 10/3
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val got = Analytics.keySkewProfile(df, "k", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      ("a", 6L, 1L, 600000L, 600000L, 1800000L),   // 6/10, 6·3/10 of mean
      ("b", 3L, 2L, 300000L, 900000L, 900000L)))
    spark.catalog.clearCache()
  }

  test("giniByGroup: hand Gini values, equal distribution is zero") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("g1", 1L, 0L), ("g1", 2L, 0L), ("g1", 3L, 10L),  // G = 2/3
      ("g2", 4L, 5L), ("g2", 5L, 5L), ("g2", 6L, 5L),   // equal → 0
      ("g3", 7L, -4L), ("g3", 8L, 6L))                  // negative dropped
      .toDF("g", "id", "cents")
    val got = Analytics.giniByGroup(df, "g", "id", "cents")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("g1") == ((3L, 10L, 666666L)))
    assert(got("g2") == ((3L, 15L, 0L)))
    assert(got("g3") == ((1L, 6L, 0L)))  // single member → G = 0
  }


  test("ohlcBars: open/close by (ts,id), same-ts tie resolved by id") {
    val s = spark; import s.implicits._
    val day = 86400000000L
    val df = Seq(
      ("a", 1L, 5L, 10L), ("a", 2L, 5L, 30L),       // same ts: id orders
      ("a", 3L, 99L, 7L), ("a", 4L, day + 1, 500L)) // second bucket
      .toDF("k", "id", "ts", "cents")
    val got = Analytics.ohlcBars(df, Seq("k"), "ts", "id", "cents", day)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got(("a", 0L)) == ((10L, 30L, 7L, 7L, 3L)))
    assert(got(("a", 1L)) == ((500L, 500L, 500L, 500L, 1L)))
  }


  test("winsorizedStats: clips at exact discrete percentiles") {
    val s = spark; import s.implicits._
    // group g: values 1..100 -> p5 = 5, p95 = 95 (discrete, ceil rank)
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("k", "cents")
    val r = Analytics.winsorizedStats(df, Seq("k"), "cents", 5, 95).head()
    // clipped below: 1..4 -> 4 rows; above: 96..100 -> 5 rows
    // win sum = 5*4 + (5..95 sum) + 95*5 = 20 + 4550 + 475
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((100L, 4L, 5L, 5045L, 50L)))
  }

  test("seasonalityProfile: cells, means and ppm index on a hand stream") {
    val s = spark; import s.implicits._
    val hour = 3600000000L
    val day = 24 * hour
    // epoch day 0 = Thursday = dow 3; two events Thu 00h, one Thu 01h
    val df = Seq((0L * hour + 5, 100L), (0L * hour + 9, 300L),
      (1L * hour + 1, 100L), (7L * day + 2, 500L)) // +7d -> same dow 3, 00h
      .toDF("ts", "cents")
    val got = Analytics.seasonalityProfile(df, "ts", "cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // cell (3,0): n=3 sum=900 mean=300; overall 4 rows 1000c
    // index = 900*4*1e6 / (3*1000) = 1200000
    assert(got((3L, 0L)) == ((3L, 900L, 300L, 1200000L)))
    assert(got((3L, 1L)) == ((1L, 100L, 100L, 400000L)))
  }


  test("repeatCohorts: first-month cohorts, repeat flags, exact cents") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "2024-01-15", 10.00), (1L, "2024-03-02", 5.50),  // repeat, Jan
      (2L, "2024-01-20", 7.25),                             // one-shot, Jan
      (3L, "2024-02-01", 1.00), (3L, "2024-02-28", 1.00))   // repeat, Feb
      .toDF("c", "d", "amt")
    val got = Analytics.repeatCohorts(df, "c", "d", "amt")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val jan = 2024L * 12 + 0; val feb = jan + 1
    assert(got(jan) == ((2L, 1L, 500000L, 2275L)))  // 1550 + 725 cents
    assert(got(feb) == ((1L, 1L, 1000000L, 200L)))
  }


  test("maxDrawdown: hand series with a planted 40-cent fall") {
    val s = spark; import s.implicits._
    // flows: +100, +50, -40, +20, -10 -> cum 100,150,110,130,120
    // peak 100,150,150,150,150 -> max drawdown 40
    val df = Seq(("a", 1L, 100L), ("a", 2L, 50L), ("a", 3L, -40L),
      ("a", 4L, 20L), ("a", 5L, -10L)).toDF("k", "t", "c")
    val r = Analytics.maxDrawdown(df, Seq("k"), "t", "t", "c").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 120L, 150L, 40L)))
  }

  test("rfmSegmentsByCuts: quintile scores from cut values, ties share scores") {
    val s = spark; import s.implicits._
    // customer c places c orders of 100 cents on day c → recency c,
    // frequency c, monetary 100c: per-metric distinct values 1..10 (/
    // 100..1000); quintile cuts at positions 2,4,6,8 → values 2,4,6,8;
    // score = 1 + #(cuts strictly below value).
    val orders = (1L to 10L).flatMap(c => Seq.fill(c.toInt)((c, c, 100L)))
      .toDF("cust_id", "day", "cents")
    val got = Analytics.rfmSegmentsByCuts(orders, "cust_id", "day", "cents")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    def exp(v: Long): Int = 1 + Seq(2L, 4L, 6L, 8L).count(v > _)
    (1L to 10L).foreach { c =>
      val e = exp(c)
      assert(got(c) == ((e, e, e, s"$e$e$e")), s"cust $c")
    }
    // monotone: most recent/frequent/valuable customer is 555
    assert(got(10L)._4 == "555" && got(1L)._4 == "111")
    spark.catalog.clearCache()
  }

  test("sequenceGaps: hole boundaries and sizes, step-aware, dups ignored") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 5L), ("a", 5L), ("a", 9L),
      ("b", 10L), ("b", 11L)).toDF("k", "id")
    val got = Analytics.sequenceGaps(df, Seq("k"), "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(("a", 3L, 4L, 2L), ("a", 6L, 8L, 3L)))
    // step 2 over evens: 2, 4, 8 → one gap {6}
    val ev = Seq(("c", 2L), ("c", 4L), ("c", 8L)).toDF("k", "id")
    val g2 = Analytics.sequenceGaps(ev, Seq("k"), "id", step = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(g2 == Set((6L, 6L, 1L)))
  }

  test("frequentTriples: closure-pruned counts equal brute force") {
    val s = spark; import s.implicits._
    // baskets: {1,2,3} x2, {1,2,4}, {2,3,4}, {1,2,3,4}
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 4L),
      (13L, 2L), (13L, 3L), (13L, 4L),
      (14L, 1L), (14L, 2L), (14L, 3L), (14L, 4L))
      .toDF("bk", "it")
    val got = Analytics.frequentTriples(baskets, "bk", "it", minSupport = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    // (1,2,3): baskets 10,11,14 → 3; (1,2,4): 12,14 → 2; (2,3,4): 13,14 → 2
    assert(got == Map((1L, 2L, 3L) -> 3L, (1L, 2L, 4L) -> 2L,
      (2L, 3L, 4L) -> 2L))
    // support 3 keeps only the heavy triple
    val strict = Analytics.frequentTriples(baskets, "bk", "it", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(strict == Set((1L, 2L, 3L)))
    spark.catalog.clearCache()
  }

  test("topPaths: counts 3-step runs per key, ragged tails dropped") {
    val s = spark; import s.implicits._
    // user 1: a,b,c,d → paths a>b>c, b>c>d; user 2: a,b,c → a>b>c;
    // user 3: x,y (too short)
    val ev = Seq((1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"), (1L, 3L, 12L, "c"),
      (1L, 4L, 13L, "d"), (2L, 5L, 20L, "a"), (2L, 6L, 21L, "b"),
      (2L, 7L, 22L, "c"), (3L, 8L, 30L, "x"), (3L, 9L, 31L, "y"))
      .toDF("uid", "eid", "ts", "state")
    val got = Analytics.topPaths(ev, "uid", "ts", "eid", "state",
        len = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("a > b > c", 2L, 1), ("b > c > d", 1L, 2)))
  }

  test("runningDistinct: first-seen attribution and cumulative sum") {
    val s = spark; import s.implicits._
    // day 1: u1,u2; day 2: u2,u3; day 3: u1 (nothing new)
    val df = Seq((1L, "u1"), (1L, "u2"), (2L, "u2"), (2L, "u3"), (3L, "u1"))
      .toDF("day", "user")
    val got = Analytics.runningDistinct(df, "day", "user")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(1L -> ((2L, 2L)), 2L -> ((1L, 3L)), 3L -> ((0L, 3L))))
  }

}
