package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantics checks for the medallion transforms on the sf0.001 tables. */
class MedallionSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir)

  test("bronzeProject keeps one row per event with the envelope columns") {
    val b = Medallion.bronzeProject(events)
    assert(b.columns.toSeq == Seq("event_id", "raw_key", "raw_value", "topic",
      "event_ts_us", "event_date"))
    assert(b.count() == events.count())
  }

  test("dedupLatest keeps exactly one row per (user, type), the newest") {
    val d = Medallion.dedupLatest(events)
    assert(d.groupBy("user_id", "event_type").count().filter(col("count") > 1).count() == 0)
    val manual = events.groupBy("user_id", "event_type")
      .agg(max("event_ts_us").as("m")).count()
    assert(d.count() == manual)
  }

  test("parseProps extracts k and tolerates malformed JSON") {
    import spark.implicits._
    val bad = Seq((1L, """{"k": 7}"""), (2L, "not json"), (3L, """{"other": 1}"""))
      .toDF("event_id", "props")
    val parsed = Medallion.parseProps(bad).collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(parsed == Map(1L -> Some(7), 2L -> None, 3L -> None))
  }

  test("enrich: fully_paid means paid_amount >= total_amount, nulls → 0.0") {
    val e = Medallion.enrich(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
    assert(e.filter(col("paid_amount").isNull).count() == 0)
    assert(e.filter(col("fully_paid") =!=
      (col("paid_amount") >= col("total_amount"))).count() == 0)
  }

  test("salesMinute sums only purchases, exactly") {
    val fct = Medallion.salesMinute(events)
    val gmvTotal = fct.agg(sum("gmv")).head.getDouble(0)
    val direct = events.filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    assert(math.abs(gmvTotal - direct) < 1e-6)
    assert(fct.agg(sum("paid_orders")).head.getLong(0) ==
      events.filter(col("event_type") === "purchase").count())
  }

  test("incremental lookback only rebuilds buckets inside the window") {
    val incr = Medallion.salesMinuteIncremental(events, 7200000000L)
    val cutoff = events.agg(max("event_ts_us")).head.getLong(0) - 7200000000L
    assert(incr.filter(col("minute_bucket_us") < cutoff - 60000000L).count() == 0)
  }

  test("salesLastNMinutes is bounded by the newest bucket") {
    val last = Medallion.salesLastNMinutes(events, 60)
    val hi = Medallion.salesMinute(events).agg(max("minute_bucket_us")).head.getLong(0)
    assert(last.filter(col("minute_bucket_us") < hi - 3600000000L).count() == 0)
    assert(last.count() >= 1)
  }

  test("topMinutes returns k rows in gmv-desc order") {
    val top = Medallion.topMinutes(events, 5).collect()
    assert(top.length == 5)
    val gmvs = top.map(_.getAs[Double]("gmv"))
    assert(gmvs.zip(gmvs.tail).forall { case (a, b) => a >= b })
  }
  test("mergeAggState: batch folds equal the one-shot rollup exactly, " +
    "including NULL/negative ids and 3-decimal values") {
    val s2 = spark; import s2.implicits._
    // Hostile rows for the q235 gate shape: a NULL id and a negative id
    // (both lost by a bare `id % 2 === i` slice), 3-decimal doubles,
    // and 0.29 — the exact-2dp value whose double*100 lands BELOW the
    // integer (28.9999..), which bare floor undercounts a cent.
    val rows = Seq(("x", Some(1L), 1.10), ("x", Some(2L), 2.205),
      ("y", Some(3L), 3.00), ("x", Some(-4L), 4.40),
      ("y", None, 0.305), ("z", Some(6L), 9.999), ("w", Some(7L), 0.29))
      .toDF("g", "id", "v")
    def batch(i: Int) =
      rows.filter(pmod(coalesce(col("id"), lit(0L)), lit(2)) === i)
    val folded = Medallion.mergeAggState(
      Some(Medallion.mergeAggState(None, batch(0), Seq("g"), "v")),
      batch(1), Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).toPlainString))).toMap
    val oneShot = Medallion.mergeAggState(None, rows, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).toPlainString))).toMap
    assert(folded == oneShot)
    // floor(x·100 + 0.5) cents: 1.10 → 110, 2.205 → 221, 4.40 → 440
    // ⇒ x = 7.71; 9.999 → 1000 ⇒ z = 10.00; 0.29 → 29 exactly (bare
    // floor would say 28).
    assert(folded("x") == ((3L, "7.71")) && folded("z") == ((1L, "10.00")))
    assert(folded("w") == ((1L, "0.29")))
    // The slices really are a total partition of rows.
    assert(batch(0).count() + batch(1).count() == rows.count())
  }

  test("mergeAggStateCents: integer-only fold equals the one-shot rollup " +
    "and the decimal flavor's cents exactly") {
    val s2 = spark; import s2.implicits._
    val rows = Seq(("x", Some(1L), 1.10), ("x", Some(2L), 2.205),
      ("y", Some(3L), 3.00), ("x", Some(-4L), 4.40),
      ("y", None, 0.305), ("z", Some(6L), 9.999), ("w", Some(7L), 0.29))
      .toDF("g", "id", "v")
    def batch(i: Int) =
      rows.filter(pmod(coalesce(col("id"), lit(0L)), lit(2)) === i)
    val folded = Medallion.mergeAggStateCents(
      Some(Medallion.mergeAggStateCents(None, batch(0), Seq("g"), "v")),
      batch(1), Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val oneShot = Medallion.mergeAggStateCents(None, rows, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(folded == oneShot)
    assert(folded("x") == ((3L, 771L)) && folded("z") == ((1L, 1000L)))
    assert(folded("w") == ((1L, 29L)))
    // cents agree with the decimal flavor's presentation × 100.
    val dec = Medallion.mergeAggState(None, rows, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        r.getDecimal(2).movePointRight(2).longValueExact()).toMap
    assert(folded.map { case (g, (_, c)) => g -> c } == dec)
  }

  test("applyChangesCents: CDC fold equals recompute; deletes cancel to " +
    "absence; any batch split converges; unknown type fails loudly") {
    val s2 = spark; import s2.implicits._
    def ch(rows: Seq[(String, Double, String)]) =
      rows.toDF("g", "v", "_change_type")
    val feed = Seq(
      ("x", 1.10, "insert"), ("x", 2.20, "insert"), ("y", 3.00, "insert"),
      ("x", 1.10, "delete"),                       // x loses a row
      ("y", 3.00, "update_preimage"), ("y", 6.00, "update_postimage"),
      ("z", 5.00, "insert"), ("z", 5.00, "delete")) // z folds to absence
    def state(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val oneShot = state(Medallion.applyChangesCents(
      None, ch(feed), Seq("g"), "v"))
    assert(oneShot == Map("x" -> ((1L, 220L)), "y" -> ((1L, 600L))),
      oneShot.toString)
    // every split point of the same feed converges to the same state
    (1 until feed.size).foreach { cut =>
      val st1 = Medallion.applyChangesCents(
        None, ch(feed.take(cut)), Seq("g"), "v")
      val folded = state(Medallion.applyChangesCents(
        Some(st1), ch(feed.drop(cut)), Seq("g"), "v"))
      assert(folded == oneShot, s"split at $cut: $folded")
    }
    val e = intercept[Exception](Medallion.applyChangesCents(
      None, ch(Seq(("x", 1.0, "upsert"))), Seq("g"), "v").collect())
    assert(e.getMessage.contains("unknown"), e.getMessage)
  }

}
