package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 history semantics (dbt snapshot `check` strategy): consecutive-
  * duplicate collapse, half-open interval chain, exactly one current row
  * per key — plus the as-of lookup and the single-shuffle plan contract.
  */
class Scd2Spec extends SparkSpec {

  private def hist(rows: Seq[(Long, String, Long, Long)]) = {
    val s = spark; import s.implicits._
    Scd2.history(rows.toDF("k", "attr", "ts", "id"),
      Seq("k"), Seq("attr"), "ts", "id")
  }

  private val stream = Seq(
    // user 1: A A B B A → versions A[10,30) B[30,50) A[50,∞)
    (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
    (1L, "B", 40L, 4L), (1L, "A", 50L, 5L),
    // user 2: single observation → one current version
    (2L, "C", 5L, 6L),
    // user 3: timestamp tie broken by id → A v1 then B v2
    (3L, "A", 10L, 7L), (3L, "B", 10L, 8L))

  test("consecutive duplicates collapse; value flip-flops reopen versions") {
    val got = hist(stream).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4),
        r.getBoolean(5))).toSet
    assert(got == Set(
      (1L, "A", 10L, 30L, 1, false),
      (1L, "B", 30L, 50L, 2, false),
      (1L, "A", 50L, -1L, 3, true),
      (2L, "C", 5L, -1L, 1, true),
      (3L, "A", 10L, 10L, 1, false),
      (3L, "B", 10L, -1L, 2, true)))
  }

  test("invariants: one current row per key, contiguous versions, interval chain") {
    val h = hist(stream)
    val perKey = h.groupBy(col("k")).agg(
      sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
      count(lit(1)).as("n"), max(col("version")).as("maxv"))
    assert(perKey.filter(col("n_current") =!= 1).count() == 0)
    assert(perKey.filter(col("maxv") =!= col("n")).count() == 0,
      "versions must be 1..n per key")
    // valid_to of version v equals valid_from of version v+1
    val chainBreaks = h.as("a").join(h.as("b"),
        col("a.k") === col("b.k") &&
          col("a.version") + 1 === col("b.version") &&
          col("a.valid_to_us") =!= col("b.valid_from_us")).count()
    assert(chainBreaks == 0, "intervals must partition each key's timeline")
  }

  test("null-valued tracked columns: null→null collapses, null→value opens") {
    val s = spark; import s.implicits._
    val rows = Seq[(Long, Option[String], Long, Long)](
      (4L, None, 10L, 1L), (4L, None, 20L, 2L), (4L, Some("D"), 30L, 3L),
      (4L, Some("D"), 40L, 4L), (4L, None, 50L, 5L))
    val got = Scd2.history(rows.toDF("k", "attr", "ts", "id"),
        Seq("k"), Seq("attr"), "ts", "id")
      .select(col("version"), col("attr"), col("valid_from_us")).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(got == Set((1, None, 10L), (2, Some("D"), 30L), (3, None, 50L)))
  }

  test("asOfLookup: each fact joins exactly its covering version") {
    val s = spark; import s.implicits._
    val h = hist(stream)
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 29L), (1L, 30L), (1L, 999L),
      (9L, 10L)).toDF("k", "fts")
    val got = Scd2.asOfLookup(facts, h, Seq("k"), "fts")
      .select(col("k"), col("fts"), col("attr")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 5L, None),          // before first version
      (1L, 10L, Some("A")),    // inclusive lower bound
      (1L, 29L, Some("A")),
      (1L, 30L, Some("B")),    // exclusive upper / inclusive next-lower
      (1L, 999L, Some("A")),   // open current interval
      (9L, 10L, None)))        // unseen key
    // at-most-one invariant: no fact row duplicated by the join
    assert(Scd2.asOfLookup(facts, h, Seq("k"), "fts").count() == facts.count())
  }

  test("plan contract: one Exchange, one Sort for the whole history build") {
    val plan = hist(stream).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"change-detect + version + validity must share one shuffle:\n$plan")
    assert(sorts == 1,
      s"all three windows must reuse one (key, ts, tie) sort:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("applyChanges: incremental ≡ full rebuild at EVERY cutoff") {
    val s = spark; import s.implicits._
    val df = stream.toDF("k", "attr", "ts", "id")
    val full = Scd2.history(df, Seq("k"), Seq("attr"), "ts", "id")
      .collect().map(_.toSeq).toSet
    // cutoffs: before everything, mid-version, on a change boundary,
    // between keys' activity, after everything
    for (cutoff <- Seq(0L, 15L, 30L, 45L, 100L)) {
      val h1 = Scd2.history(df.filter(col("ts") < cutoff),
        Seq("k"), Seq("attr"), "ts", "id")
      val got = Scd2.applyChanges(h1, df.filter(col("ts") >= cutoff),
          Seq("k"), Seq("attr"), "ts", "id")
        .collect().map(_.toSeq).toSet
      assert(got == full, s"cutoff=$cutoff: incremental diverged from rebuild")
    }
  }

  test("applyChanges: same-value batch collapses; new keys start at version 1; untouched keys byte-identical") {
    val s = spark; import s.implicits._
    val day1 = Seq((1L, "A", 10L, 1L), (1L, "B", 20L, 2L),
      (7L, "Z", 15L, 3L)).toDF("k", "attr", "ts", "id")
    val h1 = Scd2.history(day1, Seq("k"), Seq("attr"), "ts", "id")
    // key 1: same value B again (must collapse, stay version 2, keep
    // valid_from 20); key 9: brand new
    val day2 = Seq((1L, "B", 30L, 4L), (9L, "N", 35L, 5L))
      .toDF("k", "attr", "ts", "id")
    val got = Scd2.applyChanges(h1, day2, Seq("k"), Seq("attr"), "ts", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4),
        r.getBoolean(5))).toSet
    assert(got == Set(
      (1L, "A", 10L, 20L, 1, false),
      (1L, "B", 20L, -1L, 2, true),  // collapsed: valid_from unchanged
      (7L, "Z", 15L, -1L, 1, true),  // untouched key passes through
      (9L, "N", 35L, -1L, 1, true))) // new key starts at version 1
  }

  test("applyChanges: append-only contract is enforced, not just documented") {
    val s = spark; import s.implicits._
    val day1 = Seq((1L, "A", 10L, 1L), (1L, "B", 20L, 2L))
      .toDF("k", "attr", "ts", "id")
    val h1 = Scd2.history(day1, Seq("k"), Seq("attr"), "ts", "id")
    // late event: ts before key 1's current valid_from_us (20) aborts
    val late = Seq((1L, "C", 15L, 3L)).toDF("k", "attr", "ts", "id")
    val eLate = intercept[Exception] {
      Scd2.applyChanges(h1, late, Seq("k"), Seq("attr"), "ts", "id").collect()
    }
    assert(eLate.getMessage.contains("append-only") ||
      Option(eLate.getCause).exists(_.getMessage.contains("append-only")))
    // negative tie: collides with the seed's reserved -1L slot
    val negTie = Seq((1L, "C", 30L, -5L)).toDF("k", "attr", "ts", "id")
    val eTie = intercept[Exception] {
      Scd2.applyChanges(h1, negTie, Seq("k"), Seq("attr"), "ts", "id").collect()
    }
    assert(eTie.getMessage.contains("non-negative") ||
      Option(eTie.getCause).exists(_.getMessage.contains("non-negative")))
    // non-long tie column: rejected statically (the seed unions a -1L)
    val intTie = Seq((1L, "C", 30L, 3)).toDF("k", "attr", "ts", "id")
    intercept[IllegalArgumentException] {
      Scd2.applyChanges(h1, intTie, Seq("k"), Seq("attr"), "ts", "id")
    }
    // NULL tie: sorts before the -1L seed under nulls-first — must abort,
    // not silently steal the seed's slot (null < 0 is null, so the guard
    // checks isNull explicitly)
    val nullTie = Seq((1L, "C", 30L, Option.empty[Long]))
      .toDF("k", "attr", "ts", "id")
    val eNull = intercept[Exception] {
      Scd2.applyChanges(h1, nullTie, Seq("k"), Seq("attr"), "ts", "id").collect()
    }
    assert(eNull.getMessage.contains("non-null") ||
      Option(eNull.getCause).exists(_.getMessage.contains("non-null")))
    // a conforming batch on the SAME inputs still goes through unchanged
    val ok = Seq((1L, "C", 30L, 3L)).toDF("k", "attr", "ts", "id")
    assert(Scd2.applyChanges(h1, ok, Seq("k"), Seq("attr"), "ts", "id")
      .filter(col("is_current")).count() == 1)
  }

  test("partitioning-independence: same history under any input layout") {
    val s = spark; import s.implicits._
    val df = stream.toDF("k", "attr", "ts", "id")
    val a = Scd2.history(df, Seq("k"), Seq("attr"), "ts", "id")
      .collect().map(_.toSeq).toSet
    val b = Scd2.history(df.repartition(7), Seq("k"), Seq("attr"), "ts", "id")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Scd2.history(df, Seq.empty, Seq("attr"), "ts", "id")
    }
  }
}
