package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history — the warehouse counterpart
  * of the reference's latest-wins dim upsert ([[Upsert]] replays
  * `/root/reference/analytics/spark/jobs/silver_orders.py`-style MERGE
  * keeping only the current row; SCD2 is the "check" snapshot strategy
  * of the reference's dbt layer, keeping EVERY value interval with
  * validity bounds so facts can join to the dimension AS OF their own
  * timestamp).
  *
  * Semantics (dbt snapshot `check` strategy, collapsed): order each
  * key's change stream by (ts, tiebreak), keep rows where any tracked
  * column differs from the previous row (null-safe struct compare, so
  * null→value and value→null are changes and consecutive identical
  * nulls are not), then assign
  *   version        1, 2, … per key in change order,
  *   valid_from_us  the change row's timestamp,
  *   valid_to_us    the NEXT change's timestamp (null while current),
  *   is_current     valid_to_us IS NULL.
  * Intervals partition the key's timeline: [from, to) half-open,
  * exactly one current row per key (spec-enforced).
  *
  * Scale posture: ONE hash exchange on the key. The change-detect lag,
  * the version row_number and the valid_to lead all share the same
  * (key, ts, tiebreak) sort, and the intermediate filter preserves
  * partitioning and order, so Catalyst plans a single Exchange and a
  * single Sort for the whole operator (spec-asserted). At 100 TB the
  * cost is one shuffle of the change stream — the minimum any
  * history-build can do — with no join, no second pass, and per-key
  * state bounded by the window frame (lag/lead of one row).
  *
  * Determinism: epoch-µs longs for time, explicit unique tiebreaker for
  * equal timestamps — the repo-wide cross-engine recipe.
  */
object Scd2 {

  /** Build the Type 2 history table from a change stream.
    *
    * @param changes  change events, one row per observation
    * @param keyCols  dimension natural key (rows with null keys are the
    *                 caller's to filter; they group per SQL semantics)
    * @param trackCols columns whose value changes open a new version
    * @param tsCol    epoch-µs long column giving change time
    * @param tieCol   unique-per-(key, ts) column breaking timestamp ties
    */
  def history(changes: DataFrame, keyCols: Seq[String],
              trackCols: Seq[String], tsCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty && trackCols.nonEmpty,
      "Scd2.history: keyCols and trackCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val tracked = struct(trackCols.map(col): _*)
    val changed = changes
      .withColumn("__prev", lag(tracked, 1).over(w))
      // First row per key: lag is null, and a null STRUCT can't equal a
      // non-null one under <=> (struct fields may be null; the struct
      // itself from lag-at-start is null) — so `not(<=>)` opens version 1.
      .filter(!(tracked <=> col("__prev")))
    changed
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from_us", col(tsCol))
      .withColumn("valid_to_us", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select((keyCols ++ trackCols).map(col) ++
        Seq(col("valid_from_us"), col("valid_to_us"),
          col("version"), col("is_current")): _*)
  }

  /** Incremental SCD2 maintenance — the nightly job: fold a NEW batch of
    * change events into an existing history without rebuilding it.
    * Assumes append-only arrival (every new change's (ts, tie) sorts
    * after the affected key's current `valid_from_us` — the streaming-
    * ingest contract).
    *
    * Mechanics: only keys present in `changes` are touched. Each such
    * key's CURRENT row is replayed as a seed pseudo-change (tie = −1 so
    * it sorts first at its own timestamp) in front of the key's new
    * events, the same [[history]] pass rebuilds that key's tail, and
    * versions are renumbered by the key's previous current version.
    * Closed rows and untouched keys pass through byte-identical.
    *
    * Cost ∝ |changes| + |affected current rows| — NOT |history|: the
    * window pass runs only over the mini-streams, the pass-through is a
    * filter + anti-join. The invariant (spec- AND oracle-gated, q109):
    * applyChanges(history(events < T), events ≥ T) ≡ history(all
    * events), for any cutoff T.
    */
  def applyChanges(history: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   trackCols: Seq[String], tsCol: String, tieCol: String): DataFrame = {
    // The seed pseudo-change sorts first at its timestamp via tie = −1L,
    // so the append-only contract is ENFORCED, not just documented: the
    // tie column must be a non-negative long (a non-long type would also
    // silently widen the union), and any change sorting before its key's
    // current valid_from_us aborts the job instead of corrupting the
    // rebuilt history. Both guards are row-local expressions inside
    // passes the operator already makes — no extra action, no extra
    // exchange.
    require(changes.schema(tieCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"Scd2.applyChanges: tie column '$tieCol' must be LongType (the " +
        "seed row's -1L tiebreaker unions with it); got " +
        s"${changes.schema(tieCol).dataType.simpleString}")
    // isNull is checked explicitly: `null < 0` is null → otherwise-branch,
    // and a null tie sorts BEFORE the -1L seed under the window's
    // nulls-first asc order — the exact silent corruption this guard exists
    // to prevent.
    val guarded = changes.withColumn(tieCol,
      when(col(tieCol).isNull || col(tieCol) < 0, raise_error(format_string(
        s"Scd2.applyChanges: tie column '$tieCol' must be a non-negative " +
          "non-null long (-1 is reserved for the current-row seed); got %s",
        col(tieCol))))
        .otherwise(col(tieCol)))
    val cur = history.filter(col("is_current"))
    val affected = changes.select(keyCols.map(col): _*).distinct()
    val curAffected = cur.join(affected, keyCols)
    val offsets = curAffected.select(keyCols.map(col) :+
      col("version").as("__off") :+ col("valid_from_us").as("__seed_ts"): _*)
    val seed = curAffected.select((keyCols ++ trackCols).map(col) :+
      col("valid_from_us").as(tsCol) :+ lit(-1L).as(tieCol): _*)
    val mini = seed.unionByName(
      guarded.select((keyCols ++ trackCols).map(col) :+ col(tsCol) :+
        col(tieCol): _*))
    // A late event (ts before the key's current valid_from_us) would win
    // the rebuilt key's first version; the offsets join the operator
    // already performs carries the seed timestamp, so the violation is a
    // row-local check on the rebuilt rows (null __seed_ts = brand-new
    // key, nothing to violate).
    val rebuilt = this.history(mini, keyCols, trackCols, tsCol, tieCol)
      .join(offsets, keyCols, "left")
      .withColumn("version",
        when(col("valid_from_us") < col("__seed_ts"), raise_error(
          format_string("Scd2.applyChanges: append-only contract " +
            "violated - change at ts=%s sorts before the key's current " +
            "valid_from_us=%s", col("valid_from_us"), col("__seed_ts"))))
          .otherwise((col("version") + coalesce(col("__off"), lit(1)) - 1))
          .cast("int"))
      .drop("__off", "__seed_ts")
    val untouchedCurrent = cur.join(affected, keyCols, "left_anti")
    history.filter(!col("is_current"))
      .unionByName(untouchedCurrent)
      .unionByName(rebuilt)
  }

  /** AS-OF dimension lookup against an SCD2 history: each fact row joins
    * the version whose [valid_from_us, valid_to_us) interval contains its
    * timestamp. A plain range predicate on the equi-joined key — at most
    * one history row matches by the interval-partition invariant, so no
    * dedup pass is needed. Facts missing any history (timestamp before
    * the first version, or unseen key) keep null dimension columns.
    *
    * Scale posture: equi-join on the key carries the range predicate as
    * a post-join filter on the co-partitioned pair — one shuffle each
    * side (or zero on the dim side when it's broadcast-small, the usual
    * case for dimensions).
    */
  def asOfLookup(facts: DataFrame, history: DataFrame, keyCols: Seq[String],
                 factTsCol: String): DataFrame = {
    val cond = keyCols.map(k => facts(k) === history(k)).reduce(_ && _) &&
      facts(factTsCol) >= history("valid_from_us") &&
      (history("valid_to_us").isNull ||
        facts(factTsCol) < history("valid_to_us"))
    keyCols.foldLeft(facts.join(history, cond, "left"))(
      (df, k) => df.drop(history(k)))
  }
}
