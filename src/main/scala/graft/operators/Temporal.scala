package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-ordered operators Spark lacks as built-ins: backward as-of join and
  * gap-based sessionization. Both are expressed as ONE shuffle on the join /
  * session keys plus a per-partition sort — never an inequality join, which
  * Spark can only plan as a broadcast nested loop (quadratic per key, and a
  * non-starter against a 100 TB fact side).
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the right row with the
    * greatest `(rightTs, rightTie…)` among rows of the same key with
    * `rightTs <= leftTs` (nulls when no such row).
    *
    * Implementation is the union-then-window idiom: tag both sides, union on
    * a common schema, sort each key partition once by `(ts, side, tie…)`
    * with right rows BEFORE left rows at equal ts (<= semantics), and carry
    * the payload forward with `last(…, ignoreNulls)` over the preceding
    * frame. The right payload travels as ONE struct so all its columns come
    * from the SAME right row atomically.
    *
    * Scale posture: one exchange on `keys` + one sort — the same cost as a
    * plain shuffle join; right-side duplicates and skew behave like any
    * window over the key. Unlike the join-based formulation there is no
    * per-key candidate blowup: each right row is examined once in sort
    * order regardless of how many left rows it serves.
    *
    * Caveat: window partitioning groups NULL keys together (SQL joins drop
    * them) — pre-filter null keys if join semantics are wanted. Right rows
    * with a NULL timestamp are dropped here (they sort first under the
    * ascending window order and would otherwise become match candidates,
    * where the SQL inequality formulation excludes them).
    *
    * Determinism: `rightTie` must totally order right rows within
    * `(keys, rightTs)`; left-row order within a tie never matters (left
    * rows carry no payload and only read the preceding frame).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightTie: Seq[String],
               rightPayload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(rightPayload.nonEmpty, "asofJoin with no payload columns")
    val clash = rightPayload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asofJoin payload collides with left columns: $clash")
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"asofJoin ts types differ: ${left.schema(leftTs).dataType} vs " +
        s"${right.schema(rightTs).dataType}")

    val payloadType = StructType(rightPayload.map(right.schema(_)))
    val tieNames = rightTie.map(n => s"__tie_$n")
    val leftOnly = left.columns.toSeq.filterNot(keys.contains)

    val rightSide = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
            struct(rightPayload.map(col): _*).as("__r")) ++
        rightTie.zip(tieNames).map { case (n, a) => col(n).as(a) } ++
        leftOnly.map(n => lit(null).cast(left.schema(n).dataType).as(n)): _*)
    val leftSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
            lit(null).cast(payloadType).as("__r")) ++
        rightTie.zip(tieNames).map { case (n, a) =>
          lit(null).cast(right.schema(n).dataType).as(a) } ++
        leftOnly.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side").asc +: tieNames.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightSide.unionByName(leftSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        rightPayload.map(n => col("__m").getField(n).as(n)): _*)
  }

  /** Gap-based sessionization: within each key, rows ordered by
    * `(tsCol, tieCols…)` belong to the same session until a gap larger than
    * `gap` (same units as `tsCol`) opens; `session_seq` numbers sessions
    * per key from 1. One shuffle on the keys; the lag and the running sum
    * share the partitioning and sort, so Spark plans them as consecutive
    * Window ops over a single exchange.
    *
    * This is the batch mirror of Structured Streaming's session windows
    * (which need state + watermarks); for historical backfill the sort-based
    * form is the scalable one.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 tieCols: Seq[String], gap: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gap > 0, "sessionize gap must be positive")
    val order = col(tsCol).asc +: tieCols.map(col(_).asc)
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(wOrd)
    val isNew = when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0)
    df.withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(wRun))
      .drop("__new")
  }

  /** Session-grain rollup over [[sessionize]]'s output: one row per
    * (keys…, session_seq) with `session_start`/`session_end` (min/max of
    * `tsCol`, same units), `session_duration` (their difference), and
    * `n_events`. The groupBy keys extend the window's partition keys, so
    * hash-partitioning on `keys` already co-locates every session's rows —
    * Spark plans the rollup WITHOUT a second exchange: the whole operator
    * stays the sessionization's single shuffle (TemporalSpec asserts it).
    */
  def sessionizeAgg(df: DataFrame, keys: Seq[String], tsCol: String,
                    tieCols: Seq[String], gap: Long): DataFrame =
    sessionize(df, keys, tsCol, tieCols, gap)
      .groupBy(keys.map(col) :+ col("session_seq"): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("session_duration"),
        count(lit(1)).as("n_events"))
}
