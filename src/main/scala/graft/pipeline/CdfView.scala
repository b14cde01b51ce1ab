package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.DeltaLog

/** Durable, exactly-once AGGREGATE view over a CDF-enabled Delta
  * source — the downstream half of the change-data-feed pipeline:
  * [[graft.lake.DeltaLog.readChangeFeed]] supplies the row-level
  * deltas, [[Medallion.applyChangesCents]] folds them (Gupta–Mumick
  * delta rule, signed long cents), and the state lives as ONE flat
  * Delta table whose txn watermark records the last SOURCE version
  * consumed. A refresh is a single atomic rewrite commit, so a crash
  * anywhere and a rerun converge: before the commit nothing happened
  * (staged files are invisible), after it the watermark makes the
  * rerun a no-op — the foreachBatch redelivery contract with zero
  * double-applies.
  *
  * Scale posture: each refresh reads ONLY the source's change tail
  * (CDC files / changed files, never a table rescan) plus the
  * group-grain state table; one shuffle per refresh.
  */
object CdfView {

  private val App = "graft-cdfview"

  /** Fold everything the source committed past this consumer's
    * watermark into the durable state at `dir`; returns the refreshed
    * view (`groupCols…, n_rows, cents`). No-op when already caught up.
    */
  def refreshDurable(spark: SparkSession, dir: String, sourceRoot: String,
                     groupCols: Seq[String], valueCol: String): DataFrame = {
    val cur = DeltaLog.currentVersion(sourceRoot)
    val last = DeltaLog.txnWatermark(spark, dir, App).getOrElse(-1L)
    if (cur <= last) return DeltaLog.read(spark, dir)
    val changes = DeltaLog.readChangeFeed(spark, sourceRoot, last, cur)
    val prior = if (last < 0L) None else Some(DeltaLog.read(spark, dir))
    val next =
      Medallion.applyChangesCents(prior, changes, groupCols, valueCol)
    // rewrite stages new files while the old ones stay readable, then
    // commits remove+add+txn atomically — the only durability point
    DeltaLog.commitFlat(spark, dir, next, rewrite = true,
      txn = Some((App, cur)))
    DeltaLog.read(spark, dir)
  }
}
