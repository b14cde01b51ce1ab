package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ml.Sketches

/** Streaming approximate distinct — the HLL register machinery
  * ([[graft.ml.Sketches]]) carried into Structured Streaming arbitrary
  * state: per group, 2^p register bytes live in the state store, each
  * micro-batch max-merges its values in, and every batch emits the
  * group's refreshed estimate. Unbounded stream, BOUNDED state — the
  * "live distinct users per segment" widget without keeping user sets.
  *
  * Cross-path parity is the contract, not an aspiration: the hash
  * (md5-derived 60-bit, `hll-` salt), the fixed-point raw estimator and
  * the linear-counting LUT are all bit-for-bit the batch versions, so a
  * stream folded to completion emits EXACTLY
  * [[graft.ml.Sketches.hllEstimateCorrected]]'s number for the same rows
  * (StreamSketchSpec pins it). That makes streaming dashboards and batch
  * backfills agree to the last digit — the discrepancy class that
  * usually burns this architecture.
  */
object StreamSketch {

  case class ValueEvent(group: String, value: String)

  /** State: one byte-size register per bucket (rho ≤ 61 fits a byte). */
  case class SketchState(regs: Array[Byte])

  case class SketchUpdate(group: String, n_present: Int, est_distinct: Long)

  /** The batch hash contract ([[Sketches]] hash60: first 15 md5 hex chars
    * of salt+value as a 60-bit non-negative long), computed JVM-side.
    */
  private[streaming] def hash60(value: String, salt: String = "hll-"): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest((salt + value).getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Fold values into a register array in place — max(rho) per bucket,
    * rho = (61 − p) − bitlength(suffix) exactly as the SQL side
    * computes it.
    */
  private[streaming] def merge(regs: Array[Byte], values: Iterator[String],
                               p: Int): Unit = {
    val m = 1 << p
    values.foreach { v =>
      val h = hash60(v)
      val bucket = (h & (m - 1)).toInt
      val suffix = h >>> p
      val rho = (61 - p) - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      if (rho > regs(bucket)) regs(bucket) = rho.toByte
    }
  }

  /** The corrected estimator, integer-for-integer the batch arithmetic
    * ([[Sketches.hllEstimateCorrected]]): fixed-point raw estimate with
    * the linear-counting LUT below 2.5·m.
    */
  private[streaming] def estimate(regs: Array[Byte], p: Int): (Int, Long) = {
    val m = 1L << p
    val lut = Sketches.linearCountLut(p)
    var presentSum = 0L
    var present = 0L
    var i = 0
    while (i < regs.length) {
      if (regs(i) > 0) {
        presentSum += (1L << 40) >> regs(i)
        present += 1
      }
      i += 1
    }
    if (present == 0) return (0, 0L)
    val alphaFp = 7213L * m * m * m / (10000L * m + 10790L)
    val zFp = presentSum + (m - present) * (1L << 40)
    val raw = alphaFp * (1L << 40) / math.max(zFp, 1L)
    val zeros = m - present
    val est =
      if (raw <= 5L * m / 2 && zeros > 0) lut(zeros.toInt) else raw
    (present.toInt, est)
  }

  /** Streaming per-group distinct estimates: Update-mode emissions, one
    * refreshed row per group per micro-batch it appears in. NULL-group
    * events are the caller's filter; an idle-group TTL keeps the store
    * bounded under key churn (the [[OrderStateMachine]] discipline).
    */
  def run(events: Dataset[ValueEvent], p: Int = 8,
          timeoutMs: Long = 24L * 3600 * 1000): Dataset[SketchUpdate] = {
    require(p >= 4 && p <= 11, s"StreamSketch: p in [4, 11], got $p")
    implicit val outEnc = Encoders.product[SketchUpdate]
    implicit val stateEnc = Encoders.product[SketchState]
    implicit val strEnc = Encoders.STRING
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[SketchState, SketchUpdate](
        OutputMode.Update(), timeout) {
        (group: String, batch: Iterator[ValueEvent],
         gs: GroupState[SketchState]) =>
          if (gs.hasTimedOut) {
            gs.remove()
            Iterator.empty
          } else {
            val regs = gs.getOption.map(_.regs.clone())
              .getOrElse(new Array[Byte](1 << p))
            merge(regs, batch.map(_.value), p)
            gs.update(SketchState(regs))
            if (timeoutMs > 0) gs.setTimeoutDuration(timeoutMs)
            val (present, est) = estimate(regs, p)
            Iterator.single(SketchUpdate(group, present, est))
          }
      }
  }
}
