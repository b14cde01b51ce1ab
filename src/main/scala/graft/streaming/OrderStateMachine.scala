package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's one genuinely stateful behavior — the per-order status
  * state machine its shipping/notification consumers run row-at-a-time
  * (PENDING_PAYMENT → READY_TO_SHIP → DISPATCHED,
  * docs/architecture.md:76-85; consumers
  * services/shipping/app/kafka/consumer.py:53-141) — re-expressed as
  * Structured Streaming arbitrary state (`flatMapGroupsWithState` over a
  * `KeyValueGroupedDataset`, SURVEY §2.9 stateful row).
  *
  * Contract mirrored from the consumers: transitions are monotone
  * (an event for an earlier stage after a later one is ignored — the
  * consumers are required to be idempotent under replay), duplicates are
  * no-ops, and each ACCEPTED transition emits one change record.
  */
object OrderStateMachine {

  /** Stage ranks — higher wins; equal/lower arrivals are replays. */
  val Stages: Map[String, Int] = Map(
    "order.created" -> 1,       // PENDING_PAYMENT
    "payment.succeeded" -> 2,   // READY_TO_SHIP
    "shipping.dispatched" -> 3) // DISPATCHED

  val StatusOf: Map[Int, String] = Map(
    1 -> "PENDING_PAYMENT", 2 -> "READY_TO_SHIP", 3 -> "DISPATCHED")

  case class OrderEvent(order_id: String, event_type: String, event_ts_us: Long)

  case class OrderState(stage: Int, lastTsUs: Long)

  case class StatusChange(order_id: String, status: String,
                          stage: Int, event_ts_us: Long)

  /** Apply a batch of events for one order to its state, emitting one
    * record per accepted transition. Pure function — the streaming and
    * batch paths (and the spec) share it.
    */
  def transition(state: OrderState, events: Iterator[OrderEvent],
                 orderId: String): (OrderState, Seq[StatusChange]) = {
    var cur = state
    val out = Seq.newBuilder[StatusChange]
    // Per-batch events are applied in event-time order (the stream gives
    // no intra-batch ordering guarantee); cross-batch replays are handled
    // by the monotone stage check.
    events.toSeq.sortBy(e => (e.event_ts_us, e.event_type)).foreach { e =>
      Stages.get(e.event_type).foreach { stage =>
        if (stage > cur.stage) {
          cur = OrderState(stage, e.event_ts_us)
          out += StatusChange(orderId, StatusOf(stage), stage, e.event_ts_us)
        }
      }
    }
    (cur, out.result())
  }

  /** Streaming state machine: one state per order_id, change records out.
    * ProcessingTimeTimeout reaps inactive orders (no ACCEPTED transition
    * for `timeoutMs`) so state size tracks active orders, not order
    * history — the property that keeps this runnable forever.
    *
    * Bounded-state tradeoff, stated explicitly: replay idempotence only
    * holds while the order's state lives. A replay arriving AFTER the
    * state was reaped restarts the machine and re-emits its transitions —
    * size `timeoutMs` beyond the upstream's maximum replay horizon
    * (exactly the contract of the reference consumers' TTL'd dedup cache,
    * notifications consumer.py:13-16). Unknown event types never create
    * state, and replays don't re-arm the timer, so junk keys and hot
    * replay loops cannot grow or pin the store.
    */
  def run(events: Dataset[OrderEvent],
          timeoutMs: Long = 24L * 3600 * 1000): Dataset[StatusChange] = {
    implicit val changeEnc = Encoders.product[StatusChange]
    implicit val stateEnc = Encoders.product[OrderState]
    implicit val strEnc = Encoders.STRING
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.order_id)
      .flatMapGroupsWithState[OrderState, StatusChange](
        OutputMode.Append(), timeout) {
        (orderId: String, batch: Iterator[OrderEvent], gs: GroupState[OrderState]) =>
          if (gs.hasTimedOut) {
            gs.remove()
            Iterator.empty
          } else {
            val prior = gs.getOption
            val (next, changes) =
              transition(prior.getOrElse(OrderState(0, 0L)), batch, orderId)
            if (prior.isEmpty && next.stage == 0) {
              // only unknown/ignored events for an unseen order: no state
            } else {
              gs.update(next)
              // arm/re-arm only on progress — pure replays must not keep
              // a finished order alive forever
              if (timeoutMs > 0 && (changes.nonEmpty || prior.isEmpty))
                gs.setTimeoutDuration(timeoutMs)
            }
            changes.iterator
          }
      }
  }
}
