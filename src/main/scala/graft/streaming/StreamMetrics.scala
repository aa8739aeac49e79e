package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the order-event stream — the continuous
  * siblings of the batch metrics. The reference is daily-batch by
  * design (docs/guides.md:16); these exist because a 100 TB pipeline
  * usually runs the same semantics in both modes, and Structured
  * Streaming expresses them with the identical DataFrame vocabulary.
  *
  * Two canonical shapes:
  *  - [[eventCountsByWindow]]: watermarked event-time window counts —
  *    late data beyond the watermark is dropped, state is bounded.
  *  - [[currentStatusStream]]: per-key running state via
  *    flatMapGroupsWithState — the streaming analog of the SCD2
  *    "current version" read (emits a row whenever a key's status
  *    changes, event-time ordered within a batch).
  */
object StreamMetrics {

  /** Tumbling event-time window counts per event type with a watermark:
    * `events` needs (ts: timestamp, event_type: string). */
  def eventCountsByWindow(events: DataFrame,
                          windowLen: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("event_count"))
      .select(col("window.start").as("window_start"), col("event_type"), col("event_count"))

  case class OrderEvent(id: Long, status: String, ts: java.sql.Timestamp)
  case class OrderStatus(order_id: Long, status: String, since: java.sql.Timestamp)

  /** Running current-status per order id: emits one row per status
    * CHANGE (the streaming view of dim_orders' open version). State per
    * key is one (status, ts) pair — bounded, no timeout needed for the
    * finite test corpus; production would add an idle timeout. */
  def currentStatusStream(spark: SparkSession, events: Dataset[OrderEvent]): Dataset[OrderStatus] = {
    import spark.implicits._
    events.groupByKey(_.id)
      .flatMapGroupsWithState[OrderStatus, OrderStatus](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, batch, state: GroupState[OrderStatus]) =>
          // fold this batch's events in event-time order onto prior state
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.status))
          val changes = scala.collection.mutable.ListBuffer.empty[OrderStatus]
          var cur = state.getOption
          sorted.foreach { e =>
            if (!cur.exists(_.status == e.status)) {
              cur = Some(OrderStatus(id, e.status, e.ts))
              changes += cur.get
            }
          }
          cur.foreach(state.update)
          changes.iterator
      }
  }
}
