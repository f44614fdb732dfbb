package graft.market

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TradeMatching.eventUuid

/** The flagship event-classification query — reference `get.events`
  * (`db/get_schema.sql:304-456`): every order event in a window,
  * enriched with the prevailing spread (as-of), per-order lifetime
  * flags, an order-type state machine, aggressiveness in bps, and the
  * uuid of the matching event of its trade.
  *
  * Pure Catalyst: window functions (`last(_, ignoreNulls)` as-of over a
  * unioned stream, `bool_or` per order), a `when` chain for the state
  * machine, `md5` uuids. Two deliberate default divergences from the
  * reference, both reverted by `referenceParity = true` for
  * bit-compatible differential testing against a live obadiah:
  *   - `aggressiveness_bps` uses the side-correct denominator (the
  *     reference divides by best_ask for both sides,
  *     `db/get_schema.sql:435-438`);
  *   - the trade connection keys on each fill event's own timestamp and
  *     the matching uuid names the opposite EVENT, so both sides of a
  *     tolerance-matched trade connect and every uuid resolves to a
  *     level3 row (the reference keys on the trade's timestamp —
  *     `db/get_schema.sql:390-402,449` — which silently drops the
  *     earlier side of a tolerance match and mints uuids that may name
  *     no stored event; it also nulls `event.id` for unconnected
  *     events and uses a closed [t0, t1] trades window).
  */
object EventsQuery {

  /** @param spreadTicks undeduplicated or deduplicated L1 stream
    *   (pair_id, ts, bid_price, ask_price, …) — as-of carry-forward is
    *   insensitive to dedupe.
    * @param referenceParity reproduce the reference's buy-side
    *   aggressiveness denominator (best_ask, `db/get_schema.sql:438`)
    *   instead of the side-correct best_bid.
    * @param matches the trades table connecting fill events
    *   ([[TradeMatching.inferredMatches]] shape); `None` infers it from
    *   `level3` — pass a precomputed frame to reuse an existing one. */
  def events(level3: DataFrame, spreadTicks: DataFrame,
      t0: Long, t1: Long, referenceParity: Boolean = false,
      matches: Option[DataFrame] = None): DataFrame = {

    // active events: in-window rows ∪ the book standing at t0 (kept with
    // their original timestamps, as the reference does via order_book()).
    val inWindow = level3
      .filter(col("microtimestamp") > t0 && col("microtimestamp") <= t1)
      .withColumn("is_initial", lit(false))
    val initialBook = level3
      .filter(col("microtimestamp") <= t0 && col("next_microtimestamp") > t0)
      .withColumn("is_initial", lit(true))
    val active = inWindow.unionByName(initialBook)

    // prevailing spread: last L1 tick strictly before the event (ticks at
    // the event's own timestamp already include the event's episode).
    // Union events (kind 0) + ticks (kind 1): ordering by (ts, kind) puts
    // same-ts ticks after the event, so last() sees only earlier ticks.
    val evSide = active.select(
      col("pair_id").cast("long").as("pair_id"), col("microtimestamp").as("ts"), lit(0).as("kind"),
      col("microtimestamp"), col("order_id"), col("event_no"), col("side"),
      col("price"), col("amount"), col("fill"), col("is_deleted"),
      col("price_microtimestamp"), col("exchange_id"), col("is_initial"),
      lit(null).cast("double").as("tick_bid"),
      lit(null).cast("double").as("tick_ask"))
    val tickSide = spreadTicks.select(
      col("pair_id").cast("long").as("pair_id"), col("ts"), lit(1).as("kind"),
      lit(null).cast("long").as("microtimestamp"),
      lit(null).cast("long").as("order_id"),
      lit(null).cast("int").as("event_no"),
      lit(null).cast("string").as("side"),
      lit(null).cast("double").as("price"),
      lit(null).cast("double").as("amount"),
      lit(null).cast("double").as("fill"),
      lit(null).cast("boolean").as("is_deleted"),
      lit(null).cast("long").as("price_microtimestamp"),
      lit(null).cast("long").as("exchange_id"),
      lit(null).cast("boolean").as("is_initial"),
      col("bid_price").as("tick_bid"),
      col("ask_price").as("tick_ask"))

    // as-of carry evaluated per (pair, slice) with cross-slice seeds —
    // identical to a whole-pair window, parallelism grows with the span
    val enriched = AsofSlicing.carry(evSide.unionByName(tickSide),
        Seq("tick_bid", "tick_ask"))
      .withColumn("bb", col("tick_bid_asof"))
      .withColumn("ba", col("tick_ask_asof"))
      .filter(col("kind") === 0)
      // initial-book rows predate the window: no prevailing spread
      .withColumn("best_bid_price", when(col("is_initial"), lit(null)).otherwise(col("bb")))
      .withColumn("best_ask_price", when(col("is_initial"), lit(null)).otherwise(col("ba")))

    val isAggressor = when(col("side") === "s",
      col("price") <= coalesce(col("best_bid_price"), col("price") - 1))
      .otherwise(col("price") >= coalesce(col("best_ask_price"), col("price") + 1))

    val wOrd = Window.partitionBy("pair_id", "order_id")
    val flagged = enriched
      .withColumn("is_aggressor", isAggressor)
      .withColumn("is_price_ever_changed",
        max("price").over(wOrd) =!= min("price").over(wOrd))
      .withColumn("is_ever_resting", max(when(!col("is_aggressor"), 1).otherwise(0)).over(wOrd) === 1)
      .withColumn("is_ever_aggressor", max(when(col("is_aggressor"), 1).otherwise(0)).over(wOrd) === 1)
      .withColumn("is_ever_filled",
        max(when(coalesce(col("fill"), lit(0.0)) > 0.0, 1).otherwise(0)).over(wOrd) === 1)
      .withColumn("ord_is_deleted", max(when(col("is_deleted"), 1).otherwise(0)).over(wOrd) === 1)
      .withColumn("is_created",
        max(when(col("event_no") === 1 && !col("is_deleted"), 1).otherwise(0)).over(wOrd) === 1)

    // order-type state machine (reference `db/get_schema.sql:423-434`)
    val orderType = when(col("is_price_ever_changed"), "pacman")
      .when(col("is_ever_resting") && !col("is_ever_aggressor") &&
        !col("is_ever_filled") && col("ord_is_deleted"), "flashed-limit")
      .when(col("is_ever_resting") && !col("is_ever_aggressor") &&
        !col("is_ever_filled") && !col("ord_is_deleted"), "resting-limit")
      .when(col("is_ever_resting") && !col("is_ever_aggressor") &&
        col("is_ever_filled"), "resting-limit")
      .when(!col("is_ever_resting") && col("is_ever_aggressor") &&
        col("ord_is_deleted") && col("is_ever_filled"), "market")
      .when(!col("is_ever_resting") && col("is_ever_aggressor") &&
        col("ord_is_deleted") && !col("is_ever_filled"), "flashed-limit")
      .when((col("is_ever_resting") || !col("ord_is_deleted")) &&
        col("is_ever_aggressor"), "market-limit")
      .otherwise("unknown")

    val buyDenominator =
      if (referenceParity) col("best_ask_price") else col("best_bid_price")
    val aggressiveness = when(col("side") === "s",
      round((col("best_ask_price") - col("price")) / col("best_ask_price") * 10000))
      .otherwise(
        round((col("price") - col("best_bid_price")) / buyDenominator * 10000))

    // event connection (`db/get_schema.sql:390-402,449`): each fill
    // event carries the uuid of the OPPOSITE event of its trade. One
    // trade contributes two connection rows (buy→sell uuid, sell→buy
    // uuid); the match is mutual-best so each (order_id, event_no)
    // appears at most once per side — the left join is 1:1, no row
    // multiplication.
    //
    // Two connection dialects:
    //   - default (improvement, documented deviation): a connection row
    //     keys on the fill EVENT's own timestamp and the matching uuid
    //     names the opposite EVENT (its own ts) — so BOTH sides of a
    //     tolerance-matched trade connect, and every uuid denotes a row
    //     that exists in the level3 log. Trades window (t0, t1].
    //   - referenceParity: the reference's exact rule
    //     (`db/get_schema.sql:390-402`) — connection rows key on the
    //     TRADE's microtimestamp (`using (microtimestamp, event_no,
    //     order_id)` against the event, so the earlier side of a
    //     tolerance match, whose own ts ≠ trade ts, connects to
    //     NOTHING), the matching uuid is built from (trade_ts,
    //     opposite order_id/event_no), the trades window is closed
    //     [t0, t1] (`:313`), and `event.id` is NULL for unconnected
    //     events (`:403-404`).
    val m = matches.getOrElse(TradeMatching.inferredMatches(level3))
      .filter((if (referenceParity) col("microtimestamp") >= t0
        else col("microtimestamp") > t0) && col("microtimestamp") <= t1)
    // both connection rows of a trade come from ONE pass over m (an
    // exploded 2-struct array, not a union of two selects — a union
    // would evaluate the band join + mutual-best windows behind
    // inferredMatches once per branch, and a checkpoint barrier to
    // dedupe them measures slower than the explode)
    def side(oTs: String, oOid: String, oEno: String,
        mTs: String, mOid: String, mEno: String) = struct(
      (if (referenceParity) col("microtimestamp") else col(oTs))
        .as("microtimestamp"),
      col(oOid).as("order_id"),
      col(oEno).as("event_no"),
      eventUuid(
        if (referenceParity) col("microtimestamp") else col(mTs),
        col(mOid), col(mEno), col("pair_id"),
        col("exchange_id")).as("matching_event"))
    val connections = m.select(col("pair_id").cast("long").as("pair_id"),
        explode(array(
          side("buy_microtimestamp", "buy_order_id", "buy_event_no",
            "sell_microtimestamp", "sell_order_id", "sell_event_no"),
          side("sell_microtimestamp", "sell_order_id", "sell_event_no",
            "buy_microtimestamp", "buy_order_id", "buy_event_no")))
          .as("c"))
      .select(col("pair_id"), col("c.microtimestamp"), col("c.order_id"),
        col("c.event_no"), col("c.matching_event"))
    val connected = flagged.join(connections,
      Seq("pair_id", "microtimestamp", "order_id", "event_no"), "left")

    val selfUuid = eventUuid(col("microtimestamp"), col("order_id"),
      col("event_no"), col("pair_id"), col("exchange_id"))
    connected.select(
      (if (referenceParity)
        when(col("matching_event").isNotNull, selfUuid)
       else selfUuid).as("event_id"),
      col("order_id").as("id"),
      col("microtimestamp").as("ts_us"),
      col("price_microtimestamp").as("exchange_timestamp"),
      col("price"),
      col("amount").as("volume"),
      when(col("event_no") === 1 && !col("is_deleted"), "created")
        .when(col("event_no") > 1 && !col("is_deleted"), "changed")
        .otherwise("deleted").as("action"),
      when(col("side") === "b", "bid").otherwise("ask").as("direction"),
      when(col("fill") > 0.0, col("fill")).otherwise(lit(0.0)).as("fill"),
      col("matching_event"),
      orderType.as("type"),
      aggressiveness.as("aggressiveness_bps"),
      col("event_no").cast("long").as("event_no"),
      col("is_aggressor"),
      col("is_created"),
      col("is_ever_resting"),
      col("is_ever_aggressor"),
      col("is_ever_filled"),
      col("ord_is_deleted").as("is_deleted"),
      col("is_price_ever_changed"),
      col("best_bid_price"),
      col("best_ask_price"),
      col("pair_id"))
  }
}
