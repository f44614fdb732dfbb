package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.market.Level3Source

/** Bitstamp wire-format connector — the second exchange dialect
  * (reference `python/obadiah/bitstamp.py:37-120`): JSON *objects* per
  * frame, `live_orders_<pair>` events
  * (`order_created|order_changed|order_deleted`, `data` carrying
  * µs-precision `microtimestamp`, `amount_str`/`price_str`, `id`,
  * `order_type` 0=buy 1=sell) and `live_trades_<pair>` trades (`type`
  * 0=buy 1=sell, both order ids). Parsing is stateless
  * (streaming-safe); the era is the pair's first event instant
  * (`live_orders_eras` insert, `bitstamp.py:82-88`). */
object BitstampFeed {

  private val orderSchema = DataType.fromDDL(
    "event string, channel string, data struct<microtimestamp: string, " +
      "datetime: string, amount_str: string, price_str: string, " +
      "id: bigint, order_type: int>")

  private val tradeSchema = DataType.fromDDL(
    "event string, channel string, data struct<microtimestamp: string, " +
      "amount_str: string, price_str: string, id: bigint, type: int, " +
      "buy_order_id: bigint, sell_order_id: bigint>")

  /** (pair_id, local_timestamp, message) → transient live-order rows
    * with the era attached (first event instant per pair). */
  def liveOrders(frames: DataFrame): DataFrame = {
    val m = from_json(col("message"), orderSchema)
    val base = frames
      .withColumn("m", m)
      .filter(col("m.event").isin(
        "order_created", "order_changed", "order_deleted") &&
        col("m.channel").startsWith("live_orders"))
      .select(col("pair_id"), col("local_timestamp"),
        col("m.data.microtimestamp").cast("long").as("microtimestamp"),
        (col("m.data.datetime").cast("double") * 1000000).cast("long")
          .as("datetime"),
        col("m.data.amount_str").cast("double").as("amount"),
        col("m.data.price_str").cast("double").as("price"),
        col("m.data.id").as("order_id"),
        when(col("m.data.order_type") === 1, "s").otherwise("b").as("side"),
        col("m.event").as("event"))
    base.withColumn("era",
      min("microtimestamp").over(Window.partitionBy("pair_id")))
  }

  /** (pair_id, local_timestamp, message) → transient live-trade rows. */
  def liveTrades(frames: DataFrame): DataFrame =
    frames
      .withColumn("m", from_json(col("message"), tradeSchema))
      .filter(col("m.event") === "trade" &&
        col("m.channel").startsWith("live_trades"))
      .select(col("pair_id"), col("local_timestamp"),
        col("m.data.microtimestamp").cast("long").as("trade_timestamp"),
        col("m.data.amount_str").cast("double").as("amount"),
        col("m.data.price_str").cast("double").as("price"),
        col("m.data.id").as("bitstamp_trade_id"),
        when(col("m.data.type") === 1, "s").otherwise("b").as("trade_type"),
        col("m.data.buy_order_id"), col("m.data.sell_order_id"))

  /** live_orders → level3 (the `move_events` transfer,
    * `db/bitstamp_schema.sql:1381-1448`, on the immutable path): Bitstamp
    * reports explicit event types, so `is_deleted` comes from
    * `order_deleted` rather than a zero price, and order ids are
    * exchange-unique (no reincarnation numbering). */
  def level3FromLiveOrders(orders: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("pair_id", "order_id")
      .orderBy("microtimestamp", "local_timestamp")
    // capture-time R0/fmu normalization, as the Bitfinex path
    // (`db/bitfinex_schema.sql:352`; pairs seed
    // `db/obanalytics_pairs.sql:63-74`)
    val evt = orders
      .withColumn("price",
        graft.market.Dimensions.roundPrice(col("pair_id"), col("price")))
      .withColumn("amount",
        graft.market.Dimensions.roundAmount(col("pair_id"), col("amount")))
      .withColumn("del_flag",
        when(col("event") === "order_deleted", 1).otherwise(0))
      .withColumn("event_no", row_number().over(wOrd))
      .withColumn("prev_amount", lag("amount", 1).over(wOrd))
      .withColumn("lead_ts", lead("microtimestamp", 1).over(wOrd))
      .withColumn("prev_price", lag("price", 1).over(wOrd))
      .withColumn("price_chg",
        when(col("prev_price").isNull || col("price") =!= col("prev_price"), 1)
          .otherwise(0))
      .withColumn("price_group",
        sum("price_chg").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val wChain = Window.partitionBy("pair_id", "order_id", "price_group")
    evt.select(
      col("microtimestamp"),
      col("order_id"),
      col("event_no"),
      col("side"),
      col("price"),
      col("amount"),
      when(col("prev_amount") > col("amount"),
        col("prev_amount") - col("amount")).as("fill"),
      when(col("del_flag") === 1, col("microtimestamp"))
        .otherwise(coalesce(col("lead_ts"), lit(Level3Source.AliveMicros)))
        .as("next_microtimestamp"),
      (col("del_flag") === 1).as("is_deleted"),
      min("microtimestamp").over(wChain).as("price_microtimestamp"),
      min("event_no").over(wChain).as("price_event_no"),
      col("pair_id"),
      lit(2).as("exchange_id"), // bitstamp = 2 in the reference seed
      col("local_timestamp").as("event_id"))
  }
}
