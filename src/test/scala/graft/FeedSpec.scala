package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.market.{MarketOps, Replay, BookEvent}
import graft.sources.BitfinexFeed

/** Exchange-format connector: raw Bitfinex R0 book-channel frames →
  * transient raw book events → level3 → replay, end to end. The quote
  * expectations reproduce the reference's own golden order-book fixture
  * (`db/python2/tests/test_orderbook.py:45-56` over `level3_*.csv`:
  * best bid 7989 → 7990, best ask 7990.40 → 7992 across the episode).
  */
class FeedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-feed")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // The reference fixture as wire frames: a snapshot episode (three
  // resting orders), then an update episode that moves the bid, deletes
  // the 7990.40 ask, re-asserts 7992 and adds 7993. Bids have +amount,
  // asks -amount; a zero price deletes; 'hb' is noise.
  private val t0 = 1569546956000L // ms
  private val frames = Seq(
    (1, 17082, 1000L,
      s"""[17082, [[4154960395, 7989, 1], [4154960397, 7990.40, -1], [4154960398, 7992, -1]], $t0]"""),
    (1, 17082, 1500L, s"""[17082, "hb", ${t0 + 100}]"""),
    (1, 17082, 2000L,
      s"""[17082, [4154960395, 7990, 1], ${t0 + 1000}]"""),
    (1, 17082, 2100L,
      s"""[17082, [4154960398, 7992, -1], ${t0 + 1000}]"""),
    (1, 17082, 2200L,
      s"""[17082, [4154961174, 7993, -1], ${t0 + 1000}]"""),
    (1, 17082, 2300L,
      s"""[17082, [4154960397, 0, -1], ${t0 + 1000}]"""))
    .toDF("pair_id", "channel_id", "local_timestamp", "message")

  test("frames parse: heartbeats drop, snapshots explode, updates flow") {
    val parsed = BitfinexFeed.parseFrames(frames)
    assert(parsed.count() == 7) // 3 snapshot entries + 4 updates
    assert(parsed.filter(col("is_snapshot")).count() == 3)
    assert(parsed.filter(col("price") === 0.0).count() == 1)
  }

  test("episode sessionization: snapshot episode + zero-price-closed episode") {
    val raw = BitfinexFeed.rawBookEvents(frames)
    val eps = raw.select("episode_timestamp").distinct().as[Long]
      .collect().sorted
    assert(eps.length == 2)
    assert(eps(0) == t0 * 1000 && eps(1) == (t0 + 1000) * 1000)
    // the four update rows share the second episode
    assert(raw.filter(col("episode_timestamp") === (t0 + 1000) * 1000)
      .count() == 4)
  }

  test("trades channel: tu frames captured, te/hb dropped, duplicates deduped") {
    val tf = Seq(
      (1, 18000, 1000L,
        s"""[18000, [[401, $t0, 0.5, 7990], [402, $t0, -1.5, 7991]], $t0]"""),
      (1, 18000, 1100L, s"""[18000, "te", [403, ${t0 + 10}, 2, 7992], ${t0 + 10}]"""),
      (1, 18000, 1200L, s"""[18000, "tu", [403, ${t0 + 10}, 2, 7992], ${t0 + 10}]"""),
      (1, 18000, 1300L, s"""[18000, "tu", [403, ${t0 + 10}, 2, 7992], ${t0 + 10}]"""),
      (1, 18000, 1400L, s"""[18000, "hb", ${t0 + 20}]"""))
      .toDF("pair_id", "channel_id", "local_timestamp", "message")
    val trades = BitfinexFeed.captureTrades(BitfinexFeed.parseTradeFrames(tf))
    assert(trades.count() == 3) // 2 snapshot + 1 deduped tu (te/hb dropped)
    val t403 = trades.filter(col("exchange_trade_id") === 403).collect()
    assert(t403.length == 1 && t403(0).getAs[Long]("local_timestamp") == 1200L)
    assert(trades.filter(col("exchange_trade_id") === 402 &&
      col("side") === "s" && col("amount") === 1.5).count() == 1)
  }

  test("bitstamp dialect: object frames parse, level3 chains build") {
    import graft.sources.BitstampFeed
    def of(lts: Long, ev: String, ts: Long, amt: String, price: String,
        id: Long, ot: Int) =
      (1, lts, s"""{"event": "$ev", "channel": "live_orders_btcusd", """ +
        s""""data": {"microtimestamp": "$ts", "datetime": "${ts / 1000000}", """ +
        s""""amount_str": "$amt", "price_str": "$price", "id": $id, """ +
        s""""order_type": $ot}}""")
    val frames = Seq(
      of(1L, "order_created", 1000000L, "2.0", "7989", 10L, 0),
      of(2L, "order_changed", 2000000L, "1.0", "7989", 10L, 0),
      of(3L, "order_created", 2500000L, "1.0", "7995", 11L, 1),
      of(4L, "order_deleted", 3000000L, "1.0", "7989", 10L, 0),
      (1, 5L, """{"event": "bts:subscription_succeeded", "channel": "x", "data": {}}"""))
      .toDF("pair_id", "local_timestamp", "message")
    val orders = BitstampFeed.liveOrders(frames)
    assert(orders.count() == 4) // control frame dropped
    assert(orders.agg(min("era")).collect()(0).getLong(0) == 1000000L)
    val l3 = BitstampFeed.level3FromLiveOrders(orders)
    val o10 = l3.filter(col("order_id") === 10).orderBy("event_no")
      .select("event_no", "fill", "next_microtimestamp", "is_deleted")
      .collect()
    assert(o10.length == 3)
    assert(o10(1).getDouble(1) == 1.0) // fill = 2.0 - 1.0
    assert(o10(1).getLong(2) == 3000000L) // chains to the delete
    assert(o10(2).getBoolean(3)) // deleted
    val trades = BitstampFeed.liveTrades(Seq(
      (1, 6L, """{"event": "trade", "channel": "live_trades_btcusd", """ +
        """"data": {"microtimestamp": "2600000", "amount_str": "1.0", """ +
        """"price_str": "7989", "id": 77, "type": 1, """ +
        """"buy_order_id": 10, "sell_order_id": 11}}"""))
      .toDF("pair_id", "local_timestamp", "message"))
    val t = trades.collect()(0)
    assert(t.getAs[String]("trade_type") == "s" &&
      t.getAs[Long]("buy_order_id") == 10L)
  }

  test("level3 from raw feed replays to the reference fixture's quotes") {
    val l3 = BitfinexFeed.level3FromRaw(BitfinexFeed.rawBookEvents(frames))
    // side from amount sign
    assert(l3.filter(col("order_id") === 4154960395000L &&
      col("side") =!= "b").count() == 0)
    assert(l3.filter(col("order_id") === 4154960398000L &&
      col("side") =!= "s").count() == 0)
    val events = l3
      .orderBy("microtimestamp", "event_id")
      .select("pair_id", "microtimestamp", "order_id", "side", "price",
        "amount", "is_deleted")
      .as[(Int, Long, Long, String, Double, Double, Boolean)]
      .collect()
      .map(r => BookEvent(r._1, r._2, r._3, r._4, r._5, r._6, r._7))
    val ticks = Replay.l1(1, events.iterator).toList
    assert(ticks.size == 2)
    assert(ticks(0).bid_price.contains(7989.0) &&
      ticks(0).ask_price.contains(7990.40))
    assert(ticks(1).bid_price.contains(7990.0) &&
      ticks(1).ask_price.contains(7992.0))
    // the deleted ask's chain ends at the episode (event_no 2, deleted)
    val del = l3.filter(col("order_id") === 4154960397000L &&
      col("is_deleted")).collect()
    assert(del.length == 1)
  }

  test("wire R0/fmu rounding: sub-precision feed noise normalizes on ingest") {
    // BTCUSD (pair 1): R0 = 2 (price to cents), fmu = 8 — reference
    // rounding rule db/bitfinex_schema.sql:352,487, seed
    // db/obanalytics_pairs.sql:63-74. Half-up at the boundary digit:
    // -2.49999999949 carries up to 2.5 at 8 dp.
    val noisy = Seq(
      (1, 17082, 1000L,
        s"""[17082, [[5001, 7989.004999, 1.000000004], [5002, 7990.2349999, -2.49999999949]], $t0]"""))
      .toDF("pair_id", "channel_id", "local_timestamp", "message")
    val l3 = BitfinexFeed.level3FromRaw(BitfinexFeed.rawBookEvents(noisy))
      .orderBy("order_id").collect()
    assert(l3(0).getAs[Double]("price") == 7989.0)
    assert(l3(0).getAs[Double]("amount") == 1.0)
    assert(l3(0).getAs[String]("side") == "b")
    assert(l3(1).getAs[Double]("price") == 7990.23)
    assert(l3(1).getAs[Double]("amount") == 2.5)
    assert(l3(1).getAs[String]("side") == "s")

    // trades channel rounds by the same rule
    val tf = Seq(
      (1, 18000, 1000L,
        s"""[18000, [[411, $t0, 0.123456789012, 7990.129999]], $t0]"""))
      .toDF("pair_id", "channel_id", "local_timestamp", "message")
    val tr = BitfinexFeed.captureTrades(BitfinexFeed.parseTradeFrames(tf))
      .collect()
    assert(tr(0).getAs[Double]("amount") == 0.12345679)
    assert(tr(0).getAs[Double]("price") == 7990.13)

    // unseeded pair: no precision metadata -> values pass through
    val foreign = Seq(
      (99, 17082, 1000L,
        s"""[17082, [[5003, 123.456789, 1.000000004]], $t0]"""))
      .toDF("pair_id", "channel_id", "local_timestamp", "message")
    val fl3 = BitfinexFeed.level3FromRaw(BitfinexFeed.rawBookEvents(foreign))
      .collect()
    assert(fl3(0).getAs[Double]("price") == 123.456789)
    assert(fl3(0).getAs[Double]("amount") == 1.000000004)
  }
}
