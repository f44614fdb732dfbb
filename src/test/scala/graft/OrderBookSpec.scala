package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.market._

/** Golden-fixture kernel tests mirroring the reference's order-book
  * unit tests (`db/python2/tests/test_orderbook.py:17-56` over
  * `level3_initial.csv` / `level3_episode.csv`): three resting orders,
  * then one episode that deletes the best ask, replaces the 7992 ask,
  * adds a 7993 ask, and moves the bid to 7990.
  */
class OrderBookSpec extends AnyFunSuite {

  private def ev(ts: Long, oid: Long, side: String, price: Double,
      amount: Double = 1.0, deleted: Boolean = false) =
    BookEvent(1, ts, oid, side, price, amount, deleted)

  private val initial = Seq(
    ev(1, 4154960397L, "s", 7990.40),
    ev(1, 4154960398L, "s", 7992),
    ev(1, 4154960395L, "b", 7989))

  private val episode = Seq(
    ev(2, 4154960397L, "s", 7990.40, deleted = true),
    ev(2, 4154960398L, "s", 7992),
    ev(2, 4154961174L, "s", 7993),
    ev(2, 4154960395L, "b", 7990))

  test("initial spread matches reference fixture (bid 7989 / ask 7990.40)") {
    val book = new OrderBook
    initial.foreach(book.apply)
    assert(book.bestBid.map(_._1).contains(7989.0))
    assert(book.bestAsk.map(_._1).contains(7990.40))
  }

  test("spread after episode matches reference fixture (bid 7990 / ask 7992)") {
    val book = new OrderBook
    (initial ++ episode).foreach(book.apply)
    assert(book.bestBid.map(_._1).contains(7990.0))
    assert(book.bestAsk.map(_._1).contains(7992.0))
  }

  test("event added / replaced / removed") {
    val book = new OrderBook
    (initial ++ episode).foreach(book.apply)
    assert(book.volumeAt(isBid = false, 7993.0) == 1.0) // added
    assert(book.volumeAt(isBid = false, 7992.0) == 1.0) // replaced, still there
    assert(book.volumeAt(isBid = false, 7990.40) == 0.0) // removed
    assert(book.volumeAt(isBid = true, 7989.0) == 0.0) // bid moved away
    assert(book.volumeAt(isBid = true, 7990.0) == 1.0)
  }

  test("L1 emitter dedupes unchanged quotes and reflects the episode") {
    val ticks = Replay.l1(1, (initial ++ episode).iterator).toList
    assert(ticks.map(_.ts) == List(1L, 2L))
    assert(ticks.last.bid_price.contains(7990.0))
    assert(ticks.last.ask_price.contains(7992.0))
    // replaying the same final episode twice must not emit a new tick
    val ticks2 = Replay.l1(1, (initial ++ episode ++
      episode.map(e => e.copy(ts = 3))).iterator).toList
    assert(ticks2.map(_.ts) == List(1L, 2L))
  }

  test("L2 emitter yields per-level deltas with zero on disappearance") {
    val changes = Replay.l2(1, (initial ++ episode).iterator).toList
    val at2 = changes.filter(_.ts == 2)
    assert(at2.exists(c => c.side == "s" && c.price == 7990.40 && c.volume == 0.0))
    assert(at2.exists(c => c.side == "s" && c.price == 7993.0 && c.volume == 1.0))
    assert(at2.exists(c => c.side == "b" && c.price == 7989.0 && c.volume == 0.0))
    assert(at2.exists(c => c.side == "b" && c.price == 7990.0 && c.volume == 1.0))
    // 7992 untouched in total volume -> no change row
    assert(!at2.exists(c => c.price == 7992.0))
  }

  test("trading-period walk: VWAP of the cheapest units, None when short") {
    val book = Seq(
      ev(1, 1, "s", 100.0, 2.0), ev(1, 2, "s", 101.0, 3.0),
      ev(1, 3, "b", 99.0, 4.0))
    val ticks = Replay.tradingPeriod(1, book.iterator, 4).toList
    assert(ticks.size == 1)
    // buy 4: 2@100 + 2@101 = 402 / 4 = 100.5
    assert(ticks.head.buy_vwap.contains(100.5))
    assert(ticks.head.sell_vwap.contains(99.0))
    val short = Replay.tradingPeriod(1, book.iterator, 6).toList
    assert(short.head.buy_vwap.isEmpty) // only 5 units of asks
    assert(short.head.sell_vwap.isEmpty) // only 4 units of bids... wait 4 < 6
  }
}
