package graft.market

import scala.collection.mutable

/** Input row for the order-book replay kernel (timestamps in epoch µs). */
case class BookEvent(
    pairId: Int,
    ts: Long,
    orderId: Long,
    side: String, // "b" | "s"
    price: Double,
    amount: Double,
    isDeleted: Boolean)

/** Level-1 tick: best bid/ask after an episode (None = empty side). */
case class L1Tick(
    pair_id: Int,
    ts: Long,
    bid_price: Option[Double],
    bid_qty: Option[Double],
    ask_price: Option[Double],
    ask_qty: Option[Double])

/** Effective buy/sell price for a fixed volume after an episode. */
case class TpTick(
    pair_id: Int,
    ts: Long,
    buy_vwap: Option[Double],
    sell_vwap: Option[Double])

/** Level-2 delta: the new total volume at a touched price level. */
case class L2Change(
    pair_id: Int,
    ts: Long,
    side: String,
    price: Double,
    volume: Double)

/** In-memory limit order book, the direct analogue of the reference's C
  * replay engine state (reference: `db/c/obadiah_db/order_book.cpp:22-47`
  * — `map[order_id]` + per-side `map[price -> volume]`). State is O(live
  * orders), independent of history length, which is what makes replay of
  * an unbounded event stream safe on one executor core per group.
  */
final class OrderBook {
  // orderId -> (isBid, price, amount)
  private val orders = mutable.LongMap.empty[(Boolean, Double, Double)]
  private val bids = mutable.TreeMap.empty[Double, Double]
  private val asks = mutable.TreeMap.empty[Double, Double]

  private def levelAdd(isBid: Boolean, price: Double, delta: Double): Unit = {
    val m = if (isBid) bids else asks
    val nv = m.getOrElse(price, 0.0) + delta
    // amounts are exact in Double here; drop empty levels
    if (nv <= 0.0) m.remove(price) else m.update(price, nv)
  }

  /** Apply one event: replace the order's previous state; a deletion
    * removes it (reference semantics: '-infinity' forward pointer,
    * `db/obanalytics_schema.sql:149-150`). Returns touched (isBid, price)
    * levels for L2 emission. */
  def apply(e: BookEvent): List[(Boolean, Double)] = {
    var touched: List[(Boolean, Double)] = Nil
    orders.get(e.orderId).foreach { case (ob, op, oa) =>
      levelAdd(ob, op, -oa)
      touched = (ob, op) :: touched
      orders.remove(e.orderId)
    }
    if (!e.isDeleted) {
      val isBid = e.side == "b"
      levelAdd(isBid, e.price, e.amount)
      orders.update(e.orderId, (isBid, e.price, e.amount))
      touched = (isBid, e.price) :: touched
    }
    touched
  }

  def liveOrders: Iterator[(Long, (Boolean, Double, Double))] = orders.iterator
  def bestBid: Option[(Double, Double)] = bids.lastOption
  def bestAsk: Option[(Double, Double)] = asks.headOption
  def volumeAt(isBid: Boolean, price: Double): Double =
    (if (isBid) bids else asks).getOrElse(price, 0.0)
  /** Iterate depth (price -> volume); bids descending, asks ascending. */
  def depth(isBid: Boolean): Iterator[(Double, Double)] =
    if (isBid) bids.iterator.toSeq.reverseIterator else asks.iterator
  def bidLevels: Int = bids.size
  def askLevels: Int = asks.size
}

/** Episode-at-a-time replay over a time-sorted event iterator. An
  * *episode* is the group of events sharing one microtimestamp; emitters
  * observe the book only at episode boundaries (reference:
  * `db/c/obadiah_db/episode.cpp:106-159`, SURVEY §7.4). The iterator is
  * fully streaming: O(book) memory, single pass.
  */
object Replay {

  /** Generic fold: applies episodes in order, calling `emit` with
    * (episodeTs, book, touchedLevels) after each episode. */
  def episodes[T](
      events: Iterator[BookEvent],
      emit: (Long, OrderBook, List[(Boolean, Double)]) => IterableOnce[T])
      : Iterator[T] = {
    val buf = events.buffered
    val book = new OrderBook
    new Iterator[Iterator[T]] {
      override def hasNext: Boolean = buf.hasNext
      override def next(): Iterator[T] = {
        val ts = buf.head.ts
        var touched: List[(Boolean, Double)] = Nil
        while (buf.hasNext && buf.head.ts == ts)
          touched = book.apply(buf.next()) reverse_::: touched
        emit(ts, book, touched).iterator
      }
    }.flatten
  }

  /** L1 ticks, deduplicated (emit only when the quote changes —
    * reference: `db/c/obadiah_db/depth.cpp:20-75`). */
  def l1(pairId: Int, events: Iterator[BookEvent]): Iterator[L1Tick] = {
    var last: L1Tick = null
    episodes(events, (ts, book, _) => {
      val t = L1Tick(pairId, ts,
        book.bestBid.map(_._1), book.bestBid.map(_._2),
        book.bestAsk.map(_._1), book.bestAsk.map(_._2))
      if (last == null ||
          t.bid_price != last.bid_price || t.bid_qty != last.bid_qty ||
          t.ask_price != last.ask_price || t.ask_qty != last.ask_qty) {
        last = t; Some(t)
      } else None
    })
  }

  /** Effective-price stream (reference `get.trading_period`,
    * `db/c/obadiah_db/obadiah_db.cpp:495-594`; walk kernel
    * `src/base.h:288-349`): per episode, the VWAP of buying/selling
    * `volumeUnits` by walking the book; None when depth is insufficient.
    * Cost accumulates in integer cents (price quantized to 1e-2) so the
    * result is exact and engine-independent; the final division is one
    * deterministic double op. Emits on change only. */
  def tradingPeriod(pairId: Int, events: Iterator[BookEvent],
      volumeUnits: Long): Iterator[TpTick] = {
    def walk(book: OrderBook, isBid: Boolean): Option[Double] = {
      var remaining = volumeUnits
      var costCents = 0L
      val it = book.depth(isBid)
      while (remaining > 0 && it.hasNext) {
        val (price, qty) = it.next()
        val take = math.min(qty.toLong, remaining)
        costCents += take * math.round(price * 100)
        remaining -= take
      }
      if (remaining > 0) None
      else Some(costCents.toDouble / (100.0 * volumeUnits))
    }
    var last: TpTick = null
    episodes(events, (ts, book, _) => {
      val t = TpTick(pairId, ts, walk(book, isBid = false), walk(book, isBid = true))
      if (last == null || t.buy_vwap != last.buy_vwap ||
          t.sell_vwap != last.sell_vwap) {
        last = t; Some(t)
      } else None
    })
  }

  /** L2 depth changes: new total volume at every touched price level
    * whose total actually changed (reference:
    * `db/c/obadiah_db/order_book.cpp:59-173`). */
  def l2(pairId: Int, events: Iterator[BookEvent]): Iterator[L2Change] =
    l2From(pairId, new OrderBook,
      mutable.HashMap.empty[(Boolean, Double), Double], events)

  private def l2From(pairId: Int, book: OrderBook,
      prev: mutable.HashMap[(Boolean, Double), Double],
      events: Iterator[BookEvent]): Iterator[L2Change] = {
    val buf = events.buffered
    new Iterator[Iterator[L2Change]] {
      override def hasNext: Boolean = buf.hasNext
      override def next(): Iterator[L2Change] = {
        val ts = buf.head.ts
        var touched: List[(Boolean, Double)] = Nil
        while (buf.hasNext && buf.head.ts == ts)
          touched = book.apply(buf.next()) reverse_::: touched
        touched.distinct.flatMap { case (isBid, price) =>
          val now = book.volumeAt(isBid, price)
          val before = prev.getOrElse((isBid, price), 0.0)
          if (now != before) {
            if (now == 0.0) prev.remove((isBid, price))
            else prev.update((isBid, price), now)
            Some(L2Change(pairId, ts, if (isBid) "b" else "s", price, now))
          } else None
        }.iterator
      }
    }.flatten
  }

  /** Windowed depth in one pass (reference `level2_continuous`,
    * `db/obanalytics_schema.sql:1627-1661`): silently replay to t0,
    * emit the standing book as a synthetic starting depth at t0, then
    * stream the changes in (t0, t1] — no second replay for the
    * boundary state. */
  def depthWindow(pairId: Int, events: Iterator[BookEvent],
      t0: Long, t1: Long): Iterator[L2Change] = {
    val buf = events.buffered
    val book = new OrderBook
    while (buf.hasNext && buf.head.ts <= t0) book.apply(buf.next())
    val prev = mutable.HashMap.empty[(Boolean, Double), Double]
    val starting = Seq(true, false).iterator.flatMap { isBid =>
      book.depth(isBid).map { case (price, vol) =>
        prev.update((isBid, price), vol)
        L2Change(pairId, t0, if (isBid) "b" else "s", price, vol)
      }
    }.toList // materialize: prev must be seeded before changes stream
    starting.iterator ++
      l2From(pairId, book, prev, buf.takeWhile(_.ts <= t1))
  }
}
