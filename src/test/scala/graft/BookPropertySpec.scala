package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.market.{BookEvent, OrderBook, Replay}

/** Property tests: the incremental order book must always agree with a
  * brute-force model (recompute every level total from the event
  * history), for arbitrary event sequences including order reuse,
  * deletion and price moves. (Plain scalacheck generators driven with
  * fixed seeds — deterministic, no scalatestplus bridge needed.)
  */
class BookPropertySpec extends AnyFunSuite {

  private val genEvent: Gen[BookEvent] = for {
    oid <- Gen.choose(1L, 20L)
    side <- Gen.oneOf("b", "s")
    price <- Gen.choose(1, 50).map(_ * 1.0)
    amount <- Gen.choose(1, 9).map(_ * 1.0)
    deleted <- Gen.frequency(4 -> false, 1 -> true)
  } yield BookEvent(1, 0L, oid, side, price, amount, deleted)

  private val genSeq: Gen[List[BookEvent]] = for {
    n <- Gen.choose(0, 60)
    evs <- Gen.listOfN(n, genEvent)
  } yield evs.zipWithIndex.map { case (e, i) => e.copy(ts = i + 1L) }

  private def cases: Seq[List[BookEvent]] =
    (1 to 300).map(i =>
      genSeq.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  /** Brute-force model: last state per order, totals per level. */
  private def model(events: List[BookEvent])
      : Map[(String, Double), Double] = {
    val lastByOrder = events.groupBy(_.orderId).view
      .mapValues(_.maxBy(_.ts)).values
    lastByOrder.filterNot(_.isDeleted).toList
      .groupBy(e => (e.side, e.price)).view
      .mapValues(_.map(_.amount).sum).toMap
  }

  test("book totals always equal the brute-force model") {
    cases.foreach { events =>
      val book = new OrderBook
      events.foreach(book.apply)
      val got = (for (isBid <- Seq(true, false);
        (p, v) <- book.depth(isBid))
        yield ((if (isBid) "b" else "s", p), v)).toMap
      assert(got == model(events), s"events=$events")
    }
  }

  test("L1 stream is deduplicated and consistent with final book") {
    cases.filter(_.nonEmpty).foreach { events =>
      val ticks = Replay.l1(1, events.iterator).toList
      ticks.sliding(2).foreach {
        case List(a, b) => assert(
          a.bid_price != b.bid_price || a.bid_qty != b.bid_qty ||
            a.ask_price != b.ask_price || a.ask_qty != b.ask_qty)
        case _ =>
      }
      val book = new OrderBook
      events.foreach(book.apply)
      assert(ticks.last.bid_price == book.bestBid.map(_._1))
      assert(ticks.last.ask_price == book.bestAsk.map(_._1))
    }
  }

  test("sliced replay == sequential replay for arbitrary streams and slice widths") {
    import graft.market.SlicedEvent
    // build the sliced-group inputs the DataFrame layer would: per
    // slice, seed rows = the standing book at the boundary (derived
    // from a model replay), then the slice's own events
    def slicedL1(events: List[BookEvent], w: Long) = {
      val minSlice = events.map(e => (e.ts - 1) / w).min
      events.groupBy(e => (e.ts - 1) / w).toList.sortBy(_._1).flatMap {
        case (slice, evs) =>
          val boundary = slice * w
          val book = new OrderBook
          events.filter(_.ts <= boundary).foreach(book.apply)
          val seeds = (for (isBid <- Seq(true, false);
            // one seed per live order: replay the prefix and read state
            (oid, (ib, p, a)) <- {
              val b2 = new OrderBook
              events.filter(_.ts <= boundary).foreach(b2.apply)
              b2.liveOrders.toList
            } if ib == isBid)
            yield SlicedEvent(1, slice, seed = true,
              hasHistory = slice > minSlice, boundary, oid,
              if (ib) "b" else "s", p, a, isDeleted = false, -oid)).toList
          val real = evs.sortBy(e => (e.ts, e.orderId)).map(e =>
            SlicedEvent(1, slice, seed = false,
              hasHistory = slice > minSlice, e.ts, e.orderId, e.side,
              e.price, e.amount, e.isDeleted, e.orderId))
          Replay.l1Sliced(1, (seeds ++ real).iterator).toList
      }
    }
    cases.filter(_.nonEmpty).foreach { events =>
      val sequential = Replay.l1(1, events.iterator).toList
      for (w <- Seq(1L, 3L, 7L, 100L)) {
        val sliced = slicedL1(events, w)
        assert(sliced == sequential, s"w=$w events=$events")
      }
    }
  }

  test("L2 running totals reconstruct the model at end of stream") {
    cases.foreach { events =>
      val changes = Replay.l2(1, events.iterator).toList
      val finalLevels = changes.groupBy(c => (c.side, c.price)).view
        .mapValues(_.maxBy(_.ts).volume).filter(_._2 != 0.0).toMap
      assert(finalLevels == model(events), s"events=$events")
    }
  }
}
