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

  test("L2 running totals reconstruct the model at end of stream") {
    cases.foreach { events =>
      val changes = Replay.l2(1, events.iterator).toList
      val finalLevels = changes.groupBy(c => (c.side, c.price)).view
        .mapValues(_.maxBy(_.ts).volume).filter(_._2 != 0.0).toMap
      assert(finalLevels == model(events), s"events=$events")
    }
  }
}
