package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sequential._

class SequentialSpec extends AnyFunSuite {

  private def q(ts: Long, bid: Double, ask: Double) =
    Quote(1, ts, Some(bid), Some(ask))

  test("trading strategy discovers a long over a monotone rise") {
    // ask 10 at t0; bid rises to 20 -> long opened at 10, closed at 20
    val quotes = Seq(
      q(0, 9, 10), q(1000000, 14, 15), q(2000000, 19, 20), q(3000000, 19, 20))
    val ps = TradingStrategyOp.positions(1, quotes.iterator,
      phi = 1.0, rho = 0.0).toList
    assert(ps.size == 1)
    assert(ps.head.side == "long")
    assert(ps.head.open_price == 10.0) // bought at the ask
    assert(ps.head.close_price == 19.0) // sold at the bid
  }

  test("trading strategy discovers a short over a monotone fall") {
    val quotes = Seq(
      q(0, 19, 20), q(1000000, 14, 15), q(2000000, 9, 10), q(3000000, 9, 10))
    val ps = TradingStrategyOp.positions(1, quotes.iterator,
      phi = 1.0, rho = 0.0).toList
    assert(ps.size == 1)
    assert(ps.head.side == "short")
    assert(ps.head.open_price == 19.0) // sold at the bid
    assert(ps.head.close_price == 10.0) // bought back at the ask
  }

  test("trading strategy skips crossed and one-sided quotes") {
    val quotes = Seq(
      Quote(1, 0, Some(20), Some(10)), // crossed -> skipped
      Quote(1, 1, None, Some(10)), // one-sided -> skipped
      q(2, 9, 10), q(3, 30, 31))
    val ps = TradingStrategyOp.positions(1, quotes.iterator, 1.0, 0.0).toList
    assert(ps.size == 1 && ps.head.open_price == 10.0)
  }

  test("commission gates small moves") {
    val quotes = Seq(q(0, 9, 10), q(1, 10, 11), q(2, 10, 11))
    // move of +1 does not clear commission 2*phi = 4
    assert(TradingStrategyOp.positions(1, quotes.iterator, 2.0, 0.0).isEmpty)
  }

  test("epsilon draws segment a zig-zag path at retracements > eps") {
    // rise 10->20, retrace to 15 (delta 5 > eps 3) -> close drawup at 20
    val prices = Seq((0L, 10.0), (1L, 14.0), (2L, 20.0), (3L, 15.0),
      (4L, 8.0), (5L, 9.0))
    val ds = EpsilonDrawsOp.draws(1, prices.iterator, epsilon = 3.0).toList
    // reference semantics (src/epsilon_drawupdowns.cpp:32-89): the fall
    // to 8 *extends* the down-draw opened at 20 (monotone beyond the
    // turning point), and the trailing partial draw ends at the last
    // price seen (9), not the turning point
    assert(ds.size == 2)
    assert(ds(0).start_price == 10.0 && ds(0).end_price == 20.0 &&
      ds(0).kind == "up")
    assert(ds(1).start_price == 20.0 && ds(1).end_price == 9.0 &&
      ds(1).kind == "down")
  }

  test("epsilon draws: small retracements extend, not close") {
    val prices = Seq((0L, 10.0), (1L, 20.0), (2L, 18.0), (3L, 25.0))
    val ds = EpsilonDrawsOp.draws(1, prices.iterator, epsilon = 5.0).toList
    assert(ds.size == 1)
    assert(ds.head.end_price == 25.0 && ds.head.kind == "up")
  }
}
