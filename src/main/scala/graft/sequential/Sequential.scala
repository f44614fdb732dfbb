package graft.sequential

/** Inherently sequential financial state machines (SURVEY §2.3). Each is
  * a pure Scala iterator transform, parallelized per (pair, era) group
  * by the caller via `flatMapSortedGroups` — the reference runs the same
  * algorithms single-threaded per series (`src/position_discovery.cpp`,
  * `src/epsilon_drawupdowns.cpp`), so per-group sequential execution on
  * one executor core is the faithful (and only) parallel unit.
  */

/** Best bid/ask quote at an instant (µs); None = side empty. */
case class Quote(pair_id: Int, ts: Long,
    bid: Option[Double], ask: Option[Double])

/** Quote tagged with its era — the (pair, era) parallel unit. */
case class QuoteE(pair_id: Int, era_no: Long, ts: Long,
    bid: Option[Double], ask: Option[Double]) {
  def toQuote: Quote = Quote(pair_id, ts, bid, ask)
}

/** A discovered position with the R client's return columns
  * (`R/obanalytics.R:795-813`, `src/obanalytics.cpp:338-360`):
  * `log_return` = |ln open − ln close|, `rate` = per-second compounding
  * `exp(log_return / seconds) − 1`, `bps_return` = the signed
  * basis-point return (None when open == close, as the R client leaves
  * NA). */
case class Position(pair_id: Int, side: String,
    opened_at: Long, open_price: Double,
    closed_at: Long, close_price: Double,
    log_return: Double, rate: Double, bps_return: Option[Double])

object Position {
  def withReturns(pairId: Int, side: String, openedAt: Long,
      openPrice: Double, closedAt: Long, closePrice: Double): Position = {
    val logReturn =
      if (openPrice > closePrice) math.log(openPrice) - math.log(closePrice)
      else math.log(closePrice) - math.log(openPrice)
    val secs = (closedAt - openedAt) / 1e6
    val rate = math.exp(logReturn / secs) - 1.0
    val bps =
      if (openPrice > closePrice) Some((math.exp(-logReturn) - 1.0) * -10000.0)
      else if (openPrice < closePrice) Some((math.exp(logReturn) - 1.0) * 10000.0)
      else None
    Position(pairId, side, openedAt, openPrice, closedAt, closePrice,
      logReturn, rate, bps)
  }
}

/** Greedy optimal long/short position discovery with commission `phi`
  * (cost 2φ per round trip) and per-second interest `rho` — a
  * re-implementation of the reference's algorithm (state = four
  * candidate prices sl/el/ss/es; `src/position_discovery.cpp:28-241`).
  * Skips one-sided and crossed quotes (`:77-80`).
  */
object TradingStrategyOp {

  private case class IP(var p: Double, var t: Long) // price at instant

  def positions(pairId: Int, quotes: Iterator[Quote],
      phi: Double, rho: Double): Iterator[Position] = {
    val out = scala.collection.mutable.ListBuffer.empty[Position]
    val useRho = if (rho < 0) 0.0 else rho
    val usePhi = if (phi < 0) 0.0 else phi
    def interest(a: IP, b: IP): Double = useRho * math.abs((b.t - a.t) / 1e6)
    def commission: Double = 2 * usePhi

    val it = quotes.flatMap { q =>
      for (b <- q.bid; a <- q.ask if b <= a) yield (q.ts, b, a)
    }
    if (!it.hasNext) return Iterator.empty
    val (t0, b0, a0) = it.next()
    val sl = IP(a0, t0); val el = IP(0, 0)
    val ss = IP(b0, t0); val es = IP(0, 0)

    def emit(side: String, s: IP, e: IP): Unit =
      out += Position.withReturns(pairId, side, s.t, s.p, e.t, e.p)

    it.foreach { case (t, bp, ap) =>
      val bid = IP(bp, t); val ask = IP(ap, t)
      if (el.p == 0 && es.p == 0) { // no position discovered yet
        if (bid.p - sl.p > interest(bid, sl) + commission) {
          el.p = bid.p; el.t = bid.t; ss.p = bid.p; ss.t = bid.t
        } else if (ss.p - ask.p > interest(ss, ask) + commission) {
          es.p = ask.p; es.t = ask.t; sl.p = ask.p; sl.t = ask.t
        } else {
          if (ask.p - sl.p < interest(bid, sl)) { sl.p = ask.p; sl.t = ask.t }
          if (ss.p - bid.p < interest(ss, bid)) { ss.p = bid.p; ss.t = bid.t }
        }
      } else if (el.p != 0) { // long position open
        if (ss.p - bid.p < interest(ss, bid)) { ss.p = bid.p; ss.t = bid.t }
        if (bid.p - el.p > interest(bid, el)) {
          el.p = bid.p; el.t = bid.t; ss.p = bid.p; ss.t = bid.t
        } else if (ss.p - ask.p > interest(ss, ask) + commission) {
          emit("long", sl, el)
          es.p = ask.p; es.t = ask.t; sl.p = ask.p; sl.t = ask.t; el.p = 0
        } else if (interest(ask, el) > commission - (el.p - ask.p)) {
          emit("long", sl, el)
          sl.p = ask.p; sl.t = ask.t; el.p = 0
        }
      } else { // short position open
        if (ask.p - sl.p < interest(ask, sl)) { sl.p = ask.p; sl.t = ask.t }
        if (es.p - ask.p > interest(es, ask)) {
          es.p = ask.p; es.t = ask.t; sl.p = ask.p; sl.t = ask.t
        } else if (bid.p - sl.p > interest(sl, bid) + commission) {
          emit("short", ss, es)
          el.p = bid.p; el.t = bid.t; ss.p = bid.p; ss.t = bid.t; es.p = 0
        } else if (interest(bid, es) > commission - (bid.p - es.p)) {
          emit("short", ss, es)
          ss.p = bid.p; ss.t = bid.t; es.p = 0
        }
      }
    }
    if (el.p != 0) emit("long", sl, el)
    else if (es.p != 0) emit("short", ss, es)
    out.iterator
  }
}

/** ε-drawup/drawdown segmentation (Gerlach–Sornette) of a price path:
  * extend a draw while the move from the turning point is monotone,
  * close it when the retracement exceeds ε — reference
  * `src/epsilon_drawupdowns.cpp:32-89`. */
object EpsilonDrawsOp {

  case class Draw(pair_id: Int, start_ts: Long, start_price: Double,
      end_ts: Long, end_price: Double, kind: String)

  def draws(pairId: Int, prices: Iterator[(Long, Double)],
      epsilon: Double): Iterator[Draw] = {
    val out = scala.collection.mutable.ListBuffer.empty[Draw]
    if (!prices.hasNext) return Iterator.empty
    var (stT, stP) = prices.next()
    var (tpT, tpP) = (stT, stP)
    var (enT, enP) = (stT, stP)
    def emit(eT: Long, eP: Double): Unit =
      out += Draw(pairId, stT, stP, eT, eP,
        if (eP >= stP) "up" else "down")
    prices.foreach { case (t, p) =>
      enT = t; enP = p
      if (p != tpP) {
        if ((tpP >= stP && p > tpP) || (tpP <= stP && p < tpP)) {
          tpT = t; tpP = p // extend the draw, new turning point
        } else if (math.abs(p - tpP) > epsilon) {
          emit(tpT, tpP) // close at the turning point
          stT = tpT; stP = tpP
        }
      }
    }
    if (enT > stT) emit(enT, enP)
    out.iterator
  }
}
