package graft

import graft.sequential.{EpsilonDrawsOp, Quote, TradingStrategyOp}

/** Micro-probe for the sequential state machines: the (pair, era) task
  * is bounded by single-core throughput, so measure exactly that —
  * ticks/sec of `TradingStrategyOp.positions` and
  * `EpsilonDrawsOp.draws` over a deterministic synthetic quote path
  * (integer LCG random walk; no RNG, reproducible anywhere). The
  * number feeds the era-length bound recorded in docs/PLANS.md.
  *
  * `java ... graft.SequentialProbe [nTicks]` → one JSON line.
  */
object SequentialProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000000

    // deterministic mid-price walk, ±1 cent steps, spread 2 cents
    def quotes: Iterator[Quote] = new Iterator[Quote] {
      private var i = 0
      private var seed = 42L
      private var mid = 10000L // cents
      def hasNext: Boolean = i < n
      def next(): Quote = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        mid += (if ((seed >>> 33) % 2 == 0) 1 else -1)
        i += 1
        Quote(1, i.toLong * 1000L,
          Some((mid - 1) / 100.0), Some((mid + 1) / 100.0))
      }
    }

    def timed(f: => Long): (Long, Double) = {
      val t = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t) / 1e9)
    }

    // warmup absorbs JIT
    TradingStrategyOp.positions(1, quotes.take(2000000), 0.001, 0.0).length

    val (nPos, tStrat) = timed(
      TradingStrategyOp.positions(1, quotes, 0.001, 0.0).length.toLong)
    val (nDraws, tEps) = timed(
      EpsilonDrawsOp.draws(1,
        quotes.map(q => (q.ts, (q.bid.get + q.ask.get) / 2)), 0.05).length.toLong)

    println(f"""{"ticks":$n,"strategy":{"positions":$nPos,"seconds":$tStrat%.2f,"ticks_per_sec":${(n / tStrat).toLong}},"eps_draws":{"draws":$nDraws,"seconds":$tEps%.2f,"ticks_per_sec":${(n / tEps).toLong}}}""")
  }
}
