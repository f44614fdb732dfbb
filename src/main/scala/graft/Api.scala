package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions}
import graft.market._

/** The user-facing API surface — one function per entry point of the
  * reference's R client (`R/obanalytics.R`: depth, spread, trades,
  * events, order_book, queues, depth_summary, trading.period,
  * trading.strategy, epsilon.drawupdowns, intervals, export, summary),
  * expressed over a level3 DataFrame instead of a DB connection. A user
  * of the reference can switch by loading their level3 lake and calling
  * the same-named operations.
  *
  * All timestamps are epoch microseconds (µs) — the reference's native
  * resolution; frequency resampling follows its right-closed convention
  * (`R/obanalytics.R:249-253`) via the grid operators.
  */
class GraftApi(spark: SparkSession, level3: DataFrame) {

  private lazy val l3e = Level3Source.level3WithEras(level3)

  /** Reference `get._validate_parameters` (`db/get_schema.sql:150-159`):
    * every windowed request is capped at one month + one minute — the
    * reference's only result-size guard. */
  private[graft] def validateWindow(start: Long, end: Long): Unit = {
    val max = GraftApi.MaximumPeriodMicros
    require(end - start <= max,
      s"[${start}, ${end}) exceeds the maximum request period of " +
        s"1 month 1 minute (${max} us)")
  }

  /** `obadiah::depth` — starting depth at `start` ∪ depth changes in
    * (start, end]. */
  def depth(start: Long, end: Long): DataFrame = {
    validateWindow(start, end)
    MarketOps.depthWindow(level3, spark, start, end)
  }

  /** [[depth]] at a coarser precision tier (`r0|p0..p4`) — the
    * reference's `get.depth` precision parameter
    * (`db/get_schema.sql:239-245`). */
  def depth(start: Long, end: Long, precision: String): DataFrame = {
    validateWindow(start, end)
    MarketOps.depthWindowAtPrecision(level3, spark, start, end, precision)
  }

  /** `_starting_depth` — the standing book at an instant (one row per
    * (pair, side, price)). */
  def startingDepth(atMicros: Long): DataFrame =
    MarketOps.startingDepth(level3, atMicros)

  /** The cacheable half of `get.depth`: depth changes in (start, end]
    * without the starting snapshot (see [[GraftApi.CachedClient]]). */
  private[graft] def depthChangesOnly(start: Long, end: Long): DataFrame = {
    validateWindow(start, end)
    MarketOps.depthChangesWindow(level3, spark, start, end)
  }

  /** `obadiah::spread` — L1 best bid/ask stream (deduplicated). */
  def spread(): DataFrame = MarketOps.spread(level3, spark)

  /** `obadiah::order.book` — snapshot with liquidity / bps / levels and
    * the reference's bps-range / min-bid / max-ask result filters. */
  def orderBook(atMicros: Long, maxLevels: Option[Int] = None,
      bpsRange: Option[Double] = None, minBid: Option[Double] = None,
      maxAsk: Option[Double] = None): DataFrame =
    MarketOps.orderBookQuery(level3, atMicros, maxLevels, bpsRange,
      minBid, maxAsk)

  /** `obanalytics.order_book` raw snapshot with the reference's full
    * parameter surface (`p_only_makers` / `p_before` /
    * `p_check_takers` / one-sided). */
  def orderBookRaw(atMicros: Long, onlyMakers: Boolean = false,
      before: Boolean = false, checkTakers: Boolean = false,
      side: Option[String] = None): DataFrame =
    MarketOps.orderBookAt(level3, atMicros, onlyMakers, before,
      checkTakers, side)

  /** `obadiah::events` — classified order events in a window.
    * `referenceParity` reproduces the reference's buy-side
    * aggressiveness denominator for differential testing.
    * `frequencyMicros` is the reference's `p_frequency` (`db/
    * get_schema.sql:307,339-341`): when set, the prevailing spread is
    * the grid-resampled L1 stream (right-closed buckets) rather than
    * every tick — the spread context a client plotting at that
    * frequency would see. */
  def events(start: Long, end: Long,
      referenceParity: Boolean = false,
      frequencyMicros: Option[Long] = None): DataFrame = {
    validateWindow(start, end)
    // level3 feeds BOTH the tick stream and the event classification —
    // one lazy checkpoint evaluates the builder chain once. Without it
    // a caller handing in an unmaterialized frame (the SQL TVF
    // expansion over a plain view) recomputes level3 twice: measured
    // +40% on the events row at sf0.1.
    val l3 = level3.localCheckpoint(false)
    val ticks = frequencyMicros match {
      case Some(f) => Resampling.spreadResampled(l3, spark, f)
      case None => MarketOps.spread(l3, spark)
    }
    EventsQuery.events(l3, ticks, start, end, referenceParity)
  }

  /** `obadiah::trades` — inferred/matched trades. */
  def trades(): DataFrame =
    TradeMatching.trades(TradeMatching.inferredMatches(level3))

  /** `get.available_exchanges` (`db/get_schema.sql:168-178`) — names
    * of exchanges with data. A distinct over two thin columns + a
    * broadcast dim join; the era window of the full `catalog` report
    * is not needed for any of the three lookups (min(era)/max(level3)
    * over the era table equal min/max(microtimestamp), since eras tile
    * the stream). */
  def availableExchanges(): DataFrame =
    level3.select(functions.col("exchange_id")).distinct()
      .join(functions.broadcast(Dimensions.exchangesDf(spark)),
        Seq("exchange_id"))
      .select(functions.col("exchange"))

  /** `get.available_pairs` (`db/get_schema.sql:183-192`) — names of
    * pairs with data on an exchange. */
  def availablePairs(exchangeId: Int): DataFrame =
    level3.filter(functions.col("exchange_id") === exchangeId)
      .select(functions.col("pair_id")).distinct()
      .join(functions.broadcast(
        Dimensions.pairsDf(spark).select("pair_id", "pair")), Seq("pair_id"))
      .select(functions.col("pair"))

  /** `get.available_period` (`db/get_schema.sql:197-209`) — (s, e)
    * covered period of a pair on an exchange: a min/max scan, no era
    * detection. */
  def availablePeriod(exchangeId: Int, pairId: Int): DataFrame =
    level3.filter(functions.col("exchange_id") === exchangeId &&
        functions.col("pair_id") === pairId)
      .agg(functions.min("microtimestamp").as("s"),
        functions.max("microtimestamp").as("e"))

  /** `obadiah::depth.summary` — bps-ladder depth at grid instants. */
  def depthSummary(instants: Seq[Long], bpsStep: Int = 25,
      maxBps: Int = 500): DataFrame =
    GridOps.depthSummary(level3, instants, bpsStep, maxBps)

  /** `obadiah::queues` — bucketed book queues at grid instants (ticks
    * anchored at the best opposite price, as the reference).
    * `scale = "ABSOLUTE" | "LOGRELATIVE"` selects the reference's two
    * tick-shape modes (`db/c/obadiah_db/obadiah_db.cpp:633-731`). */
  def queues(instants: Seq[Long], tickSize: Double = 5.0,
      nTicks: Int = 10, scale: String = "ABSOLUTE"): DataFrame =
    scale.toUpperCase match {
      case "ABSOLUTE" =>
        GridOps.queues(level3, instants, tickSize, nTicks = nTicks)
      case "LOGRELATIVE" =>
        GridOps.queuesLogRelative(level3, instants, tickSize, nTicks = nTicks)
      case other =>
        throw new IllegalArgumentException(
          s"scale must be ABSOLUTE or LOGRELATIVE, got $other")
    }

  /** `obadiah::queues` wide shape — `(ts, bid.price, ask.price, b[],
    * a[])` with dense per-bucket volume arrays (the SRF's result rows,
    * `db/c/obadiah_db/obadiah_db.cpp:717-726`). */
  def queuesWide(instants: Seq[Long], tickSize: Double = 5.0,
      nTicks: Int = 10): DataFrame = {
    val wide = GridOps.queuesWide(level3, instants, tickSize, nTicks)
    import org.apache.spark.sql.functions.{array, col}
    wide.select(col("pair_id"), col("ts"), col("bid_price"), col("ask_price"),
      array((1 to nTicks).map(k => col(s"bid_q$k")): _*).as("b"),
      array((1 to nTicks).map(k => col(s"ask_q$k")): _*).as("a"))
  }

  /** `obadiah::depth.resample` — depth on a coarser price/time grid. */
  def depthResample(instants: Seq[Long], tickSize: Double = 5.0): DataFrame =
    GridOps.depthResample(level3, instants, tickSize)

  /** `obadiah::trading.period` — effective buy/sell price for a volume;
    * `volumeUnits = 0` → best bid/ask, [[Replay.WholeBook]] → full-book
    * VWAP (the reference's `volume = 0` / `∞` modes,
    * `src/base.h:288-349`). */
  def tradingPeriod(volumeUnits: Long): DataFrame =
    MarketOps.tradingPeriod(level3, spark, volumeUnits)

  /** `obadiah::trading.strategy` — optimal positions under commission
    * `phi` and per-second interest `rho`. */
  def tradingStrategy(phi: Double, rho: Double): DataFrame =
    MarketOps.tradingStrategy(level3, spark, phi, rho)

  /** `obadiah::epsilon.drawupdowns` — ε-draw segmentation of mid-price. */
  def epsilonDrawUpDowns(epsilon: Double): DataFrame =
    MarketOps.epsilonDraws(level3, spark, epsilon)

  /** `obadiah::intervals` — green/red data-availability intervals;
    * `minDurationMicros` drops shorter ones (reference
    * `p_min_duration`). */
  def intervals(minDurationMicros: Long = 0L): DataFrame =
    Analytics.intervals(Level3Source.eras(level3), minDurationMicros)

  /** `obadiah::plotDataAvailability`'s data frame (the rendering
    * stays client-side): interval rects with dimension names, the
    * per-exchange facet rows and the label anchors. */
  def dataAvailabilityGrid(minDurationMicros: Long = 0L): DataFrame =
    Analytics.dataAvailabilityGrid(intervals(minDurationMicros), spark)

  /** `obadiah::plotPositionTrellis`'s data frame: each strategy
    * position's trading-period tick series inside the around-window,
    * log-relative by default, with the segment overlay columns. */
  def positionTrellis(phi: Double = 0.5, rho: Double = 1e-6,
      volumeUnits: Long = 50, logRelative: Boolean = true,
      aroundMicros: Long = 60000000L): DataFrame =
    Analytics.positionTrellis(
      tradingStrategy(phi, rho),
      tradingPeriod(volumeUnits).select(functions.col("pair_id"),
        functions.col("ts"),
        functions.col("sell_vwap").as("bid_price"),
        functions.col("buy_vwap").as("ask_price")),
      logRelative, aroundMicros)

  /** `obadiah::export` — flat CSV-shaped event projection. */
  def export(): DataFrame = Analytics.export(level3)

  /** `obanalytics.summary()` — per-era feed statistics. */
  def summary(): DataFrame = Analytics.summary(l3e)

  /** `obadiah::spread` instantaneous overload — best bid/ask at t. */
  def spreadAt(atMicros: Long): DataFrame =
    MarketOps.spreadAt(level3, atMicros)

  /** Frequency-resampled spread (right-closed grid). */
  def spreadResampled(freqMicros: Long): DataFrame =
    market.Resampling.spreadResampled(level3, spark, freqMicros)

  /** Era-reset spread: books rebuilt from empty at each era start. */
  def spreadByEra(): DataFrame =
    market.Resampling.spreadByEra(level3, spark)

  /** Snapshot reconciliation between two instants (created/deleted/
    * changed orders). */
  def bookDiff(ts1: Long, ts2: Long): DataFrame =
    MarketOps.bookDiff(level3, ts1, ts2)

  /** Per-side nested price ladders at an instant. */
  def orderBookLadders(atMicros: Long): DataFrame =
    Analytics.orderBookLadders(level3, atMicros)

  /** Catalog overview: covered period + counts per pair. */
  def dataOverview(): DataFrame = Analytics.dataOverview(level3)

  /** Crossed-book periods (data-quality view). */
  def crossedBooks(): DataFrame = GridOps.crossedBooks(spread())

  /** Crossed-book repair: synthetic deletions for eternal crossing
    * takers (correction stream). */
  def fixCrossedBooks(): DataFrame =
    GridOps.fixCrossedBooks(level3, spread())

  /** Invariant-violation report (`qty_level3_*` analogue). */
  def dataQuality(): DataFrame = GridOps.dqReport(level3)

  /** `get.depth_summary` with a frequency — the moving-aggregate form
    * (ladder at the last episode of each right-closed window). */
  def depthSummaryAtFreq(freqMicros: Long, bpsStep: Int = 25,
      maxBps: Int = 500): DataFrame =
    GridOps.depthSummaryAtFreq(level3, freqMicros, bpsStep, maxBps)

  /** `depth.changes` with chain ids and the prevailing pre-episode
    * quote. */
  def depthChanges(): DataFrame =
    MarketOps.depthChangeChains(level3, spark)

  /** `obanalytics.insert_level3_era` — immutable era split at a cut. */
  def insertEra(cutMicros: Long, pairId: Int): DataFrame =
    EraSurgery.insertEra(level3, cutMicros, pairId)

  /** `obanalytics.merge_crossed_books` — crossed runs collapsed into
    * single episodes (full merged level3). */
  def mergeCrossedBooks(): DataFrame =
    GridOps.mergeCrossedBooks(level3, spread())

  /** `bitfinex.match_price_and_sum_of_fill_exact` with the reference's
    * default group size 3 over the capped matchable set. */
  def matchSumOfThree(): DataFrame = TradeMatching.matchSumOfThree(level3)

  /** Bitstamp cleanse tier: episode reveal over the inferred matches. */
  def revealEpisodes(): DataFrame =
    BitstampOps.revealEpisodes(level3, TradeMatching.inferredMatches(level3))

  /** Bitstamp cleanse tier: aggressor-order repair to a fixpoint. */
  def fixAggressorOrder(): DataFrame =
    BitstampOps.fixAggressorOrderFixpoint(level3,
      TradeMatching.inferredMatches(level3))

  /** DQ fixes: duplicate-creation drop / eternal reconnect / premature
    * delete repair, as correction streams. */
  def fixDuplicates(): DataFrame = DqFixOps.fixDuplicates(level3)
  def fixEternals(): DataFrame = DqFixOps.fixEternals(level3)
  def fixPrematureDeletes(): DataFrame = DqFixOps.fixPrematureDeletes(level3)

  /** Client-side result cache over the windowed queries — the
    * reference's R-client interval cache (`R/cache.R`,
    * 15-min freshness bound at `R/obanalytics.R:220`). Results are
    * collected to the driver (they are client-facing and bounded by
    * [[validateWindow]]) and reused across overlapping windows; only
    * uncovered gaps re-run Spark jobs. */
  def cachedClient(clock: () => Long =
      () => System.currentTimeMillis() * 1000L): GraftApi.CachedClient =
    new GraftApi.CachedClient(this, clock)
}

object GraftApi {
  /** 1 month (31 days) + 1 minute, in µs — reference `MAXIMUM_PERIOD`
    * (`db/get_schema.sql:153`). */
  val MaximumPeriodMicros: Long = 31L * 86400 * 1000000 + 60L * 1000000

  /** Build the canonical level3 log from a raw order-event feed and wrap
    * it in the API (the ETL entry point — reference
    * `bitfinex.capture_transient_raw_book_events`). */
  def fromEvents(spark: SparkSession, events: DataFrame): GraftApi =
    new GraftApi(spark, Level3Source.level3(events))

  /** Wrap an existing level3 log (e.g. read from the parquet lake). */
  def apply(spark: SparkSession, level3: DataFrame): GraftApi =
    new GraftApi(spark, level3)

  /** Period-keyed client cache over `get.depth`, split the way the
    * reference's client splits it (`R/obanalytics.R:366-407`): the
    * depth-CHANGE stream is interval-composable and cached; the
    * starting snapshot at each request's `t0` is loaded per-request so
    * it never distorts the cache. (The events query is NOT cached —
    * its result embeds the starting book, which does not compose
    * across intervals; the reference's own TODO at
    * `R/obanalytics.R:623` records the same limitation.) */
  final class CachedClient(api: GraftApi, clock: () => Long) {
    import org.apache.spark.sql.Row

    // loader is half-open [s, e): shift the reference's (t0, t1]
    // replay convention by one µs tick
    private val changesCache = new IntervalCache[Row](
      (s, e) => api.depthChangesOnly(s - 1, e - 1).collect().toSeq,
      (r: Row) => r.getAs[Long](r.fieldIndex("ts")), clock)

    /** `get.depth`: starting book at `start` ∪ cached changes in
      * (start, end]. Validated HERE, not only inside the loader:
      * a cache-covered request must obey the same 1-month cap as the
      * uncached path (and a cold-cache violation would otherwise
      * surface with the loader's ±1 µs-shifted bounds). */
    def depth(start: Long, end: Long): Seq[Row] = {
      api.validateWindow(start, end)
      api.startingDepth(start).collect().toSeq ++
        changesCache.get(start + 1, end + 1)
    }

    def cachedPeriods: Seq[(Long, Long)] = changesCache.cachedPeriods
  }
}
