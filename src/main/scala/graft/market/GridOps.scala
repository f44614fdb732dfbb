package graft.market

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-grid operators: analytics evaluated at a fixed time grid by
  * joining the (tiny, broadcast) grid against level3 validity intervals —
  * the declarative counterpart of replaying to each instant (reference
  * frequency parameters, `db/get_schema.sql:60-87`,
  * `db/c/obadiah_db/episode.cpp:92-95`). The broadcast-nested-loop join
  * is O(|level3| × |grid|) with |grid| ≤ a few dozen — each scan row is
  * tested against the broadcast list, no shuffle.
  */
object GridOps {

  /** Book snapshots at each grid instant (adds column `g`). */
  def snapshots(level3: DataFrame, instants: Seq[Long]): DataFrame = {
    val spark = level3.sparkSession
    import spark.implicits._
    val grid = broadcast(instants.toDF("g"))
    level3.join(grid,
      col("microtimestamp") <= col("g") && col("next_microtimestamp") > col("g"))
  }

  /** Depth summary by bps ladder (reference `get.depth_summary`,
    * `db/obanalytics_schema.sql:567-728`): bucket each level by its bps
    * distance from the side's best, sum amounts per bucket, reprice the
    * bucket at best·(1∓bps/1e4). */
  def depthSummary(level3: DataFrame, instants: Seq[Long],
      bpsStep: Int = 25, maxBps: Int = 500): DataFrame = {
    val wBest = Window.partitionBy("pair_id", "g", "side")
    val best = when(col("side") === "b", max("price").over(wBest))
      .otherwise(min("price").over(wBest))
    snapshots(level3, instants)
      .withColumn("best", best)
      .withColumn("bps_level",
        ceil(abs(col("price") - col("best")) / col("best") * 10000 / bpsStep) * bpsStep)
      .filter(col("bps_level") <= maxBps)
      .groupBy(col("pair_id"), col("g").as("ts"), col("side"),
        col("bps_level"), col("best"))
      .agg(sum("amount").as("volume"))
      .withColumn("bps_price",
        when(col("side") === "b",
          col("best") * (lit(1.0) - col("bps_level") / 10000.0))
          .otherwise(col("best") * (lit(1.0) + col("bps_level") / 10000.0)))
      .drop("best")
  }

  /** Snapshot rows annotated with tick buckets anchored at the best
    * *opposite* price (reference `get.queues` kernel,
    * `src/order_book_investigation.h:33-225`, SRF
    * `db/c/obadiah_db/obadiah_db.cpp:633-731`): bid boundaries step down
    * from `AlignUp(best_ask)` (bucket k holds bids in
    * `[B − k·t, B − (k−1)·t)`), ask boundaries step up from
    * `AlignDown(best_bid)` — so the two ladders tile the price axis from
    * the crossing point outward, the reference's parity-defining
    * convention. Sides with an empty opposite book get no buckets
    * (reference anchors at ±∞). */
  private def bucketed(level3: DataFrame, instants: Seq[Long],
      bidTick: Column => Column, askTick: Column => Column): DataFrame = {
    val wInst = Window.partitionBy("pair_id", "g")
    snapshots(level3, instants)
      .withColumn("best_bid", max(when(col("side") === "b", col("price"))).over(wInst))
      .withColumn("best_ask", min(when(col("side") === "s", col("price"))).over(wInst))
      .withColumn("tick",
        when(col("side") === "b", bidTick(col("best_ask")))
          .otherwise(askTick(col("best_bid"))))
      .filter(col("tick").isNotNull)
  }

  /** Order-book queues, long form: per instant, volumes in `nTicks`
    * buckets of width `tickSize`, 1-based ticks anchored at the best
    * opposite price; only touched buckets are emitted (the wide form
    * below is dense). */
  def queues(level3: DataFrame, instants: Seq[Long],
      tickSize: Double = 5.0, firstTick: Int = 1, nTicks: Int = 10): DataFrame =
    bucketed(level3, instants,
      bestAsk => ceil((ceil(bestAsk / tickSize) * tickSize - col("price")) / tickSize),
      bestBid => ceil((col("price") - floor(bestBid / tickSize) * tickSize) / tickSize))
      .filter(col("tick") >= firstTick && col("tick") < firstTick + nTicks)
      .groupBy(col("pair_id"), col("g").as("ts"), col("side"), col("tick"))
      .agg(sum("amount").as("volume"))

  /** Log-relative order-book queues (reference `'LOGRELATIVE'` ticks):
    * boundaries on the log-price grid, anchored at the best opposite. */
  def queuesLogRelative(level3: DataFrame, instants: Seq[Long],
      logTick: Double = 0.05, firstTick: Int = 1, nTicks: Int = 10): DataFrame =
    bucketed(level3, instants,
      bestAsk => ceil((ceil(log(bestAsk) / logTick) * logTick - log(col("price"))) / logTick),
      bestBid => ceil((log(col("price")) - floor(log(bestBid) / logTick) * logTick) / logTick))
      .filter(col("tick") >= firstTick && col("tick") < firstTick + nTicks)
      .groupBy(col("pair_id"), col("g").as("ts"), col("side"), col("tick"))
      .agg(sum("amount").as("volume"))

  /** Order-book queues, wide form — the SRF's result shape
    * (`ts, bid.price, ask.price, b[], a[]`,
    * `db/c/obadiah_db/obadiah_db.cpp:717-726`): one row per (pair,
    * instant) with tick-aligned best prices and dense per-bucket volume
    * columns (zeros for untouched buckets; `GraftApi.queuesWide` folds
    * them into the `b[]`/`a[]` arrays). */
  def queuesWide(level3: DataFrame, instants: Seq[Long],
      tickSize: Double = 5.0, nTicks: Int = 10): DataFrame = {
    val base = bucketed(level3, instants,
      bestAsk => ceil((ceil(bestAsk / tickSize) * tickSize - col("price")) / tickSize),
      bestBid => ceil((col("price") - floor(bestBid / tickSize) * tickSize) / tickSize))
    val volCols = for (side <- Seq("b", "s"); k <- 1 to nTicks) yield
      coalesce(sum(when(col("side") === side && col("tick") === k,
        col("amount"))), lit(0.0))
        .as(s"${if (side == "b") "bid" else "ask"}_q$k")
    base
      .groupBy(col("pair_id"), col("g").as("ts"))
      .agg(
        (floor(max(when(col("side") === "b", col("price"))) / tickSize) * tickSize)
          .as("bid_price"),
        (ceil(min(when(col("side") === "s", col("price"))) / tickSize) * tickSize)
          .as("ask_price")
          +: volCols: _*)
  }

  /** Depth resample (reference `depth.resample`,
    * `src/order_book_investigation.h:357-466`): depth re-gridded to
    * coarser price ticks at each time-grid instant. */
  def depthResample(level3: DataFrame, instants: Seq[Long],
      tickSize: Double = 5.0): DataFrame =
    snapshots(level3, instants)
      .withColumn("price_bucket", floor(col("price") / tickSize) * tickSize)
      .groupBy(col("pair_id"), col("g").as("ts"), col("side"),
        col("price_bucket"))
      .agg(sum("amount").as("volume"))

  /** Depth summary as a *moving aggregate at frequency* (reference
    * `get.depth_summary(start, end, freq)` applies its custom moving
    * aggregate over every episode and samples per window,
    * `db/get_schema.sql:281-298`): the value at grid instant g is the
    * bps-ladder of the book standing at the last episode in the
    * right-closed window (g − freq, g] — data-driven instants, not a
    * fixed grid. Sampling instants are found per (pair, window) and the
    * ladder is evaluated by validity-interval snapshot, so the whole
    * operator is declarative (broadcast of the tiny instants set). */
  def depthSummaryAtFreq(level3: DataFrame, freqMicros: Long,
      bpsStep: Int = 25, maxBps: Int = 500): DataFrame = {
    val chosen = level3
      .select(col("pair_id").as("g_pair"), col("microtimestamp").as("ets"))
      .distinct()
      .withColumn("g",
        expr(s"((ets + ${freqMicros - 1}) div $freqMicros) * $freqMicros"))
      .groupBy("g_pair", "g")
      .agg(max("ets").as("sample_ts"))
    val snap = level3.join(broadcast(chosen),
      col("pair_id") === col("g_pair") &&
        col("microtimestamp") <= col("sample_ts") &&
        col("next_microtimestamp") > col("sample_ts"))
    val wBest = Window.partitionBy("pair_id", "g", "side")
    val best = when(col("side") === "b", max("price").over(wBest))
      .otherwise(min("price").over(wBest))
    snap
      .withColumn("best", best)
      .withColumn("bps_level",
        ceil(abs(col("price") - col("best")) / col("best") * 10000 / bpsStep) * bpsStep)
      .filter(col("bps_level") <= maxBps)
      .groupBy(col("pair_id"), col("g").as("ts"), col("side"),
        col("bps_level"), col("best"))
      .agg(sum("amount").as("volume"))
      .withColumn("bps_price",
        when(col("side") === "b",
          col("best") * (lit(1.0) - col("bps_level") / 10000.0))
          .otherwise(col("best") * (lit(1.0) + col("bps_level") / 10000.0)))
      .drop("best")
  }

  /** Wide (pivoted) depth summary — the R client's final shape
    * (`bid.vol25bps … ask.vol500bps`, `R/obanalytics.R:410-427`): one
    * row per (pair, instant), one column per side×bps bucket. */
  def depthSummaryWide(level3: DataFrame, instants: Seq[Long],
      bpsStep: Int = 25, maxBps: Int = 500): DataFrame = {
    val long = depthSummary(level3, instants, bpsStep, maxBps)
    val buckets = (0 to maxBps by bpsStep)
    val cols = for (side <- Seq("b", "s"); b <- buckets) yield
      sum(when(col("side") === side && col("bps_level") === b,
        col("volume")))
        .as(s"${if (side == "b") "bid" else "ask"}_vol${b}bps")
    long.groupBy("pair_id", "ts").agg(cols.head, cols.tail: _*)
  }

  /** Wide pivot of [[depthSummaryAtFreq]] — the R client's bps-column
    * shape over the moving (data-driven-instant) form. */
  def depthSummaryAtFreqWide(level3: DataFrame, freqMicros: Long,
      bpsStep: Int = 25, maxBps: Int = 500): DataFrame = {
    val long = depthSummaryAtFreq(level3, freqMicros, bpsStep, maxBps)
    val buckets = (0 to maxBps by bpsStep)
    val cols = for (side <- Seq("b", "s"); b <- buckets) yield
      sum(when(col("side") === side && col("bps_level") === b,
        col("volume")))
        .as(s"${if (side == "b") "bid" else "ask"}_vol${b}bps")
    long.groupBy("pair_id", "ts").agg(cols.head, cols.tail: _*)
  }

  /** Crossed-book periods (reference `obanalytics.crossed_books`,
    * `db/obanalytics_schema.sql:1183-1216`): gaps-and-islands over the
    * L1 stream where best_bid ≥ best_ask. */
  def crossedBooks(spread: DataFrame): DataFrame = {
    val w = Window.partitionBy("pair_id").orderBy("ts")
    val crossed = (col("bid_price").isNotNull && col("ask_price").isNotNull &&
      col("bid_price") >= col("ask_price")).cast("int")
    spread
      .withColumn("c", crossed)
      .withColumn("chg",
        when(lag("c", 1).over(w).isNull || col("c") =!= lag("c", 1).over(w), 1)
          .otherwise(0))
      .withColumn("grp", sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("c") === 1)
      .groupBy("pair_id", "grp")
      .agg(min("ts").as("period_start"), max("ts").as("period_end"),
        count(lit(1)).as("n_ticks"))
      .drop("grp")
  }

  /** Crossed-book repair (reference `obanalytics.fix_crossed_books`,
    * `db/obanalytics_schema.sql:1301-1417`): find "eternal takers" —
    * orders whose final event rests forever (next = ALIVE sentinel) but
    * whose price crossed the prevailing opposite best when it arrived —
    * and emit the synthetic deletion events that would repair the book.
    * Immutable-lake form of the reference's targeted rewrite: the
    * output is a correction stream to union with level3. */
  def fixCrossedBooks(level3: DataFrame, spreadTicks: DataFrame): DataFrame = {
    val eternal = level3
      .filter(col("next_microtimestamp") === Level3Source.AliveMicros)
      .select(col("pair_id").cast("long").as("pair_id"),
        col("microtimestamp").as("ts"), lit(0).as("kind"),
        col("order_id"), col("side"), col("price"), col("amount"))
    val tickCols = spreadTicks.select(
      col("pair_id").cast("long").as("pair_id"), col("ts"), lit(1).as("kind"),
      lit(null).cast("long").as("order_id"),
      lit(null).cast("string").as("side"),
      lit(null).cast("double").as("price"),
      lit(null).cast("double").as("amount"),
      col("bid_price").as("tick_bid"), col("ask_price").as("tick_ask"))
    // slice-parallel as-of (see AsofSlicing): same result as one
    // whole-pair window, no single-task-per-pair sort
    AsofSlicing.carry(
        eternal
          .withColumn("tick_bid", lit(null).cast("double"))
          .withColumn("tick_ask", lit(null).cast("double"))
          .unionByName(tickCols),
        Seq("tick_bid", "tick_ask"))
      .withColumn("bb", col("tick_bid_asof"))
      .withColumn("ba", col("tick_ask_asof"))
      .filter(col("kind") === 0)
      .filter(
        when(col("side") === "b", col("price") >= coalesce(col("ba"), col("price") + 1))
          .otherwise(col("price") <= coalesce(col("bb"), col("price") - 1)))
      .select(col("pair_id"), col("order_id"), col("side"), col("price"),
        col("amount"), col("ts").as("entered_at"),
        lit("crossed-eternal-taker").as("reason"))
  }

  /** Episode merge (reference `obanalytics.merge_episodes`,
    * `db/obanalytics_schema.sql:1959-2026`, applied per crossed period
    * as `merge_crossed_books`, `:1921-1943`): every event inside a
    * crossed window [first_crossed, next_uncrossed) moves to the
    * window's end — except orders that die and resurrect inside the
    * window, whose pre-death events collapse at the death instant —
    * and forward pointers clamp accordingly, so the whole crossed run
    * becomes one (uncrossed) episode. Immutable form: returns the full
    * merged level3. Crossed runs with no subsequent uncrossed tick are
    * left untouched (the reference raises there). */
  def mergeCrossedBooks(level3: DataFrame, spreadTicks: DataFrame): DataFrame = {
    val Alive = Level3Source.AliveMicros
    // The L1 stream feeds both the period detector and the next-tick
    // lookup; one lazy evaluation (it is a replay-kernel output).
    val l1 = spreadTicks.localCheckpoint(false)
    // next uncrossed tick after each crossed period
    val periods = crossedBooks(l1)
      .select(col("pair_id").cast("int").as("w_pair"), col("period_start"),
        col("period_end"))
    val ticks = l1.select(col("pair_id").cast("int").as("t_pair"),
      col("ts").as("t_ts"))
    val windows = periods.join(ticks,
      col("w_pair") === col("t_pair") && col("t_ts") > col("period_end"))
      .groupBy("w_pair", "period_start", "period_end")
      .agg(min("t_ts").as("w_end"))
    val tagged = level3.join(broadcast(windows),
      col("pair_id") === col("w_pair") &&
        col("microtimestamp") >= col("period_start") &&
        col("microtimestamp") < col("w_end"), "left")
    // Single pass over the tagged stream: untagged rows (w_end null) keep
    // their values, so no filter/filter/union — that shape evaluates the
    // level3 sub-plan twice. Untagged rows fall into the null-period_start
    // window partition; their window values are computed but unused.
    // running-from-behind earliest death per (order, window); RANGE
    // frame keeps ties deterministic
    val wBack = Window.partitionBy("pair_id", "order_id", "period_start")
      .orderBy(col("microtimestamp").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wOrd = Window.partitionBy("pair_id", "order_id", "period_start")
    tagged
      .withColumn("next_death",
        min(when(col("is_deleted"), col("microtimestamp"))).over(wBack))
      .withColumn("last_seen", max("microtimestamp").over(wOrd))
      .withColumn("new_micro",
        when(col("w_end").isNull, col("microtimestamp"))
          .when(col("next_death").isNotNull && col("next_death") < col("w_end") &&
            col("next_death") < col("last_seen"), col("next_death"))
          .otherwise(col("w_end")))
      .withColumn("new_next",
        when(col("w_end").isNull, col("next_microtimestamp"))
          .when(col("is_deleted"), col("new_micro"))
          .when(col("next_death").isNotNull &&
            col("next_microtimestamp") <= col("next_death") &&
            col("next_microtimestamp") =!= Alive &&
            col("next_death") < col("last_seen"), col("next_death"))
          .when(col("next_microtimestamp") < col("w_end"), col("w_end"))
          .otherwise(col("next_microtimestamp")))
      .withColumn("microtimestamp", col("new_micro"))
      .withColumn("next_microtimestamp", col("new_next"))
      .select(level3.columns.map(col).toIndexedSeq: _*)
  }

  /** Data-quality report (reference `qty_level3_*` checks,
    * `db/obanalytics_schema.sql:2157-2429`, and the table constraints
    * `:146-151`): invariant-violation counts per pair. */
  def dqReport(level3: DataFrame): DataFrame = {
    val base = level3.groupBy("pair_id").agg(
      count(lit(1)).as("n_events"),
      count(when(col("amount") < 0, 1)).as("n_negative_amount"),
      count(when(col("fill") < 0, 1)).as("n_negative_fill"),
      count(when(col("next_microtimestamp") < col("microtimestamp"), 1))
        .as("n_time_travel"))
    val chains = level3.groupBy("pair_id", "order_id")
      .agg((max("event_no") =!= count(lit(1))).cast("int").as("bad"))
      .groupBy("pair_id")
      .agg(sum("bad").as("n_broken_chains"),
        count(lit(1)).as("n_orders"))
    base.join(chains, Seq("pair_id"))
  }
}
