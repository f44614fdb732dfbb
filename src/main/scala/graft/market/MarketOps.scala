package graft.market

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-facing market-data operators over a level3 DataFrame (as
  * produced by [[Level3Source.level3]]).
  *
  * Two implementation styles, mirroring the reference's fast/slow twins
  * (C engine vs SQL, `db/obanalytics_schema.sql:1225-1267`):
  *   - *kernel* ops: `groupByKey(pair).flatMapSortedGroups` streaming the
  *     sorted event iterator through [[Replay]] — scales as one
  *     sequential pass per pair per executor core, state O(book);
  *   - *expression* ops: pure Catalyst (windows/joins) where the
  *     validity-interval encoding makes the answer declarative.
  */
object MarketOps {

  private def bookEvents(level3: DataFrame, spark: SparkSession)
      : Dataset[BookEvent] = {
    import spark.implicits._
    level3.select(
      col("pair_id").as("pairId"),
      col("microtimestamp").as("ts"),
      col("order_id").as("orderId"),
      col("side"),
      col("price"),
      col("amount"),
      col("is_deleted").as("isDeleted"),
      col("event_id")) // extra sort key for deterministic within-ts order
      .as[BookEvent]
  }

  /** Level-1 spread stream: (pair_id, ts, bid/ask price+qty), one row per
    * episode where the quote changed (reference: `spread_by_episode_fast`,
    * `db/c/obadiah_db/obadiah_db.cpp:270-363`). */
  def spread(level3: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    bookEvents(level3, spark)
      .groupByKey(_.pairId)
      .flatMapSortedGroups($"ts", $"event_id")((pair, it) => Replay.l1(pair, it))
      .toDF()
  }

  /** Level-2 depth-change stream (reference:
    * `depth_change_by_episode_fast`, `db/c/obadiah_db/obadiah_db.cpp:171-268`). */
  def depthChanges(level3: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    bookEvents(level3, spark)
      .groupByKey(_.pairId)
      .flatMapSortedGroups($"ts", $"event_id")((pair, it) => Replay.l2(pair, it))
      .toDF()
  }

  /** Effective-price (trading period) stream for a fixed volume —
    * kernel walk per episode (reference `get.trading_period`). */
  def tradingPeriod(level3: DataFrame, spark: SparkSession,
      volumeUnits: Long): DataFrame = {
    import spark.implicits._
    bookEvents(level3, spark)
      .groupByKey(_.pairId)
      .flatMapSortedGroups($"ts", $"event_id")((pair, it) =>
        Replay.tradingPeriod(pair, it, volumeUnits))
      .toDF()
  }

  /** Optimal-strategy positions over the L1 stream (reference
    * `get.trading_strategy` / `src/position_discovery.cpp`). */
  def tradingStrategy(level3: DataFrame, spark: SparkSession,
      phi: Double, rho: Double): DataFrame = {
    import spark.implicits._
    spread(level3, spark)
      .select(col("pair_id"), col("ts"),
        col("bid_price").as("bid"), col("ask_price").as("ask"))
      .as[graft.sequential.Quote]
      .groupByKey(_.pair_id)
      .flatMapSortedGroups($"ts")((pair, it) =>
        graft.sequential.TradingStrategyOp.positions(pair, it, phi, rho))
      .toDF()
  }

  /** ε-drawup/drawdown segmentation of the mid-price path (reference
    * `src/epsilon_drawupdowns.cpp`). One-sided and crossed quotes are
    * skipped before segmentation. */
  def epsilonDraws(level3: DataFrame, spark: SparkSession,
      epsilon: Double): DataFrame = {
    import spark.implicits._
    spread(level3, spark)
      .filter(col("bid_price").isNotNull && col("ask_price").isNotNull &&
        col("bid_price") <= col("ask_price"))
      .select(col("pair_id"), col("ts"),
        ((col("bid_price") + col("ask_price")) / 2.0).as("mid"))
      .as[(Int, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts")((pair, it) =>
        graft.sequential.EpsilonDrawsOp.draws(pair, it.map(r => (r._2, r._3)), epsilon))
      .toDF()
  }

  /** Windowed depth API in one kernel pass: starting book at t0 +
    * changes in (t0, t1] (reference `get.depth` / `level2_continuous`). */
  def depthWindow(level3: DataFrame, spark: SparkSession,
      t0: Long, t1: Long): DataFrame = {
    import spark.implicits._
    bookEvents(level3, spark)
      .groupByKey(_.pairId)
      .flatMapSortedGroups($"ts", $"event_id")((pair, it) =>
        Replay.depthWindow(pair, it, t0, t1))
      .toDF()
      .select(col("pair_id").cast("long").as("pair_id"), col("ts"),
        when(col("side") === "b", "bid").otherwise("ask").as("side"),
        col("price"), col("volume"))
  }

  /** Declarative depth-change twin: unpivot each level3 row into a
    * (+amount at start, −amount at end) pair and take a running sum per
    * (pair, side, price) — the validity-interval formulation of the same
    * quantity, all stock Catalyst (used for differential testing and as
    * the shuffle-friendly path when only a few price levels matter). */
  def depthChangesSql(level3: DataFrame): DataFrame = {
    // A deleted event's empty interval contributes +a and −a at the same
    // (price, ts) and cancels in the per-ts grouping below.
    val start = level3
      .select(col("pair_id"), col("microtimestamp").as("ts"), col("side"),
        col("price"), col("amount").as("delta"))
    val end = level3
      .select(col("pair_id"), col("next_microtimestamp").as("ts"), col("side"),
        col("price"), (-col("amount")).as("delta"))
      .filter(col("ts") < Level3Source.AliveMicros)
    val deltas = start.unionByName(end)
      .filter(col("delta") =!= 0)
      .groupBy("pair_id", "side", "price", "ts")
      .agg(sum("delta").as("delta"))
      .filter(col("delta") =!= 0)
    val w = Window.partitionBy("pair_id", "side", "price").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas
      .withColumn("volume", sum("delta").over(w))
      .select("pair_id", "ts", "side", "price", "volume")
  }

  /** Instantaneous spread at an instant (reference `get.spread`'s
    * second overload over `_starting_depth`, `db/get_schema.sql:645-682`):
    * best bid/ask price and the total quantity resting at each. */
  def spreadAt(level3: DataFrame, tsMicros: Long): DataFrame = {
    val snap = level3
      .filter(col("microtimestamp") <= tsMicros &&
        col("next_microtimestamp") > tsMicros)
      .groupBy("pair_id", "side", "price")
      .agg(sum("amount").as("qty"))
    val w = Window.partitionBy("pair_id", "side")
      .orderBy(when(col("side") === "b", -col("price")).otherwise(col("price")))
    snap
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("pair_id")
      .agg(
        max(when(col("side") === "b", col("price"))).as("bid_price"),
        max(when(col("side") === "b", col("qty"))).as("bid_qty"),
        max(when(col("side") === "s", col("price"))).as("ask_price"),
        max(when(col("side") === "s", col("qty"))).as("ask_qty"))
      .withColumn("ts", lit(tsMicros))
  }

  /** Diff of the books standing at two instants: synthetic
    * created/deleted/changed rows per order (reference
    * `bitfinex._diff_order_books` — channel-reconnect reconciliation,
    * `db/bitfinex_schema.sql:83-125`). A full-outer join on
    * (pair, order_id) of the two snapshots. */
  def bookDiff(level3: DataFrame, ts1: Long, ts2: Long): DataFrame = {
    // One scan, no join: an order's validity intervals are disjoint, so
    // at most one row is live at each instant — conditional aggregation
    // per order reconstructs both snapshot states (the semantic
    // equivalent of the reference's full-outer snapshot join, at half
    // the scan cost and zero join shuffle width).
    val live1 = col("microtimestamp") <= ts1 && col("next_microtimestamp") > ts1
    val live2 = col("microtimestamp") <= ts2 && col("next_microtimestamp") > ts2
    level3
      .filter(live1 || live2)
      .select(col("pair_id"), col("order_id"), col("side"), col("price"),
        col("amount"), live1.as("l1"), live2.as("l2"))
      .groupBy("pair_id", "order_id")
      .agg(
        max(when(col("l1"), col("side"))).as("a_side"),
        max(when(col("l1"), col("price"))).as("a_price"),
        max(when(col("l1"), col("amount"))).as("a_amount"),
        max(when(col("l2"), col("side"))).as("b_side"),
        max(when(col("l2"), col("price"))).as("b_price"),
        max(when(col("l2"), col("amount"))).as("b_amount"))
      .select(col("pair_id"), col("order_id"),
        coalesce(col("b_side"), col("a_side")).as("side"),
        col("a_price"), col("a_amount"), col("b_price"), col("b_amount"),
        when(col("a_side").isNull, "created")
          .when(col("b_side").isNull, "deleted")
          .when(col("a_price") =!= col("b_price") ||
            col("a_amount") =!= col("b_amount"), "changed")
          .otherwise("unchanged").as("change"))
      .filter(col("change") =!= "unchanged")
  }

  /** Order-book snapshot at time `ts` (µs): all orders whose validity
    * interval covers ts (reference: `obanalytics.order_book`,
    * `db/obanalytics_schema.sql:2035-2075`). Pure filter — Catalyst
    * pushes `microtimestamp <= ts` into the parquet scan. */
  def orderBookAt(level3: DataFrame, tsMicros: Long): DataFrame =
    level3
      .filter(col("microtimestamp") <= tsMicros &&
        col("next_microtimestamp") > tsMicros)
      .withColumn("is_maker", makerFlag)
      .withColumn("is_crossed", crossedFlag)

  /** is_maker: the order's price does not cross the best opposite price
    * among orders priced earlier (running conditional extremes over
    * price-time order — reference `db/obanalytics_schema.sql:2043-2053`). */
  private def makerFlag = {
    val w = Window.partitionBy("pair_id")
      .orderBy("price_microtimestamp", "microtimestamp", "order_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val minAsk = min(when(col("side") === "s", col("price"))).over(w)
    val maxBid = max(when(col("side") === "b", col("price"))).over(w)
    when(col("side") === "b", col("price") < coalesce(minAsk, lit(Double.MaxValue)))
      .otherwise(col("price") > coalesce(maxBid, lit(Double.MinValue)))
  }

  private def crossedFlag = {
    val w = Window.partitionBy("pair_id")
      .orderBy(col("price_microtimestamp").desc, col("microtimestamp").desc,
        col("order_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val minAsk = min(when(col("side") === "s", col("price"))).over(w)
    val maxBid = max(when(col("side") === "b", col("price"))).over(w)
    when(col("side") === "b", col("price") >= coalesce(minAsk, lit(Double.MaxValue)))
      .otherwise(col("price") <= coalesce(maxBid, lit(Double.MinValue)))
  }

  /** API-level snapshot (reference `get.order_book`,
    * `db/get_schema.sql:561-603`): per-side cumulative liquidity, bps
    * distance from best, dense-ranked price levels. */
  def orderBookQuery(level3: DataFrame, tsMicros: Long,
      maxLevels: Option[Int] = None): DataFrame = {
    val snap = level3
      .filter(col("microtimestamp") <= tsMicros &&
        col("next_microtimestamp") > tsMicros)
    val sideOrd = when(col("side") === "b", -col("price")).otherwise(col("price"))
    val wCum = Window.partitionBy("pair_id", "side")
      .orderBy(sideOrd, col("microtimestamp"), col("order_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wLvl = Window.partitionBy("pair_id", "side").orderBy(sideOrd)
    val wBest = Window.partitionBy("pair_id", "side")
    val best = when(col("side") === "b", max(col("price")).over(wBest))
      .otherwise(min(col("price")).over(wBest))
    val out = snap
      .withColumn("liquidity", sum("amount").over(wCum))
      .withColumn("lvl", dense_rank().over(wLvl))
      .withColumn("bps",
        abs(col("price") - best) / best * 10000.0)
    maxLevels.fold(out)(n => out.filter(col("lvl") <= n))
  }
}
