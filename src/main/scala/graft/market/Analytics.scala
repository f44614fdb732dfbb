package graft.market

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** API-level analytics over the level3 log: per-era summary, data
  * availability intervals, CSV export projection, and the windowed
  * depth (starting depth ∪ changes) — reference `obanalytics.summary`
  * (`db/obanalytics_schema.sql:2510-2583`), `get.events_intervals`
  * (`db/get_schema.sql:462-503`), `get.export` (`db/get_schema.sql:520-552`),
  * `get.depth` (`db/get_schema.sql:239-269`).
  */
object Analytics {

  /** Per-(pair, era) feed statistics: filtered counts + event rate. */
  def summary(level3WithEras: DataFrame): DataFrame =
    level3WithEras
      .groupBy(col("pair_id"), col("era"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("order_id")).as("n_orders"),
        count(when(col("event_no") === 1 && !col("is_deleted"), 1))
          .as("n_created"),
        count(when(col("is_deleted"), 1)).as("n_deleted"),
        count(when(col("fill") > 0, 1)).as("n_fills"),
        min("microtimestamp").as("first_event"),
        max("microtimestamp").as("last_event"))
      .withColumn("e_per_sec",
        when(col("last_event") > col("first_event"),
          col("n_events") / ((col("last_event") - col("first_event")) / lit(1000000.0))))

  /** Event-side summary joined with per-era trade-side metrics
    * (reference `obanalytics.summary`'s `trades` CTE,
    * `db/obanalytics_schema.sql:2556-2578`): trade count, first/last
    * trade, trades/sec, `t_matched` (a trade linked to at least one
    * order event) and `t_exchange` (a trade carrying the exchange's own
    * trade id — inferred matches carry none, exchange-reported feeds
    * do). Trades are assigned to eras by time range; the era table is
    * one row per (pair, era) → broadcast range join, no shuffle of the
    * matches stream beyond the final (pair, era) aggregation. */
  def summaryWithTrades(level3WithEras: DataFrame,
      matches: DataFrame): DataFrame = {
    val m =
      if (matches.columns.contains("exchange_trade_id")) matches
      else matches.withColumn("exchange_trade_id", lit(null).cast("long"))
    val wEra = Window.partitionBy("pair_id").orderBy("era")
    val eras = level3WithEras.select("pair_id", "era").distinct()
      .withColumn("next_era",
        coalesce(lead("era", 1).over(wEra), lit(Long.MaxValue)))
      .select(col("pair_id").as("e_pair"), col("era"), col("next_era"))
    val tradeSide = m
      .join(broadcast(eras),
        col("pair_id") === col("e_pair") &&
          col("microtimestamp") >= col("era") &&
          col("microtimestamp") < col("next_era"))
      .groupBy(col("pair_id"), col("era"))
      .agg(
        min("microtimestamp").as("t_first"),
        max("microtimestamp").as("t_last"),
        count(lit(1)).as("t_total"),
        count(when(col("buy_order_id").isNotNull ||
          col("sell_order_id").isNotNull, 1)).as("t_matched"),
        count(col("exchange_trade_id")).as("t_exchange"))
      .withColumn("t_per_sec",
        when(col("t_last") > col("t_first"),
          col("t_total") / ((col("t_last") - col("t_first")) / lit(1000000.0))))
    summary(level3WithEras)
      .join(tradeSide, Seq("pair_id", "era"), "left")
      .withColumn("t_total", coalesce(col("t_total"), lit(0L)))
      .withColumn("t_matched", coalesce(col("t_matched"), lit(0L)))
      .withColumn("t_exchange", coalesce(col("t_exchange"), lit(0L)))
  }

  /** Catalog overview (reference `get.data_overview` /
    * `available_pairs/period`, `db/get_schema.sql:168-233`): per pair,
    * the covered period and basic counts. */
  def dataOverview(level3: DataFrame): DataFrame =
    level3.groupBy("pair_id")
      .agg(
        min("microtimestamp").as("first_event"),
        max("microtimestamp").as("last_event"),
        count(lit(1)).as("n_events"),
        countDistinct("order_id").as("n_orders"),
        countDistinct("price").as("n_price_levels"))

  /** Catalog lookups (reference `get.available_exchanges` /
    * `available_pairs` / `available_period`,
    * `db/get_schema.sql:168-209`) combined: one row per
    * (exchange, pair) present in the data, with the dimension names and
    * the covered period (min era start, max era high-watermark — which
    * equal the min/max event timestamps since eras tile the stream).
    * The three reference functions are projections of this; the
    * dimension joins are broadcast (the dims are seeded constants). */
  def catalog(level3: DataFrame, spark: SparkSession): DataFrame =
    Level3Source.level3WithEras(level3)
      .groupBy("exchange_id", "pair_id")
      .agg(
        countDistinct("era_no").as("n_eras"),
        min("microtimestamp").as("period_start"),
        max("microtimestamp").as("period_end"))
      .join(broadcast(Dimensions.exchangesDf(spark)),
        Seq("exchange_id"), "left")
      .join(broadcast(Dimensions.pairsDf(spark).select("pair_id", "pair")),
        Seq("pair_id"), "left")
      .select(col("exchange"), col("exchange_id"), col("pair"),
        col("pair_id"), col("n_eras"), col("period_start"),
        col("period_end"))

  /** Nested per-side book ladders at an instant — the shape of the R
    * client's `order_book()` result (`{timestamp, asks, bids}`,
    * `R/obanalytics.R:1004-1008`): one row per (pair, side) with the
    * price ladder as an ordered array. The ladder is also serialized
    * as integer cents for engine-portable comparison. */
  def orderBookLadders(level3: DataFrame, tsMicros: Long): DataFrame = {
    val snap = level3
      .filter(col("microtimestamp") <= tsMicros &&
        col("next_microtimestamp") > tsMicros)
      .groupBy("pair_id", "side", "price")
      .agg(sum("amount").as("volume"))
    snap
      .withColumn("cents", expr("CAST(ROUND(price * 100) AS BIGINT)"))
      .withColumn("level_str",
        concat_ws("x", col("cents"), col("volume").cast("long")))
      .groupBy("pair_id", "side")
      .agg(
        count(lit(1)).as("n_levels"),
        expr("concat_ws(',', transform(sort_array(collect_list(" +
          "struct(CASE WHEN side = 'b' THEN -cents ELSE cents END AS k, " +
          "level_str))), x -> x.level_str))").as("ladder"))
  }

  /** Green (data) / red (gap) intervals from the eras table:
    * greens = [era, level3]; reds = (level3, next era). `minDuration`
    * drops intervals shorter than the threshold (reference
    * `p_min_duration`, `db/get_schema.sql:462-503`). */
  def intervals(eras: DataFrame, minDurationMicros: Long = 0L): DataFrame = {
    val w = Window.partitionBy("pair_id").orderBy("era")
    val withNext = eras.withColumn("next_era", lead("era", 1).over(w))
    val greens = withNext.select(col("pair_id"),
      col("era").as("interval_start"), col("level3").as("interval_end"),
      lit("G").as("kind"))
    val reds = withNext.filter(col("next_era").isNotNull)
      .select(col("pair_id"), col("level3").as("interval_start"),
        col("next_era").as("interval_end"), lit("R").as("kind"))
    greens.unionByName(reds)
      .filter(col("interval_end") - col("interval_start") >= minDurationMicros)
  }

  /** Plot-ready frame of `plotDataAvailability` (reference
    * `R/visualisation.R:24-63`): the rendering is the R client's
    * ggplot, but every aesthetic it computes is relational and served
    * here — exchange/pair names from the seeded dimensions, the rect
    * row `y = dense_rank(desc(pair))` within each exchange facet, and
    * the per-(exchange, pair) label anchor `label_ts =
    * min(interval_start)` (the R code's separate geom_text frame,
    * denormalized onto each rect row). Input = [[intervals]] output;
    * the frame is O(eras) — tiny at any corpus scale, windows included.
    */
  def dataAvailabilityGrid(intervals: DataFrame,
      spark: SparkSession): DataFrame = {
    val named = intervals
      .withColumn("exchange_id", Dimensions.exchangeOfPair(col("pair_id")))
      .join(broadcast(Dimensions.exchangesDf(spark)), "exchange_id")
      .join(broadcast(Dimensions.pairsDf(spark).select("pair_id", "pair")),
        "pair_id")
    named
      .withColumn("y", dense_rank().over(
        Window.partitionBy("exchange").orderBy(col("pair").desc))
        .cast("long"))
      .withColumn("label_ts", min("interval_start").over(
        Window.partitionBy("exchange", "pair")))
      .select("exchange", "pair", "y", "interval_start", "interval_end",
        "kind", "label_ts")
  }

  /** Plot-ready frame of `plotPositionTrellis` (reference
    * `R/visualisation.R:69-103`): each strategy position (numbered
    * `rn` per pair in open order — the R code's `rn := .I`) joined
    * with the trading-period ticks inside
    * [opened_at − around, closed_at + around], carrying the facet's
    * price series (`log(mid) − log(open_price)` when `logRelative`,
    * the paper-trading default; raw mid otherwise) and the segment
    * overlay columns. Tickless instants (null vwaps) are dropped.
    * Scale shape: positions are O(strategy trades) — bounded, so the
    * band join BROADCASTS them into the tick stream; ticks never
    * reshuffle. Log prices round to 8 decimals (the [[MarketOps
    * .tradingStrategy]] discipline — libm ulp differences). */
  def positionTrellis(positions: DataFrame, ticks: DataFrame,
      logRelative: Boolean = true,
      aroundMicros: Long = 60000000L): DataFrame = {
    val pos = positions
      .select(col("pair_id").as("p_pair"), col("opened_at"),
        col("open_price"), col("closed_at"), col("close_price"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_pair").orderBy("opened_at", "closed_at"))
        .cast("long"))
    val t = ticks
      .select(col("pair_id"), col("ts"), col("bid_price"), col("ask_price"))
      .filter(col("bid_price").isNotNull && col("ask_price").isNotNull)
    val mid = (col("bid_price") + col("ask_price")) / lit(2.0)
    val price =
      if (logRelative) round(log(mid) - log(col("open_price")), 8)
      else mid
    t.join(broadcast(pos),
        col("pair_id") === col("p_pair") &&
          col("ts") >= col("opened_at") - lit(aroundMicros) &&
          col("ts") <= col("closed_at") + lit(aroundMicros))
      .select(col("pair_id"), col("rn"), col("opened_at"), col("closed_at"),
        col("open_price"), col("close_price"), col("ts"),
        price.as("price"))
  }

  /** Flat export projection (CSV-shaped): millisecond timestamps,
    * action / direction labels. */
  def export(level3: DataFrame): DataFrame =
    level3.select(
      col("event_id").as("id"),
      expr("microtimestamp div 1000").as("timestamp_ms"),
      expr("price_microtimestamp div 1000").as("exchange_timestamp_ms"),
      col("price"),
      col("amount").as("volume"),
      when(col("event_no") === 1 && !col("is_deleted"), "created")
        .when(col("event_no") > 1 && !col("is_deleted"), "changed")
        .otherwise("deleted").as("action"),
      when(col("side") === "b", "bid").otherwise("ask").as("direction"),
      col("pair_id"))

  /** `get.depth`: full depth standing at t0 (labeled at t0) ∪ depth
    * changes in (t0, t1]; side mapped to bid/ask. `depthStream` is the
    * kernel's L2 output (pair_id, ts, side, price, volume). */
  def depth(depthStream: DataFrame, t0: Long, t1: Long): DataFrame = {
    // Starting depth = the last depth-change value per level at t0 (the
    // stream is total-volume-valued, so no snapshot re-scan is needed —
    // one kernel pass feeds both the boundary state and the changes).
    val w = Window.partitionBy("pair_id", "side", "price")
      .orderBy(col("ts").desc)
    val starting = depthStream
      .filter(col("ts") <= t0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("volume") > 0)
      .select(col("pair_id").cast("long").as("pair_id"), col("side"),
        col("price"), col("volume"), lit(t0).as("ts"))
    val changes = depthStream
      .filter(col("ts") > t0 && col("ts") <= t1)
      .select(col("pair_id").cast("long").as("pair_id"), col("side"),
        col("price"), col("volume"), col("ts"))
    starting.unionByName(changes)
      .select(col("pair_id"), col("ts"),
        when(col("side") === "b", "bid").otherwise("ask").as("side"),
        col("price"), col("volume"))
  }
}
