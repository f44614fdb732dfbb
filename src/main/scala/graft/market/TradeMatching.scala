package graft.market

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trade inference & matching.
  *
  * The reference infers trades its feed never reported by pairing buy
  * and sell order events with equal fill within a time band, taking the
  * *maker* to be the side whose price chain started earlier and the
  * trade price from the maker (reference: `bitstamp.inferred_trades`,
  * `db/bitstamp_schema.sql:834-984`; dedupe-by-row_number pattern from
  * `bitfinex.match_price_and_fill_exact`, `db/bitfinex_schema.sql:501-568`).
  *
  * The join is an equi-join on (pair_id, fill) with a time-band
  * predicate — Catalyst plans a shuffled sort-merge join on the equi
  * keys with the band as a residual filter, so it scales with the
  * number of equal-fill collisions, not |fills|². Mutual-best
  * (row_number = 1 on both sides) keeps the pairing deterministic.
  */
object TradeMatching {

  /** Time band for matching. The reference default is 1 s on µs-spaced
    * exchange feeds (`p_max_delay`, `db/bitfinex_schema.sql:577`); this
    * dataset's fills are minutes apart, so the band scales accordingly
    * (same reasoning as the era-gap threshold). Compute stays bounded at
    * any width via bucketed equi keys + the matchable-set cap. */
  val DefaultToleranceMicros: Long = 3600L * 1000000 // 1 h band

  /** Matchable-set cap — reference `p_max_set_size = 10`
    * (`db/bitfinex_schema.sql:577`). */
  val DefaultSetCap: Int = 10

  /** Event uuid — md5 of the natural key, as in the reference
    * (`obanalytics._level3_uuid`, `db/obanalytics_schema.sql:909-911`). */
  def eventUuid(ts: Column, orderId: Column, eventNo: Column,
      pairId: Column, exchangeId: Column): Column =
    md5(concat_ws("#", ts, orderId, eventNo, pairId, exchangeId))

  /** Inferred matches table: one row per (buy event, sell event) pair.
    * Columns: microtimestamp, price, amount, side (taker side),
    * buy_order_id/buy_event_no, sell_order_id/sell_event_no, pair_id,
    * exchange_id.
    *
    * The band join is *time-bucketed*: the buy side explodes into its
    * bucket ±1 (`bucket = ts div band`) and the join runs on
    * (pair, fill, bucket) with the band as residual — every true match
    * has bucket distance ≤ 1, so the candidate set is identical, but a
    * join group is now bounded by a band's worth of fills even when one
    * fill value dominates (low-cardinality fill skew — the sort-merge
    * join on (pair, fill) alone degenerates toward a cross product per
    * fill value). */
  def inferredMatches(level3: DataFrame,
      toleranceMicros: Long = DefaultToleranceMicros): DataFrame = {
    val fills = level3.filter(col("fill") > 0)
      .select(col("pair_id"), col("microtimestamp"), col("order_id"),
        col("event_no"), col("side"), col("price"), col("fill"),
        col("price_microtimestamp"))
    val b = fills.filter(col("side") === "b").columns
      .foldLeft(fills.filter(col("side") === "b")) {
        (d, c) => d.withColumnRenamed(c, "b_" + c) }
      .withColumn("probe_bucket", explode(array(
        expr(s"b_microtimestamp div $toleranceMicros - 1"),
        expr(s"b_microtimestamp div $toleranceMicros"),
        expr(s"b_microtimestamp div $toleranceMicros + 1"))))
    val s = fills.filter(col("side") === "s").columns
      .foldLeft(fills.filter(col("side") === "s")) {
        (d, c) => d.withColumnRenamed(c, "s_" + c) }
      .withColumn("s_bucket", expr(s"s_microtimestamp div $toleranceMicros"))
    val cand = b.join(s,
      col("b_pair_id") === col("s_pair_id") &&
        col("b_fill") === col("s_fill") &&
        col("probe_bucket") === col("s_bucket") &&
        abs(col("b_microtimestamp") - col("s_microtimestamp")) <= toleranceMicros)
      .withColumn("dist", abs(col("b_microtimestamp") - col("s_microtimestamp")))
    val wb = Window.partitionBy("b_pair_id", "b_order_id", "b_event_no")
      .orderBy(col("dist"), col("s_microtimestamp"), col("s_order_id"),
        col("s_event_no"))
    val ws = Window.partitionBy("s_pair_id", "s_order_id", "s_event_no")
      .orderBy(col("dist"), col("b_microtimestamp"), col("b_order_id"),
        col("b_event_no"))
    val mutual = cand
      .withColumn("rn_b", row_number().over(wb))
      .withColumn("rn_s", row_number().over(ws))
      .filter(col("rn_b") === 1 && col("rn_s") === 1)
    val makerIsBuy = col("b_price_microtimestamp") < col("s_price_microtimestamp") ||
      (col("b_price_microtimestamp") === col("s_price_microtimestamp") &&
        (col("b_microtimestamp") < col("s_microtimestamp") ||
          (col("b_microtimestamp") === col("s_microtimestamp") &&
            col("b_order_id") < col("s_order_id"))))
    mutual.select(
      greatest(col("b_microtimestamp"), col("s_microtimestamp"))
        .as("microtimestamp"),
      when(makerIsBuy, col("b_price")).otherwise(col("s_price")).as("price"),
      col("b_fill").as("amount"),
      // taker side: the opposite of the maker
      when(makerIsBuy, lit("s")).otherwise(lit("b")).as("side"),
      col("b_microtimestamp").as("buy_microtimestamp"),
      col("b_order_id").as("buy_order_id"),
      col("b_event_no").as("buy_event_no"),
      col("s_microtimestamp").as("sell_microtimestamp"),
      col("s_order_id").as("sell_order_id"),
      col("s_event_no").as("sell_event_no"),
      col("b_pair_id").as("pair_id"),
      Dimensions.exchangeOfPair(col("b_pair_id")).cast("long").as("exchange_id"))
  }

  /** Per-buy *matchable set*: the ≤ `setCap` nearest sell fills inside
    * the time band, ranked by distance (reference
    * `bitfinex._matches_matchable_sets`, `db/bitfinex_schema.sql:177-237`
    * — matchable sets are delay-windowed runs capped at
    * `p_max_set_size = 10`). The band join is time-bucketed as in
    * [[inferredMatches]]; the cap makes every downstream subset join
    * O(setCap²·n) instead of O(band²·n) — the property that keeps
    * subset-sum matching linear in the fill count at any band width. */
  private def matchableSells(level3: DataFrame, toleranceMicros: Long,
      setCap: Int): DataFrame = {
    val fills = level3.filter(col("fill") > 0)
      .select(col("pair_id"), col("microtimestamp").as("ts"),
        col("order_id").as("oid"), col("event_no").as("eno"),
        col("side"), col("fill"))
    def pref(p: String, d: DataFrame) =
      d.columns.foldLeft(d)((x, c) => x.withColumnRenamed(c, p + c))
    val b = pref("b_", fills.filter(col("side") === "b"))
      .withColumn("probe_bucket", explode(array(
        expr(s"b_ts div $toleranceMicros - 1"),
        expr(s"b_ts div $toleranceMicros"),
        expr(s"b_ts div $toleranceMicros + 1"))))
    val s = pref("s_", fills.filter(col("side") === "s"))
      .withColumn("s_bucket", expr(s"s_ts div $toleranceMicros"))
    val w = Window.partitionBy("b_pair_id", "b_oid", "b_eno")
      .orderBy(col("dist"), col("s_ts"), col("s_oid"), col("s_eno"))
    b.join(s,
      col("b_pair_id") === col("s_pair_id") &&
        col("probe_bucket") === col("s_bucket") &&
        abs(col("b_ts") - col("s_ts")) <= toleranceMicros)
      .withColumn("dist", abs(col("b_ts") - col("s_ts")))
      .withColumn("srn", row_number().over(w))
      .filter(col("srn") <= setCap)
      .select(col("b_pair_id").as("pair_id"), col("b_ts"), col("b_oid"),
        col("b_eno"), col("b_fill"), col("s_ts"), col("s_oid"),
        col("s_eno"), col("s_fill"), col("dist"), col("srn"))
  }

  /** Per-buy candidate arrays: the capped matchable set collected into
    * one row per buy event, sorted by rank — the shape that lets
    * subset enumeration happen per-row with codegen'd array
    * expressions instead of k-way self-joins (whose pre-filter
    * intermediates explode combinatorially and whose shuffle plans
    * are AQE-unstable). One shuffle total; each row then carries ≤
    * `setCap` candidates, so the per-row combination count is a small
    * constant (C(10,3) = 120). */
  private def candidateSets(level3: DataFrame, toleranceMicros: Long,
      setCap: Int): DataFrame =
    matchableSells(level3, toleranceMicros, setCap)
      .groupBy("pair_id", "b_ts", "b_oid", "b_eno", "b_fill")
      .agg(sort_array(collect_list(struct(
        col("srn"), col("dist"), col("s_ts"), col("s_oid"),
        col("s_eno"), col("s_fill")))).as("cands"))

  /** All index k-subsets of `0 until cap` as a literal array column —
    * driver-side enumeration of a small constant (≤ C(10,3)); rows
    * filter it to `max index < size(cands)`. */
  private def indexCombos(cap: Int, k: Int) = {
    val combos = (0 until cap).combinations(k).toSeq
    // every combo is a literal struct in the plan: bound it so a large
    // cap can't blow up analysis/codegen (the reference's own caps are
    // group ≤ 3 over set ≤ 10 → 120 combos)
    require(combos.size <= 2048,
      s"C($cap, $k) = ${combos.size} index combinations exceed the plan " +
        "literal budget (2048); reduce setCap or use a join formulation")
    array(combos.map(c =>
      struct(c.zipWithIndex.map { case (idx, pos) =>
        lit(idx).as(s"i$pos") }: _*)): _*)
  }

  private def subsetSumMatch(level3: DataFrame, toleranceMicros: Long,
      setCap: Int, k: Int): DataFrame = {
    val prefixes = (1 to k).map(i => s"s$i")
    val sets = candidateSets(level3, toleranceMicros, setCap)
    val cand = sets
      .withColumn("combo", explode(indexCombos(setCap, k)))
      .filter(col(s"combo.i${k - 1}") < size(col("cands")))
      .select(Seq(col("pair_id"), col("b_ts"), col("b_oid"), col("b_eno"),
        col("b_fill")) ++
        prefixes.zipWithIndex.map { case (p, i) =>
          col("cands").getItem(col(s"combo.i$i")).as(p) }: _*)
      .filter(prefixes.map(p => col(s"$p.s_fill")).reduce(_ + _) ===
        col("b_fill"))
      .withColumn("dist", prefixes.map(p => col(s"$p.dist")).reduce(_ + _))
    val w = Window.partitionBy("pair_id", "b_oid", "b_eno")
      .orderBy(col("dist") +:
        prefixes.flatMap(p => Seq(col(s"$p.s_ts"), col(s"$p.s_oid"),
          col(s"$p.s_eno"))): _*)
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(Seq(col("pair_id"), col("b_ts"), col("b_oid"), col("b_eno"),
        col("b_fill").as("fill")) ++
        prefixes.flatMap(p => Seq(
          col(s"$p.s_ts").as(s"${p}_ts"), col(s"$p.s_oid").as(s"${p}_oid"),
          col(s"$p.s_eno").as(s"${p}_eno"),
          col(s"$p.s_fill").as(s"${p}_fill"))): _*)
  }

  /** Subset-sum trade matching, 2-subsets (reference
    * `bitfinex.match_price_and_sum_of_fill_exact`,
    * `db/bitfinex_schema.sql:577-646`): a buy fill matched against the
    * sum of two sell fills from its capped matchable set; best (closest)
    * candidate per buy event wins. */
  def matchSumOfTwo(level3: DataFrame,
      toleranceMicros: Long = DefaultToleranceMicros,
      setCap: Int = DefaultSetCap): DataFrame =
    subsetSumMatch(level3, toleranceMicros, setCap, 2)

  /** Subset-sum trade matching, 3-subsets — the reference's default
    * `p_max_group_size = 3` (`db/bitfinex_schema.sql:577`). */
  def matchSumOfThree(level3: DataFrame,
      toleranceMicros: Long = DefaultToleranceMicros,
      setCap: Int = DefaultSetCap): DataFrame =
    subsetSumMatch(level3, toleranceMicros, setCap, 3)

  /** `get.trades` projection (reference `db/get_schema.sql:688-723`):
    * maker/taker resolved by trade side, event uuids attached. */
  def trades(matches: DataFrame): DataFrame = {
    val makerIsBuy = col("side") === "s" // taker sells => maker was the buy
    matches.select(
      col("microtimestamp").as("ts"),
      col("price"),
      col("amount").as("volume"),
      when(col("side") === "b", "buy").otherwise("sell").as("direction"),
      when(makerIsBuy,
        eventUuid(col("buy_microtimestamp"), col("buy_order_id"),
          col("buy_event_no"), col("pair_id"), col("exchange_id")))
        .otherwise(
          eventUuid(col("sell_microtimestamp"), col("sell_order_id"),
            col("sell_event_no"), col("pair_id"), col("exchange_id")))
        .as("maker_event_id"),
      when(makerIsBuy,
        eventUuid(col("sell_microtimestamp"), col("sell_order_id"),
          col("sell_event_no"), col("pair_id"), col("exchange_id")))
        .otherwise(
          eventUuid(col("buy_microtimestamp"), col("buy_order_id"),
            col("buy_event_no"), col("pair_id"), col("exchange_id")))
        .as("taker_event_id"),
      when(makerIsBuy, col("buy_order_id")).otherwise(col("sell_order_id"))
        .as("maker"),
      when(makerIsBuy, col("sell_order_id")).otherwise(col("buy_order_id"))
        .as("taker"),
      col("pair_id"))
  }
}
