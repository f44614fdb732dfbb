package graft.market

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Bitstamp cleanse tier — the reference's second ETL dialect —
  * re-expressed immutably over (level3, matches):
  *
  *   - [[revealEpisodes]] — `bitstamp.reveal_episodes`
  *     (`db/bitstamp_schema.sql:2098-2160`): the two events a trade
  *     references must be simultaneous; both move to the *aggressor's*
  *     price-chain start (its `price_microtimestamp`).
  *   - [[fixAggressorOrder]] — `bitstamp.fix_aggressor_creation_order`
  *     (`db/bitstamp_schema.sql:696-830`): when episode assignment
  *     would order some order's events backwards, the later episode
  *     merges into the earlier one (one merge round per call; the
  *     reference loops the same round to a fixpoint — see
  *     [[fixAggressorOrderFixpoint]]).
  *   - [[matchSequentialEvents]] —
  *     `bitstamp.match_trades_to_sequential_events`
  *     (`db/bitstamp_schema.sql:1288-1379`): trades that lost their
  *     event references are re-matched to *adjacent* opposite-side
  *     event pairs via the amount match rule
  *     (`bitstamp._get_match_rule`, `:208-229`) and price-chain
  *     ordering.
  *
  * The reference mutates `live_orders` in place; here every operator
  * returns the correction stream (old → new values), the immutable-lake
  * form of the same repair.
  */
object BitstampOps {

  /** Deterministic stand-in for Bitstamp's unreported event refs: trades
    * whose order-id sum ≡ 0 (mod 3) are treated as unmatched. */
  def isUnmatched: Column =
    (col("buy_order_id") + col("sell_order_id")) % 3 === 0

  /** Aggressor/resting refs of a matches row (side = taker side: 'b'
    * means the buy order was the aggressor). */
  private def withRefs(matches: DataFrame): DataFrame = {
    def pick(b: String, s: String) =
      when(col("side") === "b", col(b)).otherwise(col(s))
    matches.select(col("pair_id"),
      pick("buy_microtimestamp", "sell_microtimestamp").as("a_ts"),
      pick("buy_order_id", "sell_order_id").as("a_oid"),
      pick("buy_event_no", "sell_event_no").as("a_eno"),
      pick("sell_microtimestamp", "buy_microtimestamp").as("r_ts"),
      pick("sell_order_id", "buy_order_id").as("r_oid"),
      pick("sell_event_no", "buy_event_no").as("r_eno"))
  }

  /** Episode reveal: returns the moved events as a correction stream
    * (order_id, event_no, old_ts → new_ts). Multiple trades may propose
    * episodes for one event; the earliest wins (deterministic; the
    * reference's in-place UPDATE applies an arbitrary one). */
  def revealEpisodes(level3: DataFrame, matches: DataFrame): DataFrame = {
    val agg = withRefs(matches)
      .join(level3.select(col("microtimestamp").as("a_ts"),
        col("order_id").as("a_oid"), col("event_no").as("a_eno"),
        col("price_microtimestamp").as("episode_ts")),
        Seq("a_ts", "a_oid", "a_eno"))
    val proposals = agg.select(col("pair_id"), col("a_ts").as("ts"),
      col("a_oid").as("oid"), col("a_eno").as("eno"), col("episode_ts"))
      .unionByName(agg.select(col("pair_id"), col("r_ts").as("ts"),
        col("r_oid").as("oid"), col("r_eno").as("eno"), col("episode_ts")))
    proposals
      .groupBy("pair_id", "ts", "oid", "eno")
      .agg(min("episode_ts").as("new_ts"))
      .filter(col("ts") =!= col("new_ts"))
      .join(level3.select(col("pair_id"), col("microtimestamp").as("ts"),
        col("order_id").as("oid"), col("event_no").as("eno"), col("side"),
        col("price"), col("amount")), Seq("pair_id", "ts", "oid", "eno"))
      .select(col("pair_id"), col("oid").as("order_id"),
        col("eno").as("event_no"), col("ts").as("old_ts"), col("new_ts"),
        col("side"), col("price"), col("amount"))
  }

  /** One aggressor-merge round: for each order whose proposed episodes
    * run backwards in event order, the later episode's anchor event
    * moves to the earliest later-referenced episode instant. */
  def fixAggressorOrder(level3: DataFrame, matches: DataFrame): DataFrame = {
    val twe = withRefs(matches)
      .join(level3.select(col("microtimestamp").as("a_ts"),
        col("order_id").as("a_oid"), col("event_no").as("a_eno"),
        col("price_microtimestamp").as("episode_ts"),
        col("price_event_no").as("episode_eno")),
        Seq("a_ts", "a_oid", "a_eno"))
    val proposed = twe.select(col("pair_id"), col("a_oid").as("oid"),
      col("a_eno").as("eno"), col("episode_ts"),
      col("a_oid").as("episode_oid"), col("episode_eno"))
      .unionByName(twe.select(col("pair_id"), col("r_oid").as("oid"),
        col("r_eno").as("eno"), col("episode_ts"),
        col("a_oid").as("episode_oid"), col("episode_eno")))
    // running min of episode ts from the latest event of the order back;
    // RANGE frame: peers (several trades referencing one event) are
    // included together, keeping the min deterministic under tie order
    val w = Window.partitionBy("oid")
      .orderBy(col("eno").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val adjusted = proposed
      .withColumn("new_ep", min("episode_ts").over(w))
      .filter(col("new_ep") < col("episode_ts"))
      .groupBy("pair_id", "episode_ts", "episode_oid", "episode_eno")
      .agg(min("new_ep").as("new_ts"))
    adjusted
      .join(level3.select(col("pair_id"),
        col("microtimestamp").as("episode_ts"),
        col("order_id").as("episode_oid"),
        col("event_no").as("episode_eno"),
        col("side"), col("price"), col("amount")),
        Seq("pair_id", "episode_ts", "episode_oid", "episode_eno"))
      .select(col("pair_id"), col("episode_oid").as("order_id"),
        col("episode_eno").as("event_no"), col("episode_ts").as("old_ts"),
        col("new_ts"), col("side"), col("price"), col("amount"))
  }

  /** Iterate [[fixAggressorOrder]] to a fixpoint (driver loop, bounded;
    * the reference's plpgsql LOOP, `db/bitstamp_schema.sql:710-825`).
    * Applies each round's correction to the log before the next. */
  def fixAggressorOrderFixpoint(level3: DataFrame, matches: DataFrame,
      maxRounds: Int = 8): DataFrame = {
    var l3 = level3
    var out: DataFrame = null
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      // eager checkpoint: corr drives three consumers (the emptiness
      // probe, the output union, the log rewrite) and without it each
      // round re-analyzes a plan that chains every prior round's join —
      // lineage (and Catalyst analysis time) grows per iteration
      val corr = fixAggressorOrder(l3, matches).localCheckpoint()
      if (corr.isEmpty) done = true
      else {
        out = if (out == null) corr else out.unionByName(corr)
        val moved = corr.select(col("pair_id"), col("order_id"),
          col("event_no"), col("old_ts"), col("new_ts"))
        l3 = l3.join(moved,
          l3("pair_id") === moved("pair_id") &&
            l3("order_id") === moved("order_id") &&
            l3("event_no") === moved("event_no") &&
            l3("microtimestamp") === moved("old_ts"), "left")
          .select(l3.columns.map {
            case "microtimestamp" =>
              coalesce(col("new_ts"), l3("microtimestamp")).as("microtimestamp")
            case c => l3(c)
          }.toIndexedSeq: _*)
          // truncate the corrected log's lineage before the next round
          // (the knnGraph discipline); lazy — materialized by the next
          // round's first action, skipped entirely on the last round
          .localCheckpoint(false)
      }
      round += 1
    }
    if (out == null) fixAggressorOrder(level3, matches).limit(0) else out
  }

  /** `bitstamp._get_match_rule` (`db/bitstamp_schema.sql:208-229`). */
  private def matchRule(tAmt: Column, tPrice: Column, eAmt: Column,
      eFill: Column, eDeleted: Column, tol: Column): Column =
    when(tAmt === eFill, 0)
      .when(abs(tAmt * tPrice - eFill * tPrice) < tol, 1)
      .when(eFill.isNull, 2)
      .when(eDeleted && eFill === 0.0 &&
        abs(tAmt * tPrice - eAmt * tPrice) < tol, 3)
      .otherwise(lit(null).cast("int"))

  /** Re-match trades with lost event refs to adjacent opposite-side
    * event pairs (sequence proximity + amount rule + the aggressor's
    * price chain being the later one). Returns the recovered refs with
    * their match rules. */
  def matchSequentialEvents(level3: DataFrame, matches: DataFrame,
      tolerancePct: Double = 0.0001): DataFrame = {
    val unmatched = matches.filter(isUnmatched)
      .select(col("pair_id").as("t_pair_id"),
        col("microtimestamp").as("t_ts"),
        col("amount").as("t_amt"), col("price").as("t_price"),
        col("side").as("t_side"),
        col("buy_order_id"), col("sell_order_id"))
    // events already referenced by still-matched trades are off-limits
    val usedRefs = matches.filter(!isUnmatched)
      .select(col("buy_microtimestamp").as("microtimestamp"),
        col("buy_order_id").as("order_id"),
        col("buy_event_no").as("event_no"))
      .unionByName(matches.filter(!isUnmatched)
        .select(col("sell_microtimestamp").as("microtimestamp"),
          col("sell_order_id").as("order_id"),
          col("sell_event_no").as("event_no")))
    // adjacency is meaningful only inside an era (the book restarts at
    // each), so the lead-window partitions by (pair, era) — sequential
    // matching then parallelizes like the replay kernels
    val events = Level3Source.level3WithEras(level3)
      .join(usedRefs, Seq("microtimestamp", "order_id", "event_no"),
        "left_anti")
      .filter(col("event_no") > 1) // not 'order_created'
      .select("pair_id", "era_no", "microtimestamp", "order_id", "event_no",
        "side", "price", "amount", "fill", "price_microtimestamp",
        "is_deleted", "event_id")
    val m = Window.partitionBy("pair_id", "era_no")
      .orderBy("microtimestamp", "event_id")
    val seq = Seq("microtimestamp", "order_id", "event_no", "side", "amount",
      "fill", "price_microtimestamp", "is_deleted")
      .foldLeft(events) { (d, c) =>
        d.withColumn(s"n_$c", lead(c, 1).over(m))
      }
      .filter(col("side") =!= col("n_side"))
      // consumed once per pair orientation below — evaluate the
      // anti-join + lead-window pass once
      .localCheckpoint(false)
    // one equi-join per orientation of the (event, next-event) pair —
    // an OR of the two conjunctions would force a nested-loop join;
    // the second branch excludes rows the first already matched so the
    // union is exactly the OR-join's output
    val buySellKeys =
      col("pair_id") === col("t_pair_id") &&
        col("order_id") === col("buy_order_id") &&
        col("n_order_id") === col("sell_order_id")
    val sellBuyKeys =
      col("pair_id") === col("t_pair_id") &&
        col("order_id") === col("sell_order_id") &&
        col("n_order_id") === col("buy_order_id")
    val cand = seq.join(unmatched, buySellKeys)
      .unionByName(seq.join(unmatched,
        sellBuyKeys && !(col("order_id") === col("buy_order_id") &&
          col("n_order_id") === col("sell_order_id"))))
    val tol = lit(tolerancePct) * col("t_price")
    val mr = matchRule(col("t_amt"), col("t_price"), col("amount"),
      col("fill"), col("is_deleted"), tol)
    val nMr = matchRule(col("t_amt"), col("t_price"), col("n_amount"),
      col("n_fill"), col("n_is_deleted"), tol)
    // the aggressor's price chain is the later of the two
    val aggressorIsE =
      (col("t_side") === "b" && col("side") === "b") ||
        (col("t_side") === "s" && col("side") === "s")
    val ordered = when(aggressorIsE,
      col("price_microtimestamp") > col("n_price_microtimestamp"))
      .otherwise(col("price_microtimestamp") < col("n_price_microtimestamp"))
    val proposed = cand
      .withColumn("mr", mr).withColumn("n_mr", nMr)
      .filter(col("mr").isNotNull && col("n_mr").isNotNull && ordered)
      // the conflict anti-join reads proposed twice (as the probe and,
      // via `conflicts`, as the build side) — one lazy checkpoint
      // evaluates the two orientation joins once
      .localCheckpoint(false)
    // a single event may not participate in two trades
    val conflicts = proposed.select(col("n_order_id").as("c_oid"),
      col("n_event_no").as("c_eno")).distinct()
    val clean = proposed.join(conflicts,
      col("order_id") === col("c_oid") && col("event_no") === col("c_eno"),
      "left_anti")
    // deterministic winner per trade
    val wt = Window.partitionBy("t_ts", "buy_order_id", "sell_order_id")
      .orderBy("microtimestamp", "event_id")
    val eIsBuy = col("side") === "b"
    clean.withColumn("rn", row_number().over(wt)).filter(col("rn") === 1)
      .select(col("pair_id"), col("t_ts"), col("t_amt"), col("t_side"),
        col("buy_order_id"),
        when(eIsBuy, col("event_no")).otherwise(col("n_event_no"))
          .as("buy_event_no"),
        when(eIsBuy, col("mr")).otherwise(col("n_mr")).as("buy_rule"),
        col("sell_order_id"),
        when(eIsBuy, col("n_event_no")).otherwise(col("event_no"))
          .as("sell_event_no"),
        when(eIsBuy, col("n_mr")).otherwise(col("mr")).as("sell_rule"))
  }
}
