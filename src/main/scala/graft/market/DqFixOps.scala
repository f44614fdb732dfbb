package graft.market

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality *fix* operators — the reference's `qty_level3_fix_*`
  * family (`db/obanalytics_schema.sql:2157-2345`), which repairs the
  * most obvious capture errors. The reference mutates in place; here
  * each fix returns a correction stream (rows to drop / rows with a
  * re-pointed forward pointer).
  *
  * The builder's own output satisfies the chain invariants, so the
  * driver entries exercise the fixes on *deterministically corrupted*
  * logs (the `withX` harness functions below) — the analogue of the
  * damaged captures these functions exist for. Synthetic
  * (engine-generated) rows are marked with negative `event_id`, the
  * stand-in for the reference's `local_timestamp IS NULL` marker.
  */
object DqFixOps {

  private val Alive = Level3Source.AliveMicros

  // ---- deterministic corruption harness -------------------------------

  /** Inject a duplicate (order_id, event_no=1) row (eternal, as the
    * reference's spurious re-creations) for orders ≡ 0 (mod 11). */
  def withDuplicates(level3: DataFrame): DataFrame =
    level3.unionByName(
      level3.filter(col("order_id") % 11 === 0 && col("event_no") === 1)
        .withColumn("next_microtimestamp", lit(Alive))
        .withColumn("is_deleted", lit(false))
        .withColumn("event_id", -col("event_id") - 1000000000L))

  /** Break the chain of orders ≡ 0 (mod 13): the second-to-last event
    * becomes eternal, orphaning the last one. */
  def withBrokenChains(level3: DataFrame): DataFrame = {
    val w = Window.partitionBy("order_id")
    level3
      .withColumn("max_eno", max("event_no").over(w))
      .withColumn("next_microtimestamp",
        when(col("order_id") % 13 === 0 && col("max_eno") >= 2 &&
          col("event_no") === col("max_eno") - 1, lit(Alive))
          .otherwise(col("next_microtimestamp")))
      .drop("max_eno")
  }

  /** Insert an engine-generated (premature) delete just after the first
    * event of orders ≡ 0 (mod 9) with ≥ 2 events, re-pointing the first
    * event at it — later real events then contradict the deletion. */
  def withPrematureDeletes(level3: DataFrame): DataFrame = {
    val w = Window.partitionBy("order_id")
    val marked = level3.withColumn("max_eno", max("event_no").over(w))
    val target = col("order_id") % 9 === 0 && col("max_eno") >= 2
    val deletes = marked.filter(target && col("event_no") === 1)
      .select((col("microtimestamp") + 1).as("microtimestamp"),
        col("order_id"), lit(1000).cast(level3.schema("event_no").dataType)
          .as("event_no"),
        col("side"), col("price"), col("amount"),
        lit(null).cast("double").as("fill"),
        (col("microtimestamp") + 1).as("next_microtimestamp"),
        lit(true).as("is_deleted"),
        col("price_microtimestamp"), col("price_event_no"),
        col("pair_id"), col("exchange_id"),
        (-col("event_id") - 2000000000L).as("event_id"))
    marked
      .withColumn("next_microtimestamp",
        when(target && col("event_no") === 1, col("microtimestamp") + 1)
          .otherwise(col("next_microtimestamp")))
      .drop("max_eno")
      .unionByName(deletes.select(level3.columns.map(col).toIndexedSeq: _*))
  }

  // ---- the fixes ------------------------------------------------------

  /** `qty_level3_fix_duplicate_order_events`: orders holding duplicate
    * (order_id, event_no) pairs lose their spurious eternal
    * `event_no = 1` rows. Returns the dropped rows. */
  def fixDuplicates(level3: DataFrame): DataFrame = {
    val dupOrders = level3.groupBy("order_id", "event_no")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select("order_id").distinct()
    level3
      .join(dupOrders, Seq("order_id"), "left_semi")
      .filter(col("event_no") === 1 &&
        col("next_microtimestamp") === Alive)
      .select(col("pair_id"), col("order_id"), col("event_no"),
        col("microtimestamp"), lit("drop").as("action"),
        lit(null).cast("long").as("new_next"))
  }

  /** Orphan events: `event_no > 1` rows no predecessor's forward
    * pointer reaches — the chain-invariant violation shared by
    * [[fixEternals]] (which repairs it) and [[invalidChains]] (which
    * lists it). Output: (o_oid, o_eno, o_ts). */
  private def orphanEvents(level3: DataFrame): DataFrame = {
    val preds = level3.select(col("order_id").as("p_oid"),
      (col("event_no") + 1).as("p_eno"),
      col("next_microtimestamp").as("p_next"))
    level3.filter(col("event_no") > 1)
      .join(preds,
        col("order_id") === col("p_oid") &&
          col("event_no") === col("p_eno") &&
          col("microtimestamp") === col("p_next"),
        "left_anti")
      .select(col("order_id").as("o_oid"), col("event_no").as("o_eno"),
        col("microtimestamp").as("o_ts"))
  }

  /** `qty_level3_fix_eternals`: an eternal event whose order has an
    * orphan successor (no predecessor's forward pointer reaches it)
    * reconnects to that orphan. Returns the re-pointed rows. */
  def fixEternals(level3: DataFrame): DataFrame = {
    level3.filter(col("next_microtimestamp") === Alive)
      .join(orphanEvents(level3),
        col("order_id") === col("o_oid") &&
          col("event_no") === col("o_eno") - 1)
      .select(col("pair_id"), col("order_id"), col("event_no"),
        col("microtimestamp"), lit("reconnect").as("action"),
        col("o_ts").as("new_next"))
  }

  /** `qty_level3_show_invalid_chains`
    * (`db/obanalytics_schema.sql:2386-2430`): the row-LISTING twin of
    * the broken-chain count in [[GridOps.dqReport]] — every level3
    * event of every order that holds at least one orphan event
    * ([[orphanEvents]]; the reference's `NOT EXISTS` predecessor
    * probe), for inspection before deciding which fix applies. Scale
    * shape: one anti-join builds the orphan set, one semi-join keyed
    * by order_id pulls the offending orders' full histories — both
    * shuffle on order_id, no window. Returns full level3 rows. */
  def invalidChains(level3: DataFrame): DataFrame = {
    val bad = orphanEvents(level3)
      .select(col("o_oid").as("order_id")).distinct()
    level3.join(bad, Seq("order_id"), "left_semi")
  }

  /** `qty_level3_fix_premature_deletes`: engine-generated deletes
    * (negative event_id) contradicted by later real events of the same
    * order are dropped, and the rows that pointed at them reconnect to
    * the order's next real event. Returns drops + reconnections. */
  def fixPrematureDeletes(level3: DataFrame): DataFrame = {
    val real = level3.filter(col("event_id") >= 0)
    val laterReal = real.select(col("order_id").as("r_oid"),
      col("microtimestamp").as("r_ts"))
    val premature = level3
      .filter(col("is_deleted") && col("event_id") < 0)
      .join(laterReal, col("order_id") === col("r_oid") &&
        col("r_ts") > col("microtimestamp"))
      .groupBy("pair_id", "order_id", "event_no", "microtimestamp")
      .agg(min("r_ts").as("next_real_ts"))
    val drops = premature.select(col("pair_id"), col("order_id"),
      col("event_no"), col("microtimestamp"), lit("drop").as("action"),
      lit(null).cast("long").as("new_next"))
    val reconnects = real
      .join(premature.select(col("order_id").as("d_oid"),
        col("microtimestamp").as("d_ts"), col("next_real_ts")),
        col("order_id") === col("d_oid") &&
          col("next_microtimestamp") === col("d_ts"))
      .select(col("pair_id"), col("order_id"), col("event_no"),
        col("microtimestamp"), lit("reconnect").as("action"),
        col("next_real_ts").as("new_next"))
    drops.unionByName(reconnects)
  }

  // ---- missing-fill repair ---------------------------------------------

  /** The anchor selection shared by the missing-fill corruption
    * harness and its trades extract: for orders ≡ 0 (mod 7), the
    * GREATEST fill-bearing event — the event whose fill the feed
    * "lost". Output: (order_id, a_eno). */
  private def fillAnchors(level3: DataFrame): DataFrame =
    level3.filter(col("order_id") % 7 === 0 && col("fill").isNotNull)
      .groupBy("order_id").agg(max("event_no").as("a_eno"))

  /** The trades capture the feed DID deliver for the anchors — the
    * stand-in for the reference's `live_trades` side (a trade row
    * survives even when the matched order event lost its fill).
    * Extracted from the PRISTINE log, before [[withMissingFill]]
    * corrupts it. Output: (order_id, event_no, t_fill). */
  def missingFillTrades(level3: DataFrame): DataFrame =
    level3.join(fillAnchors(level3), Seq("order_id"))
      .filter(col("event_no") === col("a_eno"))
      .select(col("order_id"), col("event_no"),
        col("fill").as("t_fill"))

  /** Corruption harness: NULL the anchor events' fills — the Bitstamp
    * feed glitch `find_and_repair_missing_fill` exists for. */
  def withMissingFill(level3: DataFrame): DataFrame =
    level3.join(fillAnchors(level3), Seq("order_id"), "left")
      .withColumn("fill",
        when(col("a_eno").isNotNull && col("event_no") === col("a_eno"),
          lit(null).cast("double")).otherwise(col("fill")))
      .drop("a_eno")
      .select(level3.columns.map(col).toIndexedSeq: _*)

  /** `bitstamp.find_and_repair_missing_fill`
    * (`db/bitstamp_schema.sql:634-700`): reconstruct a lost fill from
    * the matched trade, then walk the order's own amount ladder
    * BACKWARD from the repaired event — each earlier event's amount
    * becomes `amount(next) + fill(next)` (the reference's recursive
    * CTE unrolled), and the creation event's fill becomes
    * `-amount(1)` (the reference's sign convention for the quantity a
    * creation adds). The reference's recursion over `event_no - 1` is
    * a prefix structure, so here it is ONE window cumulative sum in
    * descending event order — no iteration, no driver loop: with the
    * anchor's repaired fill substituted in,
    * `amount(k) = amount(anchor) + Σ_{j∈(k, anchor]} fill(j)`
    * (NULL fills — amount-increase events in this log model —
    * contribute 0 to the ladder). DELIBERATE DIVERGENCE from the
    * reference's recursion: its `base.amount + base.fill` step
    * NULL-propagates, so an intermediate NULL fill would write NULL
    * amounts up the rest of the chain; here (and in the DuckDB
    * oracle, which agrees) NULL fill coalesces to 0 and the walk
    * continues with real amounts — the recursion is unrolled, not
    * replicated bit-for-bit on NULL inputs. One anchor per order: when several
    * events lost fills, the GREATEST event_no anchors the walk (the
    * reference's UPDATE is single-anchor by construction). Emits only
    * rows the repair CHANGED — the Spark analogue of the reference's
    * `UPDATE … RETURNING`. Scale shape: anchor screen is one join on
    * (order_id, event_no) against the trades side; the walk is one
    * window over each repaired order's own events — work proportional
    * to damaged orders, never the log. Output:
    * (pair_id, order_id, event_no, microtimestamp, amount, fill). */
  def findAndRepairMissingFill(level3: DataFrame,
      trades: DataFrame): DataFrame = {
    val anchors = level3
      .filter(col("fill").isNull && col("event_no") > 1)
      .join(trades.select(col("order_id").as("t_oid"),
          col("event_no").as("t_eno"), col("t_fill")),
        col("order_id") === col("t_oid") &&
          col("event_no") === col("t_eno"))
      .groupBy(col("order_id").as("a_oid"))
      .agg(max(struct(col("event_no").as("a_eno"),
        col("amount").as("a_amt"), col("t_fill").as("a_fill"))).as("a"))
      .select(col("a_oid"), col("a.a_eno").as("a_eno"),
        col("a.a_amt").as("a_amt"), col("a.a_fill").as("a_fill"))
    val scope = level3.join(anchors,
        col("order_id") === col("a_oid") &&
          col("event_no") <= col("a_eno"))
      .withColumn("eff",
        when(col("event_no") === col("a_eno"), col("a_fill"))
          .otherwise(coalesce(col("fill"), lit(0.0))))
    val wDesc = Window.partitionBy("order_id")
      .orderBy(col("event_no").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    scope
      .withColumn("new_amount",
        col("a_amt") + coalesce(sum("eff").over(wDesc), lit(0.0)))
      .withColumn("new_fill",
        when(col("event_no") === col("a_eno"), col("a_fill"))
          .when(col("event_no") === 1, -col("new_amount"))
          .otherwise(col("fill")))
      .filter(col("new_amount") =!= col("amount") ||
        !(col("new_fill") <=> col("fill")))
      .select(col("pair_id"), col("order_id"), col("event_no"),
        col("microtimestamp"), col("new_amount").as("amount"),
        col("new_fill").as("fill"))
  }
}
