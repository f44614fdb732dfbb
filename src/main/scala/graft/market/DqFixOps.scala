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

  /** `qty_level3_fix_eternals`: an eternal event whose order has an
    * orphan successor (no predecessor's forward pointer reaches it)
    * reconnects to that orphan. Returns the re-pointed rows. */
  def fixEternals(level3: DataFrame): DataFrame = {
    val preds = level3.select(col("order_id").as("p_oid"),
      (col("event_no") + 1).as("p_eno"),
      col("next_microtimestamp").as("p_next"))
    val orphans = level3.filter(col("event_no") > 1)
      .join(preds,
        col("order_id") === col("p_oid") &&
          col("event_no") === col("p_eno") &&
          col("microtimestamp") === col("p_next"),
        "left_anti")
      .select(col("order_id").as("o_oid"), col("event_no").as("o_eno"),
        col("microtimestamp").as("o_ts"))
    level3.filter(col("next_microtimestamp") === Alive)
      .join(orphans,
        col("order_id") === col("o_oid") &&
          col("event_no") === col("o_eno") - 1)
      .select(col("pair_id"), col("order_id"), col("event_no"),
        col("microtimestamp"), lit("reconnect").as("action"),
        col("o_ts").as("new_next"))
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
}
