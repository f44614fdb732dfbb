package graft.market

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Era surgery — the immutable re-expression of
  * `obanalytics.insert_level3_era` (reference
  * `db/obanalytics_schema.sql:1440-1597`): split a pair's history at a
  * cut instant so the order book can be rebuilt from scratch on either
  * side. The reference mutates in place with a recursive CTE renumbering
  * event chains; here the same result is one window pass producing a new
  * level3 (chains of an order are consecutive, so the renumber is a
  * constant per-order shift, not a recursion).
  *
  * Semantics per the reference:
  *   - every order *spanning* the cut (`micro < cut ≤ next`) is
  *     re-materialized as a fresh `event_no = 1` row at the cut carrying
  *     its standing (side, price, amount, fill) and the old forward
  *     pointer; its price chain restarts at (cut, 1);
  *   - downstream events of split orders renumber to 2, 3, … and price
  *     chains that started before the cut are re-anchored at (cut, 1);
  *     chains starting at/after the cut keep their anchor with the
  *     shifted event number;
  *   - the pre-cut part of a split order now ends at the cut. (The
  *     reference marks it `'infinity'` — `:1552-1561` — because its
  *     era table bounds every query; with our per-row validity encoding
  *     the interval must end at the cut so snapshots stay exact, and we
  *     split eternally-resting orders too for the same reason.)
  *
  * The invariant that makes this correct (asserted in EraSurgerySpec):
  * the standing book at *every* instant, and every replay-derived
  * stream, is unchanged by the split.
  */
object EraSurgery {

  def insertEra(level3: DataFrame, cutMicros: Long, pairId: Int): DataFrame = {
    val p = col("pair_id") === pairId
    val base = level3.filter(!p)
    val w = Window.partitionBy("order_id")
    val sub = level3.filter(p)
      .withColumn("is_span",
        col("microtimestamp") < cutMicros &&
          col("next_microtimestamp") >= cutMicros)
      .withColumn("has_span",
        max(when(col("is_span"), 1).otherwise(0)).over(w) === 1)
      // chains are consecutive: downstream rows renumber by one shift
      .withColumn("delta",
        lit(2L) - min(when(col("microtimestamp") >= cutMicros,
          col("event_no"))).over(w))
    val helper = Seq("is_span", "has_span", "delta")
    val pre = sub.filter(col("microtimestamp") < cutMicros)
      .withColumn("next_microtimestamp",
        when(col("is_span"), lit(cutMicros))
          .otherwise(col("next_microtimestamp")))
      .drop(helper: _*)
    val synth = sub.filter(col("is_span")).select(
      lit(cutMicros).as("microtimestamp"),
      col("order_id"),
      lit(1).cast(sub.schema("event_no").dataType).as("event_no"),
      col("side"), col("price"), col("amount"), col("fill"),
      col("next_microtimestamp"),
      lit(false).as("is_deleted"),
      lit(cutMicros).as("price_microtimestamp"),
      lit(1).cast(sub.schema("price_event_no").dataType).as("price_event_no"),
      col("pair_id"), col("exchange_id"),
      (-col("order_id")).as("event_id"))
    val post = sub.filter(col("microtimestamp") >= cutMicros)
      .withColumn("event_no",
        when(col("has_span"), col("event_no") + col("delta"))
          .otherwise(col("event_no"))
          .cast(sub.schema("event_no").dataType))
      .withColumn("price_event_no",
        when(col("has_span"),
          when(col("price_microtimestamp") < cutMicros, lit(1))
            .otherwise(col("price_event_no") + col("delta")))
          .otherwise(col("price_event_no"))
          .cast(sub.schema("price_event_no").dataType))
      .withColumn("price_microtimestamp",
        when(col("has_span") && col("price_microtimestamp") < cutMicros,
          lit(cutMicros)).otherwise(col("price_microtimestamp")))
      .drop(helper: _*)
    base.unionByName(pre)
      .unionByName(synth.select(base.columns.map(col).toIndexedSeq: _*))
      .unionByName(post)
  }
}
