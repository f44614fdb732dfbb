package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.market.{BitstampOps, Level3Source, TradeMatching}

/** Bitstamp cleanse tier. The sf0.01 driver oracle covers reveal /
  * match-seq end to end; the aggressor-merge needs a crafted scenario
  * (the synthetic feed has no out-of-order aggressors), so the merge
  * semantics (reference `fix_aggressor_creation_order`,
  * `db/bitstamp_schema.sql:696-830`) are pinned by fixture here.
  */
class BitstampSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bst")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // Resting buy order 100 (events 1..3); sell aggressors 200 (created at
  // 4000) and 300 (created at 3000, filling at 6000). Trade 1 pairs
  // (100, e2) with aggressor 200; trade 2 pairs (100, e3) with
  // aggressor 300 whose price chain starts EARLIER (3000 < 4000):
  // episodes proposed for order 100 run backwards => aggressor 200's
  // creation must merge back to 3000.
  private def fixtureLevel3 = Seq(
    (1, 1000L, 100L, 1, "b", 10.0, 5.0, 1000L, 1, 11L),
    (1, 5000L, 100L, 2, "b", 10.0, 3.0, 1000L, 1, 12L),
    (1, 6000L, 100L, 3, "b", 10.0, 1.0, 1000L, 1, 13L),
    (1, 4000L, 200L, 1, "s", 10.0, 2.0, 4000L, 1, 21L),
    (1, 5000L, 200L, 2, "s", 10.0, 0.0, 4000L, 1, 22L),
    (1, 3000L, 300L, 1, "s", 10.0, 2.0, 3000L, 1, 31L),
    (1, 6000L, 300L, 2, "s", 10.0, 0.0, 3000L, 1, 32L))
    .toDF("pair_id", "microtimestamp", "order_id", "event_no", "side",
      "price", "amount", "price_microtimestamp", "price_event_no",
      "event_id")

  private def fixtureMatches = Seq(
    // taker sells => aggressor is the sell ref
    (1, "s", 5000L, 100L, 2, 5000L, 200L, 2),
    (1, "s", 6000L, 100L, 3, 6000L, 300L, 2))
    .toDF("pair_id", "side", "buy_microtimestamp", "buy_order_id",
      "buy_event_no", "sell_microtimestamp", "sell_order_id",
      "sell_event_no")

  test("aggressor merge: backwards episodes fold into the earlier one") {
    val out = BitstampOps.fixAggressorOrder(fixtureLevel3, fixtureMatches)
      .select("order_id", "event_no", "old_ts", "new_ts")
      .collect().map(_.toSeq).toList
    // aggressor 300's chain (3000) precedes aggressor 200's (4000) but
    // is referenced by a LATER event of order 100 => 200's chain anchor
    // moves back to 3000
    assert(out == List(Seq(200L, 1, 4000L, 3000L)))
  }

  test("fixpoint loop terminates and applies the merge") {
    val out = BitstampOps.fixAggressorOrderFixpoint(
      fixtureLevel3, fixtureMatches)
    assert(out.count() >= 1)
  }

  test("sequential re-matching recovers the dropped refs on real data") {
    val dir = "/root/testdata/sf0.001"
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
    val matches = TradeMatching.inferredMatches(l3)
    val recovered = BitstampOps.matchSequentialEvents(l3, matches)
    // every recovered trade references a real buy and sell order
    val orders = l3.select(col("order_id")).distinct()
    val bad = recovered.join(orders,
      recovered("buy_order_id") === orders("order_id"), "left_anti")
    assert(bad.count() == 0)
  }

  test("missing-fill repair walks the amount ladder backward from the trade") {
    import graft.market.DqFixOps
    // reference find_and_repair_missing_fill semantics
    // (db/bitstamp_schema.sql:634-700) on a hand ladder: order 700's
    // e4 lost its fill (the matched trade says 3); e3 is an amount
    // INCREASE (NULL fill, contributes 0 to the walk); order 701 is
    // healthy and must not be touched
    val l3 = Seq(
      (1L, 700L, 1, 1000L, 10.0, Option.empty[Double]),
      (1L, 700L, 2, 2000L, 6.0, Some(4.0)),
      (1L, 700L, 3, 3000L, 8.0, Option.empty[Double]),
      (1L, 700L, 4, 4000L, 5.0, Option.empty[Double]), // the lost fill
      (1L, 700L, 5, 5000L, 2.0, Some(3.0)),            // after anchor
      (1L, 701L, 1, 1000L, 9.0, Option.empty[Double]),
      (1L, 701L, 2, 2000L, 7.0, Some(2.0)))
      .toDF("pair_id", "order_id", "event_no", "microtimestamp",
        "amount", "fill")
    val trades = Seq((700L, 4, 3.0))
      .toDF("order_id", "event_no", "t_fill")
    val out = DqFixOps.findAndRepairMissingFill(l3, trades)
      .orderBy("order_id", "event_no")
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toList
    // e4: fill restored from the trade, amount kept
    // e3: new amount 5+3 = 8 equals the capture, NULL fill kept → no row
    // e2: new amount 8+0 = 8 (the increase contributed nothing) ≠ 6
    // e1: new amount 8+4 = 12, creation fill = −12 (reference sign)
    // e5 (after the anchor) and order 701 untouched
    assert(out == List(
      (700L, 1, 12.0, Some(-12.0)),
      (700L, 2, 8.0, Some(4.0)),
      (700L, 4, 5.0, Some(3.0))))
  }
}
