package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.market.Analytics

/** Semantics of the served plot-helper frames (reference
  * `R/visualisation.R:24-63,69-103`) on crafted fixtures — the DuckDB
  * oracle rows check the composition on real data; these cases pin
  * the aesthetics' DEFINITIONS: facet row ranking, label anchors,
  * the around-window membership rule, and the log-relative zero at
  * the open price. */
class PlotFramesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plot-frames")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dataAvailabilityGrid ranks pairs desc per exchange and anchors labels") {
    import spark.implicits._
    // pairs 1 (BTCUSD, bitfinex) / 2 (LTCUSD, bitstamp) / 3 (ETHUSD,
    // bitfinex): the bitfinex facet holds two pairs, ETHUSD > BTCUSD
    // in desc order so ETHUSD gets y = 1
    val ivals = Seq(
      (1L, 100L, 200L, "G"), (1L, 200L, 300L, "R"), (1L, 300L, 400L, "G"),
      (2L, 150L, 250L, "G"),
      (3L, 120L, 220L, "G"))
      .toDF("pair_id", "interval_start", "interval_end", "kind")
    val g = Analytics.dataAvailabilityGrid(ivals, spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(5), r.getLong(6)))
    val byPair = g.groupBy(_._2)
    assert(byPair("ETHUSD").forall(x => x._1 == "bitfinex" && x._3 == 1L))
    assert(byPair("BTCUSD").forall(x => x._1 == "bitfinex" && x._3 == 2L))
    assert(byPair("LTCUSD").forall(x => x._1 == "bitstamp" && x._3 == 1L))
    // label anchor = min interval_start per (exchange, pair), on every row
    assert(byPair("BTCUSD").forall(_._6 == 100L))
    assert(g.count(x => x._2 == "BTCUSD") == 3)
  }

  test("positionTrellis applies the around-window and log-relative price") {
    import spark.implicits._
    val positions = Seq(
      (1, "long", 1000000000L, 100.0, 1060000000L, 110.0),
      (1, "long", 2000000000L, 105.0, 2060000000L, 100.0))
      .toDF("pair_id", "side", "opened_at", "open_price",
        "closed_at", "close_price")
    val ticks = Seq(
      (1, 939999999L, 99.0, 101.0),   // 1 µs before opened−60s: OUT
      (1, 940000000L, 99.0, 101.0),   // exactly opened−60s: IN
      (1, 1030000000L, 100.0, 100.0), // mid position 1: IN, mid = open
      (1, 1120000000L, 104.0, 106.0), // exactly closed+60s: IN
      (1, 1120000001L, 104.0, 106.0), // 1 µs past: OUT
      (1, 2030000000L, 102.0, 104.0), // mid position 2: IN
      (2, 1030000000L, 1.0, 2.0))     // other pair: OUT
      .toDF("pair_id", "ts", "bid_price", "ask_price")
    val t = Analytics.positionTrellis(positions, ticks).collect()
      .map(r => (r.getLong(1), r.getLong(6), r.getDouble(7)))
    // rn numbering follows open order per pair
    assert(t.count(_._1 == 1L) == 3 && t.count(_._1 == 2L) == 1)
    assert(t.map(x => (x._1, x._2)).sorted.toSeq == Seq(
      (1L, 940000000L), (1L, 1030000000L), (1L, 1120000000L),
      (2L, 2030000000L)))
    // a tick whose mid equals the open price sits at exactly 0.0
    assert(t.find(_._2 == 1030000000L).get._3 == 0.0)
    // log-relative, rounded to 8: ln(103/105) for position 2's tick
    val want = BigDecimal(math.log(103.0) - math.log(105.0))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(t.find(_._2 == 2030000000L).get._3 == want)
  }
}
