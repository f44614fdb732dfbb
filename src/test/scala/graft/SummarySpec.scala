package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.market.{Analytics, Level3Source}

/** Trade-side summary metrics (reference `obanalytics.summary`,
  * `db/obanalytics_schema.sql:2556-2578`): era assignment by time
  * range, t_matched from order-event links, t_exchange from the
  * exchange's own trade ids (present only for exchange-reported
  * feeds — the inferred-match path yields 0). */
class SummarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-summary")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("summaryWithTrades assigns trades to eras and counts exchange ids") {
    val spark0 = spark
    import spark0.implicits._
    val l3 = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val l3e = Level3Source.level3WithEras(Level3Source.level3(l3))

    // two eras of pair 1: place one synthetic trade in each, one with an
    // exchange trade id and an order link, one with neither
    val eras = l3e.select("pair_id", "era").distinct()
      .orderBy("pair_id", "era").collect()
    val (p0, e0) = (eras(0).getInt(0), eras(0).getLong(1))
    val matches = Seq(
      (p0, e0 + 10L, Some(1L), Option.empty[Long], Some(77L)),
      (p0, e0 + 20L, Option.empty[Long], Option.empty[Long], Option.empty[Long])
    ).toDF("pair_id", "microtimestamp", "buy_order_id", "sell_order_id",
      "exchange_trade_id")

    val row = Analytics.summaryWithTrades(l3e, matches)
      .filter(col("pair_id") === p0 && col("era") === e0)
      .select("t_total", "t_matched", "t_exchange", "t_first", "t_last")
      .head()
    assert(row.getLong(0) === 2L) // both trades in era 0
    assert(row.getLong(1) === 1L) // one linked to an order event
    assert(row.getLong(2) === 1L) // one carrying an exchange trade id
    assert(row.getLong(3) === e0 + 10L && row.getLong(4) === e0 + 20L)

    // eras without trades keep zero counts, null firsts
    val empty = Analytics.summaryWithTrades(l3e, matches)
      .filter(col("t_total") === 0)
    assert(empty.filter(col("t_first").isNotNull).count() === 0)
  }
}
