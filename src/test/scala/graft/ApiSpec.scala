package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.market.{Analytics, Level3Source}

/** The three thin `GraftApi` catalog lookups must equal the
  * corresponding projections of `Analytics.catalog` — the composed
  * report is oracle-checked (`mkt_catalog`), so projection equality
  * extends that signal to the facade methods (a column-name or filter
  * typo here would otherwise ship unnoticed; round-5 ADVICE). */
class ApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-api-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val l3 = Level3Source.level3(
    Tables.load(spark, "/root/testdata/sf0.001", "events"))
    .localCheckpoint()
  private lazy val api = new GraftApi(spark, l3)
  private lazy val cat = Analytics.catalog(l3, spark).collect()

  test("availableExchanges == catalog's distinct exchange names") {
    val got = api.availableExchanges().collect().map(_.getString(0)).sorted
    val want = cat.map(_.getAs[String]("exchange")).distinct.sorted
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  private def num(r: org.apache.spark.sql.Row, c: String): Long =
    r.getAs[Number](c).longValue()

  test("availablePairs == catalog's pair names for the exchange") {
    val exchangeIds = cat.map(num(_, "exchange_id")).distinct
    assert(exchangeIds.nonEmpty)
    exchangeIds.foreach { ex =>
      val got = api.availablePairs(ex.toInt).collect()
        .map(_.getString(0)).sorted
      val want = cat.filter(num(_, "exchange_id") == ex)
        .map(_.getAs[String]("pair")).distinct.sorted
      assert(got.toSeq == want.toSeq, s"exchange $ex")
    }
    // an exchange with no data yields an empty frame, not an error
    assert(api.availablePairs(99).count() == 0)
  }

  test("availablePeriod == catalog's covered period for the pair") {
    val keys = cat.map(r => (num(r, "exchange_id"), num(r, "pair_id")))
    assert(keys.nonEmpty)
    keys.foreach { case (ex, p) =>
      val row = api.availablePeriod(ex.toInt, p.toInt).collect()(0)
      val want = cat.find(r => num(r, "exchange_id") == ex &&
        num(r, "pair_id") == p).get
      assert(row.getLong(0) == num(want, "period_start") &&
        row.getLong(1) == num(want, "period_end"),
        s"exchange $ex pair $p")
    }
  }
}
