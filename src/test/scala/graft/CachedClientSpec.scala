package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.market.Level3Source

/** The client cache must return exactly what the uncached API returns
  * (starting book + changes), while coalescing cached periods across
  * overlapping requests — the reference R-client's split-cache design
  * (`R/obanalytics.R:366-407`).
  */
class CachedClientSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cached-client")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cached depth == uncached depth across overlapping windows") {
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
      .localCheckpoint(false)
    val api = GraftApi(spark, l3)
    val bounds = l3.agg(
      org.apache.spark.sql.functions.min("microtimestamp"),
      org.apache.spark.sql.functions.max("microtimestamp")).head()
    val (t0, t1) = (bounds.getLong(0), bounds.getLong(1))
    val mid = t0 + (t1 - t0) / 2
    val q1 = (t0 + (t1 - t0) / 4, mid)
    val q2 = (t0 + (t1 - t0) / 3, mid + (t1 - t0) / 4) // overlaps q1

    val client = api.cachedClient(clock = () => t1 + 3600L * 1000000)

    def canon(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).sortBy(_.toString)

    Seq(q1, q2, q1).foreach { case (s, e) =>
      assert(canon(client.depth(s, e)) ==
        canon(api.depth(s, e).collect().toSeq),
        s"window [$s, $e]")
    }
    // the two overlapping windows coalesced into one cached period
    assert(client.cachedPeriods.size == 1)
    val (ps, pe) = client.cachedPeriods.head
    assert(ps <= q1._1 + 1 && pe >= q2._2)
  }
}
