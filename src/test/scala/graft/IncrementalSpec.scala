package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.market.Level3Source

/** Incremental (month-boundary) level3 building: building batch by
  * batch with carried open-order state must equal building the whole
  * stream at once, for any cut — the property that lets the 100 TB
  * lake build month by month (reference `v_open_orders` +
  * `level3_incorporate_new_event`). */
class IncrementalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-incr")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("microtimestamp", "order_id", "event_no", "side", "price",
      "amount", "fill", "next_microtimestamp", "is_deleted",
      "price_microtimestamp", "price_event_no", "pair_id", "event_id")
      .orderBy("event_id").collect().map(_.toSeq).toList

  test("incremental build == full build across several cut points") {
    val events = Tables.load(spark, dir, "events")
    val full = rows(Level3Source.level3(events))
    // mid-data, near the start (almost everything continues), near the
    // end (almost everything carried), and exactly on an event ts
    val someTs = Level3Source.level3(events)
      .select("microtimestamp").orderBy("microtimestamp")
      .collect()(500).getLong(0)
    for (cut <- Seq(Oracles.SnapshotMicros, Oracles.T0, Oracles.T1, someTs)) {
      val incr = rows(Level3Source.incrementalLevel3(events, cut))
      assert(incr == full, s"incremental build diverged at cut $cut")
    }
  }
}
