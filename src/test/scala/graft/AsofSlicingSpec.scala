package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.market.AsofSlicing

/** AsofSlicing.carry must equal the monolithic per-pair window it
  * replaces, including null-carry ticks, slice-boundary ties, and
  * slices with no ticks at all. */
class AsofSlicingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-asof")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sliced as-of carry ≡ whole-pair window (boundary ties, null gaps)") {
    val spark0 = spark
    import spark0.implicits._
    val W = 100L // tiny slices to force many boundaries
    // pair 1: ticks with alternating null bids (ignoreNulls must reach
    // across slices); events at exact boundaries (ties with seeds);
    // pair 2: a single tick then a long tickless run of events.
    val rows =
      // (pair_id, ts, kind, tick_bid, tick_ask)
      Seq(
        (1L, 5L, 1, Some(10.0), Some(11.0)),
        (1L, 100L, 0, None, None), // boundary event: sees ts=5 tick
        (1L, 150L, 1, None, Some(12.0)), // null bid: bid carries from ts=5
        (1L, 199L, 0, None, None),
        (1L, 200L, 1, Some(9.0), None), // boundary tick, slice 2
        (1L, 200L, 0, None, None), // same-ts event: kind 0 < 1 → older tick
        (1L, 405L, 0, None, None), // slice 4: no tick since slice 2
        (2L, 50L, 1, Some(5.0), Some(6.0)),
        (2L, 950L, 0, None, None), // 9 empty slices between tick and event
        (2L, 20L, 0, None, None) // before any tick: nulls
      ).toDF("pair_id", "ts", "kind", "tick_bid", "tick_ask")
      .withColumn("tick_bid", col("tick_bid").cast("double"))
      .withColumn("tick_ask", col("tick_ask").cast("double"))

    val wAsof = Window.partitionBy("pair_id").orderBy("ts", "kind")
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = rows
      .withColumn("bb", last("tick_bid", ignoreNulls = true).over(wAsof))
      .withColumn("ba", last("tick_ask", ignoreNulls = true).over(wAsof))
      .filter(col("kind") === 0)
      .select("pair_id", "ts", "bb", "ba")
      .orderBy("pair_id", "ts")
      .collect().toSeq

    val got = AsofSlicing.carry(rows, Seq("tick_bid", "tick_ask"), W)
      .filter(col("kind") === 0)
      .select(col("pair_id"), col("ts"),
        col("tick_bid_asof").as("bb"), col("tick_ask_asof").as("ba"))
      .orderBy("pair_id", "ts")
      .collect().toSeq

    assert(got === expected)
  }
}
