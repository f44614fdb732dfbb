package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.market.{Level3Source, MarketOps}
import graft.sources.DepthCsv

/** The standalone CSV tier must round-trip: engine depth changes
  * written in the reference's file format (seconds, price, volume,
  * bid|ask — `src/obanalytics_standalone.cpp:59-85`), read back via
  * the schema'd CSV source, and piped through the depth-consuming L1
  * kernel must reproduce the spread computed from the original level3
  * log.
  */
class DepthCsvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-depth-csv")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("csv depth round-trip: spread_from_depth == level3 spread") {
    val dir = "/root/testdata/sf0.001"
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
      .filter(col("pair_id") === 1)
      .localCheckpoint(false)
    // engine depth changes → the reference's standalone CSV format
    val csvDir = java.nio.file.Files.createTempDirectory("graft-dcsv").toString
    MarketOps.depthChanges(l3, spark)
      .select((col("ts").cast("double") / 1000000.0).as("t"),
        col("price"), col("volume"),
        when(col("side") === "b", "bid").otherwise("ask").as("side"))
      .select("t", "price", "volume", "side")
      .coalesce(1)
      .write.mode("overwrite").csv(csvDir)

    val depth = DepthCsv.read(spark, csvDir, pairId = 1L)
    assert(depth.count() > 0)
    val fromCsv = DepthCsv.spreadFromDepth(depth, spark)
      .select("ts", "bid_price", "bid_qty", "ask_price", "ask_qty")
      .orderBy("ts").collect().map(_.toSeq).toList
    val fromL3 = MarketOps.spread(l3, spark)
      .filter(col("pair_id") === 1)
      .select("ts", "bid_price", "bid_qty", "ask_price", "ask_qty")
      .orderBy("ts").collect().map(_.toSeq).toList
    assert(fromCsv.nonEmpty && fromCsv == fromL3)
  }
}
