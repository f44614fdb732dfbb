package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop plan probe for the LEVEL3 LAKE scan side: builds the lake
  * (`Lake.writeLevel3` — the reference's partitioned, time-sorted
  * storage layout, `db/obanalytics_schema.sql:153,325-448`) and prints
  * the formatted plans that prove the two scan properties the layout
  * exists for:
  *   1. directory-level pruning — `PartitionFilters` on
  *      (exchange_id, pair_id, month);
  *   2. row-group skipping — `PushedFilters` on `microtimestamp`
  *      against the time-sorted files' min/max stats.
  * The captured output lives in docs/PLANS.md next to the
  * `mkt_ob_lake` / `mkt_spread_lake` oracle rows.
  *
  * Usage: PlanProbe <sfDir>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val l3 = market.Level3Source.level3(Tables.load(spark, sfDir, "events"))
      .localCheckpoint()
    val path = java.nio.file.Files
      .createTempDirectory("graft_planprobe_l3").toString
    storage.Lake.writeLevel3(l3, path)

    val lake = spark.read.parquet(path)
    val months = lake.select("month").distinct()
      .orderBy("month").collect().map(_.getString(0))
    println(s"lake months: ${months.mkString(", ")}")

    println("=== one-(exchange,pair,month) subtree + time predicate ===")
    lake.filter(col("exchange_id") === 1 && col("pair_id") === 1 &&
        col("month") === months.head &&
        col("microtimestamp") <= Oracles.SnapshotMicros)
      .select("microtimestamp", "order_id", "event_no", "side", "price",
        "amount")
      .explain("formatted")

    println("=== mkt_ob_lake (order_book over the lake read) ===")
    market.MarketOps.orderBookQuery(
        storage.Lake.readLevel3(spark, path), Oracles.SnapshotMicros)
      .explain("formatted")

    println("=== one-exchange read (venue-level directory pruning) ===")
    val counts = lake.groupBy("exchange_id").count()
      .orderBy("exchange_id").collect()
      .map(r => s"exchange ${r.get(0)}: ${r.getLong(1)} events")
    println(counts.mkString("; "))
    lake.filter(col("exchange_id") === 2)
      .select("pair_id", "microtimestamp", "order_id", "price", "amount")
      .explain("formatted")

    spark.stop()
  }
}
