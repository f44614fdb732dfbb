package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.market.{AsofSlicing, Level3Source, MarketOps}

/** Scale probe for the sliced as-of carry (AsofSlicing): replicate the
  * sf0.1 stream K× on the skewed 3-pair shape (all volume in 3 window
  * partitions — the worst case the slicing exists for), build the
  * events∪ticks stream that `get.events` / `fix_crossed` /
  * `depth.changes` enrich, and time the carry both ways:
  * whole-pair window (one task per pair) vs per-(pair, slice) with
  * cross-slice seeds. Also asserts the two agree (row count + value
  * checksum) at probe scale.
  *
  * `java ... graft.AsofProbe [K] [sliceHours]` → one JSON line.
  */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 20
    val sliceMicros =
      if (args.length > 1) args(1).toLong * 3600L * 1000000
      else MarketOps.DefaultSliceMicros
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val copies = broadcast((0 until k).toDF("copy"))
    val events = base.crossJoin(copies)
      .select(
        (col("event_id") * k + col("copy")).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * 10000).as("user_id"),
        col("event_type"), col("value"), col("props"))

    val l3 = Level3Source.level3(events).localCheckpoint(false)
    val ticks = MarketOps.spread(l3, spark).localCheckpoint(false)

    // the get.events enrichment stream: every level3 row (kind 0) ∪
    // every L1 tick (kind 1) carrying the quote
    val evSide = l3.select(col("pair_id").cast("long").as("pair_id"),
      col("microtimestamp").as("ts"), lit(0).as("kind"),
      lit(null).cast("double").as("tick_bid"),
      lit(null).cast("double").as("tick_ask"))
    val tickSide = ticks.select(col("pair_id").cast("long").as("pair_id"),
      col("ts"), lit(1).as("kind"),
      col("bid_price").as("tick_bid"), col("ask_price").as("tick_ask"))
    val stream = evSide.unionByName(tickSide).localCheckpoint(false)
    val nRows = stream.count()

    def timed(f: => Long): (Long, Double) = {
      val t = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t) / 1e9)
    }
    def checksum(d: org.apache.spark.sql.DataFrame): Long =
      d.filter(col("kind") === 0)
        .agg(sum(hash(col("pair_id"), col("ts"), col("bb"), col("ba"))))
        .head().getLong(0)

    val wAsof = Window.partitionBy("pair_id").orderBy("ts", "kind")
      .rowsBetween(Window.unboundedPreceding, 0)
    def mono = stream
      .withColumn("bb", last("tick_bid", ignoreNulls = true).over(wAsof))
      .withColumn("ba", last("tick_ask", ignoreNulls = true).over(wAsof))
    def sliced = AsofSlicing.carry(stream, Seq("tick_bid", "tick_ask"),
        sliceMicros)
      .withColumn("bb", col("tick_bid_asof"))
      .withColumn("ba", col("tick_ask_asof"))

    sliced.rdd.count() // JIT warmup
    val (nS, tS) = timed(sliced.rdd.count())
    val (nM, tM) = timed(mono.rdd.count())
    val (csS, csM) = (checksum(sliced), checksum(mono))
    require(csS == csM, s"sliced/monolithic checksum mismatch: $csS vs $csM")

    println(f"""{"rows":$nRows,"k":$k,"slice_micros":$sliceMicros,"agree":true,"sliced":{"rows":$nS,"seconds":$tS%.1f,"rows_per_sec":${(nRows / tS).toLong}},"monolithic":{"rows":$nM,"seconds":$tM%.1f,"rows_per_sec":${(nRows / tM).toLong}}}""")
    spark.stop()
  }
}
