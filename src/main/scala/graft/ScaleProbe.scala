package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.market.{Level3Source, MarketOps}

/** Scale probe: replicate the sf0.1 event stream K× (new user ids →
  * new order streams and pairs, so the replay group count grows with
  * the data — the realistic 100 TB shape where pair×slice parallelism
  * absorbs volume), then time the level3 build + L1 replay end to end.
  *
  * `java ... graft.ScaleProbe [K] [sliceHours]` → one JSON line.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 50
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
        col("event_type"),
        col("value"),
        col("props"))
    val nEvents = events.count()

    def timed(f: => Long): (Long, Double) = {
      val t = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t) / 1e9)
    }

    // level3 build alone (materialize every column, defeat pruning)
    val (_, tL3) = timed(Level3Source.level3(events).rdd.count())

    // (a) as-is: 3 pairs (the skewed worst case) — sliced replay keeps
    // parallelism = pairs × slices. First pass absorbs JIT warmup.
    MarketOps.spread(Level3Source.level3(events), spark, sliceMicros).count()
    val (ticks, secs) = timed(
      MarketOps.spread(Level3Source.level3(events), spark, sliceMicros).count())

    // (b) multi-instrument shape: one pair per user block
    val l3p = Level3Source.level3(events)
      .withColumn("pair_id",
        (expr("order_id div 1000") % 150 + 1).cast("int"))
    val (ticksP, secsP) = timed(MarketOps.spread(l3p, spark, sliceMicros).count())

    println(f"""{"events":$nEvents,"slice_micros":$sliceMicros,"level3_build_sec":$tL3%.1f,"skewed_3_pairs":{"l1_ticks":$ticks,"seconds":$secs%.1f,"events_per_sec":${(nEvents / secs).toLong}},"parallel_150_pairs":{"l1_ticks":$ticksP,"seconds":$secsP%.1f,"events_per_sec":${(nEvents / secsP).toLong}}}""")
    spark.stop()
  }
}
