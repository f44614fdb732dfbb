package graft.market

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency resampling — the reference's `p_frequency` parameter
  * (`get._date_floor/_date_ceiling`, `db/get_schema.sql:60-87`;
  * right-closed sampling convention `R/obanalytics.R:249-253`): a
  * sampled row carries the state at the *end* of its window, windows
  * are aligned up (ceiling) to the grid. All grid arithmetic is exact
  * integer µs math.
  */
object Resampling {

  /** Right-closed resample: the last row per (keys, ceil-aligned
    * bucket) — the state prevailing at each grid instant that saw at
    * least one tick. */
  def lastPerBucket(df: DataFrame, tsCol: String, freqMicros: Long,
      keys: Seq[String]): DataFrame = {
    // ceiling alignment in exact integer µs (boundary values stay)
    val bucketed = df.withColumn("bucket_ts",
      expr(s"(($tsCol + ${freqMicros - 1}) div $freqMicros) * $freqMicros"))
    val w = Window.partitionBy((keys :+ "bucket_ts").map(col): _*)
      .orderBy(col(tsCol).desc)
    bucketed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", tsCol)
  }

  /** Hourly-resampled L1 spread (reference `get.spread` with
    * `p_frequency := '1 hour'`). */
  def spreadResampled(level3: DataFrame, spark: SparkSession,
      freqMicros: Long): DataFrame =
    lastPerBucket(MarketOps.spread(level3, spark), "ts", freqMicros,
      Seq("pair_id"))
      .select(col("pair_id").cast("long").as("pair_id"),
        col("bucket_ts").as("ts"), col("bid_price"), col("bid_qty"),
        col("ask_price"), col("ask_qty"))

  /** Era-reset spread: the book is rebuilt from empty at each era start
    * (reference `order_book_by_episode` partitions replay by era,
    * `db/obanalytics_schema.sql:2104-2124` — books never cross eras). */
  def spreadByEra(level3: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    Level3Source.level3WithEras(level3)
      .select(
        col("pair_id").as("pairId"), col("era_no").as("eraNo"),
        col("microtimestamp").as("ts"), col("order_id").as("orderId"),
        col("side"), col("price"), col("amount"),
        col("is_deleted").as("isDeleted"), col("event_id"))
      .as[BookEventE]
      .groupByKey(e => (e.pairId, e.eraNo))
      .flatMapSortedGroups($"ts", $"event_id") { case ((pair, era), it) =>
        Replay.l1(pair, it.map(_.toBookEvent)).map(t =>
          L1TickE(pair, era, t.ts, t.bid_price, t.bid_qty,
            t.ask_price, t.ask_qty))
      }
      .toDF()
  }
}

/** Book event tagged with its reconstruction era. */
case class BookEventE(pairId: Int, eraNo: Long, ts: Long, orderId: Long,
    side: String, price: Double, amount: Double, isDeleted: Boolean,
    event_id: Long) {
  def toBookEvent: BookEvent =
    BookEvent(pairId, ts, orderId, side, price, amount, isDeleted)
}

/** L1 tick tagged with its era. */
case class L1TickE(pair_id: Int, era_no: Long, ts: Long,
    bid_price: Option[Double], bid_qty: Option[Double],
    ask_price: Option[Double], ask_qty: Option[Double])
