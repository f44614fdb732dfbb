package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** The reference's standalone CSV tier
  * (`src/obanalytics_standalone.cpp:59-85`): depth-change rows
  * `(t seconds, price, volume, "bid"|"ask")` read from a file and fed
  * straight into the client kernels (spread-from-depth, resample) —
  * no database anywhere. Here: an explicit-schema `spark.read.csv`
  * (header-free, like the reference's ifstream) normalized to the
  * engine's depth shape, plus the depth-consuming L1 kernel the
  * standalone pipes into ([[spreadFromDepth]], reference
  * `src/obanalytics.cpp:422-544`).
  */
object DepthCsv {

  /** The file format: `t,price,volume,side` with `t` in (possibly
    * fractional) seconds and side spelled `bid`/`ask`. */
  val schema: StructType = StructType(Seq(
    StructField("t", DoubleType),
    StructField("price", DoubleType),
    StructField("volume", DoubleType),
    StructField("side", StringType)))

  /** Read a depth-change CSV into the engine's depth shape
    * (ts µs, side bid|ask, price, volume). The standalone format is a
    * single instrument per file; `pairId` tags the stream so the
    * result unions into multi-pair pipelines. */
  def read(spark: SparkSession, path: String, pairId: Long = 0L): DataFrame =
    spark.read.schema(schema).csv(path)
      .select(lit(pairId).as("pair_id"),
        // round, don't truncate: seconds-as-double is not an exact
        // binary fraction, so t·1e6 can land just below the integer
        round(col("t") * 1000000L).cast("long").as("ts"),
        col("side"), col("price"), col("volume"))

  /** One depth update for the L1 kernel. */
  case class DepthRow(pair_id: Long, ts: Long, side: String, price: Double,
      volume: Double)

  /** L1 tick emitted by [[spreadFromDepth]]. */
  case class DepthL1(pair_id: Long, ts: Long,
      bid_price: Option[Double], bid_qty: Option[Double],
      ask_price: Option[Double], ask_qty: Option[Double])

  /** Client spread-from-depth (reference `src/obanalytics.cpp:422-544`):
    * consume ABSOLUTE-volume depth updates in time order, maintain a
    * price→volume map per side, emit the best bid/ask whenever it
    * changes. Distributed per pair (the standalone runs one series;
    * multi-pair input parallelizes per key). */
  def spreadFromDepth(depth: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    depth.select(col("pair_id").cast("long").as("pair_id"), col("ts"),
        col("side"), col("price"), col("volume"))
      .as[DepthRow]
      .groupByKey(_.pair_id)
      .flatMapSortedGroups($"ts", $"side", $"price") { (pair, it) =>
        val bids = mutable.TreeMap.empty[Double, Double]
        val asks = mutable.TreeMap.empty[Double, Double]
        var last: DepthL1 = null
        val buf = it.buffered
        new Iterator[DepthL1] {
          def hasNext: Boolean = buf.hasNext
          def next(): DepthL1 = {
            // apply one episode (all rows at one ts), then read L1
            val ts = buf.head.ts
            while (buf.hasNext && buf.head.ts == ts) {
              val r = buf.next()
              val m = if (r.side == "bid") bids else asks
              if (r.volume <= 0.0) m.remove(r.price) else m.update(r.price, r.volume)
            }
            val t = DepthL1(pair, ts,
              bids.lastOption.map(_._1), bids.lastOption.map(_._2),
              asks.headOption.map(_._1), asks.headOption.map(_._2))
            if (last == null || t.bid_price != last.bid_price ||
                t.bid_qty != last.bid_qty || t.ask_price != last.ask_price ||
                t.ask_qty != last.ask_qty) {
              last = t; t
            } else if (hasNext) next()
            else null // filtered below
          }
        }.filter(_ != null)
      }
      .toDF()
  }
}
