package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.market.{BookEvent, Level3Source, MarketOps}
import graft.streaming.StreamingOps

/** Fast/slow twin differentials inside Spark (the reference keeps dual
  * implementations of its core operators for exactly this purpose,
  * `db/obanalytics_schema.sql:1225-1267`): the replay kernel vs the
  * declarative interval-unpivot formulation, and the incremental
  * streaming L2 vs the batch kernel.
  */
class TwinsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-twins")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("pair_id", "ts", "side", "price", "volume")
      .orderBy("pair_id", "ts", "side", "price")
      .collect().map(_.toSeq).toList

  test("kernel depth changes == declarative interval-unpivot twin") {
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
    val kernel = MarketOps.depthChanges(l3, spark)
      .select(col("pair_id").cast("long").as("pair_id"), col("ts"),
        col("side"), col("price"), col("volume"))
    val twin = MarketOps.depthChangesSql(l3)
      .select(col("pair_id").cast("long").as("pair_id"), col("ts"),
        col("side"), col("price"), col("volume"))
    assert(sortedRows(kernel) == sortedRows(twin))
  }

  test("sliced replay == single sequential pass per pair (L1 + L2)") {
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
    // A slice width that forces many boundaries mid-stream (~30 days of
    // data / 6 h slices ≈ 120 boundary seedings per pair).
    val w = 6L * 3600 * 1000000
    val l1Sliced = MarketOps.spread(l3, spark, w)
      .orderBy("pair_id", "ts").collect().map(_.toSeq).toList
    val l1Seq = MarketOps.spreadUnsliced(l3, spark)
      .orderBy("pair_id", "ts").collect().map(_.toSeq).toList
    assert(l1Sliced.nonEmpty && l1Sliced == l1Seq)
    val l2Sliced = sortedRows(MarketOps.depthChanges(l3, spark, w)
      .withColumn("pair_id", col("pair_id").cast("long")))
    val l2Seq = sortedRows(MarketOps.depthChangesUnsliced(l3, spark)
      .withColumn("pair_id", col("pair_id").cast("long")))
    assert(l2Sliced == l2Seq)
  }

  test("streaming L2 == batch kernel L2") {
    import spark.implicits._
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
    val events = l3.select(
      col("pair_id").as("pairId"), col("microtimestamp").as("ts"),
      col("order_id").as("orderId"), col("side"), col("price"),
      col("amount"), col("is_deleted").as("isDeleted"))
    val stage = java.nio.file.Files.createTempDirectory("graft-l2").toString
    events.write.mode("overwrite").parquet(stage)
    val q = StreamingOps.l2Stream(
        spark.readStream.schema(events.schema).parquet(stage).as[BookEvent],
        spark)
      .writeStream.outputMode("append")
      .format("memory").queryName("l2_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = sortedRows(spark.table("l2_out")
      .withColumn("pair_id", col("pair_id").cast("long")))
    val batch = sortedRows(MarketOps.depthChanges(l3, spark)
      .withColumn("pair_id", col("pair_id").cast("long")))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming trade inference == batch mutual-best matching") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    // sf0.01: the band finds 184 matches (sf0.001 is too sparse to be
    // a meaningful differential)
    val l3 = Level3Source.level3(
      Tables.load(spark, "/root/testdata/sf0.01", "events"))
    val fills = l3.filter(col("fill") > 0).select(
      col("pair_id").as("pairId"), col("microtimestamp").as("ts"),
      col("order_id").as("orderId"), col("event_no").as("eventNo"),
      col("side"), col("price"), col("fill"),
      col("price_microtimestamp").as("priceTs"))
    // The watermark only advances between micro-batches, so the stream
    // must arrive as several time-ordered files; two trailing flush
    // rows push the final watermark past every real buy's 2-band
    // decision horizon (band = 1 h, watermark delay = 2 min).
    val maxTs = l3.agg(max("microtimestamp")).collect()(0).getLong(0)
    val minTs = l3.agg(min("microtimestamp")).collect()(0).getLong(0)
    val span = (maxTs - minTs) / 4 + 1
    val stage = java.nio.file.Files.createTempDirectory("graft-tr").toString
    def writeSlice(k: Int, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-trs").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(stage, f"batch$k%04d.parquet"))
    }
    for (k <- 0 until 4)
      writeSlice(k, fills.filter(
        col("ts") >= minTs + k * span && col("ts") < minTs + (k + 1) * span))
    def flushRow(k: Int, ts: Long) = writeSlice(k,
      Seq((999, ts, 0L, 1, "b", 0.0, 1.0, 0L))
        .toDF(fills.columns.toIndexedSeq: _*))
    flushRow(4, maxTs + 4L * 3600 * 1000000)
    flushRow(5, maxTs + 8L * 3600 * 1000000)
    val q = StreamingOps.tradesStream(
        spark.readStream.schema(fills.schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .as[StreamingOps.PairFill], spark)
      .writeStream.outputMode("append")
      .format("memory").queryName("trades_out").start()
    q.processAllAvailable(); q.stop()
    val cols = Seq("pair_id", "microtimestamp", "price", "amount", "side",
      "buy_microtimestamp", "buy_order_id", "buy_event_no",
      "sell_microtimestamp", "sell_order_id", "sell_event_no")
    val streamed = spark.table("trades_out")
      .filter(col("pair_id") =!= 999)
      .select(cols.head, cols.tail: _*)
      .withColumn("buy_event_no", col("buy_event_no").cast("long"))
      .withColumn("sell_event_no", col("sell_event_no").cast("long"))
      .orderBy(cols.map(col): _*).collect().map(_.toSeq).toList
    val batch = market.TradeMatching.inferredMatches(l3)
      .select(cols.head, cols.tail: _*)
      .withColumn("buy_event_no", col("buy_event_no").cast("long"))
      .withColumn("sell_event_no", col("sell_event_no").cast("long"))
      .orderBy(cols.map(col): _*).collect().map(_.toSeq).toList
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("book diff between two instants is consistent with snapshots") {
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
    val diff = MarketOps.bookDiff(l3, Oracles.T0, Oracles.T1)
    val created = diff.filter(col("change") === "created").count()
    val deleted = diff.filter(col("change") === "deleted").count()
    def snapCount(t: Long) = l3.filter(
      col("microtimestamp") <= t && col("next_microtimestamp") > t).count()
    assert(snapCount(Oracles.T1) - snapCount(Oracles.T0) == created - deleted)
  }
}
