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
