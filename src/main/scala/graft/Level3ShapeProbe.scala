package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.tsMicros

/** r17 A/B probe for the [[graft.market.Level3Source.level3]]
  * single-exchange rewrite: the r16 builder paid three shuffles
  * (user_id → order_id → (order_id, price_group)); the r17 shape
  * computes every per-order and per-chain quantity inside the ONE
  * user_id window pass (two chained WindowExecs, same spec). This
  * probe inlines the r16 shape verbatim, asserts row-set parity via
  * exceptAll both ways, and prints min-of-two walls for both through
  * the noop sink. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java ... graft.Level3ShapeProbe`
  */
object Level3ShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = Tables.load(spark, sfDir, "events").localCheckpoint(false)
    events.count()

    // the r16 three-shuffle shape, inlined verbatim
    def oldShape(ev: DataFrame): DataFrame = {
      val base = ev.select(
        col("event_id"),
        tsMicros(col("ts")).as("microtimestamp"),
        col("user_id"),
        ((col("user_id") % 3) + 1).cast("int").as("pair_id"),
        when(col("user_id") % 2 === 0, "b").otherwise("s").as("side"),
        when(col("user_id") % 2 === 0, col("value"))
          .otherwise(col("value") + 80.0).as("price"),
        ((col("event_id") % 20) + 1).cast("double").as("amount"),
        when(col("event_type") === "error", 1).otherwise(0).as("del_flag"))
      val wUser = Window.partitionBy("user_id")
        .orderBy("microtimestamp", "event_id")
      val withOrder = base.withColumn(
        "order_id",
        col("user_id") * 1000 + coalesce(
          sum("del_flag").over(
            wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val wOrd = Window.partitionBy("order_id")
        .orderBy("microtimestamp", "event_id")
      val evt = withOrder
        .withColumn("event_no", row_number().over(wOrd))
        .withColumn("prev_amount", lag("amount", 1).over(wOrd))
        .withColumn("lead_ts", lead("microtimestamp", 1).over(wOrd))
        .withColumn("prev_price", lag("price", 1).over(wOrd))
        .withColumn("price_chg",
          when(col("prev_price").isNull ||
            col("price") =!= col("prev_price"), 1).otherwise(0))
        .withColumn("price_group",
          sum("price_chg").over(
            wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      val wChain = Window.partitionBy("order_id", "price_group")
      evt.select(
        col("microtimestamp"), col("order_id"), col("event_no"),
        col("side"), col("price"), col("amount"),
        when(col("prev_amount") > col("amount"),
          col("prev_amount") - col("amount")).as("fill"),
        when(col("del_flag") === 1, col("microtimestamp"))
          .otherwise(coalesce(col("lead_ts"),
            lit(graft.market.Level3Source.AliveMicros)))
          .as("next_microtimestamp"),
        (col("del_flag") === 1).as("is_deleted"),
        min("microtimestamp").over(wChain).as("price_microtimestamp"),
        min("event_no").over(wChain).as("price_event_no"),
        col("pair_id"),
        graft.market.Dimensions.exchangeOfPair(col("pair_id"))
          .as("exchange_id"),
        col("event_id"))
    }

    def newShape(ev: DataFrame): DataFrame =
      graft.market.Level3Source.level3(ev)

    // parity first: identical row sets (and schema) both ways
    val a = oldShape(events)
    val b = newShape(events)
    require(a.schema.map(f => (f.name, f.dataType)) ==
      b.schema.map(f => (f.name, f.dataType)),
      s"schema drift:\n${a.schema}\n${b.schema}")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"""{"probe":"level3_shape","row_diff":$diff,"rows":${b.count()}}""")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def minOf2(f: () => DataFrame): Double = {
      noop(f())
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(f())
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val tOld = minOf2(() => oldShape(events))
    val tNew = minOf2(() => newShape(events))
    println(f"""{"probe":"level3_shape","old_3x_s":$tOld%.3f,"new_1x_s":$tNew%.3f,"ratio":${tOld / tNew}%.3f}""")
    spark.stop()
  }
}
