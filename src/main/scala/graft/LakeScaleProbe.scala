package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Measurement harness for the level3 lake's SCALE story: builds a
  * multi-month lake (the one-month synthetic frame time-shifted into
  * `months` disjoint months — ids offset so chains stay unique; a
  * probe-only enlargement, oracle rows always read the real frame)
  * and measures what the reference's partition layout
  * (`db/obanalytics_schema.sql:153,325-448`) buys a reader:
  *
  *   - full-lake scan (the no-layout baseline);
  *   - one-month slice (directory pruning on `month`);
  *   - one (exchange, pair, month) subtree (full directory pruning);
  *   - snapshot predicate only (row-group min/max skipping on the
  *     time-sorted `microtimestamp` — no partition predicate).
  *
  * Reports wall seconds (min of two) AND the scan's `numFiles` metric
  * — the file count is the quantity that matters at 100 TB, where an
  * unpruned listing alone dominates. AQE off so the
  * FileSourceScanExec metrics are directly readable.
  *
  * Usage: LakeScaleProbe <sfDir> [months]
  */
object LakeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val months = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val l3 = market.Level3Source.level3(Tables.load(spark, sfDir, "events"))
      .localCheckpoint()
    val monthUs = 31L * 24 * 3600 * 1000000L
    val idStep = 1000000000L
    val shifted = (0 until months).map { m =>
      l3.select(
        (col("microtimestamp") + m * monthUs).as("microtimestamp"),
        (col("order_id") + m * idStep).as("order_id"),
        col("event_no"), col("side"), col("price"), col("amount"),
        col("fill"),
        (col("next_microtimestamp") + m * monthUs).as("next_microtimestamp"),
        col("is_deleted"),
        (col("price_microtimestamp") + m * monthUs).as("price_microtimestamp"),
        col("price_event_no"), col("pair_id"), col("exchange_id"),
        (col("event_id") + m * idStep).as("event_id"))
    }.reduce(_ unionByName _)
    val path = java.nio.file.Files
      .createTempDirectory("graft_lakescale").toString
    storage.Lake.writeLevel3(shifted, path)

    val lake = spark.read.parquet(path)
    val t0 = l3.agg(min("microtimestamp")).head().getLong(0) + 3600L * 1000000L
    val firstMonth = lake.select(min("month")).head().getString(0)

    def measure(label: String)(mk: => org.apache.spark.sql.DataFrame)
        : Unit = {
      // fresh frame per run: metrics live on the executed plan
      // instance, and the df's OWN plan must run for its scan metrics
      // to fill (df.count() builds a separate aggregate execution)
      def once(): (Double, Long, Long) = {
        val df = mk
        val t = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        val s = (System.nanoTime() - t) / 1e9
        val files = df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f.metrics("numFiles").value
        }.sum
        (s, n, files)
      }
      once()
      val (s, n, files) = once()
      println(f"$label%-34s ${s}%8.3fs  rows=$n%-9d files=$files")
    }

    println(s"lake: $months months, ${lake.count()} events, " +
      s"${lake.inputFiles.length} files total")
    def fresh() = spark.read.parquet(path)
    measure("full scan")(fresh())
    measure("one month (dir prune)")(
      fresh().filter(col("month") === firstMonth))
    measure("one (exch,pair,month) subtree")(
      fresh().filter(col("exchange_id") === 1 && col("pair_id") === 1 &&
        col("month") === firstMonth))
    measure("snapshot (row-group skip only)")(
      fresh().filter(col("microtimestamp") <= t0 &&
        col("next_microtimestamp") > t0))
    measure("snapshot + subtree (both)")(
      fresh().filter(col("exchange_id") === 1 && col("pair_id") === 1 &&
        col("month") === firstMonth &&
        col("microtimestamp") <= t0 && col("next_microtimestamp") > t0))
    spark.stop()
  }
}
