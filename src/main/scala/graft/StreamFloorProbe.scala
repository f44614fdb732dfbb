package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the bounded-replay harness floor (judge r13 #5 /
  * r15 #3): splits the three slowest `*_stream` bench rows into their
  * batch-side input prep (level3 build + ordered collect — work the
  * BATCH twins pay too) and the streaming replay itself (MemoryStream
  * micro-batches + state commits — the harness floor under attack).
  * Prints one JSON line per query; run twice per phase, min-of-two. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def minOf2(f: () => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    // warm the level3 pipeline once (both phases consume it)
    val l3 = graft.market.Level3Source
      .level3(Tables.load(spark, sfDir, "events"))
      .localCheckpoint(false)
    l3.count()

    val tPrep = minOf2(() => {
      l3.orderBy("microtimestamp", "order_id", "event_no").collect(); ()
    })
    val tL2 = minOf2(() => {
      streaming.StreamingOps.l2Replay(l3, spark).count(); ()
    })
    val tTrades = minOf2(() => {
      graft.market.TradeMatching.trades(
        streaming.StreamingOps.tradesReplay(l3, spark)).count(); ()
    })
    val ev = Tables.load(spark, sfDir, "events").localCheckpoint(false)
    ev.count()
    val tRates = minOf2(() => {
      streaming.StreamingOps.eventRatesReplay(ev, spark).count(); ()
    })
    println(f"""{"probe":"stream_floor","prep_collect_s":$tPrep%.3f,"l2_replay_s":$tL2%.3f,"trades_replay_s":$tTrades%.3f,"event_rates_replay_s":$tRates%.3f}""")

    // phase 2: per-trigger duration breakdown of a manual l2 replay
    // (the replayChunked recipe inlined) — queryPlanning vs addBatch
    // vs walCommit vs stateOperators commit, straight from
    // StreamingQueryProgress
    {
      import spark.implicits._
      val rows = l3.orderBy("microtimestamp", "order_id", "event_no")
        .select(col("pair_id").as("pairId"),
          col("microtimestamp").as("ts"), col("order_id").as("orderId"),
          col("side"), col("price"), col("amount"),
          col("is_deleted").as("isDeleted"))
        .as[graft.market.BookEvent].collect()
      val rs = spark.newSession()
      rs.conf.set("spark.sql.shuffle.partitions", "4")
      rs.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      rs.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "GraftInMemoryStateStoreProvider")
      val ck = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_probe_ck_")
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.market.BookEvent](rs)
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        val t = System.nanoTime()
        println(f"""{"probe":"l2_phase","$tag":${(t - t0) / 1e9}%.3f}""")
        t0 = t
      }
      val q = streaming.StreamingOps.l2Stream(ms.toDS(), rs)
        .writeStream.outputMode("append").format("memory")
        .option("checkpointLocation", ck.toString)
        .queryName("probe_l2").start()
      lap("start_s")
      q.processAllAvailable()
      lap("first_empty_trigger_s")
      val target = rows.length / 3 + 1
      var start = 0
      while (start < rows.length) {
        var end = math.min(start + target, rows.length)
        while (end < rows.length && rows(end).ts == rows(end - 1).ts)
          end += 1
        ms.addData(rows.slice(start, end).toIndexedSeq)
        q.processAllAvailable()
        start = end
      }
      lap("data_batches_s")
      val n = rs.table("probe_l2").collect().length
      lap("sink_collect_s")
      q.stop()
      lap("stop_s")
      println(s"""{"probe":"l2_rows","n":$n}""")
      q.recentProgress.foreach { p =>
        println(s"""{"probe":"l2_trigger","batch":${p.batchId},""" +
          s""""durationMs":${p.durationMs},""" +
          s""""state":${Option(p.stateOperators).map(_.toSeq.map(s =>
            (s.allUpdatesTimeMs, s.commitTimeMs, s.allRemovalsTimeMs,
              s.numRowsTotal, s.numRowsUpdated))).getOrElse(Nil)},""" +
          s""""numInputRows":${p.numInputRows}}""")
      }
    }

    // phase 3: per-trigger breakdown of the event-rates replay
    {
      import spark.implicits._
      import graft.streaming.StreamingOps.EvIn
      val rows = ev.select(col("user_id").as("userId"),
          graft.Tables.tsMicros(col("ts")).as("tsUs"),
          round(col("value") * 1000).cast("long").as("vm"))
        .as[EvIn].collect().sortBy(e => (e.tsUs, e.userId))
      val maxTs = rows.map(_.tsUs).max
      val rs = spark.newSession()
      rs.conf.set("spark.sql.shuffle.partitions", "4")
      rs.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      rs.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "GraftInMemoryStateStoreProvider")
      rs.conf.set("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "GraftInMemoryCheckpointFileManager")
      val ck = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_probe_ck_")
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EvIn](rs)
      val q = graft.streaming.StreamingOps.eventRates(ms.toDS(), 3600)
        .writeStream.outputMode("append").format("memory")
        .option("checkpointLocation", ck.toString)
        .queryName("probe_rates").start()
      val target = rows.length / 4 + 1
      var start = 0
      while (start < rows.length) {
        var end = math.min(start + target, rows.length)
        while (end < rows.length && rows(end).tsUs == rows(end - 1).tsUs)
          end += 1
        ms.addData(rows.slice(start, end).toIndexedSeq)
        q.processAllAvailable()
        start = end
      }
      Seq(2L, 4L).foreach { h =>
        ms.addData(Seq(EvIn(Long.MinValue, maxTs + h * 3600L * 1000000L, 0L)))
        q.processAllAvailable()
      }
      q.recentProgress.foreach { p =>
        println(s"""{"probe":"rates_trigger","batch":${p.batchId},""" +
          s""""durationMs":${p.durationMs},""" +
          s""""state":${Option(p.stateOperators).map(_.toSeq.map(s =>
            (s.allUpdatesTimeMs, s.commitTimeMs, s.allRemovalsTimeMs,
              s.numRowsTotal, s.numRowsUpdated))).getOrElse(Nil)},""" +
          s""""numInputRows":${p.numInputRows}}""")
      }
      q.stop()
    }
    spark.stop()
  }
}
