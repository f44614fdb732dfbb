package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.relational.CoreQueries

/** Task-memory probe for the batch funnel's per-user fold: the
  * 100×-scale hazard is ONE pathological user (a bot) holding the
  * corpus's events, which under a `collect_list`-per-user plan
  * becomes a single multi-GB aggregation buffer in one task. The
  * shipped fold (`CoreQueries.funnelOf`) is a sorted-group greedy
  * scan with four longs of per-user state, so its peak task memory
  * must be FLAT in user skew (sorting is external/spillable and
  * page-sized).
  *
  * Fixture: n funnel events, (a) spread uniformly over n/200 users
  * vs (b) all on one user. For each distribution the probe runs the
  * shipped fold and, for contrast, the superseded collect_list shape,
  * recording max per-task `peakExecutionMemory` plus spill bytes via
  * a listener. The force-spill threshold is pinned low (64k rows) so
  * the claim is DEMONSTRATED, not asserted: the fold's only per-task
  * memory is the shuffle sorter's — MANAGED pages that spill on
  * pressure (hot arm: flat peak + nonzero spill, correct answer) —
  * while the collect_list arm reports peak 0 because its per-group
  * ArrayBuffer is UNMANAGED JVM heap the memory manager cannot see or
  * spill, which is exactly the at-scale OOM hazard the fold removes.
  *
  * Usage: FunnelSkewProbe [n].
  */
object FunnelSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force the external sorter to spill every 64k rows: the hot
      // arm then proves the fold is spill-bounded (flat peak, spill
      // bytes) instead of merely not-yet-OOM at this n
      .config("spark.shuffle.spill.numElementsForceSpillThreshold",
        "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val peak = new AtomicLong(0L)
    val spilled = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        Option(te.taskMetrics).foreach { m =>
          peak.updateAndGet(x => math.max(x, m.peakExecutionMemory))
          spilled.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    def events(oneUser: Boolean): DataFrame = {
      val users = math.max(1, n / 200).toLong
      spark.range(n.toLong).select(
        (if (oneUser) lit(0L) else col("id") % users).as("user_id"),
        element_at(
          array(lit("signup"), lit("view"), lit("click"), lit("purchase")),
          (col("id") % 4 + 1).cast("int")).as("event_type"),
        (col("id") % 4 * 1000000L + col("id")).as("t"))
    }

    // the superseded shape's memory profile: collect_list buffers the
    // hot user's WHOLE event list in one aggregation buffer (the full
    // chained-HOF version is additionally quadratic per user — each
    // filter lambda re-evaluates the inlined t(k−1) array_min per
    // element after CollapseProject — so the contrast arm keeps just
    // the buffer + one linear array_min, isolating the memory axis)
    def buffered(ev: DataFrame): DataFrame =
      ev.groupBy("user_id")
        .agg(collect_list(struct(col("t"), col("event_type").as("ty")))
          .as("evs"))
        .withColumn("t1", expr(
          "array_min(transform(filter(evs, e -> e.ty = 'signup'), e -> e.t))"))
        .agg(sum(when(col("t1").isNotNull, 1)).as("s1"))

    def run(name: String, df: => DataFrame): (Double, Long, Long) = {
      peak.set(0L); spilled.set(0L)
      val t0 = System.nanoTime()
      val rows = df.collect()
      require(rows.nonEmpty, s"$name returned no rows")
      ((System.nanoTime() - t0) / 1e9, peak.get(), spilled.get())
    }

    run("warmup", CoreQueries.funnelOf(events(oneUser = false)))

    val (tu, mu, su) = run("fold_uniform",
      CoreQueries.funnelOf(events(oneUser = false)))
    val (th, mh, sh) = run("fold_hot",
      CoreQueries.funnelOf(events(oneUser = true)))
    val (bu, mbu, _) = run("buffered_uniform", buffered(events(oneUser = false)))
    val (bh, mbh, _) = run("buffered_hot", buffered(events(oneUser = true)))

    val mb = 1024.0 * 1024.0
    println(f"""{"n":$n,"fold_uniform":{"s":$tu%.2f,"peak_mb":${mu / mb}%.1f,"spill_mb":${su / mb}%.1f},"fold_hot":{"s":$th%.2f,"peak_mb":${mh / mb}%.1f,"spill_mb":${sh / mb}%.1f},"buffered_uniform":{"s":$bu%.2f,"unmanaged_peak_mb":${mbu / mb}%.1f},"buffered_hot":{"s":$bh%.2f,"unmanaged_peak_mb":${mbh / mb}%.1f},"fold_mem_ratio":${mh.toDouble / math.max(1L, mu)}%.2f}""")
    spark.stop()
  }
}
