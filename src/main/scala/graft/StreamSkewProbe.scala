package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** Focused probe for [[StreamingOps.semDedupStream]]'s ingest
  * sub-split guard: the stream's worst case is a hot cell of DISTINCT
  * vectors — every arrival survives, the kept-list grows with the
  * cell, and each arrival's duplicate test scans it, so one group does
  * O(|cell|²) dot products serially. (A hot cell of NEAR-DUPLICATE
  * vectors is cheap — the kept list stays ~1.) The guard splits the
  * group key into (cent_id, vec_id % S): per-group state and scan
  * shrink ×S and the S sub-streams run in parallel tasks.
  *
  * Fixture: n distinct random-ish quantized vectors all assigned to
  * ONE cell (single centroid), replayed in a handful of micro-batches;
  * wall clock at S = 1 vs S = 8. Usage: StreamSkewProbe [n].
  */
object StreamSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // distinct directions: component j of vector i is a small
    // deterministic hash mix, so cosines sit far below any dedup
    // threshold and EVERY arrival is kept — the state worst case
    val d = 16
    val rows: IndexedSeq[StreamingOps.VecOcc] = (0 until n).map { i =>
      val q = (0 until d).map { j =>
        var h = i.toLong * 2654435761L + j.toLong * 0x9E3779B97F4A7C15L
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        1L + java.lang.Math.floorMod(h, 997L)
      }
      StreamingOps.VecOcc(i.toLong, 0L, q)
    }

    def run(subSplit: Int, chunks: Int = 4): Double = {
      val t0 = System.nanoTime()
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[StreamingOps.VecOcc](spark)
      val q = StreamingOps.semDedupStream(ms.toDS(), spark,
          threshold = 0.999, subSplit = subSplit)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"probe_sub$subSplit").start()
      val step = n / chunks + 1
      rows.grouped(step).foreach { g =>
        ms.addData(g); q.processAllAvailable()
      }
      q.stop()
      val kept = spark.table(s"probe_sub$subSplit")
        .filter(col("kept")).count()
      spark.catalog.dropTempView(s"probe_sub$subSplit")
      require(kept == n, s"expected all $n kept, got $kept")
      (System.nanoTime() - t0) / 1e9
    }

    run(subSplit = 8) // warmup absorbs JIT + stream-engine startup
    val t8 = run(subSplit = 8)
    val t1 = run(subSplit = 1)
    println(f"""{"n":$n,"hot_cells":1,"sub1_seconds":$t1%.1f,"sub8_seconds":$t8%.1f,"speedup":${t1 / t8}%.1f}""")
    spark.stop()
  }
}
