package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{TrainingData, VectorOps}

/** Scale probe for the vector tier: replicates the sf0.1 embeddings
  * k× (each copy rotated by a per-copy offset so vectors stay
  * distinct) and measures quantization + the three index paths. The
  * claims under test for 100 TB:
  *
  *   - quantization is a pure per-row map (codegen'd
  *     `QuantizeInt8`) → vectors/sec flat in collection size;
  *   - LSH keeps bucket occupancy ~constant (`scaledBits` grows the
  *     bit count with the collection) → query cost flat-ish;
  *   - IVF probes O(√n) cells → grows slowly;
  *   - brute top-k is the O(n) baseline the others must beat as k
  *     rises.
  *
  * Usage: VecScaleProbe [k]   (default 10)
  */
object VecScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val copies = broadcast((0 until k).toDF("copy"))
    // rotate each copy's vector by `copy` positions: distinct vectors,
    // same norm distribution, no artificial near-dup collapse
    val emb = base.crossJoin(copies)
      .select((col("vec_id") * k + col("copy")).as("vec_id"),
        expr("concat(slice(embedding, copy + 1, size(embedding) - copy), " +
          "slice(embedding, 1, copy))").as("embedding"))
      // one source file × broadcast crossJoin = ONE partition; spread
      // it or every per-row map below runs single-threaded
      .repartition(64)
      .localCheckpoint()
    val n = emb.count()

    def timed(f: => Long): (Long, Double) = {
      val t = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t) / 1e9)
    }

    TrainingData.quantizeInt8(emb).rdd.count() // JIT warmup

    val (nQ, tQ) = timed(TrainingData.quantizeInt8(emb).rdd.count())
    val (nB, tB) = timed(VectorOps.annTopK(emb).rdd.count())
    val (nL, tL) = timed(VectorOps.annLsh(emb).rdd.count())
    val (nI, tI) = timed(VectorOps.annIvf(emb).rdd.count())
    // index build and probe timed apart: the index is built once and
    // persisted in real usage; the probe is the per-query cost
    val (nIdx, tIdx) = timed {
      val idx = TrainingData.q8Index(emb).localCheckpoint()
      idx.count()
    }
    val q8 = TrainingData.q8Index(emb).localCheckpoint()
    val (nQ8, tQ8) = timed(TrainingData.annQ8FromIndex(q8).rdd.count())

    // banded near-dup report: candidates and wall time must grow
    // ~linearly in n (scaledBits keeps bucket occupancy ~constant) —
    // the all-pairs exact baseline this replaced is Θ(n²) by definition
    val (nCand, tCand) = timed(VectorOps.nearDupCandidates(emb).count())
    val (nND, tND) = timed(VectorOps.nearDupPairs(emb).rdd.count())

    // PQ family: train cost (full vs 10% content-hash sample), then
    // query passes under an already-trained model — the split that
    // shows IVF-PQ's probed-cell scan beating the whole-collection ADC
    // once training is out of the timed path
    val (_, tTrainFull) = timed { VectorOps.pqTrain(emb); 1L }
    var model: VectorOps.PqModel = null
    val (_, tTrainSamp) = timed {
      model = VectorOps.pqTrain(emb, sampleFraction = 0.1); 1L }
    val (nPq, tPq) = timed(
      VectorOps.annPq(emb, trained = Some(model)).rdd.count())
    val (nIvfPq, tIvfPq) = timed(
      VectorOps.annIvfPq(emb, trained = Some(model)).rdd.count())

    // IVF-Flat coarse-quantizer training gain: recall@10 of the
    // seeded vs k-means-trained quantizer at EQUAL probe cost (same
    // nCells, same nProbe) — the read on whether Lloyd training of
    // the coarse cells buys recall without touching the probe budget
    val exactCos = VectorOps.annTopK(emb, 5, 10)
      .select(col("query_id"), col("vec_id")).localCheckpoint()
    var ivfCents: Array[Array[Long]] = null
    val (_, tIvfTrain) = timed { ivfCents = VectorOps.ivfTrain(emb); 1L }
    def rec10(approx: org.apache.spark.sql.DataFrame): Double =
      exactCos.join(approx.select(col("query_id"), col("vec_id"))
          .withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg((count(col("hit")).cast("double") / count(lit(1))).as("r"))
        .agg(avg("r")).head().getDouble(0)
    val ivfSweep = Seq(1, 2, 4).map { p =>
      val u = rec10(VectorOps.annIvf(emb, 5, 10, nProbe = p))
      val tr = rec10(VectorOps.annIvfKmeans(emb, 5, 10, nProbe = p,
        trainedCents = Some(ivfCents)))
      f""""ivf_nprobe_$p":{"recall_seeded":$u%.3f,"recall_kmeans":$tr%.3f}"""
    }.mkString(",")

    // the deployment knob: nProbe trades recall for probe cost under a
    // FIXED trained index. Ground truth computed once outside the
    // loop. Recall only — at this collection size a per-setting wall
    // time is dominated by fixed plan/JVM state, not the probed-cell
    // count (the candidate count itself is (nProbe/nCells)·n by
    // construction); ann_ivfpq_trained above is the representative
    // end-to-end retrieval time.
    val exactL2 = VectorOps.annTopKL2(emb, 5, 5)
      .select(col("query_id"), col("vec_id")).localCheckpoint()
    def rec5(approx: org.apache.spark.sql.DataFrame): Double =
      exactL2.join(approx.select(col("query_id"), col("vec_id"))
          .withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg((count(col("hit")).cast("double") / count(lit(1))).as("r"))
        .agg(avg("r")).head().getDouble(0)
    // the full composition, seeded vs k-means coarse cells at EQUAL
    // probe cost — the same training-gain read as the IVF-Flat sweep,
    // through the stored-PQ + re-rank tail
    val nProbeSweep = Seq(1, 2, 4).map { p =>
      val rec = rec5(VectorOps.annIvfPq(emb, trained = Some(model),
        nProbe = p))
      val recK = rec5(VectorOps.annIvfPq(emb, trained = Some(model),
        nProbe = p, coarseCents = Some(ivfCents)))
      f""""nprobe_$p":{"recall":$rec%.3f,"recall_kmeans_coarse":$recK%.3f}"""
    }.mkString(",")

    // cluster-balanced sampling under a fixed trained quantizer: cost
    // must stay ~linear in n (assignment is a broadcast join + rank;
    // per-cell truncation is the salted two-stage top-k, so the k×
    // larger cells never land in one task)
    val (nCs, tCs) = timed(VectorOps.clusterSample(emb,
      trainedCents = Some(ivfCents)).rdd.count())

    // the semantic-dedup family under √n cells: per-cell pair blocks
    // (Σ|cell|² ≈ n^1.5) dominate, so wall time must grow ~n^1.5 —
    // re-run at 4× the k and expect ~8× here, never the all-pairs 16×
    val sCells = VectorOps.scaledCells(n)
    var semCents: Array[Array[Long]] = null
    val (_, tSemTrain) = timed {
      semCents = VectorOps.ivfTrain(emb, sCells); 1L }
    val (nSd, tSd) = timed(VectorOps.semDedup(emb, nCells = sCells,
      trainedCents = Some(semCents)).rdd.count())
    val (nKg, tKg) = timed(VectorOps.knnGraph(emb, nCells = sCells,
      trainedCents = Some(semCents)).rdd.count())
    val (nKc, tKc) = timed(VectorOps.knnClusters(emb, nCells = sCells,
      trainedCents = Some(semCents)).rdd.count())

    // JL reduction: the report is a pure per-row map (vecs/sec flat);
    // the retrieve-then-rerank query scans kComps-dim ints for ALL
    // candidates but touches full width only for the shortlist, so it
    // must sit between ann_q8_probe and ann_brute as n grows
    val (nRp, tRp) = timed(VectorOps.rprojReport(emb).rdd.count())
    val (nRq, tRq) = timed(VectorOps.annRproj(emb).rdd.count())

    // Gram matrix: n·d² explode collapsed by map-side partials into
    // d(d+1)/2 keys — seconds must grow ~linearly in n with a
    // constant-size shuffle/output
    val (nG, tG) = timed(VectorOps.gramMatrix(emb).rdd.count())

    // INCREMENTAL index maintenance at scale: a 10% ingest batch vs a
    // 90% stored base under frozen centroids. The 100 TB claim: append
    // pays only the batch (anti-join screen against the id-keyed
    // index + batch assignment + batch write), so rebuild/append wall
    // ratio should approach corpus/batch (~10×) as n grows — a
    // nightly ingest never re-encodes the corpus
    val incrDir = java.nio.file.Files
      .createTempDirectory("graft_incr_probe_").toString
    val baseEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val batchEmb = emb.filter(col("vec_id") % 10 === 0)
    val (_, tIxBase) = timed {
      graft.storage.Lake.writeIvfIndex(baseEmb, ivfCents,
        s"$incrDir/ix"); 1L }
    val (nNew, tScreen) = timed(
      VectorOps.incrAnnAssign(batchEmb, ivfCents,
          graft.storage.Lake.readIvfIndex(spark, s"$incrDir/ix"))
        .filter(col("is_new")).count())
    val (_, tAppend) = timed {
      graft.storage.Lake.appendIvfIndex(batchEmb, ivfCents,
        s"$incrDir/ix"); 1L }
    val (_, tRebuild) = timed {
      graft.storage.Lake.writeIvfIndex(emb, ivfCents,
        s"$incrDir/rebuild"); 1L }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(incrDir))

    def rate(t: Double) = (n / t).toLong
    println(f"""{"vectors":$n,"k":$k,"quantize":{"rows":$nQ,"seconds":$tQ%.2f,"vecs_per_sec":${rate(tQ)}},"ann_brute":{"rows":$nB,"seconds":$tB%.2f},"ann_lsh":{"rows":$nL,"seconds":$tL%.2f},"ann_ivf":{"rows":$nI,"seconds":$tI%.2f},"q8_index_build":{"rows":$nIdx,"seconds":$tIdx%.2f},"ann_q8_probe":{"rows":$nQ8,"seconds":$tQ8%.2f},"neardup_candidates":{"pairs":$nCand,"pairs_per_vec":${nCand / n},"seconds":$tCand%.2f},"neardup_lsh":{"rows":$nND,"seconds":$tND%.2f},"ivf_train":{"seconds":$tIvfTrain%.2f},$ivfSweep,"pq_train_full":{"seconds":$tTrainFull%.2f},"pq_train_sample10":{"seconds":$tTrainSamp%.2f},"ann_pq_trained":{"rows":$nPq,"seconds":$tPq%.2f},"ann_ivfpq_trained":{"rows":$nIvfPq,"seconds":$tIvfPq%.2f},"cluster_sample":{"rows":$nCs,"seconds":$tCs%.2f,"vecs_per_sec":${rate(tCs)}},"sem_cells":$sCells,"sem_ivf_train":{"seconds":$tSemTrain%.2f},"semdedup":{"rows":$nSd,"seconds":$tSd%.2f},"knn_graph":{"rows":$nKg,"seconds":$tKg%.2f},"knn_clusters":{"rows":$nKc,"seconds":$tKc%.2f},"rproj_build":{"rows":$nRp,"seconds":$tRp%.2f,"vecs_per_sec":${rate(tRp)}},"ann_rproj":{"rows":$nRq,"seconds":$tRq%.2f},"gram":{"rows":$nG,"seconds":$tG%.2f,"vecs_per_sec":${rate(tG)}},"incr_ann":{"base_index_build_s":$tIxBase%.2f,"screen_rows":$nNew,"screen_s":$tScreen%.2f,"append_s":$tAppend%.2f,"rebuild_s":$tRebuild%.2f,"rebuild_over_append":${(tRebuild / tAppend).formatted("%.1f")}},$nProbeSweep}""")
    spark.stop()
  }
}
