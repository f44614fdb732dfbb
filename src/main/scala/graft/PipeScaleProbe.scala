package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** Scale probe for the text-dedup pipeline: replicates the sf0.1
  * corpus k× (text perturbed per copy so near-dup structure repeats
  * instead of merging into one giant cluster) and measures the dedup
  * family end-to-end. The quantity of interest is docs/sec as the
  * corpus grows: every op here shuffles on content-derived keys
  * (uniform) and emits candidates from constant-occupancy buckets, so
  * throughput should stay ~flat in corpus size — the 100 TB design
  * claim this probe checks at 10-50×.
  *
  * Usage: PipeScaleProbe [k]   (default 20)
  */
object PipeScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val copies = broadcast((0 until k).toDF("copy"))
    // the copy id is spliced before every space, so every shingle of
    // every copy differs from the original's: copies are distinct
    // document families and the pair structure grows k-fold instead of
    // collapsing into k-cliques of mutual near-dups
    val docs = base.crossJoin(copies)
      .select((col("doc_id") * k + col("copy")).as("doc_id"),
        regexp_replace(col("text"), lit("( )"),
          concat(lit("~"), col("copy").cast("string"), lit("$1"))).as("text"),
        col("lang"))
      // spread: one source file x broadcast crossJoin = ONE partition
      .repartition(64)
    val nDocs = docs.count()

    def timed(f: => Long): (Long, Double) = {
      val t = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t) / 1e9)
    }

    // warmup pass absorbs JIT
    TextPipeline.exactDedup(docs).rdd.count()

    val (nExact, tExact) = timed(TextPipeline.exactDedup(docs).rdd.count())
    val (nCand, tMinhash) = timed(TextPipeline.minhashCandidates(docs).count())
    val (nClust, tClust) = timed {
      val pairs = TextPipeline.minhashCandidates(docs)
      TextPipeline.dedupClusters(docs, pairs)
        .filter(col("cluster_size") > 1).count()
    }
    val (nSim, tSim) = timed(TextPipeline.simhashPairs(docs).count())
    val (nCur, tCur) = timed(TextPipeline.curate(docs).count())

    // decontamination under a deliberately VIRAL shingle: the appended
    // trigram "vvv vvv vvv" appears in 100% of docs (bench and corpus),
    // the worst case for any per-shingle partitioning — its posting
    // list is the whole corpus. The broadcast semi-join shape must stay
    // flat per-doc here; a per-shingle window would serialize on it.
    val viral = docs.withColumn("text",
      concat(col("text"), lit(" vvv vvv vvv")))
    val (nDecon, tDecon) = timed(
      TextPipeline.decontaminate(viral, benchMax = 10L * k).rdd.count())

    // the Bloom-prefiltered twin under the same viral shingle: the
    // filter passes ~(overlap + fpp·rest) of corpus shingles into the
    // confirm join — identical output, pruned shuffle
    val (nDecB, tDecB) = timed(
      TextPipeline.decontaminateBloom(viral, benchMax = 10L * k)
        .rdd.count())

    // inter-doc duplicate n-grams over the PERTURBED corpus (each
    // copy's grams are distinct, so the gram table grows k-fold with
    // uniform content-hash keys — the shuffle-shape claim under test)
    val (nDng, tDng) = timed(
      TextPipeline.interDocDupNgrams(docs).rdd.count())

    // BM25 over the UNPERTURBED k× corpus: retrieval cost scales with
    // the queried terms' posting lists, which must grow k-fold here —
    // flat docs/sec ⇒ broadcast semi-join + salted top-k hold as
    // postings grow (no per-query serialization)
    val docsDup = base.crossJoin(copies)
      .select((col("doc_id") * k + col("copy")).as("doc_id"), col("text"))
      .repartition(64)
    val (nBm, tBm) = timed(graft.pipeline.Search.bm25TopK(docsDup).count())

    // exact substring dedup over the perturbed corpus: the gram table
    // grows k-fold with uniform content-hash keys, the span merge is a
    // per-doc window — docs/sec must stay ~flat as k grows
    val (nSsd, tSsd) = timed(
      TextPipeline.substringDedup(docs).rdd.count())

    // char-level span dedup over the same perturbed corpus: the gram
    // universe is corpus BYTES (~5x the word-gram table), keyed by the
    // 128-bit xxhash64 pair — the duplicate-count aggregate and the
    // semi join must stay content-hash-uniform, so docs/sec holds
    // ~flat as k grows
    val (nCsd, tCsd) = timed(
      TextPipeline.charSpanDedup(docs, L = 16).rdd.count())

    // incremental dedup: index the base three quarters of the corpus
    // once, probe with the last quarter — probe cost (the recurring
    // nightly cost; the index build is one-off) is what's timed
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-probe-idx").toString
    val baseSlice = docs.filter(col("doc_id") % 4 =!= 0)
    val t0Idx = System.nanoTime()
    graft.storage.Lake.writeDedupIndex(baseSlice,
      TextPipeline.minhashBands(baseSlice), idxDir)
    val tIdx = (System.nanoTime() - t0Idx) / 1e9
    val (hIdx, bIdx) = graft.storage.Lake.readDedupIndex(spark, idxDir)
    val (nIncr, tIncr) = timed(
      TextPipeline.incrementalDedup(
        docs.filter(col("doc_id") % 4 === 0), hIdx, bIdx).rdd.count())

    // model-based selection filters over the perturbed corpus: the
    // model side is a bounded aggregate (1024 buckets / observed
    // n-grams), the per-doc side shuffles once on doc_id — docs/sec
    // should stay ~flat as k grows
    val (nDsir, tDsir) = timed(TextPipeline.dsirWeights(docs).rdd.count())
    val (nLm, tLm) = timed(TextPipeline.lmScore(docs).rdd.count())
    val (nNb, tNb) = timed(TextPipeline.nbLangClassify(docs).rdd.count())

    // count–min grid: the word explode is per-doc work, the aggregate
    // collapses map-side into depth·width keys — docs/sec must stay
    // flat however large the (perturbed, so k×) vocabulary grows
    val (nCms, tCms) = timed(TextPipeline.cmsHeavyHitters(docs).rdd.count())

    def rate(t: Double) = (nDocs / t).toLong
    println(f"""{"docs":$nDocs,"k":$k,"cms_heavy":{"rows":$nCms,"seconds":$tCms%.1f,"docs_per_sec":${rate(tCms)}},"exact_dedup":{"rows":$nExact,"seconds":$tExact%.1f,"docs_per_sec":${rate(tExact)}},"minhash_candidates":{"pairs":$nCand,"seconds":$tMinhash%.1f,"docs_per_sec":${rate(tMinhash)}},"dedup_clusters":{"clustered_docs":$nClust,"seconds":$tClust%.1f,"docs_per_sec":${rate(tClust)}},"simhash_pairs":{"pairs":$nSim,"seconds":$tSim%.1f,"docs_per_sec":${rate(tSim)}},"curate_e2e":{"survivors":$nCur,"seconds":$tCur%.1f,"docs_per_sec":${rate(tCur)}},"decontaminate_viral":{"rows":$nDecon,"seconds":$tDecon%.1f,"docs_per_sec":${rate(tDecon)}},"decon_bloom_viral":{"rows":$nDecB,"seconds":$tDecB%.1f,"docs_per_sec":${rate(tDecB)}},"dup_ngrams":{"rows":$nDng,"seconds":$tDng%.1f,"docs_per_sec":${rate(tDng)}},"bm25_topk":{"rows":$nBm,"seconds":$tBm%.1f,"docs_per_sec":${rate(tBm)}},"dsir":{"rows":$nDsir,"seconds":$tDsir%.1f,"docs_per_sec":${rate(tDsir)}},"lm_score":{"rows":$nLm,"seconds":$tLm%.1f,"docs_per_sec":${rate(tLm)}},"nb_lang":{"rows":$nNb,"seconds":$tNb%.1f,"docs_per_sec":${rate(tNb)}},"substring_dedup":{"rows":$nSsd,"seconds":$tSsd%.1f,"docs_per_sec":${rate(tSsd)}},"char_span_dedup":{"rows":$nCsd,"seconds":$tCsd%.1f,"docs_per_sec":${rate(tCsd)}},"incr_dedup":{"rows":$nIncr,"probe_seconds":$tIncr%.1f,"index_build_seconds":$tIdx%.1f,"batch_docs_per_sec":${(nIncr / tIncr).toLong}}}""")
    spark.stop()
  }
}
