package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.longArrayDot

/** A packing-input doc: shard + deterministic sample order + token count. */
case class PackDoc(shard: Int, sample_hash: String, doc_id: Long, toks: Long)

/** A packed doc: its bin and offset within the shard's bin sequence. */
case class PackedDoc(shard: Int, doc_id: Long, pos: Long, toks: Long,
    bin_no: Long, bin_offset: Long)

/** Training-data preparation operators beyond cleaning/dedup: the steps
  * between a curated corpus and a token stream a trainer consumes —
  * context-window chunking, sequence packing, tokenizer (BPE) training,
  * embedding quantization for memory-bounded retrieval, and
  * source-mixture rebalancing. All deterministic (content-hash ordering,
  * exact integer arithmetic) so every engine reproduces them
  * bit-for-bit.
  */
object TrainingData {

  // ---------------------------------------------------------------- chunking

  /** Sliding-window chunking: each document split into word windows of
    * `win` words every `stride` words (overlap = win − stride) — the
    * step that turns variable-length documents into model-context-sized
    * pieces. Pure Catalyst: one `sequence` explode per doc, no shuffle
    * at all (the downstream consumer shuffles on whatever key it
    * needs). */
  def chunkSlices(docs: DataFrame, win: Int = 40, stride: Int = 30): DataFrame =
    docs.withColumn("words", split(col("text"), " "))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("k", explode(expr(
        s"sequence(CAST(0 AS BIGINT), CASE WHEN n_words <= $win THEN CAST(0 AS BIGINT) " +
          s"ELSE (n_words - $win + ${stride - 1}) div $stride END)")))
      .withColumn("chunk", expr(s"slice(words, k * $stride + 1, $win)"))
      .select(col("doc_id"), col("k").as("chunk_no"),
        (col("k") * stride + 1).as("start_word"),
        size(col("chunk")).cast("long").as("chunk_words"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))

  // ---------------------------------------------------------- quantization

  /** Embedding-milli vectors (the established exact integer base,
    * cf. [[VectorOps]]). */
  private def milli(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      graft.functions.GraftFunctions.floatArrayMilli(col("embedding")).as("q"))

  /** Per-vector symmetric int8 quantization in pure integer math:
    * `q8 = round(q·127 / max_abs)` computed as
    * `sign(q)·((|q|·254 + max_abs) div (2·max_abs))` — round half away
    * from zero without any float division, so the quantized vector is
    * identical on every engine. max_abs = 0 (the zero vector) quantizes
    * to zeros. Both columns are codegen'd custom expressions
    * ([[graft.functions.QuantizeInt8]] — one two-pass primitive loop
    * per row) rather than the interpreted transform/array_max/CASE
    * HOF chain: quantization is the per-row hot path when indexing
    * billions of embeddings. */
  private def withQ8(d: DataFrame): DataFrame =
    d.withColumn("max_abs",
        graft.functions.GraftFunctions.longArrayMaxAbs(col("q")))
      .withColumn("q8",
        graft.functions.GraftFunctions.quantizeInt8Col(col("q")))

  /** Int8 quantization report: per-vector scale (max |milli| value),
    * dimension count, exact integer sum / squared norm of the quantized
    * vector, and an order-sensitive fingerprint — the artifact a
    * memory-bounded vector store persists (4× smaller than float32,
    * 8× smaller than the milli longs). Per-row map, no shuffle. */
  def quantizeInt8(emb: DataFrame): DataFrame =
    withQ8(milli(emb))
      .select(col("vec_id"),
        size(col("q")).cast("long").as("n_dims"),
        col("max_abs").as("max_abs_milli"),
        expr("aggregate(q8, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_q8"),
        longArrayDot(col("q8"), col("q8")).as("norm_q8"),
        md5(concat_ws(",", expr("transform(q8, x -> CAST(x AS STRING))")))
          .as("q8_md5"))

  /** Top-k retrieval over the *quantized* vectors — the memory-bounded
    * scale path (int8 dot products via the codegen'd [[longArrayDot]];
    * the index fits in a quarter of the float32 footprint). Same shape
    * as [[VectorOps.annTopK]] so recall against the exact baseline is a
    * join away. */
  /** The persistable int8 index: (vec_id, q8, n8) for every non-zero
    * vector — build once, probe many. */
  def q8Index(emb: DataFrame): DataFrame =
    withQ8(milli(emb))
      .withColumn("n8", longArrayDot(col("q8"), col("q8")))
      .filter(col("n8") > 0)
      .select("vec_id", "q8", "n8")

  def annQ8(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    // Materialize the quantization once: without the checkpoint, projection
    // collapse inlines the quantization chain into BOTH sides of the
    // self-join and re-evaluates it per (query × candidate) row — the
    // single-evaluation rule of docs/PLANS.md ("self-joins silently
    // re-evaluate their input sub-plan"), same as its siblings
    // annIvf/annLsh.
    annQ8FromIndex(q8Index(emb).localCheckpoint(false), nQueries, k)
  }

  /** Probe an already-built (persisted/checkpointed) [[q8Index]].
    * Ranking goes through the shared two-stage
    * [[VectorOps.topKPerQuery]] — like every other search path, no
    * task ever holds one query's full score list. */
  def annQ8FromIndex(q8: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val queries = q8.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q8").as("qa"), col("n8").as("na"))
    val cands = q8.select(col("vec_id").as("vb"), col("q8").as("qb"), col("n8").as("nb"))
    val cos = longArrayDot(col("qa"), col("qb")).cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
    val scored = broadcast(queries).join(cands, col("query_id") =!= col("vb"))
      .withColumn("cos", cos)
    VectorOps.topKPerQuery(scored, k, col("cos").desc, col("vb"))
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vb").as("vec_id"), col("cos"))
  }

  /** Deterministic global corpus shuffle — the "randomize training
    * order" pass: every document gets a shuffle key (md5 of a salted
    * content hash, so reshuffling with a different salt is a new
    * permutation) and its global position under that order. At scale
    * this is one distributed sort — exactly what a trainer's data
    * loader shards by — and the key is reproducible from the content
    * alone, so any two runs agree without coordination. */
  def shuffleOrder(docs: DataFrame, salt: String = "epoch0"): DataFrame = {
    // global rank WITHOUT a global single-task window: bucket by the
    // key's 12-bit prefix (prefix order ⊆ key order, so
    // bucket-offset + within-bucket rank == global rank), cumulate the
    // ≤4096 bucket counts in a tiny window, rank within buckets in
    // parallel — the distributed-sort shape a data loader shards by
    val keyed = docs.select(col("doc_id"),
        md5(concat(lit(salt), lit("#"), col("text"))).as("shuffle_key"))
      .withColumn("bucket",
        expr("conv(substring(shuffle_key, 1, 3), 16, 10)").cast("long"))
    val offsets = keyed.groupBy("bucket").count()
      .withColumn("bucket_offset",
        sum("count").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"),
        coalesce(col("bucket_offset"), lit(0L)).as("bucket_offset"))
    val wIn = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    keyed.join(broadcast(offsets), "bucket")
      .withColumn("shuffle_pos",
        (col("bucket_offset") + row_number().over(wIn)).cast("long"))
      .select("doc_id", "shuffle_key", "shuffle_pos")
  }

  // -------------------------------------------------------- source mixing

  /** Source-mixture rebalancing: each source gets a configured mixing
    * weight (here: sources 0-9 weight 2, the long tail weight 1 — the
    * "configured domain weights" of a training mix) and documents are
    * kept by a deterministic content-hash Bernoulli at rate
    * `w / (2·w_max)` — pure integer comparison, no RNG, stable under
    * any partitioning. Complements [[TextPipeline.langBalance]] (hard
    * caps): rates preserve relative volume within a weight class. */
  /** Weighted sampling without replacement by SYSTEMATIC PPS (Madow
    * 1949): documents line up in deterministic md5-shuffled order,
    * weights (integer quality tenths + 1) cumulate into a global
    * prefix sum, and every multiple of `stride = totalW div targetN`
    * picks the document whose weight interval it lands in — selection
    * probability ∝ weight, exactly integer, no ln/no RNG (the
    * Efraimidis–Spirakis key needs a float log that no two libms
    * round identically; the systematic walk needs only division).
    * The prefix sum is the [[shuffleOrder]] bucket-offset
    * construction (12-bit key-prefix buckets, tiny offset window,
    * per-bucket parallel cumsum) — no global single-task window at
    * any size. A document heavier than the stride is picked more
    * than once: `n_picks` counts the stride multiples inside its
    * interval (with-replacement multiplicity, the PPS convention).
    * Output: the picked docs with their weight, inclusive cumulative
    * weight, and pick multiplicity. */
  def weightedSample(docs: DataFrame, targetN: Int = 50,
      salt: String = "sample0"): DataFrame = {
    // weight = integer quality points + 1 (1..11), rebuilt from the
    // component columns — NOT from quality_score*10: that float
    // round-trip casts differently across engines (Spark truncates,
    // DuckDB rounds)
    val qual = TextPipeline.qualityScore(docs)
      .select(col("doc_id"),
        (when(col("n_words").between(20, 500), 4L).otherwise(0L)
          + when(col("n_stop") * 5 >= col("n_words"), 3L).otherwise(0L)
          + when(col("n_digits") * 10 <= col("n_chars_m"), 2L).otherwise(0L)
          + when(col("mean_word_len").between(3.0, 10.0), 1L).otherwise(0L)
          + 1L).as("w"))
    val keyed = docs.select(col("doc_id"),
        md5(concat(lit(salt), lit("#"), col("text"))).as("sample_key"))
      .join(qual, Seq("doc_id"))
      .withColumn("bucket",
        expr("conv(substring(sample_key, 1, 3), 16, 10)").cast("long"))
    // ONE corpus aggregation feeds both the offsets window and the
    // total (≤4096 rows pinned) — deriving the total from the corpus
    // again would be a third full pass over the scored documents
    val bucketSums = keyed.groupBy("bucket").agg(sum("w").as("bw"))
      .localCheckpoint(false)
    val offsets = bucketSums
      .withColumn("bucket_offset",
        sum("bw").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"),
        coalesce(col("bucket_offset"), lit(0L)).as("bucket_offset"))
    val wIn = Window.partitionBy("bucket").orderBy("sample_key", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = keyed.join(broadcast(offsets), "bucket")
      .withColumn("cum_w", col("bucket_offset") + sum("w").over(wIn))
    val total = bucketSums.agg(sum("bw").as("total_w"))
    cum.crossJoin(broadcast(total))
      .withColumn("stride",
        greatest(lit(1L), expr("total_w div " + targetN)))
      .withColumn("n_picks",
        expr("cum_w div stride - (cum_w - w) div stride"))
      .filter(col("n_picks") > 0)
      .select(col("doc_id"), col("w"), col("cum_w"), col("n_picks"))
  }

  /** Data-constrained EPOCH PLANNING — the allocator a token-budgeted
    * pretraining mix runs before any sampling op here executes it:
    * split a total token budget across sources under an equal-share
    * policy with a per-source repetition cap (a source can contribute
    * at most `maxEpochs` passes over its own tokens — the
    * data-constrained-scaling discipline of capping epochs rather than
    * repeating a small source without bound). Budget is
    * `total_tokens · budgetNum / budgetDen`, self-scaling with the
    * corpus; the default 7/4 plans 1.75 corpus passes, so small
    * sources hit the 2-epoch cap and large ones absorb the spill —
    * both allocator branches live at every SF.
    *
    * The allocation is exact water-filling in CLOSED FORM — no
    * iteration: with sources sorted by cap ascending, the capped set
    * is a prefix, and source i is capped iff
    * `cap_i·(S−i+1) + Σ_{j<i} cap_j ≤ B` (its cap fits even when every
    * later source also draws cap_i); k = the last all-true prefix
    * index, every uncapped source gets `(B − Σ_{j≤k} cap_j) div (S−k)`
    * — one window cumulative sum plus two scalar aggregates, all
    * integer arithmetic (token counts are the whitespace rule of
    * [[TextPipeline.tokenCounts]]). Scale shape: ONE map-side-combined
    * aggregate reduces the corpus to |sources| rows; everything after
    * (the global-sort window included) runs on that tiny frame.
    * Output: (source, n_docs, tokens, cap_tokens, alloc_tokens,
    * epochs_milli, capped), epochs_milli = ⌊1000·alloc/tokens⌋. */
  def epochPlan(docs: DataFrame, budgetNum: Int = 7, budgetDen: Int = 4,
      maxEpochs: Int = 2): DataFrame = {
    require(budgetNum >= 1 && budgetDen >= 1 && maxEpochs >= 1,
      "positive budgetNum/budgetDen/maxEpochs")
    val tok = docs
      .withColumn("t", size(split(col("text"), " ")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("tokens"))
      .withColumn("cap_tokens", col("tokens") * maxEpochs)
    val tot = tok.agg(sum("tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    val w = Window.orderBy(col("cap_tokens"), col("source"))
    val ranked = tok.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("pfx", coalesce(sum("cap_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("budget",
        expr(s"(total_tokens * $budgetNum) div $budgetDen"))
      .withColumn("fits",
        col("cap_tokens") * (col("n_sources") - col("i") + 1) +
          col("pfx") <= col("budget"))
      .localCheckpoint(false) // |sources| rows; feeds three consumers
    val kRow = ranked.agg(
      coalesce(min(when(!col("fits"), col("i"))) - 1, max(col("i")))
        .as("k"))
    val withK = ranked.crossJoin(broadcast(kRow))
    val pk = withK.filter(col("i") <= col("k"))
      .agg(coalesce(sum("cap_tokens"), lit(0L)).as("pkv"))
    withK.crossJoin(broadcast(pk))
      .withColumn("alloc_tokens",
        when(col("i") <= col("k"), col("cap_tokens"))
          .otherwise(expr("(budget - pkv) div (n_sources - k)")))
      .withColumn("epochs_milli",
        expr("(1000 * alloc_tokens) div tokens"))
      .select(col("source"), col("n_docs"), col("tokens"),
        col("cap_tokens"), col("alloc_tokens"), col("epochs_milli"),
        (col("i") <= col("k")).as("capped"))
  }

  def sourceMix(docs: DataFrame, wMax: Int = 2): DataFrame = {
    val h = md5(concat(lit("mix#"), col("text")))
    val bucket = ((ascii(substring(h, 1, 1)) * 65536 +
      ascii(substring(h, 2, 1)) * 256 +
      ascii(substring(h, 3, 1))) % 1000).cast("long")
    docs.select(col("doc_id"), col("source"),
        when(expr("TRY_CAST(substring(source, 4) AS INT)") < 10, 2L).otherwise(1L)
          .as("weight"),
        bucket.as("bucket"))
      .withColumn("kept", col("bucket") * 2 * wMax < col("weight") * 1000)
  }

  /** Exact stratified sampling: every (lang, source) stratum keeps its
    * first `ceil(n·rateNum/rateDen)` documents under a deterministic
    * content-hash order — per-stratum quotas are met EXACTLY (a
    * Bernoulli rate only meets them in expectation, which at small or
    * skewed strata over/under-samples the very classes stratification
    * exists to protect). Scale shape: the rank inside a stratum is the
    * [[shuffleOrder]] bucket-offset construction scoped per stratum —
    * partition by (stratum, 12-bit hash-prefix bucket), cumulate the
    * per-stratum bucket counts in a tiny window, rank within buckets —
    * so a viral stratum spreads over ≤4096 parallel tasks instead of
    * serializing through one window partition. Integer-exact keep rule:
    * `(rnk−1)·rateDen < n·rateNum ⇔ rnk ≤ ceil(n·rateNum/rateDen)`. */
  def stratifiedSample(docs: DataFrame, rateNum: Int = 1,
      rateDen: Int = 5): DataFrame = {
    require(rateNum >= 0 && rateDen >= 1, "rate = rateNum/rateDen in [0,..]")
    val keyed = docs.select(col("doc_id"), col("lang"), col("source"),
        md5(concat(lit("strat#"), col("text"))).as("skey"))
      .withColumn("bucket",
        expr("conv(substring(skey, 1, 3), 16, 10)").cast("long"))
    val wStr = Window.partitionBy("lang", "source").orderBy("bucket")
    val offsets = keyed.groupBy("lang", "source", "bucket").count()
      .withColumn("bucket_offset",
        coalesce(sum("count").over(
          wStr.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("stratum_n",
        sum("count").over(wStr.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("lang", "source", "bucket", "bucket_offset", "stratum_n")
    val wIn = Window.partitionBy("lang", "source", "bucket")
      .orderBy("skey", "doc_id")
    // no broadcast hint: `offsets` carries up to (#strata × 4096) rows
    // — unbounded in the stratum cardinality, unlike shuffleOrder's
    // fixed ≤4096-row table — and the join key IS the window partition
    // key, so the shuffle is reused anyway; AQE still broadcasts when
    // the runtime size happens to be small
    keyed.join(offsets, Seq("lang", "source", "bucket"))
      .withColumn("rnk",
        (col("bucket_offset") + row_number().over(wIn)).cast("long"))
      .withColumn("kept",
        (col("rnk") - 1) * rateDen < col("stratum_n") * rateNum)
      .select("doc_id", "lang", "source", "stratum_n", "rnk", "kept")
  }

  /** Temperature-scaled source mixing (T = 2, the multilingual-mix
    * standard): each source's sampling rate is `sqrt(n_source/n_max)`
    * — up-weights the tail relative to proportional sampling while
    * keeping the head's order. The rate is materialized as an exact
    * parts-per-2²⁰ integer (`floor(2²⁰·sqrt(n/n_max))` — sqrt and one
    * multiply are single IEEE-754-correctly-rounded ops, bit-identical
    * on any engine) and each document draws a deterministic
    * content-hash value in [0, 2²⁰): the raw value of md5's first five
    * hex digits, compared with NO modulo — a `% 1e6` here would fold
    * draws 1e6..2²⁰−1 back onto 0..48575, doubling those draws'
    * frequency and silently doubling the keep rate of exactly the tail
    * sources (rate < 48576/2²⁰) the temperature law exists to protect.
    * `kept ⇔ draw < rate_p20`; the head source (rate = 2²⁰) keeps
    * everything since every draw is < 2²⁰. Per-source counts are one
    * tiny aggregate broadcast back onto the corpus; the decision is
    * per-row expression work — no second shuffle. */
  def mixTemperature(docs: DataFrame): DataFrame = {
    // value of the first 5 hex digits of md5("temp#"||text), uniform
    // on [0, 16^5) — locate-arithmetic (no hex parsing) so any engine
    // reproduces it
    val hexDraw = (1 to 5).map { i =>
      val p = math.pow(16, 5 - i).toLong
      s"(locate(substring(draw_hash, $i, 1), '0123456789abcdef') - 1) * ${p}L"
    }.mkString(" + ")
    val counts = docs.groupBy("source")
      .agg(count(lit(1)).as("n_source"))
    val nMax = counts.agg(max("n_source").as("n_max"))
    val rates = counts.crossJoin(broadcast(nMax))
      .withColumn("rate_p20",
        floor(sqrt(col("n_source").cast("double") /
          col("n_max").cast("double")) * (1L << 20)).cast("long"))
      .select("source", "n_source", "rate_p20")
    docs.select(col("doc_id"), col("source"),
        md5(concat(lit("temp#"), col("text"))).as("draw_hash"))
      .withColumn("draw", expr(s"$hexDraw").cast("long"))
      .join(broadcast(rates), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_source"),
        col("rate_p20"), col("draw"),
        (col("draw") < col("rate_p20")).as("kept"))
  }

  // ------------------------------------------------------ sequence packing

  /** Greedy sequence packing: documents are dealt into `nShards` shards
    * by content hash, ordered within each shard by (hash, doc_id) — a
    * deterministic global shuffle, the order a trainer would consume —
    * and packed first-fit into bins of `capacity` tokens (token count =
    * whitespace tokens, clamped at capacity). Inherently sequential
    * *within* a shard (each doc's bin depends on the running fill), so
    * the parallel unit is the shard — the same (small-state, sequential
    * per group) pattern as the financial state machines; at corpus
    * scale `nShards` rises with the cluster (a real knob: shard =
    * 16-bit hash prefix mod nShards), and shard sizes are uniform by
    * construction (content-hash deal). */
  /** The packing prologue shared by the batch and streaming packers:
    * (sample_hash, doc_id, toks, shard) per document. */
  def packInputs(docs: DataFrame, capacity: Long = 256,
      nShards: Int = 16): DataFrame = {
    require(nShards >= 1 && nShards <= 65536,
      "shard = 16-bit md5 prefix mod nShards; 1..65536 shards")
    // Value of the first 4 hex digits of md5(text) — engine-portable
    // integer arithmetic (locate/strpos on the hex alphabet), no
    // hex-literal parsing needed on either side.
    val hexPrefix = (1 to 4).map { i =>
      val p = math.pow(16, 4 - i).toLong
      s"(locate(substring(sample_hash, $i, 1), '0123456789abcdef') - 1) * ${p}L"
    }.mkString(" + ")
    docs.select(
        md5(col("text")).as("sample_hash"),
        col("doc_id"),
        least(size(split(col("text"), " ")).cast("long"), lit(capacity))
          .as("toks"))
      .withColumn("shard", expr(s"($hexPrefix) % $nShards").cast("int"))
  }

  def packSequences(docs: DataFrame, spark: SparkSession,
      capacity: Long = 256, nShards: Int = 16): DataFrame = {
    import spark.implicits._
    packInputs(docs, capacity, nShards)
      .as[PackDoc]
      .groupByKey(_.shard)
      .flatMapSortedGroups($"sample_hash", $"doc_id") { (shard, it) =>
        var bin = 1L; var fill = 0L; var pos = 0L
        it.map { d =>
          pos += 1
          if (fill + d.toks > capacity && fill > 0) { bin += 1; fill = 0 }
          val off = fill
          fill += d.toks
          PackedDoc(shard, d.doc_id, pos, d.toks, bin, off)
        }
      }
      .toDF()
  }

  /** Packing-efficiency report: per shard, how many bins the first-fit
    * pass produced and how full they are — the number a training run
    * actually pays for (waste tokens = padded positions the forward
    * pass computes and the loss masks). All-integer outputs
    * (`fill_ppm = total·1e6 div (bins·capacity)`) so the report is
    * engine-exact; one aggregation over [[packSequences]], keyed on
    * the shard the packer already partitioned by. */
  def packStats(docs: DataFrame, spark: SparkSession,
      capacity: Long = 256, nShards: Int = 16): DataFrame =
    packSequences(docs, spark, capacity, nShards)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        max("bin_no").as("n_bins"),
        sum("toks").as("total_toks"))
      .withColumn("waste_toks",
        col("n_bins") * capacity - col("total_toks"))
      .withColumn("fill_ppm",
        expr(s"total_toks * 1000000 div (n_bins * $capacity)"))

  // ------------------------------------------------------------ BPE training

  /** Greedy-leftmost application of one merge to a symbol sequence. */
  private[graft] def applyMerge(syms: Seq[String], l: String,
      r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** BPE tokenizer training (Sennrich-style, over the word-frequency
    * dictionary): `nMerges` rounds of (count adjacent symbol pairs
    * weighted by word frequency → take the most frequent pair, ties
    * broken lexicographically → apply it greedy-leftmost to every
    * word). Returns the merge table (merge_no, lft, rgt, merged,
    * pair_count) — the tokenizer artifact.
    *
    * Scale shape: the corpus-sized work is the initial word count (one
    * shuffle on the word — this is how BPE is trained on large corpora:
    * the dictionary, not the corpus, enters the merge loop); each round
    * is one explode + aggregation over the *dictionary* plus a 1-row
    * argmax to the driver. The merge application is a per-row Scala
    * function (a sequential greedy collapse — not expressible as a
    * Catalyst expression; the dictionary is orders of magnitude smaller
    * than the corpus, so the interpreted hop is off the hot path). */
  def bpeTrain(docs: DataFrame, spark: SparkSession,
      nMerges: Int = 8): DataFrame = {
    import spark.implicits._
    val mergeUdf = udf(applyMerge _)
    var words = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ListBuffer.empty[(Long, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= nMerges && !done) {
      val top = words
        .withColumn("p", explode(when(size(col("syms")) >= 2,
          expr("transform(sequence(1, size(syms) - 1), i -> " +
            "named_struct('l', element_at(syms, i), 'r', element_at(syms, i + 1)))"))
          .otherwise(array())))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, l, r, l + r, cnt))
        words = words
          .withColumn("syms", mergeUdf(col("syms"), lit(l), lit(r)))
          .localCheckpoint(false)
        round += 1
      }
    }
    merges.toSeq.toDF("merge_no", "lft", "rgt", "merged", "pair_count")
  }

  /** Collect a trained merge table (as produced by [[bpeTrain]]) into
    * the ordered (lft, rgt) pairs a tokenizer applies. Bounded driver
    * state: nMerges rows. */
  def mergePairs(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy("merge_no").select("lft", "rgt").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Tokenize the corpus with an already-trained merge table: per doc,
    * per word, apply the merges in order; emits exact BPE token counts —
    * the "how many tokens is this corpus under my tokenizer" pass.
    * Takes the merge table as input (train once, tokenize many): the
    * tokenizer artifact is tiny driver state, the corpus pass is one
    * per-row map, no shuffle. */
  def bpeTokenCounts(docs: DataFrame, spark: SparkSession,
      merges: Seq[(String, String)]): DataFrame = {
    val tokUdf = udf((text: String) => {
      text.split(" ").iterator.map { w =>
        var syms: Seq[String] = w.map(_.toString)
        merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
        syms.length
      }.sum.toLong
    })
    docs.select(col("doc_id"), tokUdf(col("text")).as("n_bpe_tokens"))
  }

  /** Convenience overload: train then count (used when no trained
    * table is at hand; prefer passing the merge table in). */
  def bpeTokenCounts(docs: DataFrame, spark: SparkSession,
      nMerges: Int): DataFrame =
    bpeTokenCounts(docs, spark, mergePairs(bpeTrain(docs, spark, nMerges)))

  /** Tokenizer-coverage report: per source, exact token count, char
    * count, and how many tokens are MERGED symbols (length > 1) under
    * a trained BPE table — the two numbers a tokenizer decision is
    * made on: chars_per_token (compression: how far a fixed token
    * budget stretches on this source) and merged_frac (vocabulary
    * fit: a source stuck at single-char fallback is out-of-domain for
    * the merges). Same scale shape as [[bpeTokenCounts]]: the merge
    * table is tiny driver state inside the UDF closure, the corpus
    * pass is one per-row map, and the only shuffle is the |sources|-
    * cardinality aggregate with map-side combine. The ratios are one
    * double division over exact integer sums — bit-stable on any
    * engine. */
  def bpeCoverage(docs: DataFrame, spark: SparkSession,
      merges: Seq[(String, String)]): DataFrame = {
    val statUdf = udf((text: String) => {
      var nTok = 0L; var nChars = 0L; var nMerged = 0L
      text.split(" ").foreach { w =>
        var syms: Seq[String] = w.map(_.toString)
        merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
        nTok += syms.length
        nChars += w.length
        nMerged += syms.count(_.length > 1)
      }
      (nTok, nChars, nMerged)
    })
    docs.select(col("source"), statUdf(col("text")).as("st"))
      .groupBy("source")
      .agg(sum("st._1").as("n_tokens"), sum("st._2").as("n_chars"),
        sum("st._3").as("n_merged"))
      .select(col("source"), col("n_tokens"), col("n_chars"),
        col("n_merged"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"),
        (col("n_merged").cast("double") / col("n_tokens").cast("double"))
          .as("merged_frac"))
  }

  /** Tokenize the corpus into ordered token STREAMS — the actual
    * "text → training tokens" pass (counts tell you the budget; this
    * is what gets packed and fed to the trainer). One per-row map +
    * posexplode, no shuffle; the merge table is tiny driver state
    * broadcast inside the UDF closure. */
  def bpeEncode(docs: DataFrame, spark: SparkSession,
      merges: Seq[(String, String)]): DataFrame = {
    val encUdf = udf((text: String) =>
      text.split(" ").flatMap { w =>
        var syms: Seq[String] = w.map(_.toString)
        merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
        syms
      })
    docs.select(col("doc_id"),
        posexplode(encUdf(col("text"))).as(Seq("pos", "token")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("token_no"),
        col("token"))
  }
}
