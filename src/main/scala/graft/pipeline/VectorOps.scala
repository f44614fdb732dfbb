package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.longArrayDot

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Numeric discipline: embeddings are quantized to integer millis
  * (×1000, round) so dot products and norms are *exact* integer sums —
  * independent of summation order across engines and partitions; the
  * only float ops are the final sqrt/divide, which are single
  * deterministic expressions. Cosine ranking is therefore reproducible
  * bit-for-bit anywhere.
  */
object VectorOps {

  /** (vec_id, q: Array[Long] quantized, nq: Long squared norm). */
  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      graft.functions.GraftFunctions.floatArrayMilli(col("embedding")).as("q"))
      .withColumn("nq", longArrayDot(col("q"), col("q")))

  private def cosine = {
    val dot = longArrayDot(col("qa"), col("qb"))
    dot.cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
  }

  /** Top-N most similar pairs over the whole collection (the brute-force
    * near-duplicate report; at scale the LSH path below prunes first). */
  def nearDupPairs(emb: DataFrame, topN: Int = 100): DataFrame = {
    val q = quantized(emb)
    val a = q.select(col("vec_id").as("va"), col("q").as("qa"), col("nq").as("na"))
    val b = q.select(col("vec_id").as("vb"), col("q").as("qb"), col("nq").as("nb"))
    // distributed top-k (TakeOrderedAndProject), then rank the tiny result —
    // never a single-partition window over the full O(n²) pair space
    val top = a.join(b, col("va") < col("vb"))
      .withColumn("cos", cosine)
      .select("va", "vb", "cos")
      .orderBy(col("cos").desc, col("va"), col("vb"))
      .limit(topN)
    val w = Window.orderBy(col("cos").desc, col("va"), col("vb"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** Brute-force cosine top-k for each query vector (vec_id < nQueries):
    * the exact baseline an ANN variant is validated against. */
  def annTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val q = quantized(emb)
    val queries = q.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nq").as("na"))
    val cands = q.select(col("vec_id").as("vb"), col("q").as("qb"), col("nq").as("nb"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vb"))
    broadcast(queries).join(cands, col("query_id") =!= col("vb"))
      .withColumn("cos", cosine)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vb").as("vec_id"), col("cos"))
  }

  /** Collection-size-scaled hyperplane count: enough bits that the
    * expected bucket holds ~`targetBucket` vectors (fixed bits ⇒ bucket
    * size n/2^bits, quadratic probe cost at corpus scale). Never below
    * 6. */
  def scaledBits(n: Long, targetBucket: Int = 16): Int =
    math.max(6, math.ceil(
      math.log(math.max(1L, n / targetBucket).toDouble) / math.log(2.0)).toInt)

  /** The ±1 hyperplane weight for (hyperplane j, 1-based dim i) — the
    * driver-side twin of the SQL formula
    * `ascii(substring(md5(concat_ws('#', j, i)), 1, 1)) % 2 = 1`:
    * signs depend only on (j, i), so they are computed once here
    * instead of n·d·bits times inside a per-row aggregate. */
  private[pipeline] def lshSign(j: Int, i: Int): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j#$i".getBytes("UTF-8"))
    val firstHexChar = "%02x".format(digest(0) & 0xff).charAt(0)
    if (firstHexChar.toInt % 2 == 1) 1L else -1L
  }

  /** Random-hyperplane LSH buckets: `bits` hyperplanes with ±1 weights
    * derived from md5 parity (deterministic, engine-portable); bucket =
    * Σ bit_j·2^j. The scale path: vectors are bucketed once, each
    * projection is one codegen'd dot against a constant ±1 sign vector
    * (the md5-derived matrix is bits×d driver-side literals — no
    * per-row hashing), queries probe only their own bucket. */
  def lshBuckets(emb: DataFrame, bits: Int = 6): DataFrame = {
    val q = quantized(emb)
    // dimension count read once from the data (vectors are fixed-width);
    // empty input keeps the schema and yields an empty result instead
    // of crashing on head()
    val first = emb.select(size(col("embedding"))).head(1)
    if (first.isEmpty) return q.withColumn("bucket", lit(0L)).limit(0)
    val d = first(0).getInt(0)
    val bucket = (0 until bits).map { j =>
      val signs = array((1 to d).map(i => lit(lshSign(j, i))): _*)
      when(longArrayDot(col("q"), signs) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    q.withColumn("bucket", bucket)
  }

  /** IVF-Flat approximate top-k: a coarse quantizer of `nCells`
    * centroids (deterministic training sample: the first `nCells`
    * vectors by id — engine-portable, no iterative k-means), every
    * vector assigned to its nearest centroid once (one broadcast of the
    * tiny centroid table, one shuffle on cell id), queries probing the
    * `nProbe` nearest cells with exact cosine re-ranking inside. The
    * inverted-file structure is the standard scale path when
    * hyperplane LSH recall is insufficient: cells ≈ √n keeps probe
    * cost O(√n) per query. */
  def annIvf(emb: DataFrame, nQueries: Int = 5, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    val q = quantized(emb)
    val cents = q.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"),
        col("nq").as("cnq"))
    val centCos = (longArrayDot(col("q"), col("cq")).cast("double") /
      (sqrt(col("nq").cast("double")) * sqrt(col("cnq").cast("double"))))
      .as("ccos")
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    // feeds both the assignment and the probe list — evaluate the
    // centroid-scoring join + window once
    val scored = q.join(broadcast(cents)).withColumn("ccos", centCos)
      .withColumn("crn", row_number().over(wAssign))
      .localCheckpoint(false)
    val assign = scored.filter(col("crn") === 1)
      .select(col("vec_id").as("vb"), col("cent_id"),
        col("q").as("qb"), col("nq").as("nb"))
    val probes = scored.filter(col("vec_id") < nQueries &&
      col("crn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("q").as("qa"), col("nq").as("na"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vb"))
    probes.join(assign, Seq("cent_id"))
      .filter(col("query_id") =!= col("vb"))
      .withColumn("cos", cosine)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vb").as("vec_id"), col("cos"))
  }

  /** LSH-bucketed approximate top-k: candidates share the query's
    * bucket; exact cosine ranking within the bucket. `bits` defaults to
    * the collection-size-scaled count (one cheap count() to size it) so
    * buckets stay ~constant-size as the collection grows. */
  def annLsh(emb: DataFrame, nQueries: Int = 5, k: Int = 5,
      bits: Int = -1): DataFrame = {
    val useBits = if (bits > 0) bits else scaledBits(emb.count())
    // both sides of the bucket join — evaluate the hyperplane-sign
    // pass once
    val buckets = lshBuckets(emb, useBits).localCheckpoint(false)
    val queries = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("bucket"),
        col("q").as("qa"), col("nq").as("na"))
    val cands = buckets
      .select(col("vec_id").as("vb"), col("bucket"),
        col("q").as("qb"), col("nq").as("nb"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vb"))
    queries.join(cands, Seq("bucket"))
      .filter(col("query_id") =!= col("vb"))
      .withColumn("cos", cosine)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vb").as("vec_id"), col("cos"))
  }

  /** ANN quality evaluation: recall@k of the LSH path against the
    * exact brute-force top-k, per query — the self-measuring metric
    * that decides the bit/bucket budget before an index is trusted at
    * corpus scale (run it on a sample, tune `bits`, then index the
    * full collection). Integer numerator/denominator; the one double
    * division is deterministic. */
  def annRecall(emb: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame =
    recallAgainstExact(emb, annLsh(emb, nQueries, k), nQueries, k)

  /** Recall@k of the IVF index against the same exact baseline. */
  def annRecallIvf(emb: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame =
    recallAgainstExact(emb, annIvf(emb, nQueries, k), nQueries, k)

  /** Shared harness: |exact ∩ approx| / |exact| per query for ANY
    * approximate result in the (query_id, vec_id) shape — the way a
    * new index variant gets admitted (measure on a sample, compare,
    * then trust). */
  private def recallAgainstExact(emb: DataFrame, approx: DataFrame,
      nQueries: Int, k: Int): DataFrame = {
    val exact = annTopK(emb, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    exact.join(
        approx.select(col("query_id"), col("vec_id"), lit(1).as("hit")),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
  }
}
