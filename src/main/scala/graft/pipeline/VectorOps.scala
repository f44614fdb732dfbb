package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
      expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
        .as("q"))
      .withColumn("nq",
        expr("aggregate(q, 0L, (acc, x) -> acc + x * x)"))

  private def cosine = {
    val dot = expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, x) -> acc + x)")
    dot.cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
  }

  /** Top-N most similar pairs over the whole collection (the brute-force
    * near-duplicate report; at scale the LSH path below prunes first). */
  def nearDupPairs(emb: DataFrame, topN: Int = 100): DataFrame = {
    val q = quantized(emb)
    val a = q.select(col("vec_id").as("va"), col("q").as("qa"), col("nq").as("na"))
    val b = q.select(col("vec_id").as("vb"), col("q").as("qb"), col("nq").as("nb"))
    val w = Window.orderBy(col("cos").desc, col("va"), col("vb"))
    a.join(b, col("va") < col("vb"))
      .withColumn("cos", cosine)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("va"), col("vb"), col("cos"), col("rnk").cast("long").as("rnk"))
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

  /** Random-hyperplane LSH buckets: `bits` hyperplanes with ±1 weights
    * derived from md5 parity (deterministic, engine-portable); bucket =
    * Σ bit_j·2^j. The scale path: vectors are bucketed once (one shuffle
    * on a uniform key), queries probe only their own bucket. */
  def lshBuckets(emb: DataFrame, bits: Int = 6): DataFrame = {
    val q = quantized(emb)
    q.select(col("vec_id"), col("nq"), col("q"), posexplode(col("q")))
      .select(col("vec_id"), col("nq"), col("q"),
        (col("pos") + 1).as("i"), col("col").as("x"))
      .withColumn("j", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("wsign",
        when(ascii(substring(md5(concat_ws("#", col("j"), col("i"))), 1, 1)) % 2 === 1, 1L)
          .otherwise(-1L))
      .groupBy("vec_id", "j")
      .agg(sum(col("wsign") * col("x")).as("proj"),
        first("nq").as("nq"), first("q").as("q"))
      .groupBy("vec_id")
      .agg(sum(when(col("proj") > 0, expr("CAST(pow(2, j) AS BIGINT)"))
        .otherwise(0L)).as("bucket"),
        first("nq").as("nq"), first("q").as("q"))
  }

  /** LSH-bucketed approximate top-k: candidates share the query's
    * bucket; exact cosine ranking within the bucket. */
  def annLsh(emb: DataFrame, nQueries: Int = 5, k: Int = 5,
      bits: Int = 6): DataFrame = {
    val buckets = lshBuckets(emb, bits)
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
}
