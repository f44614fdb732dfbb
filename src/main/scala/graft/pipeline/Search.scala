package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the document corpus: Okapi BM25 with the
  * Lucene idf variant (`ln(1 + (N - df + 0.5) / (df + 0.5))`, always
  * positive). A training-data pipeline uses this shape for targeted
  * corpus slicing (pull every document matching a topic probe) and for
  * quality/contamination probes, so it is built index-style, the way a
  * 100 TB deployment would run it:
  *
  *   - the (doc, term) frequency table is the inverted index — one
  *     explode + hash aggregate, shuffle keyed on the term (a content
  *     hash, uniform);
  *   - the query set, its vocabulary, and the per-term document
  *     frequencies are tiny and BROADCAST, so postings are semi-joined
  *     down to queried terms before anything wide happens;
  *   - corpus stats (N, Σdl) ride a broadcast one-row frame, never a
  *     driver-side collect;
  *   - final ranking reuses the package-wide two-stage salted top-k
  *     ([[VectorOps.topKPerQuery]]) — no task ever holds one query's
  *     full posting union.
  *
  * Scores are summed as exact nano-unit longs (each term's partial is
  * rounded to 1e-9 first), so the aggregate is order-independent and
  * bit-stable across engines — the same integer-exactness discipline
  * as the market kernels' integer-cent walks.
  */
object Search {

  val Bm25K1: Double = 1.2
  val Bm25B: Double = 0.75

  /** Deterministic default probe set over the synthetic vocabulary. */
  val Bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark join fast",
    2L -> "hash table scan",
    3L -> "window agg batch",
    4L -> "customer order query value")

  /** SQL literal for the default probe set (the DuckDB mirror's VALUES
    * list), kept beside the Scala value so the two cannot drift. */
  def bm25QueriesSql: String =
    Bm25Queries.map { case (id, q) => s"(CAST($id AS BIGINT), '$q')" }
      .mkString(", ")

  /** BM25 top-k per query. Output: (query_id, rnk, doc_id, score_nano,
    * n_terms_matched), rnk 1..k ordered by score desc with doc_id
    * tiebreak (a total order, as [[VectorOps.topKPerQuery]] requires).
    */
  def bm25TopK(docs: DataFrame,
      queries: Seq[(Long, String)] = Bm25Queries,
      k: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE pass over the fat text column: doc length rides the explode
    // so the postings table already carries dl — no second scan, no
    // doc-keyed join later (that join would be a wide shuffle at
    // corpus scale; dl is O(corpus), never broadcastable)
    val words = docs.withColumn("words", split(col("text"), " "))
    val tf = words.select(col("doc_id"),
        size(col("words")).cast("long").as("dl"),
        explode(col("words")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    // corpus stats from the compact per-doc frame (split always yields
    // ≥ 1 element, so every doc has ≥ 1 postings row), not a re-scan
    val perDoc = tf.groupBy("doc_id").agg(max("dl").as("dl"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .groupBy("query_id", "term").agg(count(lit(1)).as("qtf"))
    val qvocab = qterms.select("term").distinct()
    // postings restricted to queried terms before any wide join
    val tfq = tf.join(broadcast(qvocab), "term")
    val df = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tfq
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), "term")
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("term_score",
        col("qtf") * col("idf") * (col("tf") * lit(Bm25K1 + 1.0)) /
          (col("tf") + lit(Bm25K1) *
            (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
      .withColumn("term_score_nano",
        round(col("term_score") * lit(1e9)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score_nano").as("score_nano"),
        count(lit(1)).as("n_terms_matched"))
      .withColumnRenamed("doc_id", "vb")
    VectorOps.topKPerQuery(scored, k, col("score_nano").desc, col("vb"))
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vb").as("doc_id"), col("score_nano"), col("n_terms_matched"))
  }

  /** Hard-negative mining for contrastive retrieval training: per
    * query, documents that score HIGH lexically (BM25 candidate set)
    * but sit FAR from the top-ranked positive in embedding space
    * (centroid cosine ≤ `maxCos`) — the classic "lexically plausible,
    * semantically wrong" negatives a dual-encoder trains against.
    * Cross-modal composition: `docs.doc_id` ↔ `emb.vec_id`. Scale
    * shape: the candidate set is O(queries · kCand) and BROADCAST into
    * the big quantized-vector frame twice (candidate side, positive
    * side) — the corpus-sized frame is never shuffled; the final
    * re-rank is a window over ≤ kCand rows per query. Output:
    * (query_id, rnk, doc_id, score_nano, cos) — cos is the bit-stable
    * integer-dot/√norms expression shared with every vector ranking. */
  def hardNegatives(docs: DataFrame, emb: DataFrame,
      queries: Seq[(Long, String)] = Bm25Queries,
      kCand: Int = 10, maxCos: Double = 0.35, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = bm25TopK(docs, queries, kCand)
    val pos = cand.filter(col("rnk") === 1)
      .select(col("query_id"), col("doc_id").as("pos_id"))
    val candPos = cand.join(broadcast(pos), "query_id")
      .select(col("query_id"), col("doc_id"), col("score_nano"),
        col("pos_id"))
    val vq = VectorOps.quantized(emb)
    val withVecs = vq
      .select(col("vec_id").as("doc_id"), col("q").as("qa"),
        col("nq").as("na"))
      .join(broadcast(candPos), "doc_id")
    val scored = vq
      .select(col("vec_id").as("pos_id"), col("q").as("qb"),
        col("nq").as("nb"))
      .join(broadcast(withVecs), "pos_id")
      .withColumn("cos",
        graft.functions.GraftFunctions.longArrayDot(col("qa"), col("qb"))
          .cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .filter(col("doc_id") =!= col("pos_id"))
      .filter(col("cos") <= maxCos)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_nano").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        col("score_nano"), col("cos"))
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    * the standard way a curation pipeline combines a LEXICAL ranking
    * (BM25) with a SEMANTIC one (nearest neighbors in embedding
    * space) without tuning score scales — each list contributes
    * `⌊10⁹ / (rrfK + rank)⌋` per document and the fused integer sum
    * re-ranks. The semantic list is query-by-example: the BM25 top-1
    * positive's vector retrieves its IVF-cell neighbors (the
    * [[hardNegatives]] cross-modal composition, `doc_id ≡ vec_id`),
    * so a document that never matches a query term but sits next to
    * the best lexical hit still surfaces — the recall win hybrid
    * search exists for.
    *
    * Scale shape: both lists are O(queries · kEach) and the fusion
    * join is tiny; the corpus-sized work is one BM25 pass (postings
    * semi-joined to query vocabulary before anything wide) and the
    * IVF-bounded kNN kernel. With `storedIndex` given (the persisted
    * `(vb, cent_id, qb, nb)` assignment lake of
    * [[VectorOps.ivfAssignments]]) the semantic side reads the STORED
    * posting lists — the [[graft.streaming.StreamingOps]] annProbe
    * idiom, zero passes over the raw embedding table per query batch,
    * the 100 TB serving shape; without it the assignment is computed
    * from `emb` in-query (one corpus pass — the self-contained oracle
    * shape). Both routes are row-identical under the same centroids
    * and the same `nProbe`: at nProbe > 1 the stored route needs the
    * centroid matrix persisted beside the index (`storedCents` —
    * [[graft.storage.Lake.readIvfCentroids]]) to re-derive each
    * positive's top-nProbe cells, buying the measured cell-boundary
    * recall back at ~nProbe× the semantic-side pair cost.
    * Integer reciprocal ranks make the fusion bit-stable on any
    * engine — no float score normalization to diverge on. Output:
    * (query_id, rnk, doc_id, rrf_nano, n_lists), n_lists = how many
    * of the two rankings surfaced the document. */
  def hybridSearch(docs: DataFrame, emb: DataFrame,
      queries: Seq[(Long, String)] = Bm25Queries,
      kEach: Int = 10, k: Int = 5, rrfK: Int = 60,
      trainedCents: Option[Array[Array[Long]]] = None,
      storedIndex: Option[DataFrame] = None,
      storedCents: Option[Array[Array[Long]]] = None,
      nProbe: Int = 1): DataFrame = {
    val lex = bm25TopK(docs, queries, kEach)
      .select(col("query_id"), col("doc_id"), col("rnk").as("rnk_lex"))
      .localCheckpoint(false) // feeds the positive AND the lex side
    val pos = lex.filter(col("rnk_lex") === 1)
      .select(col("query_id"), col("doc_id").as("pos_id"))
    // the kNN kernel with its QUERY side restricted to the positives:
    // row-identical to filtering the full self-graph (same cells,
    // sub-splits, cosine, tiebreak — the krr mirror still matches)
    // at O(positives · cell) pair cost instead of Σ|cell|²
    val posIds = Some(pos.select(col("pos_id").as("va")))
    val sem = storedIndex
      .map(ix => VectorOps.knnGraphFromIndex(ix, posIds, kEach,
        cents = storedCents, nProbe = nProbe))
      .getOrElse(VectorOps.knnGraphFor(emb, posIds, kEach,
        trainedCents = trainedCents, nProbe = nProbe))
      .join(broadcast(pos), col("va") === col("pos_id"))
      .select(col("query_id"), col("vb").as("doc_id"),
        col("rnk").as("rnk_sem"))
    val fused = lex
      .join(sem, Seq("query_id", "doc_id"), "full")
      .select(col("query_id"), col("doc_id").as("vb"),
        (coalesce(expr(s"1000000000 div ($rrfK + rnk_lex)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($rrfK + rnk_sem)"), lit(0L)))
          .as("rrf_nano"),
        (col("rnk_lex").isNotNull.cast("long") +
          col("rnk_sem").isNotNull.cast("long")).as("n_lists"))
    VectorOps.topKPerQuery(fused, k, col("rrf_nano").desc, col("vb"))
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vb").as("doc_id"), col("rrf_nano"), col("n_lists"))
  }
}
