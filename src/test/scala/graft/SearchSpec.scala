package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Search, TextPipeline}

/** Crafted-fixture proofs for the retrieval / inter-doc-dup signals. */
class SearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-search")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("interDocDupNgrams flags cross-doc grams, not intra-doc repeats") {
    // docs 1 and 2 share the 5-gram "a b c d e"; doc 3 repeats its own
    // unique gram twice (intra-doc only); doc 4 is too short for any.
    val d = docs(
      (1L, "a b c d e x y"),
      (2L, "z a b c d e"),
      (3L, "p q r s t p q r s t"),
      (4L, "u v"))
    val rows = TextPipeline.interDocDupNgrams(d)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    // doc 1: grams [abcde, bcdex, cdexy] → 1 duplicated slot
    assert(rows(0) === ((1L, 3L, 1L, 1.0 / 3)))
    // doc 2: grams [zabcd, abcde] → 1 duplicated slot
    assert(rows(1) === ((2L, 2L, 1L, 0.5)))
    // doc 3: 6 gram slots; "pqrst" twice and "qrstp"... all grams stay
    // inside doc 3 only → zero cross-doc duplicates despite repeats
    assert(rows(2)._1 === 3L)
    assert(rows(2)._2 === 6L)
    assert(rows(2)._3 === 0L)
    assert(rows(2)._4 === 0.0)
    // doc 4: under 5 words → surfaced with zero grams, NULL fraction
    assert(rows(3)._1 === 4L)
    assert(rows(3)._2 === 0L)
    assert(rows(3)._4.isNaN)
  }

  test("exactDedupNormalized unifies casing/punct/whitespace mutations") {
    val d = docs(
      (1L, "Hello,  WORLD!!"),
      (2L, "hello world"),
      (3L, "hello world."),
      (4L, "a different document"))
    val rows = TextPipeline.exactDedupNormalized(d)
      .orderBy("doc_id").collect()
    // docs 1-3 normalize to "hello world": one group, keeper = 1
    assert(rows.take(3).forall(_.getAs[Long]("keep_id") == 1L))
    assert(rows.take(3).forall(_.getAs[Long]("group_size") == 3L))
    assert(!rows(0).getAs[Boolean]("is_dup"))
    assert(rows(1).getAs[Boolean]("is_dup"))
    assert(rows(2).getAs[Boolean]("is_dup"))
    assert(rows(3).getAs[Long]("group_size") == 1L)
    // byte-exact dedup sees three distinct docs — the normalization
    // stage exists precisely to close that gap
    val exact = TextPipeline.exactDedup(d).collect()
    assert(exact.count(!_.getAs[Boolean]("is_dup")) == 4)
  }

  test("bm25TopK scores the single-term textbook case exactly") {
    // N=2, df=1, tf=1, dl=avgdl=2 → the length norm cancels and
    // score = ln(1 + 1.5/1.5) = ln 2 exactly; nano-rounded.
    val d = docs((1L, "apple pear"), (2L, "plum kiwi"))
    val rows = Search.bm25TopK(d, Seq(10L -> "apple"), k = 5).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("query_id") === 10L)
    assert(r.getAs[Long]("rnk") === 1L)
    assert(r.getAs[Long]("doc_id") === 1L)
    assert(r.getAs[Long]("score_nano") ===
      math.round(math.log(2.0) * 1e9))
    assert(r.getAs[Long]("n_terms_matched") === 1L)
  }

  test("bm25TopK ranks rare-term matches above common-term matches") {
    // "rare" appears in one doc, "common" in all four; the rare match
    // must outrank any common-only match for a query with both terms.
    val d = docs(
      (1L, "common alpha beta gamma"),
      (2L, "common delta epsilon zeta"),
      (3L, "common rare eta theta"),
      (4L, "common iota kappa lambda"))
    val rows = Search.bm25TopK(d, Seq(1L -> "rare common"), k = 4)
      .orderBy("rnk").collect()
    assert(rows.length === 4)
    assert(rows.head.getAs[Long]("doc_id") === 3L)
    assert(rows.head.getAs[Long]("n_terms_matched") === 2L)
    // remaining docs tie on score (identical tf/dl) → doc_id order
    assert(rows.tail.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 4L))
    // rnk is dense 1..4
    assert(rows.map(_.getAs[Long]("rnk")).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("lengthQuantiles picks the exact type-1 rank per source") {
    val d = Seq(
      (1L, "a", 10L, "A"), (2L, "a", 20L, "A"),
      (3L, "a", 30L, "A"), (4L, "a", 40L, "A"),
      (5L, "a", 5L, "B"))
      .toDF("doc_id", "text", "n_chars", "source")
    val got = TextPipeline.lengthQuantiles(d)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // n=4: ranks for q = (0, .25, .5, .75, 1) are (1, 1, 2, 3, 4)
    assert(got.filter(_._1 == "A").map(x => (x._2, x._3)).toSeq ===
      Seq((0.0, 10L), (0.25, 10L), (0.5, 20L), (0.75, 30L), (1.0, 40L)))
    assert(got.filter(_._1 == "B").map(_._3).toSeq ===
      Seq(5L, 5L, 5L, 5L, 5L))
    assert(got.forall(x => x._4 == (if (x._1 == "A") 4L else 1L)))
  }

  test("hardNegatives keeps lexical matches that are embedding-far") {
    // query "x": doc 1 is the positive (highest tf); doc 2 matches
    // lexically but is embedding-NEAR the positive (excluded); doc 3
    // matches lexically and is embedding-FAR (the hard negative).
    val d = docs((1L, "x x x"), (2L, "x y"), (3L, "x z"))
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val rows = Search.hardNegatives(d, emb, Seq(1L -> "x"),
        kCand = 3, maxCos = 0.35, k = 5)
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("doc_id") === 3L)
    assert(rows.head.getAs[Long]("rnk") === 1L)
    assert(rows.head.getAs[Double]("cos") === 0.0)
  }

  test("clusterSample keeps per-cell quotas and separates clear clusters") {
    import graft.pipeline.VectorOps
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // seed cell 0 (x-axis)
      (1L, Array(0.0f, 1.0f)),   // seed cell 1 (y-axis)
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.95f, 0.05f)),
      (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val kept = VectorOps.clusterSample(emb, nCells = 2, perCell = 2)
      .collect()
      .map(r => (r.getAs[Long]("cent_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("vec_id")))
    val byCell = kept.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // the x-axis family {0,2,3} shares a cell and truncates to 2; the
    // y-axis family {1,4} fits entirely
    assert(byCell.values.forall(_.size <= 2))
    val xCell = byCell.find(_._2.contains(0L)).get._2
    val yCell = byCell.find(_._2.contains(1L)).get._2
    assert(xCell.subsetOf(Set(0L, 2L, 3L)) && xCell.size == 2)
    assert(yCell == Set(1L, 4L))
    // ranks are dense 1..n within each cell
    kept.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq ===
        (1L to rows.length.toLong).toSeq)
    }
  }

  test("semDedup keeps exactly the least-prototypical member of a " +
      "fully-connected duplicate group") {
    import graft.pipeline.VectorOps
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // seed cell 0 (x-axis)
      (1L, Array(0.0f, 1.0f)),   // seed cell 1 (y-axis)
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.95f, 0.05f)),
      (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val rows = VectorOps.semDedup(emb, threshold = 0.45, nCells = 2)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
        r.getAs[Double]("ccos"), r.getAs[Boolean]("kept")))
    assert(rows.length === 5)             // every vector is surfaced
    // both cells are fully connected at τ=0.45 (all intra-cell cosines
    // ≥ 0.99), so each keeps exactly one member — the lowest-ccos one
    // (lowest vec_id on ties), per the SemDeDup keep rule
    rows.groupBy(_._2).foreach { case (_, cell) =>
      val kept = cell.filter(_._4)
      assert(kept.length === 1)
      val want = cell.minBy(v => (v._3, v._1))
      assert(kept.head._1 === want._1)
    }
  }

  test("knnGraph ranks cell-mates by cosine and never crosses cells") {
    import graft.pipeline.VectorOps
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.95f, 0.05f)),
      (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val rows = VectorOps.knnGraph(emb, k = 5, nCells = 2)
      .collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("rnk"),
        r.getAs[Long]("vb"), r.getAs[Double]("cos")))
    val byVa = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._2)).toMap
    // cells are {0,2,3} and {1,4}: degree 2 inside x, 1 inside y
    assert(byVa(0L).map(_._3).toSet === Set(2L, 3L))
    assert(byVa(1L).map(_._3).toSeq === Seq(4L))
    assert(byVa(4L).map(_._3).toSeq === Seq(1L))
    // 3 is closer to 0 than 2 is (cos(0,3) > cos(0,2))
    assert(byVa(0L).head._3 === 3L)
    // ranks dense from 1, cosine non-increasing within each va
    byVa.values.foreach { ns =>
      assert(ns.map(_._2).toSeq === (1L to ns.length.toLong).toSeq)
      assert(ns.map(_._4).toSeq.reverse.sorted.reverse ===
        ns.map(_._4).toSeq)
    }
  }

  test("hybridSearch fuses lexical and semantic ranks by integer RRF") {
    import graft.pipeline.{Search, VectorOps}
    // doc 0 is the lexical positive (alpha x2 + beta), doc 1 a weak
    // lexical match; docs 2/3 never match a query term. Embeddings:
    // doc 3 is doc 0's nearest neighbor, doc 2 second, doc 1 last.
    // RRF consensus: doc 1 (in BOTH lists) must outrank doc 0 (lex
    // rank 1 only), and doc 3 surfaces with no lexical match at all.
    val docs = Seq(
      (0L, "alpha beta alpha"),
      (1L, "alpha noise1 noise2"),
      (2L, "gamma delta"),
      (3L, "epsilon zeta")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(100f, 1f, 0f, 0f)),
      (1L, Array(0f, 0f, 100f, 0f)),
      (2L, Array(0f, 100f, 0f, 0f)),
      (3L, Array(100f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = Search.hybridSearch(docs, emb,
        queries = Seq(7L -> "alpha beta"), kEach = 10, k = 5,
        trainedCents = Some(Array(Array(1000L, 0L, 0L, 0L))))
      .orderBy("rnk").collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_nano"), r.getAs[Long]("n_lists")))
    // 1e9 div 61 = 16393442, div 62 = 16129032, div 63 = 15873015;
    // doc 1 = lex rank 2 + sem rank 3; docs 0 and 3 tie (lex-1 vs
    // sem-1) -> doc_id breaks it; doc 2 = sem rank 2 only
    assert(got.toSeq === Seq(
      (1L, 1L, 16129032L + 15873015L, 2L),
      (2L, 0L, 16393442L, 1L),
      (3L, 3L, 16393442L, 1L),
      (4L, 2L, 16129032L, 1L)))
  }

  test("hybridSearch over the stored index equals the recompute route") {
    import graft.pipeline.{Search, VectorOps}
    // same fixture as the RRF test; the semantic side served from a
    // PERSISTED assignment lake (the 100 TB shape — zero passes over
    // the embedding table) must be row-identical to in-query
    // re-assignment under the same centroids
    val docs = Seq(
      (0L, "alpha beta alpha"),
      (1L, "alpha noise1 noise2"),
      (2L, "gamma delta"),
      (3L, "epsilon zeta")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(100f, 1f, 0f, 0f)),
      (1L, Array(0f, 0f, 100f, 0f)),
      (2L, Array(0f, 100f, 0f, 0f)),
      (3L, Array(100f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val cents = Array(Array(1000L, 0L, 0L, 0L), Array(0L, 1000L, 0L, 0L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hybrid_ix_").toString
    try {
      VectorOps.ivfAssignments(emb, cents)
        .write.mode("overwrite").parquet(dir)
      val stored = Search.hybridSearch(docs, emb,
          queries = Seq(7L -> "alpha beta"), kEach = 10, k = 5,
          storedIndex = Some(spark.read.parquet(dir)))
        .orderBy("rnk").collect().map(_.toSeq)
      val recomputed = Search.hybridSearch(docs, emb,
          queries = Seq(7L -> "alpha beta"), kEach = 10, k = 5,
          trainedCents = Some(cents))
        .orderBy("rnk").collect().map(_.toSeq)
      assert(stored.toSeq === recomputed.toSeq)
      assert(stored.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("ivfTrainCached retrains when the parquet at its path is overwritten") {
    import graft.pipeline.VectorOps
    // the memo keys on plan + DATA fingerprint: overwriting the same
    // path in-session must retrain (ADVICE r12 — a plan-only key
    // silently served centroids trained on the old data)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_memo_").toString
    def write(rows: Seq[(Long, Array[Float])]): Unit =
      rows.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(dir)
    try {
      write(Seq((0L, Array(10f, 0f)), (1L, Array(0f, 10f)),
        (2L, Array(9f, 1f)), (3L, Array(1f, 9f))))
      val c1 = VectorOps.ivfTrainCached(
        spark.read.parquet(dir), nCells = 2, iters = 1)
      // second call on UNCHANGED data: memo hit, same object
      val c1b = VectorOps.ivfTrainCached(
        spark.read.parquet(dir), nCells = 2, iters = 1)
      assert(c1b eq c1)
      write(Seq((0L, Array(0f, 7f)), (1L, Array(7f, 0f)),
        (2L, Array(1f, 6f)), (3L, Array(6f, 1f))))
      val c2 = VectorOps.ivfTrainCached(
        spark.read.parquet(dir), nCells = 2, iters = 1)
      val fresh = VectorOps.ivfTrain(
        spark.read.parquet(dir), nCells = 2, iters = 1)
      assert(c2.map(_.toSeq).toSeq === fresh.map(_.toSeq).toSeq)
      assert(c2.map(_.toSeq).toSeq !== c1.map(_.toSeq).toSeq)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("triangleStats counts closed wedges per vector with exact coefficients") {
    import graft.pipeline.VectorOps
    // one cell (explicit single centroid), k = 2: trio 0/1/2 are
    // mutually nearest (a closed triangle), 3/4 pair off, 5 is
    // orthogonal to everyone (k-lists still name others, but nobody
    // names 5 back -> mutual degree 0)
    val emb = Seq(
      (0L, Array(100f, 1f, 0f, 0f)),
      (1L, Array(100f, 0f, 1f, 0f)),
      (2L, Array(100f, 0f, 0f, 1f)),
      (3L, Array(0f, 100f, 1f, 0f)),
      (4L, Array(0f, 100f, 0f, 1f)),
      (5L, Array(0f, 0f, 100f, 100f))).toDF("vec_id", "embedding")
    val cents = Some(Array(Array(1000L, 0L, 0L, 0L)))
    val got = VectorOps.triangleStats(emb, k = 2, trainedCents = cents)
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("deg"),
        r.getAs[Long]("triangles"), r.getAs[Long]("coeff_nano")))
    // trio: deg 2, one triangle, coeff = 2e9*1/(2*1) = 1e9 (closed);
    // pair: deg 1 (coefficient undefined -> 0); isolated: all zeros
    assert(got.toSeq === Seq(
      (0L, 2L, 1L, 1000000000L),
      (1L, 2L, 1L, 1000000000L),
      (2L, 2L, 1L, 1000000000L),
      (3L, 1L, 0L, 0L),
      (4L, 1L, 0L, 0L),
      (5L, 0L, 0L, 0L)))
  }

  test("knnClusters closes mutual-kNN edges into per-cell components") {
    import graft.pipeline.VectorOps
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.95f, 0.05f)),
      (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val rows = VectorOps.knnClusters(emb, k = 5, nCells = 2)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_canonical")))
      .sortBy(_._1)
    // k=5 keeps every cell-mate edge, all mutual → one component per
    // cell: {0,2,3} labeled 0 and {1,4} labeled 1
    assert(rows.map(r => (r._1, r._2)).toSeq ===
      Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 0L), (4L, 1L)))
    assert(rows.filter(_._2 == 0L).forall(_._3 == 3L))
    assert(rows.filter(_._2 == 1L).forall(_._3 == 2L))
    assert(rows.filter(_._4).map(_._1).toSeq === Seq(0L, 1L))
  }

  test("knnClusters at k=1 splits a chain at the non-mutual link") {
    import graft.pipeline.VectorOps
    // one cell; 2's nearest is 3 and vice versa; 0's nearest is 2 but
    // 2's top-1 is NOT 0 → the 0–2 edge is dropped at k=1
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.80f, 0.20f)),
      (2L, Array(0.90f, 0.10f)),
      (3L, Array(0.91f, 0.09f))).toDF("vec_id", "embedding")
    val labels = VectorOps.knnClusters(emb, k = 1, nCells = 1)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(labels(2L) === labels(3L))
    assert(labels(0L) !== labels(2L))
  }

  test("boilerplateRemove cuts corpus-hot chunks everywhere, keeps order") {
    val d = docs(
      (1L, "m m m a b c t u v"),   // hot chunk in the MIDDLE
      (2L, "a b c p q r"),
      (3L, "u v w"),
      (4L, "a b c"))               // all-boilerplate doc survives empty
    val rows = TextPipeline.boilerplateRemove(d, chunkWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // "a b c" appears in 3 docs → removed from every one of them;
    // doc 1's surviving chunks stay in original order
    assert(rows.toSeq === Seq(
      (1L, "m m m t u v", 2L),
      (2L, "p q r", 1L),
      (3L, "u v w", 1L),
      (4L, "", 0L)))
  }

  test("knnRecall is exactly 1.0 when a single cell holds everything") {
    import graft.pipeline.VectorOps
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.95f, 0.05f)),
      (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val rows = VectorOps.knnRecall(emb, k = 2, nCells = 1).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Double]("recall") === 1.0))
    assert(rows.forall(_.getAs[Long]("n_exact") === 2L))
  }

  test("semKeepBest keeps the highest-quality member of each cluster") {
    import graft.pipeline.{TextPipeline, VectorOps}
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.95f, 0.05f)),
      (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val d = docs(
      (0L, "short"),
      (1L, "a reasonable document with several words here"),
      (2L, "this is a longer and cleaner sentence with many words and structure"),
      (3L, "x"),
      (4L, "yy zz"))
    val quality = TextPipeline.qualityScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("quality_score")).toMap
    val rows = VectorOps.semKeepBest(d, emb, k = 5, nCells = 2)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("keep_doc"), r.getAs[Boolean]("is_kept")))
    assert(rows.length === 5)
    rows.groupBy(_._2).foreach { case (_, cl) =>
      val members = cl.map(_._1)
      val expect = members.minBy(m => (-quality(m), m))
      assert(cl.forall(_._3 == expect))          // shared keeper
      assert(cl.count(_._4) === 1)               // exactly one kept
      assert(cl.find(_._4).get._1 === expect)
    }
  }

  test("sourceDrift is zero for matching distributions, ln2-nano for " +
      "disjoint ones") {
    val same = Seq(
      (1L, "x x y", "srcA"),
      (2L, "x x y", "srcB")).toDF("doc_id", "text", "source")
    val rows = TextPipeline.sourceDrift(same).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // both sources match the corpus distribution exactly → KL = 0
    assert(rows === Map("srcA" -> 0L, "srcB" -> 0L))

    val split = Seq(
      (1L, "x x x", "srcA"),
      (2L, "y y y", "srcB")).toDF("doc_id", "text", "source")
    val drift = TextPipeline.sourceDrift(split).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // p = 1, q = 1/2 → contribution ⌊1e9·ln 2⌋ for each source
    val ln2nano = math.floor(1e9 * math.log(2.0)).toLong
    assert(drift === Map("srcA" -> ln2nano, "srcB" -> ln2nano))
  }

  test("dedupAudit reports exact pair Jaccard on a crafted near-dup") {
    // docs 1/2 share two of three shingles; doc 3 is unrelated (no
    // shared band) and must not produce a pair
    val d = docs(
      (1L, "a b c d e"),
      (2L, "a b c d x"),
      (3L, "p q r s t"))
    val rows = TextPipeline.dedupAudit(d, n = 10)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_sh_a"), r.getAs[Long]("n_sh_b"),
        r.getAs[Long]("n_common"), r.getAs[Double]("jaccard")))
    assert(rows.forall(p => Set(p._1, p._2).subsetOf(Set(1L, 2L))))
    rows.find(p => p._1 == 1L && p._2 == 2L).foreach { p =>
      // shingles: {abc, bcd, cde} vs {abc, bcd, cdx} → 2 of 4
      assert(p._3 === 3L && p._4 === 3L && p._5 === 2L)
      assert(p._6 === 2.0 / 4.0)
    }
  }

  test("bm25TopK truncates to k with the doc_id tiebreak") {
    val d = docs((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "x y"))
    val rows = Search.bm25TopK(d, Seq(1L -> "x"), k = 2)
      .orderBy("rnk").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("substringDedup removes cross-doc duplicated runs and merges spans") {
    // doc 1 carries the shared 10-word run at word positions 4..13;
    // doc 2 IS the run (fully covered -> empty cleaned text); doc 3 is
    // unrelated; doc 4 is shorter than L
    val run = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(
      (1L, s"p1 p2 p3 $run t1 t2"),
      (2L, run),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (4L, "u v w"))
    val rows = TextPipeline.substringDedup(d).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("dup_spans"), r.getAs[Long]("dup_words"),
        r.getAs[String]("clean_md5")))
    // doc 1: L-grams at 4,5,6 are duplicated -> one span [4,13]
    assert(rows(0) === ((1L, 15L, 1L, 10L, md5Hex("p1 p2 p3 t1 t2"))))
    // doc 2: positions 1..3 duplicated -> whole doc covered
    assert(rows(1) === ((2L, 10L, 1L, 10L, md5Hex(""))))
    assert(rows(2) === ((3L, 9L, 0L, 0L,
      md5Hex("c1 c2 c3 c4 c5 c6 c7 c8 c9"))))
    assert(rows(3) === ((4L, 3L, 0L, 0L, md5Hex("u v w"))))
  }

  test("substringDedup catches same-document repeats as two spans") {
    // the 8-gram r1..r8 occurs at positions 1 and 10 of the SAME doc:
    // spans [1,8] and [10,17] (not touching -- position 9 survives)
    val r8 = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = docs((1L, s"$r8 mid $r8"))
    val row = TextPipeline.substringDedup(d).collect().head
    assert(row.getAs[Long]("n_words") === 17L)
    assert(row.getAs[Long]("dup_spans") === 2L)
    assert(row.getAs[Long]("dup_words") === 16L)
    assert(row.getAs[String]("clean_md5") === md5Hex("mid"))
  }

  test("charSpanDedup catches a mid-word repeat substringDedup provably misses") {
    // the shared 26-char span THEQUICKBROWNFOXJUMPSOVERX is embedded
    // MID-WORD with different flanking characters in each doc: the two
    // docs share NO equal word token at all (every word containing the
    // span differs at its edges), so the word-gram variant — at ANY L
    // — reports nothing, while the char-gram pass flags the span at
    // its exact (offset-shifted) positions in both docs
    val span = "THEQUICKBROWNFOXJUMPSOVERX"
    val d = docs(
      (1L, s"aa${span}bb cc dd"),
      (2L, s"e1 e2 zzz${span}qq ff"))
    // substringDedup reports one row per doc; zero flagged spans
    // anywhere proves the word-gram pass is blind to the repeat
    assert(TextPipeline.substringDedup(d, L = 1)
      .agg(sum("dup_spans")).collect().head.getLong(0) === 0L,
      "word grams must NOT see the mid-word span (no equal word)")
    val rows = TextPipeline.charSpanDedup(d, L = 26)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_no"),
        r.getAs[Long]("s"), r.getAs[Long]("e")))
    // doc 1: span chars 3..28 (1-based, after "aa"); doc 2: after
    // "e1 e2 zzz" = 9 chars + 1 -> 10..35
    assert(rows.toSeq === Seq((1L, 1L, 3L, 28L), (2L, 1L, 10L, 35L)))
  }

  test("charDeconSpans catches a mid-word benchmark quote decontaminateSpans misses") {
    // doc 0 is the benchmark; corpus doc 11 quotes its 26-char span
    // with prefix/suffix glued on (every word containing the quote
    // differs), so the word-level decon reports zero flagged spans
    // while the char pass flags the quote at its exact offset
    val quote = "THEQUICKBROWNFOXJUMPSOVERX"
    val d = docs(
      (0L, s"bench says $quote end"),
      (11L, s"prefix zz${quote}yy suffix"))
    assert(TextPipeline.decontaminateSpans(d, benchMax = 10, L = 1)
      .agg(sum("dup_spans")).collect().head.getLong(0) === 0L,
      "word-level decon must NOT see the mid-word quote")
    val rows = TextPipeline.charDeconSpans(d, benchMax = 10, L = 26)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_no"),
        r.getAs[Long]("s"), r.getAs[Long]("e")))
    // "prefix zz" = 9 chars -> quote at 10..35; only the CORPUS doc
    // reports (bench docs are never span targets)
    assert(rows.toSeq === Seq((11L, 1L, 10L, 35L)))
  }

  test("winnowed screen flags a >= L+w-1 shared run at EVERY offset pair") {
    // the winnowing guarantee is alignment-free: a shared run of
    // L+w-1 = 33 chars contains a full gram window whose
    // rightmost-min selection is content-determined, so both docs
    // flag REGARDLESS of where the run sits — swept over offset
    // pairs incl. all residues mod w (a positional-stride sampler
    // fails whenever the offsets differ mod s; this sweep is why
    // winnowing, not striding, is the shipped sparse screen)
    val run = "WINNOWGUARANTEESPANABCDEFGHIJ123" + "X" // 33 chars
    for (off <- 0 to 8) {
      val d = docs(
        (1L, "a" * 3 + run + "tail one"),
        (2L, "b" * (3 + off) + run + "other tail"),
        (3L, "unrelated filler text with no repeats at all"))
      val flagged = TextPipeline
        .charDupDocsWinnowed(d, L = 26, w = 8)
        .filter(col("is_flagged")).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(flagged === Set(1L, 2L), s"offset delta $off")
    }
  }

  test("charSpanDedup merges same-doc repeats and ignores short overlap") {
    // one doc repeats its own 30-char run at positions 1 and 42
    // (30 chars + " padpadpad " = 11): two disjoint spans; the
    // 20-char partial echo in doc 2 stays below L=26 and must not flag
    val run = "ABCDEFGHIJKLMNOPQRSTUVWXYZ1234"
    val d = docs(
      (1L, s"$run padpadpad $run"),
      (2L, run.take(20) + " tail tail tail"))
    val rows = TextPipeline.charSpanDedup(d, L = 26)
      .orderBy("doc_id", "span_no").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_no"),
        r.getAs[Long]("s"), r.getAs[Long]("e")))
    assert(rows.toSeq === Seq((1L, 1L, 1L, 30L), (1L, 2L, 42L, 71L)))
  }

  test("substringDedup catches a chunk-misaligned 60-word span chunkDedup misses") {
    // the Lee-et-al ExactSubstr property at ARBITRARY boundaries: a
    // repeated 60-word span placed at word offset 4 in one doc and
    // offset 2 in the other never aligns with chunkDedup's fixed
    // 10-word chunk grid (4 ≢ 2 mod 10), so the chunk-hash op finds
    // ZERO shared chunks — while the L-gram span union flags the full
    // span in both docs regardless of offset
    val span = (1 to 60).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, s"a1 a2 a3 $span a4 a5"),
      (2L, s"b1 $span b2 b3 b4 b5 b6 b7"))
    assert(TextPipeline.chunkDedup(d).count() === 0L,
      "fixed-grid chunk hashing must NOT see the misaligned span")
    val rows = TextPipeline.substringDedup(d).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_spans"),
        r.getAs[Long]("dup_words"), r.getAs[String]("clean_md5")))
    assert(rows(0) === ((1L, 1L, 60L, md5Hex("a1 a2 a3 a4 a5"))))
    assert(rows(1) === ((2L, 1L, 60L,
      md5Hex("b1 b2 b3 b4 b5 b6 b7"))))
  }

  test("tfidfTerms ranks rare repeated terms above ubiquitous ones") {
    // "common" appears in every doc → idf = ln(4/4) = 0 → score 0;
    // each doc's own repeated rare term must rank first
    val d = docs(
      (1L, "x x x common"),
      (2L, "y y common"),
      (3L, "z common"))
    val r = TextPipeline.tfidfTerms(d, k = 2).collect()
      .groupBy(_.getLong(0))
    assert(r(1L).minBy(_.getLong(1)).getString(2) == "x")
    assert(r(2L).minBy(_.getLong(1)).getString(2) == "y")
    assert(r(3L).minBy(_.getLong(1)).getString(2) == "z")
    // "common" scores exactly 0 everywhere (idf of an every-doc term)
    r.values.flatten.filter(_.getString(2) == "common")
      .foreach(row => assert(row.getLong(4) == 0L))
    // dense ranks 1..k per doc
    r.values.foreach(rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length)))
  }

  test("bloom-prefiltered decontamination equals the exact join") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val exact = TextPipeline.decontaminate(d).collect().sortBy(key)
    val bloom = TextPipeline.decontaminateBloom(d).collect().sortBy(key)
    assert(exact.nonEmpty)
    assert(bloom.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq)
    // an aggressive fpp (cheapest possible filter) must still be exact
    // — false positives die in the confirm join
    val loose = TextPipeline.decontaminateBloom(d, fpp = 0.5)
      .collect().sortBy(key)
    assert(loose.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq)
  }

  test("decontaminateSpans removes only benchmark-overlapping runs") {
    // bench doc 1 (< benchMax) holds the 8-gram b1..b8; corpus doc 20
    // quotes it mid-document, corpus doc 30 is clean. The corpus docs
    // sharing runs with EACH OTHER (not the bench) must NOT be cut.
    val quote = (1 to 8).map(i => s"b$i").mkString(" ")
    val shared = (1 to 8).map(i => s"c$i").mkString(" ")
    val d = docs(
      (1L, quote),
      (20L, s"pre $quote post"),
      (30L, s"$shared x"),
      (40L, s"$shared y"))
    val rows = TextPipeline.decontaminateSpans(d, benchMax = 10L)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(20L, 30L, 40L))
    val r20 = rows(0)
    assert(r20.getAs[Long]("dup_spans") === 1L)
    assert(r20.getAs[Long]("dup_words") === 8L)
    assert(r20.getAs[String]("clean_md5") === md5Hex("pre post"))
    // corpus-only duplication is substringDedup's business, not ours
    assert(rows(1).getAs[Long]("dup_spans") === 0L)
    assert(rows(2).getAs[Long]("dup_spans") === 0L)
  }

  test("dedupRecall grades the bands against exact-Jaccard truth") {
    // docs 2/4: identical (jaccard 1 >= tau, identical signatures so
    // the bands MUST pair them); docs 6/8: disjoint text (jaccard 0 —
    // outside the truth set); doc 3: odd id, outside the mod-2 sample
    val dup = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = docs(
      (2L, dup), (4L, dup),
      (6L, (1 to 12).map(i => s"x$i").mkString(" ")),
      (8L, (1 to 12).map(i => s"y$i").mkString(" ")),
      (3L, dup))
    val r = TextPipeline.dedupRecall(d).collect().head
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_true") === 1L)
    assert(r.getAs[Long]("n_hit") === 1L)
    assert(r.getAs[Double]("recall") === 1.0)
    val hit = r.getAs[Long]("n_hit")
    assert(hit <= r.getAs[Long]("n_cand") &&
      r.getAs[Double]("prec") ===
        hit.toDouble / r.getAs[Long]("n_cand"))
  }

  test("dedupRecall's truth side drops viral shingles at the dfCap") {
    // docs 6/8/10 are identical copies of a viral text: every one of
    // their shingles has in-sample df 3 > cap 2, so the cap strips
    // the whole group out of the TRUTH space (their pairs would be
    // df² fan-out on one shingle key at scale) — while docs 2/4
    // (identical, df 2 <= cap) remain a truth pair. The bands still
    // candidate the viral trio (identical signatures), so the cap
    // binding shows up as n_true = 1 with n_cand >= 4.
    val pair = (1 to 12).map(i => s"p$i").mkString(" ")
    val viral = (1 to 12).map(i => s"v$i").mkString(" ")
    val d = docs(
      (2L, pair), (4L, pair),
      (6L, viral), (8L, viral), (10L, viral))
    val r = TextPipeline.dedupRecall(d, dfCap = 2).collect().head
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_true") === 1L) // (2,4) only — cap bound
    assert(r.getAs[Long]("n_cand") >= 4L) // bands still pair the trio
    assert(r.getAs[Long]("n_hit") === 1L)
    assert(r.getAs[Double]("recall") === 1.0)
  }

  test("substringDedup merges overlapping and touching intervals") {
    // docs 1/2 share words 1..9 (grams at 1,2 -> span [1,9]) and doc 1
    // additionally shares words 10..17 with doc 3: spans [1,9] and
    // [10,17] touch -> ONE merged span [1,17] of 17 words
    val a = (1 to 9).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(
      (1L, s"$a $b tail1 tail2"),
      (2L, a),
      (3L, b))
    val row = TextPipeline.substringDedup(d).orderBy("doc_id")
      .collect().head
    assert(row.getAs[Long]("dup_spans") === 1L)
    assert(row.getAs[Long]("dup_words") === 17L)
    assert(row.getAs[String]("clean_md5") === md5Hex("tail1 tail2"))
  }

  test("sourceDistinctEstimate equals the driver KMV model per source") {
    // source a: two docs sharing one shingle (distinct-shingle count
    // 5, not 6); source b: one doc with 2 shingles; k = 4 makes the
    // kth minimum binding for a and exhaustive for b
    val d = Seq(
      (1L, "w1 w2 w3 w4 w5", "a"),   // shingles: w1w2w3 w2w3w4 w3w4w5
      (2L, "w3 w4 w5 w6 w7", "a"),   // w3w4w5 (dup) w4w5w6 w5w6w7
      (3L, "q1 q2 q3 q4", "b")       // q1q2q3 q2q3q4
    ).toDF("doc_id", "text", "source")
    def h48(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    val space = math.pow(16, 12)
    val model = Map(
      "a" -> Seq("w1 w2 w3", "w2 w3 w4", "w3 w4 w5", "w4 w5 w6",
        "w5 w6 w7"),
      "b" -> Seq("q1 q2 q3", "q2 q3 q4")
    ).map { case (src, sh) =>
      val mins = sh.map(h48).distinct.sorted.take(4)
      src -> ((mins.size.toLong, mins.max,
        (mins.size - 1).toDouble * space / mins.max.toDouble))
    }
    val got = TextPipeline.sourceDistinctEstimate(d, k = 4).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("k_minima"), r.getAs[Long]("kth_hash"),
          r.getAs[Double]("est_distinct")))).toMap
    assert(got == model)
  }
}
