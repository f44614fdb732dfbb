package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Search, TextPipeline}

/** Property tests: the distributed BM25 and inter-doc dup-n-gram
  * pipelines must equal driver-side reference models on arbitrary
  * small corpora (tiny alphabet → forced term collisions, repeated
  * grams, ties). Fixed scalacheck seeds — deterministic. */
class SearchPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-search-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val alphabet = Vector("ant", "bee", "cat", "dog", "eel", "fox",
    "gnu", "hen")

  private case class Corpus(docs: Vector[(Long, String)],
      queries: Vector[(Long, String)])

  private val genCorpus: Gen[Corpus] = for {
    n <- Gen.choose(2, 20)
    ids <- Gen.pick(n, (0 until 100).map(i => i * 3L + 1)).map(_.toVector)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 30)
      ws <- Gen.listOfN(len, Gen.oneOf(alphabet))
    } yield ws.mkString(" "))
    nq <- Gen.choose(1, 3)
    qs <- Gen.listOfN(nq, for {
      qlen <- Gen.choose(1, 3)
      ws <- Gen.listOfN(qlen, Gen.oneOf(alphabet))
    } yield ws.mkString(" "))
  } yield Corpus(ids.zip(texts),
    qs.zipWithIndex.map { case (q, i) => (i + 1L, q) }.toVector)

  /** Driver-side BM25 with the identical formula, association order,
    * and per-term nano rounding. */
  private def bm25Model(c: Corpus, k: Int): Map[(Long, Long), (Long, Long, Long)] = {
    val words = c.docs.map { case (id, t) => id -> t.split(" ", -1).toVector }
    val dl = words.map { case (id, w) => id -> w.length.toLong }.toMap
    val nDocs = c.docs.length.toLong
    val avgdl = dl.values.sum.toDouble / nDocs
    val tf: Map[(Long, String), Long] = words.flatMap { case (id, w) =>
      w.groupBy(identity).map { case (t, g) => (id, t) -> g.size.toLong }
    }.toMap
    val df: Map[String, Long] = tf.keys.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val out = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long, Long)]
    for ((qid, qtext) <- c.queries) {
      val qtf = qtext.split(" ", -1).toVector.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val scored = c.docs.map(_._1).flatMap { did =>
        val terms = qtf.keys.filter(t => tf.contains((did, t))).toVector
        if (terms.isEmpty) None
        else {
          val nano = terms.map { t =>
            val idf = math.log(1.0 +
              (nDocs - df(t) + 0.5) / (df(t) + 0.5))
            val ts = qtf(t) * idf * (tf((did, t)) * (Search.Bm25K1 + 1.0)) /
              (tf((did, t)) + Search.Bm25K1 * ((1.0 - Search.Bm25B) +
                Search.Bm25B * dl(did) / avgdl))
            math.round(ts * 1e9)
          }.sum
          Some((did, nano, terms.length.toLong))
        }
      }
      scored.sortBy { case (did, nano, _) => (-nano, did) }
        .take(k).zipWithIndex.foreach { case ((did, nano, nt), i) =>
          out((qid, i + 1L)) = (did, nano, nt)
        }
    }
    out.toMap
  }

  test("bm25TopK equals the driver model on random corpora") {
    val cases = (1 to 10).map(i =>
      genCorpus.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { c =>
      import spark.implicits._
      val docs = c.docs.toDF("doc_id", "text")
      val want = bm25Model(c, k = 5)
      val got = Search.bm25TopK(docs, c.queries, k = 5)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) ->
          ((r.getAs[Long]("doc_id"), r.getAs[Long]("score_nano"),
            r.getAs[Long]("n_terms_matched")))).toMap
      assert(got == want, s"bm25 mismatch for $c")
    }
  }

  /** Driver-side inter-doc dup-5-gram model. */
  private def dupModel(c: Corpus): Map[Long, (Long, Long, Option[Double])] = {
    val grams = c.docs.map { case (id, t) =>
      val w = t.split(" ", -1).toVector
      id -> (if (w.length >= 5) w.sliding(5).map(_.mkString(" ")).toVector
             else Vector.empty[String])
    }
    val docsPerGram = grams.flatMap { case (id, g) => g.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    grams.map { case (id, g) =>
      val n = g.length.toLong
      val dup = g.count(x => docsPerGram(x) > 1).toLong
      id -> (n, dup, if (n > 0) Some(dup.toDouble / n) else None)
    }.toMap
  }

  test("interDocDupNgrams equals the driver model on random corpora") {
    val cases = (11 to 20).map(i =>
      genCorpus.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { c =>
      import spark.implicits._
      val docs = c.docs.toDF("doc_id", "text")
      val want = dupModel(c)
      val got = TextPipeline.interDocDupNgrams(docs)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      assert(got == want, s"dup_ngrams mismatch for $c")
    }
  }

  /** Driver-side ExactSubstr model at L: positions whose L-gram occurs
    * ≥ 2 times corpus-wide, merged into maximal touching spans, clean
    * text rebuilt from the uncovered words. */
  private def substrModel(c: Corpus, L: Int)
      : Map[Long, (Long, Long, Long, String)] = {
    val words = c.docs.map { case (id, t) => id -> t.split(" ", -1).toVector }
    val occ = scala.collection.mutable.Map.empty[String, Long]
    for ((_, w) <- words; i <- 0 to w.length - L)
      occ.updateWith(w.slice(i, i + L).mkString(" "))(
        o => Some(o.getOrElse(0L) + 1))
    words.map { case (id, w) =>
      val pos = (0 to w.length - L)
        .filter(i => occ(w.slice(i, i + L).mkString(" ")) >= 2)
      val covered = pos.flatMap(p => p until p + L).toSet
      // span count = islands of consecutive covered indices
      val spans = covered.toVector.sorted.foldLeft(0 -> -10) {
        case ((cnt, prev), i) =>
          (if (i == prev + 1) cnt else cnt + 1) -> i
      }._1
      val clean = w.indices.filterNot(covered).map(w).mkString(" ")
      id -> ((w.length.toLong, spans.toLong, covered.size.toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString))
    }.toMap
  }

  // --- random embedding sets for the vector-graph ops --------------
  // grid-valued components (tenths, first component nonzero) force
  // duplicate vectors and exact cosine ties at small n; no zero norms
  private val genVecs: Gen[Vector[(Long, Array[Float])]] = for {
    n <- Gen.choose(2, 12)
    vs <- Gen.listOfN(n, for {
      a <- Gen.choose(1, 10)
      b <- Gen.choose(0, 10)
      c <- Gen.choose(0, 10)
    } yield Array(a / 10.0f, b / 10.0f, c / 10.0f))
  } yield vs.toVector.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def milli(v: Array[Float]): Array[Long] =
    v.map(x => Math.round(x.toDouble * 1000))

  private def cosModel(a: Array[Long], b: Array[Long]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
      math.sqrt(b.map(x => x * x).sum.toDouble))
  }

  /** The single-cell trained centroid: assignment is constant, so both
    * Lloyd iterations recenter to the same floorDiv mean. */
  private def centModel(q: Seq[Array[Long]]): Array[Long] =
    Array.tabulate(q.head.length)(i =>
      Math.floorDiv(q.map(_(i)).sum, q.length))

  test("knnGraph at one cell equals the brute-force kNN model") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    val cases = (31 to 40).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { vs =>
      val q = vs.map { case (id, v) => id -> milli(v) }
      val want = q.flatMap { case (va, qa) =>
        q.filter(_._1 != va)
          .map { case (vb, qb) => (vb, cosModel(qa, qb)) }
          .sortBy { case (vb, c) => (-c, vb) }
          .take(3).zipWithIndex
          .map { case ((vb, _), i) => (va, i + 1L, vb) }
      }.toSet
      val got = VectorOps.knnGraph(vs.toDF("vec_id", "embedding"),
          k = 3, nCells = 1)
        .collect()
        .map(r => (r.getAs[Long]("va"), r.getAs[Long]("rnk"),
          r.getAs[Long]("vb"))).toSet
      assert(got == want, s"knn mismatch for ${vs.map(_._2.toSeq)}")
    }
  }

  test("knnGraph probing every cell equals the brute-force kNN model") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    // nProbe = nCells ⇒ every query sees every candidate (cells
    // partition the collection), so the graph must equal exact kNN
    // regardless of where the cell walls fall
    val cases = (41 to 50).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { vs =>
      val q = vs.map { case (id, v) => id -> milli(v) }
      val want = q.flatMap { case (va, qa) =>
        q.filter(_._1 != va)
          .map { case (vb, qb) => (vb, cosModel(qa, qb)) }
          .sortBy { case (vb, c) => (-c, vb) }
          .take(3).zipWithIndex
          .map { case ((vb, _), i) => (va, i + 1L, vb) }
      }.toSet
      val got = VectorOps.knnGraph(vs.toDF("vec_id", "embedding"),
          k = 3, nCells = 2, nProbe = 2)
        .collect()
        .map(r => (r.getAs[Long]("va"), r.getAs[Long]("rnk"),
          r.getAs[Long]("vb"))).toSet
      assert(got == want, s"p=all knn mismatch for ${vs.map(_._2.toSeq)}")
    }
  }

  test("knnRecall per-query hits are monotone in nProbe") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    // candidates(p1) ⊆ candidates(p2) and the rank order is total
    // (cos desc, vb), so each query's exact-top-k intersection can
    // only grow with the probe count
    val cases = (51 to 62).map(i =>
        genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
      .filter(_.length >= 4) // ivfTrain needs ≥ nCells seed vectors
    assert(cases.nonEmpty)
    cases.foreach { vs =>
      val emb = vs.toDF("vec_id", "embedding")
      def hits(nProbe: Int): Map[Long, Long] =
        VectorOps.knnRecall(emb, k = 3, nCells = 4, nProbe = nProbe)
          .collect()
          .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("n_hit"))
          .toMap
      val h1 = hits(1); val h2 = hits(2)
      h1.foreach { case (qid, n) =>
        assert(h2(qid) >= n,
          s"recall dropped for $qid: p1=$n p2=${h2(qid)} " +
            s"on ${vs.map(_._2.toSeq)}")
      }
    }
  }

  test("pageRank at one cell equals the driver integer fixpoint") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    val iters = 4
    val cases = (71 to 80).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { vs =>
      val q = vs.map { case (id, v) => id -> milli(v) }
      val ids = q.map(_._1)
      // edge model = the brute-force kNN model already proven against
      // knnGraph; the fixpoint below is the independent model under test
      val edges = q.flatMap { case (va, qa) =>
        q.filter(_._1 != va)
          .map { case (vb, qb) => (vb, cosModel(qa, qb)) }
          .sortBy { case (vb, c) => (-c, vb) }
          .take(3).map { case (vb, _) => (va, vb) }
      }
      val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
      var r = ids.map(_ -> 1000000000L).toMap
      for (_ <- 1 to iters) {
        val inflow = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _) => (85L * r(u)) / (100L * deg(u)) }.sum
        }
        r = ids.map(v => v -> (150000000L + inflow.getOrElse(v, 0L))).toMap
      }
      val want = ids.map(v => (v, deg.getOrElse(v, 0L), r(v))).toSet
      val got = VectorOps.pageRank(vs.toDF("vec_id", "embedding"),
          k = 3, nCells = 1, iters = iters)
        .collect()
        .map(x => (x.getAs[Long]("vec_id"), x.getAs[Long]("out_deg"),
          x.getAs[Long]("pr_nano"))).toSet
      assert(got == want, s"pagerank mismatch for ${vs.map(_._2.toSeq)}")
      // total mass can only shed (floor division + dangling drop)
      assert(got.toSeq.map(_._3).sum <= ids.size * 1000000000L)
    }
  }

  test("labelPropagate at one cell equals the majority-vote model") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    val iters = 2
    val cases = (81 to 90).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { vs =>
      val q = vs.map { case (id, v) => id -> milli(v) }
      val ids = q.map(_._1)
      val truth = ids.map(id => id -> (id % 3)).toMap
      val seed = ids.map(id => id -> (id % 2 == 0)).toMap
      val edges = q.flatMap { case (va, qa) =>
        q.filter(_._1 != va)
          .map { case (vb, qb) => (vb, cosModel(qa, qb)) }
          .sortBy { case (vb, c) => (-c, vb) }
          .take(3).map { case (vb, _) => (va, vb) }
      }
      var lab = ids.map(id =>
        id -> (if (seed(id)) truth(id) else -1L)).toMap
      for (_ <- 1 to iters) {
        val byVa = edges.groupBy(_._1)
        lab = ids.map { id =>
          id -> (if (seed(id)) truth(id)
          else {
            val votes = byVa.getOrElse(id, Nil).map(e => lab(e._2))
              .filter(_ >= 0)
            if (votes.isEmpty) -1L
            else votes.groupBy(identity).toSeq
              .map { case (l, os) => (os.size, l) }
              .sortBy { case (c, l) => (-c, l) }.head._2
          })
        }.toMap
      }
      val want = ids.map(id => (id, seed(id), truth(id), lab(id),
        lab(id) >= 0 && lab(id) == truth(id))).toSet
      val emb = vs.map { case (id, v) => (id, v, (id % 3).toInt) }
        .toDF("vec_id", "embedding", "label")
      val got = VectorOps.labelPropagate(emb, k = 3, nCells = 1,
          iters = iters, seedMod = 2)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Boolean]("is_seed"),
          r.getAs[Long]("true_label"), r.getAs[Long]("prop_label"),
          r.getAs[Boolean]("agree"))).toSet
      assert(got == want, s"labelprop mismatch for ${vs.map(_._2.toSeq)}")
    }
  }

  test("semDedup at one cell equals the exists-dominance model") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    val cases = (41 to 50).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    val tau = 0.97
    cases.foreach { vs =>
      val q = vs.map { case (id, v) => id -> milli(v) }.toMap
      val cent = centModel(vs.map(v => q(v._1)))
      val ccos = q.map { case (id, qa) => id -> cosModel(qa, cent) }
      val want = q.keys.map { v =>
        val dropped = q.keys.exists(u => u != v &&
          cosModel(q(u), q(v)) >= tau &&
          (ccos(u) < ccos(v) || (ccos(u) == ccos(v) && u < v)))
        v -> !dropped
      }.toMap
      val got = VectorOps.semDedup(vs.toDF("vec_id", "embedding"),
          threshold = tau, nCells = 1)
        .collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept"))
        .toMap
      assert(got == want, s"semdedup mismatch for ${vs.map(_._2.toSeq)}")
      // with grid vectors duplicates are common — at least the model
      // itself must drop SOMETHING across the 10 cases overall
    }
    val anyDrop = cases.exists { vs =>
      val q = vs.map { case (id, v) => id -> milli(v) }.toMap
      q.keys.exists(v => q.keys.exists(u => u != v &&
        cosModel(q(u), q(v)) >= tau))
    }
    assert(anyDrop, "fixture never exercised the drop path")
  }

  test("knnGraph under a binding cell cap equals the sub-split model") {
    // one-hot-cell fixture: nCells = 1 puts EVERY vector in one cell,
    // the degenerate distribution the occupancy guard exists for; a
    // binding cap (4) must sub-split by vec_id % ceil(n/cap) and
    // restrict neighbors to the sub-bucket — exactly the model here.
    import graft.pipeline.VectorOps
    import spark.implicits._
    val cap = 4
    val cases = (51 to 60).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    var anySplit = false
    cases.foreach { vs =>
      val q = vs.map { case (id, v) => id -> milli(v) }
      val nsub = (q.length + cap - 1) / cap
      if (nsub > 1) anySplit = true
      val want = q.flatMap { case (va, qa) =>
        q.filter { case (vb, _) => vb != va && vb % nsub == va % nsub }
          .map { case (vb, qb) => (vb, cosModel(qa, qb)) }
          .sortBy { case (vb, c) => (-c, vb) }
          .take(3).zipWithIndex
          .map { case ((vb, _), i) => (va, i + 1L, vb) }
      }.toSet
      val got = VectorOps.knnGraph(vs.toDF("vec_id", "embedding"),
          k = 3, nCells = 1, cellCap = cap)
        .collect()
        .map(r => (r.getAs[Long]("va"), r.getAs[Long]("rnk"),
          r.getAs[Long]("vb"))).toSet
      assert(got == want, s"capped knn mismatch for ${vs.map(_._2.toSeq)}")
    }
    assert(anySplit, "no case was large enough to bind the cap")
  }

  test("semDedup under a binding cell cap equals the sub-split model") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    val cap = 4
    val tau = 0.97
    val cases = (61 to 70).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    var anySplit = false
    cases.foreach { vs =>
      val q = vs.map { case (id, v) => id -> milli(v) }.toMap
      val cent = centModel(vs.map(v => q(v._1)))
      val ccos = q.map { case (id, qa) => id -> cosModel(qa, cent) }
      val nsub = (q.size + cap - 1) / cap
      if (nsub > 1) anySplit = true
      val want = q.keys.map { v =>
        val dropped = q.keys.exists(u => u != v && u % nsub == v % nsub &&
          cosModel(q(u), q(v)) >= tau &&
          (ccos(u) < ccos(v) || (ccos(u) == ccos(v) && u < v)))
        v -> !dropped
      }.toMap
      val got = VectorOps.semDedup(vs.toDF("vec_id", "embedding"),
          threshold = tau, nCells = 1, cellCap = cap)
        .collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept"))
        .toMap
      assert(got == want,
        s"capped semdedup mismatch for ${vs.map(_._2.toSeq)}")
    }
    assert(anySplit, "no case was large enough to bind the cap")
  }

  // --- JL random projection + count-min sketch ----------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => "%02x".format(b & 0xff)).mkString

  test("rprojReport equals the driver JL model; sign bits = lshBuckets") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    // independent re-derivation of the md5-parity hyperplane signs
    def sign(j: Int, i: Int): Long =
      if (md5hex(s"$j#$i").charAt(0).toInt % 2 == 1) 1L else -1L
    val cases = (41 to 50).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { vs =>
      val emb = vs.toDF("vec_id", "embedding")
      val want = vs.map { case (id, v) =>
        val q = milli(v)
        val comps = (0 until 16).map(j =>
          q.indices.map(ii => sign(j, ii + 1) * q(ii)).sum)
        val srp = comps.zipWithIndex
          .collect { case (c, j) if c > 0 => 1L << j }.sum
        id -> ((comps.sum, comps.map(c => c * c).sum, srp,
          md5hex(comps.mkString(","))))
      }.toMap
      val got = VectorOps.rprojReport(emb).collect().map(r =>
        r.getAs[Long]("vec_id") -> ((r.getAs[Long]("sum_proj"),
          r.getAs[Long]("norm_proj"), r.getAs[Long]("srp_bits"),
          r.getAs[String]("proj_md5")))).toMap
      assert(got == want, s"rproj mismatch for ${vs.map(_._2.toSeq)}")
      // the sign sketch IS the LSH bucket at bits = kComps
      val buckets = VectorOps.lshBuckets(emb, bits = 16).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
      vs.foreach { case (id, _) => assert(buckets(id) == want(id)._3) }
    }
  }

  test("annRproj with a covering shortlist equals the exact top-k") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    val cases = (41 to 50).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { vs =>
      val emb = vs.toDF("vec_id", "embedding")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
          r.getAs[Long]("vec_id"))).toSet
      // shortK ≥ n: the rerank sees every candidate, so the JL path
      // must reproduce the exact ranking including all tie-breaks
      val got = rows(VectorOps.annRproj(emb, nQueries = 3, k = 3,
        shortK = 1000))
      val want = rows(VectorOps.annTopK(emb, nQueries = 3, k = 3))
      assert(got == want, s"annRproj mismatch for ${vs.map(_._2.toSeq)}")
    }
  }

  test("gramMatrix equals the driver XtX model") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    val cases = (61 to 70).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { vs =>
      val qs = vs.map { case (_, v) => milli(v) }
      val d = qs.head.length
      val want = (for {
        i <- 0 until d; j <- i until d
      } yield (i + 1L, j + 1L, qs.map(q => q(i) * q(j)).sum)).toSet
      val got = VectorOps.gramMatrix(vs.toDF("vec_id", "embedding"))
        .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
          r.getAs[Long]("g"))).toSet
      assert(got == want, s"gram mismatch for ${vs.map(_._2.toSeq)}")
    }
  }

  test("pcaLeading/pcaProject equal the integer power-iteration model") {
    import graft.pipeline.VectorOps
    import spark.implicits._
    def model(qs: Seq[Array[Long]], iters: Int)
        : (Array[Long], Long) = {
      val d = qs.head.length
      val G = Array.tabulate(d, d)((i, j) => qs.map(q => q(i) * q(j)).sum)
      def fd(s: BigInt, n: BigInt): BigInt = (s - (((s % n) + n) % n)) / n
      var x = Array.fill(d)(BigInt(65536))
      def gx() = Array.tabulate(d)(i =>
        (0 until d).map(j => BigInt(G(i)(j)) * x(j)).sum)
      for (_ <- 1 to iters) {
        val y = gx()
        val m = y.map(_.abs).max
        x = if (m == 0) Array.fill(d)(BigInt(0))
            else y.map(v => fd(v * 65536, m))
      }
      val y = gx()
      val den = x.map(v => v * v).sum
      val lam = if (den == 0) BigInt(0)
                else fd((0 until d).map(i => x(i) * y(i)).sum, den)
      (x.map(_.toLong), lam.toLong)
    }
    val cases = (71 to 80).map(i =>
      genVecs.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { vs =>
      val emb = vs.toDF("vec_id", "embedding")
      val qs = vs.map { case (_, v) => milli(v) }
      val (wx, wlam) = model(qs, 12)
      val got = VectorOps.pcaLeading(emb).collect()
        .map(r => (r.getAs[Long]("i"), r.getAs[Long]("v"),
          r.getAs[Long]("lambda_est"))).sortBy(_._1)
      assert(got.map(_._2).toSeq == wx.toSeq &&
        got.forall(_._3 == wlam), s"pca mismatch for ${vs.map(_._2.toSeq)}")
      val wantProj = vs.map { case (id, v) =>
        id -> milli(v).zip(wx).map { case (a, b) => a * b }.sum }.toMap
      val gotProj = VectorOps.pcaProject(emb).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("score")).toMap
      assert(gotProj == wantProj)
    }
    // pcaSecond: driver deflation model on the same cases
    def model2(qs: Seq[Array[Long]], iters: Int)
        : (Array[Long], Long, Long) = {
      val d = qs.head.length
      def fd(s: BigInt, n: BigInt): BigInt = (s - (((s % n) + n) % n)) / n
      def iterate(m: Array[Array[BigInt]])
          : (Array[BigInt], BigInt, BigInt) = {
        var x = Array.fill(d)(BigInt(65536))
        def mx() = Array.tabulate(d)(i =>
          (0 until d).map(j => m(i)(j) * x(j)).sum)
        for (_ <- 1 to iters) {
          val y = mx()
          val mm = y.map(_.abs).max
          x = if (mm == 0) Array.fill(d)(BigInt(0))
              else y.map(v => fd(v * 65536, mm))
        }
        val y = mx()
        (x, (0 until d).map(i => x(i) * y(i)).sum, x.map(v => v * v).sum)
      }
      val g = Array.tabulate(d, d)((i, j) =>
        BigInt(qs.map(q => q(i) * q(j)).sum))
      val (x1, num, den) = iterate(g)
      val h = if (den == 0) g else Array.tabulate(d, d)((i, j) =>
        g(i)(j) - fd(num * x1(i) * x1(j), den * den))
      val (x2, num2, den2) = iterate(h)
      val lam2 = if (den2 == 0) BigInt(0) else fd(num2, den2)
      (x2.map(_.toLong), lam2.toLong,
        (0 until d).map(i => x1(i) * x2(i)).sum.toLong)
    }
    cases.foreach { vs =>
      val emb = vs.toDF("vec_id", "embedding")
      val (wx2, wlam2, wortho) = model2(vs.map { case (_, v) => milli(v) }, 12)
      val got2 = VectorOps.pcaSecond(emb).collect()
        .map(r => (r.getAs[Long]("i"), r.getAs[Long]("v"),
          r.getAs[Long]("lambda_est"), r.getAs[Long]("ortho_num")))
        .sortBy(_._1)
      assert(got2.map(_._2).toSeq == wx2.toSeq &&
        got2.forall(t => t._3 == wlam2 && t._4 == wortho),
        s"pca2 mismatch for ${vs.map(_._2.toSeq)}")
    }

    // planted dominant direction: a cloud hugging e1 must converge
    // onto it — the direction is a real eigenvector estimate, not
    // just a reproducible number; the deflated second component must
    // leave e1 (near-orthogonal, mass in the residual dims)
    val planted = (0 until 30).map(i =>
      (i.toLong, Array(1.0f, (i % 3) * 0.01f, (i % 5) * 0.01f)))
    val pdf = planted.toDF("vec_id", "embedding")
    val v1 = VectorOps.pcaLeading(pdf)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("v"))).toMap
    assert(v1(1L) == 65536L &&
      math.abs(v1(2L)) < 3000 && math.abs(v1(3L)) < 3000)
    val r2 = VectorOps.pcaSecond(pdf).collect()
    val v2 = r2.map(r => (r.getAs[Long]("i"), r.getAs[Long]("v"))).toMap
    assert(math.abs(v2(1L)) < math.max(math.abs(v2(2L)), math.abs(v2(3L))),
      s"second component still dominated by e1: $v2")
  }

  test("cmsHeavyHitters equals the driver sketch model at a binding width") {
    import spark.implicits._
    val cases = (51 to 60).map(i =>
      genCorpus.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { c =>
      val docs = c.docs.toDF("doc_id", "text")
      // width 8 on the 8-word alphabet: collisions all but guaranteed,
      // so the overcount path is genuinely exercised
      val depth = 2
      val width = 8
      def bucket(r: Int, w: String): Long =
        java.lang.Long.parseLong(md5hex(s"$r#$w").substring(0, 8), 16) % width
      val cnt = c.docs.flatMap(_._2.split(" ", -1))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cells = (for {
        (w, n) <- cnt.toSeq; r <- 0 until depth
      } yield ((r, bucket(r, w)), n))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val want = cnt.toSeq.sortBy { case (w, n) => (-n, w) }.take(20)
        .map { case (w, n) =>
          val est = (0 until depth).map(r => cells((r, bucket(r, w)))).min
          (w, n, est, est - n)
        }.toSet
      val got = TextPipeline.cmsHeavyHitters(docs, depth = depth,
          width = width, topN = 20)
        .collect().map(r => (r.getAs[String]("word"), r.getAs[Long]("exact"),
          r.getAs[Long]("est"), r.getAs[Long]("overcount"))).toSet
      assert(got == want, s"cms mismatch for $c")
      got.foreach { case (_, exact, est, over) =>
        assert(est >= exact && over == est - exact)
      }
    }
  }

  test("pmiBigrams equals the driver PMI model at minCount = 1") {
    import spark.implicits._
    val cases = (81 to 90).map(i =>
      genCorpus.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { c =>
      val docs = c.docs.toDF("doc_id", "text")
      val wordLists = c.docs.map(_._2.split(" ", -1).toVector)
      val uni = wordLists.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val n = uni.values.sum
      val bi = wordLists.flatMap(ws => ws.zip(ws.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val m = bi.values.sum
      // the engine's exact expression tree: ((b·N)·N) / ((M·u1)·u2)
      val scored = bi.toSeq.map { case ((w1, w2), b) =>
        val pmi = math.round(math.log((b.toDouble * n * n) /
          (m.toDouble * uni(w1) * uni(w2))) * 1e9)
        (w1, w2, b, pmi)
      }
      val want = scored.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
        .take(20).zipWithIndex
        .map { case ((w1, w2, b, p), i) => (w1, w2, b, p, i + 1L) }.toSet
      val got = TextPipeline.pmiBigrams(docs, minCount = 1, topN = 20)
        .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
          r.getAs[Long]("b_cnt"), r.getAs[Long]("pmi_nano"),
          r.getAs[Long]("rnk"))).toSet
      assert(got == want, s"pmi mismatch for $c")
    }
  }

  test("substringDedup equals the driver model on random corpora") {
    // L = 3 on the 8-word alphabet: dense collisions, heavy overlap
    val cases = (21 to 30).map(i =>
      genCorpus.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    cases.foreach { c =>
      import spark.implicits._
      val docs = c.docs.toDF("doc_id", "text")
      val want = substrModel(c, L = 3)
      val got = TextPipeline.substringDedup(docs, L = 3)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_words"), r.getAs[Long]("dup_spans"),
            r.getAs[Long]("dup_words"), r.getAs[String]("clean_md5"))))
        .toMap
      assert(got == want, s"substring_dedup mismatch for $c")
    }
  }
}
