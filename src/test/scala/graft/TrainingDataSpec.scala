package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TrainingData

/** Invariant checks for the training-data preparation tier (chunking,
  * int8 quantization, packing, BPE) on crafted inputs — the driver's
  * DuckDB oracle checks exact equality on the real tables; these pin
  * the algebraic properties a refactor could silently break. */
class TrainingDataSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-traindata")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("chunkSlices covers every word and respects stride") {
    val d = docs((1L, (1 to 95).map(i => s"w$i").mkString(" ")),
      (2L, "a b c"))
    val rows = TrainingData.chunkSlices(d, win = 40, stride = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: starts at 1, 31, 61 — last window covers word 95
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(1L, 31L, 61L))
    assert(d1.last._3 + d1.last._4 - 1 == 95)
    // short doc: one chunk of its own length
    val d2 = rows.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._4 == 3L)
  }

  test("quantizeInt8 stays within int8 range and zero vector is safe") {
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = TrainingData.quantizeInt8(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getAs[Long]("max_abs_milli") == 1000L)
    // 0.5 -> 500 milli -> round(500*127/1000) = 64; -1.0 -> -127; 0.25 -> 32
    assert(q(1L).getAs[Long]("norm_q8") == 64L * 64 + 127L * 127 + 32L * 32)
    assert(q(2L).getAs[Long]("norm_q8") == 0L)
  }

  test("packSequences never overflows a bin and packs every doc") {
    val d = docs((1 to 200).map(i =>
      (i.toLong, (1 to (i % 97 + 3)).map(_ => "tok").mkString(" "))): _*)
    val p = TrainingData.packSequences(d, spark, capacity = 128)
    assert(p.count() == 200)
    assert(p.filter(col("bin_offset") + col("toks") > 128).count() == 0)
    // within a shard, bins are consumed in order and offsets restart
    val bad = p.withColumn("prev_end",
      lag(col("bin_offset") + col("toks"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard", "bin_no").orderBy("pos")))
      .filter(col("prev_end").isNotNull && col("bin_offset") =!= col("prev_end"))
    assert(bad.count() == 0)
  }

  test("bpeTrain learns the dominant pair first and applies it greedily") {
    // 'aaab' x3 + 'ab': pairs (a,a) count 6, (a,b) 4 -> first merge (a,a)
    val d = docs((1L, "aaab aaab aaab ab"))
    val merges = TrainingData.bpeTrain(d, spark, nMerges = 2).collect()
    assert(merges(0).getAs[String]("merged") == "aa")
    assert(merges(0).getAs[Long]("pair_count") == 6L)
    // greedy-leftmost: "aaab" -> [aa, a, b], so round 2's top pair is
    // (aa, a) count 3 ties (a, b) count 4 -> (a,b) wins on count
    assert(merges(1).getAs[String]("merged") == "ab")
  }

  test("applyMerge collapses leftmost-first without overlap") {
    assert(TrainingData.applyMerge(Seq("a", "a", "a"), "a", "a")
      == Seq("aa", "a"))
    assert(TrainingData.applyMerge(Seq("a", "b", "a", "b"), "a", "b")
      == Seq("ab", "ab"))
  }

  test("bpeTokenCounts equals per-word merged symbol lengths") {
    val d = docs((1L, "aaab ab"), (2L, "b"))
    // merges learned on this corpus: (a,a) then... counts: doc1 only
    val counts = TrainingData.bpeTokenCounts(d, spark, nMerges = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // merge (a,a): "aaab" -> aa,a,b = 3 tokens; "ab" -> 2; "b" -> 1
    assert(counts(1L) == 5L)
    assert(counts(2L) == 1L)
  }

  test("bpeEncode streams are ordered and sum to bpeTokenCounts") {
    val d = docs((1L, "aaab ab"), (2L, "b"))
    val merges = TrainingData.mergePairs(
      TrainingData.bpeTrain(d, spark, nMerges = 1))
    val enc = TrainingData.bpeEncode(d, spark, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // merge (a,a): "aaab ab" -> aa,a,b | a,b ; token_no dense from 1
    assert(enc.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("aa", "a", "b", "a", "b"))
    assert(enc.filter(_._1 == 2L).map(_._3).toSeq == Seq("b"))
    val counts = TrainingData.bpeTokenCounts(d, spark, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(enc.groupBy(_._1).view.mapValues(_.length.toLong).toMap == counts)
  }

  test("bpeCoverage reports exact per-source compression and merge fit") {
    // merge (a,a) dominates; srcA's words compress, srcB never merges
    val d = Seq(
      (1L, "srcA", "aaab aab"),
      (2L, "srcA", "aa"),
      (3L, "srcB", "bcd")).toDF("doc_id", "source", "text")
    val merges = TrainingData.mergePairs(
      TrainingData.bpeTrain(d.select("doc_id", "text"), spark,
        nMerges = 1))
    val rows = TrainingData.bpeCoverage(d, spark, merges)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    // srcA under (a,a): "aaab"→aa,a,b (3), "aab"→aa,b (2), "aa"→aa (1)
    //   = 6 tokens, 9 chars, 3 merged
    assert(rows(0) === (("srcA", 6L, 9L, 3L, 1.5, 0.5)))
    // srcB: "bcd"→b,c,d = 3 single-char tokens, no merges apply
    assert(rows(1) === (("srcB", 3L, 3L, 0L, 1.0, 0.0)))
  }

  test("applyMerge is lossless for any merge sequence (property)") {
    // tokenization must never alter content: concatenating the symbol
    // sequence always rebuilds the word, under any merge chain
    val rnd = new scala.util.Random(1234)
    (1 to 200).foreach { _ =>
      val word = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      var syms: Seq[String] = word.map(_.toString)
      (1 to (1 + rnd.nextInt(4))).foreach { _ =>
        val l = ('a' + rnd.nextInt(3)).toChar.toString * (1 + rnd.nextInt(2))
        val r = ('a' + rnd.nextInt(3)).toChar.toString
        syms = TrainingData.applyMerge(syms, l, r)
        assert(syms.mkString == word, s"lossy merge ($l,$r) on $word")
      }
    }
  }

  test("stratifiedSample meets every stratum quota exactly") {
    // stratum (en, a): 7 docs → ceil(7/5) = 2 kept; (de, b): 3 → 1;
    // (en, c): 1 → 1. Quotas are exact, not in-expectation.
    val d = ((1L to 7L).map(i => (i, "en", "a", s"text $i")) ++
      (8L to 10L).map(i => (i, "de", "b", s"text $i")) :+
      ((11L, "en", "c", "solo")))
      .toDF("doc_id", "lang", "source", "text")
    val r = TrainingData.stratifiedSample(d, rateNum = 1, rateDen = 5)
      .collect()
    val byStr = r.groupBy(x => (x.getString(1), x.getString(2)))
    assert(byStr(("en", "a")).count(_.getBoolean(5)) === 2)
    assert(byStr(("de", "b")).count(_.getBoolean(5)) === 1)
    assert(byStr(("en", "c")).count(_.getBoolean(5)) === 1)
    // ranks are a dense 1..n permutation inside each stratum, and the
    // kept set is exactly the lowest ranks (deterministic hash order)
    byStr.foreach { case (_, rows) =>
      val ranks = rows.map(_.getLong(4)).sorted
      assert(ranks === (1L to rows.length).toArray)
      val keptMax = rows.filter(_.getBoolean(5)).map(_.getLong(4)).max
      val dropMin = rows.filterNot(_.getBoolean(5)).map(_.getLong(4))
        .minOption.getOrElse(Long.MaxValue)
      assert(keptMax < dropMin)
    }
  }

  test("mixTemperature: sqrt rates, head source fully kept") {
    // srcA n=4 (head): rate = 2^20, every draw < 2^20 → all kept;
    // srcB n=1: rate = floor(2^20·sqrt(1/4)) = 524288. The draw is the
    // RAW 5-hex-digit value — a modulo fold here would double the keep
    // rate of tail sources with rate below 16^5 − 10^6 = 48576.
    val d = ((1L to 4L).map(i => (i, "srcA", s"text $i")) :+
      ((5L, "srcB", "tail text"))).toDF("doc_id", "source", "text")
    val r = TrainingData.mixTemperature(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert((1L to 4L).forall(i => r(i).getAs[Long]("rate_p20") == 1048576L))
    assert((1L to 4L).forall(i => r(i).getAs[Boolean]("kept")))
    assert(r(5L).getAs[Long]("rate_p20") == 524288L)
    r.values.foreach { x =>
      val draw = x.getAs[Long]("draw")
      assert(draw >= 0L && draw < 1048576L)
      assert(x.getAs[Boolean]("kept") === (draw < x.getAs[Long]("rate_p20")))
    }
  }

  test("packStats agrees with a driver-side fold of packSequences") {
    val d = docs((1 to 200).map(i =>
      (i.toLong, (1 to (i % 97 + 3)).map(_ => "tok").mkString(" "))): _*)
    val packed = TrainingData.packSequences(d, spark, capacity = 128)
      .collect()
    val stats = TrainingData.packStats(d, spark, capacity = 128)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    packed.groupBy(_.getAs[Int]("shard").toLong).foreach { case (sh, rows) =>
      val s = stats(sh)
      assert(s.getAs[Long]("n_docs") == rows.length)
      val bins = rows.map(_.getAs[Long]("bin_no")).max
      val toks = rows.map(_.getAs[Long]("toks")).sum
      assert(s.getAs[Long]("n_bins") == bins)
      assert(s.getAs[Long]("total_toks") == toks)
      assert(s.getAs[Long]("waste_toks") == bins * 128 - toks)
      assert(s.getAs[Long]("fill_ppm") == toks * 1000000L / (bins * 128))
    }
    assert(stats.keySet == packed.map(_.getAs[Int]("shard").toLong).toSet)
  }

  test("splitLeakage reports exactly the cross-split candidate pairs") {
    import graft.pipeline.TextPipeline
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cand = TextPipeline.minhashCandidates(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val split = TextPipeline.splitAssign(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val leak = TextPipeline.splitLeakage(d).collect()
    leak.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(cand((a, b)), s"($a,$b) not a near-dup candidate")
      assert(r.getString(2) == split(a) && r.getString(3) == split(b))
      assert(r.getString(2) != r.getString(3))
    }
    // completeness: every cross-split candidate pair is reported
    val expected = cand.filter { case (a, b) => split(a) != split(b) }
    assert(leak.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("filtered ANN returns only predicate-satisfying neighbors, k deep") {
    import graft.pipeline.VectorOps
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val zeroIds = emb.filter(col("label") === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = VectorOps.annTopKFiltered(emb, labelEq = 0).collect()
    assert(brute.nonEmpty)
    assert(brute.forall(r => zeroIds(r.getAs[Long]("vec_id"))))
    // dense 1..k ranks per query (pre-filter semantics: k real results)
    brute.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted ===
        (1L to rows.length).toArray)
      val cs = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    val ivf = VectorOps.annIvfFiltered(emb, labelEq = 0).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => zeroIds(r.getAs[Long]("vec_id"))))
    // IVF results under the same predicate can only come from probed
    // cells — every (query, neighbor) it returns must appear in the
    // exhaustive filtered ranking's candidate domain
    val bruteSet = brute.map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet
    val top5 = brute.filter(_.getAs[Long]("rnk") <= 5L)
    assert(ivf.count(r => bruteSet((r.getLong(0), r.getAs[Long]("vec_id"))))
      >= top5.length / 2) // recall sanity floor at this tiny sf
  }

  test("sourceMix keeps higher-weight sources at twice the rate bound") {
    val d = Seq((1L, "srcA", "x"), (2L, "src3", "y"), (3L, "src15", "z"))
      .toDF("doc_id", "source", "text")
      .filter(col("source") =!= "srcA") // non-numeric suffix excluded
    val m = TrainingData.sourceMix(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(2L).getAs[Long]("weight") == 2L)
    assert(m(3L).getAs[Long]("weight") == 1L)
  }

  test("pq invariants: code range, word round-trip, re-ranked order") {
    import graft.pipeline.VectorOps
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val model = VectorOps.pqTrain(emb)
    assert(model.m == 8 && model.k == 16 && model.subLen == 8)
    val codes = VectorOps.pqCodes(emb, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes.values.forall(cs =>
      cs.length == model.m && cs.forall(c => c >= 0 && c < model.k)))
    // the packed word decodes back to the code digits (base k)
    val words = VectorOps.pqCodeWords(emb, model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    words.foreach { case (vid, w) =>
      val decoded = Iterator.iterate(w)(_ / model.k)
        .take(model.m).map(_ % model.k).toSeq
      assert(decoded == codes(vid), s"vec $vid word $w")
    }
    // annPq output is ordered by exact distance within each query and
    // never contains the query itself
    val res = VectorOps.annPq(emb, nQueries = 3, topK = 5,
        trained = Some(model))
      .orderBy("query_id", "rnk").collect()
    res.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val dists = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(dists.sameElements(dists.sorted), s"query $qid unsorted")
      assert(rows.forall(_.getLong(2) != qid))
    }
  }

  test("banded near-dup report catches planted duplicates at any bit count") {
    import graft.pipeline.VectorOps
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // plant exact duplicates of vectors 0..4 under fresh ids: a true
    // near-dup (cos = 1) collides in EVERY band regardless of
    // bitsPerBand, so the banded report must surface all five
    val dups = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000L).as("vec_id"),
        col("embedding"), col("label"))
    val withDups = emb.unionByName(dups)
    val rows = VectorOps.nearDupPairs(withDups, topN = 10, bands = 4)
      .orderBy("rnk").collect()
    val top5 = rows.filter(_.getLong(3) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top5 == (0 until 5).map(i => (i.toLong, i + 10000L)).toSet)
    rows.filter(_.getLong(3) <= 5).foreach(r => assert(r.getDouble(2) > 0.999))
    // pairs are normalized (va < vb) and ranked by descending cosine
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val cosines = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
  }

  test("weightedSample equals the driver systematic-PPS walk") {
    // weights come from the (separately oracle-gated) quality points;
    // what this pins is the bucket-offset prefix sum + stride walk
    import graft.pipeline.TextPipeline
    val texts = (1L to 30L).map { i =>
      // vary quality: every 3rd doc is a long stopword-rich text
      val t = if (i % 3 == 0)
        ("the and of to a in is it for on " * 3).trim + s" tail$i"
      else s"x$i y$i ${i}1"
      (i * 7 + 2, t) // sparse ids
    }
    val d = docs(texts: _*)
    val targetN = 5
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // driver model: the same weights, plain sort + cumsum + stride
    val qual = TextPipeline.qualityScore(d).collect().map { r =>
      val pts =
        (if (r.getAs[Long]("n_words") >= 20 &&
          r.getAs[Long]("n_words") <= 500) 4L else 0L) +
        (if (r.getAs[Long]("n_stop") * 5 >= r.getAs[Long]("n_words")) 3L
         else 0L) +
        (if (r.getAs[Long]("n_digits") * 10 <= r.getAs[Long]("n_chars_m"))
          2L else 0L) +
        (if (r.getAs[Double]("mean_word_len") >= 3.0 &&
          r.getAs[Double]("mean_word_len") <= 10.0) 1L else 0L)
      r.getAs[Long]("doc_id") -> (pts + 1)
    }.toMap
    val ordered = texts.map { case (id, t) =>
      (md5Hex(s"sample0#$t"), id, qual(id)) }.sorted
    val totalW = ordered.map(_._3).sum
    val stride = math.max(1L, totalW / targetN)
    var cum = 0L
    val want = ordered.flatMap { case (_, id, w) =>
      cum += w
      val picks = cum / stride - (cum - w) / stride
      if (picks > 0) Some((id, w, cum, picks)) else None
    }.sortBy(_._1)
    val got = TrainingData.weightedSample(d, targetN).orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"),
        r.getAs[Long]("cum_w"), r.getAs[Long]("n_picks"))).toSeq
    assert(got == want)
    // the walk selects ~targetN distinct docs, weighted: total picks
    // = totalW div stride ∈ [targetN, targetN + targetN)
    assert(got.map(_._4).sum == totalW / stride)
  }

  test("epochPlan water-fills the budget with a capped prefix") {
    // sources with 10/20/40/80 tokens, maxEpochs=2 → caps 20/40/80/160,
    // budget = 150·1/1 = 150. Water-filling: s1 capped (20·4+0=80 ≤
    // 150), s2 capped (40·3+20=140 ≤ 150), s3 not (80·2+60=220 > 150)
    // → uncapped share = (150−60)/2 = 45 each
    val d = docs(
      (1L, (1 to 10).map(_ => "w").mkString(" ")),
      (2L, (1 to 20).map(_ => "w").mkString(" ")),
      (3L, (1 to 40).map(_ => "w").mkString(" ")),
      (4L, (1 to 80).map(_ => "w").mkString(" ")))
      .withColumn("source", concat(lit("s"), col("doc_id")))
    val got = TrainingData.epochPlan(d, budgetNum = 1, budgetDen = 1,
        maxEpochs = 2)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(5),
        r.getBoolean(6))).toList
    assert(got == List(
      ("s1", 20L, 2000L, true),   // 2.0 epochs — capped
      ("s2", 40L, 2000L, true),   // 2.0 epochs — capped
      ("s3", 45L, 1125L, false),  // 45/40 = 1.125 epochs
      ("s4", 45L, 562L, false)))  // 45/80 = 0.5625 epochs
    // allocations exhaust the budget up to integer floor
    assert(got.map(_._2).sum == 150L)
  }
}
