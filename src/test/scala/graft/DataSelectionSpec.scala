package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextPipeline

/** Crafted-fixture proofs for the model-based data-selection filters:
  * DSIR importance weights and the bigram-LM quality score. */
class DataSelectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-data-selection")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("sourceCap keeps top-cap docs per source by quality, id tiebreak") {
    // two equal-quality good docs (ids 1 and 3, same text -> exact
    // score tie, broken by doc_id), one medium, one junk in source a;
    // a single junk doc in source b still survives (cap is per-source)
    val good = "the cat and the dog sat on a mat in the sun and " +
      "the rain and the wind and more"
    val d = Seq(
      (1L, good, "a"), (3L, good, "a"),
      (5L, "99 numbers 42 here 7", "a"), (7L, "1 2 3", "a"),
      (2L, "1 2 3", "b")
    ).toDF("doc_id", "text", "source")
    val got = TextPipeline.sourceCap(d, cap = 2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id"))).toSet
    assert(got == Set(("a", 1L, 1L), ("a", 2L, 3L), ("b", 1L, 2L)))
  }

  test("sourceCap equals the per-source sort model on random corpora") {
    // quality comes from the (separately oracle-gated) qualityScore;
    // what this pins is the two-stage salted rank: it must select and
    // rank EXACTLY like a plain per-source (quality desc, doc_id) sort
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val words = Vector("the", "and", "cat", "dog", "run", "42", "a1b",
      "lorem", "ipsum", "x")
    val genDocs = for {
      n <- Gen.choose(4, 40)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf("s0", "s1", "s2")
        len <- Gen.choose(1, 30)
        ws <- Gen.listOfN(len, Gen.oneOf(words))
      } yield (src, ws.mkString(" ")))
    } yield rows.zipWithIndex.map { case ((src, t), i) =>
      (i.toLong * 3 + 1, t, src) } // sparse ids
    val cap = 3
    (11 to 20).map(i => genDocs(Gen.Parameters.default, Seed(i.toLong)).get)
      .foreach { rows =>
        val d = rows.toDF("doc_id", "text", "source")
        val qual = TextPipeline.qualityScore(d).collect()
          .map(r => r.getAs[Long]("doc_id") ->
            r.getAs[Double]("quality_score")).toMap
        val want = rows.groupBy(_._3).flatMap { case (src, ds) =>
          ds.map(_._1).sortBy(id => (-qual(id), id)).take(cap)
            .zipWithIndex.map { case (id, i) =>
              (src, i + 1L, id, qual(id)) }
        }.toSet
        val got = TextPipeline.sourceCap(d, cap).collect()
          .map(r => (r.getAs[String]("source"), r.getAs[Long]("rnk"),
            r.getAs[Long]("doc_id"), r.getAs[Double]("quality_score")))
          .toSet
        assert(got == want, s"sourceCap mismatch on ${rows.take(6)}...")
      }
  }

  test("dsirWeights: target-slice docs weigh positive, others negative") {
    // Disjoint vocabularies: every feature of doc 1 appears only in the
    // target (en) slice, every feature of doc 2 only outside it.
    val d = docs((1L, "aa bb", "en"), (2L, "cc dd", "de"))
    val rows = TextPipeline.dsirWeights(d).orderBy("doc_id").collect()
    assert(rows.length === 2)
    // 2 words -> 2 unigrams + 1 bigram
    assert(rows(0).getAs[Long]("n_feats") === 3L)
    assert(rows(1).getAs[Long]("n_feats") === 3L)
    // en doc: each bucket has tgt_c = all_c -> log-ratio > 0 (more
    // target-like than corpus average); de doc: tgt_c = 0 -> < 0
    assert(rows(0).getAs[Long]("logw_nano") > 0L)
    assert(rows(0).getAs[Boolean]("keep"))
    assert(rows(1).getAs[Long]("logw_nano") < 0L)
    assert(!rows(1).getAs[Boolean]("keep"))
  }

  test("dsirWeights: one-word doc yields a single unigram feature") {
    val d = docs((1L, "solo", "en"), (2L, "other text", "de"))
    val rows = TextPipeline.dsirWeights(d).orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("n_feats") === 1L)
  }

  test("nbLangClassify: disjoint vocabularies classify held-out docs") {
    // ids 4 and 8 are the held-out 25% (doc_id % 4 == 0); vocabularies
    // are disjoint so NB must recover both labels exactly.
    val d = docs(
      (1L, "aa bb aa", "en"), (2L, "bb aa", "en"), (3L, "aa aa", "en"),
      (4L, "aa bb", "en"),
      (5L, "cc dd cc", "de"), (6L, "dd cc", "de"), (7L, "cc cc", "de"),
      (8L, "cc dd", "de"))
    val rows = TextPipeline.nbLangClassify(d).orderBy("doc_id").collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getAs[Boolean]("correct")))
    assert(rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_test")).toMap
      === Map(1L -> false, 2L -> false, 3L -> false, 4L -> true,
        5L -> false, 6L -> false, 7L -> false, 8L -> true))
    assert(rows(3).getAs[String]("pred_lang") === "en")
    assert(rows(7).getAs[String]("pred_lang") === "de")
  }

  test("lmScore: add-one bigram log-likelihoods match hand computation") {
    val d = docs((1L, "a a a", "en"), (2L, "b a", "de"))
    val rows = TextPipeline.lmScore(d).orderBy("doc_id").collect()
    // Train slice = doc 1 only: c(<s>,a)=1, c(a,a)=2, c(<s>)=1, c(a)=2,
    // V = |{a}| = 1.
    def nano(x: Double): Long = math.round(math.log(x) * 1e9)
    // doc 1: (<s>,a) then (a,a) twice
    assert(rows(0).getAs[Long]("n_bigrams") === 3L)
    assert(rows(0).getAs[Long]("ll_nano") ===
      nano(2.0 / 3.0) + 2 * nano(3.0 / 4.0))
    // doc 2 (not in the train slice, all bigrams unseen):
    // (<s>,b): (0+1)/(1+1+1); (b,a): prev OOV -> (0+1)/(0+1+1)
    assert(rows(1).getAs[Long]("n_bigrams") === 2L)
    assert(rows(1).getAs[Long]("ll_nano") ===
      nano(1.0 / 3.0) + nano(1.0 / 2.0))
  }
}
