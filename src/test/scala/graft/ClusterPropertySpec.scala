package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextPipeline

/** Property test: distributed near-dup cluster formation (min-label
  * propagation with pointer jumping) must equal a driver-side
  * union-find on arbitrary candidate-pair graphs — including paths
  * (worst case for propagation depth), cliques, self-contained stars,
  * isolated nodes, and sparse non-contiguous doc ids. (Plain
  * scalacheck generators with fixed seeds — deterministic.)
  */
class ClusterPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cluster-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class Graph(docs: Vector[Long], edges: Vector[(Long, Long)])

  private val genGraph: Gen[Graph] = for {
    n <- Gen.choose(2, 40)
    // sparse, shuffled, non-contiguous ids: catches any assumption
    // that labels are dense or that min ids arrive first
    ids <- Gen.pick(n, (0 until 200).map(i => i * 7L + 3)).map(_.toVector)
    m <- Gen.choose(0, 2 * n)
    edges <- Gen.listOfN(m, for {
      a <- Gen.oneOf(ids)
      b <- Gen.oneOf(ids)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).toVector)
  } yield Graph(ids, edges)

  /** Driver-side union-find with path compression. */
  private def model(g: Graph): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(g.docs.map(d => d -> d): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    g.edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical = minimum of the component; union-by-min keeps the
    // root minimal, so find() already returns it
    g.docs.map(d => d -> find(d)).toMap
  }

  test("cluster labels equal union-find on random graphs") {
    import spark.implicits._
    val cases = (1 to 12).map(i =>
      genGraph.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    // worst-case shape for label propagation: one long path
    val path = Graph((0L to 25L).map(i => 1000 - i * 13).toVector,
      (0L until 25L).map(i => (1000 - i * 13, 1000 - (i + 1) * 13)).toVector)
    (cases :+ path).foreach { g =>
      val docs = g.docs.toDF("doc_id")
      val pairs = if (g.edges.isEmpty)
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      else g.edges.toDF("doc_a", "doc_b")
      val want = model(g)
      val sizes = want.values.groupBy(identity).view.mapValues(_.size).toMap
      val got = TextPipeline.dedupClusters(docs, pairs)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      assert(got.keySet == want.keySet, s"doc set mismatch for $g")
      g.docs.foreach { d =>
        val (cid, csize, canon) = got(d)
        assert(cid == want(d), s"doc $d: cluster $cid != ${want(d)} in $g")
        assert(csize == sizes(want(d)).toLong, s"doc $d size in $g")
        assert(canon == (d == want(d)), s"doc $d canonical flag in $g")
      }
    }
  }
}
