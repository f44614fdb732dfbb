package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Property test: the streaming cell-assignment kernel
  * ([[StreamingOps.topCellsKernel]] — fixed-size insertion top-n) must
  * equal the naive specification (score every cell, full sort by
  * (ccos desc, cent_id asc), take nProbe) on arbitrary
  * centroid/vector sets — including exact score TIES (duplicate
  * centroids), nProbe larger than nCells, and zero centroids (NaN
  * cosine, which must rank GREATEST like the batch argmax). Plain
  * scalacheck generators with fixed seeds — deterministic. */
class KernelPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-kernel-prop")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class Case(cents: Vector[Vector[Long]],
      vecs: Vector[Vector[Long]], nProbe: Int)

  private val genCase: Gen[Case] = for {
    d <- Gen.choose(1, 6)
    nc <- Gen.choose(1, 12)
    // small component range forces score ties; include an all-zero
    // centroid sometimes (NaN cosine)
    cents <- Gen.listOfN(nc, Gen.frequency(
      9 -> Gen.listOfN(d, Gen.choose(0L, 3L)),
      1 -> Gen.const(List.fill(d)(0L))))
    nv <- Gen.choose(1, 15)
    vecs <- Gen.listOfN(nv, Gen.listOfN(d, Gen.choose(1L, 4L)))
    nProbe <- Gen.choose(1, nc + 2) // may exceed nCells
  } yield Case(cents.map(_.toVector).toVector,
    vecs.map(_.toVector).toVector, nProbe)

  /** The specification: full scoring, total sort, NaN greatest. */
  private def naive(cents: Vector[Vector[Long]], q: Vector[Long],
      nProbe: Int): List[Long] = {
    val nq = q.map(x => x * x).sum
    val scored = cents.zipWithIndex.map { case (c, j) =>
      val dot = c.zip(q).map { case (a, b) => a * b }.sum
      val cos = dot.toDouble /
        (math.sqrt(nq.toDouble) * math.sqrt(c.map(x => x * x).sum.toDouble))
      (cos, j.toLong)
    }
    // NaN greatest, then descending, cent_id ascending on ties — the
    // batch max(struct)/window rule
    scored.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c > 0 else a._2 < b._2
    }.take(math.min(nProbe, cents.length)).map(_._2).toList
  }

  test("topCellsKernel equals the full-sort specification (ties, NaN, nProbe > nCells)") {
    val params = Gen.Parameters.default
    (1 to 300).foreach { i =>
      val c = genCase(params, Seed(i.toLong)).get
      val bc = spark.sparkContext.broadcast(c.cents.map(_.toArray).toArray)
      val rows = c.vecs.zipWithIndex.map { case (v, k) =>
        (k.toLong, v: Seq[Long], v.map(x => x * x).sum)
      }
      val got = StreamingOps.topCellsKernel(bc, c.nProbe)(rows.iterator)
        .toList.groupBy(_._1)
        .map { case (id, rs) => id -> rs.map(_._4) }
      rows.foreach { case (id, qv, _) =>
        val want = naive(c.cents, qv.toVector, c.nProbe)
        assert(got.getOrElse(id, Nil) == want,
          s"seed=$i id=$id nProbe=${c.nProbe} cents=${c.cents}")
      }
      bc.destroy()
    }
  }
}
