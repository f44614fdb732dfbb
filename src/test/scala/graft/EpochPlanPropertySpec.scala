package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingData

/** Property test: [[TrainingData.epochPlan]]'s closed-form allocation
  * must satisfy the water-filling invariants on arbitrary source-size
  * distributions, budgets and epoch caps — the properties a refactor
  * of the prefix predicate could silently break:
  *
  *  1. 0 ≤ alloc ≤ cap everywhere; capped rows get exactly their cap.
  *  2. Uncapped rows all receive the SAME share, and that share is ≥
  *     every capped row's cap (the water level sits above the caps it
  *     drowned).
  *  3. The budget is exhausted up to integer flooring: Σalloc ≤ B, and
  *     when any row is uncapped the slack is < #uncapped (the floor
  *     remainder); when ALL rows cap, Σalloc = Σcap ≤ B.
  *  4. epochs_milli = ⌊1000·alloc/tokens⌋ and capped rows read exactly
  *     1000·maxEpochs.
  */
class EpochPlanPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-epoch-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class Case(sizes: Vector[Int], num: Int, den: Int,
      epochs: Int)

  private val genCase: Gen[Case] = for {
    ns <- Gen.choose(1, 12)
    sizes <- Gen.listOfN(ns, Gen.frequency(
      5 -> Gen.choose(1, 30),      // small sources
      3 -> Gen.choose(30, 300),    // medium
      1 -> Gen.choose(300, 2000))) // one viral source sometimes
    num <- Gen.choose(1, 8)
    den <- Gen.choose(1, 4)
    epochs <- Gen.choose(1, 4)
  } yield Case(sizes.toVector, num, den, epochs)

  test("allocation satisfies the water-filling invariants") {
    val sqlc = spark
    import sqlc.implicits._
    val params = Gen.Parameters.default
    (1 to 30).foreach { i =>
      val c = genCase(params, Seed(i.toLong)).get
      val docs = c.sizes.zipWithIndex.map { case (n, j) =>
        (j.toLong, (1 to n).map(_ => "w").mkString(" "), f"s$j%03d")
      }.toDF("doc_id", "text", "source")
      val rows = TrainingData.epochPlan(docs, c.num, c.den, c.epochs)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6)))
      val total = c.sizes.map(_.toLong).sum
      val budget = total * c.num / c.den
      val ctx = s"seed=$i sizes=${c.sizes} B=$budget E=${c.epochs}"
      rows.foreach { case (s, tok, cap, alloc, em, capped) =>
        assert(cap == tok * c.epochs, ctx)
        assert(alloc >= 0 && alloc <= cap, s"$ctx src=$s")
        if (capped) {
          assert(alloc == cap, s"$ctx src=$s")
          assert(em == 1000L * c.epochs, s"$ctx src=$s")
        }
        assert(em == 1000L * alloc / tok, s"$ctx src=$s")
      }
      val (cappedRows, free) = rows.partition(_._6)
      if (free.nonEmpty) {
        assert(free.map(_._4).distinct.size == 1, ctx) // one water level
        val level = free.head._4
        cappedRows.foreach { r => assert(r._4 <= level, s"$ctx ${r._1}") }
        val spent = rows.map(_._4).sum
        assert(spent <= budget, ctx)
        assert(budget - spent < free.size, ctx) // floor remainder only
      } else {
        assert(rows.map(_._4).sum == rows.map(_._3).sum, ctx)
        assert(rows.map(_._4).sum <= budget, ctx)
      }
    }
  }
}
