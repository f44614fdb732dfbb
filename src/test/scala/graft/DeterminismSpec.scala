package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{TextPipeline, VectorOps}

/** Partition-count invariance: every result must be IDENTICAL under a
  * different `spark.sql.shuffle.partitions` — the property that makes
  * a row computed on local[32] equal the same row on a 1000-executor
  * cluster. The salted two-stage top-k seeds its salt from the conf
  * value, so these tests specifically prove the salt count changes the
  * PLAN, never the rows. Sessions are `newSession()` clones (same
  * SparkContext, own conf). */
class DeterminismSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-determinism")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Run `f` under a cloned session with the given width and return
    * the sorted row set (all columns stringified). */
  private def rowsAt(parts: Int)(f: SparkSession => DataFrame)
      : List[String] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    f(s).collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .toList.sorted
  }

  private def assertInvariant(name: String)
      (f: SparkSession => DataFrame): Unit = {
    val a = rowsAt(3)(f)
    val b = rowsAt(17)(f)
    assert(a.nonEmpty, s"$name returned no rows")
    assert(a === b, s"$name differs across shuffle widths")
  }

  test("knnGraph rows are invariant to the shuffle width") {
    assertInvariant("knnGraph") { s =>
      val emb = Tables.load(s, dir, "embeddings")
      VectorOps.knnGraph(emb, k = 3)
    }
  }

  test("semDedup verdicts are invariant to the shuffle width") {
    assertInvariant("semDedup") { s =>
      val emb = Tables.load(s, dir, "embeddings")
      VectorOps.semDedup(emb)
    }
  }

  test("annTopK rows are invariant to the shuffle width") {
    assertInvariant("annTopK") { s =>
      val emb = Tables.load(s, dir, "embeddings")
      VectorOps.annTopK(emb)
    }
  }

  test("clusterSample rows are invariant to the shuffle width") {
    assertInvariant("clusterSample") { s =>
      val emb = Tables.load(s, dir, "embeddings")
      VectorOps.clusterSample(emb)
    }
  }

  test("minhash dedup clusters are invariant to the shuffle width") {
    assertInvariant("dedupClusters") { s =>
      val docs = Tables.load(s, dir, "documents")
      TextPipeline.dedupClusters(docs,
        TextPipeline.minhashCandidates(docs))
    }
  }

  test("boilerplate reassembly is invariant to the shuffle width") {
    assertInvariant("boilerplateRemove") { s =>
      val docs = Tables.load(s, dir, "documents")
      TextPipeline.boilerplateRemove(docs)
    }
  }

  test("pageRank fixpoint is invariant to the shuffle width") {
    assertInvariant("pageRank") { s =>
      val emb = Tables.load(s, dir, "embeddings")
      VectorOps.pageRank(emb, iters = 3)
    }
  }

  test("sourceCap survivors are invariant to the shuffle width") {
    // the salt count changes with the conf — the kept SET must not
    assertInvariant("sourceCap") { s =>
      val docs = Tables.load(s, dir, "documents")
      TextPipeline.sourceCap(docs)
    }
  }

  test("eventAnomalies flags are invariant to the shuffle width") {
    assertInvariant("eventAnomalies") { s =>
      graft.relational.CoreQueries.eventAnomalies(s, dir)
    }
  }

  test("labelPropagate labels are invariant to the shuffle width") {
    assertInvariant("labelPropagate") { s =>
      val emb = Tables.load(s, dir, "embeddings")
      VectorOps.labelPropagate(emb, iters = 2)
    }
  }

  test("sourceDistinctEstimate minima are invariant to the shuffle width") {
    // the ascending salted top-k path (the others rank descending)
    assertInvariant("sourceDistinctEstimate") { s =>
      val docs = Tables.load(s, dir, "documents")
      TextPipeline.sourceDistinctEstimate(docs, k = 16)
    }
  }

  test("weightedSample picks are invariant to the shuffle width") {
    // the bucket-offset global prefix sum must not depend on how the
    // per-bucket cumsums were partitioned
    assertInvariant("weightedSample") { s =>
      val docs = Tables.load(s, dir, "documents")
      graft.pipeline.TrainingData.weightedSample(docs)
    }
  }
}
