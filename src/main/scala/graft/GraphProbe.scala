package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VectorOps

/** Focused probe for the kNN-graph PageRank: verifies the plan shape
  * (the checkpointed edge list must NOT re-shuffle inside the
  * iteration chain — its out-degree window leaves it hash-partitioned
  * on the join key) and measures iteration cost at k-replicated sf0.1
  * collections (the KnnProbe replication scheme). Usage:
  * GraphProbe [k].
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- plan shape at sf0.01 -------------------------------------
    val small = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val df = VectorOps.pageRank(small, iters = 2)
    df.collect()
    val planLines = df.queryExecution.executedPlan.toString.split("\n")
    // the final-round plan reads the cached edge table and the last
    // checkpointed ranks: exchanges present belong to the round
    // itself (groupBy dst + the final assembly joins), NOT to a
    // re-shuffle of the upstream kNN pipeline — no parquet scan may
    // appear, and the cached edge side must contribute ZERO
    // exchanges (its window already hash-partitioned it on va)
    println(s"final_round_exchanges="
      + planLines.count(_.contains("Exchange")))
    println(s"final_round_scans_parquet="
      + planLines.count(_.contains("Scan parquet")))
    println(s"final_round_existing_rdds="
      + planLines.count(_.contains("ExistingRDD")))
    println(s"final_round_memrelations="
      + planLines.count(_.contains("InMemoryTableScan")))
    // one round in isolation (the same shape pageRank builds): the
    // edge⋈ranks join must shuffle ONLY the rank side — no Exchange
    // may sit between the join and the cached edge scan
    import org.apache.spark.sql.expressions.Window
    val edges = VectorOps.knnGraph(small)
      .select(col("va"), col("vb"))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("va")))
      .persist()
    edges.count()
    val ranks = VectorOps.pageRank(small, iters = 1)
      .select(col("vec_id"), col("pr_nano")).localCheckpoint(false)
    val round = edges
      .join(ranks.withColumnRenamed("vec_id", "va"), Seq("va"))
      .select(col("vb").as("vec_id"),
        expr("(85 * pr_nano) div (100 * deg)").as("c"))
      .groupBy("vec_id").agg(sum(col("c")).as("inflow"))
    round.collect()
    val roundPlan = round.queryExecution.executedPlan.toString
    println("---- one-round plan ----")
    println(roundPlan.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("InMemoryTableScan")
        || l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("ExistingRDD"))
      .mkString("\n"))
    edges.unpersist()

    // --- label-prop round shape (verdict r11 #9) -------------------
    // one voting round in isolation, edges cached exactly as
    // labelPropagate caches them (repartitioned on vb): the join must
    // shuffle ONLY the label side; the argmax groupBys shuffle vote
    // rows, which is the round's own work
    val lpEdges = VectorOps.knnGraph(small)
      .select(col("va"), col("vb"))
      .repartition(col("vb"))
      .persist()
    lpEdges.count()
    val labels0 = small
      .select(col("vec_id").as("vb"),
        when(col("vec_id") % 10 === 0, col("label").cast("long"))
          .otherwise(lit(-1L)).as("lab"))
      .localCheckpoint(false)
    val lpRound = lpEdges.join(labels0, Seq("vb"))
      .filter(col("lab") >= 0)
      .groupBy(col("va"), col("lab"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("va").as("vec_id"))
      .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("best"))
    lpRound.collect()
    val lpPlan = lpRound.queryExecution.executedPlan.toString
    println("---- label-prop one-round plan ----")
    println(lpPlan.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("InMemoryTableScan")
        || l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("ExistingRDD"))
      .mkString("\n"))
    // the full final-iteration plan: cached edges contribute zero
    // exchanges and nothing re-reads parquet
    val lp = VectorOps.labelPropagate(small, iters = 2)
    lp.collect()
    val lpLines = lp.queryExecution.executedPlan.toString.split("\n")
    println(s"lp_final_exchanges=" + lpLines.count(_.contains("Exchange")))
    println(s"lp_final_scans_parquet="
      + lpLines.count(_.contains("Scan parquet")))
    lpEdges.unpersist()

    // --- iteration cost vs collection size ------------------------
    import spark.implicits._
    val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val copies = broadcast((0 until k).toDF("copy"))
    val emb = base.crossJoin(copies)
      .select((col("vec_id") * k + col("copy")).as("vec_id"),
        expr("concat(slice(embedding, copy + 1, size(embedding) - copy), " +
          "slice(embedding, 1, copy))").as("embedding"),
        col("label"))
      .repartition(64)
      .localCheckpoint()
    val n = emb.count()
    val cells = VectorOps.scaledCells(n)
    println(s"n=$n cells=$cells")
    val cents = VectorOps.ivfTrain(emb, cells)

    def timed(label: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val r = f
      println(f"""$label: rows=$r seconds=${(System.nanoTime() - t) / 1e9}%.2f""")
    }
    timed("knn_graph_only") { VectorOps.knnGraph(emb, nCells = cells,
      trainedCents = Some(cents)).rdd.count() }
    timed("pagerank_2it") { VectorOps.pageRank(emb, nCells = cells,
      iters = 2, trainedCents = Some(cents)).rdd.count() }
    timed("pagerank_8it") { VectorOps.pageRank(emb, nCells = cells,
      iters = 8, trainedCents = Some(cents)).rdd.count() }
    timed("label_prop_3it") { VectorOps.labelPropagate(emb,
      nCells = cells, trainedCents = Some(cents)).rdd.count() }

    spark.stop()
  }
}
