package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VectorOps

/** Focused probe for the corpus self-kNN family: replicate sf0.1
  * embeddings k×, train √n cells once, then time semDedup / knnGraph /
  * knnClusters under the shared quantizer. Usage: KnnProbe [k]. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val copies = broadcast((0 until k).toDF("copy"))
    val emb = base.crossJoin(copies)
      .select((col("vec_id") * k + col("copy")).as("vec_id"),
        expr("concat(slice(embedding, copy + 1, size(embedding) - copy), " +
          "slice(embedding, 1, copy))").as("embedding"))
      // one source file × broadcast crossJoin = ONE partition; spread
      // it or every per-row kernel below runs single-threaded
      .repartition(64)
      .localCheckpoint()
    val n = emb.count()

    def timed(label: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val r = f
      println(f"""$label: rows=$r seconds=${(System.nanoTime() - t) / 1e9}%.2f""")
    }

    val cells = VectorOps.scaledCells(n)
    println(s"n=$n cells=$cells")
    var cents: Array[Array[Long]] = null
    timed("ivf_train_seeds_only") {
      VectorOps.ivfTrain(emb, cells, iters = 0); 1L }
    timed("ivf_train_1iter") {
      VectorOps.ivfTrain(emb, cells, iters = 1); 1L }
    timed("ivf_train") { cents = VectorOps.ivfTrain(emb, cells); 1L }
    timed("semdedup") { VectorOps.semDedup(emb, nCells = cells,
      trainedCents = Some(cents)).rdd.count() }
    timed("assignments") { VectorOps.ivfAssignments(emb, cents).count() }
    timed("knn_graph_count") { VectorOps.knnGraph(emb, nCells = cells,
      trainedCents = Some(cents)).count() }
    timed("knn_graph_rdd") { VectorOps.knnGraph(emb, nCells = cells,
      trainedCents = Some(cents)).rdd.count() }
    timed("knn_clusters") { VectorOps.knnClusters(emb, nCells = cells,
      trainedCents = Some(cents)).rdd.count() }

    // ---- cell-skew scenario -------------------------------------
    // Force ~90% of the collection into ONE cell: 9 of 10 vectors
    // point at the all-ones direction (equal components — magnitude
    // differs, direction is identical, so one centroid takes them
    // all) — the degenerate mode the CellCap guard exists for. An
    // 8× replication keeps the uncapped baseline feasible while the
    // hot cell is big enough (~14 400 members ⇒ 2.1e8 pairs in ONE
    // task) for the serialization to show; cap = 1024 binds hard.
    val hot = base.crossJoin(broadcast((0 until 8).toDF("c8")))
      .select((col("vec_id") * 8 + col("c8")).as("vec_id"),
        when((col("vec_id") * 8 + col("c8")) % 10 =!= 0,
            expr("transform(sequence(1, size(embedding)), " +
              "i -> CAST(1.0 + pmod(vec_id, 7) / 1000.0 AS FLOAT))"))
          .otherwise(col("embedding")).as("embedding"))
      .repartition(64).localCheckpoint()
    val hotN = hot.count()
    val hotCells = VectorOps.scaledCells(hotN)
    val hotCents = VectorOps.ivfTrain(hot, hotCells)
    val cap = 1024
    println(s"skew: n=$hotN cells=$hotCells cap=$cap " +
      s"(hot cell ~${hotN * 9 / 10})")
    // the bound itself: largest per-task pair block with / without
    // the guard, from the assignment directly (pairs in a block of
    // size m = m·(m−1))
    val sizes = VectorOps.ivfAssignments(hot, hotCents)
      .groupBy("cent_id").count().localCheckpoint()
    val blockPairs = sizes
      .withColumn("nsub", expr(s"(count + ${cap - 1}) div $cap"))
      // modulo split of m members over nsub residues: block ≤ ⌈m/nsub⌉
      .withColumn("blk", expr("ceil(count / nsub)"))
      .agg(max(expr("count * (count - 1)")).as("uncapped"),
        max(expr("blk * (blk - 1)")).as("capped"))
      .collect()(0)
    println(s"skew max per-task pairs: uncapped=${blockPairs.get(0)} " +
      s"capped<=${blockPairs.get(1)}")
    timed("skew_semdedup_capped") { VectorOps.semDedup(hot,
      nCells = hotCells, trainedCents = Some(hotCents),
      cellCap = cap).rdd.count() }
    timed("skew_knn_graph_capped") { VectorOps.knnGraph(hot,
      nCells = hotCells, trainedCents = Some(hotCents),
      cellCap = cap).rdd.count() }
    timed("skew_knn_graph_uncapped") { VectorOps.knnGraph(hot,
      nCells = hotCells, trainedCents = Some(hotCents),
      cellCap = Int.MaxValue).rdd.count() }
    spark.stop()
  }
}
