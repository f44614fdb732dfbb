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
    spark.stop()
  }
}
