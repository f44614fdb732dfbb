package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev A/B probe for the winnowed screen's key form (judge r15 #4):
  * the r15 shape took the window-min over `concat(md5hex,
  * lpad(10⁷−pos))` strings and shuffled 32-char hex keys; the r16
  * shape takes `min(struct(h, −pos))` (identical rightmost-min order)
  * and re-keys everything that shuffles to xxhash64 long pairs — the
  * form the exact char pass already proved ~2.3× cheaper (CsdProbe).
  * Prints min-of-two wall for both shapes plus a flag-set parity
  * count. Run on a quiet box: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  * java ... graft.WinnowProbe`. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
      .localCheckpoint(false)
    docs.count()
    val L = 16
    val w = 8

    // the r15 shape, inlined verbatim (string concat min, hex keys)
    def oldShape(): DataFrame = {
      val g = docs.select(col("doc_id"), col("text"),
          explode(when(length(col("text")) >= L,
            sequence(lit(1), length(col("text")) - lit(L - 1)))
            .otherwise(array())).as("pos"))
        .select(col("doc_id"), col("pos"),
          md5(expr(s"substring(text, pos, $L)")).as("h"))
      val trail = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(-(w - 1), 0)
      val sel = g
        .withColumn("m", min(concat(col("h"),
          lpad((lit(10000000) - col("pos")).cast("string"), 8, "0")))
          .over(trail))
        .select(col("doc_id"),
          (lit(10000000) - expr("substring(m, 33, 8)").cast("long"))
            .as("pos"),
          expr("substring(m, 1, 32)").as("h"))
        .distinct()
      val dup = sel.groupBy("h").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select("h")
      val hits = sel.join(dup, Seq("h"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup_selected"))
      sel.groupBy("doc_id").agg(count(lit(1)).as("n_selected"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_selected"),
          coalesce(col("n_dup_selected"), lit(0L)).as("n_dup_selected"),
          (coalesce(col("n_dup_selected"), lit(0L)) > 0).as("is_flagged"))
    }

    def newShape(): DataFrame =
      graft.pipeline.TextPipeline.charDupDocsWinnowed(docs, L, w)

    def minOf2(f: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f().count()
        (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once()) // warm, then min-of-two
    }
    val tOld = minOf2(() => oldShape())
    val tNew = minOf2(() => newShape())

    // parity: identical flag sets (selection order unchanged, shuffle
    // keys collision-free at probe scale)
    val a = oldShape().select("doc_id", "n_selected", "n_dup_selected",
      "is_flagged")
    val b = newShape().select("doc_id", "n_selected", "n_dup_selected",
      "is_flagged")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(f"""{"probe":"winnow_keys","old_string_s":$tOld%.3f,"new_longpair_s":$tNew%.3f,"ratio":${tOld / tNew}%.3f,"row_diff":$diff}""")
    spark.stop()
  }
}
