package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r17 measurement probe for the char-dedup family (the 5 most
  * expensive bench rows): stage-isolated wall times via the noop sink
  * (guide §1.4) plus A/Bs of candidate shapes —
  *   (a) dup-hash detection: groupBy+left_semi (2 gram evals, 2
  *       shuffles + SMJ) vs one window count over (h1, h2) (1 gram
  *       eval, 1 shuffle + sort);
  *   (b) winnow screen key form: md5 hex string (32-char) vs
  *       unhex(md5) binary (16 B) through the sliding struct-min —
  *       identical ordering (lowercase hex is byte-order-isomorphic),
  *       half the window sort payload;
  *   (c) screen tail: groupBy+semi+two-agg+join vs window-count +
  *       single groupBy(doc_id).
  * Every variant's row set is asserted equal to the shipped operator
  * before its timing is trusted. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java ... graft.CharShapeProbe`
  */
object CharShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.TextPipeline
    val docs = Tables.load(spark, sfDir, "documents")
      .localCheckpoint(false)
    docs.count()
    val L = 16
    val w = 8

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Double = {
      f // warm
      val xs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val t = xs.min
      println(f"""{"probe":"char_shape","stage":"$label","s":$t%.3f}""")
      t
    }

    // ---- building blocks (inlined mirrors of TextPipeline private) --
    def charGrams(d: DataFrame): DataFrame =
      d.select(col("doc_id"), col("text"),
          explode(when(length(col("text")) >= L,
            sequence(lit(1), length(col("text")) - lit(L - 1)))
            .otherwise(array())).as("pos"))
        .select(col("doc_id"), col("pos"),
          xxhash64(expr(s"substring(text, pos, $L)")).as("h1"),
          xxhash64(lit("csd#2"), expr(s"substring(text, pos, $L)"))
            .as("h2"))
    def charSpans(flagged: DataFrame): DataFrame = {
      val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      val prevEnd = max(col("pos") + lit(L - 1))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
      flagged
        .withColumn("ni",
          when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
        .withColumn("island", sum(col("ni")).over(byDoc))
        .groupBy("doc_id", "island")
        .agg(min(col("pos")).as("sp"),
          (max(col("pos")) + lit(L - 1)).as("ep"))
        .withColumn("span_no", row_number().over(
          Window.partitionBy("doc_id").orderBy("sp")).cast("long"))
        .select(col("doc_id"), col("span_no"),
          col("sp").cast("long").as("s"), col("ep").cast("long").as("e"))
    }

    // ---- stage isolation: where do charSpanDedup's seconds go? ------
    time("gram_gen_only")(noop(charGrams(docs)))
    time("dup_agg_only")(noop(charGrams(docs).groupBy("h1", "h2")
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2)
      .select("h1", "h2")))
    time("csd_current")(noop(TextPipeline.charSpanDedup(docs, L)))

    // (a) window-count dup detection
    def csdWindow(d: DataFrame): DataFrame = {
      val g = charGrams(d)
      val flagged = g.withColumn("cnt",
          count(lit(1)).over(Window.partitionBy("h1", "h2")))
        .filter(col("cnt") >= 2)
        .select("doc_id", "pos")
      charSpans(flagged)
    }
    time("csd_window")(noop(csdWindow(docs)))
    // parity
    val dA = TextPipeline.charSpanDedup(docs, L)
    val dB = csdWindow(docs)
    val csdDiff = dA.exceptAll(dB).count() + dB.exceptAll(dA).count()
    println(s"""{"probe":"char_shape","parity":"csd_window","diff":$csdDiff}""")

    // ---- winnow screen stages ---------------------------------------
    def screenGrams(hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      docs.select(col("doc_id"), col("text"),
          explode(when(length(col("text")) >= L,
            sequence(lit(1), length(col("text")) - lit(L - 1)))
            .otherwise(array())).as("pos"))
        .select(col("doc_id"), col("pos"),
          hash(expr(s"substring(text, pos, $L)")).as("h"))
    time("screen_gram_md5hex")(noop(screenGrams(md5)))
    time("screen_gram_md5bin")(noop(screenGrams(c => unhex(md5(c)))))

    val trail = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    def sel(g: DataFrame): DataFrame = g
      .withColumn("m",
        min(struct(col("h"), (-col("pos")).as("negpos"))).over(trail))
      .select(col("doc_id"),
        (-col("m.negpos")).cast("long").as("pos"),
        xxhash64(col("m.h")).as("h1"),
        xxhash64(lit("cw#2"), col("m.h")).as("h2"))
      .distinct()
    time("screen_sel_md5hex")(noop(sel(screenGrams(md5))))
    time("screen_sel_md5bin")(noop(sel(screenGrams(c => unhex(md5(c))))))
    time("winnow_current")(noop(TextPipeline.charDupDocsWinnowed(docs, L, w)))

    // (c) screen tail: window-count + one groupBy
    def winnowWindow(hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val s0 = sel(screenGrams(hash))
      s0.withColumn("cnt",
          count(lit(1)).over(Window.partitionBy("h1", "h2")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_selected"),
          count(when(col("cnt") >= 2, lit(1))).as("n_dup_selected"))
        .select(col("doc_id"), col("n_selected"), col("n_dup_selected"),
          (col("n_dup_selected") > 0).as("is_flagged"))
    }
    time("winnow_window_hex")(noop(winnowWindow(md5)))
    time("winnow_window_bin")(noop(winnowWindow(c => unhex(md5(c)))))
    val wA = TextPipeline.charDupDocsWinnowed(docs, L, w)
    val wB = winnowWindow(c => unhex(md5(c)))
    val wDiff = wA.exceptAll(wB).count() + wB.exceptAll(wA).count()
    println(s"""{"probe":"char_shape","parity":"winnow_window_bin","diff":$wDiff}""")

    // composed rows at current shapes, for reference
    time("scoped_current")(noop(TextPipeline.charSpanDedupScoped(docs, L, w)))
    time("parity_current")(noop(TextPipeline.charScopedParity(docs, L, w)))
    spark.stop()
  }
}
