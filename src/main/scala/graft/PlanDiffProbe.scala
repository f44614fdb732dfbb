package graft
import org.apache.spark.sql.SparkSession
object PlanDiffProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.TextPipeline
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def joins(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = p.sliding(s.length).count(_ == s)
      println(s"$tag: BHJ=${c("BroadcastHashJoin")} SMJ=${c("SortMergeJoin")} " +
        s"Sort=${c("Sort ")} Exch=${c("Exchange")} Agg=${c("HashAggregate")} " +
        s"ObjAgg=${c("ObjectHashAggregate")} SortAgg=${c("SortAggregate")}")
    }
    joins("unscoped", TextPipeline.charSpanDedup(docs, 16))
    joins("scoped  ", TextPipeline.charSpanDedupScoped(docs, 16))
    spark.stop()
  }
}
