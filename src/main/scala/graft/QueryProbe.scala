package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timing probe: runs named [[SparkEntry.queries]] twice each
  * (cold + warm) in one JVM, so plan-level regressions can be separated
  * from JVM/JIT startup noise (bench-box variance is ±40% run-to-run;
  * this at least removes the constant offsets).
  *
  * Usage: QueryProbe <sfDir> <name>[,<name>...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Long, Double) = {
        val t = System.nanoTime()
        val n = fn(spark, sfDir).rdd.count()
        (n, (System.nanoTime() - t) / 1e9)
      }
      val (n1, cold) = once()
      val (_, warm) = once()
      println(f"$name%-24s rows=$n1%-8d cold=$cold%6.2fs warm=$warm%6.2fs")
    }
    spark.stop()
  }
}
