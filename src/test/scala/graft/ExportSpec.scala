package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.market.{Analytics, Level3Source}

/** CSV sink/source round-trip for the export projection (reference
  * `get.export` + R `write.csv`, `db/get_schema.sql:520-552`). */
class ExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-export")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("export writes csv and reads back identically") {
    val dir = "/root/testdata/sf0.001"
    val exp = Analytics.export(
      Level3Source.level3(Tables.load(spark, dir, "events")))
    val path = java.nio.file.Files.createTempDirectory("graft-csv").toString
    exp.write.mode("overwrite").option("header", "true").csv(path)
    val back = spark.read.option("header", "true")
      .schema(exp.schema).csv(path)
    assert(back.count() == exp.count())
    val a = exp.orderBy("id").collect().map(_.toSeq).toList
    val b = back.orderBy("id").collect().map(_.toSeq).toList
    assert(a == b)
  }
}
