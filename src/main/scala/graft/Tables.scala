package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet files under a scale-factor directory.
  * Column pruning / predicate pushdown reach the scan because we always
  * go through `spark.read.parquet` (vectorized reader + min/max skipping).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's `events.parquet` carries TIMESTAMP(NANOS) which the
    // vectorized reader rejects; read nanos as Long and restore a µs
    // TimestampType column so downstream code sees one timestamp type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.LongType && f.name == "ts")
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      else d
    }
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Epoch microseconds of a timestamp column, robust to the parquet
    * reader producing TIMESTAMP or TIMESTAMP_NTZ (session tz is UTC, so
    * the NTZ->TZ cast is the identity on the stored wall-clock value and
    * matches DuckDB's `epoch_us`). */
  def tsMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_micros(c.cast(TimestampType))
}
