package graft.market

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slice-parallel as-of enrichment.
  *
  * The recurring shape "union events (kind 0) with a tick stream
  * (kind 1), then `last(c, ignoreNulls)` over
  * `Window.partitionBy(pair_id).orderBy(ts, kind)`" runs as ONE task
  * per pair — a month of a hot pair is billions of rows sorted on one
  * core at 100× scale. [[carry]] computes the identical columns with
  * per-(pair, time-slice) windows instead: each slice is seeded with
  * the last non-null carry values from earlier slices, found from a
  * per-slice aggregate that is tiny (one row per (pair, slice)) — the
  * same seed idea as `MarketOps.slicedEvents` for replay.
  */
object AsofSlicing {

  /** Adds, for every column `c` in `carryCols`, a column `${c}_asof`
    * equal to
    * `last(c, ignoreNulls).over(partitionBy(pair_id).orderBy(ts, kind)
    * .rowsBetween(unboundedPreceding, currentRow))` — but evaluated
    * with (pair, slice) window partitions, so parallelism grows with
    * the time span.
    *
    * Requirements on `stream`: columns `pair_id`, `ts` (µs), `kind`
    * (int ≥ 0 — seeds use −1 internally); among rows carrying non-null
    * values of a given carry column, (ts, kind) is unique per pair
    * (true for replay-kernel L1 outputs: one tick per episode).
    */
  def carry(stream: DataFrame, carryCols: Seq[String],
      sliceMicros: Long = MarketOps.DefaultSliceMicros,
      partCols: Seq[String] = Seq("pair_id")): DataFrame = {
    val W = sliceMicros
    // the input feeds TWO plan branches (the per-slice aggregate and
    // the union with seed rows); production call sites pass replay-
    // kernel streams, which would silently re-execute per branch —
    // the single-evaluation rule of docs/PLANS.md
    val s = stream.withColumn("__slice", expr(s"ts div ${W}L"))
      .localCheckpoint(false)

    // Last non-null value of each carry column within (pair, slice),
    // by (ts, kind) order — max_by skips rows where the ordering key is
    // null, i.e. rows not carrying that column.
    val aggs = carryCols.map { c =>
      max_by(col(c), when(col(c).isNotNull, struct(col("ts"), col("kind"))))
        .as(s"__v_$c")
    }
    val sliceAggs = s.groupBy((partCols :+ "__slice").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    // Seed for slice s = last non-null per-slice value over earlier
    // slices. One row per (pair, slice): the cross-slice window is
    // sequential per pair but over slice-count rows, not event-count.
    val wCarry = Window.partitionBy(partCols.map(col): _*).orderBy("__slice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeded = carryCols.foldLeft(sliceAggs) { (d, c) =>
      d.withColumn(s"__seed_$c",
        last(col(s"__v_$c"), ignoreNulls = true).over(wCarry))
    }
    // Seed rows re-enter the stream at the slice's start boundary with
    // kind −1: ordered before every real row of the slice.
    val seedRows = seeded
      .filter(carryCols.map(c => col(s"__seed_$c").isNotNull).reduce(_ || _))
      .select(s.schema.fields.map { f =>
        f.name match {
          case n if partCols.contains(n) || n == "__slice" => col(f.name)
          case "ts" => (col("__slice") * W).cast(f.dataType).as("ts")
          case "kind" => lit(-1).cast(f.dataType).as("kind")
          case c if carryCols.contains(c) =>
            col(s"__seed_$c").cast(f.dataType).as(c)
          case other => lit(null).cast(f.dataType).as(other)
        }
      }.toIndexedSeq: _*)

    val wAsof = Window.partitionBy((partCols :+ "__slice").map(col): _*)
      .orderBy("ts", "kind")
      .rowsBetween(Window.unboundedPreceding, 0)
    carryCols.foldLeft(s.unionByName(seedRows)) { (d, c) =>
        d.withColumn(s"${c}_asof", last(col(c), ignoreNulls = true).over(wAsof))
      }
      .filter(col("kind") >= 0)
      .drop("__slice")
  }
}
