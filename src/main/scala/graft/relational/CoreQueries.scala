package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.Tables.tsMicros

/** Pure-Catalyst relational queries exercising the primitives the
  * reference composes out of PostgreSQL (SURVEY §2.4): filtered hash
  * aggregation, multi-way joins with broadcastable dimensions,
  * gaps-and-islands sessionization, windowed dedup, top-k.
  *
  * Numeric discipline: money columns are summed as DECIMAL (exact,
  * order-independent across partitions — a double sum would depend on
  * shuffle order) and only cast to DOUBLE at the output edge.
  */
object CoreQueries {

  private val Money = DecimalType(18, 2)
  private val Frac = DecimalType(8, 4)

  /** TPC-H Q1-style pricing summary over lineitem (hash agg + FILTER,
    * reference analogue: `obanalytics.summary`'s filtered counts,
    * `db/obanalytics_schema.sql:2541-2565`). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val ext = col("l_extendedprice").cast(Money)
    val disc1 = (lit(1.0) - col("l_discount")).cast(Frac)
    val tax1 = (lit(1.0) + col("l_tax")).cast(Frac)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(ext), 2).cast("double").as("sum_base_price"),
        round(sum(ext * disc1), 2).cast("double").as("sum_disc_price"),
        round(sum(ext * disc1 * tax1), 2).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"),
        count(when(col("l_discount") > 0.05, 1)).as("count_discounted"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region —
    * the dimensions are broadcast (they are tiny at every SF; Catalyst
    * would choose this via AQE anyway, the hint makes it explicit). */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    val rev = (col("l_extendedprice").cast(Money) *
      (lit(1.0) - col("l_discount")).cast(Frac))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(rev), 2).cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** Gaps-and-islands sessionization of the events stream (the same
    * pattern as the reference's era detection,
    * `db/bitfinex_schema.sql:332-361`): a >30 min silence per user splits
    * a session. Returns per-user session stats. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapMicros = 30L * 60 * 1000000
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), tsMicros(col("ts")).as("t"))
    val wUser = Window.partitionBy("user_id").orderBy("t", "event_id")
    val sessions = ev
      .withColumn("prev_t", lag("t", 1).over(wUser))
      .withColumn("new_s",
        when(col("prev_t").isNull || col("t") - col("prev_t") > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum("new_s").over(wUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        (max("t") - min("t")).as("duration_us")) // exact long, not double
    sessions.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"),
        (sum("duration_us") / 1000000.0).as("total_duration_sec"))
      .orderBy("user_id")
  }

  /** Top-N orders per customer market segment by order value — window
    * rank + filter (reference analogue: dense_rank level cut,
    * `db/get_schema.sql:588-598`). */
  def topOrdersPerSegment(spark: SparkSession, dir: String, topN: Int = 5)
      : DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("c_mktsegment"), col("rnk").cast("long").as("rnk"),
        col("o_orderkey"), col("o_totalprice"), col("c_custkey"))
      .orderBy("c_mktsegment", "rnk")
  }

  /** Semi-structured extraction: parse the JSON `props` payload and
    * aggregate the extracted field per event type (JSON is the lake's
    * schema-on-read escape hatch; `get_json_object` is codegen'd). */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        count(when(col("k").isNull, 1)).as("n_null"))
      .orderBy("event_type")

  /** As-of enrichment: each event annotated with the most recent prior
    * order of the same user-as-customer — the `last(value, ignoreNulls)`
    * over a unioned stream pattern the reference uses for prevailing
    * spread (`db/get_schema.sql:363-366`). */
  /** The same as-of enrichment expressed through the [[graft.plans.AsOfJoin]]
    * LOGICAL OPERATOR (extension tier (c)): left = events, right = the
    * per-(customer, day) max order price (unique right key, so the
    * ties-inclusive operator semantics are deterministic). The
    * optimizer lowers the node to the slice-parallel carry plan. */
  def asofEnrichOperator(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id").as("key"), tsMicros(col("ts")).as("t"),
        col("event_id"))
    val o = Tables.load(spark, dir, "orders")
      .groupBy((col("o_custkey") % 1500).as("key"),
        tsMicros(col("o_orderdate")).as("ot"))
      .agg(max(col("o_totalprice")).as("best_price"))
    graft.plans.AsOfJoinOps.asofJoin(ev, o,
        keys = Seq("key"), leftTs = "t", rightTs = "ot",
        carry = Seq("best_price"))
      .select(col("key").as("user_id"), col("t").as("ts"), col("event_id"),
        col("best_price_asof"))
      .orderBy("user_id", "ts", "event_id")
  }

  def asofEnrich(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id").as("key"), tsMicros(col("ts")).as("t"),
        col("event_id"), lit(null).cast("double").as("o_price"),
        lit(1).as("is_event"), col("event_id").as("tie"))
    val o = Tables.load(spark, dir, "orders")
      .select((col("o_custkey") % 1500).as("key"), tsMicros(col("o_orderdate")).as("t"),
        lit(null).cast("long").as("event_id"),
        col("o_totalprice").as("o_price"), lit(0).as("is_event"),
        col("o_orderkey").as("tie"))
    // `tie` disambiguates same-day orders of one customer — without it
    // the as-of value is nondeterministic (surfaced at sf0.1)
    val w = Window.partitionBy("key")
      .orderBy(col("t"), col("is_event"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.unionByName(o)
      .withColumn("last_order_price", last("o_price", ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("key").as("user_id"), col("t").as("ts"), col("event_id"),
        col("last_order_price"))
      .orderBy("user_id", "ts", "event_id")
  }
}
