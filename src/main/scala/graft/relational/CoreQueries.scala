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
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), tsMicros(col("ts")).as("t")))

  /** [[sessionize]] over a pre-projected `(user_id, event_id, t)`
    * frame — the seam the SQL TVF expands to. */
  private[graft] def sessionizeOf(ev: DataFrame): DataFrame = {
    val gapMicros = 30L * 60 * 1000000
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

  /** Ordered conversion funnel over the event stream: a user reaches
    * step s only with a step-s event STRICTLY after their step-(s−1)
    * time (the min-ts chain — the standard product-analytics funnel).
    * One shuffle on user_id; the per-user chain folds inside a single
    * aggregate row via array HOFs (`array_min ∘ filter`), never a
    * per-step self-join over the event table, so k steps cost one
    * corpus pass however long the funnel. Output: (step_no, step,
    * n_users, conv) with conv = the step-over-step conversion
    * fraction. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), tsMicros(col("ts")).as("t")))

  /** The funnel's step ladder, shared with the streaming twin. */
  private[graft] val funnelSteps = Seq("signup", "view", "click", "purchase")

  /** One step of the funnel's greedy min-ts fold: advances the 4-slot
    * reach-time vector `ts` (−1 = unreached) with one event. Applied
    * over a user's events in event-time order this IS the min-ts
    * chain: the first signup seen is the min, and the first step-k
    * event strictly after ts(k−1) is the chain's min because
    * iteration order = event order (within-tie order is irrelevant —
    * an event at the same timestamp as ts(k−1) can never pass the
    * strict >). Shared by the batch fold below and
    * [[graft.streaming.StreamingOps.funnelStream]]'s per-batch state
    * update, so batch and stream provably apply one rule. */
  private[graft] def funnelAdvance(ts: Array[Long], ty: String,
      t: Long): Unit = {
    val k = funnelSteps.indexOf(ty)
    if (k == 0) { if (ts(0) < 0) ts(0) = t }
    else if (k > 0 && ts(k) < 0 && ts(k - 1) >= 0 && t > ts(k - 1))
      ts(k) = t
  }

  /** [[funnel]] over a pre-projected `(user_id, event_type, t)` frame
    * — the seam the fixture spec drives with partial-conversion
    * users. Bounded per-user state: one shuffle on user_id with a
    * SECONDARY SORT on (t, ty) (`flatMapSortedGroups` — Spark sorts
    * within partitions, never buffering a group), then the four-long
    * greedy fold [[funnelAdvance]] per user. A pathological user with
    * 10⁸ events costs that task iteration time, not a multi-GB
    * `collect_list` aggregation buffer — the per-task memory is O(1)
    * in the hottest user's event count. */
  private[graft] def funnelOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.filter(col("event_type").isin(funnelSteps: _*))
      .select(col("user_id").cast("long").as("_1"),
        col("event_type").as("_2"), col("t").cast("long").as("_3"))
      .as[(Long, String, Long)]
    val depth = ev.groupByKey(_._1)
      .flatMapSortedGroups(col("_3"), col("_2")) { (_, it) =>
        val ts = Array.fill(4)(-1L)
        it.foreach(e => funnelAdvance(ts, e._2, e._3))
        Iterator.single(ts.takeWhile(_ >= 0).length.toLong)
      }
      .toDF("depth")
    funnelShape(depth
      .agg(sum(when(col("depth") >= 1, 1)).as("s1"),
        sum(when(col("depth") >= 2, 1)).as("s2"),
        sum(when(col("depth") >= 3, 1)).as("s3"),
        sum(when(col("depth") >= 4, 1)).as("s4")))
  }

  /** Folds a one-row `(s1, s2, s3, s4)` step-count frame into the
    * funnel's output shape — shared by the batch query and the
    * streaming replay row so both land on the same mirror. */
  private[graft] def funnelShape(counts: DataFrame): DataFrame =
    counts
      .selectExpr("stack(4, " +
        "CAST(1 AS BIGINT), 'signup',   s1, CAST(NULL AS BIGINT), " +
        "CAST(2 AS BIGINT), 'view',     s2, s1, " +
        "CAST(3 AS BIGINT), 'click',    s3, s2, " +
        "CAST(4 AS BIGINT), 'purchase', s4, s3) " +
        "AS (step_no, step, n_users, n_prev)")
      .withColumn("conv",
        when(col("n_prev").isNull, lit(1.0))
          .when(col("n_prev") === 0, lit(0.0))
          .otherwise(col("n_users").cast("double") /
            col("n_prev").cast("double")))
      .select("step_no", "step", "n_users", "conv")
      .orderBy("step_no")

  /** Weekly cohort retention: cohort = a user's first-activity week
    * (integer weeks since the epoch — pure integer division, no
    * calendar edge to diverge on), retained at offset w if the user
    * has ANY event in cohort+w. Two shuffles (per-user cohort, then
    * the (cohort, offset) grid); the distinct (user, week) frame
    * bounds everything at users × active-weeks. Output per (cohort,
    * offset): active users, cohort size, retention fraction. */
  def retention(spark: SparkSession, dir: String): DataFrame =
    retentionOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), tsMicros(col("ts")).as("t")))

  /** [[retention]] over a pre-projected `(user_id, t)` frame. */
  private[graft] def retentionOf(events: DataFrame): DataFrame = {
    val wk = 7L * 86400 * 1000000
    val uw = events
      .select(col("user_id"), expr(s"t DIV $wk").as("w"))
      .distinct()
      .localCheckpoint(false) // feeds the cohort agg AND the offset join
    val cohort = uw.groupBy("user_id").agg(min("w").as("cw"))
    val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("cohort_size"))
    uw.join(cohort, "user_id")
      .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_no"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes.withColumnRenamed("cw", "cohort_week"), "cohort_week")
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
      .select("cohort_week", "week_no", "n_active", "cohort_size",
        "retention")
      .orderBy("cohort_week", "week_no")
  }
  /** Per-type 3σ outliers over the event stream — the data-quality
    * screen a pipeline runs before trusting `value` aggregates.
    * Integer-exact cross-multiplied test: an event is flagged iff
    * `(n·v − s)² > 9·(n·ssq − s²)` over milli-quantized values (≡
    * |v − μ| > 3σ population-σ, with no division or sqrt to diverge
    * on). The squared-sum products overflow int64 past ~10⁷ rows, so
    * the comparison runs in decimal(38,0) (HUGEINT on the mirror);
    * ssq itself is summed in decimal — at corpus scale Σv² of
    * milli-quantized values passes 9.2·10¹⁸ around 10¹² rows. Two
    * passes: one groupBy for the 5-row stats frame (map-side
    * combined), then a broadcast join back — the event table never
    * reshuffles. */
  def eventAnomalies(spark: SparkSession, dir: String): DataFrame =
    eventAnomaliesOf(Tables.load(spark, dir, "events"))

  /** [[eventAnomalies]] over a pre-loaded events frame. */
  private[graft] def eventAnomaliesOf(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_id"), col("event_type"),
      round(col("value") * 1000).cast("long").as("v_milli"))
    flagAnomalies(ev, anomalyStatsOf(ev)).orderBy("event_id")
  }

  /** The per-type stats model the 3σ test needs — the TRAINED side of
    * the screen (5 rows here; one row per event type anywhere). A
    * deployment builds this batch and stores it; the streaming probe
    * joins fresh events against it. */
  private[graft] def anomalyStatsOf(ev: DataFrame): DataFrame =
    ev.groupBy("event_type").agg(
      count(lit(1)).as("n_type"),
      sum(col("v_milli")).as("s"),
      sum((col("v_milli") * col("v_milli")).cast("decimal(28,0)"))
        .as("ssq"))

  /** The stateless scoring half: broadcast-join events against the
    * stats model and keep the 3σ outliers. Works identically on a
    * batch frame and on a stream (stream-static join — no state). */
  private[graft] def flagAnomalies(ev: DataFrame,
      stats: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("dev",
        col("n_type").cast(d38) * col("v_milli").cast(d38)
          - col("s").cast(d38))
      .withColumn("var9",
        lit(9).cast(d38) * (col("n_type").cast(d38) * col("ssq").cast(d38)
          - col("s").cast(d38) * col("s").cast(d38)))
      .filter(col("dev") * col("dev") > col("var9"))
      .select(col("event_id"), col("event_type"), col("v_milli"),
        expr("s div n_type").as("mean_milli"), col("n_type"))
  }

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
