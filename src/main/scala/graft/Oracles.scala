package graft

/** DuckDB oracle SQL for every declared query (driver contract).
  *
  * The market-data queries run over a synthetic level3 order-event log
  * derived deterministically from the `events` table; [[Level3Cte]] is
  * the DuckDB mirror of [[graft.market.Level3Source.level3]] and is
  * prepended to each market oracle. Spark computes with DataFrame /
  * kernel code; DuckDB recomputes the same semantics declaratively —
  * a differential test in the spirit of the reference's fast/slow twin
  * implementations (`db/obanalytics_schema.sql:1225-1267`).
  *
  * Conventions keeping hash-compare stable across engines:
  * integral outputs are BIGINT, float outputs are DOUBLE computed either
  * from exact integer/decimal arithmetic or by identical single
  * expressions; every query has a total ORDER BY.
  */
object Oracles {

  /** Mirror of Level3Source.level3 (see its scaladoc for the mapping). */
  def Level3Cte: String =
    """WITH l3_base AS (
      |  SELECT event_id, epoch_us(ts) AS microtimestamp, user_id,
      |         CAST(user_id % 3 + 1 AS BIGINT) AS pair_id,
      |         CASE WHEN user_id % 2 = 0 THEN 'b' ELSE 's' END AS side,
      |         CASE WHEN user_id % 2 = 0 THEN value ELSE value + 80.0 END
      |           AS price,
      |         CAST(event_id % 20 + 1 AS DOUBLE) AS amount,
      |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS del_flag
      |  FROM events
      |), l3_ord AS (
      |  SELECT *, user_id * 1000 + CAST(COALESCE(SUM(del_flag) OVER (
      |      PARTITION BY user_id ORDER BY microtimestamp, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS order_id
      |  FROM l3_base
      |), l3_evt AS (
      |  SELECT *,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS event_no,
      |    LAG(amount) OVER w AS prev_amount,
      |    LEAD(microtimestamp) OVER w AS lead_ts,
      |    CASE WHEN LAG(price) OVER w IS NULL OR price <> LAG(price) OVER w
      |         THEN 1 ELSE 0 END AS price_chg
      |  FROM l3_ord
      |  WINDOW w AS (PARTITION BY order_id ORDER BY microtimestamp, event_id)
      |), l3_pg AS (
      |  SELECT *, SUM(price_chg) OVER (
      |      PARTITION BY order_id ORDER BY microtimestamp, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price_group
      |  FROM l3_evt
      |), level3 AS (
      |  SELECT microtimestamp, order_id, event_no, side, price, amount,
      |    CASE WHEN prev_amount > amount THEN prev_amount - amount END AS fill,
      |    CASE WHEN del_flag = 1 THEN microtimestamp
      |         ELSE COALESCE(lead_ts, 4102444800000000) END AS next_microtimestamp,
      |    del_flag = 1 AS is_deleted,
      |    MIN(microtimestamp) OVER (PARTITION BY order_id, price_group)
      |      AS price_microtimestamp,
      |    MIN(event_no) OVER (PARTITION BY order_id, price_group)
      |      AS price_event_no,
      |    pair_id,
      |    CAST(CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
      |      AS exchange_id, event_id
      |  FROM l3_pg
      |)""".stripMargin

  def q01PricingSummary: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(8,4)) * CAST(1.0 + l_tax AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order,
      |  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS count_discounted
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def q02RevenueByNation: String =
    """SELECT r_name, n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_orderkey) AS n_orders,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  def q03Sessionize: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN LAG(t) OVER w IS NULL
      |      OR t - LAG(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
      |), sess AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM flagged
      |), per_session AS (
      |  SELECT user_id, session_no, COUNT(*) AS n_events,
      |    MAX(t) - MIN(t) AS duration_us
      |  FROM sess GROUP BY user_id, session_no
      |)
      |SELECT user_id,
      |  COUNT(*) AS n_sessions,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events,
      |  CAST(MAX(n_events) AS BIGINT) AS max_session_events,
      |  CAST(SUM(duration_us) AS BIGINT) / 1000000.0 AS total_duration_sec
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Mirror of `CoreQueries.funnel`: the per-step min-ts chain as
    * four chained per-user aggregates. */
  def q08Funnel: String =
    """WITH e AS (
      |  SELECT user_id, event_type AS ty, epoch_us(ts) AS t FROM events
      |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')
      |), u1 AS (
      |  SELECT user_id, MIN(CASE WHEN ty = 'signup' THEN t END) AS t1
      |  FROM e GROUP BY user_id
      |), u2 AS (
      |  SELECT e.user_id, MIN(t) AS t2 FROM e
      |  JOIN u1 ON u1.user_id = e.user_id
      |  WHERE ty = 'view' AND t > t1 GROUP BY e.user_id
      |), u3 AS (
      |  SELECT e.user_id, MIN(t) AS t3 FROM e
      |  JOIN u2 ON u2.user_id = e.user_id
      |  WHERE ty = 'click' AND t > t2 GROUP BY e.user_id
      |), u4 AS (
      |  SELECT e.user_id, MIN(t) AS t4 FROM e
      |  JOIN u3 ON u3.user_id = e.user_id
      |  WHERE ty = 'purchase' AND t > t3 GROUP BY e.user_id
      |), s AS (
      |  SELECT
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM u1 WHERE t1 IS NOT NULL)
      |      AS s1,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM u2) AS s2,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM u3) AS s3,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM u4) AS s4
      |)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS step_no, 'signup' AS step,
      |    s1 AS n_users, 1.0 AS conv FROM s
      |  UNION ALL SELECT CAST(2 AS BIGINT), 'view', s2,
      |    CASE WHEN s1 = 0 THEN 0.0
      |      ELSE CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE) END FROM s
      |  UNION ALL SELECT CAST(3 AS BIGINT), 'click', s3,
      |    CASE WHEN s2 = 0 THEN 0.0
      |      ELSE CAST(s3 AS DOUBLE) / CAST(s2 AS DOUBLE) END FROM s
      |  UNION ALL SELECT CAST(4 AS BIGINT), 'purchase', s4,
      |    CASE WHEN s3 = 0 THEN 0.0
      |      ELSE CAST(s4 AS DOUBLE) / CAST(s3 AS DOUBLE) END FROM s
      |) ORDER BY step_no""".stripMargin

  /** Mirror of `CoreQueries.retention`: integer epoch-weeks, distinct
    * (user, week) activity, min-week cohorts. */
  def q09Retention: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w
      |  FROM events
      |), coh AS (
      |  SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id
      |), sz AS (
      |  SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size
      |  FROM coh GROUP BY cw
      |), act AS (
      |  SELECT coh.cw AS cohort_week, uw.w - coh.cw AS week_no,
      |    CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM uw JOIN coh ON coh.user_id = uw.user_id
      |  GROUP BY coh.cw, uw.w - coh.cw
      |)
      |SELECT cohort_week, week_no, n_active, sz.cohort_size,
      |  CAST(n_active AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE)
      |    AS retention
      |FROM act JOIN sz ON sz.cw = act.cohort_week
      |ORDER BY cohort_week, week_no""".stripMargin

  /** Mirror of `StreamingOps.eventRatesReplay`: the closed tumbling
    * windows equal the batch GROUP BY over µs-bucketed event time and
    * milli-quantized values. */
  /** Mirror of `CoreQueries.eventAnomalies`: the same cross-multiplied
    * integer 3σ test, HUGEINT where the engine uses decimal(38,0). */
  def q12Anomaly: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(ROUND(value * 1000) AS BIGINT) AS v_milli
      |  FROM events
      |), st AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_type,
      |    CAST(SUM(v_milli) AS BIGINT) AS s,
      |    SUM(CAST(v_milli AS HUGEINT) * v_milli) AS ssq
      |  FROM e GROUP BY event_type
      |)
      |SELECT e.event_id, e.event_type, e.v_milli,
      |  CAST(st.s // st.n_type AS BIGINT) AS mean_milli, st.n_type
      |FROM e JOIN st USING (event_type)
      |WHERE (CAST(st.n_type AS HUGEINT) * e.v_milli - st.s)
      |    * (CAST(st.n_type AS HUGEINT) * e.v_milli - st.s)
      |  > 9 * (CAST(st.n_type AS HUGEINT) * st.ssq
      |    - CAST(st.s AS HUGEINT) * st.s)
      |ORDER BY e.event_id""".stripMargin

  def q10EventRatesStream: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS t,
      |    CAST(ROUND(value * 1000) AS BIGINT) AS vm
      |  FROM events
      |)
      |SELECT (t // 3600000000) * 3600000000 AS win_start_us, user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(vm) AS BIGINT) AS sum_vmilli
      |FROM e GROUP BY 1, 2 ORDER BY win_start_us, user_id""".stripMargin

  def q04TopOrders: String =
    """WITH ranked AS (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice, c_custkey,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |)
      |SELECT c_mktsegment, rnk, o_orderkey, o_totalprice, c_custkey
      |FROM ranked WHERE rnk <= 5
      |ORDER BY c_mktsegment, rnk""".stripMargin

  def q05AsofEnrich: String =
    """WITH u AS (
      |  SELECT user_id AS key, epoch_us(ts) AS t, event_id,
      |         CAST(NULL AS DOUBLE) AS o_price, 1 AS is_event,
      |         event_id AS tie
      |  FROM events
      |  UNION ALL
      |  SELECT o_custkey % 1500, epoch_us(o_orderdate), CAST(NULL AS BIGINT),
      |         o_totalprice, 0, o_orderkey
      |  FROM orders
      |), enriched AS (
      |  SELECT *, LAST_VALUE(o_price IGNORE NULLS) OVER (
      |    PARTITION BY key ORDER BY t, is_event, tie
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_order_price
      |  FROM u
      |)
      |SELECT key AS user_id, t AS ts, event_id, last_order_price
      |FROM enriched WHERE is_event = 1
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** Mirror of `CoreQueries.asofEnrichOperator` (the AsOfJoin logical
    * operator): unique right key per (customer, day), ties-inclusive
    * as-of. */
  def q07AsofOperator: String =
    """WITH o AS (
      |  SELECT o_custkey % 1500 AS key, epoch_us(o_orderdate) AS t,
      |         MAX(o_totalprice) AS best_price
      |  FROM orders GROUP BY 1, 2
      |), u AS (
      |  SELECT key, t, CAST(NULL AS BIGINT) AS event_id, best_price,
      |         0 AS kind
      |  FROM o
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), event_id, CAST(NULL AS DOUBLE), 1
      |  FROM events
      |), enriched AS (
      |  SELECT *, LAST_VALUE(best_price IGNORE NULLS) OVER (
      |    PARTITION BY key ORDER BY t, kind
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS best_price_asof
      |  FROM u
      |)
      |SELECT key AS user_id, t AS ts, event_id, best_price_asof
      |FROM enriched WHERE kind = 1
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** Deduplicated L1 stream (`spread_ticks`) on top of [[QuoteCte]]. */
  private def DedupSpreadCte: String =
    """, dedup AS (
      |  SELECT *, ROW_NUMBER() OVER wsp AS rn,
      |    LAG(bid_price) OVER wsp AS pb, LAG(bid_qty) OVER wsp AS pbq,
      |    LAG(ask_price) OVER wsp AS pa, LAG(ask_qty) OVER wsp AS paq
      |  FROM quote WINDOW wsp AS (PARTITION BY pair_id ORDER BY ts)
      |), spread_ticks AS (
      |  SELECT pair_id, ts, bid_price, bid_qty, ask_price, ask_qty
      |  FROM dedup
      |  WHERE rn = 1 OR NOT (bid_price IS NOT DISTINCT FROM pb
      |    AND bid_qty IS NOT DISTINCT FROM pbq
      |    AND ask_price IS NOT DISTINCT FROM pa
      |    AND ask_qty IS NOT DISTINCT FROM paq)
      |)""".stripMargin

  def mktSpread: String = Level3Cte + QuoteCte + DedupSpreadCte +
    """
      |SELECT pair_id, ts, bid_price, bid_qty, ask_price, ask_qty
      |FROM spread_ticks
      |ORDER BY pair_id, ts""".stripMargin

  /** Snapshot instant for the order-book query: 2024-01-15 00:00:00 UTC. */
  val SnapshotMicros: Long = 1705276800000000L

  /** Analysis window for windowed queries: 2024-01-10 .. 2024-01-20 UTC. */
  val T0: Long = 1704844800000000L
  val T1: Long = 1705708800000000L

  /** Grid step of the `p_frequency` events entry point (1 hour). */
  val EventsFreqMicros: Long = 3600000000L

  /** Unpivoted validity intervals → per-(price,ts) net deltas → running
    * depth (the declarative twin of the replay kernel's L2 stream). */
  private def DepthRunCte: String =
    """, starts AS (
      |  SELECT pair_id, microtimestamp AS ts, side, price, amount AS delta
      |  FROM level3
      |), ends AS (
      |  SELECT pair_id, next_microtimestamp AS ts, side, price, -amount AS delta
      |  FROM level3 WHERE next_microtimestamp < 4102444800000000
      |), deltas AS (
      |  SELECT pair_id, side, price, ts, SUM(delta) AS delta
      |  FROM (SELECT * FROM starts UNION ALL SELECT * FROM ends) u
      |  GROUP BY pair_id, side, price, ts
      |  HAVING SUM(delta) <> 0
      |), run AS (
      |  SELECT pair_id, ts, side, price,
      |    SUM(delta) OVER (PARTITION BY pair_id, side, price ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS volume
      |  FROM deltas
      |)""".stripMargin

  /** depth.changes chain ids (mirror of MarketOps.depthChangeChains). */
  def mktDepthChains: String = Level3Cte + QuoteCte + DedupSpreadCte +
    DepthRunCte +
    """, firsts AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_id, side, ABS(delta)
      |    ORDER BY ts, side, price) AS krn
      |  FROM deltas
      |), chains AS (
      |  SELECT pair_id, side, ABS(delta) AS absd,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY pair_id
      |      ORDER BY ts, side, price) AS BIGINT) AS chain_id
      |  FROM firsts WHERE krn = 1
      |), dch AS (
      |  SELECT d.pair_id, d.ts, d.side, d.price, d.delta, c.chain_id
      |  FROM deltas d JOIN chains c ON c.pair_id = d.pair_id
      |    AND c.side = d.side AND c.absd = ABS(d.delta)
      |), uni AS (
      |  SELECT pair_id, ts, 0 AS k, side, price, delta, chain_id,
      |    CAST(NULL AS DOUBLE) AS sb, CAST(NULL AS DOUBLE) AS sa
      |  FROM dch
      |  UNION ALL
      |  SELECT pair_id, ts, 1, NULL, NULL, NULL, NULL, bid_price, ask_price
      |  FROM spread_ticks
      |), asofq AS (
      |  SELECT *, LAST_VALUE(sb IGNORE NULLS) OVER wch AS bid_price,
      |    LAST_VALUE(sa IGNORE NULLS) OVER wch AS ask_price
      |  FROM uni WINDOW wch AS (PARTITION BY pair_id ORDER BY ts, k
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT pair_id, ts, side, price, delta, chain_id, bid_price, ask_price
      |FROM asofq WHERE k = 0
      |ORDER BY pair_id, ts, side, price""".stripMargin

  def mktDepth: String = Level3Cte + DepthRunCte +
    """
      |SELECT pair_id, ts, side, price, volume FROM run
      |ORDER BY pair_id, ts, side, price""".stripMargin

  /** Depth at precision tier p2 (mirror of
    * `MarketOps.depthChangesAtPrecision(_, _, "p2")`): prices rounded
    * two digits coarser than the pair's R0 before the same
    * interval-delta / running-sum computation. The per-pair scale CASE
    * is generated from the seeded pairs dimension, exactly like the
    * Spark side's fold over `Dimensions.Pairs`. */
  def mktDepthP2: String = {
    val r0Case = "CASE pair_id " + graft.market.Dimensions.Pairs.map {
      case (pid, _, r0, _) => s"WHEN $pid THEN ROUND(price, ${r0 - 2})"
    }.mkString(" ") + " ELSE price END"
    Level3Cte +
      s""", level3p AS (
        |  SELECT * REPLACE ($r0Case AS price) FROM level3
        |), starts2 AS (
        |  SELECT pair_id, microtimestamp AS ts, side, price, amount AS delta
        |  FROM level3p
        |), ends2 AS (
        |  SELECT pair_id, next_microtimestamp AS ts, side, price,
        |         -amount AS delta
        |  FROM level3p WHERE next_microtimestamp < 4102444800000000
        |), deltas2 AS (
        |  SELECT pair_id, side, price, ts, SUM(delta) AS delta
        |  FROM (SELECT * FROM starts2 UNION ALL SELECT * FROM ends2) u
        |  GROUP BY pair_id, side, price, ts
        |  HAVING SUM(delta) <> 0
        |), run2 AS (
        |  SELECT pair_id, ts, side, price,
        |    SUM(delta) OVER (PARTITION BY pair_id, side, price ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS volume
        |  FROM deltas2
        |)
        |SELECT pair_id, ts, side, price, volume FROM run2
        |ORDER BY pair_id, ts, side, price""".stripMargin
  }

  def mktDepthApi: String = Level3Cte + DepthRunCte +
    s""", snap AS (
      |  SELECT pair_id, side, price, SUM(amount) AS volume, $T0 AS ts
      |  FROM level3 WHERE microtimestamp <= $T0 AND next_microtimestamp > $T0
      |  GROUP BY pair_id, side, price
      |), chg AS (
      |  SELECT pair_id, side, price, volume, ts FROM run
      |  WHERE ts > $T0 AND ts <= $T1
      |)
      |SELECT pair_id, ts,
      |  CASE side WHEN 'b' THEN 'bid' ELSE 'ask' END AS side, price, volume
      |FROM (SELECT * FROM snap UNION ALL SELECT * FROM chg) u
      |ORDER BY pair_id, ts, side, price""".stripMargin

  /** Per-event-timestamp quotes via the interval join (undeduplicated). */
  private def QuoteCte: String =
    """, etimes AS (SELECT DISTINCT pair_id, microtimestamp AS ts FROM level3)
      |, live AS (
      |  SELECT e.pair_id, e.ts, l.side, l.price, l.amount
      |  FROM etimes e JOIN level3 l
      |    ON l.pair_id = e.pair_id AND l.microtimestamp <= e.ts
      |   AND l.next_microtimestamp > e.ts
      |), lvl AS (
      |  SELECT pair_id, ts, side, price, SUM(amount) AS qty
      |  FROM live GROUP BY pair_id, ts, side, price
      |), bests AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_id, ts, side
      |    ORDER BY CASE WHEN side = 'b' THEN -price ELSE price END) AS rn
      |  FROM lvl
      |), quote AS (
      |  SELECT e.pair_id, e.ts,
      |    MAX(CASE WHEN b.side = 'b' THEN b.price END) AS bid_price,
      |    MAX(CASE WHEN b.side = 'b' THEN b.qty END) AS bid_qty,
      |    MAX(CASE WHEN b.side = 's' THEN b.price END) AS ask_price,
      |    MAX(CASE WHEN b.side = 's' THEN b.qty END) AS ask_qty
      |  FROM etimes e LEFT JOIN bests b
      |    ON b.pair_id = e.pair_id AND b.ts = e.ts AND b.rn = 1
      |  GROUP BY e.pair_id, e.ts
      |)""".stripMargin

  def mktEvents: String = mktEventsWith(parity = false)

  def mktEventsFreq: String =
    mktEventsWith(parity = false, freqMicros = Some(EventsFreqMicros))

  /** `parity = true` mirrors the reference exactly where the default
    * deliberately improves on it: the buy-side aggressiveness
    * denominator (best_ask for both sides, `db/get_schema.sql:435-438`)
    * and the trade-connection rule (trade-timestamp keying, closed
    * trades window, NULL event_id for unconnected events,
    * `db/get_schema.sql:313,390-404`). `freqMicros` mirrors the
    * `p_frequency` entry point: the prevailing spread comes from the
    * right-closed grid-resampled L1 stream instead of every tick. */
  def mktEventsWith(parity: Boolean,
      freqMicros: Option[Long] = None): String = {
    // per-variant prevailing-spread source, resolved to a
    // `spread_before(pair_id, ts, bb, ba)` CTE keyed by event ts
    val spreadSrc = freqMicros match {
      case None =>
        // every-tick: carry-forward over the quote stream, shifted one
        // tick ahead (strictly-before semantics)
        """, quote_cf AS (
          |  SELECT pair_id, ts,
          |    LAST_VALUE(bid_price IGNORE NULLS) OVER (PARTITION BY pair_id
          |      ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bid_cf,
          |    LAST_VALUE(ask_price IGNORE NULLS) OVER (PARTITION BY pair_id
          |      ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ask_cf
          |  FROM quote
          |), spread_before AS (
          |  SELECT pair_id, LEAD(ts) OVER (PARTITION BY pair_id ORDER BY ts) AS ts,
          |    bid_cf AS bb, ask_cf AS ba
          |  FROM quote_cf
          |)""".stripMargin
      case Some(f) =>
        // grid-resampled: last deduped tick per right-closed bucket
        // (mirror of Resampling.spreadResampled), carry-forward over
        // the grid, then per event ts the latest grid row strictly
        // before it
        DedupSpreadCte + s""", bucketed AS (
          |  SELECT *,
          |    ((ts + ${f - 1}) // $f) * $f AS bucket_ts,
          |    ROW_NUMBER() OVER (PARTITION BY pair_id,
          |      ((ts + ${f - 1}) // $f) * $f
          |      ORDER BY ts DESC) AS rnb
          |  FROM spread_ticks
          |), rs AS (
          |  SELECT pair_id, bucket_ts AS ts, bid_price AS bb0,
          |    ask_price AS ba0
          |  FROM bucketed WHERE rnb = 1
          |), rs_cf AS (
          |  SELECT pair_id, ts,
          |    LAST_VALUE(bb0 IGNORE NULLS) OVER wg AS bb,
          |    LAST_VALUE(ba0 IGNORE NULLS) OVER wg AS ba
          |  FROM rs WINDOW wg AS (PARTITION BY pair_id ORDER BY ts
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |), ev_ts AS (
          |  SELECT DISTINCT pair_id, microtimestamp AS ts FROM active
          |), spread_before AS (
          |  SELECT pair_id, ts, bb, ba FROM (
          |    SELECT e.pair_id, e.ts, r.bb, r.ba,
          |      ROW_NUMBER() OVER (PARTITION BY e.pair_id, e.ts
          |        ORDER BY r.ts DESC) AS rr
          |    FROM ev_ts e JOIN rs_cf r
          |      ON r.pair_id = e.pair_id AND r.ts < e.ts
          |  ) WHERE rr = 1
          |)""".stripMargin
    }
    // the freq variant's spread_before reads `active`, so active must
    // precede it; the every-tick variant's reads only `quote`
    val (beforeActive, afterActive) =
      if (freqMicros.isEmpty) (spreadSrc, "") else ("", spreadSrc)
    // connection dialects (mirror of EventsQuery: see its scaladoc).
    // default: keyed on each fill event's own ts, uuid names the
    // opposite event, (T0, T1] trades window. parity: keyed on the
    // TRADE's ts (= GREATEST of the sides), uuid from (trade_ts,
    // opposite ids), closed [T0, T1] window — `db/get_schema.sql:
    // 313,390-402`.
    (Level3Cte + QuoteCte + InferredMatchCte +
    (if (parity)
      s""", conn AS (
        |  SELECT pair_id, GREATEST(b_ts, s_ts) AS microtimestamp,
        |    b_oid AS order_id, b_eno AS event_no,
        |    md5(concat_ws('#', GREATEST(b_ts, s_ts), s_oid, s_eno,
        |      pair_id, CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END))
        |      AS matching_event
        |  FROM m
        |  WHERE GREATEST(b_ts, s_ts) >= $T0 AND GREATEST(b_ts, s_ts) <= $T1
        |  UNION ALL
        |  SELECT pair_id, GREATEST(b_ts, s_ts), s_oid, s_eno,
        |    md5(concat_ws('#', GREATEST(b_ts, s_ts), b_oid, b_eno,
        |      pair_id, CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END))
        |  FROM m
        |  WHERE GREATEST(b_ts, s_ts) >= $T0 AND GREATEST(b_ts, s_ts) <= $T1
        |)""".stripMargin
    else
      s""", conn AS (
        |  SELECT pair_id, b_ts AS microtimestamp, b_oid AS order_id,
        |    b_eno AS event_no,
        |    md5(concat_ws('#', s_ts, s_oid, s_eno, pair_id,
        |      CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END)) AS matching_event
        |  FROM m
        |  WHERE GREATEST(b_ts, s_ts) > $T0 AND GREATEST(b_ts, s_ts) <= $T1
        |  UNION ALL
        |  SELECT pair_id, s_ts, s_oid, s_eno,
        |    md5(concat_ws('#', b_ts, b_oid, b_eno, pair_id,
        |      CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END))
        |  FROM m
        |  WHERE GREATEST(b_ts, s_ts) > $T0 AND GREATEST(b_ts, s_ts) <= $T1
        |)""".stripMargin)) + beforeActive +
    s""", active AS (
      |  SELECT *, FALSE AS is_initial FROM level3
      |  WHERE microtimestamp > $T0 AND microtimestamp <= $T1
      |  UNION ALL
      |  SELECT *, TRUE FROM level3
      |  WHERE microtimestamp <= $T0 AND next_microtimestamp > $T0
      |)""".stripMargin + afterActive +
    s""", base AS (
      |  SELECT a.*,
      |    CASE WHEN a.is_initial THEN NULL ELSE s.bb END AS best_bid_price,
      |    CASE WHEN a.is_initial THEN NULL ELSE s.ba END AS best_ask_price
      |  FROM active a LEFT JOIN spread_before s
      |    ON s.pair_id = a.pair_id AND s.ts = a.microtimestamp
      |), flg AS (
      |  SELECT *, CASE WHEN side = 's'
      |      THEN price <= COALESCE(best_bid_price, price - 1)
      |      ELSE price >= COALESCE(best_ask_price, price + 1) END AS is_aggressor
      |  FROM base
      |), flg2 AS (
      |  SELECT *,
      |    MAX(price) OVER o <> MIN(price) OVER o AS is_price_ever_changed,
      |    BOOL_OR(NOT is_aggressor) OVER o AS is_ever_resting,
      |    BOOL_OR(is_aggressor) OVER o AS is_ever_aggressor,
      |    BOOL_OR(COALESCE(fill, 0) > 0) OVER o AS is_ever_filled,
      |    BOOL_OR(is_deleted) OVER o AS ord_is_deleted,
      |    BOOL_OR(event_no = 1 AND NOT is_deleted) OVER o AS is_created
      |  FROM flg
      |  WINDOW o AS (PARTITION BY pair_id, order_id)
      |)
      |SELECT
      |  ${if (parity)
           "CASE WHEN matching_event IS NOT NULL THEN " +
           "md5(concat_ws('#', microtimestamp, order_id, event_no, " +
           "pair_id, exchange_id)) END"
         else
           "md5(concat_ws('#', microtimestamp, order_id, event_no, " +
           "pair_id, exchange_id))"} AS event_id,
      |  order_id AS id,
      |  microtimestamp AS ts_us,
      |  price_microtimestamp AS exchange_timestamp,
      |  price,
      |  amount AS volume,
      |  CASE WHEN event_no = 1 AND NOT is_deleted THEN 'created'
      |       WHEN event_no > 1 AND NOT is_deleted THEN 'changed'
      |       ELSE 'deleted' END AS action,
      |  CASE side WHEN 'b' THEN 'bid' ELSE 'ask' END AS direction,
      |  CASE WHEN fill > 0 THEN fill ELSE 0.0 END AS fill,
      |  matching_event,
      |  CASE WHEN is_price_ever_changed THEN 'pacman'
      |       WHEN is_ever_resting AND NOT is_ever_aggressor
      |         AND NOT is_ever_filled AND ord_is_deleted THEN 'flashed-limit'
      |       WHEN is_ever_resting AND NOT is_ever_aggressor
      |         AND NOT is_ever_filled AND NOT ord_is_deleted THEN 'resting-limit'
      |       WHEN is_ever_resting AND NOT is_ever_aggressor
      |         AND is_ever_filled THEN 'resting-limit'
      |       WHEN NOT is_ever_resting AND is_ever_aggressor
      |         AND ord_is_deleted AND is_ever_filled THEN 'market'
      |       WHEN NOT is_ever_resting AND is_ever_aggressor
      |         AND ord_is_deleted AND NOT is_ever_filled THEN 'flashed-limit'
      |       WHEN (is_ever_resting OR NOT ord_is_deleted)
      |         AND is_ever_aggressor THEN 'market-limit'
      |       ELSE 'unknown' END AS type,
      |  CASE WHEN side = 's'
      |    THEN ROUND((best_ask_price - price) / best_ask_price * 10000)
      |    ELSE ROUND((price - best_bid_price) /
      |      ${if (parity) "best_ask_price" else "best_bid_price"} * 10000)
      |  END AS aggressiveness_bps,
      |  event_no,
      |  is_aggressor,
      |  is_created,
      |  is_ever_resting,
      |  is_ever_aggressor,
      |  is_ever_filled,
      |  ord_is_deleted AS is_deleted,
      |  is_price_ever_changed,
      |  best_bid_price,
      |  best_ask_price,
      |  pair_id
      |FROM flg2
      |LEFT JOIN conn USING (pair_id, microtimestamp, order_id, event_no)
      |ORDER BY ts_us, id, event_no""".stripMargin
  }

  /** Mirror of the STREAMING order-type classifier's emissions
    * (`StreamingOps.orderTypeStream` replayed over the full log): the
    * final type of every deleted order, derived declaratively — the
    * prevailing-quote as-of, the per-order flag windows, and the
    * `get.events` type state machine restricted to deleted orders
    * (deletion is terminal per order_id, so full-order windows equal
    * flags-at-deletion). */
  def mktOrderTypesStream: String = Level3Cte + QuoteCte +
    """, quote_cf AS (
      |  SELECT pair_id, ts,
      |    LAST_VALUE(bid_price IGNORE NULLS) OVER (PARTITION BY pair_id
      |      ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bid_cf,
      |    LAST_VALUE(ask_price IGNORE NULLS) OVER (PARTITION BY pair_id
      |      ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ask_cf
      |  FROM quote
      |), spread_before AS (
      |  SELECT pair_id, LEAD(ts) OVER (PARTITION BY pair_id ORDER BY ts) AS ts,
      |    bid_cf AS bb, ask_cf AS ba
      |  FROM quote_cf
      |), base AS (
      |  SELECT l.*, s.bb AS best_bid_price, s.ba AS best_ask_price
      |  FROM level3 l LEFT JOIN spread_before s
      |    ON s.pair_id = l.pair_id AND s.ts = l.microtimestamp
      |), flg AS (
      |  SELECT *, CASE WHEN side = 's'
      |      THEN price <= COALESCE(best_bid_price, price - 1)
      |      ELSE price >= COALESCE(best_ask_price, price + 1) END AS is_aggressor
      |  FROM base
      |), flg2 AS (
      |  SELECT *,
      |    MAX(price) OVER o <> MIN(price) OVER o AS is_price_ever_changed,
      |    BOOL_OR(NOT is_aggressor) OVER o AS is_ever_resting,
      |    BOOL_OR(is_aggressor) OVER o AS is_ever_aggressor,
      |    BOOL_OR(COALESCE(fill, 0) > 0) OVER o AS is_ever_filled
      |  FROM flg
      |  WINDOW o AS (PARTITION BY pair_id, order_id)
      |)
      |SELECT pair_id, order_id, microtimestamp AS deleted_ts,
      |  CASE WHEN is_price_ever_changed THEN 'pacman'
      |       WHEN is_ever_resting AND NOT is_ever_aggressor
      |         AND NOT is_ever_filled THEN 'flashed-limit'
      |       WHEN is_ever_resting AND NOT is_ever_aggressor THEN 'resting-limit'
      |       WHEN NOT is_ever_resting AND is_ever_aggressor
      |         AND is_ever_filled THEN 'market'
      |       WHEN NOT is_ever_resting AND is_ever_aggressor THEN 'flashed-limit'
      |       WHEN is_ever_resting AND is_ever_aggressor THEN 'market-limit'
      |       ELSE 'unknown' END AS order_type
      |FROM flg2 WHERE is_deleted
      |ORDER BY pair_id, order_id""".stripMargin

  /** Mirror of TradeMatching.inferredMatches up to the mutual-best
    * matches (`m`) — shared by mktTrades and the Bitstamp-tier oracles. */
  private def InferredMatchCte: String =
    """, fills AS (
      |  SELECT pair_id, microtimestamp, order_id, event_no, side, price,
      |    fill, price_microtimestamp
      |  FROM level3 WHERE fill > 0
      |), cand AS (
      |  SELECT b.pair_id,
      |    b.microtimestamp AS b_ts, b.order_id AS b_oid, b.event_no AS b_eno,
      |    b.price AS b_price, b.price_microtimestamp AS b_pts,
      |    s.microtimestamp AS s_ts, s.order_id AS s_oid, s.event_no AS s_eno,
      |    s.price AS s_price, s.price_microtimestamp AS s_pts,
      |    b.fill AS fill,
      |    ABS(b.microtimestamp - s.microtimestamp) AS dist
      |  FROM fills b JOIN fills s
      |    ON b.side = 'b' AND s.side = 's' AND b.pair_id = s.pair_id
      |   AND b.fill = s.fill
      |   AND ABS(b.microtimestamp - s.microtimestamp) <= 3600000000
      |), ranked AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY pair_id, b_oid, b_eno
      |      ORDER BY dist, s_ts, s_oid, s_eno) AS rn_b,
      |    ROW_NUMBER() OVER (PARTITION BY pair_id, s_oid, s_eno
      |      ORDER BY dist, b_ts, b_oid, b_eno) AS rn_s
      |  FROM cand
      |), m AS (
      |  SELECT *, (b_pts < s_pts OR (b_pts = s_pts AND (b_ts < s_ts
      |    OR (b_ts = s_ts AND b_oid < s_oid)))) AS maker_is_buy
      |  FROM ranked WHERE rn_b = 1 AND rn_s = 1
      |)""".stripMargin

  def mktTrades: String = Level3Cte + InferredMatchCte +
    """
      |SELECT GREATEST(b_ts, s_ts) AS ts,
      |  CASE WHEN maker_is_buy THEN b_price ELSE s_price END AS price,
      |  fill AS volume,
      |  CASE WHEN maker_is_buy THEN 'sell' ELSE 'buy' END AS direction,
      |  CASE WHEN maker_is_buy
      |    THEN md5(concat_ws('#', b_ts, b_oid, b_eno, pair_id,
      |      CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END))
      |    ELSE md5(concat_ws('#', s_ts, s_oid, s_eno, pair_id,
      |      CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END))
      |  END AS maker_event_id,
      |  CASE WHEN maker_is_buy
      |    THEN md5(concat_ws('#', s_ts, s_oid, s_eno, pair_id,
      |      CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END))
      |    ELSE md5(concat_ws('#', b_ts, b_oid, b_eno, pair_id,
      |      CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END))
      |  END AS taker_event_id,
      |  CASE WHEN maker_is_buy THEN b_oid ELSE s_oid END AS maker,
      |  CASE WHEN maker_is_buy THEN s_oid ELSE b_oid END AS taker,
      |  pair_id
      |FROM m ORDER BY ts, maker, taker""".stripMargin

  /** Aggressor/resting refs of each inferred match (taker side = 'b'
    * when maker_is_buy is false) — shared by the Bitstamp-tier oracles. */
  private def MatchRefsCte: String =
    """, refs AS (
      |  SELECT pair_id,
      |    CASE WHEN maker_is_buy THEN s_ts ELSE b_ts END AS a_ts,
      |    CASE WHEN maker_is_buy THEN s_oid ELSE b_oid END AS a_oid,
      |    CASE WHEN maker_is_buy THEN s_eno ELSE b_eno END AS a_eno,
      |    CASE WHEN maker_is_buy THEN b_ts ELSE s_ts END AS r_ts,
      |    CASE WHEN maker_is_buy THEN b_oid ELSE s_oid END AS r_oid,
      |    CASE WHEN maker_is_buy THEN b_eno ELSE s_eno END AS r_eno
      |  FROM m
      |)""".stripMargin

  def mktBstReveal: String = Level3Cte + InferredMatchCte + MatchRefsCte +
    """, ag AS (
      |  SELECT refs.*, l.price_microtimestamp AS episode_ts
      |  FROM refs JOIN level3 l ON l.microtimestamp = refs.a_ts
      |    AND l.order_id = refs.a_oid AND l.event_no = refs.a_eno
      |), props AS (
      |  SELECT pair_id, a_ts AS ts, a_oid AS oid, a_eno AS eno, episode_ts
      |  FROM ag
      |  UNION ALL
      |  SELECT pair_id, r_ts, r_oid, r_eno, episode_ts FROM ag
      |), mv AS (
      |  SELECT pair_id, ts, oid, eno, MIN(episode_ts) AS new_ts
      |  FROM props GROUP BY pair_id, ts, oid, eno
      |  HAVING ts <> MIN(episode_ts)
      |)
      |SELECT mv.pair_id AS pair_id, mv.oid AS order_id,
      |  CAST(mv.eno AS BIGINT) AS event_no, mv.ts AS old_ts, mv.new_ts,
      |  l.side, l.price, l.amount
      |FROM mv JOIN level3 l ON l.pair_id = mv.pair_id
      |  AND l.microtimestamp = mv.ts AND l.order_id = mv.oid
      |  AND l.event_no = mv.eno
      |ORDER BY 1, 2, 3, 4""".stripMargin

  def mktBstFixAggr: String = Level3Cte + InferredMatchCte + MatchRefsCte +
    """, twe AS (
      |  SELECT refs.*, l.price_microtimestamp AS episode_ts,
      |    l.price_event_no AS episode_eno
      |  FROM refs JOIN level3 l ON l.microtimestamp = refs.a_ts
      |    AND l.order_id = refs.a_oid AND l.event_no = refs.a_eno
      |), props AS (
      |  SELECT pair_id, a_oid AS oid, a_eno AS eno, episode_ts,
      |    a_oid AS episode_oid, episode_eno
      |  FROM twe
      |  UNION ALL
      |  SELECT pair_id, r_oid, r_eno, episode_ts, a_oid, episode_eno
      |  FROM twe
      |), runm AS (
      |  SELECT *, MIN(episode_ts) OVER (PARTITION BY oid ORDER BY eno DESC
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS new_ep
      |  FROM props
      |), adj AS (
      |  SELECT pair_id, episode_ts, episode_oid, episode_eno,
      |    MIN(new_ep) AS new_ts
      |  FROM runm WHERE new_ep < episode_ts
      |  GROUP BY pair_id, episode_ts, episode_oid, episode_eno
      |)
      |SELECT adj.pair_id AS pair_id, adj.episode_oid AS order_id,
      |  CAST(adj.episode_eno AS BIGINT) AS event_no,
      |  adj.episode_ts AS old_ts, adj.new_ts, l.side, l.price, l.amount
      |FROM adj JOIN level3 l ON l.pair_id = adj.pair_id
      |  AND l.microtimestamp = adj.episode_ts
      |  AND l.order_id = adj.episode_oid AND l.event_no = adj.episode_eno
      |ORDER BY 1, 2, 3, 4""".stripMargin

  def mktBstMatchSeq: String = Level3Cte + ErasCte + InferredMatchCte +
    """, mts AS (
      |  SELECT GREATEST(b_ts, s_ts) AS t_ts, fill AS t_amt,
      |    CASE WHEN maker_is_buy THEN b_price ELSE s_price END AS t_price,
      |    CASE WHEN maker_is_buy THEN 's' ELSE 'b' END AS t_side,
      |    b_ts, b_oid, b_eno, s_ts, s_oid, s_eno, pair_id
      |  FROM m
      |), used AS (
      |  SELECT b_ts AS microtimestamp, b_oid AS order_id,
      |    b_eno AS event_no
      |  FROM mts WHERE (b_oid + s_oid) % 3 <> 0
      |  UNION ALL
      |  SELECT s_ts, s_oid, s_eno FROM mts WHERE (b_oid + s_oid) % 3 <> 0
      |), ev2 AS (
      |  SELECT l.* FROM l3e l
      |  WHERE l.event_no > 1 AND NOT EXISTS (
      |    SELECT 1 FROM used u WHERE u.microtimestamp = l.microtimestamp
      |      AND u.order_id = l.order_id AND u.event_no = l.event_no)
      |), sq AS (
      |  SELECT pair_id, era_no, microtimestamp, order_id, event_no, side,
      |    amount, fill, price_microtimestamp, is_deleted, event_id,
      |    LEAD(microtimestamp) OVER w AS n_microtimestamp,
      |    LEAD(order_id) OVER w AS n_order_id,
      |    LEAD(event_no) OVER w AS n_event_no,
      |    LEAD(side) OVER w AS n_side,
      |    LEAD(amount) OVER w AS n_amount,
      |    LEAD(fill) OVER w AS n_fill,
      |    LEAD(price_microtimestamp) OVER w AS n_price_microtimestamp,
      |    LEAD(is_deleted) OVER w AS n_is_deleted
      |  FROM ev2
      |  WINDOW w AS (PARTITION BY pair_id, era_no ORDER BY microtimestamp, event_id)
      |), um AS (
      |  SELECT t_ts, t_amt, t_price, t_side,
      |    b_oid AS buy_order_id, s_oid AS sell_order_id,
      |    pair_id AS t_pair_id
      |  FROM mts WHERE (b_oid + s_oid) % 3 = 0
      |), scand AS (
      |  SELECT sq.*, um.*,
      |    CASE WHEN t_amt = fill THEN 0
      |         WHEN ABS(t_amt * t_price - fill * t_price)
      |           < CAST(0.0001 AS DOUBLE) * t_price THEN 1
      |         WHEN fill IS NULL THEN 2
      |         WHEN is_deleted AND fill = 0.0
      |           AND ABS(t_amt * t_price - amount * t_price)
      |             < CAST(0.0001 AS DOUBLE) * t_price THEN 3
      |    END AS mr,
      |    CASE WHEN t_amt = n_fill THEN 0
      |         WHEN ABS(t_amt * t_price - n_fill * t_price)
      |           < CAST(0.0001 AS DOUBLE) * t_price THEN 1
      |         WHEN n_fill IS NULL THEN 2
      |         WHEN n_is_deleted AND n_fill = 0.0
      |           AND ABS(t_amt * t_price - n_amount * t_price)
      |             < CAST(0.0001 AS DOUBLE) * t_price THEN 3
      |    END AS n_mr
      |  FROM sq JOIN um ON sq.pair_id = um.t_pair_id
      |    AND sq.side <> sq.n_side
      |    AND ((sq.order_id = um.buy_order_id
      |          AND sq.n_order_id = um.sell_order_id)
      |      OR (sq.n_order_id = um.buy_order_id
      |          AND sq.order_id = um.sell_order_id))
      |), prop AS (
      |  SELECT * FROM scand
      |  WHERE mr IS NOT NULL AND n_mr IS NOT NULL
      |    AND CASE WHEN (t_side = 'b' AND side = 'b')
      |               OR (t_side = 's' AND side = 's')
      |             THEN price_microtimestamp > n_price_microtimestamp
      |             ELSE price_microtimestamp < n_price_microtimestamp END
      |), clean AS (
      |  SELECT * FROM prop o
      |  WHERE NOT EXISTS (SELECT 1 FROM prop i
      |    WHERE o.order_id = i.n_order_id AND o.event_no = i.n_event_no)
      |), rnk AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY t_ts, buy_order_id, sell_order_id
      |    ORDER BY microtimestamp, event_id) AS rn
      |  FROM clean
      |)
      |SELECT pair_id, t_ts, t_amt, t_side, buy_order_id,
      |  CAST(CASE WHEN side = 'b' THEN event_no ELSE n_event_no END
      |    AS BIGINT) AS buy_event_no,
      |  CAST(CASE WHEN side = 'b' THEN mr ELSE n_mr END
      |    AS BIGINT) AS buy_rule,
      |  sell_order_id,
      |  CAST(CASE WHEN side = 'b' THEN n_event_no ELSE event_no END
      |    AS BIGINT) AS sell_event_no,
      |  CAST(CASE WHEN side = 'b' THEN n_mr ELSE mr END
      |    AS BIGINT) AS sell_rule
      |FROM rnk WHERE rn = 1
      |ORDER BY pair_id, t_ts, buy_order_id, sell_order_id""".stripMargin

  private def L3Cols =
    """microtimestamp, order_id, event_no, side, price, amount, fill,
      |next_microtimestamp, is_deleted, price_microtimestamp,
      |price_event_no, pair_id, exchange_id, event_id""".stripMargin

  /** qty_level3_fix_duplicate_order_events over a log corrupted with
    * duplicate eternal creations (orders ≡ 0 mod 11). */
  def mktDqFixDups: String = Level3Cte +
    s""", corrupted AS (
      |  SELECT $L3Cols FROM level3
      |  UNION ALL
      |  SELECT microtimestamp, order_id, event_no, side, price, amount,
      |    fill, 4102444800000000, FALSE, price_microtimestamp,
      |    price_event_no, pair_id, exchange_id, -event_id - 1000000000
      |  FROM level3 WHERE order_id % 11 = 0 AND event_no = 1
      |), dup_orders AS (
      |  SELECT DISTINCT order_id FROM corrupted
      |  GROUP BY order_id, event_no HAVING COUNT(*) > 1
      |)
      |SELECT pair_id, order_id, CAST(event_no AS BIGINT) AS event_no,
      |  microtimestamp, 'drop' AS action, CAST(NULL AS BIGINT) AS new_next
      |FROM corrupted
      |WHERE order_id IN (SELECT order_id FROM dup_orders)
      |  AND event_no = 1 AND next_microtimestamp = 4102444800000000
      |ORDER BY pair_id, order_id, event_no, microtimestamp""".stripMargin

  /** qty_level3_fix_eternals over a log with broken chains (orders ≡ 0
    * mod 13: second-to-last event made eternal). */
  def mktDqFixEternals: String = Level3Cte +
    s""", corrupted AS (
      |  SELECT microtimestamp, order_id, event_no, side, price, amount,
      |    fill,
      |    CASE WHEN order_id % 13 = 0 AND max_eno >= 2
      |      AND event_no = max_eno - 1 THEN 4102444800000000
      |      ELSE next_microtimestamp END AS next_microtimestamp,
      |    is_deleted, price_microtimestamp, price_event_no, pair_id,
      |    exchange_id, event_id
      |  FROM (SELECT *, MAX(event_no) OVER (PARTITION BY order_id)
      |    AS max_eno FROM level3) t
      |), orphans AS (
      |  SELECT o.order_id AS o_oid, o.event_no AS o_eno,
      |    o.microtimestamp AS o_ts
      |  FROM corrupted o
      |  WHERE o.event_no > 1 AND NOT EXISTS (
      |    SELECT 1 FROM corrupted p WHERE p.order_id = o.order_id
      |      AND p.event_no = o.event_no - 1
      |      AND p.next_microtimestamp = o.microtimestamp)
      |)
      |SELECT c.pair_id, c.order_id, CAST(c.event_no AS BIGINT) AS event_no,
      |  c.microtimestamp, 'reconnect' AS action, o_ts AS new_next
      |FROM corrupted c JOIN orphans
      |  ON c.order_id = o_oid AND c.event_no = o_eno - 1
      |WHERE c.next_microtimestamp = 4102444800000000
      |ORDER BY pair_id, order_id, event_no, microtimestamp""".stripMargin

  /** qty_level3_show_invalid_chains over a log with broken chains (the
    * mktDqFixEternals corruption): the full level3 history of every
    * order holding an orphan event — the row-listing twin of the
    * dqReport broken-chain count. */
  def mktDqInvalidChains: String = Level3Cte +
    s""", corrupted AS (
      |  SELECT microtimestamp, order_id, event_no, side, price, amount,
      |    fill,
      |    CASE WHEN order_id % 13 = 0 AND max_eno >= 2
      |      AND event_no = max_eno - 1 THEN 4102444800000000
      |      ELSE next_microtimestamp END AS next_microtimestamp,
      |    is_deleted, price_microtimestamp, price_event_no, pair_id,
      |    exchange_id, event_id
      |  FROM (SELECT *, MAX(event_no) OVER (PARTITION BY order_id)
      |    AS max_eno FROM level3) t
      |), orphans AS (
      |  SELECT DISTINCT o.order_id AS o_oid
      |  FROM corrupted o
      |  WHERE o.event_no > 1 AND NOT EXISTS (
      |    SELECT 1 FROM corrupted p WHERE p.order_id = o.order_id
      |      AND p.event_no = o.event_no - 1
      |      AND p.next_microtimestamp = o.microtimestamp)
      |)
      |SELECT microtimestamp, order_id, CAST(event_no AS BIGINT) AS event_no,
      |  side, price, amount, fill, next_microtimestamp, is_deleted,
      |  pair_id, event_id
      |FROM corrupted
      |WHERE order_id IN (SELECT o_oid FROM orphans)
      |ORDER BY order_id, event_no, microtimestamp""".stripMargin

  /** bitstamp.find_and_repair_missing_fill over a log whose anchor
    * events (greatest fill-bearing event of orders ≡ 0 mod 7) lost
    * their fills: restore the fill from the matched trade, walk the
    * amount ladder backward (window cumulative sum — the recursive
    * CTE's closed form), emit only changed rows. */
  def mktDqFixFill: String = Level3Cte +
    s""", anc AS (
      |  SELECT order_id, MAX(event_no) AS a_eno
      |  FROM level3 WHERE order_id % 7 = 0 AND fill IS NOT NULL
      |  GROUP BY order_id
      |), trades AS (
      |  SELECT l.order_id, l.event_no, l.fill AS t_fill
      |  FROM level3 l JOIN anc a ON a.order_id = l.order_id
      |    AND l.event_no = a.a_eno
      |), corrupted AS (
      |  SELECT l.microtimestamp, l.order_id, l.event_no, l.amount,
      |    CASE WHEN a.a_eno = l.event_no THEN NULL ELSE l.fill END AS fill,
      |    l.pair_id
      |  FROM level3 l LEFT JOIN anc a ON a.order_id = l.order_id
      |), fm AS (
      |  SELECT c.order_id AS a_oid, c.event_no AS a_eno,
      |    c.amount AS a_amt, t.t_fill AS a_fill,
      |    ROW_NUMBER() OVER (PARTITION BY c.order_id
      |      ORDER BY c.event_no DESC) AS rn
      |  FROM corrupted c JOIN trades t ON t.order_id = c.order_id
      |    AND t.event_no = c.event_no
      |  WHERE c.fill IS NULL AND c.event_no > 1
      |), scope AS (
      |  SELECT c.microtimestamp, c.order_id, c.event_no, c.amount,
      |    c.fill, c.pair_id, f.a_eno, f.a_amt, f.a_fill,
      |    CASE WHEN c.event_no = f.a_eno THEN f.a_fill
      |         ELSE COALESCE(c.fill, 0) END AS eff
      |  FROM corrupted c JOIN fm f ON f.a_oid = c.order_id AND f.rn = 1
      |    AND c.event_no <= f.a_eno
      |), walked AS (
      |  SELECT *, a_amt + COALESCE(SUM(eff) OVER (PARTITION BY order_id
      |      ORDER BY event_no DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS new_amount
      |  FROM scope
      |), rep AS (
      |  SELECT pair_id, order_id, CAST(event_no AS BIGINT) AS event_no,
      |    microtimestamp, new_amount,
      |    CASE WHEN event_no = a_eno THEN a_fill
      |         WHEN event_no = 1 THEN -new_amount
      |         ELSE fill END AS new_fill,
      |    amount AS old_amount, fill AS old_fill
      |  FROM walked
      |)
      |SELECT pair_id, order_id, event_no, microtimestamp,
      |  new_amount AS amount, new_fill AS fill
      |FROM rep
      |WHERE new_amount <> old_amount OR new_fill IS DISTINCT FROM old_fill
      |ORDER BY pair_id, order_id, event_no""".stripMargin

  /** qty_level3_fix_premature_deletes over a log with engine-generated
    * deletes (negative event_id) contradicted by later real events. */
  def mktDqFixPremature: String = Level3Cte +
    s""", base AS (
      |  SELECT *, MAX(event_no) OVER (PARTITION BY order_id) AS max_eno
      |  FROM level3
      |), corrupted AS (
      |  SELECT microtimestamp, order_id, event_no, side, price, amount,
      |    fill,
      |    CASE WHEN order_id % 9 = 0 AND max_eno >= 2 AND event_no = 1
      |      THEN microtimestamp + 1 ELSE next_microtimestamp END
      |      AS next_microtimestamp,
      |    is_deleted, price_microtimestamp, price_event_no, pair_id,
      |    exchange_id, event_id
      |  FROM base
      |  UNION ALL
      |  SELECT microtimestamp + 1, order_id, 1000, side, price, amount,
      |    CAST(NULL AS DOUBLE), microtimestamp + 1, TRUE,
      |    price_microtimestamp, price_event_no, pair_id, exchange_id,
      |    -event_id - 2000000000
      |  FROM base WHERE order_id % 9 = 0 AND max_eno >= 2 AND event_no = 1
      |), realr AS (
      |  SELECT * FROM corrupted WHERE event_id >= 0
      |), prem AS (
      |  SELECT d.pair_id, d.order_id, d.event_no, d.microtimestamp,
      |    MIN(r.microtimestamp) AS next_real_ts
      |  FROM corrupted d JOIN realr r ON r.order_id = d.order_id
      |    AND r.microtimestamp > d.microtimestamp
      |  WHERE d.is_deleted AND d.event_id < 0
      |  GROUP BY d.pair_id, d.order_id, d.event_no, d.microtimestamp
      |)
      |SELECT pair_id, order_id, CAST(event_no AS BIGINT) AS event_no,
      |  microtimestamp, 'drop' AS action, CAST(NULL AS BIGINT) AS new_next
      |FROM prem
      |UNION ALL
      |SELECT r.pair_id, r.order_id, CAST(r.event_no AS BIGINT),
      |  r.microtimestamp, 'reconnect', p.next_real_ts
      |FROM realr r JOIN prem p ON r.order_id = p.order_id
      |  AND r.next_microtimestamp = p.microtimestamp
      |ORDER BY pair_id, order_id, event_no, microtimestamp, action""".stripMargin

  /** level3 + era columns (gaps-and-islands, 2 h threshold). */
  private def ErasCte: String =
    """, l3g AS (
      |  SELECT *, CASE WHEN LAG(microtimestamp) OVER wp IS NULL
      |    OR microtimestamp - LAG(microtimestamp) OVER wp > 7200000000
      |    THEN 1 ELSE 0 END AS new_era
      |  FROM level3
      |  WINDOW wp AS (PARTITION BY pair_id ORDER BY microtimestamp)
      |), l3e AS (
      |  SELECT *, CAST(SUM(new_era) OVER (PARTITION BY pair_id
      |    ORDER BY microtimestamp, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS era_no
      |  FROM l3g
      |), l3ee AS (
      |  SELECT *, MIN(microtimestamp) OVER (PARTITION BY pair_id, era_no)
      |    AS era
      |  FROM l3e
      |), eras AS (
      |  SELECT pair_id, era_no, MIN(microtimestamp) AS era,
      |    MAX(microtimestamp) AS level3_ts
      |  FROM l3e GROUP BY pair_id, era_no
      |)""".stripMargin

  def mktSummary: String = Level3Cte + ErasCte + InferredMatchCte +
    """, ev AS (
      |  SELECT pair_id, era,
      |    COUNT(*) AS n_events,
      |    COUNT(DISTINCT order_id) AS n_orders,
      |    COUNT(CASE WHEN event_no = 1 AND NOT is_deleted THEN 1 END) AS n_created,
      |    COUNT(CASE WHEN is_deleted THEN 1 END) AS n_deleted,
      |    COUNT(CASE WHEN fill > 0 THEN 1 END) AS n_fills,
      |    MIN(microtimestamp) AS first_event,
      |    MAX(microtimestamp) AS last_event,
      |    CASE WHEN MAX(microtimestamp) > MIN(microtimestamp)
      |      THEN COUNT(*) / ((MAX(microtimestamp) - MIN(microtimestamp)) / 1000000.0)
      |    END AS e_per_sec
      |  FROM l3ee GROUP BY pair_id, era
      |), erax AS (
      |  SELECT pair_id, era, COALESCE(LEAD(era) OVER (PARTITION BY pair_id
      |    ORDER BY era), 9223372036854775807) AS next_era
      |  FROM eras
      |), tr AS (
      |  SELECT e.pair_id, e.era, GREATEST(m.b_ts, m.s_ts) AS ts,
      |    (m.b_oid IS NOT NULL OR m.s_oid IS NOT NULL) AS is_matched,
      |    CAST(NULL AS BIGINT) AS exchange_trade_id
      |  FROM m JOIN erax e ON m.pair_id = e.pair_id
      |    AND GREATEST(m.b_ts, m.s_ts) >= e.era
      |    AND GREATEST(m.b_ts, m.s_ts) < e.next_era
      |), trs AS (
      |  SELECT pair_id, era, MIN(ts) AS t_first, MAX(ts) AS t_last,
      |    CAST(COUNT(*) AS BIGINT) AS t_total,
      |    CAST(COUNT(CASE WHEN is_matched THEN 1 END) AS BIGINT) AS t_matched,
      |    CAST(COUNT(exchange_trade_id) AS BIGINT) AS t_exchange,
      |    CASE WHEN MAX(ts) > MIN(ts)
      |      THEN COUNT(*) / ((MAX(ts) - MIN(ts)) / 1000000.0)
      |    END AS t_per_sec
      |  FROM tr GROUP BY pair_id, era
      |)
      |SELECT ev.*, trs.t_first, trs.t_last,
      |  COALESCE(trs.t_total, 0) AS t_total,
      |  COALESCE(trs.t_matched, 0) AS t_matched,
      |  COALESCE(trs.t_exchange, 0) AS t_exchange,
      |  trs.t_per_sec
      |FROM ev LEFT JOIN trs USING (pair_id, era)
      |ORDER BY pair_id, era""".stripMargin

  def mktIntervals: String = Level3Cte + ErasCte +
    """, nxt AS (
      |  SELECT *, LEAD(era) OVER (PARTITION BY pair_id ORDER BY era)
      |    AS next_era
      |  FROM eras
      |)
      |SELECT pair_id, era AS interval_start, level3_ts AS interval_end,
      |  'G' AS kind
      |FROM nxt
      |UNION ALL
      |SELECT pair_id, level3_ts, next_era, 'R' FROM nxt
      |WHERE next_era IS NOT NULL
      |ORDER BY pair_id, interval_start, kind""".stripMargin

  def mktExport: String = Level3Cte +
    """
      |SELECT event_id AS id,
      |  microtimestamp // 1000 AS timestamp_ms,
      |  price_microtimestamp // 1000 AS exchange_timestamp_ms,
      |  price,
      |  amount AS volume,
      |  CASE WHEN event_no = 1 AND NOT is_deleted THEN 'created'
      |       WHEN event_no > 1 AND NOT is_deleted THEN 'changed'
      |       ELSE 'deleted' END AS action,
      |  CASE side WHEN 'b' THEN 'bid' ELSE 'ask' END AS direction,
      |  pair_id
      |FROM level3 ORDER BY id""".stripMargin

  def mktOrderBook: String = Level3Cte +
    s""", snap AS (
      |  SELECT * FROM level3
      |  WHERE microtimestamp <= $SnapshotMicros
      |    AND next_microtimestamp > $SnapshotMicros
      |), sided AS (
      |  SELECT pair_id, side, price, amount, order_id, microtimestamp,
      |    CASE WHEN side = 'b' THEN -price ELSE price END AS sord
      |  FROM snap
      |), agg AS (
      |  SELECT *,
      |    SUM(amount) OVER (PARTITION BY pair_id, side ORDER BY sord,
      |      microtimestamp, order_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS liquidity,
      |    CAST(DENSE_RANK() OVER (PARTITION BY pair_id, side ORDER BY sord)
      |      AS BIGINT) AS lvl,
      |    CASE WHEN side = 'b' THEN MAX(price) OVER (PARTITION BY pair_id, side)
      |         ELSE MIN(price) OVER (PARTITION BY pair_id, side) END AS best
      |  FROM sided
      |)
      |SELECT pair_id, side, price, amount, order_id, liquidity, lvl,
      |  ABS(price - best) / best * 10000.0 AS bps
      |FROM agg
      |ORDER BY pair_id, side, lvl, order_id""".stripMargin

  /** Filtered snapshot query (bps_range / min_bid / max_ask — reference
    * `get.order_book` filters, `db/get_schema.sql:596-599`). */
  def mktObFiltered: String = Level3Cte +
    s""", snap AS (
      |  SELECT * FROM level3
      |  WHERE microtimestamp <= $SnapshotMicros
      |    AND next_microtimestamp > $SnapshotMicros
      |), sided AS (
      |  SELECT pair_id, side, price, amount, order_id, microtimestamp,
      |    CASE WHEN side = 'b' THEN -price ELSE price END AS sord
      |  FROM snap
      |), agg AS (
      |  SELECT *,
      |    SUM(amount) OVER (PARTITION BY pair_id, side ORDER BY sord,
      |      microtimestamp, order_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS liquidity,
      |    CAST(DENSE_RANK() OVER (PARTITION BY pair_id, side ORDER BY sord)
      |      AS BIGINT) AS lvl,
      |    CASE WHEN side = 'b' THEN MAX(price) OVER (PARTITION BY pair_id, side)
      |         ELSE MIN(price) OVER (PARTITION BY pair_id, side) END AS best
      |  FROM sided
      |)
      |SELECT pair_id, side, price, amount, order_id, liquidity, lvl,
      |  ABS(price - best) / best * 10000.0 AS bps
      |FROM agg
      |WHERE ABS(price - best) / best * 10000.0 <= 400.0
      |  AND ((side = 'b' AND price >= 100.0)
      |    OR (side = 's' AND price <= 200.0))
      |ORDER BY pair_id, side, lvl, order_id""".stripMargin

  /** Trading period, volume = 0 mode: best bid/ask, deduped on change
    * of the (buy, sell) pair only. */
  def mktTpBest: String = Level3Cte + QuoteCte +
    """, tp AS (
      |  SELECT pair_id, ts, ask_price AS buy_vwap, bid_price AS sell_vwap
      |  FROM quote
      |), tpd AS (
      |  SELECT *, ROW_NUMBER() OVER w AS rn,
      |    LAG(buy_vwap) OVER w AS pbv, LAG(sell_vwap) OVER w AS psv
      |  FROM tp WINDOW w AS (PARTITION BY pair_id ORDER BY ts)
      |)
      |SELECT pair_id, ts, buy_vwap, sell_vwap FROM tpd
      |WHERE rn = 1 OR NOT (buy_vwap IS NOT DISTINCT FROM pbv
      |  AND sell_vwap IS NOT DISTINCT FROM psv)
      |ORDER BY pair_id, ts""".stripMargin

  /** Trading period, volume = ∞ mode: whole-book VWAP per side (exact
    * integer cents / units before one final double division). */
  def mktTpVwap: String = Level3Cte + QuoteCte +
    """, pp AS (
      |  SELECT pair_id, ts, side,
      |    SUM(CAST(qty AS BIGINT) * CAST(ROUND(price * 100) AS BIGINT))
      |      AS cost_cents,
      |    SUM(CAST(qty AS BIGINT)) AS total
      |  FROM lvl GROUP BY pair_id, ts, side
      |), tp AS (
      |  SELECT e.pair_id, e.ts,
      |    MAX(CASE WHEN p.side = 's' THEN CAST(p.cost_cents AS DOUBLE)
      |      / (CAST(100 AS DOUBLE) * p.total) END) AS buy_vwap,
      |    MAX(CASE WHEN p.side = 'b' THEN CAST(p.cost_cents AS DOUBLE)
      |      / (CAST(100 AS DOUBLE) * p.total) END) AS sell_vwap
      |  FROM etimes e LEFT JOIN pp p
      |    ON p.pair_id = e.pair_id AND p.ts = e.ts
      |  GROUP BY e.pair_id, e.ts
      |), tpd AS (
      |  SELECT *, ROW_NUMBER() OVER w AS rn,
      |    LAG(buy_vwap) OVER w AS pbv, LAG(sell_vwap) OVER w AS psv
      |  FROM tp WINDOW w AS (PARTITION BY pair_id ORDER BY ts)
      |)
      |SELECT pair_id, ts, buy_vwap, sell_vwap FROM tpd
      |WHERE rn = 1 OR NOT (buy_vwap IS NOT DISTINCT FROM pbv
      |  AND sell_vwap IS NOT DISTINCT FROM psv)
      |ORDER BY pair_id, ts""".stripMargin

  /** Intervals with the reference's p_min_duration filter (6 h). */
  def mktIntervalsMin: String = Level3Cte + ErasCte +
    """, nxt AS (
      |  SELECT *, LEAD(era) OVER (PARTITION BY pair_id ORDER BY era)
      |    AS next_era
      |  FROM eras
      |), iv AS (
      |  SELECT pair_id, era AS interval_start, level3_ts AS interval_end,
      |    'G' AS kind
      |  FROM nxt
      |  UNION ALL
      |  SELECT pair_id, level3_ts, next_era, 'R' FROM nxt
      |  WHERE next_era IS NOT NULL
      |)
      |SELECT * FROM iv
      |WHERE interval_end - interval_start >= 21600000000
      |ORDER BY pair_id, interval_start, kind""".stripMargin

  /** Valid (uncrossed, two-sided) spread ticks tagged with their era —
    * the sequential machines' input and parallel unit. */
  private def EraTicksCte: String =
    """, eras_nx AS (
      |  SELECT pair_id, era_no, era, COALESCE(LEAD(era) OVER (
      |    PARTITION BY pair_id ORDER BY era), 9223372036854775807)
      |    AS next_era
      |  FROM eras
      |), vticks AS (
      |  SELECT s.pair_id, e.era_no, s.ts, s.bid_price AS bid,
      |    s.ask_price AS ask
      |  FROM spread_ticks s JOIN eras_nx e
      |    ON e.pair_id = s.pair_id AND s.ts >= e.era AND s.ts < e.next_era
      |  WHERE s.bid_price IS NOT NULL AND s.ask_price IS NOT NULL
      |    AND s.bid_price <= s.ask_price
      |)""".stripMargin

  /** ε-drawup/drawdown machine (mirror of
    * `sequential.EpsilonDrawsOp.draws`, ε = 2.0) as a linear recursion:
    * one recursive-CTE step per tick, state = (draw start, turning
    * point), a closed draw emitted on the step that closes it, plus the
    * trailing partial draw from each era's final state. */
  def mktEpsDraws: String = (Level3Cte + QuoteCte + DedupSpreadCte +
    ErasCte + EraTicksCte +
    """, tk AS (
      |  SELECT pair_id, era_no, ts, (bid + ask) / 2.0 AS mid,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY pair_id, era_no
      |      ORDER BY ts) AS BIGINT) AS rn
      |  FROM vticks
      |), steps AS (
      |  SELECT pair_id, era_no, rn, ts AS en_t, mid AS en_p,
      |    ts AS st_t, mid AS st_p, ts AS tp_t, mid AS tp_p,
      |    CAST(NULL AS BIGINT) AS d_s_t, CAST(NULL AS DOUBLE) AS d_s_p,
      |    CAST(NULL AS BIGINT) AS d_e_t, CAST(NULL AS DOUBLE) AS d_e_p,
      |    CAST(NULL AS VARCHAR) AS d_kind
      |  FROM tk WHERE rn = 1
      |  UNION ALL
      |  SELECT t.pair_id, t.era_no, t.rn, t.ts, t.mid,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND NOT ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      AND ABS(t.mid - s.tp_p) > 2.0 THEN s.tp_t ELSE s.st_t END,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND NOT ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      AND ABS(t.mid - s.tp_p) > 2.0 THEN s.tp_p ELSE s.st_p END,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      THEN t.ts ELSE s.tp_t END,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      THEN t.mid ELSE s.tp_p END,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND NOT ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      AND ABS(t.mid - s.tp_p) > 2.0 THEN s.st_t END,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND NOT ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      AND ABS(t.mid - s.tp_p) > 2.0 THEN s.st_p END,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND NOT ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      AND ABS(t.mid - s.tp_p) > 2.0 THEN s.tp_t END,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND NOT ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      AND ABS(t.mid - s.tp_p) > 2.0 THEN s.tp_p END,
      |    CASE WHEN t.mid <> s.tp_p
      |      AND NOT ((s.tp_p >= s.st_p AND t.mid > s.tp_p)
      |        OR (s.tp_p <= s.st_p AND t.mid < s.tp_p))
      |      AND ABS(t.mid - s.tp_p) > 2.0
      |      THEN CASE WHEN s.tp_p >= s.st_p THEN 'up' ELSE 'down' END END
      |  FROM steps s JOIN tk t ON t.pair_id = s.pair_id
      |    AND t.era_no = s.era_no AND t.rn = s.rn + 1
      |), last_state AS (
      |  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY pair_id, era_no ORDER BY rn DESC) AS lrn FROM steps)
      |  WHERE lrn = 1
      |)
      |SELECT pair_id, d_s_t AS start_ts, d_s_p AS start_price,
      |  d_e_t AS end_ts, d_e_p AS end_price, d_kind AS kind
      |FROM steps WHERE d_kind IS NOT NULL
      |UNION ALL
      |SELECT pair_id, st_t, st_p, en_t, en_p,
      |  CASE WHEN en_p >= st_p THEN 'up' ELSE 'down' END
      |FROM last_state WHERE en_t > st_t
      |ORDER BY pair_id, start_ts, end_ts""".stripMargin)
    .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Optimal-strategy machine (mirror of
    * `sequential.TradingStrategyOp.positions`, φ = 0.5, ρ = 1e-6) as a
    * linear recursion: state = the four candidate prices (sl, el, ss,
    * es), one step per valid tick, a closed position emitted on its
    * closing step plus the trailing open position per era. Return
    * columns are rounded to 8 decimals on both sides (ln/exp may differ
    * across libm implementations in the last ulp). */
  /** The strategy recursion's CTE chain through `posr` (positions +
    * log returns) — shared by [[mktStrategy]] and the position-trellis
    * mirror [[mktPlotTrellis]]. Callers prepend Level3Cte + QuoteCte +
    * DedupSpreadCte + ErasCte + EraTicksCte and must apply the
    * WITH RECURSIVE rewrite. */
  private def strategyPosCtes: String = {
    def i(t1: String, t2: String) = s"1e-6 * ABS(($t1 - $t2) / 1e6)"
    val A = "(s.el_p = 0 AND s.es_p = 0)"
    val B = "(s.el_p <> 0)"
    val condA1 = s"t.bid - s.sl_p > ${i("t.ts", "s.sl_t")} + 1.0"
    val condA2 = s"s.ss_p - t.ask > ${i("s.ss_t", "t.ts")} + 1.0"
    val slA3 = s"t.ask - s.sl_p < ${i("t.ts", "s.sl_t")}"
    val ssA3 = s"s.ss_p - t.bid < ${i("s.ss_t", "t.ts")}"
    val ss1p = s"(CASE WHEN $ssA3 THEN t.bid ELSE s.ss_p END)"
    val ss1t = s"(CASE WHEN $ssA3 THEN t.ts ELSE s.ss_t END)"
    val condB1 = s"t.bid - s.el_p > ${i("t.ts", "s.el_t")}"
    val condB2 = s"$ss1p - t.ask > 1e-6 * ABS(($ss1t - t.ts) / 1e6) + 1.0"
    val condB3 = s"${i("t.ts", "s.el_t")} > 1.0 - (s.el_p - t.ask)"
    val sl1p = s"(CASE WHEN $slA3 THEN t.ask ELSE s.sl_p END)"
    val sl1t = s"(CASE WHEN $slA3 THEN t.ts ELSE s.sl_t END)"
    val condC1 = s"s.es_p - t.ask > ${i("t.ts", "s.es_t")}"
    val condC2 = s"t.bid - $sl1p > 1e-6 * ABS(($sl1t - t.ts) / 1e6) + 1.0"
    val condC3 = s"${i("t.ts", "s.es_t")} > 1.0 - (t.bid - s.es_p)"
    val slP =
      s"""CASE WHEN $A THEN CASE WHEN $condA1 THEN s.sl_p
         |       WHEN $condA2 THEN t.ask
         |       WHEN $slA3 THEN t.ask ELSE s.sl_p END
         |     WHEN $B THEN CASE WHEN $condB1 THEN s.sl_p
         |       WHEN $condB2 THEN t.ask WHEN $condB3 THEN t.ask
         |       ELSE s.sl_p END
         |     ELSE CASE WHEN $condC1 THEN t.ask ELSE $sl1p END END""".stripMargin
    val slT =
      s"""CASE WHEN $A THEN CASE WHEN $condA1 THEN s.sl_t
         |       WHEN $condA2 THEN t.ts
         |       WHEN $slA3 THEN t.ts ELSE s.sl_t END
         |     WHEN $B THEN CASE WHEN $condB1 THEN s.sl_t
         |       WHEN $condB2 THEN t.ts WHEN $condB3 THEN t.ts
         |       ELSE s.sl_t END
         |     ELSE CASE WHEN $condC1 THEN t.ts ELSE $sl1t END END""".stripMargin
    val elP =
      s"""CASE WHEN $A THEN CASE WHEN $condA1 THEN t.bid ELSE s.el_p END
         |     WHEN $B THEN CASE WHEN $condB1 THEN t.bid
         |       WHEN $condB2 THEN CAST(0 AS DOUBLE)
         |       WHEN $condB3 THEN CAST(0 AS DOUBLE) ELSE s.el_p END
         |     ELSE CASE WHEN $condC1 THEN s.el_p
         |       WHEN $condC2 THEN t.bid ELSE s.el_p END END""".stripMargin
    val elT =
      s"""CASE WHEN $A THEN CASE WHEN $condA1 THEN t.ts ELSE s.el_t END
         |     WHEN $B THEN CASE WHEN $condB1 THEN t.ts
         |       WHEN $condB2 THEN CAST(0 AS BIGINT)
         |       WHEN $condB3 THEN CAST(0 AS BIGINT) ELSE s.el_t END
         |     ELSE CASE WHEN $condC1 THEN s.el_t
         |       WHEN $condC2 THEN t.ts ELSE s.el_t END END""".stripMargin
    val ssP =
      s"""CASE WHEN $A THEN CASE WHEN $condA1 THEN t.bid
         |       WHEN $condA2 THEN s.ss_p
         |       WHEN $ssA3 THEN t.bid ELSE s.ss_p END
         |     WHEN $B THEN CASE WHEN $condB1 THEN t.bid ELSE $ss1p END
         |     ELSE CASE WHEN $condC1 THEN s.ss_p
         |       WHEN $condC2 THEN t.bid WHEN $condC3 THEN t.bid
         |       ELSE s.ss_p END END""".stripMargin
    val ssT =
      s"""CASE WHEN $A THEN CASE WHEN $condA1 THEN t.ts
         |       WHEN $condA2 THEN s.ss_t
         |       WHEN $ssA3 THEN t.ts ELSE s.ss_t END
         |     WHEN $B THEN CASE WHEN $condB1 THEN t.ts ELSE $ss1t END
         |     ELSE CASE WHEN $condC1 THEN s.ss_t
         |       WHEN $condC2 THEN t.ts WHEN $condC3 THEN t.ts
         |       ELSE s.ss_t END END""".stripMargin
    val esP =
      s"""CASE WHEN $A THEN CASE WHEN $condA1 THEN s.es_p
         |       WHEN $condA2 THEN t.ask ELSE s.es_p END
         |     WHEN $B THEN CASE WHEN $condB1 THEN s.es_p
         |       WHEN $condB2 THEN t.ask ELSE s.es_p END
         |     ELSE CASE WHEN $condC1 THEN t.ask
         |       WHEN $condC2 THEN CAST(0 AS DOUBLE)
         |       WHEN $condC3 THEN CAST(0 AS DOUBLE) ELSE s.es_p END END""".stripMargin
    val esT =
      s"""CASE WHEN $A THEN CASE WHEN $condA1 THEN s.es_t
         |       WHEN $condA2 THEN t.ts ELSE s.es_t END
         |     WHEN $B THEN CASE WHEN $condB1 THEN s.es_t
         |       WHEN $condB2 THEN t.ts ELSE s.es_t END
         |     ELSE CASE WHEN $condC1 THEN t.ts
         |       WHEN $condC2 THEN CAST(0 AS BIGINT)
         |       WHEN $condC3 THEN CAST(0 AS BIGINT) ELSE s.es_t END END""".stripMargin
    val emitLong = s"$B AND NOT ($condB1) AND (($condB2) OR ($condB3))"
    val emitShort =
      s"NOT $A AND NOT $B AND NOT ($condC1) AND (($condC2) OR ($condC3))"
    s""", tk AS (
        |  SELECT pair_id, era_no, ts, bid, ask,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY pair_id, era_no
        |      ORDER BY ts) AS BIGINT) AS rn
        |  FROM vticks
        |), steps AS (
        |  SELECT pair_id, era_no, rn,
        |    ask AS sl_p, ts AS sl_t,
        |    CAST(0 AS DOUBLE) AS el_p, CAST(0 AS BIGINT) AS el_t,
        |    bid AS ss_p, ts AS ss_t,
        |    CAST(0 AS DOUBLE) AS es_p, CAST(0 AS BIGINT) AS es_t,
        |    CAST(NULL AS VARCHAR) AS e_side, CAST(NULL AS BIGINT) AS e_ot,
        |    CAST(NULL AS DOUBLE) AS e_op, CAST(NULL AS BIGINT) AS e_ct,
        |    CAST(NULL AS DOUBLE) AS e_cp
        |  FROM tk WHERE rn = 1
        |  UNION ALL
        |  SELECT t.pair_id, t.era_no, t.rn,
        |    $slP, $slT, $elP, $elT, $ssP, $ssT, $esP, $esT,
        |    CASE WHEN $emitLong THEN 'long'
        |         WHEN $emitShort THEN 'short' END,
        |    CASE WHEN $emitLong THEN s.sl_t WHEN $emitShort THEN s.ss_t END,
        |    CASE WHEN $emitLong THEN s.sl_p WHEN $emitShort THEN s.ss_p END,
        |    CASE WHEN $emitLong THEN s.el_t WHEN $emitShort THEN s.es_t END,
        |    CASE WHEN $emitLong THEN s.el_p WHEN $emitShort THEN s.es_p END
        |  FROM steps s JOIN tk t ON t.pair_id = s.pair_id
        |    AND t.era_no = s.era_no AND t.rn = s.rn + 1
        |), last_state AS (
        |  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY pair_id, era_no ORDER BY rn DESC) AS lrn FROM steps)
        |  WHERE lrn = 1
        |), pos AS (
        |  SELECT pair_id, e_side AS side, e_ot AS opened_at,
        |    e_op AS open_price, e_ct AS closed_at, e_cp AS close_price
        |  FROM steps WHERE e_side IS NOT NULL
        |  UNION ALL
        |  SELECT pair_id, 'long', sl_t, sl_p, el_t, el_p
        |  FROM last_state WHERE el_p <> 0
        |  UNION ALL
        |  SELECT pair_id, 'short', ss_t, ss_p, es_t, es_p
        |  FROM last_state WHERE el_p = 0 AND es_p <> 0
        |), posr AS (
        |  SELECT *, CASE WHEN open_price > close_price
        |    THEN LN(open_price) - LN(close_price)
        |    ELSE LN(close_price) - LN(open_price) END AS lr
        |  FROM pos
        |)""".stripMargin
  }

  def mktStrategy: String =
    (Level3Cte + QuoteCte + DedupSpreadCte + ErasCte + EraTicksCte +
      strategyPosCtes +
      """
        |SELECT pair_id, side, opened_at, open_price, closed_at, close_price,
        |  ROUND(CASE WHEN open_price > close_price
        |      THEN (EXP(-lr) - 1) * -10000
        |      WHEN open_price < close_price THEN (EXP(lr) - 1) * 10000 END, 8)
        |    AS bps_return,
        |  ROUND(EXP(lr / ((closed_at - opened_at) / 1e6)) - 1, 8) AS rate,
        |  ROUND(lr, 8) AS log_return
        |FROM posr
        |ORDER BY pair_id, opened_at, closed_at""".stripMargin)
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Daily grid instants over [T0, T1]. */
  def GridInstants: Seq[Long] = (0 to 10).map(k => T0 + k * 86400000000L)

  private def GridSnapCte: String =
    s""", grid AS (
      |  SELECT range AS g FROM range($T0, ${T1 + 1}, 86400000000)
      |), snap2 AS (
      |  SELECT l.*, g.g FROM level3 l JOIN grid g
      |    ON l.microtimestamp <= g.g AND l.next_microtimestamp > g.g
      |), wb AS (
      |  SELECT *, CASE WHEN side = 'b'
      |    THEN MAX(price) OVER (PARTITION BY pair_id, g, side)
      |    ELSE MIN(price) OVER (PARTITION BY pair_id, g, side) END AS best
      |  FROM snap2
      |), wbo AS (
      |  SELECT *,
      |    MAX(CASE WHEN side = 'b' THEN price END)
      |      OVER (PARTITION BY pair_id, g) AS best_bid,
      |    MIN(CASE WHEN side = 's' THEN price END)
      |      OVER (PARTITION BY pair_id, g) AS best_ask
      |  FROM snap2
      |)""".stripMargin

  def mktLevel3: String = Level3Cte +
    """
      |SELECT microtimestamp, order_id, event_no, side, price, amount, fill,
      |  next_microtimestamp, is_deleted, price_microtimestamp,
      |  price_event_no, pair_id, exchange_id, event_id
      |FROM level3 ORDER BY event_id""".stripMargin

  /** The trading-period VWAP walk's CTE chain through the deduped
    * tick view `vtp` — shared by [[mktTradingPeriod]] and the
    * position-trellis mirror. Callers prepend Level3Cte + QuoteCte. */
  private val tradingPeriodCtes: String =
    """, walk AS (
      |  SELECT pair_id, ts, side, price, qty,
      |    SUM(qty) OVER (PARTITION BY pair_id, ts, side
      |      ORDER BY CASE WHEN side = 'b' THEN -price ELSE price END
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM lvl
      |), pp AS (
      |  SELECT pair_id, ts, side,
      |    SUM(CASE WHEN cum - qty < 50
      |      THEN LEAST(qty, 50 - (cum - qty)) * CAST(ROUND(price * 100) AS BIGINT)
      |      END) AS cost_cents,
      |    MAX(cum) AS total
      |  FROM walk GROUP BY pair_id, ts, side
      |), tp AS (
      |  SELECT e.pair_id, e.ts,
      |    MAX(CASE WHEN p.side = 's' AND p.total >= 50 THEN p.cost_cents END)
      |      / 5000.0 AS buy_vwap,
      |    MAX(CASE WHEN p.side = 'b' AND p.total >= 50 THEN p.cost_cents END)
      |      / 5000.0 AS sell_vwap
      |  FROM etimes e LEFT JOIN pp p
      |    ON p.pair_id = e.pair_id AND p.ts = e.ts
      |  GROUP BY e.pair_id, e.ts
      |), tpd AS (
      |  SELECT *, ROW_NUMBER() OVER wtp AS trn,
      |    LAG(buy_vwap) OVER wtp AS pbv, LAG(sell_vwap) OVER wtp AS psv
      |  FROM tp WINDOW wtp AS (PARTITION BY pair_id ORDER BY ts)
      |), vtp AS (
      |  SELECT pair_id, ts, buy_vwap, sell_vwap FROM tpd
      |  WHERE trn = 1 OR NOT (buy_vwap IS NOT DISTINCT FROM pbv
      |    AND sell_vwap IS NOT DISTINCT FROM psv)
      |)""".stripMargin

  def mktTradingPeriod: String = Level3Cte + QuoteCte + tradingPeriodCtes +
    """
      |SELECT pair_id, ts, buy_vwap, sell_vwap FROM vtp
      |ORDER BY pair_id, ts""".stripMargin

  /** Mirror of `Analytics.dataAvailabilityGrid` (the
    * plotDataAvailability data frame): intervals + dimension names +
    * the facet's dense-rank row + the per-(exchange, pair) label
    * anchor. */
  def mktPlotAvail: String = Level3Cte + ErasCte +
    s""", nxt AS (
      |  SELECT *, LEAD(era) OVER (PARTITION BY pair_id ORDER BY era)
      |    AS next_era
      |  FROM eras
      |), ivals AS (
      |  SELECT pair_id, era AS interval_start, level3_ts AS interval_end,
      |    'G' AS kind
      |  FROM nxt
      |  UNION ALL
      |  SELECT pair_id, level3_ts, next_era, 'R' FROM nxt
      |  WHERE next_era IS NOT NULL
      |), exch AS (
      |  SELECT * FROM (VALUES (1, 'bitfinex'), (2, 'bitstamp'),
      |    (3, 'coinbase'), (4, 'moex')) AS t(exchange_id, exchange)
      |), prs AS (
      |  SELECT * FROM (VALUES (1, 'BTCUSD'), (2, 'LTCUSD'), (3, 'ETHUSD'),
      |    (4, 'XRPUSD'), (5, 'BCHUSD'), (6, 'BTCEUR'), (7, 'ETHBTC'),
      |    (8, 'SBERRUB'), (9, 'VTBRRUB'), (10, 'LKOHRUB'),
      |    (11, 'GAZPRUB')) AS t(pair_id, pair)
      |), named AS (
      |  SELECT e.exchange, p.pair, i.interval_start, i.interval_end, i.kind
      |  FROM ivals i
      |  JOIN exch e ON e.exchange_id =
      |    (CASE WHEN i.pair_id % 2 = 0 THEN 2 ELSE 1 END)
      |  JOIN prs p ON p.pair_id = i.pair_id
      |)
      |SELECT exchange, pair,
      |  CAST(DENSE_RANK() OVER (PARTITION BY exchange ORDER BY pair DESC)
      |    AS BIGINT) AS y,
      |  interval_start, interval_end, kind,
      |  MIN(interval_start) OVER (PARTITION BY exchange, pair) AS label_ts
      |FROM named
      |ORDER BY exchange, pair, interval_start, kind""".stripMargin

  /** Mirror of `Analytics.positionTrellis` over the strategy's
    * positions and the trading-period ticks: positions numbered per
    * pair in open order, band-joined with the deduped non-null ticks
    * inside [opened − 60 s, closed + 60 s], log-relative price rounded
    * to 8 decimals (the mktStrategy discipline). */
  def mktPlotTrellis: String =
    (Level3Cte + QuoteCte + DedupSpreadCte + ErasCte + EraTicksCte +
      strategyPosCtes + tradingPeriodCtes +
      """, posn AS (
        |  SELECT pair_id, opened_at, open_price, closed_at, close_price,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY pair_id
        |      ORDER BY opened_at, closed_at) AS BIGINT) AS rn
        |  FROM pos
        |)
        |SELECT p.pair_id, p.rn, p.opened_at, p.closed_at,
        |  p.open_price, p.close_price, t.ts,
        |  ROUND(LN((t.buy_vwap + t.sell_vwap) / 2.0) - LN(p.open_price), 8)
        |    AS price
        |FROM vtp t JOIN posn p ON t.pair_id = p.pair_id
        |  AND t.ts >= p.opened_at - 60000000
        |  AND t.ts <= p.closed_at + 60000000
        |WHERE t.buy_vwap IS NOT NULL AND t.sell_vwap IS NOT NULL
        |ORDER BY p.pair_id, p.rn, t.ts""".stripMargin)
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Moving depth summary at 6 h frequency (mirror of
    * GridOps.depthSummaryAtFreq). */
  def mktDepthSummaryFreq: String = Level3Cte +
    """, chosen AS (
      |  SELECT pair_id AS g_pair,
      |    ((ets + 21599999999) // 21600000000) * 21600000000 AS g,
      |    MAX(ets) AS sample_ts
      |  FROM (SELECT DISTINCT pair_id, microtimestamp AS ets FROM level3) e
      |  GROUP BY g_pair, ((ets + 21599999999) // 21600000000) * 21600000000
      |), snapf AS (
      |  SELECT l.*, c.g, c.sample_ts FROM level3 l JOIN chosen c
      |    ON l.pair_id = c.g_pair AND l.microtimestamp <= c.sample_ts
      |   AND l.next_microtimestamp > c.sample_ts
      |), wbf AS (
      |  SELECT *, CASE WHEN side = 'b'
      |    THEN MAX(price) OVER (PARTITION BY pair_id, g, side)
      |    ELSE MIN(price) OVER (PARTITION BY pair_id, g, side) END AS best
      |  FROM snapf
      |), bkf AS (
      |  SELECT *, CAST(CEIL(ABS(price - best) / best * 10000 / 25) AS BIGINT)
      |    * 25 AS bps_level
      |  FROM wbf
      |)
      |SELECT pair_id, g AS ts, side, bps_level, SUM(amount) AS volume,
      |  CASE WHEN side = 'b' THEN best * (1.0 - bps_level / 10000.0)
      |       ELSE best * (1.0 + bps_level / 10000.0) END AS bps_price
      |FROM bkf WHERE bps_level <= 500
      |GROUP BY pair_id, g, side, bps_level, best
      |ORDER BY pair_id, ts, side, bps_level""".stripMargin

  def mktDepthSummary: String = Level3Cte + GridSnapCte +
    """, bk AS (
      |  SELECT *, CAST(CEIL(ABS(price - best) / best * 10000 / 25) AS BIGINT) * 25
      |    AS bps_level
      |  FROM wb
      |)
      |SELECT pair_id, g AS ts, side, bps_level, SUM(amount) AS volume,
      |  CASE WHEN side = 'b' THEN best * (1.0 - bps_level / 10000.0)
      |       ELSE best * (1.0 + bps_level / 10000.0) END AS bps_price
      |FROM bk WHERE bps_level <= 500
      |GROUP BY pair_id, g, side, bps_level, best
      |ORDER BY pair_id, ts, side, bps_level""".stripMargin

  /** Opposite-anchored tick assignment (see GridOps.bucketed): bids
    * bucket by ceil((AlignUp(best_ask) − p) / t), asks by
    * ceil((p − AlignDown(best_bid)) / t). */
  private def OppTickCte: String =
    """, tk AS (
      |  SELECT *, CASE WHEN side = 'b' THEN
      |      CASE WHEN best_ask IS NOT NULL THEN
      |        CAST(CEIL((CEIL(best_ask / 5.0) * 5.0 - price) / 5.0) AS BIGINT)
      |      END
      |    ELSE
      |      CASE WHEN best_bid IS NOT NULL THEN
      |        CAST(CEIL((price - FLOOR(best_bid / 5.0) * 5.0) / 5.0) AS BIGINT)
      |      END
      |    END AS tick
      |  FROM wbo
      |)""".stripMargin

  def mktQueues: String = Level3Cte + GridSnapCte + OppTickCte +
    """
      |SELECT pair_id, g AS ts, side, tick, SUM(amount) AS volume
      |FROM tk WHERE tick >= 1 AND tick < 11
      |GROUP BY pair_id, g, side, tick
      |ORDER BY pair_id, ts, side, tick""".stripMargin

  def mktQueuesWide: String = Level3Cte + GridSnapCte + OppTickCte + {
    val cols = (for (side <- Seq("b", "s"); k <- 1 to 10) yield {
      val nm = s"${if (side == "b") "bid" else "ask"}_q$k"
      s"COALESCE(SUM(CASE WHEN side = '$side' AND tick = $k THEN amount END), CAST(0 AS DOUBLE)) AS $nm"
    }).mkString(",\n  ")
    s"""
      |SELECT pair_id, g AS ts,
      |  FLOOR(MAX(CASE WHEN side = 'b' THEN price END) / 5.0) * 5.0
      |    AS bid_price,
      |  CEIL(MIN(CASE WHEN side = 's' THEN price END) / 5.0) * 5.0
      |    AS ask_price,
      |  $cols
      |FROM tk WHERE tick IS NOT NULL
      |GROUP BY pair_id, g
      |ORDER BY pair_id, ts""".stripMargin
  }

  def mktResample: String = Level3Cte + GridSnapCte +
    """
      |SELECT pair_id, g AS ts, side,
      |  CAST(FLOOR(price / 5.0) AS BIGINT) * 5.0 AS price_bucket,
      |  SUM(amount) AS volume
      |FROM snap2
      |GROUP BY pair_id, g, side, price_bucket
      |ORDER BY pair_id, ts, side, price_bucket""".stripMargin

  def mktCrossed: String = Level3Cte + QuoteCte + DedupSpreadCte +
    """, flg AS (
      |  SELECT pair_id, ts, CASE WHEN bid_price IS NOT NULL
      |    AND ask_price IS NOT NULL AND bid_price >= ask_price
      |    THEN 1 ELSE 0 END AS c
      |  FROM spread_ticks
      |), chgd AS (
      |  SELECT *, CASE WHEN LAG(c) OVER w IS NULL OR c <> LAG(c) OVER w
      |    THEN 1 ELSE 0 END AS chg
      |  FROM flg WINDOW w AS (PARTITION BY pair_id ORDER BY ts)
      |), grpd AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY pair_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM chgd
      |)
      |SELECT pair_id, MIN(ts) AS period_start, MAX(ts) AS period_end,
      |  COUNT(*) AS n_ticks
      |FROM grpd WHERE c = 1 GROUP BY pair_id, grp
      |ORDER BY pair_id, period_start""".stripMargin

  /** merge_crossed_books (mirror of GridOps.mergeCrossedBooks): full
    * merged level3 after collapsing each crossed run into one episode
    * at its next uncrossed tick. */
  def mktMergeCrossed: String = Level3Cte + QuoteCte + DedupSpreadCte +
    """, flg AS (
      |  SELECT pair_id, ts, CASE WHEN bid_price IS NOT NULL
      |    AND ask_price IS NOT NULL AND bid_price >= ask_price
      |    THEN 1 ELSE 0 END AS c
      |  FROM spread_ticks
      |), chgd AS (
      |  SELECT *, CASE WHEN LAG(c) OVER wmc IS NULL OR c <> LAG(c) OVER wmc
      |    THEN 1 ELSE 0 END AS chg
      |  FROM flg WINDOW wmc AS (PARTITION BY pair_id ORDER BY ts)
      |), grpd AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY pair_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM chgd
      |), periods AS (
      |  SELECT pair_id AS w_pair, MIN(ts) AS period_start,
      |    MAX(ts) AS period_end
      |  FROM grpd WHERE c = 1 GROUP BY pair_id, grp
      |), wnd AS (
      |  SELECT p.w_pair, p.period_start, MIN(t.ts) AS w_end
      |  FROM periods p JOIN spread_ticks t
      |    ON t.pair_id = p.w_pair AND t.ts > p.period_end
      |  GROUP BY p.w_pair, p.period_start, p.period_end
      |), tagged AS (
      |  SELECT l.*, w.period_start, w.w_end
      |  FROM level3 l LEFT JOIN wnd w
      |    ON l.pair_id = w.w_pair AND l.microtimestamp >= w.period_start
      |    AND l.microtimestamp < w.w_end
      |), merged AS (
      |  SELECT *,
      |    MIN(CASE WHEN is_deleted THEN microtimestamp END) OVER (
      |      PARTITION BY pair_id, order_id, period_start
      |      ORDER BY microtimestamp DESC
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS next_death,
      |    MAX(microtimestamp) OVER (
      |      PARTITION BY pair_id, order_id, period_start) AS last_seen
      |  FROM tagged WHERE w_end IS NOT NULL
      |), mg2 AS (
      |  SELECT *,
      |    CASE WHEN next_death IS NOT NULL AND next_death < w_end
      |      AND next_death < last_seen THEN next_death ELSE w_end END
      |      AS new_micro
      |  FROM merged
      |)
      |SELECT microtimestamp, order_id, CAST(event_no AS BIGINT) AS event_no,
      |  side, price, amount, fill, next_microtimestamp, is_deleted,
      |  CAST(pair_id AS BIGINT) AS pair_id, event_id
      |FROM tagged WHERE w_end IS NULL
      |UNION ALL
      |SELECT new_micro, order_id, CAST(event_no AS BIGINT), side, price,
      |  amount, fill,
      |  CASE WHEN is_deleted THEN new_micro
      |       WHEN next_death IS NOT NULL
      |         AND next_microtimestamp <= next_death
      |         AND next_microtimestamp <> 4102444800000000
      |         AND next_death < last_seen THEN next_death
      |       WHEN next_microtimestamp < w_end THEN w_end
      |       ELSE next_microtimestamp END,
      |  is_deleted, CAST(pair_id AS BIGINT), event_id
      |FROM mg2
      |ORDER BY microtimestamp, order_id, event_no, event_id""".stripMargin

  def mktDq: String = Level3Cte +
    """, dq_base AS (
      |  SELECT pair_id, COUNT(*) AS n_events,
      |    COUNT(CASE WHEN amount < 0 THEN 1 END) AS n_negative_amount,
      |    COUNT(CASE WHEN fill < 0 THEN 1 END) AS n_negative_fill,
      |    COUNT(CASE WHEN next_microtimestamp < microtimestamp THEN 1 END)
      |      AS n_time_travel
      |  FROM level3 GROUP BY pair_id
      |), dq_chains AS (
      |  SELECT pair_id, CAST(SUM(bad) AS BIGINT) AS n_broken_chains,
      |    COUNT(*) AS n_orders
      |  FROM (SELECT pair_id, order_id,
      |          CASE WHEN MAX(event_no) <> COUNT(*) THEN 1 ELSE 0 END AS bad
      |        FROM level3 GROUP BY pair_id, order_id) t
      |  GROUP BY pair_id
      |)
      |SELECT b.pair_id AS pair_id, n_events, n_negative_amount,
      |  n_negative_fill, n_time_travel, n_broken_chains, n_orders
      |FROM dq_base b JOIN dq_chains c ON b.pair_id = c.pair_id
      |ORDER BY b.pair_id""".stripMargin

  /** Shared CTEs for the text-pipeline oracles. */
  private def DocShinglesCte: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(words)-1),
      |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
      |  FROM w
      |)""".stripMargin

  def pipeDedupExact: String =
    """SELECT doc_id, md5(text) AS content_hash,
      |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
      |  COUNT(*) OVER (PARTITION BY md5(text)) AS group_size,
      |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirror of `TextPipeline.exactDedupNormalized`: the identical
    * strip → collapse → trim → lower normalization (ASCII-only before
    * the case fold, so both engines' `lower` agree), then the
    * [[pipeDedupExact]] window over the normalized hash. */
  def pipeDedupNormalized: String =
    """WITH nh AS (
      |  SELECT doc_id, md5(lower(trim(regexp_replace(
      |    regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g'),
      |    ' +', ' ', 'g')))) AS norm_hash
      |  FROM documents
      |)
      |SELECT doc_id, norm_hash,
      |  MIN(doc_id) OVER (PARTITION BY norm_hash) AS keep_id,
      |  COUNT(*) OVER (PARTITION BY norm_hash) AS group_size,
      |  doc_id <> MIN(doc_id) OVER (PARTITION BY norm_hash) AS is_dup
      |FROM nh ORDER BY doc_id""".stripMargin

  /** Mirror of `TrainingData.stratifiedSample` (rate 1/5): the
    * bucket-offset rank inside a stratum equals the plain window rank
    * by (skey, doc_id) — bucket = key prefix, same argument as
    * [[pipeShuffle]] — so the mirror IS the simple window. */
  def pipeStratifiedSample: String =
    """WITH keyed AS (
      |  SELECT doc_id, lang, source, md5('strat#' || text) AS skey
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, lang, source,
      |    CAST(COUNT(*) OVER (PARTITION BY lang, source) AS BIGINT)
      |      AS stratum_n,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
      |      ORDER BY skey, doc_id) AS BIGINT) AS rnk
      |  FROM keyed
      |)
      |SELECT doc_id, lang, source, stratum_n, rnk,
      |  (rnk - 1) * 5 < stratum_n * 1 AS kept
      |FROM r ORDER BY doc_id""".stripMargin

  /** Mirror of `TrainingData.mixTemperature` (T = 2): per-source
    * `floor(2^20·sqrt(n/n_max))` parts-per-2^20 rate, per-doc draw =
    * the raw value of the first 5 hex digits of md5('temp#'||text)
    * (uniform on [0, 2^20), NO modulo) via strpos arithmetic. */
  def pipeMixTemperature: String = {
    val draw = (1 to 5).map { i =>
      val p = math.pow(16, 5 - i).toLong
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * CAST($p AS BIGINT)"
    }.mkString(" + ")
    s"""WITH cnts AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source
      |  FROM documents GROUP BY source
      |), mx AS (SELECT MAX(n_source) AS n_max FROM cnts),
      |rates AS (
      |  SELECT source, n_source,
      |    CAST(FLOOR(SQRT(CAST(n_source AS DOUBLE) / CAST(n_max AS DOUBLE))
      |      * 1048576) AS BIGINT) AS rate_p20
      |  FROM cnts, mx
      |), drawn AS (
      |  SELECT doc_id, source, $draw AS draw FROM (
      |    SELECT doc_id, source, md5('temp#' || text) AS h FROM documents
      |  )
      |)
      |SELECT d.doc_id AS doc_id, d.source AS source, r.n_source AS n_source,
      |  r.rate_p20 AS rate_p20, d.draw AS draw, d.draw < r.rate_p20 AS kept
      |FROM drawn d JOIN rates r ON r.source = d.source
      |ORDER BY doc_id""".stripMargin
  }

  /** Mirror of `VectorOps.annTopKFiltered` (label = 0): the
    * [[pipeAnnTopK]] chain with the candidate side pre-filtered to the
    * predicate before ranking. */
  def pipeAnnTopKFiltered: String = QuantEmbCte +
    """, keep AS (
      |  SELECT vec_id FROM embeddings WHERE label = 0
      |), qd AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, SUM(q.q * c.q) AS dot
      |  FROM ev q JOIN ev c
      |    ON q.i = c.i AND q.vec_id < 5 AND c.vec_id <> q.vec_id
      |  WHERE c.vec_id IN (SELECT vec_id FROM keep)
      |  GROUP BY q.vec_id, c.vec_id
      |), cc AS (
      |  SELECT query_id, qd.vec_id, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(n1.nq AS DOUBLE)) * SQRT(CAST(n2.nq AS DOUBLE))) AS cos
      |  FROM qd JOIN nrm n1 ON n1.vec_id = query_id
      |  JOIN nrm n2 ON n2.vec_id = qd.vec_id
      |), rr AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
      |  FROM cc
      |)
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 10
      |ORDER BY query_id, rnk""".stripMargin

  /** Mirror of `VectorOps.annIvfFiltered` (label = 0): the IVF chain
    * with the label predicate thinning candidates inside the probed
    * cells, before the exact re-rank. */
  def pipeAnnIvfFiltered: String = IvfChain(candFilter =
    "WHERE cand.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 0)") +
    """
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** One hex half (8 nibbles) of an md5 column as a BIGINT — the
    * DuckDB spelling of Spark's `conv(substring(dig, start, 8), 16, 10)`. */
  private def hexHalf(start: Int): String =
    (0 until 8).map { o =>
      val mult = 1L << (4 * (7 - o))
      s"(strpos('0123456789abcdef', substr(dig, ${start + o}, 1)) - 1) * " +
        s"CAST($mult AS BIGINT)"
    }.mkString(" + ")

  /** The MinHash signature/band CTEs (`hh`, `bnd`), mirroring
    * `TextPipeline.minhashCandidates`: ONE md5 per shingle, k integer
    * permutations over its two 32-bit halves — coefficients come from
    * the same `mhCoef` the Spark side uses, so both engines derive
    * identical signatures. Expects a preceding `sh(doc_id, shingle)`. */
  private def MinhashHhBnd: String = {
    val P = graft.pipeline.TextPipeline.MinhashP
    val vals = (1 to 9).map { j =>
      val (a, b) = graft.pipeline.TextPipeline.mhCoef(j)
      s"($j, CAST($a AS BIGINT), CAST($b AS BIGINT))"
    }.mkString(", ")
    s""", hx AS (
      |  SELECT doc_id, md5(shingle) AS dig FROM sh
      |), hv AS (
      |  SELECT doc_id, (${hexHalf(1)}) % $P AS h1,
      |    (${hexHalf(9)}) % $P AS h2
      |  FROM hx
      |), hh AS (
      |  SELECT doc_id, j, MIN((h1 * a + h2 * b) % $P) AS mh
      |  FROM hv, (VALUES $vals) t(j, a, b) GROUP BY doc_id, j
      |), bnd0 AS (
      |  SELECT doc_id, (j-1) // 3 AS band,
      |    string_agg(CAST(mh AS VARCHAR), '#' ORDER BY j) AS key
      |  FROM hh GROUP BY doc_id, (j-1) // 3
      |), bnd AS (
      |  SELECT b.* FROM bnd0 b
      |  JOIN (SELECT band, key FROM bnd0 GROUP BY band, key
      |        HAVING COUNT(*) <= ${graft.pipeline.TextPipeline.BandBucketCap}
      |       ) ok USING (band, key)
      |)""".stripMargin
  }

  def pipeMinhash: String = DocShinglesCte + MinhashHhBnd +
    """
      |SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |FROM bnd a JOIN bnd c
      |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Mirror of `TextPipeline.splitLeakage`: the [[pipeMinhash]]
    * candidate pairs joined with the [[pipeSplit]] assignment on both
    * members, keeping only cross-split pairs. */
  def pipeSplitLeakage: String = DocShinglesCte + MinhashHhBnd +
    """, cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bnd a JOIN bnd c
      |    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |), sp AS (
      |  SELECT doc_id,
      |    CASE WHEN (ascii(substr(md5(text), 1, 1)) * 256 +
      |        ascii(substr(md5(text), 2, 1))) % 100 < 80 THEN 'train'
      |      WHEN (ascii(substr(md5(text), 1, 1)) * 256 +
      |        ascii(substr(md5(text), 2, 1))) % 100 < 90 THEN 'val'
      |      ELSE 'test' END AS split
      |  FROM documents
      |)
      |SELECT doc_a, doc_b, sa.split AS split_a, sb.split AS split_b
      |FROM cand
      |JOIN sp sa ON sa.doc_id = doc_a
      |JOIN sp sb ON sb.doc_id = doc_b
      |WHERE sa.split <> sb.split
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Mirror of `TextPipeline.dedupClusters` over the MinHash candidate
    * pairs: connected components as a recursive transitive closure
    * (label set of a node = every node that reaches it; undirected
    * edges make reachability symmetric, so MIN(label) is the cluster's
    * canonical doc). */
  def pipeDedupClusters: String = (pipeMinhashBody(
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bnd a JOIN bnd c
      |    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |), e AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM cand
      |  UNION ALL SELECT doc_b, doc_a FROM cand
      |), reach AS (
      |  SELECT doc_id, doc_id AS label FROM documents
      |  UNION
      |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN e ON e.src = r.doc_id
      |), lab AS (
      |  SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
      |), sz AS (
      |  SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id
      |)
      |SELECT doc_id, cluster_id, cluster_size,
      |  doc_id = cluster_id AS is_canonical
      |FROM lab JOIN sz USING (cluster_id)
      |ORDER BY doc_id""".stripMargin))
    .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Mirror of [[graft.pipeline.TextPipeline.decontaminateSpans]] at
    * benchMax = 10, L = 4: positions whose 4-gram appears anywhere in
    * the benchmark slice (doc_id < 10), merged into maximal spans per
    * corpus document, with the relational clean-text rebuild of
    * [[pipeSubstringDedup]]. */
  def pipeDeconSpans: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), g AS (
      |  SELECT doc_id,
      |    unnest(range(1, GREATEST(len(words) - 3, 0) + 1)) AS pos,
      |    unnest(list_transform(range(1, GREATEST(len(words) - 3, 0) + 1),
      |      i -> md5(array_to_string(words[i:i+3], ' ')))) AS h
      |  FROM w
      |), bh AS (
      |  SELECT DISTINCT h FROM g WHERE doc_id < 10
      |), dp AS (
      |  SELECT doc_id, pos FROM g
      |  WHERE doc_id >= 10 AND h IN (SELECT h FROM bh)
      |), ni AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > COALESCE(MAX(pos + 3) OVER (
      |        PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS ni
      |  FROM dp
      |), isl AS (
      |  SELECT doc_id, pos,
      |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM ni
      |), spans AS (
      |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 3 AS e
      |  FROM isl GROUP BY 1, 2
      |), perdoc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_spans,
      |    CAST(SUM(e - s + 1) AS BIGINT) AS dup_words
      |  FROM spans GROUP BY 1
      |), wp AS (
      |  SELECT doc_id,
      |    unnest(range(1, len(words) + 1)) AS pos,
      |    unnest(words) AS word
      |  FROM w WHERE doc_id >= 10
      |), kept AS (
      |  SELECT wp.doc_id, wp.pos, wp.word FROM wp
      |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |    WHERE sp.doc_id = wp.doc_id AND wp.pos BETWEEN sp.s AND sp.e)
      |), clean AS (
      |  SELECT doc_id,
      |    md5(COALESCE(string_agg(word, ' ' ORDER BY pos), '')) AS clean_md5
      |  FROM kept GROUP BY 1
      |)
      |SELECT w.doc_id, CAST(len(w.words) AS BIGINT) AS n_words,
      |  COALESCE(p.dup_spans, 0) AS dup_spans,
      |  COALESCE(p.dup_words, 0) AS dup_words,
      |  COALESCE(c.clean_md5, md5('')) AS clean_md5
      |FROM w
      |LEFT JOIN perdoc p USING (doc_id)
      |LEFT JOIN clean c ON c.doc_id = w.doc_id
      |WHERE w.doc_id >= 10
      |ORDER BY w.doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.TextPipeline.incrementalDedup]] with
    * the corpus split at doc_id % 4 (≠ 0 = already-indexed base, = 0 =
    * incoming batch): a FULL recompute over base ∪ batch restricted to
    * batch rows — the equivalence claim of the incremental path (the
    * Spark side builds the fingerprint index lake from the base docs
    * alone and probes it with the batch, never re-reading base text;
    * both must produce these rows). */
  def pipeIncrDedup: String = DocShinglesCte + MinhashHhBnd +
    """
      |, cand AS (
      |  SELECT a.doc_id AS d, c.doc_id AS o
      |  FROM bnd a JOIN bnd c
      |    ON a.band = c.band AND a.key = c.key AND a.doc_id <> c.doc_id
      |), near AS (
      |  SELECT d AS doc_id, CAST(MIN(o) AS BIGINT) AS near_min_id,
      |    CAST(COUNT(DISTINCT o) AS BIGINT) AS n_near
      |  FROM cand GROUP BY d
      |), ex AS (
      |  SELECT doc_id,
      |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS exact_keeper
      |  FROM documents
      |)
      |SELECT e.doc_id, e.exact_keeper,
      |  e.doc_id <> e.exact_keeper AS is_exact_dup,
      |  n.near_min_id,
      |  COALESCE(n.n_near, 0) AS n_near,
      |  COALESCE(n.near_min_id < e.doc_id, FALSE) AS is_near_dup
      |FROM ex e LEFT JOIN near n USING (doc_id)
      |WHERE e.doc_id % 4 = 0
      |ORDER BY e.doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.TextPipeline.indexProbe]] with the
    * same % 4 base/batch split as [[pipeIncrDedup]], but INDEX-ONLY
    * semantics: batch docs never compare to each other, and the band
    * occupancy cap is evaluated on the index (base) side alone.
    * References `bnd0` (uncapped bands) from the shared MinHash
    * CTEs. */
  def pipeIndexProbe: String = DocShinglesCte + MinhashHhBnd +
    s"""
      |, okb AS (
      |  SELECT band, key FROM bnd0 WHERE doc_id % 4 <> 0
      |  GROUP BY band, key
      |  HAVING COUNT(*) <= ${graft.pipeline.TextPipeline.BandBucketCap}
      |), candp AS (
      |  SELECT a.doc_id AS d, c.doc_id AS o
      |  FROM bnd0 a
      |  JOIN bnd0 c ON a.band = c.band AND a.key = c.key
      |  JOIN okb ON okb.band = a.band AND okb.key = a.key
      |  WHERE a.doc_id % 4 = 0 AND c.doc_id % 4 <> 0
      |), nearp AS (
      |  SELECT d AS doc_id, CAST(MIN(o) AS BIGINT) AS near_min_id,
      |    CAST(COUNT(DISTINCT o) AS BIGINT) AS n_near
      |  FROM candp GROUP BY d
      |), exh AS (
      |  SELECT doc_id, md5(text) AS ch FROM documents
      |), idxm AS (
      |  SELECT ch, CAST(MIN(doc_id) AS BIGINT) AS idx_min
      |  FROM exh WHERE doc_id % 4 <> 0 GROUP BY ch
      |)
      |SELECT e.doc_id, i.idx_min,
      |  i.idx_min IS NOT NULL AS is_known_exact,
      |  n.near_min_id, COALESCE(n.n_near, 0) AS n_near
      |FROM exh e
      |LEFT JOIN idxm i USING (ch)
      |LEFT JOIN nearp n ON n.doc_id = e.doc_id
      |WHERE e.doc_id % 4 = 0
      |ORDER BY e.doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.TextPipeline.dedupKeepBest]]: the
    * [[pipeDedupClusters]] labels joined with the quality score, the
    * keeper chosen per cluster by (quality DESC, doc_id ASC). */
  def pipeDedupKeepBest: String = (pipeMinhashBody(
    s"""cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bnd a JOIN bnd c
      |    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |), e AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM cand
      |  UNION ALL SELECT doc_b, doc_a FROM cand
      |), reach AS (
      |  SELECT doc_id, doc_id AS label FROM documents
      |  UNION
      |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN e ON e.src = r.doc_id
      |), lab AS (
      |  SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
      |), sz AS (
      |  SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id
      |), q AS (
      |  SELECT doc_id, $qualityScoreSql AS quality_score FROM documents
      |), keeper AS (
      |  SELECT cluster_id, doc_id AS keep_doc FROM (
      |    SELECT lab.cluster_id, lab.doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
      |        ORDER BY q.quality_score DESC, lab.doc_id) AS rn
      |    FROM lab JOIN q USING (doc_id))
      |  WHERE rn = 1
      |)
      |SELECT lab.doc_id, lab.cluster_id, sz.cluster_size,
      |  q.quality_score, k.keep_doc,
      |  lab.doc_id = k.keep_doc AS is_kept
      |FROM lab
      |JOIN sz USING (cluster_id)
      |JOIN q ON q.doc_id = lab.doc_id
      |JOIN keeper k ON k.cluster_id = lab.cluster_id
      |ORDER BY lab.doc_id""".stripMargin))
    .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Mirror of [[graft.pipeline.TextPipeline.curateFull]] at
    * benchMax = 10, minQuality = 0.5, L = 4: quality gate → exact
    * dedup → MinHash/CC clusters keeping the best-quality member →
    * one span-cleaning pass over the union of survivor-duplicated and
    * benchmark-overlapping 4-gram positions. Composes the proven CTE
    * families (quality expression, MinHash bands, recursive closure,
    * gaps-and-islands spans, relational clean-text rebuild) end to
    * end. */
  def pipeCurateFull: String = (
    s"""WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), q AS (
      |  SELECT doc_id, $qualityScoreSql AS quality_score
      |  FROM documents WHERE doc_id >= 10
      |), k1 AS (
      |  SELECT doc_id FROM q WHERE quality_score >= 0.5
      |), eh AS (
      |  SELECT d.doc_id, md5(d.text) AS ch
      |  FROM documents d JOIN k1 USING (doc_id)
      |), k2 AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id,
      |      doc_id = MIN(doc_id) OVER (PARTITION BY ch) AS keep
      |    FROM eh) WHERE keep
      |), sh AS (
      |  SELECT DISTINCT w.doc_id,
      |    unnest(list_transform(range(1, len(words)-1),
      |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
      |      AS shingle
      |  FROM w JOIN k2 USING (doc_id)
      |)""".stripMargin + MinhashHhBnd +
    s"""
      |, cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bnd a JOIN bnd c
      |    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |), e AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM cand
      |  UNION ALL SELECT doc_b, doc_a FROM cand
      |), reach AS (
      |  SELECT doc_id, doc_id AS label FROM k2
      |  UNION
      |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN e ON e.src = r.doc_id
      |), lab AS (
      |  SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
      |), sz AS (
      |  SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id
      |), keeper AS (
      |  SELECT cluster_id, doc_id FROM (
      |    SELECT lab.cluster_id, lab.doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
      |        ORDER BY q.quality_score DESC, lab.doc_id) AS rn
      |    FROM lab JOIN q USING (doc_id)) WHERE rn = 1
      |), g3 AS (
      |  SELECT w.doc_id,
      |    unnest(range(1, GREATEST(len(words) - 3, 0) + 1)) AS pos,
      |    unnest(list_transform(range(1, GREATEST(len(words) - 3, 0) + 1),
      |      i -> md5(array_to_string(words[i:i+3], ' ')))) AS h
      |  FROM w JOIN keeper k ON k.doc_id = w.doc_id
      |), dh AS (
      |  SELECT h FROM g3 GROUP BY h HAVING COUNT(*) >= 2
      |), gb AS (
      |  SELECT DISTINCT
      |    unnest(list_transform(range(1, GREATEST(len(words) - 3, 0) + 1),
      |      i -> md5(array_to_string(words[i:i+3], ' ')))) AS h
      |  FROM w WHERE doc_id < 10
      |), dp AS (
      |  SELECT DISTINCT doc_id, pos FROM g3
      |  WHERE h IN (SELECT h FROM dh) OR h IN (SELECT h FROM gb)
      |), ni AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > COALESCE(MAX(pos + 3) OVER (
      |        PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS ni
      |  FROM dp
      |), isl AS (
      |  SELECT doc_id, pos,
      |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM ni
      |), spans AS (
      |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 3 AS e
      |  FROM isl GROUP BY 1, 2
      |), perdoc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_spans,
      |    CAST(SUM(e - s + 1) AS BIGINT) AS dup_words
      |  FROM spans GROUP BY 1
      |), wp AS (
      |  SELECT w.doc_id,
      |    unnest(range(1, len(words) + 1)) AS pos,
      |    unnest(words) AS word
      |  FROM w JOIN keeper k ON k.doc_id = w.doc_id
      |), kept AS (
      |  SELECT wp.doc_id, wp.pos, wp.word FROM wp
      |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |    WHERE sp.doc_id = wp.doc_id AND wp.pos BETWEEN sp.s AND sp.e)
      |), clean AS (
      |  SELECT doc_id,
      |    md5(COALESCE(string_agg(word, ' ' ORDER BY pos), '')) AS clean_md5
      |  FROM kept GROUP BY 1
      |)
      |SELECT k.doc_id, CAST(len(w.words) AS BIGINT) AS n_words,
      |  COALESCE(p.dup_spans, 0) AS dup_spans,
      |  COALESCE(p.dup_words, 0) AS dup_words,
      |  COALESCE(c.clean_md5, md5('')) AS clean_md5,
      |  sz.cluster_size, q.quality_score
      |FROM keeper k
      |JOIN w ON w.doc_id = k.doc_id
      |JOIN sz USING (cluster_id)
      |JOIN q ON q.doc_id = k.doc_id
      |LEFT JOIN perdoc p ON p.doc_id = k.doc_id
      |LEFT JOIN clean c ON c.doc_id = k.doc_id
      |ORDER BY k.doc_id""".stripMargin)
    .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** The MinHash signature/band CTEs with a caller-supplied tail. */
  private def pipeMinhashBody(tail: String): String = DocShinglesCte +
    MinhashHhBnd + s", $tail"

  def pipeNgramJaccard: String = DocShinglesCte +
    """, shc AS (
      |  SELECT sh.* FROM sh
      |  JOIN (SELECT shingle FROM sh GROUP BY shingle
      |        HAVING COUNT(*) <= 50) rare USING (shingle)
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id
      |), common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      |  FROM shc a JOIN shc b
      |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 2
      |)
      |SELECT doc_a, doc_b, n_common,
      |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
      |FROM common
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |ORDER BY doc_a, doc_b""".stripMargin

  def pipeSimhash: String = DocShinglesCte +
    """, bitsum AS (
      |  SELECT doc_id, b,
      |    SUM(CASE WHEN ((strpos('0123456789abcdef',
      |        substr(md5(shingle), CAST(b // 4 AS INT) + 1, 1)) - 1)
      |        // CAST(POW(2, b % 4) AS BIGINT)) % 2 = 1
      |      THEN 1 ELSE -1 END) AS s
      |  FROM sh, range(0, 60) t(b) GROUP BY doc_id, b
      |), sg AS (
      |  SELECT doc_id, CAST(SUM(CASE WHEN s > 0
      |    THEN CAST(POW(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      |  FROM bitsum GROUP BY doc_id
      |), blocks0 AS (
      |  SELECT doc_id, sig, b,
      |    (sig // CAST(POW(2, 15*b) AS BIGINT)) % 32768 AS bv
      |  FROM sg, range(0, 4) t(b)
      |), blocks AS (
      |  SELECT x.* FROM blocks0 x
      |  JOIN (SELECT b, bv FROM blocks0 GROUP BY b, bv
      |        HAVING COUNT(*) <= """.stripMargin +
    graft.pipeline.TextPipeline.BandBucketCap +
    """) ok USING (b, bv)
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
      |    a.sig AS sig_a, c.sig AS sig_b
      |  FROM blocks a JOIN blocks c
      |    ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
      |)
      |SELECT doc_a, doc_b,
      |  CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
      |FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Quantized embeddings: exact integer dot products and norms. */
  private def QuantEmbCte: String =
    """WITH ev AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
      |  FROM embeddings
      |), nrm AS (
      |  SELECT vec_id, SUM(q*q) AS nq FROM ev GROUP BY vec_id
      |)""".stripMargin

  /** Mirror of `VectorOps.pqTrain` + `pqCodes`: m=8 × k=16 codebook,
    * 2 integer-exact Lloyd iterations (assign by squared L2, ties to
    * the lower code; recenter by floor-division computed in EXACT
    * integer arithmetic — `(s − pmod(s, n)) // n` on BIGINT/HUGEINT
    * mirrors Java floorDiv at any magnitude, where a double round-trip
    * would silently diverge past 2^53; an emptied cluster keeps its
    * previous centroid). */
  private def PqCte(m: Int = 8, k: Int = 16, L: Int = 8): String =
    QuantEmbCte + PqChain(m, k, L, src = "ev")

  /** The PQ training/encode chain (`sv` … `codes`) over a source CTE
    * `src(vec_id, i, q)` — "ev" for raw vectors, "rv" for residuals
    * ([[pipeAnnIvfPqResidual]]). */
  private def PqChain(m: Int = 8, k: Int = 16, L: Int = 8,
      src: String = "ev"): String = {
    def assign(cb: String): String =
      s"""SELECT vec_id, s, j FROM (
         |    SELECT vec_id, s, j, ROW_NUMBER() OVER (
         |      PARTITION BY vec_id, s ORDER BY dist, j) AS rn
         |    FROM (SELECT v.vec_id, v.s, cb.j,
         |        SUM((v.q - cb.c) * (v.q - cb.c)) AS dist
         |      FROM sv v JOIN $cb cb ON cb.s = v.s AND cb.p = v.p
         |      GROUP BY v.vec_id, v.s, cb.j))
         |  WHERE rn = 1""".stripMargin
    def recenter(asg: String, cb: String): String =
      s"""SELECT $cb.s, $cb.j, $cb.p, COALESCE(u.c, $cb.c) AS c
         |  FROM $cb LEFT JOIN (
         |    SELECT a.s, a.j, v.p,
         |      CAST((SUM(v.q) - ((SUM(v.q) % COUNT(*)) + COUNT(*)) % COUNT(*))
         |        // COUNT(*) AS BIGINT) AS c
         |    FROM $asg a JOIN sv v ON v.vec_id = a.vec_id AND v.s = a.s
         |    GROUP BY a.s, a.j, v.p
         |  ) u ON u.s = $cb.s AND u.j = $cb.j AND u.p = $cb.p""".stripMargin
    s""", sv AS (
      |  SELECT vec_id, CAST((i - 1) // $L AS INT) AS s,
      |    (i - 1) % $L AS p, q
      |  FROM $src
      |), cb0 AS (
      |  SELECT s, CAST(vec_id AS INT) AS j, p, q AS c
      |  FROM sv WHERE vec_id < $k
      |), asg1 AS (
      |  ${assign("cb0")}
      |), cb1 AS (
      |  ${recenter("asg1", "cb0")}
      |), asg2 AS (
      |  ${assign("cb1")}
      |), cb2 AS (
      |  ${recenter("asg2", "cb1")}
      |), codes AS (
      |  ${assign("cb2")}
      |)""".stripMargin
  }

  def pipePqCodes: String = PqCte() +
    """
      |SELECT vec_id,
      |  CAST(SUM(j * CAST(POW(16, s) AS BIGINT)) AS BIGINT) AS code_word
      |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** ADC preselection + exact re-rank, mirroring `VectorOps.adcSearch`:
    * ends in CTE `rr2(query_id, vec_id, l2sq, rnk)` with the exact
    * squared distance over the top `topK·rerank` ADC survivors.
    * `restrictToCand = true` scans only the IVF `cand` pairs (the
    * IVF-PQ composition; `IvfCoarseCte` must precede), else the whole
    * code table. */
  private def PqAdcTail(nQueries: Int, topK: Int, rerank: Int,
      restrictToCand: Boolean = false): String = {
    val adcFrom =
      if (restrictToCand)
        """FROM cand k
          |  JOIN codes c ON c.vec_id = k.vec_id
          |  JOIN qtab t ON t.query_id = k.query_id
          |    AND t.s = c.s AND t.code = c.j""".stripMargin
      else
        """FROM codes c JOIN qtab t ON t.s = c.s AND t.code = c.j
          |  WHERE c.vec_id <> t.query_id""".stripMargin
    s""", qtab AS (
      |  SELECT qs.vec_id AS query_id, cb2.s, cb2.j AS code,
      |    CAST(SUM((qs.q - cb2.c) * (qs.q - cb2.c)) AS BIGINT) AS pdist
      |  FROM sv qs JOIN cb2 ON cb2.s = qs.s AND cb2.p = qs.p
      |  WHERE qs.vec_id < $nQueries
      |  GROUP BY qs.vec_id, cb2.s, cb2.j
      |), adc AS (
      |  SELECT t.query_id, c.vec_id, CAST(SUM(t.pdist) AS BIGINT) AS adc_dist
      |  $adcFrom
      |  GROUP BY t.query_id, c.vec_id
      |), pre AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rnk
      |    FROM adc) WHERE rnk <= ${topK * rerank}
      |), rl AS (
      |  SELECT p.query_id, p.vec_id,
      |    CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS l2sq
      |  FROM pre p
      |  JOIN ev a ON a.vec_id = p.query_id
      |  JOIN ev b ON b.vec_id = p.vec_id AND b.i = a.i
      |  GROUP BY p.query_id, p.vec_id
      |), rr2 AS (
      |  SELECT query_id, vec_id, l2sq,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY l2sq, vec_id) AS BIGINT) AS rnk
      |  FROM rl
      |)""".stripMargin
  }

  /** Mirror of [[graft.pipeline.VectorOps.annIvfPqResidual]]: coarse
    * assignment (cosine, seeded cells), integer residuals `rv`, the
    * deterministic PQ chain trained ON the residuals, a per-(query,
    * probed-cell) residual distance table, cell-matched ADC, and the
    * exact-integer re-rank. */
  def pipeAnnIvfPqResidual(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4, nCells: Int = 16): String =
    ResidualIvfPqBody(nQueries, topK, rerank, nCells) +
    s"""
      |SELECT query_id, rnk, vec_id, l2sq FROM rr2 WHERE rnk <= $topK
      |ORDER BY query_id, rnk""".stripMargin

  /** Mirror of `VectorOps.annRecallIvfPqResidual`. */
  def pipeAnnRecallIvfPqResidual(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4, nCells: Int = 16): String =
    ResidualIvfPqBody(nQueries, topK, rerank, nCells) +
      pqRecallTail(nQueries, topK)

  private def ResidualIvfPqBody(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4, nCells: Int = 16, L: Int = 8): String =
    QuantEmbCte + IvfCoarseCte(nCells.toString) +
    s"""
      |, rv AS (
      |  SELECT e.vec_id, e.i, e.q - c.q AS q
      |  FROM ev e
      |  JOIN assign a ON a.vb = e.vec_id
      |  JOIN cents c ON c.cent_id = a.cent_id AND c.i = e.i
      |)""".stripMargin + PqChain(src = "rv") +
    s"""
      |, qrv AS (
      |  SELECT p.query_id, p.cent_id, e.i, e.q - c.q AS q
      |  FROM probes p
      |  JOIN ev e ON e.vec_id = p.query_id
      |  JOIN cents c ON c.cent_id = p.cent_id AND c.i = e.i
      |), qsv AS (
      |  SELECT query_id, cent_id, CAST((i - 1) // $L AS INT) AS s,
      |    (i - 1) % $L AS p, q
      |  FROM qrv
      |), qtab AS (
      |  SELECT qs.query_id, qs.cent_id, cb2.s, cb2.j AS code,
      |    CAST(SUM((qs.q - cb2.c) * (qs.q - cb2.c)) AS BIGINT) AS pdist
      |  FROM qsv qs JOIN cb2 ON cb2.s = qs.s AND cb2.p = qs.p
      |  GROUP BY qs.query_id, qs.cent_id, cb2.s, cb2.j
      |), adc AS (
      |  SELECT k.query_id, k.vec_id, CAST(SUM(t.pdist) AS BIGINT) AS adc_dist
      |  FROM cand k
      |  JOIN assign a ON a.vb = k.vec_id
      |  JOIN codes c ON c.vec_id = k.vec_id
      |  JOIN qtab t ON t.query_id = k.query_id AND t.cent_id = a.cent_id
      |    AND t.s = c.s AND t.code = c.j
      |  GROUP BY k.query_id, k.vec_id
      |), pre AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rnk
      |    FROM adc) WHERE rnk <= ${topK * rerank}
      |), rl AS (
      |  SELECT p.query_id, p.vec_id,
      |    CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS l2sq
      |  FROM pre p
      |  JOIN ev a ON a.vec_id = p.query_id
      |  JOIN ev b ON b.vec_id = p.vec_id AND b.i = a.i
      |  GROUP BY p.query_id, p.vec_id
      |), rr2 AS (
      |  SELECT query_id, vec_id, l2sq,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY l2sq, vec_id) AS BIGINT) AS rnk
      |  FROM rl
      |)""".stripMargin

  def pipeAnnPq(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4): String =
    PqCte() + PqAdcTail(nQueries, topK, rerank) +
    s"""
      |SELECT query_id, rnk, vec_id, l2sq FROM rr2 WHERE rnk <= $topK
      |ORDER BY query_id, rnk""".stripMargin

  def pipeAnnIvfPq(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4, nCells: Int = 16): String =
    PqCte() + IvfCoarseCte(nCells.toString) +
      PqAdcTail(nQueries, topK, rerank, restrictToCand = true) +
    s"""
      |SELECT query_id, rnk, vec_id, l2sq FROM rr2 WHERE rnk <= $topK
      |ORDER BY query_id, rnk""".stripMargin

  /** Recall tail against the exact-L2 baseline over `rr2`. */
  private def pqRecallTail(nQueries: Int, topK: Int): String =
    s""", l2 AS (
      |  SELECT q.vec_id AS query_id, c.vec_id,
      |    SUM((q.q - c.q) * (q.q - c.q)) AS l2sq
      |  FROM ev q JOIN ev c
      |    ON q.i = c.i AND q.vec_id < $nQueries AND c.vec_id <> q.vec_id
      |  GROUP BY q.vec_id, c.vec_id
      |), ex AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY l2sq, vec_id) AS rn
      |    FROM l2) WHERE rn <= $topK
      |)
      |SELECT ex.query_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_exact,
      |  CAST(COUNT(hit.vec_id) AS BIGINT) AS n_hit,
      |  CAST(COUNT(hit.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS recall
      |FROM ex LEFT JOIN (SELECT query_id, vec_id FROM rr2
      |  WHERE rnk <= $topK) hit
      |  ON hit.query_id = ex.query_id AND hit.vec_id = ex.vec_id
      |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  def pipeAnnRecallPq(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4): String =
    PqCte() + PqAdcTail(nQueries, topK, rerank) +
      pqRecallTail(nQueries, topK)

  def pipeAnnRecallIvfPq(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4, nCells: Int = 16): String =
    PqCte() + IvfCoarseCte(nCells.toString) +
      PqAdcTail(nQueries, topK, rerank, restrictToCand = true) +
      pqRecallTail(nQueries, topK)

  /** Mirror of `VectorOps.annIvfPq` under the k-means-TRAINED coarse
    * quantizer (`coarseCents = ivfTrain(...)`): the Lloyd CTEs supply
    * `cents`, the coarse stage probes them, the PQ/ADC tail scans only
    * the probed cells — the full composed deployment index. */
  def pipeAnnIvfPqKmeans(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4, nCells: Int = 16): String =
    PqCte() + IvfTrainCte(nCells.toString) +
      IvfCoarseCte(nCells.toString, providedCents = true) +
      PqAdcTail(nQueries, topK, rerank, restrictToCand = true) +
    s"""
      |SELECT query_id, rnk, vec_id, l2sq FROM rr2 WHERE rnk <= $topK
      |ORDER BY query_id, rnk""".stripMargin

  /** Mirror of `VectorOps.annRecallIvfPq` with trained coarse cells. */
  def pipeAnnRecallIvfPqKmeans(nQueries: Int = 5, topK: Int = 5,
      rerank: Int = 4, nCells: Int = 16): String =
    PqCte() + IvfTrainCte(nCells.toString) +
      IvfCoarseCte(nCells.toString, providedCents = true) +
      PqAdcTail(nQueries, topK, rerank, restrictToCand = true) +
      pqRecallTail(nQueries, topK)

  def pipeEmbedNearDup: String = QuantEmbCte +
    """, d AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.q * b.q) AS dot
      |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
      |  GROUP BY a.vec_id, b.vec_id
      |), c AS (
      |  SELECT va, vb, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE))) AS cos
      |  FROM d JOIN nrm na ON na.vec_id = va JOIN nrm nb ON nb.vec_id = vb
      |), r AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, va, vb)
      |    AS BIGINT) AS rnk
      |  FROM c
      |)
      |SELECT va, vb, cos, rnk FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin

  /** Mirror of `VectorOps.nearDupPairs` (banded path, defaults): 8
    * bands of collection-scaled bits, hyperplane (band t, bit u) =
    * global md5-parity sign row j = t·bits + u; candidates = distinct
    * pairs sharing any band's bucket; exact cosine inside candidates;
    * top-100 by (cos desc, va, vb). */
  def pipeEmbedNearDupLsh: String = QuantEmbCte +
    """, nb AS (
      |  SELECT GREATEST(6, CAST(LENGTH(BIN(GREATEST(COUNT(*) // 16, 1) - 1))
      |    AS BIGINT)) AS bits
      |  FROM embeddings
      |), proj AS (
      |  SELECT e.vec_id, t.j,
      |    SUM((CASE WHEN ascii(substr(md5(t.j || '#' || e.i), 1, 1)) % 2 = 1
      |      THEN 1 ELSE -1 END) * e.q) AS proj
      |  FROM ev e, range(0, 512) t(j), nb WHERE t.j < 8 * nb.bits
      |  GROUP BY e.vec_id, t.j
      |), bkt AS (
      |  SELECT vec_id, CAST(t.j // nb.bits AS INT) AS band,
      |    CAST(SUM(CASE WHEN proj > 0
      |      THEN CAST(POW(2, t.j % nb.bits) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS bucket
      |  FROM proj t, nb GROUP BY vec_id, t.j // nb.bits
      |), cand AS (
      |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      |  FROM bkt a JOIN bkt b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
      |), d AS (
      |  SELECT va, vb, SUM(a.q * b.q) AS dot
      |  FROM cand
      |  JOIN ev a ON a.vec_id = va
      |  JOIN ev b ON b.vec_id = vb AND b.i = a.i
      |  GROUP BY va, vb
      |), c AS (
      |  SELECT va, vb, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb2.nq AS DOUBLE))) AS cos
      |  FROM d JOIN nrm na ON na.vec_id = va JOIN nrm nb2 ON nb2.vec_id = vb
      |), r AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, va, vb)
      |    AS BIGINT) AS rnk
      |  FROM c
      |)
      |SELECT va, vb, cos, rnk FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin

  /** Mirror of `VectorOps.embedDedup` (τ = 0.45): the banded-LSH
    * candidate CTEs of [[pipeEmbedNearDupLsh]], thresholded, then
    * connected components as a recursive transitive closure (the
    * [[pipeDedupClusters]] pattern over vec ids). */
  def pipeEmbedDedup(threshold: Double = 0.45): String = (QuantEmbCte +
    s""", nb AS (
      |  SELECT GREATEST(6, CAST(LENGTH(BIN(GREATEST(COUNT(*) // 16, 1) - 1))
      |    AS BIGINT)) AS bits
      |  FROM embeddings
      |), proj AS (
      |  SELECT e.vec_id, t.j,
      |    SUM((CASE WHEN ascii(substr(md5(t.j || '#' || e.i), 1, 1)) % 2 = 1
      |      THEN 1 ELSE -1 END) * e.q) AS proj
      |  FROM ev e, range(0, 512) t(j), nb WHERE t.j < 8 * nb.bits
      |  GROUP BY e.vec_id, t.j
      |), bkt AS (
      |  SELECT vec_id, CAST(t.j // nb.bits AS INT) AS band,
      |    CAST(SUM(CASE WHEN proj > 0
      |      THEN CAST(POW(2, t.j % nb.bits) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS bucket
      |  FROM proj t, nb GROUP BY vec_id, t.j // nb.bits
      |), cand AS (
      |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      |  FROM bkt a JOIN bkt b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
      |), d AS (
      |  SELECT va, vb, SUM(a.q * b.q) AS dot
      |  FROM cand
      |  JOIN ev a ON a.vec_id = va
      |  JOIN ev b ON b.vec_id = vb AND b.i = a.i
      |  GROUP BY va, vb
      |), kept AS (
      |  SELECT va, vb FROM d
      |  JOIN nrm na ON na.vec_id = va JOIN nrm nb2 ON nb2.vec_id = vb
      |  WHERE CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb2.nq AS DOUBLE)))
      |    >= $threshold
      |), e2 AS (
      |  SELECT va AS src, vb AS dst FROM kept
      |  UNION ALL SELECT vb, va FROM kept
      |), reach AS (
      |  SELECT vec_id, vec_id AS label FROM embeddings
      |  UNION
      |  SELECT e2.dst AS vec_id, r.label FROM reach r
      |  JOIN e2 ON e2.src = r.vec_id
      |), lab AS (
      |  SELECT vec_id, MIN(label) AS cluster_id FROM reach GROUP BY vec_id
      |), sz AS (
      |  SELECT cluster_id, COUNT(*) AS cluster_size FROM lab
      |  GROUP BY cluster_id
      |)
      |SELECT lab.vec_id, lab.cluster_id, sz.cluster_size,
      |  lab.vec_id = lab.cluster_id AS is_canonical
      |FROM lab JOIN sz USING (cluster_id)
      |ORDER BY lab.vec_id""".stripMargin)
    .replaceFirst("WITH ", "WITH RECURSIVE ")

  def pipeAnnTopK: String = QuantEmbCte +
    """, qd AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, SUM(q.q * c.q) AS dot
      |  FROM ev q JOIN ev c
      |    ON q.i = c.i AND q.vec_id < 5 AND c.vec_id <> q.vec_id
      |  GROUP BY q.vec_id, c.vec_id
      |), cc AS (
      |  SELECT query_id, qd.vec_id, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(n1.nq AS DOUBLE)) * SQRT(CAST(n2.nq AS DOUBLE))) AS cos
      |  FROM qd JOIN nrm n1 ON n1.vec_id = query_id
      |  JOIN nrm n2 ON n2.vec_id = qd.vec_id
      |), rr AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
      |  FROM cc
      |)
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 10
      |ORDER BY query_id, rnk""".stripMargin

  def pipeAnnLsh: String = QuantEmbCte +
    """, nb AS (
      |  SELECT GREATEST(6, CAST(LENGTH(BIN(GREATEST(COUNT(*) // 16, 1) - 1))
      |    AS BIGINT)) AS bits
      |  FROM embeddings
      |), proj AS (
      |  SELECT e.vec_id, j,
      |    SUM((CASE WHEN ascii(substr(md5(j || '#' || e.i), 1, 1)) % 2 = 1
      |      THEN 1 ELSE -1 END) * e.q) AS proj
      |  FROM ev e, range(0, 64) t(j), nb WHERE j < nb.bits
      |  GROUP BY e.vec_id, j
      |), bkt AS (
      |  SELECT vec_id, CAST(SUM(CASE WHEN proj > 0
      |    THEN CAST(POW(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY vec_id
      |), cand AS (
      |  SELECT qa.vec_id AS query_id, cb.vec_id AS vec_id
      |  FROM bkt qa JOIN bkt cb
      |    ON qa.bucket = cb.bucket AND qa.vec_id < 5 AND cb.vec_id <> qa.vec_id
      |), qd AS (
      |  SELECT query_id, cand.vec_id, SUM(a.q * b.q) AS dot
      |  FROM cand
      |  JOIN ev a ON a.vec_id = query_id
      |  JOIN ev b ON b.vec_id = cand.vec_id AND b.i = a.i
      |  GROUP BY query_id, cand.vec_id
      |), cc AS (
      |  SELECT query_id, qd.vec_id, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(n1.nq AS DOUBLE)) * SQRT(CAST(n2.nq AS DOUBLE))) AS cos
      |  FROM qd JOIN nrm n1 ON n1.vec_id = query_id
      |  JOIN nrm n2 ON n2.vec_id = qd.vec_id
      |), rr AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
      |  FROM cc
      |)
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** The JL projection CTEs (`sg`, `cp`), mirroring
    * `VectorOps.rprojVecs`: kComps ±1 hyperplanes from the SAME
    * md5-parity sign rule as the LSH mirrors, each component the exact
    * integer Σ s·q. Expects `ev` from [[QuantEmbCte]]. */
  private def RprojCpCte(kComps: Int = 16): String =
    s""", sg AS (
      |  SELECT t.j, di.i,
      |    CASE WHEN ascii(substr(md5(t.j || '#' || di.i), 1, 1)) % 2 = 1
      |      THEN 1 ELSE -1 END AS s
      |  FROM range(0, $kComps) t(j), (SELECT DISTINCT i FROM ev) di
      |), cp AS (
      |  SELECT e.vec_id, s.j, CAST(SUM(s.s * e.q) AS BIGINT) AS comp
      |  FROM ev e JOIN sg s ON s.i = e.i GROUP BY e.vec_id, s.j
      |)""".stripMargin

  /** Mirror of `VectorOps.rprojReport` (kComps = 16). */
  def pipeRproj: String = QuantEmbCte + RprojCpCte() +
    """
      |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_comps,
      |  CAST(SUM(comp) AS BIGINT) AS sum_proj,
      |  CAST(SUM(comp * comp) AS BIGINT) AS norm_proj,
      |  CAST(SUM(CASE WHEN comp > 0 THEN CAST(POW(2, j) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS srp_bits,
      |  md5(string_agg(CAST(comp AS VARCHAR), ',' ORDER BY j)) AS proj_md5
      |FROM cp GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** The JL retrieve-then-rerank ranking (`qd$sfx`/`cc$sfx`/`rr$sfx`):
    * projected-space cosine over `cp` shortlists 20 per query, exact
    * full-width cosine re-ranks. Expects `ev`/`nrm`/`cp`. */
  private def RprojRankChain(sfx: String = ""): String =
    s""", np AS (
      |  SELECT vec_id, SUM(comp * comp) AS np FROM cp GROUP BY vec_id
      |), pd AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS vb,
      |    SUM(a.comp * b.comp) AS pdot
      |  FROM cp a JOIN cp b
      |    ON b.j = a.j AND a.vec_id < 5 AND b.vec_id <> a.vec_id
      |  GROUP BY a.vec_id, b.vec_id
      |), pc AS (
      |  SELECT query_id, vb, CAST(pdot AS DOUBLE) /
      |    (SQRT(CAST(n1.np AS DOUBLE)) * SQRT(CAST(n2.np AS DOUBLE))) AS pcos
      |  FROM pd JOIN np n1 ON n1.vec_id = query_id
      |  JOIN np n2 ON n2.vec_id = vb
      |), shl AS (
      |  SELECT query_id, vb, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY pcos DESC, vb) AS prnk
      |  FROM pc
      |), qd$sfx AS (
      |  SELECT query_id, shl.vb AS vec_id, SUM(a.q * b.q) AS dot
      |  FROM shl JOIN ev a ON a.vec_id = query_id
      |  JOIN ev b ON b.vec_id = shl.vb AND b.i = a.i
      |  WHERE shl.prnk <= 20 GROUP BY query_id, shl.vb
      |), cc$sfx AS (
      |  SELECT query_id, qd$sfx.vec_id, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(n1.nq AS DOUBLE)) * SQRT(CAST(n2.nq AS DOUBLE))) AS cos
      |  FROM qd$sfx JOIN nrm n1 ON n1.vec_id = query_id
      |  JOIN nrm n2 ON n2.vec_id = qd$sfx.vec_id
      |), rr$sfx AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
      |  FROM cc$sfx
      |)""".stripMargin

  /** Mirror of `VectorOps.annRproj` (kComps = 16, shortK = 20). */
  def pipeAnnRproj: String = QuantEmbCte + RprojCpCte() + RprojRankChain() +
    """
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** Mirror of `VectorOps.annRecallRproj`: exact top-5 and the JL
    * rerank top-5 both recomputed, recall = |∩| / |exact|. */
  def pipeAnnRecallRproj: String = QuantEmbCte + RprojCpCte() +
    ExactChainE() + RprojRankChain("_l") + RecallSelect("rr_l")

  /** Mirror of `VectorOps.gramMatrix`: the upper-triangle XᵀX grid
    * recomputed by a per-vector subscript self-join. */
  def pipeGram: String = QuantEmbCte +
    """
      |SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
      |  CAST(SUM(a.q * b.q) AS BIGINT) AS g
      |FROM ev a JOIN ev b ON b.vec_id = a.vec_id AND b.i >= a.i
      |GROUP BY a.i, b.i ORDER BY i, j""".stripMargin

  /** The integer power-iteration CTE chain (`gm`, `x0` … `x$iters`),
    * mirroring `VectorOps.pcaIterate`: DuckDB's HUGEINT carries the
    * same exact arithmetic as the driver's BigInt, and floor division
    * is spelled with the explicit floorMod (`//` truncates). Each CTE
    * references its predecessor exactly ONCE (the max is a window,
    * not a second scalar CTE) — DuckDB inlines non-materialized CTEs,
    * so a double reference would expand the chain exponentially; `gm`
    * is MATERIALIZED for the same reason. Expects `ev`. */
  /** `iters` power-iteration steps over matrix CTE `mat(i, j, g)`
    * from start vector `$v0`, producing `$v$iters`. */
  private def PcaSteps(iters: Int, mat: String, v: String,
      y: String): String =
    (1 to iters).map { t =>
      s""", $y$t AS (
        |  SELECT g.i, SUM(g.g * $v${t - 1}.v) AS y
        |  FROM $mat g JOIN $v${t - 1} ON $v${t - 1}.i = g.j GROUP BY g.i
        |), $v$t AS (
        |  SELECT i, CASE WHEN m = 0 THEN CAST(0 AS BIGINT) ELSE
        |    CAST((y*65536 - ((y*65536 % m + m) % m)) // m AS BIGINT)
        |  END AS v
        |  FROM (SELECT i, y, MAX(ABS(y)) OVER () AS m FROM $y$t)
        |)""".stripMargin
    }.mkString

  private def PcaChain(iters: Int = 12): String =
    s""", gm AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS g
      |  FROM ev a JOIN ev b ON b.vec_id = a.vec_id
      |  GROUP BY a.i, b.i
      |), x0 AS (
      |  SELECT DISTINCT i, CAST(65536 AS BIGINT) AS v FROM ev
      |)""".stripMargin + PcaSteps(iters, "gm", "x", "y")

  /** Mirror of `VectorOps.pcaLeading` (12 iterations): the final
    * direction plus the Rayleigh-quotient floor. */
  def pipePca(iters: Int = 12): String = QuantEmbCte + PcaChain(iters) +
    s""", xf AS MATERIALIZED (SELECT i, v FROM x$iters)
      |, yl AS (
      |  SELECT g.i, SUM(g.g * xf.v) AS y
      |  FROM gm g JOIN xf ON xf.i = g.j GROUP BY g.i
      |), lam AS (
      |  SELECT CASE WHEN den = 0 THEN CAST(0 AS BIGINT) ELSE
      |    CAST((num - ((num % den + den) % den)) // den AS BIGINT)
      |  END AS lambda_est
      |  FROM (SELECT SUM(xf.v * yl.y) AS num, SUM(xf.v * xf.v) AS den
      |        FROM xf JOIN yl ON yl.i = xf.i)
      |)
      |SELECT CAST(xf.i AS BIGINT) AS i, xf.v AS v, lam.lambda_est
      |FROM xf, lam ORDER BY i""".stripMargin

  /** Mirror of `VectorOps.pcaSecond` (12 + 12 iterations): the first
    * chain's direction deflates the Gram model elementwise
    * (`H = G − ⌊xᵀGx·x_ix_j / (xᵀx)²⌋`, the same floorMod spelling),
    * and the SAME step generator re-runs on `hm`. `xf`/`zf` are
    * MATERIALIZED — each is referenced more than once (the rank-one
    * product joins `xf` twice), and non-materialized CTEs inline
    * exponentially. */
  def pipePca2(iters: Int = 12): String = QuantEmbCte + PcaChain(iters) +
    s""", xf AS MATERIALIZED (SELECT i, v FROM x$iters)
      |, yl AS (
      |  SELECT g.i, SUM(g.g * xf.v) AS y
      |  FROM gm g JOIN xf ON xf.i = g.j GROUP BY g.i
      |), nd AS (
      |  SELECT SUM(xf.v * yl.y) AS num, SUM(xf.v * xf.v) AS den
      |  FROM xf JOIN yl ON yl.i = xf.i
      |), hm AS MATERIALIZED (
      |  SELECT i, j, CASE WHEN n = 0 THEN gg
      |    ELSE gg - (s - ((s % n + n) % n)) // n END AS g
      |  FROM (
      |    SELECT g.i AS i, g.j AS j, g.g AS gg,
      |      nd.num * a.v * b.v AS s, nd.den * nd.den AS n
      |    FROM gm g JOIN xf a ON a.i = g.i JOIN xf b ON b.i = g.j, nd
      |  )
      |), z0 AS (
      |  SELECT DISTINCT i, CAST(65536 AS BIGINT) AS v FROM ev
      |)""".stripMargin + PcaSteps(iters, "hm", "z", "w") +
    s""", zf AS MATERIALIZED (SELECT i, v FROM z$iters)
      |, yl2 AS (
      |  SELECT g.i, SUM(g.g * zf.v) AS y
      |  FROM hm g JOIN zf ON zf.i = g.j GROUP BY g.i
      |), lam2 AS (
      |  SELECT CASE WHEN den = 0 THEN CAST(0 AS BIGINT) ELSE
      |    CAST((num - ((num % den + den) % den)) // den AS BIGINT)
      |  END AS lambda_est
      |  FROM (SELECT SUM(zf.v * yl2.y) AS num, SUM(zf.v * zf.v) AS den
      |        FROM zf JOIN yl2 ON yl2.i = zf.i)
      |), ortho AS (
      |  SELECT CAST(SUM(xf.v * zf.v) AS BIGINT) AS ortho_num
      |  FROM xf JOIN zf ON zf.i = xf.i
      |)
      |SELECT CAST(zf.i AS BIGINT) AS i, zf.v AS v, lam2.lambda_est,
      |  ortho.ortho_num
      |FROM zf, lam2, ortho ORDER BY i""".stripMargin

  /** Mirror of `VectorOps.pcaProject`: every vector's exact integer
    * dot with the converged direction. */
  def pipePcaProject(iters: Int = 12): String = QuantEmbCte +
    PcaChain(iters) +
    s"""
      |SELECT e.vec_id, CAST(SUM(e.q * x$iters.v) AS BIGINT) AS score
      |FROM ev e JOIN x$iters ON x$iters.i = e.i
      |GROUP BY e.vec_id ORDER BY e.vec_id""".stripMargin

  /** The exact top-k chain (`qd_e`/`cc_e`/`rr_e`), shared by the two
    * recall oracles. Expects `ev`/`nrm` from [[QuantEmbCte]]. */
  private def ExactChainE(candFilter: String = ""): String =
    s""", qd_e AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, SUM(q.q * c.q) AS dot
      |  FROM ev q JOIN ev c
      |    ON q.i = c.i AND q.vec_id < 5 AND c.vec_id <> q.vec_id
      |  ${candFilter}
      |  GROUP BY q.vec_id, c.vec_id
      |), cc_e AS (
      |  SELECT query_id, qd_e.vec_id, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(n1.nq AS DOUBLE)) * SQRT(CAST(n2.nq AS DOUBLE))) AS cos
      |  FROM qd_e JOIN nrm n1 ON n1.vec_id = query_id
      |  JOIN nrm n2 ON n2.vec_id = qd_e.vec_id
      |), rr_e AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS rnk
      |  FROM cc_e
      |)""".stripMargin

  /** recall = |exact ∩ approx| / |exact| per query, over `rr_e` and an
    * approximate ranking CTE (both rnk ≤ 5). */
  private def RecallSelect(approxRr: String): String =
    s"""
      |SELECT e.query_id AS query_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_exact,
      |  CAST(COUNT(l.vec_id) AS BIGINT) AS n_hit,
      |  CAST(COUNT(l.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
      |FROM (SELECT * FROM rr_e WHERE rnk <= 5) e
      |LEFT JOIN (SELECT * FROM $approxRr WHERE rnk <= 5) l
      |  ON l.query_id = e.query_id AND l.vec_id = e.vec_id
      |GROUP BY e.query_id
      |ORDER BY query_id""".stripMargin

  /** Mirror of `VectorOps.annRecall`: exact top-5 and LSH top-5 both
    * recomputed (the same chains as pipeAnnTopK / pipeAnnLsh, renamed),
    * then recall = |exact ∩ approx| / |exact| per query. */
  def pipeAnnRecall: String = QuantEmbCte + ExactChainE() +
    """, nb AS (
      |  SELECT GREATEST(6, CAST(LENGTH(BIN(GREATEST(COUNT(*) // 16, 1) - 1))
      |    AS BIGINT)) AS bits
      |  FROM embeddings
      |), proj AS (
      |  SELECT e.vec_id, j,
      |    SUM((CASE WHEN ascii(substr(md5(j || '#' || e.i), 1, 1)) % 2 = 1
      |      THEN 1 ELSE -1 END) * e.q) AS proj
      |  FROM ev e, range(0, 64) t(j), nb WHERE j < nb.bits
      |  GROUP BY e.vec_id, j
      |), bkt AS (
      |  SELECT vec_id, CAST(SUM(CASE WHEN proj > 0
      |    THEN CAST(POW(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY vec_id
      |), cand AS (
      |  SELECT qa.vec_id AS query_id, cb.vec_id AS vec_id
      |  FROM bkt qa JOIN bkt cb
      |    ON qa.bucket = cb.bucket AND qa.vec_id < 5 AND cb.vec_id <> qa.vec_id
      |), qd_l AS (
      |  SELECT query_id, cand.vec_id, SUM(a.q * b.q) AS dot
      |  FROM cand
      |  JOIN ev a ON a.vec_id = query_id
      |  JOIN ev b ON b.vec_id = cand.vec_id AND b.i = a.i
      |  GROUP BY query_id, cand.vec_id
      |), cc_l AS (
      |  SELECT query_id, qd_l.vec_id, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(n1.nq AS DOUBLE)) * SQRT(CAST(n2.nq AS DOUBLE))) AS cos
      |  FROM qd_l JOIN nrm n1 ON n1.vec_id = query_id
      |  JOIN nrm n2 ON n2.vec_id = qd_l.vec_id
      |), rr_l AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS rnk
      |  FROM cc_l
      |)""".stripMargin + RecallSelect("rr_l")

  /** Mirror of `VectorOps.annRecallIvf`: the IVF chain (as pipeAnnIvf)
    * joined against the shared exact top-5. */
  def pipeAnnRecallIvf: String = IvfChain() + ExactChainE() + RecallSelect("rr")

  /** Mirror of `VectorOps.annRecallIvfFiltered` (label = 0): both the
    * IVF chain and the exact chain carry the SAME candidate predicate,
    * so the recall isolates the coarse quantizer's loss. */
  def pipeAnnRecallIvfFiltered: String = {
    val f = "WHERE cand.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 0)"
    val fe = "WHERE c.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 0)"
    IvfChain(candFilter = f) + ExactChainE(fe) + RecallSelect("rr")
  }

  /** Mirror of `TrainingData.shuffleOrder`: the bucket-offset rank
    * equals the plain global rank (bucket = key prefix). */
  def pipeShuffle: String =
    """SELECT doc_id, md5('epoch0#' || text) AS shuffle_key,
      |  CAST(ROW_NUMBER() OVER (ORDER BY md5('epoch0#' || text), doc_id)
      |    AS BIGINT) AS shuffle_pos
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirror of `TextPipeline.distinctShingleEstimate`: identical KMV
    * sketch (48-bit md5-prefix hashes, k ascending minima). */
  def pipeDistinctEst: String = {
    val hv = (1 to 12).map { i =>
      val mult = 1L << (4 * (12 - i))
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString(" + ")
    DocShinglesCte +
      s""", hs AS (
        |  SELECT DISTINCT md5(shingle) AS h FROM sh
        |), hv AS (
        |  SELECT ($hv) AS hv FROM hs ORDER BY hv LIMIT 256
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS k_minima,
        |  MAX(hv) AS kth_hash,
        |  CAST(COUNT(*) - 1 AS DOUBLE) * 281474976710656
        |    / CAST(MAX(hv) AS DOUBLE) AS est_distinct
        |FROM hv""".stripMargin
  }

  /** Mirror of `TextPipeline.sourceDistinctEstimate`: the KMV sketch
    * per source — k smallest distinct 48-bit shingle hashes via a
    * plain per-source rank (the engine's two-stage salted top-k must
    * select the same minima). */
  def pipeSourceDistinct(k: Int = 64): String = {
    val hv = (1 to 12).map { i =>
      val mult = 1L << (4 * (12 - i))
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString(" + ")
    DocShinglesCte +
      s""", shs AS (
        |  SELECT DISTINCT d.source, md5(sh.shingle) AS h
        |  FROM sh JOIN documents d USING (doc_id)
        |), shv AS (
        |  SELECT source, ($hv) AS hv FROM shs
        |), srk AS (
        |  SELECT source, hv, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY hv) AS rn
        |  FROM (SELECT DISTINCT source, hv FROM shv)
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS k_minima,
        |  MAX(hv) AS kth_hash,
        |  CAST(COUNT(*) - 1 AS DOUBLE) * 281474976710656
        |    / CAST(MAX(hv) AS DOUBLE) AS est_distinct
        |FROM srk WHERE rn <= $k GROUP BY source
        |ORDER BY source""".stripMargin
  }

  /** Mirror of `TextPipeline.corpusProfile`. */
  def pipeProfile: String =
    """SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
      |  CAST(SUM(len(text)) AS BIGINT) AS n_chars,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  MIN(doc_id) AS first_doc,
      |  MAX(doc_id) AS last_doc,
      |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  def pipeAnnIvf(nCells: Int = 16): String = IvfChain(nCells.toString) +
    """
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** IVF with the √n-scaled cell count (mirror of
    * `VectorOps.scaledCells`): the cell budget is computed from the
    * collection inside the SQL, exactly as the Spark side computes it
    * from `count()` — the deployment sizing rule as a checked query. */
  def pipeAnnIvfSqrtN: String = IvfChain(
    "(SELECT GREATEST(16, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) " +
      "FROM embeddings)") +
    """
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** The IVF candidate/ranking chain (`cents` … `rr`), shared by
    * pipeAnnIvf and pipeAnnRecallIvf. `trained` prepends the Lloyd
    * training CTEs and makes the coarse stage read THEIR `cents`. */
  private def IvfChain(cells: String = "16",
      trained: Boolean = false, candFilter: String = ""): String =
    QuantEmbCte +
      (if (trained) IvfTrainCte(cells) else "") +
      IvfCoarseCte(cells, providedCents = trained) +
      IvfSearchTail(candFilter)

  /** The exact within-cell ranking tail (`qd` … `rr`) shared by
    * [[IvfChain]] and the grown-index probe mirror. */
  private def IvfSearchTail(candFilter: String = ""): String =
    s""", qd AS (
      |  SELECT query_id, cand.vec_id, SUM(a.q * b.q) AS dot
      |  FROM cand
      |  JOIN ev a ON a.vec_id = query_id
      |  JOIN ev b ON b.vec_id = cand.vec_id AND b.i = a.i
      |  ${candFilter}
      |  GROUP BY query_id, cand.vec_id
      |), cc AS (
      |  SELECT query_id, qd.vec_id, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(n1.nq AS DOUBLE)) * SQRT(CAST(n2.nq AS DOUBLE))) AS cos
      |  FROM qd JOIN nrm n1 ON n1.vec_id = query_id
      |  JOIN nrm n2 ON n2.vec_id = qd.vec_id
      |), rr AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
      |  FROM cc
      |)""".stripMargin

  /** The coarse-quantizer part alone (`cents` … `cand`) — composable
    * behind either the exact within-cell ranking (IVF-Flat) or the
    * PQ/ADC scan (IVF-PQ); requires `ev`/`nrm` to be defined. */
  /** Mirror of `VectorOps.ivfTrain` (defaults: 2 Lloyd iterations at
    * full dimension): seed `cb0` = the first `cells` vectors; each
    * round assigns every vector to its max-cosine centroid (ties to
    * the lower cell) and recenters element-wise with the EXACT
    * integer floor division (the PqCte discipline — a double
    * round-trip would diverge past 2^53); an emptied cell keeps its
    * previous centroid. Ends with `cents(cent_id, i, q)`.
    *
    * `src` is the exploded-vector CTE the training reads (default
    * `ev`, the whole collection — the historical, byte-identical
    * form). A RESTRICTED source (e.g. `evb`, the incremental-ANN base
    * split) trains on its rows alone; its seed relabels the lowest
    * `cells` vec_ids densely to 0..cells−1 because the engine's
    * centroid array is position-indexed — on `ev`'s dense ids the two
    * seed forms coincide, so the special case preserves every
    * pre-existing mirror verbatim. */
  private def IvfTrainCte(cells: String, iters: Int = 2,
      src: String = "ev"): String = {
    // CTE names are icb* (not cb*): PqCte's per-subspace codebooks
    // already own cb0..cb2, and the IVF-PQ-kmeans mirror composes both
    def round(idx: Int): String = {
      val prev = s"icb${idx - 1}"
      s""", cn_t$idx AS (
        |  SELECT cent_id, SUM(q*q) AS cnq FROM $prev GROUP BY cent_id
        |), ad_t$idx AS (
        |  SELECT e.vec_id, c.cent_id, SUM(e.q * c.q) AS dot
        |  FROM $src e JOIN $prev c ON c.i = e.i
        |  GROUP BY e.vec_id, c.cent_id
        |), rk_t$idx AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT a.vec_id, a.cent_id, ROW_NUMBER() OVER (
        |      PARTITION BY a.vec_id ORDER BY CAST(a.dot AS DOUBLE) /
        |        (SQRT(CAST(n.nq AS DOUBLE)) * SQRT(CAST(cn.cnq AS DOUBLE)))
        |        DESC, a.cent_id) AS crn
        |    FROM ad_t$idx a JOIN nrm n ON n.vec_id = a.vec_id
        |    JOIN cn_t$idx cn ON cn.cent_id = a.cent_id)
        |  WHERE crn = 1
        |), icb$idx AS (
        |  SELECT p.cent_id, p.i, COALESCE(u.c, p.q) AS q
        |  FROM $prev p LEFT JOIN (
        |    SELECT a.cent_id, e.i,
        |      CAST((SUM(e.q) - ((SUM(e.q) % COUNT(*)) + COUNT(*)) % COUNT(*))
        |        // COUNT(*) AS BIGINT) AS c
        |    FROM rk_t$idx a JOIN $src e ON e.vec_id = a.vec_id
        |    GROUP BY a.cent_id, e.i
        |  ) u ON u.cent_id = p.cent_id AND u.i = p.i
        |)""".stripMargin
    }
    val seed =
      if (src == "ev")
        s""", icb0 AS (
          |  SELECT vec_id AS cent_id, i, q FROM ev WHERE vec_id < $cells
          |)""".stripMargin
      else
        s""", icb0 AS (
          |  SELECT DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS cent_id,
          |    i, q
          |  FROM $src
          |  WHERE vec_id IN (
          |    SELECT DISTINCT vec_id FROM $src ORDER BY vec_id
          |    LIMIT $cells)
          |)""".stripMargin
    seed +
      (1 to iters).map(round).mkString +
      s""", cents AS (
      |  SELECT cent_id, i, q FROM icb$iters
      |)""".stripMargin
  }

  /** Mirror of `VectorOps.clusterSample`: Lloyd-trained cells
    * (IvfTrainCte), max-cosine assignment (ties to the lower cell),
    * per-cell top-`perCell` by centroid cosine (ties to the lower
    * vec_id). */
  def pipeClusterSample(nCells: Int = 16, perCell: Int = 8): String =
    QuantEmbCte + IvfTrainCte(nCells.toString) +
    s""", ccn AS (
      |  SELECT cent_id, SUM(q*q) AS cnq FROM cents GROUP BY cent_id
      |), cad AS (
      |  SELECT e.vec_id, c.cent_id, SUM(e.q * c.q) AS dot
      |  FROM ev e JOIN cents c ON c.i = e.i
      |  GROUP BY e.vec_id, c.cent_id
      |), cac AS (
      |  SELECT a.vec_id, a.cent_id,
      |    CAST(a.dot AS DOUBLE) /
      |      (SQRT(CAST(n.nq AS DOUBLE)) * SQRT(CAST(cn.cnq AS DOUBLE))) AS cos,
      |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
      |      ORDER BY CAST(a.dot AS DOUBLE) /
      |        (SQRT(CAST(n.nq AS DOUBLE)) * SQRT(CAST(cn.cnq AS DOUBLE)))
      |        DESC, a.cent_id) AS crn
      |  FROM cad a JOIN nrm n ON n.vec_id = a.vec_id
      |  JOIN ccn cn ON cn.cent_id = a.cent_id
      |), ckept AS (
      |  SELECT cent_id, vec_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY cent_id
      |      ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
      |  FROM cac WHERE crn = 1
      |)
      |SELECT cent_id, rnk, vec_id, cos FROM ckept WHERE rnk <= $perCell
      |ORDER BY cent_id, rnk""".stripMargin

  /** Mirror of `VectorOps.annIvfKmeans` (trained coarse quantizer,
    * same search as pipeAnnIvf). */
  def pipeAnnIvfKmeans(nCells: Int = 16): String =
    IvfChain(nCells.toString, trained = true) +
    """
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** Mirror of `VectorOps.annRecallIvfKmeans`. */
  def pipeAnnRecallIvfKmeans: String =
    IvfChain(trained = true) + ExactChainE() + RecallSelect("rr")

  /** The max-cosine assignment of EVERY vector to base-trained cells —
    * shared by [[pipeIncrAnn]] and [[pipeAnnDrift]]: Lloyd runs on the
    * BASE split alone (`evb`, vec_id % 4 ≠ 0 — the already-indexed
    * corpus), then the whole collection is assigned under those frozen
    * centroids with the engine's (cos DESC, cent_id) tie rule. Because
    * per-row assignment has no cross-row dependence, this full-rebuild
    * formulation EQUALS the engine's incremental path (stored base
    * postings ∪ freshly-assigned batch) — the equivalence the
    * incremental-ANN row exists to prove. Ends with
    * `iasg(vec_id, cent_id)`. */
  private def IncrAssignCte(nCells: Int = 16): String =
    QuantEmbCte +
    """
      |, evb AS (
      |  SELECT * FROM ev WHERE vec_id % 4 <> 0
      |)""".stripMargin +
    IvfTrainCte(nCells.toString, src = "evb") +
    """
      |, iccn AS (
      |  SELECT cent_id, SUM(q*q) AS cnq FROM cents GROUP BY cent_id
      |), icad AS (
      |  SELECT e.vec_id, c.cent_id, SUM(e.q * c.q) AS dot
      |  FROM ev e JOIN cents c ON c.i = e.i
      |  GROUP BY e.vec_id, c.cent_id
      |), icac AS (
      |  SELECT a.vec_id, a.cent_id,
      |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
      |      ORDER BY CAST(a.dot AS DOUBLE) /
      |        (SQRT(CAST(n.nq AS DOUBLE)) * SQRT(CAST(cn.cnq AS DOUBLE)))
      |        DESC, a.cent_id) AS crn
      |  FROM icad a JOIN nrm n ON n.vec_id = a.vec_id
      |  JOIN iccn cn ON cn.cent_id = a.cent_id
      |), iasg AS (
      |  SELECT vec_id, CAST(cent_id AS BIGINT) AS cent_id
      |  FROM icac WHERE crn = 1
      |)""".stripMargin

  /** Mirror of [[graft.pipeline.VectorOps.semDecon]]: exact cosine of
    * every corpus vector against every benchmark vector
    * (vec_id < benchMax), hits at cos ≥ tau counted and the argmax
    * benchmark kept (ties to the lower b_id). */
  def pipeSemDecon(benchMax: Long = 10, tau: String = "0.4"): String =
    QuantEmbCte +
    s"""
      |, bvs AS (
      |  SELECT vec_id AS b_id, i, q FROM ev WHERE vec_id < $benchMax
      |), sdd AS (
      |  SELECT e.vec_id, b.b_id, SUM(e.q * b.q) AS dot
      |  FROM ev e JOIN bvs b ON b.i = e.i
      |  WHERE e.vec_id >= $benchMax
      |  GROUP BY e.vec_id, b.b_id
      |), sdc AS (
      |  SELECT d.vec_id, d.b_id, CAST(d.dot AS DOUBLE) /
      |    (SQRT(CAST(n.nq AS DOUBLE)) * SQRT(CAST(bn.nq AS DOUBLE))) AS cos
      |  FROM sdd d JOIN nrm n ON n.vec_id = d.vec_id
      |  JOIN nrm bn ON bn.vec_id = d.b_id
      |), sdh AS (
      |  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
      |    FIRST(b_id ORDER BY cos DESC, b_id) AS top_bench_id,
      |    MAX(cos) AS top_cos
      |  FROM sdc WHERE NOT isnan(cos) AND cos >= $tau GROUP BY vec_id
      |)
      |SELECT n.vec_id,
      |  COALESCE(h.n_hits, 0) AS n_hits,
      |  h.top_bench_id, h.top_cos,
      |  COALESCE(h.n_hits, 0) > 0 AS is_contaminated
      |FROM nrm n LEFT JOIN sdh h ON h.vec_id = n.vec_id
      |WHERE n.vec_id >= $benchMax
      |ORDER BY n.vec_id""".stripMargin

  /** Mirror of the ANN probe served from the GROWN (append-maintained)
    * index: centroids Lloyd-trained on the BASE split alone, the
    * whole collection assigned under them (what the stored base index
    * plus the appended batch postings contain — append ≡ rebuild), and
    * the standard IVF search (nProbe=2, k=5) over those cells. The
    * engine side replays query vectors through `annProbeStream`
    * against the grown lake; per-row assignment independence makes the
    * two formulations equal. */
  def pipeIncrAnnProbe(nCells: Int = 16): String =
    QuantEmbCte +
    """
      |, evb AS (
      |  SELECT * FROM ev WHERE vec_id % 4 <> 0
      |)""".stripMargin +
    IvfTrainCte(nCells.toString, src = "evb") +
    IvfCoarseCte(nCells.toString, providedCents = true) +
    IvfSearchTail() +
    """
      |SELECT query_id, rnk, vec_id, cos FROM rr WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** Mirror of [[graft.pipeline.VectorOps.incrAnnAssign]] over the
    * %-4 base/batch split: the engine probes the STORED base index and
    * assigns only the batch under the stored centroids; the mirror is
    * the equivalent scratch rebuild — every vector assigned under
    * base-trained centroids, `is_new` = membership in the batch. */
  def pipeIncrAnn(nCells: Int = 16): String =
    IncrAssignCte(nCells) +
    """
      |SELECT vec_id, cent_id, (vec_id % 4 = 0) AS is_new
      |FROM iasg ORDER BY vec_id""".stripMargin

  /** Mirror of [[graft.pipeline.VectorOps.ivfCellDrift]] between the
    * stored base index and one ingest batch: per-cell occupancy
    * histograms over cells occupied by EITHER side (the engine's full
    * join), +1 Laplace smoothing with that joint cell count as the
    * smoothing denominator's added mass, and the [[pipeSourceDrift]]
    * integerization `⌊10⁹·p·ln(p/q)⌋` summed to one row. */
  def pipeAnnDrift(nCells: Int = 16): String =
    IncrAssignCte(nCells) +
    """
      |, dbh AS (
      |  SELECT cent_id, COUNT(*) AS base_n FROM iasg
      |  WHERE vec_id % 4 <> 0 GROUP BY cent_id
      |), dnh AS (
      |  SELECT cent_id, COUNT(*) AS new_n FROM iasg
      |  WHERE vec_id % 4 = 0 GROUP BY cent_id
      |), dj AS (
      |  SELECT COALESCE(b.cent_id, n.cent_id) AS cent_id,
      |    COALESCE(b.base_n, 0) AS base_n,
      |    COALESCE(n.new_n, 0) AS new_n
      |  FROM dnh n FULL JOIN dbh b ON b.cent_id = n.cent_id
      |), dt AS (
      |  SELECT SUM(base_n) AS base_tot, SUM(new_n) AS new_tot,
      |    COUNT(*) AS n_cells
      |  FROM dj
      |), dk AS (
      |  SELECT
      |    CAST(j.new_n + 1 AS DOUBLE) /
      |      CAST(t.new_tot + t.n_cells AS DOUBLE) AS p,
      |    CAST(j.base_n + 1 AS DOUBLE) /
      |      CAST(t.base_tot + t.n_cells AS DOUBLE) AS q
      |  FROM dj j, dt t
      |)
      |SELECT
      |  (SELECT CAST(n_cells AS BIGINT) FROM dt) AS n_cells,
      |  (SELECT CAST(base_tot AS BIGINT) FROM dt) AS n_base,
      |  (SELECT CAST(new_tot AS BIGINT) FROM dt) AS n_new,
      |  CAST(SUM(CAST(FLOOR(1e9 * p * LN(p / q)) AS BIGINT)) AS BIGINT)
      |    AS kl_nano
      |FROM dk""".stripMargin

  /** Mirror of `VectorOps.semDedup`: Lloyd-trained cells (same
    * IvfTrainCte), assignment with centroid cosine kept, within-cell
    * pairwise integer dots, and the exists-dominance drop rule (a
    * vector is dropped when a cell-mate at cosine ≥ τ sits FARTHER
    * from the centroid — lower ccos — with vec_id tiebreak). Cells
    * past `VectorOps.CellCap` are sub-split by vec_id modulo
    * ⌈|cell|/cap⌉ — the engine's occupancy guard, mirrored so the
    * pair space is identical at every scale (a no-op at test SFs). */
  def pipeSemDedup(threshold: String = "0.45",
      nCells: Int = 16): String = {
    val cap = graft.pipeline.VectorOps.CellCap
    QuantEmbCte + IvfTrainCte(nCells.toString) +
    IvfCoarseCte(nCells.toString, providedCents = true) +
    s""", sda0 AS (
      |  SELECT vec_id, cent_id, ccos FROM ranked_c WHERE crn = 1
      |), sdn AS (
      |  SELECT cent_id,
      |    (CAST(COUNT(*) AS BIGINT) + ${cap - 1}) // $cap AS nsub
      |  FROM sda0 GROUP BY cent_id
      |), sda AS (
      |  SELECT a.*, a.vec_id % n.nsub AS sub
      |  FROM sda0 a JOIN sdn n USING (cent_id)
      |), sdp AS (
      |  SELECT x.vec_id AS va, y.vec_id AS vb, SUM(ea.q * eb.q) AS dot
      |  FROM sda x JOIN sda y
      |    ON y.cent_id = x.cent_id AND y.sub = x.sub
      |      AND y.vec_id <> x.vec_id
      |  JOIN ev ea ON ea.vec_id = x.vec_id
      |  JOIN ev eb ON eb.vec_id = y.vec_id AND eb.i = ea.i
      |  GROUP BY x.vec_id, y.vec_id
      |), sdd AS (
      |  SELECT DISTINCT p.va FROM sdp p
      |  JOIN nrm na ON na.vec_id = p.va
      |  JOIN nrm nb ON nb.vec_id = p.vb
      |  JOIN sda ca ON ca.vec_id = p.va
      |  JOIN sda cb ON cb.vec_id = p.vb
      |  WHERE CAST(p.dot AS DOUBLE) /
      |      (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE)))
      |      >= $threshold
      |    AND (cb.ccos < ca.ccos
      |      OR (cb.ccos = ca.ccos AND p.vb < p.va))
      |)
      |SELECT a.vec_id, a.cent_id, a.ccos, (d.va IS NULL) AS kept
      |FROM sda a LEFT JOIN sdd d ON d.va = a.vec_id
      |ORDER BY a.vec_id""".stripMargin
  }

  /** Mirror of `VectorOps.semDeconIvf`: Lloyd-trained cells
    * (IvfTrainCte), corpus vectors in their argmax cell, benchmark
    * vectors fanned to their top-nProbe cells, exact cosine on
    * same-cell pairs only, semDecon hit semantics (NaN excluded on
    * both engines, ties to the lower benchmark id). */
  def pipeSemDeconIvf(benchMax: Long = 10, tau: String = "0.4",
      nCells: Int = 16, nProbe: Int = 2): String =
    QuantEmbCte + IvfTrainCte(nCells.toString) +
    IvfCoarseCte(nCells.toString, providedCents = true) +
    s""", svb AS (
      |  SELECT vb AS vec_id, cent_id FROM assign WHERE vb >= $benchMax
      |), sbp AS (
      |  SELECT vec_id AS b_id, cent_id FROM ranked_c
      |  WHERE vec_id < $benchMax AND crn <= $nProbe
      |), spr AS (
      |  SELECT c.vec_id, b.b_id, SUM(ec.q * eb.q) AS dot
      |  FROM svb c JOIN sbp b ON b.cent_id = c.cent_id
      |  JOIN ev ec ON ec.vec_id = c.vec_id
      |  JOIN ev eb ON eb.vec_id = b.b_id AND eb.i = ec.i
      |  GROUP BY c.vec_id, b.b_id
      |), scs AS (
      |  SELECT p.vec_id, p.b_id, CAST(p.dot AS DOUBLE) /
      |    (SQRT(CAST(nc.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE)))
      |    AS cos
      |  FROM spr p JOIN nrm nc ON nc.vec_id = p.vec_id
      |  JOIN nrm nb ON nb.vec_id = p.b_id
      |), sh AS (
      |  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
      |    FIRST(b_id ORDER BY cos DESC, b_id) AS top_bench_id,
      |    MAX(cos) AS top_cos
      |  FROM scs WHERE NOT isnan(cos) AND cos >= $tau GROUP BY vec_id
      |)
      |SELECT c.vec_id, COALESCE(h.n_hits, 0) AS n_hits,
      |  h.top_bench_id, h.top_cos,
      |  COALESCE(h.n_hits, 0) > 0 AS is_contaminated
      |FROM svb c LEFT JOIN sh h ON h.vec_id = c.vec_id
      |ORDER BY c.vec_id""".stripMargin

  /** Mirror of `VectorOps.semDeconIvfRecall`: the IVF screen's found
    * set vs the exact all-pairs screen's contaminated set, one row
    * (n_exact, n_found, recall_milli). */
  def pipeSemDeconRecall(benchMax: Long = 10, tau: String = "0.4",
      nCells: Int = 16, nProbe: Int = 2): String =
    QuantEmbCte + IvfTrainCte(nCells.toString) +
    IvfCoarseCte(nCells.toString, providedCents = true) +
    s""", svb AS (
      |  SELECT vb AS vec_id, cent_id FROM assign WHERE vb >= $benchMax
      |), sbp AS (
      |  SELECT vec_id AS b_id, cent_id FROM ranked_c
      |  WHERE vec_id < $benchMax AND crn <= $nProbe
      |), spr AS (
      |  SELECT c.vec_id, b.b_id, SUM(ec.q * eb.q) AS dot
      |  FROM svb c JOIN sbp b ON b.cent_id = c.cent_id
      |  JOIN ev ec ON ec.vec_id = c.vec_id
      |  JOIN ev eb ON eb.vec_id = b.b_id AND eb.i = ec.i
      |  GROUP BY c.vec_id, b.b_id
      |), scs AS (
      |  SELECT p.vec_id, CAST(p.dot AS DOUBLE) /
      |    (SQRT(CAST(nc.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE)))
      |    AS cos
      |  FROM spr p JOIN nrm nc ON nc.vec_id = p.vec_id
      |  JOIN nrm nb ON nb.vec_id = p.b_id
      |), afound AS (
      |  SELECT DISTINCT vec_id FROM scs
      |  WHERE NOT isnan(cos) AND cos >= $tau
      |), xcs AS (
      |  SELECT d.vec_id, CAST(d.dot AS DOUBLE) /
      |    (SQRT(CAST(n.nq AS DOUBLE)) * SQRT(CAST(bn.nq AS DOUBLE)))
      |    AS cos
      |  FROM (
      |    SELECT e.vec_id, b.vec_id AS b_id, SUM(e.q * b.q) AS dot
      |    FROM ev e JOIN ev b ON b.i = e.i AND b.vec_id < $benchMax
      |    WHERE e.vec_id >= $benchMax
      |    GROUP BY e.vec_id, b.vec_id
      |  ) d JOIN nrm n ON n.vec_id = d.vec_id
      |  JOIN nrm bn ON bn.vec_id = d.b_id
      |), xct AS (
      |  SELECT DISTINCT vec_id FROM xcs
      |  WHERE NOT isnan(cos) AND cos >= $tau
      |)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM xct) AS n_exact,
      |  (SELECT CAST(COUNT(*) AS BIGINT)
      |     FROM xct JOIN afound USING (vec_id)) AS n_found,
      |  CAST(CASE WHEN (SELECT COUNT(*) FROM xct) = 0 THEN 1000
      |    ELSE (1000 * (SELECT COUNT(*) FROM xct
      |      JOIN afound USING (vec_id)))
      |      // (SELECT COUNT(*) FROM xct) END AS BIGINT)
      |    AS recall_milli""".stripMargin

  /** The trained-cell self-search chain shared by [[pipeKnnGraph]]
    * and [[pipeKnnClusters]] — through `krr(va, vb, cos, rnk)`. The
    * `VectorOps.CellCap` sub-split mirrors the engine's hot-cell
    * occupancy guard (no-op at test SFs). */
  private def KnnCte(nCells: Int, nProbe: Int = 1): String = {
    val cap = graft.pipeline.VectorOps.CellCap
    QuantEmbCte + IvfTrainCte(nCells.toString) +
    IvfCoarseCte(nCells.toString, providedCents = true) +
    s""", kan AS (
      |  SELECT cent_id,
      |    (CAST(COUNT(*) AS BIGINT) + ${cap - 1}) // $cap AS nsub
      |  FROM assign GROUP BY cent_id
      |), kas AS (
      |  SELECT a.*, a.vb % n.nsub AS sub
      |  FROM assign a JOIN kan n USING (cent_id)
      |), kqp AS (
      |  SELECT vec_id AS va, cent_id FROM ranked_c WHERE crn <= $nProbe
      |), kpr AS (
      |  SELECT q.va, b.vb FROM kqp q
      |  JOIN kan n ON n.cent_id = q.cent_id
      |  JOIN kas b ON b.cent_id = q.cent_id AND b.sub = q.va % n.nsub
      |    AND b.vb <> q.va
      |), kdt AS (
      |  SELECT k.va, k.vb, SUM(ea.q * eb.q) AS dot
      |  FROM kpr k
      |  JOIN ev ea ON ea.vec_id = k.va
      |  JOIN ev eb ON eb.vec_id = k.vb AND eb.i = ea.i
      |  GROUP BY k.va, k.vb
      |), kcs AS (
      |  SELECT kdt.va, kdt.vb, CAST(kdt.dot AS DOUBLE) /
      |    (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE))) AS cos
      |  FROM kdt JOIN nrm na ON na.vec_id = kdt.va
      |  JOIN nrm nb ON nb.vec_id = kdt.vb
      |), krr AS (
      |  SELECT va, vb, cos, CAST(ROW_NUMBER() OVER (PARTITION BY va
      |    ORDER BY cos DESC, vb) AS BIGINT) AS rnk
      |  FROM kcs
      |)""".stripMargin
  }

  /** Mirror of `StreamingOps.semDedupStream` (replayed in vec_id
    * order): the per-cell GREEDY sequential dedup — an arrival is
    * dropped iff an earlier KEPT cell-mate sits at cosine ≥ τ — as a
    * linear recursion over the cell's arrival ranks carrying the kept
    * list (the [[mktStrategy]] state-machine pattern with LIST state,
    * as in the BPE chain). The pair work is precomputed once
    * (`gnear`: each member's earlier near-neighbors), so the
    * recursive term is a pure list test. */
  def pipeSemDedupStream(threshold: String = "0.45",
      nCells: Int = 16): String =
    (QuantEmbCte + IvfTrainCte(nCells.toString) +
    IvfCoarseCte(nCells.toString, providedCents = true) +
    s""", gsa AS (
      |  SELECT vec_id, cent_id FROM ranked_c WHERE crn = 1
      |), gseq AS (
      |  SELECT vec_id, cent_id, CAST(ROW_NUMBER() OVER (
      |    PARTITION BY cent_id ORDER BY vec_id) AS BIGINT) AS idx
      |  FROM gsa
      |), gn AS (
      |  SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n FROM gseq
      |  GROUP BY cent_id
      |), gpd AS (
      |  SELECT x.cent_id, x.vec_id AS va, y.vec_id AS vb,
      |    SUM(ea.q * eb.q) AS dot
      |  FROM gseq x JOIN gseq y
      |    ON y.cent_id = x.cent_id AND y.vec_id > x.vec_id
      |  JOIN ev ea ON ea.vec_id = x.vec_id
      |  JOIN ev eb ON eb.vec_id = y.vec_id AND eb.i = ea.i
      |  GROUP BY x.cent_id, x.vec_id, y.vec_id
      |), gnear AS (
      |  SELECT p.cent_id, p.vb, list(p.va) AS near FROM gpd p
      |  JOIN nrm na ON na.vec_id = p.va
      |  JOIN nrm nb ON nb.vec_id = p.vb
      |  WHERE CAST(p.dot AS DOUBLE) /
      |    (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE)))
      |    >= $threshold
      |  GROUP BY p.cent_id, p.vb
      |), grec AS (
      |  SELECT s.cent_id, CAST(1 AS BIGINT) AS i, [s.vec_id] AS kept
      |  FROM gseq s WHERE s.idx = 1
      |  UNION ALL
      |  SELECT r.cent_id, r.i + 1,
      |    CASE WHEN t.near IS NOT NULL AND list_has_any(r.kept, t.near)
      |      THEN r.kept ELSE list_append(r.kept, s.vec_id) END
      |  FROM grec r
      |  JOIN gseq s ON s.cent_id = r.cent_id AND s.idx = r.i + 1
      |  LEFT JOIN gnear t ON t.cent_id = r.cent_id AND t.vb = s.vec_id
      |), gfin AS (
      |  SELECT r.cent_id, r.kept FROM grec r
      |  JOIN gn ON gn.cent_id = r.cent_id AND r.i = gn.n
      |)
      |SELECT s.vec_id, s.cent_id, list_contains(f.kept, s.vec_id) AS kept
      |FROM gseq s JOIN gfin f ON f.cent_id = s.cent_id
      |ORDER BY s.vec_id""".stripMargin)
    .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Mirror of `VectorOps.knnGraph`: every vector searches its
    * `nProbe` best trained cells (default 1 — its own assignment)
    * and keeps its k nearest candidates by exact cosine, vec_id
    * tiebreak. */
  def pipeKnnGraph(k: Int = 5, nCells: Int = 16,
      nProbe: Int = 1): String =
    KnnCte(nCells, nProbe) +
    s"""
      |SELECT va, rnk, vb, cos FROM krr WHERE rnk <= $k
      |ORDER BY va, rnk""".stripMargin

  /** Mirror of `VectorOps.pageRank`: the same all-integer damped
    * fixpoint over the kNN edges (`krr`, rnk ≤ k), one generated CTE
    * pair per iteration (the PcaChain discipline — iterations are
    * unrolled, not recursive, so each step's floor divisions land
    * identically). Inflow sums are CAST to BIGINT per round: DuckDB
    * widens SUM(BIGINT) to HUGEINT, Spark keeps long. The edge,
    * degree, universe, and per-round rank CTEs are MATERIALIZED
    * (the PcaChain discipline): the chain references each of them
    * per round, and inlined re-expansion would re-run the whole kNN
    * subtree ~2× per iteration (measured 326 s vs ~8 s at sf0.01). */
  def pipePageRank(k: Int = 5, nCells: Int = 16, iters: Int = 8): String = {
    val chain = (1 to iters).map { i =>
      s""", pc$i AS (
      |  SELECT e.vb AS vec_id,
      |    CAST(SUM((85 * p.pr) // (100 * d.deg)) AS BIGINT) AS inflow
      |  FROM pe e JOIN pdeg d USING (va)
      |  JOIN pr${i - 1} p ON p.vec_id = e.va
      |  GROUP BY e.vb
      |), pr$i AS MATERIALIZED (
      |  SELECT n.vec_id,
      |    CAST(150000000 + COALESCE(c.inflow, 0) AS BIGINT) AS pr
      |  FROM puni n LEFT JOIN pc$i c USING (vec_id)
      |)""".stripMargin
    }.mkString
    KnnCte(nCells) +
    s""", pe AS MATERIALIZED (
      |  SELECT va, vb FROM krr WHERE rnk <= $k
      |), pdeg AS MATERIALIZED (
      |  SELECT va, CAST(COUNT(*) AS BIGINT) AS deg FROM pe GROUP BY va
      |), puni AS MATERIALIZED (
      |  SELECT vec_id FROM nrm
      |), pr0 AS (
      |  SELECT vec_id, CAST(1000000000 AS BIGINT) AS pr FROM puni
      |)""".stripMargin + chain +
    s"""
      |SELECT n.vec_id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS out_deg,
      |  p.pr AS pr_nano
      |FROM puni n LEFT JOIN pdeg d ON d.va = n.vec_id
      |JOIN pr$iters p ON p.vec_id = n.vec_id
      |ORDER BY n.vec_id""".stripMargin
  }

  /** Mirror of `VectorOps.labelPropagate`: the same synchronous
    * majority-vote rounds over the kNN edges, unrolled as generated
    * CTEs with the majority picked by an explicit
    * `(cnt DESC, lab ASC)` window (≡ the engine's
    * `max(struct(cnt, −lab))` argmax). Edge/truth/per-round label
    * CTEs MATERIALIZED, as in [[pipePageRank]]. */
  def pipeLabelProp(k: Int = 5, nCells: Int = 16, iters: Int = 3,
      seedMod: Int = 10): String = {
    val chain = (1 to iters).map { i =>
      s""", lv$i AS (
      |  SELECT e.va AS vec_id, l.lab, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM le e JOIN ll${i - 1} l ON l.vec_id = e.vb
      |  WHERE l.lab >= 0 GROUP BY e.va, l.lab
      |), lm$i AS (
      |  SELECT vec_id, lab AS maj FROM (
      |    SELECT vec_id, lab, ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY cnt DESC, lab ASC) AS rn FROM lv$i)
      |  WHERE rn = 1
      |), ll$i AS MATERIALIZED (
      |  SELECT t.vec_id, CAST(CASE WHEN t.is_seed THEN t.true_label
      |    ELSE COALESCE(m.maj, -1) END AS BIGINT) AS lab
      |  FROM ltr t LEFT JOIN lm$i m USING (vec_id)
      |)""".stripMargin
    }.mkString
    KnnCte(nCells) +
    s""", le AS MATERIALIZED (
      |  SELECT va, vb FROM krr WHERE rnk <= $k
      |), ltr AS MATERIALIZED (
      |  SELECT vec_id, CAST(label AS BIGINT) AS true_label,
      |    vec_id % $seedMod = 0 AS is_seed
      |  FROM embeddings
      |), ll0 AS (
      |  SELECT vec_id, CASE WHEN is_seed THEN true_label
      |    ELSE CAST(-1 AS BIGINT) END AS lab
      |  FROM ltr
      |)""".stripMargin + chain +
    s"""
      |SELECT t.vec_id, t.is_seed, t.true_label, l.lab AS prop_label,
      |  (l.lab >= 0 AND l.lab = t.true_label) AS agree
      |FROM ltr t JOIN ll$iters l USING (vec_id)
      |ORDER BY t.vec_id""".stripMargin
  }

  /** Mirror of `VectorOps.knnRecall`: exact all-pairs self-kNN vs the
    * trained-cell self-search (`krr`), recall per vector. */
  def pipeKnnRecall(k: Int = 5, nCells: Int = 16,
      nProbe: Int = 1): String =
    KnnCte(nCells, nProbe) +
    s""", xqd AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
      |    SUM(q.q * c.q) AS dot
      |  FROM ev q JOIN ev c ON c.i = q.i AND c.vec_id <> q.vec_id
      |  GROUP BY q.vec_id, c.vec_id
      |), xcc AS (
      |  SELECT query_id, xqd.vec_id, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(n1.nq AS DOUBLE)) * SQRT(CAST(n2.nq AS DOUBLE))) AS cos
      |  FROM xqd JOIN nrm n1 ON n1.vec_id = query_id
      |  JOIN nrm n2 ON n2.vec_id = xqd.vec_id
      |), xrr AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS rnk
      |  FROM xcc
      |)
      |SELECT e.query_id AS query_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_exact,
      |  CAST(COUNT(l.vb) AS BIGINT) AS n_hit,
      |  CAST(COUNT(l.vb) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
      |FROM (SELECT * FROM xrr WHERE rnk <= $k) e
      |LEFT JOIN (SELECT * FROM krr WHERE rnk <= $k) l
      |  ON l.va = e.query_id AND l.vb = e.vec_id
      |GROUP BY e.query_id
      |ORDER BY query_id""".stripMargin

  /** The mutual-kNN connected-components chain (through
    * `klab(vec_id, cluster_id)` / `ksz`) shared by [[pipeKnnClusters]]
    * and [[pipeSemKeepBest]]. */
  private def KnnCcCte(k: Int, nCells: Int): String =
    KnnCte(nCells) +
    s""", ke AS (
      |  SELECT va, vb FROM krr WHERE rnk <= $k
      |), mke AS (
      |  SELECT a.va, a.vb FROM ke a
      |  JOIN ke b ON b.va = a.vb AND b.vb = a.va
      |  WHERE a.va < a.vb
      |), ke2 AS (
      |  SELECT va AS src, vb AS dst FROM mke
      |  UNION ALL SELECT vb, va FROM mke
      |), kreach AS (
      |  SELECT vec_id, vec_id AS label FROM embeddings
      |  UNION
      |  SELECT ke2.dst AS vec_id, r.label FROM kreach r
      |  JOIN ke2 ON ke2.src = r.vec_id
      |), klab AS (
      |  SELECT vec_id, MIN(label) AS cluster_id FROM kreach
      |  GROUP BY vec_id
      |), ksz AS (
      |  SELECT cluster_id, COUNT(*) AS cluster_size FROM klab
      |  GROUP BY cluster_id
      |)""".stripMargin

  /** Mirror of `VectorOps.triangleStats`: the same mutual a<b edge
    * list (`mke`), per-node degree over both directions, ordered
    * wedges closed against the edge list, and the integer
    * coefficient `(2e9·t) // (deg·(deg−1))`. */
  def pipeTriangles(k: Int = 5, nCells: Int = 16): String =
    KnnCte(nCells) +
    s""", ke AS (
      |  SELECT va, vb FROM krr WHERE rnk <= $k
      |), mke AS (
      |  SELECT a.va, a.vb FROM ke a
      |  JOIN ke b ON b.va = a.vb AND b.vb = a.va
      |  WHERE a.va < a.vb
      |), tund AS (
      |  SELECT va AS a, vb AS b FROM mke
      |  UNION ALL SELECT vb, va FROM mke
      |), tdeg AS (
      |  SELECT a AS vec_id, CAST(COUNT(*) AS BIGINT) AS deg
      |  FROM tund GROUP BY a
      |), ttri AS (
      |  SELECT w.v AS vec_id, CAST(COUNT(*) AS BIGINT) AS triangles
      |  FROM (
      |    SELECT x.a AS v, x.b AS p, y.b AS q2
      |    FROM tund x JOIN tund y ON y.a = x.a AND y.b > x.b) w
      |  JOIN mke m ON m.va = w.p AND m.vb = w.q2
      |  GROUP BY w.v
      |)
      |SELECT e.vec_id,
      |  COALESCE(d.deg, 0) AS deg,
      |  COALESCE(t.triangles, 0) AS triangles,
      |  CASE WHEN COALESCE(d.deg, 0) >= 2
      |    THEN (2000000000 * COALESCE(t.triangles, 0))
      |      // (d.deg * (d.deg - 1))
      |    ELSE 0 END AS coeff_nano
      |FROM embeddings e
      |LEFT JOIN tdeg d ON d.vec_id = e.vec_id
      |LEFT JOIN ttri t ON t.vec_id = e.vec_id
      |ORDER BY e.vec_id""".stripMargin

  /** Mirror of `VectorOps.knnClusters`: mutual-kNN edges (each
    * endpoint in the other's top-k) closed into connected components
    * by the recursive-reach / min-label pattern of
    * [[pipeDedupClusters]]. */
  def pipeKnnClusters(k: Int = 5, nCells: Int = 16): String =
    (KnnCcCte(k, nCells) +
    """
      |SELECT klab.vec_id, klab.cluster_id, ksz.cluster_size,
      |  klab.vec_id = klab.cluster_id AS is_canonical
      |FROM klab JOIN ksz USING (cluster_id)
      |ORDER BY klab.vec_id""".stripMargin)
    .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Mirror of `VectorOps.semKeepBest`: the semantic clusters with the
    * quality-keeper rule of [[pipeDedupKeepBest]] (highest quality
    * wins, vec_id tiebreak). */
  def pipeSemKeepBest(k: Int = 5, nCells: Int = 16): String =
    (KnnCcCte(k, nCells) +
    s""", kq AS (
      |  SELECT doc_id, $qualityScoreSql AS quality_score FROM documents
      |), kkeeper AS (
      |  SELECT cluster_id, vec_id AS keep_doc FROM (
      |    SELECT l.cluster_id, l.vec_id,
      |      ROW_NUMBER() OVER (PARTITION BY l.cluster_id
      |        ORDER BY q.quality_score DESC, l.vec_id) AS rn
      |    FROM klab l JOIN kq q ON q.doc_id = l.vec_id)
      |  WHERE rn = 1
      |)
      |SELECT l.vec_id, l.cluster_id, s.cluster_size, q.quality_score,
      |  k.keep_doc, l.vec_id = k.keep_doc AS is_kept
      |FROM klab l
      |JOIN ksz s USING (cluster_id)
      |JOIN kq q ON q.doc_id = l.vec_id
      |JOIN kkeeper k USING (cluster_id)
      |ORDER BY l.vec_id""".stripMargin)
    .replaceFirst("WITH ", "WITH RECURSIVE ")

  private def IvfCoarseCte(cells: String = "16",
      providedCents: Boolean = false): String =
    (if (providedCents) ""
     else s""", cents AS (
      |  SELECT vec_id AS cent_id, i, q FROM ev WHERE vec_id < $cells
      |)""".stripMargin) +
    s""", cnrm AS (
      |  SELECT cent_id, SUM(q*q) AS cnq FROM cents GROUP BY cent_id
      |), adot AS (
      |  SELECT e.vec_id, c.cent_id, SUM(e.q * c.q) AS dot
      |  FROM ev e JOIN cents c ON c.i = e.i
      |  GROUP BY e.vec_id, c.cent_id
      |), acos AS (
      |  SELECT a.vec_id, a.cent_id, CAST(a.dot AS DOUBLE) /
      |    (SQRT(CAST(n.nq AS DOUBLE)) * SQRT(CAST(cn.cnq AS DOUBLE))) AS ccos
      |  FROM adot a JOIN nrm n ON n.vec_id = a.vec_id
      |  JOIN cnrm cn ON cn.cent_id = a.cent_id
      |), ranked_c AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY ccos DESC, cent_id) AS crn
      |  FROM acos
      |), assign AS (
      |  SELECT vec_id AS vb, cent_id FROM ranked_c WHERE crn = 1
      |), probes AS (
      |  SELECT vec_id AS query_id, cent_id FROM ranked_c
      |  WHERE vec_id < 5 AND crn <= 2
      |), cand AS (
      |  SELECT DISTINCT p.query_id, a.vb AS vec_id
      |  FROM probes p JOIN assign a ON a.cent_id = p.cent_id
      |  WHERE a.vb <> p.query_id
      |)""".stripMargin

  def pipeRepetition: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), g AS (
      |  SELECT doc_id, words,
      |    list_transform(range(1, GREATEST(len(words)-4, 0) + 1),
      |      i -> array_to_string(words[i:i+4], ' ')) AS g5
      |  FROM w
      |)
      |SELECT doc_id,
      |  CAST(len(words) AS BIGINT) AS n_words,
      |  CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words,
      |  CAST(len(g5) AS BIGINT) AS n_grams5,
      |  CAST(len(list_distinct(g5)) AS BIGINT) AS n_distinct_grams5,
      |  CAST(list_max(list_transform(list_distinct(words),
      |    w -> len(list_filter(words, x -> x = w)))) AS BIGINT) AS top_word_n,
      |  1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
      |    AS dup_word_ratio,
      |  CASE WHEN len(g5) > 0
      |    THEN 1.0 - CAST(len(list_distinct(g5)) AS DOUBLE) / len(g5) END
      |    AS dup_gram5_ratio,
      |  CAST(list_max(list_transform(list_distinct(words),
      |    w -> len(list_filter(words, x -> x = w)))) AS DOUBLE) / len(words)
      |    AS top_word_ratio
      |FROM g ORDER BY doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.TextPipeline.lengthQuantiles]]: same
    * ROW_NUMBER formulation (NOT quantile_disc — engines disagree on
    * interpolation dialects; the rank arithmetic is the shared
    * definition). */
  def pipeQuantiles: String =
    """WITH r AS (
      |  SELECT source, n_chars, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY source) AS n
      |  FROM documents
      |), e AS (
      |  SELECT r.*, q
      |  FROM r CROSS JOIN (VALUES (0.0), (0.25), (0.5), (0.75), (1.0))
      |    AS t(q)
      |)
      |SELECT source, q, n_chars AS value, CAST(n AS BIGINT) AS n
      |FROM e WHERE rn = FLOOR((n - 1) * q) + 1
      |ORDER BY source, q""".stripMargin

  /** Mirror of [[graft.pipeline.TextPipeline.dsirWeights]]: hashed
    * unigram+bigram buckets (md5-half mod 1024, the portable primitive
    * shared with the MinHash mirrors), target = `lang = 'en'`, add-one
    * bucket models, per-bucket log-ratio quantized to nano in the
    * 1024-row model table, per-doc exact integer dot product. */
  def pipeDsir: String = {
    val b = graft.pipeline.TextPipeline.DsirBuckets
    s"""WITH w AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS words
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, lang, unnest(words) AS feat FROM w
      |  UNION ALL
      |  SELECT doc_id, lang, unnest(list_transform(range(1, len(words)),
      |    i -> words[i] || ' ' || words[i+1])) AS feat FROM w
      |), fb AS (
      |  SELECT doc_id, lang, (${hexHalf(1)}) % $b AS bucket
      |  FROM (SELECT doc_id, lang, md5(feat) AS dig FROM f)
      |), allc AS (
      |  SELECT bucket, COUNT(*) AS all_c FROM fb GROUP BY 1
      |), tgtc AS (
      |  SELECT bucket, COUNT(*) AS tgt_c FROM fb WHERE lang = 'en'
      |  GROUP BY 1
      |), tot AS (
      |  SELECT CAST((SELECT SUM(all_c) FROM allc) AS BIGINT) AS all_t,
      |    CAST((SELECT SUM(tgt_c) FROM tgtc) AS BIGINT) AS tgt_t
      |), model AS (
      |  SELECT a.bucket,
      |    CAST(round(ln((COALESCE(t.tgt_c, 0) + 1.0) * (tot.all_t + $b.0) /
      |      ((a.all_c + 1.0) * (tot.tgt_t + $b.0))) * 1e9) AS BIGINT)
      |      AS delta_nano
      |  FROM allc a LEFT JOIN tgtc t USING (bucket) CROSS JOIN tot
      |), dc AS (
      |  SELECT doc_id, bucket, COUNT(*) AS c FROM fb GROUP BY 1, 2
      |)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
      |  CAST(SUM(c * delta_nano) AS BIGINT) AS logw_nano,
      |  CAST(SUM(c * delta_nano) AS BIGINT) > 0 AS keep
      |FROM dc JOIN model USING (bucket) GROUP BY 1
      |ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[graft.pipeline.TextPipeline.nbLangClassify]]: add-one
    * multinomial NB over the hashed-feature buckets, 75% train split
    * (`doc_id % 4 <> 0`), sparse observed-cell adjustment over the
    * per-lang smoothed floor, nano-exact integer scores, argmax with
    * lang-ascending tiebreak. */
  def pipeNbLang: String = {
    val b = graft.pipeline.TextPipeline.DsirBuckets
    s"""WITH w AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS words
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, lang, unnest(words) AS feat FROM w
      |  UNION ALL
      |  SELECT doc_id, lang, unnest(list_transform(range(1, len(words)),
      |    i -> words[i] || ' ' || words[i+1])) AS feat FROM w
      |), fb AS (
      |  SELECT doc_id, lang, (${hexHalf(1)}) % $b AS bucket
      |  FROM (SELECT doc_id, lang, md5(feat) AS dig FROM f)
      |), clb AS (
      |  SELECT lang, bucket, COUNT(*) AS c_lb FROM fb
      |  WHERE doc_id % 4 <> 0 GROUP BY 1, 2
      |), cl AS (
      |  SELECT lang, CAST(SUM(c_lb) AS BIGINT) AS c_l FROM clb GROUP BY 1
      |), nl AS (
      |  SELECT lang, COUNT(*) AS n_l FROM documents
      |  WHERE doc_id % 4 <> 0 GROUP BY 1
      |), ntot AS (
      |  SELECT CAST(SUM(n_l) AS BIGINT) AS n_tot FROM nl
      |), ls AS (
      |  SELECT cl.lang AS model_lang, cl.c_l,
      |    CAST(round(ln(CAST(nl.n_l AS DOUBLE) / ntot.n_tot) * 1e9)
      |      AS BIGINT) AS prior_nano,
      |    CAST(round(ln(1.0 / (cl.c_l + $b.0)) * 1e9) AS BIGINT)
      |      AS floor_nano
      |  FROM cl JOIN nl USING (lang) CROSS JOIN ntot
      |), model AS (
      |  SELECT clb.bucket, ls.model_lang,
      |    CAST(round(ln((clb.c_lb + 1.0) / (ls.c_l + $b.0)) * 1e9)
      |      AS BIGINT) - ls.floor_nano AS adj_nano
      |  FROM clb JOIN ls ON ls.model_lang = clb.lang
      |), dc AS (
      |  SELECT doc_id, bucket, COUNT(*) AS c, MAX(lang) AS lang
      |  FROM fb GROUP BY 1, 2
      |), nf AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats, MAX(lang) AS lang
      |  FROM dc GROUP BY 1
      |), obs AS (
      |  SELECT dc.doc_id, m.model_lang,
      |    CAST(SUM(dc.c * m.adj_nano) AS BIGINT) AS obs_nano
      |  FROM dc JOIN model m USING (bucket) GROUP BY 1, 2
      |), sc AS (
      |  SELECT nf.doc_id, nf.lang, ls.model_lang,
      |    ls.prior_nano + nf.n_feats * ls.floor_nano
      |      + COALESCE(o.obs_nano, 0) AS score_nano
      |  FROM nf CROSS JOIN ls
      |  LEFT JOIN obs o
      |    ON o.doc_id = nf.doc_id AND o.model_lang = ls.model_lang
      |), rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score_nano DESC, model_lang) AS rn FROM sc
      |)
      |SELECT doc_id, lang, model_lang AS pred_lang,
      |  doc_id % 4 = 0 AS is_test, model_lang = lang AS correct
      |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[graft.pipeline.TextPipeline.lmScore]]: word-bigram LM
    * with add-one smoothing trained on the `lang = 'en'` slice (BOS
    * `<s>` opens each doc), every bigram's log-prob quantized to nano
    * before the per-doc sum. Parallel `unnest(list_transform(...))`
    * pairs zip positionally (equal-length lists). */
  def pipeLmScore: String =
    """WITH w AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS words
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(0, len(words)),
      |      i -> CASE WHEN i = 0 THEN '<s>' ELSE words[i] END)) AS prev,
      |    unnest(list_transform(range(0, len(words)),
      |      i -> words[i+1])) AS cur
      |  FROM w
      |), cb AS (
      |  SELECT prev, cur, COUNT(*) AS c_big FROM bg WHERE lang = 'en'
      |  GROUP BY 1, 2
      |), cp AS (
      |  SELECT prev, COUNT(*) AS c_prev FROM bg WHERE lang = 'en'
      |  GROUP BY 1
      |), voc AS (
      |  SELECT COUNT(DISTINCT cur) AS v FROM bg WHERE lang = 'en'
      |), sc AS (
      |  SELECT b.doc_id,
      |    CAST(round(ln((COALESCE(cb.c_big, 0) + 1.0) /
      |      (COALESCE(cp.c_prev, 0) + voc.v + 1.0)) * 1e9) AS BIGINT)
      |      AS lp_nano
      |  FROM bg b
      |  LEFT JOIN cb ON cb.prev = b.prev AND cb.cur = b.cur
      |  LEFT JOIN cp ON cp.prev = b.prev
      |  CROSS JOIN voc
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(lp_nano) AS BIGINT) AS ll_nano
      |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.TextPipeline.interDocDupNgrams]] at
    * n = 5: per-(doc, gram) counts, gram document frequency, join
    * back, left-join so short/gram-less docs surface with zeros. */
  def pipeDupNgrams: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, GREATEST(len(words)-4, 0) + 1),
      |      i -> array_to_string(words[i:i+4], ' '))) AS gram
      |  FROM w
      |), pd AS (
      |  SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT gram, COUNT(*) AS df FROM pd GROUP BY 1
      |), agg AS (
      |  SELECT pd.doc_id,
      |    CAST(SUM(pd.cnt) AS BIGINT) AS n_grams,
      |    CAST(SUM(CASE WHEN dfreq.df > 1 THEN pd.cnt ELSE 0 END)
      |      AS BIGINT) AS n_dup_grams
      |  FROM pd JOIN dfreq USING (gram) GROUP BY 1
      |)
      |SELECT d.doc_id,
      |  COALESCE(a.n_grams, 0) AS n_grams,
      |  COALESCE(a.n_dup_grams, 0) AS n_dup_grams,
      |  CASE WHEN a.n_grams > 0
      |    THEN CAST(a.n_dup_grams AS DOUBLE) / a.n_grams END AS dup_frac
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.TextPipeline.substringDedup]] at
    * L = 8: zipped position/gram-hash unnests, corpus-wide gram
    * occurrence counts (ALL positions, same-doc repeats included),
    * gaps-and-islands span merge per document, and a relational
    * rebuild of the cleaned text (word positions anti-joined against
    * the merged spans, re-aggregated in position order) — same
    * removed-region semantics as the Spark array-filter, different
    * mechanics. */
  def pipeSubstringDedup: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), g AS (
      |  SELECT doc_id,
      |    unnest(range(1, GREATEST(len(words) - 7, 0) + 1)) AS pos,
      |    unnest(list_transform(range(1, GREATEST(len(words) - 7, 0) + 1),
      |      i -> md5(array_to_string(words[i:i+7], ' ')))) AS h
      |  FROM w
      |), dh AS (
      |  SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2
      |), dp AS (
      |  SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM dh)
      |), ni AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > COALESCE(MAX(pos + 7) OVER (
      |        PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS ni
      |  FROM dp
      |), isl AS (
      |  SELECT doc_id, pos,
      |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM ni
      |), spans AS (
      |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 7 AS e
      |  FROM isl GROUP BY 1, 2
      |), perdoc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_spans,
      |    CAST(SUM(e - s + 1) AS BIGINT) AS dup_words
      |  FROM spans GROUP BY 1
      |), wp AS (
      |  SELECT doc_id,
      |    unnest(range(1, len(words) + 1)) AS pos,
      |    unnest(words) AS word
      |  FROM w
      |), kept AS (
      |  SELECT wp.doc_id, wp.pos, wp.word FROM wp
      |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |    WHERE sp.doc_id = wp.doc_id AND wp.pos BETWEEN sp.s AND sp.e)
      |), clean AS (
      |  SELECT doc_id,
      |    md5(COALESCE(string_agg(word, ' ' ORDER BY pos), '')) AS clean_md5
      |  FROM kept GROUP BY 1
      |)
      |SELECT w.doc_id, CAST(len(w.words) AS BIGINT) AS n_words,
      |  COALESCE(p.dup_spans, 0) AS dup_spans,
      |  COALESCE(p.dup_words, 0) AS dup_words,
      |  COALESCE(c.clean_md5, md5('')) AS clean_md5
      |FROM w
      |LEFT JOIN perdoc p USING (doc_id)
      |LEFT JOIN clean c ON c.doc_id = w.doc_id
      |ORDER BY w.doc_id""".stripMargin

  /** Mirror of `TextPipeline.charSpanDedup`: duplicated ≥ L-char runs
    * as merged 1-based inclusive char intervals (the corpus is ASCII,
    * so DuckDB's substr mirrors Spark's code-point substring). */
  def pipeCharSpanDedup(l: Int = 24): String =
    s"""WITH g AS (
      |  SELECT doc_id,
      |    unnest(range(1, GREATEST(length(text) - ${l - 1}, 0) + 1)) AS pos,
      |    unnest(list_transform(
      |      range(1, GREATEST(length(text) - ${l - 1}, 0) + 1),
      |      i -> md5(substr(text, CAST(i AS INT), $l)))) AS h
      |  FROM documents
      |), dh AS (
      |  SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2
      |), dp AS (
      |  SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM dh)
      |), ni AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > COALESCE(MAX(pos + ${l - 1}) OVER (
      |        PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS ni
      |  FROM dp
      |), isl AS (
      |  SELECT doc_id, pos,
      |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM ni
      |), spans AS (
      |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + ${l - 1} AS e
      |  FROM isl GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s)
      |    AS BIGINT) AS span_no,
      |  CAST(s AS BIGINT) AS s, CAST(e AS BIGINT) AS e
      |FROM spans
      |ORDER BY doc_id, span_no""".stripMargin

  /** Mirror of `TextPipeline.charDeconSpans`: corpus runs of ≥ L chars
    * shared with the benchmark slice (doc_id < benchMax) as merged
    * 1-based inclusive char intervals. */
  def pipeCharDeconSpans(benchMax: Long = 10, l: Int = 16): String =
    s"""WITH g AS (
      |  SELECT doc_id,
      |    unnest(range(1, GREATEST(length(text) - ${l - 1}, 0) + 1)) AS pos,
      |    unnest(list_transform(
      |      range(1, GREATEST(length(text) - ${l - 1}, 0) + 1),
      |      i -> md5(substr(text, CAST(i AS INT), $l)))) AS h
      |  FROM documents
      |), bk AS (
      |  SELECT DISTINCT h FROM g WHERE doc_id < $benchMax
      |), dp AS (
      |  SELECT doc_id, pos FROM g
      |  WHERE doc_id >= $benchMax AND h IN (SELECT h FROM bk)
      |), ni AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > COALESCE(MAX(pos + ${l - 1}) OVER (
      |        PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS ni
      |  FROM dp
      |), isl AS (
      |  SELECT doc_id, pos,
      |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM ni
      |), spans AS (
      |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + ${l - 1} AS e
      |  FROM isl GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s)
      |    AS BIGINT) AS span_no,
      |  CAST(s AS BIGINT) AS s, CAST(e AS BIGINT) AS e
      |FROM spans
      |ORDER BY doc_id, span_no""".stripMargin

  /** Shared char-gram + winnowing CTE chain (`g` … `sel`) for the
    * winnowed-screen mirrors: rightmost-min per trailing w-window as
    * a struct-min over (h ASC, −pos ASC) — the engine's own
    * `min(struct(h, −pos))` selection, mirrored directly (ADVICE r16:
    * the previous `h ∥ lpad(10⁷ − pos)` string packing silently broke
    * past 10M-char documents, the exact bound the engine side removed
    * in r16). */
  private def CharWinnowCte(l: Int, w: Int): String =
    s"""WITH g AS (
      |  SELECT doc_id,
      |    unnest(range(1, GREATEST(length(text) - ${l - 1}, 0) + 1)) AS pos,
      |    unnest(list_transform(
      |      range(1, GREATEST(length(text) - ${l - 1}, 0) + 1),
      |      i -> md5(substr(text, CAST(i AS INT), $l)))) AS h
      |  FROM documents
      |), sw AS (
      |  SELECT doc_id,
      |    MIN({'h': h, 'np': -pos}) OVER (
      |      PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS m
      |  FROM g
      |), sel AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(-(m.np) AS BIGINT) AS pos,
      |    m.h AS h
      |  FROM sw
      |)""".stripMargin

  /** Mirror of `TextPipeline.charDupDocsWinnowed`. */
  def pipeCharWinnow(l: Int = 16, w: Int = 8): String =
    CharWinnowCte(l, w) +
    s""", dh AS (
      |  SELECT h FROM sel GROUP BY h HAVING COUNT(*) >= 2
      |), hits AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_selected
      |  FROM sel WHERE h IN (SELECT h FROM dh) GROUP BY doc_id
      |), ns AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_selected
      |  FROM sel GROUP BY doc_id
      |)
      |SELECT ns.doc_id, ns.n_selected,
      |  CAST(COALESCE(hits.n_dup_selected, 0) AS BIGINT)
      |    AS n_dup_selected,
      |  COALESCE(hits.n_dup_selected, 0) > 0 AS is_flagged
      |FROM ns LEFT JOIN hits USING (doc_id)
      |ORDER BY ns.doc_id""".stripMargin

  /** The scoped-slice gram chain shared by [[pipeCharSpanScoped]] and
    * [[pipeCharScopedParity]]: winnow-flagged docs (`fdocs`), their
    * grams (`sg`), and the gaps-and-islands spans over duplicates
    * WITHIN the slice (`sspans`). */
  private def CharScopedCtes(l: Int, w: Int): String =
    CharWinnowCte(l, w) +
    s""", dh0 AS (
      |  SELECT h FROM sel GROUP BY h HAVING COUNT(*) >= 2
      |), fdocs AS (
      |  SELECT DISTINCT doc_id FROM sel WHERE h IN (SELECT h FROM dh0)
      |), sg AS (
      |  SELECT g.doc_id, g.pos, g.h FROM g JOIN fdocs USING (doc_id)
      |), sdh AS (
      |  SELECT h FROM sg GROUP BY h HAVING COUNT(*) >= 2
      |), sdp AS (
      |  SELECT doc_id, pos FROM sg WHERE h IN (SELECT h FROM sdh)
      |), sni AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > COALESCE(MAX(pos + ${l - 1}) OVER (
      |        PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS ni
      |  FROM sdp
      |), sisl AS (
      |  SELECT doc_id, pos,
      |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM sni
      |), sspans AS (
      |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + ${l - 1} AS e
      |  FROM sisl GROUP BY 1, 2
      |)""".stripMargin

  /** Mirror of `TextPipeline.charSpanDedupScoped`: the exact char-span
    * pass restricted to the winnow-flagged document slice (duplicate
    * counts taken WITHIN the slice — the scoped semantics). */
  def pipeCharSpanScoped(l: Int = 16, w: Int = 8): String =
    CharScopedCtes(l, w) +
    """
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s)
      |    AS BIGINT) AS span_no,
      |  CAST(s AS BIGINT) AS s, CAST(e AS BIGINT) AS e
      |FROM sspans
      |ORDER BY doc_id, span_no""".stripMargin

  /** Mirror of `TextPipeline.charScopedParity`: exact-identical span
    * intervals of the scoped vs unscoped pass, plus removed-char
    * totals on both sides. */
  def pipeCharScopedParity(l: Int = 16, w: Int = 8): String =
    CharScopedCtes(l, w) +
    s""", xdh AS (
      |  SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2
      |), xdp AS (
      |  SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM xdh)
      |), xni AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > COALESCE(MAX(pos + ${l - 1}) OVER (
      |        PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS ni
      |  FROM xdp
      |), xisl AS (
      |  SELECT doc_id, pos,
      |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM xni
      |), xspans AS (
      |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + ${l - 1} AS e
      |  FROM xisl GROUP BY 1, 2
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_spans_exact,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sspans) AS n_spans_scoped,
      |  CAST(COUNT(sp.doc_id) AS BIGINT) AS n_span_hits,
      |  CASE WHEN COUNT(*) = 0 THEN CAST(1000 AS BIGINT)
      |    ELSE CAST((1000 * COUNT(sp.doc_id)) // COUNT(*) AS BIGINT)
      |  END AS span_recall_milli,
      |  CAST(COALESCE(SUM(x.e - x.s + 1), 0) AS BIGINT) AS chars_exact,
      |  (SELECT CAST(COALESCE(SUM(e - s + 1), 0) AS BIGINT) FROM sspans)
      |    AS chars_scoped
      |FROM xspans x LEFT JOIN sspans sp
      |  ON sp.doc_id = x.doc_id AND sp.s = x.s AND sp.e = x.e""".stripMargin

  /** Mirror of `TextPipeline.charWinnowRecall`: winnowed flagged-doc
    * set vs the exact all-grams duplicated-doc set. */
  def pipeCharWinnowRecall(l: Int = 16, w: Int = 8): String =
    CharWinnowCte(l, w) +
    s""", dh AS (
      |  SELECT h FROM sel GROUP BY h HAVING COUNT(*) >= 2
      |), windocs AS (
      |  SELECT DISTINCT doc_id FROM sel
      |  WHERE h IN (SELECT h FROM dh)
      |), xdh AS (
      |  SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2
      |), xdocs AS (
      |  SELECT DISTINCT doc_id FROM g
      |  WHERE h IN (SELECT h FROM xdh)
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
      |  CAST(COUNT(w.doc_id) AS BIGINT) AS n_hit,
      |  CASE WHEN COUNT(*) = 0 THEN CAST(1000 AS BIGINT)
      |    ELSE CAST((1000 * COUNT(w.doc_id)) // COUNT(*) AS BIGINT)
      |  END AS recall_milli
      |FROM xdocs x LEFT JOIN windocs w ON w.doc_id = x.doc_id""".stripMargin

  /** The BM25 scoring chain (`w` … `brnk`), shared by pipeBm25 and
    * pipeHardNegatives: identical Lucene-idf BM25 with per-term scores
    * rounded to nano-units BEFORE the sum (order-independent integer
    * aggregate, bit-stable across engines); constants appear as the
    * same source expressions ((1.2 + 1.0), (1.0 - 0.75)) so both
    * engines fold identical doubles. Ends with
    * `brnk(query_id, doc_id, score_nano, n_terms_matched, rnk)`. */
  private def Bm25Ctes: String =
    s"""WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), dl AS (
      |  SELECT doc_id, CAST(len(words) AS BIGINT) AS dl FROM w
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(words) AS term FROM w) GROUP BY 1, 2
      |), stats AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
      |), q(query_id, qtext) AS (
      |  VALUES ${graft.pipeline.Search.bm25QueriesSql}
      |), qt AS (
      |  SELECT query_id, term, COUNT(*) AS qtf
      |  FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term
      |        FROM q) GROUP BY 1, 2
      |), qv AS (
      |  SELECT DISTINCT term FROM qt
      |), tfq AS (
      |  SELECT tf.* FROM tf JOIN qv USING (term)
      |), dfreq AS (
      |  SELECT term, COUNT(*) AS df FROM tfq GROUP BY 1
      |), bscored AS (
      |  SELECT qt.query_id, tfq.doc_id,
      |    CAST(SUM(CAST(round(
      |      qt.qtf * ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
      |        * (tfq.tf * (1.2 + 1.0))
      |        / (tfq.tf + 1.2 * ((1.0 - 0.75)
      |            + 0.75 * dl.dl / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
      |      * 1e9) AS BIGINT)) AS BIGINT) AS score_nano,
      |    COUNT(*) AS n_terms_matched
      |  FROM tfq
      |  JOIN dfreq USING (term)
      |  JOIN dl USING (doc_id)
      |  CROSS JOIN stats
      |  JOIN qt USING (term)
      |  GROUP BY 1, 2
      |), brnk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY score_nano DESC, doc_id) AS rnk FROM bscored
      |)""".stripMargin

  /** Mirror of [[graft.pipeline.Search.bm25TopK]]. */
  def pipeBm25: String =
    Bm25Ctes +
    """
      |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score_nano,
      |  n_terms_matched
      |FROM brnk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** Mirror of [[graft.pipeline.Search.hardNegatives]]: BM25 candidate
    * set (rnk ≤ kCand), positive = rnk 1, centroid cosine between each
    * candidate and its positive from the quantized embeddings, keep
    * candidates with cos ≤ maxCos re-ranked by BM25 score. */
  def pipeHardNegatives(kCand: Int = 10, maxCos: Double = 0.35,
      k: Int = 5): String =
    Bm25Ctes +
      ", " + QuantEmbCte.stripPrefix("WITH ") +
    s""", hcand AS (
      |  SELECT query_id, doc_id, score_nano FROM brnk WHERE rnk <= $kCand
      |), hpos AS (
      |  SELECT query_id, doc_id AS pos_id FROM brnk WHERE rnk = 1
      |), hdot AS (
      |  SELECT c.query_id, c.doc_id, c.score_nano, p.pos_id,
      |    SUM(a.q * b.q) AS dot
      |  FROM hcand c
      |  JOIN hpos p USING (query_id)
      |  JOIN ev a ON a.vec_id = c.doc_id
      |  JOIN ev b ON b.vec_id = p.pos_id AND b.i = a.i
      |  GROUP BY 1, 2, 3, 4
      |), hcos AS (
      |  SELECT query_id, doc_id, score_nano,
      |    CAST(dot AS DOUBLE) /
      |      (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE))) AS cos
      |  FROM hdot
      |  JOIN nrm na ON na.vec_id = doc_id
      |  JOIN nrm nb ON nb.vec_id = pos_id
      |  WHERE doc_id <> pos_id
      |), hrnk AS (
      |  SELECT query_id, doc_id, score_nano, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY score_nano DESC, doc_id) AS BIGINT) AS rnk
      |  FROM hcos WHERE cos <= $maxCos
      |)
      |SELECT query_id, rnk, doc_id, score_nano, cos
      |FROM hrnk WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** Mirror of [[graft.pipeline.Search.hybridSearch]]: BM25 ranking
    * (`brnk`) fused with the positive's IVF-cell neighbors (`krr`) by
    * integer reciprocal ranks — `⌊1e9 / (60 + rnk)⌋` per list, full
    * outer on (query, doc), ROW_NUMBER re-rank. */
  def pipeHybridSearch(kEach: Int = 10, k: Int = 5,
      rrfK: Int = 60, nProbe: Int = 1): String =
    Bm25Ctes +
      ", " + KnnCte(16, nProbe).stripPrefix("WITH ") +
    s""", ypos AS (
      |  SELECT query_id, doc_id AS pos_id FROM brnk WHERE rnk = 1
      |), ylex AS (
      |  SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rnk_lex
      |  FROM brnk WHERE rnk <= $kEach
      |), ysem AS (
      |  SELECT p.query_id, kr.vb AS doc_id, kr.rnk AS rnk_sem
      |  FROM ypos p JOIN krr kr ON kr.va = p.pos_id
      |  WHERE kr.rnk <= $kEach
      |), yfused AS (
      |  SELECT query_id, doc_id,
      |    CAST(COALESCE(1000000000 // ($rrfK + l.rnk_lex), 0)
      |       + COALESCE(1000000000 // ($rrfK + s.rnk_sem), 0)
      |      AS BIGINT) AS rrf_nano,
      |    CAST(CAST(l.rnk_lex IS NOT NULL AS INT)
      |       + CAST(s.rnk_sem IS NOT NULL AS INT) AS BIGINT) AS n_lists
      |  FROM ylex l FULL JOIN ysem s USING (query_id, doc_id)
      |), yrnk AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY rrf_nano DESC, doc_id) AS BIGINT) AS rnk
      |  FROM yfused
      |)
      |SELECT query_id, rnk, doc_id, rrf_nano, n_lists
      |FROM yrnk WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  def pipeScrub: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+'))
      |    AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, 'https?://[^ ]+'))
      |    AS BIGINT) AS n_urls,
      |  CAST(len(regexp_extract_all(text, '[0-9]{6,}'))
      |    AS BIGINT) AS n_long_digit_runs,
      |  CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
      |    'https?://[^ ]+', '<URL>', 'g'), '[a-z0-9._%+-]+@[a-z0-9.-]+',
      |    '<EMAIL>', 'g'), '[0-9]{6,}', '<NUM>', 'g')) AS BIGINT)
      |    AS scrubbed_len,
      |  md5(regexp_replace(regexp_replace(regexp_replace(text,
      |    'https?://[^ ]+', '<URL>', 'g'), '[a-z0-9._%+-]+@[a-z0-9.-]+',
      |    '<EMAIL>', 'g'), '[0-9]{6,}', '<NUM>', 'g')) AS scrubbed_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirror of `TextPipeline.dedupAudit`: the banded candidate pairs
    * (same capped `bnd` chain as the cluster mirrors), md5-of-pair-key
    * sample, and the exact shingle-set Jaccard for the sample only. */
  def pipeDedupAudit(n: Int = 20): String = pipeMinhashBody(
    s"""cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bnd a JOIN bnd c
      |    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |), samp AS (
      |  SELECT doc_a, doc_b FROM cand
      |  ORDER BY md5(doc_a || '#' || doc_b) LIMIT $n
      |), shc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM sh
      |  GROUP BY doc_id
      |), com AS (
      |  SELECT s.doc_a, s.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      |  FROM samp s
      |  JOIN sh da ON da.doc_id = s.doc_a
      |  JOIN sh db ON db.doc_id = s.doc_b AND db.shingle = da.shingle
      |  GROUP BY s.doc_a, s.doc_b
      |)
      |SELECT s.doc_a, s.doc_b, ca.nsh AS n_sh_a, cb.nsh AS n_sh_b,
      |  COALESCE(com.n_common, 0) AS n_common,
      |  CAST(COALESCE(com.n_common, 0) AS DOUBLE) /
      |    CAST(ca.nsh + cb.nsh - COALESCE(com.n_common, 0) AS DOUBLE)
      |    AS jaccard
      |FROM samp s
      |JOIN shc ca ON ca.doc_id = s.doc_a
      |JOIN shc cb ON cb.doc_id = s.doc_b
      |LEFT JOIN com ON com.doc_a = s.doc_a AND com.doc_b = s.doc_b
      |ORDER BY s.doc_a, s.doc_b""".stripMargin)

  /** Mirror of `TextPipeline.dedupRecall` (sampleMod 2, τ 0.5, dfCap
    * 50): the posting-join exact-Jaccard truth (over the df-capped
    * shingle space — `shr`) and the banded candidates both rebuilt on
    * the doc_id % 2 sample. */
  def pipeDedupRecall: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |  WHERE doc_id % 2 = 0
      |), sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(words)-1),
      |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
      |  FROM w
      |)""".stripMargin + MinhashHhBnd +
    """, cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bnd a JOIN bnd c
      |    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |), shr AS (
      |  SELECT doc_id, shingle FROM sh
      |  WHERE shingle IN (
      |    SELECT shingle FROM sh GROUP BY shingle
      |    HAVING COUNT(*) <= 50)
      |), shc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM shr
      |  GROUP BY doc_id
      |), com AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_common
      |  FROM shr a JOIN shr b
      |    ON b.shingle = a.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |), truth AS (
      |  SELECT com.doc_a, com.doc_b
      |  FROM com JOIN shc ca ON ca.doc_id = com.doc_a
      |  JOIN shc cb ON cb.doc_id = com.doc_b
      |  WHERE CAST(com.n_common AS DOUBLE) /
      |    CAST(ca.nsh + cb.nsh - com.n_common AS DOUBLE) >= 0.5
      |), agg AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
      |     JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
      |      AS n_hit
      |)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_docs,
      |  n_true, n_cand, n_hit,
      |  CASE WHEN n_cand = 0 THEN 0.0
      |    ELSE CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE) END AS prec,
      |  CASE WHEN n_true = 0 THEN 0.0
      |    ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall
      |FROM agg""".stripMargin

  /** Mirror of `TextPipeline.sourceDrift`: identical formula —
    * FLOOR(1e9 · p · LN(p/q)) per term over exact counts, BIGINT
    * sum per source. */
  def pipeSourceDrift: String =
    """WITH st AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), bs AS (
      |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM st GROUP BY source, term
      |), tot AS (
      |  SELECT source, SUM(cnt) AS tot FROM bs GROUP BY source
      |), corp AS (
      |  SELECT term, SUM(cnt) AS ccnt FROM bs GROUP BY term
      |), ct AS (
      |  SELECT SUM(cnt) AS ctot FROM bs
      |)
      |SELECT b.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  CAST(SUM(CAST(FLOOR(1e9 *
      |    (CAST(b.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)) *
      |    LN((CAST(b.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)) /
      |       (CAST(c.ccnt AS DOUBLE) / CAST(ct.ctot AS DOUBLE))))
      |    AS BIGINT)) AS BIGINT) AS kl_nano
      |FROM bs b
      |JOIN tot t ON t.source = b.source
      |JOIN corp c ON c.term = b.term
      |CROSS JOIN ct
      |GROUP BY b.source
      |ORDER BY b.source""".stripMargin

  /** Mirror of `TextPipeline.boilerplateRemove`: positional chunking
    * (unnest over a range keeps pos), md5-keyed document frequency,
    * NOT-IN removal, and order-preserving reassembly via
    * `string_agg(... ORDER BY pos)`. */
  def pipeBoilerplate(chunkWords: Int = 10, maxDf: Int = 1): String =
    s"""WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), cp AS (
      |  SELECT doc_id, words, unnest(range(0,
      |    (GREATEST(len(words) - 1, 0) // $chunkWords) + 1)) AS pos
      |  FROM w
      |), ch AS (
      |  SELECT doc_id, pos, array_to_string(
      |    words[pos*$chunkWords+1:pos*$chunkWords+$chunkWords], ' ') AS chunk
      |  FROM cp
      |), cf AS (
      |  SELECT doc_id, pos, chunk, md5(chunk) AS h FROM ch
      |  WHERE chunk <> ''
      |), hot AS (
      |  SELECT h FROM cf GROUP BY h
      |  HAVING COUNT(DISTINCT doc_id) > $maxDf
      |), reb AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    string_agg(chunk, ' ' ORDER BY pos) AS clean_text
      |  FROM cf WHERE h NOT IN (SELECT h FROM hot)
      |  GROUP BY doc_id
      |)
      |SELECT d.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
      |  CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_kept
      |FROM documents d LEFT JOIN reb USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  def pipeChunkDedup: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), ch AS (
      |  SELECT doc_id, unnest(list_transform(
      |    range(0, (GREATEST(len(words) - 1, 0) // 10) + 1),
      |    i -> array_to_string(words[i*10+1:i*10+10], ' '))) AS chunk
      |  FROM w
      |), h AS (
      |  SELECT doc_id, md5(chunk) AS chunk_hash FROM ch WHERE chunk <> ''
      |)
      |SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs,
      |  COUNT(*) AS n_occurrences, MIN(doc_id) AS keep_doc
      |FROM h GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
      |ORDER BY chunk_hash""".stripMargin

  def pipeLangId: String =
    """WITH wd AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |), sc AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN word IN ('the','and','of','to','a','in','is','it','for','on') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
      |    CAST(SUM(CASE WHEN word IN ('der','die','das','und','ist','nicht','mit','ein','zu','den') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
      |    CAST(SUM(CASE WHEN word IN ('el','la','de','que','y','en','un','por','con','los') THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
      |    CAST(SUM(CASE WHEN word IN ('le','la','de','et','un','en','est','que','pour','dans') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
      |    COUNT(*) AS n_words
      |  FROM wd GROUP BY doc_id
      |)
      |SELECT doc_id,
      |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
      |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
      |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang,
      |  CAST(GREATEST(s_en, s_de, s_es, s_fr) AS DOUBLE) / n_words AS score,
      |  n_words, s_en, s_de, s_es, s_fr
      |FROM sc ORDER BY doc_id""".stripMargin

  /** Mirror of `TextPipeline.langBalance`: at most 100 docs per
    * predicted language in content-hash order. */
  def pipeLangBalance: String =
    """WITH wd AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |), sc AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN word IN ('the','and','of','to','a','in','is','it','for','on') THEN 1 ELSE 0 END) AS s_en,
      |    SUM(CASE WHEN word IN ('der','die','das','und','ist','nicht','mit','ein','zu','den') THEN 1 ELSE 0 END) AS s_de,
      |    SUM(CASE WHEN word IN ('el','la','de','que','y','en','un','por','con','los') THEN 1 ELSE 0 END) AS s_es,
      |    SUM(CASE WHEN word IN ('le','la','de','et','un','en','est','que','pour','dans') THEN 1 ELSE 0 END) AS s_fr
      |  FROM wd GROUP BY doc_id
      |), lid AS (
      |  SELECT doc_id,
      |    CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
      |         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
      |         WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang
      |  FROM sc
      |), ranked AS (
      |  SELECT d.doc_id, lid.pred_lang, md5(d.text) AS sample_hash,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lid.pred_lang
      |      ORDER BY md5(d.text), d.doc_id) AS BIGINT) AS rnk
      |  FROM documents d JOIN lid USING (doc_id)
      |)
      |SELECT doc_id, pred_lang, sample_hash, rnk FROM ranked
      |WHERE rnk <= 100 ORDER BY pred_lang, rnk""".stripMargin

  /** The quality-score expression over a `text` column (shared by
    * `pipeQuality` and the end-to-end curation oracle). */
  /** The integer quality points (0..10) shared by the score and the
    * sampling weight — kept integral so no float round-trip exists to
    * cast differently across engines. */
  private def qualityPointsSql: String =
    """CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 500 THEN 4 ELSE 0 END
      |   + CASE WHEN len(list_filter(string_split(text, ' '),
      |       x -> x IN ('the','and','of','to','a','in','is','it','for','on'))) * 5
      |       >= len(string_split(text, ' ')) THEN 3 ELSE 0 END
      |   + CASE WHEN (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 10
      |       <= length(text) THEN 2 ELSE 0 END
      |   + CASE WHEN CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |       / len(string_split(text, ' ')) BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END""".stripMargin

  private def qualityScoreSql: String =
    s"CAST($qualityPointsSql AS DOUBLE) / 10"

  /** Mirror of `TrainingData.weightedSample`: the same Madow
    * systematic-PPS walk as one plain prefix-sum window (the engine's
    * bucket-offset construction must produce the identical global
    * cumsum in (sample_key, doc_id) order). */
  def pipeWeightedSample(targetN: Int = 50,
      salt: String = "sample0"): String =
    s"""WITH q AS (
      |  SELECT doc_id, CAST($qualityPointsSql AS BIGINT) + 1 AS w
      |  FROM documents
      |), k AS (
      |  SELECT d.doc_id, md5('$salt#' || d.text) AS sample_key, q.w
      |  FROM documents d JOIN q USING (doc_id)
      |), c AS (
      |  SELECT doc_id, w,
      |    CAST(SUM(w) OVER (ORDER BY sample_key, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
      |  FROM k
      |), t AS (
      |  SELECT GREATEST(1, CAST(SUM(w) AS BIGINT) // $targetN) AS stride
      |  FROM k
      |)
      |SELECT c.doc_id, c.w, c.cum_w,
      |  CAST(c.cum_w // t.stride - (c.cum_w - c.w) // t.stride AS BIGINT)
      |    AS n_picks
      |FROM c, t
      |WHERE c.cum_w // t.stride > (c.cum_w - c.w) // t.stride
      |ORDER BY c.doc_id""".stripMargin

  def pipeQuality: String =
    s"""SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars_m,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  CAST(len(list_filter(string_split(text, ' '),
      |    x -> x IN ('the','and','of','to','a','in','is','it','for','on')))
      |    AS BIGINT) AS n_stop,
      |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
      |    AS BIGINT) AS n_digits,
      |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS mean_word_len,
      |  $qualityScoreSql AS quality_score
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirror of `TextPipeline.sourceCap`: top-`cap` documents per
    * source by quality score, doc_id tiebreak. The mirror's plain
    * per-source window is the semantics; the engine's two-stage
    * salted rank must land on the same rows. */
  def pipeSourceCap(cap: Int = 10): String =
    s"""WITH q AS (
      |  SELECT doc_id, $qualityScoreSql AS quality_score FROM documents
      |), r AS (
      |  SELECT d.source, d.doc_id, q.quality_score,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY d.source
      |      ORDER BY q.quality_score DESC, d.doc_id) AS BIGINT) AS rnk
      |  FROM documents d JOIN q USING (doc_id)
      |)
      |SELECT source, rnk, doc_id, quality_score FROM r
      |WHERE rnk <= $cap ORDER BY source, rnk""".stripMargin

  /** Mirror of [[graft.pipeline.TextPipeline.lengthBuckets]] at the
    * default boundaries. */
  def pipeLengthBuckets: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(CASE WHEN n_tokens <= 16 THEN 16
      |         WHEN n_tokens <= 32 THEN 32
      |         WHEN n_tokens <= 64 THEN 64
      |         WHEN n_tokens <= 128 THEN 128
      |         WHEN n_tokens <= 256 THEN 256
      |         ELSE -1 END AS BIGINT) AS bound
      |  FROM t
      |), agg AS (
      |  SELECT bound, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      |  FROM b GROUP BY bound
      |)
      |SELECT bound, n_docs, sum_tokens,
      |  CASE WHEN bound > 0 THEN n_docs * bound ELSE sum_tokens END
      |    AS padded_tokens,
      |  1.0 - CAST(sum_tokens AS DOUBLE) /
      |    CAST(CASE WHEN bound > 0 THEN n_docs * bound ELSE sum_tokens END
      |      AS DOUBLE) AS waste_frac
      |FROM agg ORDER BY bound""".stripMargin

  def pipeTokens: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
      |  (CAST(length(text) AS BIGINT) * 10 + 37) // 38 AS n_bpe_est
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirror of `TrainingData.epochPlan` (budget 7/4 of the corpus,
    * maxEpochs=2): closed-form integer water-filling — capped set =
    * the maximal prefix (caps ascending) where
    * `cap_i·(S−i+1) + P_{i−1} ≤ B`, uncapped share =
    * `(B − P_k) // (S − k)`. */
  def pipeEpochPlan(budgetNum: Int = 7, budgetDen: Int = 4,
      maxEpochs: Int = 2): String =
    s"""WITH tk AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source
      |), ck AS (
      |  SELECT *, tokens * $maxEpochs AS cap_tokens FROM tk
      |), tt AS (
      |  SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_sources
      |  FROM ck
      |), rk AS (
      |  SELECT c.*, t.total_tokens, t.n_sources,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cap_tokens, source)
      |      AS BIGINT) AS i,
      |    CAST(COALESCE(SUM(cap_tokens) OVER (ORDER BY cap_tokens, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS pfx,
      |    CAST((t.total_tokens * $budgetNum) // $budgetDen
      |      AS BIGINT) AS budget
      |  FROM ck c, tt t
      |), kk AS (
      |  SELECT COALESCE(MIN(CASE WHEN NOT (
      |      cap_tokens * (n_sources - i + 1) + pfx <= budget)
      |      THEN i END) - 1, MAX(i)) AS k
      |  FROM rk
      |), pk AS (
      |  SELECT CAST(COALESCE(SUM(cap_tokens), 0) AS BIGINT) AS pkv
      |  FROM rk, kk WHERE i <= k
      |)
      |SELECT source, n_docs, tokens, cap_tokens,
      |  CAST(CASE WHEN i <= k THEN cap_tokens
      |       ELSE (budget - pkv) // (n_sources - k) END
      |    AS BIGINT) AS alloc_tokens,
      |  CAST((1000 * CASE WHEN i <= k THEN cap_tokens
      |       ELSE (budget - pkv) // (n_sources - k) END) // tokens
      |    AS BIGINT) AS epochs_milli,
      |  i <= k AS capped
      |FROM rk, kk, pk
      |ORDER BY source""".stripMargin

  def pipeFingerprint: String = DocShinglesCte +
    """, mins AS (
      |  SELECT doc_id, MIN(md5(shingle)) AS min_shingle_hash
      |  FROM sh GROUP BY doc_id
      |)
      |SELECT d.doc_id AS doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
      |    ' ')) AS bag_fingerprint,
      |  list_reduce(list_prepend(7, [CAST(ascii(x) AS BIGINT)
      |      for x in string_split(text, '')]),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash,
      |  m.min_shingle_hash
      |FROM documents d LEFT JOIN mins m ON m.doc_id = d.doc_id
      |ORDER BY doc_id""".stripMargin

  def pipeMultimodal: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
      |  (CAST(strlen(text) AS BIGINT) * 31 + ascii(substr(text, 1, 1))) % 1000
      |    AS stub_feature,
      |  md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  def mktSpread1h: String = Level3Cte + QuoteCte + DedupSpreadCte +
    """, bucketed AS (
      |  SELECT *,
      |    ((ts + 3599999999) // 3600000000) * 3600000000 AS bucket_ts,
      |    ROW_NUMBER() OVER (PARTITION BY pair_id,
      |      ((ts + 3599999999) // 3600000000) * 3600000000
      |      ORDER BY ts DESC) AS rnb
      |  FROM spread_ticks
      |)
      |SELECT pair_id, bucket_ts AS ts, bid_price, bid_qty, ask_price,
      |  ask_qty
      |FROM bucketed WHERE rnb = 1 ORDER BY pair_id, ts""".stripMargin

  def mktSpreadEra: String = Level3Cte + ErasCte +
    """, etimes_e AS (
      |  SELECT DISTINCT pair_id, era_no, microtimestamp AS ts FROM l3ee
      |), live_e AS (
      |  SELECT e.pair_id, e.era_no, e.ts, l.side, l.price, l.amount
      |  FROM etimes_e e JOIN l3ee l
      |    ON l.pair_id = e.pair_id AND l.era_no = e.era_no
      |   AND l.microtimestamp <= e.ts AND l.next_microtimestamp > e.ts
      |), lvl_e AS (
      |  SELECT pair_id, era_no, ts, side, price, SUM(amount) AS qty
      |  FROM live_e GROUP BY pair_id, era_no, ts, side, price
      |), best_e AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_id, era_no, ts, side
      |    ORDER BY CASE WHEN side = 'b' THEN -price ELSE price END) AS rn
      |  FROM lvl_e
      |), quote_e AS (
      |  SELECT e.pair_id, e.era_no, e.ts,
      |    MAX(CASE WHEN b.side = 'b' THEN b.price END) AS bid_price,
      |    MAX(CASE WHEN b.side = 'b' THEN b.qty END) AS bid_qty,
      |    MAX(CASE WHEN b.side = 's' THEN b.price END) AS ask_price,
      |    MAX(CASE WHEN b.side = 's' THEN b.qty END) AS ask_qty
      |  FROM etimes_e e LEFT JOIN best_e b
      |    ON b.pair_id = e.pair_id AND b.era_no = e.era_no
      |   AND b.ts = e.ts AND b.rn = 1
      |  GROUP BY e.pair_id, e.era_no, e.ts
      |), dedup_e AS (
      |  SELECT *, ROW_NUMBER() OVER w AS rn,
      |    LAG(bid_price) OVER w AS pb, LAG(bid_qty) OVER w AS pbq,
      |    LAG(ask_price) OVER w AS pa, LAG(ask_qty) OVER w AS paq
      |  FROM quote_e WINDOW w AS (PARTITION BY pair_id, era_no ORDER BY ts)
      |)
      |SELECT pair_id, era_no, ts, bid_price, bid_qty, ask_price, ask_qty
      |FROM dedup_e
      |WHERE rn = 1 OR NOT (bid_price IS NOT DISTINCT FROM pb
      |  AND bid_qty IS NOT DISTINCT FROM pbq
      |  AND ask_price IS NOT DISTINCT FROM pa
      |  AND ask_qty IS NOT DISTINCT FROM paq)
      |ORDER BY pair_id, era_no, ts""".stripMargin

  def mktQueuesLog: String = Level3Cte + GridSnapCte +
    """, tkl AS (
      |  SELECT *, CASE WHEN side = 'b' THEN
      |      CASE WHEN best_ask IS NOT NULL THEN
      |        CAST(CEIL((CEIL(ln(best_ask) / 0.05) * 0.05 - ln(price)) / 0.05)
      |          AS BIGINT)
      |      END
      |    ELSE
      |      CASE WHEN best_bid IS NOT NULL THEN
      |        CAST(CEIL((ln(price) - FLOOR(ln(best_bid) / 0.05) * 0.05) / 0.05)
      |          AS BIGINT)
      |      END
      |    END AS tick
      |  FROM wbo
      |)
      |SELECT pair_id, g AS ts, side, tick, SUM(amount) AS volume
      |FROM tkl WHERE tick >= 1 AND tick < 11
      |GROUP BY pair_id, g, side, tick
      |ORDER BY pair_id, ts, side, tick""".stripMargin

  /** Capped per-buy matchable set — mirror of
    * `TradeMatching.matchableSells` (reference
    * `_matches_matchable_sets`, set cap 10). */
  private def MatchableSetCte: String =
    """, fl AS (
      |  SELECT pair_id, microtimestamp AS ts, order_id AS oid,
      |    event_no AS eno, side, fill
      |  FROM level3 WHERE fill > 0
      |), ms AS (
      |  SELECT b.pair_id, b.ts AS b_ts, b.oid AS b_oid, b.eno AS b_eno,
      |    b.fill AS b_fill,
      |    s.ts AS s_ts, s.oid AS s_oid, s.eno AS s_eno, s.fill AS s_fill,
      |    ABS(b.ts - s.ts) AS dist,
      |    ROW_NUMBER() OVER (PARTITION BY b.pair_id, b.oid, b.eno
      |      ORDER BY ABS(b.ts - s.ts), s.ts, s.oid, s.eno) AS srn
      |  FROM fl b JOIN fl s
      |    ON b.side = 'b' AND s.side = 's' AND b.pair_id = s.pair_id
      |   AND ABS(b.ts - s.ts) <= 3600000000
      |), msc AS (
      |  SELECT * FROM ms WHERE srn <= 10
      |)""".stripMargin

  def mktMatchSum2: String = Level3Cte + MatchableSetCte +
    """, cand AS (
      |  SELECT m1.pair_id, m1.b_ts, m1.b_oid, m1.b_eno,
      |    m1.b_fill AS fill,
      |    m1.s_ts AS s1_ts, m1.s_oid AS s1_oid, m1.s_eno AS s1_eno,
      |    m1.s_fill AS s1_fill,
      |    m2.s_ts AS s2_ts, m2.s_oid AS s2_oid, m2.s_eno AS s2_eno,
      |    m2.s_fill AS s2_fill,
      |    m1.dist + m2.dist AS dist
      |  FROM msc m1 JOIN msc m2
      |    ON m1.pair_id = m2.pair_id AND m1.b_ts = m2.b_ts
      |   AND m1.b_oid = m2.b_oid AND m1.b_eno = m2.b_eno
      |   AND m1.srn < m2.srn
      |   AND m1.s_fill + m2.s_fill = m1.b_fill
      |), ranked2 AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_id, b_oid, b_eno
      |    ORDER BY dist, s1_ts, s1_oid, s1_eno, s2_ts, s2_oid, s2_eno)
      |    AS rn
      |  FROM cand
      |)
      |SELECT pair_id, b_ts, b_oid, b_eno, fill,
      |  s1_ts, s1_oid, s1_eno, s1_fill, s2_ts, s2_oid, s2_eno, s2_fill
      |FROM ranked2 WHERE rn = 1
      |ORDER BY pair_id, b_ts, b_oid, b_eno""".stripMargin

  def mktMatchSum3: String = Level3Cte + MatchableSetCte +
    """, cand AS (
      |  SELECT m1.pair_id, m1.b_ts, m1.b_oid, m1.b_eno,
      |    m1.b_fill AS fill,
      |    m1.s_ts AS s1_ts, m1.s_oid AS s1_oid, m1.s_eno AS s1_eno,
      |    m1.s_fill AS s1_fill,
      |    m2.s_ts AS s2_ts, m2.s_oid AS s2_oid, m2.s_eno AS s2_eno,
      |    m2.s_fill AS s2_fill,
      |    m3.s_ts AS s3_ts, m3.s_oid AS s3_oid, m3.s_eno AS s3_eno,
      |    m3.s_fill AS s3_fill,
      |    m1.dist + m2.dist + m3.dist AS dist
      |  FROM msc m1 JOIN msc m2
      |    ON m1.pair_id = m2.pair_id AND m1.b_ts = m2.b_ts
      |   AND m1.b_oid = m2.b_oid AND m1.b_eno = m2.b_eno
      |   AND m1.srn < m2.srn
      |  JOIN msc m3
      |    ON m2.pair_id = m3.pair_id AND m2.b_ts = m3.b_ts
      |   AND m2.b_oid = m3.b_oid AND m2.b_eno = m3.b_eno
      |   AND m2.srn < m3.srn
      |  WHERE m1.s_fill + m2.s_fill + m3.s_fill = m1.b_fill
      |), ranked3 AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_id, b_oid, b_eno
      |    ORDER BY dist, s1_ts, s1_oid, s1_eno, s2_ts, s2_oid, s2_eno,
      |      s3_ts, s3_oid, s3_eno) AS rn
      |  FROM cand
      |)
      |SELECT pair_id, b_ts, b_oid, b_eno, fill,
      |  s1_ts, s1_oid, s1_eno, s1_fill, s2_ts, s2_oid, s2_eno, s2_fill,
      |  s3_ts, s3_oid, s3_eno, s3_fill
      |FROM ranked3 WHERE rn = 1
      |ORDER BY pair_id, b_ts, b_oid, b_eno""".stripMargin

  /** Era-surgery mirror (EraSurgery.insertEra at SnapshotMicros, pair 1):
    * split orders re-materialized at the cut, downstream chains shifted
    * by a constant per-order delta, price chains re-anchored. */
  def mktEraSplit: String = Level3Cte +
    s""", sub AS (
      |  SELECT l.*,
      |    (l.microtimestamp < $SnapshotMicros
      |      AND l.next_microtimestamp >= $SnapshotMicros) AS is_span,
      |    MAX(CASE WHEN l.microtimestamp < $SnapshotMicros
      |      AND l.next_microtimestamp >= $SnapshotMicros THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY l.order_id) = 1 AS has_span,
      |    2 - MIN(CASE WHEN l.microtimestamp >= $SnapshotMicros
      |      THEN l.event_no END) OVER (PARTITION BY l.order_id) AS delta
      |  FROM level3 l WHERE l.pair_id = 1
      |), split_out AS (
      |  SELECT microtimestamp, order_id, event_no, side, price, amount,
      |    fill,
      |    CASE WHEN is_span THEN $SnapshotMicros
      |         ELSE next_microtimestamp END AS next_microtimestamp,
      |    is_deleted, price_microtimestamp, price_event_no, pair_id,
      |    exchange_id, event_id
      |  FROM sub WHERE microtimestamp < $SnapshotMicros
      |  UNION ALL
      |  SELECT $SnapshotMicros, order_id, 1, side, price, amount, fill,
      |    next_microtimestamp, FALSE, $SnapshotMicros, 1, pair_id,
      |    exchange_id, -order_id
      |  FROM sub WHERE is_span
      |  UNION ALL
      |  SELECT microtimestamp, order_id,
      |    CASE WHEN has_span THEN event_no + delta ELSE event_no END,
      |    side, price, amount, fill, next_microtimestamp, is_deleted,
      |    CASE WHEN has_span AND price_microtimestamp < $SnapshotMicros
      |         THEN $SnapshotMicros ELSE price_microtimestamp END,
      |    CASE WHEN has_span THEN
      |        CASE WHEN price_microtimestamp < $SnapshotMicros THEN 1
      |             ELSE price_event_no + delta END
      |         ELSE price_event_no END,
      |    pair_id, exchange_id, event_id
      |  FROM sub WHERE microtimestamp >= $SnapshotMicros
      |  UNION ALL
      |  SELECT microtimestamp, order_id, event_no, side, price, amount,
      |    fill, next_microtimestamp, is_deleted, price_microtimestamp,
      |    price_event_no, pair_id, exchange_id, event_id
      |  FROM level3 WHERE pair_id <> 1
      |)
      |SELECT microtimestamp, order_id, CAST(event_no AS BIGINT) AS event_no,
      |  side, price, amount, fill, next_microtimestamp, is_deleted,
      |  price_microtimestamp, CAST(price_event_no AS BIGINT) AS price_event_no,
      |  CAST(pair_id AS BIGINT) AS pair_id,
      |  CAST(exchange_id AS BIGINT) AS exchange_id, event_id
      |FROM split_out
      |ORDER BY microtimestamp, order_id, event_no""".stripMargin

  def mktBookDiff: String = Level3Cte +
    s""", snap_a AS (
      |  SELECT pair_id, order_id, side, price, amount FROM level3
      |  WHERE microtimestamp <= $T0 AND next_microtimestamp > $T0
      |), snap_b AS (
      |  SELECT pair_id, order_id, side, price, amount FROM level3
      |  WHERE microtimestamp <= $T1 AND next_microtimestamp > $T1
      |), diffd AS (
      |  SELECT COALESCE(a.pair_id, b.pair_id) AS pair_id,
      |    COALESCE(a.order_id, b.order_id) AS order_id,
      |    COALESCE(b.side, a.side) AS side,
      |    a.price AS a_price, a.amount AS a_amount,
      |    b.price AS b_price, b.amount AS b_amount,
      |    CASE WHEN a.order_id IS NULL THEN 'created'
      |         WHEN b.order_id IS NULL THEN 'deleted'
      |         WHEN a.price <> b.price OR a.amount <> b.amount
      |           THEN 'changed'
      |         ELSE 'unchanged' END AS change
      |  FROM snap_a a FULL OUTER JOIN snap_b b
      |    ON a.pair_id = b.pair_id AND a.order_id = b.order_id
      |)
      |SELECT * FROM diffd WHERE change <> 'unchanged'
      |ORDER BY pair_id, order_id""".stripMargin

  def q06JsonProps: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events
      |)
      |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k,
      |  COUNT(CASE WHEN k IS NULL THEN 1 END) AS n_null
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  def mktCatalog: String = Level3Cte + ErasCte +
    """, exch AS (
      |  SELECT * FROM (VALUES (1, 'bitfinex'), (2, 'bitstamp'),
      |    (3, 'coinbase'), (4, 'moex')) AS t(exchange_id, exchange)
      |), prs AS (
      |  SELECT * FROM (VALUES (1, 'BTCUSD'), (2, 'LTCUSD'), (3, 'ETHUSD'),
      |    (4, 'XRPUSD'), (5, 'BCHUSD'), (6, 'BTCEUR'), (7, 'ETHBTC'),
      |    (8, 'SBERRUB'), (9, 'VTBRRUB'), (10, 'LKOHRUB'),
      |    (11, 'GAZPRUB')) AS t(pair_id, pair)
      |)
      |SELECT e.exchange, l.exchange_id, p.pair, l.pair_id,
      |  COUNT(DISTINCT l.era_no) AS n_eras,
      |  MIN(l.microtimestamp) AS period_start,
      |  MAX(l.microtimestamp) AS period_end
      |FROM l3e l
      |LEFT JOIN exch e ON e.exchange_id = l.exchange_id
      |LEFT JOIN prs p ON p.pair_id = l.pair_id
      |GROUP BY e.exchange, l.exchange_id, p.pair, l.pair_id
      |ORDER BY l.exchange_id, l.pair_id""".stripMargin

  def mktOverview: String = Level3Cte +
    """
      |SELECT pair_id, MIN(microtimestamp) AS first_event,
      |  MAX(microtimestamp) AS last_event, COUNT(*) AS n_events,
      |  COUNT(DISTINCT order_id) AS n_orders,
      |  COUNT(DISTINCT price) AS n_price_levels
      |FROM level3 GROUP BY pair_id ORDER BY pair_id""".stripMargin

  def mktObLadders: String = Level3Cte +
    s""", snapl AS (
      |  SELECT pair_id, side, price, SUM(amount) AS volume
      |  FROM level3
      |  WHERE microtimestamp <= $SnapshotMicros
      |    AND next_microtimestamp > $SnapshotMicros
      |  GROUP BY pair_id, side, price
      |), lvls AS (
      |  SELECT pair_id, side,
      |    CAST(ROUND(price * 100) AS BIGINT) AS cents,
      |    CAST(ROUND(price * 100) AS BIGINT) || 'x' ||
      |      CAST(volume AS BIGINT) AS level_str
      |  FROM snapl
      |)
      |SELECT pair_id, side, COUNT(*) AS n_levels,
      |  string_agg(level_str, ','
      |    ORDER BY CASE WHEN side = 'b' THEN -cents ELSE cents END)
      |    AS ladder
      |FROM lvls GROUP BY pair_id, side
      |ORDER BY pair_id, side""".stripMargin

  def mktObFlags: String = mktObFlagsWith(before = false, onlyMakers = false)

  /** `before` = the reference's left-open validity variant
    * (`p_before`); `onlyMakers` keeps maker rows only. */
  def mktObFlagsWith(before: Boolean, onlyMakers: Boolean): String = Level3Cte +
    s""", snapf AS (
      |  SELECT * FROM level3
      |  WHERE ${if (before)
             s"microtimestamp < $SnapshotMicros AND next_microtimestamp >= $SnapshotMicros"
           else
             s"microtimestamp <= $SnapshotMicros AND next_microtimestamp > $SnapshotMicros"}
      |), flagged_ob AS (
      |  SELECT pair_id, order_id, side, price, amount,
      |    MIN(CASE WHEN side = 's' THEN price END) OVER wf AS min_ask_b,
      |    MAX(CASE WHEN side = 'b' THEN price END) OVER wf AS max_bid_b,
      |    MIN(CASE WHEN side = 's' THEN price END) OVER wr AS min_ask_a,
      |    MAX(CASE WHEN side = 'b' THEN price END) OVER wr AS max_bid_a
      |  FROM snapf
      |  WINDOW wf AS (PARTITION BY pair_id
      |      ORDER BY price_microtimestamp, microtimestamp, order_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    wr AS (PARTITION BY pair_id
      |      ORDER BY price_microtimestamp DESC, microtimestamp DESC,
      |        order_id DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |)
      |SELECT pair_id, order_id, side, price, amount, is_maker, is_crossed
      |FROM (
      |  SELECT pair_id, order_id, side, price, amount,
      |    CASE side WHEN 'b' THEN price < COALESCE(min_ask_b, 1e308)
      |         ELSE price > COALESCE(max_bid_b, -1e308) END AS is_maker,
      |    CASE side WHEN 'b' THEN price >= COALESCE(min_ask_a, 1e308)
      |         ELSE price <= COALESCE(max_bid_a, -1e308) END AS is_crossed
      |  FROM flagged_ob
      |) ${if (onlyMakers) "WHERE is_maker" else ""}
      |ORDER BY pair_id, order_id""".stripMargin

  /** Mirror of `TextPipeline.curate`: the end-to-end curation
    * composition (quality gate → exact dedup → near-dup
    * canonicalization → decontamination → split + token counts) as one
    * recursive query. Stages reuse the per-operator oracles' exact
    * formulas, so any stage divergence surfaces as a hash mismatch
    * here even if the per-operator entries pass. */
  def pipeE2e: String =
    s"""WITH RECURSIVE qual AS (
      |  SELECT doc_id, $qualityScoreSql AS quality_score
      |  FROM documents WHERE doc_id >= 10
      |), kept AS (
      |  SELECT d.doc_id, d.text FROM documents d JOIN qual USING (doc_id)
      |  WHERE qual.quality_score >= 0.5
      |), uniq AS (
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
      |    FROM kept) WHERE doc_id = keep_id
      |), w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM uniq
      |), sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(words)-1),
      |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
      |  FROM w
      |)""".stripMargin + MinhashHhBnd + """, cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bnd a JOIN bnd c
      |    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |), e AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM cand
      |  UNION ALL SELECT doc_b, doc_a FROM cand
      |), reach AS (
      |  SELECT doc_id, doc_id AS label FROM uniq
      |  UNION
      |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN e ON e.src = r.doc_id
      |), lab AS (
      |  SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
      |), sz AS (
      |  SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id
      |), canon AS (
      |  SELECT doc_id, cluster_size FROM lab JOIN sz USING (cluster_id)
      |  WHERE doc_id = cluster_id
      |), shb AS (
      |  SELECT DISTINCT unnest(list_transform(range(1, len(words)-1),
      |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
      |  FROM (SELECT string_split(text, ' ') AS words FROM documents
      |        WHERE doc_id < 10)
      |), ov AS (
      |  SELECT s.doc_id, COUNT(*) AS n_shingles,
      |    SUM(CASE WHEN s.shingle IN (SELECT shingle FROM shb)
      |        THEN 1 ELSE 0 END) AS n_overlap
      |  FROM sh s JOIN canon USING (doc_id)
      |  GROUP BY s.doc_id
      |)
      |SELECT u.doc_id AS doc_id, q.quality_score, c.cluster_size,
      |  CAST(len(string_split(u.text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST((ascii(substr(md5(u.text), 1, 1)) * 256 +
      |    ascii(substr(md5(u.text), 2, 1))) % 100 AS BIGINT) AS bucket,
      |  CASE WHEN (ascii(substr(md5(u.text), 1, 1)) * 256 +
      |      ascii(substr(md5(u.text), 2, 1))) % 100 < 80 THEN 'train'
      |    WHEN (ascii(substr(md5(u.text), 1, 1)) * 256 +
      |      ascii(substr(md5(u.text), 2, 1))) % 100 < 90 THEN 'val'
      |    ELSE 'test' END AS split
      |FROM uniq u JOIN canon c USING (doc_id) JOIN qual q USING (doc_id)
      |JOIN ov USING (doc_id)
      |WHERE NOT (ov.n_overlap * 10 >= ov.n_shingles)
      |ORDER BY doc_id""".stripMargin

  /** Closed-form mirror of `Multimodal.wavFeatures`: the WAV payload's
    * samples are `s(i) = (doc_id·31 + i·17) mod 4096 − 2048`, so the
    * decoded statistics are computable without the bytes — the Spark
    * side must encode AND decode the real RIFF/PCM16 container
    * correctly to reproduce them. */
  def pipeMediaWav: String =
    """SELECT doc_id,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(1 AS BIGINT) AS n_channels,
      |  CAST(256 + doc_id % 100 AS BIGINT) AS n_samples,
      |  CAST(list_aggregate(list_transform(range(0, 256 + doc_id % 100),
      |    i -> abs((doc_id*31 + i*17) % 4096 - 2048)), 'max') AS BIGINT)
      |    AS peak,
      |  CAST(list_aggregate(list_transform(range(0, 256 + doc_id % 100),
      |    i -> (doc_id*31 + i*17) % 4096 - 2048), 'sum') AS BIGINT)
      |    AS sum_samples,
      |  CAST(list_aggregate(list_transform(range(0, 256 + doc_id % 100),
      |    i -> ((doc_id*31 + i*17) % 4096 - 2048)
      |       * ((doc_id*31 + i*17) % 4096 - 2048)), 'sum') AS BIGINT)
      |    AS sum_sq
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Closed-form mirror of `Multimodal.wavZcrFeatures`: strict
    * sign-flip crossings `s(i−1)·s(i) < 0` over the sample formula,
    * plus the peak. */
  def pipeMediaWavZcr: String =
    """SELECT doc_id,
      |  CAST(256 + doc_id % 100 AS BIGINT) AS n_samples,
      |  CAST(list_aggregate(list_transform(range(1, 256 + doc_id % 100),
      |    i -> CASE WHEN ((doc_id*31 + (i-1)*17) % 4096 - 2048)
      |              * ((doc_id*31 + i*17) % 4096 - 2048) < 0
      |         THEN 1 ELSE 0 END), 'sum') AS BIGINT) AS zero_crossings,
      |  CAST(list_aggregate(list_transform(range(0, 256 + doc_id % 100),
      |    i -> abs((doc_id*31 + i*17) % 4096 - 2048)), 'max') AS BIGINT)
      |    AS peak
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Closed-form mirror of `Multimodal.ppmFeatures` (P6 pixel bytes
    * `p(j) = (doc_id·7 + j·13) mod 256`, RGB interleaved). */
  def pipeMediaPpm: String =
    """SELECT doc_id,
      |  CAST(4 + doc_id % 5 AS BIGINT) AS width,
      |  CAST(3 + doc_id % 4 AS BIGINT) AS height,
      |  CAST((4 + doc_id % 5) * (3 + doc_id % 4) AS BIGINT) AS n_pixels,
      |  CAST(list_aggregate(list_transform(
      |    list_filter(range(0, 3*(4 + doc_id % 5)*(3 + doc_id % 4)),
      |      j -> j % 3 = 0), j -> (doc_id*7 + j*13) % 256), 'sum')
      |    AS BIGINT) AS sum_r,
      |  CAST(list_aggregate(list_transform(
      |    list_filter(range(0, 3*(4 + doc_id % 5)*(3 + doc_id % 4)),
      |      j -> j % 3 = 1), j -> (doc_id*7 + j*13) % 256), 'sum')
      |    AS BIGINT) AS sum_g,
      |  CAST(list_aggregate(list_transform(
      |    list_filter(range(0, 3*(4 + doc_id % 5)*(3 + doc_id % 4)),
      |      j -> j % 3 = 2), j -> (doc_id*7 + j*13) % 256), 'sum')
      |    AS BIGINT) AS sum_b
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Closed-form mirror of `Multimodal.ppmHashDedup`: the 4×4
    * average-hash computed from the payload's pixel formula
    * `p(j) = (doc_id·7 + j·13) mod 256` — cell (gy,gx) reads pixel
    * (gx·w//4, gy·h//4), luma = r+g+b, bit set iff 16·luma > Σ —
    * then the exact-dedup keeper window over the hash. The Spark side
    * must parse real P6 bytes to reproduce these signatures. */
  def pipeMediaPhash: String =
    """WITH dims AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents
      |), cell AS (
      |  SELECT doc_id, gy, gx,
      |    (doc_id*7 + (3*((gy*h//4)*w + (gx*w//4)) + 0)*13) % 256
      |    + (doc_id*7 + (3*((gy*h//4)*w + (gx*w//4)) + 1)*13) % 256
      |    + (doc_id*7 + (3*((gy*h//4)*w + (gx*w//4)) + 2)*13) % 256 AS lum
      |  FROM dims, range(4) t1(gy), range(4) t2(gx)
      |), tot AS (
      |  SELECT doc_id, SUM(lum) AS tot FROM cell GROUP BY doc_id
      |), sig AS (
      |  SELECT c.doc_id,
      |    CAST(SUM(CASE WHEN lum*16 > tot
      |      THEN CAST(POW(2, gy*4+gx) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS ahash
      |  FROM cell c JOIN tot USING (doc_id) GROUP BY c.doc_id
      |)
      |SELECT s.doc_id AS doc_id,
      |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
      |  ahash,
      |  MIN(s.doc_id) OVER (PARTITION BY ahash) AS keep_id,
      |  COUNT(*) OVER (PARTITION BY ahash) AS group_size,
      |  s.doc_id <> MIN(s.doc_id) OVER (PARTITION BY ahash) AS is_dup
      |FROM sig s JOIN dims d ON d.doc_id = s.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Mirror of `Multimodal.ppmHashNearDup` by the OPPOSITE
    * formulation: exact all-pairs Hamming over the closed-form aHash
    * (the engine goes through the 6/5/5 pigeonhole band join — a
    * lost-candidate band bug diverges here). */
  def pipeMediaPhashNear(tau: Int = 2): String =
    """WITH dims AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents
      |), cell AS (
      |  SELECT doc_id, gy, gx,
      |    (doc_id*7 + (3*((gy*h//4)*w + (gx*w//4)) + 0)*13) % 256
      |    + (doc_id*7 + (3*((gy*h//4)*w + (gx*w//4)) + 1)*13) % 256
      |    + (doc_id*7 + (3*((gy*h//4)*w + (gx*w//4)) + 2)*13) % 256 AS lum
      |  FROM dims, range(4) t1(gy), range(4) t2(gx)
      |), tot AS (
      |  SELECT doc_id, SUM(lum) AS tot FROM cell GROUP BY doc_id
      |), sig AS (
      |  SELECT c.doc_id,
      |    CAST(SUM(CASE WHEN lum*16 > tot
      |      THEN CAST(POW(2, gy*4+gx) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS ahash
      |  FROM cell c JOIN tot USING (doc_id) GROUP BY c.doc_id
      |), prs AS (
      |  SELECT a.doc_id AS d, b.doc_id AS o
      |  FROM sig a JOIN sig b ON a.doc_id <> b.doc_id
      |""".stripMargin +
    s"""    AND bit_count(xor(a.ahash, b.ahash)) <= $tau
      |), near AS (
      |  SELECT d AS doc_id, MIN(o) AS near_min_id,
      |    CAST(COUNT(DISTINCT o) AS BIGINT) AS n_near
      |  FROM prs GROUP BY d
      |)
      |SELECT s.doc_id, s.ahash, n.near_min_id,
      |  COALESCE(n.n_near, 0) AS n_near,
      |  COALESCE(n.near_min_id < s.doc_id, FALSE) AS is_near_dup
      |FROM sig s LEFT JOIN near n USING (doc_id)
      |ORDER BY s.doc_id""".stripMargin

  /** Closed-form mirror of `Multimodal.y4mFrameDiffs`: per adjacent
    * frame pair, Σ|y_f(j) − y_{f−1}(j)| over the luma plane of the
    * frame formula `(doc_id·13 + f·7 + j·23) mod 256`. */
  def pipeMediaY4mSad: String =
    """WITH dims AS (
      |  SELECT doc_id, 4 + 2*(doc_id % 3) AS w, 4 + 2*(doc_id % 2) AS h,
      |    3 + doc_id % 6 AS nf
      |  FROM documents
      |), fr AS (
      |  SELECT doc_id, w, h, unnest(range(1, nf)) AS f FROM dims
      |)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
      |  CAST(list_aggregate(list_transform(range(0, w*h),
      |    j -> abs((doc_id*13 + f*7 + j*23) % 256
      |           - (doc_id*13 + (f-1)*7 + j*23) % 256)), 'sum') AS BIGINT)
      |    AS sad_y
      |FROM fr ORDER BY doc_id, frame_no""".stripMargin

  /** Closed-form mirror of `Multimodal.pngFeatures` (PNG pixel bytes
    * `p(j) = (doc_id·11 + j·19) mod 256`, RGB row-major — the Spark
    * side must round-trip the real deflate/CRC/filter container to
    * reproduce these sums). */
  def pipeMediaPng: String =
    """WITH dims AS (
      |  SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(w AS BIGINT) AS width,
      |  CAST(h AS BIGINT) AS height,
      |  CAST(w * h AS BIGINT) AS n_pixels,
      |  CAST(list_aggregate(list_transform(
      |    list_filter(range(0, 3*w*h), j -> j % 3 = 0),
      |    j -> (doc_id*11 + j*19) % 256), 'sum') AS BIGINT) AS sum_r,
      |  CAST(list_aggregate(list_transform(
      |    list_filter(range(0, 3*w*h), j -> j % 3 = 1),
      |    j -> (doc_id*11 + j*19) % 256), 'sum') AS BIGINT) AS sum_g,
      |  CAST(list_aggregate(list_transform(
      |    list_filter(range(0, 3*w*h), j -> j % 3 = 2),
      |    j -> (doc_id*11 + j*19) % 256), 'sum') AS BIGINT) AS sum_b
      |FROM dims ORDER BY doc_id""".stripMargin

  /** Closed-form mirror of `Multimodal.jpegFeatures`: the synthesized
    * profile (per-8×8-block constant pixels, all-ones quantization) is
    * exactly round-trippable, so the decoded luma sum is 64× the sum of
    * the block constants. */
  def pipeMediaJpeg: String =
    """WITH dims AS (
      |  SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(8 * bw AS BIGINT) AS width,
      |  CAST(8 * bh AS BIGINT) AS height,
      |  CAST(64 * bw * bh AS BIGINT) AS n_pixels,
      |  CAST(64 * list_aggregate(list_transform(range(0, bw * bh),
      |    b -> (doc_id*17 + b*29) % 256), 'sum') AS BIGINT) AS sum_luma
      |FROM dims ORDER BY doc_id""".stripMargin

  /** Closed-form mirror of `Multimodal.ppmResizeFeatures`:
    * nearest-neighbor half resize maps target pixel (x, y) to source
    * byte `3·(2y·w + 2x) + c`, so the resized sums are computable from
    * the source formula `p(j) = (doc_id·7 + j·13) mod 256` alone. */
  /** Mirror of `Multimodal.ppmLetterboxFeatures`: the letterbox maps
    * out pixel (x, y) of the sw×sh scaled region to source
    * (x·w//sw, y·h//sh) under the closed-form pixel formula; the
    * black padding contributes nothing to the channel sums. */
  def pipeMediaLetterbox(side: Int = 8): String = {
    def chan(c: Int) =
      s"""CAST(list_aggregate(flatten(list_transform(range(0, sh), y ->
         |    list_transform(range(0, sw), x ->
         |      (doc_id*7 + (3*(((y*h)//sh)*w + ((x*w)//sw)) + $c)*13)
         |        % 256))),
         |    'sum') AS BIGINT)""".stripMargin
    s"""WITH dims0 AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents
      |), dims AS (
      |  SELECT doc_id, w, h,
      |    GREATEST(1, (w * $side) // GREATEST(w, h)) AS sw,
      |    GREATEST(1, (h * $side) // GREATEST(w, h)) AS sh
      |  FROM dims0
      |)
      |SELECT doc_id,
      |  CAST($side AS BIGINT) AS width,
      |  CAST($side AS BIGINT) AS height,
      |  CAST($side * $side AS BIGINT) AS n_pixels,
      |  ${chan(0)} AS sum_r,
      |  ${chan(1)} AS sum_g,
      |  ${chan(2)} AS sum_b
      |FROM dims ORDER BY doc_id""".stripMargin
  }

  def pipeMediaResize: String = {
    def chan(c: Int) =
      s"""CAST(list_aggregate(flatten(list_transform(range(0, h2), y ->
         |    list_transform(range(0, w2), x ->
         |      (doc_id*7 + (3*(2*y*w + 2*x) + $c)*13) % 256))),
         |    'sum') AS BIGINT)""".stripMargin
    s"""WITH dims AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
      |    GREATEST(1, (4 + doc_id % 5) // 2) AS w2,
      |    GREATEST(1, (3 + doc_id % 4) // 2) AS h2
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(w2 AS BIGINT) AS width,
      |  CAST(h2 AS BIGINT) AS height,
      |  CAST(w2 * h2 AS BIGINT) AS n_pixels,
      |  ${chan(0)} AS sum_r,
      |  ${chan(1)} AS sum_g,
      |  ${chan(2)} AS sum_b
      |FROM dims ORDER BY doc_id""".stripMargin
  }

  /** Closed-form mirror of `Multimodal.y4mFeatures`: frame `f` payload
    * byte `j` is `(doc_id·13 + f·7 + j·23) mod 256` over concatenated
    * Y,U,V planes; only even frames are sampled (step 2). */
  def pipeMediaY4m: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |    4 + 2*(doc_id % 3) AS w, 4 + 2*(doc_id % 2) AS h,
      |    3 + doc_id % 6 AS nf
      |  FROM documents
      |), planes AS (
      |  SELECT doc_id, w, h, nf, w*h AS ysz, w*h//4 AS csz,
      |    list_filter(range(0, nf), f -> f % 2 = 0) AS sampled
      |  FROM dims
      |)
      |SELECT doc_id,
      |  CAST(w AS BIGINT) AS width,
      |  CAST(h AS BIGINT) AS height,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(len(sampled) AS BIGINT) AS n_sampled,
      |  CAST(list_aggregate(list_transform(sampled, f ->
      |    list_aggregate(list_transform(range(0, ysz),
      |      j -> (doc_id*13 + f*7 + j*23) % 256), 'sum')), 'sum')
      |    AS BIGINT) AS sum_y,
      |  CAST(list_aggregate(list_transform(sampled, f ->
      |    list_aggregate(list_transform(range(ysz, ysz + csz),
      |      j -> (doc_id*13 + f*7 + j*23) % 256), 'sum')), 'sum')
      |    AS BIGINT) AS sum_u,
      |  CAST(list_aggregate(list_transform(sampled, f ->
      |    list_aggregate(list_transform(range(ysz + csz, ysz + 2*csz),
      |      j -> (doc_id*13 + f*7 + j*23) % 256), 'sum')), 'sum')
      |    AS BIGINT) AS sum_v
      |FROM planes ORDER BY doc_id""".stripMargin

  def pipeDecontaminate: String = DocShinglesCte +
    """, bench AS (
      |  SELECT DISTINCT shingle FROM sh WHERE doc_id < 10
      |), corpus AS (
      |  SELECT * FROM sh WHERE doc_id >= 10
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id
      |), overl AS (
      |  SELECT doc_id, COUNT(*) AS n_overlap FROM corpus
      |  WHERE shingle IN (SELECT shingle FROM bench)
      |  GROUP BY doc_id
      |)
      |SELECT s.doc_id AS doc_id, n_shingles,
      |  COALESCE(n_overlap, 0) AS n_overlap,
      |  COALESCE(n_overlap, 0) * 10 >= n_shingles AS is_contaminated
      |FROM sizes s LEFT JOIN overl o ON o.doc_id = s.doc_id
      |ORDER BY doc_id""".stripMargin

  def pipeSplit: String =
    """SELECT doc_id,
      |  CAST((ascii(substr(md5(text), 1, 1)) * 256 +
      |    ascii(substr(md5(text), 2, 1))) % 100 AS BIGINT) AS bucket,
      |  CASE WHEN (ascii(substr(md5(text), 1, 1)) * 256 +
      |      ascii(substr(md5(text), 2, 1))) % 100 < 80 THEN 'train'
      |    WHEN (ascii(substr(md5(text), 1, 1)) * 256 +
      |      ascii(substr(md5(text), 2, 1))) % 100 < 90 THEN 'val'
      |    ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirror of `TextPipeline.tfidfTerms` (k = 3): per-term nano
    * idf = round(1e9·ln((N+1)/(df+1))), per-doc integer score
    * tf·idf_nano, top 3 per doc with term tiebreak. */
  def pipeTfidfTerms: String =
    """WITH wv AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM wv GROUP BY doc_id, word
      |), idf AS (
      |  SELECT word, CAST(ROUND(LN(
      |      ((SELECT COUNT(*) FROM documents) + CAST(1 AS DOUBLE)) /
      |      CAST(COUNT(*) + 1 AS DOUBLE)) * 1000000000) AS BIGINT)
      |    AS idf_nano
      |  FROM tf GROUP BY word
      |), s AS (
      |  SELECT doc_id, tf.word AS word, tf, tf * idf_nano AS score_nano,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY tf * idf_nano DESC, tf.word) AS BIGINT) AS rnk
      |  FROM tf JOIN idf USING (word)
      |)
      |SELECT doc_id, rnk, word, tf, score_nano FROM s WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  /** Mirror of `TextPipeline.cmsHeavyHitters` (depth 3, width 512,
    * top 20): the count–min grid rebuilt cell-for-cell — bucket =
    * md5-half of `r#word` mod width (the [[hexHalf]] spelling of
    * Spark's `conv(substring(md5(..),1,8),16,10)`), estimate = MIN
    * over the word's depth cells. */
  /** The count–min grid CTEs (`wc`, `rb`, `sk`), shared by the batch
    * heavy-hitters mirror and the streaming-grid mirror. */
  private def CmsGridCte: String =
    s"""WITH w AS (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
      |), wc AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY word
      |), rh AS (
      |  SELECT t.r, word, cnt, md5(t.r || '#' || word) AS dig
      |  FROM wc, range(0, 3) t(r)
      |), rb AS (
      |  SELECT r, word, cnt, (${hexHalf(1)}) % 512 AS bucket FROM rh
      |), sk AS (
      |  SELECT r, bucket, CAST(SUM(cnt) AS BIGINT) AS cell
      |  FROM rb GROUP BY r, bucket
      |)""".stripMargin

  /** Mirror of `StreamingOps.cmsReplay`'s final grid: the monotone
    * cell totals after the whole stream equal the batch grid. */
  def pipeCmsGrid: String = CmsGridCte +
    """
      |SELECT CAST(r AS BIGINT) AS r, bucket, cell FROM sk
      |ORDER BY r, bucket""".stripMargin

  def pipeCmsHeavy: String = CmsGridCte +
    s""", topw AS (
      |  SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT 20
      |)
      |SELECT t.word AS word, t.cnt AS exact,
      |  CAST(MIN(sk.cell) AS BIGINT) AS est,
      |  CAST(MIN(sk.cell) - t.cnt AS BIGINT) AS overcount
      |FROM topw t JOIN rb ON rb.word = t.word
      |JOIN sk ON sk.r = rb.r AND sk.bucket = rb.bucket
      |GROUP BY t.word, t.cnt
      |ORDER BY exact DESC, word""".stripMargin

  /** Mirror of `TextPipeline.pmiBigrams` (minCount 5, top 20): the
    * same counts and the same ln-expression tree, so the nano PMI is
    * bit-identical. */
  def pipePmiBigrams: String =
    """WITH w AS (
      |  SELECT string_split(text, ' ') AS ws FROM documents
      |), uni AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS u
      |  FROM (SELECT unnest(ws) AS word FROM w) GROUP BY word
      |), nt AS (
      |  SELECT CAST(SUM(u) AS BIGINT) AS n FROM uni
      |), bg AS (
      |  SELECT ws[i] AS w1, ws[i+1] AS w2
      |  FROM w, LATERAL unnest(range(1, len(ws))) AS g(i)
      |), bc AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS b
      |  FROM bg GROUP BY w1, w2
      |), mt AS (
      |  SELECT CAST(SUM(b) AS BIGINT) AS m FROM bc
      |), sc AS (
      |  SELECT bc.w1, bc.w2, bc.b AS b_cnt,
      |    CAST(ROUND(LN((CAST(bc.b AS DOUBLE) * nt.n * nt.n) /
      |      (CAST(mt.m AS DOUBLE) * u1.u * u2.u)) * 1000000000.0)
      |      AS BIGINT) AS pmi_nano
      |  FROM bc
      |  JOIN uni u1 ON u1.word = bc.w1
      |  JOIN uni u2 ON u2.word = bc.w2, nt, mt
      |  WHERE bc.b >= 5
      |), topb AS (
      |  SELECT * FROM sc ORDER BY pmi_nano DESC, w1, w2 LIMIT 20
      |)
      |SELECT w1, w2, b_cnt, pmi_nano,
      |  CAST(ROW_NUMBER() OVER (ORDER BY pmi_nano DESC, w1, w2)
      |    AS BIGINT) AS rnk
      |FROM topb ORDER BY rnk""".stripMargin

  def pipeVocab: String =
    """WITH wv AS (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
      |), counts AS (
      |  SELECT word, COUNT(*) AS n FROM wv GROUP BY word
      |), rankedv AS (
      |  SELECT word, n,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS BIGINT) AS rnk
      |  FROM counts
      |)
      |SELECT word, n, rnk FROM rankedv WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  def pipeChunk: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |), n AS (
      |  SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n_words FROM w
      |), k AS (
      |  SELECT doc_id, words, unnest(range(0,
      |    1 + CASE WHEN n_words <= 40 THEN 0
      |             ELSE (n_words - 40 + 29) // 30 END)) AS k
      |  FROM n
      |)
      |SELECT doc_id, k AS chunk_no, k * 30 + 1 AS start_word,
      |  CAST(len(words[(k*30+1):(k*30+40)]) AS BIGINT) AS chunk_words,
      |  md5(array_to_string(words[(k*30+1):(k*30+40)], ' ')) AS chunk_hash
      |FROM k ORDER BY doc_id, chunk_no""".stripMargin

  /** Milli-quantized embedding elements + the int8 requantization
    * (`round(q·127/max_abs)` in pure integer arithmetic — the same
    * formula as `TrainingData.withQ8`). */
  private def Q8Cte: String =
    """WITH ev AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
      |  FROM embeddings
      |), ma AS (
      |  SELECT vec_id, MAX(ABS(q)) AS max_abs FROM ev GROUP BY vec_id
      |), e8 AS (
      |  SELECT ev.vec_id, i, q, max_abs,
      |    CASE WHEN max_abs = 0 THEN 0
      |         WHEN q < 0 THEN -((-q * 254 + max_abs) // (2 * max_abs))
      |         ELSE (q * 254 + max_abs) // (2 * max_abs) END AS q8
      |  FROM ev JOIN ma ON ma.vec_id = ev.vec_id
      |)""".stripMargin

  def pipeQuantize: String = Q8Cte +
    """
      |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
      |  MAX(max_abs) AS max_abs_milli,
      |  CAST(SUM(q8) AS BIGINT) AS sum_q8,
      |  CAST(SUM(q8 * q8) AS BIGINT) AS norm_q8,
      |  md5(string_agg(CAST(q8 AS VARCHAR), ',' ORDER BY i)) AS q8_md5
      |FROM e8 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  def pipeAnnQ8: String = Q8Cte +
    """, n8 AS (
      |  SELECT vec_id, CAST(SUM(q8 * q8) AS BIGINT) AS n8 FROM e8 GROUP BY vec_id
      |), qd AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS vb,
      |    CAST(SUM(a.q8 * b.q8) AS BIGINT) AS dot
      |  FROM e8 a JOIN e8 b ON a.i = b.i AND a.vec_id < 5 AND b.vec_id <> a.vec_id
      |  GROUP BY a.vec_id, b.vec_id
      |), cc AS (
      |  SELECT query_id, vb, CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(na.n8 AS DOUBLE)) * SQRT(CAST(nb.n8 AS DOUBLE))) AS cos
      |  FROM qd JOIN n8 na ON na.vec_id = query_id JOIN n8 nb ON nb.vec_id = vb
      |  WHERE na.n8 > 0 AND nb.n8 > 0
      |), rq AS (
      |  SELECT query_id, vb, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, vb) AS BIGINT) AS rnk
      |  FROM cc
      |)
      |SELECT query_id, rnk, vb AS vec_id, cos FROM rq WHERE rnk <= 10
      |ORDER BY query_id, rnk""".stripMargin

  /** Mirror of `VectorOps.labelCentroidSim`: per-label floorDiv-mean
    * centroid over milli-quantized vectors (the exact-integer identity
    * `(s − ((s % n) + n) % n) // n` = Java floorDiv), pairwise centroid
    * cosine. */
  def pipeLabelSim: String =
    """WITH ev AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS p,
      |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
      |  FROM embeddings
      |), cent AS (
      |  SELECT label, p,
      |    CAST((SUM(q) - ((SUM(q) % COUNT(*)) + COUNT(*)) % COUNT(*))
      |      // COUNT(*) AS BIGINT) AS c
      |  FROM ev GROUP BY label, p
      |), nrm AS (
      |  SELECT label, SUM(c*c) AS cn FROM cent GROUP BY label
      |), cnts AS (
      |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM embeddings GROUP BY label
      |), pr AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |    CAST(SUM(a.c * b.c) AS BIGINT) AS dot
      |  FROM cent a JOIN cent b ON a.p = b.p AND a.label < b.label
      |  GROUP BY a.label, b.label
      |)
      |SELECT CAST(label_a AS BIGINT) AS label_a,
      |  CAST(label_b AS BIGINT) AS label_b,
      |  ca.n_docs AS n_a, cb.n_docs AS n_b,
      |  CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(na.cn AS DOUBLE)) * SQRT(CAST(nb.cn AS DOUBLE))) AS cos
      |FROM pr
      |JOIN nrm na ON na.label = label_a
      |JOIN nrm nb ON nb.label = label_b
      |JOIN cnts ca ON ca.label = label_a
      |JOIN cnts cb ON cb.label = label_b
      |ORDER BY label_a, label_b""".stripMargin

  def pipeSourceMix: String =
    """WITH m AS (
      |  SELECT doc_id, source,
      |    CASE WHEN TRY_CAST(substr(source, 4) AS INT) < 10
      |      THEN CAST(2 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS weight,
      |    CAST((ascii(substr(md5('mix#' || text), 1, 1)) * 65536 +
      |          ascii(substr(md5('mix#' || text), 2, 1)) * 256 +
      |          ascii(substr(md5('mix#' || text), 3, 1))) % 1000 AS BIGINT) AS bucket
      |  FROM documents
      |)
      |SELECT doc_id, source, weight, bucket,
      |  bucket * 4 < weight * 1000 AS kept
      |FROM m ORDER BY doc_id""".stripMargin

  def pipePack(nShards: Int = 16, capacity: Long = 256): String =
    packChain(nShards, capacity) +
      """
        |SELECT shard, doc_id, pos, toks, bin_no, bin_offset FROM rp
        |ORDER BY shard, pos""".stripMargin

  /** Mirror of `TrainingData.packStats`: one GROUP BY over the
    * [[pipePack]] recursion — bin count = max bin_no (bins are 1-based
    * and dense within a shard), waste = bins·capacity − Σtoks,
    * fill_ppm in integer division so the report is engine-exact. */
  def pipePackStats(nShards: Int = 16, capacity: Long = 256): String =
    packChain(nShards, capacity) +
      s"""
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MAX(bin_no) AS n_bins, CAST(SUM(toks) AS BIGINT) AS total_toks,
        |  CAST(MAX(bin_no) * $capacity - SUM(toks) AS BIGINT) AS waste_toks,
        |  CAST(SUM(toks) * 1000000 // (MAX(bin_no) * $capacity) AS BIGINT) AS fill_ppm
        |FROM rp GROUP BY shard ORDER BY shard""".stripMargin

  /** The first-fit packing recursion (`rp(shard, doc_id, pos, toks,
    * bin_no, bin_offset, fill)`), shared by [[pipePack]] and
    * [[pipePackStats]] — mirrors `TrainingData.packSequences`. */
  private def packChain(nShards: Int, capacity: Long): String = {
    val hexPrefix = (1 to 4).map { i =>
      val p = math.pow(16, 4 - i).toLong
      s"(strpos('0123456789abcdef', substr(md5(text), $i, 1)) - 1) * $p"
    }.mkString(" + ")
    s"""WITH RECURSIVE d AS (
      |  SELECT doc_id, md5(text) AS sample_hash,
      |    CAST(($hexPrefix) % $nShards AS BIGINT) AS shard,
      |    LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), $capacity) AS toks
      |  FROM documents
      |), o AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY shard
      |    ORDER BY sample_hash, doc_id) AS BIGINT) AS pos
      |  FROM d
      |), rp AS (
      |  SELECT shard, doc_id, pos, toks, CAST(1 AS BIGINT) AS bin_no,
      |    CAST(0 AS BIGINT) AS bin_offset, toks AS fill
      |  FROM o WHERE pos = 1
      |  UNION ALL
      |  SELECT o.shard, o.doc_id, o.pos, o.toks,
      |    CASE WHEN rp.fill + o.toks > $capacity THEN rp.bin_no + 1 ELSE rp.bin_no END,
      |    CASE WHEN rp.fill + o.toks > $capacity THEN 0 ELSE rp.fill END,
      |    CASE WHEN rp.fill + o.toks > $capacity THEN o.toks ELSE rp.fill + o.toks END
      |  FROM rp JOIN o ON o.shard = rp.shard AND o.pos = rp.pos + 1
      |)""".stripMargin
  }

  /** The BPE training CTE chain: word-frequency dictionary,
    * character-level symbolization, then one (pair-count → argmax →
    * greedy-leftmost apply) block per merge round. Each round's apply
    * step is a linear recursion over symbol positions; the MATERIALIZED
    * hints stop DuckDB from inlining the chain (each round is consumed
    * twice, which would otherwise re-expand exponentially). Mirrors
    * `TrainingData.bpeTrain` exactly. */
  private def bpeChain(nMerges: Int): String = {
    val sb = new StringBuilder(
      """WITH RECURSIVE wf AS MATERIALIZED (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |  GROUP BY word
        |), s0 AS MATERIALIZED (
        |  SELECT word, freq,
        |    list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS syms
        |  FROM wf
        |)""".stripMargin)
    for (r <- 1 to nMerges) {
      val prev = s"s${r - 1}"
      sb.append(s""", p$r AS MATERIALIZED (
        |  SELECT p['l'] AS l, p['r'] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
        |  FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i + 1]})) AS p
        |    FROM $prev WHERE len(syms) >= 2
        |  )
        |  GROUP BY 1, 2
        |), b$r AS MATERIALIZED (
        |  SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l, r LIMIT 1
        |), a$r AS (
        |  SELECT word, freq, syms, 1 AS i, CAST([] AS VARCHAR[]) AS out FROM $prev
        |  UNION ALL
        |  SELECT a.word, a.freq, a.syms,
        |    CASE WHEN a.i + 1 <= len(a.syms) AND a.syms[a.i] = b.l AND a.syms[a.i + 1] = b.r
        |      THEN a.i + 2 ELSE a.i + 1 END,
        |    CASE WHEN a.i + 1 <= len(a.syms) AND a.syms[a.i] = b.l AND a.syms[a.i + 1] = b.r
        |      THEN list_append(a.out, b.l || b.r) ELSE list_append(a.out, a.syms[a.i]) END
        |  FROM a$r a, b$r b WHERE a.i <= len(a.syms)
        |), s$r AS MATERIALIZED (
        |  SELECT word, freq, out AS syms FROM a$r WHERE i > len(syms)
        |)""".stripMargin)
    }
    sb.toString
  }

  def pipeBpe(nMerges: Int = 8): String =
    bpeChain(nMerges) + "\n" + (1 to nMerges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_no, l AS lft, r AS rgt, " +
        s"l || r AS merged, cnt AS pair_count FROM b$r")
      .mkString("\nUNION ALL ") + "\nORDER BY merge_no"

  def pipeBpeTokens(nMerges: Int = 8): String =
    bpeChain(nMerges) +
      s"""
        |, dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |SELECT doc_id, CAST(SUM(len(s.syms)) AS BIGINT) AS n_bpe_tokens
        |FROM dw JOIN s$nMerges s USING (word) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin

  /** Mirror of `TrainingData.bpeCoverage`: per-source exact sums over
    * the trained dictionary's symbol lists, ratios as one double
    * division (symbols concatenate back to the word, so n_chars is
    * just SUM(len(word)) over occurrences). */
  def pipeBpeCoverage(nMerges: Int = 8): String =
    bpeChain(nMerges) +
      s"""
        |, dw AS (SELECT d.source, unnest(string_split(d.text, ' ')) AS word
        |         FROM documents d)
        |, agg AS (
        |  SELECT d.source,
        |    CAST(SUM(len(s.syms)) AS BIGINT) AS n_tokens,
        |    CAST(SUM(len(word)) AS BIGINT) AS n_chars,
        |    CAST(SUM(len(list_filter(s.syms, t -> len(t) > 1)))
        |      AS BIGINT) AS n_merged
        |  FROM dw d JOIN s$nMerges s USING (word)
        |  GROUP BY d.source
        |)
        |SELECT source, n_tokens, n_chars, n_merged,
        |  CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    AS chars_per_token,
        |  CAST(n_merged AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    AS merged_frac
        |FROM agg ORDER BY source""".stripMargin

  /** Mirror of `TrainingData.bpeEncode`: ordered token streams — words
    * in document order, each word's merged symbols in sequence. */
  def pipeBpeEncode(nMerges: Int = 8): String =
    bpeChain(nMerges) +
      s"""
        |, dw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |, dwi AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS word_no, ws
        |          FROM dw)
        |, dww AS (SELECT doc_id, word_no, ws[word_no] AS word FROM dwi)
        |, dt AS (SELECT d.doc_id, d.word_no, s.syms
        |         FROM dww d JOIN s$nMerges s USING (word))
        |, dts AS (SELECT doc_id, word_no,
        |            unnest(range(1, len(syms) + 1)) AS j, syms
        |          FROM dt)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY word_no, j) AS BIGINT) AS token_no,
        |  syms[j] AS token
        |FROM dts ORDER BY doc_id, token_no""".stripMargin

  def mktFixCrossed: String = Level3Cte + QuoteCte +
    """, quote_cf2 AS (
      |  SELECT pair_id, ts,
      |    LAST_VALUE(bid_price IGNORE NULLS) OVER (PARTITION BY pair_id
      |      ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bid_cf,
      |    LAST_VALUE(ask_price IGNORE NULLS) OVER (PARTITION BY pair_id
      |      ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ask_cf
      |  FROM quote
      |), spread_before2 AS (
      |  SELECT pair_id, LEAD(ts) OVER (PARTITION BY pair_id ORDER BY ts) AS ts,
      |    bid_cf AS bb, ask_cf AS ba
      |  FROM quote_cf2
      |), eternal AS (
      |  SELECT * FROM level3
      |  WHERE next_microtimestamp = 4102444800000000
      |)
      |SELECT e.pair_id AS pair_id, e.order_id, e.side, e.price, e.amount,
      |  e.microtimestamp AS entered_at,
      |  'crossed-eternal-taker' AS reason
      |FROM eternal e LEFT JOIN spread_before2 s
      |  ON s.pair_id = e.pair_id AND s.ts = e.microtimestamp
      |WHERE CASE WHEN e.side = 'b'
      |  THEN e.price >= COALESCE(s.ba, e.price + 1)
      |  ELSE e.price <= COALESCE(s.bb, e.price - 1) END
      |ORDER BY pair_id, order_id""".stripMargin

  def mktSpreadAt: String = Level3Cte +
    s""", snaps AS (
      |  SELECT pair_id, side, price, SUM(amount) AS qty FROM level3
      |  WHERE microtimestamp <= $SnapshotMicros
      |    AND next_microtimestamp > $SnapshotMicros
      |  GROUP BY pair_id, side, price
      |), bests2 AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_id, side
      |    ORDER BY CASE WHEN side = 'b' THEN -price ELSE price END) AS rn
      |  FROM snaps
      |)
      |SELECT pair_id,
      |  MAX(CASE WHEN side = 'b' THEN price END) AS bid_price,
      |  MAX(CASE WHEN side = 'b' THEN qty END) AS bid_qty,
      |  MAX(CASE WHEN side = 's' THEN price END) AS ask_price,
      |  MAX(CASE WHEN side = 's' THEN qty END) AS ask_qty,
      |  $SnapshotMicros AS ts
      |FROM bests2 WHERE rn = 1 GROUP BY pair_id
      |ORDER BY pair_id""".stripMargin

  /** Wide pivot of the at-frequency moving depth summary. */
  def mktDepthSummaryFreqWide: String = {
    val pivot =
      (for (side <- Seq("b", "s"); b <- 0 to 500 by 25) yield
        s"  SUM(CASE WHEN side = '$side' AND bps_level = $b THEN volume END)" +
          s" AS ${if (side == "b") "bid" else "ask"}_vol${b}bps")
        .mkString(",\n")
    Level3Cte +
      """, chosen AS (
        |  SELECT pair_id AS g_pair,
        |    ((ets + 21599999999) // 21600000000) * 21600000000 AS g,
        |    MAX(ets) AS sample_ts
        |  FROM (SELECT DISTINCT pair_id, microtimestamp AS ets FROM level3) e
        |  GROUP BY g_pair, ((ets + 21599999999) // 21600000000) * 21600000000
        |), snapf AS (
        |  SELECT l.*, c.g FROM level3 l JOIN chosen c
        |    ON l.pair_id = c.g_pair AND l.microtimestamp <= c.sample_ts
        |   AND l.next_microtimestamp > c.sample_ts
        |), wbf AS (
        |  SELECT *, CASE WHEN side = 'b'
        |    THEN MAX(price) OVER (PARTITION BY pair_id, g, side)
        |    ELSE MIN(price) OVER (PARTITION BY pair_id, g, side) END AS best
        |  FROM snapf
        |), bkf AS (
        |  SELECT *, CAST(CEIL(ABS(price - best) / best * 10000 / 25) AS BIGINT)
        |    * 25 AS bps_level
        |  FROM wbf
        |), longf AS (
        |  SELECT pair_id, g AS ts, side, bps_level, SUM(amount) AS volume
        |  FROM bkf WHERE bps_level <= 500
        |  GROUP BY pair_id, g, side, bps_level
        |)
        |SELECT pair_id, ts,""".stripMargin + "\n" + pivot +
      """
        |FROM longf GROUP BY pair_id, ts
        |ORDER BY pair_id, ts""".stripMargin
  }

  def mktDepthSummaryWide: String = Level3Cte + GridSnapCte +
    """, bkw AS (
      |  SELECT *, CAST(CEIL(ABS(price - best) / best * 10000 / 25) AS BIGINT) * 25
      |    AS bps_level
      |  FROM wb
      |), longds AS (
      |  SELECT pair_id, g AS ts, side, bps_level, SUM(amount) AS volume
      |  FROM bkw WHERE bps_level <= 500
      |  GROUP BY pair_id, g, side, bps_level
      |)
      |SELECT pair_id, ts,""".stripMargin + "\n" +
    (for (side <- Seq("b", "s"); b <- 0 to 500 by 25) yield
      s"  SUM(CASE WHEN side = '$side' AND bps_level = $b THEN volume END)" +
        s" AS ${if (side == "b") "bid" else "ask"}_vol${b}bps")
      .mkString(",\n") +
    """
      |FROM longds GROUP BY pair_id, ts
      |ORDER BY pair_id, ts""".stripMargin
}
