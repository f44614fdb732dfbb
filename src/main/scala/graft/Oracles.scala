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
  val Level3Cte: String =
    """WITH l3_base AS (
      |  SELECT event_id, epoch_us(ts) AS microtimestamp, user_id,
      |         CAST(user_id % 3 + 1 AS BIGINT) AS pair_id,
      |         CASE WHEN user_id % 2 = 0 THEN 'b' ELSE 's' END AS side,
      |         value AS price,
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
      |    pair_id, CAST(1 AS BIGINT) AS exchange_id, event_id
      |  FROM l3_pg
      |)""".stripMargin

  val q01PricingSummary: String =
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

  val q02RevenueByNation: String =
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

  val q03Sessionize: String =
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

  val q04TopOrders: String =
    """WITH ranked AS (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice, c_custkey,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |)
      |SELECT c_mktsegment, rnk, o_orderkey, o_totalprice, c_custkey
      |FROM ranked WHERE rnk <= 5
      |ORDER BY c_mktsegment, rnk""".stripMargin

  val q05AsofEnrich: String =
    """WITH u AS (
      |  SELECT user_id AS key, epoch_us(ts) AS t, event_id,
      |         CAST(NULL AS DOUBLE) AS o_price, 1 AS is_event
      |  FROM events
      |  UNION ALL
      |  SELECT o_custkey % 1500, epoch_us(o_orderdate), CAST(NULL AS BIGINT),
      |         o_totalprice, 0
      |  FROM orders
      |), enriched AS (
      |  SELECT *, LAST_VALUE(o_price IGNORE NULLS) OVER (
      |    PARTITION BY key ORDER BY t, is_event
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_order_price
      |  FROM u
      |)
      |SELECT key AS user_id, t AS ts, event_id, last_order_price
      |FROM enriched WHERE is_event = 1
      |ORDER BY user_id, ts, event_id""".stripMargin

  val mktSpread: String = Level3Cte +
    """, etimes AS (SELECT DISTINCT pair_id, microtimestamp AS ts FROM level3)
      |, live AS (
      |  SELECT e.pair_id, e.ts, l.side, l.price, l.amount
      |  FROM etimes e JOIN level3 l
      |    ON l.pair_id = e.pair_id AND l.microtimestamp <= e.ts
      |   AND l.next_microtimestamp > e.ts
      |), lvl AS (
      |  SELECT pair_id, ts, side, price, SUM(amount) AS qty
      |  FROM live GROUP BY pair_id, ts, side, price
      |), best AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_id, ts, side
      |    ORDER BY CASE WHEN side = 'b' THEN -price ELSE price END) AS rn
      |  FROM lvl
      |), quote AS (
      |  SELECT e.pair_id, e.ts,
      |    MAX(CASE WHEN b.side = 'b' THEN b.price END) AS bid_price,
      |    MAX(CASE WHEN b.side = 'b' THEN b.qty END) AS bid_qty,
      |    MAX(CASE WHEN b.side = 's' THEN b.price END) AS ask_price,
      |    MAX(CASE WHEN b.side = 's' THEN b.qty END) AS ask_qty
      |  FROM etimes e LEFT JOIN best b
      |    ON b.pair_id = e.pair_id AND b.ts = e.ts AND b.rn = 1
      |  GROUP BY e.pair_id, e.ts
      |), dedup AS (
      |  SELECT *, ROW_NUMBER() OVER w AS rn,
      |    LAG(bid_price) OVER w AS pb, LAG(bid_qty) OVER w AS pbq,
      |    LAG(ask_price) OVER w AS pa, LAG(ask_qty) OVER w AS paq
      |  FROM quote WINDOW w AS (PARTITION BY pair_id ORDER BY ts)
      |)
      |SELECT pair_id, ts, bid_price, bid_qty, ask_price, ask_qty
      |FROM dedup
      |WHERE rn = 1 OR NOT (bid_price IS NOT DISTINCT FROM pb
      |  AND bid_qty IS NOT DISTINCT FROM pbq
      |  AND ask_price IS NOT DISTINCT FROM pa
      |  AND ask_qty IS NOT DISTINCT FROM paq)
      |ORDER BY pair_id, ts""".stripMargin

  /** Snapshot instant for the order-book query: 2024-01-15 00:00:00 UTC. */
  val SnapshotMicros: Long = 1705276800000000L

  val mktOrderBook: String = Level3Cte +
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
}
