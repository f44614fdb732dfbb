package graft.market

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's seeded dimension tables.
  *
  * Exchanges: `db/obanalytics_exchanges.sql:41-46`. Pairs with price /
  * quantity precision metadata: `db/obanalytics_pairs.sql:63-74`;
  * `"R0"` = −log10 of the quote currency's fractional monetary unit
  * (price rounding), `fmu` = same for the base currency (quantity
  * rounding) — column comments at `db/obanalytics_schema.sql:4794-4804`.
  * The wire-format builders round captured price/amount by these before
  * anything else sees them (`db/bitfinex_schema.sql:352,487`).
  */
object Dimensions {

  /** (exchange_id, exchange). */
  val Exchanges: Seq[(Int, String)] =
    Seq(1 -> "bitfinex", 2 -> "bitstamp", 3 -> "coinbase", 4 -> "moex")

  /** (pair_id, pair, R0, fmu). */
  val Pairs: Seq[(Int, String, Int, Int)] = Seq(
    (1, "BTCUSD", 2, 8),
    (2, "LTCUSD", 2, 8),
    (3, "ETHUSD", 2, 18),
    (4, "XRPUSD", 2, 12),
    (5, "BCHUSD", 2, 8),
    (6, "BTCEUR", 2, 8),
    (7, "ETHBTC", 8, 18),
    (8, "SBERRUB", 2, 0),
    (9, "VTBRRUB", 2, 0),
    (10, "LKOHRUB", 2, 0),
    (11, "GAZPRUB", 2, 0))

  def exchangesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Exchanges.toDF("exchange_id", "exchange")
  }

  /** Synthetic-fixture venue assignment: even pairs capture on
    * bitstamp (2), odd on bitfinex (1) — so the exchange dimension is
    * a REAL grouping/pruning key in every checked query, not a
    * constant-folded literal (the reference hosts pairs across both
    * venues, `db/obanalytics_exchanges.sql:41-46`). One expression,
    * used by the level3 builders and the trade matchers; the DuckDB
    * mirrors carry the identical CASE ([[ExchangeOfPairSql]]). */
  def exchangeOfPair(pairId: Column): Column =
    when(pmod(pairId, lit(2)) === 0, 2).otherwise(1)

  /** The SQL twin of [[exchangeOfPair]]. */
  val ExchangeOfPairSql: String =
    "CASE WHEN pair_id % 2 = 0 THEN 2 ELSE 1 END"

  def pairsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Pairs.toDF("pair_id", "pair", "r0", "fmu")
  }

  /** Price rounded to the pair's `R0` scale — the capture-time
    * normalization every reference builder applies before anything
    * downstream sees the value (`db/bitfinex_schema.sql:352,487`;
    * PG `round(numeric, n)` is decimal HALF_UP, as Spark's `round`).
    * An unseeded pair passes through unrounded — precision metadata is
    * a property of the pair listing, not something to guess. */
  def roundPrice(pairId: Column, price: Column): Column =
    Pairs.foldLeft(when(lit(false), price)) { case (acc, (pid, _, r0, _)) =>
      acc.when(pairId === pid, round(price, r0))
    }.otherwise(price)

  /** Amount rounded to the pair's `fmu` scale (sign-preserving; the
    * Bitfinex wire amount is signed — the sign carries the side). */
  def roundAmount(pairId: Column, amount: Column): Column =
    Pairs.foldLeft(when(lit(false), amount)) { case (acc, (pid, _, _, fmu)) =>
      acc.when(pairId === pid, round(amount, fmu))
    }.otherwise(amount)

  /** Price rounded `digitsCoarser` digits COARSER than the pair's
    * native `R0` scale — the level2 precision-tier grid (`p1`..`p4`,
    * `db/obanalytics_schema.sql:234-316`): tier pN aggregates depth at
    * round(price, R0−N), so p0 is the native (unrounded-beyond-wire)
    * scale the reference's own depth engine runs at
    * (`db/obanalytics_schema.sql:1244` "Precision of depth is P0") and
    * each higher tier is a 10× coarser ladder. Unseeded pairs pass
    * through unrounded, as [[roundPrice]]. */
  def roundPriceCoarser(pairId: Column, price: Column,
      digitsCoarser: Int): Column =
    Pairs.foldLeft(when(lit(false), price)) { case (acc, (pid, _, r0, _)) =>
      acc.when(pairId === pid, round(price, r0 - digitsCoarser))
    }.otherwise(price)

  /** Price-rounding scale for a pair (digits after the point). */
  def r0(pairId: Int): Int = Pairs.find(_._1 == pairId)
    .map(_._3).getOrElse(
      throw new NoSuchElementException(s"unknown pair_id $pairId"))

  /** Quantity-rounding scale for a pair. */
  def fmu(pairId: Int): Int = Pairs.find(_._1 == pairId)
    .map(_._4).getOrElse(
      throw new NoSuchElementException(s"unknown pair_id $pairId"))
}
