package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.market.{EraSurgery, Level3Source, MarketOps}

/** The era-surgery contract (reference `insert_level3_era`,
  * `db/obanalytics_schema.sql:1440-1597`): splitting the history at a
  * cut is *observationally invisible* — the standing book at every
  * instant and every replay-derived stream are unchanged; only the
  * chain bookkeeping (event_no, price chains, the synthetic cut rows)
  * differs. Equivalently: re-deriving analytics from the split log
  * equals building them from scratch — the driver's mkt_era_split
  * oracle covers the bookkeeping itself.
  */
class EraSurgerySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-era")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
  private val cut = Oracles.SnapshotMicros

  private lazy val split = EraSurgery.insertEra(l3, cut, 1)

  test("split orders re-materialize at the cut with event_no = 1") {
    val synth = split.filter(col("microtimestamp") === cut &&
      col("event_id") < 0)
    assert(synth.count() > 0)
    assert(synth.filter(col("event_no") =!= 1 ||
      col("price_event_no") =!= 1 ||
      col("price_microtimestamp") =!= cut).count() == 0)
    // chains stay dense after renumbering
    val broken = split.filter(col("pair_id") === 1)
      .groupBy(col("order_id"), expr(s"microtimestamp >= $cut").as("half"))
      .agg(max("event_no").as("m"), count(lit(1)).as("c"),
        min("event_no").as("lo"))
      .filter(col("m") - col("lo") + 1 =!= col("c"))
    assert(broken.count() == 0)
  }

  test("snapshots at instants before/at/after the cut are unchanged") {
    for (t <- Seq(cut - 86400000000L, cut, cut + 86400000000L)) {
      val a = MarketOps.orderBookAt(l3, t)
        .select("pair_id", "order_id", "side", "price", "amount")
        .orderBy("pair_id", "order_id").collect().map(_.toSeq).toList
      val b = MarketOps.orderBookAt(split, t)
        .select("pair_id", "order_id", "side", "price", "amount")
        .orderBy("pair_id", "order_id").collect().map(_.toSeq).toList
      assert(a == b, s"snapshot diverged at $t")
    }
  }

  test("replay streams (L1 spread) are unchanged by the split") {
    val a = MarketOps.spread(l3, spark)
      .orderBy("pair_id", "ts").collect().map(_.toSeq).toList
    val b = MarketOps.spread(split, spark)
      .orderBy("pair_id", "ts").collect().map(_.toSeq).toList
    assert(a == b)
  }

  test("observational invisibility holds at random cut points (property)") {
    // the BookPropertySpec discipline: a fixed-seed draw of cut
    // instants across the log's whole span — cuts landing mid-chain,
    // between episodes, and in quiet stretches all alike — each must
    // leave snapshots at/around the cut AND the full L1 replay
    // unchanged. 10 seeds; deterministic.
    val l3c = l3.localCheckpoint()
    val range = l3c.agg(min("microtimestamp"), max("microtimestamp"))
      .collect()(0)
    val (lo, hi) = (range.getLong(0), range.getLong(1))
    val rnd = new scala.util.Random(711L)
    val baseSpread = MarketOps.spread(l3c, spark)
      .orderBy("pair_id", "ts").collect().map(_.toSeq).toList
    val probeOffsets = Seq(-3600000000L, 0L, 3600000000L)
    for (i <- 1 to 10) {
      val c = lo + 1 + math.abs(rnd.nextLong()) % math.max(1L, hi - lo)
      val sp = EraSurgery.insertEra(l3c, c, 1).localCheckpoint()
      for (off <- probeOffsets) {
        val t = c + off
        val a = MarketOps.orderBookAt(l3c, t)
          .select("pair_id", "order_id", "side", "price", "amount")
          .orderBy("pair_id", "order_id").collect().map(_.toSeq).toList
        val b = MarketOps.orderBookAt(sp, t)
          .select("pair_id", "order_id", "side", "price", "amount")
          .orderBy("pair_id", "order_id").collect().map(_.toSeq).toList
        assert(a == b, s"seed $i: snapshot diverged at cut=$c t=$t")
      }
      val replayed = MarketOps.spread(sp, spark)
        .orderBy("pair_id", "ts").collect().map(_.toSeq).toList
      assert(replayed == baseSpread, s"seed $i: L1 diverged at cut=$c")
    }
  }
}
