package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Integration spec: every declared query runs on the sf0.001 testdata
  * and returns a sane, deterministic result. (Exact value parity with
  * DuckDB is the driver's t2 gate; `tools/verify.sh` replicates it.)
  */
class QueriesSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every query runs and returns rows (except known-sparse ones)") {
    // sparse at sf0.001 only: the trade-matching band finds no pairs
    // sparse at sf0.001 only: trade matching finds few or no pairs, and
    // the Bitstamp ops derive from those matches
    val mayBeEmpty = Set("mkt_trades", "mkt_trades_stream", "mkt_match_sum2",
      "mkt_match_sum3", "mkt_crossed", "pipe_minhash", "pipe_simhash",
      "mkt_bst_reveal", "mkt_bst_fix_aggr", "mkt_bst_match_seq",
      "mkt_sql_trades",
      // the trellis derives from the strategy's positions, which the
      // tiny tick stream at this SF never opens
      "mkt_plot_trellis", "mkt_sql_plot_trellis")
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).count()
    }
    counts.foreach { case (name, n) =>
      assert(n >= 0, s"$name failed")
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("spread invariants: ticks change, prices positive") {
    val df = SparkEntry.queries("mkt_spread")(spark, dir)
    import org.apache.spark.sql.functions._
    val bad = df.filter(col("bid_price") <= 0 || col("ask_price") <= 0).count()
    assert(bad == 0)
  }

  test("dedup clusters: connected components over a crafted pair graph") {
    import spark.implicits._
    import graft.pipeline.TextPipeline
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("doc_id")
    // a path (min label needs 3 hops), a triangle, and a singleton
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (5L, 6L), (6L, 7L),
      (5L, 7L)).toDF("doc_a", "doc_b")
    val got = TextPipeline.dedupClusters(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    val want = Seq(
      (1L, 1L, 4L, true), (2L, 1L, 4L, false), (3L, 1L, 4L, false),
      (4L, 1L, 4L, false), (5L, 5L, 3L, true), (6L, 5L, 3L, false),
      (7L, 5L, 3L, false), (8L, 8L, 1L, true))
    assert(got.toSeq == want)
  }

  test("api queues scale parameter dispatches both reference modes") {
    import graft.market.{GridOps, Level3Source}
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
    val api = GraftApi(spark, l3)
    val bounds = l3.agg(org.apache.spark.sql.functions.min("microtimestamp"))
      .head().getLong(0)
    val instants = Seq(bounds + 3600L * 1000000)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("pair_id", "ts", "side", "tick").collect().map(_.toSeq).toList
    assert(rows(api.queues(instants)) ==
      rows(GridOps.queues(l3, instants)))
    assert(rows(api.queues(instants, tickSize = 0.05, scale = "LOGRELATIVE")) ==
      rows(GridOps.queuesLogRelative(l3, instants, 0.05)))
    intercept[IllegalArgumentException] {
      api.queues(instants, scale = "NOPE")
    }
  }

  test("oversized LSH buckets are skipped (viral-boilerplate guard)") {
    import spark.implicits._
    import graft.pipeline.TextPipeline
    val cap = TextPipeline.BandBucketCap.toInt
    def corpus(n: Int) = (1 to n)
      .map(i => (i.toLong, "common boiler plate text shared by every doc"))
      .toDF("doc_id", "text")
    // below the cap: identical docs pair up through their shared bands
    assert(TextPipeline.minhashCandidates(corpus(5)).count() > 0)
    assert(TextPipeline.simhashPairs(corpus(5)).count() > 0)
    // past the cap: the bucket would emit O(cap²) pairs — skipped
    // (these docs are exact duplicates; the exact pass owns them)
    assert(TextPipeline.minhashCandidates(corpus(cap + 20)).count() == 0)
    assert(TextPipeline.simhashPairs(corpus(cap + 20)).count() == 0)
  }

  test("order-book snapshot parameter surface: side / only_makers / check_takers") {
    import org.apache.spark.sql.functions._
    import graft.market.{Level3Source, MarketOps}
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
      .localCheckpoint()
    val ts = Oracles.SnapshotMicros
    val all = MarketOps.orderBookAt(l3, ts).localCheckpoint()
    val n = all.count()
    assert(n > 0)
    // side restriction partitions the unrestricted book only when the
    // one-sided book computes the same flags; it does not (a one-sided
    // book is all makers), so check the weaker containment: every
    // one-sided row's order is in the full snapshot
    val bids = MarketOps.orderBookAt(l3, ts, side = Some("b"))
    assert(bids.filter(col("side") =!= "b").count() == 0)
    assert(bids.join(all.filter(col("side") === "b"), Seq("order_id"),
      "left_anti").count() == 0)
    // only_makers keeps exactly the maker rows of the full snapshot
    val makers = MarketOps.orderBookAt(l3, ts, onlyMakers = true)
    assert(makers.filter(!col("is_maker")).count() == 0)
    assert(makers.count() == all.filter(col("is_maker")).count())
    // check_takers drops crossing orders whose standing event is not a
    // deletion; makers are never dropped
    val checked = MarketOps.orderBookAt(l3, ts, checkTakers = true)
    assert(checked.count() <= n)
    assert(checked.filter(col("is_maker")).count() ==
      all.filter(col("is_maker")).count())
    assert(checked.filter(!col("is_maker") && !col("is_deleted"))
      .count() == 0)
  }

  test("level3 invariants: validity intervals are well-formed") {
    import org.apache.spark.sql.functions._
    val l3 = SparkEntry.queries("mkt_level3")(spark, dir)
    assert(l3.filter(col("next_microtimestamp") < col("microtimestamp"))
      .count() == 0)
    assert(l3.filter(col("amount") < 0).count() == 0)
    // chains are dense: max(event_no) == count(*) per order
    val broken = l3.groupBy("order_id")
      .agg(max("event_no").as("m"), count(lit(1)).as("c"))
      .filter(col("m") =!= col("c")).count()
    assert(broken == 0)
  }

  test("events_intervals differential: a carved gap turns red exactly there") {
    import org.apache.spark.sql.functions._
    import graft.market.{Analytics, Level3Source}
    val l3 = Level3Source.level3(Tables.load(spark, dir, "events"))
      .localCheckpoint(false)
    val before = Analytics.intervals(Level3Source.eras(l3))
      .filter(col("pair_id") === 1).collect()
    // carve a data gap wider than the era threshold out of pair 1's
    // stream, in the middle of its span (a corrupted / lost capture
    // window — the reference surfaces these as red intervals,
    // db/get_schema.sql:462-503)
    val span = l3.filter(col("pair_id") === 1)
      .agg(min("microtimestamp"), max("microtimestamp")).collect()(0)
    val (lo, hi) = (span.getLong(0), span.getLong(1))
    val mid = lo + (hi - lo) / 2
    val gapEnd = mid + Level3Source.EraGapMicros + 60000000L
    val corrupted = l3.filter(!(col("pair_id") === 1 &&
      col("microtimestamp") > mid && col("microtimestamp") < gapEnd))
    val after = Analytics.intervals(Level3Source.eras(corrupted))
      .filter(col("pair_id") === 1).collect()
    val greens = after.filter(_.getAs[String]("kind") == "G")
    val reds = after.filter(_.getAs[String]("kind") == "R")
    // the differential: exactly one red interval covers the carved
    // window, and no green overlaps its interior (the sparse synthetic
    // stream already has natural gaps, so counts may merge — the
    // coverage property is the invariant)
    val covering = reds.filter(r => r.getAs[Long]("interval_start") <= mid &&
      r.getAs[Long]("interval_end") >= gapEnd)
    assert(covering.length == 1,
      s"expected one red interval covering the carved gap ($mid, $gapEnd)")
    val greenInGap = greens.filter(g =>
      g.getAs[Long]("interval_start") < gapEnd &&
        g.getAs[Long]("interval_end") > mid)
    assert(greenInGap.isEmpty,
      s"green interval(s) inside the carved gap: ${greenInGap.toSeq}")
    // and the carve did not disturb intervals before it: the earliest
    // green is unchanged (collect() order is partition-dependent, so
    // sort before comparing)
    assert(greens.map(_.getAs[Long]("interval_start")).min ==
      before.filter(_.getAs[String]("kind") == "G")
        .map(_.getAs[Long]("interval_start")).min)
  }
}
