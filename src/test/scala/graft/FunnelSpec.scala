package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.relational.CoreQueries

/** Fixture tests for the event-analytics queries (the sf0.01 oracle
  * corpus is dense — every user converts and returns every week — so
  * these fixtures are what exercise the partial-conversion and
  * churn paths). */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-funnel")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val M = 1000000L

  test("funnel counts strictly-ordered step chains only") {
    // u1: full chain in order; u2: purchase BEFORE click (stops at
    // view — the strict > rule); u3: signup only; u4: starts at view
    // (no signup — contributes to no step); 'error' rows are ignored
    val ev = Seq(
      (1L, "signup", 10 * M), (1L, "view", 20 * M),
      (1L, "click", 30 * M), (1L, "purchase", 40 * M),
      (1L, "error", 15 * M),
      (2L, "signup", 10 * M), (2L, "purchase", 15 * M),
      (2L, "view", 20 * M), (2L, "click", 30 * M),
      (3L, "signup", 10 * M),
      (4L, "view", 10 * M), (4L, "click", 20 * M)
    ).toDF("user_id", "event_type", "t")
    val got = CoreQueries.funnelOf(ev).collect()
      .map(r => (r.getAs[Long]("step_no"), r.getAs[String]("step"),
        r.getAs[Long]("n_users"), r.getAs[Double]("conv")))
    // u2 reaches click at 30M (> view 20M) but its purchase at 15M
    // precedes the click -> not counted at step 4
    assert(got.toSeq == Seq(
      (1L, "signup", 3L, 1.0),
      (2L, "view", 2L, 2.0 / 3.0),
      (3L, "click", 2L, 1.0),
      (4L, "purchase", 1L, 0.5)))
  }

  test("funnel folds a pathological hot user in O(1) state") {
    // one bot with 200k events (the 100×-scale skew shape: a single
    // user whose event list would be a multi-GB collect_list buffer)
    // plus a normal full-chain user; the sorted-group greedy fold
    // must land on the exact min-ts chain for both. The bot's chain:
    // t1=0 (first signup), t2=1M+1, t3=2M+2, t4=3M+3 -> depth 4.
    val bot = (0 until 200000).map { i =>
      val ty = i % 4 match {
        case 0 => "signup"; case 1 => "view"
        case 2 => "click"; case _ => "purchase"
      }
      (9L, ty, (i % 4) * M + i.toLong)
    }
    val ev = (bot ++ Seq((1L, "signup", 10 * M), (1L, "view", 20 * M),
      (1L, "click", 30 * M), (1L, "purchase", 40 * M)))
      .toDF("user_id", "event_type", "t")
    val got = CoreQueries.funnelOf(ev).collect()
      .map(r => (r.getAs[Long]("step_no"), r.getAs[Long]("n_users")))
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("retention cohorts churn by distinct activity week") {
    val wk = 7L * 86400 * M
    // cohort week 0: u1 active weeks 0,1,3; u2 active week 0 only.
    // cohort week 1: u3 active weeks 1,2.
    val ev = Seq(
      (1L, 1 * M), (1L, wk + M), (1L, 3 * wk + M), (1L, 3 * wk + 2 * M),
      (2L, 2 * M),
      (3L, wk + 5 * M), (3L, 2 * wk + M)
    ).toDF("user_id", "t")
    val got = CoreQueries.retentionOf(ev).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_no"),
        r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
        r.getAs[Double]("retention")))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (0L, 3L, 1L, 2L, 0.5),
      (1L, 0L, 1L, 1L, 1.0),
      (1L, 1L, 1L, 1L, 1.0)))
  }

  test("eventAnomalies flags only the 3-sigma deviant; zero variance flags none") {
    // type a: 20 events at 10.0 plus one at 200.0 — a lone deviant
    // among n identical peers sits at z² = n−1, so n = 21 puts it
    // strictly past 9 while the peers stay inside; type b: constant
    // values (variance 0), where dev² > 0 must flag nothing
    val ev = ((1L to 20L).map(i => (i, "a", 10.0)) ++
      Seq((21L, "a", 200.0)) ++
      (22L to 25L).map(i => (i, "b", 5.0)))
      .toDF("event_id", "event_type", "value")
    val got = CoreQueries.eventAnomaliesOf(ev).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("v_milli"), r.getAs[Long]("mean_milli"),
        r.getAs[Long]("n_type")))
    // s = 20·10000 + 200000 = 400000, mean = 400000 div 21 = 19047
    assert(got.toSeq == Seq((21L, "a", 200000L, 19047L, 21L)))
  }

  test("eventAnomalies equals the BigInt driver model on random values") {
    // exercises the decimal(38,0) product path and the milli rounding
    // against exact BigInteger arithmetic
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, for {
        ty <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(0.0, 600.0)
      } yield (ty, v))
    } yield rows.zipWithIndex.map { case ((ty, v), i) => (i.toLong, ty, v) }
    (91 to 100).map(i => genCase(Gen.Parameters.default, Seed(i.toLong)).get)
      .foreach { rows =>
        val byType = rows.groupBy(_._2)
        val want = rows.flatMap { case (id, ty, v) =>
          val vs = byType(ty).map(r => BigInt(math.round(r._3 * 1000)))
          val (n, s) = (BigInt(vs.size), vs.sum)
          val ssq = vs.map(x => x * x).sum
          val vm = BigInt(math.round(v * 1000))
          val dev = n * vm - s
          if (dev * dev > 9 * (n * ssq - s * s))
            Some((id, ty, vm.toLong, (s / n).toLong, n.toLong))
          else None
        }
        val got = CoreQueries.eventAnomaliesOf(
            rows.toDF("event_id", "event_type", "value")).collect()
          .map(r => (r.getAs[Long]("event_id"),
            r.getAs[String]("event_type"), r.getAs[Long]("v_milli"),
            r.getAs[Long]("mean_milli"), r.getAs[Long]("n_type"))).toSeq
        assert(got == want, s"anomaly mismatch on $rows")
      }
  }
}
