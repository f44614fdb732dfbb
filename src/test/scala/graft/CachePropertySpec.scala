package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

import graft.sources.CapturePump.{Ordered, Reorderer}

/** Property tests for the round-4 client/capture plumbing (plain
  * scalacheck generators with fixed seeds — deterministic):
  *
  *   - the interval cache must be TRANSPARENT: any sequence of get()
  *     calls returns exactly what the bare loader would, while loading
  *     each µs tick at most once (for data older than the freshness
  *     bound);
  *   - the reorder buffer must emit a totally (exchange_ts, priority,
  *     local_ts)-ordered stream whenever arrival disorder is bounded
  *     by the configured delay.
  */
class CachePropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("interval cache is transparent under random query sequences") {
    val genQuery = for {
      s <- Gen.choose(0L, 900L)
      len <- Gen.choose(0L, 300L)
      closed <- Gen.oneOf(true, false)
    } yield (s, s + len, closed)
    val queries = samples(genQuery, 120, seed = 42L)

    val loaded = mutable.Map.empty[Long, Int].withDefaultValue(0)
    val cache = new IntervalCache[Long](
      loader = (s, e) => { (s until e).foreach(t => loaded(t) += 1); s until e },
      eventTs = identity,
      clock = () => 1500L,
      freshnessUs = 400L) // bound = 1100: ticks past it re-load by design

    queries.foreach { case (s, e, closed) =>
      val got = cache.get(s, e, rightClosed = closed)
      val want = if (closed) s to e else s until e
      assert(got == want, s"[$s, $e] closed=$closed")
    }
    // transparency came with single-load efficiency: no tick below the
    // freshness bound was loaded twice (fresh ticks re-load every time
    // — the reference's mutable-tail rule)
    val multi = loaded.filter { case (t, n) => t < 1100L && n > 1 }
    assert(multi.isEmpty, s"cacheable ticks loaded more than once: ${multi.take(5)}")
  }

  test("reorderer output is totally ordered under bounded disorder") {
    val delay = 50L
    val genBatch = Gen.listOfN(200, for {
      ets <- Gen.choose(0L, 1000L)
      prio <- Gen.choose(0, 2)
    } yield (ets, prio))

    samples(genBatch, 10, seed = 7L).zipWithIndex.foreach { case (batch, bi) =>
      // local arrival time = exchange time + bounded jitter < delay
      val items = batch.zipWithIndex.map { case ((ets, prio), i) =>
        Ordered(ets, prio, ets + (i * 13 % delay), i)
      }.sortBy(_.localTs) // arrival order
      val r = new Reorderer[Int](delay)
      val out = items.flatMap(r.offer) ++ r.drain()
      assert(out.size == items.size, s"batch $bi lost items")
      val keys = out.map(o => (o.exchangeTs, o.priority, o.localTs))
      assert(keys == keys.sorted, s"batch $bi out of order")
    }
  }
}
