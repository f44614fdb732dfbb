package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** The client interval cache must load each time range at most once
  * (gap-filling around cached periods), coalesce touching periods,
  * and never cache data newer than the freshness bound — the
  * reference's R-client semantics (`R/cache.R`,
  * `R/obanalytics.R:218-263`).
  */
class IntervalCacheSpec extends AnyFunSuite {

  /** A "database" of one row per µs tick, recording loader calls. */
  private class Fixture(nowUs: Long) {
    val calls: mutable.Buffer[(Long, Long)] = mutable.Buffer.empty
    val cache = new IntervalCache[Long](
      loader = (s, e) => { calls += ((s, e)); s until e },
      eventTs = identity,
      clock = () => nowUs,
      freshnessUs = 100L)
  }

  test("cold query loads once; repeat is served from cache") {
    val f = new Fixture(nowUs = 10000L)
    assert(f.cache.get(100L, 200L) == (100L until 200L))
    assert(f.cache.get(100L, 200L) == (100L until 200L))
    assert(f.cache.get(120L, 180L) == (120L until 180L)) // sub-interval
    assert(f.calls.toList == List((100L, 200L)))
    assert(f.cache.cachedPeriods == Seq((100L, 200L)))
  }

  test("overlapping query loads only the gap and coalesces periods") {
    val f = new Fixture(nowUs = 10000L)
    f.cache.get(100L, 200L)
    assert(f.cache.get(150L, 300L) == (150L until 300L))
    assert(f.calls.toList == List((100L, 200L), (200L, 300L)))
    assert(f.cache.cachedPeriods == Seq((100L, 300L)))
  }

  test("bridging query merges two disjoint cached periods") {
    val f = new Fixture(nowUs = 10000L)
    f.cache.get(100L, 200L)
    f.cache.get(400L, 500L)
    assert(f.cache.cachedPeriods.toSet == Set((100L, 200L), (400L, 500L)))
    assert(f.cache.get(150L, 450L) == (150L until 450L))
    // only the bridge [200, 400) was loaded
    assert(f.calls.toList ==
      List((100L, 200L), (400L, 500L), (200L, 400L)))
    assert(f.cache.cachedPeriods == Seq((100L, 500L)))
  }

  test("data newer than the freshness bound is re-loaded every time") {
    val f = new Fixture(nowUs = 1000L) // bound = 900
    f.cache.get(850L, 950L)
    f.cache.get(850L, 950L)
    // [850, 900) cached once; [900, 950) hits the loader both times
    assert(f.calls.toList ==
      List((850L, 900L), (900L, 950L), (900L, 950L)))
    assert(f.cache.cachedPeriods == Seq((850L, 900L)))
    // entirely-fresh query bypasses the cache wholesale
    f.cache.get(920L, 980L)
    assert(f.calls.last == ((920L, 980L)))
    assert(f.cache.cachedPeriods == Seq((850L, 900L)))
  }

  test("right-closed queries include the endpoint like the R client") {
    val f = new Fixture(nowUs = 10000L)
    assert(f.cache.get(100L, 105L, rightClosed = false) ==
      Seq(100L, 101L, 102L, 103L, 104L))
    // cached period is [100,105); the closed query widens it by the endpoint
    assert(f.cache.get(100L, 104L, rightClosed = true) ==
      Seq(100L, 101L, 102L, 103L, 104L))
    assert(f.calls.toList == List((100L, 105L)))
  }

  test("empty results are not cached") {
    var empty = true
    val calls = mutable.Buffer.empty[(Long, Long)]
    val cache = new IntervalCache[Long](
      loader = (s, e) => { calls += ((s, e)); if (empty) Seq.empty else s until e },
      eventTs = identity,
      clock = () => 10000L,
      freshnessUs = 100L)
    assert(cache.get(100L, 200L).isEmpty)
    assert(cache.cachedPeriods.isEmpty)
    empty = false // data appeared upstream (e.g. late backfill)
    assert(cache.get(100L, 200L) == (100L until 200L))
    assert(calls.toList == List((100L, 200L), (100L, 200L)))
  }
}
