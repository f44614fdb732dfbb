package graft

/** Client-side interval cache: the API-layer result reuse the
  * reference ships in its R client (`R/cache.R:71-194`, callers at
  * `R/obanalytics.R:218-263`). Results are cached per contiguous
  * time period; a query loads only the uncovered gaps, and touching
  * periods coalesce into one entry. Data newer than the freshness
  * bound (reference: `now() - minutes(15)`) is never cached — the
  * upstream store may still be mutating it — so a query spanning the
  * bound serves `[start, bound)` from cache and re-loads
  * `[bound, end)` every time.
  *
  * Engine-agnostic on purpose: `T` is a result row, `eventTs`
  * extracts its event time, and `loader` is whatever runs the real
  * query (a Spark job in `GraftApi`). The clock is injected so the
  * freshness rule is deterministic under test.
  */
final class IntervalCache[T](
    loader: (Long, Long) => Seq[T],
    eventTs: T => Long,
    clock: () => Long,
    freshnessUs: Long = 15L * 60 * 1000000L) {

  import IntervalCache.Entry
  private var entries: Vector[Entry[T]] = Vector.empty

  /** Cached periods, for diagnostics — `getCachedPeriods`
    * (`R/cache.R:27-39`). */
  def cachedPeriods: Seq[(Long, Long)] = entries.map(en => (en.s, en.e))

  /** Query `[start, end)` (or `[start, end]` with `rightClosed`,
    * the R client's `right` flag, `R/cache.R:168-194`). */
  def get(start: Long, end: Long, rightClosed: Boolean = false): Seq[T] = {
    require(start <= end, s"inverted interval [$start, $end]")
    val bound = clock() - freshnessUs
    // a closed right end means loading one more µs tick — the analogue
    // of the reference's ceiling_date widening (`R/obanalytics.R:179`)
    val endEff = if (rightClosed) end + 1 else end
    val out =
      if (start > bound) loader(start, endEff) // entirely fresh: bypass
      else if (endEff <= bound) loadCached(start, endEff)
      else loadCached(start, bound) ++ loader(bound, endEff)
    out.filter { r =>
      val t = eventTs(r)
      t >= start && (if (rightClosed) t <= end else t < end)
    }
  }

  /** Serve `[s, e)` from the cache, first filling any gaps — the
    * merge/split walk of `.update_cache` (`R/cache.R:71-165`)
    * collapsed to: take every entry touching the span, load the
    * uncovered gaps, coalesce the lot into one entry covering the
    * union. Empty results are not cached (the reference skips the
    * insert when "all queries returned no rows"). */
  private def loadCached(s: Long, e: Long): Seq[T] = {
    entries.find(en => en.s <= s && e <= en.e) match {
      case Some(en) => en.data
      case None =>
        val (touching, rest) = entries.partition(en => en.s <= e && s <= en.e)
        val sorted = touching.sortBy(_.s)
        val newS = (s +: sorted.map(_.s)).min
        val newE = (e +: sorted.map(_.e)).max
        val merged = Vector.newBuilder[T]
        var cur = newS
        sorted.foreach { en =>
          if (cur < en.s) merged ++= loader(cur, en.s)
          merged ++= en.data
          cur = math.max(cur, en.e)
        }
        if (cur < newE) merged ++= loader(cur, newE)
        val data = merged.result().sortBy(eventTs)
        if (data.nonEmpty) entries = rest :+ Entry(newS, newE, data)
        else entries = rest
        data
    }
  }
}

object IntervalCache {
  private final case class Entry[T](s: Long, e: Long, data: Vector[T])
}
