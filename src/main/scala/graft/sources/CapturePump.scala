package graft.sources

import scala.collection.mutable

/** Live-capture plumbing: the transport-facing tier the reference runs
  * as an asyncio websocket pump (`python/obadiah/capture.py:96-175`)
  * feeding a heap reorder buffer (`python/obadiah/reorder.py:27-112`).
  * The sandbox has no network, so the socket itself is behind the
  * [[Transport]] seam — everything above it (reconnect policy,
  * backlog watermarking, delay-based reordering) is real, clock-
  * injected, and unit-tested. A production deployment implements
  * `Transport` with a websocket client and hands the ordered output
  * to the Structured Streaming tier (`streaming/StreamingOps`).
  */
object CapturePump {

  /** One received frame: capture-local arrival time (µs) + payload. */
  final case class Frame(localTs: Long, message: String)

  /** A connection attempt's outcome, mirroring the exception split in
    * `capture.py:152-166`: recoverable transport failures re-connect,
    * anything else propagates. */
  final class TransportException(msg: String) extends RuntimeException(msg)

  /** The socket seam. `connect()` yields a frame iterator that may end
    * normally (server close), throw [[TransportException]] mid-stream
    * (recoverable — the pump reconnects), or throw anything else
    * (fatal — the pump rethrows). */
  trait Transport {
    def connect(): Iterator[String]
  }

  /** Backlog watermark logger (`capture.py:27-51`): warns when the
    * queue outgrows the previous high-water mark (then raises the mark
    * by 1.25×) and when it falls back below 0.75/1.25 of the mark
    * (then lowers the mark). Events are recorded, not printed, so
    * tests can assert the policy. */
  final class QueueSizeLog(minMaxQueue: Int) {
    private var maxQueue: Double = minMaxQueue.toDouble
    val events: mutable.Buffer[(String, Int)] = mutable.Buffer.empty
    def log(backlog: Int): Unit = {
      if (backlog > maxQueue) {
        events += (("growing", backlog))
        maxQueue = backlog * 1.25
      } else if (backlog >= minMaxQueue && backlog < maxQueue * 0.75 / 1.25) {
        events += (("decreasing", backlog))
        maxQueue = backlog.toDouble
      }
    }
  }

  /** Reorder key: ascending (exchangeTs, priority, localTs) — the
    * `OrderedDatabaseInsertion` total order (`reorder.py:25-48`). */
  final case class Ordered[A](exchangeTs: Long, priority: Int, localTs: Long,
      value: A)

  private implicit def ordering[A]: math.Ordering[Ordered[A]] =
    math.Ordering.by(o => (o.exchangeTs, o.priority, o.localTs))

  /** Delay-based heap reorder buffer (`reorder.py:51-112`): an item is
    * released only once something `delay` newer (by local arrival
    * time) has been seen, so out-of-order exchange timestamps within
    * the delay window sort correctly. Deterministic: the caller owns
    * the clock — `offer` advances it with each arrival, `idleTick`
    * advances it on a quiet wire (the `Empty` branch of
    * `receive_unordered`), and both return whatever the new watermark
    * releases in exchange-time order. */
  final class Reorderer[A](delayUs: Long) {
    private val heap = mutable.PriorityQueue.empty[Ordered[A]](
      ordering[A].reverse) // min-heap
    private var latestArrived = Long.MinValue
    private var latestDeparted = Long.MinValue

    def offer(item: Ordered[A]): Seq[Ordered[A]] = {
      if (item.localTs > latestArrived) latestArrived = item.localTs
      heap.enqueue(item)
      release()
    }

    /** Nothing arrived by `nowTs`: advance the watermark anyway. */
    def idleTick(nowTs: Long): Seq[Ordered[A]] = {
      if (nowTs > latestArrived) latestArrived = nowTs
      release()
    }

    /** End of stream: everything still buffered, in order. */
    def drain(): Seq[Ordered[A]] = {
      val out = Seq.newBuilder[Ordered[A]]
      while (heap.nonEmpty) out += heap.dequeue()
      out.result()
    }

    def buffered: Int = heap.size

    private def release(): Seq[Ordered[A]] = {
      val out = Seq.newBuilder[Ordered[A]]
      var go = true
      while (go && heap.nonEmpty) {
        val head = heap.head
        if (head.localTs > latestDeparted) latestDeparted = head.localTs
        if (latestArrived - latestDeparted >= delayUs) {
          out += heap.dequeue()
        } else go = false
      }
      out.result()
    }
  }

  /** The reconnect loop of `capture.py:119-166` as a lazy frame
    * iterator: pull frames from the current connection; on a
    * recoverable [[TransportException]] or normal end-of-stream,
    * reconnect (up to `maxReconnects` total connections) and keep
    * pulling; on anything else, rethrow. `clock` stamps each frame's
    * local arrival time. */
  final class ReconnectingPump(transport: Transport, clock: () => Long,
      maxReconnects: Int = 1000) extends Iterator[Frame] {
    var connections: Int = 0
    val backlogLog = new QueueSizeLog(100)
    private var current: Iterator[String] = Iterator.empty
    private var nextFrame: Option[Frame] = None
    private var closed = false

    private def pull(): Unit = {
      while (nextFrame.isEmpty && !closed) {
        val got =
          try {
            if (current.hasNext) Some(current.next()) else None
          } catch {
            case _: TransportException => None // recoverable: reconnect
          }
        got match {
          case Some(msg) => nextFrame = Some(Frame(clock(), msg))
          case None =>
            if (connections >= maxReconnects) closed = true
            else {
              connections += 1
              current =
                try transport.connect()
                catch {
                  case _: TransportException => Iterator.empty // retry
                }
            }
        }
      }
    }

    override def hasNext: Boolean = { pull(); nextFrame.isDefined }
    override def next(): Frame = {
      pull()
      val f = nextFrame.getOrElse(throw new NoSuchElementException)
      nextFrame = None
      f
    }
  }

  /** End-to-end capture shape: pump frames across reconnects, stamp
    * arrival, reorder by exchange time within the delay window. The
    * caller extracts the exchange timestamp (and a priority for
    * same-timestamp kinds, e.g. snapshots before updates) from the
    * payload — `capture` stays format-agnostic like the reference's
    * `MessageHandler` split. */
  def capture(transport: Transport, clock: () => Long, delayUs: Long,
      key: String => (Long, Int)): Iterator[Ordered[String]] = {
    val pump = new ReconnectingPump(transport, clock)
    val buf = new Reorderer[String](delayUs)
    val live = pump.flatMap { f =>
      val (ets, prio) = key(f.message)
      val out = buf.offer(Ordered(ets, prio, f.localTs, f.message))
      // the reorder buffer is the pump's internal queue: its depth is
      // the backpressure signal the reference's QueueSizeLogger tracks
      pump.backlogLog.log(buf.buffered)
      out
    }
    live ++ new Iterator[Ordered[String]] {
      private var tail: Iterator[Ordered[String]] = null
      private def t = { if (tail == null) tail = buf.drain().iterator; tail }
      def hasNext = t.hasNext
      def next() = t.next()
    }
  }
}
