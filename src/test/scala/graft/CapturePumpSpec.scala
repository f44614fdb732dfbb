package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CapturePump
import graft.sources.CapturePump._

/** The capture tier above the (sandboxed-out) socket: reconnect
  * policy, backlog watermark logging, and the delay-based heap reorder
  * buffer, each against the reference semantics
  * (`python/obadiah/capture.py:96-175`, `reorder.py:27-112`).
  */
class CapturePumpSpec extends AnyFunSuite {

  test("reorderer releases in exchange order within the delay window") {
    val r = new Reorderer[String](delayUs = 1000L)
    // arrivals out of exchange order, within 1ms of each other
    assert(r.offer(Ordered(500L, 0, 10L, "a")).isEmpty)
    assert(r.offer(Ordered(200L, 0, 20L, "b")).isEmpty) // older exch ts, later arrival
    assert(r.offer(Ordered(300L, 0, 30L, "c")).isEmpty)
    // watermark advances past head+delay → releases sorted by exchange ts
    val out = r.idleTick(2000L)
    assert(out.map(_.value) == Seq("b", "c", "a"))
  }

  test("reorderer breaks exchange-ts ties by priority then local ts") {
    val r = new Reorderer[Int](delayUs = 1000L)
    r.offer(Ordered(100L, 1, 5L, 1))
    r.offer(Ordered(100L, 0, 6L, 2))
    r.offer(Ordered(100L, 1, 4L, 3))
    assert(r.drain().map(_.value) == Seq(2, 3, 1))
  }

  test("reorderer holds items younger than the delay") {
    val r = new Reorderer[String](delayUs = 1000L)
    r.offer(Ordered(1L, 0, 100L, "x"))
    assert(r.offer(Ordered(2L, 0, 1050L, "y")).map(_.value) == Seq.empty)
    assert(r.buffered == 2)
    // 100 departs once arrivals reach 1100; 1050 still held
    assert(r.idleTick(1100L).map(_.value) == Seq("x"))
    assert(r.buffered == 1)
    assert(r.drain().map(_.value) == Seq("y"))
  }

  test("pump survives mid-stream transport failures and reconnects") {
    var attempts = 0
    val transport = new Transport {
      def connect(): Iterator[String] = {
        attempts += 1
        attempts match {
          case 1 => Iterator("f1", "f2") ++ new Iterator[String] {
            def hasNext = true
            def next() = throw new TransportException("dropped")
          }
          case 2 => throw new TransportException("handshake refused")
          case 3 => Iterator("f3")
          case _ => Iterator.empty
        }
      }
    }
    var now = 0L
    val pump = new ReconnectingPump(transport, () => { now += 10; now },
      maxReconnects = 5)
    val frames = pump.toList
    assert(frames.map(_.message) == List("f1", "f2", "f3"))
    assert(frames.map(_.localTs) == List(10L, 20L, 30L))
    assert(pump.connections == 5) // 3 real + 2 empty before giving up
  }

  test("pump rethrows non-transport failures") {
    val transport = new Transport {
      def connect(): Iterator[String] = new Iterator[String] {
        def hasNext = true
        def next() = throw new IllegalStateException("bug, not the wire")
      }
    }
    val pump = new ReconnectingPump(transport, () => 0L, maxReconnects = 2)
    intercept[IllegalStateException] { pump.toList }
  }

  test("queue-size log raises and lowers the watermark like the reference") {
    val q = new QueueSizeLog(minMaxQueue = 100)
    q.log(50)   // below the floor: silent
    q.log(150)  // above mark 100 → warn growing, mark = 187.5
    q.log(180)  // within mark: silent
    q.log(250)  // above → warn growing, mark = 312.5
    q.log(110)  // >= floor and < 312.5*0.6 → warn decreasing, mark = 110
    assert(q.events.toList ==
      List(("growing", 150), ("growing", 250), ("decreasing", 110)))
  }

  test("capture end-to-end: reconnects + reorder produce ordered stream") {
    // two connections; exchange timestamps arrive shuffled
    var attempts = 0
    val transport = new Transport {
      def connect(): Iterator[String] = {
        attempts += 1
        attempts match {
          case 1 => Iterator("30", "10") ++ new Iterator[String] {
            def hasNext = true
            def next() = throw new TransportException("flap")
          }
          case 2 => Iterator("20", "40", "50")
          case _ => Iterator.empty
        }
      }
    }
    var now = 0L
    val out = CapturePump.capture(transport, () => { now += 100; now },
      delayUs = 250L, key = m => (m.toLong, 0)).toList
    assert(out.map(_.value) == List("10", "20", "30", "40", "50"))
    assert(out.map(_.exchangeTs) == List(10L, 20L, 30L, 40L, 50L))
  }
}
