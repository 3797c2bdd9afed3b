package graft.tables

import org.scalatest.funsuite.AnyFunSuite

/** The commit-notification bus behind the streaming pollers (r11): the
  * sequence-snapshot protocol must make wakeups at-most-late, never
  * lost, and the fallback timeout must remain load-bearing.
  */
class CommitBusSpec extends AnyFunSuite {

  test("signal bumps the per-location sequence; locations are independent") {
    val a = s"/tmp/bus-a-${System.nanoTime()}"
    val b = s"/tmp/bus-b-${System.nanoTime()}"
    val s0 = CommitBus.seq(a)
    CommitBus.signal(a)
    assert(CommitBus.seq(a) == s0 + 1)
    assert(CommitBus.seq(b) == 0L)
  }

  test("a commit landing during the scan makes awaitChange return immediately") {
    val loc = s"/tmp/bus-race-${System.nanoTime()}"
    val seen = CommitBus.seq(loc)
    CommitBus.signal(loc) // lands between snapshot and wait — the race
    val t0 = System.nanoTime()
    val now = CommitBus.awaitChange(loc, seen, timeoutMs = 5000)
    assert((System.nanoTime() - t0) / 1e6 < 500.0, "must not wait out the timeout")
    assert(now == seen + 1)
  }

  test("no commit → waits out the timeout (fallback stays load-bearing)") {
    val loc = s"/tmp/bus-idle-${System.nanoTime()}"
    val seen = CommitBus.seq(loc)
    val t0 = System.nanoTime()
    CommitBus.awaitChange(loc, seen, timeoutMs = 150)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms >= 140.0, f"returned after $ms%.0f ms — timeout not honored")
  }

  test("a waiter parked in awaitChange wakes on signal within milliseconds") {
    val loc = s"/tmp/bus-wake-${System.nanoTime()}"
    val seen = CommitBus.seq(loc)
    @volatile var wokenAfterMs = -1.0
    val t0 = System.nanoTime()
    val waiter = new Thread(() => {
      CommitBus.awaitChange(loc, seen, timeoutMs = 10000)
      wokenAfterMs = (System.nanoTime() - t0) / 1e6
    })
    waiter.start()
    Thread.sleep(100)
    CommitBus.signal(loc)
    waiter.join(2000)
    assert(!waiter.isAlive)
    assert(wokenAfterMs < 2000.0, f"woke after $wokenAfterMs%.0f ms")
  }
}
