package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's baseline-promotion predicate (r12 verdict #5 + the r13
  * review finding): the committed calm bench_prev.json must only be
  * replaced by a run at least as calm as it, under BOTH bounds.
  */
class BenchPromotionSpec extends AnyFunSuite {
  private val gate = 3.0 // GRAFT_BENCH_MAX_LOAD default

  test("the r12 incident: an ambient load-2.6 run must NOT displace a load-0.5 calm baseline") {
    assert(!Bench.shouldPromote(nPolluted = 0, gatedLoad = 2.6,
      maxLoad = gate, prevGateLoad = Some(0.5)))
  }

  test("a run as calm as the baseline (within the 0.5 jitter allowance) promotes") {
    assert(Bench.shouldPromote(0, gatedLoad = 0.9, gate, Some(0.5)))
    assert(Bench.shouldPromote(0, gatedLoad = 1.0, gate, Some(0.5)))
  }

  test("the admission gate still binds when the old baseline was noisy") {
    // old baseline at 4.0 (admitted before the gate existed): a new run
    // must still meet the 3.0 gate, not inherit the noisy 4.5 bar
    assert(!Bench.shouldPromote(0, gatedLoad = 3.4, gate, Some(4.0)))
    assert(Bench.shouldPromote(0, gatedLoad = 2.9, gate, Some(4.0)))
  }

  test("any load-polluted sample vetoes promotion regardless of gate load") {
    assert(!Bench.shouldPromote(nPolluted = 1, gatedLoad = 0.1, gate, Some(2.0)))
  }

  test("a missing or unparsable baseline always promotes (self-heal), even polluted") {
    assert(Bench.shouldPromote(nPolluted = 3, gatedLoad = 9.9, gate, None))
  }
}
