package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the storm-robust per-query gate statistic (VERDICT r17 task #1).
  *
  * BENCH_r17 published q04_having at 4.20 s (median) whose quiesced twin
  * reads 0.41 s — the rep was kept only because the bounded retry budget
  * exhausted mid-storm, and its stamped contention said so. The rule: when
  * the kept-rep contention exceeds `retry_at`, the published gate value is
  * the rep MIN (a whole-VM stall storm can only inflate a sample, never
  * deflate it), matching the best-of-N-min discipline the gate anchors
  * already use. Clean entries keep publishing the median.
  */
class BenchGateSpec extends AnyFunSuite {
  private val RETRY_AT = 1.15

  test("clean entry (cont <= retry_at) publishes the median") {
    val xs = Seq(0.40, 0.45, 0.42, 0.41, 0.44)
    assert(Bench.gateStat(xs, cont = 1.03, RETRY_AT) === Bench.median(xs))
    assert(math.abs(Bench.gateStat(xs, 1.03, RETRY_AT) - 0.42) < 1e-12)
  }

  test("storm-kept entry (cont > retry_at) publishes the rep min") {
    // shape of the r17 q04_having record: one clean rep, storms kept
    val xs = Seq(4.20, 0.41, 5.89, 4.10, 3.90)
    assert(Bench.gateStat(xs, cont = 5.6, RETRY_AT) === 0.41)
  }

  test("cont exactly at retry_at still publishes the median (gate is strict >)") {
    val xs = Seq(1.0, 2.0, 3.0)
    assert(Bench.gateStat(xs, cont = RETRY_AT, RETRY_AT) === 2.0)
  }

  test("failed reps (-1 sentinels) are excluded from both stats") {
    assert(Bench.gateStat(Seq(-1.0, 0.5, 0.7), cont = 9.0, RETRY_AT) === 0.5)
    assert(Bench.gateStat(Seq(-1.0, -1.0), cont = 9.0, RETRY_AT) === -1.0)
    assert(Bench.gateStat(Seq(-1.0, -1.0), cont = 1.0, RETRY_AT) === -1.0)
  }

  test("unstamped contention (-1, e.g. anchors-only path) keeps the median") {
    val xs = Seq(0.3, 0.9, 0.6)
    assert(Bench.gateStat(xs, cont = -1.0, RETRY_AT) === 0.6)
  }
}
