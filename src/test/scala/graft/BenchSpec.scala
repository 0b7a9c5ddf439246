package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench pair estimator's hard invariants on synthetic noisy-rep
  * traces (round-4 verdict item 2): the published artifact must NEVER carry
  * an unexplained efficiency above 1.0 — reported eff ≤ 1.0 always, every
  * accepted window ≤ 1.0, and raw ≤ 1.0 unless `rejected` is non-empty. The
  * round-4 driver record violated this in spirit: fused windows
  * [0.876, 1.295] were MEDIANED into raw 1.086 instead of the 1.295 window
  * being rejected (steal on the SMALL side inflates the ratio — a physically
  * impossible N→4N reading, not a measurement).
  */
class BenchSpec extends AnyFunSuite {

  /** One alternating round: (tps at N, tps at 4N). A round with perfect
    * linear scaling has big = 4 × small.
    */
  private def round(small: Double, eff: Double): (Double, Double) =
    (small, 4.0 * small * eff)

  private def invariant(e: Bench.Estimate): Unit = {
    assert(e.eff <= 1.0, s"reported eff ${e.eff} > 1.0")
    assert(e.windows.forall(_ <= 1.0), s"accepted window > 1.0: ${e.windows}")
    assert(e.raw <= 1.0 || e.rejected.nonEmpty,
      s"raw ${e.raw} > 1.0 without a rejected_windows explanation")
    assert(e.rejected.forall(_ > 1.0), s"rejected a possible window: ${e.rejected}")
  }

  test("physically-impossible (>1.0) window is rejected, not medianed in") {
    // warmup + window1 at 0.85 + window2 where a steal burst deflated the
    // SMALL side (ratio 1.30) — exactly the round-4 driver artifact's shape
    val all = Seq(round(900, 0.80),
      round(1000, 0.86), round(1010, 0.84),
      round(700, 1.31), round(705, 1.29))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.rejected.size == 1 && e.rejected.head > 1.0)
    assert(e.windows.size == 1 && math.abs(e.windows.head - 0.86) < 0.01)
    assert(e.raw == e.windows.head, "raw must be the accepted window, not a blend")
    assert(e.roundsScored == 4 && !e.warmupOnly)
  }

  test("all windows impossible: raw = least-impossible, eff capped, flagged") {
    val all = Seq(round(900, 0.8),
      round(600, 1.25), round(610, 1.22),
      round(650, 1.10), round(660, 1.12))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.windows.isEmpty && e.rejected.size == 2)
    assert(e.eff == 1.0 && e.raw > 1.0)
    assert(math.abs(e.raw - e.rejected.min) < 1e-12)
  }

  test("replacement window restores a clean two-window median") {
    // window2 junk, window3 is the re-run replacement
    val all = Seq(round(900, 0.8),
      round(1000, 0.86), round(1010, 0.84),
      round(700, 1.31), round(705, 1.29),
      round(995, 0.88), round(1005, 0.82))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.windows.size == 2 && e.rejected.size == 1)
    // median of two accepted bests-ratio windows
    assert(e.raw <= 1.0 && e.raw > 0.8)
  }

  test("warmup-only trace is flagged (never a silent full measurement)") {
    val e = Bench.estimate(Seq(round(1000, 0.75)), reps = 2)
    invariant(e)
    assert(e.roundsScored == 0 && e.warmupOnly)
  }

  test("single scored round: scored, not warmup-only") {
    val e = Bench.estimate(Seq(round(900, 0.7), round(1000, 0.83)), reps = 2)
    invariant(e)
    assert(e.roundsScored == 1 && !e.warmupOnly)
    assert(math.abs(e.raw - 0.83) < 1e-9)
  }

  test("deadline-trimmed trailing window merges into the previous one") {
    // 5 scored rounds at reps=2 → groups [2,2,1] → [2,3]
    val all = Seq(round(900, 0.8),
      round(1000, 0.85), round(1010, 0.83),
      round(1005, 0.84), round(995, 0.86), round(1002, 0.82))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.windows.size == 2)
    assert(e.roundsScored == 5)
  }

  test("invariant holds across randomized steal traces") {
    val rng = new scala.util.Random(20260818L)
    for (_ <- 1 to 500) {
      val n = 1 + rng.nextInt(12)
      val trace = (0 until n).map { _ =>
        // eff drawn wide on both sides of 1.0: calm, steal-deflated, and
        // impossible steal-inflated rounds all occur
        round(500 + rng.nextDouble() * 1000, 0.4 + rng.nextDouble() * 1.0)
      }
      invariant(Bench.estimate(trace, reps = 1 + rng.nextInt(3)))
    }
  }
}
