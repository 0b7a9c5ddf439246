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
  *
  * Round 5: the headline is the SESSION FLOOR RATIO — per-side best tps over
  * all reps (every rep runs the same deterministic job on the same input, so
  * timing noise is additive contamination and min-time per side estimates
  * the uncontaminated time). Windows remain as the dispersion audit
  * (`windowMedian`/`windows`/`rejected`/`suspect`).
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
    assert(e.rejected.forall(_ > 1.0), s"rejected a possible value: ${e.rejected}")
    assert(e.suspect.forall(_ <= 1.0), s"suspect window > 1.0: ${e.suspect}")
    // the window median never silently blends suspect windows into clean
    // ones: either it used only clean windows, or it fell back to only
    // suspect ones and said so
    if (e.usedSuspect) assert(e.windows == e.suspect)
    // the published figure is always exactly one of the two estimators, and
    // the drift flag says which: clean-window median under detected
    // worsening drift, floor ratio (capped) otherwise. Drift never publishes
    // a suspect-windows median — (c) requires a clean window.
    if (e.drift) {
      assert(e.eff == math.min(e.windowMedian, 1.0), "drift must publish the window median")
      assert(!e.usedSuspect && e.windows.nonEmpty,
        "drift adjustment requires a clean window")
    } else assert(e.eff == math.min(e.raw, 1.0),
      "no drift: the floor ratio (capped) is the headline")
  }

  test("physically-impossible (>1.0) window is rejected, not medianed in") {
    // warmup + clean window at ~0.85 + window where a steal burst slowed the
    // SMALL side ~30% (big side unchanged — ratio reads ~1.22): exactly the
    // round-4 driver artifact's shape
    val all = Seq(round(900, 0.80),
      round(1000, 0.86), round(1010, 0.84),
      (700.0, 3430.0), (705.0, 3445.0))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.rejected.size == 1 && e.rejected.head > 1.0)
    assert(e.windows.size == 1 && math.abs(e.windows.head - 0.8515) < 0.001)
    // headline = floor ratio: floorSmall 1010, floorBig 3445
    assert(math.abs(e.raw - 3445.0 / (4.0 * 1010.0)) < 1e-12)
    assert(e.eff == e.raw)
    assert(e.roundsScored == 4 && !e.warmupOnly)
  }

  test("small side stole EVERY scored round: floors (via warmup) recover, junk windows flagged") {
    // both scored windows read >1.0 because the small side never ran clean
    // after warmup — but the warmup round demonstrated small=900, so the
    // session floors still yield a sane 0.833 while both windows land in
    // rejected, flagging the artifact's dispersion as junk.
    val all = Seq(round(900, 0.8),
      round(600, 1.25), round(610, 1.22),
      round(650, 1.10), round(660, 1.12))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.windows.isEmpty && e.rejected.size == 2)
    assert(math.abs(e.raw - 3000.0 / (4.0 * 900.0)) < 1e-12)
    assert(e.eff == e.raw)
    assert(e.windowMedian > 1.0) // the junk dispersion is visible, not blended
  }

  test("floor ratio itself impossible: capped, appended to rejected") {
    // the small side NEVER ran clean, warmup included — the floor ratio
    // exceeds 1.0, eff is capped, and the floor ratio itself is listed in
    // rejected so the artifact carries no unexplained >1.0 figure.
    val all = Seq((600.0, 3000.0),
      (610.0, 2990.0), (605.0, 3010.0),
      (615.0, 2995.0), (600.0, 3005.0))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.raw > 1.0 && e.eff == 1.0)
    assert(e.rejected.contains(e.raw))
  }

  test("replacement window restores a clean two-window median") {
    // window2 junk (small-side steal, big unchanged), window3 is the re-run
    val all = Seq(round(900, 0.8),
      round(1000, 0.86), round(1010, 0.84),
      (700.0, 3430.0), (705.0, 3445.0),
      round(995, 0.88), round(1005, 0.82))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.windows.size == 2 && e.rejected.size == 1)
    assert(e.windowMedian <= 1.0 && e.windowMedian > 0.8)
    // floors: small 1010, big 3502.4 (the 0.88 rep of the replacement)
    assert(math.abs(e.raw - 3502.4 / (4.0 * 1010.0)) < 1e-9)
    assert(e.raw <= 1.0 && e.raw > 0.8)
  }

  test("warmup-only trace is flagged (never a silent full measurement)") {
    val e = Bench.estimate(Seq(round(1000, 0.75)), reps = 2)
    invariant(e)
    assert(e.roundsScored == 0 && e.warmupOnly)
    assert(math.abs(e.raw - 0.75) < 1e-12)
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

  test("big-side steal-deflated window is suspect-excluded when a clean one exists") {
    // run-2 shape (round-5 validation): a sustained steal stretch slowed the
    // BIG side 20-30% below its session floor, deflating the ratio to ~0.65
    // while the small side stayed calm. With one clean window present the
    // suspect window must be excluded from the window median, not averaged
    // in — and the floors come from the clean stretch.
    val all = Seq(round(900, 0.80),
      round(1000, 0.86), round(1010, 0.84),       // clean window (floorBig 3440)
      round(1000, 0.64), round(1005, 0.66))       // big bests ≤ 2653 — >15% below floor
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.suspect.size == 1 && e.suspect.head < 0.7)
    assert(!e.usedSuspect && e.windows.size == 1 && e.windows.head > 0.8)
    assert(e.raw == e.windows.head) // floors live in the clean window here
    assert(e.windowMedian == e.windows.head)
  }

  test("small-side steal that stays below 1.0 is still suspect-excluded (symmetric)") {
    // small-side steal INFLATES the ratio; when the inflation keeps the
    // estimate under 1.0 the >1.0 rejection never fires, but the window's
    // small-side best sits >15% below the session floor — suspect.
    val all = Seq(round(950, 0.80),
      round(1000, 0.84), round(1010, 0.82),       // clean (floorSmall 1010)
      round(760, 0.99), round(750, 0.97))         // small bests ≤ 760 — >15% below floor
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.suspect.size == 1 && e.suspect.head > 0.9)
    assert(!e.usedSuspect && e.windows.size == 1 && e.windows.head < 0.85)
    assert(e.raw == e.windows.head)
  }

  test("all windows suspect: floors rest on warmup alone and usedSuspect flags it") {
    // a fast warmup pins the floors; every scored window then runs slow on
    // the big side — there is no clean window corroborating the floors, so
    // the estimator still publishes the floor ratio but flags the artifact.
    val all = Seq((1200.0, 4.0 * 1200.0 * 0.85),
      round(1180, 0.60), round(1190, 0.62),
      round(1185, 0.58), round(1175, 0.61))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.usedSuspect && e.suspect.size == 2 && e.windows == e.suspect)
    assert(math.abs(e.raw - 0.85) < 1e-9) // warmup-pinned floors
    assert(e.windowMedian < 0.7)          // the contaminated dispersion, visible
    assert(e.eff == e.raw)
  }

  test("warmup drift on the long-rep side: floor ratio recovers the converged value") {
    // round-5 validation run 3, verbatim rep_sec: the 104-second serial side
    // keeps warming monotonically across all five reps (115.7 → 104.2 s)
    // while one p4 rep inside the first scored window took a steal burst
    // (47.6 s vs the 32.1 s floor). Window medians mix the under-warmed p1
    // reps with the steal-hit p4 rep and read 0.790; the converged floors
    // read 0.812. Both biases are additive contamination — the floor ratio
    // is immune to them by construction.
    val secs = Seq((115.71, 36.10), (110.53, 47.57), (110.16, 35.91),
      (104.17, 32.07), (104.74, 33.09))
    val all = secs.map { case (s, b) => (1e6 / s, 1e6 / b) }
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.rejected.isEmpty && e.suspect.isEmpty)
    assert(math.abs(e.raw - 104.17 / (4.0 * 32.07)) < 1e-9) // 0.8120
    assert(e.raw > 0.81 && e.raw < 0.814)
    assert(e.windowMedian < 0.80 && e.windowMedian > 0.78)  // 0.789 — the bias
    assert(e.eff == e.raw)
  }

  // ---- round-5 worsening-drift detection (validation run r5-8) ----

  test("r5-8 verbatim: worsening common-mode drift publishes the window median") {
    // the machine degraded ~monotonically through the phase (both sides'
    // reps slowing together); the p1 session best IS its warmup rep by 14%,
    // so every scored p1 rep ran contaminated and the floor ratio (0.735)
    // mixes an early-calm p1 best with later-degraded p4 bests. The single
    // clean window (temporally-adjacent reps — common-mode drift cancels)
    // reads 0.840, consistent with the calm-epoch truth of 0.824 (r5-7).
    val secs = Seq((236.56, 95.30), (270.10, 80.43), (282.63, 87.28))
    val all = secs.map { case (s, b) => (1e6 / s, 1e6 / b) }
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.drift && e.driftSides == Seq("small"))
    // floor ratio = t_smallBest / (4 × t_bigBest) = 236.56 / (4 × 80.43)
    assert(math.abs(e.raw - 236.56 / (4.0 * 80.43)) < 1e-9)
    assert(e.raw > 0.73 && e.raw < 0.74)
    assert(e.windows.size == 1 && e.windows.head > 0.83 && e.windows.head < 0.85)
    assert(e.eff == e.windowMedian && e.eff > 0.83)
    assert(e.rejected.isEmpty && e.suspect.isEmpty)
  }

  test("one-sided sustained slowdown is NOT drift: floors stay the headline") {
    // the small side degrades ~8% right after warmup while the big side
    // stays flat at its floor — the two floors are epoch-consistent (the
    // warmup round demonstrated both) and the floor ratio is the truth; the
    // windows, contaminated on one side only, would read inflated. The
    // common-mode corroboration (other side's final draw also above its
    // floor) correctly refuses the adjustment.
    val all = Seq((1000.0, 3400.0),
      (925.0, 3395.0), (920.0, 3402.0),
      (918.0, 3398.0), (922.0, 3400.0))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(!e.drift)
    assert(math.abs(e.raw - 3402.0 / 4000.0) < 1e-12)
    assert(e.eff == e.raw)
    assert(e.windowMedian > e.raw) // the inflation the rule refused to publish
  }

  test("drift with every window suspect keeps the floors (flagged, not swapped)") {
    // both sides degrade hard (>15%) after a calm warmup round: condition
    // (a) fires on both sides but no clean window exists — the estimator
    // publishes the warmup-pinned floor ratio and flags usedSuspect rather
    // than swapping to a median of contaminated windows.
    val all = Seq((1000.0, 3400.0),
      (800.0, 2700.0), (790.0, 2690.0),
      (780.0, 2650.0), (770.0, 2640.0))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(!e.drift && e.usedSuspect)
    assert(e.eff == math.min(e.raw, 1.0))
    assert(math.abs(e.raw - 0.85) < 1e-12)
  }

  test("big-side drift corrects an INFLATED floor ratio down (symmetric)") {
    // the big side's best is its warmup by >4% while the small side keeps
    // (slowly) degrading too — floor ratio pairs an early-calm big best with
    // later-degraded small bests and reads HIGH; the windows correct it down.
    val all = Seq((1000.0, 3600.0),
      (980.0, 3300.0), (970.0, 3280.0),
      (960.0, 3250.0), (950.0, 3230.0))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(e.drift && e.driftSides == Seq("big"))
    assert(e.eff == e.windowMedian)
    assert(e.eff < e.raw) // the correction went DOWN — not a cherry-pick rule
  }

  test("calm session: warmup fastest within tolerance is not drift") {
    // a fully pre-warmed level's warmup round can legitimately tie the floor
    // (r5-7 p1 spread was 0.9%); sub-tolerance warmup-best must not flip the
    // estimator
    val all = Seq((1000.0, 3350.0),
      (995.0, 3360.0), (990.0, 3340.0),
      (992.0, 3345.0), (993.0, 3355.0))
    val e = Bench.estimate(all, reps = 2)
    invariant(e)
    assert(!e.drift)
    assert(e.eff == e.raw)
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

  // ---- round-5 floor-convergence draws (single-side extras) ----

  test("floorGap: relative gap of the two best reps; unconverged below two draws") {
    assert(Bench.floorGap(Nil) == Double.MaxValue)
    assert(Bench.floorGap(Seq(100.0)) == Double.MaxValue)
    // two best of {90, 100, 104}: 104 vs 100 → 4%
    assert(math.abs(Bench.floorGap(Seq(90.0, 100.0, 104.0)) - 0.04) < 1e-12)
    assert(Bench.floorGap(Seq(100.0, 100.0)) == 0.0)
  }

  test("convergence extras tighten a side's floor without touching the windows") {
    // val6 shape: the big side's best paired rep (64.2 s-equivalent tps) sat
    // 9% above a later floor — a big-side extra demonstrates the true floor
    val all = Seq(round(900, 0.80),
      round(1000, 0.82), round(1010, 0.80),
      round(1005, 0.81), round(995, 0.79))
    val base = Bench.estimate(all, reps = 2)
    val extraBig = Seq(4.0 * 1010.0 * 0.88) // one cheap big-side draw
    val e = Bench.estimate(all, reps = 2, extraSmall = Nil, extraBig = extraBig)
    invariant(e)
    assert(e.windows == base.windows)       // windows are paired-rounds only
    assert(e.roundsScored == base.roundsScored)
    assert(math.abs(e.raw - 0.88) < 1e-9)   // floorBig now from the extra
    assert(e.raw > base.raw)
    // and a small-side extra can tighten the OTHER floor back down
    val e2 = Bench.estimate(all, reps = 2,
      extraSmall = Seq(1100.0), extraBig = extraBig)
    invariant(e2)
    assert(e2.raw < e.raw)
    assert(math.abs(e2.raw - 4.0 * 1010.0 * 0.88 / (4.0 * 1100.0)) < 1e-9)
  }

  test("an extra that pushes the floor ratio past 1.0 is capped and explained") {
    val all = Seq(round(900, 0.80), round(1000, 0.85), round(1010, 0.83))
    val e = Bench.estimate(all, reps = 2, extraBig = Seq(4.0 * 1010.0 * 1.1))
    invariant(e)
    assert(e.raw > 1.0 && e.eff == 1.0 && e.rejected.contains(e.raw))
  }

  test("a tighter extra-derived floor can retro-flag a slow window as suspect") {
    // both scored windows' big-side bests sit ~18% above a floor that only a
    // convergence extra demonstrated — with no clean window left, the
    // estimator publishes the floor ratio but flags usedSuspect
    val all = Seq(round(1000, 0.70),
      round(1000, 0.70), round(1005, 0.69),
      round(995, 0.71), round(1002, 0.70))
    val extra = Seq(4.0 * 1005.0 * 0.85)
    val e = Bench.estimate(all, reps = 2, extraBig = extra)
    invariant(e)
    assert(e.usedSuspect && e.suspect.size == 2)
    assert(math.abs(e.raw - 4.0 * 1005.0 * 0.85 / (4.0 * 1005.0)) < 1e-9)
  }

  test("invariant holds across randomized traces with extras") {
    val rng = new scala.util.Random(20260819L)
    for (_ <- 1 to 500) {
      val n = 1 + rng.nextInt(10)
      val trace = (0 until n).map { _ =>
        round(500 + rng.nextDouble() * 1000, 0.4 + rng.nextDouble() * 1.0)
      }
      val exS = (0 until rng.nextInt(3)).map(_ => 400 + rng.nextDouble() * 1400)
      val exB = (0 until rng.nextInt(3)).map(_ => 1600 + rng.nextDouble() * 5000)
      invariant(Bench.estimate(trace, reps = 1 + rng.nextInt(3),
        extraSmall = exS, extraBig = exB))
    }
  }
}
