package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench protocol's pure logic — the probe-bracket
  * qualification rule (v6.1 brackets + v6.4 validity-floor retries) and
  * the artifact's locale-independent number rendering. No SparkSession:
  * these are the driver-side decisions that decide whether a 30-minute
  * measurement counts, so they get direct tests instead of riding the
  * end-to-end bench. */
class BenchSpec extends AnyFunSuite {

  // hist entries: (endSec, efficiency, roundId), chronological

  test("after-side bracket judges a probe round by its FINAL reading") {
    // run spans [100, 200]; the after round's first attempt is a broken
    // (<0.25) measurement the v6.4 floor retries — the retry passes.
    // Judging by the first attempt would falsely disqualify the run.
    val hist = Seq((50.0, 0.95, 1), (230.0, 0.09, 2), (290.0, 0.92, 2))
    assert(Bench.bracketPass(100, 200, hist, 0.8))
  }

  test("a fully-broken after round (all retries fail) stays disqualified") {
    val hist = Seq((50.0, 0.95, 1), (230.0, 0.09, 2), (290.0, 0.10, 2), (350.0, 0.20, 2))
    assert(!Bench.bracketPass(100, 200, hist, 0.8))
  }

  test("before-side uses the round's final (chronologically last) reading") {
    // retried before-round: broken then good → the good final reading brackets
    assert(Bench.bracketPass(100, 200,
      Seq((40.0, 0.09, 1), (90.0, 0.93, 1), (230.0, 0.90, 2)), 0.8))
    // degraded final reading → disqualified even though an earlier attempt passed
    assert(!Bench.bracketPass(100, 200,
      Seq((40.0, 0.93, 1), (90.0, 0.40, 1), (230.0, 0.90, 2)), 0.8))
  }

  test("a run is not qualified without a probe round on EACH side") {
    val before = Seq((50.0, 0.95, 1))
    assert(!Bench.bracketPass(100, 200, before, 0.8), "no after round")
    val after = Seq((230.0, 0.95, 1))
    assert(!Bench.bracketPass(100, 200, after, 0.8), "no before round")
    assert(!Bench.bracketPass(100, 200, Nil, 0.8), "no rounds at all")
  }

  test("an unstamped run (negative span) can never qualify") {
    val hist = Seq((50.0, 0.95, 1), (230.0, 0.95, 2))
    assert(!Bench.bracketPass(-1, -1, hist, 0.8))
  }

  test("degraded-but-valid readings (0.3-0.5) disqualify on both sides") {
    // real degradation reads above the 0.25 validity floor and must NOT
    // be retried away — it is the signal the brackets exist to catch
    assert(!Bench.bracketPass(100, 200,
      Seq((50.0, 0.42, 1), (230.0, 0.95, 2)), 0.8))
    assert(!Bench.bracketPass(100, 200,
      Seq((50.0, 0.95, 1), (230.0, 0.42, 2)), 0.8))
  }

  test("artifact numbers render with Locale.ROOT decimals in any default locale") {
    val old = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // decimal comma
      assert(Bench.f(0.8461) === "0.8461")
      assert(Bench.f(26187.0004) === "26187.0004")
    } finally java.util.Locale.setDefault(old)
  }

  test("NaN/Inf render as -1 (valid JSON for skipped probes)") {
    assert(Bench.f(Double.NaN) === "-1")
    assert(Bench.f(Double.PositiveInfinity) === "-1")
    assert(Bench.f(Double.NegativeInfinity) === "-1")
  }
}
