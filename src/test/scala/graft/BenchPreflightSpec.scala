package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench memory pre-flight (round-11 directive #6): pure-function
  * checks against the MEASURED sf3 floor — a ~515 MB-parquet inventory
  * OOMs a 8 GiB heap at 32 threads and completes at 16 GiB, so the
  * model is ~24 heap bytes per parquet byte per 32 threads and the
  * degrade knob is concurrency. */
class BenchPreflightSpec extends AnyFunSuite {

  private val MiB = 1L << 20
  private val GiB = 1L << 30

  test("the measured sf3 floor: 24 GiB runs wide, 8/16 GiB degrade instead of OOMing") {
    val sf3 = 515L * MiB
    assert(Bench.preflightCores(32, sf3, 24L * GiB) === 32,
      "24 GiB clears the ~32 B/B sf3 requirement at 32 threads")
    // 16 GiB completed round 10's inventory but round 11 measured a
    // late-run UNABLE_TO_ACQUIRE_MEMORY there (grown quiet set + 45 min
    // of GC pressure) -- the planner now shaves concurrency slightly
    val at16 = Bench.preflightCores(32, sf3, 16L * GiB)
    assert(at16 < 32 && at16 >= 28, s"16 GiB is the knife edge: $at16")
    val degraded = Bench.preflightCores(32, sf3, 8L * GiB)
    assert(degraded < at16 && degraded >= 2,
      s"8 GiB OOMed mid-inventory outright -- must degrade hard, got $degraded")
  }

  test("small inventories never degrade; pathological inputs floor at 2 threads") {
    assert(Bench.preflightCores(32, 17L * MiB, 2L * GiB) === 32,
      "sf0.1 fits any sane heap")
    assert(Bench.preflightCores(4, 0L, 1L * GiB) === 4, "empty dir = no-op")
    assert(Bench.preflightCores(32, 100L * GiB, 1L * GiB) === 2,
      "a hopeless heap still runs, single-file-at-a-time slow, never OOM-by-design")
  }

  test("degradation scales linearly with the heap") {
    val sf3 = 515L * MiB
    val at8 = Bench.preflightCores(32, sf3, 8L * GiB)
    val at4 = Bench.preflightCores(32, sf3, 4L * GiB)
    assert(at4 < at8, s"half the heap must run narrower: $at4 !< $at8")
  }
}
