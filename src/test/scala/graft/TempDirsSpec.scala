package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime contract of TempDirs.writeOnce: at-most-once builds,
  * retry-on-failure, and the r6 lock-order guard (the acyclic-nesting
  * rule was documented in r4/r5 but unenforced — a two-lock cycle
  * would have deadlocked silently under concurrency).
  */
class TempDirsSpec extends AnyFunSuite {

  test("writeOnce runs a build at most once per key") {
    var n = 0
    TempDirs.writeOnce("tds_once") { n += 1 }
    TempDirs.writeOnce("tds_once") { n += 1 }
    assert(n == 1)
  }

  test("a failed build stores nothing, so the next caller retries") {
    var n = 0
    intercept[RuntimeException](
      TempDirs.writeOnce("tds_retry") { n += 1; sys.error("boom") })
    TempDirs.writeOnce("tds_retry") { n += 1 }
    assert(n == 2)
  }

  test("self-nested writeOnce on the same key dies loudly") {
    val e = intercept[IllegalStateException](
      TempDirs.writeOnce("tds_self") {
        TempDirs.writeOnce("tds_self") {}
      })
    assert(e.getMessage.contains("re-entered"))
  }

  test("a deliberate two-lock cycle dies with the inversion message, not a deadlock") {
    // first nesting order: X over Y — the inner build fails, so
    // neither key is marked written and both builds stay live
    intercept[RuntimeException](
      TempDirs.writeOnce("tds_cycX") {
        TempDirs.writeOnce("tds_cycY") { sys.error("keep unbuilt") }
      })
    // inverted order: Y over X — under concurrency this is the
    // two-thread deadlock; the guard must kill it here and say why
    val e = intercept[IllegalStateException](
      TempDirs.writeOnce("tds_cycY") {
        TempDirs.writeOnce("tds_cycX") {}
      })
    assert(e.getMessage.contains("lock-order inversion"))
    assert(e.getMessage.contains("tds_cycX") &&
      e.getMessage.contains("tds_cycY"))
  }

  test("one-directional nesting stays legal after the guard") {
    var built = 0
    TempDirs.writeOnce("tds_outer") {
      TempDirs.writeOnce("tds_inner") { built += 1 }
      built += 1
    }
    // same direction again elsewhere is fine (already-built: no-op)
    TempDirs.writeOnce("tds_outer") { built += 10 }
    assert(built == 2)
  }
}
