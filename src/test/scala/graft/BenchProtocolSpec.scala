package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression protocol's decision logic (r14 verdict #1's
  * done-criterion): the steady registry parses/appends/medians
  * correctly, and — the point of the rework — a deliberate 2×
  * slowdown of ONE query still trips its hot row even when the run's
  * median is clean (the all-time-min drift could no longer make that
  * distinction). */
class BenchProtocolSpec extends AnyFunSuite {
  import BenchProtocol._

  test("parseRegistry reads both the flat-best and the steady-array shapes") {
    val best = parseRegistry("""{ "q1": 0.45, "q2": 1.091 }""")
    assert(best === Map("q1" -> Seq(0.45), "q2" -> Seq(1.091)))
    val steady = parseRegistry(
      """{
        |"q1": [0.450, 0.500, 0.470],
        |"q2": [1.2],
        |"empty_row": []
        |}""".stripMargin)
    assert(steady === Map("q1" -> Seq(0.450, 0.500, 0.470), "q2" -> Seq(1.2)))
    assert(steadyOf(steady) === Map("q1" -> 0.47, "q2" -> 1.2))
  }

  test("appendObservations keeps the last 3, newest last; render round-trips") {
    val obs0 = Map("q1" -> Seq(1.0, 2.0, 3.0), "q2" -> Seq(5.0))
    val obs1 = appendObservations(obs0, Seq("q1" -> 4.0, "q2" -> 6.0, "q3" -> 9.0, "bad" -> -1.0))
    assert(obs1("q1") === Seq(2.0, 3.0, 4.0)) // oldest dropped
    assert(obs1("q2") === Seq(5.0, 6.0))
    assert(obs1("q3") === Seq(9.0))
    assert(!obs1.contains("bad")) // failed queries never recorded
    assert(parseRegistry(renderRegistry(obs1)) === obs1)
  }

  test("a deliberate 2x slowdown of one query trips its hot row on a clean-median run") {
    // steady registry of 10 queries at 1.0s
    val steady = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    // this run: everything at steady except q7 at 2.0x
    val walls = (1 to 10).map(i => s"q$i" -> (if (i == 7) 2.0 else 1.0))
    assert(medianRatio(walls, steady) === 1.0) // run median is CLEAN
    assert(hotRows(walls, steady) === Seq("q7")) // the row still trips
    // and uniform 1.3x inflation reads in the median, not as hot rows
    val inflated = (1 to 10).map(i => s"q$i" -> 1.3)
    assert(medianRatio(inflated, steady) === 1.3)
    assert(hotRows(inflated, steady).isEmpty)
  }

  test("medianRatio needs 5 comparable rows; hot rows honor the factor") {
    val steady = Map("a" -> 1.0, "b" -> 1.0)
    assert(medianRatio(Seq("a" -> 2.0, "b" -> 2.0), steady) === -1.0)
    assert(hotRows(Seq("a" -> 1.49, "b" -> 1.51), steady) === Seq("b"))
    assert(hotRows(Seq("a" -> -1.0), steady).isEmpty) // failed wall never hot
  }

  test("band rows: a persistent 1.7x regression of a 0.3s row trips; a one-off 120ms jitter doesn't") {
    // r15 verdict #5: the excess floor makes hotRows blind to
    // regressions of sub-half-second rows — a 0.3s steady at 0.51s is
    // 1.7x but only 0.21s of excess. Such rows land in the BAND and
    // trip only on 2-consecutive confirmation.
    val steady = Map("tiny" -> 0.3, "big" -> 2.0)
    val walls = Seq("tiny" -> 0.51, "big" -> 2.1)
    assert(hotRows(walls, steady).isEmpty) // floor keeps it out of hot
    assert(bandRows(walls, steady) === Seq("tiny")) // but it IS banded
    // persistent: the re-sample confirms → trips
    assert(confirmBand(0.51, 0.52, 0.3))
    // one-off jitter: the re-sample comes back clean → clears
    assert(!confirmBand(0.51, 0.32, 0.3))
    // a failed re-sample can never confirm
    assert(!confirmBand(0.51, -1.0, 0.3))
    // rows past the excess floor are HOT, not banded (one row, one bucket)
    assert(bandRows(Seq("tiny" -> 0.60), steady).isEmpty)
    assert(hotRows(Seq("tiny" -> 0.60), steady) === Seq("tiny"))
    // rows under the factor are neither
    assert(bandRows(Seq("tiny" -> 0.40), steady).isEmpty)
  }

  test("sub-second jitter never reads as a hot row (absolute-excess floor)") {
    // a 0.24s row spiking to 0.36s is 1.5x relative but 120ms absolute
    // — scheduler noise, not a regression (the r15 all-set bootstrap
    // run listed 13 such rows before the floor existed)
    val steady = Map("tiny" -> 0.24, "big" -> 2.0)
    assert(hotRows(Seq("tiny" -> 0.37), steady).isEmpty)
    // a real 2x regression of a substantial row still trips
    assert(hotRows(Seq("big" -> 4.0), steady) === Seq("big"))
    // and a tiny row that regresses by a REAL margin trips too
    assert(hotRows(Seq("tiny" -> 0.60), steady) === Seq("tiny"))
  }
}
