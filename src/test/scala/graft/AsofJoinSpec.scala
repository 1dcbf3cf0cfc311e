package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** Boundary semantics of the as-of variants — the cases the fixture
  * oracles exercise only by accident: equal-time inclusivity in both
  * directions, the exact tolerance boundary, and no-match drops. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    ("u1", 100L, "L1"), // exact-tie with right R100
    ("u1", 250L, "L2"), // between R100 and R300
    ("u2", 50L, "L3")   // before any right row for u2
  ).toDF("k", "t", "lid")

  private def right = Seq(
    ("u1", 100L, "R100"),
    ("u1", 300L, "R300"),
    ("u2", 90L, "R90")
  ).toDF("k", "t", "rid")

  private def rows(df: org.apache.spark.sql.DataFrame): Map[String, (String, Long)] =
    df.selectExpr("lid", "asof_match.rid", "t", "asof_match.t AS rt").collect()
      .map(r => r.getString(0) -> (r.getString(1), math.abs(r.getLong(2) - r.getLong(3))))
      .toMap

  test("backward: inclusive at equal times, latest prior otherwise, no-prior dropped") {
    val got = rows(AsofJoin.asof(left, right, "k", "t", Seq("rid")))
    assert(got === Map("L1" -> ("R100", 0L), "L2" -> ("R100", 150L)))
  }

  test("forward: inclusive at equal times, earliest later otherwise") {
    val got = rows(AsofJoin.asofForward(left, right, "k", "t", Seq("rid")))
    assert(got === Map(
      "L1" -> ("R100", 0L),  // equal time matches forward too
      "L2" -> ("R300", 50L),
      "L3" -> ("R90", 40L)))
  }

  test("tolerance: boundary is inclusive, beyond-boundary matches drop (both directions)") {
    // backward: L2's only prior match is 150 away — tol 150 keeps, 149 drops
    assert(rows(AsofJoin.asofTolerance(left, right, "k", "t", Seq("rid"), 150L))
      .contains("L2"))
    assert(!rows(AsofJoin.asofTolerance(left, right, "k", "t", Seq("rid"), 149L))
      .contains("L2"))
    // forward: L2 -> R300 is 50 away
    val f49 = rows(AsofJoin.asofTolerance(left, right, "k", "t", Seq("rid"), 49L, forward = true))
    val f50 = rows(AsofJoin.asofTolerance(left, right, "k", "t", Seq("rid"), 50L, forward = true))
    assert(f50.contains("L2") && !f49.contains("L2"))
    // equal-time matches survive tolerance 0
    assert(rows(AsofJoin.asofTolerance(left, right, "k", "t", Seq("rid"), 0L))
      === Map("L1" -> ("R100", 0L)))
    // a negative tolerance is an error, not silent unbounded matching
    // (it would alias the internal no-bound sentinel)
    intercept[IllegalArgumentException] {
      AsofJoin.asofTolerance(left, right, "k", "t", Seq("rid"), -1L)
    }
  }
}
