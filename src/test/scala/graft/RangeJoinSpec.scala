package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(points: Seq[Double], ivals: Seq[(Long, Double, Double)]) =
    (for {
      p <- points
      (id, lo, hi) <- ivals
      if p >= lo && p <= hi
    } yield (p, id)).toSet

  test("bucketed range join equals the naive non-equi join (incl. negatives)") {
    val points = Seq(-250.5, -100.0, -0.1, 0.0, 3.7, 99.99, 100.0, 101.0, 999.0)
    val ivals = Seq(
      (1L, -300.0, -200.0), // fully negative
      (2L, -50.0, 50.0),    // straddles zero
      (3L, 100.0, 100.0),   // degenerate single point on a bucket edge
      (4L, 90.0, 110.0),    // crosses a bucket boundary
      (5L, 500.0, 400.0))   // empty (lo > hi) — matches nothing
    val got = RangeJoin.pointInInterval(
        points.toDF("v"), "v",
        ivals.toDF("id", "lo", "hi"), "lo", "hi", width = 100.0)
      .select($"v".as[Double], $"id".as[Long]).collect().toSet
    assert(got === naive(points, ivals))
  }

  test("each (point, interval) match appears exactly once even when the interval spans many buckets") {
    val points = (0 until 100).map(_.toDouble)
    val ivals = Seq((7L, 5.0, 95.0)) // spans ~10 buckets at width 10
    val rows = RangeJoin.pointInInterval(
        points.toDF("v"), "v",
        ivals.toDF("id", "lo", "hi"), "lo", "hi", width = 10.0)
      .select($"v".as[Double], $"id".as[Long]).collect()
    assert(rows.length === rows.toSet.size, "duplicate (point, interval) rows")
    assert(rows.toSet === naive(points.map(identity), ivals))
  }

  test("intervals wider than maxBucketsPerInterval are excluded, not exploded") {
    val points = Seq(1.0, 50.0)
    val ivals = Seq((1L, 0.0, 1e9), (2L, 0.0, 60.0)) // first would cover 1e7 buckets
    val got = RangeJoin.pointInInterval(
        points.toDF("v"), "v",
        ivals.toDF("id", "lo", "hi"), "lo", "hi",
        width = 100.0, maxBucketsPerInterval = 1000)
      .select($"id".as[Long]).collect().toSeq
    assert(got.forall(_ == 2L), s"unbounded interval not excluded: $got")
    assert(got.size === 2)
  }

  test("interval overlap join equals the naive overlap join, emitted exactly once") {
    val lhs = Seq((1L, -120.0, -80.0), (2L, -10.0, 10.0), (3L, 0.0, 300.0),
      (4L, 55.0, 55.0), (5L, 10.0, 5.0)) // last is empty (lo > hi)
    val rhs = Seq((10L, -100.0, -90.0), (20L, 5.0, 60.0), (30L, 290.0, 400.0),
      (40L, -500.0, 500.0))
    val got = RangeJoin.intervalOverlap(
        lhs.toDF("lid", "llo", "lhi"), "llo", "lhi",
        rhs.toDF("rid", "rlo", "rhi"), "rlo", "rhi", width = 50.0)
      .select($"lid".as[Long], $"rid".as[Long]).collect()
    val want = (for {
      (lid, llo, lhi) <- lhs if llo <= lhi
      (rid, rlo, rhi) <- rhs if rlo <= rhi
      if llo <= rhi && rlo <= lhi
    } yield (lid, rid)).toSet
    assert(got.length === got.toSet.size, "duplicate overlap rows")
    assert(got.toSet === want)
  }

  test("randomized (seeded) inputs: bucketed results equal the naive join at several widths") {
    val rnd = new scala.util.Random(42)
    val points = Seq.fill(300)(rnd.nextDouble() * 2000 - 1000)
    val ivals = Seq.tabulate(120) { i =>
      val lo = rnd.nextDouble() * 2000 - 1000
      (i.toLong, lo, lo + rnd.nextDouble() * 250) // spans 0–250, mixed signs
    }
    val want = naive(points, ivals)
    for (w <- Seq(1.0, 37.0, 250.0, 10000.0)) {
      val got = RangeJoin.pointInInterval(
          points.toDF("v"), "v",
          ivals.toDF("id", "lo", "hi"), "lo", "hi", width = w)
        .select($"v".as[Double], $"id".as[Long]).collect()
      assert(got.length === got.toSet.size, s"duplicates at width $w")
      assert(got.toSet === want, s"mismatch at width $w")
    }
  }

  test("plan is an equi-join on the bucket, not a nested-loop join") {
    val plan = RangeJoin.pointInInterval(
        (1 to 10).map(_.toDouble).toDF("v"), "v",
        Seq((1L, 2.0, 8.0)).toDF("id", "lo", "hi"), "lo", "hi", width = 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"cartesian plan:\n$plan")
  }
}
