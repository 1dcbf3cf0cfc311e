package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Kmv, KmvAgg}

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hash is in [0, P) over the full Long domain (no silent wrap)") {
    // regression: A*x overflows Long for x above ~3.47e9 — Spark wraps
    // silently (negative hashes) while a SQL oracle's BIGINT raises, so
    // sketch and oracle diverged outside the small-id test range
    val probes = Seq(0L, 1L, Kmv.P - 1, Kmv.P, Kmv.P + 1, 3_470_000_000L,
      Long.MaxValue, Long.MinValue, -1L, -Kmv.P)
    probes.foreach { x =>
      val h = Kmv.hash(x)
      assert(h >= 0L && h < Kmv.P, s"hash($x) = $h out of range")
    }
  }

  test("hash equals the naive BigInt formula modulo P") {
    val probes = Seq(17L, Kmv.P + 5, 3_470_000_000L, Long.MaxValue, -12345L)
    probes.foreach { x =>
      val expect = ((BigInt(Kmv.A) * (((BigInt(x) % Kmv.P) + Kmv.P) % Kmv.P)
        + Kmv.B) % Kmv.P).toLong
      assert(Kmv.hash(x) === expect, s"x=$x")
    }
  }

  test("aggregator is exact below K distinct and handles huge ids") {
    val kmv = udaf(KmvAgg)
    // 100 distinct ids in the overflow-prone range, each duplicated
    val ids = (0L until 100L).map(i => 3_470_000_000L + i * 1_000_000_007L)
    val got = (ids ++ ids).toDF("id").agg(kmv(col("id"))).head.getLong(0)
    assert(got === 100L)
  }
}
