package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BloomJoin, Skew}

class JoinStrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom filter has no false negatives and actually prunes") {
    val build = (1L to 200L).map(_ * 97L).toDF("k")
    val probe = (1L to 20000L).toDF("k")
    val bloom = BloomJoin.buildFrame(build, "k")
    val kept = BloomJoin.filterByBloom(probe, "k", bloom)
      .select("k").as[Long].collect().toSet

    // every true member survives (no false negatives)
    val members = (1L to 200L).map(_ * 97L).filter(_ <= 20000L).toSet
    assert(members.subsetOf(kept), "bloom dropped a true member")
    // and the filter prunes the probe side hard (fp rate far below 5%)
    assert(kept.size < 200 + 1000, s"bloom kept ${kept.size} of 20000 — not pruning")
  }

  test("bloom pre-filtered join equals the plain join") {
    val build = (1L to 500L).filter(_ % 7 == 0).toDF("k")
    val probe = (1L to 5000L).map(i => (i % 600L, i)).toDF("k", "v")
    val bloom = BloomJoin.buildFrame(build, "k")
    val got = BloomJoin.filterByBloom(probe, "k", bloom)
      .join(build, "k").agg(count(lit(1)), sum("v")).head
    val want = probe.join(build, "k").agg(count(lit(1)), sum("v")).head
    assert(got === want)
  }

  test("salted join output equals plain join, and the plan is salted") {
    val big = (1L to 10000L).map(i => (i % 100L, i)).toDF("k", "v")
    // skew: one hot key with half the rows
    val skewed = big.union((1L to 10000L).map(i => (42L, i)).toDF("k", "v"))
    val small = (0L until 100L).map(i => (i, s"name_$i")).toDF("k", "name")

    val salted = Skew.saltedJoin(skewed, small, "k", 8)
    val gotAgg = salted.groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val wantAgg = skewed.join(small, "k").groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotAgg === wantAgg)

    // the join key really is (k, __salt): hot key 42's rows spread over
    // multiple salt buckets instead of one reduce task
    val buckets = skewed.withColumn("__salt", floor(rand(7L) * 8).cast("int"))
      .filter(col("k") === 42L).select("__salt").distinct().count()
    assert(buckets > 1, "hot key landed in a single salt bucket")
  }
}
