package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PageRank

/** Structural invariants of the fixed-point PageRank that the bit-exact
  * oracle cannot express: teleport floor, hub dominance, and
  * partitioning-independence (the determinism the integer arithmetic
  * exists to guarantee). */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // star: everyone points at hub 99, hub dangles
  private def star = (1L to 20L).map(i => (i, 99L, 1L))
    .toDF("src", "dst", "w")

  test("teleport floor and hub dominance on a star graph") {
    val r = PageRank.pagerank(star, "src", "dst", "w").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // spokes have no in-edges: exactly the teleport value
    (1L to 20L).foreach(i => assert(r(i) === PageRank.TeleportE6))
    // hub collects every spoke's full contribution and beats them all
    assert(r(99L) > r(1L) * 10)
  }

  test("result is identical under different input partitionings") {
    val a = PageRank.pagerank(star.repartition(7), "src", "dst", "w").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = PageRank.pagerank(star.coalesce(1), "src", "dst", "w").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a === b)
  }
}
