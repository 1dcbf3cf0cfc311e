package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** TopKAgg vs the sort-based formulation on random data, across
  * partitionings — the partial-merge path (map-side heaps merged at the
  * reducer) must agree with a plain global sort for every group. */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bounded-heap top-k equals sort-based top-k on random data, any partitioning") {
    val rnd = new scala.util.Random(42)
    // deliberate ties: scores drawn from a small set so tiebreaks matter
    val rows = (1L to 2000L).map(i => (i % 7, rnd.nextInt(20).toDouble, i))
    val df = rows.toDF("g", "score", "id")
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (sc, id) => (-sc, id) }.take(5)
    }
    Seq(1, 3, 16).foreach { parts =>
      val topk = udaf(graft.functions.TopKAgg(5))
      val got = df.repartition(parts)
        .groupBy("g").agg(topk(col("score"), col("id")).as("tk"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
        .toMap
      expected.foreach { case (g, want) =>
        assert(got(g) === want, s"group $g at $parts partitions")
      }
    }
  }

  test("k=120 string payload equals the window formulation, any partitioning") {
    // large-k property check for the generic payload: heap inserts and
    // pairwise merges must stay correct when k exceeds typical buffer
    // sizes, and the string tiebreak must match binary UTF-8 order
    val rnd = new scala.util.Random(7)
    val rows = (1L to 5000L).map { i =>
      (i % 4, rnd.nextInt(40).toDouble, f"k${rnd.nextInt(100000)}%06d-$i")
    }
    val df = rows.toDF("g", "score", "key")
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (sc, k) => (-sc, k) }.take(120)
    }
    Seq(1, 16).foreach { parts =>
      val topk = udaf(graft.functions.TopKAgg.strings(120))
      val got = df.repartition(parts)
        .groupBy("g").agg(topk(col("score"), col("key")).as("tk"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getString(1))))
        .toMap
      expected.foreach { case (g, want) =>
        assert(got(g) === want, s"group $g at $parts partitions")
      }
    }
  }

  test("NaN scores sort greatest (SQL DESC total order), never poison the heap") {
    // primitive > would make NaN never-beat and never-lose, breaking
    // the buffer invariant; java.lang.Double.compare puts NaN above
    // +Inf exactly like Spark SQL's DESC ordering of doubles
    val topk = udaf(graft.functions.TopKAgg(3))
    val got = Seq(
        (1L, 5.0, 1L), (1L, Double.NaN, 2L), (1L, 7.0, 3L),
        (1L, Double.PositiveInfinity, 4L), (1L, Double.NaN, 5L))
      .toDF("g", "score", "id")
      .repartition(3)
      .groupBy("g").agg(topk(col("score"), col("id")).as("tk"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(got.map(_._2) === Seq(2L, 5L, 4L)) // NaN (id asc), then +Inf
    assert(got.take(2).forall(_._1.isNaN))
  }

  test("groups smaller than k return all their rows, best-first") {
    val topk = udaf(graft.functions.TopKAgg(10))
    val got = Seq((1L, 2.0, 1L), (1L, 5.0, 2L), (1L, 5.0, 3L))
      .toDF("g", "score", "id")
      .groupBy("g").agg(topk(col("score"), col("id")).as("tk"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(got === Seq((5.0, 2L), (5.0, 3L), (2.0, 1L)))
  }

  test("payload-distinct top-k equals distinct-then-sort on duplicated data, any partitioning") {
    // the streaming ANN shape: each (payload, score) pair arrives once
    // per colliding LSH table — duplicates must collapse in aggregation
    // state exactly like the batch plan's blocking .distinct()
    val rnd = new scala.util.Random(9)
    val base = (1L to 300L).map(i => (i % 5, rnd.nextInt(12).toDouble, i))
    val dup = base ++ base.filter(_ => rnd.nextBoolean()) ++ base.take(80)
    val expected = base.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).distinct.sortBy { case (sc, id) => (-sc, id) }.take(4)
    }
    Seq(1, 3, 16).foreach { parts =>
      val topk = udaf(graft.functions.TopKDistinctAgg.longs(4))
      val got = dup.toDF("g", "score", "id").repartition(parts)
        .groupBy("g").agg(topk(col("score"), col("id")).as("tk"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
        .toMap
      expected.foreach { case (g, want) =>
        assert(got(g) === want, s"group $g at $parts partitions")
      }
    }
  }
}
