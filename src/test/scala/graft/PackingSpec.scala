package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, 100L), (2L, 200L), (3L, 300L), (4L, 50L), (5L, 600L),
    (6L, 10L), (7L, 500L), (8L, 499L), (9L, 1L), (10L, 512L)
  ).toDF("doc_id", "n_tokens")

  test("global cumsum equals the sequential prefix sum") {
    val got = Packing.withGlobalCumsum(spark, docs.repartition(4), "doc_id", "n_tokens")
      .select("doc_id", "cumsum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = docs.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    rows.foreach { case (id, n) => acc += n; assert(got(id) === acc, s"doc $id") }
  }

  test("greedy packing: budget respected, all docs kept, order preserved") {
    val budget = 512L
    val out = Packing.packGreedy(spark, docs.repartition(3), "doc_id", "n_tokens", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).sorted === (1L to 10L).toArray) // every doc exactly once
    val bySeq = out.groupBy(_._3)
    bySeq.foreach { case (seq, members) =>
      val tot = members.map(_._2).sum
      // a sequence only exceeds the budget when it is a singleton
      // oversized doc (greedy gives those their own sequence)
      assert(tot <= budget || members.length == 1, s"seq $seq holds $tot")
    }
    // within a sequence, doc ids are contiguous in the sorted order of
    // that partition: docs are taken in id order, never reordered
    bySeq.foreach { case (_, members) =>
      val ids = members.map(_._1).sorted
      assert(ids.last - ids.head === ids.length - 1 ||
        ids.sliding(2).forall(p => p.length < 2 || p(1) > p(0)))
    }
  }

  test("greedy packing is deterministic across runs") {
    val a = Packing.packGreedy(spark, docs.repartition(3), "doc_id", "n_tokens", 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = Packing.packGreedy(spark, docs.repartition(3), "doc_id", "n_tokens", 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a === b)
  }

  test("global cumsum survives a downstream coalesce(1)") {
    // regression: coalesce collapses the pipeline into one task whose
    // TaskContext partition id is NOT the parent RDD partition — the
    // offset seeding must come from the per-row __pid column
    val big = spark.range(0, 500).toDF("doc_id")
      .withColumn("n_tokens", (col("doc_id") % 97) + 1)
    val out = Packing.withGlobalCumsum(spark, big.repartition(8), "doc_id", "n_tokens")
      .coalesce(1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    var acc = 0L
    (0L until 500L).foreach { i =>
      acc += (i % 97) + 1
      assert(out(i) === acc, s"doc $i")
    }
  }

  test("greedy packing survives a downstream coalesce(1)") {
    // regression: a coalesced task re-runs the pack closure once per
    // parent partition under ONE task partition id, so seq ids seeded
    // from TaskContext would collide across parents — sequences from
    // unrelated partitions would silently merge (and overflow budget).
    // Seeding from the checkpointed __pid column keeps prefixes unique.
    val budget = 512L
    val big = spark.range(0, 500).toDF("doc_id")
      .withColumn("n_tokens", (col("doc_id") % 97) + 1)
    val out = Packing.packGreedy(spark, big.repartition(8), "doc_id", "n_tokens", budget)
      .coalesce(1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).sorted === (0L until 500L).toArray)
    out.groupBy(_._3).foreach { case (seq, members) =>
      val tot = members.map(_._2).sum
      assert(tot <= budget || members.length == 1, s"seq $seq holds $tot")
    }
    // and the un-coalesced plan assigns identical sequence membership
    val plainGroups = Packing.packGreedy(spark, big.repartition(8), "doc_id", "n_tokens", budget)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._2).values.map(_.map(_._1).sorted.toSeq).toSet
    val coalescedGroups = out.groupBy(_._3).values.map(_.map(_._1).sorted.toSeq).toSet
    assert(plainGroups === coalescedGroups)
  }

  test("offset packing bins by global starting offset") {
    val out = Packing.packByOffset(spark, docs.repartition(4), "doc_id", "n_tokens", 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // doc 1 starts at 0 → bin 0; doc 3 starts at 300 → bin 0;
    // doc 4 starts at 600 → bin 1; doc 10 starts at 2260 → bin 4
    assert(out(1L) === 0L && out(3L) === 0L && out(4L) === 1L && out(10L) === 4L)
  }
}
