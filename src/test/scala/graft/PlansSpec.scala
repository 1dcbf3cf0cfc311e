package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Plan gate: the physical-plan properties PLANS.md documents, asserted
  * programmatically so a regression (lost pushdown, a surprise
  * sort-merge or cartesian, a shuffle creeping into a narrow path)
  * fails the suite instead of waiting for a human plan read. */
class PlanGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("ngram decontam: benchmark shingles broadcast on 8-byte hash keys, no SMJ, no cartesian") {
    val p = plan("decontam_ngram_overlap")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("curation manifest: filter composition stays keyed — no cartesian product") {
    val p = plan("corpus_curation_manifest")
    // the final corpus-vs-flags joins are doc_id-keyed LeftOuter — at
    // 100 TB both sides are corpus-sized, so a sort-merge there is the
    // RIGHT plan; the gate only forbids unkeyed blowups
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("NB training query: argmax is aggregate-shaped, no per-doc window") {
    val p = plan("nb_train_classify")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a1: predicates and pruning reach the parquet scan") {
    val p = plan("a1_scan_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("EqualTo(l_returnflag"), p)
  }

  test("q5: dimension joins broadcast, no sort-merge join") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("global sort plans as range partitioning, not a single-partition sort") {
    val p = plan("global_sort_orders")
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("bm25: posting joins broadcast; top-k limit pushes below the rank shuffle") {
    val p = plan("txt_bm25_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // WindowGroupLimit: each mapper keeps only its per-query top-5
    // before the rank exchange — the scan never ships full posting
    // join output through the shuffle
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("no cartesian product in any benchmark query plan") {
    graft.SparkEntry.benchNames.foreach { n =>
      assert(!plan(n).contains("CartesianProduct"), s"$n plans a cartesian product")
    }
  }

  test("events time-range predicates push down to the parquet scan post-normalization") {
    // unlocked by the micros-timestamp fixture encoding: ts is a real
    // parquet column now, so time filters reach the scan (they could
    // not when ts was derived from the legacy ns-long column)
    import org.apache.spark.sql.functions.{col, lit}
    val p = Tables(spark, d, "events")
      .filter(col("ts") < lit("2024-06-01").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(p.contains("LessThan(ts,"), p.linesIterator.take(20).mkString("\n"))
  }

  test("ANN serving plan: broadcast index join + heap aggregate, no sort-merge, no window") {
    // the stream-side plan is the same ops on a batch frame: bucket
    // projection, broadcast (tbl,bucket) join, payload-distinct heap —
    // the stream must never shuffle before aggregation and top-k must
    // be ObjectHashAggregate state, not a per-query window sort
    import org.apache.spark.sql.functions.col
    val emb = Tables(spark, d, "embeddings")
    val index = graft.operators.Knn
      .withLshTables(emb, "embedding", 64, 7, 16)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("tbl"), col("bucket"))
    val p = graft.streaming.VectorStreams
      .annServe(emb.filter(col("vec_id") < 32).select("vec_id", "embedding"),
        index, "vec_id", "embedding", 64, 7, 16, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("substring-window join keys on the 64-bit hash, not the 48-char string") {
    // shuffle partitioning / sort / hash probes must all pay 8-byte
    // keys; the string survives only as the rescore payload
    val p = plan("dedup_substring_windows")
    assert(p.contains("xxhash64"), p)
    assert(p.contains("hashpartitioning(h#") ||
      p.contains("hashpartitioning(h "), p.linesIterator.take(40).mkString("\n"))
  }

  test("substring-window hot cap anti-joins sit BELOW the pair join, never above") {
    // the scale discipline: a df>1000 boilerplate window must leave
    // BOTH join inputs before the h-keyed self-join — a post-join cap
    // materializes the quadratic pair blowup before deleting it
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
    val qe = graft.SparkEntry.queries("dedup_substring_windows")(spark, d).queryExecution
    val joins = qe.sparkPlan.collect { case j: BaseJoinExec => j }
    val antis = joins.filter(_.joinType == LeftAnti)
    assert(antis.size == 2, s"expected both pair-join inputs hot-capped:\n${qe.sparkPlan}")
    antis.foreach { a =>
      val innerBelow = a.collect { case j: BaseJoinExec if j.joinType == Inner => j }
      assert(innerBelow.isEmpty,
        s"hot-window anti-join sits ABOVE the pair join (post-join cap):\n${qe.sparkPlan}")
    }
    val pairAboveBoth = joins.exists(j => j.joinType == Inner &&
      j.collect { case x: BaseJoinExec if x.joinType == LeftAnti => x }.size == 2)
    assert(pairAboveBoth, s"pair join does not sit above both hot caps:\n${qe.sparkPlan}")
  }

  test("packing prefix sum is parallel: no single-partition exchange, no global window") {
    // the classic wrong shape is Window.orderBy with no partitionBy →
    // Exchange SinglePartition; the two-phase prefix sum must never do that
    val toks = Tables(spark, "/root/testdata/sf0.01", "documents")
      .selectExpr("doc_id", "CAST(size(split(trim(text), '\\\\s+')) AS LONG) AS n_tokens")
    val p = graft.operators.Packing
      .packByOffset(spark, toks, "doc_id", "n_tokens", 512L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p)
  }

  test("offset packing bins stay within budget except oversized singletons") {
    val toks = Tables(spark, "/root/testdata/sf0.01", "documents")
      .selectExpr("doc_id", "CAST(size(split(trim(text), '\\\\s+')) AS LONG) AS n_tokens")
    val bins = graft.operators.Packing
      .packByOffset(spark, toks, "doc_id", "n_tokens", 512L)
      .groupBy("seq_id")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("tot"),
        org.apache.spark.sql.functions.max("n_tokens").as("mx"))
      .collect()
    // offset policy: a bin holds ≤ budget + (its largest doc's tail)
    bins.foreach { r =>
      assert(r.getLong(1) <= 512L + r.getLong(2),
        s"seq ${r.getLong(0)} fill ${r.getLong(1)} exceeds budget + largest doc")
    }
  }

  test("multi-probe expansion explodes the query side only") {
    // probes multiply the QUERY rows by nPlanes+1; the index must stay
    // un-exploded or the join input blows up by the probe factor
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val tabled = graft.operators.Knn.withLshTables(emb, "embedding", 64, 7, 4)
    val p = graft.operators.Knn.lshTopKMultiProbe(
      tabled, "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") < 8, 3, 7)
      .queryExecution.executedPlan.toString
    // two Generates total: the table fan-out (both sides share tabled)
    // appears once per side; the probe explode must appear exactly once
    assert("Generate explode".r.findAllMatchIn(p).nonEmpty, p)
    val probeGenerates = "array_union".r.findAllMatchIn(p).size
    assert(probeGenerates === 1, s"probe expansion must be query-side only:\n$p")
  }

  test("txt_top_ngrams plans TakeOrdered over partial counts, no global sort") {
    // explode → map-side-combined count → TakeOrderedAndProject: the
    // top-20 must never materialize a fully sorted count frame
    val p = plan("txt_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("cooccur_event_types joins sessions-to-sessions, never events squared") {
    // the co-occurrence pair frame must be built from per-session type
    // sets (one agg each side), not a raw events self-join; the telltale
    // wrong shape is a join whose BOTH inputs scan events un-aggregated
    val q = graft.SparkEntry.queries("cooccur_event_types")(spark, d)
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    joins.foreach { j =>
      val leftRaw = j.left.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }.isEmpty
      val rightRaw = j.right.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }.isEmpty
      assert(!(leftRaw && rightRaw),
        s"join with two un-aggregated inputs (events² hazard):\n$j")
    }
  }

  test("histogram_order_value aggregates with a partial (map-side) phase") {
    val p = plan("histogram_order_value")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pagerank final round: partitioned joins only, no cartesian, no single partition") {
    val p = plan("pagerank_purchase_graph")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Window"), p)
  }

  test("pagerank per-source totals plan: aggregate-join, never a window over edges") {
    // asserted on the PRE-CHECKPOINT frame — inside pagerank() the
    // edge frame is eagerly checkpointed, so a window sneaking back in
    // would execute invisibly to assertions on the final query's plan.
    // WindowExec would buffer a hub source's whole edge partition in
    // one task (the 10^8-out-edge hazard); the aggregate is map-side
    // combinable and the join back is co-partitioned on src.
    import org.apache.spark.sql.functions.{col, count, lit}
    val edges = Tables(spark, d, "orders")
      .join(Tables(spark, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val p = graft.operators.PageRank.withTotals(edges)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("topk_heap_acctbal plans as partial aggregation, not a window sort") {
    // the point of the bounded-heap Aggregator: map-side partial
    // ObjectHashAggregate, O(k) per group per mapper over the shuffle —
    // a Window in this plan would mean the full-sort formulation crept back
    val p = plan("topk_heap_acctbal")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_topkagg") || p.toLowerCase.contains("partial"), p)
    assert(!p.contains("Window"), p)
  }

  test("corpus_filter_percentile windows are partitioned: no single-partition sort") {
    val p = plan("corpus_filter_percentile")
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("Window"), p)
  }

  test("sim_incremental_index joins stay bucket-keyed: no cartesian, no nested loop") {
    val p = plan("sim_incremental_index")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("txt_sparse_cosine_pairs: df-capped postings feed the self-join") {
    // the scale guard: BOTH inputs of the postings self-join must sit
    // above the df filter (with the absolute MaxDf cap in it), so no
    // hot token can reach the pair join no matter the corpus size
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val q = graft.SparkEntry.queries("txt_sparse_cosine_pairs")(spark, d)
    val lp = q.queryExecution.optimizedPlan
    // the cut may survive as a Filter node or get folded into the
    // broadcast-nd join's condition — accept either, but insist on the
    // absolute 10000 cap being part of the predicate
    def cut(c: org.apache.spark.sql.catalyst.expressions.Expression) =
      c.references.exists(_.name == "df") && c.toString.contains("10000")
    def hasDfCut(side: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      side.collectFirst {
        case f: Filter if cut(f.condition) => f
        case j: Join if j.condition.exists(cut) => j
      }.nonEmpty
    val guardedSelfJoins = lp.collect {
      case j: Join if hasDfCut(j.left) && hasDfCut(j.right) => j
    }
    assert(guardedSelfJoins.nonEmpty,
      s"no self-join with the df cut on both inputs:\n$lp")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("triangle count: wedge stage is a keyed equi-join, no cartesian on data") {
    // the orientation trick only pays off if the wedge stage plans as
    // a keyed equi-join — a cartesian would mean the ks equality was
    // lost. The ONE BroadcastNestedLoopJoin allowed is the deliberate
    // scalar crossJoin combining the two 1-row count aggregates.
    val p = plan("graph_triangle_count")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("LPA voting round: two aggregations, never a per-vertex window over neighbors") {
    // the hub-safe shape: vote count + max_by argmax are both map-side-
    // combinable HashAggregates; a Window over the adjacency would
    // buffer a hub's whole neighborhood in one task. Gate the PRE-
    // checkpoint round builder (the query's own plan is truncated by
    // the eager per-round checkpoints).
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val both = edges.union(edges.select($"dst".as("src"), $"src".as("dst")))
    val labels = both.select($"src".as("id")).distinct().select($"id", $"id".as("lbl"))
    val p = graft.operators.Components.lpaRound(both, labels)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial count") ||
      p.contains("HashAggregate"), p)
  }

  test("PQ ADC search: code scan joins a broadcast LUT, no cartesian") {
    // the whole point of ADC is scanning ONLY the PqM-byte codes against
    // a broadcast query lookup table — the join must be a
    // BroadcastHashJoin on (m, code), never a shuffle of the code index
    // against the queries or a nested loop.
    val p = graft.queries.SimilarityStreamQueries
      .pqAdcRanked(spark, d, 3).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("jaccard neighbors: wedge stage is a keyed equi-join with the hub-cap semi join") {
    val p = plan("graph_jaccard_neighbors")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftSemi"), p) // the absolute hub cap is in the plan
    assert(p.contains("TakeOrdered"), p) // top-30 never globally sorts
  }

  test("BFS/SSSP relaxation round: keyed join + map-side min, no window, no cartesian") {
    // the hub-safe shape shared by bfsHops and ssspRounds: the round is
    // one equi-join on src plus a map-side-combinable min per vertex.
    // Gated on the PRE-checkpoint round builder (each round is eagerly
    // checkpointed inside the operators, truncating the final plan).
    import spark.implicits._
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 7L)).toDF("src", "dst", "w")
    val labels = Seq((1L, 0L)).toDF("id", "dist")
    val p = graft.operators.Components.minRound(edges, labels, "dist",
        org.apache.spark.sql.functions.col("w"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_min") || p.contains("partial min") ||
      p.contains("HashAggregate"), p)
    // the temporal round adds only a residual t >= arr filter to the
    // same keyed join — it must not degrade to a nested loop
    val edgesT = Seq((1L, 2L, 5L), (2L, 3L, 7L)).toDF("src", "dst", "t")
    val arr = Seq((1L, 0L)).toDF("id", "arr")
    val pt = graft.operators.Components.temporalRound(edgesT, arr)
      .queryExecution.executedPlan.toString
    assert(!pt.contains("Window"), pt)
    assert(!pt.contains("CartesianProduct"), pt)
    assert(!pt.contains("BroadcastNestedLoopJoin"), pt)
  }

  test("qsketch: histogram is a partial aggregation; quantile windows stay partitioned") {
    // the sketch build must be one map-side-combinable groupBy over the
    // data; quantile extraction may window ONLY the sketch itself and
    // never collapses to a single partition
    import org.apache.spark.sql.functions.col
    val cents = Tables(spark, d, "orders").selectExpr("o_orderpriority AS grp",
      "greatest(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT), 1) AS c")
    val hp = graft.operators.QSketch.histogram(cents, "grp", "c")
      .queryExecution.executedPlan.toString
    assert(hp.contains("HashAggregate"), hp)
    assert(hp.toLowerCase.contains("partial"), hp)
    assert(!hp.contains("Window"), hp)
    val qp = graft.operators.QSketch.quantiles(
        graft.operators.QSketch.histogram(cents, "grp", "c"), Seq(50, 99))
      .queryExecution.executedPlan.toString
    assert(!qp.contains("SinglePartition"), qp)
    assert(!qp.contains("CartesianProduct"), qp)
  }

  test("skew profiler: metadata-sized totals broadcast; top-20 never globally sorts") {
    val p = plan("skew_profile_custkey")
    assert(p.contains("TakeOrdered"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the 1-row totals frame joins via broadcast nested loop by design;
    // anything beyond that one is a regression
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p)
  }

  test("minhash band index is narrow: no aggregate, one deliberate exchange") {
    // sf0.01 on purpose: the benchmark-plan test above populates the
    // query layer's persisted cache for sf0.001, and CacheManager would
    // substitute InMemoryRelation into a matching fresh plan
    val bands = graft.operators.Dedup.minhashBands(
      graft.sources.Tables(spark, "/root/testdata/sf0.01", "documents"), "text", "doc_id")
    val p = bands.queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate"), p)
    assert("Exchange".r.findAllMatchIn(p).size === 1, p) // only the parallelism spread
  }

  test("cume-distinct two-window form shares one user_id exchange") {
    // the whole point of the flag+running-sum formulation: both windows
    // partition on user_id, so EnsureRequirements inserts two sorts but
    // exactly one shuffle — a naive distinct-count subquery would add a
    // second exchange on (user_id, event_type)
    val p = plan("window_cume_distinct")
    assert("Exchange".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("interpolation gap-fill: knot dedup and lead share one user_id exchange") {
    val p = plan("ts_interpolate")
    assert("Exchange".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scd2 intervals: change flag and close-on-next share one user_id exchange") {
    val p = plan("scd2_intervals")
    assert("Exchange".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("scd2 mergeBatch: open tails route through semi/anti joins, no cartesian") {
    // live plan (the query's stored frame is checkpointed, which would
    // make a gate on it vacuous): crafted stored + batch frames
    import spark.implicits._
    val stored = Seq((1L, "a", 10L, Option.empty[Long]), (2L, "b", 5L, Some(9L)))
      .toDF("user_id", "event_type", "valid_from_us", "valid_to_us")
    val batch = Seq((1L, "c", 20L, 7L))
      .toDF("user_id", "event_type", "tus", "event_id")
    val p = graft.operators.Scd2.mergeBatch(stored, batch)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("autocorr terms: windows partitioned on user_id, partial final agg, no cartesian") {
    val p = plan("ts_autocorr_terms")
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
    // one exchange for the user_id windows + one for the (user, lag) agg
    assert("Exchange".r.findAllMatchIn(p).size <= 2, p)
  }

  test("ewma: all eight lag taps share one user_id window exchange") {
    val p = plan("ts_ewma_dyadic")
    assert("Exchange".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("SinglePartition"), p)
    // one WindowExec hosts every lag — eight separate windows would
    // re-sort the user partition eight times
    assert("Window".r.findAllMatchIn(p).size === 1, p)
  }

  test("anomaly flags: trailing stats in one user_id window, no cartesian") {
    val p = plan("anomaly_trailing_z")
    assert("Exchange".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("wsample_priority reduces via partial object-hash heap, not a window sort") {
    val p = plan("wsample_priority")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial"), p)
    assert(!p.contains("Window"), p)
  }

  test("rolling median: bounded window buffer, one user_id exchange") {
    val p = plan("ts_rolling_median")
    assert("Exchange".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("SinglePartition"), p)
    assert("Window".r.findAllMatchIn(p).size === 1, p)
  }

  test("drawdown: running max and per-user agg share one user_id exchange") {
    val p = plan("ts_drawdown")
    assert("Exchange".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("scd2 as-of snapshot: filter composes onto the one-exchange interval shape") {
    val p = plan("scd2_snapshot_asof")
    assert("Exchange".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("rrf fusion: candidate lists join keyed, corpus side never cartesians") {
    val p = plan("hybrid_rrf_fusion")
    // the only non-equi join is the deliberate 8-row broadcast of queries
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the fusion join on (query_id, cand_id) must be an equi-join
    assert(p.contains("FullOuter"), p)
  }

  test("phrase_search: phrase tokens broadcast onto postings, no self-join of postings") {
    val p = plan("phrase_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("kCore peel round: degree agg + two semi joins, no window, no cartesian") {
    import org.apache.spark.sql.functions._
    val base = Tables(spark, d, "lineitem")
      .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
    val p = graft.operators.Components.kCoreRound(base, 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("hamming near-dup: band-keyed equi-join, no cartesian, no sort-merge") {
    val p = plan("dedup_simhash_hamming")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the pair join is HASH-keyed on the (pos, band) bucket key —
    // broadcast at fixture size, shuffle-hash on the same key at scale
    // — never the raw hash or an unkeyed product
    assert(p.contains("HashJoin [pos"), p)
  }

  test("basket pair self-join is a keyed equi-join; total count reaches pairs by broadcast") {
    val p = plan("basket_pair_support")
    assert(!p.contains("CartesianProduct"), p)
    // order-key self-join must be a real equi-join, not nested-loop over data
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    // the 1-row basket total may arrive via one broadcast loop join only
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p)
  }

  test("embedding centroid/dispersion: explode combines map-side, no joins, no windows") {
    Seq("emb_centroid_by_label", "emb_dispersion_by_label").foreach { n =>
      val p = plan(n)
      // partial HashAggregate BELOW the (label[, dim]) exchange: the
      // N×D explode must never shuffle raw rows
      assert(p.contains("HashAggregate"), p)
      assert(!p.contains("Join"), s"$n plans a join:\n$p")
      assert(!p.contains("Window"), p)
      assert(p.contains("ReadSchema: struct<embedding"), p)
    }
  }

  test("mixture queries tokenize the corpus exactly once (K-row checkpoint cut)") {
    Seq("mix_temperature_weights", "mix_epoch_plan").foreach { n =>
      val p = plan(n)
      // every normalization branch reads the checkpointed K-row RDD;
      // zero parquet scans of documents survive in the plan
      assert(!p.contains("Scan parquet"), s"$n re-scans the corpus:\n$p")
      assert(p.contains("Scan ExistingRDD"), p)
    }
  }

  test("datacard: one corpus scan for the stacked size/composition facts") {
    val p = plan("corpus_datacard")
    // the base multi-aggregate is one scan; the dup facts ride the
    // persisted pair/cluster checkpoints (ExistingRDD), so at most the
    // single documents scan appears (the band-index memo may add its
    // InMemoryTableScan, which is the point of the memo)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 1, s"datacard scans parquet $scans times:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("MRL search: bounded-heap prune + keyed rescore — no window sort anywhere") {
    // round-12: the prefix prune was a row_number window over the full
    // |Q|×N score product (corpus-sized shuffle onto ≤|Q| reducers +
    // an O(N log N) sort per query). Both rankings now ride the
    // bounded-heap TopKAgg: ObjectHashAggregate with map-side partials,
    // O(k) shuffled entries per query per mapper — WindowExec is
    // FORBIDDEN in this plan, prune and rescore alike.
    Seq("sim_mrl_topk", "mrl_serve_heap").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
      assert(!p.contains("SinglePartition"), s"$n:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p") // the prune probe
      assert(p.contains("ObjectHashAggregate"), s"$n:\n$p")     // the bounded heaps
      assert(!p.contains("Window"), s"$n plans a window sort:\n$p")
    }
  }

  test("MMR rerank: candidate-bounded rounds, no cartesian, no global sort") {
    val p = plan("sim_mmr_rerank")
    // every round reads the checkpointed (queries × MmrCand) frames
    // (ExistingRDD) — corpus data never re-enters the loop
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Scan parquet"), p)
  }
}

/** SparkSessionExtensions surface: the injected BroadcastDimsRule must
  * force dimension-table joins to broadcast even when the session's
  * auto-broadcast machinery is disabled (the catalog-knowledge case). */
class PlansSpec extends AnyFunSuite {

  test("injected optimizer rule broadcasts dimension joins with auto-broadcast off") {
    val base = TestSpark.spark // ensure the shared context exists
    val d = "/root/testdata/sf0.001"

    // control: same settings, no extension → sort-merge join
    base.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    base.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val c = Tables(base, d, "customer")
      val n = Tables(base, d, "nation")
      val plain = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .queryExecution.executedPlan.toString
      assert(plain.contains("SortMergeJoin"), plain)
    } finally {
      base.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      base.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // with extensions: new session over the SAME SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val c = Tables(ext, d, "customer")
      val n = Tables(ext, d, "nation")
      val hinted = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .queryExecution.executedPlan.toString
      assert(hinted.contains("BroadcastHashJoin"), hinted)
      // fact-to-fact joins must NOT be hinted
      val o = Tables(ext, d, "orders")
      val l = Tables(ext, d, "lineitem")
      val facts = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(facts.contains("SortMergeJoin"), facts)
    } finally {
      // the session shares the JVM-wide context — never stop() it here;
      // just restore the shared session as active/default
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("AQE re-plans at runtime: tiny shuffle coalesced below the static partition count") {
    import org.apache.spark.sql.functions._
    // 10-group aggregate over tiny data: statically 4 shuffle
    // partitions, AQE folds them to fewer once it sees the real sizes —
    // the runtime-re-plan safety net the 100 TB configuration leans on
    // (skew splitting is the same mechanism in reverse).
    val df = TestSpark.spark.range(0, 10000).toDF("id")
      .groupBy((col("id") % 10).as("g")).agg(count(lit(1)).as("n"))
    assert(df.collect().length === 10) // execute THIS frame so AQE finalizes its plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead"), p)
    assert(p.contains("coalesced"), p)
  }

  test("filtered MIPS pre-filter: predicate on the vectors scans, survivor semi-join BELOW the candidate join") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
    val qe = graft.SparkEntry.queries("mips_ivf_filtered_serve")(
      TestSpark.spark, "/root/testdata/sf0.001").queryExecution
    // (a) the predicate reaches EVERY scan of the store's vectors
    // table — no full-corpus rescore: the rescore side reads only
    // predicate survivors
    val vecScans = qe.sparkPlan.collect {
      case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("/vectors")) => f
    }
    assert(vecScans.nonEmpty, qe.sparkPlan.toString)
    vecScans.foreach { f =>
      assert(f.metadata.get("PushedFilters").exists(_.contains("LessThan(label,5)")),
        s"vectors scan without the pushed predicate:\n$f")
    }
    // (b) the survivor semi-join prunes the postings BELOW the
    // probe-cell candidate join: an Inner join sits above a LeftSemi,
    // and no Inner join hides below that semi
    val joins = qe.sparkPlan.collect { case j: BaseJoinExec => j }
    val semis = joins.filter(_.joinType == LeftSemi)
    assert(semis.nonEmpty, qe.sparkPlan.toString)
    assert(joins.exists(j => j.joinType == Inner &&
      j.collect { case x: BaseJoinExec if x.joinType == LeftSemi => x }.nonEmpty),
      s"survivor semi-join does not sit below the candidate join:\n${qe.sparkPlan}")
    semis.foreach { sj =>
      assert(sj.collect { case x: BaseJoinExec if x.joinType == Inner => x }.isEmpty,
        s"candidate join sits BELOW the survivor semi-join (post-join filter):\n${qe.sparkPlan}")
    }
  }

}
