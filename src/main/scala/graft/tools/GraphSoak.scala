package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the relaxation-round graph family (bfsHops /
  * ssspRounds / temporalReach).
  *
  * Synthesizes a deterministic ~2.2M-edge graph whose answers have
  * closed forms, so exactness is checked at soak scale — not just
  * wall-clock:
  *  - a perfect binary tree over ids 1..2²¹−1 (edge ⌊i/2⌋→i), where a
  *    node's level is ⌊log₂ i⌋ — every distance is derivable;
  *  - a 131k-edge MEGA-HUB (node 0 → every id ≡ 0 mod 16) providing
  *    the worst-case shuffle-key skew: the hub's whole adjacency
  *    hashes to one join key in every round.
  *
  * BFS runs MULTI-SOURCE (root + all 1024 level-10 nodes, 4 rounds):
  * the exact labelled-set size and the per-hop histogram follow from
  * the tree structure (count(h) = 2ʰ + 2¹⁰⁻ʰ + 2¹⁰⁺ʰ for 1 ≤ h ≤ 4,
  * 1 + 2¹⁰ at h = 0; level-5 nodes are provably unreachable in 4).
  * SSSP uses per-edge weights 1 + (child mod 7) from the root, checked
  * against a driver-recomputed expectation for every labelled node.
  * temporalReach uses edge time = child level: ascending along every
  * root path (arrival = level), then a start-time of 3 makes the
  * root's own t=1 edges unusable — only the root stays labelled.
  *
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object GraphSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 1L << 21
    val tree = spark.range(2, n).select(expr("id div 2").as("a"), col("id").as("b"))
    val hub = spark.range(16, n).filter(col("id") % 16 === 0)
      .select(lit(0L).as("a"), col("id").as("b"))
    val edges = tree.unionAll(hub)
    val nEdges = edges.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ── multi-source BFS over the TREE (closed-form histogram): root +
    //    the 1024 level-10 nodes, 4 rounds. The hub is excluded here
    //    because 64 of the sources are ≡ 0 mod 16, which would put the
    //    hub one hop away and destroy the closed form. ──
    val sources = spark.range(1L << 10, 1L << 11).toDF("id")
      .unionAll(Seq(1L).toDF("id"))
    val (bfsHist, bfsSec) = timed {
      graft.operators.Components.bfsHops(tree, "a", "b", sources, "id", 4)
        .groupBy("hops").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val expectedHist = Map(0L -> (1L + (1L << 10))) ++
      (1L to 4L).map(h => h -> ((1L << h) + (1L << (10 - h)) + (1L << (10 + h)))).toMap
    val bfsExact = bfsHist == expectedHist

    // ── hub-stress BFS over the FULL graph: source = the mega-hub,
    //    one round ⇒ exactly its 131 071 neighbors at hop 1 (the whole
    //    adjacency behind one shuffle key) ──
    val (hubCnt, hubSec) = timed {
      graft.operators.Components
        .bfsHops(edges, "a", "b", Seq(0L).toDF("id"), "id", 1)
        .groupBy("hops").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val hubExact = hubCnt == Map(0L -> 1L, 1L -> ((n - 16) / 16))

    // ── weighted SSSP from the root, 3 rounds, driver-recomputed ──
    val wEdges = edges.withColumn("w", expr("1 + b % 7"))
    val (ssspGot, ssspSec) = timed {
      graft.operators.Components
        .ssspRounds(wEdges, "a", "b", "w", Seq(1L).toDF("id"), "id", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val ssspExpected = scala.collection.mutable.Map(1L -> 0L)
    for (i <- 2L until 16L) ssspExpected(i) = ssspExpected(i / 2) + 1 + i % 7
    val ssspExact = ssspGot == ssspExpected.toMap

    // ── temporal: edge time = child level; ascending ⇒ arr = level ──
    val tEdges = edges.withColumn("t", expr("CAST(length(bin(b)) - 1 AS BIGINT)"))
    val (tempGot, tempSec) = timed {
      graft.operators.Components
        .temporalReach(tEdges, "a", "b", "t", Seq(1L).toDF("id"), "id", 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val tempExact = tempGot.size == 31 &&
      tempGot.forall { case (id, arr) => arr == 63 - java.lang.Long.numberOfLeadingZeros(id) }
    // start-time 3 blocks the root's t=1 edges entirely
    val lateGot = graft.operators.Components
      .temporalReach(tEdges, "a", "b", "t", Seq(1L).toDF("id"), "id", 4, startTime = 3L)
      .collect()
    val lateExact = lateGot.length == 1 && lateGot(0).getLong(0) == 1L

    // ── k-core DEEP CASCADE: tree + K₅ clique + one bridge to the
    //    root, k = 3. The tree unravels one level per peel round
    //    (leaves drop to degree 1, exposing the next level) — ~21
    //    driver-synchronous rounds over a frame that halves each
    //    round, the worst-case cascade depth for this graph size. The
    //    closed form: every tree node and the bridge die; exactly the
    //    5 clique nodes survive, each with core degree 4. ──
    val cliqueIds = (0 until 5).map(i => n + 1 + i)
    val cliquePairs = for { i <- cliqueIds; j <- cliqueIds if i < j } yield (i, j)
    val kcoreEdges = tree
      .unionAll(cliquePairs.toDF("a", "b"))
      .unionAll(Seq((1L, n + 1)).toDF("a", "b"))
    val (core, kcoreSec) = timed {
      graft.operators.Components.kCore(kcoreEdges, "a", "b", k = 3, maxRounds = 40)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val kcoreExact = core == cliqueIds.map(_ -> 4L).toMap

    println(
      s"""{"soak":"graph_relaxation","n_edges":$nEdges,"hub_degree":${(n - 16) / 16},""" +
      s""""bfs_labelled":${bfsHist.values.sum},"bfs_hist_exact":$bfsExact,""" +
      s""""hub_round_exact":$hubExact,""" +
      s""""sssp_labelled":${ssspGot.size},"sssp_exact":$ssspExact,""" +
      s""""temporal_exact":$tempExact,"temporal_start_gate_exact":$lateExact,""" +
      s""""kcore_survivors":${core.size},"kcore_exact":$kcoreExact,""" +
      s""""kcore_sec":${math.round(kcoreSec * 100) / 100.0},""" +
      s""""bfs_sec":${math.round(bfsSec * 100) / 100.0},""" +
      s""""hub_sec":${math.round(hubSec * 100) / 100.0},""" +
      s""""sssp_sec":${math.round(ssspSec * 100) / 100.0},""" +
      s""""temporal_sec":${math.round(tempSec * 100) / 100.0}}""")
    spark.stop()
  }
}
