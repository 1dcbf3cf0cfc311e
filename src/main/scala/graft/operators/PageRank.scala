package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.TruncateOps

/** Deterministic fixed-point PageRank over a weighted directed edge
  * list — the second iterative graph operator beside
  * [[Components.connectedComponents]].
  *
  * All arithmetic is INTEGER (ranks in 1e-6 fixed point): per-edge
  * contribution `r(src)·w div tot(src)`, damping `150000 + (S·85)
  * div 100`. Integer division loses a deterministic sub-ppm of mass
  * (and by default dangling nodes keep theirs — the standard
  * simplification; `redistributeDangling` spreads it uniformly
  * instead, still in integers); both effects are bit-identical in any
  * engine, so a DuckDB oracle replays every iteration exactly — no
  * float summation order, no libm, no cast semantics anywhere.
  *
  * Scale shape: one fixed iteration count (caller-chosen), each round
  * = one join of the edge frame against the O(V) rank frame plus a
  * map-side-combined groupBy — the classic distributed PageRank; only
  * the rank frame is checkpointed between rounds (lineage truncation,
  * same policy as Components). Per-source totals are an
  * aggregate-join, NOT a window: `sum OVER (PARTITION BY src)` would
  * buffer a hub source's entire edge partition in one task, whereas
  * `groupBy(src).sum` is map-side combinable and the join back is
  * co-partitioned on src — the skew-tolerant shape for a 10⁸-out-edge
  * hub.
  *
  * Reference context: no graph surface in the reference
  * (cnics_to_fhir.py); general-analytics extension (SURVEY §7.5).
  */
object PageRank {

  val BaseE6 = 1000000L     // rank fixed-point scale (1.0)
  val TeleportE6 = 150000L  // (1-d)·Base with d = 0.85

  /** Per-source totals as an aggregate-join over a (src, dst, w) edge
    * frame. Exposed separately so the plan gate can assert the shape
    * BEFORE the checkpoint hides it (inside [[pagerank]] the frame is
    * eagerly checkpointed, so a window sneaking back in would execute
    * invisibly to any assertion on the final query's plan). */
  private[graft] def withTotals(base: DataFrame): DataFrame =
    base.join(base.groupBy("src").agg(sum("w").as("tot")), "src")

  /** (id, rank_e6) for every vertex of the graph after `iters` rounds.
    * `edges` must carry integer columns (srcCol, dstCol, wCol > 0);
    * parallel edges should be pre-aggregated into weights.
    *
    * With `redistributeDangling`, each round adds `S_d div N` to every
    * node's incoming mass before damping, where S_d is the summed rank
    * of nodes without out-edges — the uniform dangling-mass
    * redistribution of the original formulation, kept in integer
    * arithmetic (BIGINT sums are order-insensitive, so the oracle
    * replays it as one extra CTE term per round). */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int = 3, redistributeDangling: Boolean = false): DataFrame =
    impl(edges, srcCol, dstCol, wCol, iters, redistributeDangling, None)

  /** PERSONALIZED PageRank: teleport mass lands only on `seeds` (a
    * one-column `id` frame) instead of uniformly — rank then measures
    * proximity to the seed cohort rather than global importance.
    * Initial rank is `BaseE6` on seeds and 0 elsewhere, and each
    * round's restart term is `TeleportE6·[id ∈ seeds]`; everything
    * else (integer contributions, damping, aggregate-join totals,
    * per-round checkpoints) is shared with [[pagerank]] verbatim, so
    * the same unrolled-CTE oracle replays it with one extra seed flag
    * on the node frame. The seed set rides a left join onto the O(V)
    * node frame — never a driver-side collect, so a seed cohort of
    * 10⁸ users costs one co-partitioned join. */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      seeds: DataFrame, iters: Int = 3): DataFrame =
    impl(edges, srcCol, dstCol, wCol, iters, redistributeDangling = false, Some(seeds))

  private def impl(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int, redistributeDangling: Boolean, seeds: Option[DataFrame]): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // Edge frame with per-source totals (aggregate-join, see scaladoc),
    // checkpointed once: reused by every round and referenced twice
    // (contribution join + node set).
    val e = withTotals(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w")))
      .truncated
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .truncated
    // Seed flag rides the O(V) node frame via one left join (constant 1
    // when unpersonalized, so the standard formulas fall out unchanged).
    val nodesS = seeds match {
      case Some(sd) =>
        nodes.join(
            sd.select(col(sd.columns.head).cast("long").as("id")).distinct()
              .withColumn("__seed", lit(1L)),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("__seed"), lit(0L)).as("__seed"))
          .truncated
      case None => nodes.withColumn("__seed", lit(1L))
    }
    // Dangling set + node count: metadata-sized frames, broadcast into
    // each round rather than collected (no driver data path).
    lazy val dangling = nodes
      .join(e.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
      .truncated
    lazy val nn = nodes.agg(count(lit(1)).as("__n"))

    var ranks = nodesS.select(col("id"), (col("__seed") * BaseE6).as("rank_e6"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr("rank_e6 * w div tot").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      ranks =
        if (redistributeDangling) {
          val sd = ranks.join(dangling, "id")
            .agg(coalesce(sum("rank_e6"), lit(0L)).as("__sd"))
          nodesS
            .join(contrib, Seq("id"), "left")
            .crossJoin(broadcast(sd)).crossJoin(broadcast(nn))
            .select(col("id"),
              expr(s"__seed * ${TeleportE6}L + ((coalesce(s, 0L) + __sd div __n) * 85) div 100")
                .as("rank_e6"))
        } else {
          nodesS
            .join(contrib, Seq("id"), "left")
            .select(col("id"),
              expr(s"__seed * ${TeleportE6}L + (coalesce(s, 0L) * 85) div 100").as("rank_e6"))
        }
      // Cadence lineage cut (r18): rounds chain LAZILY between cuts, so
      // the edge frame's contribution-join exchange — the same canonical
      // subtree in every chained round — is shuffled ONCE per segment
      // via ReuseExchange instead of once per round (a checkpointed rank
      // frame per round forced a fresh O(E) shuffle each round: the
      // checkpointed RDD loses its partitioning). The rank frame is
      // referenced once per round (twice with dangling redistribution,
      // whose extra reference is a scalar agg), so a cadence of 4 keeps
      // the uncut plan linear and small; the final round always stays
      // lazy — it feeds straight into the caller's single consumption.
      ranks = Checkpoints.truncateEvery(ranks, i, iters,
        if (redistributeDangling) 2 else 4)
    }
    ranks
  }
}
