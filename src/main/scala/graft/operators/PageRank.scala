package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-point PageRank over a weighted directed edge
  * list — the second iterative graph operator beside
  * [[Components.connectedComponents]].
  *
  * All arithmetic is INTEGER (ranks in 1e-6 fixed point): per-edge
  * contribution `r(src)·w div tot(src)`, damping `150000 + (S·85)
  * div 100`. Integer division loses a deterministic sub-ppm of mass
  * (and dangling nodes keep theirs — the standard simplification);
  * both effects are bit-identical in any engine, so a DuckDB oracle
  * replays every iteration exactly — no float summation order, no
  * libm, no cast semantics anywhere.
  *
  * Scale shape: one fixed iteration count (caller-chosen), each round
  * = one join of the edge frame against the O(V) rank frame plus a
  * map-side-combined groupBy — the classic distributed PageRank; only
  * the rank frame is checkpointed between rounds (lineage truncation,
  * same policy as Components). Per-source totals are part of the edge
  * frame, computed once.
  *
  * Reference context: no graph surface in the reference
  * (cnics_to_fhir.py); general-analytics extension (SURVEY §7.5).
  */
object PageRank {

  val BaseE6 = 1000000L     // rank fixed-point scale (1.0)
  val TeleportE6 = 150000L  // (1-d)·Base with d = 0.85

  /** (id, rank_e6) for every vertex of the graph after `iters` rounds.
    * `edges` must carry integer columns (srcCol, dstCol, wCol > 0);
    * parallel edges should be pre-aggregated into weights. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // Edge frame with per-source totals, checkpointed once: reused by
    // every round and referenced twice (contribution join + node set).
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w"))
      .withColumn("tot", sum("w").over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)

    var ranks = nodes.withColumn("rank_e6", lit(BaseE6))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr("rank_e6 * w div tot").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      ranks = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr(s"${TeleportE6}L + (coalesce(s, 0L) * 85) div 100").as("rank_e6"))
      // Truncate lineage per round — except the LAST round, whose frame
      // feeds straight into the caller's single consumption: one narrow
      // join+agg over checkpointed inputs, so a final materialization
      // job would only duplicate the write.
      if (i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
