package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Dedup

/** Structured Streaming surface over vector workloads: ONLINE ANN
  * SERVING — the retrieval half of the batch ANN families applied to an
  * unbounded stream of query vectors (the "embed the live request,
  * fetch its neighbors" loop every retrieval pipeline runs).
  *
  * Reference context: no vector surface in the reference; this is the
  * streaming face of the SURVEY §7.5 similarity-search extension.
  */
object VectorStreams {

  /** Enrich a stream of `(id, embedding)` query vectors with their
    * top-k cosine neighbors from a STATIC multi-table sign-LSH index.
    *
    * Plan shape per micro-batch: bucket assignment is a pure projection
    * on the stream side (same deterministic hyperplane hashes the index
    * was built with — [[graft.operators.Knn.withLshTables]]), the
    * capped index broadcast-joins on (tbl, bucket) — the stream never
    * shuffles before aggregation — and the per-query top-k is a
    * [[graft.functions.TopKDistinctAgg]] bounded-heap aggregation:
    * O(k) state per query key, map-side partials, payload-distinct so
    * the multi-table collision duplicates the batch plan removes with
    * `.distinct()` are dropped in aggregation state instead (a blocking
    * distinct is unavailable on a stream). Tie order (cosine desc,
    * cand_id asc) matches the batch window, so a replay of the same
    * queries equals [[graft.operators.Knn.lshTopKMultiTable]] row for
    * row (equivalence-tested).
    *
    * The index frame should be the PERSISTED output of
    * `withLshTables(...)` — it is read once per micro-batch; the
    * hot-bucket cap is applied here so a degenerate bucket can never
    * blow up a batch join (the MaxBucket discipline).
    *
    * Output per emission: (query_id, rnk, cand_id, cosine) — update
    * mode re-emits a query's rows as better neighbors arrive (only
    * relevant when a query id recurs across batches). */
  def annServe(queryStream: DataFrame, tabledIndex: DataFrame, idCol: String,
      embCol: String, dim: Int, nPlanes: Int, nTables: Int, k: Int,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    graft.functions.GraftFunctions.register(queryStream.sparkSession)
    val cand = Dedup.dropHotBuckets(
        tabledIndex.select(col(idCol), col("tbl"), col("bucket"), col(embCol), col("nrm")),
        Seq("tbl", "bucket"), maxBucket, "annServe")
      .select(col(idCol).as("cand_id"), col("tbl"), col("bucket"),
        col(embCol).as("c_emb"), col("nrm").as("c_norm"))
    val q = queryStream
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .withColumn("q_norm", VectorFunctions.norm("q_emb"))
      .withColumn("tbl", explode(expr(s"sequence(0, ${nTables - 1})")))
      .withColumn("bucket",
        expr(VectorFunctions.lshBucketTableSql("q_emb", dim, nPlanes, "tbl")))
    val topk = udaf(graft.functions.TopKDistinctAgg.longs(k))
    q.join(broadcast(cand), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")), 8))
      .groupBy("query_id")
      .agg(topk(col("cosine"), col("cand_id").cast("long")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("e._2").as("cand_id"), col("e._1").as("cosine"))
  }
}
