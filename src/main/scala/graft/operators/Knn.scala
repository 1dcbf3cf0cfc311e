package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

/** Approximate & exact nearest-neighbor search over embedding columns
  * (SURVEY.md §7.5 similarity search).
  *
  * - `bruteForceTopK` is the exact baseline: broadcast the (small)
  *   query side, score candidates in one narrow pass, take top-k per
  *   query with a per-partition window. Cost O(|Q|·|C|) — fine for
  *   |Q| small; at 100 TB use the LSH path.
  * - `lshTopK` restricts scoring to same-bucket candidates (sign
  *   random projection). The bucket assignment is a per-row projection
  *   and the join shuffles on the bucket id only.
  */
object Knn {

  /** Exact cosine top-k. `queries`/`candidates` must carry (idCol, embCol). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .withColumn("q_norm", VectorFunctions.norm("q_emb"))
    val c = Dedup.spread(candidates.select(col(idCol).as("cand_id"), col(embCol).as("c_emb")))
      .withColumn("c_norm", VectorFunctions.norm("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")), 8))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "cand_id", "cosine", "rnk")
  }

  /** Bucket assignment via sign-random-projection LSH. */
  def withLshBucket(df: DataFrame, embCol: String, dim: Int, nPlanes: Int): DataFrame =
    Dedup.spread(df).withColumn("bucket", VectorFunctions.lshBucket(embCol, dim, nPlanes))

  /** Bucket-local cosine top-k: same contract as bruteForceTopK but the
    * candidate set per query is its LSH bucket — the 100 TB scale path. */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, embCol: String, dim: Int, nPlanes: Int, k: Int,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val q = withLshBucket(queries, embCol, dim, nPlanes)
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"), col("bucket"))
      .withColumn("q_norm", VectorFunctions.norm("q_emb"))
    val c = withLshBucket(candidates, embCol, dim, nPlanes)
      .select(col(idCol).as("cand_id"), col(embCol).as("c_emb"), col("bucket"))
      .withColumn("c_norm", VectorFunctions.norm("c_emb"))
    lshTopKFromBuckets(q, c, k, maxBucket)
  }

  /** Same, over pre-bucketed sides — queries (query_id, q_emb, bucket,
    * q_norm), candidates (cand_id, c_emb, bucket, c_norm) — so a stored
    * or persisted ANN index is scored without re-deriving buckets, and
    * degenerate candidate buckets are dropped (Dedup.dropHotBuckets)
    * before the bucket-keyed join can go quadratic. */
  def lshTopKFromBuckets(queries: DataFrame, candidates: DataFrame, k: Int,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val c = Dedup.dropHotBuckets(candidates, Seq("bucket"), maxBucket, "lshTopK")
    c.join(queries, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")), 8))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "cand_id", "bucket", "cosine", "rnk")
  }
}
