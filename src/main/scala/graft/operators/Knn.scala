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
  * - `lshTopKMultiTable` is the production recall/cost dial: L
  *   independent tables, union of collisions, score-once per pair.
  * - The IVF family (deterministic coarse cells + nprobe search) lives
  *   in the query layer over the same primitives; recall of both
  *   families is exactly measured (`sim_lsh_recall` / `sim_ivf_recall`).
  */
object Knn {

  /** Exact cosine top-k. `queries`/`candidates` must carry (idCol, embCol). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
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
  def withLshBucket(df: DataFrame, embCol: String, dim: Int, nPlanes: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    Dedup.spread(df).withColumn("bucket", VectorFunctions.lshBucket(embCol, dim, nPlanes))
  }

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

  /** Multi-table (tbl, bucket) assignment: one row per (id, table). */
  def withLshTables(df: DataFrame, embCol: String, dim: Int, nPlanes: Int,
      nTables: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    Dedup.spread(df)
      .withColumn("nrm", VectorFunctions.norm(embCol))
      .withColumn("tbl", explode(expr(s"sequence(0, ${nTables - 1})")))
      .withColumn("bucket",
        expr(VectorFunctions.lshBucketTableSql(embCol, dim, nPlanes, "tbl")))
  }

  /** Multi-table ANN top-k — the production recall/cost dial. Candidate
    * pairs are the DISTINCT union of per-table bucket collisions
    * (collide in any of L tables ⇒ candidate), scored ONCE per pair by
    * joining embeddings back in. Plan shape: one (tbl, bucket)-keyed
    * join producing id pairs, a distinct, two id-keyed hash joins for
    * the embeddings, a per-query top-k window — no all-pairs stage, and
    * the hot-bucket guard caps each table's degenerate buckets.
    *
    * `tabled` carries one row per (vec, table): (id, embedding, nrm,
    * tbl, bucket) — build with [[withLshTables]] and persist/store to
    * reuse as the ANN index. */
  def lshTopKMultiTable(tabled: DataFrame, idCol: String, embCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val ids = tabled.select(col(idCol), col("tbl"), col("bucket"))
    val q = ids.filter(queryPred).select(col(idCol).as("query_id"), col("tbl"), col("bucket"))
    val c = Dedup.dropHotBuckets(ids, Seq("tbl", "bucket"), maxBucket, "lshTopKMultiTable")
      .select(col(idCol).as("cand_id"), col("tbl"), col("bucket"))
    val pairs = q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id").distinct()
    val emb = tabled.filter(col("tbl") === 0)
      .select(col(idCol), col(embCol), col("nrm"))
    pairs
      .join(emb.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        col("nrm").as("q_norm")), Seq("query_id"))
      .join(emb.select(col(idCol).as("cand_id"), col(embCol).as("c_emb"),
        col("nrm").as("c_norm")), Seq("cand_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")), 8))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "cand_id", "cosine", "rnk")
  }

  /** Multi-PROBE variant of [[lshTopKMultiTable]]: each query probes
    * its home bucket PLUS every 1-bit-flip bucket in each table
    * (nPlanes+1 probes per table) — the standard lever for recall at a
    * FIXED table count (Lv et al., multi-probe LSH): a near neighbor
    * that lands one hyperplane away is still found, so fewer tables
    * (= smaller index) reach the same recall. Probe generation is a
    * pure projection on the query side only; the index is untouched
    * and the join stays (tbl, bucket)-keyed. */
  def lshTopKMultiProbe(tabled: DataFrame, idCol: String, embCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int, nPlanes: Int,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val ids = tabled.select(col(idCol), col("tbl"), col("bucket"))
    val q = ids.filter(queryPred)
      .select(col(idCol).as("query_id"), col("tbl"),
        explode(expr(s"array_union(array(bucket), " +
          s"transform(sequence(0, ${nPlanes - 1}), j -> bucket ^ shiftleft(1L, j)))"))
          .as("bucket"))
    val c = Dedup.dropHotBuckets(ids, Seq("tbl", "bucket"), maxBucket, "lshTopKMultiProbe")
      .select(col(idCol).as("cand_id"), col("tbl"), col("bucket"))
    val pairs = q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id").distinct()
    val emb = tabled.filter(col("tbl") === 0)
      .select(col(idCol), col(embCol), col("nrm"))
    pairs
      .join(emb.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        col("nrm").as("q_norm")), Seq("query_id"))
      .join(emb.select(col(idCol).as("cand_id"), col(embCol).as("c_emb"),
        col("nrm").as("c_norm")), Seq("cand_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")), 8))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "cand_id", "cosine", "rnk")
  }
}
