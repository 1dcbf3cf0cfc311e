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

  /** Bounded-heap (cosine desc, cand_id asc) top-k per query over a
    * scored frame — the ONE ranking discipline every ANN surface in
    * this file shares (round 12: replaced the per-function
    * `row_number` windows, which shuffled each query's ENTIRE
    * candidate set — corpus-proportional for the exact and
    * multi-table paths — onto ≤|Q| reducers and sorted it; the heap
    * keeps O(k) map-side state per query and the exchange carries
    * O(k) entries per query per mapper). Tie contract identical to
    * the retired windows, so every oracle and serve-equivalence pin
    * is unchanged. `carry` names per-query-constant columns to keep
    * (e.g. the query's own LSH bucket). Output: (query_id, carry…,
    * cand_id, cosine, rnk).
    *
    * ID CONTRACT (ADVICE r12): the heap ranks LONG payloads, so
    * `cand_id` is cast to BIGINT in the output and MUST be integral on
    * input — a string id would silently cast to NULL and then fail
    * inside the aggregator. Asserted here so every public entry point
    * (bruteForceTopK, mrlTopK, the LSH family) fails loudly at plan
    * build instead; rank string-keyed corpora through
    * [[graft.functions.TopKAgg.strings]] directly. */
  private[graft] def heapTopK(scored: DataFrame, k: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val idType = scored.schema("cand_id").dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"heapTopK ranks integral candidate ids (output cand_id is BIGINT); " +
        s"got $idType — use TopKAgg.strings for string keys")
    val topk = udaf(graft.functions.TopKAgg.longs(k))
    val aggs = topk(col("cosine"), col("cand_id").cast("long")).as("tk") +:
      carry.map(c => first(col(c)).as(c))
    scored.groupBy("query_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("query_id") +: carry.map(col) :+
        posexplode(col("tk")).as(Seq("pos", "e")): _*)
      .select(col("query_id") +: carry.map(col) :+
        col("e._2").as("cand_id") :+ col("e._1").as("cosine") :+
        (col("pos") + 1).as("rnk"): _*)
  }

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
    heapTopK(scored, k)
      .select("query_id", "cand_id", "cosine", "rnk")
  }

  /** Matryoshka (MRL) truncated-dimension search: candidates are
    * scored against each query on the FIRST `prefixDim` components
    * only (the cheap pass — MRL-trained embeddings front-load
    * information, so prefixes remain usable embeddings and the scan
    * reads a dim/prefixDim-times smaller column at scale), the top
    * `nCand` survivors per query are rescored with the exact
    * full-dimension cosine, and the top `k` return with the repo's
    * deterministic (rounded-8 cosine desc, cand_id) ranking. Rescore
    * cost is candidate-bounded: O(|Q|·nCand) full-dim dots regardless
    * of corpus size. Shares [[bruteForceTopK]]'s bounded-probe shape
    * for the prefix pass (broadcast query batch); recall vs the exact
    * full-dim top-k is measured by `sim_mrl_recall`.
    *
    * Both rankings ride the bounded-heap
    * [[graft.functions.TopKAgg]] (round-12: the prefix prune was a
    * `row_number` window over the full |Q|×N score product — a
    * corpus-sized shuffle onto ≤|Q| reducers plus an O(N log N) sort
    * per query; the heap keeps O(nCand) map-side state per query and
    * the shuffle carries O(nCand) entries per query per mapper). Tie
    * contract (score desc, cand_id asc) is the heap's own, identical
    * to the retired window's — plan-gated in PlansSpec (no WindowExec
    * anywhere in this query). */
  def mrlTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      embCol: String, prefixDim: Int, nCand: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    def prep(df: DataFrame, role: String) = df
      .select(col(idCol).as(s"${role}_id"), col(embCol).as(s"${role}_emb"))
      .withColumn(s"${role}_p", expr(s"slice(${role}_emb, 1, $prefixDim)"))
      .withColumn(s"${role}_pn", VectorFunctions.norm(s"${role}_p"))
      .withColumn(s"${role}_fn", VectorFunctions.norm(s"${role}_emb"))
    val q = prep(queries, "query").localCheckpoint(true)
    // one narrow pass computes the candidate side's prefix + full
    // norms; checkpointed because the prune and the rescore both read it
    val c = prep(Dedup.spread(candidates), "cand").localCheckpoint(true)
    val prune = udaf(graft.functions.TopKAgg.longs(nCand))
    val pruned = c.select(col("cand_id"), col("cand_p"), col("cand_pn"))
      .crossJoin(broadcast(q.select(col("query_id"), col("query_p"), col("query_pn"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("pcos", round(
        VectorFunctions.dot("query_p", "cand_p")
          / (col("query_pn") * col("cand_pn")), 8))
      .groupBy("query_id")
      .agg(prune(col("pcos"), col("cand_id").cast("long")).as("ptk"))
      .select(col("query_id"), explode(expr("transform(ptk, e -> e._2)")).as("cand_id"))
    // |Q|·nCand survivor ids — broadcast against the checkpointed
    // candidate frame so the rescore is a broadcast hash join, then the
    // final top-k rides the same bounded heap (no window anywhere)
    val topk = udaf(graft.functions.TopKAgg.longs(k))
    c.select(col("cand_id"), col("cand_emb"), col("cand_fn"))
      .join(broadcast(pruned), Seq("cand_id"))
      .join(broadcast(q.select(col("query_id"), col("query_emb"), col("query_fn"))),
        Seq("query_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("query_emb", "cand_emb")
          / (col("query_fn") * col("cand_fn")), 8))
      .groupBy("query_id")
      .agg(topk(col("cosine"), col("cand_id").cast("long")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e._2").as("cand_id"),
        col("e._1").as("cosine"), (col("pos") + 1).as("rnk"))
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
    val scored = c.join(queries, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")), 8))
    // a query's candidates all share ITS bucket — per-query constant
    heapTopK(scored, k, carry = Seq("bucket"))
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
    val scored = pairs
      .join(emb.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        col("nrm").as("q_norm")), Seq("query_id"))
      .join(emb.select(col(idCol).as("cand_id"), col(embCol).as("c_emb"),
        col("nrm").as("c_norm")), Seq("cand_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")), 8))
    heapTopK(scored, k)
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
    val scored = pairs
      .join(emb.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        col("nrm").as("q_norm")), Seq("query_id"))
      .join(emb.select(col(idCol).as("cand_id"), col(embCol).as("c_emb"),
        col("nrm").as("c_norm")), Seq("cand_id"))
      .withColumn("cosine", round(
        VectorFunctions.dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")), 8))
    heapTopK(scored, k)
      .select("query_id", "cand_id", "cosine", "rnk")
  }

  // ───────────────────────── IVF (coarse quantizer) ─────────────────────────

  /** Train `k` IVF coarse centroids with `iters` Lloyd rounds — the
    * deterministic, exactly-replayable k-means the query layer has
    * always used, generalized so standing stores can train once and
    * pin the quantizer. Seed centroids are the rows with id < k;
    * assignments tie-break on (rounded cosine desc, cell) and centroid
    * means divide order-insensitive BIGINT sums of integer-quantized
    * components (q = floor(v·2²⁰ + 0.5)), so the resulting doubles are
    * bit-identical in any engine. Per round: one broadcast-crossjoin
    * assignment (n×k, narrow) + one map-side-combined aggregate; only
    * the k×dim centroid frame checkpoints between rounds — the
    * standard distributed k-means shape at 100 TB. Returns
    * (cell, cw: array<double>, cn: double). */
  def ivfTrain(vecs: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val q = Dedup.spread(vecs)
      .select(col(idCol).as("__vid"),
        expr(s"transform($embCol, v -> CAST(v AS DOUBLE))").as("emb_d"),
        expr(s"transform($embCol, v -> CAST(floor(CAST(v AS DOUBLE) * 1048576.0D + 0.5D) AS BIGINT))")
          .as("qemb"))
      .withColumn("nrm", expr("sqrt(graft_dot_d(emb_d, emb_d))"))
      .localCheckpoint(true) // reused by every training round
    // Argmax as a map-side-combinable MAX aggregate, not a row_number
    // window (r17 optimization, guide §2.3): cells are distinct per
    // vector, so max(struct(csim, -cell)) picks exactly the window's
    // (csim desc, cell asc) head under the same Catalyst double
    // ordering (csim is NOT negated, so NaN/-0.0 handling is
    // untouched; the tie-break negates the integral cell instead).
    // The partial aggregate completes on the broadcast-join side
    // (every cell of a vector co-located), so the exchange carries one
    // row per vector and the per-round sort disappears. `qemb` is
    // constant per vector, so first() is exact.
    def assign(cent: DataFrame): DataFrame =
      q.crossJoin(broadcast(cent))
        .withColumn("csim", round(expr("graft_dot_d(emb_d, cw)") / (col("nrm") * col("cn")), 8))
        .groupBy(col("__vid"))
        .agg(max(struct(col("csim"), (-col("cell")).as("nc"))).as("__mx"),
          first(col("qemb")).as("qemb"))
        .select(col("__vid"), col("qemb"), (-col("__mx.nc")).as("cell"))
    def update(a: DataFrame): DataFrame =
      a.select(col("cell"), posexplode(col("qemb")).as(Seq("i", "qv")))
        .groupBy("cell", "i")
        .agg(sum("qv").as("s"), count(lit(1)).as("n"))
        .groupBy("cell")
        .agg(collect_list(struct(col("i"),
          (col("s").cast("double") / col("n").cast("double")).as("w"))).as("ws"))
        .select(col("cell"), expr("transform(array_sort(ws), x -> x.w)").as("cw"))
        .withColumn("cn", expr("sqrt(graft_dot_d(cw, cw))"))
    // Rounds chain LAZILY (r18): each round references the previous
    // centroid frame exactly once (the broadcast side of assign), so
    // the whole training is ONE job materialized by the final eager
    // checkpoint instead of one barrier per round + one for the seed.
    // The final cut stays eager so concurrent downstream references
    // (rank window, residual builder, store folds) never race to
    // re-execute the training chain.
    var cent = q.filter(col("__vid") < k)
      .select(col("__vid").as("cell"), col("emb_d").as("cw"), col("nrm").as("cn"))
    for (_ <- 1 to iters)
      cent = update(assign(cent))
    cent.localCheckpoint(true) // k×dim rows: metadata-sized
  }

  /** Rank every vector against TRAINED centroids: (id, embCol, nrm,
    * cell, rn) with rn = 1 the home cell and rn ≤ nprobe a query's
    * probe set — ties (rounded cosine desc, cell), the one ordering
    * every IVF surface shares. Per-vector cost is k broadcast rows;
    * the window partitions by vector id, so ranking a BATCH costs
    * O(batch·k), never the corpus. */
  def ivfRank(vecs: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    Dedup.spread(vecs)
      .select(col(idCol), col(embCol),
        expr(s"transform($embCol, v -> CAST(v AS DOUBLE))").as("emb_d"))
      .withColumn("nrm", VectorFunctions.norm(embCol))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", round(expr("graft_dot_d(emb_d, cw)") / (col("nrm") * col("cn")), 8))
      .withColumn("rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col("csim").desc, col("cell"))))
      .drop("emb_d", "cw", "cn", "csim")
  }
}
